"""ODE/SDE samplers as lax.scan loops with classifier-free guidance.

Clean-room rebuild of the reference samplers (image/samplers.py:46-187):
Euler (+ optional Heun) ODE and Euler–Maruyama SDE with velocity→score
conversion, CFG with a guidance interval [guidance_low, guidance_high], and
a deterministic final SDE step. The reference integrates in float64; on TPU
we keep float32 integrator state (SURVEY.md §7.4 item 6).

`model_fn(x, t, y) -> v` is the velocity network (typically EMA params,
projectors unused). Each sampler compiles to a single XLA while loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from reed_tpu.diffusion.paths import diffusion_coefficient, score_from_velocity


def _guided_velocity(model_fn, x, t_cur, y, cfg_scale, guidance_low,
                     guidance_high, num_classes):
    """Velocity with CFG applied inside [guidance_low, guidance_high].

    Matches reference behavior: outside the interval the *conditional*
    velocity is used unguided (image/samplers.py:66-82)."""
    b = x.shape[0]
    t_vec = jnp.full((b,), t_cur, jnp.float32)
    if cfg_scale <= 1.0:
        return model_fn(x, t_vec, y)

    def guided(x):
        y_null = jnp.full_like(y, num_classes)
        x_in = jnp.concatenate([x, x], axis=0)
        y_in = jnp.concatenate([y, y_null], axis=0)
        t_in = jnp.concatenate([t_vec, t_vec], axis=0)
        v = model_fn(x_in, t_in, y_in).astype(jnp.float32)
        v_cond, v_uncond = jnp.split(v, 2, axis=0)
        return v_uncond + cfg_scale * (v_cond - v_uncond)

    def unguided(x):
        return model_fn(x, t_vec, y).astype(jnp.float32)

    # lax.cond so steps outside the guidance interval pay ONE model call
    # (the reference drops to a single batch there too,
    # image/samplers.py:66-70; a where() over both would double the work
    # of every step)
    in_window = (t_cur <= guidance_high) & (t_cur >= guidance_low)
    return jax.lax.cond(in_window, guided, unguided, x)


def euler_sampler(model_fn, latents, y, num_steps: int = 20, heun: bool = False,
                  cfg_scale: float = 1.0, guidance_low: float = 0.0,
                  guidance_high: float = 1.0, num_classes: int = 1000,
                  path_type: str = "linear"):
    """Probability-flow ODE sampler from t=1 (noise) to t=0 (data).
    Reference: image/samplers.py:46-104."""
    del path_type
    t_steps = jnp.linspace(1.0, 0.0, num_steps + 1, dtype=jnp.float32)
    x = latents.astype(jnp.float32)

    def body(x_cur, i):
        t_cur, t_next = t_steps[i], t_steps[i + 1]
        dt = t_next - t_cur
        d_cur = _guided_velocity(model_fn, x_cur, t_cur, y, cfg_scale,
                                 guidance_low, guidance_high, num_classes
                                 ).astype(jnp.float32)
        x_euler = x_cur + dt * d_cur
        if heun:
            d_prime = _guided_velocity(model_fn, x_euler, t_next, y, cfg_scale,
                                       guidance_low, guidance_high, num_classes
                                       ).astype(jnp.float32)
            x_heun = x_cur + dt * 0.5 * (d_cur + d_prime)
            # reference applies Heun on all but the final step
            x_next = jnp.where(i < num_steps - 1, x_heun, x_euler)
        else:
            x_next = x_euler
        return x_next, None

    x, _ = jax.lax.scan(body, x, jnp.arange(num_steps))
    return x


def euler_maruyama_sampler(model_fn, latents, y, rng, num_steps: int = 20,
                           cfg_scale: float = 1.0, guidance_low: float = 0.0,
                           guidance_high: float = 1.0, num_classes: int = 1000,
                           path_type: str = "linear", t_min: float = 0.04):
    """SDE sampler: drift v - 0.5*g(t)*score with g(t)=2t, stochastic steps on
    t in [1, t_min] then one deterministic mean step to t=0.
    Reference: image/samplers.py:107-187."""
    t_steps = jnp.concatenate(
        [jnp.linspace(1.0, t_min, num_steps, dtype=jnp.float32),
         jnp.zeros((1,), jnp.float32)])
    x = latents.astype(jnp.float32)

    def drift(x_cur, t_cur):
        b = x_cur.shape[0]
        t_b = jnp.full((b,) + (1,) * (x_cur.ndim - 1), t_cur, jnp.float32)

        def unguided(x_cur):
            v = model_fn(x_cur, jnp.full((b,), t_cur, jnp.float32), y
                         ).astype(jnp.float32)
            s = score_from_velocity(v, x_cur, t_b, path_type)
            return v - 0.5 * diffusion_coefficient(t_cur) * s

        if cfg_scale <= 1.0:
            return unguided(x_cur)

        def guided(x_cur):
            y_null = jnp.full_like(y, num_classes)
            x_in = jnp.concatenate([x_cur, x_cur], axis=0)
            y_in = jnp.concatenate([y, y_null], axis=0)
            t_in = jnp.full((2 * b,), t_cur, jnp.float32)
            v = model_fn(x_in, t_in, y_in).astype(jnp.float32)
            # score conversion happens on the duplicated batch, then guidance
            # on the drift (reference order: samplers.py:150-154)
            t_b2 = jnp.full((2 * b,) + (1,) * (x_cur.ndim - 1), t_cur,
                            jnp.float32)
            s = score_from_velocity(v, x_in, t_b2, path_type)
            d = v - 0.5 * diffusion_coefficient(t_cur) * s
            d_cond, d_uncond = jnp.split(d, 2, axis=0)
            return d_uncond + cfg_scale * (d_cond - d_uncond)

        # lax.cond so steps outside the guidance interval pay ONE model call
        # instead of the duplicated-batch pass whose result jnp.where would
        # discard (the unguided drift equals d_cond exactly: SiT has no
        # cross-batch ops). Same structure as _guided_velocity above.
        in_window = (t_cur <= guidance_high) & (t_cur >= guidance_low)
        return jax.lax.cond(in_window, guided, unguided, x_cur)

    def body(x_cur, i):
        t_cur, t_next = t_steps[i], t_steps[i + 1]
        dt = t_next - t_cur
        eps = jax.random.normal(jax.random.fold_in(rng, i), x_cur.shape,
                                jnp.float32)
        d_cur = drift(x_cur, t_cur)
        g = diffusion_coefficient(t_cur)
        x_next = x_cur + d_cur * dt + jnp.sqrt(g) * eps * jnp.sqrt(jnp.abs(dt))
        return x_next, None

    # stochastic steps over [1, t_min]
    x, _ = jax.lax.scan(body, x, jnp.arange(num_steps - 1))
    # final deterministic step t_min -> 0 (mean only)
    t_cur, t_next = t_steps[num_steps - 1], t_steps[num_steps]
    x = x + (t_next - t_cur) * drift(x, t_cur)
    return x

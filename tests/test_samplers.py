"""Sampler tests with an analytically-known velocity field.

For standard-normal data on the linear path, the exact marginal velocity is
v(x,t) = (2t-1)/(2t^2-2t+1) * x, and the probability-flow ODE maps x(1) to
x(0) = x(1) exactly (the integral of the coefficient vanishes). This gives a
closed-form correctness check for the Euler/Heun integrators, and the SDE
sampler must reproduce a standard normal at t=0.
"""

import jax
import jax.numpy as jnp
import numpy as np

from reed_tpu.diffusion.samplers import euler_maruyama_sampler, euler_sampler


def exact_velocity_model(x, t, y):
    t_b = t.reshape((-1,) + (1,) * (x.ndim - 1))
    k = (2 * t_b - 1) / (2 * t_b ** 2 - 2 * t_b + 1)
    return k * x


def test_euler_identity_map():
    rng = jax.random.PRNGKey(0)
    x1 = jax.random.normal(rng, (8, 4, 4, 2))
    y = jnp.zeros((8,), jnp.int32)
    x0 = euler_sampler(exact_velocity_model, x1, y, num_steps=256)
    assert np.allclose(x0, x1, atol=5e-2)


def test_heun_more_accurate_than_euler():
    rng = jax.random.PRNGKey(0)
    x1 = jax.random.normal(rng, (8, 4, 4, 2))
    y = jnp.zeros((8,), jnp.int32)
    e = euler_sampler(exact_velocity_model, x1, y, num_steps=32)
    h = euler_sampler(exact_velocity_model, x1, y, num_steps=32, heun=True)
    err_e = float(jnp.abs(e - x1).mean())
    err_h = float(jnp.abs(h - x1).mean())
    assert err_h < err_e


def test_cfg_noop_when_cond_equals_uncond():
    # model ignores y: guided velocity == conditional velocity for any scale
    rng = jax.random.PRNGKey(0)
    x1 = jax.random.normal(rng, (4, 4, 4, 2))
    y = jnp.zeros((4,), jnp.int32)
    a = euler_sampler(exact_velocity_model, x1, y, num_steps=16)
    b = euler_sampler(exact_velocity_model, x1, y, num_steps=16,
                      cfg_scale=2.5, num_classes=10)
    assert np.allclose(a, b, atol=1e-4)


def test_guidance_interval_restricts_cfg():
    # a label-sensitive model: velocity shifted by y
    def model(x, t, y):
        shift = (y == 1).astype(jnp.float32).reshape((-1,) + (1,) * (x.ndim - 1))
        return exact_velocity_model(x, t, y) + shift

    rng = jax.random.PRNGKey(0)
    x1 = jax.random.normal(rng, (4, 4, 4, 2))
    y = jnp.ones((4,), jnp.int32)
    full = euler_sampler(model, x1, y, num_steps=16, cfg_scale=2.0,
                         num_classes=2)
    windowed = euler_sampler(model, x1, y, num_steps=16, cfg_scale=2.0,
                             num_classes=2, guidance_low=0.4,
                             guidance_high=0.6)
    none = euler_sampler(model, x1, y, num_steps=16)
    # windowed guidance lies strictly between no guidance and full guidance
    d_full = float(jnp.abs(full - none).mean())
    d_win = float(jnp.abs(windowed - none).mean())
    assert 0 < d_win < d_full


def test_euler_maruyama_marginal():
    # exact score model => samples at t=0 are ~N(0,1)
    rng = jax.random.PRNGKey(0)
    x1 = jax.random.normal(rng, (512, 8))
    y = jnp.zeros((512,), jnp.int32)
    x0 = euler_maruyama_sampler(exact_velocity_model, x1, y,
                                jax.random.PRNGKey(1), num_steps=128)
    assert abs(float(x0.mean())) < 0.1
    assert abs(float(x0.std()) - 1.0) < 0.1


def test_sampler_determinism():
    rng = jax.random.PRNGKey(0)
    x1 = jax.random.normal(rng, (4, 8))
    y = jnp.zeros((4,), jnp.int32)
    a = euler_maruyama_sampler(exact_velocity_model, x1, y,
                               jax.random.PRNGKey(7), num_steps=16)
    b = euler_maruyama_sampler(exact_velocity_model, x1, y,
                               jax.random.PRNGKey(7), num_steps=16)
    assert np.array_equal(np.asarray(a), np.asarray(b))


def test_sde_guidance_interval_restricts_cfg():
    # SDE counterpart of the ODE interval test: the windowed run must land
    # strictly between unguided and fully-guided, and the out-of-window
    # branch (lax.cond single-batch path) must equal the conditional drift.
    def model(x, t, y):
        shift = (y == 1).astype(jnp.float32).reshape((-1,) + (1,) * (x.ndim - 1))
        return exact_velocity_model(x, t, y) + shift

    rng = jax.random.PRNGKey(0)
    x1 = jax.random.normal(rng, (4, 4, 4, 2))
    y = jnp.ones((4,), jnp.int32)
    key = jax.random.PRNGKey(3)
    full = euler_maruyama_sampler(model, x1, y, key, num_steps=16,
                                  cfg_scale=2.0, num_classes=2)
    windowed = euler_maruyama_sampler(model, x1, y, key, num_steps=16,
                                      cfg_scale=2.0, num_classes=2,
                                      guidance_low=0.4, guidance_high=0.6)
    none = euler_maruyama_sampler(model, x1, y, key, num_steps=16)
    d_full = float(jnp.abs(full - none).mean())
    d_win = float(jnp.abs(windowed - none).mean())
    assert 0 < d_win < d_full
    # a zero-width window at the top (never active): identical to cfg<=1,
    # pinning that the unguided lax.cond branch matches the plain drift
    never = euler_maruyama_sampler(model, x1, y, key, num_steps=16,
                                   cfg_scale=2.0, num_classes=2,
                                   guidance_low=1.5, guidance_high=2.0)
    assert np.allclose(np.asarray(never), np.asarray(none), atol=1e-5)

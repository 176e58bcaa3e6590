"""Discrete (masking) flow matching: corruption, Euler unmasking sampler,
differentiable sampler, and reward-guided variants (CG / SMC / TDS).

Clean-room rebuild of the reference Interpolant
(protein/fmif/fm_utils.py:30-441). Convention here: **t=1 is clean data**
(opposite of the continuous image path); tokens are masked with probability
(1 - t). The sampler runs ts = linspace(min_t, 1) and progressively unmasks
via the MDLM-style transition q(x_s | x_t, x1-hat):

    q_xs = softmax(logits/temp) * d_t,  q_xs[MASK] = 1 - t_2

with already-unmasked positions forced to copy. Categorical draws use the
exponential-races trick argmax(p_i / E_i), E_i ~ Exp(1), matching
fm_utils.py:15-19. Everything is a lax.scan over a fixed number of steps.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

import jax
import jax.numpy as jnp

MASK_TOKEN_INDEX = 21
NUM_TOKENS = 22
NEG_INF = -1e6


@dataclass(frozen=True)
class MaskingInterpolantConfig:
    num_tokens: int = NUM_TOKENS
    mask_index: int = MASK_TOKEN_INDEX
    min_t: float = 1e-2
    num_timesteps: int = 500
    temp: float = 0.1


def sample_t(rng, num_batch: int, min_t: float):
    """t ~ U[min_t, 1 - min_t] (reference: fm_utils.py:40-42)."""
    t = jax.random.uniform(rng, (num_batch,))
    return t * (1 - 2 * min_t) + min_t


def corrupt_tokens(rng, tokens, t, res_mask, mask_index: int = MASK_TOKEN_INDEX):
    """Mask each valid token with prob (1-t); invalid positions forced to
    mask (reference: fm_utils.py:44-61). tokens [B,L], t [B] or [B,1]."""
    if t.ndim == 1:
        t = t[:, None]
    u = jax.random.uniform(rng, tokens.shape)
    corrupted = jnp.where(u < (1.0 - t), mask_index, tokens)
    corrupted = jnp.where(res_mask.astype(bool), corrupted, mask_index)
    return corrupted.astype(jnp.int32)


def corrupt_batch(rng, batch, cfg: MaskingInterpolantConfig, t=None):
    """Add S_t / t / is_masked to a featurized batch dict
    (reference: fm_utils.py:63-87)."""
    s = batch["S"]
    b = s.shape[0]
    rng_t, rng_c = jax.random.split(rng)
    if t is None:
        t = sample_t(rng_t, b, cfg.min_t)[:, None]
    else:
        t = jnp.broadcast_to(jnp.asarray(t, jnp.float32), (b, 1))
    res_mask = batch["mask"] * batch["chain_M"]
    s_t = corrupt_tokens(rng_c, s, t, res_mask, cfg.mask_index)
    is_masked = (s_t == cfg.mask_index).astype(s.dtype) * res_mask
    return dict(batch, S_t=s_t, t=t, is_masked=is_masked)


def categorical_exp_race(rng, probs):
    """Sample idx ~ Categorical(probs) via argmax(p_i / E_i)
    (reference trick at fm_utils.py:15-19; robust to unnormalized probs)."""
    e = 1e-10 - jnp.log(jax.random.uniform(rng, probs.shape) + 1e-10)
    return jnp.argmax(probs / e, axis=-1)


def _step_probs(logits, tokens_t, t_1, t_2, temp, mask_index, num_tokens):
    """Build the MDLM transition probs q_xs for one Euler step."""
    logits = logits.at[..., mask_index].set(NEG_INF)
    logits = logits / temp - jax.nn.logsumexp(logits / temp, axis=-1,
                                              keepdims=True)
    unmasked = (tokens_t != mask_index)
    onehot = jax.nn.one_hot(tokens_t, num_tokens)
    # force copy for already-unmasked positions
    logits = jnp.where(unmasked[..., None],
                       jnp.where(onehot > 0, 0.0, NEG_INF), logits)
    d_t = t_2 - t_1
    q_xs = jnp.exp(logits) * d_t
    q_xs = q_xs.at[..., mask_index].set(1.0 - t_2)
    return q_xs


def euler_unmask_sampler(model_logits_fn, rng, batch_shape,
                         cfg: MaskingInterpolantConfig,
                         cls: Optional[int] = None, w: Optional[float] = None,
                         num_cls: int = 2):
    """Euler unmasking sampler (reference: fm_utils.py:89-143).

    model_logits_fn(tokens [B,L], cls or None) -> logits [B,L,V].
    Optional CFG over a class label: logits = (1+w)*cond - w*uncond.
    Returns (pred_tokens, final_tokens): argmax-denoised prediction from the
    last step and the sampled trajectory endpoint.
    """
    b, l = batch_shape
    ts = jnp.linspace(cfg.min_t, 1.0, cfg.num_timesteps)
    tokens0 = jnp.full((b, l), cfg.mask_index, jnp.int32)

    def logits_at(tokens):
        if cls is not None:
            uncond = jnp.full((b,), num_cls, jnp.int32)
            cond = jnp.full((b,), cls, jnp.int32)
            lo_u = model_logits_fn(tokens, uncond)
            lo_c = model_logits_fn(tokens, cond)
            return (1.0 + w) * lo_c - w * lo_u
        return model_logits_fn(tokens, None)

    def body(carry, i):
        tokens_t, _ = carry
        t_1, t_2 = ts[i], ts[i + 1]
        logits = logits_at(tokens_t).astype(jnp.float32)
        pred = jnp.argmax(
            logits.at[..., cfg.mask_index].set(-1e9), axis=-1)
        q_xs = _step_probs(logits, tokens_t, t_1, t_2, cfg.temp,
                           cfg.mask_index, cfg.num_tokens)
        new = categorical_exp_race(jax.random.fold_in(rng, i), q_xs)
        copy = (tokens_t != cfg.mask_index)
        tokens_next = jnp.where(copy, tokens_t, new).astype(jnp.int32)
        return (tokens_next, pred), None

    (tokens, pred), _ = jax.lax.scan(body, (tokens0, tokens0),
                                     jnp.arange(cfg.num_timesteps - 1))
    return pred, tokens


def euler_unmask_sampler_controlled_cg(model_logits_fn, reward_fn, rng,
                                       batch_shape,
                                       cfg: MaskingInterpolantConfig,
                                       guidance_scale: float = 1.0):
    """Classifier-gradient reward guidance (reference: fm_utils.py:214-270).

    reward_fn(expected_x0_logits) -> scalar reward per batch elem; guidance
    multiplies q_xs by exp(scale * (dR/dx_onehot - dR/dx_onehot[MASK]))."""
    b, l = batch_shape
    ts = jnp.linspace(cfg.min_t, 1.0, cfg.num_timesteps)
    tokens0 = jnp.full((b, l), cfg.mask_index, jnp.int32)

    def reward_of_onehot(x_onehot):
        expected_x0 = model_logits_fn(x_onehot, None)
        return reward_fn(expected_x0).mean()

    grad_fn = jax.grad(reward_of_onehot)

    def body(carry, i):
        tokens_t, _ = carry
        t_1, t_2 = ts[i], ts[i + 1]
        logits = model_logits_fn(tokens_t, None).astype(jnp.float32)
        pred = jnp.argmax(logits.at[..., cfg.mask_index].set(-1e9), axis=-1)
        q_xs = _step_probs(logits, tokens_t, t_1, t_2, cfg.temp,
                           cfg.mask_index, cfg.num_tokens)
        x_onehot = jax.nn.one_hot(tokens_t, cfg.num_tokens)
        x_grad = grad_fn(x_onehot)
        guidance = guidance_scale * (
            x_grad - x_grad[..., cfg.mask_index][..., None])
        q_xs = q_xs * jnp.exp(guidance)
        new = categorical_exp_race(jax.random.fold_in(rng, i), q_xs)
        copy = (tokens_t != cfg.mask_index)
        tokens_next = jnp.where(copy, tokens_t, new).astype(jnp.int32)
        return (tokens_next, pred), None

    (tokens, pred), _ = jax.lax.scan(body, (tokens0, tokens0),
                                     jnp.arange(cfg.num_timesteps - 1))
    return pred, tokens


def _resample(rng, weights, *arrays):
    """Multinomial particle resampling across the batch axis
    (reference: fm_utils.py:334-338 via np.random.choice)."""
    b = weights.shape[0]
    p = weights / jnp.sum(weights)
    idx = jax.random.choice(rng, b, shape=(b,), p=p)
    return tuple(a[idx] for a in arrays)


def euler_unmask_sampler_controlled_smc(model_logits_fn, reward_fn, rng,
                                        batch_shape,
                                        cfg: MaskingInterpolantConfig,
                                        alpha: float = 1.0,
                                        guidance_scale: Optional[float] = None):
    """SMC / TDS reward-guided sampling (reference: fm_utils.py:272-424).

    With guidance_scale=None this is plain SMC: propose one Euler step, then
    resample particles with weights exp((R(x_{t-1}) - R(x_t))/alpha), where
    R scores the argmax-denoised completion. With a guidance_scale, proposals
    are CG-twisted and the weights divide out the proposal tilt (TDS)."""
    b, l = batch_shape
    ts = jnp.linspace(cfg.min_t, 1.0, cfg.num_timesteps)
    tokens0 = jnp.full((b, l), cfg.mask_index, jnp.int32)

    def reward_of_tokens(tokens):
        logits = model_logits_fn(tokens, None).astype(jnp.float32)
        x0 = jnp.argmax(logits, axis=-1)
        copy = (tokens != cfg.mask_index)
        improved = jnp.where(copy, tokens, x0)
        return reward_fn(jax.nn.one_hot(improved, cfg.num_tokens))

    def reward_of_onehot_grad(tokens_t):
        def f(x_onehot):
            expected_x0 = model_logits_fn(x_onehot, None)
            return reward_fn(expected_x0).mean()
        return jax.grad(f)(jax.nn.one_hot(tokens_t, cfg.num_tokens))

    def body(carry, i):
        tokens_t, _ = carry
        t_1, t_2 = ts[i], ts[i + 1]
        step_rng = jax.random.fold_in(rng, i)
        r1, r2 = jax.random.split(step_rng)
        logits = model_logits_fn(tokens_t, None).astype(jnp.float32)
        pred = jnp.argmax(logits.at[..., cfg.mask_index].set(-1e9), axis=-1)
        q_xs = _step_probs(logits, tokens_t, t_1, t_2, cfg.temp,
                           cfg.mask_index, cfg.num_tokens)
        if guidance_scale is not None:
            x_grad = reward_of_onehot_grad(tokens_t)
            guidance = guidance_scale * (
                x_grad - x_grad[..., cfg.mask_index][..., None])
            q_xs = q_xs * jnp.exp(guidance)
        new = categorical_exp_race(r1, q_xs)
        copy = (tokens_t != cfg.mask_index)
        tokens_next = jnp.where(copy, tokens_t, new).astype(jnp.int32)

        log_w = (reward_of_tokens(tokens_next) - reward_of_tokens(tokens_t)) / alpha
        if guidance_scale is not None:
            tilt = jnp.take_along_axis(jnp.exp(guidance), new[..., None],
                                       axis=-1)[..., 0]
            tilt = jnp.where(copy, 1.0, tilt)
            log_w = log_w - jnp.sum(jnp.log(tilt), axis=-1)
        weights = jnp.exp(log_w - jnp.max(log_w))
        (tokens_next, pred) = _resample(r2, weights, tokens_next, pred)
        return (tokens_next, pred), None

    (tokens, pred), _ = jax.lax.scan(body, (tokens0, tokens0),
                                     jnp.arange(cfg.num_timesteps - 1))
    return pred, tokens


def gumbel_softmax_sampler(model_logits_fn, rng, batch_shape,
                           cfg: MaskingInterpolantConfig,
                           truncate_steps: int,
                           gumbel_softmax_temp: float = 1.0):
    """Differentiable sampler: hard steps until the last `truncate_steps`,
    then gumbel-softmax relaxed steps with a straight-through argmax output
    (reference: fm_utils.py:145-212). model_logits_fn takes soft one-hots."""
    b, l = batch_shape
    v = cfg.num_tokens
    ts = jnp.linspace(cfg.min_t, 1.0, cfg.num_timesteps)
    x0 = jax.nn.one_hot(jnp.full((b, l), cfg.mask_index, jnp.int32), v)

    def body(carry, i):
        x_t = carry  # [B,L,V] soft one-hot
        t_1, t_2 = ts[i], ts[i + 1]
        step_rng = jax.random.fold_in(rng, i)
        logits = model_logits_fn(x_t, None).astype(jnp.float32)
        tokens_argmax = jnp.argmax(x_t, axis=-1)
        q_xs = _step_probs(logits, tokens_argmax, t_1, t_2, cfg.temp,
                           cfg.mask_index, v)
        hard_phase = i < (cfg.num_timesteps - truncate_steps)

        # hard branch: categorical draw, stop-gradient
        new_hard = jax.nn.one_hot(categorical_exp_race(step_rng, q_xs), v)
        copy_hard = (tokens_argmax != cfg.mask_index)[..., None]
        x_hard = jax.lax.stop_gradient(
            jnp.where(copy_hard, x_t, new_hard))

        # soft branch: gumbel-softmax relaxation
        e = 1e-10 - jnp.log(jax.random.uniform(step_rng, q_xs.shape) + 1e-10)
        soft = jax.nn.softmax(
            (jnp.log(q_xs + 1e-8) - jnp.log(e)) / gumbel_softmax_temp, axis=-1)
        copy_soft = 1.0 - x_t[..., cfg.mask_index][..., None]
        x_soft = x_t * copy_soft + soft * (1.0 - copy_soft)

        x_next = jnp.where(hard_phase, x_hard, x_soft)
        return x_next, None

    x, _ = jax.lax.scan(body, x0, jnp.arange(cfg.num_timesteps - 1))
    # straight-through: forward pass argmax (excluding mask), gradient soft
    hard = jax.nn.one_hot(jnp.argmax(x[..., :-1], axis=-1), v)
    return x + jax.lax.stop_gradient(hard - x)

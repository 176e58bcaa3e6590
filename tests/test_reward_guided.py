"""Reward-guided discrete sampling: CG, SMC, TDS, and the differentiable
gumbel-softmax sampler."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reed_tpu.diffusion.discrete import (
    MASK_TOKEN_INDEX,
    MaskingInterpolantConfig,
    euler_unmask_sampler_controlled_cg,
    euler_unmask_sampler_controlled_smc,
    gumbel_softmax_sampler,
)

CFG = MaskingInterpolantConfig(num_timesteps=32, min_t=0.01, temp=1.0)


def _two_mode_model(tokens_or_onehot, cls):
    """Model that weakly prefers token 3 but gives token 5 similar mass."""
    if tokens_or_onehot.ndim == 3:
        shape = tokens_or_onehot.shape[:2]
    else:
        shape = tokens_or_onehot.shape
    base = jnp.full(shape + (22,), -8.0)
    base = base.at[..., 3].set(2.0)
    base = base.at[..., 5].set(2.0)
    return base


def _reward_prefers_5(x_onehot):
    # reward = mean prob/indicator of token 5
    return x_onehot[..., 5].mean(axis=-1)


def test_cg_guidance_shifts_distribution():
    # CG differentiates reward(model(x_onehot)) wrt x_onehot, so the model
    # must depend on its input for the classifier gradient to be nonzero
    def model(x, cls):
        if x.ndim == 2:
            x = jax.nn.one_hot(x, 22)
        base = jnp.full(x.shape[:2] + (22,), -8.0)
        base = base.at[..., 3].set(2.0).at[..., 5].set(2.0)
        return base + 5.0 * x.astype(jnp.float32)

    def reward(logits):
        return logits[..., 5].mean(axis=-1)

    rng = jax.random.PRNGKey(0)
    pred_u, tokens_u = euler_unmask_sampler_controlled_cg(
        model, reward, rng, (8, 24), CFG, guidance_scale=0.0)
    pred_g, tokens_g = euler_unmask_sampler_controlled_cg(
        model, reward, rng, (8, 24), CFG, guidance_scale=300.0)
    frac5_u = float((tokens_u == 5).mean())
    frac5_g = float((tokens_g == 5).mean())
    # guidance toward token 5 must raise its frequency
    assert frac5_g > frac5_u + 0.1


def test_smc_resampling_shifts_distribution():
    rng = jax.random.PRNGKey(0)
    _, tokens_plain = euler_unmask_sampler_controlled_smc(
        _two_mode_model, _reward_prefers_5, rng, (16, 16), CFG, alpha=1e9)
    _, tokens_smc = euler_unmask_sampler_controlled_smc(
        _two_mode_model, _reward_prefers_5, rng, (16, 16), CFG, alpha=0.01)
    # low temperature (alpha) resampling concentrates on high-reward particles
    assert float((tokens_smc == 5).mean()) >= float(
        (tokens_plain == 5).mean())


def test_tds_runs_and_is_finite():
    rng = jax.random.PRNGKey(0)
    pred, tokens = euler_unmask_sampler_controlled_smc(
        _two_mode_model, _reward_prefers_5, rng, (4, 12), CFG, alpha=0.5,
        guidance_scale=5.0)
    assert tokens.shape == (4, 12)
    assert int(tokens.max()) < 22


def _input_dependent_two_mode_model(x, cls):
    """Two near-equal modes (tokens 3 and 5) with input dependence, so the
    CG/TDS twisting gradient d reward/d x_onehot is nonzero (a constant
    model has zero classifier gradient and TDS degenerates to SMC)."""
    if x.ndim == 2:
        x = jax.nn.one_hot(x, 22)
    base = jnp.full(x.shape[:2] + (22,), -8.0)
    base = base.at[..., 3].set(2.0).at[..., 5].set(2.0)
    return base + 5.0 * x.astype(jnp.float32)


def _reward_logits_5(logits):
    return logits[..., 5].mean(axis=-1)


def _frac5(sampler_kwargs, n_seeds=5, particles=16, length=16):
    total = 0.0
    for seed in range(n_seeds):
        _, tokens = euler_unmask_sampler_controlled_smc(
            _input_dependent_two_mode_model, _reward_logits_5,
            jax.random.PRNGKey(seed), (particles, length), CFG,
            **sampler_kwargs)
        total += float((tokens == 5).mean())
    return total / n_seeds


def test_tds_concentrates_on_rewarded_mode():
    """Twisted SMC (reference: fm_utils.py:346-424) must shift mass onto
    the rewarded mode vs unguided sampling at equal particle count.
    'Unguided' = alpha=1e9 (uniform weights, resampling a no-op in
    distribution) and no proposal twist."""
    frac_unguided = _frac5(dict(alpha=1e9, guidance_scale=None))
    frac_tds = _frac5(dict(alpha=0.05, guidance_scale=20.0))
    assert frac_tds > frac_unguided + 0.2, (frac_tds, frac_unguided)
    # the unguided two-mode model splits mass ~evenly
    assert 0.3 < frac_unguided < 0.7


def test_tds_beats_plain_smc_at_small_particle_count():
    """TDS's raison d'être: the CG-twisted proposal finds the rewarded mode
    even when there are too few particles for resampling alone to do it.
    At 4 particles, plain SMC relies on luck-of-the-draw; TDS tilts every
    proposal toward the reward (reference: fm_utils.py:346-424 vs 272-344)."""
    kwargs = dict(n_seeds=8, particles=4, length=16)
    frac_smc = _frac5(dict(alpha=0.05, guidance_scale=None), **kwargs)
    frac_tds = _frac5(dict(alpha=0.05, guidance_scale=20.0), **kwargs)
    assert frac_tds > frac_smc + 0.05, (frac_tds, frac_smc)


def test_gumbel_softmax_sampler_differentiable():
    cfg = MaskingInterpolantConfig(num_timesteps=8, min_t=0.01, temp=1.0)

    def loss(bias):
        def model(x_onehot, cls):
            base = jnp.full(x_onehot.shape[:2] + (22,), -8.0)
            return base + bias  # bias over vocab, learnable

        out = gumbel_softmax_sampler(model, jax.random.PRNGKey(0), (2, 8),
                                     cfg, truncate_steps=4,
                                     gumbel_softmax_temp=1.0)
        return out[..., 5].mean()

    bias = jnp.zeros((22,))
    g = jax.grad(loss)(bias)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).max()) > 0  # gradient flows through sampling


def test_gumbel_sampler_output_is_onehot():
    cfg = MaskingInterpolantConfig(num_timesteps=8, min_t=0.01, temp=1.0)

    def model(x_onehot, cls):
        base = jnp.full(x_onehot.shape[:2] + (22,), -8.0)
        return base.at[..., 3].set(8.0)

    out = gumbel_softmax_sampler(model, jax.random.PRNGKey(0), (2, 8), cfg,
                                 truncate_steps=2)
    # forward value is a straight-through hard one-hot (no mask token)
    assert np.allclose(np.asarray(out.sum(-1)), 1.0, atol=1e-4)
    assert int(out[..., MASK_TOKEN_INDEX].sum()) == 0

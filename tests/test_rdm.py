"""RDM: schedule math, training, samplers recover a simple distribution."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reed_tpu.core.config import MeshConfig, OptimConfig
from reed_tpu.diffusion.rdm import (
    RDMConfig,
    RDMDiffusion,
    make_ldm_linear_betas,
    rep_normalization,
)
from reed_tpu.eval.rep_samplers import GtSampler, initialize_rep_sampler
from reed_tpu.train.rdm import RDMTrainConfig, RDMTrainer

TINY = RDMTrainConfig(
    channels=8, model_channels=32, bottleneck_channels=32, num_res_blocks=2,
    time_embed_dim=16, max_nodes=16,
    rdm=RDMConfig(channels=8, timesteps=50),
    batch_size=32,
    optim=OptimConfig(lr=2e-3, weight_decay=0.0, schedule="constant"),
    mesh=MeshConfig(data=1),
)


def test_beta_schedule():
    betas = make_ldm_linear_betas(1000)
    assert betas[0] == pytest.approx(0.0015)
    assert betas[-1] == pytest.approx(0.0195)
    assert np.all(np.diff(betas) > 0)


def test_q_sample_snr_endpoints():
    cfg = RDMConfig(channels=4, timesteps=1000)
    d = RDMDiffusion(cfg, lambda x, t, n: x)
    # alphas_cumprod decreasing, near 1 at t=0, near 0 at t=T
    acp = np.asarray(d.alphas_cumprod)
    assert acp[0] > 0.99 and acp[-1] < 0.01
    assert np.all(np.diff(acp) < 0)


def test_oracle_x0_ddim_recovers_mean():
    """With an oracle x0-model that always predicts mu, DDIM should land on
    mu (eta=0 deterministic path pulls x to the predicted x0)."""
    mu = jnp.array([1.0, -2.0, 0.5, 3.0])
    cfg = RDMConfig(channels=4, timesteps=100, parameterization="x0")
    d = RDMDiffusion(cfg, lambda x, t, n: jnp.broadcast_to(mu, x.shape))
    out = d.ddim_sample(jax.random.PRNGKey(0), (8, 4), None, num_steps=20,
                        eta=0.0)
    assert np.allclose(np.asarray(out), np.asarray(mu), atol=1e-3)


def test_oracle_p_sample_loop_recovers_mean():
    mu = jnp.array([1.0, -2.0, 0.5, 3.0])
    cfg = RDMConfig(channels=4, timesteps=100, parameterization="x0")
    d = RDMDiffusion(cfg, lambda x, t, n: jnp.broadcast_to(mu, x.shape))
    out = d.p_sample_loop(jax.random.PRNGKey(0), (256, 4), None)
    assert np.allclose(np.asarray(out).mean(0), np.asarray(mu), atol=0.1)


@pytest.mark.slow
def test_rdm_training_loss_decreases():
    trainer = RDMTrainer(TINY)
    state = trainer.init_state()
    batch = trainer.synthetic_batch()
    losses = []
    with trainer.mesh:
        for _ in range(20):
            state, metrics = trainer.train_step(state, batch,
                                                jax.random.PRNGKey(0))
            losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]


def test_pc_sampler_runs():
    mu = jnp.zeros((4,))
    cfg = RDMConfig(channels=4, timesteps=20, parameterization="x0")
    d = RDMDiffusion(cfg, lambda x, t, n: jnp.broadcast_to(mu, x.shape))
    out = d.pc_sample(jax.random.PRNGKey(0), (8, 4), None,
                      n_corrector_steps=1, snr=0.01, inv_temp=1.0)
    assert np.all(np.isfinite(np.asarray(out)))


def test_gt_sampler_matches_atom_counts():
    rng = np.random.default_rng(0)
    reps = rng.standard_normal((50, 8)).astype(np.float32)
    num_atoms = np.repeat(np.arange(5, 15), 5)
    sampler = GtSampler(reps, num_atoms)
    out = sampler.sample(rng, np.array([5, 9, 14]))
    assert out.shape == (3, 8)
    # output is standardized per sample
    assert np.allclose(np.asarray(out).mean(1), 0.0, atol=1e-5)
    assert np.allclose(np.asarray(out).std(1), 1.0, atol=1e-4)


def test_initialize_rep_sampler_factory():
    rng = np.random.default_rng(0)
    reps = rng.standard_normal((10, 8)).astype(np.float32)
    s = initialize_rep_sampler("GtSampler", reps=reps,
                               num_atoms=np.full(10, 7))
    assert isinstance(s, GtSampler)
    with pytest.raises(ValueError):
        initialize_rep_sampler("NopeSampler")


def test_rep_normalization():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((4, 16)) * 5 + 3)
    out = rep_normalization(x)
    assert np.allclose(np.asarray(out).mean(1), 0, atol=1e-5)
    assert np.allclose(np.asarray(out).std(1), 1, atol=1e-4)

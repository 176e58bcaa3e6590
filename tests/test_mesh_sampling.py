"""Samplers on a multi-device mesh: the sharded FID-generation scan and the
semla integrator must produce the SAME samples as a single-device run at the
same PRNG key (per-sample computation is batch-independent, so sharding the
batch axis is a pure layout change).

This is the TPU equivalent of the reference's rank-sharded 50K FID
generation (image/generate.py:106-166) — its one distributed-inference
capability — which previously had no multi-device correctness signal.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reed_tpu.parallel.mesh import batch_sharding, make_mesh, replicated


def _assert_matches(sharded, single, what):
    sharded, single = np.asarray(sharded), np.asarray(single)
    if not np.array_equal(sharded, single):
        # CPU XLA may reassociate differently per layout; keep a tight
        # numeric bound and report the drift
        # measured drift: <=2e-4 on 1/1728 elements after 10 Euler steps
        # of a random-weight model (layout-dependent reassociation,
        # amplified step-over-step)
        np.testing.assert_allclose(
            sharded, single, rtol=1e-3, atol=1e-3,
            err_msg=f"{what}: sharded vs single-device mismatch")


@pytest.mark.slow
def test_fid_generation_matches_single_device_on_mesh():
    from reed_tpu.eval.fid import FIDGenConfig, generate_samples
    from reed_tpu.models.sit import create_sit

    model = create_sit("SiT-S/4", input_size=8, in_channels=4,
                       num_classes=16, encoder_depth=2,
                       z_dims=(16,), z_types=("i",))
    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((2, 8, 8, 4), jnp.float32)
    variables = model.init({"params": rng, "label_dropout": rng},
                           x0, jnp.zeros((2,)), jnp.zeros((2,), jnp.int32),
                           train=False)

    def model_fn(params, x, t, y):
        v, _ = model.apply(params, x, t, y, train=False)
        return v

    cfg = FIDGenConfig(num_samples=16, batch_size=16, num_classes=16,
                       latent_size=8, latent_channels=4, mode="sde",
                       num_steps=4, cfg_scale=1.0, seed=3)
    single = generate_samples(model_fn, variables, cfg)

    mesh = make_mesh(data=4, fsdp=2, tensor=1)
    sharded = generate_samples(model_fn, variables, cfg, mesh=mesh)
    assert sharded.shape == single.shape == (16, 8, 8, 4)
    _assert_matches(sharded, single, "fid-generation")


@pytest.mark.slow
def test_semla_integrator_matches_single_device_on_mesh():
    from reed_tpu.core.config import MeshConfig, OptimConfig
    from reed_tpu.diffusion.molecule_fm import IntegratorConfig
    from reed_tpu.train.molecule_semla import SemlaTrainConfig, SemlaTrainer

    # continuous ('linear') categorical strategies: the default
    # uniform-sample draws are discrete, so a 1e-7 layout-induced float
    # drift near a tie would flip a draw and cascade — the linear path
    # keeps the whole integration continuous and comparable
    cfg = SemlaTrainConfig(d_model=32, d_message=16, n_layers=1,
                           n_coord_sets=4, d_message_hidden=16, d_edge=16,
                           n_attn_heads=4, size_emb=8, d_rep=8,
                           batch_size=8, optim=OptimConfig(lr=1e-3),
                           integrator=IntegratorConfig(
                               steps=4, type_strategy="linear",
                               bond_strategy="linear"),
                           mesh=MeshConfig(data=4, fsdp=2, tensor=1,
                                           fsdp_min_size=0))
    trainer = SemlaTrainer(cfg)
    state = trainer.init_state()
    params = jax.device_get(state.params)

    rng_np = np.random.default_rng(0)
    mask = np.zeros((8, 12), np.float32)
    for i, n in enumerate([12, 9, 7, 12, 5, 10, 12, 8]):
        mask[i, :n] = 1.0
    prior = trainer.sample_prior(rng_np, mask)
    rep = jnp.zeros((8, cfg.d_rep), jnp.float32)
    key = jax.random.PRNGKey(7)

    single = trainer.generate(params, key, dict(prior), rep=rep)

    shard = batch_sharding(trainer.mesh)
    prior_sharded = {k: jax.device_put(v, shard) for k, v in prior.items()}
    params_repl = jax.device_put(params, replicated(trainer.mesh))
    rep_sharded = jax.device_put(rep, shard)
    with trainer.mesh:
        sharded = trainer.generate(params_repl, key, prior_sharded,
                                   rep=rep_sharded)

    for k in single:
        _assert_matches(sharded[k], single[k], f"semla-generate[{k}]")

"""End-to-end train-step tests on a virtual 8-device mesh (dp×fsdp×tp)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reed_tpu.core.config import CurriculumConfig, MeshConfig, OptimConfig
from reed_tpu.diffusion.continuous import FlowMatchingLossConfig
from reed_tpu.train.image import ImageTrainConfig, ImageTrainer

TINY = ImageTrainConfig(
    model="SiT-S/4",
    input_size=8,
    in_channels=4,
    num_classes=10,
    encoder_depth=2,
    z_dims=(16,),
    z_types=("i",),
    projector_dim=32,
    compute_dtype="float32",
    batch_size=8,
    loss=FlowMatchingLossConfig(enc_names=("dinov2",), loss_weights=(1.0,)),
    optim=OptimConfig(lr=1e-3, grad_clip=1.0),
    curriculum=CurriculumConfig(proj_coeff=0.5, diffusion_warmup_steps=0,
                                max_steps=100),
)


def _tiny_trainer(mesh_cfg=MeshConfig()):
    cfg = TINY.__class__(**{**TINY.__dict__, "mesh": mesh_cfg})
    return ImageTrainer(cfg)


@pytest.mark.slow
def test_single_device_loss_decreases():
    trainer = _tiny_trainer(MeshConfig(data=1, fsdp=1, tensor=1))
    state = trainer.init_state()
    batch = trainer.synthetic_batch()
    losses = []
    with trainer.mesh:
        for _ in range(10):
            state, metrics = trainer.train_step(state, batch,
                                                jax.random.PRNGKey(0))
            losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
    assert int(state.step) == 10


@pytest.mark.slow
def test_dp_fsdp_tp_mesh_runs():
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    trainer = _tiny_trainer(MeshConfig(data=2, fsdp=2, tensor=2))
    state = trainer.init_state()
    batch = trainer.synthetic_batch()
    with trainer.mesh:
        state, metrics = trainer.train_step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    # params actually sharded: at least one leaf not fully replicated
    specs = jax.tree.leaves(
        jax.tree.map(lambda x: x.sharding.spec, state.params),
        is_leaf=lambda s: hasattr(s, "index") or True)
    assert any(any(ax is not None for ax in spec) for spec in specs
               if spec is not None)


@pytest.mark.slow
def test_dp_matches_single_device():
    """Same batch + same rng => (near-)identical metrics on 1 vs 8 devices."""
    t1 = _tiny_trainer(MeshConfig(data=1, fsdp=1, tensor=1))
    t8 = _tiny_trainer(MeshConfig(data=8, fsdp=1, tensor=1))
    s1, s8 = t1.init_state(), t8.init_state()
    b = t1.synthetic_batch()
    with t1.mesh:
        _, m1 = t1.train_step(s1, b, jax.random.PRNGKey(0))
    with t8.mesh:
        _, m8 = t8.train_step(s8, b, jax.random.PRNGKey(0))
    assert np.isclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-4)
    assert np.isclose(float(m1["denoising_loss"]), float(m8["denoising_loss"]),
                      rtol=1e-4)


@pytest.mark.slow
def test_ema_tracks_params():
    trainer = _tiny_trainer(MeshConfig(data=1, fsdp=1, tensor=1))
    state = trainer.init_state()
    batch = trainer.synthetic_batch()
    p0 = jax.tree.leaves(state.params)[0].copy()
    with trainer.mesh:
        for _ in range(3):
            state, _ = trainer.train_step(state, batch, jax.random.PRNGKey(0))
    p = jax.tree.leaves(state.params)[0]
    e = jax.tree.leaves(state.ema_params)[0]
    # EMA moved strictly less than params
    assert float(jnp.abs(e - p0).max()) < float(jnp.abs(p - p0).max())


@pytest.mark.slow
def test_curriculum_inside_step():
    cfg = TINY.__class__(**{
        **TINY.__dict__,
        "curriculum": CurriculumConfig(proj_coeff=1.0,
                                       start_diffusion_steps=5,
                                       diffusion_warmup_steps=10,
                                       max_steps=100),
        "mesh": MeshConfig(data=1, fsdp=1, tensor=1),
    })
    trainer = ImageTrainer(cfg)
    state = trainer.init_state()
    batch = trainer.synthetic_batch()
    with trainer.mesh:
        _, metrics = trainer.train_step(state, batch, jax.random.PRNGKey(0))
    # step 0 < start_diffusion_steps -> denoising contributes 0
    assert float(metrics["diffusion_decay"]) == 0.0
    assert np.isclose(float(metrics["loss"]),
                      float(metrics["proj_loss"]), rtol=1e-5)


@pytest.mark.slow
def test_grad_accumulation():
    """With accum_steps=k, params change only every k steps and the k-step
    update matches averaged gradients."""
    cfg = TINY.__class__(**{
        **TINY.__dict__,
        "optim": OptimConfig(lr=1e-3, accum_steps=2),
        "mesh": MeshConfig(data=1, fsdp=1, tensor=1),
    })
    trainer = ImageTrainer(cfg)
    state = trainer.init_state()
    batch = trainer.synthetic_batch()
    p0 = jax.tree.leaves(state.params)[0].copy()
    p0 = np.asarray(p0)
    with trainer.mesh:
        state, _ = trainer.train_step(state, batch, jax.random.PRNGKey(0))
        # copy to host before the next step donates the buffer
        p1 = np.asarray(jax.tree.leaves(state.params)[0])
        state, _ = trainer.train_step(state, batch, jax.random.PRNGKey(0))
        p2 = np.asarray(jax.tree.leaves(state.params)[0])
    # first micro-step: accumulation only, params unchanged
    assert np.allclose(p0, p1)
    assert not np.allclose(p1, p2)


@pytest.mark.slow
def test_grad_accumulation_ema_and_curriculum_gating():
    """EMA must not decay on accumulation-only micro-steps, and curriculum
    schedules must see the optimizer step (micro // k), matching the
    reference's per-optimizer-step semantics."""
    cfg = TINY.__class__(**{
        **TINY.__dict__,
        "optim": OptimConfig(lr=1e-3, accum_steps=2),
        "curriculum": CurriculumConfig(proj_coeff=1.0,
                                       start_diffusion_steps=1,
                                       diffusion_warmup_steps=0,
                                       max_steps=100, ema_decay=0.5),
        "mesh": MeshConfig(data=1, fsdp=1, tensor=1),
    })
    trainer = ImageTrainer(cfg)
    state = trainer.init_state()
    batch = trainer.synthetic_batch()
    e0 = np.asarray(jax.tree.leaves(state.ema_params)[0])
    with trainer.mesh:
        state, m0 = trainer.train_step(state, batch, jax.random.PRNGKey(0))
        e1 = np.asarray(jax.tree.leaves(state.ema_params)[0])
        state, m1 = trainer.train_step(state, batch, jax.random.PRNGKey(0))
        e2 = np.asarray(jax.tree.leaves(state.ema_params)[0])
        state, m2 = trainer.train_step(state, batch, jax.random.PRNGKey(0))
    # micro-step 0 (accumulate only): EMA frozen
    assert np.allclose(e0, e1)
    # micro-step 1 (optimizer applies): EMA moves once
    assert not np.allclose(e1, e2)
    # curriculum: micro-steps 0 and 1 are optimizer step 0 (< start ->
    # diffusion off); micro-step 2 is optimizer step 1 (diffusion on)
    assert float(m0["diffusion_decay"]) == 0.0
    assert float(m1["diffusion_decay"]) == 0.0
    assert float(m2["diffusion_decay"]) > 0.0


@pytest.mark.slow
def test_ema_every_k_matches_per_step_average():
    """ema_every=k with decay^k must track the same average as per-step EMA
    (same fixed batch => params converge identically)."""
    base = {**TINY.__dict__, "mesh": MeshConfig(data=1, fsdp=1, tensor=1)}
    c1 = TINY.__class__(**{**base, "curriculum": CurriculumConfig(
        proj_coeff=0.5, diffusion_warmup_steps=0, max_steps=100,
        ema_decay=0.9, ema_every=1)})
    c4 = TINY.__class__(**{**base, "curriculum": CurriculumConfig(
        proj_coeff=0.5, diffusion_warmup_steps=0, max_steps=100,
        ema_decay=0.9, ema_every=4)})
    t1, t4 = ImageTrainer(c1), ImageTrainer(c4)
    s1, s4 = t1.init_state(), t4.init_state()
    batch = t1.synthetic_batch()
    with t1.mesh:
        for _ in range(8):
            s1, _ = t1.train_step(s1, batch, jax.random.PRNGKey(0))
    with t4.mesh:
        for _ in range(8):
            s4, _ = t4.train_step(s4, batch, jax.random.PRNGKey(0))
    p1 = np.asarray(jax.tree.leaves(s1.params)[1])
    p4 = np.asarray(jax.tree.leaves(s4.params)[1])
    np.testing.assert_allclose(p1, p4, rtol=1e-5)  # params identical
    e1 = np.asarray(jax.tree.leaves(s1.ema_params)[1])
    e4 = np.asarray(jax.tree.leaves(s4.ema_params)[1])
    e0 = np.asarray(jax.tree.leaves(t4.init_state().ema_params)[1])
    # both EMAs moved, and the k-step EMA stays close to the per-step one
    assert not np.allclose(e4, e0)
    denom = np.abs(e1 - e0).max() + 1e-12
    assert np.abs(e1 - e4).max() / denom < 0.35

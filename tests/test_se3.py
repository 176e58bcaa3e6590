"""SO(3) utils, SE(3) interpolant, IPA model, multiflow trainer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reed_tpu.core.config import MeshConfig, OptimConfig
from reed_tpu.diffusion.se3 import (
    MASK_TOKEN_INDEX,
    SE3InterpolantConfig,
    corrupt_aatypes,
    corrupt_batch,
    corrupt_rotmats,
    corrupt_trans,
)
from reed_tpu.ops.so3 import (
    calc_rot_vf,
    geodesic_t,
    rotmat_to_rotvec,
    rotvec_to_rotmat,
    sample_igso3,
    sample_uniform_rotations,
)

CFG = SE3InterpolantConfig(num_timesteps=6)


def _is_rotation(mats, atol=1e-4):
    eye = np.eye(3)
    rtr = np.asarray(mats @ np.swapaxes(mats, -1, -2))
    return (np.allclose(rtr, eye, atol=atol)
            and np.allclose(np.linalg.det(np.asarray(mats)), 1.0, atol=atol))


def test_rotvec_roundtrip():
    rng = np.random.default_rng(0)
    vec = rng.standard_normal((32, 3))
    # keep |v| < pi: the log map returns the canonical (shortest) rotvec
    vec = vec / np.linalg.norm(vec, axis=-1, keepdims=True) \
        * rng.uniform(0.05, 3.0, (32, 1))
    mats = rotvec_to_rotmat(jnp.asarray(vec, jnp.float32))
    assert _is_rotation(mats)
    back = np.asarray(rotmat_to_rotvec(mats))
    assert np.allclose(back, vec, atol=1e-3)


def test_geodesic_endpoints():
    rng = jax.random.PRNGKey(0)
    r0 = sample_uniform_rotations(rng, (8,))
    r1 = sample_uniform_rotations(jax.random.fold_in(rng, 1), (8,))
    g0 = geodesic_t(jnp.zeros((8, 1)), r1, r0)
    g1 = geodesic_t(jnp.ones((8, 1)), r1, r0)
    assert np.allclose(np.asarray(g0), np.asarray(r0), atol=1e-4)
    assert np.allclose(np.asarray(g1), np.asarray(r1), atol=1e-3)


def test_rot_vf_consistency():
    # Exp_{R_t}(Log_{R_t}(R1)) == R1
    rng = jax.random.PRNGKey(0)
    rt = sample_uniform_rotations(rng, (4,))
    r1 = sample_uniform_rotations(jax.random.fold_in(rng, 1), (4,))
    vf = calc_rot_vf(rt, r1)
    rec = rt @ rotvec_to_rotmat(vf)
    assert np.allclose(np.asarray(rec), np.asarray(r1), atol=1e-3)


def test_igso3_samples_are_rotations():
    mats = sample_igso3(jax.random.PRNGKey(0), 1.5, (16,))
    assert _is_rotation(mats)
    # small sigma concentrates near identity
    near = sample_igso3(jax.random.PRNGKey(1), 0.05, (16,))
    angles = np.linalg.norm(np.asarray(rotmat_to_rotvec(near)), axis=-1)
    assert angles.mean() < 0.3


def test_corrupt_trans_endpoints():
    rng = jax.random.PRNGKey(0)
    trans1 = jax.random.normal(rng, (2, 8, 3))
    mask = jnp.ones((2, 8))
    t1 = corrupt_trans(rng, CFG, trans1, jnp.ones((2, 1)), mask)
    assert np.allclose(np.asarray(t1), np.asarray(trans1), atol=1e-5)


def test_corrupt_rotmats_valid():
    rng = jax.random.PRNGKey(0)
    r1 = sample_uniform_rotations(rng, (2, 8))
    mask = jnp.ones((2, 8))
    rt = corrupt_rotmats(rng, CFG, r1, jnp.full((2, 1), 0.5), mask)
    assert _is_rotation(rt, atol=1e-3)
    # t=1 returns data rotations
    rt1 = corrupt_rotmats(rng, CFG, r1, jnp.ones((2, 1)), mask)
    assert np.allclose(np.asarray(rt1), np.asarray(r1), atol=1e-3)


def test_corrupt_aatypes_masking():
    rng = jax.random.PRNGKey(0)
    aatypes = jnp.zeros((4, 64), jnp.int32)
    mask = jnp.ones((4, 64))
    out = corrupt_aatypes(rng, CFG, aatypes, jnp.full((4, 1), 0.25), mask)
    frac = float((out == MASK_TOKEN_INDEX).mean())
    assert abs(frac - 0.75) < 0.1


@pytest.mark.slow
def test_multiflow_train_and_sample():
    from reed_tpu.train.multiflow import (MultiflowTrainConfig,
                                          MultiflowTrainer)

    cfg = MultiflowTrainConfig(
        c_s=32, c_z=16, num_blocks=2, batch_size=2, max_len=12,
        aatypes_loss_weight=0.5,
        interpolant=SE3InterpolantConfig(num_timesteps=4),
        optim=OptimConfig(lr=1e-3, grad_clip=1.0),
        mesh=MeshConfig(data=1))
    trainer = MultiflowTrainer(cfg)
    state = trainer.init_state()
    batch = trainer.synthetic_batch()
    losses, cat_losses = [], []
    with trainer.mesh:
        for _ in range(8):
            state, metrics = trainer.train_step(state, batch,
                                                jax.random.PRNGKey(0))
            losses.append(float(metrics["loss"]))
            cat_losses.append(float(metrics["aatypes_loss"]))
    assert all(np.isfinite(losses))
    # the total is noisy (fresh random t each step); the aatype CE is the
    # stable signal and must decrease
    assert cat_losses[-1] < cat_losses[0]

    out = trainer.sample(state.params, jax.random.PRNGKey(1), 2, 12)
    assert out["trans"].shape == (2, 12, 3)
    assert _is_rotation(out["rotmats"], atol=1e-2)
    assert out["aatypes"].shape == (2, 12)
    assert int(out["aatypes"].max()) < MASK_TOKEN_INDEX  # all unmasked


def test_ipa_point_attention_gram_identity():
    """The factored point-attention logits (|q|^2+|k|^2-2<q,k>) equal the
    direct sum of squared displacements (ipa_pytorch.py:390-400)."""
    import numpy as np

    rng = jax.random.PRNGKey(4)
    b, n, h, p = 2, 9, 4, 5
    q_pts = jax.random.normal(jax.random.fold_in(rng, 0), (b, n, h, p, 3)) * 3
    k_pts = jax.random.normal(jax.random.fold_in(rng, 1), (b, n, h, p, 3)) * 3

    direct = jnp.sum((q_pts[:, :, None] - k_pts[:, None]) ** 2,
                     axis=(-1, -2))                       # [B,N,N,H]
    direct = jnp.transpose(direct, (0, 3, 1, 2))          # [B,H,N,N]

    qn = jnp.transpose(jnp.sum(q_pts ** 2, axis=(-1, -2)), (0, 2, 1))
    kn = jnp.transpose(jnp.sum(k_pts ** 2, axis=(-1, -2)), (0, 2, 1))
    cross = jnp.einsum("bihpd,bjhpd->bhij", q_pts, k_pts)
    factored = qn[..., :, None] + kn[..., None, :] - 2.0 * cross

    np.testing.assert_allclose(np.asarray(factored), np.asarray(direct),
                               atol=1e-4)

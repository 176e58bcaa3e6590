"""AF2 residue constants, atom37 construction, SE(3) batch-OT prior."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from reed_tpu.ops import residue_constants as rc
from reed_tpu.ops.so3 import sample_uniform_rotations


def test_tables_shapes_and_masks():
    assert len(rc.RESTYPES) == 20
    assert len(rc.ATOM37_NAMES) == 37
    assert rc.RESTYPE_ATOM37_MASK.shape == (21, 37)
    assert rc.RESTYPE_ATOM14_MASK.shape == (21, 14)
    # GLY has no CB: 4 atoms; ALA has 5; TRP has 14
    gly = rc.RESTYPE_ORDER["G"]
    trp = rc.RESTYPE_ORDER["W"]
    assert rc.RESTYPE_ATOM14_MASK[gly].sum() == 4
    assert rc.RESTYPE_ATOM14_MASK[0].sum() == 5
    assert rc.RESTYPE_ATOM14_MASK[trp].sum() == 14
    # X row all zero
    assert rc.RESTYPE_ATOM37_MASK[20].sum() == 0


def test_default_frames_orthonormal():
    f = rc.RESTYPE_RIGID_GROUP_DEFAULT_FRAME
    rots = f[:20, :, :3, :3].reshape(-1, 3, 3)
    eye = np.einsum("nij,nkj->nik", rots, rots)
    assert np.allclose(eye, np.eye(3), atol=1e-5)
    assert np.allclose(np.linalg.det(rots), 1.0, atol=1e-5)


def test_to_atom37_geometry():
    """Identity frame at origin must reproduce the idealized ALA backbone
    with O imputed at 1.23 A from C (reference all_atom.py:20-27 +
    utils.py adjust_oxygen_pos)."""
    b, n = 2, 5
    trans = jnp.zeros((b, n, 3))
    # spread residues along x so the O imputation has a next-N direction
    trans = trans + jnp.arange(n)[None, :, None] * jnp.array([3.8, 0.0, 0.0])
    rot = jnp.broadcast_to(jnp.eye(3), (b, n, 3, 3))
    a37 = rc.to_atom37(trans, rot)
    assert a37.shape == (b, n, 37, 3)
    # N, CA, C, CB at the ALA rigid-group offsets
    np.testing.assert_allclose(np.asarray(a37[0, 0, 1]), np.asarray(trans)[0, 0],
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(a37[0, 0, 0] - trans[0, 0]),
                               [-0.525, 1.363, 0.0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(a37[0, 0, 3] - trans[0, 0]),
                               [-0.529, -0.774, -1.205], atol=1e-5)
    # imputed O: 1.23 A from C for every residue, including the terminal one
    d = np.linalg.norm(np.asarray(a37[..., 4, :] - a37[..., 2, :]), axis=-1)
    np.testing.assert_allclose(d, 1.23, atol=1e-4)
    # O lies in the CA-C-nextN plane for non-terminal residues
    ca, c = np.asarray(a37[0, 0, 1]), np.asarray(a37[0, 0, 2])
    o, next_n = np.asarray(a37[0, 0, 4]), np.asarray(a37[0, 1, 0])
    normal = np.cross(c - ca, next_n - c)
    normal /= np.linalg.norm(normal)
    assert abs(np.dot(o - c, normal)) < 1e-4


def test_to_atom37_equivariance():
    rng = jax.random.PRNGKey(0)
    b, n = 1, 6
    trans = jax.random.normal(jax.random.fold_in(rng, 1), (b, n, 3)) * 5
    rots = sample_uniform_rotations(jax.random.fold_in(rng, 2), (b, n))
    a37 = rc.to_atom37(trans, rots)
    g = np.asarray(sample_uniform_rotations(jax.random.fold_in(rng, 3),
                                            (1,))[0])
    a37_rot = rc.to_atom37(jnp.einsum("ij,bnj->bni", g, trans),
                           jnp.einsum("ij,bnjk->bnik", g, rots))
    np.testing.assert_allclose(np.einsum("ij,bnaj->bnai", g,
                                         np.asarray(a37)),
                               np.asarray(a37_rot), atol=1e-4)


def test_frames_to_atom14_arg():
    """ARG all-atom construction at zero torsions: every unmasked atom
    placed, chi chain composes finitely."""
    b, n = 1, 3
    arg = rc.RESTYPE_ORDER["R"]
    aatypes = jnp.full((b, n), arg, jnp.int32)
    trans = jnp.zeros((b, n, 3))
    rot = jnp.broadcast_to(jnp.eye(3), (b, n, 3, 3))
    frot, ftrans = rc.torsion_frames(rot, trans, jnp.zeros((b, n, 7, 2)),
                                     aatypes)
    assert frot.shape == (b, n, 8, 3, 3)
    pos, mask = rc.frames_to_atom14(frot, ftrans, aatypes)
    assert mask[0, 0].sum() == 11  # ARG has 11 heavy atoms
    assert np.isfinite(np.asarray(pos)).all()
    # backbone N/CA/C in group 0 -> exactly the idealized positions
    np.testing.assert_allclose(np.asarray(pos[0, 0, 1]), [0, 0, 0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(pos[0, 0, 0]),
                               [-0.524, 1.362, 0.0], atol=1e-4)


def test_batch_ot_trans_prior_reduces_cost():
    from reed_tpu.diffusion.se3 import batch_ot_trans_prior

    rng = np.random.default_rng(0)
    b, n = 6, 24
    steps = rng.standard_normal((b, n, 3)) * 1.5
    trans_1 = np.cumsum(steps, 1)
    trans_1 -= trans_1.mean(1, keepdims=True)
    mask = np.ones((b, n), np.float32)
    mask[:, -4:] = 0.0
    coupled = batch_ot_trans_prior(rng, trans_1, mask, trans_scale=10.0)
    assert coupled.shape == (b, n, 3)
    # coupled prior must beat a fresh unaligned prior in mean distance
    fresh = rng.standard_normal((b, n, 3)) * 10.0
    d_coupled = np.linalg.norm((coupled - trans_1) * mask[..., None],
                               axis=-1).sum() / mask.sum()
    d_fresh = np.linalg.norm((fresh - trans_1) * mask[..., None],
                             axis=-1).sum() / mask.sum()
    assert d_coupled < d_fresh


@pytest.mark.slow
def test_multiflow_trains_with_batch_ot():
    from reed_tpu.core.config import MeshConfig, OptimConfig
    from reed_tpu.diffusion.se3 import SE3InterpolantConfig
    from reed_tpu.train.multiflow import (MultiflowTrainConfig,
                                          MultiflowTrainer)

    cfg = MultiflowTrainConfig(
        c_s=16, c_z=8, num_blocks=1, batch_size=2, max_len=8,
        interpolant=SE3InterpolantConfig(trans_batch_ot=True),
        optim=OptimConfig(lr=1e-3),
        mesh=MeshConfig(data=1, fsdp=1, tensor=1))
    trainer = MultiflowTrainer(cfg)
    state = trainer.init_state()
    batch = trainer.synthetic_batch()
    assert "trans_0" in batch
    with trainer.mesh:
        state, metrics = trainer.train_step(state, batch,
                                            jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))


def test_pdb_roundtrip_via_atom37(tmp_path):
    """write_pdb_backbone -> parse_pdb_backbone roundtrips N/CA/C/O."""
    from reed_tpu.eval.protein_metrics import (parse_pdb_backbone,
                                               write_pdb_backbone)

    rng = jax.random.PRNGKey(0)
    n = 8
    trans = jax.random.normal(jax.random.fold_in(rng, 1), (1, n, 3)) * 4
    rots = sample_uniform_rotations(jax.random.fold_in(rng, 2), (1, n))
    a37 = np.asarray(rc.to_atom37(trans, rots))[0]
    aatypes = np.asarray(jax.random.randint(rng, (n,), 0, 20))
    path = str(tmp_path / "bb.pdb")
    write_pdb_backbone(path, a37, aatypes=aatypes)
    back = parse_pdb_backbone(path)  # [L, 4, 3] N/CA/C/O
    assert back.shape == (n, 4, 3)
    # atom37 order is N,CA,C,CB,O; parse returns N,CA,C,O
    np.testing.assert_allclose(back[:, :3], a37[:, :3], atol=2e-3)
    np.testing.assert_allclose(back[:, 3], a37[:, 4], atol=2e-3)

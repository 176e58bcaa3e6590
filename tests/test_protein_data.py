"""Protein data pipeline + eval metrics."""

import numpy as np
import pytest

from reed_tpu.data.protein import (
    DEFAULT_BUCKETS,
    TOKEN_INDEX,
    bucket_for_length,
    featurize,
    synthetic_entries,
    token_bucket_batches,
)
from reed_tpu.eval.protein_metrics import (
    backbone_rmsd,
    kabsch_rmsd,
    sequence_recovery,
    tokens_to_sequence,
)


def test_bucket_ladder():
    assert bucket_for_length(10) == 64
    assert bucket_for_length(64) == 64
    assert bucket_for_length(65) == 128
    assert bucket_for_length(500) == 256


def test_featurize_shapes_and_masks():
    rng = np.random.default_rng(0)
    dims = {"single": 8, "pair": 4, "structure": 8}
    entries = synthetic_entries(rng, 3, 10, 30, dims)
    batch = featurize(entries, 64, dims)
    assert batch["X"].shape == (3, 64, 4, 3)
    assert batch["S"].shape == (3, 64)
    assert batch["repr_pair"].shape == (3, 64, 64, 4)
    for i, e in enumerate(entries):
        n = len(e["seq"])
        assert batch["mask"][i, :n].all()
        assert not batch["mask"][i, n:].any()
        # padding tokens are 'X'
        assert (batch["S"][i, n:] == TOKEN_INDEX["X"]).all()


def test_token_bucket_batches_fixed_shapes():
    rng = np.random.default_rng(0)
    entries = synthetic_entries(rng, 24, 10, 250)
    shapes = set()
    total = 0
    for batch in token_bucket_batches(entries, token_budget=2048,
                                      shuffle_rng=rng):
        b, l = batch["S"].shape
        shapes.add(l)
        assert l in DEFAULT_BUCKETS
        assert b == max(1, 2048 // l)  # fixed batch size per bucket
        total += b
    assert total >= 24  # every entry appears (padding repeats allowed)


def test_sequence_recovery():
    pred = np.array([[0, 1, 2, 3]])
    true = np.array([[0, 1, 9, 3]])
    mask = np.array([[1, 1, 1, 0]])
    assert sequence_recovery(pred, true, mask) == pytest.approx(2 / 3)


def test_tokens_to_sequence():
    assert tokens_to_sequence([0, 1, 21]) == "ACZ"
    assert tokens_to_sequence([0, 1, 2], mask=[1, 0, 1]) == "AD"


def test_kabsch_rmsd_invariance():
    rng = np.random.default_rng(0)
    p = rng.standard_normal((12, 3))
    # rotation + translation of p -> rmsd 0
    q_mat, _ = np.linalg.qr(rng.standard_normal((3, 3)))
    if np.linalg.det(q_mat) < 0:
        q_mat[:, 0] *= -1
    q = p @ q_mat.T + np.array([5.0, -3.0, 2.0])
    assert kabsch_rmsd(p, q) == pytest.approx(0.0, abs=1e-8)
    # perturbation increases rmsd
    q2 = q + rng.standard_normal(q.shape) * 0.5
    assert kabsch_rmsd(p, q2) > 0.1


def test_backbone_rmsd_masked():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((10, 4, 3))
    mask = np.ones(10)
    mask[7:] = 0
    x2 = x.copy()
    x2[7:] += 100.0  # garbage in masked region must not matter
    assert backbone_rmsd(x, x2, mask) == pytest.approx(0.0, abs=1e-8)


def _write_fake_pdb(path, length=12, seed=0):
    rng = np.random.default_rng(seed)
    aa3 = ["ALA", "GLY", "SER", "LEU", "LYS"]
    ca = np.cumsum(rng.standard_normal((length, 3)) * 1.5, 0) \
        + np.arange(length)[:, None] * [3.8, 0, 0]
    offsets = {"N": [-1.46, 0, 0], "CA": [0, 0, 0], "C": [1.52, 0, 0],
               "O": [2.4, 1.0, 0]}
    serial = 1
    with open(path, "w") as f:
        for i in range(length):
            res = aa3[int(rng.integers(0, len(aa3)))]
            for name, off in offsets.items():
                x, y, z = ca[i] + off
                f.write(f"ATOM  {serial:5d} {name:^4s}{res} A{i + 1:4d}    "
                        f"{x:8.3f}{y:8.3f}{z:8.3f}  1.00  0.00           "
                        f"{name[0]}\n")
                serial += 1


def test_rigids_from_backbone_orthonormal():
    from reed_tpu.data.protein import rigids_from_backbone

    rng = np.random.default_rng(0)
    bb = rng.standard_normal((6, 4, 3)).astype(np.float32)
    rotmats, trans = rigids_from_backbone(bb)
    eye = np.einsum("nij,nkj->nik", rotmats, rotmats)
    assert np.allclose(eye, np.eye(3), atol=1e-5)
    assert np.allclose(np.linalg.det(rotmats), 1.0, atol=1e-5)
    assert np.allclose(trans, bb[:, 1])
    # CA->C direction is the frame x-axis
    v = bb[:, 2] - bb[:, 1]
    v = v / np.linalg.norm(v, axis=-1, keepdims=True)
    assert np.allclose(rotmats[:, :, 0], v, atol=1e-5)


@pytest.mark.slow
def test_multiflow_epoch_batches_trains(tmp_path):
    """Real-data path: PDB files -> frame extraction -> MultiflowTrainer
    train_step."""
    import jax
    import jax.numpy as jnp

    from reed_tpu.core.config import MeshConfig, OptimConfig
    from reed_tpu.data.protein import (load_multiflow_entries,
                                       multiflow_epoch_batches)
    from reed_tpu.train.multiflow import (MultiflowTrainConfig,
                                          MultiflowTrainer)

    for i in range(5):
        _write_fake_pdb(tmp_path / f"chain_{i}.pdb", length=10 + 3 * i,
                        seed=i)
    entries = load_multiflow_entries(str(tmp_path))
    assert len(entries) == 5
    assert entries[0]["trans"].shape == (10, 3)
    assert np.allclose(entries[0]["trans"].mean(0), 0, atol=1e-4)

    cfg = MultiflowTrainConfig(c_s=16, c_z=8, num_blocks=1, batch_size=2,
                               max_len=16, optim=OptimConfig(lr=1e-3),
                               mesh=MeshConfig(data=1, fsdp=1, tensor=1))
    trainer = MultiflowTrainer(cfg)
    state = trainer.init_state()
    rng = np.random.default_rng(0)
    n_batches = 0
    with trainer.mesh:
        for batch in multiflow_epoch_batches(
                str(tmp_path), 2, rng, max_len=16, entries=entries,
                trans_batch_ot=cfg.interpolant.trans_batch_ot,
                trans_scale=cfg.interpolant.trans_scale):
            assert batch["trans_1"].shape == (2, 16, 3)
            assert batch["rotmats_1"].shape == (2, 16, 3, 3)
            assert "trans_0" in batch  # OT-coupled prior from the pipeline
            state, metrics = trainer.train_step(
                state, jax.tree.map(jnp.asarray, batch),
                jax.random.PRNGKey(0))
            assert np.isfinite(float(metrics["loss"]))
            n_batches += 1
    assert n_batches == 3  # ceil(5/2) with pad-repeat


def test_featurize_buffer_pool_matches_fresh_and_recycles():
    """Pooled featurize returns bit-identical batches to fresh allocation,
    and recycles the same arrays `depth` calls later (the aliasing
    contract documented on BufferPool)."""
    import numpy as np

    from reed_tpu.data.protein import (BufferPool, featurize,
                                       synthetic_entries)

    rng = np.random.default_rng(0)
    dims = {"single": 8, "pair": 4, "structure": 6}
    entries = [synthetic_entries(rng, n=3, min_len=5, max_len=16,
                                 repr_dims=dims) for _ in range(4)]
    pool = BufferPool(depth=2)
    pooled0 = featurize(entries[0], 16, dims, pool=pool)
    fresh0 = featurize(entries[0], 16, dims)
    for k in fresh0:
        np.testing.assert_array_equal(pooled0[k], fresh0[k], err_msg=k)

    pooled1 = featurize(entries[1], 16, dims, pool=pool)
    assert pooled1["X"] is not pooled0["X"]  # within depth: distinct
    pooled2 = featurize(entries[2], 16, dims, pool=pool)
    assert pooled2["X"] is pooled0["X"]      # depth=2: recycled
    # recycled buffers still produce exact batches (pad regions re-zeroed)
    fresh2 = featurize(entries[2], 16, dims)
    for k in fresh2:
        np.testing.assert_array_equal(pooled2[k], fresh2[k], err_msg=k)
    # a different bucket shape gets its own buffer set
    other = featurize(entries[3], 8, dims, pool=pool)
    assert other["X"].shape[1] == 8

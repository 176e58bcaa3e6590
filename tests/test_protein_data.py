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

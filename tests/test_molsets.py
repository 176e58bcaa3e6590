"""MOSES-style distribution metrics (RDKit-free fallback paths)."""

import numpy as np
import pytest

from reed_tpu.data.molecule import GeometricMol
from reed_tpu.eval import molsets


def _chain(n, atom=2, bond=1, rng=None):
    """Simple path molecule of n atoms."""
    coords = (rng.standard_normal((n, 3)).astype(np.float32)
              if rng is not None else np.zeros((n, 3), np.float32))
    bonds = np.array([[i, i + 1] for i in range(n - 1)], np.int32)
    return GeometricMol(coords, np.full(n, atom, np.int32), bonds,
                        np.full(n - 1, bond, np.int32),
                        np.zeros(n, np.int32))


def _ring(n, atom=2):
    bonds = np.array([[i, (i + 1) % n] for i in range(n)], np.int32)
    return GeometricMol(np.zeros((n, 3), np.float32),
                        np.full(n, atom, np.int32), bonds,
                        np.ones(n, np.int32), np.zeros(n, np.int32))


def test_fingerprints_identical_mols_equal():
    a, b = _chain(5), _chain(5)
    fa, fb = molsets.fingerprints([a, b])
    assert (fa == fb).all()
    c = _chain(5, atom=3)
    fc = molsets.fingerprints([c])[0]
    assert not (fa == fc).all()


def test_snn_bounds_and_self_similarity():
    mols = [_chain(n) for n in (4, 5, 6, 7)]
    fps = molsets.fingerprints(mols)
    # identical sets -> every gen mol has an exact match -> SNN == 1
    assert molsets.average_agg_tanimoto(fps, fps) == pytest.approx(1.0)
    other = molsets.fingerprints([_ring(5, atom=7)])
    v = molsets.average_agg_tanimoto(fps, other)
    assert 0.0 <= v < 1.0


def test_frag_scaf_cosine():
    ref = [_ring(6), _chain(5)]
    same = [_ring(6), _chain(5)]
    assert molsets.cos_similarity(molsets.fragment_counts(ref),
                                  molsets.fragment_counts(same)) \
        == pytest.approx(1.0)
    # scaffolds: rings survive stripping, chains vanish
    sc = molsets.scaffold_counts([_ring(6), _ring(6), _ring(5)])
    assert sum(sc.values()) == 3 and len(sc) == 2
    assert len(molsets.scaffold_counts([_chain(7)])) == 0
    diff = [_ring(5), _ring(4)]
    v = molsets.cos_similarity(molsets.scaffold_counts(ref),
                               molsets.scaffold_counts(diff))
    assert v < 1.0 or np.isnan(v)


def test_strip_to_scaffold_keeps_ring_drops_tail():
    # ring of 5 with a 2-atom tail on node 0
    bonds = np.array([[0, 1], [1, 2], [2, 3], [3, 4], [0, 4],
                      [0, 5], [5, 6]], np.int32)
    mol = GeometricMol(np.zeros((7, 3), np.float32),
                       np.full(7, 2, np.int32), bonds,
                       np.ones(7, np.int32), np.zeros(7, np.int32))
    kept = molsets._strip_to_scaffold(mol)
    assert set(kept) == {0, 1, 2, 3, 4}


def test_wasserstein_1d():
    assert molsets.wasserstein_1d([0, 1, 2], [0, 1, 2]) == pytest.approx(0)
    assert molsets.wasserstein_1d([0.0], [3.0]) == pytest.approx(3.0)


def test_moses_metrics_block():
    rng = np.random.default_rng(0)
    gen = [_chain(int(n), rng=rng) for n in rng.integers(4, 9, 12)]
    test = [_chain(int(n), rng=rng) for n in rng.integers(4, 9, 12)]
    train = gen[:6]
    out = molsets.moses_metrics(gen, test, train_mols=train)
    assert set(out) >= {"SNN/Test", "Frag/Test", "Scaf/Test", "weight",
                        "unique", "Novelty", "FCD/Test"}
    assert 0 <= out["SNN/Test"] <= 1
    assert out["FCD/Test"] is None  # fcd_torch absent in this image
    # half of gen is in train -> novelty counts only hash-novel mols
    assert 0.0 <= out["Novelty"] <= 1.0


def test_mol_hash_permutation_invariant():
    rng = np.random.default_rng(1)
    mol = _chain(6, rng=rng)
    perm = rng.permutation(6)
    assert molsets.mol_hash(mol) == molsets.mol_hash(mol.permute(perm))
    assert molsets.mol_hash(mol) != molsets.mol_hash(_chain(6, atom=4))

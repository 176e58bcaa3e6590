"""MiDi sampling-metric distances (numpy rebuild)."""

import numpy as np
import pytest

from reed_tpu.data.molecule import GeometricMol
from reed_tpu.eval import midi_metrics as mm


def _mol(rng, n, n_types=5, bond_len=1.5):
    """Chain molecule with roughly fixed bond length."""
    coords = np.zeros((n, 3), np.float32)
    coords[:, 0] = np.arange(n) * bond_len
    coords += rng.standard_normal((n, 3)).astype(np.float32) * 0.02
    bonds = np.array([[i, i + 1] for i in range(n - 1)], np.int32)
    return GeometricMol(coords, rng.integers(0, n_types, n).astype(np.int32),
                        bonds, np.ones(n - 1, np.int32),
                        np.zeros(n, np.int32))


def test_histogram_w1_and_tv():
    assert mm.histogram_w1([1, 0, 0], [0, 0, 1]) == pytest.approx(2.0)
    assert mm.histogram_w1([1, 0], [1, 0]) == 0.0
    assert mm.total_variation1d(np.array([1.0, 0.0]),
                                np.array([0.0, 1.0])) == pytest.approx(2.0)


def test_identical_sets_zero_distances():
    rng = np.random.default_rng(0)
    mols = [_mol(rng, int(n)) for n in rng.integers(4, 10, 16)]
    out = mm.midi_sampling_metrics(mols, mols, num_atom_types=5)
    for key in ("NumNodesW1", "AtomTypesTV", "EdgeTypesTV", "ChargeW1",
                "ValencyW1", "BondLengthsW1", "AnglesW1"):
        assert out[key] == pytest.approx(0.0, abs=1e-9), key


def test_distances_detect_shift():
    rng = np.random.default_rng(0)
    ref = [_mol(rng, int(n), bond_len=1.5) for n in rng.integers(4, 10, 16)]
    # generated set: longer bonds and different atom-type distribution
    gen = [_mol(rng, int(n), n_types=2, bond_len=2.0)
           for n in rng.integers(10, 16, 16)]
    out = mm.midi_sampling_metrics(gen, ref, num_atom_types=5)
    assert out["NumNodesW1"] > 1.0          # sizes shifted by ~6
    assert out["AtomTypesTV"] > 0.1
    # 0.5 A shift x P(single bond among all pairs) — the reference weights
    # per-bond-type W1 by the dataset bond-type probabilities
    stats = mm.dataset_statistics(ref, 5)
    p_single = stats["bond_types"][1] / stats["bond_types"].sum()
    assert out["BondLengthsW1"] == pytest.approx(0.5 * p_single, rel=0.05)


def test_valency_aromatic_counts_as_1_5():
    coords = np.zeros((3, 3), np.float32)
    coords[1, 0], coords[2, 0] = 1.4, 2.8
    mol = GeometricMol(coords, np.zeros(3, np.int32),
                       np.array([[0, 1], [1, 2]], np.int32),
                       np.array([mm.AROMATIC_BOND, mm.AROMATIC_BOND],
                                np.int32),
                       np.zeros(3, np.int32))
    v = mm._valencies(mol)
    assert list(v) == [1.5, 3.0, 1.5]


def test_angle_distance_linear_vs_bent():
    # reference: straight type-0 chains (~180 deg); generated: right angles
    def chain(theta):
        coords = np.array([[0, 0, 0], [1.5, 0, 0],
                           [1.5 + 1.5 * np.cos(theta),
                            1.5 * np.sin(theta), 0]], np.float32)
        return GeometricMol(coords, np.zeros(3, np.int32),
                            np.array([[0, 1], [1, 2]], np.int32),
                            np.ones(2, np.int32), np.zeros(3, np.int32))

    straight = [chain(0.0) for _ in range(8)]     # collinear -> 180 deg
    bent = [chain(np.pi / 2) for _ in range(8)]   # right angle -> 90 deg
    out = mm.midi_sampling_metrics(bent, straight, num_atom_types=5)
    assert out["AnglesW1"] == pytest.approx(90.0, abs=2.0)

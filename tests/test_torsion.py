"""Torsion / internal-coordinate utilities."""

import numpy as np
import pytest

from reed_tpu.data.molecule import GeometricMol
from reed_tpu.ops import torsion as tu


def _butane_like():
    """4-atom chain with a gauche dihedral."""
    coords = np.array([[0.0, 1.0, 0.0],
                       [0.0, 0.0, 0.0],
                       [1.5, 0.0, 0.0],
                       [2.0, 0.8, 0.9]], np.float32)
    bonds = np.array([[0, 1], [1, 2], [2, 3]], np.int32)
    return GeometricMol(coords, np.full(4, 2, np.int32), bonds,
                        np.ones(3, np.int32), np.zeros(4, np.int32))


def _cyclo(n=5, tail=2):
    """n-ring with a `tail`-atom chain attached at atom 0."""
    theta = 2 * np.pi * np.arange(n) / n
    ring = np.stack([np.cos(theta) * 1.2, np.sin(theta) * 1.2,
                     np.zeros(n)], -1)
    tail_pos = np.stack([2.0 + np.arange(tail) * 1.4, np.zeros(tail),
                         np.zeros(tail)], -1)
    coords = np.concatenate([ring, tail_pos]).astype(np.float32)
    bonds = [[i, (i + 1) % n] for i in range(n)] + [[0, n]] \
        + [[n + i, n + i + 1] for i in range(tail - 1)]
    m = len(bonds)
    return GeometricMol(coords, np.full(n + tail, 2, np.int32),
                        np.array(bonds, np.int32), np.ones(m, np.int32),
                        np.zeros(n + tail, np.int32))


def test_ring_detection():
    mol = _cyclo(5, 2)
    rb = tu.ring_bonds(mol)
    assert len(rb) == 5
    assert (0, 5) not in rb and (5, 6) not in rb
    assert tu.ring_atoms(mol) == {0, 1, 2, 3, 4}
    # pure chain has no rings
    assert tu.ring_bonds(_butane_like()) == set()


def test_rotatable_bonds():
    # butane-like chain: only the middle bond has both ends degree >= 2
    assert tu.get_rotatable_bonds(_butane_like()) == [(1, 2)]
    # ring bonds are not rotatable; the ring-to-tail bond is
    mol = _cyclo(5, 2)
    assert tu.get_rotatable_bonds(mol) == [(0, 5)]


def test_dihedral_set_get_roundtrip():
    mol = _butane_like()
    for target in (60.0, -120.0, 175.0):
        out = tu.set_dihedral(mol, (0, 1, 2, 3), target)
        assert tu.get_dihedral(out.coords, (0, 1, 2, 3)) \
            == pytest.approx(target, abs=1e-4)
        # the untouched side (atoms 0, 1, 2) did not move
        np.testing.assert_allclose(out.coords[:3], mol.coords[:3],
                                   atol=1e-6)
        # bond lengths preserved by the rotation
        for b in mol.bond_indices:
            assert tu.get_bond_length(out.coords, b) == pytest.approx(
                tu.get_bond_length(mol.coords, b), abs=1e-5)


def test_bond_length_and_angle_setters():
    mol = _butane_like()
    out = tu.set_bond_length(mol, (1, 2), 2.5)
    assert tu.get_bond_length(out.coords, (1, 2)) == pytest.approx(2.5)
    np.testing.assert_allclose(out.coords[:2], mol.coords[:2], atol=1e-6)

    out = tu.set_angle(mol, (0, 1, 2), 90.0)
    assert tu.get_angle(out.coords, (0, 1, 2)) == pytest.approx(90.0,
                                                                abs=1e-4)
    # angle rotation keeps bond lengths
    assert tu.get_bond_length(out.coords, (1, 2)) == pytest.approx(
        tu.get_bond_length(mol.coords, (1, 2)), abs=1e-5)


def test_add_equi_noise():
    rng = np.random.default_rng(0)
    mol = _cyclo(5, 3)
    noised, labels = tu.add_equi_noise(mol, rng)
    assert noised.coords.shape == mol.coords.shape
    assert np.isfinite(noised.coords).all()
    # non-ring bonds got bond-length labels; ring bonds untouched
    noised_bonds = {(min(i, j), max(i, j)) for i, j, _ in labels["bond"]}
    assert noised_bonds == {(0, 5), (5, 6), (6, 7)}
    # torsion labels exist for the rotatable bonds
    assert len(labels["torsion"]) >= 1
    # ring internal geometry preserved (ring bond lengths unchanged)
    for b in tu.ring_bonds(mol):
        assert tu.get_bond_length(noised.coords, tuple(b)) == pytest.approx(
            tu.get_bond_length(mol.coords, tuple(b)), abs=1e-4)

"""Visualization/export utilities."""

import os
import numpy as np
import pytest

from reed_tpu.eval.protein_metrics import parse_pdb_backbone
from reed_tpu.eval.visualize import (
    image_grid,
    save_image_grid,
    save_xyz_file,
    write_pdb_backbone,
)


def test_xyz_roundtrip(tmp_path):
    pos = np.array([[0.0, 0, 0], [1.0, 0, 0], [0, 1.0, 0]])
    path = str(tmp_path / "m.xyz")
    save_xyz_file(path, pos, [3, 0, 0])
    lines = open(path).read().strip().split("\n")
    assert lines[0] == "3"
    assert lines[2].startswith("O ")
    assert lines[3].startswith("H 1.000000")


def test_pdb_write_parse_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    coords = rng.standard_normal((5, 4, 3)).astype(np.float32) * 3
    path = str(tmp_path / "bb.pdb")
    write_pdb_backbone(path, coords, sequence="ACDEF")
    parsed = parse_pdb_backbone(path)
    assert parsed.shape == (5, 4, 3)
    assert np.allclose(parsed, coords, atol=1e-3)  # pdb has 3 decimals


def test_image_grid(tmp_path):
    imgs = np.zeros((4, 8, 8, 3), np.uint8)
    imgs[0] = 255
    grid = image_grid(imgs, nrow=2)
    assert grid.shape == (16, 16, 3)
    assert grid[:8, :8].min() == 255 and grid[8:, 8:].max() == 0
    save_image_grid(str(tmp_path / "grid.png"), imgs)
    from PIL import Image

    assert Image.open(tmp_path / "grid.png").size == (16, 16)


def test_mmcif_parser(tmp_path):
    from reed_tpu.eval.protein_metrics import parse_mmcif_backbone

    cif = tmp_path / "x.cif"
    cif.write_text("""data_test
loop_
_atom_site.group_PDB
_atom_site.id
_atom_site.label_atom_id
_atom_site.label_comp_id
_atom_site.label_asym_id
_atom_site.label_seq_id
_atom_site.Cartn_x
_atom_site.Cartn_y
_atom_site.Cartn_z
_atom_site.auth_asym_id
ATOM 1 N ALA A 1 1.0 2.0 3.0 A
ATOM 2 CA ALA A 1 2.0 2.0 3.0 A
ATOM 3 C ALA A 1 3.0 2.0 3.0 A
ATOM 4 O ALA A 1 4.0 2.0 3.0 A
ATOM 5 N GLY A 2 5.0 2.0 3.0 A
ATOM 6 CA GLY A 2 6.0 2.0 3.0 A
ATOM 7 C GLY A 2 7.0 2.0 3.0 A
ATOM 8 O GLY A 2 8.0 2.0 3.0 A
HETATM 9 CA HOH A 3 9.0 9.0 9.0 A
#
""")
    coords, seq = parse_mmcif_backbone(str(cif))
    assert seq == "AG"
    assert coords.shape == (2, 4, 3)
    assert coords[0, 1, 0] == 2.0  # CA x of residue 1


def test_plot_molecule_3d(tmp_path):
    """3D PNG rendering with inferred bonds (qm9/visualizer.py plot_data3d
    counterpart)."""
    from reed_tpu.eval.visualize import plot_molecule_3d

    # methane-ish: C with 4 H at ~1.09 A
    pos = np.array([[0.0, 0, 0], [0.63, 0.63, 0.63], [-0.63, -0.63, 0.63],
                    [-0.63, 0.63, -0.63], [0.63, -0.63, -0.63]])
    types = [1, 0, 0, 0, 0]  # C, H, H, H, H
    path = plot_molecule_3d(str(tmp_path / "m.png"), pos, types,
                            title="alpha=1.0")
    assert os.path.exists(path)
    assert os.path.getsize(path) > 1000  # non-trivial PNG

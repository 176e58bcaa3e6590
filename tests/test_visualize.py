"""Visualization/export utilities."""

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

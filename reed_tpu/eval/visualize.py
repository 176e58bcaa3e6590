"""Sample visualization / export: molecule .xyz files, protein backbone
PDB files, and image grids.

Clean-room equivalents of molecule/qm9/visualizer.py (save_xyz_file),
the PDB writing inside protein/fmif/train_fmif.py:25-71 (for folding eval),
and the wandb image grids at image/train.py:77-81 (array2grid).
"""

from __future__ import annotations

import math
import os
from typing import List, Optional, Sequence

import numpy as np

QM9_ATOM_DECODER = ["H", "C", "N", "O", "F"]
AA3 = {
    "A": "ALA", "C": "CYS", "D": "ASP", "E": "GLU", "F": "PHE", "G": "GLY",
    "H": "HIS", "I": "ILE", "K": "LYS", "L": "LEU", "M": "MET", "N": "ASN",
    "P": "PRO", "Q": "GLN", "R": "ARG", "S": "SER", "T": "THR", "V": "VAL",
    "W": "TRP", "Y": "TYR", "X": "UNK", "Z": "UNK",
}


def save_xyz_file(path: str, positions: np.ndarray, atom_types: Sequence[int],
                  atom_decoder: Sequence[str] = QM9_ATOM_DECODER,
                  comment: str = ""):
    """Write one molecule as .xyz (reference: qm9/visualizer.py)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.write(f"{len(atom_types)}\n{comment}\n")
        for pos, t in zip(np.asarray(positions), atom_types):
            f.write(f"{atom_decoder[int(t)]} "
                    f"{pos[0]:.6f} {pos[1]:.6f} {pos[2]:.6f}\n")


def save_molecules_xyz(out_dir: str, molecules: List, prefix: str = "mol",
                       atom_decoder: Sequence[str] = QM9_ATOM_DECODER):
    """molecules: [(positions [N,3], atom_types [N]), ...]"""
    os.makedirs(out_dir, exist_ok=True)
    for i, (pos, types) in enumerate(molecules):
        save_xyz_file(os.path.join(out_dir, f"{prefix}_{i:04d}.xyz"),
                      pos, types, atom_decoder)


def write_pdb_backbone(path: str, coords: np.ndarray,
                       sequence: Optional[str] = None,
                       chain: str = "A"):
    """Write N/CA/C(/O) backbone coords [L, 3or4, 3] as a PDB file (for
    folding-eval input/output and inspection)."""
    atom_names = ["N", "CA", "C", "O"]
    coords = np.asarray(coords)
    if coords.ndim == 2:  # CA-only [L,3]
        coords = coords[:, None, :]
        atom_names = ["CA"]
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    serial = 1
    with open(path, "w") as f:
        for ri in range(coords.shape[0]):
            res = AA3.get(sequence[ri], "UNK") if sequence else "GLY"
            for ai in range(coords.shape[1]):
                x, y, z = coords[ri, ai]
                if not np.isfinite([x, y, z]).all():
                    continue
                f.write(
                    f"ATOM  {serial:5d}  {atom_names[ai]:<3s}{res:>4s} "
                    f"{chain}{ri + 1:4d}    "
                    f"{x:8.3f}{y:8.3f}{z:8.3f}  1.00  0.00\n")
                serial += 1
        f.write("END\n")


def image_grid(images: np.ndarray, nrow: Optional[int] = None) -> np.ndarray:
    """[B, H, W, 3] uint8 -> one grid image (reference: image/train.py:77-81
    array2grid)."""
    b, h, w, c = images.shape
    nrow = nrow or round(math.sqrt(b))
    ncol = math.ceil(b / nrow)
    grid = np.zeros((ncol * h, nrow * w, c), images.dtype)
    for i in range(b):
        r, col = divmod(i, nrow)
        grid[r * h:(r + 1) * h, col * w:(col + 1) * w] = images[i]
    return grid


def save_image_grid(path: str, images: np.ndarray,
                    nrow: Optional[int] = None):
    from PIL import Image

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(image_grid(images, nrow)).save(path)

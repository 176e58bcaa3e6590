"""Prepare the QM9 (GDB9) dataset from local raw files into the EDM npz
split layout that `reed_tpu.data.molecule.load_qm9_edm_npz` reads.

Clean-room rebuild of molecule/qm9/data/prepare/{qm9.py,process.py} minus
the network fetches (this image is zero-egress — point --xyz at a local
copy of dsgdb9nsd.xyz.tar.bz2 or an extracted directory):

- xyz parsing per process_xyz_gdb9 (process.py:161-202): charges from
  {H,C,N,O,F}, positions, the 16 scalar properties, omega1 from the
  frequency line, '*^' scientific-notation fixups.
- excluded-molecule filtering from uncharacterized.txt (qm9.py:87-97).
- the EDM split (qm9.py:99-130): np.random.seed(0) permutation,
  Ntrain=100000 / Ntest=0.1*N / Nvalid=rest on the full 130,831-molecule
  set, proportionally scaled for smaller local subsets.
- thermochemical targets from atomref.txt (qm9.py:147-216): per-split
  `<target>_thermo` columns summing atomrefs over the molecule's atoms.

Usage:
  python tools/prepare_qm9.py --xyz /data/dsgdb9nsd.xyz.tar.bz2 \
      --excluded /data/uncharacterized.txt --atomref /data/atomref.txt \
      --out /data/qm9_edm
"""

from __future__ import annotations

import argparse
import io
import os
import tarfile

import numpy as np

CHARGE_DICT = {"H": 1, "C": 6, "N": 7, "O": 8, "F": 9}
PROP_NAMES = ["index", "A", "B", "C", "mu", "alpha", "homo", "lumo", "gap",
              "r2", "zpve", "U0", "U", "H", "G", "Cv"]
THERM_TARGETS = ["zpve", "U0", "U", "H", "G", "Cv"]


def parse_xyz(lines) -> dict:
    """One gdb9 .xyz record -> molecule dict (process.py:161-202)."""
    num_atoms = int(lines[0])
    mol_props = lines[1].split()
    charges, positions = [], []
    for line in lines[2:num_atoms + 2]:
        atom, px, py, pz, _ = line.replace("*^", "e").split()
        charges.append(CHARGE_DICT[atom])
        positions.append([float(px), float(py), float(pz)])
    freq_line = lines[num_atoms + 2]
    props = [int(mol_props[1])] + [float(x) for x in mol_props[2:]]
    mol = dict(zip(PROP_NAMES, props))
    mol["omega1"] = max(float(w) for w in freq_line.split())
    mol["num_atoms"] = num_atoms
    mol["charges"] = np.array(charges, np.int64)
    mol["positions"] = np.array(positions, np.float32)
    return mol


def iter_xyz_records(path: str):
    """Yield decoded line-lists from a tarball or directory of .xyz files."""
    if os.path.isdir(path):
        for name in sorted(os.listdir(path)):
            if not name.endswith(".xyz"):
                continue
            with open(os.path.join(path, name)) as f:
                yield f.read().splitlines()
    elif tarfile.is_tarfile(path):
        with tarfile.open(path, "r:*") as tar:
            for member in sorted(tar.getmembers(), key=lambda m: m.name):
                if not member.name.endswith(".xyz"):
                    continue
                data = tar.extractfile(member).read().decode("utf-8")
                yield data.splitlines()
    else:
        raise ValueError(f"--xyz must be a directory or tarball: {path}")


def load_excluded(path: str) -> set:
    """0-based indices of uncharacterized molecules (qm9.py:87-94)."""
    excluded = set()
    with open(path) as f:
        for line in f:
            parts = line.split()
            if parts and parts[0].isdigit():
                excluded.add(int(parts[0]) - 1)
    return excluded


def load_atomref(path: str) -> dict:
    """Per-element thermochemical energies (qm9.py:161-186)."""
    therm = {t: {} for t in THERM_TARGETS}
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts or parts[0] not in CHARGE_DICT:
                continue
            for target, value in zip(THERM_TARGETS, parts[1:]):
                therm[target][CHARGE_DICT[parts[0]]] = float(value)
    return therm


def edm_splits(n_mols: int, n_train: int = None, test_frac: float = 0.1
               ) -> dict:
    """The EDM random split (qm9.py:99-130): seed-0 permutation,
    100k/·/10% on the full set, proportional for subsets."""
    if n_train is None:
        n_train = 100_000 if n_mols >= 130_000 else int(
            round(n_mols * 100_000 / 130_831))
    n_test = int(test_frac * n_mols)
    n_valid = n_mols - (n_train + n_test)
    assert n_valid >= 0, (n_mols, n_train, n_test)
    np.random.seed(0)
    perm = np.random.permutation(n_mols)
    train, valid, test = np.split(perm, [n_train, n_train + n_valid])
    return {"train": np.sort(train), "valid": np.sort(valid),
            "test": np.sort(test)}


def prepare(xyz_path: str, out_dir: str, excluded_path: str = None,
            atomref_path: str = None, limit: int = None) -> dict:
    mols = []
    for i, lines in enumerate(iter_xyz_records(xyz_path)):
        mols.append(parse_xyz(lines))
        if limit is not None and len(mols) >= limit:
            break
    excluded = load_excluded(excluded_path) if excluded_path else set()
    mols = [m for i, m in enumerate(mols) if i not in excluded]
    if not mols:
        raise SystemExit("no molecules parsed")

    max_atoms = max(m["num_atoms"] for m in mols)
    n = len(mols)
    data = {
        "num_atoms": np.array([m["num_atoms"] for m in mols], np.int64),
        "charges": np.zeros((n, max_atoms), np.int64),
        "positions": np.zeros((n, max_atoms, 3), np.float32),
    }
    for i, m in enumerate(mols):
        k = m["num_atoms"]
        data["charges"][i, :k] = m["charges"]
        data["positions"][i, :k] = m["positions"]
    for name in PROP_NAMES + ["omega1"]:
        data[name] = np.array([m[name] for m in mols],
                              np.int64 if name == "index" else np.float32)

    if atomref_path:
        therm = load_atomref(atomref_path)
        for target, per_elem in therm.items():
            thermo = np.zeros(n, np.float32)
            for z, e in per_elem.items():
                thermo += e * (data["charges"] == z).sum(1)
            data[target + "_thermo"] = thermo

    splits = edm_splits(n)
    os.makedirs(out_dir, exist_ok=True)
    out = {}
    for split, idx in splits.items():
        path = os.path.join(out_dir, f"{split}.npz")
        np.savez_compressed(path, **{k: v[idx] for k, v in data.items()})
        out[split] = len(idx)
        print(f"{split}: {len(idx)} molecules -> {path}")
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--xyz", required=True,
                    help="dsgdb9nsd xyz tarball or extracted directory")
    ap.add_argument("--excluded", default=None,
                    help="uncharacterized.txt (3054 excluded molecules)")
    ap.add_argument("--atomref", default=None,
                    help="atomref.txt thermochemical energies")
    ap.add_argument("--out", required=True)
    ap.add_argument("--limit", type=int, default=None)
    args = ap.parse_args(argv)
    prepare(args.xyz, args.out, args.excluded, args.atomref, args.limit)


if __name__ == "__main__":
    main()

"""QM9 raw-xyz preparation tool: parsing, excluded filtering, EDM split,
thermo targets, round-trip into the EDM trainer data path
(reference: molecule/qm9/data/prepare/{process.py,qm9.py})."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from prepare_qm9 import (edm_splits, load_atomref, load_excluded, parse_xyz,
                         prepare)


def _xyz_record(idx, atoms=("C", "H", "H", "H", "H"), seed=0):
    rng = np.random.default_rng(seed)
    lines = [str(len(atoms))]
    props = [1.0 + 0.1 * i for i in range(15)]
    lines.append("gdb " + str(idx) + "\t" + "\t".join(f"{p:.6f}"
                                                      for p in props))
    for a in atoms:
        x, y, z = rng.standard_normal(3)
        # exercise the '*^' scientific-notation fixup the gdb9 files use
        lines.append(f"{a}\t{x:.6f}\t{y:.6f}\t1*^-3\t0.0")
    lines.append("100.0 200.0 300.0")   # frequencies
    lines.append("InChI=...")
    return lines


def _write_xyz_dir(tmp_path, n=10):
    d = tmp_path / "xyz"
    d.mkdir()
    for i in range(n):
        atoms = ("C", "H", "H", "H", "H") if i % 2 == 0 else ("O", "H", "H")
        (d / f"dsgdb9nsd_{i:06d}.xyz").write_text(
            "\n".join(_xyz_record(i + 1, atoms, seed=i)))
    return str(d)


def test_parse_xyz_record():
    mol = parse_xyz(_xyz_record(7))
    assert mol["num_atoms"] == 5
    assert list(mol["charges"]) == [6, 1, 1, 1, 1]
    assert mol["index"] == 7
    assert mol["omega1"] == 300.0
    assert mol["positions"].shape == (5, 3)
    assert np.allclose(mol["positions"][:, 2], 1e-3)  # '*^' handled
    # property order: A,B,C,mu,alpha,... from the 2nd line
    assert mol["mu"] == pytest.approx(1.3)
    assert mol["alpha"] == pytest.approx(1.4)


def test_edm_splits_disjoint_and_seeded():
    s1 = edm_splits(100)
    s2 = edm_splits(100)
    allidx = np.concatenate([s1["train"], s1["valid"], s1["test"]])
    assert sorted(allidx.tolist()) == list(range(100))
    assert len(s1["test"]) == 10
    for k in s1:
        assert np.array_equal(s1[k], s2[k])  # seed-0 determinism


def test_prepare_end_to_end(tmp_path):
    xyz_dir = _write_xyz_dir(tmp_path, n=10)
    (tmp_path / "uncharacterized.txt").write_text(
        "header\n2 some reason\n")  # excludes 0-based index 1
    (tmp_path / "atomref.txt").write_text(
        "H 0.0 -0.5 -0.5 -0.5 -0.5 1.0\n"
        "C 0.0 -38.0 -38.0 -38.0 -38.0 1.0\n"
        "N 0.0 -54.0 -54.0 -54.0 -54.0 1.0\n"
        "O 0.0 -75.0 -75.0 -75.0 -75.0 1.0\n"
        "F 0.0 -99.0 -99.0 -99.0 -99.0 1.0\n")
    out = prepare(xyz_dir, str(tmp_path / "out"),
                  excluded_path=str(tmp_path / "uncharacterized.txt"),
                  atomref_path=str(tmp_path / "atomref.txt"))
    assert sum(out.values()) == 9  # one molecule excluded

    from reed_tpu.data.molecule import edm_epoch_batches, load_qm9_edm_npz

    data = load_qm9_edm_npz(str(tmp_path / "out" / "train.npz"))
    assert "alpha" in data and "U0_thermo" in data
    # methane U0_thermo = -38 + 4*(-0.5) = -40
    ch4 = data["num_atoms"] == 5
    if ch4.any():
        assert np.allclose(data["U0_thermo"][ch4], -40.0)
    # feeds the EDM trainer collation directly
    bs = min(2, len(data["num_atoms"]))
    batch = next(edm_epoch_batches(data, bs, np.random.default_rng(0),
                                   max_nodes=8))
    assert batch["positions"].shape == (bs, 8, 3)
    assert np.isfinite(batch["positions"]).all()


def test_prepare_tarball_input(tmp_path):
    import tarfile

    xyz_dir = _write_xyz_dir(tmp_path, n=4)
    tar_path = str(tmp_path / "gdb9.tar.gz")
    with tarfile.open(tar_path, "w:gz") as tar:
        for f in sorted(os.listdir(xyz_dir)):
            tar.add(os.path.join(xyz_dir, f), arcname=f)
    out = prepare(tar_path, str(tmp_path / "out_tar"))
    assert sum(out.values()) == 4

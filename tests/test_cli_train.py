"""CLI-level real-data training: each train command runs >=10 steps from a
fabricated on-disk dataset through `reed_tpu.cli.main`, writes checkpoints
and the resolved config snapshot."""

import json
import os

import numpy as np
import pytest

from reed_tpu.cli import main
from reed_tpu.data.molecule import GeometricMol, save_dataset


def _mol_dataset(path, n=24, seed=0):
    rng = np.random.default_rng(seed)
    mols = []
    for k in rng.integers(4, 12, n):
        k = int(k)
        bonds = np.array([[i, i + 1] for i in range(k - 1)], np.int32)
        mols.append(GeometricMol(
            rng.standard_normal((k, 3)).astype(np.float32),
            rng.integers(2, 10, k).astype(np.int32), bonds,
            np.ones(k - 1, np.int32), np.zeros(k, np.int32)))
    save_dataset(path, mols)
    return mols


@pytest.mark.slow
def test_train_semla_cli_real_data(tmp_path):
    mols = _mol_dataset(str(tmp_path / "train.rsmol"))
    np.save(tmp_path / "reps.npy",
            np.random.default_rng(1).standard_normal(
                (len(mols), 8)).astype(np.float32))
    ckpt = str(tmp_path / "ckpt")
    main(["train-molecule-semla", "--data-dir", str(tmp_path),
          "--steps", "12", "--batch-cost", "32", "--log-every", "4",
          "--ckpt-dir", ckpt, "--ckpt-every", "6",
          "--set", "d_model=32", "--set", "d_message=16",
          "--set", "n_layers=1", "--set", "n_coord_sets=4",
          "--set", "d_message_hidden=16", "--set", "d_edge=16",
          "--set", "n_attn_heads=4", "--set", "size_emb=8",
          "--set", "d_rep=8", "--set", "batch_size=4",
          "--dp", "1", "--fsdp", "1", "--tp", "1"])
    snap = json.load(open(os.path.join(ckpt, "config.json")))
    assert snap["d_model"] == 32 and snap["d_rep"] == 8
    assert any(d.isdigit() for d in os.listdir(ckpt))  # orbax step dirs


@pytest.mark.slow
def test_train_edm_cli_real_data(tmp_path):
    rng = np.random.default_rng(0)
    m, src_n = 24, 10
    num_atoms = rng.integers(3, 9, m)
    positions = rng.standard_normal((m, src_n, 3)).astype(np.float32)
    charges = np.array([1, 6, 7, 8, 9])[rng.integers(0, 5, (m, src_n))]
    for i, n in enumerate(num_atoms):
        positions[i, n:] = 0
        charges[i, n:] = 0
    np.savez(tmp_path / "train.npz", positions=positions, charges=charges,
             num_atoms=num_atoms)
    np.save(tmp_path / "reps.npy",
            rng.standard_normal((m, 8)).astype(np.float32))
    main(["train-molecule-edm", "--data-dir", str(tmp_path),
          "--steps", "10", "--batch-size", "4", "--log-every", "5",
          "--set", "hidden_nf=16", "--set", "n_layers=1",
          "--set", "max_nodes=8", "--set", "rep_nf=8",
          "--dp", "1", "--fsdp", "1", "--tp", "1"])


@pytest.mark.slow
def test_train_multiflow_cli_real_data(tmp_path):
    from tests.test_protein_data import _write_fake_pdb

    data = tmp_path / "pdb"
    data.mkdir()
    for i in range(5):
        _write_fake_pdb(data / f"c{i}.pdb", length=10 + 2 * i, seed=i)
    main(["train-multiflow", "--data-dir", str(data),
          "--steps", "10", "--batch-size", "2", "--log-every", "5",
          "--set", "c_s=16", "--set", "c_z=8", "--set", "num_blocks=1",
          "--set", "max_len=16",
          "--dp", "1", "--fsdp", "1", "--tp", "1"])

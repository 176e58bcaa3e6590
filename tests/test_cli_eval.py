"""CLI eval harnesses against real (fabricated) datasets."""

import json
import os

import numpy as np
import pytest
import torch


def _fake_pdb_dataset(root, n_clusters=3, length=24):
    """Minimal reference PDB layout: list.csv + split files + per-chain .pt
    (protein/fmif/utils.py:262-409 schema)."""
    rng = np.random.default_rng(0)
    os.makedirs(os.path.join(root, "pdb", "bc"), exist_ok=True)
    rows = ["CHAINID,DEPOSITION,RESOLUTION,HASH,CLUSTER,SEQUENCE"]
    for c in range(n_clusters):
        pdbid, chid = f"abc{c}", "A"
        seq = "".join(rng.choice(list("ACDEFGHIKLMNPQRSTVWY"), size=length))
        ca = np.cumsum(rng.standard_normal((length, 3)) * 1.5, 0) \
            + np.arange(length)[:, None] * [3.8, 0, 0]
        offsets = np.array([[-1.46, 0, 0], [0, 0, 0],
                            [1.52, 0, 0], [2.4, 1.0, 0]], np.float32)
        xyz = (ca[:, None, :] + offsets[None]).astype(np.float32)
        prefix = os.path.join(root, "pdb", "bc", pdbid)
        torch.save({"id": pdbid}, prefix + ".pt")
        torch.save({"seq": seq, "xyz": xyz}, f"{prefix}_{chid}.pt")
        rows.append(f"{pdbid}_{chid},2020-01-01,2.0,h{c},{c},{seq}")
    with open(os.path.join(root, "list.csv"), "w") as f:
        f.write("\n".join(rows) + "\n")
    # every cluster is a validation cluster for this test
    with open(os.path.join(root, "valid_clusters.txt"), "w") as f:
        f.write("\n".join(str(c) for c in range(n_clusters)) + "\n")
    with open(os.path.join(root, "test_clusters.txt"), "w") as f:
        f.write("")


@pytest.mark.slow
def test_eval_protein_real_validation_set(tmp_path, capsys):
    """eval-protein --data-dir scores sequence recovery on the real
    valid split (reference: train_fmif.py:464-540)."""
    from reed_tpu.cli import main

    _fake_pdb_dataset(str(tmp_path))
    main(["eval-protein", "--data-dir", str(tmp_path),
          "--num-steps", "8", "--max-chains", "3",
          "--set", "hidden_dim=32", "--set", "num_encoder_layers=1",
          "--set", "num_decoder_layers=1", "--set", "k_neighbors=8",
          "--set", "single_dim=16", "--set", "pair_dim=8",
          "--set", "structure_dim=16",
          "--dp", "1", "--fsdp", "1", "--tp", "1"])
    text = capsys.readouterr().out
    out = json.loads(text[text.index("{"):])
    assert out["split"] == "valid"
    assert out["num_chains"] == 3
    assert 0.0 <= out["sequence_recovery"] <= 1.0
    assert len(out["sample_0"]) > 0


def test_eval_semla_replicate_table(capsys):
    """eval-semla emits the reference's replicate protocol (mean +/- std
    over N replicates, molecule/semlaflow/evaluate.py:22-29) with the
    GRAPH-protocol metric fields (stability/validity/fc_validity/
    uniqueness scored on the predicted bond tensors, fm.py:249-306) and a
    self-describing 'rdkit' marker for which validity semantics ran."""
    from reed_tpu.cli import main

    main(["eval-semla", "--n-samples", "4", "--n-replicates", "2",
          "--num-steps", "2", "--n-atoms-min", "3", "--n-atoms-max", "6",
          "--atom-decoder", "H,C,N,O,F,S",
          "--set", "d_model=32", "--set", "d_message=16",
          "--set", "n_layers=1", "--set", "n_coord_sets=4",
          "--set", "n_attn_heads=4", "--set", "d_message_hidden=16",
          "--set", "d_edge=8", "--set", "vocab_size=6",
          "--set", "size_emb=8", "--set", "max_atoms=10",
          "--set", "d_rep=null",
          "--set", "interpolant.prior.vocab_size=6",
          "--dp", "1", "--fsdp", "1", "--tp", "1"])
    text = capsys.readouterr().out
    out = json.loads(text[text.index("{"):])
    for k in ("mol_stable", "atom_stable", "validity", "fc_validity",
              "uniqueness"):
        assert 0.0 <= out[k] <= 1.0, k
        assert out[f"{k}_std"] >= 0.0, k
    assert isinstance(out["rdkit"], bool)
    assert out["n_replicates"] == 2 and out["n_samples"] == 4


@pytest.mark.slow
def test_eval_molecule_reps_from_disk(tmp_path, capsys):
    """eval-molecule --data-dir feeds GtSampler with dataset reps
    (reference: rep_samplers.py:159-226)."""
    from reed_tpu.cli import main

    rng = np.random.default_rng(0)
    np.save(tmp_path / "reps.npy",
            rng.standard_normal((32, 16)).astype(np.float32))
    np.save(tmp_path / "sizes.npy", rng.integers(4, 9, 32))
    out_dir = str(tmp_path / "viz")
    main(["eval-molecule", "--data-dir", str(tmp_path), "--out", out_dir,
          "--batch-size", "4", "--num-steps", "8", "--n-replicates", "1",
          "--set", "hidden_nf=16", "--set", "n_layers=1",
          "--set", "max_nodes=8", "--set", "rep_nf=16",
          "--dp", "1", "--fsdp", "1", "--tp", "1"])
    printed = capsys.readouterr().out
    assert "GtSampler over 32 dataset reps" in printed
    assert '"mean"' in printed
    # xyz + PNG sample dumps (reference eval_visualize_samples.py)
    import os

    files = os.listdir(out_dir)
    assert sum(f.endswith(".xyz") for f in files) == 4
    assert sum(f.endswith(".png") for f in files) == 4

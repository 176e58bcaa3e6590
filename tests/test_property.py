"""Property-classifier training + conditional-generation MAE eval
(reference: qm9/property_prediction/main_qm9_prop.py +
eval_src/eval_conditional_qm9.py)."""

import json

import jax
import numpy as np
import pytest

from reed_tpu.cli import main
from reed_tpu.core.config import MeshConfig
from reed_tpu.train.property import (PropertyTrainConfig, PropertyTrainer,
                                     compute_mean_mad,
                                     property_epoch_batches)

TINY = PropertyTrainConfig(num_atom_types=4, max_nodes=8, hidden_nf=16,
                           n_layers=1, batch_size=8, mesh=MeshConfig(data=1))


def _qm9_like(m=32, src_n=10, seed=0):
    rng = np.random.default_rng(seed)
    num_atoms = rng.integers(3, 9, m)
    positions = rng.standard_normal((m, src_n, 3)).astype(np.float32)
    charges = np.array([1, 6, 7, 8])[rng.integers(0, 4, (m, src_n))]
    for i, n in enumerate(num_atoms):
        positions[i, n:] = 0
        charges[i, n:] = 0
    # property correlated with size so normalization matters
    alpha = num_atoms * 3.0 + rng.standard_normal(m)
    return {"positions": positions, "charges": charges,
            "num_atoms": num_atoms, "alpha": alpha.astype(np.float32)}


def test_compute_mean_mad():
    v = np.array([1.0, 2.0, 3.0, 6.0])
    mean, mad = compute_mean_mad(v)
    assert mean == pytest.approx(3.0)
    assert mad == pytest.approx(np.abs(v - 3.0).mean())


def test_property_epoch_batches_label_alignment():
    data = _qm9_like()
    rng = np.random.default_rng(0)
    batches = list(property_epoch_batches(data, "alpha", 8, rng,
                                          max_nodes=8, num_atom_types=4))
    assert len(batches) == 4
    for b in batches:
        # label must track the molecule in the same row: our synthetic
        # alpha is ~3*num_atoms, and num_atoms == node_mask row sums
        sizes = b["node_mask"][..., 0].sum(-1)
        assert np.corrcoef(sizes, b["label"])[0, 1] > 0.9
        assert b["one_hot"].shape == (8, 8, 4)
        assert "charges" not in b


@pytest.mark.slow
def test_property_trainer_loss_decreases():
    trainer = PropertyTrainer(TINY)
    state = trainer.init_state()
    batch = trainer.synthetic_batch(jax.random.PRNGKey(0))
    batch = jax.device_put(batch, trainer.batch_sharding)
    losses = []
    with trainer.mesh:
        for i in range(15):
            state, metrics = trainer.train_step(state, batch,
                                                jax.random.PRNGKey(i))
            losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


@pytest.mark.slow
def test_property_predict_denormalizes():
    cfg = PropertyTrainConfig(num_atom_types=4, max_nodes=8, hidden_nf=16,
                              n_layers=1, batch_size=4, mean=10.0, mad=2.0,
                              mesh=MeshConfig(data=1))
    trainer = PropertyTrainer(cfg)
    state = trainer.init_state()
    b = trainer.synthetic_batch(jax.random.PRNGKey(0), 4)
    raw = trainer.predict(state.params, b["one_hot"], b["positions"],
                          b["node_mask"], b["edge_mask"], denormalize=False)
    denorm = trainer.predict(state.params, b["one_hot"], b["positions"],
                             b["node_mask"], b["edge_mask"])
    assert np.allclose(np.asarray(denorm), np.asarray(raw) * 2.0 + 10.0,
                       atol=1e-5)


def test_linear_probe_fits_linear_labels():
    from reed_tpu.train.property import LinearProbeConfig, LinearProbeTrainer

    from reed_tpu.core.config import OptimConfig

    cfg = LinearProbeConfig(rep_dim=16, batch_size=32,
                            optim=OptimConfig(lr=3e-2, schedule="constant"),
                            mesh=MeshConfig(data=1))
    trainer = LinearProbeTrainer(cfg)
    state = trainer.init_state()
    batch = trainer.synthetic_batch(jax.random.PRNGKey(0))
    batch = jax.device_put(batch, trainer.batch_sharding)
    losses = []
    with trainer.mesh:
        for i in range(100):
            state, metrics = trainer.train_step(state, batch,
                                                jax.random.PRNGKey(i))
            losses.append(float(metrics["loss"]))
    assert losses[-1] < 0.3 * losses[0], (losses[0], losses[-1])


def test_train_property_linear_probe_cli(tmp_path):
    data = _qm9_like()
    np.savez(tmp_path / "train.npz", **data)
    rng = np.random.default_rng(0)
    np.save(tmp_path / "reps.npy",
            rng.standard_normal((len(data["num_atoms"]), 12)
                                ).astype(np.float32))
    ckpt = str(tmp_path / "ckpt")
    main(["train-property", "--linear-probe", "--data-dir", str(tmp_path),
          "--property", "alpha", "--steps", "10", "--batch-size", "8",
          "--log-every", "5", "--ckpt-dir", ckpt, "--ckpt-every", "5",
          "--dp", "1", "--fsdp", "1", "--tp", "1"])
    snap = json.load(open(f"{ckpt}/config.json"))
    assert snap["rep_dim"] == 12  # inferred from reps.npy


def test_train_property_cli_real_data(tmp_path):
    data = _qm9_like()
    np.savez(tmp_path / "train.npz", **data)
    ckpt = str(tmp_path / "ckpt")
    main(["train-property", "--data-dir", str(tmp_path),
          "--property", "alpha", "--steps", "10", "--batch-size", "8",
          "--log-every", "5", "--ckpt-dir", ckpt, "--ckpt-every", "5",
          "--set", "hidden_nf=16", "--set", "n_layers=1",
          "--set", "max_nodes=8", "--set", "num_atom_types=4",
          "--dp", "1", "--fsdp", "1", "--tp", "1"])
    snap = json.load(open(f"{ckpt}/config.json"))
    assert snap["property"] == "alpha"
    assert snap["mad"] > 0  # normalizer computed from the data


@pytest.mark.slow
def test_eval_conditional_cli(tmp_path, capsys):
    data = _qm9_like()
    np.savez(tmp_path / "train.npz", **data)
    main(["eval-conditional", "--data-dir", str(tmp_path),
          "--property", "alpha", "--n-samples", "4", "--n-replicates", "1",
          "--num-steps", "5",
          "--set", "hidden_nf=16", "--set", "n_layers=1",
          "--set", "max_nodes=8", "--set", "num_atom_types=4",
          "--set", "rep_nf=null",
          "--dp", "1", "--fsdp", "1", "--tp", "1"])
    # the CLI prints the metrics dict as the final JSON block
    lines = capsys.readouterr().out.strip().splitlines()
    start = max(i for i, l in enumerate(lines) if l.startswith("{"))
    out = json.loads("\n".join(lines[start:]))
    assert out["property"] == "alpha"
    assert np.isfinite(out["mae"])


@pytest.mark.slow
def test_eval_conditional_sweep_cli(tmp_path, capsys):
    data = _qm9_like()
    np.savez(tmp_path / "train.npz", **data)
    out_dir = str(tmp_path / "viz")
    main(["eval-conditional", "--data-dir", str(tmp_path), "--sweep",
          "--property", "alpha", "--n-samples", "4", "--n-replicates", "1",
          "--num-steps", "5", "--out", out_dir,
          "--set", "hidden_nf=16", "--set", "n_layers=1",
          "--set", "max_nodes=8", "--set", "num_atom_types=4",
          "--set", "rep_nf=null",
          "--dp", "1", "--fsdp", "1", "--tp", "1"])
    lines = capsys.readouterr().out.strip().splitlines()
    start = max(i for i, l in enumerate(lines) if l.startswith("{"))
    out = json.loads("\n".join(lines[start:]))
    targets = [r["target"] for r in out["sweep"]]
    # linspace over the observed property range
    assert targets == sorted(targets)
    assert targets[0] == pytest.approx(float(data["alpha"].min()))
    assert targets[-1] == pytest.approx(float(data["alpha"].max()))
    # xyz dump + property log (reference eval_visualize_samples.py layout)
    import os

    xyzs = [f for f in os.listdir(out_dir) if f.endswith(".xyz")]
    assert len(xyzs) == 4
    vals = [float(v) for v in
            open(f"{out_dir}/property_values.log").read().splitlines()]
    assert vals == pytest.approx(targets, rel=1e-5)


@pytest.mark.slow
def test_conditional_eval_restores_trained_classifier(tmp_path, capsys):
    """The documented recipe loop: train-property --ckpt-dir, then
    eval-conditional --classifier-ckpt restores that classifier."""
    data = _qm9_like()
    np.savez(tmp_path / "train.npz", **data)
    clf_ckpt = str(tmp_path / "clf")
    common = ["--set", "hidden_nf=16", "--set", "n_layers=1",
              "--set", "max_nodes=8", "--set", "num_atom_types=4",
              "--dp", "1", "--fsdp", "1", "--tp", "1"]
    main(["train-property", "--data-dir", str(tmp_path),
          "--property", "alpha", "--steps", "10", "--batch-size", "8",
          "--log-every", "5", "--ckpt-dir", clf_ckpt, "--ckpt-every", "5"]
         + common)
    capsys.readouterr()
    main(["eval-conditional", "--data-dir", str(tmp_path),
          "--property", "alpha", "--n-samples", "4", "--n-replicates", "1",
          "--num-steps", "5", "--classifier-ckpt", clf_ckpt,
          "--set", "rep_nf=null"] + common)
    lines = capsys.readouterr().out.strip().splitlines()
    start = max(i for i, l in enumerate(lines) if l.startswith("{"))
    out = json.loads("\n".join(lines[start:]))
    assert np.isfinite(out["mae"])

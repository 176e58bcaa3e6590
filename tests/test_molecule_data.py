"""Molecule data layer + property classifier."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reed_tpu.data.molecule import (
    GeometricMol,
    Vocabulary,
    bucket_batches,
    build_vocab,
    collate_dense,
    load_dataset,
    mol_transform,
    save_dataset,
)


def _mol(rng, n, with_bonds=True):
    bonds = np.array([[i, i + 1] for i in range(n - 1)], np.int32) \
        if with_bonds else np.zeros((0, 2), np.int32)
    return GeometricMol(
        coords=rng.standard_normal((n, 3)).astype(np.float32),
        atomics=rng.integers(2, 10, n).astype(np.int32),
        bond_indices=bonds,
        bond_types=np.ones(len(bonds), np.int32),
        charges=np.zeros(n, np.int32),
        str_id=f"mol{n}")


def test_vocab():
    v = build_vocab()
    assert len(v) == 18
    assert v.tokens[0] == "<PAD>" and v.mask_index == 1
    assert v.decode(v.encode(["C", "H", "O"])) == ["C", "H", "O"]


def test_mol_ops():
    rng = np.random.default_rng(0)
    m = _mol(rng, 6)
    z = m.zero_com()
    assert np.allclose(z.coords.mean(0), 0, atol=1e-6)
    perm = np.random.default_rng(1).permutation(6)
    p = m.permute(perm)
    assert np.allclose(p.coords, m.coords[perm])
    # bonds still connect the same atoms after permutation
    dense_before = m.dense_bonds(3)
    dense_after = p.dense_bonds(3)
    inv = np.empty(6, int)
    inv[perm] = np.arange(6)
    assert np.allclose(dense_after, dense_before[perm][:, perm])


def test_serialization_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    mols = [_mol(rng, n) for n in (3, 7, 5)]
    path = str(tmp_path / "data.rsmol.npz")
    save_dataset(path, mols)
    loaded = load_dataset(path)
    assert len(loaded) == 3
    for a, b in zip(mols, loaded):
        assert np.allclose(a.coords, b.coords)
        assert np.array_equal(a.atomics, b.atomics)
        assert np.array_equal(a.bond_indices, b.bond_indices)
        assert a.str_id == b.str_id


def test_bucket_batches_fixed_shapes():
    rng = np.random.default_rng(0)
    mols = [_mol(rng, int(n)) for n in rng.integers(5, 60, 30)]
    for batch in bucket_batches(mols, batch_cost=128,
                                bucket_limits=(24, 32, 64),
                                shuffle_rng=rng):
        b, n = batch["coords"].shape[:2]
        assert n in (24, 32, 64)
        assert b == max(1, 128 // n)
        # one-hot rows valid where masked
        sums = batch["atomics"].sum(-1)
        assert np.allclose(sums, batch["mask"])
        # bond matrix symmetric, no-bond default on padding
        assert np.allclose(batch["bonds"], batch["bonds"].transpose(0, 2, 1, 3))


def test_mol_transform_scaling():
    rng = np.random.default_rng(0)
    m = _mol(rng, 5)
    t = mol_transform(m, coord_std=2.0)
    assert np.allclose(t.coords, (m.coords - m.coords.mean(0)) / 2.0)


def test_property_classifier_invariance_and_training():
    from reed_tpu.models.property_classifier import PropertyClassifier

    model = PropertyClassifier(hidden_nf=16, n_layers=2)
    rng = np.random.default_rng(0)
    b, n = 2, 6
    h0 = jnp.asarray(np.eye(5, dtype=np.float32)[rng.integers(0, 5, (b, n))])
    x = jnp.asarray(rng.standard_normal((b, n, 3)).astype(np.float32))
    node_mask = jnp.ones((b, n, 1))
    edge_mask = (jnp.ones((b, n, n)) - jnp.eye(n)[None])[..., None]
    variables = model.init(jax.random.PRNGKey(0), h0, x, node_mask, edge_mask)
    pred = model.apply(variables, h0, x, node_mask, edge_mask)
    assert pred.shape == (b,)
    # rotation invariance (distances only)
    theta = 0.5
    rot = jnp.array([[np.cos(theta), -np.sin(theta), 0],
                     [np.sin(theta), np.cos(theta), 0], [0, 0, 1.0]])
    pred_rot = model.apply(variables, h0,
                           jnp.einsum("ij,bnj->bni", rot, x),
                           node_mask, edge_mask)
    assert np.allclose(np.asarray(pred), np.asarray(pred_rot), atol=1e-4)


@pytest.mark.slow
def test_semla_epoch_batches_trains():
    """Real-data path: .rsmol molecules -> bucketed OT-interpolated batches
    -> SemlaTrainer.train_step, loss finite and decreasing over an epoch."""
    from reed_tpu.core.config import MeshConfig, OptimConfig
    from reed_tpu.data.molecule import semla_epoch_batches
    from reed_tpu.train.molecule_semla import SemlaTrainConfig, SemlaTrainer

    cfg = SemlaTrainConfig(
        d_model=32, d_message=16, n_layers=1, n_coord_sets=4,
        d_message_hidden=16, d_edge=16, n_attn_heads=4, size_emb=8,
        d_rep=8, batch_size=4,
        optim=OptimConfig(lr=1e-3),
        mesh=MeshConfig(data=1, fsdp=1, tensor=1))
    trainer = SemlaTrainer(cfg)
    state = trainer.init_state()

    rng = np.random.default_rng(0)
    mols = [_mol(rng, int(n)) for n in rng.integers(4, 16, size=24)]
    reps = rng.standard_normal((len(mols), 8)).astype(np.float32)

    losses = []
    with trainer.mesh:
        for _ in range(2):  # two epochs
            for batch in semla_epoch_batches(
                    mols, cfg.interpolant, rng, reps=reps, batch_cost=64,
                    bucket_limits=(16,), vocab_size=cfg.vocab_size):
                assert set(batch) == {"data", "prior", "interpolated",
                                      "times", "rep"}
                state, metrics = trainer.train_step(
                    state, jax.tree.map(jnp.asarray, batch),
                    jax.random.PRNGKey(0))
                losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


@pytest.mark.slow
def test_edm_epoch_batches_trains():
    """Real-data path: QM9 EDM npz layout -> dense batches ->
    MoleculeEDMTrainer.train_step."""
    from reed_tpu.core.config import MeshConfig, OptimConfig
    from reed_tpu.data.molecule import edm_epoch_batches
    from reed_tpu.train.molecule_edm import (MoleculeEDMConfig,
                                             MoleculeEDMTrainer)

    cfg = MoleculeEDMConfig(
        hidden_nf=16, n_layers=1, max_nodes=8, rep_nf=8, batch_size=4,
        optim=OptimConfig(lr=1e-3),
        mesh=MeshConfig(data=1, fsdp=1, tensor=1))
    trainer = MoleculeEDMTrainer(cfg)
    state = trainer.init_state()

    rng = np.random.default_rng(0)
    m, src_n = 16, 12
    num_atoms = rng.integers(3, 9, m)
    charges_pool = np.array([1, 6, 7, 8, 9])
    positions = rng.standard_normal((m, src_n, 3)).astype(np.float32)
    charges = charges_pool[rng.integers(0, 5, (m, src_n))]
    for i, n in enumerate(num_atoms):
        positions[i, n:] = 0
        charges[i, n:] = 0
    data = {"positions": positions, "charges": charges,
            "num_atoms": num_atoms}
    reps = rng.standard_normal((m, 8)).astype(np.float32)

    losses = []
    with trainer.mesh:
        for batch in edm_epoch_batches(data, cfg.batch_size, rng, reps=reps,
                                       max_nodes=cfg.max_nodes):
            assert batch["positions"].shape == (4, 8, 3)
            assert batch["one_hot"].shape == (4, 8, 5)
            # masked rows are fully zero
            nm = batch["node_mask"][..., 0]
            assert np.all(batch["one_hot"][nm == 0] == 0)
            state, metrics = trainer.train_step(
                state, jax.tree.map(jnp.asarray, batch),
                jax.random.PRNGKey(0))
            losses.append(float(metrics["loss"]))
    assert len(losses) == 4  # 16 mols / bs 4
    assert np.isfinite(losses).all()

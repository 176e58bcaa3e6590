"""Alt SemlaFlow generator backends: vanilla EGNN + EQGAT."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reed_tpu.models.semla_alt import EqgatGenerator, VanillaEgnnGenerator


def _inputs(rng, b=2, n=6, vocab=5, n_bonds=4):
    r = np.random.default_rng(rng)
    coords = jnp.asarray(r.standard_normal((b, n, 3)).astype(np.float32))
    atomics = jax.nn.one_hot(jnp.asarray(r.integers(0, vocab, (b, n))), vocab)
    bonds = jax.nn.one_hot(jnp.asarray(r.integers(0, n_bonds, (b, n, n))),
                           n_bonds)
    mask = jnp.ones((b, n), jnp.float32)
    rep = jnp.asarray(r.standard_normal((b, 8)).astype(np.float32))
    return coords, atomics, bonds, mask, rep


@pytest.mark.parametrize("cls,kwargs", [
    (VanillaEgnnGenerator, dict(rep_alignment=True, align_depth=(1,))),
    (EqgatGenerator, dict(n_equi_feats=4)),
])
@pytest.mark.slow
def test_alt_generator_shapes_and_equivariance(cls, kwargs):
    coords, atomics, bonds, mask, rep = _inputs(0)
    model = cls(d_model=24, vocab_size=5, n_atom_feats=5, d_edge=8,
                n_edge_types=4, n_layers=2, d_rep=8, **kwargs)
    variables = model.init(jax.random.PRNGKey(0), coords, atomics,
                           edge_feats=bonds, atom_mask=mask, rep=rep)
    out = model.apply(variables, coords, atomics, edge_feats=bonds,
                      atom_mask=mask, rep=rep)
    pred_coords, type_logits, bond_logits, charge_logits, zs = out
    assert pred_coords.shape == (2, 6, 3)
    assert type_logits.shape == (2, 6, 5)
    assert bond_logits.shape == (2, 6, 6, 4)
    assert charge_logits.shape == (2, 6, 7)
    # predicted coords are zero-CoM
    assert np.allclose(np.asarray(pred_coords.sum(1)), 0, atol=1e-4)

    # rotation equivariance of coords, invariance of logits
    theta = 0.9
    rot = jnp.array([[np.cos(theta), -np.sin(theta), 0],
                     [np.sin(theta), np.cos(theta), 0], [0, 0, 1.0]])
    out_rot = model.apply(variables,
                          jnp.einsum("ij,bnj->bni", rot, coords), atomics,
                          edge_feats=bonds, atom_mask=mask, rep=rep)
    assert np.allclose(np.asarray(out_rot[0]),
                       np.asarray(jnp.einsum("ij,bnj->bni", rot,
                                             pred_coords)), atol=2e-3)
    assert np.allclose(np.asarray(out_rot[1]), np.asarray(type_logits),
                       atol=2e-3)


@pytest.mark.slow
def test_vanilla_alignment_projectors():
    coords, atomics, bonds, mask, rep = _inputs(1)
    model = VanillaEgnnGenerator(d_model=24, vocab_size=5, n_atom_feats=5,
                                 d_edge=8, n_edge_types=4, n_layers=2,
                                 d_rep=8, rep_alignment=True,
                                 align_depth=(0, 1))
    variables = model.init(jax.random.PRNGKey(0), coords, atomics,
                           edge_feats=bonds, atom_mask=mask, rep=rep)
    *_, zs = model.apply(variables, coords, atomics, edge_feats=bonds,
                         atom_mask=mask, rep=rep)
    assert len(zs) == 2 and zs[0].shape == (2, 8)


@pytest.mark.slow
def test_semla_trainer_arch_switch():
    from reed_tpu.core.config import MeshConfig, OptimConfig
    from reed_tpu.diffusion.molecule_fm import (IntegratorConfig,
                                                MoleculeInterpolantConfig,
                                                MoleculePriorConfig)
    from reed_tpu.train.molecule_semla import SemlaTrainConfig, SemlaTrainer

    cfg = SemlaTrainConfig(
        arch="egnn", vocab_size=6, n_bond_types=4, n_charge_types=3,
        max_atoms=16, d_model=24, n_layers=2, d_edge=8, d_rep=8,
        rep_alignment=True, align_depth=(1,), self_cond=True,
        integrator=IntegratorConfig(steps=4),
        interpolant=MoleculeInterpolantConfig(
            prior=MoleculePriorConfig(vocab_size=6, n_bond_types=4)),
        batch_size=2, optim=OptimConfig(lr=1e-3),
        mesh=MeshConfig(data=1))
    trainer = SemlaTrainer(cfg)
    state = trainer.init_state()
    batch = jax.tree.map(jnp.asarray, trainer.example_batch(2, 8, seed=0))
    with trainer.mesh:
        state, metrics = trainer.train_step(state, batch,
                                            jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))

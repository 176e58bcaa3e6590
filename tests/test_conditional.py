"""Conditional EDM generation + property-classifier MAE eval loop."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reed_tpu.core.config import MeshConfig
from reed_tpu.diffusion.edm import EDMConfig
from reed_tpu.train.molecule_edm import MoleculeEDMConfig, MoleculeEDMTrainer

COND = MoleculeEDMConfig(
    num_atom_types=4, max_nodes=8, hidden_nf=32, n_layers=2,
    inv_sublayers=1, rep_nf=16, context_node_nf=1, batch_size=4,
    edm=EDMConfig(timesteps=30, in_node_nf=5), mesh=MeshConfig(data=1))


@pytest.mark.slow
def test_conditional_edm_trains_and_samples():
    trainer = MoleculeEDMTrainer(COND)
    state = trainer.init_state()
    batch = trainer.synthetic_batch(jax.random.PRNGKey(0), 4)
    assert "context" in batch and batch["context"].shape == (4, 8, 1)
    with trainer.mesh:
        state, metrics = trainer.train_step(state, batch,
                                            jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))

    x, h_cat, h_int = trainer.sample(
        state.params, jax.random.PRNGKey(2), 4, batch["node_mask"],
        batch["edge_mask"], rep=batch["rep"], context=batch["context"])
    assert np.all(np.isfinite(np.asarray(x)))


def test_conditional_mae_helper():
    from reed_tpu.models.property_classifier import conditional_generation_mae

    preds = jnp.array([1.0, 2.0, 3.0])

    mae = conditional_generation_mae(lambda mols: preds, None,
                                     jnp.array([1.5, 2.0, 2.5]))
    assert mae == pytest.approx(1.0 / 3)

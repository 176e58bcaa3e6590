"""Every domain trainer runs sharded on a multi-device mesh (dp x fsdp) —
the multichip coverage beyond the image-domain dryrun."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reed_tpu.core.config import MeshConfig, OptimConfig

# fsdp_min_size=0: the tiny test models are all below the production
# FSDP_MIN_SIZE threshold, and this test wants real fsdp-sharded params
MESH = MeshConfig(data=4, fsdp=2, tensor=1, fsdp_min_size=0)


def _assert_sharded_step(trainer, batch):
    state = trainer.init_state()
    with trainer.mesh:
        state, metrics = trainer.train_step(state, batch,
                                            jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    # at least one param leaf actually sharded over fsdp
    specs = [x.sharding.spec for x in jax.tree.leaves(state.params)]
    assert any(any(ax is not None for ax in spec) for spec in specs)


@pytest.mark.slow
def test_protein_mesh():
    from reed_tpu.train.protein import ProteinTrainConfig, ProteinTrainer

    cfg = ProteinTrainConfig(hidden_dim=32, num_encoder_layers=1,
                             num_decoder_layers=1, k_neighbors=8,
                             single_dim=16, pair_dim=8, structure_dim=16,
                             batch_size=8, optim=OptimConfig(lr=1e-3),
                             mesh=MESH)
    trainer = ProteinTrainer(cfg)
    _assert_sharded_step(trainer,
                         trainer.synthetic_batch(jax.random.PRNGKey(0),
                                                 length=16))


@pytest.mark.slow
def test_semla_mesh():
    from reed_tpu.train.molecule_semla import SemlaTrainConfig, SemlaTrainer

    cfg = SemlaTrainConfig(d_model=32, d_message=16, n_layers=1,
                           n_coord_sets=4, d_message_hidden=16, d_edge=16,
                           n_attn_heads=4, size_emb=8, d_rep=8,
                           batch_size=8, optim=OptimConfig(lr=1e-3),
                           mesh=MESH)
    trainer = SemlaTrainer(cfg)
    batch = jax.tree.map(jnp.asarray, trainer.example_batch(8, 12))
    _assert_sharded_step(trainer, batch)


@pytest.mark.slow
def test_edm_mesh():
    from reed_tpu.train.molecule_edm import (MoleculeEDMConfig,
                                             MoleculeEDMTrainer)

    cfg = MoleculeEDMConfig(hidden_nf=16, n_layers=1, max_nodes=8,
                            rep_nf=8, batch_size=8,
                            optim=OptimConfig(lr=1e-3), mesh=MESH)
    trainer = MoleculeEDMTrainer(cfg)
    _assert_sharded_step(trainer,
                         trainer.synthetic_batch(jax.random.PRNGKey(0)))


@pytest.mark.slow
def test_multiflow_mesh():
    from reed_tpu.train.multiflow import (MultiflowTrainConfig,
                                          MultiflowTrainer)

    cfg = MultiflowTrainConfig(c_s=16, c_z=8, num_blocks=1, batch_size=8,
                               max_len=8, optim=OptimConfig(lr=1e-3),
                               mesh=MESH)
    trainer = MultiflowTrainer(cfg)
    _assert_sharded_step(trainer,
                         trainer.synthetic_batch(jax.random.PRNGKey(0)))


@pytest.mark.slow
def test_rdm_mesh():
    from reed_tpu.train.rdm import RDMTrainConfig, RDMTrainer

    cfg = RDMTrainConfig(channels=16, model_channels=32,
                         bottleneck_channels=32, num_res_blocks=1,
                         time_embed_dim=8, max_nodes=16, batch_size=16,
                         optim=OptimConfig(lr=1e-3), mesh=MESH)
    trainer = RDMTrainer(cfg)
    _assert_sharded_step(trainer,
                         trainer.synthetic_batch(jax.random.PRNGKey(0)))

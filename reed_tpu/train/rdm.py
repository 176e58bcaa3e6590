"""RDM trainer: latent DDPM over frozen-encoder representation vectors.

TPU-native rebuild of molecule/models/engine_rdm.py train_one_epoch +
molecule/src/self_condition_train_{qm9,drug}_RDM.py: AdamW with cosine LR,
x0-param MSE, atom-count conditioning.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from reed_tpu.core.config import CurriculumConfig, MeshConfig, OptimConfig
from reed_tpu.core.ema import ema_init
from reed_tpu.core.train_state import TrainState, make_optimizer
from reed_tpu.core.trainer import jit_train_step, make_train_step
from reed_tpu.diffusion.rdm import RDMConfig, RDMDiffusion
from reed_tpu.models.rdm_mlp import SimpleMLP
from reed_tpu.parallel import mesh as meshlib


@dataclass(frozen=True)
class RDMTrainConfig:
    channels: int = 256
    model_channels: int = 1536
    bottleneck_channels: int = 1536
    num_res_blocks: int = 18
    time_embed_dim: int = 256
    max_nodes: int = 256
    dropout: float = 0.0
    rdm: RDMConfig = RDMConfig()
    curriculum: CurriculumConfig = CurriculumConfig(
        proj_coeff=0.0, diffusion_warmup_steps=0)
    batch_size: int = 128
    optim: OptimConfig = OptimConfig(lr=1e-4, weight_decay=0.005,
                                     schedule="cosine", warmup_steps=0,
                                     total_steps=200_000)
    mesh: MeshConfig = MeshConfig()
    seed: int = 0


def build_model(cfg: RDMTrainConfig) -> SimpleMLP:
    return SimpleMLP(
        in_channels=cfg.channels,
        time_embed_dim=cfg.time_embed_dim,
        model_channels=cfg.model_channels,
        bottleneck_channels=cfg.bottleneck_channels,
        out_channels=cfg.channels,
        num_res_blocks=cfg.num_res_blocks,
        dropout=cfg.dropout,
        use_context=True,
        num_classes=cfg.max_nodes,
        context_channels=cfg.channels,
    )


class RDMTrainer:
    def __init__(self, cfg: RDMTrainConfig, mesh=None):
        self.cfg = cfg
        self.model = build_model(cfg)
        self.rdm_cfg = RDMConfig(**{**cfg.rdm.__dict__,
                                    "channels": cfg.channels})
        self.mesh = mesh if mesh is not None else meshlib.make_mesh(
            cfg.mesh.data, cfg.mesh.fsdp, cfg.mesh.tensor)
        self.optimizer = make_optimizer(cfg.optim)
        rng = jax.random.PRNGKey(cfg.seed)
        self.init_rng, self.train_rng = jax.random.split(rng)

        def loss_fn(params, batch, rng, step):
            del step

            def model_fn(x_t, t, n_nodes):
                return self.model.apply({"params": params}, x_t, t, n_nodes,
                                        deterministic=False,
                                        rngs={"dropout": rng})

            diffusion = RDMDiffusion(self.rdm_cfg, model_fn)
            loss = diffusion.training_loss(rng, batch["rep"],
                                           batch["num_atoms"]).mean()
            return {"denoising_loss": loss, "proj_loss": jnp.zeros(())}

        curriculum = CurriculumConfig(**{**cfg.curriculum.__dict__,
                                         "max_steps": cfg.optim.total_steps})
        step_fn = make_train_step(loss_fn, self.optimizer, curriculum,
                                  accum_steps=cfg.optim.accum_steps)
        abstract_state = jax.eval_shape(self._init_state, self.init_rng)
        param_sharding = meshlib.shard_params(
            abstract_state.params, self.mesh, meshlib.RDM_TP_RULES,
            fsdp_min_size=cfg.mesh.fsdp_min_size)
        rep = meshlib.replicated(self.mesh)
        from reed_tpu.train.image import _opt_state_shardings

        self.state_shardings = TrainState(
            step=rep, params=param_sharding, ema_params=param_sharding,
            opt_state=_opt_state_shardings(abstract_state.opt_state,
                                           abstract_state.params,
                                           param_sharding, rep))
        bsh = meshlib.batch_sharding(self.mesh)
        self.batch_sharding = {"rep": bsh, "num_atoms": bsh}
        self.train_step = jit_train_step(step_fn, self.mesh,
                                         self.state_shardings,
                                         self.batch_sharding)

    def _init_state(self, rng) -> TrainState:
        x = jnp.zeros((1, self.cfg.channels))
        t = jnp.zeros((1,), jnp.int32)
        n = jnp.zeros((1,), jnp.int32)
        variables = self.model.init({"params": rng}, x, t, n)
        params = variables["params"]
        return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                          ema_params=ema_init(params),
                          opt_state=self.optimizer.init(params))

    def init_state(self) -> TrainState:
        with self.mesh:
            return jax.jit(self._init_state,
                           out_shardings=self.state_shardings)(self.init_rng)

    def synthetic_batch(self, rng=None, batch_size=None):
        cfg = self.cfg
        bs = batch_size or cfg.batch_size
        rng = rng if rng is not None else jax.random.PRNGKey(1)
        r1, r2 = jax.random.split(rng)
        return {"rep": jax.random.normal(r1, (bs, cfg.channels)),
                "num_atoms": jax.random.randint(r2, (bs,), 5, cfg.max_nodes)}

    def diffusion(self, params) -> RDMDiffusion:
        def model_fn(x_t, t, n_nodes):
            return self.model.apply({"params": params}, x_t, t, n_nodes,
                                    deterministic=True)

        return RDMDiffusion(self.rdm_cfg, model_fn)

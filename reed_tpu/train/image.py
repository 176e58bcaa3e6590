"""Image-domain trainer: SiT flow matching with REED alignment on a TPU mesh.

TPU-native rebuild of the reference training entry (image/train.py:134-473):
a single pjit-sharded train step (DP batch sharding + optional FSDP/TP param
sharding), EMA and curriculum inside the jitted program, orbax
checkpointing, and scan-based samplers for in-loop preview / FID generation.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from reed_tpu.core.config import CurriculumConfig, MeshConfig, OptimConfig
from reed_tpu.core.ema import ema_init
from reed_tpu.core.train_state import TrainState, make_optimizer
from reed_tpu.core.trainer import jit_train_step, make_train_step
from reed_tpu.diffusion.continuous import FlowMatchingLossConfig, flow_matching_loss
from reed_tpu.models.sit import SiT, create_sit
from reed_tpu.parallel import mesh as meshlib


@dataclass(frozen=True)
class ImageTrainConfig:
    model: str = "SiT-B/2"
    input_size: int = 32
    in_channels: int = 4
    num_classes: int = 1000
    encoder_depth: int = 8
    encoder_depth_text: Optional[int] = None
    z_dims: Sequence[int] = (768,)
    z_types: Sequence[str] = ("i",)
    projector_dim: int = 2048
    class_dropout_prob: float = 0.1
    compute_dtype: str = "bfloat16"
    attn_impl: str = "auto"
    remat: Any = False  # False | True | 'dots' (see models/sit.py)
    exact_gelu: bool = False  # erf GELU, required for torch-checkpoint parity
    batch_size: int = 256
    loss: FlowMatchingLossConfig = FlowMatchingLossConfig()
    optim: OptimConfig = OptimConfig(lr=1e-4)
    curriculum: CurriculumConfig = CurriculumConfig()
    mesh: MeshConfig = MeshConfig()
    seed: int = 0


def build_model(cfg: ImageTrainConfig, token_sharding=None) -> SiT:
    return create_sit(
        cfg.model,
        token_sharding=token_sharding,
        input_size=cfg.input_size,
        in_channels=cfg.in_channels,
        num_classes=cfg.num_classes,
        encoder_depth=cfg.encoder_depth,
        encoder_depth_text=cfg.encoder_depth_text,
        z_dims=tuple(cfg.z_dims),
        z_types=tuple(cfg.z_types),
        projector_dim=cfg.projector_dim,
        class_dropout_prob=cfg.class_dropout_prob,
        dtype=jnp.dtype(cfg.compute_dtype),
        attn_impl=cfg.attn_impl,
        remat=cfg.remat,
        exact_gelu=cfg.exact_gelu,
    )


def make_loss_fn(model: SiT, loss_cfg: FlowMatchingLossConfig):
    def loss_fn(params, batch, rng, step):
        del step

        def model_fn(x_t, t, mrng, y):
            return model.apply({"params": params}, x_t, t, y, train=True,
                               rngs={"label_dropout": mrng})

        return flow_matching_loss(loss_cfg, model_fn, batch["x"],
                                  batch["zs"], rng,
                                  model_kwargs={"y": batch["y"]})

    return loss_fn


class ImageTrainer:
    """Owns mesh, sharded state, and the compiled train step."""

    def __init__(self, cfg: ImageTrainConfig, mesh=None):
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else meshlib.make_mesh(
            cfg.mesh.data, cfg.mesh.fsdp, cfg.mesh.tensor, seq=cfg.mesh.seq)
        self.model = build_model(cfg, meshlib.token_sharding(self.mesh))
        self.optimizer = make_optimizer(cfg.optim)

        rng = jax.random.PRNGKey(cfg.seed)
        self.init_rng, self.train_rng = jax.random.split(rng)

        loss_fn = make_loss_fn(self.model, cfg.loss)
        step_fn = make_train_step(loss_fn, self.optimizer, cfg.curriculum,
                                  accum_steps=cfg.optim.accum_steps)

        abstract_state = jax.eval_shape(self._init_state, self.init_rng)
        param_sharding = meshlib.shard_params(
            abstract_state.params, self.mesh, meshlib.SIT_TP_RULES,
            fsdp_min_size=cfg.mesh.fsdp_min_size)
        rep = meshlib.replicated(self.mesh)
        self.state_shardings = TrainState(
            step=rep,
            params=param_sharding,
            ema_params=param_sharding,
            opt_state=_opt_state_shardings(
                abstract_state.opt_state, abstract_state.params,
                param_sharding, rep),
        )

        self.batch_sharding = {
            "x": meshlib.batch_sharding(self.mesh),
            "y": meshlib.batch_sharding(self.mesh),
            "zs": [meshlib.batch_sharding(self.mesh) for _ in cfg.z_dims],
        }
        self.train_step = jit_train_step(step_fn, self.mesh,
                                         self.state_shardings,
                                         self.batch_sharding)

    def _init_state(self, rng) -> TrainState:
        cfg = self.cfg
        x = jnp.zeros((1, cfg.input_size, cfg.input_size, cfg.in_channels),
                      jnp.float32)
        t = jnp.zeros((1,), jnp.float32)
        y = jnp.zeros((1,), jnp.int32)
        p_rng, d_rng = jax.random.split(rng)
        variables = self.model.init({"params": p_rng, "label_dropout": d_rng},
                                    x, t, y, train=True)
        params = variables["params"]
        return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                          ema_params=ema_init(params, cfg.curriculum.ema_dtype),
                          opt_state=self.optimizer.init(params))

    def init_state(self) -> TrainState:
        with self.mesh:
            return jax.jit(self._init_state,
                           out_shardings=self.state_shardings)(self.init_rng)

    def synthetic_batch(self, rng=None, batch_size: Optional[int] = None):
        """Random batch with the training schema: latents, labels, encoder
        targets (stand-in for cached VAE latents + DINOv2 features)."""
        cfg = self.cfg
        bs = batch_size or cfg.batch_size
        rng = rng if rng is not None else jax.random.PRNGKey(1)
        r1, r2, r3 = jax.random.split(rng, 3)
        num_tokens = (cfg.input_size // _patch(cfg.model)) ** 2
        zs = []
        for z_dim, z_type in zip(cfg.z_dims, cfg.z_types):
            shape = ((bs, num_tokens, z_dim) if z_type == "i" else (bs, z_dim))
            zs.append(jax.random.normal(jax.random.fold_in(r3, z_dim), shape))
        return {
            "x": jax.random.normal(
                r1, (bs, cfg.input_size, cfg.input_size, cfg.in_channels)),
            "y": jax.random.randint(r2, (bs,), 0, cfg.num_classes),
            "zs": zs,
        }

    def run(self, state, batches, log_every: int = 100, log_fn=print):
        """Simple host loop over an iterable of batches."""
        with self.mesh:
            for i, batch in enumerate(batches):
                state, metrics = self.train_step(state, batch, self.train_rng)
                if log_fn is not None and (i + 1) % log_every == 0:
                    m = jax.device_get(metrics)
                    log_fn({k: float(v) for k, v in m.items()})
        return state


def _patch(model_name: str) -> int:
    return int(model_name.rsplit("/", 1)[1])


def _opt_state_shardings(opt_state_shapes, params_shapes, param_sharding, rep):
    """Give optimizer slots that mirror param shapes the param sharding;
    everything else (counts, scalars) replicated."""
    param_leaves = jax.tree.leaves(params_shapes)
    shard_leaves = jax.tree.leaves(
        param_sharding, is_leaf=lambda x: hasattr(x, "spec"))
    shape_to_sharding = {}
    for p, s in zip(param_leaves, shard_leaves):
        shape_to_sharding.setdefault(p.shape, s)

    def pick(leaf):
        if isinstance(leaf, jax.ShapeDtypeStruct) and leaf.shape in shape_to_sharding and leaf.ndim > 0:
            return shape_to_sharding[leaf.shape]
        return rep

    return jax.tree.map(pick, opt_state_shapes,
                        is_leaf=lambda x: isinstance(x, jax.ShapeDtypeStruct))

"""Protein-domain trainer: discrete flow-matching inverse folding with
AF3-embedding alignment on a TPU mesh.

TPU-native rebuild of the reference trainer
(protein/fmif/train_fmif.py:74-727): corrupt + model forward + smoothed CE
+ triple alignment loss, all inside one jitted step; curriculum expressed
per-step (the reference's per-epoch schedule times steps_per_epoch); the
reference is single-GPU — here the batch axis shards over 'data'.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from reed_tpu.core.config import CurriculumConfig, MeshConfig, OptimConfig
from reed_tpu.core.ema import ema_init
from reed_tpu.core.train_state import TrainState, make_optimizer
from reed_tpu.core.trainer import jit_train_step, make_train_step
from reed_tpu.diffusion.discrete import (
    MaskingInterpolantConfig,
    corrupt_batch,
    euler_unmask_sampler,
)
from reed_tpu.diffusion.protein_losses import loss_nll, loss_repr, loss_smoothed
from reed_tpu.models.pmpnn import ProteinMPNNFMIF
from reed_tpu.parallel import mesh as meshlib


@dataclass(frozen=True)
class ProteinTrainConfig:
    hidden_dim: int = 128
    num_encoder_layers: int = 3
    num_decoder_layers: int = 3
    k_neighbors: int = 30
    dropout: float = 0.1
    augment_eps: float = 0.0
    update_edge: bool = True
    learnable_node: bool = True
    align_depth: int = 1
    single_dim: int = 384
    pair_dim: int = 128
    structure_dim: int = 768
    mdlm_parameterization: bool = False
    # losses
    smoothing_weight: float = 0.1
    t_schedule: bool = False
    repa_coeff: Sequence[float] = (0.5, 2.0, 1.0)  # single, pair, structure
    repr_weight: float = 0.2
    repr_norm: bool = True
    repr_noise: float = 0.0
    mask_repr_loss: bool = False
    load_repr: bool = True
    # interpolant
    interpolant: MaskingInterpolantConfig = MaskingInterpolantConfig()
    # schedule / optim
    batch_size: int = 8
    max_len: int = 256
    optim: OptimConfig = OptimConfig(lr=1e-3, grad_clip=1.0)
    curriculum: CurriculumConfig = CurriculumConfig(proj_coeff=0.2)
    mesh: MeshConfig = MeshConfig()
    compute_dtype: str = "float32"
    # PRNG for dropout/corruption streams: "threefry" (default, parity) or
    # "rbg" — far cheaper on TPU, where threefry bit generation plus its
    # fusion into the dW convolutions measurably dominates over the dropout
    # masks themselves (device trace: ~30 ms/step of a 355 ms step at bs64)
    rng_impl: str = "threefry"
    # fused Pallas message-MLP kernel (ops/fused_message.py). Measured on
    # v5e at the bench config (bs64/L256/bf16): the fused step is SLOWER
    # (83k vs 107k tok/s with rbg dropout) — the chain is compute-bound at
    # this chip's ~320 flop/byte balance (127 TF/s : 400 GB/s measured), so
    # XLA's full-tensor convolutions beat per-tile kernel dots and the
    # saved HBM traffic doesn't pay. Default "auto" therefore resolves to
    # OFF; "on" opts in (exactness pinned by tests/test_fused_message.py).
    fused_messages: str = "auto"
    seed: int = 0


def _resolve_fused(mode: str) -> bool:
    return mode == "on"


def build_model(cfg: ProteinTrainConfig) -> ProteinMPNNFMIF:
    return ProteinMPNNFMIF(
        fused=_resolve_fused(cfg.fused_messages),
        hidden_dim=cfg.hidden_dim,
        edge_features=cfg.hidden_dim,
        num_encoder_layers=cfg.num_encoder_layers,
        num_decoder_layers=cfg.num_decoder_layers,
        k_neighbors=cfg.k_neighbors,
        dropout=cfg.dropout,
        augment_eps=cfg.augment_eps,
        update_edge=cfg.update_edge,
        learnable_node=cfg.learnable_node,
        align_depth=cfg.align_depth,
        single_dim=cfg.single_dim,
        pair_dim=cfg.pair_dim,
        structure_dim=cfg.structure_dim,
        mdlm_parameterization=cfg.mdlm_parameterization,
        dtype=jnp.dtype(cfg.compute_dtype),
    )


def make_loss_fn(model: ProteinMPNNFMIF, cfg: ProteinTrainConfig):
    detach_repr = cfg.repr_weight <= 0.0

    def loss_fn(params, batch, rng, step):
        del step
        rng_corrupt, rng_drop, rng_noise, rng_coord = jax.random.split(rng, 4)
        noisy = corrupt_batch(rng_corrupt, batch, cfg.interpolant)
        mask_for_loss = batch["mask"] * batch["chain_M"]
        mask_for_residue = noisy["is_masked"]

        log_probs, zs_single, zs_pair, zs_structure, e_idx = model.apply(
            {"params": params}, batch["X"], noisy["S_t"], batch["mask"],
            batch["chain_M"], batch["residue_idx"],
            batch["chain_encoding_all"], return_rep=True, train=True,
            detach_repr=detach_repr,
            rngs={"dropout": rng_drop, "coord_noise": rng_coord})

        _, ce = loss_smoothed(batch["S"], log_probs, mask_for_loss,
                              cfg.smoothing_weight, t=noisy["t"],
                              t_schedule=cfg.t_schedule)

        metrics = {"denoising_loss": ce}
        if cfg.load_repr:
            (l_s, l_p, l_st, l_sm, l_pm, l_stm) = loss_repr(
                batch["repr_single"], batch["repr_pair"],
                batch["repr_structure"], zs_single, zs_pair, zs_structure,
                e_idx, mask_for_loss, mask_for_residue, rng=rng_noise,
                repr_norm=cfg.repr_norm, repr_noise=cfg.repr_noise)
            if cfg.mask_repr_loss:
                align = (l_sm * cfg.repa_coeff[0] + l_pm * cfg.repa_coeff[1]
                         + l_stm * cfg.repa_coeff[2])
            else:
                align = (l_s * cfg.repa_coeff[0] + l_p * cfg.repa_coeff[1]
                         + l_st * cfg.repa_coeff[2])
            metrics.update(proj_loss=align, loss_single=l_s, loss_pair=l_p,
                           loss_structure=l_st)

        _, nll_av, true_false = loss_nll(batch["S"], log_probs, mask_for_loss)
        acc = jnp.sum(true_false * mask_for_loss) / jnp.sum(mask_for_loss)
        metrics.update(nll=nll_av, accuracy=acc)
        return metrics

    return loss_fn


class ProteinTrainer:
    def __init__(self, cfg: ProteinTrainConfig, mesh=None):
        self.cfg = cfg
        self.model = build_model(cfg)
        self.mesh = mesh if mesh is not None else meshlib.make_mesh(
            cfg.mesh.data, cfg.mesh.fsdp, cfg.mesh.tensor)
        self.optimizer = make_optimizer(cfg.optim)
        if cfg.rng_impl == "threefry":
            rng = jax.random.PRNGKey(cfg.seed)
        else:
            # typed key array: flax make_rng and jax.random both handle it
            # without re-wrapping (a raw rbg key would be mis-wrapped as
            # threefry by flax)
            rng = jax.random.key(cfg.seed, impl=cfg.rng_impl)
        self.init_rng, self.train_rng = jax.random.split(rng)

        # projector-only mode trains at unit weight (train_fmif.py:305)
        curriculum = cfg.curriculum
        if cfg.repr_weight <= 0.0:
            curriculum = CurriculumConfig(
                **{**curriculum.__dict__, "proj_coeff": 1.0})
        else:
            curriculum = CurriculumConfig(
                **{**curriculum.__dict__, "proj_coeff": cfg.repr_weight})
        step_fn = make_train_step(make_loss_fn(self.model, cfg),
                                  self.optimizer, curriculum,
                                  accum_steps=cfg.optim.accum_steps)

        abstract_state = jax.eval_shape(self._init_state, self.init_rng)
        param_sharding = meshlib.shard_params(
            abstract_state.params, self.mesh, meshlib.PMPNN_TP_RULES,
            fsdp_min_size=cfg.mesh.fsdp_min_size)
        rep = meshlib.replicated(self.mesh)
        from reed_tpu.train.image import _opt_state_shardings

        self.state_shardings = TrainState(
            step=rep, params=param_sharding, ema_params=param_sharding,
            opt_state=_opt_state_shardings(abstract_state.opt_state,
                                           abstract_state.params,
                                           param_sharding, rep))
        bs = meshlib.batch_sharding(self.mesh)
        self.batch_sharding = {k: bs for k in (
            "X", "S", "mask", "chain_M", "residue_idx", "chain_encoding_all",
            "repr_single", "repr_pair", "repr_structure")}
        self.train_step = jit_train_step(step_fn, self.mesh,
                                         self.state_shardings,
                                         self.batch_sharding)

    def _init_state(self, rng) -> TrainState:
        cfg = self.cfg
        batch = synthetic_protein_batch(jax.random.PRNGKey(0), 1, 8, cfg)
        p_rng, d_rng, c_rng = jax.random.split(rng, 3)
        variables = self.model.init(
            {"params": p_rng, "dropout": d_rng, "coord_noise": c_rng},
            batch["X"], batch["S"], batch["mask"], batch["chain_M"],
            batch["residue_idx"], batch["chain_encoding_all"],
            return_rep=True, train=True)
        params = variables["params"]
        return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                          ema_params=ema_init(params, cfg.curriculum.ema_dtype),
                          opt_state=self.optimizer.init(params))

    def init_state(self) -> TrainState:
        with self.mesh:
            return jax.jit(self._init_state,
                           out_shardings=self.state_shardings)(self.init_rng)

    def synthetic_batch(self, rng=None, batch_size=None, length=None):
        cfg = self.cfg
        return synthetic_protein_batch(
            rng if rng is not None else jax.random.PRNGKey(1),
            batch_size or cfg.batch_size, length or cfg.max_len, cfg)

    @functools.cached_property
    def _sample_jit(self):
        """Built once per trainer: defining the jit inside sample() would
        discard the compile cache on every call (a full remote recompile
        per eval batch on the axon transport)."""
        cfg = self.cfg

        @functools.partial(jax.jit, static_argnames=("cls", "w"))
        def _sample(params, batch, rng, cls=None, w=None):
            if cls is None:
                # encoder depends only on the backbone — hoist it out of
                # the unmasking loop; each step runs the decoder only
                enc = self.model.apply(
                    {"params": params}, batch["X"], batch["S"],
                    batch["mask"], batch["chain_M"], batch["residue_idx"],
                    batch["chain_encoding_all"], return_enc=True,
                    train=False)

                def logits_fn(tokens, cls_arr):
                    del cls_arr
                    return self.model.apply(
                        {"params": params}, batch["X"], tokens,
                        batch["mask"], batch["chain_M"],
                        batch["residue_idx"], batch["chain_encoding_all"],
                        enc_state=enc, return_rep=False, train=False)
            else:
                # CFG over fold class: the encoder itself is
                # class-conditioned (cls_layers_enc), so no hoisting
                def logits_fn(tokens, cls_arr):
                    return self.model.apply(
                        {"params": params}, batch["X"], tokens,
                        batch["mask"], batch["chain_M"],
                        batch["residue_idx"], batch["chain_encoding_all"],
                        cls=cls_arr, return_rep=False, train=False)

            return euler_unmask_sampler(logits_fn, rng, batch["S"].shape,
                                        cfg.interpolant, cls=cls, w=w)

        return _sample

    def sample(self, params, batch, rng, cls=None, w=None):
        """Euler unmasking sampling conditioned on the backbone. Params are
        a jit argument (closing over them bakes weights into the lowering
        as constants — pathological on remote-tunnel TPU transports)."""
        return self._sample_jit(params, batch, rng, cls=cls, w=w)


def synthetic_protein_batch(rng, batch_size: int, length: int,
                            cfg: ProteinTrainConfig):
    """Random featurized batch matching the schema of featurize()
    (protein/fmif/model_utils.py:17-165): backbone coords, tokens, masks,
    residue indices, AF3-style embeddings."""
    r = jax.random.split(rng, 6)
    # a loose helix-like random walk keeps distances in the RBF range
    steps = jax.random.normal(r[0], (batch_size, length, 3)) * 1.5
    ca = jnp.cumsum(steps, axis=1) + 3.8 * jnp.arange(length)[None, :, None] * \
        jnp.array([1.0, 0.0, 0.0])
    offsets = jnp.array([[-1.46, 0.0, 0.0], [0.0, 0.0, 0.0],
                         [1.52, 0.0, 0.0], [2.4, 1.0, 0.0]])
    x = ca[:, :, None, :] + offsets[None, None]
    s = jax.random.randint(r[1], (batch_size, length), 0, 20)
    return {
        "X": x,
        "S": s,
        "mask": jnp.ones((batch_size, length), jnp.float32),
        "chain_M": jnp.ones((batch_size, length), jnp.float32),
        "residue_idx": jnp.broadcast_to(jnp.arange(length)[None],
                                        (batch_size, length)).astype(jnp.int32),
        "chain_encoding_all": jnp.zeros((batch_size, length), jnp.int32),
        "repr_single": jax.random.normal(r[2], (batch_size, length,
                                                cfg.single_dim)),
        "repr_pair": jax.random.normal(r[3], (batch_size, length, length,
                                              cfg.pair_dim)),
        "repr_structure": jax.random.normal(r[4], (batch_size, length,
                                                   cfg.structure_dim)),
    }

"""MultiFlow SE(3) codesign trainer: backbone + sequence flow matching.

TPU-native rebuild of protein/multiflow/models/flow_module.py:115-260 and
experiments/train_se3_flows.py: the Lightning module's model_step losses
(t-normalized translation/rotation vector-field MSE, backbone-atom and
pairwise-distance auxiliary losses gated at t>0.5, aatype CE) inside one
jitted train step; Lightning DDP replaced by batch sharding on 'data'.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from reed_tpu.core.config import CurriculumConfig, MeshConfig, OptimConfig
from reed_tpu.core.ema import ema_init
from reed_tpu.core.train_state import TrainState, make_optimizer
from reed_tpu.core.trainer import jit_train_step, make_train_step
from reed_tpu.diffusion.se3 import (
    MASK_TOKEN_INDEX,
    NUM_TOKENS,
    SE3InterpolantConfig,
    batch_ot_trans_prior,
    corrupt_batch,
    se3_sample,
)
from reed_tpu.models.ipa import FlowModel, rigid_apply
from reed_tpu.ops.so3 import calc_rot_vf, sample_uniform_rotations
from reed_tpu.parallel import mesh as meshlib

# idealized backbone atom coordinates in the residue frame (N, CA, C): the
# ALA rigid-group constants — exactly the atoms the reference bb-atom aux
# loss uses (flow_module.py:132,168 to_atom37(...)[:, :, :3])
from reed_tpu.ops.residue_constants import RESTYPE_ATOM37_POSITIONS

IDEAL_BB = np.array(RESTYPE_ATOM37_POSITIONS[0, :3], np.float32)


def to_bb_atoms(rotmats, trans):
    """Rigids -> N/CA/C atom positions [B,N,3,3]."""
    ideal = jnp.asarray(IDEAL_BB)
    return rigid_apply(rotmats, trans, jnp.broadcast_to(
        ideal, rotmats.shape[:-2] + (3, 3)))


@dataclass(frozen=True)
class MultiflowTrainConfig:
    c_s: int = 256
    c_z: int = 128
    num_blocks: int = 6
    seq_tfmr_num_layers: int = 2
    ipa_c_hidden: int = 16
    ipa_no_heads: int = 8
    ipa_no_qk_points: int = 8
    ipa_no_v_points: int = 12
    # losses (reference: configs/base.yaml:82-95)
    translation_loss_weight: float = 2.0
    rotation_loss_weight: float = 1.0
    aatypes_loss_weight: float = 1.0
    aux_loss_weight: float = 0.0
    aux_loss_t_pass: float = 0.5
    bb_atom_scale: float = 0.1
    trans_scale: float = 0.1
    t_normalize_clip: float = 0.9
    interpolant: SE3InterpolantConfig = SE3InterpolantConfig()
    batch_size: int = 4
    max_len: int = 128
    curriculum: CurriculumConfig = CurriculumConfig(
        proj_coeff=0.0, diffusion_warmup_steps=0)
    optim: OptimConfig = OptimConfig(lr=1e-4)
    mesh: MeshConfig = MeshConfig()
    compute_dtype: str = "float32"
    seed: int = 0


def build_model(cfg: MultiflowTrainConfig) -> FlowModel:
    return FlowModel(c_s=cfg.c_s, c_z=cfg.c_z, num_blocks=cfg.num_blocks,
                     seq_tfmr_num_layers=cfg.seq_tfmr_num_layers,
                     ipa_c_hidden=cfg.ipa_c_hidden,
                     ipa_no_heads=cfg.ipa_no_heads,
                     ipa_no_qk_points=cfg.ipa_no_qk_points,
                     ipa_no_v_points=cfg.ipa_no_v_points,
                     aatype_pred_num_tokens=NUM_TOKENS,
                     dtype=jnp.dtype(cfg.compute_dtype))


def multiflow_losses(cfg: MultiflowTrainConfig, noisy, out):
    """Reference: flow_module.py:115-240."""
    loss_mask = noisy["res_mask"]
    loss_denom = jnp.sum(loss_mask, -1) * 3
    r3_t, so3_t, cat_t = noisy["r3_t"], noisy["so3_t"], noisy["cat_t"]
    clip = cfg.t_normalize_clip
    r3_norm = 1 - jnp.minimum(r3_t[..., None], clip)     # [B,1,1]
    so3_norm = 1 - jnp.minimum(so3_t[..., None], clip)

    gt_rot_vf = calc_rot_vf(noisy["rotmats_t"], noisy["rotmats_1"])
    pred_rot_vf = calc_rot_vf(noisy["rotmats_t"], out["pred_rotmats"])

    # aatype CE
    logits = out["pred_logits"]
    logp = jax.nn.log_softmax(logits, -1)
    ce = -jnp.take_along_axis(logp, noisy["aatypes_1"][..., None], -1)[..., 0]
    aatypes_loss = jnp.sum(ce * loss_mask, -1) / (loss_denom / 3)
    aatypes_loss = aatypes_loss * cfg.aatypes_loss_weight

    # trans vf loss (x1-param) with clamp
    trans_err = (noisy["trans_1"] - out["pred_trans"]) / r3_norm \
        * cfg.trans_scale
    trans_loss = cfg.translation_loss_weight * jnp.sum(
        trans_err ** 2 * loss_mask[..., None], (-1, -2)) / loss_denom
    trans_loss = jnp.clip(trans_loss, None, 5.0)

    # rot vf loss
    rot_err = (gt_rot_vf - pred_rot_vf) / so3_norm
    rots_loss = cfg.rotation_loss_weight * jnp.sum(
        rot_err ** 2 * loss_mask[..., None], (-1, -2)) / loss_denom

    # bb atom + pair-dist auxiliary losses
    gt_bb = to_bb_atoms(noisy["rotmats_1"], noisy["trans_1"])
    pred_bb = to_bb_atoms(out["pred_rotmats"], out["pred_trans"])
    scale = cfg.bb_atom_scale / r3_norm[..., None]
    bb_loss = jnp.sum(((gt_bb - pred_bb) * scale) ** 2
                      * loss_mask[..., None, None], (-1, -2, -3)) / loss_denom

    b, n = loss_mask.shape
    gt_flat = gt_bb.reshape(b, n * 3, 3)
    pred_flat = pred_bb.reshape(b, n * 3, 3)
    gt_d = jnp.linalg.norm(gt_flat[:, :, None] - gt_flat[:, None] + 1e-8,
                           axis=-1)
    pred_d = jnp.linalg.norm(pred_flat[:, :, None] - pred_flat[:, None]
                             + 1e-8, axis=-1)
    flat_mask = jnp.repeat(loss_mask, 3, axis=-1)
    pair_mask = flat_mask[:, :, None] * flat_mask[:, None, :]
    dist_loss = jnp.sum((gt_d - pred_d) ** 2 * pair_mask, (1, 2)) \
        / (jnp.sum(pair_mask, (1, 2)) + 1)

    aux = (bb_loss + dist_loss) * (
        (r3_t[:, 0] > cfg.aux_loss_t_pass)
        & (so3_t[:, 0] > cfg.aux_loss_t_pass)).astype(jnp.float32)
    aux = jnp.clip(aux * cfg.aux_loss_weight, None, 5.0)

    total = trans_loss + rots_loss + aux + aatypes_loss
    return {
        "denoising_loss": total.mean(),
        "trans_loss": trans_loss.mean(),
        "rots_vf_loss": rots_loss.mean(),
        "aatypes_loss": aatypes_loss.mean(),
        "aux_loss": aux.mean(),
        "proj_loss": jnp.zeros(()),
    }


class MultiflowTrainer:
    def __init__(self, cfg: MultiflowTrainConfig, mesh=None):
        self.cfg = cfg
        self.model = build_model(cfg)
        self.mesh = mesh if mesh is not None else meshlib.make_mesh(
            cfg.mesh.data, cfg.mesh.fsdp, cfg.mesh.tensor)
        self.optimizer = make_optimizer(cfg.optim)
        rng = jax.random.PRNGKey(cfg.seed)
        self.init_rng, self.train_rng = jax.random.split(rng)

        def loss_fn(params, batch, rng, step):
            del step
            noisy = corrupt_batch(rng, cfg.interpolant, batch)
            noisy["trans_sc"] = jnp.zeros_like(noisy["trans_t"])
            noisy["aatypes_sc"] = jax.nn.one_hot(noisy["aatypes_t"],
                                                 NUM_TOKENS)
            out = self.model.apply({"params": params}, noisy)
            return multiflow_losses(cfg, noisy, out)

        curriculum = CurriculumConfig(**{**cfg.curriculum.__dict__,
                                         "max_steps": cfg.optim.total_steps})
        step_fn = make_train_step(loss_fn, self.optimizer, curriculum,
                                  accum_steps=cfg.optim.accum_steps)
        abstract_state = jax.eval_shape(self._init_state, self.init_rng)
        param_sharding = meshlib.shard_params(
            abstract_state.params, self.mesh, meshlib.IPA_TP_RULES,
            fsdp_min_size=cfg.mesh.fsdp_min_size)
        rep = meshlib.replicated(self.mesh)
        from reed_tpu.train.image import _opt_state_shardings

        self.state_shardings = TrainState(
            step=rep, params=param_sharding, ema_params=param_sharding,
            opt_state=_opt_state_shardings(abstract_state.opt_state,
                                           abstract_state.params,
                                           param_sharding, rep))
        bsh = meshlib.batch_sharding(self.mesh)
        keys = ["trans_1", "rotmats_1", "aatypes_1", "res_mask", "res_idx"]
        if cfg.interpolant.trans_batch_ot:
            keys.append("trans_0")  # precoupled OT prior from the pipeline
        self.batch_sharding = {k: bsh for k in keys}
        self.train_step = jit_train_step(step_fn, self.mesh,
                                         self.state_shardings,
                                         self.batch_sharding)

    def _init_state(self, rng) -> TrainState:
        batch = self.synthetic_batch(jax.random.PRNGKey(0), 1, 8)
        noisy = corrupt_batch(jax.random.PRNGKey(1), self.cfg.interpolant,
                              batch)
        noisy["trans_sc"] = jnp.zeros_like(noisy["trans_t"])
        noisy["aatypes_sc"] = jax.nn.one_hot(noisy["aatypes_t"], NUM_TOKENS)
        variables = self.model.init({"params": rng}, noisy)
        params = variables["params"]
        return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                          ema_params=ema_init(params),
                          opt_state=self.optimizer.init(params))

    def init_state(self) -> TrainState:
        with self.mesh:
            return jax.jit(self._init_state,
                           out_shardings=self.state_shardings)(self.init_rng)

    def synthetic_batch(self, rng=None, batch_size=None, length=None):
        cfg = self.cfg
        bs = batch_size or cfg.batch_size
        n = length or cfg.max_len
        rng = rng if rng is not None else jax.random.PRNGKey(1)
        r1, r2, r3 = jax.random.split(rng, 3)
        mask = jnp.ones((bs, n), jnp.float32)
        steps = jax.random.normal(r1, (bs, n, 3)) * 1.5
        trans = jnp.cumsum(steps, axis=1)
        trans = trans - trans.mean(axis=1, keepdims=True)
        batch = {
            "trans_1": trans,
            "rotmats_1": sample_uniform_rotations(r2, (bs, n)),
            "aatypes_1": jax.random.randint(r3, (bs, n), 0, 20),
            "res_mask": mask,
            "res_idx": jnp.broadcast_to(jnp.arange(n)[None],
                                        (bs, n)).astype(jnp.int32),
        }
        if self.cfg.interpolant.trans_batch_ot:
            if isinstance(trans, jax.core.Tracer):
                # under trace (init/eval_shape): shapes only, no host OT
                batch["trans_0"] = jnp.zeros_like(trans)
            else:
                np_rng = np.random.default_rng(
                    int(np.asarray(jax.random.key_data(rng))[-1]))
                batch["trans_0"] = jnp.asarray(batch_ot_trans_prior(
                    np_rng, np.asarray(trans), np.asarray(mask),
                    self.cfg.interpolant.trans_scale))
        return batch

    @functools.cached_property
    def _sample_jit(self):
        """Built once per trainer (a jit defined inside sample() would
        recompile on every call — one remote compile per eval batch)."""

        @functools.partial(jax.jit, static_argnames=("batch_size", "length",
                                                     "num_timesteps"))
        def _sample(params, rng, batch_size, length, num_timesteps=None):
            def model_fn(batch):
                return self.model.apply({"params": params}, batch)

            res_mask = jnp.ones((batch_size, length), jnp.float32)
            return se3_sample(rng, self.cfg.interpolant, model_fn,
                              (batch_size, length), res_mask,
                              num_timesteps=num_timesteps)

        return _sample

    def sample(self, params, rng, batch_size, length, num_timesteps=None):
        # params threaded through jit (closure would bake them as constants)
        return self._sample_jit(params, rng, batch_size=batch_size,
                                length=length, num_timesteps=num_timesteps)

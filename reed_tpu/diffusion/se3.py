"""SE(3) flow-matching interpolant: joint translation / rotation / sequence
corruption and Euler sampling for protein backbone codesign (MultiFlow).

Clean-room rebuild of protein/multiflow/data/interpolant.py:49-616:
  - translations: centered-gaussian prior (nm scale), optional mini-batch OT
    with Kabsch alignment, linear path
  - rotations: IGSO3(1.5) right-multiplied noise, geodesic path with linear
    or exp schedule; Euler step Exp_{R_t}(scale*dt*Log_{R_t}(R1_hat))
  - aatypes: masking or uniform discrete FM; Euler steps with noise terms
    and optional purity-ordered unmasking
Convention: t=1 clean data, t=0 noise.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from reed_tpu.ops.so3 import (
    calc_rot_vf,
    geodesic_t,
    rotvec_to_rotmat,
    sample_igso3,
)

MASK_TOKEN_INDEX = 20
NUM_TOKENS = 21
NM_TO_ANG = 10.0


@dataclass(frozen=True)
class SE3InterpolantConfig:
    min_t: float = 1e-2
    num_timesteps: int = 100
    # trans
    trans_batch_ot: bool = True
    trans_scale: float = NM_TO_ANG       # prior is N(0, I) in nm -> Angstrom
    # rots
    rots_train_schedule: str = "linear"   # linear | exp
    rots_sample_schedule: str = "exp"     # linear | exp
    rots_exp_rate: float = 10.0
    igso3_sigma: float = 1.5
    # aatypes
    aatypes_interpolant: str = "masking"  # masking | uniform
    aatypes_temp: float = 0.1
    aatypes_noise: float = 20.0
    aatypes_do_purity: bool = True


def centered_gaussian(rng, shape, mask):
    x = jax.random.normal(rng, shape) * mask[..., None]
    n = jnp.maximum(mask.sum(-1, keepdims=True)[..., None], 1.0)
    com = (x * mask[..., None]).sum(-2, keepdims=True) / n
    return (x - com) * mask[..., None]


def corrupt_trans(rng, cfg, trans_1, t, res_mask, trans_0=None):
    """Linear path from a centered gaussian prior (reference:
    interpolant.py:77-90). trans in Angstrom; t [B, 1]. When the batch
    carries a precoupled prior (`trans_0`, from batch_ot_trans_prior in the
    input pipeline) it is used instead of fresh noise — the OT coupling's
    Hungarian step is host-side, like the reference's
    linear_sum_assignment (interpolant.py:107)."""
    if trans_0 is None:
        trans_0 = centered_gaussian(rng, trans_1.shape, res_mask) \
            * cfg.trans_scale
    trans_t = (1 - t[..., None]) * trans_0 + t[..., None] * trans_1
    return trans_t * res_mask[..., None]


def _masked_kabsch_align(x, y, w):
    """Rigidly align x onto y (both [..., N, 3], weights w [..., N]):
    returns x aligned, with rotation + translation chosen by weighted
    Kabsch. Vectorized numpy (host-side)."""
    w = w[..., None]
    wsum = np.maximum(w.sum(-2, keepdims=True), 1e-8)
    xc = (x * w).sum(-2, keepdims=True) / wsum
    yc = (y * w).sum(-2, keepdims=True) / wsum
    x0, y0 = (x - xc) * w, (y - yc) * w
    h = np.einsum("...ni,...nj->...ij", x0, y0)
    u, _, vt = np.linalg.svd(h)
    det = np.linalg.det(np.einsum("...ij,...jk->...ik", u, vt))
    d = np.ones(h.shape[:-2] + (3,))
    d[..., -1] = det
    rot = np.einsum("...ij,...j,...jk->...ik", u, d, vt)
    return np.einsum("...ni,...ij->...nj", x - xc, rot) + yc


def batch_ot_trans_prior(rng_np: np.random.Generator, trans_1, res_mask,
                         trans_scale: float) -> np.ndarray:
    """Batch-OT coupled translation prior (reference:
    multiflow/data/interpolant.py:88-107 _batch_ot): sample B centered
    gaussians, Kabsch-align every (noise, gt) pair, build the masked
    mean-distance cost matrix, Hungarian-assign, and return the aligned
    noise matched to each ground-truth structure. Host-side numpy — runs
    in the input pipeline, not inside the jitted step."""
    from scipy.optimize import linear_sum_assignment

    trans_1 = np.asarray(trans_1, np.float64)
    res_mask = np.asarray(res_mask, np.float64)
    b, n = res_mask.shape
    noise = rng_np.standard_normal((b, n, 3)) * res_mask[..., None]
    com = noise.sum(-2, keepdims=True) / np.maximum(
        res_mask.sum(-1)[:, None, None], 1.0)
    noise = (noise - com) * res_mask[..., None] * trans_scale

    # all-pairs alignment: noise i onto gt j
    x = np.broadcast_to(noise[:, None], (b, b, n, 3))
    y = np.broadcast_to(trans_1[None, :], (b, b, n, 3))
    w = np.broadcast_to(res_mask[None, :], (b, b, n))
    aligned = _masked_kabsch_align(x, y, w)
    cost = (np.linalg.norm((aligned - y) * w[..., None], axis=-1).sum(-1)
            / np.maximum(w.sum(-1), 1.0))
    noise_idx, gt_idx = linear_sum_assignment(cost)
    out = np.empty_like(noise)
    out[gt_idx] = aligned[noise_idx, gt_idx]
    return out.astype(np.float32)


def corrupt_rotmats(rng, cfg, rotmats_1, t, res_mask):
    """Geodesic from IGSO3-noised rotations (reference:
    interpolant.py:113-136)."""
    b, n = res_mask.shape
    noise = sample_igso3(rng, cfg.igso3_sigma, (b, n))
    rotmats_0 = rotmats_1 @ noise
    if cfg.rots_train_schedule == "exp":
        so3_t = 1 - jnp.exp(-t * cfg.rots_exp_rate)
    else:
        so3_t = t
    rotmats_t = geodesic_t(so3_t[..., None], rotmats_1, rotmats_0)
    eye = jnp.eye(3)
    m = res_mask[..., None, None]
    return rotmats_t * m + eye[None, None] * (1 - m)


def corrupt_aatypes(rng, cfg, aatypes_1, t, res_mask):
    """Masking / uniform corruption (reference: interpolant.py:138-165)."""
    u = jax.random.uniform(rng, aatypes_1.shape)
    corrupt = u < (1 - t)
    if cfg.aatypes_interpolant == "masking":
        aatypes_t = jnp.where(corrupt, MASK_TOKEN_INDEX, aatypes_1)
    elif cfg.aatypes_interpolant == "uniform":
        uniform = jax.random.randint(jax.random.fold_in(rng, 1),
                                     aatypes_1.shape, 0, 20)
        aatypes_t = jnp.where(corrupt, uniform, aatypes_1)
    else:
        raise ValueError(cfg.aatypes_interpolant)
    return jnp.where(res_mask.astype(bool), aatypes_t,
                     MASK_TOKEN_INDEX).astype(jnp.int32)


def corrupt_batch(rng, cfg: SE3InterpolantConfig, batch: Dict) -> Dict:
    """batch: trans_1 [B,N,3] (A), rotmats_1 [B,N,3,3], aatypes_1 [B,N],
    res_mask [B,N]. Adds *_t fields and per-modality times."""
    b = batch["res_mask"].shape[0]
    r_t, r_tr, r_rot, r_cat = jax.random.split(rng, 4)
    t = jax.random.uniform(r_t, (b, 1)) * (1 - 2 * cfg.min_t) + cfg.min_t
    out = dict(batch)
    out["so3_t"] = out["r3_t"] = out["cat_t"] = t
    out["trans_t"] = corrupt_trans(r_tr, cfg, batch["trans_1"], t,
                                   batch["res_mask"],
                                   trans_0=batch.get("trans_0"))
    out["rotmats_t"] = corrupt_rotmats(r_rot, cfg, batch["rotmats_1"], t,
                                       batch["res_mask"])
    out["aatypes_t"] = corrupt_aatypes(r_cat, cfg, batch["aatypes_1"], t,
                                       batch["res_mask"])
    return out


# -- sampling ----------------------------------------------------------------

def _trans_euler_step(d_t, t, trans_1_pred, trans_t):
    vf = (trans_1_pred - trans_t) / (1 - t)
    return trans_t + vf * d_t


def _rots_euler_step(cfg, d_t, t, rotmats_1_pred, rotmats_t):
    if cfg.rots_sample_schedule == "linear":
        scaling = 1.0 / (1.0 - t)
    else:
        scaling = cfg.rots_exp_rate
    return geodesic_t(scaling * d_t, rotmats_1_pred, rotmats_t)


def _regularize_step_probs(step_probs, aatypes_t):
    """Clamp and place the residual mass on the current token
    (reference: interpolant.py:285-303)."""
    s = step_probs.shape[-1]
    step_probs = jnp.clip(step_probs, 0.0, 1.0)
    onehot = jax.nn.one_hot(aatypes_t, s)
    step_probs = step_probs * (1 - onehot)
    resid = jnp.clip(1.0 - step_probs.sum(-1, keepdims=True), 0.0, 1.0)
    return step_probs + resid * onehot


def _aatypes_euler_step(rng, cfg, d_t, t, logits_1, aatypes_t):
    """Masking / uniform DFM Euler step (reference: interpolant.py:305-345)."""
    s = logits_1.shape[-1]
    if cfg.aatypes_interpolant == "masking":
        logits_1 = logits_1.at[..., MASK_TOKEN_INDEX].set(-1e9)
        probs = jax.nn.softmax(logits_1 / cfg.aatypes_temp, -1)
        is_mask = (aatypes_t == MASK_TOKEN_INDEX)[..., None].astype(
            jnp.float32)
        step_probs = d_t * probs * (1 + cfg.aatypes_noise * t) / (1 - t)
        mask_onehot = jax.nn.one_hot(jnp.array(MASK_TOKEN_INDEX), s)
        step_probs += d_t * (1 - is_mask) * mask_onehot * cfg.aatypes_noise
    else:
        probs = jax.nn.softmax(logits_1 / cfg.aatypes_temp, -1)
        p_curr = jnp.take_along_axis(probs, aatypes_t[..., None], -1)
        nn_ = cfg.aatypes_noise
        step_probs = d_t * (probs * (1 + nn_ + nn_ * (s - 1) * t) / (1 - t)
                            + nn_ * p_curr)
    step_probs = _regularize_step_probs(step_probs, aatypes_t)
    e = 1e-10 - jnp.log(jax.random.uniform(rng, step_probs.shape) + 1e-10)
    return jnp.argmax(step_probs / e, axis=-1).astype(jnp.int32)


def _aatypes_euler_step_purity(rng, cfg, d_t, t, logits_1, aatypes_t,
                               res_mask):
    """Purity-ordered unmasking (reference: interpolant.py:347-390):
    unmask the currently-masked positions with the highest model confidence;
    number to unmask ~ Binomial(n_masked, clamp(d_t(1+noise t)/(1-t)))."""
    b, n, s = logits_1.shape
    r1, r2, r3 = jax.random.split(rng, 3)
    logits_wo_mask = logits_1[..., :-1]
    probs = jax.nn.softmax(logits_wo_mask / cfg.aatypes_temp, -1)
    max_logprob = jnp.max(jnp.log(probs + 1e-12), axis=-1)
    max_logprob = max_logprob - (aatypes_t != MASK_TOKEN_INDEX) * 1e9
    order = jnp.argsort(-max_logprob, axis=-1)  # [B,N] best first
    rank = jnp.argsort(order, axis=-1)          # rank of each position

    unmask_prob = jnp.clip(d_t * (1 + cfg.aatypes_noise * t) / (1 - t),
                           0.0, 1.0)
    n_masked = jnp.sum(aatypes_t == MASK_TOKEN_INDEX, axis=-1)
    # Binomial(n, p) via sum of uniforms (n <= N, static shape)
    u = jax.random.uniform(r1, (b, n))
    number_to_unmask = jnp.sum(
        (u < unmask_prob) & (jnp.arange(n)[None] < n_masked[:, None]),
        axis=-1)

    e = 1e-10 - jnp.log(jax.random.uniform(r2, probs.shape) + 1e-10)
    samples = jnp.argmax(probs / e, axis=-1)
    do_unmask = (rank < number_to_unmask[:, None]) \
        & (aatypes_t == MASK_TOKEN_INDEX)
    aatypes_next = jnp.where(do_unmask, samples, aatypes_t)

    # re-mask noise
    remask = jax.random.uniform(r3, (b, n)) < d_t * cfg.aatypes_noise
    aatypes_next = jnp.where(remask & res_mask.astype(bool),
                             MASK_TOKEN_INDEX, aatypes_next)
    return aatypes_next.astype(jnp.int32)


def se3_sample(rng, cfg: SE3InterpolantConfig, model_fn: Callable,
               batch_shape, res_mask, res_idx=None,
               num_timesteps: Optional[int] = None) -> Dict:
    """Euler-sample backbones + sequences from a trained FlowModel.

    model_fn(batch_dict) -> {'pred_trans','pred_rotmats','pred_logits'}.
    Returns final {'trans','rotmats','aatypes'}.
    (reference: interpolant.py:391-616)."""
    b, n = batch_shape
    steps = num_timesteps or cfg.num_timesteps
    ts = jnp.linspace(cfg.min_t, 1.0, steps)
    r_init, r_scan = jax.random.split(rng)
    r_tr, r_rot, r_cat = jax.random.split(r_init, 3)
    trans = centered_gaussian(r_tr, (b, n, 3), res_mask) * cfg.trans_scale
    rotmats = sample_igso3(r_rot, cfg.igso3_sigma, (b, n))
    aatypes = jnp.full((b, n), MASK_TOKEN_INDEX, jnp.int32)
    if res_idx is None:
        res_idx = jnp.broadcast_to(jnp.arange(n)[None], (b, n))

    def model_batch(trans, rotmats, aatypes, t_scalar):
        t = jnp.full((b, 1), t_scalar)
        return {
            "res_mask": res_mask, "res_idx": res_idx,
            "so3_t": t, "r3_t": t, "cat_t": t,
            "trans_t": trans, "rotmats_t": rotmats, "aatypes_t": aatypes,
            "trans_sc": jnp.zeros_like(trans),
            "aatypes_sc": jax.nn.one_hot(aatypes, NUM_TOKENS),
        }

    def body(carry, i):
        trans, rotmats, aatypes = carry
        t_1, t_2 = ts[i], ts[i + 1]
        d_t = t_2 - t_1
        out = model_fn(model_batch(trans, rotmats, aatypes, t_1))
        trans = _trans_euler_step(d_t, t_1, out["pred_trans"], trans)
        rotmats = _rots_euler_step(cfg, d_t, t_1, out["pred_rotmats"],
                                   rotmats)
        step_rng = jax.random.fold_in(r_scan, i)
        if cfg.aatypes_interpolant == "masking" and cfg.aatypes_do_purity:
            aatypes = _aatypes_euler_step_purity(
                step_rng, cfg, d_t, t_1, out["pred_logits"], aatypes,
                res_mask)
        else:
            aatypes = _aatypes_euler_step(step_rng, cfg, d_t, t_1,
                                          out["pred_logits"], aatypes)
        trans = trans * res_mask[..., None]
        return (trans, rotmats, aatypes), None

    (trans, rotmats, aatypes), _ = jax.lax.scan(
        body, (trans, rotmats, aatypes), jnp.arange(steps - 1))
    # final model call: take predictions directly at t=1
    out = model_fn(model_batch(trans, rotmats, aatypes, ts[-1]))
    logits = out["pred_logits"].at[..., MASK_TOKEN_INDEX].set(-1e9) \
        if cfg.aatypes_interpolant == "masking" else out["pred_logits"]
    return {"trans": out["pred_trans"], "rotmats": out["pred_rotmats"],
            "aatypes": jnp.argmax(logits, -1)}

"""Flow-matching training loss with multi-encoder representation alignment.

Clean-room equivalent of the reference SILoss (image/loss.py:153-237):
v-prediction MSE on the interpolant path plus, for each frozen encoder, a
time-weighted negative-cosine alignment between the backbone's projected
activations (z_tilde) and the encoder targets (z). Image-type targets are
per-token [B, T, D]; text-type targets are pooled [B, D].
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence

import jax
import jax.numpy as jnp

from reed_tpu.core.schedules import time_weight
from reed_tpu.diffusion.paths import interpolant, sample_time

IMAGE_ENCODERS = ("dinov2", "dinov1", "mocov3", "clip", "mae", "jepa")


def mean_flat(x):
    return jnp.mean(x, axis=tuple(range(1, x.ndim)))


def cosine_alignment(z, z_tilde, eps: float = 1e-8):
    """-cos(z, z_tilde) averaged over tokens -> [B]. z, z_tilde: [B, T, D] or
    [B, D] (pooled)."""
    if z.ndim == 2:
        z = z[:, None, :]
    if z_tilde.ndim == 2:
        z_tilde = z_tilde[:, None, :]
    zn = z / (jnp.linalg.norm(z, axis=-1, keepdims=True) + eps)
    zt = z_tilde / (jnp.linalg.norm(z_tilde, axis=-1, keepdims=True) + eps)
    return -jnp.sum(zn * zt, axis=-1).mean(axis=-1)


@dataclass(frozen=True)
class FlowMatchingLossConfig:
    prediction: str = "v"
    path_type: str = "linear"          # linear | cosine
    weighting: str = "uniform"          # t-sampling: uniform | lognormal
    enc_names: Sequence[str] = ("dinov2",)
    loss_weights: Sequence[float] = (1.0,)   # per-encoder repa coefficients
    time_schedule: str = "constant"     # constant|linear|cosine|sigmoid|loglinear|cutoff
    cutoffs: Sequence[float] = (0.0, 1.0)


def flow_matching_loss(cfg: FlowMatchingLossConfig, model_fn, x, zs, rng,
                       model_kwargs=None):
    """Compute the REED training loss for one batch.

    model_fn(x_t, t, rng, **model_kwargs) -> (v_pred, zs_tilde)
    x:  [B, H, W, C] clean latents (or any [B, ...] tensor)
    zs: list of encoder targets, each [B, T, D] ('i') or [B, D] ('t')

    Returns (metrics dict with 'denoising_loss', 'proj_loss' [scalars],
    per-key image/text proj losses).
    """
    model_kwargs = model_kwargs or {}
    rng_t, rng_eps, rng_model = jax.random.split(rng, 3)
    b = x.shape[0]
    t = sample_time(rng_t, b, cfg.weighting, cfg.path_type)
    t_b = t.reshape((b,) + (1,) * (x.ndim - 1))

    eps = jax.random.normal(rng_eps, x.shape, x.dtype)
    alpha_t, sigma_t, d_alpha_t, d_sigma_t = interpolant(t_b, cfg.path_type)
    x_t = alpha_t * x + sigma_t * eps
    if cfg.prediction != "v":
        raise NotImplementedError(cfg.prediction)
    target = d_alpha_t * x + d_sigma_t * eps

    v_pred, zs_tilde = model_fn(x_t, t, rng_model, **model_kwargs)
    denoising_loss = mean_flat((v_pred.astype(jnp.float32) - target) ** 2).mean()

    proj_loss = 0.0
    acc = {"image": (0.0, 0), "text": (0.0, 0)}
    for z, z_tilde, enc_name, base_w in zip(zs, zs_tilde, cfg.enc_names,
                                            cfg.loss_weights):
        wts = time_weight(t, base_w, cfg.time_schedule, cfg.cutoffs)
        # base weight 0 => projector-only training at unit weight
        # (reference: image/loss.py:218-219)
        if base_w == 0.0:
            wts = jnp.ones_like(wts)
        curr = cosine_alignment(z.astype(jnp.float32),
                                z_tilde.astype(jnp.float32))  # [B]
        proj_loss = proj_loss + (curr * wts).mean()
        key = ("image" if any(n in enc_name for n in IMAGE_ENCODERS)
               or len(cfg.enc_names) == 1 else "text")
        s, c = acc[key]
        acc[key] = (s + curr.mean(), c + 1)

    metrics = {
        "denoising_loss": denoising_loss,
        "proj_loss": proj_loss,
        "img_proj_loss": acc["image"][0] / max(1, acc["image"][1]),
        "text_proj_loss": acc["text"][0] / max(1, acc["text"][1]),
    }
    return metrics

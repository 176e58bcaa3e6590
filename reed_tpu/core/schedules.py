"""Training curricula and time-weight schedules, as pure jit-safe functions.

Reproduces the REED curriculum semantics (reference: image/train.py:362-398,
image/loss.py:118-151, protein/fmif/train_fmif.py:265-287,
molecule/semlaflow/flowmodels/fm.py:860-865) as one shared implementation:
a REPA-weight decay schedule multiplied into the alignment loss, and a
diffusion-loss warm-up/decay schedule multiplied into the denoising loss.

All functions accept traced `step`/`t` values and static string `kind`s so
they can be evaluated inside a jitted train step.
"""

from __future__ import annotations

import jax.numpy as jnp


def repa_weight_decay(step, repa_steps: float, kind: str = "constant"):
    """Alignment-loss weight as a function of training step.

    kinds: constant | linear | cosine  (reference: image/train.py:363-370).
    """
    s = jnp.asarray(step, jnp.float32)
    if kind == "constant":
        return jnp.ones_like(s)
    if kind == "linear":
        return jnp.maximum(1.0 - s / repa_steps, 0.0)
    if kind == "cosine":
        return jnp.maximum((1.0 + jnp.cos(jnp.pi * s / repa_steps)) / 2.0, 0.0)
    raise NotImplementedError(f"repa_weight_decay kind={kind!r}")


def diffusion_loss_decay(
    step,
    start_steps: float,
    warmup_steps: float,
    max_steps: float,
    kind: str = "constant",
):
    """Denoising-loss weight: 0 before `start_steps`, linear ramp over
    `warmup_steps`, then a constant/linear/cosine tail over the remainder.

    Reference semantics: image/train.py:372-385. (The reference's cosine tail
    has a parenthesization bug — `... / max_steps - top` — we implement the
    intended `(step - top) / (max_steps - top)`.)
    """
    s = jnp.asarray(step, jnp.float32)
    top = start_steps + warmup_steps
    ramp = (s - start_steps) / jnp.maximum(warmup_steps, 1.0)
    if kind == "constant":
        tail = jnp.ones_like(s)
    elif kind == "linear":
        tail = 1.0 - (s - top) / jnp.maximum(max_steps - top, 1.0)
    elif kind == "cosine":
        tail = (1.0 + jnp.cos(jnp.pi * (s - top) / jnp.maximum(max_steps - top, 1.0))) / 2.0
    else:
        raise NotImplementedError(f"diffusion_loss_decay kind={kind!r}")
    out = jnp.where(s < start_steps, 0.0, jnp.where(s < top, ramp, tail))
    return out


def time_weight(t, base_weight: float = 1.0, kind: str = "constant", cutoffs=(0.0, 1.0)):
    """Per-sample time-dependent weight on the alignment loss.

    kinds: constant | linear | cosine | sigmoid | loglinear | cutoff
    (reference: image/loss.py:118-151; t=0 is the clean sample).
    """
    t = jnp.asarray(t, jnp.float32)
    if kind == "linear":
        scale = 1.0 - t
    elif kind == "cosine":
        scale = 0.5 * (1.0 + jnp.cos(jnp.pi * t))
    elif kind == "sigmoid":
        sharpness, midpoint = 10.0, 0.5
        scale = 1.0 / (1.0 + jnp.exp((t - midpoint) * sharpness))
    elif kind == "constant":
        scale = jnp.ones_like(t)
    elif kind == "loglinear":
        scale = 1.0 - jnp.log(t + 1.0)
    elif kind == "cutoff":
        scale = jnp.where((t < cutoffs[0]) | (t > cutoffs[1]), 0.0, 1.0)
    else:
        raise NotImplementedError(f"time_weight kind={kind!r}")
    return base_weight * scale


def encoder_weight(
    base_weight: float,
    step,
    total_steps: float,
    kind: str = "linear",
    focus: str = "text",
    transition_point: float = 0.5,
    sharpness: float = 10.0,
):
    """Training-progress-sensitive per-encoder weight
    (reference: image/loss.py:66-116)."""
    progress = jnp.asarray(step, jnp.float32) / total_steps
    if kind == "linear":
        scale = 1.0 - progress if focus == "text" else progress
    elif kind == "cosine":
        c = jnp.cos(jnp.pi * progress)
        scale = 0.5 * (1.0 + c) if focus == "text" else 0.5 * (1.0 - c)
    elif kind == "sigmoid":
        x = (progress - transition_point) * sharpness
        sig = 1.0 / (1.0 + jnp.exp(x))
        scale = sig if focus == "text" else 1.0 - sig
    else:
        raise ValueError(f"encoder_weight kind={kind!r}")
    return base_weight * scale


def cosine_anneal(step, total_steps: float, start: float, end: float):
    """Cosine annealing from `start` to `end` (reference: image/train.py:47-50)."""
    s = jnp.asarray(step, jnp.float32)
    val = end + (start - end) / 2.0 * (1.0 + jnp.cos(s / total_steps * jnp.pi))
    return jnp.where(s >= total_steps, end, val)

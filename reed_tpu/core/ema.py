"""Exponential moving average of parameter pytrees.

One implementation shared by all domains (reference re-implements EMA three
times: image/train.py:94-105, molecule/equivariant_diffusion/utils.py:5-19,
molecule/semlaflow/flowmodels/fm.py:450-469). Runs inside the jitted train
step as a tree_map — no host round-trip.
"""

from __future__ import annotations

import jax


def ema_update(ema_params, params, decay: float = 0.9999):
    """ema <- decay * ema + (1 - decay) * params."""
    return jax.tree.map(lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay),
                        ema_params, params)


def ema_init(params, dtype=None):
    """Initialize EMA as a copy of params (optionally downcast — bfloat16
    EMA halves its HBM footprint on large models; ema_update keeps the
    accumulation in the EMA dtype)."""
    if dtype is None:
        return jax.tree.map(lambda p: p, params)
    return jax.tree.map(lambda p: p.astype(dtype), params)

"""Train state pytree and optimizer factory."""

from __future__ import annotations

from typing import Any

import flax.struct
import jax.numpy as jnp
import optax

from reed_tpu.core.config import OptimConfig


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray          # scalar int32
    params: Any
    ema_params: Any
    opt_state: Any


def make_optimizer(cfg: OptimConfig) -> optax.GradientTransformation:
    """Adam(W) with optional global-norm clipping and LR schedule. The
    reference uses constant-LR Adam everywhere except semlaflow's one-cycle
    (image/train.py:253-259, molecule/semlaflow/flowmodels/fm.py:506-528)."""
    if cfg.schedule == "constant":
        lr = cfg.lr
    elif cfg.schedule == "cosine":
        lr = optax.warmup_cosine_decay_schedule(
            0.0, cfg.lr, cfg.warmup_steps, cfg.total_steps)
    elif cfg.schedule == "onecycle":
        lr = optax.linear_onecycle_schedule(cfg.total_steps, cfg.lr)
    else:
        raise ValueError(cfg.schedule)

    chain = []
    if cfg.grad_clip is not None:
        chain.append(optax.clip_by_global_norm(cfg.grad_clip))
    mu_dtype = jnp.dtype(cfg.mu_dtype) if cfg.mu_dtype else None
    if cfg.weight_decay > 0:
        chain.append(optax.adamw(lr, b1=cfg.b1, b2=cfg.b2, eps=cfg.eps,
                                 weight_decay=cfg.weight_decay,
                                 mu_dtype=mu_dtype))
    else:
        chain.append(optax.adam(lr, b1=cfg.b1, b2=cfg.b2, eps=cfg.eps,
                                mu_dtype=mu_dtype))
    tx = optax.chain(*chain)
    if cfg.accum_steps > 1:
        # gradient accumulation (replaces accelerate's grad-accum wrapper,
        # reference image/train.py:141-151)
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.accum_steps)
    return tx

"""Generic jitted train-step factory: loss + curriculum + optimizer + EMA in
one XLA program with donated state buffers.

Replaces the reference's per-domain hand-written loops
(image/train.py:331-473, protein/fmif/train_fmif.py:255-358,
molecule/semlaflow/flowmodels/fm.py:590-675) with a single implementation;
domains supply `loss_fn(params, batch, rng, step) -> (metrics, aux)` where
metrics must contain 'denoising_loss' and 'proj_loss'.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from reed_tpu.core.config import CurriculumConfig
from reed_tpu.core.ema import ema_update
from reed_tpu.core.schedules import diffusion_loss_decay, repa_weight_decay
from reed_tpu.core.train_state import TrainState


def combine_losses(metrics: dict, step, cur: CurriculumConfig):
    """total = denoising * diffusion_decay(step) + proj * proj_coeff * repa_decay(step)."""
    dd = diffusion_loss_decay(step, cur.start_diffusion_steps,
                              cur.diffusion_warmup_steps, cur.max_steps,
                              cur.diffusion_decay)
    rw = repa_weight_decay(step, cur.repa_steps, cur.repa_decay)
    total = metrics["denoising_loss"] * dd + metrics["proj_loss"] * cur.proj_coeff * rw
    return total, {"diffusion_decay": dd, "repa_decay": rw}


def make_train_step(
    loss_fn: Callable,
    optimizer: optax.GradientTransformation,
    curriculum: CurriculumConfig,
    accum_steps: int = 1,
) -> Callable:
    """Build `train_step(state, batch, rng) -> (state, metrics)`.

    loss_fn(params, batch, rng, step) -> metrics dict (with at least
    'denoising_loss'; 'proj_loss' defaults to 0 when absent).

    With gradient accumulation (optax.MultiSteps, accum_steps > 1) `state.step`
    counts micro-steps; curriculum schedules see the *optimizer* step
    (step // accum_steps) and EMA only moves on the micro-step where MultiSteps
    applies the accumulated update, matching the reference's per-optimizer-step
    semantics (image/train.py grad-accum via accelerate).
    """

    def train_step(state: TrainState, batch, rng):
        step_rng = jax.random.fold_in(rng, state.step)
        opt_step = state.step // accum_steps

        def total_loss(params):
            metrics = loss_fn(params, batch, step_rng, opt_step)
            if "proj_loss" not in metrics:
                metrics = dict(metrics, proj_loss=jnp.zeros(()))
            total, sched = combine_losses(metrics, opt_step, curriculum)
            return total, {**metrics, **sched}

        (loss, metrics), grads = jax.value_and_grad(total_loss, has_aux=True)(
            state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        # EMA applies on the micro-step where MultiSteps commits the update
        # AND only every `ema_every` optimizer steps, with decay^ema_every —
        # same average, (k-1)/k of the EMA read-modify-write HBM traffic
        # saved (it is pure bandwidth: ~3 full param copies per step).
        period = accum_steps * max(1, curriculum.ema_every)
        decay_k = curriculum.ema_decay ** max(1, curriculum.ema_every)
        if period > 1:
            applied = (state.step % period) == period - 1
            decay = jnp.where(applied, decay_k, 1.0)
        else:
            decay = decay_k
        ema_params = ema_update(state.ema_params, params, decay)
        metrics = dict(metrics, loss=loss,
                       grad_norm=optax.global_norm(grads))
        new_state = TrainState(step=state.step + 1, params=params,
                               ema_params=ema_params, opt_state=opt_state)
        return new_state, metrics

    return train_step


def jit_train_step(train_step, mesh=None, state_shardings=None,
                   batch_sharding=None):
    """jit with donated state and explicit shardings when a mesh is given."""
    if mesh is None:
        return jax.jit(train_step, donate_argnums=(0,))
    return jax.jit(
        train_step,
        donate_argnums=(0,),
        in_shardings=(state_shardings, batch_sharding, None),
        out_shardings=(state_shardings, None),
    )

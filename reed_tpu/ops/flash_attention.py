"""Pallas TPU attention kernel for the SiT hot path.

Replaces the CUDA fused SDPA the reference gets from timm
(image/models/sit.py:114-118). Sequence lengths in all REED domains are
<= 256 tokens (SURVEY.md §5.7), so K/V for one (batch, head) fit in VMEM
whole — the kernel blocks over queries only and computes an exact softmax
per q-tile (no online rescaling needed at these sizes, which removes the
rescale traffic a general flash kernel pays for).

Layout: caller passes [B, S, H, D]; we fold (B, H) into the grid and pad the
head dim to the 128-lane MXU tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[0]  # [BQ, D]
    k = k_ref[0]  # [S, D]
    v = v_ref[0]  # [S, D]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [BQ, S]
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = (o / denom).astype(o_ref.dtype)


def flash_attention(q, k, v, mask=None, block_q: int = 128):
    """q,k,v: [B, S, H, D] -> [B, S, H, D]. mask unsupported (XLA fallback
    handles masked attention; SiT attention is dense/unmasked).

    Differentiable: forward runs the Pallas kernel; the backward pass
    recomputes gradients through the XLA SDPA reference (identical math).
    A fused Pallas backward kernel is the planned perf follow-up."""
    if mask is not None:
        from reed_tpu.ops.attention import sdpa_xla

        return sdpa_xla(q, k, v, mask=mask)
    return _flash_attention(q, k, v)


@jax.custom_vjp
def _flash_attention(q, k, v):
    return _flash_forward(q, k, v)


def _flash_fwd_rule(q, k, v):
    return _flash_forward(q, k, v), (q, k, v)


def _flash_bwd_rule(res, g):
    from reed_tpu.ops.attention import sdpa_xla

    q, k, v = res
    _, vjp = jax.vjp(lambda a, b, c: sdpa_xla(a, b, c), q, k, v)
    return vjp(g)


_flash_attention.defvjp(_flash_fwd_rule, _flash_bwd_rule)


@functools.partial(jax.jit, static_argnames=("block_q",))
def _flash_forward(q, k, v, block_q: int = 128):
    b, s, h, d = q.shape
    scale = d ** -0.5
    d_pad = max(128, ((d + 127) // 128) * 128)

    def fold(x):
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, s, d)
        if d_pad != d:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, d_pad - d)))
        return x

    qf, kf, vf = fold(q), fold(k), fold(v)
    nq = s // block_q

    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        grid=(b * h, nq),
        in_specs=[
            pl.BlockSpec((1, block_q, d_pad), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, d_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, d_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d_pad), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, s, d_pad), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * s * s * d_pad,
            bytes_accessed=(b * h * s * d_pad) * 4 * q.dtype.itemsize,
            transcendentals=b * h * s * s,
        ),
    )(qf, kf, vf)

    out = out[:, :, :d].reshape(b, h, s, d)
    return jnp.transpose(out, (0, 2, 1, 3))

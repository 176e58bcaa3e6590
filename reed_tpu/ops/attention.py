"""Attention ops: XLA SDPA with an optional Pallas flash-attention kernel.

The reference uses timm's fused SDPA inside SiT blocks
(image/models/sit.py:114-118). Here `multi_head_attention` is the single
entry point; `impl='pallas'` selects the TPU flash kernel in
reed_tpu.ops.flash_attention (written for MXU tiling; falls back to XLA on
CPU or when shapes don't fit the tile constraints).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def sdpa_xla(q, k, v, mask=None):
    """Plain XLA scaled dot-product attention.

    q,k,v: [B, S, H, D] (sequence-major, heads folded inside — matches
    jax.nn.dot_product_attention layout).
    """
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.finfo(logits.dtype).min)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


def multi_head_attention(q, k, v, mask=None, impl: str = "auto"):
    """q,k,v: [B, S, H, D] -> [B, S, H, D].

    impl: 'auto' | 'xla' | 'pallas'. 'auto' picks pallas on TPU when the
    shape fits the kernel tiles, else XLA SDPA (which XLA itself fuses well
    at S<=256 — SURVEY.md §5.7: all reference seq lens are <=256).
    """
    if impl == "auto":
        impl = "pallas" if _pallas_ok(q) else "xla"
    if impl == "pallas":
        from reed_tpu.ops.flash_attention import flash_attention

        return flash_attention(q, k, v, mask=mask)
    return sdpa_xla(q, k, v, mask=mask)


@functools.lru_cache(maxsize=1)
def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _pallas_ok(q) -> bool:
    if not _on_tpu():
        return False
    b, s, h, d = q.shape
    # Measured on v5e (tools/bench_attention.py, 2026-08): XLA's fused SDPA
    # wins at every REED shape — S<=256 tokens, including lane-aligned
    # D=128 (1468us vs 1830us fwd) and the SiT-XL flagship D=72 where the
    # kernel's 72->128 lane padding wastes 44% of MXU work (full train step
    # 150.8 imgs/s XLA vs 134.0 forced-pallas). The Pallas kernel only
    # starts paying at long sequences (S=1024: 2013us vs 2294us; S=2048:
    # 2438us vs 3337us), so auto-enable needs BOTH lane-aligned head dim
    # and S >= 1024.
    return s % 128 == 0 and s >= 1024 and d % 128 == 0

"""Shared neural-net building blocks (flax.linen).

Clean-room equivalents of the reference layer zoo: projector MLPs
(image/models/sit.py:17-24, protein/fmif/model_utils.py:255-283), timestep /
label embedders (image/models/sit.py:32-105), adaLN modulation
(image/models/sit.py:26-27), patchify and 2D sin-cos position embeddings
(image/models/sit.py:313-345).

Compute dtype is configurable (bf16 on TPU); params stay f32.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any

xavier_uniform = nn.initializers.xavier_uniform()


def gelu_exact(x):
    """erf-based GELU (torch nn.GELU default; flax defaults to the tanh
    approximation — matters for checkpoint-conversion parity)."""
    import jax

    return jax.nn.gelu(x, approximate=False)
normal02 = nn.initializers.normal(stddev=0.02)
zeros_init = nn.initializers.zeros


class DenseParams(nn.Module):
    """nn.Dense-compatible (kernel, bias) holder whose kernel the caller
    slices for factored concat matmuls: a Dense over
    concat([a_broadcast, b, ...]) equals the sum of per-part matmuls with
    kernel row slices, letting broadcast parts run as small matmuls BEFORE
    broadcasting (K- or N-fold fewer FLOPs) and keeping the wide concat
    from ever materializing. Param tree matches nn.Dense exactly (kernel
    [in, out], bias [out]) so checkpoints and torch converters are
    unaffected. Exact modulo fp summation order."""

    in_features: int
    features: int
    dtype: Any = None
    kernel_init: Callable = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", self.kernel_init,
                            (self.in_features, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        dtype = self.dtype or jnp.float32
        return kernel.astype(dtype), bias.astype(dtype)


class ProjectorMLP(nn.Module):
    """3-layer SiLU MLP projecting backbone activations to an encoder's
    representation space (z-tilde). Reference: image/models/sit.py:17-24."""

    projector_dim: int
    z_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.projector_dim, dtype=self.dtype, kernel_init=xavier_uniform)(x)
        x = nn.silu(x)
        x = nn.Dense(self.projector_dim, dtype=self.dtype, kernel_init=xavier_uniform)(x)
        x = nn.silu(x)
        x = nn.Dense(self.z_dim, dtype=self.dtype, kernel_init=xavier_uniform)(x)
        return x


def modulate(x, shift, scale):
    """adaLN modulation; shift/scale: [B, D], x: [B, T, D]."""
    return x * (1.0 + scale[:, None, :]) + shift[:, None, :]


def timestep_embedding(t, dim: int, max_period: float = 10000.0):
    """Sinusoidal embeddings of (fractional) timesteps; t: [B] -> [B, dim]."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class TimestepEmbedder(nn.Module):
    hidden_size: int
    frequency_embedding_size: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, t):
        x = timestep_embedding(t, self.frequency_embedding_size)
        x = nn.Dense(self.hidden_size, dtype=self.dtype, kernel_init=normal02)(x)
        x = nn.silu(x)
        x = nn.Dense(self.hidden_size, dtype=self.dtype, kernel_init=normal02)(x)
        return x


class LabelEmbedder(nn.Module):
    """Class-label embedding with CFG dropout to a trailing null class
    (reference: image/models/sit.py:73-105)."""

    num_classes: int
    hidden_size: int
    dropout_prob: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, y, train: bool = False):
        use_cfg_embedding = self.dropout_prob > 0
        table = nn.Embed(
            self.num_classes + int(use_cfg_embedding),
            self.hidden_size,
            embedding_init=normal02,
            dtype=self.dtype,
        )
        if train and use_cfg_embedding:
            rng = self.make_rng("label_dropout")
            drop = jax.random.bernoulli(rng, self.dropout_prob, y.shape)
            y = jnp.where(drop, self.num_classes, y)
        return table(y)


class Mlp(nn.Module):
    hidden_dim: int
    out_dim: Optional[int] = None
    # tanh-approx GELU by default (measured ~15% faster SiT-XL step on v5e
    # than erf); use gelu_exact for torch-checkpoint parity
    act: Callable = nn.gelu
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out_dim = self.out_dim or x.shape[-1]
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, kernel_init=xavier_uniform,
                     name="fc1")(x)
        x = self.act(x)
        x = nn.Dense(out_dim, dtype=self.dtype, kernel_init=xavier_uniform,
                     name="fc2")(x)
        return x


class Attention(nn.Module):
    """Multi-head self-attention with fused qkv projection."""

    num_heads: int
    qkv_bias: bool = True
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x, mask=None):
        from reed_tpu.ops.attention import multi_head_attention

        b, t, d = x.shape
        head_dim = d // self.num_heads
        qkv = nn.Dense(3 * d, use_bias=self.qkv_bias, dtype=self.dtype,
                       kernel_init=xavier_uniform, name="qkv")(x)
        qkv = qkv.reshape(b, t, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        out = multi_head_attention(q, k, v, mask=mask, impl=self.attn_impl)
        out = out.reshape(b, t, d)
        return nn.Dense(d, dtype=self.dtype, kernel_init=xavier_uniform,
                        name="proj")(out)


def patchify(x, patch_size: int):
    """[B, H, W, C] -> [B, (H/p)*(W/p), p*p*C] (row-major patches)."""
    b, h, w, c = x.shape
    p = patch_size
    x = x.reshape(b, h // p, p, w // p, p, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(b, (h // p) * (w // p), p * p * c)


def unpatchify(x, patch_size: int, channels: int):
    """[B, T, p*p*C] -> [B, H, W, C]; matches reference unpatchify layout
    (image/models/sit.py:320-333, NCHW there / NHWC here)."""
    b, t, _ = x.shape
    p = patch_size
    hw = int(math.isqrt(t))
    assert hw * hw == t
    x = x.reshape(b, hw, hw, p, p, channels)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(b, hw * p, hw * p, channels)


def get_2d_sincos_pos_embed(embed_dim: int, grid_size: int) -> np.ndarray:
    """Fixed 2D sin-cos position embedding [grid*grid, D]
    (reference: image/models/sit.py:335-372)."""

    def get_1d(dim, pos):
        omega = np.arange(dim // 2, dtype=np.float64) / (dim / 2.0)
        omega = 1.0 / 10000 ** omega
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    grid_h = np.arange(grid_size, dtype=np.float32)
    grid_w = np.arange(grid_size, dtype=np.float32)
    grid = np.meshgrid(grid_w, grid_h)  # w first
    grid = np.stack(grid, axis=0).reshape(2, 1, grid_size, grid_size)
    emb_h = get_1d(embed_dim // 2, grid[0])
    emb_w = get_1d(embed_dim // 2, grid[1])
    return np.concatenate([emb_h, emb_w], axis=1).astype(np.float32)

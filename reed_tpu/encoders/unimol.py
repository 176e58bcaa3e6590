"""UniMol global-representation encoder in JAX (frozen molecule encoder for
GEOM-Drugs representation guidance).

Clean-room rebuild of the inference path of
molecule/models/unimol/unimol/models/unimol_global.py:20-330 and
transformer_encoder_with_pair.py: token embeddings (BOS/EOS framing),
Gaussian pairwise distance features per (atom-type, atom-type) edge type,
a pair-biased transformer where each layer's pre-softmax attention logits
become the next layer's pair bias, mean pooling, a NonLinearHead global-rep
projection, and a parameter-free standardization — i.e. exactly the
`output_global_rep_only=True` route the REED pipelines call
(molecule/semlaflow/flowmodels/encoders.py:258-330).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any
NEG_INF = -1e9


def gaussian(x, mean, std):
    a = (2 * math.pi) ** 0.5
    return jnp.exp(-0.5 * (((x - mean) / std) ** 2)) / (a * std)


class GaussianLayer(nn.Module):
    """Per-edge-type affine distance -> K gaussian features
    (reference: unimol.py:421-441)."""

    k: int = 128
    edge_types: int = 1024

    @nn.compact
    def __call__(self, dist, edge_type):
        means = self.param("means", nn.initializers.uniform(3.0), (1, self.k))
        stds = self.param("stds", nn.initializers.uniform(3.0), (1, self.k))
        mul = nn.Embed(self.edge_types, 1, name="mul")(edge_type)[..., 0]
        bias = nn.Embed(self.edge_types, 1, name="bias")(edge_type)[..., 0]
        x = (mul * dist + bias)[..., None]
        return gaussian(x, means.reshape(-1),
                        jnp.abs(stds.reshape(-1)) + 1e-5)


class PairBiasedLayer(nn.Module):
    """Transformer layer whose attention logits (incl. incoming bias) are
    returned as the next layer's bias (unicore TransformerEncoderLayer with
    return_attn; pre-LN)."""

    embed_dim: int
    ffn_dim: int
    heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attn_bias):
        """x [B,N,D]; attn_bias [B,H,N,N] (already -inf at padded keys)."""
        b, n, d = x.shape
        hd = d // self.heads
        h = nn.LayerNorm(dtype=self.dtype, name="self_attn_layer_norm")(x)
        q = nn.Dense(d, dtype=self.dtype, name="q_proj")(h) * (hd ** -0.5)
        k = nn.Dense(d, dtype=self.dtype, name="k_proj")(h)
        v = nn.Dense(d, dtype=self.dtype, name="v_proj")(h)
        q = q.reshape(b, n, self.heads, hd)
        k = k.reshape(b, n, self.heads, hd)
        v = v.reshape(b, n, self.heads, hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) + attn_bias
        probs = jax.nn.softmax(logits.astype(jnp.float32), -1
                               ).astype(self.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, n, d)
        x = x + nn.Dense(d, dtype=self.dtype, name="out_proj")(o)

        h = nn.LayerNorm(dtype=self.dtype, name="final_layer_norm")(x)
        h = nn.Dense(self.ffn_dim, dtype=self.dtype, name="fc1")(h)
        h = jax.nn.gelu(h, approximate=False)
        x = x + nn.Dense(d, dtype=self.dtype, name="fc2")(h)
        return x, logits  # logits feed the next layer's pair bias


class UniMolGlobal(nn.Module):
    vocab_size: int = 32             # atom dictionary incl. special tokens
    embed_dim: int = 512
    ffn_dim: int = 2048
    heads: int = 64
    layers: int = 15
    gaussian_k: int = 128
    rep_dim: int = 512
    padding_idx: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, src_tokens, src_distance, src_edge_type):
        """src_tokens [B,N] (0 = pad; BOS/EOS included as in unicore
        collation), src_distance [B,N,N], src_edge_type [B,N,N]
        (= type_i * vocab + type_j). Returns standardized global rep [B,R]."""
        b, n = src_tokens.shape
        padding = (src_tokens == self.padding_idx)
        x = nn.Embed(self.vocab_size, self.embed_dim, dtype=self.dtype,
                     name="embed_tokens")(src_tokens)

        gbf = GaussianLayer(self.gaussian_k,
                            self.vocab_size * self.vocab_size,
                            name="gbf")(src_distance, src_edge_type)
        bias = nn.Dense(self.gaussian_k, dtype=self.dtype,
                        name="gbf_proj_fc1")(gbf)
        bias = jax.nn.gelu(bias, approximate=False)
        bias = nn.Dense(self.heads, dtype=self.dtype,
                        name="gbf_proj_fc2")(bias)
        attn_bias = jnp.transpose(bias, (0, 3, 1, 2))  # [B,H,N,N]
        attn_bias = jnp.where(padding[:, None, None, :], NEG_INF, attn_bias)

        x = nn.LayerNorm(dtype=self.dtype, name="emb_layer_norm")(x)
        x = x * (1.0 - padding[..., None].astype(x.dtype))
        for i in range(self.layers):
            x, attn_bias = PairBiasedLayer(
                self.embed_dim, self.ffn_dim, self.heads, dtype=self.dtype,
                name=f"layers_{i}")(x, attn_bias)
        x = nn.LayerNorm(dtype=self.dtype, name="final_layer_norm")(x)

        # UNMASKED mean over the full padded sequence — the reference pools
        # encoder_rep.mean(dim=1) with padded positions still carrying their
        # FFN-evolved values (unimol_global.py:290-292); checkpoint parity
        # requires reproducing that, not a masked mean
        rep = jnp.mean(x, axis=1)
        # global_rep_head: 3-layer GELU MLP (unimol_global.py:222-228)
        rep = nn.Dense(self.embed_dim, dtype=self.dtype,
                       name="global_head_fc1")(rep)
        rep = jax.nn.gelu(rep, approximate=False)
        rep = nn.Dense(self.embed_dim, dtype=self.dtype,
                       name="global_head_fc2")(rep)
        rep = jax.nn.gelu(rep, approximate=False)
        rep = nn.Dense(self.rep_dim, dtype=self.dtype,
                       name="global_head_fc3")(rep)
        rep = rep.astype(jnp.float32)
        mean = rep.mean(-1, keepdims=True)
        # torch .std() is unbiased (ddof=1) — parity matters here
        std = rep.std(-1, keepdims=True, ddof=1)
        return (rep - mean) / (std + 1e-6)


def format_input_to_unimol(atom_types, coords, mask,
                           bos_idx: int = 1, eos_idx: int = 2,
                           offset: int = 3):
    """Dense molecule batch -> UniMol inputs with BOS/EOS framing
    (reference: encoders.py:221-257 format_input_to_unimol). atom_types are
    vocabulary ids; the unimol dictionary reserves 0=pad, 1=bos, 2=eos."""
    b, n = atom_types.shape
    tokens = np.zeros((b, n + 2), np.int32)
    dist = np.zeros((b, n + 2, n + 2), np.float32)
    pos = np.zeros((b, n + 2, 3), np.float32)
    for i in range(b):
        k = int(mask[i].sum())
        tokens[i, 0] = bos_idx
        tokens[i, 1:k + 1] = np.asarray(atom_types[i][:k]) + offset
        tokens[i, k + 1] = eos_idx
        pos[i, 1:k + 1] = coords[i][:k]
        d = np.linalg.norm(pos[i][:, None] - pos[i][None], axis=-1)
        dist[i, :k + 2, :k + 2] = d[:k + 2, :k + 2]
    edge_type = tokens[:, :, None] * 32 + tokens[:, None, :]
    return tokens, dist, edge_type.astype(np.int32)

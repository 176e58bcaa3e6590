"""TorchMD-ET equivariant transformer in JAX — the frozen "Frad" molecule
encoder (QM9 representation guidance).

Clean-room rebuild of molecule/models/torchmdnet/models/torchmd_et.py
(TorchMD_ET + EquivariantMultiHeadAttention) and models/utils.py
(NeighborEmbedding, ExpNormalSmearing, CosineCutoff) — redesigned
dense-batched for TPU: instead of torch-geometric radius_graph + scatter,
edges are the dense [B,N,N] pair grid masked by the cosine-cutoff radius
(QM9 molecules are <=29 atoms, so N^2 is trivial and MXU-friendly).

Matches the reference math: expnorm RBFs, distance-modulated keys/values,
SiLU attention activation scaled by the cosine cutoff, 3-way value split
(scalar, vector-gate, direction-gate), vector features updated via gated
neighbor vectors + gated unit directions, output heads o1/o2/o3 with
vec1·vec2 inner products. `global_representation` reproduces the
sum-pool + layernorm of molecule/semlaflow/flowmodels/encoders.py:258-330.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any


def cosine_cutoff(d, cutoff_upper: float = 5.0, cutoff_lower: float = 0.0):
    """Reference: models/utils.py:162-195."""
    if cutoff_lower > 0:
        c = 0.5 * (jnp.cos(math.pi * (2 * (d - cutoff_lower)
                                      / (cutoff_upper - cutoff_lower) + 1.0))
                   + 1.0)
        return c * (d < cutoff_upper) * (d > cutoff_lower)
    c = 0.5 * (jnp.cos(d * math.pi / cutoff_upper) + 1.0)
    return c * (d < cutoff_upper)


class ExpNormalSmearing(nn.Module):
    """PhysNet expnorm RBFs (reference: models/utils.py:109-160)."""

    num_rbf: int = 50
    cutoff_upper: float = 5.0
    cutoff_lower: float = 0.0
    trainable: bool = True

    @nn.compact
    def __call__(self, d):
        start = math.exp(-self.cutoff_upper + self.cutoff_lower)
        means_init = np.linspace(start, 1.0, self.num_rbf).astype(np.float32)
        betas_init = np.full(
            self.num_rbf, (2 / self.num_rbf * (1 - start)) ** -2, np.float32)
        if self.trainable:
            means = self.param("means", lambda k: jnp.asarray(means_init))
            betas = self.param("betas", lambda k: jnp.asarray(betas_init))
        else:
            means, betas = jnp.asarray(means_init), jnp.asarray(betas_init)
        alpha = 5.0 / (self.cutoff_upper - self.cutoff_lower)
        cut = cosine_cutoff(d, self.cutoff_upper)
        arg = jnp.exp(-alpha * (d[..., None] - self.cutoff_lower)) - means
        return cut[..., None] * jnp.exp(-betas * arg ** 2)


class ETAttention(nn.Module):
    """EquivariantMultiHeadAttention, dense-batched
    (reference: torchmd_et.py:236-380)."""

    hidden: int = 128
    num_heads: int = 8
    num_rbf: int = 50
    cutoff_upper: float = 5.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, vec, d, d_unit, f_ij, edge_mask):
        """x [B,N,H], vec [B,N,3,H], d [B,N,N], d_unit [B,N,N,3],
        f_ij [B,N,N,R], edge_mask [B,N,N]. Returns (dx, dvec)."""
        b, n, hdim = x.shape
        heads, head_dim = self.num_heads, self.hidden // self.num_heads
        x_ln = nn.LayerNorm(dtype=self.dtype, name="layernorm")(x)
        q = nn.Dense(self.hidden, dtype=self.dtype, name="q_proj")(x_ln)
        k = nn.Dense(self.hidden, dtype=self.dtype, name="k_proj")(x_ln)
        v = nn.Dense(3 * self.hidden, dtype=self.dtype, name="v_proj")(x_ln)
        vec_proj = nn.Dense(3 * self.hidden, use_bias=False,
                            dtype=self.dtype, name="vec_proj")(vec)
        vec1, vec2, vec3 = jnp.split(vec_proj, 3, axis=-1)
        vec_dot = jnp.sum(vec1 * vec2, axis=2)  # [B,N,H]

        dk = nn.silu(nn.Dense(self.hidden, dtype=self.dtype,
                              name="dk_proj")(f_ij))
        dv = nn.silu(nn.Dense(3 * self.hidden, dtype=self.dtype,
                              name="dv_proj")(f_ij))

        q = q.reshape(b, n, heads, head_dim)
        k = k.reshape(b, n, heads, head_dim)
        v = v.reshape(b, n, heads, 3 * head_dim)
        dk = dk.reshape(b, n, n, heads, head_dim)
        dv = dv.reshape(b, n, n, heads, 3 * head_dim)

        # attn[b,i,j,h] = silu(sum_d q_i k_j dk_ij) * cutoff(d_ij)
        attn = jnp.einsum("bihd,bjhd,bijhd->bijh", q, k, dk)
        attn = nn.silu(attn) * cosine_cutoff(d, self.cutoff_upper)[..., None]
        attn = attn * edge_mask[..., None]

        v_j = v[:, None, :, :, :] * dv  # [B,i,j,h,3hd]
        s, g_vec, g_dir = jnp.split(v_j, 3, axis=-1)
        # scalar update: sum_j attn * s
        dx = jnp.einsum("bijh,bijhd->bihd", attn, s).reshape(b, n, self.hidden)
        # vector update: sum_j attn * (vec_j * g_vec + d_unit * g_dir)
        att_gv = attn[..., None] * g_vec          # [B,i,j,h,hd]
        att_gd = attn[..., None] * g_dir
        vec_h = vec.reshape(b, n, 3, heads, head_dim)
        dvec = (jnp.einsum("bijhd,bjchd->bichd", att_gv, vec_h)
                + jnp.einsum("bijhd,bijc->bichd", att_gd, d_unit))
        dvec = dvec.reshape(b, n, 3, self.hidden)

        o1, o2, o3 = jnp.split(
            nn.Dense(3 * self.hidden, dtype=self.dtype, name="o_proj")(dx),
            3, axis=-1)
        dx_out = vec_dot * o2 + o3
        dvec_out = vec3 * o1[:, :, None, :] + dvec
        return dx_out, dvec_out


class TorchMDET(nn.Module):
    """Full encoder (reference: torchmd_et.py:16-230)."""

    hidden: int = 128
    num_layers: int = 6
    num_rbf: int = 50
    num_heads: int = 8
    cutoff_upper: float = 5.0
    max_z: int = 100
    neighbor_embedding: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z, pos, node_mask):
        """z [B,N] atomic numbers; pos [B,N,3]; node_mask [B,N].
        Returns (x [B,N,H], vec [B,N,3,H])."""
        b, n = z.shape
        diff = pos[:, :, None, :] - pos[:, None, :, :]
        d = jnp.sqrt(jnp.sum(diff ** 2, -1) + 1e-12)
        pair_mask = node_mask[:, :, None] * node_mask[:, None, :] \
            * (1.0 - jnp.eye(n)[None])
        edge_mask = pair_mask * (d < self.cutoff_upper)
        d_unit = diff / jnp.maximum(d[..., None], 1e-6)

        f_ij = ExpNormalSmearing(self.num_rbf, self.cutoff_upper,
                                 name="distance_expansion")(d)
        x = nn.Embed(self.max_z, self.hidden, dtype=self.dtype,
                     name="embedding")(z)

        if self.neighbor_embedding:
            # reference: models/utils.py:40-80
            c = cosine_cutoff(d, self.cutoff_upper)
            w = nn.Dense(self.hidden, dtype=self.dtype,
                         name="neighbor_distance_proj")(f_ij) \
                * (c * edge_mask)[..., None]
            x_nbr = nn.Embed(self.max_z, self.hidden, dtype=self.dtype,
                             name="neighbor_embedding")(z)
            agg = jnp.einsum("bijh,bjh->bih", w, x_nbr)
            x = nn.Dense(self.hidden, dtype=self.dtype, name="combine")(
                jnp.concatenate([x, agg], -1))

        vec = jnp.zeros((b, n, 3, self.hidden), self.dtype)
        for i in range(self.num_layers):
            dx, dvec = ETAttention(self.hidden, self.num_heads, self.num_rbf,
                                   self.cutoff_upper, dtype=self.dtype,
                                   name=f"attention_layers_{i}")(
                x, vec, d, d_unit, f_ij, edge_mask)
            x = x + dx
            vec = vec + dvec
        x = nn.LayerNorm(dtype=self.dtype, name="out_norm")(x)
        return x * node_mask[..., None], vec


class FradEncoder(nn.Module):
    """Frad global-representation head: sum-pooled ET features, layernormed
    (reference: molecule/semlaflow/flowmodels/encoders.py:258-330
    get_global_representation)."""

    et: TorchMDET = TorchMDET()

    @nn.compact
    def __call__(self, z, pos, node_mask):
        x, _ = self.et(z, pos, node_mask)
        pooled = jnp.sum(x * node_mask[..., None], axis=1)
        return nn.LayerNorm(name="rep_norm")(pooled)


def convert_torchmd_et(state_dict: Dict[str, np.ndarray],
                       num_layers: int = 6) -> Dict:
    """torch TorchMD_ET state dict (numpy values, 'representation_model.'
    prefix stripped) -> flax params."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    def dense(p):
        out = {"kernel": sd[f"{p}.weight"].T}
        if f"{p}.bias" in sd:
            out["bias"] = sd[f"{p}.bias"]
        return out

    def ln(p):
        return {"scale": sd[f"{p}.weight"], "bias": sd[f"{p}.bias"]}

    params: Dict = {
        "embedding": {"embedding": sd["embedding.weight"]},
        "distance_expansion": {"means": sd["distance_expansion.means"],
                               "betas": sd["distance_expansion.betas"]},
        "out_norm": ln("out_norm"),
    }
    if "neighbor_embedding.embedding.weight" in sd:
        params["neighbor_embedding"] = {
            "embedding": sd["neighbor_embedding.embedding.weight"]}
        params["neighbor_distance_proj"] = dense(
            "neighbor_embedding.distance_proj")
        params["combine"] = dense("neighbor_embedding.combine")
    for i in range(num_layers):
        p = f"attention_layers.{i}"
        params[f"attention_layers_{i}"] = {
            "layernorm": ln(f"{p}.layernorm"),
            "q_proj": dense(f"{p}.q_proj"),
            "k_proj": dense(f"{p}.k_proj"),
            "v_proj": dense(f"{p}.v_proj"),
            "o_proj": dense(f"{p}.o_proj"),
            "vec_proj": dense(f"{p}.vec_proj"),
            "dk_proj": dense(f"{p}.dk_proj"),
            "dv_proj": dense(f"{p}.dv_proj"),
        }
    return {"params": params}

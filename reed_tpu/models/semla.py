"""Semla: SE(3)-equivariant message passing with multiple learnable
coordinate sets, for molecular flow matching (SemlaFlow), with REED
representation conditioning (cross-attn / adaLN) and alignment projectors.

Clean-room JAX/flax rebuild of molecule/semlaflow/flowmodels/semla.py:
CoordNorm (none/gvp/length), EdgeMessages (pairwise node feats + per-set
coord dot products), NodeAttention / CoordAttention with GNN-VPA
variance-preserving updates, NodeFeedForward (invariant LengthsMLP +
EquivariantMLP outer-product update), BondRefine, EquiMessagePassingLayer,
EquiInvDynamics (in/out edge layers, self-conditioning coord channel,
projectors at align_depth), and SemlaGenerator (size embedding, type /
bond / charge heads, symmetric edge logits, zero-CoM outputs).

Layouts: node/edge features are dense-batched [B, N, ...] / [B, N, N, ...];
the multi-set coordinate path runs in ONE unified layout [B, N, 3, S]
(coordinate-set dim trailing = TPU lane dim) through the entire
EquiInvDynamics stack. Every set-dim projection (coord_proj / attn_proj /
equi_* / coord_head) is then a Dense over the trailing axis with no
transposes, and the per-set gram matrices are emitted directly in the
[B, N, M, S] order their consumers contract against — the round-3 device
trace showed the previous [B,S,N,3] layout cost ~23% of the step in pure
relayout copies (a per-layer 67 MB backward message relayout + gram-einsum
transposes + ~10 small coord transposes per layer).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from reed_tpu.nn.layers import DenseParams

Dtype = Any
NEG_INF = -1e9
# coordinate-magnitude ceiling applied where raw (norm="none") coords feed
# pairwise geometry features — far above any healthy scale (O(1-30) in
# training), bounds the init-time self-conditioning transient that
# otherwise overflows the bf16 message tensor (clamping the small coord
# tensor is ~70x cheaper than clamping the [B,N,N,S] grams). Inactive at
# healthy scales, so converted-checkpoint parity is unaffected.
COORD_CLAMP = 3e2


def safe_norm(x, axis=-1, keepdims=False, eps: float = 1e-12):
    """||x|| with a non-NaN gradient at 0 (torch special-cases the norm
    subgradient at zero; jnp.linalg.norm does not — masked nodes and i==j
    difference vectors are exactly zero here)."""
    return jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=keepdims) + eps)


def zero_com(coords, node_mask):
    """coords [..., N, 3], node_mask [..., N] -> zero masked center of mass
    (reference: semlaflow/util/functional.py zero_com)."""
    mask = node_mask[..., None]
    n = jnp.maximum(jnp.sum(mask, axis=-2, keepdims=True), 1.0)
    com = jnp.sum(coords * mask, axis=-2, keepdims=True) / n
    return (coords - com) * mask


def zero_com_sets(coord_sets, node_mask):
    """coord_sets [B,N,3,S], node_mask [B,N] -> zero masked center of mass
    per coordinate set (set-dim-trailing twin of zero_com)."""
    mask = node_mask[:, :, None, None]
    n = jnp.maximum(jnp.sum(node_mask, axis=1), 1.0)[:, None, None, None]
    com = jnp.sum(coord_sets * mask, axis=1, keepdims=True) / n
    return (coord_sets - com) * mask


def adj_from_node_mask(node_mask, self_connect: bool = False):
    """Fully-connected adjacency among real nodes [B,N] -> [B,N,N]."""
    adj = node_mask[:, :, None] * node_mask[:, None, :]
    if not self_connect:
        n = node_mask.shape[-1]
        adj = adj * (1.0 - jnp.eye(n)[None])
    return adj


def _attn_mask_from_adj(adj):
    """0/1 adjacency -> additive attention mask; fully-disconnected (fake)
    nodes get an all-zero row to keep softmax finite
    (reference: semla.py:11-23)."""
    mask = jnp.where(adj == 0, NEG_INF, 0.0)
    n_connections = jnp.sum(adj, axis=-1, keepdims=True)
    return jnp.where(n_connections == 0, 0.0, mask)


class CoordNorm(nn.Module):
    """Coordinate-set normalization, kinds none | gvp | length
    (reference: semla.py:41-100)."""

    n_coord_sets: int
    norm: str = "length"
    eps: float = 1e-6

    @nn.compact
    def __call__(self, coord_sets, node_mask):
        # coord_sets [B,N,3,S], node_mask [B,N]
        # param kept in the historical (1,S,1,1) shape for checkpoint /
        # torch-converter compatibility; applied on the trailing set dim
        set_weights = self.param("set_weights", nn.initializers.ones,
                                 (1, self.n_coord_sets, 1, 1))
        sw = set_weights.reshape(1, 1, 1, self.n_coord_sets)
        coord_sets = zero_com_sets(coord_sets, node_mask)
        n_atoms = jnp.maximum(jnp.sum(node_mask, axis=1), 1.0)[:, None, None]
        lengths = safe_norm(coord_sets, axis=2)               # [B,N,S]
        if self.norm == "length":
            scaled = jnp.sum(lengths, axis=1, keepdims=True) / n_atoms
            coord_div = scaled[:, :, None, :] + self.eps      # [B,1,1,S]
        elif self.norm == "gvp":
            coord_div = ((lengths[:, :, None, :] + self.eps)
                         / math.sqrt(self.n_coord_sets))
        elif self.norm in ("none", None):
            coord_div = jnp.ones_like(coord_sets)
        else:
            raise ValueError(self.norm)
        out = coord_sets * sw / coord_div
        return out * node_mask[:, :, None, None]


class EdgeMessages(nn.Module):
    """Pairwise messages from node pairs + per-set coordinate dot products
    (reference: semla.py:103-166)."""

    d_message: int
    d_out: int
    n_coord_sets: int
    d_ff: Optional[int] = None
    d_edge: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, coords, node_feats, node_mask, edge_feats=None):
        # coords [B,N,3,S], node_feats [B,N,d], node_mask [B,N]
        d_ff = self.d_ff or self.d_out
        node_feats = nn.LayerNorm(dtype=self.dtype, name="node_norm")(node_feats)
        coords = CoordNorm(self.n_coord_sets, norm="none",
                           name="coord_norm")(coords, node_mask)
        coords = jnp.clip(coords, -COORD_CLAMP, COORD_CLAMP)
        # per-set coordinate gram matrices, emitted directly in the
        # [B,N,M,S] order the pair-concat consumer wants (no moveaxis).
        # The pre-clamp above bounds these (reference-parity unnormalized)
        # grams at ~3*CLAMP^2: without it the random-init self-conditioning
        # second pass transiently amplifies coords layer-over-layer until
        # the bf16 message tensor overflows to inf and softmax(inf-inf)
        # NaNs the step (measured round 4 at bs56/N72; the f32 reference
        # rides the same transient out at ~1e29 under grad clipping,
        # molecule/semlaflow/flowmodels/semla.py:151-153 has no bound)
        coord_feats = jnp.einsum("bnds,bmds->bnms", coords, coords)

        nf = nn.Dense(self.d_message, dtype=self.dtype, name="node_proj")(node_feats)
        # message_fc1 over concat([nf_i, nf_j, grams, edges]) factored
        # through kernel slices (reed_tpu/nn/layers.py DenseParams): the two
        # node parts run as [B,N,dm] matmuls BEFORE broadcasting and the
        # [B,N,N,2dm+...] concat never materializes
        dm = self.d_message
        pair_feats = [coord_feats.astype(self.dtype)]
        if edge_feats is not None:
            pair_feats.append(nn.LayerNorm(dtype=self.dtype,
                                           name="edge_norm")(edge_feats))
        pair = jnp.concatenate(pair_feats, axis=-1)
        w1, b1 = DenseParams(2 * dm + pair.shape[-1], d_ff, dtype=self.dtype,
                             name="message_fc1")()
        x = ((nf @ w1[:dm])[:, :, None, :] + (nf @ w1[dm:2 * dm])[:, None, :, :]
             + pair @ w1[2 * dm:] + b1)
        x = nn.silu(x)
        return nn.Dense(self.d_out, dtype=self.dtype, name="message_fc2")(x)


class NodeAttention(nn.Module):
    """Message-as-attention-logits node update with GNN-VPA weighting
    (reference: semla.py:169-225)."""

    n_attn_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, node_feats, messages, adj_matrix):
        d = node_feats.shape[-1]
        d_head = d // self.n_attn_heads
        attn_mask = _attn_mask_from_adj(adj_matrix)
        logits = messages.astype(jnp.float32) + attn_mask[..., None]
        attn = jax.nn.softmax(logits, axis=2)  # over j; [B,N,N,H]
        x = nn.LayerNorm(dtype=self.dtype, name="feat_norm")(node_feats)
        feats = nn.Dense(d, dtype=self.dtype, name="in_proj")(x)
        feats = feats.reshape(feats.shape[:2] + (self.n_attn_heads, d_head))
        out = jnp.einsum("bijh,bjhd->bihd", attn.astype(self.dtype), feats)
        # variance-preserving aggregation (GNN-VPA)
        weights = jnp.sqrt(jnp.sum(attn ** 2, axis=2))  # [B,N,H]
        out = out * weights[..., None].astype(self.dtype)
        out = out.reshape(out.shape[:2] + (d,))
        return nn.Dense(d, dtype=self.dtype, name="out_proj")(out)


def _coord_attention_updates(proj, attn, eps):
    """sum_j attn_ij * (x_i - x_j) / (|x_i - x_j| + eps), factored so the
    rank-5 [B,3,N,N,P] difference tensor never materializes (TPU: ~3x less
    HBM traffic on the dominant term, and the j-reductions become
    contractions):

      lengths via the gram identity |xi-xj|^2 = |xi|^2 + |xj|^2 - 2 xi.xj
      w_ij = attn_ij / (|xi-xj| + eps)
      sum_j w_ij (xi - xj) = xi * sum_j w_ij  -  sum_j w_ij xj

    The i==j term contributes exactly zero in the difference form, but in
    the factored form it appears as two large (~attn/eps) equal terms whose
    float cancellation would inject noise — so the diagonal of w is zeroed
    explicitly. Matches the direct formula to f32 reassociation error
    (tests/test_semla.py::test_coord_attention_factored_matches_direct).

    proj [B,N,3,P] f32, attn [B,i,j,P] f32 -> updates [B,N,3,P].
    """
    n = proj.shape[1]
    sq = jnp.sum(proj * proj, axis=2)                      # [B,N,P]
    inner = jnp.einsum("bidp,bjdp->bijp", proj, proj)      # [B,i,j,P]
    dist2 = sq[:, :, None] + sq[:, None, :] - 2.0 * inner
    # + 1e-12 inside the sqrt: same non-NaN-gradient-at-0 guard as
    # safe_norm on the direct path
    lengths = jnp.sqrt(jnp.maximum(dist2, 0.0) + 1e-12)    # [B,i,j,P]
    w = attn / (lengths + eps)
    w = w * (1.0 - jnp.eye(n, dtype=w.dtype))[None, :, :, None]
    wsum = jnp.sum(w, axis=2)                              # [B,i,P]
    return (proj * wsum[:, :, None, :]
            - jnp.einsum("bijp,bjdp->bidp", w, proj))


class CoordAttention(nn.Module):
    """Equivariant coordinate update via attention over normalized pairwise
    direction vectors (reference: semla.py:228-278)."""

    n_coord_sets: int
    proj_sets: Optional[int] = None
    coord_norm: str = "length"
    eps: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, coord_sets, messages, adj_matrix, node_mask):
        # coord_sets [B,N,3,S], node_mask [B,N]
        p = self.proj_sets or self.n_coord_sets
        coords = CoordNorm(self.n_coord_sets, norm=self.coord_norm,
                           name="coord_norm")(coord_sets, node_mask)
        # project set dim S->P on the trailing axis (no transpose).
        # The coordinate-valued path stays f32 regardless of compute dtype:
        # bf16 coords/updates destabilize training (measured: grad overflow
        # within 300 steps) while bf16 on the feature/message path is safe
        proj = nn.Dense(p, use_bias=False, dtype=jnp.float32,
                        name="coord_proj")(coords.astype(jnp.float32))

        attn_mask = _attn_mask_from_adj(adj_matrix)
        logits = messages.astype(jnp.float32) + attn_mask[..., None]
        attn = jax.nn.softmax(logits, axis=2)  # [B,i,j,P]
        updates = _coord_attention_updates(proj, attn, self.eps)
        weights = jnp.sqrt(jnp.sum(attn ** 2, axis=2))  # [B,i,P]
        updates = updates * weights[:, :, None, :]
        return nn.Dense(self.n_coord_sets, use_bias=False, dtype=jnp.float32,
                        name="attn_proj")(updates)  # [B,N,3,S]


class NodeFeedForward(nn.Module):
    """Invariant (lengths MLP) + equivariant (outer-product) feedforward
    (reference: semla.py:281-372)."""

    n_coord_sets: int
    d_ff: Optional[int] = None
    proj_sets: Optional[int] = None
    coord_norm: str = "length"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, coord_sets, node_feats, node_mask):
        # coord_sets [B,N,3,S], node_feats [B,N,d], node_mask [B,N]
        d = node_feats.shape[-1]
        p = self.proj_sets or self.n_coord_sets
        d_ff = self.d_ff or d * 4
        node_feats = nn.LayerNorm(dtype=self.dtype, name="node_norm")(node_feats)
        coord_sets = CoordNorm(self.n_coord_sets, norm=self.coord_norm,
                               name="coord_norm")(coord_sets, node_mask)

        # invariant: lengths of each coord set as extra features
        lengths = safe_norm(coord_sets, axis=2)               # [B,N,S]
        inv_in = jnp.concatenate([node_feats, lengths.astype(self.dtype)],
                                 axis=-1)
        h = nn.Dense(d_ff, dtype=self.dtype, name="inv_fc1")(inv_in)
        h = nn.silu(h)
        out_node = nn.Dense(d, dtype=self.dtype, name="inv_fc2")(h)

        # equivariant: invariant gates x projected coord sets (gates may be
        # low precision; the coordinate-valued path stays f32)
        gates = nn.Dense(p, dtype=self.dtype, name="equi_node_fc1")(node_feats)
        gates = nn.silu(gates)
        gates = nn.Dense(p, dtype=self.dtype, name="equi_node_fc2")(gates)
        gates = gates.astype(jnp.float32)
        proj = nn.Dense(p, use_bias=False, dtype=jnp.float32,
                        name="equi_coord_proj")(coord_sets.astype(jnp.float32))
        # outer product of invariant feats with projected sets, summed over
        # the projected axis — (gates_p x proj_q).sum(q) is rank-1, so the
        # [B,N,3,P,P] outer product collapses to gates * proj.sum(q)
        # exactly (same contraction as the reference; verified against the
        # torch-mini in tests/test_semla_convert.py)
        attn = (gates[:, :, None, :]
                * jnp.sum(proj, axis=-1, keepdims=True))       # [B,N,3,P]
        out_coords = nn.Dense(self.n_coord_sets, use_bias=False,
                              dtype=jnp.float32, name="equi_attn_proj")(attn)
        return out_coords, out_node                            # [B,N,3,S]


class BondRefine(nn.Module):
    """Final bond-only message-passing refinement
    (reference: semla.py:375-430)."""

    d_message: int
    d_edge: int
    d_ff: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, coords, node_feats, node_mask, edge_feats):
        b, n, _ = node_feats.shape
        d_ff = self.d_ff or self.d_message
        # coords [B,N,3] -> single-set [B,N,3,1] for the unified CoordNorm
        coords = jnp.clip(CoordNorm(1, norm="none", name="coord_norm")(
            coords[..., None], node_mask)[..., 0],
            -COORD_CLAMP, COORD_CLAMP)
        diffs = coords[:, :, None, :] - coords[:, None, :, :]
        dists = jnp.sum(diffs ** 2, axis=-1, keepdims=True)
        dots = jnp.einsum("bnd,bmd->bnm", coords, coords)[..., None]
        nf = nn.Dense(self.d_message, dtype=self.dtype, name="node_proj")(
            nn.LayerNorm(dtype=self.dtype, name="node_norm")(node_feats))
        ef = nn.LayerNorm(dtype=self.dtype, name="edge_norm")(edge_feats)
        # factored concat matmul, same as EdgeMessages above
        dm = self.d_message
        pair = jnp.concatenate([dists.astype(self.dtype),
                                dots.astype(self.dtype), ef], axis=-1)
        w1, b1 = DenseParams(2 * dm + pair.shape[-1], d_ff, dtype=self.dtype,
                             name="message_fc1")()
        x = ((nf @ w1[:dm])[:, :, None, :] + (nf @ w1[dm:2 * dm])[:, None, :, :]
             + pair @ w1[2 * dm:] + b1)
        x = nn.silu(x)
        return nn.Dense(self.d_edge, dtype=self.dtype, name="message_fc2")(x)


class RepConditioner(nn.Module):
    """Rep conditioning block: cross_attn (context length 1) or adaLN-zero
    (reference: flowmodels/attention.py:151-291)."""

    cond_type: str
    n_heads: int = 4
    d_rep: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, rep, node_mask1d):
        d = x.shape[-1]
        if self.cond_type == "cross_attn":
            ctx = rep[:, None, :]
            q_in = nn.LayerNorm(use_bias=False, use_scale=False,
                                dtype=self.dtype, name="norm2")(x)
            hd = d // self.n_heads
            q = nn.Dense(d, use_bias=False, dtype=self.dtype, name="to_q")(q_in)
            k = nn.Dense(d, use_bias=False, dtype=self.dtype, name="to_k")(
                ctx.astype(self.dtype))
            v = nn.Dense(d, use_bias=False, dtype=self.dtype, name="to_v")(
                ctx.astype(self.dtype))
            bq = q.reshape(q.shape[:2] + (self.n_heads, hd))
            bk = k.reshape(k.shape[:2] + (self.n_heads, hd))
            bv = v.reshape(v.shape[:2] + (self.n_heads, hd))
            logits = jnp.einsum("bnhd,bmhd->bhnm", bq, bk) / math.sqrt(hd)
            attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            out = jnp.einsum("bhnm,bmhd->bnhd", attn.astype(self.dtype), bv)
            x = x + nn.Dense(d, dtype=self.dtype, name="to_out")(
                out.reshape(out.shape[:2] + (d,)))
            ff_in = nn.LayerNorm(use_bias=False, use_scale=False,
                                 dtype=self.dtype, name="norm3")(x)
            gate = nn.Dense(2 * 4 * d, dtype=self.dtype, name="ff_proj")(ff_in)
            a, g = jnp.split(gate, 2, axis=-1)
            x = x + nn.Dense(d, dtype=self.dtype, name="ff_out")(a * nn.gelu(g))
        elif self.cond_type == "adaLN":
            mod = nn.Dense(6 * d, dtype=self.dtype,
                           name="adaLN_modulation")(nn.silu(rep))[:, None, :]
            (sh_a, sc_a, g_a, sh_m, sc_m, g_m) = jnp.split(mod, 6, axis=-1)
            h = nn.LayerNorm(use_bias=False, use_scale=False,
                             dtype=self.dtype, name="norm1")(x)
            h = h * (1 + sc_a) + sh_a
            # self-attention over nodes
            hd = d // self.n_heads
            qkv = nn.Dense(3 * d, use_bias=False, dtype=self.dtype,
                           name="attn_qkv")(h)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(q.shape[:2] + (self.n_heads, hd))
            k = k.reshape(k.shape[:2] + (self.n_heads, hd))
            v = v.reshape(v.shape[:2] + (self.n_heads, hd))
            logits = jnp.einsum("bnhd,bmhd->bhnm", q, k) / math.sqrt(hd)
            # mask padded KEYS: their zeroed features give logits of 0,
            # which would otherwise draw e^0 weight from every query
            pad = jnp.where(node_mask1d > 0, 0.0,
                            -1e9)[:, None, None, :]
            attn = jax.nn.softmax(logits.astype(jnp.float32) + pad, axis=-1)
            o = jnp.einsum("bhnm,bmhd->bnhd", attn.astype(self.dtype), v)
            o = nn.Dense(d, dtype=self.dtype, name="attn_out")(
                o.reshape(o.shape[:2] + (d,)))
            x = x + g_a * o
            h = nn.LayerNorm(use_bias=False, use_scale=False,
                             dtype=self.dtype, name="norm2")(x)
            h = h * (1 + sc_m) + sh_m
            gate = nn.Dense(2 * 4 * d, dtype=self.dtype, name="ff_proj")(h)
            a, g = jnp.split(gate, 2, axis=-1)
            x = x + g_m * nn.Dense(d, dtype=self.dtype, name="ff_out")(
                a * nn.gelu(g))
        else:
            raise ValueError(self.cond_type)
        return x * node_mask1d[..., None]


class EquiMessagePassingLayer(nn.Module):
    """Core Semla layer (reference: semla.py:433-576)."""

    d_model: int
    d_message: int
    n_coord_sets: int
    n_attn_heads: Optional[int] = None
    d_message_hidden: Optional[int] = None
    d_edge_in: Optional[int] = None
    d_edge_out: Optional[int] = None
    coord_norm: str = "length"
    d_rep: Optional[int] = None
    cond_type: str = "none"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, coords, node_feats, adj_matrix, node_mask,
                 edge_feats=None, rep=None):
        # coords [B,N,3,S], node_mask [B,N]
        n_heads = self.n_attn_heads or self.d_message
        d_coord_message = self.n_coord_sets
        d_message_out = n_heads + d_coord_message
        if self.d_edge_out is not None:
            d_message_out += self.d_edge_out

        if rep is not None and self.cond_type != "none":
            # conditioning pathway pinned f32 like the coordinate-valued
            # tensors: it is a trivial fraction of step compute. NOTE this
            # pin alone does NOT recover bf16 convergence of the
            # rep-conditioned chains run (loss still plateaus at 0.35 vs
            # f32's 0.14, i.e. at the UNCONDITIONAL solution) — the rep
            # signal is lost in the bf16 feature stream downstream, not
            # inside this block
            node_feats = RepConditioner(
                self.cond_type, d_rep=self.d_rep, dtype=jnp.float32,
                name="rep_cond")(node_feats.astype(jnp.float32),
                                 rep.astype(jnp.float32),
                                 node_mask).astype(self.dtype)

        c_up, n_up = NodeFeedForward(
            self.n_coord_sets, d_ff=self.d_model * 4,
            proj_sets=self.d_message, coord_norm=self.coord_norm,
            dtype=self.dtype, name="node_ff")(coords, node_feats, node_mask)
        coords = coords + c_up
        node_feats = node_feats + n_up

        messages = EdgeMessages(
            self.d_message, d_message_out, self.n_coord_sets,
            d_ff=self.d_message_hidden, d_edge=self.d_edge_in,
            dtype=self.dtype, name="message_ff")(
            coords, node_feats, node_mask, edge_feats=edge_feats)
        node_msgs = messages[..., :n_heads]
        coord_msgs = messages[..., n_heads:n_heads + d_coord_message]

        node_feats = node_feats + NodeAttention(
            n_heads, dtype=self.dtype, name="node_attn")(
            node_feats, node_msgs, adj_matrix)
        coords = coords + CoordAttention(
            self.n_coord_sets, d_coord_message, coord_norm=self.coord_norm,
            dtype=self.dtype, name="coord_attn")(
            coords, coord_msgs, adj_matrix, node_mask)

        if self.d_edge_out is not None:
            edge_out = messages[..., n_heads + d_coord_message:]
            if edge_feats is not None:
                edge_out = edge_feats + edge_out
            return coords, node_feats, edge_out
        return coords, node_feats


class EquiInvDynamics(nn.Module):
    """Stack of Semla layers with edge in/out layers, self-conditioning
    coord channel, rep time-embedding and alignment projectors
    (reference: semla.py:579-819)."""

    d_model: int
    d_message: int
    n_coord_sets: int
    n_layers: int
    n_attn_heads: Optional[int] = None
    d_message_hidden: Optional[int] = None
    d_edge: Optional[int] = None
    bond_refine: bool = True
    self_cond: bool = False
    coord_norm: str = "length"
    d_rep: Optional[int] = None
    cond_type: str = "none"
    rep_alignment: bool = False
    align_depth: Sequence[int] = (6,)
    d_projector: Optional[int] = None
    # predict coords as a residual off the input state (x1_hat = x_t + delta)
    # instead of absolute coords. Off by default (reference parity: the
    # reference head, semla.py:700-720, is absolute, reconstructing magnitude
    # from length-normalized coord sets). Adds NO parameters, so converted
    # checkpoints are unaffected by the flag's existence. Opt in when the
    # target geometry must be hit to high absolute precision: the absolute
    # head's late-t coordinate floor (~0.06 A rms on the rigid chains family)
    # exceeds the EDM-style bond-window tolerance (~0.03 A), while with the
    # skip the late-t task is a near-identity copy.
    coord_skip: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, coords, inv_feats, adj_matrix, atom_mask,
                 edge_feats=None, cond_coords=None, rep=None, times=None):
        from reed_tpu.nn.layers import ProjectorMLP, timestep_embedding

        coords_in = coords.astype(jnp.float32)  # [B,N,3] current state

        if rep is not None and times is not None:
            t_emb = timestep_embedding(times, 512)
            t_emb = nn.Dense(self.d_rep, dtype=self.dtype,
                             name="time_emb_fc1")(t_emb.astype(self.dtype))
            t_emb = nn.silu(t_emb)
            t_emb = nn.Dense(self.d_rep, dtype=self.dtype,
                             name="time_emb_fc2")(t_emb)
            rep = rep + t_emb

        # single (or self-cond pair of) coord channels -> S learnable sets,
        # already in the unified [B,N,3,S] layout (set dim = lane dim)
        if cond_coords is not None:
            stacked = jnp.stack([coords, cond_coords], axis=-1)  # [B,N,3,2]
        else:
            stacked = coords[..., None]
        coords = nn.Dense(self.n_coord_sets, use_bias=False, dtype=jnp.float32,
                          name="coord_proj")(stacked.astype(jnp.float32))
        coords = coords * atom_mask[:, :, None, None]

        extra = 2 if self.d_edge is not None else 0
        n_core = self.n_layers - extra
        layer_kwargs = dict(d_model=self.d_model, d_message=self.d_message,
                            n_coord_sets=self.n_coord_sets,
                            n_attn_heads=self.n_attn_heads,
                            coord_norm=self.coord_norm, d_rep=self.d_rep,
                            cond_type=self.cond_type, dtype=self.dtype)

        zs = []
        li = 0
        if self.d_edge is not None:
            coords, inv_feats = EquiMessagePassingLayer(
                d_edge_in=self.d_edge, **layer_kwargs, name=f"layers_{li}")(
                coords, inv_feats, adj_matrix, atom_mask,
                edge_feats=edge_feats, rep=rep)[:2]
            li = self._maybe_project(zs, li, inv_feats)

        for _ in range(n_core):
            coords, inv_feats = EquiMessagePassingLayer(
                d_message_hidden=self.d_message_hidden, **layer_kwargs,
                name=f"layers_{li}")(
                coords, inv_feats, adj_matrix, atom_mask, rep=rep)
            li = self._maybe_project(zs, li, inv_feats)

        edge_out = None
        if self.d_edge is not None:
            coords, inv_feats, edge_out = EquiMessagePassingLayer(
                d_edge_out=self.d_edge, **layer_kwargs, name=f"layers_{li}")(
                coords, inv_feats, adj_matrix, atom_mask, rep=rep)
            li = self._maybe_project(zs, li, inv_feats)

        c_up, n_up = NodeFeedForward(
            self.n_coord_sets, coord_norm=self.coord_norm, dtype=self.dtype,
            name="final_ff_block")(coords, inv_feats, atom_mask)
        coords, inv_feats = c_up, n_up

        out_coords = CoordNorm(self.n_coord_sets, norm=self.coord_norm,
                               name="coord_norm")(coords, atom_mask)
        out_coords = nn.Dense(1, use_bias=False, dtype=jnp.float32,
                              name="coord_head")(out_coords)[..., 0]  # [B,N,3]
        if self.coord_skip:
            out_coords = out_coords + coords_in

        if self.bond_refine and self.d_edge is not None:
            edge_out = BondRefine(self.d_message, self.d_edge,
                                  dtype=self.dtype, name="refine_layer")(
                out_coords, inv_feats, atom_mask, edge_out)

        inv_feats = nn.LayerNorm(dtype=self.dtype, name="feat_norm")(inv_feats)
        if self.d_edge is not None:
            edge_out = nn.LayerNorm(dtype=self.dtype,
                                    name="bond_norm")(edge_out)
            return out_coords, inv_feats, edge_out, zs
        return out_coords, inv_feats, None, zs

    def _maybe_project(self, zs, layer_idx, inv_feats):
        from reed_tpu.nn.layers import ProjectorMLP

        if self.rep_alignment and layer_idx in tuple(self.align_depth):
            pooled = jnp.sum(inv_feats.astype(jnp.float32), axis=1)
            zs.append(ProjectorMLP(
                self.d_projector or self.d_model, self.d_rep,
                name=f"projectors_{len(zs)}")(pooled))
        return layer_idx + 1


class SemlaGenerator(nn.Module):
    """Full molecular generator head (reference: semla.py:822-995)."""

    d_model: int
    vocab_size: int
    n_atom_feats: int
    d_edge: Optional[int] = None
    n_edge_types: Optional[int] = None
    self_cond: bool = False
    size_emb: int = 64
    max_atoms: int = 256
    n_charge_types: int = 7
    rep_alignment: bool = False
    # dynamics config
    d_message: int = 64
    n_coord_sets: int = 64
    n_layers: int = 12
    n_attn_heads: Optional[int] = None
    d_message_hidden: Optional[int] = None
    coord_norm: str = "length"
    d_rep: Optional[int] = None
    cond_type: str = "none"
    align_depth: Sequence[int] = (4,)
    d_projector: Optional[int] = None
    coord_skip: bool = False  # residual coord head (see EquiInvDynamics)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, coords, inv_feats, edge_feats=None, cond_coords=None,
                 cond_atomics=None, cond_bonds=None, atom_mask=None, rep=None,
                 times=None):
        """coords [B,N,3]; inv_feats [B,N,n_atom_feats] one-hot-ish;
        edge_feats [B,N,N,n_edge_types]; cond_* = self-conditioning inputs.
        Returns (pred_coords, type_logits, bond_logits, charge_logits, zs)."""
        b, n, _ = coords.shape
        if atom_mask is None:
            atom_mask = jnp.ones((b, n), coords.dtype)
        adj_matrix = adj_from_node_mask(atom_mask)

        n_atoms = jnp.sum(atom_mask, axis=-1).astype(jnp.int32)  # [B]
        # max_atoms + 1 entries: n_atoms is inclusive of max_atoms, and an
        # out-of-range jnp.take fills NaN (the reference's Embedding(max_atoms)
        # at semla.py:874 has the same off-by-one but real datasets never
        # reach the cap)
        size_emb = nn.Embed(self.max_atoms + 1, self.size_emb,
                            dtype=self.dtype, name="size_emb")(
            n_atoms)[:, None, :]
        size_emb = jnp.broadcast_to(size_emb, (b, n, self.size_emb))

        feats = [inv_feats.astype(self.dtype), size_emb]
        if cond_atomics is not None:
            feats.append(cond_atomics.astype(self.dtype))
        x = jnp.concatenate(feats, axis=-1)
        x = nn.Dense(self.d_model, dtype=self.dtype, name="feat_proj_fc1")(x)
        x = nn.silu(x)
        atom_feats = nn.Dense(self.d_model, dtype=self.dtype,
                              name="feat_proj_fc2")(x)

        if edge_feats is not None:
            e = edge_feats.astype(self.dtype)
            if cond_bonds is not None:
                e = jnp.concatenate([e, cond_bonds.astype(self.dtype)],
                                    axis=-1)
            e = nn.Dense(self.d_edge, dtype=self.dtype, name="edge_in_fc1")(e)
            e = nn.silu(e)
            e = nn.Dense(self.d_edge, dtype=self.dtype, name="edge_in_fc2")(e)
        else:
            e = None

        pred_coords, pred_feats, pred_edges, zs = EquiInvDynamics(
            d_model=self.d_model, d_message=self.d_message,
            n_coord_sets=self.n_coord_sets, n_layers=self.n_layers,
            n_attn_heads=self.n_attn_heads,
            d_message_hidden=self.d_message_hidden, d_edge=self.d_edge,
            self_cond=self.self_cond, coord_norm=self.coord_norm,
            d_rep=self.d_rep, cond_type=self.cond_type,
            rep_alignment=self.rep_alignment, align_depth=self.align_depth,
            d_projector=self.d_projector, coord_skip=self.coord_skip,
            dtype=self.dtype, name="dynamics")(
            coords, atom_feats, adj_matrix, atom_mask, edge_feats=e,
            cond_coords=cond_coords, rep=rep, times=times)

        pred_coords = zero_com(pred_coords.astype(jnp.float32), atom_mask)

        h = nn.Dense(self.d_model, dtype=self.dtype, name="atom_head_fc1")(
            pred_feats)
        type_logits = nn.Dense(self.vocab_size, dtype=self.dtype,
                               name="atom_head_fc2")(nn.silu(h))
        h = nn.Dense(self.d_model, dtype=self.dtype, name="charge_head_fc1")(
            pred_feats)
        charge_logits = nn.Dense(self.n_charge_types, dtype=self.dtype,
                                 name="charge_head_fc2")(nn.silu(h))

        bond_logits = None
        if pred_edges is not None:
            sym = pred_edges + jnp.swapaxes(pred_edges, 1, 2)
            h = nn.Dense(self.d_edge, dtype=self.dtype,
                         name="edge_out_fc1")(sym)
            bond_logits = nn.Dense(self.n_edge_types, dtype=self.dtype,
                                   name="edge_out_fc2")(nn.silu(h))

        return (pred_coords, type_logits.astype(jnp.float32),
                None if bond_logits is None else bond_logits.astype(jnp.float32),
                charge_logits.astype(jnp.float32), zs)

"""Alternative molecular generator backends for the SemlaFlow pipeline:
a vanilla EGNN generator and an EQGAT-style gated equivariant generator.

Clean-room rebuilds of molecule/semlaflow/flowmodels/egnn.py (VanillaEgnn*:
squared-distance edge messages with sigmoid attention, scalar coordinate
updates, optional rep cross-attention) and eqgat.py (Eqgat*: invariant +
per-node equivariant vector features with gated updates). Both expose the
SemlaGenerator output contract (pred_coords, type_logits, bond_logits,
charge_logits, zs) so they are drop-in `--arch` choices for the Semla
trainer (reference: semlaflow/train.py:120-160 build_model arch switch).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from reed_tpu.models.semla import RepConditioner, adj_from_node_mask, zero_com
from reed_tpu.nn.layers import DenseParams

Dtype = Any


def _sqrd_dists(coords):
    diff = coords[:, :, None, :] - coords[:, None, :, :]
    return jnp.sum(diff ** 2, axis=-1, keepdims=True), diff


class VanillaEgnnLayer(nn.Module):
    """Reference: semlaflow/flowmodels/egnn.py:14-198."""

    d_model: int
    d_pred_edge: Optional[int] = None
    norm: bool = False
    d_rep: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, coords, inv_feats, adj_matrix, atom_mask, edge_feats,
                 rep=None):
        b, n, d = inv_feats.shape
        if rep is not None and self.d_rep is not None:
            inv_feats = RepConditioner("cross_attn", d_rep=self.d_rep,
                                       dtype=self.dtype, name="rep_cond")(
                inv_feats, rep, atom_mask)

        sqrd, diff = _sqrd_dists(coords)
        e_in = jnp.concatenate([edge_feats, sqrd.astype(self.dtype)], -1)

        # phi_e/phi_x first Denses over concat([h_i, h_j, e_in]) factored
        # through kernel slices (reed_tpu/nn/layers.py DenseParams): node
        # parts run as [B,N,d] matmuls before broadcasting, the
        # [B,N,N,2d+e] concat never materializes
        def msg_fc1(name):
            w, bias = DenseParams(2 * d + e_in.shape[-1], self.d_model,
                                  dtype=self.dtype, name=name)()
            return ((inv_feats @ w[:d])[:, :, None]
                    + (inv_feats @ w[d:2 * d])[:, None, :]
                    + e_in @ w[2 * d:] + bias)

        m = nn.silu(msg_fc1("phi_e_fc1"))
        out_dim = self.d_model + (self.d_pred_edge or 0)
        m = nn.silu(nn.Dense(out_dim, dtype=self.dtype, name="phi_e_fc2")(m))
        edge_pred = m[..., self.d_model:] if self.d_pred_edge else None
        m = m[..., :self.d_model]
        att = nn.sigmoid(nn.Dense(1, dtype=self.dtype, name="phi_att")(m))
        m = m * att * adj_matrix[..., None]

        node_msgs = m.sum(axis=2)
        h = nn.Dense(self.d_model, dtype=self.dtype, name="phi_h_fc1")(
            jnp.concatenate([inv_feats, node_msgs], -1))
        h = nn.Dense(self.d_model, dtype=self.dtype,
                     name="phi_h_fc2")(nn.silu(h))

        # scalar coordinate update along normalized differences
        s = nn.silu(msg_fc1("phi_x_fc1"))
        s = nn.silu(nn.Dense(self.d_model, dtype=self.dtype,
                             name="phi_x_fc2")(s))
        s = nn.Dense(1, dtype=self.dtype, name="phi_x_fc3",
                     kernel_init=nn.initializers.variance_scaling(
                         1e-6, "fan_avg", "uniform"))(s)
        norm_diff = diff / (jnp.sqrt(sqrd + 1e-8) + 1.0)
        upd = jnp.sum(norm_diff * s.astype(norm_diff.dtype)
                      * adj_matrix[..., None], axis=2)
        coords = (coords + upd) * atom_mask[..., None]

        h = h * atom_mask[..., None]
        if self.norm:
            h = nn.LayerNorm(dtype=self.dtype, name="norm_layer")(h)
        return coords, h, edge_pred


class VanillaEgnnGenerator(nn.Module):
    """Reference: semlaflow/flowmodels/egnn.py:270-386."""

    d_model: int
    vocab_size: int
    n_atom_feats: int
    d_edge: int = 16
    n_edge_types: int = 5
    n_charge_types: int = 7
    n_layers: int = 6
    self_cond: bool = False
    d_rep: Optional[int] = None
    rep_alignment: bool = False
    align_depth: Sequence[int] = (3,)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, coords, inv_feats, edge_feats=None, cond_coords=None,
                 cond_atomics=None, cond_bonds=None, atom_mask=None, rep=None,
                 times=None):
        b, n, _ = coords.shape
        if atom_mask is None:
            atom_mask = jnp.ones((b, n), coords.dtype)
        adj = adj_from_node_mask(atom_mask)

        feats = [inv_feats.astype(self.dtype)]
        if cond_atomics is not None and self.self_cond:
            feats.append(cond_atomics.astype(self.dtype))
        h = nn.Dense(self.d_model, dtype=self.dtype, name="feat_proj")(
            jnp.concatenate(feats, -1))
        e = edge_feats.astype(self.dtype)
        if cond_bonds is not None and self.self_cond:
            e = jnp.concatenate([e, cond_bonds.astype(self.dtype)], -1)
        e = nn.Dense(self.d_edge, dtype=self.dtype, name="edge_proj")(e)
        x = coords
        if cond_coords is not None and self.self_cond:
            x = x + nn.Dense(1, use_bias=False, dtype=self.dtype,
                             name="cond_coord_gate")(
                jnp.ones((b, n, 1), self.dtype)) * 0 + coords

        zs = []
        for i in range(self.n_layers):
            d_pred = self.n_edge_types if i == self.n_layers - 1 else None
            x, h, edge_pred = VanillaEgnnLayer(
                self.d_model, d_pred_edge=d_pred, norm=True,
                d_rep=self.d_rep, dtype=self.dtype, name=f"layers_{i}")(
                x, h, adj, atom_mask, e, rep=rep)
            if self.rep_alignment and i in tuple(self.align_depth):
                from reed_tpu.nn.layers import ProjectorMLP

                zs.append(ProjectorMLP(self.d_model, self.d_rep,
                                       name=f"projectors_{len(zs)}")(
                    jnp.sum(h.astype(jnp.float32), axis=1)))

        pred_coords = zero_com(x.astype(jnp.float32), atom_mask)
        type_logits = nn.Dense(self.vocab_size, dtype=self.dtype,
                               name="atom_head")(h)
        charge_logits = nn.Dense(self.n_charge_types, dtype=self.dtype,
                                 name="charge_head")(h)
        bond_logits = edge_pred + jnp.swapaxes(edge_pred, 1, 2)
        return (pred_coords, type_logits.astype(jnp.float32),
                bond_logits.astype(jnp.float32),
                charge_logits.astype(jnp.float32), zs)


class EqgatLayer(nn.Module):
    """Gated equivariant layer with invariant + vector channel features
    (reference: semlaflow/flowmodels/eqgat.py:25-205)."""

    d_model: int
    d_edge: int
    d_rep: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, coords, inv_feats, equi_feats, adj_matrix, atom_mask,
                 edge_feats, rep=None):
        """equi_feats: [B, N, V, 3] per-node vector features."""
        b, n, d = inv_feats.shape
        v = equi_feats.shape[2]
        if rep is not None and self.d_rep is not None:
            inv_feats = RepConditioner("cross_attn", d_rep=self.d_rep,
                                       dtype=self.dtype, name="rep_cond")(
                inv_feats, rep, atom_mask)

        sqrd, diff = _sqrd_dists(coords)
        norm_diff = diff / (jnp.sqrt(sqrd + 1e-8) + 1.0)
        # invariant message inputs: pair feats + distances + edge feats —
        # msg_fc1 factored through kernel slices (see VanillaEgnnLayer)
        e_in = jnp.concatenate([sqrd.astype(self.dtype), edge_feats], -1)
        w1, b1 = DenseParams(2 * d + e_in.shape[-1], self.d_model,
                             dtype=self.dtype, name="msg_fc1")()
        m = nn.silu((inv_feats @ w1[:d])[:, :, None]
                    + (inv_feats @ w1[d:2 * d])[:, None, :]
                    + e_in @ w1[2 * d:] + b1)
        m = nn.Dense(self.d_model + 2 * v, dtype=self.dtype,
                     name="msg_fc2")(m)
        att = nn.sigmoid(nn.Dense(1, dtype=self.dtype, name="att")(m))
        m = m * att * adj_matrix[..., None]
        inv_msg = m[..., :self.d_model]
        vec_gate = m[..., self.d_model:self.d_model + v]
        dir_gate = m[..., self.d_model + v:]

        # aggregate invariant messages
        h = inv_feats + nn.Dense(
            self.d_model, dtype=self.dtype, name="node_fc")(
            nn.silu(jnp.concatenate([inv_feats, inv_msg.sum(2)], -1)))

        # equivariant update: gated neighbor vectors + gated directions
        nbr_vecs = jnp.einsum("bijv,bjvd->bivd",
                              vec_gate.astype(equi_feats.dtype), equi_feats)
        dir_vecs = jnp.einsum("bijv,bijd->bivd",
                              dir_gate.astype(norm_diff.dtype), norm_diff)
        equi = equi_feats + nbr_vecs + dir_vecs

        # gated self-interaction (GatedEquiUpdate, eqgat.py:25-62)
        lengths = jnp.sqrt(jnp.sum(equi ** 2, -1) + 1e-8)  # [B,N,V]
        gates = nn.Dense(v, dtype=self.dtype, name="gate_fc")(
            jnp.concatenate([h, lengths.astype(self.dtype)], -1))
        equi = equi * nn.sigmoid(gates)[..., None].astype(equi.dtype)

        h = nn.LayerNorm(dtype=self.dtype, name="norm")(h)
        h = h * atom_mask[..., None]
        equi = equi * atom_mask[..., None, None]
        return h, equi


class EqgatGenerator(nn.Module):
    """Reference: semlaflow/flowmodels/eqgat.py:325-423."""

    d_model: int
    vocab_size: int
    n_atom_feats: int
    d_edge: int = 16
    n_edge_types: int = 5
    n_charge_types: int = 7
    n_layers: int = 6
    n_equi_feats: int = 16
    self_cond: bool = False
    d_rep: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, coords, inv_feats, edge_feats=None, cond_coords=None,
                 cond_atomics=None, cond_bonds=None, atom_mask=None, rep=None,
                 times=None):
        b, n, _ = coords.shape
        if atom_mask is None:
            atom_mask = jnp.ones((b, n), coords.dtype)
        adj = adj_from_node_mask(atom_mask)

        feats = [inv_feats.astype(self.dtype)]
        if cond_atomics is not None and self.self_cond:
            feats.append(cond_atomics.astype(self.dtype))
        h = nn.Dense(self.d_model, dtype=self.dtype, name="feat_proj")(
            jnp.concatenate(feats, -1))
        e = edge_feats.astype(self.dtype)
        if cond_bonds is not None and self.self_cond:
            e = jnp.concatenate([e, cond_bonds.astype(self.dtype)], -1)
        e = nn.Dense(self.d_edge, dtype=self.dtype, name="edge_proj")(e)

        equi = jnp.zeros((b, n, self.n_equi_feats, 3), coords.dtype)
        for i in range(self.n_layers):
            h, equi = EqgatLayer(self.d_model, self.d_edge, d_rep=self.d_rep,
                                 dtype=self.dtype, name=f"layers_{i}")(
                coords, h, equi, adj, atom_mask, e, rep=rep)

        # prediction head (eqgat.py:208-280): coords from a linear combo of
        # vector channels, types/charges/bonds from invariants
        coord_upd = nn.Dense(1, use_bias=False, dtype=self.dtype,
                             name="coord_head")(
            jnp.swapaxes(equi, -1, -2).astype(self.dtype))[..., 0]
        pred_coords = zero_com((coords + coord_upd).astype(jnp.float32),
                               atom_mask)
        type_logits = nn.Dense(self.vocab_size, dtype=self.dtype,
                               name="atom_head")(h)
        charge_logits = nn.Dense(self.n_charge_types, dtype=self.dtype,
                                 name="charge_head")(h)
        # bond_fc1 over concat([h_i + h_j, e]) factored: the symmetric sum
        # shares one kernel slice, applied to h before broadcasting
        dh = h.shape[-1]
        wb, bb = DenseParams(dh + e.shape[-1], self.d_edge,
                             dtype=self.dtype, name="bond_fc1")()
        hw = h @ wb[:dh]
        pair = nn.silu(hw[:, :, None] + hw[:, None, :]
                       + e @ wb[dh:] + bb)
        bond_logits = nn.Dense(self.n_edge_types, dtype=self.dtype,
                               name="bond_fc2")(pair)
        return (pred_coords, type_logits.astype(jnp.float32),
                bond_logits.astype(jnp.float32),
                charge_logits.astype(jnp.float32), [])

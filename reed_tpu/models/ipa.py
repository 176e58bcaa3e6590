"""SE(3) flow model: Invariant Point Attention trunk with backbone rigid
updates and sequence (aatype) head — the MultiFlow codesign network.

Clean-room JAX/flax rebuild of protein/multiflow/models/{flow_model.py,
ipa_pytorch.py,node_feature_net.py,edge_feature_net.py}: node/edge feature
embedders over noisy rigids, per-block IPA -> sequence transformer ->
transition -> backbone update (quaternion-vector composition), edge
transitions between blocks, trans/rot predictions in Angstrom plus aatype
logits. Rigids are (rotmats [...,3,3], trans [...,3]) pairs — no custom
Rigid class needed in JAX.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from reed_tpu.nn.layers import timestep_embedding
from reed_tpu.ops.so3 import quat_to_rotmat

Dtype = Any
ANG_TO_NM = 0.1
NM_TO_ANG = 10.0
NUM_TOKENS = 21  # 20 aa + mask


def compose_rigids(rot_a, trans_a, rot_b, trans_b):
    """(a ∘ b): rot = Ra Rb, trans = Ra tb + ta."""
    rot = rot_a @ rot_b
    trans = jnp.einsum("...ij,...j->...i", rot_a, trans_b) + trans_a
    return rot, trans


def rigid_apply(rot, trans, points):
    """Apply rigid to points [..., P, 3] (rot [..., 3, 3], trans [..., 3])."""
    return jnp.einsum("...ij,...pj->...pi", rot, points) + trans[..., None, :]


def rigid_invert_apply(rot, trans, points):
    return jnp.einsum("...ji,...pj->...pi", rot, points - trans[..., None, :])


class InvariantPointAttention(nn.Module):
    """AF2-style IPA (reference: ipa_pytorch.py:236-430)."""

    c_s: int = 256
    c_z: int = 128
    c_hidden: int = 16
    no_heads: int = 8
    no_qk_points: int = 8
    no_v_points: int = 12
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, s, z, rot, trans, mask):
        """s [B,N,c_s], z [B,N,N,c_z], rigids in nm, mask [B,N]."""
        h, c, pq, pv = (self.no_heads, self.c_hidden, self.no_qk_points,
                        self.no_v_points)
        b, n, _ = s.shape

        q = nn.Dense(h * c, dtype=self.dtype, name="linear_q")(s)
        kv = nn.Dense(2 * h * c, dtype=self.dtype, name="linear_kv")(s)
        q = q.reshape(b, n, h, c)
        k, v = jnp.split(kv.reshape(b, n, h, 2 * c), 2, axis=-1)

        q_pts = nn.Dense(h * pq * 3, dtype=self.dtype, name="linear_q_points")(s)
        q_pts = rigid_apply(rot, trans, q_pts.reshape(b, n, h * pq, 3))
        kv_pts = nn.Dense(h * (pq + pv) * 3, dtype=self.dtype,
                          name="linear_kv_points")(s)
        kv_pts = rigid_apply(rot, trans, kv_pts.reshape(b, n, h * (pq + pv), 3))
        k_pts = kv_pts[:, :, :h * pq].reshape(b, n, h, pq, 3)
        v_pts = kv_pts[:, :, h * pq:].reshape(b, n, h, pv, 3)
        q_pts = q_pts.reshape(b, n, h, pq, 3)

        bias = nn.Dense(h, dtype=self.dtype, name="linear_b")(z)  # [B,N,N,H]

        # scalar attention logits
        att = jnp.einsum("bihc,bjhc->bhij", q, k) * math.sqrt(1.0 / (3 * c))
        att = att + math.sqrt(1.0 / 3) * jnp.transpose(bias, (0, 3, 1, 2))

        # point attention logits
        pt_disp = (q_pts[:, :, None, :, :, :] - k_pts[:, None, :, :, :, :])
        pt_att = jnp.sum(pt_disp ** 2, axis=-1).sum(-1)  # [B,N,N,H]
        head_weights = self.param("head_weights",
                                  nn.initializers.zeros, (h,))
        gamma = jax.nn.softplus(head_weights) * math.sqrt(1.0 / (3 * (pq * 9.0 / 2)))
        pt_att = pt_att * gamma[None, None, None, :] * (-0.5)
        att = att + jnp.transpose(pt_att, (0, 3, 1, 2))

        att = att + (mask[:, None, None, :] - 1.0) * 1e5  # mask keys
        att = jax.nn.softmax(att.astype(jnp.float32), axis=-1
                             ).astype(self.dtype)  # [B,H,N,N]

        o = jnp.einsum("bhij,bjhc->bihc", att, v).reshape(b, n, h * c)
        o_pt = jnp.einsum("bhij,bjhpd->bihpd", att, v_pts)
        o_pt = rigid_invert_apply(rot, trans, o_pt.reshape(b, n, h * pv, 3))
        o_pt_norm = jnp.sqrt(jnp.sum(o_pt ** 2, -1) + 1e-8)
        o_pair = jnp.einsum("bhij,bijz->bihz", att, z).reshape(b, n, -1)

        out = jnp.concatenate([
            o, o_pt.reshape(b, n, h * pv * 3), o_pt_norm, o_pair], axis=-1)
        return nn.Dense(self.c_s, dtype=self.dtype,
                        kernel_init=nn.initializers.zeros,
                        name="linear_out")(out)


class StructureModuleTransition(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, s):
        c = s.shape[-1]
        h = nn.relu(nn.Dense(c, dtype=self.dtype, name="l1")(s))
        h = nn.relu(nn.Dense(c, dtype=self.dtype, name="l2")(h))
        s = s + nn.Dense(c, dtype=self.dtype,
                         kernel_init=nn.initializers.zeros, name="l3")(h)
        return nn.LayerNorm(dtype=self.dtype, name="ln")(s)


class BackboneUpdate(nn.Module):
    """c_s -> (quat-vec rot update, trans update)
    (reference: ipa_pytorch.py:194-233)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, s):
        upd = nn.Dense(6, dtype=self.dtype,
                       kernel_init=nn.initializers.zeros, name="linear")(s)
        return upd  # [..., 6]


def apply_backbone_update(rot, trans, update, mask):
    """Compose rigids with a (b,c,d,tx,ty,tz) update, masked."""
    bcd = update[..., :3].astype(jnp.float32)
    t_upd = update[..., 3:].astype(jnp.float32)
    quat = jnp.concatenate([jnp.ones_like(bcd[..., :1]), bcd], axis=-1)
    quat = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
    rot_upd = quat_to_rotmat(quat)
    new_rot, new_trans = compose_rigids(rot, trans, rot_upd, t_upd)
    m = mask[..., None]
    trans = jnp.where(m.astype(bool), new_trans, trans)
    rot = jnp.where(m[..., None].astype(bool), new_rot, rot)
    return rot, trans


class EdgeTransition(nn.Module):
    """Edge update from node embeddings (reference: ipa_pytorch.py:537-580)."""

    edge_embed_out: int = 128
    num_layers: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, node_embed, edge_embed):
        b, n, _ = node_embed.shape
        bias = nn.Dense(self.edge_embed_out // 2, dtype=self.dtype,
                        name="initial_embed")(node_embed)
        edge_bias = jnp.concatenate([
            jnp.broadcast_to(bias[:, :, None], (b, n, n, bias.shape[-1])),
            jnp.broadcast_to(bias[:, None, :], (b, n, n, bias.shape[-1])),
        ], axis=-1)
        x = jnp.concatenate([edge_embed, edge_bias], axis=-1)
        for i in range(self.num_layers):
            x = nn.Dense(self.edge_embed_out * 2, dtype=self.dtype,
                         name=f"fc_{i}")(x)
            x = nn.relu(x)
        x = nn.Dense(self.edge_embed_out, dtype=self.dtype, name="out")(x)
        return nn.LayerNorm(dtype=self.dtype, name="ln")(x)


class NodeFeatureNet(nn.Module):
    """Timesteps + positions + aatypes (+ self-cond aatypes) -> node embed
    (reference: multiflow/models/node_feature_net.py)."""

    c_s: int = 256
    c_pos_emb: int = 128
    c_timestep_emb: int = 128
    num_tokens: int = NUM_TOKENS
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, so3_t, r3_t, cat_t, res_mask, pos, aatypes,
                 aatypes_sc=None):
        b, n = res_mask.shape
        pos_emb = timestep_embedding(pos.reshape(-1).astype(jnp.float32),
                                     self.c_pos_emb).reshape(b, n, -1)
        feats = [pos_emb * res_mask[..., None]]
        for t in (so3_t, r3_t, cat_t):
            t_emb = timestep_embedding(t.reshape(-1), self.c_timestep_emb
                                       ).reshape(b, 1, -1)
            feats.append(jnp.broadcast_to(t_emb, (b, n, t_emb.shape[-1]))
                         * res_mask[..., None])
        feats.append(nn.Embed(self.num_tokens + 1, 64, dtype=self.dtype,
                              name="aatype_embed")(aatypes))
        if aatypes_sc is not None:
            feats.append(nn.Dense(64, dtype=self.dtype, name="sc_embed")(
                aatypes_sc.astype(self.dtype)))
        x = jnp.concatenate([f.astype(self.dtype) for f in feats], axis=-1)
        return nn.Dense(self.c_s, dtype=self.dtype, name="linear")(x)


class EdgeFeatureNet(nn.Module):
    """Pair features: node-embed pairs + distogram of trans_t (+ self-cond
    distogram) + relative position (reference: edge_feature_net.py)."""

    c_z: int = 128
    num_bins: int = 22
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, node_embed, trans_t, trans_sc, edge_mask, res_idx):
        b, n, _ = node_embed.shape
        proj = nn.Dense(self.c_z // 2, dtype=self.dtype, name="node_proj")(
            node_embed)
        pair_nodes = jnp.concatenate([
            jnp.broadcast_to(proj[:, :, None], (b, n, n, proj.shape[-1])),
            jnp.broadcast_to(proj[:, None, :], (b, n, n, proj.shape[-1])),
        ], axis=-1)

        def distogram(x):
            d = jnp.linalg.norm(
                x[:, :, None, :] - x[:, None, :, :] + 1e-8, axis=-1)
            bins = jnp.linspace(0.0, 20.0, self.num_bins)
            idx = jnp.sum(d[..., None] > bins, axis=-1) - 1
            return jax.nn.one_hot(jnp.clip(idx, 0, self.num_bins - 1),
                                  self.num_bins, dtype=self.dtype)

        rel = jnp.clip(res_idx[:, :, None] - res_idx[:, None, :], -32, 32) + 32
        rel = jax.nn.one_hot(rel, 65, dtype=self.dtype)
        x = jnp.concatenate([pair_nodes, distogram(trans_t),
                             distogram(trans_sc), rel], axis=-1)
        x = nn.Dense(self.c_z, dtype=self.dtype, name="fc1")(x)
        x = nn.relu(x)
        x = nn.Dense(self.c_z, dtype=self.dtype, name="fc2")(x)
        x = nn.LayerNorm(dtype=self.dtype, name="ln")(x)
        return x * edge_mask[..., None]


class SeqTransformerBlock(nn.Module):
    num_heads: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        d = x.shape[-1]
        from reed_tpu.ops.attention import sdpa_xla

        b, n, _ = x.shape
        hd = d // self.num_heads
        qkv = nn.Dense(3 * d, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv.reshape(b, n, 3 * self.num_heads, hd), 3, 2)
        attn_mask = (mask[:, None, None, :] > 0)
        o = sdpa_xla(q, k, v, mask=attn_mask).reshape(b, n, d)
        x = nn.LayerNorm(dtype=self.dtype, name="ln1")(
            x + nn.Dense(d, dtype=self.dtype, name="proj")(o))
        h = nn.Dense(d, dtype=self.dtype, name="fc1")(x)
        h = nn.relu(h)
        h = nn.Dense(d, dtype=self.dtype, name="fc2")(h)
        return nn.LayerNorm(dtype=self.dtype, name="ln2")(x + h)


class FlowModel(nn.Module):
    """MultiFlow trunk (reference: flow_model.py:11-154)."""

    c_s: int = 256
    c_z: int = 128
    num_blocks: int = 6
    seq_tfmr_num_heads: int = 4
    seq_tfmr_num_layers: int = 2
    aatype_pred_num_tokens: int = NUM_TOKENS
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, batch):
        """batch: res_mask, so3_t, r3_t, cat_t, trans_t [A], rotmats_t,
        aatypes_t, trans_sc, aatypes_sc, res_idx. Returns dict with
        pred_trans [A], pred_rotmats, pred_logits."""
        mask = batch["res_mask"]
        edge_mask = mask[:, None, :] * mask[:, :, None]
        node_embed = NodeFeatureNet(self.c_s, dtype=self.dtype,
                                    name="node_feature_net")(
            batch["so3_t"], batch["r3_t"], batch["cat_t"], mask,
            batch["res_idx"], batch["aatypes_t"],
            batch.get("aatypes_sc"))
        edge_embed = EdgeFeatureNet(self.c_z, dtype=self.dtype,
                                    name="edge_feature_net")(
            node_embed, batch["trans_t"], batch.get(
                "trans_sc", jnp.zeros_like(batch["trans_t"])),
            edge_mask, batch["res_idx"])

        rot = batch["rotmats_t"]
        trans = batch["trans_t"] * ANG_TO_NM
        node_embed = node_embed * mask[..., None]
        edge_embed = edge_embed * edge_mask[..., None]

        for bidx in range(self.num_blocks):
            ipa_out = InvariantPointAttention(
                self.c_s, self.c_z, dtype=self.dtype, name=f"ipa_{bidx}")(
                node_embed, edge_embed, rot, trans, mask)
            node_embed = nn.LayerNorm(dtype=self.dtype,
                                      name=f"ipa_ln_{bidx}")(
                node_embed + ipa_out * mask[..., None])
            h = node_embed
            for li in range(self.seq_tfmr_num_layers):
                h = SeqTransformerBlock(self.seq_tfmr_num_heads,
                                        dtype=self.dtype,
                                        name=f"seq_tfmr_{bidx}_{li}")(h, mask)
            node_embed = node_embed + nn.Dense(
                self.c_s, dtype=self.dtype,
                kernel_init=nn.initializers.zeros,
                name=f"post_tfmr_{bidx}")(h)
            node_embed = StructureModuleTransition(
                dtype=self.dtype, name=f"node_transition_{bidx}")(node_embed)
            node_embed = node_embed * mask[..., None]
            update = BackboneUpdate(dtype=self.dtype,
                                    name=f"bb_update_{bidx}")(node_embed)
            rot, trans = apply_backbone_update(rot, trans, update, mask)
            if bidx < self.num_blocks - 1:
                edge_embed = EdgeTransition(
                    self.c_z, dtype=self.dtype,
                    name=f"edge_transition_{bidx}")(node_embed, edge_embed)
                edge_embed = edge_embed * edge_mask[..., None]

        pred_logits = node_embed
        for i, act in ((0, True), (1, True), (2, False)):
            pred_logits = nn.Dense(
                self.c_s if act else self.aatype_pred_num_tokens,
                dtype=self.dtype, name=f"aatype_pred_{i}")(pred_logits)
            if act:
                pred_logits = nn.relu(pred_logits)

        return {
            "pred_trans": (trans * NM_TO_ANG).astype(jnp.float32),
            "pred_rotmats": rot.astype(jnp.float32),
            "pred_logits": pred_logits.astype(jnp.float32),
        }

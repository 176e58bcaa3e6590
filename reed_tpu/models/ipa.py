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

from reed_tpu.nn.layers import DenseParams
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


def mf_time_embedding(t, dim: int, max_positions: int = 2056):
    """Reference-exact diffusion time embedding [sin | cos]
    (multiflow/models/utils.py:49-61, called with max_positions=2056)."""
    half = dim // 2
    t = t.astype(jnp.float32) * max_positions
    freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32)
                    * (-math.log(max_positions) / (half - 1)))
    args = t[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
    if dim % 2:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def mf_index_embedding(indices, dim: int, max_len: int = 2056):
    """Reference-exact index embedding [sin_all | cos_all]
    (multiflow/models/utils.py:28-46)."""
    k = jnp.arange(dim // 2, dtype=jnp.float32)
    args = (indices.astype(jnp.float32)[..., None] * math.pi
            / (max_len ** (2.0 * k / dim)))
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


def mf_distogram(pos, min_bin: float = 1e-3, max_bin: float = 20.0,
                 num_bins: int = 22):
    """Reference-exact distogram (multiflow/models/utils.py:15-25):
    (d > lower) & (d < upper) per bin, last bin open-ended."""
    d = jnp.linalg.norm(pos[:, :, None, :] - pos[:, None, :, :],
                        axis=-1)[..., None]
    lower = jnp.linspace(min_bin, max_bin, num_bins)
    upper = jnp.concatenate([lower[1:], jnp.full((1,), 1e8)])
    return ((d > lower) & (d < upper)).astype(jnp.float32)


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
        # split per head on the point axis (ipa_pytorch.py:370-373)
        kv_pts = kv_pts.reshape(b, n, h, pq + pv, 3)
        k_pts, v_pts = kv_pts[:, :, :, :pq], kv_pts[:, :, :, pq:]
        q_pts = q_pts.reshape(b, n, h, pq, 3)

        bias = nn.Dense(h, dtype=self.dtype, name="linear_b")(z)  # [B,N,N,H]

        # scalar attention logits
        att = jnp.einsum("bihc,bjhc->bhij", q, k) * math.sqrt(1.0 / (3 * c))
        att = att + math.sqrt(1.0 / 3) * jnp.transpose(bias, (0, 3, 1, 2))

        # point attention logits via the gram identity: sum_{p,d}(q-k)^2 =
        # |q|^2 + |k|^2 - 2<q,k> — the rank-6 [B,N,N,H,P,3] displacement
        # tensor of the direct form (ipa_pytorch.py:390-400) never
        # materializes and the cross term runs on the MXU. Accumulated in
        # f32 to absorb the cancellation (same treatment as the semla
        # factored coord attention).
        qf = q_pts.astype(jnp.float32)
        kf = k_pts.astype(jnp.float32)
        qn = jnp.transpose(jnp.sum(qf ** 2, axis=(-1, -2)), (0, 2, 1))
        kn = jnp.transpose(jnp.sum(kf ** 2, axis=(-1, -2)), (0, 2, 1))
        cross = jnp.einsum("bihpd,bjhpd->bhij", qf, kf)
        pt_att = qn[..., :, None] + kn[..., None, :] - 2.0 * cross  # [B,H,N,N]
        head_weights = self.param("head_weights",
                                  nn.initializers.zeros, (h,))
        gamma = jax.nn.softplus(head_weights) * math.sqrt(1.0 / (3 * (pq * 9.0 / 2)))
        pt_att = pt_att * gamma[None, :, None, None] * (-0.5)
        att = att + pt_att.astype(att.dtype)

        # square mask, exactly as the reference (ipa_pytorch.py:409-415)
        square_mask = mask[:, None, :] * mask[:, :, None]
        att = att + ((square_mask - 1.0) * 1e5)[:, None, :, :]
        att = jax.nn.softmax(att.astype(jnp.float32), axis=-1
                             ).astype(self.dtype)  # [B,H,N,N]

        o = jnp.einsum("bhij,bjhc->bihc", att, v).reshape(b, n, h * c)
        o_pt = jnp.einsum("bhij,bjhpd->bihpd", att, v_pts)
        o_pt = rigid_invert_apply(rot, trans, o_pt.reshape(b, n, h * pv, 3))
        o_pt_norm = jnp.sqrt(jnp.sum(o_pt ** 2, -1) + 1e-8)
        # pair output through down_z (ipa_pytorch.py:289,460-466): 4x fewer
        # FLOPs in the attention-weighted pair sum and the output projection
        pair_z = nn.Dense(self.c_z // 4, dtype=self.dtype,
                          name="down_z")(z)
        o_pair = jnp.einsum("bhij,bijz->bihz", att, pair_z).reshape(b, n, -1)

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
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln")(s)


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
    """Edge update from node embeddings (reference: ipa_pytorch.py:571-608):
    cross-concat of dilated node embeds onto the edge embed, a residual
    2-layer ReLU trunk at the concat width, final projection + LayerNorm."""

    node_embed_size: int = 256
    edge_embed_out: int = 128
    num_layers: int = 2
    node_dilation: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, node_embed, edge_embed):
        b, n, _ = node_embed.shape
        bias = nn.Dense(self.node_embed_size // self.node_dilation,
                        dtype=self.dtype, name="initial_embed")(node_embed)
        edge_bias = jnp.concatenate([
            jnp.broadcast_to(bias[:, :, None], (b, n, n, bias.shape[-1])),
            jnp.broadcast_to(bias[:, None, :], (b, n, n, bias.shape[-1])),
        ], axis=-1)
        x = jnp.concatenate([edge_embed, edge_bias], axis=-1)
        h = x
        for i in range(self.num_layers):
            h = nn.Dense(x.shape[-1], dtype=self.dtype,
                         name=f"trunk_{i}")(h)
            h = nn.relu(h)
        x = nn.Dense(self.edge_embed_out, dtype=self.dtype,
                     name="final_layer")(h + x)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln")(x)


class NodeFeatureNet(nn.Module):
    """Positions + diffuse mask + timesteps + aatypes (+ self-cond aatype
    logits) -> node embed; structurally weight-compatible with the
    reference (multiflow/models/node_feature_net.py, pdb_codesign config:
    use_mlp=True, embed_aatype=True)."""

    c_s: int = 256
    c_pos_emb: int = 128
    c_timestep_emb: int = 128
    num_tokens: int = NUM_TOKENS
    embed_aatype: bool = True
    use_mlp: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, so3_t, r3_t, cat_t, res_mask, diffuse_mask, pos,
                 aatypes, aatypes_sc=None):
        b, n = res_mask.shape
        pos_emb = mf_index_embedding(pos, self.c_pos_emb).astype(self.dtype)
        feats = [pos_emb * res_mask[..., None],
                 diffuse_mask[..., None].astype(self.dtype)]
        for t in (so3_t, r3_t):
            t_emb = mf_time_embedding(t.reshape(-1), self.c_timestep_emb
                                      ).reshape(b, 1, -1)
            feats.append(jnp.broadcast_to(t_emb, (b, n, t_emb.shape[-1]))
                         .astype(self.dtype) * res_mask[..., None])
        if self.embed_aatype:
            # Embedding(21, c_s) — the reference table covers 20 aa + mask
            feats.append(nn.Embed(21, self.c_s, dtype=self.dtype,
                                  name="aatype_embed")(aatypes))
            cat_emb = mf_time_embedding(cat_t.reshape(-1),
                                        self.c_timestep_emb).reshape(b, 1, -1)
            feats.append(jnp.broadcast_to(cat_emb, (b, n, cat_emb.shape[-1]))
                         .astype(self.dtype) * res_mask[..., None])
            sc = (aatypes_sc if aatypes_sc is not None
                  else jnp.zeros((b, n, self.num_tokens)))
            feats.append(sc.astype(self.dtype))
        x = jnp.concatenate([f.astype(self.dtype) for f in feats], axis=-1)
        if not self.use_mlp:
            return nn.Dense(self.c_s, dtype=self.dtype, name="linear")(x)
        x = nn.Dense(self.c_s, dtype=self.dtype, name="linear_0")(x)
        x = nn.relu(x)
        x = nn.Dense(self.c_s, dtype=self.dtype, name="linear_2")(x)
        x = nn.relu(x)
        x = nn.Dense(self.c_s, dtype=self.dtype, name="linear_4")(x)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="linear_ln")(x)


class EdgeFeatureNet(nn.Module):
    """Pair features: cross-concat node projections + relpos embedding +
    distograms of trans_t / self-cond trans (+ diffuse-mask cross-concat);
    structurally weight-compatible with the reference
    (multiflow/models/edge_feature_net.py, embed_diffuse_mask=True)."""

    c_s: int = 256
    c_z: int = 128
    feat_dim: int = 64
    num_bins: int = 22
    embed_diffuse_mask: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, node_embed, trans_t, trans_sc, edge_mask,
                 diffuse_mask):
        b, n, _ = node_embed.shape

        p_i = nn.Dense(self.feat_dim, dtype=self.dtype,
                       name="linear_s_p")(node_embed)

        # reference uses arange, not res_idx (edge_feature_net.py:57-60)
        r = jnp.broadcast_to(jnp.arange(n)[None], (b, n))
        d = r[:, :, None] - r[:, None, :]
        relpos = nn.Dense(self.feat_dim, dtype=self.dtype,
                          name="linear_relpos")(
            mf_index_embedding(d, self.feat_dim).astype(self.dtype))

        # embed_0 over concat([cross_node(2F), pair feats, cross_diffuse])
        # factored through kernel slices (reed_tpu/nn/layers.py DenseParams):
        # the node and diffuse-mask cross-concat parts run as [B,N,*]
        # matmuls BEFORE broadcasting, so those pairwise concats never
        # materialize
        f = self.feat_dim
        pair = jnp.concatenate(
            [relpos,
             mf_distogram(trans_t, num_bins=self.num_bins).astype(self.dtype),
             mf_distogram(trans_sc, num_bins=self.num_bins
                          ).astype(self.dtype)], axis=-1)
        in_total = 2 * f + pair.shape[-1] + (2 if self.embed_diffuse_mask
                                             else 0)
        w0, b0 = DenseParams(in_total, self.c_z, dtype=self.dtype,
                             name="embed_0")()
        x = ((p_i @ w0[:f])[:, :, None, :] + (p_i @ w0[f:2 * f])[:, None, :, :]
             + pair @ w0[2 * f:2 * f + pair.shape[-1]] + b0)
        if self.embed_diffuse_mask:
            dm = diffuse_mask[..., None].astype(self.dtype)
            wd = w0[2 * f + pair.shape[-1]:]
            x = x + ((dm @ wd[:1])[:, :, None, :]
                     + (dm @ wd[1:])[:, None, :, :])
        x = nn.relu(x)
        x = nn.Dense(self.c_z, dtype=self.dtype, name="embed_2")(x)
        x = nn.relu(x)
        x = nn.Dense(self.c_z, dtype=self.dtype, name="embed_4")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="embed_ln")(x)
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
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln1")(
            x + nn.Dense(d, dtype=self.dtype, name="proj")(o))
        h = nn.Dense(d, dtype=self.dtype, name="fc1")(x)
        h = nn.relu(h)
        h = nn.Dense(d, dtype=self.dtype, name="fc2")(h)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln2")(x + h)


class FlowModel(nn.Module):
    """MultiFlow trunk (reference: flow_model.py:11-154)."""

    c_s: int = 256
    c_z: int = 128
    num_blocks: int = 6
    ipa_c_hidden: int = 16
    ipa_no_heads: int = 8
    ipa_no_qk_points: int = 8
    ipa_no_v_points: int = 12
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
        diffuse_mask = batch.get("diffuse_mask", jnp.ones_like(mask))
        node_embed = NodeFeatureNet(self.c_s, dtype=self.dtype,
                                    name="node_feature_net")(
            batch["so3_t"], batch["r3_t"], batch["cat_t"], mask,
            diffuse_mask, batch["res_idx"], batch["aatypes_t"],
            batch.get("aatypes_sc"))
        edge_embed = EdgeFeatureNet(self.c_s, self.c_z, dtype=self.dtype,
                                    name="edge_feature_net")(
            node_embed, batch["trans_t"], batch.get(
                "trans_sc", jnp.zeros_like(batch["trans_t"])),
            edge_mask, diffuse_mask)

        rot = batch["rotmats_t"]
        trans = batch["trans_t"] * ANG_TO_NM
        node_embed = node_embed * mask[..., None]
        edge_embed = edge_embed * edge_mask[..., None]

        for bidx in range(self.num_blocks):
            ipa_out = InvariantPointAttention(
                self.c_s, self.c_z, c_hidden=self.ipa_c_hidden,
                no_heads=self.ipa_no_heads,
                no_qk_points=self.ipa_no_qk_points,
                no_v_points=self.ipa_no_v_points,
                dtype=self.dtype, name=f"ipa_{bidx}")(
                node_embed, edge_embed, rot, trans, mask)
            node_embed = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
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
            rot, trans = apply_backbone_update(rot, trans, update,
                                               mask * diffuse_mask)
            if bidx < self.num_blocks - 1:
                edge_embed = EdgeTransition(
                    node_embed_size=self.c_s, edge_embed_out=self.c_z,
                    dtype=self.dtype,
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

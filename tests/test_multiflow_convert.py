"""Torch MultiFlow checkpoint conversion parity: a minimal torch FlowModel
built to the reference equations (protein/multiflow/models/flow_model.py,
ipa_pytorch.py:236-537, node_feature_net.py, edge_feature_net.py; the
openfold Rigid ops reimplemented from the AF2 quaternion-update math) must
match the converted reed_tpu models.ipa.FlowModel outputs."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from reed_tpu.encoders.multiflow_convert import convert_torch_multiflow  # noqa: E402
from reed_tpu.models.ipa import FlowModel  # noqa: E402

C_S, C_Z = 32, 16
C_HID, HEADS, PQ, PV = 8, 2, 3, 4
BLOCKS, TFMR_LAYERS, TFMR_HEADS = 2, 2, 2
NUM_TOKENS = 21
ANG_TO_NM, NM_TO_ANG = 0.1, 10.0


# ---- reference embedding / geometry helpers (multiflow/models/utils.py) ----

def t_time_embedding(t, dim, max_positions=2056):
    t = t * max_positions
    half = dim // 2
    emb = math.log(max_positions) / (half - 1)
    emb = torch.exp(torch.arange(half, dtype=torch.float32) * -emb)
    emb = t.float()[:, None] * emb[None, :]
    return torch.cat([torch.sin(emb), torch.cos(emb)], dim=1)


def t_index_embedding(indices, embed_size, max_len=2056):
    k = torch.arange(embed_size // 2, dtype=torch.float32)
    args = indices[..., None].float() * math.pi / (
        max_len ** (2 * k[None] / embed_size))
    return torch.cat([torch.sin(args), torch.cos(args)], dim=-1)


def t_distogram(pos, min_bin=1e-3, max_bin=20.0, num_bins=22):
    d = torch.linalg.norm(
        pos[:, :, None, :] - pos[:, None, :, :], axis=-1)[..., None]
    lower = torch.linspace(min_bin, max_bin, num_bins)
    upper = torch.cat([lower[1:], lower.new_tensor([1e8])], dim=-1)
    return ((d > lower) * (d < upper)).float()


def t_quat_to_rotmat(q):
    w, x, y, z = q.unbind(-1)
    two_s = 2.0 / (q * q).sum(-1)
    rot = torch.stack([
        1 - two_s * (y * y + z * z), two_s * (x * y - z * w),
        two_s * (x * z + y * w),
        two_s * (x * y + z * w), 1 - two_s * (x * x + z * z),
        two_s * (y * z - x * w),
        two_s * (x * z - y * w), two_s * (y * z + x * w),
        1 - two_s * (x * x + y * y),
    ], dim=-1)
    return rot.reshape(q.shape[:-1] + (3, 3))


def t_compose_q_update_vec(rot, trans, update, mask):
    """AF2 Algorithm 23 rigid update: quat = norm([1,b,c,d]), compose."""
    bcd, t_upd = update[..., :3], update[..., 3:]
    quat = torch.cat([torch.ones_like(bcd[..., :1]), bcd], dim=-1)
    quat = quat / torch.linalg.norm(quat, dim=-1, keepdim=True)
    rot_upd = t_quat_to_rotmat(quat)
    new_rot = rot @ rot_upd
    new_trans = torch.einsum("...ij,...j->...i", rot, t_upd) + trans
    m = mask[..., None]
    trans = torch.where(m.bool(), new_trans, trans)
    rot = torch.where(m[..., None].bool(), new_rot, rot)
    return rot, trans


def t_rigid_apply(rot, trans, points):
    return torch.einsum("...ij,...pj->...pi", rot, points) \
        + trans[..., None, :]


def t_rigid_invert_apply(rot, trans, points):
    return torch.einsum("...ji,...pj->...pi", rot,
                        points - trans[..., None, :])


# ---- torch-mini modules (reference structure + state-dict names) ----------

class TIPA(tnn.Module):
    """ipa_pytorch.py:236-477."""

    def __init__(self):
        super().__init__()
        hc = C_HID * HEADS
        self.linear_q = tnn.Linear(C_S, hc)
        self.linear_kv = tnn.Linear(C_S, 2 * hc)
        self.linear_q_points = tnn.Linear(C_S, HEADS * PQ * 3)
        self.linear_kv_points = tnn.Linear(C_S, HEADS * (PQ + PV) * 3)
        self.linear_b = tnn.Linear(C_Z, HEADS)
        self.down_z = tnn.Linear(C_Z, C_Z // 4)
        self.head_weights = tnn.Parameter(torch.rand(HEADS))
        concat_out = C_Z // 4 + C_HID + PV * 4
        self.linear_out = tnn.Linear(HEADS * concat_out, C_S)

    def forward(self, s, z, rot, trans, mask):
        b, n, _ = s.shape
        q = self.linear_q(s).view(b, n, HEADS, C_HID)
        kv = self.linear_kv(s).view(b, n, HEADS, 2 * C_HID)
        k, v = torch.split(kv, C_HID, dim=-1)

        q_pts = self.linear_q_points(s)
        q_pts = torch.stack(
            torch.split(q_pts, q_pts.shape[-1] // 3, dim=-1), dim=-1)
        q_pts = t_rigid_apply(rot, trans, q_pts)
        q_pts = q_pts.view(b, n, HEADS, PQ, 3)

        kv_pts = self.linear_kv_points(s)
        kv_pts = torch.stack(
            torch.split(kv_pts, kv_pts.shape[-1] // 3, dim=-1), dim=-1)
        kv_pts = t_rigid_apply(rot, trans, kv_pts)
        kv_pts = kv_pts.view(b, n, HEADS, PQ + PV, 3)
        k_pts, v_pts = torch.split(kv_pts, [PQ, PV], dim=-2)

        bias = self.linear_b(z)
        a = torch.matmul(q.permute(0, 2, 1, 3),
                         k.permute(0, 2, 3, 1)) * math.sqrt(1.0 / (3 * C_HID))
        a = a + math.sqrt(1.0 / 3) * bias.permute(0, 3, 1, 2)

        pt_att = (q_pts.unsqueeze(2) - k_pts.unsqueeze(1)) ** 2
        pt_att = pt_att.sum(-1)                       # [B,N,N,H,PQ]
        hw = torch.nn.functional.softplus(self.head_weights) * math.sqrt(
            1.0 / (3 * (PQ * 9.0 / 2)))
        pt_att = (pt_att * hw[None, None, None, :, None]).sum(-1) * (-0.5)
        a = a + pt_att.permute(0, 3, 1, 2)

        square_mask = mask.unsqueeze(-1) * mask.unsqueeze(-2)
        a = a + (1e5 * (square_mask - 1))[:, None, :, :]
        a = torch.softmax(a, dim=-1)

        o = torch.matmul(a, v.transpose(-2, -3)).transpose(-2, -3)
        o = o.reshape(b, n, HEADS * C_HID)

        o_pt = torch.sum(
            a[..., None, :, :, None]
            * v_pts.permute(0, 2, 4, 1, 3)[..., None, :, :], dim=-2)
        o_pt = o_pt.permute(0, 3, 1, 4, 2)            # [B,N,H,PV,3]
        o_pt = t_rigid_invert_apply(
            rot[:, :, None], trans[:, :, None], o_pt)
        o_pt_dists = torch.sqrt(torch.sum(o_pt ** 2, dim=-1) + 1e-8)
        o_pt_norm = o_pt_dists.reshape(b, n, HEADS * PV)
        o_pt = o_pt.reshape(b, n, HEADS * PV, 3)

        pair_z = self.down_z(z)
        o_pair = torch.matmul(a.transpose(-2, -3), pair_z)
        o_pair = o_pair.reshape(b, n, -1)

        o_feats = [o, *torch.unbind(o_pt, dim=-1), o_pt_norm, o_pair]
        return self.linear_out(torch.cat(o_feats, dim=-1))


class TTransition(tnn.Module):
    def __init__(self):
        super().__init__()
        self.linear_1 = tnn.Linear(C_S, C_S)
        self.linear_2 = tnn.Linear(C_S, C_S)
        self.linear_3 = tnn.Linear(C_S, C_S)
        self.ln = tnn.LayerNorm(C_S)

    def forward(self, s):
        h = torch.relu(self.linear_1(s))
        h = torch.relu(self.linear_2(h))
        return self.ln(s + self.linear_3(h))


class TBackboneUpdate(tnn.Module):
    def __init__(self):
        super().__init__()
        self.linear = tnn.Linear(C_S, 6)

    def forward(self, s):
        return self.linear(s)


class TEdgeTransition(tnn.Module):
    def __init__(self):
        super().__init__()
        bias_embed = C_S // 2
        hidden = bias_embed * 2 + C_Z
        self.initial_embed = tnn.Linear(C_S, bias_embed)
        self.trunk = tnn.Sequential(
            tnn.Linear(hidden, hidden), tnn.ReLU(),
            tnn.Linear(hidden, hidden), tnn.ReLU())
        self.final_layer = tnn.Linear(hidden, C_Z)
        self.layer_norm = tnn.LayerNorm(C_Z)

    def forward(self, node_embed, edge_embed):
        node_embed = self.initial_embed(node_embed)
        b, n, _ = node_embed.shape
        edge_bias = torch.cat([
            torch.tile(node_embed[:, :, None, :], (1, 1, n, 1)),
            torch.tile(node_embed[:, None, :, :], (1, n, 1, 1)),
        ], dim=-1)
        x = torch.cat([edge_embed, edge_bias], dim=-1)
        x = self.final_layer(self.trunk(x) + x)
        return self.layer_norm(x)


class TNodeFeatureNet(tnn.Module):
    def __init__(self, c_pos_emb=128, c_timestep_emb=128):
        super().__init__()
        self.c_pos_emb, self.c_t_emb = c_pos_emb, c_timestep_emb
        embed_size = c_pos_emb + c_timestep_emb * 2 + 1 \
            + C_S + c_timestep_emb + NUM_TOKENS
        self.aatype_embedding = tnn.Embedding(21, C_S)
        self.linear = tnn.Sequential(
            tnn.Linear(embed_size, C_S), tnn.ReLU(),
            tnn.Linear(C_S, C_S), tnn.ReLU(),
            tnn.Linear(C_S, C_S), tnn.LayerNorm(C_S))

    def forward(self, so3_t, r3_t, cat_t, res_mask, diffuse_mask, pos,
                aatypes, aatypes_sc):
        b, n = res_mask.shape

        def embed_t(t):
            e = t_time_embedding(t, self.c_t_emb)[:, None, :].repeat(1, n, 1)
            return e * res_mask.unsqueeze(-1)

        pos_emb = t_index_embedding(pos, self.c_pos_emb) \
            * res_mask.unsqueeze(-1)
        feats = [pos_emb, diffuse_mask[..., None], embed_t(so3_t),
                 embed_t(r3_t), self.aatype_embedding(aatypes),
                 embed_t(cat_t), aatypes_sc]
        return self.linear(torch.cat(feats, dim=-1))


class TEdgeFeatureNet(tnn.Module):
    def __init__(self, feat_dim=64, num_bins=22):
        super().__init__()
        self.feat_dim, self.num_bins = feat_dim, num_bins
        self.linear_s_p = tnn.Linear(C_S, feat_dim)
        self.linear_relpos = tnn.Linear(feat_dim, feat_dim)
        total = feat_dim * 3 + num_bins * 2 + 2
        self.edge_embedder = tnn.Sequential(
            tnn.Linear(total, C_Z), tnn.ReLU(),
            tnn.Linear(C_Z, C_Z), tnn.ReLU(),
            tnn.Linear(C_Z, C_Z), tnn.LayerNorm(C_Z))

    def _cross(self, f, b, n):
        return torch.cat([
            torch.tile(f[:, :, None, :], (1, 1, n, 1)),
            torch.tile(f[:, None, :, :], (1, n, 1, 1)),
        ], dim=-1).float()

    def forward(self, s, t, sc_t, p_mask, diffuse_mask):
        b, n, _ = s.shape
        cross_node = self._cross(self.linear_s_p(s), b, n)
        r = torch.arange(n)[None].repeat(b, 1)
        d = r[:, :, None] - r[:, None, :]
        relpos = self.linear_relpos(t_index_embedding(d, self.feat_dim))
        feats = [cross_node, relpos,
                 t_distogram(t, num_bins=self.num_bins),
                 t_distogram(sc_t, num_bins=self.num_bins),
                 self._cross(diffuse_mask[..., None], b, n)]
        out = self.edge_embedder(torch.cat(feats, dim=-1))
        return out * p_mask.unsqueeze(-1)


class TFlowModel(tnn.Module):
    """flow_model.py:11-160, pdb_codesign config at tiny dims."""

    def __init__(self):
        super().__init__()
        self.node_feature_net = TNodeFeatureNet()
        self.edge_feature_net = TEdgeFeatureNet()
        self.aatype_pred_net = tnn.Sequential(
            tnn.Linear(C_S, C_S), tnn.ReLU(),
            tnn.Linear(C_S, C_S), tnn.ReLU(),
            tnn.Linear(C_S, NUM_TOKENS))
        self.trunk = tnn.ModuleDict()
        for b in range(BLOCKS):
            self.trunk[f"ipa_{b}"] = TIPA()
            self.trunk[f"ipa_ln_{b}"] = tnn.LayerNorm(C_S)
            layer = tnn.TransformerEncoderLayer(
                d_model=C_S, nhead=TFMR_HEADS, dim_feedforward=C_S,
                batch_first=True, dropout=0.0, norm_first=False)
            self.trunk[f"seq_tfmr_{b}"] = tnn.TransformerEncoder(
                layer, TFMR_LAYERS, enable_nested_tensor=False)
            self.trunk[f"post_tfmr_{b}"] = tnn.Linear(C_S, C_S)
            self.trunk[f"node_transition_{b}"] = TTransition()
            self.trunk[f"bb_update_{b}"] = TBackboneUpdate()
            if b < BLOCKS - 1:
                self.trunk[f"edge_transition_{b}"] = TEdgeTransition()

    def forward(self, feats):
        node_mask = feats["res_mask"]
        edge_mask = node_mask[:, None] * node_mask[:, :, None]
        diffuse_mask = feats["diffuse_mask"]
        node_embed = self.node_feature_net(
            feats["so3_t"], feats["r3_t"], feats["cat_t"], node_mask,
            diffuse_mask, feats["res_idx"], feats["aatypes_t"],
            feats["aatypes_sc"])
        edge_embed = self.edge_feature_net(
            node_embed, feats["trans_t"], feats["trans_sc"], edge_mask,
            diffuse_mask)

        rot = feats["rotmats_t"]
        trans = feats["trans_t"] * ANG_TO_NM
        node_embed = node_embed * node_mask[..., None]
        edge_embed = edge_embed * edge_mask[..., None]
        for b in range(BLOCKS):
            ipa_embed = self.trunk[f"ipa_{b}"](
                node_embed, edge_embed, rot, trans, node_mask)
            ipa_embed = ipa_embed * node_mask[..., None]
            node_embed = self.trunk[f"ipa_ln_{b}"](node_embed + ipa_embed)
            tfmr_out = self.trunk[f"seq_tfmr_{b}"](
                node_embed, src_key_padding_mask=(1 - node_mask).bool())
            node_embed = node_embed + self.trunk[f"post_tfmr_{b}"](tfmr_out)
            node_embed = self.trunk[f"node_transition_{b}"](node_embed)
            node_embed = node_embed * node_mask[..., None]
            update = self.trunk[f"bb_update_{b}"](
                node_embed * node_mask[..., None])
            rot, trans = t_compose_q_update_vec(
                rot, trans, update, node_mask * diffuse_mask)
            if b < BLOCKS - 1:
                edge_embed = self.trunk[f"edge_transition_{b}"](
                    node_embed, edge_embed)
                edge_embed = edge_embed * edge_mask[..., None]
        return {
            "pred_trans": trans * NM_TO_ANG,
            "pred_rotmats": rot,
            "pred_logits": self.aatype_pred_net(node_embed),
        }


@pytest.mark.slow
def test_multiflow_convert_parity():
    torch.manual_seed(0)
    tmodel = TFlowModel().eval()
    # non-trivial weights for the zero-initialized reference layers
    for name, p in tmodel.named_parameters():
        if p.dim() >= 1 and ("linear_out" in name or "bb_update" in name
                             or "post_tfmr" in name):
            tnn.init.normal_(p, std=0.2)

    b, n = 2, 10
    rng = np.random.default_rng(0)
    mask = np.ones((b, n), np.float32)
    trans = rng.standard_normal((b, n, 3)).astype(np.float32) * 6.0
    # random rotations via QR
    q, _ = np.linalg.qr(rng.standard_normal((b * n, 3, 3)))
    det = np.linalg.det(q)
    q[:, :, 0] *= np.sign(det)[:, None]
    rotmats = q.reshape(b, n, 3, 3).astype(np.float32)
    t_vec = rng.uniform(0.1, 0.9, (b,)).astype(np.float32)
    aatypes = rng.integers(0, 21, (b, n))
    aatypes_sc = rng.standard_normal((b, n, NUM_TOKENS)).astype(np.float32)
    trans_sc = rng.standard_normal((b, n, 3)).astype(np.float32) * 4.0
    res_idx = np.tile(np.arange(n), (b, 1))

    tfeats = {
        "res_mask": torch.tensor(mask),
        "diffuse_mask": torch.tensor(mask),
        "so3_t": torch.tensor(t_vec), "r3_t": torch.tensor(t_vec),
        "cat_t": torch.tensor(t_vec),
        "trans_t": torch.tensor(trans),
        "rotmats_t": torch.tensor(rotmats),
        "aatypes_t": torch.tensor(aatypes, dtype=torch.long),
        "aatypes_sc": torch.tensor(aatypes_sc),
        "trans_sc": torch.tensor(trans_sc),
        "res_idx": torch.tensor(res_idx, dtype=torch.long),
    }
    with torch.no_grad():
        tout = tmodel(tfeats)

    params = convert_torch_multiflow(
        tmodel.state_dict(), num_blocks=BLOCKS,
        seq_tfmr_num_layers=TFMR_LAYERS, c_hidden=C_HID, no_heads=HEADS,
        no_qk_points=PQ, no_v_points=PV)
    model = FlowModel(c_s=C_S, c_z=C_Z, num_blocks=BLOCKS,
                      ipa_c_hidden=C_HID, ipa_no_heads=HEADS,
                      ipa_no_qk_points=PQ, ipa_no_v_points=PV,
                      seq_tfmr_num_heads=TFMR_HEADS,
                      seq_tfmr_num_layers=TFMR_LAYERS,
                      aatype_pred_num_tokens=NUM_TOKENS)
    jbatch = {
        "res_mask": jnp.asarray(mask),
        "diffuse_mask": jnp.asarray(mask),
        "so3_t": jnp.asarray(t_vec), "r3_t": jnp.asarray(t_vec),
        "cat_t": jnp.asarray(t_vec),
        "trans_t": jnp.asarray(trans),
        "rotmats_t": jnp.asarray(rotmats),
        "aatypes_t": jnp.asarray(aatypes, jnp.int32),
        "aatypes_sc": jnp.asarray(aatypes_sc),
        "trans_sc": jnp.asarray(trans_sc),
        "res_idx": jnp.asarray(res_idx, jnp.int32),
    }
    # shape-check params against a fresh init
    ref_params = model.init(jax.random.PRNGKey(0), jbatch)["params"]
    ref_flat = jax.tree_util.tree_flatten_with_path(ref_params)[0]
    conv_flat = jax.tree_util.tree_flatten_with_path(
        jax.tree.map(jnp.asarray, params))[0]
    assert len(ref_flat) == len(conv_flat)
    for (pa, la), (pb, lb) in zip(sorted(ref_flat, key=lambda kv: str(kv[0])),
                                  sorted(conv_flat, key=lambda kv: str(kv[0]))):
        assert str(pa) == str(pb), (pa, pb)
        assert la.shape == lb.shape, (pa, la.shape, lb.shape)

    out = model.apply({"params": jax.tree.map(jnp.asarray, params)}, jbatch)

    for key, tol in (("pred_trans", 2e-3), ("pred_rotmats", 2e-3),
                     ("pred_logits", 2e-3)):
        a = np.asarray(out[key])
        bt = tout[key].numpy()
        assert np.max(np.abs(a - bt)) < tol, (key, np.max(np.abs(a - bt)))


@pytest.mark.slow
def test_eval_multiflow_ref_ckpt(tmp_path, capsys):
    """eval-multiflow --ref-ckpt loads a (Lightning-prefixed) reference
    checkpoint file end-to-end through the converter."""
    from reed_tpu.cli import main

    torch.manual_seed(2)
    tmodel = TFlowModel().eval()
    path = str(tmp_path / "last.ckpt")
    torch.save({"state_dict": {f"model.{k}": v
                               for k, v in tmodel.state_dict().items()},
                "epoch": 3}, path)

    main(["eval-multiflow", "--ref-ckpt", path,
          "--num-samples", "1", "--length", "8", "--num-steps", "4",
          "--out", str(tmp_path / "pdb"),
          "--set", "c_s=32", "--set", "c_z=16", "--set", "num_blocks=2",
          "--set", "seq_tfmr_num_layers=2", "--set", "ipa_c_hidden=8",
          "--set", "ipa_no_heads=2", "--set", "ipa_no_qk_points=3",
          "--set", "ipa_no_v_points=4",
          "--dp", "1", "--fsdp", "1", "--tp", "1"])
    text = capsys.readouterr().out
    assert "loaded reference torch checkpoint" in text


def test_ipa_module_parity():
    """IPA module alone at exact parity (tighter tolerance)."""
    torch.manual_seed(1)
    tipa = TIPA().eval()
    with torch.no_grad():
        tipa.linear_out.weight.normal_(std=0.3)

    b, n = 2, 7
    rng = np.random.default_rng(1)
    s = rng.standard_normal((b, n, C_S)).astype(np.float32)
    z = rng.standard_normal((b, n, n, C_Z)).astype(np.float32)
    trans = rng.standard_normal((b, n, 3)).astype(np.float32)
    q, _ = np.linalg.qr(rng.standard_normal((b * n, 3, 3)))
    q[:, :, 0] *= np.sign(np.linalg.det(q))[:, None]
    rot = q.reshape(b, n, 3, 3).astype(np.float32)
    mask = np.ones((b, n), np.float32)
    mask[1, -2:] = 0.0

    with torch.no_grad():
        tout = tipa(torch.tensor(s), torch.tensor(z), torch.tensor(rot),
                    torch.tensor(trans), torch.tensor(mask))

    from reed_tpu.encoders.multiflow_convert import _ipa
    from reed_tpu.models.ipa import InvariantPointAttention

    params = _ipa({f"x.{k}": v for k, v in tipa.state_dict().items()}, "x",
                  C_HID, HEADS, PQ, PV)
    jipa = InvariantPointAttention(c_s=C_S, c_z=C_Z, c_hidden=C_HID,
                                   no_heads=HEADS, no_qk_points=PQ,
                                   no_v_points=PV)
    out = jipa.apply({"params": jax.tree.map(jnp.asarray, params)},
                     jnp.asarray(s), jnp.asarray(z), jnp.asarray(rot),
                     jnp.asarray(trans), jnp.asarray(mask))
    diff = np.max(np.abs(np.asarray(out) - tout.numpy()))
    assert diff < 5e-5, diff

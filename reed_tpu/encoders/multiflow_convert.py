"""Torch MultiFlow checkpoint conversion: reference SE(3) codesign
state dicts (protein/multiflow/models/flow_model.py:11-62, weights under
`model.*` in Lightning checkpoints) -> reed_tpu models.ipa.FlowModel params.

Architecture source: flow_model.py (trunk layout), ipa_pytorch.py:236-537
(InvariantPointAttention with down_z, StructureModuleTransition,
BackboneUpdate, EdgeTransition), node_feature_net.py / edge_feature_net.py
(pdb_codesign config: use_mlp=True, embed_aatype=True,
embed_diffuse_mask=True).

Layout notes beyond the usual torch-Linear-transpose:
  * linear_q_points / linear_kv_points: the reference emits xyz as three
    H*P-wide column blocks (split into 3 then stacked, ipa_pytorch.py:351-
    356); our Dense emits interleaved (point, xyz) columns — permute
    columns col_ours[p*3+d] = col_torch[d*H*P + p].
  * linear_out: the o_pt input segment arrives as three xyz blocks in the
    reference (o_feats unbind, ipa_pytorch.py:469) but interleaved here —
    permute the corresponding kernel rows the same way.
  * seq_tfmr: torch MultiheadAttention packs in_proj as [q;k;v] on the out
    dim, matching our qkv Dense layout directly.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _np(t):
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def _dense(sd: Dict, key: str, bias: bool = True) -> Dict:
    out = {"kernel": _np(sd[f"{key}.weight"]).T}
    if bias:
        out["bias"] = _np(sd[f"{key}.bias"])
    return out


def _ln(sd: Dict, key: str) -> Dict:
    return {"scale": _np(sd[f"{key}.weight"]), "bias": _np(sd[f"{key}.bias"])}


def _point_perm(no_heads: int, n_points: int) -> np.ndarray:
    """perm[ours] = torch index: ours (p*3+d) <- torch (d*H*P + p)."""
    hp = no_heads * n_points
    perm = np.empty(hp * 3, np.int64)
    for p in range(hp):
        for d in range(3):
            perm[p * 3 + d] = d * hp + p
    return perm


def _ipa(sd: Dict, key: str, c_hidden: int, no_heads: int, no_qk_points: int,
         no_v_points: int) -> Dict:
    qp = _point_perm(no_heads, no_qk_points)
    kvp = _point_perm(no_heads, no_qk_points + no_v_points)

    q_pts = _dense(sd, f"{key}.linear_q_points")
    q_pts = {"kernel": q_pts["kernel"][:, qp], "bias": q_pts["bias"][qp]}
    kv_pts = _dense(sd, f"{key}.linear_kv_points")
    kv_pts = {"kernel": kv_pts["kernel"][:, kvp], "bias": kv_pts["bias"][kvp]}

    out = _dense(sd, f"{key}.linear_out")
    # rows of linear_out: [o (H*C) | o_pt xyz (H*Pv*3) | o_pt_norm (H*Pv) |
    # o_pair (H*Cz/4)] — permute only the o_pt segment
    seg0 = no_heads * c_hidden
    seg_pt = no_heads * no_v_points * 3
    pt_perm = _point_perm(no_heads, no_v_points)
    kernel = out["kernel"].copy()
    kernel[seg0:seg0 + seg_pt] = out["kernel"][seg0:seg0 + seg_pt][pt_perm]
    return {
        "linear_q": _dense(sd, f"{key}.linear_q"),
        "linear_kv": _dense(sd, f"{key}.linear_kv"),
        "linear_q_points": q_pts,
        "linear_kv_points": kv_pts,
        "linear_b": _dense(sd, f"{key}.linear_b"),
        "down_z": _dense(sd, f"{key}.down_z"),
        "linear_out": {"kernel": kernel, "bias": out["bias"]},
        "head_weights": _np(sd[f"{key}.head_weights"]),
    }


def _seq_tfmr_layer(sd: Dict, key: str) -> Dict:
    return {
        "qkv": {"kernel": _np(sd[f"{key}.self_attn.in_proj_weight"]).T,
                "bias": _np(sd[f"{key}.self_attn.in_proj_bias"])},
        "proj": _dense(sd, f"{key}.self_attn.out_proj"),
        "fc1": _dense(sd, f"{key}.linear1"),
        "fc2": _dense(sd, f"{key}.linear2"),
        "ln1": _ln(sd, f"{key}.norm1"),
        "ln2": _ln(sd, f"{key}.norm2"),
    }


def convert_torch_multiflow(sd: Dict, num_blocks=None,
                            seq_tfmr_num_layers=None, c_hidden=None,
                            no_heads=None, no_qk_points=None,
                            no_v_points=None) -> Dict:
    """FlowModel state dict -> flax params for reed_tpu.models.ipa.FlowModel.

    Accepts raw FlowModel state dicts or Lightning checkpoints with keys
    prefixed `model.`. All dims are inferred from the state dict when not
    given."""
    if any(k.startswith("model.") for k in sd):
        sd = {k[len("model."):]: v for k, v in sd.items()
              if k.startswith("model.")}

    if num_blocks is None:
        num_blocks = 1 + max(int(k.split(".")[1].rsplit("_", 1)[1])
                             for k in sd if k.startswith("trunk.ipa_ln_"))
    if seq_tfmr_num_layers is None:
        seq_tfmr_num_layers = 1 + max(
            int(k.split(".")[3]) for k in sd
            if k.startswith("trunk.seq_tfmr_0.layers."))
    if no_heads is None:
        no_heads = int(_np(sd["trunk.ipa_0.head_weights"]).shape[0])
    if c_hidden is None:
        c_hidden = int(_np(sd["trunk.ipa_0.linear_q.weight"]).shape[0]
                       ) // no_heads
    if no_qk_points is None:
        no_qk_points = int(_np(sd["trunk.ipa_0.linear_q_points.weight"]
                               ).shape[0]) // (no_heads * 3)
    if no_v_points is None:
        no_v_points = int(_np(sd["trunk.ipa_0.linear_kv_points.weight"]
                              ).shape[0]) // (no_heads * 3) - no_qk_points

    params: Dict = {
        "node_feature_net": {
            "aatype_embed": {
                "embedding": _np(sd["node_feature_net.aatype_embedding.weight"])},
            "linear_0": _dense(sd, "node_feature_net.linear.0"),
            "linear_2": _dense(sd, "node_feature_net.linear.2"),
            "linear_4": _dense(sd, "node_feature_net.linear.4"),
            "linear_ln": _ln(sd, "node_feature_net.linear.5"),
        },
        "edge_feature_net": {
            "linear_s_p": _dense(sd, "edge_feature_net.linear_s_p"),
            "linear_relpos": _dense(sd, "edge_feature_net.linear_relpos"),
            "embed_0": _dense(sd, "edge_feature_net.edge_embedder.0"),
            "embed_2": _dense(sd, "edge_feature_net.edge_embedder.2"),
            "embed_4": _dense(sd, "edge_feature_net.edge_embedder.4"),
            "embed_ln": _ln(sd, "edge_feature_net.edge_embedder.5"),
        },
        "aatype_pred_0": _dense(sd, "aatype_pred_net.0"),
        "aatype_pred_1": _dense(sd, "aatype_pred_net.2"),
        "aatype_pred_2": _dense(sd, "aatype_pred_net.4"),
    }
    for b in range(num_blocks):
        params[f"ipa_{b}"] = _ipa(sd, f"trunk.ipa_{b}", c_hidden, no_heads,
                                  no_qk_points, no_v_points)
        params[f"ipa_ln_{b}"] = _ln(sd, f"trunk.ipa_ln_{b}")
        for li in range(seq_tfmr_num_layers):
            params[f"seq_tfmr_{b}_{li}"] = _seq_tfmr_layer(
                sd, f"trunk.seq_tfmr_{b}.layers.{li}")
        params[f"post_tfmr_{b}"] = _dense(sd, f"trunk.post_tfmr_{b}")
        params[f"node_transition_{b}"] = {
            "l1": _dense(sd, f"trunk.node_transition_{b}.linear_1"),
            "l2": _dense(sd, f"trunk.node_transition_{b}.linear_2"),
            "l3": _dense(sd, f"trunk.node_transition_{b}.linear_3"),
            "ln": _ln(sd, f"trunk.node_transition_{b}.ln"),
        }
        params[f"bb_update_{b}"] = {
            "linear": _dense(sd, f"trunk.bb_update_{b}.linear")}
        if b < num_blocks - 1:
            et = f"trunk.edge_transition_{b}"
            params[f"edge_transition_{b}"] = {
                "initial_embed": _dense(sd, f"{et}.initial_embed"),
                "trunk_0": _dense(sd, f"{et}.trunk.0"),
                "trunk_1": _dense(sd, f"{et}.trunk.2"),
                "final_layer": _dense(sd, f"{et}.final_layer"),
                "ln": _ln(sd, f"{et}.layer_norm"),
            }
    return params


def load_torch_multiflow_checkpoint(path: str, **kwargs) -> Dict:
    """Load a torch/Lightning multiflow checkpoint file and convert."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        ckpt = ckpt["state_dict"]
    return convert_torch_multiflow(ckpt, **kwargs)

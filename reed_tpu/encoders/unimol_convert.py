"""Torch UniMolGlobal checkpoint conversion: reference state dicts
(molecule/models/unimol/unimol/models/unimol_global.py:170-330, built on
un-vendored unicore TransformerEncoderLayer/SelfMultiheadAttention) ->
reed_tpu encoders.unimol.UniMolGlobal params.

unicore packs self-attention qkv as one `in_proj` Linear [3D, D] chunked
(q|k|v); our port keeps separate q/k/v projections — split here. The
GaussianLayer means/stds are Embedding(1, K) tables; gbf_proj /
global_rep_head are NonLinearHead / Sequential GELU MLPs. All dims are
inferred from the state dict.
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


def _layer(sd: Dict, key: str) -> Dict:
    w = _np(sd[f"{key}.self_attn.in_proj.weight"])      # [3D, D]
    b = _np(sd[f"{key}.self_attn.in_proj.bias"])
    d = w.shape[0] // 3
    qw, kw, vw = w[:d], w[d:2 * d], w[2 * d:]
    qb, kb, vb = b[:d], b[d:2 * d], b[2 * d:]
    return {
        "self_attn_layer_norm": _ln(sd, f"{key}.self_attn_layer_norm"),
        "q_proj": {"kernel": qw.T, "bias": qb},
        "k_proj": {"kernel": kw.T, "bias": kb},
        "v_proj": {"kernel": vw.T, "bias": vb},
        "out_proj": _dense(sd, f"{key}.self_attn.out_proj"),
        "final_layer_norm": _ln(sd, f"{key}.final_layer_norm"),
        "fc1": _dense(sd, f"{key}.fc1"),
        "fc2": _dense(sd, f"{key}.fc2"),
    }


def convert_torch_unimol(sd: Dict, prefix: str = "") -> Dict:
    """UniMolGlobal state dict -> flax params for
    reed_tpu.encoders.unimol.UniMolGlobal (global-rep inference path;
    lm/coord/dist heads and node_feature_fusion are training-only and
    skipped)."""
    if prefix:
        sd = {k[len(prefix):]: v for k, v in sd.items()
              if k.startswith(prefix)}

    n_layers = 1 + max(int(k.split(".")[2]) for k in sd
                       if k.startswith("encoder.layers."))
    params: Dict = {
        "embed_tokens": {"embedding": _np(sd["embed_tokens.weight"])},
        "gbf": {
            "means": _np(sd["gbf.means.weight"]),       # [1, K]
            "stds": _np(sd["gbf.stds.weight"]),
            "mul": {"embedding": _np(sd["gbf.mul.weight"])},
            "bias": {"embedding": _np(sd["gbf.bias.weight"])},
        },
        "gbf_proj_fc1": _dense(sd, "gbf_proj.linear1"),
        "gbf_proj_fc2": _dense(sd, "gbf_proj.linear2"),
        "emb_layer_norm": _ln(sd, "encoder.emb_layer_norm"),
        "final_layer_norm": _ln(sd, "encoder.final_layer_norm"),
        "global_head_fc1": _dense(sd, "global_rep_head.0"),
        "global_head_fc2": _dense(sd, "global_rep_head.2"),
        "global_head_fc3": _dense(sd, "global_rep_head.4"),
    }
    for i in range(n_layers):
        params[f"layers_{i}"] = _layer(sd, f"encoder.layers.{i}")
    return params


def load_torch_unimol_checkpoint(path: str, prefix: str = "") -> Dict:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "model" in ckpt:
        ckpt = ckpt["model"]
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        ckpt = ckpt["state_dict"]
    return convert_torch_unimol(ckpt, prefix=prefix)

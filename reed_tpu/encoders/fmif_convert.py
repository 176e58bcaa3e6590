"""Torch fmif checkpoint conversion: reference `epoch_last.pt`-style
state dicts (protein/fmif/train_fmif.py:704-723, key `model_state_dict`)
-> reed_tpu ProteinMPNNFMIF params.

Architecture source: protein/fmif/model_utils.py:286-653 (build_mlp,
EncLayer, DecLayer, PositionWiseFeedForward, PositionalEncodings,
ProteinFeatures, ProteinMPNNFMIF). Torch Linear weight [out, in] -> flax
kernel transpose; LayerNorm weight/bias -> scale/bias; W_s Embedding table
carried as-is; the derived tied `W_s_ft` (model_utils.py:553-554) is
skipped.
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


def _ffn(sd: Dict, key: str) -> Dict:
    return {"Dense_0": _dense(sd, f"{key}.W_in"),
            "Dense_1": _dense(sd, f"{key}.W_out")}


def _projector(sd: Dict, key: str) -> Dict:
    # build_mlp = Sequential(Linear, SiLU, Linear) (model_utils.py:286-293)
    return {"Dense_0": _dense(sd, f"{key}.0"),
            "Dense_1": _dense(sd, f"{key}.2")}


def convert_torch_fmif(sd: Dict) -> Dict:
    """ProteinMPNNFMIF state dict -> flax params for
    reed_tpu.models.pmpnn.ProteinMPNNFMIF."""
    sd = {(k[len("module."):] if k.startswith("module.") else k): v
          for k, v in sd.items()}

    params: Dict = {
        "features": {
            "PositionalEncodings_0": {
                "Dense_0": _dense(sd, "features.embeddings.linear")},
            "edge_embedding": _dense(sd, "features.edge_embedding",
                                     bias=False),
            "norm_edges": _ln(sd, "features.norm_edges"),
        },
        "node_embeds": _np(sd["node_embeds"]),
        "W_e": _dense(sd, "W_e"),
        "W_s_embedding": _np(sd["W_s.weight"]),
        "W_out": _dense(sd, "W_out"),
        "projectors_single": _projector(sd, "projectors_single"),
        "projectors_pair": _projector(sd, "projectors_pair"),
        "projectors_structure": _projector(sd, "projectors_structure"),
    }

    n_enc = 1 + max(int(k.split(".")[1]) for k in sd
                    if k.startswith("encoder_layers."))
    for i in range(n_enc):
        e = f"encoder_layers.{i}"
        params[f"encoder_layers_{i}"] = {
            **{w: _dense(sd, f"{e}.{w}")
               for w in ("W1", "W2", "W3", "W11", "W12", "W13")},
            **{n: _ln(sd, f"{e}.{n}") for n in ("norm1", "norm2", "norm3")},
            "dense": _ffn(sd, f"{e}.dense"),
        }

    n_dec = 1 + max(int(k.split(".")[1]) for k in sd
                    if k.startswith("decoder_layers."))
    for i in range(n_dec):
        d = f"decoder_layers.{i}"
        params[f"decoder_layers_{i}"] = {
            **{w: _dense(sd, f"{d}.{w}") for w in ("W1", "W2", "W3")},
            **{n: _ln(sd, f"{d}.{n}") for n in ("norm1", "norm2")},
            "dense": _ffn(sd, f"{d}.dense"),
            # W_edge = Sequential(LayerNorm, Linear, GELU, Linear)
            "W_edge_norm": _ln(sd, f"{d}.W_edge.0"),
            "W_edge_fc1": _dense(sd, f"{d}.W_edge.1"),
            "W_edge_fc2": _dense(sd, f"{d}.W_edge.3"),
            "norm_edge": _ln(sd, f"{d}.norm_edge"),
        }

    if "cls_embedder.weight" in sd:
        params["cls_embedder"] = {"embedding": _np(sd["cls_embedder.weight"])}
        for i in range(n_enc):
            params[f"cls_layers_enc_{i}"] = _dense(sd, f"cls_layers_enc.{i}")
        for i in range(n_dec):
            params[f"cls_layers_dec_{i}"] = _dense(sd, f"cls_layers_dec.{i}")
    return params


def load_torch_fmif_checkpoint(path: str) -> Dict:
    """Read a reference fmif checkpoint (.pt with `model_state_dict`, or a
    bare state dict) and convert."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    sd = ckpt["model_state_dict"] if "model_state_dict" in ckpt else ckpt
    return convert_torch_fmif(sd)

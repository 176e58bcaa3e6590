"""Torch RDM checkpoint conversion: reference LatentDiffusion checkpoints
(GeoRCG RDM over encoder representations) -> reed_tpu SimpleMLP params.

The reference RDM is an ldm-derived LatentDiffusion whose denoiser is the
SimpleMLP (molecule/models/rdm/modules/diffusionmodules/latentmlp.py:10-160,
keys `model.diffusion_model.*` / EMA copy `model_ema.*`) and whose
atom-count conditioner is a ClassEmbedder
(rdm/modules/encoders/modules.py:12-20, keys `cond_stage_model.embedding.*`).
reed_tpu folds the class embedder into SimpleMLP (`class_embedder`);
conversion places the torch table into its rows (zero-padding the extra
CFG/fake row when the reed table is one longer).

Torch Linear weight [out, in] -> flax kernel transpose; LayerNorm eps
matches (ResBlock norms 1e-5, final out norm 1e-6); timestep embeddings
are identical cos|sin halves on both sides (rdm/.../util.py:151-167 vs
reed_tpu.nn.layers.timestep_embedding).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np


def _np(t):
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def _dense(sd: Dict, key: str) -> Dict:
    return {"kernel": _np(sd[f"{key}.weight"]).T,
            "bias": _np(sd[f"{key}.bias"])}


def _ln(sd: Dict, key: str) -> Dict:
    return {"scale": _np(sd[f"{key}.weight"]), "bias": _np(sd[f"{key}.bias"])}


def convert_torch_rdm(sd: Dict, num_classes: Optional[int] = None) -> Dict:
    """LatentDiffusion state dict -> flax SimpleMLP params.

    num_classes: reed_tpu class-embedder row count (cfg.num_classes + 1);
    None keeps the torch table's row count."""
    sd = {(k[len("module."):] if k.startswith("module.") else k): v
          for k, v in sd.items()}
    prefix = "model.diffusion_model."
    if not any(k.startswith(prefix) for k in sd):
        prefix = ""  # bare SimpleMLP state dict

    def p(key):
        return f"{prefix}{key}"

    params: Dict = {
        "time_fc1": _dense(sd, p("time_embed.0")),
        "time_fc2": _dense(sd, p("time_embed.2")),
        "input_proj": _dense(sd, p("input_proj")),
        "out_norm": _ln(sd, p("out.0")),
        "out_fc": _dense(sd, p("out.2")),
    }
    i = 0
    while f"{prefix}res_blocks.{i}.in_layers.0.weight" in sd:
        r = p(f"res_blocks.{i}")
        block = {
            "in_norm": _ln(sd, f"{r}.in_layers.0"),
            "in_fc": _dense(sd, f"{r}.in_layers.2"),
            "emb_fc": _dense(sd, f"{r}.emb_layers.1"),
            "out_norm": _ln(sd, f"{r}.out_layers.0"),
            "out_fc": _dense(sd, f"{r}.out_layers.3"),
        }
        if f"{r}.context_layers.1.weight" in sd:
            block["context_fc"] = _dense(sd, f"{r}.context_layers.1")
        params[f"res_{i}"] = block
        i += 1

    emb_key = "cond_stage_model.embedding.weight"
    if emb_key in sd:
        table = _np(sd[emb_key])
        if num_classes is not None and num_classes != table.shape[0]:
            out = np.zeros((num_classes, table.shape[1]), table.dtype)
            out[:min(num_classes, table.shape[0])] = \
                table[:min(num_classes, table.shape[0])]
            table = out
        params["class_embedder"] = {"embedding": table}
    return params


def load_torch_rdm_checkpoint(path: str,
                              num_classes: Optional[int] = None) -> Dict:
    """Read a reference RDM .ckpt/.pt (torch pickle; `state_dict` key or
    bare) and convert."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    sd = ckpt["state_dict"] if isinstance(ckpt, dict) \
        and "state_dict" in ckpt else ckpt
    return convert_torch_rdm(sd, num_classes=num_classes)

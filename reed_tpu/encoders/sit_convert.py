"""Convert reference (PyTorch) SiT checkpoints into reed_tpu SiT params.

Covers the reference checkpoint dict layout {model|ema: state_dict}
(image/train.py:418-429) including the legacy-key remap the reference does
in image/utils.py:207-219, so FID parity runs can start from
reference-trained weights. Handles the NCHW->NHWC patchify difference: the
reference PatchEmbed is a conv [D, C, p, p] over NCHW; ours is a Dense over
row-major [p, p, C] patches.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def convert_torch_sit(state_dict: Dict[str, np.ndarray], depth: int,
                      num_projectors: int = 0) -> Dict:
    """torch SiT state dict (numpy values) -> flax param tree for
    reed_tpu.models.sit.SiT."""
    sd = {}
    for k, v in state_dict.items():
        k = k.replace("module.", "")  # DDP prefix (image/utils.py:214)
        sd[k] = np.asarray(v)

    def dense(prefix, transpose=True):
        out = {"kernel": sd[f"{prefix}.weight"].T if transpose
               else sd[f"{prefix}.weight"]}
        if f"{prefix}.bias" in sd:
            out["bias"] = sd[f"{prefix}.bias"]
        return out

    params: Dict = {}
    # patch embed: conv [D, C, p, p] -> dense [(p*p*C), D] with row-major
    # (h-patch, w-patch, channel) ordering to match nn.layers.patchify
    w = sd["x_embedder.proj.weight"]
    d_model, c, p, _ = w.shape
    kernel = w.transpose(2, 3, 1, 0).reshape(p * p * c, d_model)
    params["x_embedder"] = {"kernel": kernel,
                            "bias": sd["x_embedder.proj.bias"]}

    params["t_embedder"] = {"Dense_0": dense("t_embedder.mlp.0"),
                            "Dense_1": dense("t_embedder.mlp.2")}
    params["y_embedder"] = {"Embed_0": {
        "embedding": sd["y_embedder.embedding_table.weight"]}}

    for i in range(depth):
        pfx = f"blocks.{i}"
        params[f"blocks_{i}"] = {
            "adaLN_modulation": dense(f"{pfx}.adaLN_modulation.1"),
            "attn": {"qkv": dense(f"{pfx}.attn.qkv"),
                     "proj": dense(f"{pfx}.attn.proj")},
            "mlp": {"fc1": dense(f"{pfx}.mlp.fc1"),
                    "fc2": dense(f"{pfx}.mlp.fc2")},
        }

    for j in range(num_projectors):
        pfx = f"projectors.{j}"
        params[f"projectors_{j}"] = {
            "Dense_0": dense(f"{pfx}.0"),
            "Dense_1": dense(f"{pfx}.2"),
            "Dense_2": dense(f"{pfx}.4"),
        }

    params["final_layer"] = {
        "adaLN_modulation": dense("final_layer.adaLN_modulation.1"),
        "linear": dense("final_layer.linear"),
    }
    return {"params": params}


def final_layer_output_permutation(patch_size: int, channels: int
                                   ) -> np.ndarray:
    """The reference unpatchify reshapes to (p, p, C) per token exactly like
    ours (image/models/sit.py:320-333), so the final linear needs no output
    permutation; provided for checkpoints with other layouts."""
    return np.arange(patch_size * patch_size * channels)


def load_reference_checkpoint(path: str, model_key: str = "ema",
                              depth: int = 28, num_projectors: int = 0):
    """Load a reference .pt checkpoint and convert (requires torch)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt[model_key] if model_key in ckpt else ckpt
    sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
    return convert_torch_sit(sd, depth, num_projectors)

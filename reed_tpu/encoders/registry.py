"""Frozen encoder registry: name -> (model, preprocessing, z_dim).

Clean-room rebuild of image/utils.py:55-164 load_encoders and the per-
encoder pixel preprocessing in image/train.py:53-75: 'enc_type' strings
like 'dinov2-vit-b' or comma-separated lists, ImageNet/CLIP normalization,
resolution handling, and the text-embedding dimension registry
(TEXT_Z_DIM_DICT, image/train.py:40-43).

Zero-egress: checkpoints are expected on local disk (REED_TPU_ENCODER_DIR);
the precompute-to-disk feature path (reed_tpu.data.image features_subdirs)
is the default training route.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Callable, Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from reed_tpu.encoders.vit import ViT, ViTConfig, convert_torch_vit

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)

# text-embedding dims per captioning model/layer
# (reference: image/train.py:40-43)
TEXT_Z_DIM_DICT = {"qwen2b": 1536, "qwen7b": 3584, "qwen2.5-3b": 2048}

# architecture table per encoder family and size
_VIT_SIZES = {
    "s": dict(hidden_size=384, depth=12, num_heads=6),
    "b": dict(hidden_size=768, depth=12, num_heads=12),
    "l": dict(hidden_size=1024, depth=24, num_heads=16),
}
_FAMILIES = {
    # family: (patch, image_size, layerscale, resize_to_224, mean, std)
    "dinov2": (14, 224, True, True, IMAGENET_MEAN, IMAGENET_STD),
    "dinov1": (16, 224, False, False, IMAGENET_MEAN, IMAGENET_STD),
    "mocov3": (16, 224, False, False, IMAGENET_MEAN, IMAGENET_STD),
    "mae": (16, 224, False, False, IMAGENET_MEAN, IMAGENET_STD),
    "jepa": (14, 224, False, True, IMAGENET_MEAN, IMAGENET_STD),
    "clip": (14, 224, False, True, CLIP_MEAN, CLIP_STD),
}


@dataclass
class FrozenEncoder:
    name: str
    family: str
    model: ViT
    params: Optional[dict]
    z_dim: int
    preprocess: Callable[[np.ndarray], np.ndarray]

    def __call__(self, pixels):
        """pixels: preprocessed [B,H,W,3] -> per-patch features [B,T,D]."""
        if self.params is None:
            raise RuntimeError(
                f"no weights loaded for {self.name}; set "
                f"REED_TPU_ENCODER_DIR or use precomputed features")
        return self.model.apply(self.params, pixels, output="patch")

    def encode(self, raw_pixels: np.ndarray):
        """Raw uint8 [B,H,W,3] -> features, through a jitted forward with
        the frozen params threaded as a jit ARGUMENT (closing over them
        would bake every weight into the lowering as MLIR constants —
        pathological through a remote-compile transport). This is the
        in-loop frozen-encoder path (reference: image/train.py:348-360)."""
        if self.params is None:
            raise RuntimeError(f"no weights loaded for {self.name}")
        if self._jit_fwd is None:
            import jax

            object.__setattr__(self, "_jit_fwd", jax.jit(
                lambda p, x: self.model.apply(p, x, output="patch")))
        return self._jit_fwd(self.params, self.preprocess(raw_pixels))

    _jit_fwd: Optional[Callable] = None


def encode_features(encoders: List["FrozenEncoder"],
                    raw_pixels: np.ndarray) -> List:
    """Per-batch frozen-encoder features for the REED alignment targets —
    the in-loop alternative to precomputed features_subdirs."""
    return [enc.encode(raw_pixels) for enc in encoders]


def _make_preprocess(mean, std, resize_to, resolution):
    def preprocess(x: np.ndarray) -> np.ndarray:
        """x: uint8 [B,H,W,3] raw pixels -> normalized float32
        (reference: image/train.py:53-75 preprocess_raw_image)."""
        x = x.astype(np.float32) / 255.0
        if resize_to is not None:
            import jax

            target = resize_to * (resolution // 256)
            x = np.asarray(jax.image.resize(
                jnp.asarray(x), (x.shape[0], target, target, 3), "bicubic"))
        return (x - mean) / std

    return preprocess


def load_encoders(enc_type: str, resolution: int = 256,
                  encoder_dir: Optional[str] = None
                  ) -> Tuple[List[FrozenEncoder], List[str], List[str]]:
    """'dinov2-vit-b,clip-vit-l' -> (encoders, encoder_types, architectures)
    (reference: image/utils.py:55-164). Weights load from
    {encoder_dir}/{family}-vit-{size}.npz if present (converted once from
    the torch checkpoints with convert_torch_vit)."""
    encoder_dir = encoder_dir or os.environ.get("REED_TPU_ENCODER_DIR")
    assert (resolution == 256) or (resolution == 512)

    encoders, enc_types, architectures = [], [], []
    for one in enc_type.split(","):
        family, arch, size = one.strip().split("-")
        if family not in _FAMILIES:
            raise NotImplementedError(f"encoder family {family!r}")
        patch, img, layerscale, resize, mean, std = _FAMILIES[family]
        cfg = ViTConfig(image_size=img, patch_size=patch,
                        layerscale=layerscale, **_VIT_SIZES[size])
        model = ViT(cfg)
        params = None
        if encoder_dir:
            path = os.path.join(encoder_dir, f"{one.strip()}.npz")
            if os.path.exists(path):
                params = load_npz_params(path)
        encoders.append(FrozenEncoder(
            name=one.strip(), family=family, model=model, params=params,
            z_dim=cfg.hidden_size,
            preprocess=_make_preprocess(mean, std,
                                        img if resize else None, resolution)))
        enc_types.append(family)
        architectures.append(arch)
    return encoders, enc_types, architectures


# -- npz (de)serialization of param trees ----------------------------------

def save_npz_params(path: str, variables: dict):
    flat = {}

    def walk(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(f"{prefix}/{k}" if prefix else k, v)
        else:
            flat[prefix] = np.asarray(node)

    walk("", variables)
    np.savez(path, **flat)


def load_npz_params(path: str) -> dict:
    flat = np.load(path)
    tree: dict = {}
    for key in flat.files:
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(flat[key])
    return tree


def convert_torch_checkpoint(torch_ckpt_path: str, out_npz: str,
                             family: str, size: str):
    """One-time conversion: torch ViT state dict -> npz param tree."""
    import torch

    sd = torch.load(torch_ckpt_path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
    patch, img, layerscale, _, _, _ = _FAMILIES[family]
    cfg = ViTConfig(image_size=img, patch_size=patch, layerscale=layerscale,
                    **_VIT_SIZES[size])
    variables = convert_torch_vit(sd, cfg)
    save_npz_params(out_npz, variables)

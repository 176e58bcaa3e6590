"""Frozen vision-transformer encoders in JAX (DINOv2/MAE/MoCo-v3/CLIP/I-JEPA
style), with torch state-dict conversion.

Clean-room equivalent of the reference's vendored encoder zoo
(image/models/{mocov3_vit,mae_vit,jepa,clip_vit}.py + torch.hub DINOv2,
loaded via image/utils.py:55-164): one configurable pre-norm ViT covers all
five encoder families — cls token, optional register tokens, learnable pos
embeds with bicubic resampling (image/utils.py:99-102), LayerScale (DINOv2),
and a selectable forward head (patch tokens / cls / pooled).

Weights are converted once from torch checkpoints (convert_torch_vit);
features can also be precomputed to disk and read by the data pipeline
(the route the reference already uses for text embeddings).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any


@dataclass(frozen=True)
class ViTConfig:
    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    num_register_tokens: int = 0
    layerscale: bool = True          # DINOv2 uses LayerScale
    qkv_bias: bool = True
    ln_eps: float = 1e-6


class ViTBlock(nn.Module):
    cfg: ViTConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        d = cfg.hidden_size
        h = nn.LayerNorm(epsilon=cfg.ln_eps, dtype=self.dtype, name="norm1")(x)
        qkv = nn.Dense(3 * d, use_bias=cfg.qkv_bias, dtype=self.dtype,
                       name="qkv")(h)
        b, t, _ = h.shape
        hd = d // cfg.num_heads
        qkv = qkv.reshape(b, t, 3, cfg.num_heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(hd)
        attn = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, t, d)
        out = nn.Dense(d, dtype=self.dtype, name="attn_proj")(out)
        if cfg.layerscale:
            gamma1 = self.param("ls1_gamma",
                                nn.initializers.constant(1e-5), (d,))
            out = out * gamma1.astype(self.dtype)
        x = x + out

        h = nn.LayerNorm(epsilon=cfg.ln_eps, dtype=self.dtype, name="norm2")(x)
        h = nn.Dense(int(d * cfg.mlp_ratio), dtype=self.dtype, name="fc1")(h)
        h = nn.gelu(h)
        h = nn.Dense(d, dtype=self.dtype, name="fc2")(h)
        if cfg.layerscale:
            gamma2 = self.param("ls2_gamma",
                                nn.initializers.constant(1e-5), (d,))
            h = h * gamma2.astype(self.dtype)
        return x + h


class ViT(nn.Module):
    cfg: ViTConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, output: str = "patch"):
        """x: [B, H, W, 3] preprocessed pixels. output: 'patch' (per-patch
        tokens, the REPA alignment target), 'cls', or 'pooled'."""
        cfg = self.cfg
        b, h, w, _ = x.shape
        p = cfg.patch_size
        gh, gw = h // p, w // p
        x = x.reshape(b, gh, p, gw, p, 3)
        x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(b, gh * gw,
                                                         p * p * 3)
        x = nn.Dense(cfg.hidden_size, dtype=self.dtype,
                     name="patch_embed")(x.astype(self.dtype))

        cls_token = self.param("cls_token", nn.initializers.zeros,
                               (1, 1, cfg.hidden_size))
        pos_embed = self.param(
            "pos_embed", nn.initializers.normal(0.02),
            (1, 1 + (cfg.image_size // p) ** 2, cfg.hidden_size))
        pos = resample_pos_embed(pos_embed, gh, gw)
        tokens = [jnp.broadcast_to(cls_token.astype(self.dtype),
                                   (b, 1, cfg.hidden_size)), x]
        x = jnp.concatenate(tokens, axis=1) + pos.astype(self.dtype)

        if cfg.num_register_tokens:
            reg = self.param("register_tokens", nn.initializers.zeros,
                             (1, cfg.num_register_tokens, cfg.hidden_size))
            x = jnp.concatenate(
                [x[:, :1],
                 jnp.broadcast_to(reg.astype(self.dtype),
                                  (b, cfg.num_register_tokens,
                                   cfg.hidden_size)),
                 x[:, 1:]], axis=1)

        for i in range(cfg.depth):
            x = ViTBlock(cfg, dtype=self.dtype, name=f"blocks_{i}")(x)
        x = nn.LayerNorm(epsilon=cfg.ln_eps, dtype=self.dtype, name="norm")(x)

        n_prefix = 1 + cfg.num_register_tokens
        if output == "patch":
            return x[:, n_prefix:]
        if output == "cls":
            return x[:, 0]
        if output == "pooled":
            return x[:, n_prefix:].mean(axis=1)
        raise ValueError(output)


def resample_pos_embed(pos_embed, gh: int, gw: int):
    """Bicubic pos-embed resampling for non-native resolutions
    (reference: image/utils.py:99-102)."""
    n = pos_embed.shape[1] - 1
    side = int(np.sqrt(n))
    if side * side == gh * gw and side == gh:
        return pos_embed
    cls_pos, grid_pos = pos_embed[:, :1], pos_embed[:, 1:]
    grid = grid_pos.reshape(1, side, side, -1)
    grid = jax.image.resize(grid, (1, gh, gw, grid.shape[-1]), "bicubic")
    return jnp.concatenate([cls_pos, grid.reshape(1, gh * gw, -1)], axis=1)


# -- torch checkpoint conversion -------------------------------------------

def convert_torch_vit(state_dict: Dict[str, "np.ndarray"],
                      cfg: ViTConfig) -> Dict:
    """Convert a timm/DINOv2-style torch ViT state dict into this module's
    param tree. Accepts numpy-valued dicts (call .numpy() upstream)."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params: Dict[str, Any] = {}

    def dense(prefix_t, transpose=True):
        w = sd[f"{prefix_t}.weight"]
        out = {"kernel": w.T if transpose else w}
        if f"{prefix_t}.bias" in sd:
            out["bias"] = sd[f"{prefix_t}.bias"]
        return out

    # patch embed: conv [D, 3, p, p] -> dense [p*p*3, D]
    w = sd["patch_embed.proj.weight"]
    d = w.shape[0]
    kernel = w.transpose(2, 3, 1, 0).reshape(-1, d)
    params["patch_embed"] = {"kernel": kernel,
                             "bias": sd["patch_embed.proj.bias"]}
    params["cls_token"] = sd["cls_token"]
    params["pos_embed"] = sd["pos_embed"]
    if "register_tokens" in sd:
        params["register_tokens"] = sd["register_tokens"]

    for i in range(cfg.depth):
        p = f"blocks.{i}"
        blk = {
            "norm1": {"scale": sd[f"{p}.norm1.weight"],
                      "bias": sd[f"{p}.norm1.bias"]},
            "qkv": dense(f"{p}.attn.qkv"),
            "attn_proj": dense(f"{p}.attn.proj"),
            "norm2": {"scale": sd[f"{p}.norm2.weight"],
                      "bias": sd[f"{p}.norm2.bias"]},
            "fc1": dense(f"{p}.mlp.fc1"),
            "fc2": dense(f"{p}.mlp.fc2"),
        }
        if cfg.layerscale:
            blk["ls1_gamma"] = sd[f"{p}.ls1.gamma"]
            blk["ls2_gamma"] = sd[f"{p}.ls2.gamma"]
        params[f"blocks_{i}"] = blk
    params["norm"] = {"scale": sd["norm.weight"], "bias": sd["norm.bias"]}
    return {"params": params}

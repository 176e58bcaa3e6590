"""Stable-Diffusion VAE (AutoencoderKL) in JAX: encoder to 8-channel
moments, decoder from 4-channel latents.

Clean-room equivalent of the diffusers AutoencoderKL the reference uses for
latent caching and FID decoding (image/preprocessing/encoders.py:52
StabilityVAEEncoder, image/train.py:221, image/generate.py:90):
GroupNorm(32)+SiLU resnet blocks, single mid self-attention, 4 down/up
stages at channel multipliers (1,2,4,4) on base 128. Weight conversion from
a diffusers torch checkpoint included (one-time, host-side).

Conventions match the reference: pixels in [-1, 1]; encode() returns
moments [B,H/8,W/8,8] (mean, logvar); sample with mean + std * eps, scale by
0.18215 downstream (reed_tpu.data.image.sample_posterior).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any


def _gn(name, dtype):
    """GroupNorm(32) with group count capped by channel count (SD uses
    channels >= 128; tiny test configs need fewer groups)."""
    class _GN(nn.Module):
        dtype_: Any = dtype

        @nn.compact
        def __call__(self, x):
            return nn.GroupNorm(min(32, x.shape[-1]), epsilon=1e-6,
                                dtype=self.dtype_)(x)

    return _GN(name=name)


class ResnetBlock(nn.Module):
    out_ch: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        h = _gn("norm1", self.dtype)(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(h)
        h = _gn("norm2", self.dtype)(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(h)
        if in_ch != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), dtype=self.dtype,
                        name="nin_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        y = _gn("norm", self.dtype)(x)
        q = nn.Conv(c, (1, 1), dtype=self.dtype, name="q")(y).reshape(b, h * w, c)
        k = nn.Conv(c, (1, 1), dtype=self.dtype, name="k")(y).reshape(b, h * w, c)
        v = nn.Conv(c, (1, 1), dtype=self.dtype, name="v")(y).reshape(b, h * w, c)
        attn = jax.nn.softmax(
            jnp.einsum("bqc,bkc->bqk", q, k).astype(jnp.float32)
            / np.sqrt(c), -1).astype(self.dtype)
        o = jnp.einsum("bqk,bkc->bqc", attn, v).reshape(b, h, w, c)
        return x + nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(o)


class VAEEncoder(nn.Module):
    base_ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res: int = 2
    z_ch: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.base_ch, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_in")(x.astype(self.dtype))
        for i, mult in enumerate(self.ch_mult):
            for j in range(self.num_res):
                h = ResnetBlock(self.base_ch * mult, dtype=self.dtype,
                                name=f"down_{i}_block_{j}")(h)
            if i < len(self.ch_mult) - 1:
                # asymmetric pad then stride-2 conv (SD convention)
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = nn.Conv(h.shape[-1], (3, 3), strides=2, padding="VALID",
                            dtype=self.dtype, name=f"down_{i}_downsample")(h)
        h = ResnetBlock(h.shape[-1], dtype=self.dtype, name="mid_block_1")(h)
        h = AttnBlock(dtype=self.dtype, name="mid_attn_1")(h)
        h = ResnetBlock(h.shape[-1], dtype=self.dtype, name="mid_block_2")(h)
        h = _gn("norm_out", self.dtype)(h)
        h = nn.silu(h)
        h = nn.Conv(2 * self.z_ch, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_out")(h)
        moments = nn.Conv(2 * self.z_ch, (1, 1), dtype=self.dtype,
                          name="quant_conv")(h)
        return moments  # [B, H/8, W/8, 8] = (mean, logvar)


class VAEDecoder(nn.Module):
    base_ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res: int = 3
    out_ch: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        z = nn.Conv(z.shape[-1], (1, 1), dtype=self.dtype,
                    name="post_quant_conv")(z.astype(self.dtype))
        h = nn.Conv(self.base_ch * self.ch_mult[-1], (3, 3), padding=1,
                    dtype=self.dtype, name="conv_in")(z)
        h = ResnetBlock(h.shape[-1], dtype=self.dtype, name="mid_block_1")(h)
        h = AttnBlock(dtype=self.dtype, name="mid_attn_1")(h)
        h = ResnetBlock(h.shape[-1], dtype=self.dtype, name="mid_block_2")(h)
        for i, mult in enumerate(reversed(self.ch_mult)):
            for j in range(self.num_res):
                h = ResnetBlock(self.base_ch * mult, dtype=self.dtype,
                                name=f"up_{i}_block_{j}")(h)
            if i < len(self.ch_mult) - 1:
                b, hh, ww, c = h.shape
                h = jax.image.resize(h, (b, hh * 2, ww * 2, c), "nearest")
                h = nn.Conv(c, (3, 3), padding=1, dtype=self.dtype,
                            name=f"up_{i}_upsample")(h)
        h = _gn("norm_out", self.dtype)(h)
        h = nn.silu(h)
        return nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype,
                       name="conv_out")(h)


def sample_latents(rng, moments, scale: float = 0.18215):
    """moments [B,H,W,8] -> scaled latent sample [B,H,W,4]."""
    mean, logvar = jnp.split(moments, 2, axis=-1)
    std = jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0))
    return (mean + std * jax.random.normal(rng, mean.shape)) * scale


def decode_latents(decoder: VAEDecoder, variables, latents,
                   scale: float = 0.18215):
    """Scaled latents [B,H,W,4] -> uint8 images [B,8H,8W,3]."""
    x = decoder.apply(variables, latents / scale)
    x = jnp.clip((x + 1.0) / 2.0, 0.0, 1.0)
    return (x * 255.0 + 0.5).astype(jnp.uint8)


# -- torch (diffusers) checkpoint conversion --------------------------------

def convert_diffusers_vae(state_dict, part: str = "decoder"):
    """Map a diffusers AutoencoderKL state dict (numpy values) onto the
    encoder/decoder param trees above. Conv kernels: [O,I,kh,kw] ->
    [kh,kw,I,O]."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    def conv(prefix):
        return {"kernel": sd[f"{prefix}.weight"].transpose(2, 3, 1, 0),
                "bias": sd[f"{prefix}.bias"]}

    def gn(prefix):
        # _gn wraps nn.GroupNorm, so params live under GroupNorm_0
        return {"GroupNorm_0": {"scale": sd[f"{prefix}.weight"],
                                "bias": sd[f"{prefix}.bias"]}}

    def resnet(prefix):
        out = {"norm1": gn(f"{prefix}.norm1"), "conv1": conv(f"{prefix}.conv1"),
               "norm2": gn(f"{prefix}.norm2"), "conv2": conv(f"{prefix}.conv2")}
        if f"{prefix}.conv_shortcut.weight" in sd:
            out["nin_shortcut"] = conv(f"{prefix}.conv_shortcut")
        return out

    def attn(prefix):
        def as_conv(p):
            w = sd[f"{p}.weight"]
            if w.ndim == 2:  # diffusers uses Linear for attention projections
                w = w[:, :, None, None]
            return {"kernel": w.transpose(2, 3, 1, 0), "bias": sd[f"{p}.bias"]}

        return {"norm": gn(f"{prefix}.group_norm"),
                "q": as_conv(f"{prefix}.to_q"),
                "k": as_conv(f"{prefix}.to_k"),
                "v": as_conv(f"{prefix}.to_v"),
                "proj_out": as_conv(f"{prefix}.to_out.0")}

    params = {}
    if part == "decoder":
        p = "decoder"
        params["post_quant_conv"] = conv("post_quant_conv")
        params["conv_in"] = conv(f"{p}.conv_in")
        params["mid_block_1"] = resnet(f"{p}.mid_block.resnets.0")
        params["mid_attn_1"] = attn(f"{p}.mid_block.attentions.0")
        params["mid_block_2"] = resnet(f"{p}.mid_block.resnets.1")
        for i in range(4):
            for j in range(3):
                params[f"up_{i}_block_{j}"] = resnet(
                    f"{p}.up_blocks.{i}.resnets.{j}")
            if i < 3:
                params[f"up_{i}_upsample"] = conv(
                    f"{p}.up_blocks.{i}.upsamplers.0.conv")
        params["norm_out"] = gn(f"{p}.conv_norm_out")
        params["conv_out"] = conv(f"{p}.conv_out")
    else:
        p = "encoder"
        params["conv_in"] = conv(f"{p}.conv_in")
        for i in range(4):
            for j in range(2):
                params[f"down_{i}_block_{j}"] = resnet(
                    f"{p}.down_blocks.{i}.resnets.{j}")
            if i < 3:
                params[f"down_{i}_downsample"] = conv(
                    f"{p}.down_blocks.{i}.downsamplers.0.conv")
        params["mid_block_1"] = resnet(f"{p}.mid_block.resnets.0")
        params["mid_attn_1"] = attn(f"{p}.mid_block.attentions.0")
        params["mid_block_2"] = resnet(f"{p}.mid_block.resnets.1")
        params["norm_out"] = gn(f"{p}.conv_norm_out")
        params["conv_out"] = conv(f"{p}.conv_out")
        params["quant_conv"] = conv("quant_conv")
    return {"params": params}

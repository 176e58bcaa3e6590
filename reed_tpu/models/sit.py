"""SiT: Scalable Interpolant Transformer with REED representation alignment.

Clean-room JAX/flax rebuild of the reference backbone
(image/models/sit.py:161-311): patchify + fixed 2D sin-cos pos-embed,
adaLN-Zero transformer blocks conditioned on timestep+class embeddings,
projector MLPs capturing intermediate activations at `encoder_depth`
(per-token, for image encoders) and `encoder_depth_text` (mean-pooled, for
text embeddings), and a zero-initialized final layer.

Returns NHWC velocity prediction plus the list of projected activations
(`zs_tilde`) when `train=True`, matching the reference model contract
`model(x, t, y) -> (prediction, zs)` (SURVEY.md §1 L4).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from reed_tpu.nn.layers import (
    Attention,
    LabelEmbedder,
    Mlp,
    TimestepEmbedder,
    get_2d_sincos_pos_embed,
    modulate,
    patchify,
    unpatchify,
    xavier_uniform,
    zeros_init,
)

Dtype = Any


class SiTBlock(nn.Module):
    """adaLN-Zero transformer block (reference: image/models/sit.py:107-138)."""

    num_heads: int
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"
    exact_gelu: bool = False

    @nn.compact
    def __call__(self, x, c):
        d = x.shape[-1]
        mod = nn.Dense(6 * d, kernel_init=zeros_init, bias_init=zeros_init,
                       dtype=self.dtype, name="adaLN_modulation")(nn.silu(c))
        (shift_msa, scale_msa, gate_msa,
         shift_mlp, scale_mlp, gate_mlp) = jnp.split(mod, 6, axis=-1)

        h = nn.LayerNorm(use_bias=False, use_scale=False, dtype=self.dtype,
                         name="norm1")(x)
        h = modulate(h, shift_msa, scale_msa)
        h = Attention(self.num_heads, dtype=self.dtype, attn_impl=self.attn_impl,
                      name="attn")(h)
        x = x + gate_msa[:, None, :] * h

        h = nn.LayerNorm(use_bias=False, use_scale=False, dtype=self.dtype,
                         name="norm2")(x)
        h = modulate(h, shift_mlp, scale_mlp)
        from reed_tpu.nn.layers import gelu_exact
        import flax.linen as fnn

        act = gelu_exact if self.exact_gelu else fnn.gelu
        h = Mlp(int(d * self.mlp_ratio), act=act, dtype=self.dtype,
                name="mlp")(h)
        x = x + gate_mlp[:, None, :] * h
        return x


class FinalLayer(nn.Module):
    """Zero-init decoding layer (reference: image/models/sit.py:140-158)."""

    patch_size: int
    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, c):
        d = x.shape[-1]
        mod = nn.Dense(2 * d, kernel_init=zeros_init, bias_init=zeros_init,
                       dtype=self.dtype, name="adaLN_modulation")(nn.silu(c))
        shift, scale = jnp.split(mod, 2, axis=-1)
        x = nn.LayerNorm(use_bias=False, use_scale=False, dtype=self.dtype,
                         name="norm_final")(x)
        x = modulate(x, shift, scale)
        x = nn.Dense(self.patch_size ** 2 * self.out_channels,
                     kernel_init=zeros_init, bias_init=zeros_init,
                     dtype=self.dtype, name="linear")(x)
        return x


class SiT(nn.Module):
    input_size: int = 32
    patch_size: int = 2
    in_channels: int = 4
    hidden_size: int = 1152
    depth: int = 28
    num_heads: int = 16
    mlp_ratio: float = 4.0
    class_dropout_prob: float = 0.1
    num_classes: int = 1000
    encoder_depth: int = 8
    encoder_depth_text: Optional[int] = None
    z_dims: Sequence[int] = (768,)
    z_types: Sequence[str] = ("i",)  # 'i' per-token image target, 't' pooled text
    projector_dim: int = 2048
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"
    # False | True (full block remat) | 'dots' (save matmul outputs only —
    # recomputes elementwise/softmax, keeps the MXU results; the usual
    # middle ground between no-remat OOM and full-remat slowdown) | any
    # other attribute name of jax.checkpoint_policies (e.g. 'dots_saveable',
    # 'checkpoint_dots_with_no_batch_dims') — lets the 512px/S=1024 runs
    # hunt for a selective policy the axon remote-compile helper accepts
    remat: Any = False
    exact_gelu: bool = False  # torch parity (erf); tanh approx is faster
    # Optional NamedSharding for [B, S, D] token activations (sequence
    # parallelism over the 'seq' mesh axis — parallel/mesh.token_sharding).
    # Constraints re-anchor after every block; GSPMD inserts the attention
    # all-gathers. None = no constraints (single-chip / no-SP compiles to
    # the identical program).
    token_sharding: Any = None

    @nn.compact
    def __call__(self, x, t, y, train: bool = False, return_zs: Optional[bool] = None):
        """x: [B, H, W, C] NHWC latents; t: [B] in [0,1] (0 = clean); y: [B]
        int labels (num_classes = null/CFG class). Returns (velocity, zs)."""
        if return_zs is None:
            return_zs = train
        b = x.shape[0]
        num_patches_side = self.input_size // self.patch_size

        x = patchify(x.astype(self.dtype), self.patch_size)
        x = nn.Dense(self.hidden_size, dtype=self.dtype, kernel_init=xavier_uniform,
                     name="x_embedder")(x)
        pos = get_2d_sincos_pos_embed(self.hidden_size, num_patches_side)
        x = x + jnp.asarray(pos, self.dtype)[None]
        if self.token_sharding is not None:
            x = jax.lax.with_sharding_constraint(x, self.token_sharding)

        t_emb = TimestepEmbedder(self.hidden_size, dtype=self.dtype,
                                 name="t_embedder")(t)
        y_emb = LabelEmbedder(self.num_classes, self.hidden_size,
                              self.class_dropout_prob, dtype=self.dtype,
                              name="y_embedder")(y, train=train)
        c = t_emb + y_emb

        block_cls = SiTBlock
        if isinstance(self.remat, str):
            policy_name = ("dots_with_no_batch_dims_saveable"
                           if self.remat == "dots" else self.remat)
            block_cls = nn.remat(
                SiTBlock,
                policy=getattr(jax.checkpoint_policies, policy_name))
        elif self.remat:
            block_cls = nn.remat(SiTBlock)

        zs_image, zs_text = None, None
        depth_text = self.encoder_depth_text
        for i in range(self.depth):
            x = block_cls(self.num_heads, self.mlp_ratio, dtype=self.dtype,
                          attn_impl=self.attn_impl,
                          exact_gelu=self.exact_gelu,
                          name=f"blocks_{i}")(x, c)
            if self.token_sharding is not None:
                x = jax.lax.with_sharding_constraint(x, self.token_sharding)
            if return_zs and (i + 1) == self.encoder_depth:
                if depth_text is None or depth_text == self.encoder_depth:
                    zs_image = [
                        self._project(j, x if zt == "i" else x.mean(axis=1))
                        for j, zt in enumerate(self.z_types)
                    ]
                else:
                    zs_image = [
                        self._project(j, x)
                        for j, zt in enumerate(self.z_types) if zt == "i"
                    ]
            if (return_zs and depth_text is not None
                    and depth_text != self.encoder_depth and (i + 1) == depth_text):
                zs_text = [
                    self._project(j, x.mean(axis=1))
                    for j, zt in enumerate(self.z_types) if zt == "t"
                ]

        if return_zs:
            if depth_text is not None and depth_text != self.encoder_depth:
                zs = list(zs_image or []) + list(zs_text or [])
            else:
                zs = zs_image
        else:
            zs = None

        x = FinalLayer(self.patch_size, self.in_channels, dtype=self.dtype,
                       name="final_layer")(x, c)
        x = unpatchify(x.astype(jnp.float32), self.patch_size, self.in_channels)
        return x, zs

    def _project(self, idx: int, h):
        from reed_tpu.nn.layers import ProjectorMLP

        return ProjectorMLP(self.projector_dim, self.z_dims[idx],
                            dtype=self.dtype, name=f"projectors_{idx}")(
            h.astype(jnp.float32))


# Size registry mirroring the reference's 12 configs
# (image/models/sit.py:373-415).
_SIZES = {
    "SiT-XL": dict(depth=28, hidden_size=1152, num_heads=16),
    "SiT-L": dict(depth=24, hidden_size=1024, num_heads=16),
    "SiT-B": dict(depth=12, hidden_size=768, num_heads=12),
    "SiT-S": dict(depth=12, hidden_size=384, num_heads=6),
}


def create_sit(name: str, **kwargs) -> SiT:
    """name: e.g. 'SiT-XL/2' — size × patch size."""
    size, patch = name.rsplit("/", 1)
    cfg = dict(_SIZES[size])
    cfg["patch_size"] = int(patch)
    cfg.update(kwargs)
    return SiT(**cfg)


SiT_models = {
    f"{size}/{p}": (lambda size=size, p=p: dict(_SIZES[size], patch_size=p))
    for size in _SIZES for p in (2, 4, 8)
}

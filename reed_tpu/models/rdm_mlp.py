"""RDM denoiser: residual MLP over flat representation vectors, conditioned
on timestep + atom-count embedding.

Clean-room rebuild of the reference SimpleMLP/ResBlock
(molecule/models/rdm/modules/diffusionmodules/latentmlp.py:10-160) and the
ClassEmbedder node-count conditioner
(qm9_rdm_unconditional.yaml cond_stage_config).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from reed_tpu.nn.layers import timestep_embedding

Dtype = Any


class ResBlock(nn.Module):
    mid_channels: int
    dropout: float = 0.0
    use_context: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb, context=None, deterministic: bool = True):
        c = x.shape[-1]
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="in_norm")(x)
        h = nn.silu(h)
        h = nn.Dense(self.mid_channels, dtype=self.dtype, name="in_fc")(h)
        emb_out = nn.Dense(self.mid_channels, dtype=self.dtype,
                           name="emb_fc")(nn.silu(emb))
        if self.use_context and context is not None:
            ctx_out = nn.Dense(self.mid_channels, dtype=self.dtype,
                               name="context_fc")(nn.silu(context))
            h = h + emb_out + ctx_out
        else:
            h = h + emb_out
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="out_norm")(h)
        h = nn.silu(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Dense(c, dtype=self.dtype, kernel_init=nn.initializers.zeros,
                     bias_init=nn.initializers.zeros, name="out_fc")(h)
        return x + h


class SimpleMLP(nn.Module):
    """x0/eps-prediction network for the representation DDPM."""

    in_channels: int = 256
    time_embed_dim: int = 256
    model_channels: int = 1536
    bottleneck_channels: int = 1536
    out_channels: int = 256
    num_res_blocks: int = 18
    dropout: float = 0.0
    use_context: bool = True
    num_classes: int = 256          # max atom count for the class embedder
    context_channels: int = 256
    class_dropout_prob: float = 0.0  # CFG over node count (optional)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t, n_nodes=None, deterministic: bool = True):
        """x [B, C] rep vectors; t [B] integer timesteps; n_nodes [B] ints."""
        t_emb = timestep_embedding(t, self.model_channels)
        emb = nn.Dense(self.time_embed_dim, dtype=self.dtype,
                       name="time_fc1")(t_emb.astype(self.dtype))
        emb = nn.silu(emb)
        emb = nn.Dense(self.time_embed_dim, dtype=self.dtype,
                       name="time_fc2")(emb)

        context = None
        if self.use_context and n_nodes is not None:
            context = nn.Embed(self.num_classes + 1, self.context_channels,
                               dtype=self.dtype, name="class_embedder")(
                n_nodes.astype(jnp.int32))

        h = nn.Dense(self.model_channels, dtype=self.dtype,
                     name="input_proj")(x.astype(self.dtype))
        for i in range(self.num_res_blocks):
            h = ResBlock(self.bottleneck_channels, self.dropout,
                         self.use_context, dtype=self.dtype,
                         name=f"res_{i}")(h, emb, context,
                                          deterministic=deterministic)
        h = nn.LayerNorm(dtype=self.dtype, name="out_norm")(h)
        h = nn.silu(h)
        out = nn.Dense(self.out_channels, dtype=self.dtype,
                       kernel_init=nn.initializers.zeros,
                       bias_init=nn.initializers.zeros, name="out_fc")(h)
        return out.astype(jnp.float32)

"""ProteinMPNN-FMIF: k-NN message-passing inverse-folding network with
AF3-representation alignment projectors.

Clean-room JAX/flax rebuild of the reference model
(protein/fmif/model_utils.py:296-653): ProteinFeatures (25 pairwise RBF
channels between N/Ca/C/O/virtual-Cb + relative-position embeddings over a
top-k=30 graph), 3 encoder + 3 decoder layers with optional edge updates and
learnable node init (the REED additions), optional class-conditional (CFG)
embeddings, MDLM parameterization, and three projector MLPs emitting aligned
single (h_V at align_depth), pair (h_ES at align_depth) and structure
(encoder-output h_V) representations.

All gathers are static-shape take_along_axis ops; sequence lengths come from
a fixed bucket ladder (SURVEY.md §7.4 item 1) so XLA compiles one program
per bucket.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from reed_tpu.ops.graph import (
    cat_neighbors_nodes,
    gather_edges,
    gather_nodes,
    knn_graph,
    pairwise_dist_gathered,
    rbf,
)

def _gelu(x):
    return jax.nn.gelu(x, approximate=False)


ALPHABET = "ACDEFGHIKLMNPQRSTVWYX"
ALPHABET_WITH_MASK = ALPHABET + "Z"
MASK_TOKEN_INDEX = ALPHABET_WITH_MASK.index("Z")  # 21
NUM_TOKENS = 22
NEG_INF = -1e6

Dtype = Any
xavier_uniform = nn.initializers.xavier_uniform()


class PositionWiseFeedForward(nn.Module):
    num_ff: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        h = nn.Dense(self.num_ff, dtype=self.dtype, kernel_init=xavier_uniform)(x)
        h = _gelu(h)
        return nn.Dense(d, dtype=self.dtype, kernel_init=xavier_uniform)(h)


class PositionalEncodings(nn.Module):
    """Relative-position edge embedding with chain-break indicator
    (reference: protein/fmif/model_utils.py:406-418)."""

    num_embeddings: int
    max_relative_feature: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, offset, mask):
        m = self.max_relative_feature
        d = jnp.clip(offset + m, 0, 2 * m) * mask + (1 - mask) * (2 * m + 1)
        d_onehot = jax.nn.one_hot(d, 2 * m + 2, dtype=self.dtype)
        return nn.Dense(self.num_embeddings, dtype=self.dtype,
                        kernel_init=xavier_uniform)(d_onehot)


class ProteinFeatures(nn.Module):
    """Backbone geometry -> edge features over a masked k-NN graph
    (reference: protein/fmif/model_utils.py:421-517)."""

    edge_features: int
    top_k: int = 30
    num_rbf: int = 16
    num_positional_embeddings: int = 16
    augment_eps: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, residue_idx, chain_labels, train: bool = False):
        # x: [B, L, 4, 3] backbone atoms (N, Ca, C, O)
        if train and self.augment_eps > 0:
            noise = jax.random.normal(self.make_rng("coord_noise"), x.shape)
            x = x + self.augment_eps * noise

        b_vec = x[:, :, 1] - x[:, :, 0]
        c_vec = x[:, :, 2] - x[:, :, 1]
        a_vec = jnp.cross(b_vec, c_vec)
        # virtual C-beta from ideal tetrahedral geometry
        cb = -0.58273431 * a_vec + 0.56802827 * b_vec - 0.54067466 * c_vec + x[:, :, 1]
        n_at, ca, c_at, o_at = x[:, :, 0], x[:, :, 1], x[:, :, 2], x[:, :, 3]

        d_neighbors, e_idx = knn_graph(ca, mask, self.top_k)

        atoms = {"N": n_at, "Ca": ca, "C": c_at, "O": o_at, "Cb": cb}
        # 25 ordered atom pairs (reference order, model_utils.py:479-505)
        pairs = [("Ca", "Ca"), ("N", "N"), ("C", "C"), ("O", "O"), ("Cb", "Cb"),
                 ("Ca", "N"), ("Ca", "C"), ("Ca", "O"), ("Ca", "Cb"), ("N", "C"),
                 ("N", "O"), ("N", "Cb"), ("Cb", "C"), ("Cb", "O"), ("O", "C"),
                 ("N", "Ca"), ("C", "Ca"), ("O", "Ca"), ("Cb", "Ca"), ("C", "N"),
                 ("O", "N"), ("Cb", "N"), ("C", "Cb"), ("O", "Cb"), ("C", "O")]
        rbf_all = [rbf(d_neighbors, self.num_rbf)]
        for a_name, b_name in pairs[1:]:
            d = pairwise_dist_gathered(atoms[a_name], atoms[b_name], e_idx)
            rbf_all.append(rbf(d, self.num_rbf))
        rbf_all = jnp.concatenate(rbf_all, axis=-1)  # [B,L,K,25*num_rbf]

        offset = residue_idx[:, :, None] - residue_idx[:, None, :]
        offset = gather_edges(offset[..., None], e_idx)[..., 0]
        d_chains = (chain_labels[:, :, None] == chain_labels[:, None, :]
                    ).astype(jnp.int32)
        e_chains = gather_edges(d_chains[..., None], e_idx)[..., 0]
        e_pos = PositionalEncodings(self.num_positional_embeddings,
                                    dtype=self.dtype)(offset.astype(jnp.int32),
                                                      e_chains)
        e = jnp.concatenate([e_pos, rbf_all.astype(self.dtype)], axis=-1)
        e = nn.Dense(self.edge_features, use_bias=False, dtype=self.dtype,
                     kernel_init=xavier_uniform, name="edge_embedding")(e)
        e = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_edges")(e)
        return e, e_idx


class EncLayer(nn.Module):
    """Node+edge message-passing encoder layer
    (reference: protein/fmif/model_utils.py:296-341)."""

    dropout: float = 0.1
    scale: float = 30.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, h_v, h_e, e_idx, mask_v=None, mask_attend=None,
                 deterministic: bool = True):
        d = h_v.shape[-1]
        dense = lambda name: nn.Dense(d, dtype=self.dtype,
                                      kernel_init=xavier_uniform, name=name)
        drop = lambda x: nn.Dropout(self.dropout, deterministic=deterministic)(x)

        h_ev = cat_neighbors_nodes(h_v, h_e, e_idx)
        h_v_expand = jnp.broadcast_to(h_v[:, :, None, :],
                                      h_ev.shape[:-1] + (d,))
        h_ev = jnp.concatenate([h_v_expand, h_ev], axis=-1)
        h_message = dense("W3")(_gelu(dense("W2")(_gelu(dense("W1")(h_ev)))))
        if mask_attend is not None:
            h_message = mask_attend[..., None] * h_message
        dh = jnp.sum(h_message, axis=-2) / self.scale
        h_v = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(h_v + drop(dh))

        dh = PositionWiseFeedForward(4 * d, dtype=self.dtype, name="dense")(h_v)
        h_v = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(h_v + drop(dh))
        if mask_v is not None:
            h_v = mask_v[..., None] * h_v

        h_ev = cat_neighbors_nodes(h_v, h_e, e_idx)
        h_v_expand = jnp.broadcast_to(h_v[:, :, None, :],
                                      h_ev.shape[:-1] + (d,))
        h_ev = jnp.concatenate([h_v_expand, h_ev], axis=-1)
        h_message = dense("W13")(_gelu(dense("W12")(_gelu(dense("W11")(h_ev)))))
        h_e = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(h_e + drop(h_message))
        return h_v, h_e


class DecLayer(nn.Module):
    """Decoder layer with REED edge-update head
    (reference: protein/fmif/model_utils.py:344-390)."""

    dropout: float = 0.1
    scale: float = 30.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, h_v, h_e, h_es, mask_v=None, mask_attend=None,
                 deterministic: bool = True):
        d = h_v.shape[-1]
        dense = lambda dim, name: nn.Dense(dim, dtype=self.dtype,
                                           kernel_init=xavier_uniform, name=name)
        drop = lambda x: nn.Dropout(self.dropout, deterministic=deterministic)(x)

        h_v_expand = jnp.broadcast_to(h_v[:, :, None, :],
                                      h_e.shape[:-1] + (d,))
        h_ev = jnp.concatenate([h_v_expand, h_e], axis=-1)
        h_message = dense(d, "W3")(_gelu(dense(d, "W2")(
            _gelu(dense(d, "W1")(h_ev)))))
        if mask_attend is not None:
            h_message = mask_attend[..., None] * h_message

        # edge update: h_ES <- LN(h_ES + MLP([h_message, h_ES]))
        de_in = jnp.concatenate([h_message, h_es], axis=-1)
        de = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="W_edge_norm")(de_in)
        de = dense(3 * d, "W_edge_fc1")(de)
        de = _gelu(de)
        de = dense(2 * d, "W_edge_fc2")(de)
        h_es_new = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_edge")(
            h_es + drop(de))

        dh = jnp.sum(h_message, axis=-2) / self.scale
        h_v = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(h_v + drop(dh))
        dh = PositionWiseFeedForward(4 * d, dtype=self.dtype, name="dense")(h_v)
        h_v = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(h_v + drop(dh))
        if mask_v is not None:
            h_v = mask_v[..., None] * h_v
        return h_v, h_es_new


class ProjectorMLP2(nn.Module):
    """2-layer SiLU projector (protein variant of build_mlp;
    reference: protein/fmif/model_utils.py:286-293)."""

    projector_dim: int
    z_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.projector_dim, dtype=self.dtype,
                     kernel_init=xavier_uniform)(x)
        x = nn.silu(x)
        return nn.Dense(self.z_dim, dtype=self.dtype,
                        kernel_init=xavier_uniform)(x)


class ProteinMPNNFMIF(nn.Module):
    hidden_dim: int = 128
    edge_features: int = 128
    num_encoder_layers: int = 3
    num_decoder_layers: int = 3
    vocab: int = NUM_TOKENS
    k_neighbors: int = 30
    augment_eps: float = 0.1
    dropout: float = 0.1
    use_cfg: bool = False            # class-conditional (fold-class) CFG
    num_cls: int = 2
    update_edge: bool = True
    align_depth: int = 1
    learnable_node: bool = True
    single_dim: int = 384
    pair_dim: int = 128
    structure_dim: int = 768
    mdlm_parameterization: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, s, mask, chain_m, residue_idx, chain_encoding_all,
                 cls=None, return_rep: bool = False, train: bool = False,
                 detach_repr: bool = False):
        """x [B,L,4,3], s [B,L] tokens (or [B,L,22] soft one-hot for the
        differentiable sampler), masks [B,L]. Returns log_probs [B,L,22]
        (+ zs_single, zs_pair, zs_structure, e_idx when return_rep)."""
        deterministic = not train
        e, e_idx = ProteinFeatures(self.edge_features, self.k_neighbors,
                                   augment_eps=self.augment_eps,
                                   dtype=self.dtype, name="features")(
            x, mask, residue_idx, chain_encoding_all, train=train)

        node_init = self.param("node_embeds",
                               nn.initializers.zeros, (self.hidden_dim,))
        if not self.learnable_node:
            node_init = jax.lax.stop_gradient(node_init)
        h_v = jnp.broadcast_to(node_init.astype(self.dtype),
                               e.shape[:2] + (self.hidden_dim,))
        h_e = nn.Dense(self.hidden_dim, dtype=self.dtype,
                       kernel_init=xavier_uniform, name="W_e")(e)

        cls_emb = None
        if self.use_cfg and cls is not None:
            cls_emb = nn.Embed(self.num_cls + 1, self.hidden_dim,
                               dtype=self.dtype, name="cls_embedder")(cls)

        mask_attend = gather_nodes(mask[..., None], e_idx)[..., 0]
        mask_attend = mask[..., None] * mask_attend
        for i in range(self.num_encoder_layers):
            if cls_emb is not None:
                h_v = h_v + nn.Dense(self.hidden_dim, dtype=self.dtype,
                                     name=f"cls_layers_enc_{i}")(cls_emb)[:, None, :]
            h_v, h_e = EncLayer(self.dropout, dtype=self.dtype,
                                name=f"encoder_layers_{i}")(
                h_v, h_e, e_idx, mask, mask_attend, deterministic=deterministic)

        zs_structure_raw = h_v

        if s.ndim > 2 and s.shape[-1] == self.vocab:
            # soft one-hot input (differentiable sampler / CG guidance)
            table = self.param("W_s_embedding", nn.initializers.normal(0.02),
                               (self.vocab, self.hidden_dim))
            h_s = s.astype(self.dtype) @ table.astype(self.dtype)
        else:
            table = self.param("W_s_embedding", nn.initializers.normal(0.02),
                               (self.vocab, self.hidden_dim))
            h_s = jnp.take(table.astype(self.dtype), s, axis=0)

        h_es = cat_neighbors_nodes(h_s, h_e, e_idx)
        mask_1d = mask[:, :, None, None]

        zs_single_raw, zs_pair_raw = h_v, h_es
        for i in range(self.num_decoder_layers):
            if cls_emb is not None:
                h_v = h_v + nn.Dense(self.hidden_dim, dtype=self.dtype,
                                     name=f"cls_layers_dec_{i}")(cls_emb)[:, None, :]
            h_esv = cat_neighbors_nodes(h_v, h_es, e_idx)
            h_esv = mask_1d * h_esv
            h_v, h_es_new = DecLayer(self.dropout, dtype=self.dtype,
                                     name=f"decoder_layers_{i}")(
                h_v, h_esv, h_es, mask, deterministic=deterministic)
            if self.update_edge:
                h_es = h_es_new
            if i == self.align_depth:
                zs_single_raw = h_v
                zs_pair_raw = h_es_new

        logits = nn.Dense(self.vocab, dtype=self.dtype,
                          kernel_init=xavier_uniform, name="W_out")(h_v)
        logits = logits.astype(jnp.float32)
        if self.mdlm_parameterization:
            logits = logits.at[:, :, MASK_TOKEN_INDEX].set(NEG_INF)
            log_probs = logits - jax.nn.logsumexp(logits, axis=-1, keepdims=True)
            s_idx = s if s.ndim == 2 else jnp.argmax(s, axis=-1)
            unmasked = (s_idx != MASK_TOKEN_INDEX)[..., None]
            onehot_s = jax.nn.one_hot(s_idx, self.vocab)
            log_probs = jnp.where(unmasked,
                                  jnp.where(onehot_s > 0, 0.0, NEG_INF),
                                  log_probs)
        else:
            log_probs = jax.nn.log_softmax(logits, axis=-1)

        if not return_rep:
            return log_probs

        if detach_repr:
            # projector-only training (reference: model_utils.py:639-642)
            zs_single_raw = jax.lax.stop_gradient(zs_single_raw)
            zs_pair_raw = jax.lax.stop_gradient(zs_pair_raw)
            zs_structure_raw = jax.lax.stop_gradient(zs_structure_raw)
        zs_single = ProjectorMLP2(2 * self.single_dim, self.single_dim,
                                  name="projectors_single")(
            zs_single_raw.astype(jnp.float32))
        zs_pair = ProjectorMLP2(2 * self.pair_dim, self.pair_dim,
                                name="projectors_pair")(
            zs_pair_raw.astype(jnp.float32))
        zs_structure = ProjectorMLP2(2 * self.structure_dim, self.structure_dim,
                                     name="projectors_structure")(
            zs_structure_raw.astype(jnp.float32))
        return log_probs, zs_single, zs_pair, zs_structure, e_idx

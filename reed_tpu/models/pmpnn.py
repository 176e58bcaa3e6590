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

TPU-first restructure (round 3): every neighbor gather is phrased as an
einsum against a one-hot [B,L,K,L] selection tensor built once per step —
on TPU, XLA's kCustom dynamic-gather runs at ~20 GB/s effective while the
einsum form runs on the MXU and its transpose (the backward scatter-add)
does too. The 3d/4d-wide message-MLP inputs (concat of self node, edge, and
gathered neighbor features) never materialize: the first Dense of each
message MLP is computed through kernel slices, so the self part is a K-fold
cheaper [B,L,d] matmul and the neighbor part gathers AFTER its matmul
(gathers select whole rows, so they commute with the contraction). All of
this is exact modulo fp summation order, pinned by the torch-mini parity
suite (tests/test_fmif_convert.py) and the factored-vs-direct tests in
tests/test_protein.py. Sequence lengths come from a fixed bucket ladder
(SURVEY.md §7.4 item 1) so XLA compiles one program per bucket.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from reed_tpu.nn.layers import DenseParams as _DenseParams
from reed_tpu.ops.fused_message import fused_message_mlp
from reed_tpu.ops.graph import (
    gather_nodes_oh,
    gather_pair_scalar_oh,
    gather_scalar_oh,
    knn_graph,
    neighbor_onehot,
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


class DenseParams(_DenseParams):
    """pmpnn flavor of nn.DenseParams: xavier-uniform kernel like every
    Dense in this model (see reed_tpu/nn/layers.py for the factoring
    rationale)."""

    kernel_init: Any = xavier_uniform


class PositionalEncodings(nn.Module):
    """Relative-position edge embedding with chain-break indicator
    (reference: protein/fmif/model_utils.py:406-418). Takes the combined
    clipped relative-position code d (computed BEFORE the neighbor gather —
    clipping commutes with gathering, and the bounded code gathers exactly
    through the bf16 one-hot einsum)."""

    num_embeddings: int
    max_relative_feature: int = 32
    dtype: Dtype = jnp.float32

    @staticmethod
    def code(offset, mask, max_relative_feature: int = 32):
        m = max_relative_feature
        return jnp.clip(offset + m, 0, 2 * m) * mask + (1 - mask) * (2 * m + 1)

    @nn.compact
    def __call__(self, d):
        m = self.max_relative_feature
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
        oh = neighbor_onehot(e_idx, x.shape[1])

        atoms = {"N": n_at, "Ca": ca, "C": c_at, "O": o_at, "Cb": cb}
        # 25 ordered atom pairs (reference order, model_utils.py:479-505)
        pairs = [("Ca", "Ca"), ("N", "N"), ("C", "C"), ("O", "O"), ("Cb", "Cb"),
                 ("Ca", "N"), ("Ca", "C"), ("Ca", "O"), ("Ca", "Cb"), ("N", "C"),
                 ("N", "O"), ("N", "Cb"), ("Cb", "C"), ("Cb", "O"), ("O", "C"),
                 ("N", "Ca"), ("C", "Ca"), ("O", "Ca"), ("Cb", "Ca"), ("C", "N"),
                 ("O", "N"), ("Cb", "N"), ("C", "Cb"), ("O", "Cb"), ("C", "O")]
        # gather all 5 neighbor atom positions in ONE one-hot einsum, then
        # form the 24 remaining pair distances from the gathered copies
        names = ["N", "Ca", "C", "O", "Cb"]
        stacked = jnp.stack([atoms[k] for k in names], axis=2)  # [B,L,5,3]
        nbr = jnp.einsum("bnkm,bmac->bnkac", oh, stacked)       # [B,L,K,5,3]
        nbr_atoms = {k: nbr[..., i, :] for i, k in enumerate(names)}
        rbf_all = [rbf(d_neighbors, self.num_rbf)]
        for a_name, b_name in pairs[1:]:
            diff = atoms[a_name][:, :, None, :] - nbr_atoms[b_name]
            d = jnp.sqrt(jnp.sum(diff ** 2, axis=-1) + 1e-6)
            rbf_all.append(rbf(d, self.num_rbf))
        rbf_all = jnp.concatenate(rbf_all, axis=-1)  # [B,L,K,25*num_rbf]

        offset = residue_idx[:, :, None] - residue_idx[:, None, :]
        d_chains = (chain_labels[:, :, None] == chain_labels[:, None, :]
                    ).astype(jnp.int32)
        # combined clipped code (<= 2m+1 = 65, exactly representable in the
        # bf16 one-hot einsum), gathered once instead of offset+chain twice
        code = PositionalEncodings.code(offset, d_chains)
        code = gather_pair_scalar_oh(code.astype(oh.dtype), oh)
        e_pos = PositionalEncodings(self.num_positional_embeddings,
                                    dtype=self.dtype)(code.astype(jnp.int32))
        e = jnp.concatenate([e_pos, rbf_all.astype(self.dtype)], axis=-1)
        e = nn.Dense(self.edge_features, use_bias=False, dtype=self.dtype,
                     kernel_init=xavier_uniform, name="edge_embedding")(e)
        e = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_edges")(e)
        return e, e_idx, oh


class EncLayer(nn.Module):
    """Node+edge message-passing encoder layer
    (reference: protein/fmif/model_utils.py:296-341)."""

    dropout: float = 0.1
    scale: float = 30.0
    fused: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, h_v, h_e, oh, e_idx, mask_v=None, mask_attend=None,
                 deterministic: bool = True):
        d = h_v.shape[-1]
        dense = lambda name: nn.Dense(d, dtype=self.dtype,
                                      kernel_init=xavier_uniform, name=name)
        drop = lambda x: nn.Dropout(self.dropout, deterministic=deterministic)(x)

        def message_in(w_name, h_v):
            # W over concat([h_v_i, h_e_ij, h_v_j]) factored through kernel
            # slices: the [B,L,K,3d] concat never materializes, the self
            # part is a [B,L,d] matmul (K-fold fewer FLOPs than
            # expand-first), and the neighbor part gathers AFTER its matmul
            # (gather selects whole rows, so it commutes). Exact modulo fp
            # summation order.
            w, b = DenseParams(3 * d, d, dtype=self.dtype, name=w_name)()
            self_part = h_v @ w[:d]
            edge_part = h_e @ w[d:2 * d]
            nbr_part = gather_nodes_oh(h_v @ w[2 * d:], oh)
            return self_part[:, :, None, :] + edge_part + nbr_part + b

        def fused_chain(prefix, h_v, want_sum, want_msg, mask):
            # same math through the Pallas kernel: the [B,L,K,*] chain
            # (gather included) never leaves VMEM (ops/fused_message.py)
            w1, b1 = DenseParams(3 * d, d, dtype=self.dtype,
                                 name=f"W{prefix}1")()
            w2, b2 = DenseParams(d, d, dtype=self.dtype,
                                 name=f"W{prefix}2")()
            w3, b3 = DenseParams(d, d, dtype=self.dtype,
                                 name=f"W{prefix}3")()
            pre_self = h_v @ w1[:d] + b1
            nbr_src = h_v @ w1[2 * d:]
            return fused_message_mlp(
                pre_self, h_e, nbr_src, e_idx, w1[d:2 * d], w2, b2, w3, b3,
                mask=mask, mask_mode="post" if mask is not None else "none",
                scale=self.scale, want_sum=want_sum, want_msg=want_msg)

        if self.fused:
            dh, _ = fused_chain("", h_v, True, False, mask_attend)
        else:
            h_message = dense("W3")(_gelu(dense("W2")(_gelu(
                message_in("W1", h_v)))))
            if mask_attend is not None:
                h_message = mask_attend[..., None] * h_message
            dh = jnp.sum(h_message, axis=-2) / self.scale
        h_v = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(h_v + drop(dh))

        dh = PositionWiseFeedForward(4 * d, dtype=self.dtype, name="dense")(h_v)
        h_v = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(h_v + drop(dh))
        if mask_v is not None:
            h_v = mask_v[..., None] * h_v

        if self.fused:
            _, h_message = fused_chain("1", h_v, False, True, None)
        else:
            h_message = dense("W13")(_gelu(dense("W12")(_gelu(
                message_in("W11", h_v)))))
        h_e = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(h_e + drop(h_message))
        return h_v, h_e


class DecLayer(nn.Module):
    """Decoder layer with REED edge-update head
    (reference: protein/fmif/model_utils.py:344-390)."""

    dropout: float = 0.1
    scale: float = 30.0
    fused: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, h_v, h_es, oh, e_idx, mask_edge=None, mask_v=None,
                 deterministic: bool = True):
        d = h_v.shape[-1]
        dense = lambda dim, name: nn.Dense(dim, dtype=self.dtype,
                                           kernel_init=xavier_uniform, name=name)
        drop = lambda x: nn.Dropout(self.dropout, deterministic=deterministic)(x)

        # W1 over concat([h_v_i, mask * [h_es_ij, h_v_j]]) factored through
        # kernel slices (mask is a per-row scalar, so it distributes over the
        # matmul); the [B,L,K,4d] concat never materializes.
        w1, b1 = DenseParams(4 * d, d, dtype=self.dtype, name="W1")()
        if self.fused:
            w2, b2 = DenseParams(d, d, dtype=self.dtype, name="W2")()
            w3, b3 = DenseParams(d, d, dtype=self.dtype, name="W3")()
            pre_self = h_v @ w1[:d] + b1
            nbr_src = h_v @ w1[3 * d:]
            mask_k = None
            mode = "none"
            if mask_edge is not None:
                b_, l_, k_ = e_idx.shape
                mask_k = jnp.broadcast_to(
                    mask_edge.reshape(b_, l_, -1)[:, :, :1], (b_, l_, k_))
                mode = "pre"
            dh_fused, h_message = fused_message_mlp(
                pre_self, h_es, nbr_src, e_idx, w1[d:3 * d], w2, b2, w3, b3,
                mask=mask_k, mask_mode=mode, scale=self.scale,
                want_sum=True, want_msg=True)
        else:
            dh_fused = None
            es_part = h_es @ w1[d:3 * d]
            nbr_part = gather_nodes_oh(h_v @ w1[3 * d:], oh)
            edge_terms = es_part + nbr_part
            if mask_edge is not None:
                edge_terms = mask_edge * edge_terms
            pre = (h_v @ w1[:d])[:, :, None, :] + edge_terms + b1
            h_message = dense(d, "W3")(_gelu(dense(d, "W2")(_gelu(pre))))

        # edge update: h_ES <- LN(h_ES + MLP([h_message, h_ES]))
        de_in = jnp.concatenate([h_message, h_es], axis=-1)
        de = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="W_edge_norm")(de_in)
        de = dense(3 * d, "W_edge_fc1")(de)
        de = _gelu(de)
        de = dense(2 * d, "W_edge_fc2")(de)
        h_es_new = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_edge")(
            h_es + drop(de))

        dh = dh_fused if dh_fused is not None \
            else jnp.sum(h_message, axis=-2) / self.scale
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
    # route the message-MLP chains through the fused Pallas kernel
    # (ops/fused_message.py); parameter tree is unchanged
    fused: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, s, mask, chain_m, residue_idx, chain_encoding_all,
                 cls=None, return_rep: bool = False, train: bool = False,
                 detach_repr: bool = False, enc_state=None,
                 return_enc: bool = False):
        """x [B,L,4,3], s [B,L] tokens (or [B,L,22] soft one-hot for the
        differentiable sampler), masks [B,L]. Returns log_probs [B,L,22]
        (+ zs_single, zs_pair, zs_structure, e_idx when return_rep).

        Sampling-loop hoisting: the features + encoder stack depend only on
        the backbone (and cls), not on the evolving tokens s — pass
        return_enc=True to get (h_v, h_e, e_idx, oh) once, then thread it
        back as enc_state on every sampler step so only the decoder runs
        per step (the reference recomputes the full model each step,
        fm_utils.py:89-143)."""
        deterministic = not train
        cls_emb = None
        if self.use_cfg and cls is not None:
            cls_emb = nn.Embed(self.num_cls + 1, self.hidden_dim,
                               dtype=self.dtype, name="cls_embedder")(cls)

        if enc_state is not None:
            h_v, h_e, e_idx, oh = enc_state
        else:
            e, e_idx, oh = ProteinFeatures(
                self.edge_features, self.k_neighbors,
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

            mask_attend = gather_scalar_oh(mask, oh)
            mask_attend = mask[..., None] * mask_attend
            for i in range(self.num_encoder_layers):
                if cls_emb is not None:
                    h_v = h_v + nn.Dense(
                        self.hidden_dim, dtype=self.dtype,
                        name=f"cls_layers_enc_{i}")(cls_emb)[:, None, :]
                h_v, h_e = EncLayer(self.dropout, fused=self.fused,
                                    dtype=self.dtype,
                                    name=f"encoder_layers_{i}")(
                    h_v, h_e, oh, e_idx, mask, mask_attend,
                    deterministic=deterministic)
            if return_enc:
                return h_v, h_e, e_idx, oh

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

        h_es = jnp.concatenate([h_e, gather_nodes_oh(h_s, oh)], axis=-1)
        mask_1d = mask[:, :, None, None]

        zs_single_raw, zs_pair_raw = h_v, h_es
        for i in range(self.num_decoder_layers):
            if cls_emb is not None:
                h_v = h_v + nn.Dense(self.hidden_dim, dtype=self.dtype,
                                     name=f"cls_layers_dec_{i}")(cls_emb)[:, None, :]
            h_v, h_es_new = DecLayer(self.dropout, fused=self.fused,
                                     dtype=self.dtype,
                                     name=f"decoder_layers_{i}")(
                h_v, h_es, oh, e_idx, mask_edge=mask_1d, mask_v=mask,
                deterministic=deterministic)
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

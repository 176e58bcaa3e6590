"""Protein inverse-folding losses: NLL, label-smoothed CE, and the triple
(single/pair/structure) representation-alignment loss.

Clean-room rebuild of protein/fmif/model_utils.py:167-251. The alignment
loss compares projected decoder activations against frozen AlphaFold3
embeddings loaded from disk; the pair target is gathered along the k-NN
edges (E_idx) so only O(L*K) pair entries are touched.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from reed_tpu.ops.graph import (gather_edges_oh, gather_scalar_oh,
                                neighbor_onehot)

NUM_TOKENS = 22


def loss_nll(s, log_probs, mask):
    """Per-token NLL + masked average + argmax accuracy indicator
    (reference: model_utils.py:167-176)."""
    loss = -jnp.take_along_axis(log_probs, s[..., None], axis=-1)[..., 0]
    s_argmax = jnp.argmax(log_probs, axis=-1)
    true_false = (s == s_argmax).astype(jnp.float32)
    loss_av = jnp.sum(loss * mask) / jnp.sum(mask)
    return loss, loss_av, true_false


def loss_smoothed(s, log_probs, mask, weight: float = 0.1, t=None,
                  t_schedule: bool = False):
    """Label-smoothed CE with the reference's fixed /2000 token normalizer
    and optional 1/(1-t) time schedule (reference: model_utils.py:179-193)."""
    s_onehot = jax.nn.one_hot(s, NUM_TOKENS)
    s_onehot = s_onehot + weight / NUM_TOKENS
    s_onehot = s_onehot / jnp.sum(s_onehot, axis=-1, keepdims=True)
    loss = -jnp.sum(s_onehot * log_probs, axis=-1)
    if t_schedule:
        assert t is not None
        loss = loss / (1.0 - t) / 4.605  # log(0.01) = -4.605; t: [B,1]
    loss_av = jnp.sum(loss * mask) / 2000.0
    return loss, loss_av


def _masked_mean_std(x, mask, axes):
    mean = jnp.sum(x * mask, axis=axes, keepdims=True) / jnp.sum(mask)
    var = jnp.sum((x * mask - mean) ** 2, axis=axes, keepdims=True) / jnp.sum(mask)
    return mean, jnp.sqrt(var)


def _l2norm(x, eps: float = 1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)


def loss_repr(repr_single, repr_pair, repr_structure,
              zs_single, zs_pair, zs_structure,
              e_idx, mask, mask_residue, rng=None,
              repr_norm: bool = False, repr_noise: float = 0.0):
    """Triple cosine alignment loss, unmasked + masked-residue variants
    (reference: model_utils.py:196-251).

    repr_pair: [B,L,L,z] full pair embeddings (gathered here along e_idx),
    zs_pair: [B,L,K,z] projected decoder edge activations. The structure
    target is scaled by 1/100 as in the reference (:200).
    Returns (single, pair, structure, single_m, pair_m, structure_m)."""
    repr_single = repr_single.astype(jnp.float32)
    repr_pair = repr_pair.astype(jnp.float32)
    repr_structure = repr_structure.astype(jnp.float32) / 100.0

    b, l, _, z = repr_pair.shape
    # one-hot (MXU) gathers — exact, ~10x faster than dynamic-gather on TPU;
    # XLA CSEs this one_hot with the model's own neighbor_onehot(e_idx)
    oh = neighbor_onehot(e_idx, l)
    repr_pair = gather_edges_oh(repr_pair, oh)  # [B,L,K,z]
    mask_pair = mask[:, :, None] * gather_scalar_oh(mask, oh)  # [B,L,K]
    # the reference gathers a j-constant broadcast of mask_residue along j,
    # which is the identity — no gather needed
    mask_pair_residue = mask_residue[:, :, None] * mask_pair

    if repr_norm:
        m, s = _masked_mean_std(repr_single, mask[..., None], (0, 1))
        repr_single = (repr_single - m) / (s + 1e-6)
        m, s = _masked_mean_std(repr_pair, mask_pair[..., None], (0, 1, 2))
        repr_pair = (repr_pair - m) / (s + 1e-6)
        m, s = _masked_mean_std(repr_structure, mask[..., None], (0, 1))
        repr_structure = (repr_structure - m) / (s + 1e-6)

    if repr_noise > 0.0 and rng is not None:
        r1, r2, r3 = jax.random.split(rng, 3)
        repr_single = repr_single + repr_noise * jax.random.normal(
            r1, repr_single.shape)
        repr_pair = repr_pair + repr_noise * jax.random.normal(
            r2, repr_pair.shape)
        repr_structure = repr_structure + repr_noise * jax.random.normal(
            r3, repr_structure.shape)

    repr_single = _l2norm(repr_single)
    repr_pair = _l2norm(repr_pair.reshape(b, -1, z))
    repr_structure = _l2norm(repr_structure)
    zs_single = _l2norm(zs_single.astype(jnp.float32))
    zs_pair = _l2norm(zs_pair.astype(jnp.float32).reshape(b, -1, z))
    zs_structure = _l2norm(zs_structure.astype(jnp.float32))

    sim_single = jnp.sum(repr_single * zs_single, axis=-1)       # [B,L]
    sim_pair = jnp.sum(repr_pair * zs_pair, axis=-1)             # [B,L*K]
    sim_structure = jnp.sum(repr_structure * zs_structure, axis=-1)

    loss_single = -jnp.sum(sim_single * mask) / jnp.sum(mask)
    loss_pair = -jnp.sum(sim_pair * mask_pair.reshape(b, -1)) / jnp.sum(mask_pair)
    loss_structure = -jnp.sum(sim_structure * mask) / jnp.sum(mask)
    loss_single_m = -jnp.sum(sim_single * mask_residue) / jnp.sum(mask_residue)
    loss_pair_m = (-jnp.sum(sim_pair * mask_pair_residue.reshape(b, -1))
                   / jnp.sum(mask_pair_residue))
    loss_structure_m = -jnp.sum(sim_structure * mask_residue) / jnp.sum(mask_residue)
    return (loss_single, loss_pair, loss_structure,
            loss_single_m, loss_pair_m, loss_structure_m)

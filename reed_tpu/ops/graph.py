"""Graph gather/scatter primitives for k-NN message passing, as
take_along_axis / segment ops (all static-shape, MXU/VPU friendly).

Clean-room equivalents of the reference gather helpers
(protein/fmif/model_utils.py:255-283) and EGNN segment sums
(molecule/egnn/egnn_new.py:340-360).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gather_edges(edges, neighbor_idx):
    """edges [B,N,N,C] at idx [B,N,K] -> [B,N,K,C]."""
    return jnp.take_along_axis(edges, neighbor_idx[..., None], axis=2)


def gather_nodes(nodes, neighbor_idx):
    """nodes [B,N,C] at idx [B,N,K] -> [B,N,K,C]."""
    b, n, k = neighbor_idx.shape
    flat = neighbor_idx.reshape(b, n * k)
    out = jnp.take_along_axis(nodes, flat[..., None], axis=1)
    return out.reshape(b, n, k, nodes.shape[-1])


def cat_neighbors_nodes(h_nodes, h_neighbors, neighbor_idx):
    """concat([h_neighbors, gather(h_nodes)]) -> [B,N,K,C_e+C_n]."""
    return jnp.concatenate([h_neighbors, gather_nodes(h_nodes, neighbor_idx)],
                           axis=-1)


def knn_graph(coords, mask, k: int, eps: float = 1e-6):
    """Masked k-nearest-neighbor graph over [B,N,3] coordinates.

    Returns (D_neighbors [B,N,K], E_idx [B,N,K]). Invalid positions are
    pushed beyond the max distance so they are picked last
    (reference: protein/fmif/model_utils.py:438-446).
    """
    mask2d = mask[:, None, :] * mask[:, :, None]
    dx = coords[:, :, None, :] - coords[:, None, :, :]
    d = mask2d * jnp.sqrt(jnp.sum(dx ** 2, axis=-1) + eps)
    d_max = jnp.max(d, axis=-1, keepdims=True)
    d_adjust = d + (1.0 - mask2d) * d_max
    k = min(k, coords.shape[1])
    neg_d, e_idx = jax.lax.top_k(-d_adjust, k)
    return -neg_d, e_idx


def rbf(d, num_rbf: int = 16, d_min: float = 2.0, d_max: float = 22.0):
    """Radial basis features of distances [...,] -> [..., num_rbf]
    (reference: protein/fmif/model_utils.py:448-456)."""
    mu = jnp.linspace(d_min, d_max, num_rbf)
    sigma = (d_max - d_min) / num_rbf
    return jnp.exp(-(((d[..., None] - mu) / sigma) ** 2))


def pairwise_dist_gathered(a, b, e_idx, eps: float = 1e-6):
    """||a_i - b_j|| for gathered neighbors: a,b [B,N,3], e_idx [B,N,K]
    -> [B,N,K]. Computes only the k gathered columns (not the full N^2
    matrix the reference materializes at model_utils.py:458-462)."""
    b_gathered = gather_nodes(b, e_idx)  # [B,N,K,3]
    diff = a[:, :, None, :] - b_gathered
    return jnp.sqrt(jnp.sum(diff ** 2, axis=-1) + eps)


def segment_sum(data, segment_ids, num_segments: int):
    """Masked unsorted segment sum (molecule EGNN aggregation)."""
    return jax.ops.segment_sum(data, segment_ids, num_segments)

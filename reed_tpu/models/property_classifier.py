"""EGNN property regressor for conditional-generation evaluation.

Clean-room rebuild of molecule/qm9/property_prediction/models_property.py:
an EGNN (feature-only message passing, no coordinate updates — distances as
edge features) followed by sum-pooling and an MLP head predicting a scalar
molecular property (alpha, mu, HOMO, ...). Used as the evaluator for
conditional generation MAE (molecule/eval_src/eval_conditional_qm9.py:18).
Dense-batched like reed_tpu.models.egnn.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from reed_tpu.models.egnn import coord2diff
from reed_tpu.nn.layers import DenseParams

Dtype = Any


class PropertyEGNNLayer(nn.Module):
    hidden_nf: int
    attention: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, h, edge_attr, node_mask, edge_mask):
        b, n, d = h.shape
        # factored concat matmul (see reed_tpu/nn/layers.py DenseParams)
        e = edge_attr.shape[-1]
        w1, b1 = DenseParams(2 * d + e, self.hidden_nf, dtype=self.dtype,
                             name="edge_fc1")()
        m = ((h @ w1[:d])[:, :, None, :] + (h @ w1[d:2 * d])[:, None, :, :]
             + edge_attr @ w1[2 * d:] + b1)
        m = nn.silu(m)
        m = nn.silu(nn.Dense(self.hidden_nf, dtype=self.dtype,
                             name="edge_fc2")(m))
        if self.attention:
            m = m * nn.sigmoid(nn.Dense(1, dtype=self.dtype, name="att")(m))
        m = m * edge_mask
        agg = jnp.sum(m, axis=2)
        out = jnp.concatenate([h, agg], axis=-1)
        out = nn.silu(nn.Dense(self.hidden_nf, dtype=self.dtype,
                               name="node_fc1")(out))
        out = nn.Dense(d, dtype=self.dtype, name="node_fc2")(out)
        return (h + out) * node_mask


class PropertyClassifier(nn.Module):
    hidden_nf: int = 128
    n_layers: int = 7
    attention: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, h0, x, node_mask, edge_mask):
        """h0 [B,N,F] one-hot (+charge) node feats, x [B,N,3] coords.
        Returns scalar property prediction [B]."""
        dists, _ = coord2diff(x)
        edge_attr = dists.astype(self.dtype)
        h = nn.Dense(self.hidden_nf, dtype=self.dtype, name="embedding")(
            h0.astype(self.dtype)) * node_mask
        for i in range(self.n_layers):
            h = PropertyEGNNLayer(self.hidden_nf, self.attention,
                                  dtype=self.dtype, name=f"gcl_{i}")(
                h, edge_attr, node_mask, edge_mask)
        h = nn.silu(nn.Dense(self.hidden_nf, dtype=self.dtype,
                             name="node_dec_fc1")(h))
        h = nn.Dense(self.hidden_nf, dtype=self.dtype,
                     name="node_dec_fc2")(h) * node_mask
        pooled = jnp.sum(h, axis=1)
        g = nn.silu(nn.Dense(self.hidden_nf, dtype=self.dtype,
                             name="graph_dec_fc1")(pooled))
        return nn.Dense(1, dtype=self.dtype,
                        name="graph_dec_fc2")(g)[..., 0].astype(jnp.float32)


def conditional_generation_mae(classifier_fn, molecules, targets) -> float:
    """MAE of a trained property classifier on generated molecules vs the
    conditioning targets (reference: eval_conditional_qm9.py)."""
    import numpy as np

    preds = classifier_fn(molecules)
    return float(jnp.mean(jnp.abs(jnp.asarray(preds)
                                  - jnp.asarray(targets))))

"""Two-stage molecule sampling: sample a representation first, then the
point cloud conditioned on it (GeoRCG/REED inference scheme).

Clean-room rebuild of molecule/models/wrapper.py:18-80
(SelfConditionWrappedSampler) and the evaluation loops in
molecule/eval_src/eval_analyze.py + molecule/semlaflow/evaluate.py:
N replicates x M molecules with mean/std aggregation of the stability /
validity metrics.
"""

from __future__ import annotations

import time
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from reed_tpu.eval.molecule_metrics import MoleculeMetrics


class TwoStageSampler:
    """rep_sampler: (rng_np | rng, nodesxsample) -> reps [B, D]
    mol_sampler(rng, node_mask, edge_mask, rep) -> (x, h_cat, h_int)."""

    def __init__(self, rep_sampler, mol_sampler: Callable,
                 fixed_rep=None):
        self.rep_sampler = rep_sampler
        self.mol_sampler = mol_sampler
        self.fixed_rep = fixed_rep

    def sample(self, rng, nodesxsample: np.ndarray, max_nodes: int,
               np_rng: Optional[np.random.Generator] = None):
        b = len(nodesxsample)
        node_mask = (np.arange(max_nodes)[None] < np.asarray(nodesxsample)
                     [:, None]).astype(np.float32)[..., None]
        diag = np.eye(max_nodes, dtype=np.float32)[None, :, :, None]
        edge_mask = (node_mask[:, :, None, :] * node_mask[:, None, :, :]
                     * (1 - diag))
        if self.fixed_rep is not None:
            rep = self.fixed_rep
        else:
            t0 = time.time()
            try:
                rep = self.rep_sampler.sample(rng, np.asarray(nodesxsample))
            except TypeError:
                rep = self.rep_sampler.sample(
                    np_rng or np.random.default_rng(0),
                    np.asarray(nodesxsample))
            print(f"rep sampling of {b} took {time.time() - t0:.2f}s")
        x, h_cat, h_int = self.mol_sampler(
            rng, jnp.asarray(node_mask), jnp.asarray(edge_mask),
            jnp.asarray(rep))
        return x, h_cat, h_int, node_mask


def evaluate_replicates(sample_fn: Callable[[int], List],
                        metrics: MoleculeMetrics,
                        n_replicates: int = 3) -> Dict:
    """Run `sample_fn(replicate_idx) -> [(positions, atom_types), ...]`
    n_replicates times and aggregate metric mean/std
    (reference: semlaflow/evaluate.py:219-332)."""
    results: Dict[str, List[float]] = {}
    for r in range(n_replicates):
        mols = sample_fn(r)
        m = metrics.evaluate(mols)
        for k, v in m.items():
            results.setdefault(k, []).append(float(v))
    mean = {k: float(np.mean(v)) for k, v in results.items()}
    std = {k: float(np.std(v)) for k, v in results.items()}
    return {"mean": mean, "std": std, "all": results}


def molecules_from_samples(x, h_cat, node_mask) -> List:
    """Dense sampler outputs -> [(positions [n,3], atom_types [n]), ...]."""
    x = np.asarray(x)
    types = np.asarray(jnp.argmax(h_cat, axis=-1))
    mask = np.asarray(node_mask)[..., 0].astype(bool)
    out = []
    for i in range(x.shape[0]):
        m = mask[i]
        out.append((x[i][m], types[i][m]))
    return out

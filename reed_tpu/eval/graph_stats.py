"""Graph distribution statistics: degree / clustering / orbit MMD between
reference and generated graph sets.

Clean-room rebuild of molecule/eval_src/evaluation/{stats.py,mmd.py}:
histogram-based MMD with gaussian(-TV/-EMD) kernels, degree and clustering
histograms, and 4-node orbit statistics via the rebuilt ORCA counter
(reed_tpu.eval.orca). Graphs are (n, edges[m,2]) pairs — no networkx
dependency required.
"""

from __future__ import annotations

from typing import Iterable, List, Sequence, Tuple

import numpy as np

Graph = Tuple[int, np.ndarray]  # (num_nodes, edges [m, 2])


def degree_histogram(g: Graph, max_deg: int) -> np.ndarray:
    n, edges = g
    deg = np.zeros(n, np.int64)
    for u, v in np.asarray(edges).reshape(-1, 2):
        if u != v:
            deg[u] += 1
            deg[v] += 1
    hist = np.bincount(deg, minlength=max_deg + 1).astype(np.float64)
    return hist / max(1, hist.sum())


def clustering_coefficients(g: Graph) -> np.ndarray:
    n, edges = g
    adj = np.zeros((n, n), bool)
    for u, v in np.asarray(edges).reshape(-1, 2):
        if u != v:
            adj[u, v] = adj[v, u] = True
    coeffs = np.zeros(n)
    for v in range(n):
        nbrs = np.flatnonzero(adj[v])
        k = len(nbrs)
        if k < 2:
            continue
        sub = adj[np.ix_(nbrs, nbrs)]
        coeffs[v] = sub.sum() / (k * (k - 1))
    return coeffs


def clustering_histogram(g: Graph, bins: int = 100) -> np.ndarray:
    hist, _ = np.histogram(clustering_coefficients(g), bins=bins,
                           range=(0.0, 1.0), density=False)
    hist = hist.astype(np.float64)
    return hist / max(1, hist.sum())


def orbit_counts_per_graph(g: Graph) -> np.ndarray:
    """Mean node-orbit counts (15 dims) (reference: stats.py:231-257)."""
    from reed_tpu.eval.orca import count_node_orbits4

    n, edges = g
    counts = count_node_orbits4(n, np.asarray(edges).reshape(-1, 2))
    return counts.sum(axis=0) / max(1, n)


# -- MMD (reference: evaluation/mmd.py) ------------------------------------

def gaussian_tv_kernel(x: np.ndarray, y: np.ndarray,
                       sigma: float = 1.0) -> float:
    """exp(-TV(x,y)^2 / (2 sigma^2)) over histograms padded to equal len."""
    support = max(len(x), len(y))
    x = np.pad(x, (0, support - len(x)))
    y = np.pad(y, (0, support - len(y)))
    dist = np.abs(x - y).sum() / 2.0
    return float(np.exp(-dist * dist / (2 * sigma * sigma)))


def gaussian_kernel(x: np.ndarray, y: np.ndarray,
                    sigma: float = 1.0) -> float:
    support = max(len(x), len(y))
    x = np.pad(x, (0, support - len(x)))
    y = np.pad(y, (0, support - len(y)))
    dist = np.linalg.norm(x - y)
    return float(np.exp(-dist * dist / (2 * sigma * sigma)))


def mmd(samples_x: List[np.ndarray], samples_y: List[np.ndarray],
        kernel=gaussian_tv_kernel, **kw) -> float:
    """Squared population MMD between two sets of descriptors."""
    def avg_kernel(a, b):
        total = sum(kernel(x, y, **kw) for x in a for y in b)
        return total / (len(a) * len(b))

    if not samples_x or not samples_y:
        return float("nan")
    return (avg_kernel(samples_x, samples_x)
            + avg_kernel(samples_y, samples_y)
            - 2 * avg_kernel(samples_x, samples_y))


def degree_stats(ref: Sequence[Graph], pred: Sequence[Graph]) -> float:
    max_deg = 0
    for n, edges in list(ref) + list(pred):
        deg = np.zeros(n, np.int64)
        for u, v in np.asarray(edges).reshape(-1, 2):
            deg[u] += 1
            deg[v] += 1
        if n:
            max_deg = max(max_deg, int(deg.max()))
    hx = [degree_histogram(g, max_deg) for g in ref]
    hy = [degree_histogram(g, max_deg) for g in pred]
    return mmd(hx, hy, kernel=gaussian_tv_kernel, sigma=1.0)


def clustering_stats(ref: Sequence[Graph], pred: Sequence[Graph],
                     bins: int = 100) -> float:
    hx = [clustering_histogram(g, bins) for g in ref]
    hy = [clustering_histogram(g, bins) for g in pred]
    return mmd(hx, hy, kernel=gaussian_tv_kernel, sigma=0.1)


def orbit_stats(ref: Sequence[Graph], pred: Sequence[Graph]) -> float:
    """Orbit-count MMD (reference: stats.py orbit_stats_all)."""
    cx = [orbit_counts_per_graph(g) for g in ref if g[0] > 0]
    cy = [orbit_counts_per_graph(g) for g in pred if g[0] > 0]
    return mmd(cx, cy, kernel=gaussian_tv_kernel, sigma=30.0)


def all_graph_stats(ref: Sequence[Graph], pred: Sequence[Graph]) -> dict:
    return {
        "degree_mmd": degree_stats(ref, pred),
        "clustering_mmd": clustering_stats(ref, pred),
        "orbit_mmd": orbit_stats(ref, pred),
    }

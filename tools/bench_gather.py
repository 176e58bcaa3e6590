"""Microbenchmark: kCustom dynamic-gather (take_along_axis) vs one-hot
einsum (MXU) for the pmpnn neighbor gathers, at REED's protein shapes.

This is the measurement behind the round-3 pmpnn restructure
(reed_tpu/models/pmpnn.py): XLA lowers take_along_axis to a kCustom
dynamic-gather on TPU which runs far below HBM bandwidth at [B,L,K]
neighbor-gather shapes, while the one-hot einsum form runs on the MXU and
transposes (for the backward scatter-add) to another einsum.

Usage: python tools/bench_gather.py [B L K C]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from reed_tpu.ops.graph import gather_nodes, gather_nodes_oh, neighbor_onehot


def _timeit(fn, *args, iters: int = 20):
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / iters


def main():
    b, l, k, c = (int(x) for x in sys.argv[1:5]) if len(sys.argv) > 4 else (
        64, 256, 30, 128)
    rng = jax.random.PRNGKey(0)
    nodes = jax.random.normal(rng, (b, l, c), jnp.bfloat16)
    e_idx = jax.random.randint(jax.random.fold_in(rng, 1), (b, l, k), 0, l)

    take = jax.jit(gather_nodes)
    onehot = jax.jit(lambda n, e: gather_nodes_oh(n, neighbor_onehot(e, l)))

    # forward
    t_take = _timeit(take, nodes, e_idx)
    t_oh = _timeit(onehot, nodes, e_idx)

    # forward+backward (scatter-add vs transposed einsum)
    def g_take(n, e):
        return jax.grad(lambda n: gather_nodes(n, e).sum())(n)

    def g_oh(n, e):
        oh = neighbor_onehot(e, l)
        return jax.grad(lambda n: gather_nodes_oh(n, oh).sum())(n)

    tg_take = _timeit(jax.jit(g_take), nodes, e_idx)
    tg_oh = _timeit(jax.jit(g_oh), nodes, e_idx)

    out_bytes = b * l * k * c * 2
    print(f"shapes: nodes [{b},{l},{c}] bf16, e_idx [{b},{l},{k}] "
          f"(output {out_bytes/1e6:.0f} MB)")
    print(f"forward:  take_along {t_take*1e3:7.3f} ms "
          f"({out_bytes/t_take/1e9:6.1f} GB/s) | onehot einsum "
          f"{t_oh*1e3:7.3f} ms ({out_bytes/t_oh/1e9:6.1f} GB/s) | "
          f"{t_take/t_oh:4.1f}x")
    print(f"fwd+bwd:  take_along {tg_take*1e3:7.3f} ms | onehot einsum "
          f"{tg_oh*1e3:7.3f} ms | {tg_take/tg_oh:4.1f}x")


if __name__ == "__main__":
    main()

"""Attention microbenchmark at the SiT-XL/2 flagship shape.

Times XLA SDPA vs the Pallas flash kernel, forward-only and fwd+bwd,
at (B=48, S=256, H=16, D=72) and at a lane-aligned D=128 control shape.
Decides whether the Pallas kernel should auto-enable at head_dim 72
(it pads 72 -> 128 lanes, wasting 44% of MXU work on QK^T/PV).
"""

import functools
import time

import jax
import jax.numpy as jnp

from reed_tpu.ops.attention import sdpa_xla
from reed_tpu.ops.flash_attention import flash_attention


def bench(fn, args, iters=50):
    out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0][0, 0])  # force execution through axon
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0][0, 0])
    return (time.perf_counter() - t0) / iters * 1e6  # us


def main():
    rng = jax.random.PRNGKey(0)
    for d in (72, 128):
        b, s, h = 48, 256, 16
        q, k, v = (jax.random.normal(jax.random.fold_in(rng, i),
                                     (b, s, h, d), jnp.bfloat16)
                   for i in range(3))

        xla_f = jax.jit(sdpa_xla)
        pal_f = jax.jit(lambda q, k, v: flash_attention(q, k, v))

        def loss_xla(q, k, v):
            return (sdpa_xla(q, k, v).astype(jnp.float32) ** 2).sum()

        def loss_pal(q, k, v):
            return (flash_attention(q, k, v).astype(jnp.float32) ** 2).sum()

        xla_g = jax.jit(jax.grad(loss_xla, argnums=(0, 1, 2)))
        pal_g = jax.jit(jax.grad(loss_pal, argnums=(0, 1, 2)))

        print(f"D={d}: xla fwd {bench(xla_f, (q, k, v)):8.1f} us   "
              f"pallas fwd {bench(pal_f, (q, k, v)):8.1f} us")
        print(f"D={d}: xla f+b {bench(xla_g, (q, k, v)):8.1f} us   "
              f"pallas f+b {bench(pal_g, (q, k, v)):8.1f} us")


if __name__ == "__main__":
    main()

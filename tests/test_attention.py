"""Attention ops: XLA SDPA correctness + pallas dispatch logic."""

import jax
import jax.numpy as jnp
import numpy as np

from reed_tpu.ops.attention import multi_head_attention, sdpa_xla


def _reference_attention(q, k, v):
    scale = q.shape[-1] ** -0.5
    logits = np.einsum("bqhd,bkhd->bhqk", q, k) * scale
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs = probs / probs.sum(-1, keepdims=True)
    return np.einsum("bhqk,bkhd->bqhd", probs, v)


def test_sdpa_matches_reference():
    rng = jax.random.PRNGKey(0)
    q = jax.random.normal(rng, (2, 16, 4, 8))
    k = jax.random.normal(jax.random.fold_in(rng, 1), (2, 16, 4, 8))
    v = jax.random.normal(jax.random.fold_in(rng, 2), (2, 16, 4, 8))
    out = sdpa_xla(q, k, v)
    ref = _reference_attention(np.asarray(q), np.asarray(k), np.asarray(v))
    assert np.allclose(np.asarray(out), ref, atol=1e-5)


def test_masked_attention():
    rng = jax.random.PRNGKey(0)
    q = jax.random.normal(rng, (1, 4, 2, 8))
    k = jax.random.normal(jax.random.fold_in(rng, 1), (1, 4, 2, 8))
    v = jax.random.normal(jax.random.fold_in(rng, 2), (1, 4, 2, 8))
    # mask out last key for all queries
    mask = jnp.ones((1, 1, 4, 4), bool).at[..., 3].set(False)
    out = multi_head_attention(q, k, v, mask=mask, impl="xla")
    # must equal attention computed without the last key
    out_ref = sdpa_xla(q, k[:, :3], v[:, :3])
    assert np.allclose(np.asarray(out), np.asarray(out_ref), atol=1e-5)


def test_auto_impl_on_cpu_is_xla():
    from reed_tpu.ops.attention import _pallas_ok

    q = jnp.zeros((1, 256, 4, 64))
    assert not _pallas_ok(q)  # CPU in tests


def test_flash_attention_interpret_matches_xla():
    """Pallas kernel in interpreter mode == XLA SDPA (fwd + grads)."""
    from jax.experimental.pallas import tpu as pltpu

    from reed_tpu.ops.flash_attention import flash_attention

    rng = jax.random.PRNGKey(0)
    shape = (1, 128, 2, 16)
    q = jax.random.normal(rng, shape)
    k = jax.random.normal(jax.random.fold_in(rng, 1), shape)
    v = jax.random.normal(jax.random.fold_in(rng, 2), shape)

    with pltpu.force_tpu_interpret_mode():
        out = flash_attention(q, k, v)
    ref = sdpa_xla(q, k, v)
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=2e-3)

    def loss_flash(q):
        with pltpu.force_tpu_interpret_mode():
            return flash_attention(q, k, v).sum()

    def loss_ref(q):
        return sdpa_xla(q, k, v).sum()

    g_flash = jax.grad(loss_flash)(q)
    g_ref = jax.grad(loss_ref)(q)
    assert np.allclose(np.asarray(g_flash), np.asarray(g_ref), atol=2e-3)

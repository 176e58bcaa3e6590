"""UniMol global encoder: shapes, invariances, input formatting."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reed_tpu.encoders.unimol import (
    GaussianLayer,
    UniMolGlobal,
    format_input_to_unimol,
    gaussian,
)


def _model():
    return UniMolGlobal(vocab_size=16, embed_dim=32, ffn_dim=64, heads=4,
                        layers=2, gaussian_k=8, rep_dim=16)


def _inputs(seed=0, b=2, n=6):
    rng = np.random.default_rng(seed)
    tokens = rng.integers(3, 16, (b, n)).astype(np.int32)
    tokens[:, 0] = 1  # bos
    tokens[:, -1] = 2  # eos
    coords = rng.standard_normal((b, n, 3)).astype(np.float32)
    dist = np.linalg.norm(coords[:, :, None] - coords[:, None], axis=-1)
    edge_type = tokens[:, :, None] * 16 + tokens[:, None, :]
    return (jnp.asarray(tokens), jnp.asarray(dist),
            jnp.asarray(edge_type.astype(np.int32)))


def test_gaussian_layer_shapes():
    layer = GaussianLayer(k=8, edge_types=64)
    d = jnp.ones((2, 4, 4))
    et = jnp.zeros((2, 4, 4), jnp.int32)
    v = layer.init(jax.random.PRNGKey(0), d, et)
    out = layer.apply(v, d, et)
    assert out.shape == (2, 4, 4, 8)
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.slow
def test_unimol_rep_standardized():
    tokens, dist, et = _inputs()
    model = _model()
    v = model.init(jax.random.PRNGKey(0), tokens, dist, et)
    rep = model.apply(v, tokens, dist, et)
    assert rep.shape == (2, 16)
    assert np.allclose(np.asarray(rep).mean(-1), 0, atol=1e-4)
    # standardization divides by the unbiased std (torch .std() semantics)
    assert np.allclose(np.asarray(rep).std(-1, ddof=1), 1, atol=1e-2)


def test_unimol_distance_only_invariance():
    """The model sees only distances -> rigid motions of coords leave the
    rep unchanged (inputs built from distances)."""
    rng = np.random.default_rng(0)
    coords = rng.standard_normal((1, 5, 3)).astype(np.float32)
    q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
    coords_rot = coords @ q.T + 5.0
    tokens = np.full((1, 5), 4, np.int32)
    tokens[:, 0] = 1
    tokens[:, -1] = 2
    et = (tokens[:, :, None] * 16 + tokens[:, None, :]).astype(np.int32)

    def dist(c):
        return jnp.asarray(np.linalg.norm(c[:, :, None] - c[:, None],
                                          axis=-1).astype(np.float32))

    model = _model()
    v = model.init(jax.random.PRNGKey(0), jnp.asarray(tokens), dist(coords),
                   jnp.asarray(et))
    r1 = model.apply(v, jnp.asarray(tokens), dist(coords), jnp.asarray(et))
    r2 = model.apply(v, jnp.asarray(tokens), dist(coords_rot),
                     jnp.asarray(et))
    assert np.allclose(np.asarray(r1), np.asarray(r2), atol=1e-4)


def test_format_input_to_unimol():
    mask = np.array([[1, 1, 1, 0]], np.float32)
    atom_types = np.array([[2, 5, 7, 0]])
    coords = np.zeros((1, 4, 3), np.float32)
    coords[0, 1] = [1.0, 0, 0]
    tokens, dist, edge_type = format_input_to_unimol(atom_types, coords, mask)
    assert tokens.shape == (1, 6)
    assert tokens[0, 0] == 1 and tokens[0, 4] == 2  # bos ... eos
    assert list(tokens[0, 1:4]) == [5, 8, 10]       # +3 offset
    assert tokens[0, 5] == 0                        # padding
    assert dist[0, 1, 2] == pytest.approx(1.0)

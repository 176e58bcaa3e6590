"""TorchMD-ET JAX encoder: invariance/equivariance and masking."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reed_tpu.encoders.torchmd_et import (
    ExpNormalSmearing,
    FradEncoder,
    TorchMDET,
    cosine_cutoff,
)


def _random_rot(seed=0):
    q, _ = np.linalg.qr(np.random.default_rng(seed).standard_normal((3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    return jnp.asarray(q, jnp.float32)


def _inputs(seed=0, b=2, n=7):
    rng = np.random.default_rng(seed)
    z = jnp.asarray(rng.integers(1, 10, (b, n)))
    pos = jnp.asarray(rng.standard_normal((b, n, 3)).astype(np.float32) * 2)
    mask = jnp.ones((b, n), jnp.float32)
    return z, pos, mask


def test_cutoff_and_rbf():
    d = jnp.array([0.0, 2.5, 4.99, 5.01, 10.0])
    c = cosine_cutoff(d, 5.0)
    assert float(c[0]) == pytest.approx(1.0)
    assert float(c[3]) == 0.0 and float(c[4]) == 0.0
    rbf = ExpNormalSmearing(num_rbf=8)
    variables = rbf.init(jax.random.PRNGKey(0), d)
    out = rbf.apply(variables, d)
    assert out.shape == (5, 8)
    assert np.allclose(np.asarray(out[3:]), 0.0)  # beyond cutoff


def test_et_scalar_invariance_vector_equivariance():
    z, pos, mask = _inputs()
    model = TorchMDET(hidden=32, num_layers=2, num_rbf=16, num_heads=4)
    variables = model.init(jax.random.PRNGKey(0), z, pos, mask)
    x, vec = model.apply(variables, z, pos, mask)
    rot = _random_rot()
    x_r, vec_r = model.apply(variables, z,
                             jnp.einsum("ij,bnj->bni", rot, pos), mask)
    assert np.allclose(np.asarray(x_r), np.asarray(x), atol=1e-4)
    # vec transforms as a vector: vec_r == rot @ vec
    vec_rot = jnp.einsum("ij,bnjh->bnih", rot, vec)
    assert np.allclose(np.asarray(vec_r), np.asarray(vec_rot), atol=1e-4)
    # translation invariance
    x_t, _ = model.apply(variables, z, pos + 7.0, mask)
    assert np.allclose(np.asarray(x_t), np.asarray(x), atol=1e-4)


def test_masking_isolates_fake_atoms():
    z, pos, _ = _inputs(b=1, n=6)
    mask = jnp.array([[1, 1, 1, 1, 0, 0]], jnp.float32)
    model = TorchMDET(hidden=16, num_layers=1, num_rbf=8, num_heads=2)
    variables = model.init(jax.random.PRNGKey(0), z, pos, mask)
    x1, _ = model.apply(variables, z, pos, mask)
    # perturb masked atom positions: real-atom features unchanged
    pos2 = pos.at[0, 4:].add(100.0)
    x2, _ = model.apply(variables, z, pos2, mask)
    assert np.allclose(np.asarray(x1[0, :4]), np.asarray(x2[0, :4]),
                       atol=1e-5)


def test_frad_global_rep():
    z, pos, mask = _inputs()
    enc = FradEncoder(et=TorchMDET(hidden=16, num_layers=1, num_rbf=8,
                                   num_heads=2))
    variables = enc.init(jax.random.PRNGKey(0), z, pos, mask)
    rep = enc.apply(variables, z, pos, mask)
    assert rep.shape == (2, 16)
    # permutation invariance of the pooled rep
    perm = np.array([3, 1, 0, 2, 5, 4, 6])
    rep_p = enc.apply(variables, z[:, perm], pos[:, perm], mask[:, perm])
    assert np.allclose(np.asarray(rep), np.asarray(rep_p), atol=1e-4)

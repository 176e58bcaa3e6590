"""Interpolant paths, score/velocity conversions, t-sampling."""

import jax
import jax.numpy as jnp
import numpy as np

from reed_tpu.diffusion.paths import (
    diffusion_coefficient,
    interpolant,
    sample_time,
    score_from_velocity,
    velocity_from_score,
)


def test_linear_path_endpoints():
    a, s, da, ds = interpolant(jnp.array(0.0), "linear")
    assert float(a) == 1.0 and float(s) == 0.0
    a, s, da, ds = interpolant(jnp.array(1.0), "linear")
    assert float(a) == 0.0 and float(s) == 1.0
    assert float(da) == -1.0 and float(ds) == 1.0


def test_cosine_path_derivative_consistency():
    # numeric derivative check
    t = jnp.linspace(0.1, 0.9, 9)
    eps = 1e-4
    a1, s1, da, ds = interpolant(t, "cosine")
    a2, s2, _, _ = interpolant(t + eps, "cosine")
    assert np.allclose((a2 - a1) / eps, da, atol=5e-3)
    assert np.allclose((s2 - s1) / eps, ds, atol=5e-3)


def test_score_velocity_roundtrip():
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (4, 8))
    v = jax.random.normal(jax.random.fold_in(rng, 1), (4, 8))
    t = jnp.full((4, 1), 0.3)
    for path in ("linear", "cosine"):
        s = score_from_velocity(v, x, t, path)
        v2 = velocity_from_score(s, x, t, path)
        assert np.allclose(v, v2, atol=1e-5)


def test_score_exactness_on_gaussian():
    # For x ~ N(0, I): x_t = a x + s eps => marginal N(0, (a^2+s^2) I),
    # score = -x_t / (a^2+s^2). The exact velocity field for the linear path
    # is E[da*x + ds*eps | x_t] which for standard-normal data equals
    # (da*a + ds*s)/(a^2+s^2) * x_t.
    t = jnp.full((1, 1), 0.4)
    a, s, da, ds = interpolant(t, "linear")
    x_t = jnp.array([[1.7]])
    v_exact = (da * a + ds * s) / (a ** 2 + s ** 2) * x_t
    score = score_from_velocity(v_exact, x_t, t, "linear")
    assert np.allclose(score, -x_t / (a ** 2 + s ** 2), atol=1e-5)


def test_diffusion_coefficient():
    assert float(diffusion_coefficient(0.5)) == 1.0


def test_sample_time_ranges():
    rng = jax.random.PRNGKey(0)
    t = sample_time(rng, 512, "uniform")
    assert t.shape == (512,) and float(t.min()) >= 0 and float(t.max()) <= 1
    t = sample_time(rng, 512, "lognormal", "linear")
    assert float(t.min()) > 0 and float(t.max()) < 1
    t = sample_time(rng, 512, "lognormal", "cosine")
    assert float(t.min()) > 0 and float(t.max()) < 1

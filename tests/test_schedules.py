"""Unit tests for curricula and time weights against closed forms."""

import jax.numpy as jnp
import numpy as np
import pytest

from reed_tpu.core.schedules import (
    cosine_anneal,
    diffusion_loss_decay,
    encoder_weight,
    repa_weight_decay,
    time_weight,
)


def test_repa_decay_constant():
    assert float(repa_weight_decay(500, 1000, "constant")) == 1.0


def test_repa_decay_linear():
    assert np.isclose(float(repa_weight_decay(250, 1000, "linear")), 0.75)
    assert float(repa_weight_decay(2000, 1000, "linear")) == 0.0


def test_repa_decay_cosine():
    assert np.isclose(float(repa_weight_decay(0, 1000, "cosine")), 1.0)
    assert np.isclose(float(repa_weight_decay(500, 1000, "cosine")), 0.5)
    assert np.isclose(float(repa_weight_decay(1000, 1000, "cosine")), 0.0,
                      atol=1e-6)


def test_diffusion_decay_piecewise():
    # before start: 0; ramp; after: constant tail 1
    f = lambda s: float(diffusion_loss_decay(s, 100, 200, 1000, "constant"))
    assert f(50) == 0.0
    assert np.isclose(f(200), 0.5)
    assert f(400) == 1.0


def test_diffusion_decay_linear_tail():
    val = float(diffusion_loss_decay(650, 100, 200, 1000, "linear"))
    # top=300; (650-300)/(1000-300) = 0.5 -> 1-0.5
    assert np.isclose(val, 0.5)


def test_time_weight_kinds():
    t = jnp.array([0.0, 0.5, 1.0])
    assert np.allclose(time_weight(t, 1.0, "constant"), [1, 1, 1])
    assert np.allclose(time_weight(t, 2.0, "linear"), [2, 1, 0])
    assert np.allclose(time_weight(t, 1.0, "cosine"), [1.0, 0.5, 0.0],
                       atol=1e-6)
    w = time_weight(t, 1.0, "cutoff", (0.25, 0.75))
    assert np.allclose(w, [0, 1, 0])
    w = time_weight(jnp.array([0.5]), 1.0, "sigmoid")
    assert np.isclose(float(w[0]), 0.5)


def test_encoder_weight_focus():
    assert np.isclose(float(encoder_weight(2.0, 250, 1000, "linear", "text")),
                      1.5)
    assert np.isclose(float(encoder_weight(2.0, 250, 1000, "linear", "image")),
                      0.5)


def test_cosine_anneal_endpoints():
    assert np.isclose(float(cosine_anneal(0, 100, 1.0, 0.1)), 1.0)
    assert np.isclose(float(cosine_anneal(100, 100, 1.0, 0.1)), 0.1)
    assert np.isclose(float(cosine_anneal(200, 100, 1.0, 0.1)), 0.1)

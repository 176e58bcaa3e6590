"""Continuous interpolant paths for stochastic-interpolant flow matching.

Convention (matches reference image/loss.py:49-64): t=0 is clean data, t=1 is
noise; x_t = alpha_t * x + sigma_t * eps; velocity target
v = d_alpha_t * x + d_sigma_t * eps.
"""

from __future__ import annotations

import jax.numpy as jnp


def interpolant(t, path_type: str = "linear"):
    """Returns (alpha_t, sigma_t, d_alpha_t, d_sigma_t), broadcastable with t."""
    t = jnp.asarray(t, jnp.float32)
    if path_type == "linear":
        return 1.0 - t, t, -jnp.ones_like(t), jnp.ones_like(t)
    if path_type == "cosine":
        a = jnp.cos(t * jnp.pi / 2)
        s = jnp.sin(t * jnp.pi / 2)
        return a, s, -jnp.pi / 2 * s, jnp.pi / 2 * a
    raise NotImplementedError(f"path_type={path_type!r}")


def score_from_velocity(v, x_t, t, path_type: str = "linear"):
    """Convert a velocity prediction into a score estimate
    (reference: image/samplers.py:15-39). t broadcastable with x_t."""
    alpha_t, sigma_t, d_alpha_t, d_sigma_t = interpolant(t, path_type)
    reverse_alpha_ratio = alpha_t / d_alpha_t
    var = sigma_t ** 2 - reverse_alpha_ratio * d_sigma_t * sigma_t
    return (reverse_alpha_ratio * v - x_t) / var


def velocity_from_score(score, x_t, t, path_type: str = "linear"):
    """Inverse of score_from_velocity."""
    alpha_t, sigma_t, d_alpha_t, d_sigma_t = interpolant(t, path_type)
    reverse_alpha_ratio = alpha_t / d_alpha_t
    var = sigma_t ** 2 - reverse_alpha_ratio * d_sigma_t * sigma_t
    return (score * var + x_t) / reverse_alpha_ratio


def diffusion_coefficient(t):
    """SDE diffusion schedule g(t) = 2t (reference: image/samplers.py:42-43)."""
    return 2.0 * t


def sample_time(rng, batch: int, weighting: str = "uniform",
                path_type: str = "linear"):
    """Sample training times; 'lognormal' follows the EDM sigma-lognormal
    mapping (reference: image/loss.py:158-168)."""
    import jax

    if weighting == "uniform":
        return jax.random.uniform(rng, (batch,))
    if weighting == "lognormal":
        sigma = jnp.exp(jax.random.normal(rng, (batch,)))
        if path_type == "linear":
            return sigma / (1.0 + sigma)
        if path_type == "cosine":
            return 2.0 / jnp.pi * jnp.arctan(sigma)
    raise NotImplementedError(f"weighting={weighting!r}")

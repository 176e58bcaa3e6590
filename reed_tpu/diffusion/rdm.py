"""Representation Diffusion Model (RDM): a latent DDPM over frozen-encoder
representation vectors, conditioned on atom count, with DDIM and
predictor-corrector (VPSDE) sampling.

Clean-room rebuild of molecule/models/rdm/models/diffusion/{ddpm,ddim}.py
and molecule/models/sde/{sde_lib,sde_sampling}.py (PCSampler path,
rep_samplers.py:262-360): x0- or eps-parameterization, ldm 'linear' beta
schedule (sqrt-space linspace), DDPM ancestral sampling, DDIM with eta, and
VPSDE ancestral predictor + Langevin corrector with inverse-temperature
score scaling. All samplers are lax.scan loops.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


def make_ldm_linear_betas(timesteps: int, linear_start: float = 0.0015,
                          linear_end: float = 0.0195) -> np.ndarray:
    """ldm 'linear' schedule: linspace in sqrt-beta space
    (reference: rdm/modules/diffusionmodules/util.py make_beta_schedule)."""
    return (np.linspace(linear_start ** 0.5, linear_end ** 0.5, timesteps,
                        dtype=np.float64) ** 2).astype(np.float32)


@dataclass(frozen=True)
class RDMConfig:
    channels: int = 256
    timesteps: int = 1000
    linear_start: float = 0.0015
    linear_end: float = 0.0195
    parameterization: str = "x0"     # x0 | eps
    v_posterior: float = 0.0
    clip_denoised: bool = False


class RDMDiffusion:
    """Functional DDPM wrapper; model_fn(x_t, t, n_nodes) -> x0 or eps."""

    def __init__(self, cfg: RDMConfig, model_fn: Callable):
        self.cfg = cfg
        self.model_fn = model_fn
        betas = make_ldm_linear_betas(cfg.timesteps, cfg.linear_start,
                                      cfg.linear_end)
        alphas = 1.0 - betas
        self.betas = jnp.asarray(betas)
        self.alphas_cumprod = jnp.asarray(np.cumprod(alphas))
        acp_prev = np.append(1.0, np.cumprod(alphas)[:-1])
        self.alphas_cumprod_prev = jnp.asarray(acp_prev)
        self.sqrt_acp = jnp.sqrt(self.alphas_cumprod)
        self.sqrt_one_minus_acp = jnp.sqrt(1.0 - self.alphas_cumprod)
        # posterior q(x_{t-1} | x_t, x_0)
        post_var = (betas * (1.0 - acp_prev) / (1.0 - np.cumprod(alphas))
                    * (1 - cfg.v_posterior) + cfg.v_posterior * betas)
        self.posterior_variance = jnp.asarray(post_var.astype(np.float32))
        self.posterior_log_var = jnp.log(
            jnp.maximum(self.posterior_variance, 1e-20))
        self.posterior_mean_c0 = jnp.asarray(
            (betas * np.sqrt(acp_prev) / (1.0 - np.cumprod(alphas))
             ).astype(np.float32))
        self.posterior_mean_ct = jnp.asarray(
            ((1.0 - acp_prev) * np.sqrt(alphas) / (1.0 - np.cumprod(alphas))
             ).astype(np.float32))

    # -- training -------------------------------------------------------
    def q_sample(self, rng, x0, t):
        eps = jax.random.normal(rng, x0.shape)
        a = self.sqrt_acp[t][:, None]
        s = self.sqrt_one_minus_acp[t][:, None]
        return a * x0 + s * eps, eps

    def training_loss(self, rng, x0, n_nodes):
        """Simple MSE loss on the chosen parameterization
        (reference: ddpm.py p_losses)."""
        rng_t, rng_n = jax.random.split(rng)
        b = x0.shape[0]
        t = jax.random.randint(rng_t, (b,), 0, self.cfg.timesteps)
        x_t, eps = self.q_sample(rng_n, x0, t)
        pred = self.model_fn(x_t, t, n_nodes)
        target = x0 if self.cfg.parameterization == "x0" else eps
        return jnp.mean((pred - target) ** 2, axis=-1)

    # -- shared ---------------------------------------------------------
    def predict_x0_eps(self, x_t, t, n_nodes):
        pred = self.model_fn(x_t, t, n_nodes)
        a = self.sqrt_acp[t][:, None]
        s = self.sqrt_one_minus_acp[t][:, None]
        if self.cfg.parameterization == "x0":
            x0 = pred
            eps = (x_t - a * x0) / s
        else:
            eps = pred
            x0 = (x_t - s * eps) / a
        if self.cfg.clip_denoised:
            x0 = jnp.clip(x0, -1.0, 1.0)
        return x0, eps

    def score_fn(self, x_t, t, n_nodes, inv_temp: float = 1.0):
        """VPSDE discrete score: -eps / sqrt(1 - acp_t), scaled by the
        inverse temperature (reference: sde_lib VPSDE + PCSampler inv_temp)."""
        _, eps = self.predict_x0_eps(x_t, t, n_nodes)
        return -inv_temp * eps / self.sqrt_one_minus_acp[t][:, None]

    # -- DDPM ancestral sampling -----------------------------------------
    def p_sample_loop(self, rng, shape, n_nodes):
        def body(x, t_scalar):
            t = jnp.full((shape[0],), t_scalar, jnp.int32)
            x0, _ = self.predict_x0_eps(x, t, n_nodes)
            mean = (self.posterior_mean_c0[t][:, None] * x0
                    + self.posterior_mean_ct[t][:, None] * x)
            noise = jax.random.normal(jax.random.fold_in(rng, t_scalar), shape)
            nonzero = (t_scalar > 0).astype(jnp.float32)
            x = mean + nonzero * jnp.exp(
                0.5 * self.posterior_log_var[t][:, None]) * noise
            return x, None

        rng_init, rng = jax.random.split(rng)
        x = jax.random.normal(rng_init, shape)
        x, _ = jax.lax.scan(body, x,
                            jnp.arange(self.cfg.timesteps - 1, -1, -1))
        return x

    # -- DDIM -------------------------------------------------------------
    def ddim_sample(self, rng, shape, n_nodes, num_steps: int = 50,
                    eta: float = 0.0):
        """DDIM over a strided timestep subset (reference: ddim.py)."""
        ts = np.linspace(0, self.cfg.timesteps - 1, num_steps,
                         dtype=np.int64)[::-1].copy()
        ts_prev = np.append(ts[1:], 0)
        acp = np.asarray(self.alphas_cumprod)
        acp_t = jnp.asarray(acp[ts].astype(np.float32))
        acp_prev = jnp.asarray(
            np.where(ts_prev < ts, acp[ts_prev], 1.0).astype(np.float32))
        # last step goes to alpha_cumprod_prev = 1 (x0)
        acp_prev = acp_prev.at[-1].set(1.0)
        ts_arr = jnp.asarray(ts.astype(np.int32))

        def body(x, i):
            t = jnp.full((shape[0],), ts_arr[i], jnp.int32)
            x0, eps = self.predict_x0_eps(x, t, n_nodes)
            a_t, a_prev = acp_t[i], acp_prev[i]
            sigma = eta * jnp.sqrt((1 - a_prev) / (1 - a_t)
                                   * (1 - a_t / a_prev))
            dir_xt = jnp.sqrt(jnp.maximum(1.0 - a_prev - sigma ** 2, 0.0)) * eps
            noise = jax.random.normal(jax.random.fold_in(rng, i), shape)
            x = jnp.sqrt(a_prev) * x0 + dir_xt + sigma * noise
            return x, None

        rng_init, rng = jax.random.split(rng)
        x = jax.random.normal(rng_init, shape)
        x, _ = jax.lax.scan(body, x, jnp.arange(len(ts)))
        return x

    # -- predictor-corrector (VPSDE) ---------------------------------------
    def pc_sample(self, rng, shape, n_nodes, n_corrector_steps: int = 1,
                  snr: float = 0.01, inv_temp: float = 1.0):
        """Ancestral predictor + Langevin corrector
        (reference: sde_sampling.py AncestralSamplingPredictor +
        LangevinCorrector; inv_temp scales the score)."""
        T = self.cfg.timesteps
        alphas = 1.0 - self.betas

        def corrector(x, t, i):
            def one_step(x, j):
                grad = self.score_fn(x, t, n_nodes, inv_temp)
                noise = jax.random.normal(
                    jax.random.fold_in(rng, i * 1000 + j), x.shape)
                grad_norm = jnp.sqrt(jnp.mean(jnp.sum(grad ** 2, -1)))
                noise_norm = jnp.sqrt(jnp.mean(jnp.sum(noise ** 2, -1)))
                alpha = alphas[t][:, None]
                step_size = ((snr * noise_norm / jnp.maximum(grad_norm, 1e-12))
                             ** 2 * 2 * alpha)
                x = x + step_size * grad + jnp.sqrt(2 * step_size) * noise
                return x, None

            x, _ = jax.lax.scan(one_step, x, jnp.arange(n_corrector_steps))
            return x

        def predictor(x, t, i):
            score = self.score_fn(x, t, n_nodes, inv_temp)
            beta = self.betas[t][:, None]
            x_mean = (x + beta * score) / jnp.sqrt(1.0 - beta)
            noise = jax.random.normal(jax.random.fold_in(rng, 500_000 + i), x.shape)
            nonzero = (t[0] > 0).astype(jnp.float32)
            return x_mean + nonzero * jnp.sqrt(beta) * noise

        def body(x, i):
            t_scalar = T - 1 - i
            t = jnp.full((shape[0],), t_scalar, jnp.int32)
            x = corrector(x, t, i)
            x = predictor(x, t, i)
            return x, None

        rng_init, rng = jax.random.split(rng)
        x = jax.random.normal(rng_init, shape)
        x, _ = jax.lax.scan(body, x, jnp.arange(T))
        return x


def rep_normalization(rep):
    """Per-sample standardization over the feature dim
    (reference: rep_samplers.py:103-110)."""
    mean = jnp.mean(rep, axis=1, keepdims=True)
    std = jnp.std(rep, axis=1, keepdims=True)
    return (rep - mean) / std

"""E(n) variational diffusion (EDM) for point-cloud molecules.

Clean-room rebuild of molecule/equivariant_diffusion/en_diffusion.py:
predefined (cosine / polynomial) or learned (VDM monotonic net) gamma noise
schedules, eps-parameterization, L2 / VLB losses with the zero-CoM subspace
corrections, and ancestral sampling p(z_s | z_t) as a lax.scan. Supports
representation conditioning with train-time rep dropout + CFG sampling via
EGNNDynamics.forward_with_cfg.

Noise lives on the translation-invariant subspace for coordinates
(center-of-gravity-free gaussians) and full space for node features.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from reed_tpu.models.egnn import remove_mean_with_mask


# --------------------------------------------------------------------------
# Noise schedules (reference: en_diffusion.py:23-80, 170-205)

def clip_noise_schedule(alphas2, clip_value: float = 0.001):
    alphas2 = np.concatenate([np.ones(1), alphas2], axis=0)
    alphas_step = alphas2[1:] / alphas2[:-1]
    alphas_step = np.clip(alphas_step, a_min=clip_value, a_max=1.0)
    return np.cumprod(alphas_step, axis=0)


def polynomial_schedule(timesteps: int, s: float = 1e-4, power: float = 2.0):
    steps = timesteps + 1
    x = np.linspace(0, steps, steps)
    alphas2 = (1 - np.power(x / steps, power)) ** 2
    alphas2 = clip_noise_schedule(alphas2, clip_value=0.001)
    precision = 1 - 2 * s
    return precision * alphas2 + s


def cosine_beta_schedule(timesteps: int, s: float = 0.008):
    steps = timesteps + 2
    x = np.linspace(0, steps, steps)
    alphas_cumprod = np.cos(((x / steps) + s) / (1 + s) * np.pi * 0.5) ** 2
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    betas = np.clip(betas, a_min=0, a_max=0.999)
    alphas = 1.0 - betas
    return np.cumprod(alphas, axis=0)


def make_gamma_table(noise_schedule: str, timesteps: int,
                     precision: float = 1e-4) -> np.ndarray:
    """-log(alpha^2/sigma^2) lookup of length timesteps+1
    (reference: PredefinedNoiseSchedule, en_diffusion.py:170-205)."""
    if noise_schedule == "cosine":
        alphas2 = cosine_beta_schedule(timesteps)
    elif noise_schedule.startswith("polynomial"):
        power = float(noise_schedule.split("_")[1])
        alphas2 = polynomial_schedule(timesteps, s=precision, power=power)
    else:
        raise ValueError(noise_schedule)
    sigmas2 = 1 - alphas2
    return (-(np.log(alphas2) - np.log(sigmas2))).astype(np.float32)


def gamma_lookup(gamma_table, t, timesteps: int):
    """gamma(t) for t in [0,1] via rounded table lookup."""
    t_int = jnp.round(t * timesteps).astype(jnp.int32)
    return jnp.take(jnp.asarray(gamma_table), t_int)


class GammaNetwork:
    """Learned monotonic noise schedule (VDM; reference:
    en_diffusion.py:207-245 GammaNetwork with PositiveLinear layers).
    Functional: params are a dict pytree trained jointly with the model
    under the VLB objective."""

    @staticmethod
    def init_params(hidden: int = 1024, seed: int = 0):
        rng = np.random.default_rng(seed)
        return {
            "l1_w": np.abs(rng.standard_normal((1, 1))).astype(np.float32),
            "l1_b": np.zeros((1,), np.float32),
            "l2_w": np.abs(rng.standard_normal((1, hidden)) * 0.1
                           ).astype(np.float32),
            "l2_b": np.zeros((hidden,), np.float32),
            "l3_w": np.abs(rng.standard_normal((hidden, 1)) * 0.01
                           ).astype(np.float32),
            "l3_b": np.zeros((1,), np.float32),
            "gamma_0": np.array([-5.0], np.float32),
            "gamma_1": np.array([10.0], np.float32),
        }

    @staticmethod
    def apply(params, t):
        """t [...] in [0,1] -> gamma [...]. Positive weights via softplus
        make gamma_tilde monotonic; endpoints pinned to gamma_0/gamma_1."""
        def pos(w):
            return jax.nn.softplus(w)

        def gamma_tilde(tt):
            tt = tt.reshape(-1, 1)
            l1 = tt @ pos(params["l1_w"]) + params["l1_b"]
            h = jax.nn.sigmoid(l1 @ pos(params["l2_w"]) + params["l2_b"])
            return (l1 + h @ pos(params["l3_w"]) + params["l3_b"])[..., 0]

        t = jnp.asarray(t, jnp.float32)
        shape = t.shape
        g_t = gamma_tilde(t)
        g_0 = gamma_tilde(jnp.zeros((1,)))
        g_1 = gamma_tilde(jnp.ones((1,)))
        norm = (g_t - g_0) / (g_1 - g_0)
        gamma = params["gamma_0"] + (params["gamma_1"]
                                     - params["gamma_0"]) * norm
        return gamma.reshape(shape)


# --------------------------------------------------------------------------
# Gaussian helpers (reference: molecule/equivariant_diffusion/utils.py)

def sample_center_gravity_zero_gaussian_with_mask(rng, shape, node_mask):
    x = jax.random.normal(rng, shape) * node_mask
    return remove_mean_with_mask(x, node_mask)


def sample_gaussian_with_mask(rng, shape, node_mask):
    return jax.random.normal(rng, shape) * node_mask


def sum_except_batch(x):
    return jnp.sum(x.reshape(x.shape[0], -1), axis=-1)


def cdf_standard_gaussian(x):
    return 0.5 * (1.0 + jax.lax.erf(x / np.sqrt(2.0)))


def gaussian_kl(q_mu, q_sigma, p_mu, p_sigma, node_mask):
    return sum_except_batch(
        (jnp.log(p_sigma / (q_sigma + 1e-20) + 1e-20)
         + 0.5 * (q_sigma ** 2 + (q_mu - p_mu) ** 2) / p_sigma ** 2 - 0.5)
        * node_mask)


def gaussian_kl_for_dimension(q_mu, q_sigma, p_mu, p_sigma, d):
    mu_norm2 = sum_except_batch((q_mu - p_mu) ** 2)
    return (d * jnp.log(p_sigma / (q_sigma + 1e-20) + 1e-20)
            + 0.5 * (d * q_sigma ** 2 + mu_norm2) / p_sigma ** 2 - 0.5 * d)


# --------------------------------------------------------------------------

@dataclass(frozen=True)
class EDMConfig:
    n_dims: int = 3
    in_node_nf: int = 6              # one-hot atom types (+ charges)
    include_charges: bool = True
    timesteps: int = 1000
    noise_schedule: str = "polynomial_2"
    noise_precision: float = 1e-5
    loss_type: str = "l2"            # l2 | vlb
    norm_values: Tuple[float, float, float] = (1.0, 4.0, 10.0)
    norm_biases: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    cfg_scale: Optional[float] = None


class EnVariationalDiffusion:
    """Functional EDM wrapper around a dynamics apply function.

    dynamics_fn(t, xh, node_mask, edge_mask, context, rep, rng, train) -> eps
    dynamics_cfg_fn(t, xh, node_mask, edge_mask, context, rep) -> eps (CFG)
    """

    def __init__(self, cfg: EDMConfig, dynamics_fn: Callable,
                 dynamics_cfg_fn: Optional[Callable] = None,
                 gamma_fn: Optional[Callable] = None):
        self.cfg = cfg
        self.dynamics_fn = dynamics_fn
        self.dynamics_cfg_fn = dynamics_cfg_fn
        self.gamma_fn = gamma_fn       # learned schedule (GammaNetwork.apply)
        if gamma_fn is None:
            self.gamma_table = make_gamma_table(
                cfg.noise_schedule, cfg.timesteps, cfg.noise_precision)

    # -- schedule helpers ---------------------------------------------------
    def gamma(self, t):
        if self.gamma_fn is not None:
            return self.gamma_fn(t)
        return gamma_lookup(self.gamma_table, t, self.cfg.timesteps)

    @staticmethod
    def sigma(gamma):
        return jnp.sqrt(jax.nn.sigmoid(gamma))

    @staticmethod
    def alpha(gamma):
        return jnp.sqrt(jax.nn.sigmoid(-gamma))

    @staticmethod
    def snr(gamma):
        return jnp.exp(-gamma)

    @staticmethod
    def _inflate(arr, target):
        return arr.reshape((arr.shape[0],) + (1,) * (target.ndim - 1))

    def subspace_dimensionality(self, node_mask):
        n = jnp.sum(node_mask[..., 0], axis=1)
        return (n - 1) * self.cfg.n_dims

    # -- normalization ------------------------------------------------------
    def normalize(self, x, h_cat, h_int, node_mask):
        nv, nb = self.cfg.norm_values, self.cfg.norm_biases
        x = x / nv[0]
        delta_log_px = -self.subspace_dimensionality(node_mask) * np.log(nv[0])
        h_cat = (h_cat.astype(jnp.float32) - nb[1]) / nv[1] * node_mask
        h_int = (h_int.astype(jnp.float32) - nb[2]) / nv[2]
        if self.cfg.include_charges:
            h_int = h_int * node_mask
        return x, h_cat, h_int, delta_log_px

    def unnormalize(self, x, h_cat, h_int, node_mask):
        nv, nb = self.cfg.norm_values, self.cfg.norm_biases
        x = x * nv[0]
        h_cat = (h_cat * nv[1] + nb[1]) * node_mask
        h_int = h_int * nv[2] + nb[2]
        if self.cfg.include_charges:
            h_int = h_int * node_mask
        return x, h_cat, h_int

    # -- noise --------------------------------------------------------------
    def sample_combined_noise(self, rng, b, n, node_mask):
        r1, r2 = jax.random.split(rng)
        z_x = sample_center_gravity_zero_gaussian_with_mask(
            r1, (b, n, self.cfg.n_dims), node_mask)
        z_h = sample_gaussian_with_mask(
            r2, (b, n, self.cfg.in_node_nf), node_mask)
        return jnp.concatenate([z_x, z_h], axis=-1)

    # -- losses -------------------------------------------------------------
    def compute_error(self, net_out, eps, train: bool):
        if train and self.cfg.loss_type == "l2":
            denom = (self.cfg.n_dims + self.cfg.in_node_nf) * eps.shape[1]
            return sum_except_batch((eps - net_out) ** 2) / denom
        return sum_except_batch((eps - net_out) ** 2)

    def kl_prior(self, xh, node_mask):
        ones = jnp.ones((xh.shape[0],))
        gamma_t = self.gamma(ones)
        alpha_t = self._inflate(self.alpha(gamma_t), xh)
        mu_t = alpha_t * xh
        mu_t_x = mu_t[:, :, :self.cfg.n_dims]
        mu_t_h = mu_t[:, :, self.cfg.n_dims:]
        sigma_t = self.sigma(gamma_t)
        kl_h = gaussian_kl(mu_t_h, self._inflate(sigma_t, mu_t_h),
                           jnp.zeros_like(mu_t_h), 1.0, node_mask)
        d = self.subspace_dimensionality(node_mask)
        kl_x = gaussian_kl_for_dimension(mu_t_x, sigma_t,
                                         jnp.zeros_like(mu_t_x), 1.0, d)
        return kl_x + kl_h

    def log_constants_p_x_given_z0(self, x, node_mask):
        n = jnp.sum(node_mask[..., 0], axis=1)
        dof_x = (n - 1) * self.cfg.n_dims
        gamma_0 = self.gamma(jnp.zeros((x.shape[0],)))
        log_sigma_x = 0.5 * gamma_0
        return dof_x * (-log_sigma_x - 0.5 * np.log(2 * np.pi))

    def log_pxh_given_z0_without_constants(self, x, h_cat, h_int, z_t,
                                           gamma_0, eps, net_out, node_mask,
                                           epsilon: float = 1e-10):
        nd, nv, nb = self.cfg.n_dims, self.cfg.norm_values, self.cfg.norm_biases
        inc = self.cfg.include_charges
        z_h_cat = z_t[:, :, nd:-1] if inc else z_t[:, :, nd:]
        z_h_int = z_t[:, :, -1:] if inc else jnp.zeros_like(z_t[:, :, :0])
        eps_x = eps[:, :, :nd]
        net_x = net_out[:, :, :nd]
        sigma_0 = self._inflate(self.sigma(gamma_0), z_t)
        sigma_0_cat = sigma_0 * nv[1]
        sigma_0_int = sigma_0 * nv[2]
        log_p_x = -0.5 * sum_except_batch((eps_x - net_x) ** 2)

        h_integer = jnp.round(h_int * nv[2] + nb[2])
        onehot = h_cat * nv[1] + nb[1]
        est_int = z_h_int * nv[2] + nb[2]
        est_cat = z_h_cat * nv[1] + nb[1]
        int_centered = h_integer - est_int
        # max() not +epsilon: float32 erf cancellation can make the cdf
        # difference slightly negative (~-1e-7), which log() turns into NaN
        log_ph_int = jnp.log(jnp.maximum(
            cdf_standard_gaussian((int_centered + 0.5) / sigma_0_int)
            - cdf_standard_gaussian((int_centered - 0.5) / sigma_0_int),
            epsilon))
        log_ph_int = sum_except_batch(log_ph_int * node_mask)

        centered_cat = est_cat - 1
        log_ph_cat_prop = jnp.log(jnp.maximum(
            cdf_standard_gaussian((centered_cat + 0.5) / sigma_0_cat)
            - cdf_standard_gaussian((centered_cat - 0.5) / sigma_0_cat),
            epsilon))
        log_z = jax.nn.logsumexp(log_ph_cat_prop, axis=2, keepdims=True)
        log_probs = log_ph_cat_prop - log_z
        log_ph_cat = sum_except_batch(log_probs * onehot * node_mask)
        return log_p_x + log_ph_int + log_ph_cat

    def compute_loss(self, rng, x, h_cat, h_int, node_mask, edge_mask,
                     context, rep, train: bool, t0_always: bool):
        """Returns (loss [B], denoised_xh) (reference:
        en_diffusion.py:579-707)."""
        cfg = self.cfg
        b = x.shape[0]
        rng_t, rng_eps, rng_eps0, rng_net, rng_net0 = jax.random.split(rng, 5)
        lowest_t = 1 if t0_always else 0
        t_int = jax.random.randint(rng_t, (b, 1), lowest_t,
                                   cfg.timesteps + 1).astype(jnp.float32)
        s_int = t_int - 1
        t_is_zero = (t_int == 0).astype(jnp.float32)
        s = s_int / cfg.timesteps
        t = t_int / cfg.timesteps

        gamma_s = self.gamma(s[:, 0])
        gamma_t = self.gamma(t[:, 0])
        alpha_t = self._inflate(self.alpha(gamma_t), x)
        sigma_t = self._inflate(self.sigma(gamma_t), x)

        eps = self.sample_combined_noise(rng_eps, b, x.shape[1], node_mask)
        xh = jnp.concatenate([x, h_cat, h_int], axis=-1)
        z_t = alpha_t * xh + sigma_t * eps

        net_out = self.dynamics_fn(t[:, 0], z_t, node_mask, edge_mask,
                                   context, rep, rng_net, train)
        error = self.compute_error(net_out, eps, train)
        denoised_xh = (z_t - sigma_t * net_out) / alpha_t

        if train and cfg.loss_type == "l2":
            snr_weight = jnp.ones_like(error)
        else:
            snr_weight = self.snr(gamma_s - gamma_t) - 1.0
        loss_t_gt_zero = 0.5 * snr_weight * error

        neg_log_constants = -self.log_constants_p_x_given_z0(x, node_mask)
        if train and cfg.loss_type == "l2":
            neg_log_constants = jnp.zeros_like(neg_log_constants)
        kl_prior = self.kl_prior(xh, node_mask)

        if t0_always:
            loss_t = loss_t_gt_zero
            estimator = cfg.timesteps * loss_t
            t_zeros = jnp.zeros_like(s)
            gamma_0 = self.gamma(t_zeros[:, 0])
            alpha_0 = self._inflate(self.alpha(gamma_0), x)
            sigma_0 = self._inflate(self.sigma(gamma_0), x)
            eps_0 = self.sample_combined_noise(rng_eps0, b, x.shape[1],
                                               node_mask)
            z_0 = alpha_0 * xh + sigma_0 * eps_0
            net_out0 = self.dynamics_fn(t_zeros[:, 0], z_0, node_mask,
                                        edge_mask, context, rep, rng_net0,
                                        train)
            loss_term_0 = -self.log_pxh_given_z0_without_constants(
                x, h_cat, h_int, z_0, gamma_0, eps_0, net_out0, node_mask)
            loss = kl_prior + estimator + neg_log_constants + loss_term_0
        else:
            loss_term_0 = -self.log_pxh_given_z0_without_constants(
                x, h_cat, h_int, z_t, gamma_t, eps, net_out, node_mask)
            t_not_zero = 1.0 - t_is_zero[:, 0]
            loss_t = (loss_term_0 * t_is_zero[:, 0]
                      + t_not_zero * loss_t_gt_zero)
            if train and cfg.loss_type == "l2":
                estimator = loss_t
            else:
                estimator = (cfg.timesteps + 1) * loss_t
            loss = kl_prior + estimator + neg_log_constants
        return loss, denoised_xh

    def loss(self, rng, x, h_cat, h_int, node_mask, edge_mask, context=None,
             rep=None, train: bool = True):
        """NLL (or L2 surrogate) per batch element
        (reference: en_diffusion.py:709-740)."""
        x, h_cat, h_int, delta_log_px = self.normalize(x, h_cat, h_int,
                                                       node_mask)
        if train and self.cfg.loss_type == "l2":
            delta_log_px = jnp.zeros_like(delta_log_px)
        loss, denoised = self.compute_loss(rng, x, h_cat, h_int, node_mask,
                                           edge_mask, context, rep, train,
                                           t0_always=not train)
        return loss - delta_log_px, denoised

    # -- sampling -----------------------------------------------------------
    def _net_eval(self, t, z, node_mask, edge_mask, context, rep):
        if self.cfg.cfg_scale is not None and self.dynamics_cfg_fn is not None:
            return self.dynamics_cfg_fn(t, z, node_mask, edge_mask, context,
                                        rep)
        return self.dynamics_fn(t, z, node_mask, edge_mask, context, rep,
                                None, False)

    def sample_p_zs_given_zt(self, rng, s, t, zt, node_mask, edge_mask,
                             context, rep):
        nd = self.cfg.n_dims
        gamma_s = self.gamma(s)
        gamma_t = self.gamma(t)
        sigma2_t_s = -jnp.expm1(jax.nn.softplus(gamma_s)
                                - jax.nn.softplus(gamma_t))
        log_alpha2_t = jax.nn.log_sigmoid(-gamma_t)
        log_alpha2_s = jax.nn.log_sigmoid(-gamma_s)
        alpha_t_s = jnp.exp(0.5 * (log_alpha2_t - log_alpha2_s))
        sigma_t_s = jnp.sqrt(sigma2_t_s)
        sigma_s = self.sigma(gamma_s)
        sigma_t = self.sigma(gamma_t)

        eps_t = self._net_eval(jnp.broadcast_to(t, (zt.shape[0],)), zt,
                               node_mask, edge_mask, context, rep)
        inf = lambda a: self._inflate(jnp.broadcast_to(a, (zt.shape[0],)), zt)
        mu = zt / inf(alpha_t_s) - (inf(sigma2_t_s) / inf(alpha_t_s)
                                    / inf(sigma_t)) * eps_t
        sigma = inf(sigma_t_s * sigma_s / sigma_t)
        eps = self.sample_combined_noise(rng, zt.shape[0], zt.shape[1],
                                         node_mask)
        zs = mu + sigma * eps
        return jnp.concatenate(
            [remove_mean_with_mask(zs[:, :, :nd], node_mask),
             zs[:, :, nd:]], axis=-1)

    def sample_p_xh_given_z0(self, rng, z0, node_mask, edge_mask, context,
                             rep):
        nd = self.cfg.n_dims
        b = z0.shape[0]
        zeros = jnp.zeros((b,))
        gamma_0 = self.gamma(zeros)
        sigma_x = self._inflate(self.snr(-0.5 * gamma_0), z0)
        net_out = self._net_eval(zeros, z0, node_mask, edge_mask, context, rep)
        alpha_0 = self._inflate(self.alpha(gamma_0), z0)
        sigma_0 = self._inflate(self.sigma(gamma_0), z0)
        mu_x = (z0 - sigma_0 * net_out) / alpha_0
        eps = self.sample_combined_noise(rng, b, z0.shape[1], node_mask)
        xh = mu_x + sigma_x * eps
        x = xh[:, :, :nd]
        inc = self.cfg.include_charges
        # h_cat/h_int decode from z0, not the resampled xh (reference
        # en_diffusion.py:501-502); resampling noise can flip argmax types.
        h_int_z = z0[:, :, -1:] if inc else jnp.zeros_like(z0[:, :, :0])
        x, h_cat, h_int = self.unnormalize(
            x, z0[:, :, nd:nd + self.cfg.in_node_nf - int(inc)], h_int_z,
            node_mask)
        num_classes = self.cfg.in_node_nf - int(inc)
        h_cat = jax.nn.one_hot(jnp.argmax(h_cat, axis=2),
                               num_classes) * node_mask
        h_int = jnp.round(h_int) * node_mask
        return x, h_cat, h_int

    def sample(self, rng, n_samples, n_nodes, node_mask, edge_mask,
               context=None, rep=None):
        """Ancestral sampling as a lax.scan over T steps
        (reference: en_diffusion.py:793-830)."""
        cfg = self.cfg
        rng_init, rng_scan, rng_final = jax.random.split(rng, 3)
        z = self.sample_combined_noise(rng_init, n_samples, n_nodes, node_mask)

        def body(z, s_int):
            s = s_int.astype(jnp.float32) / cfg.timesteps
            t = (s_int.astype(jnp.float32) + 1) / cfg.timesteps
            z = self.sample_p_zs_given_zt(
                jax.random.fold_in(rng_scan, s_int), s, t, z, node_mask,
                edge_mask, context, rep)
            return z, None

        z, _ = jax.lax.scan(body, z, jnp.arange(cfg.timesteps - 1, -1, -1))
        x, h_cat, h_int = self.sample_p_xh_given_z0(
            rng_final, z, node_mask, edge_mask, context, rep)
        x = remove_mean_with_mask(x, node_mask)
        return x, h_cat, h_int

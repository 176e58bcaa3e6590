"""SO(3) utilities: exp/log maps, geodesics, IGSO(3) sampling.

Clean-room rebuild of protein/multiflow/data/so3_utils.py (1.8k LoC there;
the JAX version is small because lookup tables are precomputed with numpy
and the maps are closed-form):

  - rotvec_to_rotmat (Rodrigues) / rotmat_to_rotvec (stable log map with
    Taylor fallback near 0 and the pi-case via the symmetric part)
  - calc_rot_vf(mat_t, mat_1) = Log_{mat_t}(mat_1), geodesic_t
  - IGSO(3) sampling by inverse-transform over the truncated character
    expansion f(w|s) = sum_l (2l+1) e^{-l(l+1)s^2/2} sin((l+1/2)w)/sin(w/2)
    with the uniform-measure factor (1-cos w)/pi
  - uniform rotation sampling (normalized quaternions)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def hat(v):
    """[..., 3] -> skew-symmetric [..., 3, 3]."""
    zeros = jnp.zeros_like(v[..., 0])
    return jnp.stack([
        jnp.stack([zeros, -v[..., 2], v[..., 1]], -1),
        jnp.stack([v[..., 2], zeros, -v[..., 0]], -1),
        jnp.stack([-v[..., 1], v[..., 0], zeros], -1),
    ], -2)


def rotvec_to_rotmat(rotvec, tol: float = 1e-7):
    """Rodrigues' formula with small-angle Taylor guards."""
    theta = jnp.sqrt(jnp.sum(rotvec ** 2, axis=-1) + tol ** 2)
    k = hat(rotvec)
    t = theta[..., None, None]
    sin_term = jnp.sin(t) / t
    cos_term = (1.0 - jnp.cos(t)) / (t * t)
    eye = jnp.broadcast_to(jnp.eye(3), k.shape)
    return eye + sin_term * k + cos_term * (k @ k)


def rotmat_to_rotvec(rotmat):
    """Stable, differentiable logarithmic map SO(3) -> so(3) (reference:
    so3_utils.py:164-260). The angle comes from atan2 (finite gradients,
    unlike arccos at +-1); every branch of the jnp.where selections is
    NaN-free so gradients survive (0 * NaN = NaN through where cotangents)."""
    antisym = jnp.stack([
        rotmat[..., 2, 1] - rotmat[..., 1, 2],
        rotmat[..., 0, 2] - rotmat[..., 2, 0],
        rotmat[..., 1, 0] - rotmat[..., 0, 1],
    ], axis=-1)
    tr = rotmat[..., 0, 0] + rotmat[..., 1, 1] + rotmat[..., 2, 2]
    cos_theta = (tr - 1.0) / 2.0
    # |antisym| = 2 sin(theta); guarded sqrt keeps gradients finite at 0
    sin_theta = 0.5 * jnp.sqrt(jnp.sum(antisym ** 2, axis=-1) + 1e-14)
    theta = jnp.arctan2(sin_theta, cos_theta)

    # standard branch: theta/(2 sin theta) * (R - R^T)^vee, with the
    # small-angle Taylor 1/2 (1 + theta^2/6)
    small = 0.5 * (1.0 + theta ** 2 / 6.0)
    factor = jnp.where(theta < 1e-3, small,
                       theta / (2.0 * jnp.maximum(sin_theta, 1e-6)))
    vec_std = antisym * factor[..., None]

    # near-pi branch: axis magnitude from the symmetric part
    # R = I + (1 - cos)(aa^T - I) => diag gives a_i^2
    diag = jnp.stack([rotmat[..., 0, 0], rotmat[..., 1, 1],
                      rotmat[..., 2, 2]], -1)
    axis2 = jnp.clip((diag - cos_theta[..., None])
                     / jnp.maximum(1.0 - cos_theta[..., None], 1e-6),
                     0.0, 1.0)
    axis = jnp.sqrt(axis2 + 1e-12)
    # fix signs using the antisymmetric part (may vanish at exactly pi;
    # any sign choice is a valid log there)
    sign = jnp.where(antisym >= 0, 1.0, -1.0)
    vec_pi = axis * sign * theta[..., None]

    return jnp.where((jnp.pi - theta[..., None]) < 1e-3, vec_pi, vec_std)


def rot_transpose(mat):
    return jnp.swapaxes(mat, -1, -2)


def rot_mult(a, b):
    return a @ b


def calc_rot_vf(mat_t, mat_1):
    """Log_{mat_t}(mat_1) (reference: so3_utils.py:483-494)."""
    return rotmat_to_rotvec(rot_transpose(mat_t) @ mat_1)


def geodesic_t(t, mat, base_mat, rot_vf=None):
    """Exp_{base}(t * Log_{base}(mat)) (reference: so3_utils.py:497-515).
    t broadcastable with [..., 1]."""
    if rot_vf is None:
        rot_vf = calc_rot_vf(base_mat, mat)
    return base_mat @ rotvec_to_rotmat(t * rot_vf)


# -- IGSO(3) sampling --------------------------------------------------------

@functools.lru_cache(maxsize=4)
def igso3_inverse_cdf_table(num_sigma: int = 100, num_omega: int = 1024,
                            sigma_min: float = 0.01, sigma_max: float = 2.0,
                            l_max: int = 1000):
    """Precompute inverse-CDF lookup [num_sigma, num_omega] of the IGSO(3)
    angle distribution (numpy, host-side)."""
    sigmas = np.linspace(sigma_min, sigma_max, num_sigma)
    omegas = np.linspace(1e-5, np.pi - 1e-5, num_omega)
    ls = np.arange(l_max + 1)[:, None]  # [L, 1]
    # character expansion per sigma
    pdfs = []
    for s in sigmas:
        coef = (2 * ls + 1) * np.exp(-ls * (ls + 1) * s ** 2 / 2.0)
        series = (coef * np.sin((ls + 0.5) * omegas[None])
                  / np.sin(omegas[None] / 2.0)).sum(0)
        pdf = np.maximum(series, 0.0) * (1 - np.cos(omegas)) / np.pi
        cdf = np.cumsum(pdf)
        cdf = cdf / cdf[-1]
        pdfs.append(np.interp(np.linspace(0, 1, num_omega), cdf, omegas))
    return sigmas.astype(np.float32), np.stack(pdfs).astype(np.float32)


def sample_igso3(rng, sigma, shape):
    """Sample rotation matrices ~ IGSO3(sigma). sigma: scalar; shape: leading
    batch shape. Returns [..., 3, 3]."""
    sigmas, inv_cdf = igso3_inverse_cdf_table()
    si = int(np.clip(np.searchsorted(sigmas, float(sigma)), 0,
                     len(sigmas) - 1))
    table = jnp.asarray(inv_cdf[si])
    r_u, r_axis = jax.random.split(rng)
    u = jax.random.uniform(r_u, shape)
    idx = jnp.clip((u * (table.shape[0] - 1)).astype(jnp.int32), 0,
                   table.shape[0] - 1)
    omega = table[idx]
    axis = jax.random.normal(r_axis, shape + (3,))
    axis = axis / jnp.linalg.norm(axis, axis=-1, keepdims=True)
    return rotvec_to_rotmat(axis * omega[..., None])


def sample_uniform_rotations(rng, shape):
    """Uniform SO(3) via normalized quaternions."""
    q = jax.random.normal(rng, shape + (4,))
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    return quat_to_rotmat(q)


def quat_to_rotmat(q):
    """Unit quaternion [..., 4] (w, x, y, z) -> rotation matrix."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w),
                   2 * (x * z + y * w)], -1),
        jnp.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z),
                   2 * (y * z - x * w)], -1),
        jnp.stack([2 * (x * z - y * w), 2 * (y * z + x * w),
                   1 - 2 * (x * x + y * y)], -1),
    ], -2)

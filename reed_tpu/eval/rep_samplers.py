"""Representation samplers for two-stage molecule generation: sample a
global representation conditioned on atom count, then condition the point
cloud generator on it (GeoRCG/REED scheme).

Clean-room rebuild of molecule/models/rep_samplers.py:17-360:
GtSampler (draw training-set reps with matching atom counts), DDIMRepSampler
and PCRepSampler (sample reps from a trained RDM), all ending in per-sample
rep standardization.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from reed_tpu.diffusion.rdm import RDMDiffusion, rep_normalization


class GtSampler:
    """Sample ground-truth reps of training molecules with the requested
    atom counts (reference: rep_samplers.py:159-226). Host-side.

    reps: [N, D] precomputed frozen-encoder representations of the training
    set; num_atoms: [N] atom counts.
    """

    def __init__(self, reps: np.ndarray, num_atoms: np.ndarray):
        self.reps = np.asarray(reps)
        self.num_atoms = np.asarray(num_atoms)

    def sample(self, rng, nodesxsample: np.ndarray) -> jnp.ndarray:
        if not isinstance(rng, np.random.Generator):
            # accept a jax PRNG key for API parity with the RDM samplers
            seed = int(np.asarray(jax.random.key_data(rng)).ravel()[-1])
            rng = np.random.default_rng(seed)
        out = np.zeros((len(nodesxsample), self.reps.shape[1]), np.float32)
        for i, n in enumerate(np.asarray(nodesxsample)):
            idx = np.flatnonzero(self.num_atoms == n)
            if len(idx) == 0:
                # fall back to nearest atom count present in the dataset
                nearest = np.argmin(np.abs(self.num_atoms - n))
                idx = np.flatnonzero(
                    self.num_atoms == self.num_atoms[nearest])
            out[i] = self.reps[rng.choice(idx)]
        return rep_normalization(jnp.asarray(out))


class DDIMRepSampler:
    """DDIM over the rep space from a trained RDM
    (reference: rep_samplers.py:112-158)."""

    def __init__(self, diffusion: RDMDiffusion, eta: float = 1.0,
                 step_num: int = 250):
        self.diffusion = diffusion
        self.eta = eta
        self.step_num = step_num

    def sample(self, rng, nodesxsample) -> jnp.ndarray:
        n = jnp.asarray(nodesxsample, jnp.int32)
        shape = (n.shape[0], self.diffusion.cfg.channels)
        rep = self.diffusion.ddim_sample(rng, shape, n,
                                         num_steps=self.step_num,
                                         eta=self.eta)
        return rep_normalization(rep)


class PCRepSampler:
    """Predictor-corrector (VPSDE) sampling with inverse temperature
    (reference: rep_samplers.py:262-310)."""

    def __init__(self, diffusion: RDMDiffusion, n_steps: int = 1,
                 inv_temp: float = 1.0, snr: float = 0.01):
        self.diffusion = diffusion
        self.n_steps = n_steps
        self.inv_temp = inv_temp
        self.snr = snr

    def sample(self, rng, nodesxsample) -> jnp.ndarray:
        n = jnp.asarray(nodesxsample, jnp.int32)
        shape = (n.shape[0], self.diffusion.cfg.channels)
        rep = self.diffusion.pc_sample(rng, shape, n,
                                       n_corrector_steps=self.n_steps,
                                       snr=self.snr, inv_temp=self.inv_temp)
        return rep_normalization(rep)


def initialize_rep_sampler(sampler: str, **kwargs):
    """Factory mirroring reference initilize_rep_sampler
    (rep_samplers.py:311-360)."""
    if sampler == "GtSampler":
        return GtSampler(kwargs["reps"], kwargs["num_atoms"])
    if sampler == "DDIMSampler":
        return DDIMRepSampler(kwargs["diffusion"],
                              eta=kwargs.get("eta", 1.0),
                              step_num=kwargs.get("step_num", 250))
    if sampler == "PCSampler":
        return PCRepSampler(kwargs["diffusion"],
                            n_steps=kwargs.get("n_steps", 1),
                            inv_temp=kwargs.get("inv_temp", 1.0),
                            snr=kwargs.get("snr", 0.01))
    raise ValueError(f"No sampler named {sampler}")

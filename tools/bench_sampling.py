"""Generation/sampling throughput on the current accelerator.

The eval side of every REED pipeline is a long sampler loop — 250-step SDE
generation for FID-50K (image/README.md:52-64), 500-step Euler unmasking for
sequence eval (protein/fmif/train_fmif.py:464-540), 100 integrator steps per
molecule (molecule/README.md:38), T=1000 ancestral EDM sampling
(molecule/eval_src/eval_analyze.py) — so generation throughput, not just
train-step throughput, bounds wall-clock for the reference's own QC loops.
Measures each domain's sampler at its reference-recipe step count with
randomly initialized weights (throughput does not depend on the weights)
and writes BENCH_SAMPLING.json.

Usage: python tools/bench_sampling.py [image protein semla edm multiflow]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _timed(fn, *args, iters: int = 3):
    """Run fn(*args) once for compile, then `iters` timed calls; returns
    seconds per call (device_get of one leaf forces completion)."""
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / iters


def bench_image():
    from reed_tpu.core.config import MeshConfig
    from reed_tpu.train.image import ImageTrainConfig, ImageTrainer

    # reference FID recipe: SDE Euler-Maruyama, 250 steps, cfg 1.275
    # (image/README.md:52-64); CFG doubles the effective batch
    from reed_tpu.diffusion.samplers import euler_maruyama_sampler

    bs, steps, cfg_scale = 32, 250, 1.275
    tcfg = ImageTrainConfig(model="SiT-XL/2", batch_size=bs,
                            mesh=MeshConfig(data=1))
    trainer = ImageTrainer(tcfg)
    state = trainer.init_state()

    @jax.jit
    def sample(params, rng):
        def model_fn(x, t, y):
            v, _ = trainer.model.apply({"params": params}, x, t, y,
                                       train=False)
            return v

        r_z, r_y, r_sde = jax.random.split(rng, 3)
        z = jax.random.normal(r_z, (bs, tcfg.input_size, tcfg.input_size,
                                    tcfg.in_channels))
        y = jax.random.randint(r_y, (bs,), 0, tcfg.num_classes)
        return euler_maruyama_sampler(model_fn, z, y, r_sde, num_steps=steps,
                                      cfg_scale=cfg_scale,
                                      num_classes=tcfg.num_classes)

    dt = _timed(sample, state.ema_params, jax.random.PRNGKey(0), iters=2)
    return {"domain": "image-sit-xl2", "unit": "imgs/sec",
            "value": round(bs / dt, 2),
            "config": f"SiT-XL/2, SDE Euler-Maruyama {steps} steps, "
                      f"cfg {cfg_scale} (doubled batch), bs{bs}, bf16",
            "seconds_per_batch": round(dt, 2)}


def bench_protein():
    from reed_tpu.core.config import MeshConfig
    from reed_tpu.train.protein import ProteinTrainConfig, ProteinTrainer

    cfg = ProteinTrainConfig(batch_size=64, max_len=256,
                             compute_dtype="bfloat16", rng_impl="rbg",
                             mesh=MeshConfig(data=1))
    t = ProteinTrainer(cfg)
    state = t.init_state()
    batch = jax.device_put(t.synthetic_batch(), t.batch_sharding)

    def sample(params, rng):
        return t.sample(params, batch, rng)

    dt = _timed(sample, state.params, jax.random.PRNGKey(0))
    steps = cfg.interpolant.num_timesteps
    return {"domain": "protein-fmif", "unit": "seqs/sec",
            "value": round(cfg.batch_size / dt, 2),
            "tokens_per_sec": round(cfg.batch_size * cfg.max_len / dt, 1),
            "config": f"{steps}-step Euler unmasking, bs64, L256, bf16",
            "seconds_per_batch": round(dt, 2)}


def bench_semla():
    from reed_tpu.core.config import MeshConfig
    from reed_tpu.train.molecule_semla import SemlaTrainConfig, SemlaTrainer

    cfg = SemlaTrainConfig(max_atoms=72, batch_size=56, d_rep=512,
                           compute_dtype="bfloat16", mesh=MeshConfig(data=1))
    t = SemlaTrainer(cfg)
    state = t.init_state()
    rng_np = np.random.default_rng(0)
    mask = np.ones((cfg.batch_size, cfg.max_atoms), np.float32)
    prior = t.sample_prior(rng_np, mask)

    def gen(params, rng):
        return t.generate(params, rng, prior)

    dt = _timed(gen, state.ema_params, jax.random.PRNGKey(0))
    return {"domain": "molecule-semla", "unit": "molecules/sec",
            "value": round(cfg.batch_size / dt, 2),
            "config": f"{cfg.integrator.steps} integrator steps "
                      f"(reference recipe), 72 atoms, bs56, bf16+f32 coords",
            "seconds_per_batch": round(dt, 2)}


def bench_edm():
    from reed_tpu.core.config import MeshConfig
    from reed_tpu.train.molecule_edm import (MoleculeEDMConfig,
                                             MoleculeEDMTrainer)

    cfg = MoleculeEDMConfig(batch_size=64, mesh=MeshConfig(data=1))
    t = MoleculeEDMTrainer(cfg)
    state = t.init_state()
    batch = t.synthetic_batch()

    def sample(params, rng):
        return t.sample(params, rng, cfg.batch_size, batch["node_mask"],
                        batch["edge_mask"])

    dt = _timed(sample, state.ema_params, jax.random.PRNGKey(0), iters=2)
    return {"domain": "molecule-edm", "unit": "molecules/sec",
            "value": round(cfg.batch_size / dt, 2),
            "config": f"T={cfg.edm.timesteps} ancestral sampling "
                      f"(reference), QM9 n<=29, bs64, f32",
            "seconds_per_batch": round(dt, 2)}


def bench_multiflow():
    from reed_tpu.core.config import MeshConfig
    from reed_tpu.train.multiflow import (MultiflowTrainConfig,
                                          MultiflowTrainer)

    cfg = MultiflowTrainConfig(batch_size=8, max_len=128,
                               compute_dtype="bfloat16",
                               mesh=MeshConfig(data=1))
    t = MultiflowTrainer(cfg)
    state = t.init_state()

    def sample(params, rng):
        return t.sample(params, rng, cfg.batch_size, cfg.max_len)

    dt = _timed(sample, state.ema_params, jax.random.PRNGKey(0))
    steps = cfg.interpolant.num_timesteps
    return {"domain": "multiflow-se3", "unit": "structures/sec",
            "value": round(cfg.batch_size / dt, 2),
            "config": f"{steps}-step SE(3) Euler codesign sampling, "
                      f"L128, bs8, bf16",
            "seconds_per_batch": round(dt, 2)}


def main(only=None):
    benches = {"image": bench_image, "protein": bench_protein,
               "semla": bench_semla, "edm": bench_edm,
               "multiflow": bench_multiflow}
    picked = [benches[k] for k in only] if only else list(benches.values())
    results = []
    for fn in picked:
        try:
            r = fn()
        except Exception as e:
            r = {"domain": fn.__name__,
                 "error": f"{type(e).__name__}: {str(e)[:160]}"}
        results.append(r)
        print(json.dumps(r), flush=True)
    if not only:
        out = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH_SAMPLING.json")
        with open(out, "w") as f:
            json.dump({"device": jax.devices()[0].device_kind,
                       "results": results}, f, indent=2)
    return results


if __name__ == "__main__":
    main(only=sys.argv[1:] or None)

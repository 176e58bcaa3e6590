"""Capture a device trace of one domain's train step and print the top
self-time ops (grouped) — the workflow used to settle the semla bottleneck.

Usage: python tools/profile_step.py protein [outdir]
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def make_trainer(domain: str):
    from reed_tpu.core.config import MeshConfig

    if domain == "protein":
        from reed_tpu.train.protein import ProteinTrainConfig, ProteinTrainer
        # mirror bench_domains.bench_protein exactly (incl. rng_impl) so the
        # trace profiles the program the committed number measures — and so
        # the compile cache is warm right after a bench run
        return ProteinTrainer(ProteinTrainConfig(
            batch_size=64, max_len=256, compute_dtype="bfloat16",
            rng_impl="rbg", mesh=MeshConfig(data=1)))
    if domain == "edm":
        from reed_tpu.train.molecule_edm import (MoleculeEDMConfig,
                                                 MoleculeEDMTrainer)
        return MoleculeEDMTrainer(MoleculeEDMConfig(
            batch_size=64, mesh=MeshConfig(data=1)))
    if domain == "semla":
        from reed_tpu.train.molecule_semla import (SemlaTrainConfig,
                                                   SemlaTrainer)
        cfg = SemlaTrainConfig(max_atoms=72, batch_size=56, d_rep=512,
                               compute_dtype="bfloat16",
                               mesh=MeshConfig(data=1))
        t = SemlaTrainer(cfg)
        t.synthetic_batch = lambda rng=None: t.example_batch(
            cfg.batch_size, max_n=cfg.max_atoms)
        return t
    if domain == "multiflow":
        from reed_tpu.train.multiflow import (MultiflowTrainConfig,
                                              MultiflowTrainer)
        return MultiflowTrainer(MultiflowTrainConfig(
            batch_size=8, max_len=128, compute_dtype="bfloat16",
            mesh=MeshConfig(data=1)))
    raise SystemExit(f"unknown domain {domain}")


def main():
    domain = sys.argv[1] if len(sys.argv) > 1 else "protein"
    outdir = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/prof_{domain}"
    trainer = make_trainer(domain)
    state = trainer.init_state()
    batch = trainer.synthetic_batch(jax.random.PRNGKey(0))
    batch = jax.device_put(batch, trainer.batch_sharding)
    rng = jax.random.PRNGKey(0)
    with trainer.mesh:
        compiled = trainer.train_step.lower(state, batch, rng).compile()
        state, m = compiled(state, batch, rng)
        float(jax.device_get(m["loss"]))
        jax.profiler.start_trace(outdir)
        for _ in range(3):
            state, m = compiled(state, batch, rng)
        float(jax.device_get(m["loss"]))
        jax.profiler.stop_trace()

    # summarize the chrome trace directly (the tensorboard-plugin converter
    # is broken against this env's protobuf/tensorflow pair)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import trace_summary

    sys.argv = ["trace_summary", outdir, "30"]
    trace_summary.main()


if __name__ == "__main__":
    main()

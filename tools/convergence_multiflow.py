"""Convergence acceptance run: multiflow SE(3) codesign learns an ideal
helix fold + deterministic sequence rule.

Mirrors the reference's metrics-as-acceptance loop (multiflow validation
samples backbones and scores designability,
protein/multiflow/models/flow_module.py:309-417): train on randomly-rotated
ideal alpha-helices whose residue identities follow aatype[i] = i mod 20
(data/synthetic.helix_codesign_batch), then *sample* from the prior with
the Euler SE(3)+CTMC sampler and score:
  - sequence recovery vs the i-mod-20 rule (untrained ~1/20 = 0.05)
  - Kabsch RMSD of the sampled Ca trace to the ideal helix (untrained:
    a ~10 A Gaussian cloud, many-Angstrom RMSD)
  - consecutive Ca-Ca distance error vs the helical virtual bond (3.85 A)

Usage:
  python tools/convergence_multiflow.py              # TPU, full run
  python tools/convergence_multiflow.py --tiny --cpu # smoke scale
Writes CONVERGENCE_MULTIFLOW.json at the repo root (or --out).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--length", type=int, default=32)
    ap.add_argument("--c-s", type=int, default=128)
    ap.add_argument("--c-z", type=int, default=64)
    ap.add_argument("--blocks", type=int, default=3)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--sampler-steps", type=int, default=100)
    ap.add_argument("--n-eval", type=int, default=64)
    ap.add_argument("--out", default="CONVERGENCE_MULTIFLOW.json")
    ap.add_argument("--dtype", default="float32",
                    help="compute dtype (bfloat16 validates mixed "
                         "precision on the IPA stack)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from reed_tpu.core.config import (CurriculumConfig, MeshConfig,
                                      OptimConfig)
    from reed_tpu.data.synthetic import (HELIX_CA_CA, helix_ca_trace,
                                         helix_codesign_batch)
    from reed_tpu.diffusion.se3 import SE3InterpolantConfig
    from reed_tpu.eval.protein_metrics import kabsch_rmsd
    from reed_tpu.train.multiflow import MultiflowTrainConfig, MultiflowTrainer

    if args.tiny:
        args.steps = min(args.steps, 300)
        args.batch_size = 8
        args.length = 12
        args.c_s, args.c_z, args.blocks = 48, 24, 2
        args.sampler_steps = 50
        args.n_eval = 16

    cfg = MultiflowTrainConfig(
        c_s=args.c_s, c_z=args.c_z, num_blocks=args.blocks,
        batch_size=args.batch_size, max_len=args.length,
        compute_dtype=args.dtype,
        # single-motif target: the plain centered-Gaussian prior converges
        # fine without the batch-OT coupling, and keeps batches host-free
        interpolant=SE3InterpolantConfig(trans_batch_ot=False,
                                         num_timesteps=args.sampler_steps),
        optim=OptimConfig(lr=args.lr, grad_clip=1.0),
        # ema horizon ~1/(1-decay) steps must fit the run length for the
        # final_ema score to be meaningful
        curriculum=CurriculumConfig(proj_coeff=0.0,
                                    diffusion_warmup_steps=0,
                                    ema_decay=0.995),
        mesh=MeshConfig(data=1),
    )
    trainer = MultiflowTrainer(cfg)
    state = trainer.init_state()

    ideal = helix_ca_trace(args.length)
    target_aat = np.arange(args.length) % 20

    def host_batch(seed: int):
        r = np.random.default_rng(seed)
        return {k: jnp.asarray(v) for k, v in helix_codesign_batch(
            r, args.batch_size, args.length).items()}

    def score(params, seed0: int):
        """Sample n_eval structures+sequences from the prior and score."""
        bs = min(args.n_eval, 32)
        recov, rmsds, bond_errs = [], [], []
        for i in range(max(1, args.n_eval // bs)):
            out = trainer.sample(params, jax.random.PRNGKey(seed0 + i),
                                 bs, args.length)
            trans = np.asarray(jax.device_get(out["trans"]))
            aat = np.asarray(jax.device_get(out["aatypes"]))
            recov.append(float((aat == target_aat[None]).mean()))
            for b in range(bs):
                rmsds.append(kabsch_rmsd(trans[b], ideal))
                d = np.linalg.norm(np.diff(trans[b], axis=0), axis=-1)
                bond_errs.append(float(np.abs(d - HELIX_CA_CA).mean()))
        return {"recovery": float(np.mean(recov)),
                "ca_rmsd": float(np.mean(rmsds)),
                "ca_bond_err": float(np.mean(bond_errs))}

    t0 = time.time()
    s0 = score(state.params, 0)
    print(f"step-0: {s0} ({time.time()-t0:.1f}s)", flush=True)

    rng = trainer.train_rng
    losses = []
    t0 = time.time()
    for step in range(args.steps):
        state, metrics = trainer.train_step(state, host_batch(step), rng)
        if step % 200 == 0 or step == args.steps - 1:
            m = {k: round(float(jax.device_get(v)), 4)
                 for k, v in metrics.items()
                 if k in ("denoising_loss", "trans_loss", "rots_vf_loss",
                          "aatypes_loss", "loss")}
            losses.append({"step": step, **m})
            print(f"step {step}: {m}", flush=True)
    train_secs = time.time() - t0

    s_ema = score(state.ema_params, 1)
    s_final = score(state.params, 1)
    print(f"final: params={s_final} ema={s_ema}", flush=True)

    result = {
        "domain": "multiflow_se3",
        "metric": "recovery/ca_rmsd/ca_bond_err",
        "step0": s0,
        "final": s_final,
        "final_ema": s_ema,
        "chance_recovery": 1.0 / 20.0,
        "ideal_ca_ca": HELIX_CA_CA,
        "steps": args.steps,
        "train_seconds": round(train_secs, 1),
        "platform": jax.devices()[0].platform,
        "config": {"batch_size": args.batch_size, "length": args.length,
                   "c_s": args.c_s, "c_z": args.c_z, "blocks": args.blocks,
                   "lr": args.lr, "dtype": args.dtype,
                   "sampler_steps": args.sampler_steps,
                   "n_eval": args.n_eval},
        "loss_curve": losses,
        "command": "python tools/convergence_multiflow.py"
                   + (" --tiny --cpu" if args.tiny else ""),
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps({k: v for k, v in result.items()
                      if k != "loss_curve"}))
    return result


if __name__ == "__main__":
    main(sys.argv[1:])

"""Convergence acceptance run: protein inverse folding learns a
deterministic sequence<->structure rule to high recovery.

Mirrors the reference's metrics-as-acceptance loop
(protein/fmif/train_fmif.py:464-540): train, then *generate* sequences with
the Euler unmasking sampler and score sequence recovery. The data
(data/synthetic.protein_rule_batch) encodes each residue's identity in its
O-atom offset, so an untrained model scores ~1/20 = 0.05 recovery and a
correctly-learning model approaches 1.0.

Usage:
  python tools/convergence_protein.py                    # TPU, full run
  python tools/convergence_protein.py --tiny --cpu       # smoke scale
Writes CONVERGENCE_PROTEIN.json at the repo root (or --out).
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
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--length", type=int, default=48)
    ap.add_argument("--hidden", type=int, default=128)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--sampler-steps", type=int, default=200)
    ap.add_argument("--eval-batches", type=int, default=4)
    ap.add_argument("--out", default="CONVERGENCE_PROTEIN.json")
    ap.add_argument("--dtype", default="float32",
                    help="compute dtype (bfloat16 validates the mixed-"
                         "precision path: f32 logits/coords, bf16 layers)")
    ap.add_argument("--rng-impl", default="threefry",
                    help="PRNG impl (rbg validates the fast-dropout path)")
    ap.add_argument("--dropout", type=float, default=0.0)
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU (for smoke tests)")
    ap.add_argument("--tiny", action="store_true",
                    help="smoke-test scale (CI tier)")
    args = ap.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from reed_tpu.core.config import CurriculumConfig, OptimConfig
    from reed_tpu.data.synthetic import protein_rule_batch
    from reed_tpu.diffusion.discrete import MaskingInterpolantConfig
    from reed_tpu.train.protein import ProteinTrainConfig, ProteinTrainer

    if args.tiny:
        args.steps = min(args.steps, 400)
        args.batch_size = 8
        args.length = 16
        args.hidden = 64
        args.sampler_steps = 50
        args.eval_batches = 2

    cfg = ProteinTrainConfig(
        hidden_dim=args.hidden,
        k_neighbors=min(30, args.length),
        dropout=args.dropout,
        rng_impl=args.rng_impl,
        load_repr=False,
        repr_weight=0.0,
        single_dim=8, pair_dim=4, structure_dim=8,
        batch_size=args.batch_size,
        max_len=args.length,
        compute_dtype=args.dtype,
        interpolant=MaskingInterpolantConfig(num_timesteps=args.sampler_steps),
        optim=OptimConfig(lr=args.lr, grad_clip=1.0),
        # ema horizon ~1/(1-decay) steps must fit the run length for the
        # final_ema score to be meaningful (full runs are 2-5k steps)
        curriculum=CurriculumConfig(proj_coeff=0.0, diffusion_warmup_steps=0,
                                    ema_decay=0.995),
    )
    trainer = ProteinTrainer(cfg)
    state = trainer.init_state()
    rng_np = np.random.default_rng(0)
    dims = dict(single_dim=8, pair_dim=4, structure_dim=8)

    def host_batch(r):
        return {k: jnp.asarray(v) for k, v in protein_rule_batch(
            r, args.batch_size, args.length, **dims).items()}

    def recovery(params, seed0: int) -> float:
        """Sample sequences for held-out backbones; fraction recovered."""
        hits = total = 0.0
        for i in range(args.eval_batches):
            r = np.random.default_rng(10_000 + seed0 + i)
            batch = host_batch(r)
            _, final_tokens = trainer.sample(
                params, batch, jax.random.PRNGKey(seed0 + i))
            final_tokens = jax.device_get(final_tokens)
            s = jax.device_get(batch["S"])
            hits += float((final_tokens == s).sum())
            total += float(s.size)
        return hits / total

    t0 = time.time()
    rec0 = recovery(state.params, 0)
    print(f"step-0 recovery: {rec0:.4f} ({time.time()-t0:.1f}s)", flush=True)

    rng = trainer.train_rng
    losses = []
    t0 = time.time()
    for step in range(args.steps):
        batch = host_batch(np.random.default_rng(step))
        state, metrics = trainer.train_step(state, batch, rng)
        if step % 100 == 0 or step == args.steps - 1:
            loss = float(jax.device_get(metrics["denoising_loss"]))
            acc = float(jax.device_get(metrics["accuracy"]))
            losses.append({"step": step, "ce": loss, "train_acc": acc})
            print(f"step {step}: ce={loss:.4f} acc={acc:.4f}", flush=True)
    train_secs = time.time() - t0

    rec_ema = recovery(state.ema_params, 1)
    rec_final = recovery(state.params, 1)
    print(f"final recovery: params={rec_final:.4f} ema={rec_ema:.4f}",
          flush=True)

    result = {
        "domain": "protein_fmif",
        "metric": "sequence_recovery",
        "step0": rec0,
        "final": rec_final,
        "final_ema": rec_ema,
        "chance": 1.0 / 20.0,
        "steps": args.steps,
        "train_seconds": round(train_secs, 1),
        "platform": jax.devices()[0].platform,
        "config": {"batch_size": args.batch_size, "length": args.length,
                   "hidden": args.hidden, "lr": args.lr,
                   "dtype": args.dtype, "rng_impl": args.rng_impl,
                   "dropout": args.dropout,
                   "sampler_steps": args.sampler_steps},
        "loss_curve": losses,
        "command": "python tools/convergence_protein.py"
                   + (" --tiny --cpu" if args.tiny else "")
                   + (f" --dtype {args.dtype}"
                      if args.dtype != "float32" else "")
                   + (f" --rng-impl {args.rng_impl}"
                      if args.rng_impl != "threefry" else "")
                   + (f" --dropout {args.dropout}" if args.dropout else ""),
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps({k: v for k, v in result.items() if k != "loss_curve"}))
    return result


if __name__ == "__main__":
    main(sys.argv[1:])

"""Convergence acceptance run: the RDM latent DDPM learns a
class-conditional representation distribution.

Mirrors the reference's two-stage GeoRCG QC (the RDM must place sampled
representations where the downstream generator expects them,
molecule/repdiffusion/trainer.py sampling/eval loop): train the
SimpleMLP DDPM on class-conditional Gaussians keyed by num_atoms
(data/synthetic.rdm_gaussian_batch: orthogonal means |mu|=2, sigma=0.25,
~11-sigma separation), then sample with DDIM conditioned on each class and
score:
  - nearest-mean classification accuracy (untrained ~1/4 chance)
  - per-class sample-mean error vs the true mean (untrained ~|mu| = 2)
  - RMS spread vs the true sigma*sqrt(C)

Usage:
  python tools/convergence_rdm.py              # TPU, full run
  python tools/convergence_rdm.py --tiny --cpu # smoke scale
Writes CONVERGENCE_RDM.json at the repo root (or --out).
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
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--channels", type=int, default=64)
    ap.add_argument("--model-channels", type=int, default=256)
    ap.add_argument("--blocks", type=int, default=4)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--ddim-steps", type=int, default=100)
    ap.add_argument("--n-eval", type=int, default=512)
    ap.add_argument("--out", default="CONVERGENCE_RDM.json")
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
    from reed_tpu.data.synthetic import (RDM_CLASS_SIGMA, RDM_CLASS_SIZES,
                                         rdm_class_means, rdm_gaussian_batch)
    from reed_tpu.train.rdm import RDMTrainConfig, RDMTrainer

    if args.tiny:
        args.steps = min(args.steps, 400)
        args.batch_size = 64
        args.channels = 16
        args.model_channels = 64
        args.blocks = 2
        args.ddim_steps = 50
        args.n_eval = 128

    cfg = RDMTrainConfig(
        channels=args.channels, model_channels=args.model_channels,
        bottleneck_channels=args.model_channels,
        num_res_blocks=args.blocks, time_embed_dim=args.model_channels,
        max_nodes=max(RDM_CLASS_SIZES) + 2,
        batch_size=args.batch_size,
        optim=OptimConfig(lr=args.lr, weight_decay=0.0, schedule="constant",
                          warmup_steps=0, grad_clip=1.0),
        # ema horizon ~1/(1-decay) steps must fit the run length for the
        # final_ema score to be meaningful
        curriculum=CurriculumConfig(proj_coeff=0.0,
                                    diffusion_warmup_steps=0,
                                    ema_decay=0.995),
        mesh=MeshConfig(data=1),
    )
    trainer = RDMTrainer(cfg)
    state = trainer.init_state()
    mus = rdm_class_means(args.channels)
    k_classes = len(RDM_CLASS_SIZES)

    def host_batch(seed: int):
        r = np.random.default_rng(seed)
        b = rdm_gaussian_batch(r, args.batch_size, args.channels)
        return {"rep": jnp.asarray(b["rep"]),
                "num_atoms": jnp.asarray(b["num_atoms"])}

    def sample_reps(params, rng, n_nodes):
        # same pattern as the eval-molecule CLI (cli.py DDIMRepSampler):
        # the diffusion tables are host numpy, so build outside jit; the
        # scan-based ddim_sample closes over this tiny model's params
        # (fine at this scale, and matches the production path)
        diff = trainer.diffusion(params)
        return diff.ddim_sample(rng, (n_nodes.shape[0], args.channels),
                                n_nodes, num_steps=args.ddim_steps, eta=0.0)

    def score(params, seed0: int):
        per_class = args.n_eval // k_classes
        k = np.repeat(np.arange(k_classes), per_class)
        n_nodes = jnp.asarray(np.asarray(RDM_CLASS_SIZES)[k], jnp.int32)
        rep = np.asarray(jax.device_get(
            sample_reps(params, jax.random.PRNGKey(seed0), n_nodes)))
        d = np.linalg.norm(rep[:, None] - mus[None], axis=-1)  # [B,K]
        acc = float((d.argmin(1) == k).mean())
        # per-class sample-mean error: discriminative in any dimension
        # (untrained collapses to 0 -> err = |mu| = 2; perfect model ->
        # ~sigma*sqrt(C/n) ~ 0), unlike per-sample distance-to-mu which
        # concentrates at sigma*sqrt(C) for a PERFECT model in high dim
        mean_err, spread = 0.0, 0.0
        for kk in range(k_classes):
            r = rep[k == kk]
            mean_err += float(np.linalg.norm(r.mean(0) - mus[kk]))
            spread += float(np.sqrt(((r - r.mean(0)) ** 2).sum(-1).mean()))
        mean_err /= k_classes
        spread /= k_classes
        return {"class_acc": acc, "class_mean_err": mean_err,
                "rms_spread": spread}

    t0 = time.time()
    s0 = score(state.params, 0)
    print(f"step-0: {s0} ({time.time()-t0:.1f}s)", flush=True)

    rng = trainer.train_rng
    losses = []
    t0 = time.time()
    for step in range(args.steps):
        state, metrics = trainer.train_step(state, host_batch(step), rng)
        if step % 200 == 0 or step == args.steps - 1:
            loss = float(jax.device_get(metrics["denoising_loss"]))
            losses.append({"step": step, "loss": round(loss, 5)})
            print(f"step {step}: loss={loss:.5f}", flush=True)
    train_secs = time.time() - t0

    s_ema = score(state.ema_params, 1)
    s_final = score(state.params, 1)
    print(f"final: params={s_final} ema={s_ema}", flush=True)

    result = {
        "domain": "rdm",
        "metric": "class_acc/class_mean_err/rms_spread",
        "untrained_mean_err": 2.0,
        "step0": s0,
        "final": s_final,
        "final_ema": s_ema,
        "chance_acc": 1.0 / k_classes,
        "true_sigma_spread": RDM_CLASS_SIGMA * float(np.sqrt(args.channels)),
        "steps": args.steps,
        "train_seconds": round(train_secs, 1),
        "platform": jax.devices()[0].platform,
        "config": {"batch_size": args.batch_size,
                   "channels": args.channels,
                   "model_channels": args.model_channels,
                   "blocks": args.blocks, "lr": args.lr,
                   "ddim_steps": args.ddim_steps, "n_eval": args.n_eval},
        "loss_curve": losses,
        "command": "python tools/convergence_rdm.py"
                   + (" --tiny --cpu" if args.tiny else ""),
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps({k: v for k, v in result.items()
                      if k != "loss_curve"}))
    return result


if __name__ == "__main__":
    main(sys.argv[1:])

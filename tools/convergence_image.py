"""Convergence acceptance run: class-conditional SiT flow matching learns
a separable latent distribution to near-perfect class fidelity.

Mirrors the reference's in-loop preview QC (image/train.py:431-454: sample
with the ODE sampler every N steps and inspect): train SiT on K
well-separated gaussian classes in latent space, then sample each class
with the Euler ODE sampler and classify generations by nearest class mean.
Untrained: ~1/K accuracy. Learned: ~1.0 plus small distance to the class
mean.

Usage:
  python tools/convergence_image.py                  # TPU, full run
  python tools/convergence_image.py --tiny --cpu     # smoke scale
Writes CONVERGENCE_IMAGE.json at the repo root (or --out).
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
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--model", default="SiT-S/4")
    ap.add_argument("--classes", type=int, default=8)
    ap.add_argument("--noise", type=float, default=0.25)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--sampler-steps", type=int, default=50)
    ap.add_argument("--n-eval", type=int, default=256)
    ap.add_argument("--out", default="CONVERGENCE_IMAGE.json")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from reed_tpu.core.config import CurriculumConfig, OptimConfig
    from reed_tpu.diffusion.continuous import FlowMatchingLossConfig
    from reed_tpu.diffusion.samplers import euler_sampler
    from reed_tpu.train.image import ImageTrainConfig, ImageTrainer

    if args.tiny:
        args.steps = min(args.steps, 400)
        args.batch_size = 32
        args.sampler_steps = 20
        args.n_eval = 64

    size, chans = 8, 4
    cfg = ImageTrainConfig(
        model=args.model, input_size=size, in_channels=chans,
        num_classes=args.classes, encoder_depth=2, z_dims=(16,),
        z_types=("i",), projector_dim=32, class_dropout_prob=0.1,
        compute_dtype="float32", batch_size=args.batch_size,
        loss=FlowMatchingLossConfig(enc_names=("dinov2",),
                                    loss_weights=(0.0,)),
        optim=OptimConfig(lr=args.lr, grad_clip=1.0),
        curriculum=CurriculumConfig(proj_coeff=0.0, diffusion_warmup_steps=0,
                                    ema_decay=0.995),
    )
    trainer = ImageTrainer(cfg)
    state = trainer.init_state()

    # fixed, well-separated class means (||mu_i - mu_j|| ~ sqrt(2*256) >> noise)
    mu = np.random.default_rng(7).standard_normal(
        (args.classes, size, size, chans)).astype(np.float32)
    num_tokens = (size // 4) ** 2

    def host_batch(r: np.random.Generator):
        y = r.integers(0, args.classes, size=args.batch_size)
        x = mu[y] + args.noise * r.standard_normal(
            (args.batch_size, size, size, chans)).astype(np.float32)
        zs = [r.standard_normal((args.batch_size, num_tokens, 16)
                                ).astype(np.float32)]
        return {"x": jnp.asarray(x), "y": jnp.asarray(y, jnp.int32),
                "zs": [jnp.asarray(z) for z in zs]}

    mu_flat = mu.reshape(args.classes, -1)

    def score(params, seed: int):
        """Sample each class; nearest-class-mean accuracy + distance."""
        r = jax.random.PRNGKey(seed)
        y = np.tile(np.arange(args.classes), args.n_eval // args.classes)

        @jax.jit
        def run(params, noise, y):
            def model_fn(x, t, yy):
                v, _ = trainer.model.apply({"params": params}, x, t, yy,
                                           train=False)
                return v

            return euler_sampler(model_fn, noise, y,
                                 num_steps=args.sampler_steps,
                                 num_classes=args.classes)

        noise = jax.random.normal(r, (len(y), size, size, chans))
        samples = np.asarray(jax.device_get(
            run(params, noise, jnp.asarray(y, jnp.int32))))
        flat = samples.reshape(len(y), -1)
        d = np.linalg.norm(flat[:, None] - mu_flat[None], axis=-1)
        pred = d.argmin(-1)
        acc = float((pred == y).mean())
        dist_own = float(d[np.arange(len(y)), y].mean())
        return {"class_accuracy": acc, "mean_dist_to_class_mean": dist_own}

    t0 = time.time()
    m0 = score(state.params, 0)
    print(f"step-0: {m0} ({time.time()-t0:.1f}s)", flush=True)

    rng = trainer.train_rng
    losses = []
    t0 = time.time()
    for step in range(args.steps):
        batch = host_batch(np.random.default_rng(step))
        state, metrics = trainer.train_step(state, batch, rng)
        if step % 200 == 0 or step == args.steps - 1:
            loss = float(jax.device_get(metrics["denoising_loss"]))
            losses.append({"step": step, "loss": loss})
            print(f"step {step}: loss={loss:.4f}", flush=True)
    train_secs = time.time() - t0

    m_ema = score(state.ema_params, 1)
    m_final = score(state.params, 1)
    print(f"final: params={m_final} ema={m_ema}", flush=True)

    result = {
        "domain": "image_sit",
        "metric": "class_accuracy/mean_dist_to_class_mean",
        "step0": m0,
        "final": m_final,
        "final_ema": m_ema,
        "chance": 1.0 / args.classes,
        "steps": args.steps,
        "train_seconds": round(train_secs, 1),
        "platform": jax.devices()[0].platform,
        "config": {"model": args.model, "batch_size": args.batch_size,
                   "classes": args.classes, "noise": args.noise,
                   "lr": args.lr, "sampler_steps": args.sampler_steps},
        "loss_curve": losses,
        "command": "python tools/convergence_image.py"
                   + (" --tiny --cpu" if args.tiny else ""),
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps({k: v for k, v in result.items() if k != "loss_curve"}))
    return result


if __name__ == "__main__":
    main(sys.argv[1:])

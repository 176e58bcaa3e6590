"""Sweep SiT-XL/2 train-step throughput across batch/remat/attention
configurations on the current accelerator. Prints one line per config."""

import time

import jax
import jax.numpy as jnp

from reed_tpu.core.config import CurriculumConfig, MeshConfig, OptimConfig
from reed_tpu.diffusion.continuous import FlowMatchingLossConfig
from reed_tpu.train.image import ImageTrainConfig, ImageTrainer


def run(batch, remat, attn_impl, steps=10, mu_dtype=None, ema_dtype=None,
        ema_every=1, input_size=32):
    cfg = ImageTrainConfig(
        model="SiT-XL/2", input_size=input_size, num_classes=1000,
        encoder_depth=8, encoder_depth_text=16,
        z_dims=(768, 3584), z_types=("i", "t"), projector_dim=2048,
        compute_dtype="bfloat16", remat=remat, attn_impl=attn_impl,
        batch_size=batch,
        loss=FlowMatchingLossConfig(enc_names=("dinov2", "qwen"),
                                    loss_weights=(1.0, 0.5)),
        optim=OptimConfig(lr=1e-4, grad_clip=1.0, mu_dtype=mu_dtype),
        curriculum=CurriculumConfig(proj_coeff=0.5,
                                    diffusion_warmup_steps=50_000,
                                    max_steps=1_000_000,
                                    ema_dtype=ema_dtype,
                                    ema_every=ema_every),
        mesh=MeshConfig(data=1),
    )
    try:
        trainer = ImageTrainer(cfg)
        state = trainer.init_state()
        data = trainer.synthetic_batch(jax.random.PRNGKey(0))
        rng = jax.random.PRNGKey(0)
        with trainer.mesh:
            state, m = trainer.train_step(state, data, rng)
            float(jax.device_get(m["loss"]))
            t0 = time.perf_counter()
            for _ in range(steps):
                state, m = trainer.train_step(state, data, rng)
            float(jax.device_get(m["loss"]))
            dt = time.perf_counter() - t0
        print(f"size={input_size} batch={batch} remat={remat} "
              f"attn={attn_impl} mu={mu_dtype} ema={ema_dtype} "
              f"ema_every={ema_every}: "
              f"{batch * steps / dt:.1f} imgs/s", flush=True)
    except Exception as e:
        print(f"batch={batch} remat={remat} attn={attn_impl} "
              f"mu={mu_dtype} ema={ema_dtype}: FAILED "
              f"{type(e).__name__}: {str(e)[:120]}", flush=True)
    finally:
        pass


if __name__ == "__main__":
    import sys

    if len(sys.argv) > 1 and sys.argv[1] == "512":
        # 512px = input_size 64 -> S=1024 at p2 (SURVEY §5.7 extension).
        # remat policy hunt (VERDICT r3 #5): no-remat bs8 is the r3 anchor
        # (25.4 imgs/s); full remat and selective policies buy batch room
        # if the axon remote-compile helper accepts them
        configs = [
            dict(batch=8, remat=False, attn_impl="auto", input_size=64,
                 mu_dtype="bfloat16", ema_every=8, steps=10),
            dict(batch=16, remat=True, attn_impl="auto", input_size=64,
                 mu_dtype="bfloat16", ema_every=8, steps=10),
            dict(batch=32, remat=True, attn_impl="auto", input_size=64,
                 mu_dtype="bfloat16", ema_every=8, steps=10),
            dict(batch=16, remat="dots_saveable", attn_impl="auto",
                 input_size=64, mu_dtype="bfloat16", ema_every=8, steps=10),
            dict(batch=32, remat="dots_saveable", attn_impl="auto",
                 input_size=64, mu_dtype="bfloat16", ema_every=8, steps=10),
            dict(batch=16, remat="dots", attn_impl="auto", input_size=64,
                 mu_dtype="bfloat16", ema_every=8, steps=10),
        ]
    else:
        configs = [
            dict(batch=48, remat=False, attn_impl="pallas",
                 mu_dtype="bfloat16", ema_every=8, steps=30),
            dict(batch=48, remat=False, attn_impl="xla",
                 mu_dtype="bfloat16", ema_every=8, steps=30),
        ]
    for c in configs:
        run(**c)

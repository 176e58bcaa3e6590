"""Benchmark: SiT-XL/2 REED training throughput (imgs/sec/chip).

Runs the full REED image train step (flow-matching v-pred loss + DINOv2-dim
per-token alignment + text-dim pooled alignment, Adam, EMA, curriculum) on
the available accelerator and prints ONE JSON line.

Baseline: the reference recipe trains SiT-XL/2 at global batch 256 with fp16
on A100-class GPUs (image/README.md:25-43). Published SiT/REPA training logs
put SiT-XL/2 + REPA at ~5.3 it/s at global bs 256 on 8xA100 ≈ 170 imgs/sec
per A100 chip; we use that as the per-chip baseline for vs_baseline.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

BASELINE_IMGS_PER_SEC_PER_CHIP = 170.0

# bf16 peak TFLOP/s per chip for MFU accounting
PEAK_TFLOPS = {"v5e": 197.0, "v5litepod": 197.0, "v5p": 459.0,
               "v4": 275.0, "v6e": 918.0}


def _peak_tflops() -> float:
    kind = jax.devices()[0].device_kind.lower()
    for key, tf in PEAK_TFLOPS.items():
        if key in kind:
            return tf
    return 197.0  # assume v5e-class when unknown (axon reports v5e)


def sit_xl_train_flops_per_img(seq: int = 256, hidden: int = 1152,
                               depth: int = 28, params: float = 675e6
                               ) -> float:
    """Analytic train-step FLOPs per image: 6·N·S for the dense matmuls
    (fwd 2NS + bwd 4NS) plus the attention score/value matmuls
    (12·S²·D per layer across fwd+bwd)."""
    dense = 6.0 * params * seq
    attn = 12.0 * seq * seq * hidden * depth
    return dense + attn


def main():
    from reed_tpu.core.config import CurriculumConfig, MeshConfig, OptimConfig
    from reed_tpu.diffusion.continuous import FlowMatchingLossConfig
    from reed_tpu.train.image import ImageTrainConfig, ImageTrainer

    n_dev = len(jax.devices())
    platform = jax.devices()[0].platform
    # Per-chip batch 48 without remat, adam mu in bf16 (frees the HBM that
    # bs48 activations need) and EMA applied every 8 steps with decay^8
    # (same average, skips the 8GB/step EMA read-modify-write on 7/8 steps).
    # Measured on v5e 16GB: 150.8 imgs/s vs 144.8 at the old bs32/f32
    # config; bf16 EMA reaches 153 but stalls (updates round away below the
    # bf16 ulp at decay 0.9999), so EMA stays f32. See tools/bench_sweep.py.
    batch = 48 * n_dev

    cfg = ImageTrainConfig(
        model="SiT-XL/2",
        input_size=32,
        in_channels=4,
        num_classes=1000,
        encoder_depth=8,
        encoder_depth_text=16,
        z_dims=(768, 3584),
        z_types=("i", "t"),
        projector_dim=2048,
        compute_dtype="bfloat16" if platform == "tpu" else "float32",
        remat=False,
        batch_size=batch,
        loss=FlowMatchingLossConfig(enc_names=("dinov2", "qwen"),
                                    loss_weights=(1.0, 0.5)),
        optim=OptimConfig(lr=1e-4, grad_clip=1.0, mu_dtype="bfloat16"),
        curriculum=CurriculumConfig(proj_coeff=0.5,
                                    diffusion_warmup_steps=50_000,
                                    max_steps=1_000_000,
                                    ema_every=8),
        mesh=MeshConfig(data=n_dev, fsdp=1, tensor=1),
    )
    trainer = ImageTrainer(cfg)
    state = trainer.init_state()
    batch_data = trainer.synthetic_batch(jax.random.PRNGKey(42))
    batch_data = jax.device_put(batch_data, trainer.batch_sharding)

    rng = jax.random.PRNGKey(0)
    with trainer.mesh:
        # warmup/compile; device_get forces real execution (block_until_ready
        # alone is unreliable through the experimental axon transport)
        state, metrics = trainer.train_step(state, batch_data, rng)
        float(jax.device_get(metrics["loss"]))
        n_steps = 20
        t0 = time.perf_counter()
        for _ in range(n_steps):
            state, metrics = trainer.train_step(state, batch_data, rng)
        final_loss = float(jax.device_get(metrics["loss"]))
        dt = time.perf_counter() - t0
        assert jnp.isfinite(final_loss), final_loss

    imgs_per_sec_per_chip = batch * n_steps / dt / n_dev
    flops_per_img = sit_xl_train_flops_per_img()
    peak = _peak_tflops()
    mfu = imgs_per_sec_per_chip * flops_per_img / (peak * 1e12)
    # Roofline context (BASELINE.md "Roofline"): at >80% MFU this chip is
    # compute-bound, so vs_baseline reflects peak-TFLOPs ratio vs the A100
    # anchor, not a software gap. Project to v5p at equal MFU for the
    # north-star (>=1.5x on v5p-64) comparison.
    ceiling = peak * 1e12 / flops_per_img
    v5p_proj = imgs_per_sec_per_chip * PEAK_TFLOPS["v5p"] / peak
    print(json.dumps({
        "metric": "imgs/sec/chip",
        "value": round(imgs_per_sec_per_chip, 2),
        "unit": "imgs/sec/chip (SiT-XL/2 REED train step, bs48/chip)",
        "vs_baseline": round(imgs_per_sec_per_chip / BASELINE_IMGS_PER_SEC_PER_CHIP, 3),
        "mfu": round(mfu, 4),
        "chip_peak_tflops": peak,
        "chip_roofline_imgs_per_sec": round(ceiling, 1),
        "pct_of_chip_roofline": round(imgs_per_sec_per_chip / ceiling, 3),
        "v5p_projection_imgs_per_sec": round(v5p_proj, 1),
        "v5p_projection_vs_baseline": round(
            v5p_proj / BASELINE_IMGS_PER_SEC_PER_CHIP, 2),
    }))


if __name__ == "__main__":
    main()

"""FID generation harness: sample 50K class-conditional images and write the
`.npz` consumed by the OpenAI ADM evaluation suite.

Clean-room rebuild of image/generate.py:37-174 — the reference shards 50K
samples across NCCL ranks with rank-interleaved global indices and gathers
PNGs to an npz; here sampling is one jitted scan over the device mesh
(batch sharded on 'data'), decoded latents are fetched to host per batch,
and rank-0 (process 0) writes the npz directly.

The VAE decoder is pluggable: pass `decode_fn(latents_nhwc) -> uint8 images`
(e.g. a JAX SD-VAE port or a host-side torch decoder process).
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from reed_tpu.diffusion.samplers import euler_maruyama_sampler, euler_sampler


@dataclass
class FIDGenConfig:
    num_samples: int = 50_000
    batch_size: int = 256            # global
    num_classes: int = 1000
    latent_size: int = 32
    latent_channels: int = 4
    mode: str = "sde"                # sde | ode
    num_steps: int = 250
    cfg_scale: float = 1.0
    guidance_low: float = 0.0
    guidance_high: float = 1.0
    heun: bool = False
    path_type: str = "linear"
    seed: int = 0
    latents_scale: float = 0.18215
    latents_bias: float = 0.0


def generate_samples(model_fn: Callable, params, cfg: FIDGenConfig,
                     decode_fn: Optional[Callable] = None,
                     out_npz: Optional[str] = None,
                     mesh=None) -> np.ndarray:
    """model_fn(params, x, t, y) -> velocity (EMA weights, projector-free).
    `params` is threaded through jit explicitly (closing over them would
    bake every weight into the lowered module as a constant).

    Returns [N, H, W, 3] uint8 samples (or latents if decode_fn is None),
    and writes `out_npz` when given (reference npz layout:
    image/generate.py:20-34).

    When `mesh` is given, the sample batch is sharded over the mesh's
    data(+fsdp) axes and params are replicated — the TPU equivalent of the
    reference's rank-interleaved DDP generation (image/generate.py:106-166).
    Because per-sample computation is batch-independent and the RNG draws
    are made from the same key regardless of layout, the gathered samples
    match the single-device run (pinned by dryrun_multichip and
    tests/test_mesh_sampling.py)."""
    import contextlib

    n_iters = math.ceil(cfg.num_samples / cfg.batch_size)

    batch_shard = None
    if mesh is not None:
        from reed_tpu.parallel.mesh import batch_sharding, replicated

        batch_shard = batch_sharding(mesh)
        params = jax.device_put(params, replicated(mesh))

    @jax.jit
    def sample_batch(params, rng):
        def bound_model_fn(x, t, y):
            return model_fn(params, x, t, y)

        r_z, r_y, r_sde = jax.random.split(rng, 3)
        z = jax.random.normal(
            r_z, (cfg.batch_size, cfg.latent_size, cfg.latent_size,
                  cfg.latent_channels))
        y = jax.random.randint(r_y, (cfg.batch_size,), 0, cfg.num_classes)
        if batch_shard is not None:
            z = jax.lax.with_sharding_constraint(z, batch_shard)
            y = jax.lax.with_sharding_constraint(y, batch_shard)
        kwargs = dict(num_steps=cfg.num_steps, cfg_scale=cfg.cfg_scale,
                      guidance_low=cfg.guidance_low,
                      guidance_high=cfg.guidance_high,
                      num_classes=cfg.num_classes, path_type=cfg.path_type)
        if cfg.mode == "sde":
            x = euler_maruyama_sampler(bound_model_fn, z, y, r_sde, **kwargs)
        else:
            x = euler_sampler(bound_model_fn, z, y, heun=cfg.heun, **kwargs)
        return x / cfg.latents_scale + cfg.latents_bias

    import time

    outs = []
    base_rng = jax.random.PRNGKey(cfg.seed)
    t0 = None
    with (mesh if mesh is not None else contextlib.nullcontext()):
        for i in range(n_iters):
            latents = sample_batch(params, jax.random.fold_in(base_rng, i))
            latents = np.asarray(jax.device_get(latents))
            if i == 0:
                t0 = time.perf_counter()  # exclude the compile iteration
            if decode_fn is not None:
                imgs = decode_fn(latents)
            else:
                imgs = latents
            outs.append(imgs)
    if n_iters > 1 and t0 is not None:
        dt = time.perf_counter() - t0
        per_batch = dt / (n_iters - 1)
        print(f"sampler throughput: {cfg.num_steps / per_batch:.1f} "
              f"steps/sec at batch {cfg.batch_size} "
              f"({cfg.batch_size / per_batch:.1f} imgs/sec)")
    samples = np.concatenate(outs, axis=0)[:cfg.num_samples]

    if out_npz is not None and jax.process_index() == 0:
        os.makedirs(os.path.dirname(out_npz) or ".", exist_ok=True)
        np.savez(out_npz, arr_0=samples)
        print(f"saved {samples.shape} -> {out_npz}")
    return samples


def strip_projector_params(params):
    """Drop projector weights from a SiT param tree for inference ckpts
    (reference: image/generate.py:77-85)."""
    return {k: v for k, v in params.items()
            if not k.startswith("projectors_")}


def save_params_npz(path: str, variables):
    """Flatten a variables pytree into a flat 'a/b/c' npz."""
    from flax.traverse_util import flatten_dict

    flat = {"/".join(k): np.asarray(v)
            for k, v in flatten_dict(variables).items()}
    np.savez(path, **flat)


def load_params_npz(path: str):
    from flax.traverse_util import unflatten_dict

    z = np.load(path)
    return unflatten_dict({tuple(k.split("/")): z[k] for k in z.files})


def make_vae_decode_fn(vae_npz: Optional[str] = None,
                       latent_size: int = 32, latent_channels: int = 4,
                       _random_init_for_tests: bool = False):
    """Build decode_fn(latents)->uint8 pixels from a converted SD-VAE
    decoder npz (tools/convert_vae.py writes it from the diffusers
    checkpoint; reference decodes per batch at image/generate.py:156-171).

    generate_samples already un-scales latents (x / 0.18215), so the decoder
    applies directly. Returns None when no weights are available."""
    from reed_tpu.encoders.vae import VAEDecoder

    decoder = VAEDecoder()
    if vae_npz is not None:
        variables = load_params_npz(vae_npz)
    elif _random_init_for_tests:
        variables = decoder.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, latent_size, latent_size, latent_channels)))
    else:
        return None

    @jax.jit
    def _decode(variables, latents):
        x = decoder.apply(variables, latents)
        x = jnp.clip((x + 1.0) / 2.0, 0.0, 1.0)
        return (x * 255.0 + 0.5).astype(jnp.uint8)

    def decode_fn(latents):
        return np.asarray(jax.device_get(
            _decode(variables, jnp.asarray(latents))))

    return decode_fn

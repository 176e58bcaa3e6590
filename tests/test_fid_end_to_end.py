"""The whole FID path composes: train a tiny SiT on a learnable latent
distribution -> generate with the sharded FID harness (eval/fid.py) ->
activation stats (eval/frechet.py StreamingMoments) -> Frechet distance,
asserting FID(generated, train) < FID(prior noise, train).

The feature extractor is a stub (fixed random linear projection of the
latents) — the Inception weights stay env-gated — so this pins the
*composition* of generate-image -> stats -> compute-fid, the part the
reference delegates to the external ADM suite (image/README.md:49-63).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reed_tpu.core.config import CurriculumConfig, MeshConfig, OptimConfig
from reed_tpu.diffusion.continuous import FlowMatchingLossConfig
from reed_tpu.eval.fid import FIDGenConfig, generate_samples
from reed_tpu.eval.frechet import compute_activation_stats, frechet_distance
from reed_tpu.train.image import ImageTrainConfig, ImageTrainer


def _latent_mu(size: int, channels: int) -> np.ndarray:
    """Fixed strongly-structured mean pattern (checkerboard +-1.5)."""
    ij = np.add.outer(np.arange(size), np.arange(size)) % 2
    pat = np.where(ij[..., None] > 0, 1.5, -1.5)
    return np.broadcast_to(pat, (size, size, channels)).astype(np.float32)


@pytest.mark.slow
def test_fid_pipeline_end_to_end_with_stub_features():
    size, channels = 8, 4
    mu = _latent_mu(size, channels)

    cfg = ImageTrainConfig(
        model="SiT-S/4", input_size=size, in_channels=channels,
        num_classes=4, encoder_depth=2, z_dims=(16,), z_types=("i",),
        projector_dim=32, batch_size=32,
        loss=FlowMatchingLossConfig(enc_names=("dinov2",),
                                    loss_weights=(1.0,)),
        optim=OptimConfig(lr=2e-3, grad_clip=1.0),
        # ema horizon ~1/(1-decay) must fit the 250-step run (the default
        # 0.9999 horizon would leave the EMA at its init)
        curriculum=CurriculumConfig(proj_coeff=0.0, diffusion_warmup_steps=0,
                                    max_steps=250, ema_decay=0.95),
        mesh=MeshConfig(data=1),
    )
    trainer = ImageTrainer(cfg)
    state = trainer.init_state()

    def batch_at(step: int):
        b = trainer.synthetic_batch(jax.random.PRNGKey(step))
        noise = jax.random.normal(jax.random.fold_in(
            jax.random.PRNGKey(9000), step), b["x"].shape)
        b["x"] = jnp.asarray(mu)[None] + 0.2 * noise
        return b

    with trainer.mesh:
        for step in range(250):
            state, metrics = trainer.train_step(state, batch_at(step),
                                                trainer.train_rng)
    assert np.isfinite(float(metrics["loss"]))

    # generation through the real FID harness (EMA weights, SDE sampler)
    def model_fn(params, x, t, y):
        v, _ = trainer.model.apply({"params": params}, x, t, y, train=False)
        return v

    gen_cfg = FIDGenConfig(num_samples=256, batch_size=128, num_classes=4,
                           latent_size=size, latent_channels=channels,
                           mode="sde", num_steps=16, cfg_scale=1.0,
                           latents_scale=1.0, seed=11)
    gen = generate_samples(model_fn, state.ema_params, gen_cfg)

    rng = np.random.default_rng(3)
    train_set = mu[None] + 0.2 * rng.standard_normal(
        (256, size, size, channels)).astype(np.float32)
    noise_set = rng.standard_normal(
        (256, size, size, channels)).astype(np.float32)

    proj = np.asarray(
        np.random.default_rng(7).standard_normal(
            (size * size * channels, 16)), np.float32) / np.sqrt(
                size * size * channels)

    def feature_fn(images):
        return images.reshape(images.shape[0], -1) @ proj

    s_train = compute_activation_stats(train_set, feature_fn)
    s_gen = compute_activation_stats(np.asarray(gen), feature_fn)
    s_noise = compute_activation_stats(noise_set, feature_fn)

    fid_gen = frechet_distance(s_gen["mu"], s_gen["sigma"],
                               s_train["mu"], s_train["sigma"])
    fid_noise = frechet_distance(s_noise["mu"], s_noise["sigma"],
                                 s_train["mu"], s_train["sigma"])
    assert np.isfinite(fid_gen) and np.isfinite(fid_noise)
    # the trained model's samples must be meaningfully closer to the train
    # distribution than the prior
    assert fid_gen < 0.5 * fid_noise, (fid_gen, fid_noise)

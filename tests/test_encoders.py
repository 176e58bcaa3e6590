"""Frozen encoder registry + JAX ViT."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reed_tpu.encoders.registry import (
    TEXT_Z_DIM_DICT,
    FrozenEncoder,
    load_encoders,
    load_npz_params,
    save_npz_params,
)
from reed_tpu.encoders.vit import ViT, ViTConfig, resample_pos_embed


def test_vit_forward_shapes():
    cfg = ViTConfig(image_size=28, patch_size=14, hidden_size=32, depth=2,
                    num_heads=2)
    model = ViT(cfg)
    x = jnp.zeros((2, 28, 28, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    patches = model.apply(variables, x, output="patch")
    assert patches.shape == (2, 4, 32)
    cls = model.apply(variables, x, output="cls")
    assert cls.shape == (2, 32)
    pooled = model.apply(variables, x, output="pooled")
    assert pooled.shape == (2, 32)


def test_vit_register_tokens():
    cfg = ViTConfig(image_size=28, patch_size=14, hidden_size=32, depth=1,
                    num_heads=2, num_register_tokens=4)
    model = ViT(cfg)
    x = jnp.zeros((1, 28, 28, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    patches = model.apply(variables, x, output="patch")
    assert patches.shape == (1, 4, 32)  # registers stripped


def test_pos_embed_resample():
    pos = jnp.asarray(np.random.default_rng(0).standard_normal((1, 17, 8)),
                      jnp.float32)  # cls + 4x4 grid
    out = resample_pos_embed(pos, 8, 8)
    assert out.shape == (1, 65, 8)
    # identity when grid matches
    same = resample_pos_embed(pos, 4, 4)
    assert np.allclose(np.asarray(same), np.asarray(pos))


def test_load_encoders_registry():
    encoders, enc_types, archs = load_encoders("dinov2-vit-b,clip-vit-l",
                                               resolution=256,
                                               encoder_dir=None)
    assert enc_types == ["dinov2", "clip"]
    assert encoders[0].z_dim == 768 and encoders[1].z_dim == 1024
    # no weights -> calling raises a clear error
    with pytest.raises(RuntimeError, match="no weights"):
        encoders[0](np.zeros((1, 224, 224, 3), np.float32))
    # preprocessing normalizes to roughly zero mean on gray input
    x = np.full((1, 256, 256, 3), 128, np.uint8)
    out = encoders[0].preprocess(x)
    assert out.shape[1] == 224  # dinov2 resizes to 224
    assert abs(out.mean()) < 1.0


def test_unknown_family_raises():
    with pytest.raises(NotImplementedError):
        load_encoders("resnet-vit-b")


def test_npz_roundtrip(tmp_path):
    tree = {"params": {"a": np.arange(6, dtype=np.float32).reshape(2, 3),
                       "nested": {"b": np.ones(4, np.float32)}}}
    path = str(tmp_path / "p.npz")
    save_npz_params(path, tree)
    loaded = load_npz_params(path)
    assert np.allclose(loaded["params"]["a"], tree["params"]["a"])
    assert np.allclose(loaded["params"]["nested"]["b"], 1.0)


def test_text_z_dims():
    assert TEXT_Z_DIM_DICT["qwen7b"] == 3584


@pytest.mark.slow
def test_in_loop_encode_features(tmp_path):
    """FrozenEncoder.encode runs the jitted forward on raw uint8 pixels with
    params threaded as jit args (in-loop path, reference image/train.py:
    348-360); features then flow into the image train step as zs."""
    import jax

    from reed_tpu.encoders.registry import encode_features, save_npz_params

    # fabricate tiny 'converted' weights for a dinov2-vit-s encoder
    from reed_tpu.encoders.vit import ViT, ViTConfig

    cfg = ViTConfig(image_size=224, patch_size=14, hidden_size=384,
                    depth=12, num_heads=6, layerscale=True)
    model = ViT(cfg)
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, 224, 224, 3), np.float32))
    save_npz_params(str(tmp_path / "dinov2-vit-s.npz"), variables)

    encoders, _, _ = load_encoders("dinov2-vit-s",
                                   encoder_dir=str(tmp_path))
    rng = np.random.default_rng(0)
    pixels = rng.integers(0, 256, (2, 256, 256, 3)).astype(np.uint8)
    (z,) = encode_features(encoders, pixels)
    assert z.shape == (2, (224 // 14) ** 2, 384)
    assert np.isfinite(np.asarray(z)).all()
    # second call reuses the cached jitted forward
    (z2,) = encode_features(encoders, pixels)
    np.testing.assert_allclose(np.asarray(z), np.asarray(z2), rtol=1e-6)


@pytest.mark.slow
def test_torch_checkpoint_to_train_step_end_to_end(tmp_path):
    """The full zero-egress encoder story: a torch DINOv2-format checkpoint
    FILE -> convert_torch_checkpoint -> load_encoders -> in-loop
    FrozenEncoder.encode on raw pixels -> features consumed as alignment
    targets by a jitted image train step (closes the converters-only gap:
    reference computes features per batch at image/train.py:348-360)."""
    torch = pytest.importorskip("torch")
    import jax

    from reed_tpu.encoders.registry import convert_torch_checkpoint

    D, DEPTH, P, IMG = 384, 12, 14, 224
    g = torch.Generator().manual_seed(0)

    def t(*shape, scale=0.02):
        return torch.randn(*shape, generator=g) * scale

    sd = {
        "patch_embed.proj.weight": t(D, 3, P, P),
        "patch_embed.proj.bias": t(D),
        "cls_token": t(1, 1, D),
        "pos_embed": t(1, 1 + (IMG // P) ** 2, D),
        "norm.weight": torch.ones(D), "norm.bias": torch.zeros(D),
    }
    for i in range(DEPTH):
        p = f"blocks.{i}"
        sd.update({
            f"{p}.norm1.weight": torch.ones(D),
            f"{p}.norm1.bias": torch.zeros(D),
            f"{p}.attn.qkv.weight": t(3 * D, D),
            f"{p}.attn.qkv.bias": t(3 * D),
            f"{p}.attn.proj.weight": t(D, D),
            f"{p}.attn.proj.bias": t(D),
            f"{p}.norm2.weight": torch.ones(D),
            f"{p}.norm2.bias": torch.zeros(D),
            f"{p}.mlp.fc1.weight": t(4 * D, D),
            f"{p}.mlp.fc1.bias": t(4 * D),
            f"{p}.mlp.fc2.weight": t(D, 4 * D),
            f"{p}.mlp.fc2.bias": t(D),
            f"{p}.ls1.gamma": torch.ones(D) * 1e-5,
            f"{p}.ls2.gamma": torch.ones(D) * 1e-5,
        })
    torch_path = str(tmp_path / "dinov2_vits14.pth")
    torch.save(sd, torch_path)

    convert_torch_checkpoint(torch_path, str(tmp_path / "dinov2-vit-s.npz"),
                             family="dinov2", size="s")
    encoders, enc_types, _ = load_encoders("dinov2-vit-s",
                                           encoder_dir=str(tmp_path))
    assert enc_types == ["dinov2"]
    assert encoders[0].params is not None  # weights actually loaded

    rng = np.random.default_rng(0)
    pixels = rng.integers(0, 256, (2, 256, 256, 3)).astype(np.uint8)
    from reed_tpu.encoders.registry import encode_features

    (z,) = encode_features(encoders, pixels)
    assert z.shape == (2, 256, 384)
    assert np.isfinite(np.asarray(z)).all()

    # pool the 16x16 patch grid down to the tiny SiT's 2x2 tokens and run
    # one REED train step with the real converted-encoder features as zs
    zt = np.asarray(z).reshape(2, 2, 8, 2, 8, 384).mean(axis=(2, 4))
    zt = zt.reshape(2, 4, 384)

    from reed_tpu.core.config import CurriculumConfig, MeshConfig, OptimConfig
    from reed_tpu.diffusion.continuous import FlowMatchingLossConfig
    from reed_tpu.train.image import ImageTrainConfig, ImageTrainer

    cfg = ImageTrainConfig(
        model="SiT-S/4", input_size=8, num_classes=4, encoder_depth=2,
        z_dims=(384,), z_types=("i",), projector_dim=64, batch_size=2,
        loss=FlowMatchingLossConfig(enc_names=("dinov2",),
                                    loss_weights=(1.0,)),
        optim=OptimConfig(lr=1e-3), curriculum=CurriculumConfig(max_steps=4),
        mesh=MeshConfig(data=1))
    trainer = ImageTrainer(cfg)
    state = trainer.init_state()
    batch = trainer.synthetic_batch(jax.random.PRNGKey(0))
    batch["zs"] = [zt]
    batch = jax.device_put(batch, trainer.batch_sharding)
    with trainer.mesh:
        state, metrics = trainer.train_step(state, batch,
                                            jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["proj_loss"]) != 0.0  # alignment actually engaged

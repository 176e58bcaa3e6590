"""Config system: recursive build/merge, dotted overrides, recipe files."""

import dataclasses
import json
import os

import pytest

from reed_tpu.core import configlib
from reed_tpu.train.image import ImageTrainConfig
from reed_tpu.train.molecule_semla import SemlaTrainConfig
from reed_tpu.train.protein import ProteinTrainConfig

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_build_nested():
    cfg = configlib.build(ImageTrainConfig, {
        "model": "SiT-L/2",
        "optim": {"lr": 3e-4},
        "loss": {"enc_names": ["dinov2", "clip"], "loss_weights": [1.0, 0.5]},
    })
    assert cfg.model == "SiT-L/2"
    assert cfg.optim.lr == 3e-4
    assert cfg.optim.b1 == 0.9  # untouched default
    assert cfg.loss.enc_names == ("dinov2", "clip")  # tuple-coerced


def test_build_unknown_key_raises():
    with pytest.raises(KeyError, match="unknown config key"):
        configlib.build(ImageTrainConfig, {"modle": "SiT-L/2"})


def test_merge_preserves_siblings():
    cfg = ImageTrainConfig()
    out = configlib.merge(cfg, {"optim": {"lr": 5e-5}})
    assert out.optim.lr == 5e-5
    assert out.optim.grad_clip == cfg.optim.grad_clip
    assert out.model == cfg.model


def test_apply_overrides_dotted():
    cfg = configlib.apply_overrides(ImageTrainConfig(), [
        "optim.lr=3e-4",
        "curriculum.diffusion_warmup_steps=50000",
        "model=SiT-XL/2",
        'z_dims=[768, 3584]',
        "remat=true",
    ])
    assert cfg.optim.lr == 3e-4
    assert cfg.curriculum.diffusion_warmup_steps == 50000
    assert cfg.model == "SiT-XL/2"
    assert cfg.z_dims == (768, 3584)
    assert cfg.remat is True


def test_override_bad_key_raises():
    with pytest.raises(KeyError):
        configlib.apply_overrides(ImageTrainConfig(), ["optim.lrr=1"])


def test_snapshot_roundtrip(tmp_path):
    cfg = configlib.apply_overrides(ImageTrainConfig(), ["optim.lr=7e-4"])
    path = configlib.snapshot(cfg, str(tmp_path))
    reloaded = configlib.merge(ImageTrainConfig(),
                               json.load(open(path)))
    assert reloaded == cfg


@pytest.mark.parametrize("cls,recipe", [
    (ImageTrainConfig, "image_sitxl_reed.json"),
    (ProteinTrainConfig, "protein_fmif_reed.json"),
    (SemlaTrainConfig, "molecule_semla_reed.json"),
])
def test_baseline_recipes_resolve(cls, recipe):
    """The three BASELINE.md recipes are expressible and typo-free."""
    path = os.path.join(REPO, "recipes", recipe)
    cfg = configlib.merge(cls(), configlib.load_file(path))
    assert dataclasses.is_dataclass(cfg)


def test_image_recipe_matches_reference_settings():
    """Spot-check the key knobs of the published image recipe
    (BASELINE.md: bs 256, lr 1e-4, dinov2 depth 8 + qwen depth 16,
    repa-coeff [1.0, 0.5], proj 0.5, 50K warm-up)."""
    path = os.path.join(REPO, "recipes", "image_sitxl_reed.json")
    cfg = configlib.merge(ImageTrainConfig(), configlib.load_file(path))
    assert cfg.model == "SiT-XL/2"
    assert cfg.batch_size == 256
    assert cfg.optim.lr == 1e-4
    assert cfg.encoder_depth == 8 and cfg.encoder_depth_text == 16
    assert cfg.loss.loss_weights == (1.0, 0.5)
    assert cfg.curriculum.proj_coeff == 0.5
    assert cfg.curriculum.diffusion_warmup_steps == 50_000

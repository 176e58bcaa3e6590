"""VLM captioning pipeline with a stub backend: prompt building, pooling,
layer-dir naming, and — crucially — that the files it writes are exactly
what data/image.CachedLatentDataset reads back (the reference couples
these implicitly: image/vlm_captioning/* writes, image/dataset.py reads)."""

import json
import os

import numpy as np
import pytest

from reed_tpu.data.captioning import (
    PROMPT,
    TEXT_Z_DIMS,
    build_messages,
    caption,
    embed,
    layer_dir_name,
    mean_pool,
)
from reed_tpu.data.image import CachedLatentDataset, ImageDatasetConfig


def test_mean_pool():
    h = np.arange(12, dtype=np.float32).reshape(3, 4)
    np.testing.assert_allclose(mean_pool(h), h.mean(0))


def test_build_messages_prompt():
    msgs = build_messages(PROMPT)
    assert msgs[0]["role"] == "user"
    kinds = [c["type"] for c in msgs[0]["content"]]
    assert kinds == ["image", "text"]
    assert msgs[0]["content"][1]["text"] == PROMPT


def test_layer_dir_names():
    assert layer_dir_name("text_embeds_qwen7b", 15) == "text_embeds_qwen7b_l15"
    assert layer_dir_name("text_embeds_qwen7b", -1) == \
        "text_embeds_qwen7b_llast"
    assert layer_dir_name("text_embeds_qwen7b", 0) == "text_embeds_qwen7b_l0"


class StubBackend:
    """Deterministic stand-in for QwenBackend."""

    def __init__(self, dim=16):
        self.dim = dim
        self.captioned = []

    def caption(self, img):
        self.captioned.append(img.size)
        vec = np.full((self.dim,), float(len(self.captioned)), np.float32)
        return f"caption {len(self.captioned)}", vec

    def embed(self, img, caption_text, layers):
        seed = int(caption_text.split()[-1])
        return {k: np.full((self.dim,), float(seed * 100 + k), np.float32)
                for k in layers}


def _fake_image_dataset(data_dir, n=3):
    from PIL import Image

    os.makedirs(os.path.join(data_dir, "images"), exist_ok=True)
    os.makedirs(os.path.join(data_dir, "vae-sd"), exist_ok=True)
    labels = []
    for i in range(n):
        fname = f"img_{i:03d}.png"
        Image.new("RGB", (8, 8), (i * 40, 0, 0)).save(
            os.path.join(data_dir, "images", fname))
        np.save(os.path.join(data_dir, "vae-sd", f"img_{i:03d}.npy"),
                np.zeros((8, 4, 4), np.float32))
        labels.append([fname, i % 2])
    with open(os.path.join(data_dir, "dataset.json"), "w") as f:
        json.dump({"labels": labels}, f)
    return labels


def test_caption_and_embed_layout_roundtrip(tmp_path):
    data_dir = str(tmp_path)
    _fake_image_dataset(data_dir)
    backend = StubBackend()

    caption(data_dir, backend=backend)
    # stage 1 wrote captions/ + text_embeds_qwen2b_last/
    assert sorted(os.listdir(os.path.join(data_dir, "captions"))) == \
        [f"img_{i:03d}.txt" for i in range(3)]
    assert len(os.listdir(os.path.join(
        data_dir, "text_embeds_qwen2b_last"))) == 3

    embed(data_dir, layers=[0, 15, -1], backend=backend)
    for k in (0, 15, -1):
        d = os.path.join(data_dir, layer_dir_name("text_embeds_qwen7b", k))
        assert len(os.listdir(d)) == 3

    # the reader consumes exactly this layout
    ds = CachedLatentDataset(ImageDatasetConfig(
        data_dir=data_dir, text_embeds_subdir="text_embeds_qwen7b_l15"))
    assert len(ds) == 3
    item = ds[1]
    assert item["z_text"].shape == (16,)
    # stub wrote seed*100 + layer for img_001 (caption "caption 2")
    assert item["z_text"][0] == pytest.approx(215.0)

    # stage-1 embeds readable the same way
    ds2 = CachedLatentDataset(ImageDatasetConfig(
        data_dir=data_dir, text_embeds_subdir="text_embeds_qwen2b_last"))
    assert ds2[0]["z_text"].shape == (16,)


def test_limit_caps_work(tmp_path):
    data_dir = str(tmp_path)
    _fake_image_dataset(data_dir)
    backend = StubBackend()
    caption(data_dir, backend=backend, limit=2)
    assert len(os.listdir(os.path.join(data_dir, "captions"))) == 2


def test_text_z_dims_registry():
    # reference TEXT_Z_DIM_DICT (image/train.py:40-43)
    assert TEXT_Z_DIMS["qwen2b"] == 1536
    assert TEXT_Z_DIMS["qwen7b"] == 3584

"""Image data pipeline: dataset layout, posterior sampling, per-host
sharded epochs."""

import json
import os

import numpy as np
import pytest

from reed_tpu.data.image import (
    CachedLatentDataset,
    ImageDatasetConfig,
    epoch_batches,
    sample_posterior,
)


@pytest.fixture
def dataset_dir(tmp_path):
    rng = np.random.default_rng(0)
    labels = []
    os.makedirs(tmp_path / "vae-sd")
    os.makedirs(tmp_path / "features")
    os.makedirs(tmp_path / "text_embeds")
    for i in range(8):
        name = f"img{i:04d}.png"
        np.save(tmp_path / "vae-sd" / f"img{i:04d}.npy",
                rng.standard_normal((8, 4, 4)).astype(np.float32))
        np.save(tmp_path / "features" / f"img{i:04d}.npy",
                rng.standard_normal((4, 16)).astype(np.float32))
        np.save(tmp_path / "text_embeds" / f"img{i:04d}.npy",
                rng.standard_normal(32).astype(np.float32))
        labels.append([name, i % 3])
    with open(tmp_path / "dataset.json", "w") as f:
        json.dump({"labels": labels}, f)
    return str(tmp_path)


def test_dataset_reads_triplets(dataset_dir):
    ds = CachedLatentDataset(ImageDatasetConfig(
        dataset_dir, features_subdirs=("features",),
        text_embeds_subdir="text_embeds"))
    assert len(ds) == 8
    row = ds[0]
    assert row["moments"].shape == (8, 4, 4)
    assert row["z_0"].shape == (4, 16)
    assert row["z_text"].shape == (32,)


def test_sample_posterior_shapes():
    rng = np.random.default_rng(0)
    moments = np.zeros((2, 8, 4, 4), np.float32)
    moments[:, :4] = 1.0   # mean
    moments[:, 4:] = 0.0   # std
    z = sample_posterior(rng, moments, scale=2.0, bias=1.0)
    assert z.shape == (2, 4, 4, 4)  # NHWC
    assert np.allclose(z, 3.0)  # mean 1 * scale 2 + bias 1


def test_epoch_batches_sharded(dataset_dir):
    ds = CachedLatentDataset(ImageDatasetConfig(
        dataset_dir, features_subdirs=("features",),
        text_embeds_subdir="text_embeds"))
    b0 = list(epoch_batches(ds, 2, seed=0, process_index=0, process_count=2))
    b1 = list(epoch_batches(ds, 2, seed=0, process_index=1, process_count=2))
    assert len(b0) == 2 and len(b1) == 2  # 8 items / 2 hosts / bs 2
    batch = b0[0]
    assert batch["x"].shape == (2, 4, 4, 4)
    assert batch["y"].shape == (2,)
    assert len(batch["zs"]) == 2  # image features + text embed
    assert batch["zs"][0].shape == (2, 4, 16)
    assert batch["zs"][1].shape == (2, 32)
    # hosts see disjoint labels within an epoch
    y0 = {int(v) for b in b0 for v in b["y"]}
    # (labels repeat mod 3 so check via x sums instead)
    s0 = {float(b["x"].sum()) for b in b0}
    s1 = {float(b["x"].sum()) for b in b1}
    assert s0 != s1


def test_prefetch_to_device(dataset_dir):
    import jax

    from reed_tpu.data.image import prefetch_to_device

    ds = CachedLatentDataset(ImageDatasetConfig(dataset_dir))
    it = epoch_batches(ds, 2, seed=0)
    batches = list(prefetch_to_device(it, size=2))
    assert len(batches) == 4
    assert isinstance(batches[0]["x"], jax.Array)

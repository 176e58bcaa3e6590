"""Preprocessing tools, VAE architecture, training stats collector."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reed_tpu.core import stats
from reed_tpu.data.preprocessing import center_crop_dhariwal, convert
from reed_tpu.encoders.vae import (
    VAEDecoder,
    VAEEncoder,
    decode_latents,
    sample_latents,
)


def test_center_crop_shapes():
    from PIL import Image

    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 255, (700, 500, 3), np.uint8))
    out = center_crop_dhariwal(img, 64)
    assert out.shape == (64, 64, 3)


def test_convert_writes_layout(tmp_path):
    from PIL import Image

    src = tmp_path / "raw"
    for cls in ("a", "b"):
        os.makedirs(src / cls)
        for i in range(2):
            Image.fromarray(np.zeros((80, 80, 3), np.uint8)).save(
                src / cls / f"{i}.png")
    dst = tmp_path / "out"
    convert(str(src), str(dst), resolution=32)
    labels = json.load(open(dst / "dataset.json"))["labels"]
    assert len(labels) == 4
    assert sorted({l[1] for l in labels}) == [0, 1]
    assert os.path.exists(dst / "images" / labels[0][0])


@pytest.mark.slow
def test_vae_shapes_tiny():
    # tiny channel config to keep CPU test fast
    enc = VAEEncoder(base_ch=8, ch_mult=(1, 2), num_res=1, z_ch=2)
    dec = VAEDecoder(base_ch=8, ch_mult=(1, 2), num_res=1, out_ch=3)
    x = jnp.zeros((1, 16, 16, 3))
    ev = enc.init(jax.random.PRNGKey(0), x)
    moments = enc.apply(ev, x)
    assert moments.shape == (1, 8, 8, 4)  # H/2 for 2 stages, 2*z_ch
    z = sample_latents(jax.random.PRNGKey(1), moments, scale=1.0)
    assert z.shape == (1, 8, 8, 2)
    dv = dec.init(jax.random.PRNGKey(2), z)
    img = decode_latents(dec, dv, z, scale=1.0)
    assert img.shape == (1, 16, 16, 3) and img.dtype == jnp.uint8


def test_stats_collector():
    stats.reset()
    stats.report("loss", np.array([1.0, 2.0, 3.0]))
    stats.report("loss", np.array([4.0]))
    c = stats.Collector()
    c.update()
    assert c.num("loss") == 4
    assert c.mean("loss") == pytest.approx(2.5)
    assert c.std("loss") == pytest.approx(np.std([1, 2, 3, 4]))
    # deltas: nothing new since last update
    c.update()
    assert c.num("loss") == 0
    stats.reset()

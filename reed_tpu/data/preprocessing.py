"""Image dataset preprocessing: raw ImageNet -> center-cropped 256x256
folder, and pixels -> SD-VAE latent moments.

Clean-room rebuild of the edm2-derived tools the reference vendors
(image/preprocessing/dataset_tools.py:255-460 `convert` and `encode`,
image/preprocessing/encoders.py:52 StabilityVAEEncoder): the
center-crop-dhariwal resize (ADM convention), the dataset.json labels file,
and per-image `.npy` moment caching in the layout reed_tpu.data.image reads.

CLI:
  python -m reed_tpu.data.preprocessing convert --src <imagenet> --dst <dir>
  python -m reed_tpu.data.preprocessing encode --src <dir> --dst <dir> \
      --vae-npz <converted sd-vae encoder weights>
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Optional

import numpy as np


def center_crop_dhariwal(img, resolution: int = 256) -> np.ndarray:
    """ADM-style center crop: repeated BOX downsample to 2x target then
    bicubic to target, crop center square
    (reference: dataset_tools.py convert pipeline)."""
    from PIL import Image

    while min(*img.size) >= 2 * resolution:
        img = img.resize((img.size[0] // 2, img.size[1] // 2), Image.BOX)
    scale = resolution / min(*img.size)
    img = img.resize((round(img.size[0] * scale), round(img.size[1] * scale)),
                     Image.BICUBIC)
    arr = np.asarray(img.convert("RGB"))
    h, w = arr.shape[:2]
    top = (h - resolution) // 2
    left = (w - resolution) // 2
    return arr[top:top + resolution, left:left + resolution]


def convert(src: str, dst: str, resolution: int = 256,
            limit: Optional[int] = None):
    """Walk class-subfolder ImageNet layout -> `images/` pngs + dataset.json
    labels (reference layout: image/dataset.py:18-60)."""
    from PIL import Image

    os.makedirs(os.path.join(dst, "images"), exist_ok=True)
    classes = sorted(d for d in os.listdir(src)
                     if os.path.isdir(os.path.join(src, d)))
    class_idx = {c: i for i, c in enumerate(classes)}
    labels = []
    count = 0
    for cls in classes:
        for fn in sorted(os.listdir(os.path.join(src, cls))):
            path = os.path.join(src, cls, fn)
            try:
                img = Image.open(path)
                arr = center_crop_dhariwal(img, resolution)
            except Exception as e:
                print(f"skip {path}: {e}")
                continue
            out_name = f"img{count:08d}.png"
            Image.fromarray(arr).save(
                os.path.join(dst, "images", out_name))
            labels.append([out_name, class_idx[cls]])
            count += 1
            if limit is not None and count >= limit:
                break
        if limit is not None and count >= limit:
            break
    with open(os.path.join(dst, "dataset.json"), "w") as f:
        json.dump({"labels": labels}, f)
    print(f"wrote {count} images -> {dst}")


def encode(src: str, dst: str, vae_npz: Optional[str] = None,
           batch_size: int = 16):
    """images/ pngs -> vae-sd/ moment `.npy`s ([8, H/8, W/8], the layout
    image/dataset.py:69-77 reads). Requires converted SD-VAE encoder weights
    (reed_tpu.encoders.vae.convert_diffusers_vae -> npz)."""
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from reed_tpu.encoders.registry import load_npz_params
    from reed_tpu.encoders.vae import VAEEncoder

    if vae_npz is None or not os.path.exists(vae_npz):
        raise FileNotFoundError(
            "SD-VAE encoder weights (npz) required; convert once with "
            "reed_tpu.encoders.vae.convert_diffusers_vae")
    variables = load_npz_params(vae_npz)
    encoder = VAEEncoder()
    apply = jax.jit(lambda v, x: encoder.apply(v, x))

    with open(os.path.join(src, "dataset.json")) as f:
        labels = json.load(f)["labels"]
    os.makedirs(os.path.join(dst, "vae-sd"), exist_ok=True)

    batch, names = [], []

    def flush():
        if not batch:
            return
        x = jnp.asarray(np.stack(batch), jnp.float32) / 127.5 - 1.0
        moments = np.asarray(apply(variables, x))  # [B,h,w,8]
        for name, m in zip(names, moments):
            np.save(os.path.join(dst, "vae-sd",
                                 os.path.splitext(name)[0] + ".npy"),
                    m.transpose(2, 0, 1))  # [8,h,w], reference layout
        batch.clear()
        names.clear()

    for fname, _ in labels:
        img = Image.open(os.path.join(src, "images", fname))
        batch.append(np.asarray(img.convert("RGB")))
        names.append(fname)
        if len(batch) == batch_size:
            flush()
    flush()
    print(f"encoded {len(labels)} images -> {dst}/vae-sd")


def main(argv=None):
    parser = argparse.ArgumentParser("reed_tpu.data.preprocessing")
    sub = parser.add_subparsers(dest="cmd", required=True)
    p = sub.add_parser("convert")
    p.add_argument("--src", required=True)
    p.add_argument("--dst", required=True)
    p.add_argument("--resolution", type=int, default=256)
    p.add_argument("--limit", type=int, default=None)
    p = sub.add_parser("encode")
    p.add_argument("--src", required=True)
    p.add_argument("--dst", required=True)
    p.add_argument("--vae-npz", default=None)
    p.add_argument("--batch-size", type=int, default=16)
    args = parser.parse_args(argv)
    if args.cmd == "convert":
        convert(args.src, args.dst, args.resolution, args.limit)
    else:
        encode(args.src, args.dst, args.vae_npz, args.batch_size)


if __name__ == "__main__":
    main()

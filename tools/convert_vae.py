"""One-time converter: diffusers SD-VAE torch checkpoint -> decoder npz.

The reference decodes FID latents through stabilityai/sd-vae-ft-ema
(image/generate.py:108,156-171). This zero-egress image ships no weights;
run this once wherever the torch checkpoint exists, then pass the npz to
`reed_tpu.cli generate-image --vae vae_decoder.npz`.

Usage:
  python tools/convert_vae.py /path/to/diffusion_pytorch_model.bin out.npz
"""

from __future__ import annotations

import sys


def main(src: str, dst: str):
    import torch

    from reed_tpu.encoders.vae import convert_diffusers_vae
    from reed_tpu.eval.fid import save_params_npz

    sd = torch.load(src, map_location="cpu", weights_only=True)
    sd = {k: v.numpy() for k, v in sd.items()}
    variables = convert_diffusers_vae(sd, part="decoder")
    save_params_npz(dst, variables)
    print(f"wrote {dst}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])

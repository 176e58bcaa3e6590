"""Offline VLM captioning: generate captions + pooled hidden-state
embeddings per image with Qwen2-VL.

Clean-room rebuild of image/vlm_captioning/{captioning.py,
captioning_embedding.py}: stage 1 captions each image with Qwen2-VL-2B and
saves `.txt` + mean-pooled last-hidden-state `.npy`; stage 2 re-embeds
(image, caption) pairs with Qwen2-VL-7B, saving selected hidden layers
(0/1/15/last) mean-pooled per image into `text_embeds_qwen7b_l{k}/`.

Host-side torch/transformers (this is offline preprocessing — the training
pipeline only reads the cached `.npy`s). Gated on model weights being
available locally (zero-egress environments precompute elsewhere).

CLI:
  python -m reed_tpu.data.captioning caption --data-dir D --model-path P
  python -m reed_tpu.data.captioning embed --data-dir D --model-path P \
      --layers 0 1 15 -1
"""

from __future__ import annotations

import argparse
import json
import os
from typing import List, Optional

import numpy as np

PROMPT = ("Describe this image concisely in one sentence, focusing on the "
          "main object and scene.")


def _load_qwen(model_path: str):
    import torch
    from transformers import AutoProcessor, Qwen2VLForConditionalGeneration

    model = Qwen2VLForConditionalGeneration.from_pretrained(
        model_path, torch_dtype=torch.float32, device_map="cpu")
    processor = AutoProcessor.from_pretrained(model_path)
    return model, processor


def caption(data_dir: str, model_path: str, out_subdir: str = "captions",
            embed_subdir: str = "text_embeds_qwen2b_last",
            limit: Optional[int] = None):
    """Stage 1 (reference: captioning.py:48-150)."""
    import torch
    from PIL import Image

    model, processor = _load_qwen(model_path)
    with open(os.path.join(data_dir, "dataset.json")) as f:
        labels = json.load(f)["labels"]
    os.makedirs(os.path.join(data_dir, out_subdir), exist_ok=True)
    os.makedirs(os.path.join(data_dir, embed_subdir), exist_ok=True)

    for i, (fname, _) in enumerate(labels):
        if limit is not None and i >= limit:
            break
        img = Image.open(os.path.join(data_dir, "images", fname))
        messages = [{"role": "user", "content": [
            {"type": "image"}, {"type": "text", "text": PROMPT}]}]
        text = processor.apply_chat_template(messages,
                                             add_generation_prompt=True)
        inputs = processor(text=[text], images=[img], return_tensors="pt")
        with torch.no_grad():
            out = model.generate(**inputs, max_new_tokens=64,
                                 output_hidden_states=True,
                                 return_dict_in_generate=True)
            caption_ids = out.sequences[0][inputs["input_ids"].shape[1]:]
            caption_text = processor.decode(caption_ids,
                                            skip_special_tokens=True)
            hidden = out.hidden_states[0][-1][0]  # last layer, prompt pass
            pooled = hidden.mean(0).float().numpy()
        stem = os.path.splitext(fname)[0]
        with open(os.path.join(data_dir, out_subdir, stem + ".txt"),
                  "w") as f:
            f.write(caption_text)
        np.save(os.path.join(data_dir, embed_subdir, stem + ".npy"), pooled)


def embed(data_dir: str, model_path: str, layers: List[int] = (0, 1, 15, -1),
          caption_subdir: str = "captions", prefix: str = "text_embeds_qwen7b",
          limit: Optional[int] = None):
    """Stage 2 (reference: captioning_embedding.py:107-152): joint
    (image, caption) forward, mean-pool selected hidden layers."""
    import torch
    from PIL import Image

    model, processor = _load_qwen(model_path)
    with open(os.path.join(data_dir, "dataset.json")) as f:
        labels = json.load(f)["labels"]
    dirs = {}
    for k in layers:
        name = f"{prefix}_l{'last' if k == -1 else k}"
        dirs[k] = os.path.join(data_dir, name)
        os.makedirs(dirs[k], exist_ok=True)

    for i, (fname, _) in enumerate(labels):
        if limit is not None and i >= limit:
            break
        stem = os.path.splitext(fname)[0]
        with open(os.path.join(data_dir, caption_subdir,
                               stem + ".txt")) as f:
            caption_text = f.read().strip()
        img = Image.open(os.path.join(data_dir, "images", fname))
        messages = [{"role": "user", "content": [
            {"type": "image"}, {"type": "text", "text": caption_text}]}]
        text = processor.apply_chat_template(messages)
        inputs = processor(text=[text], images=[img], return_tensors="pt")
        with torch.no_grad():
            out = model(**inputs, output_hidden_states=True)
        for k in layers:
            pooled = out.hidden_states[k][0].mean(0).float().numpy()
            np.save(os.path.join(dirs[k], stem + ".npy"), pooled)


def main(argv=None):
    parser = argparse.ArgumentParser("reed_tpu.data.captioning")
    sub = parser.add_subparsers(dest="cmd", required=True)
    p = sub.add_parser("caption")
    p.add_argument("--data-dir", required=True)
    p.add_argument("--model-path", required=True)
    p.add_argument("--limit", type=int, default=None)
    p = sub.add_parser("embed")
    p.add_argument("--data-dir", required=True)
    p.add_argument("--model-path", required=True)
    p.add_argument("--layers", type=int, nargs="+", default=[0, 1, 15, -1])
    p.add_argument("--limit", type=int, default=None)
    args = parser.parse_args(argv)
    if args.cmd == "caption":
        caption(args.data_dir, args.model_path, limit=args.limit)
    else:
        embed(args.data_dir, args.model_path, layers=args.layers,
              limit=args.limit)


if __name__ == "__main__":
    main()

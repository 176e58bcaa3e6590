"""Offline VLM captioning: generate captions + pooled hidden-state
embeddings per image with Qwen2-VL.

Clean-room rebuild of image/vlm_captioning/{captioning.py,
captioning_embedding.py}: stage 1 captions each image with Qwen2-VL-2B and
saves `.txt` + mean-pooled last-hidden-state `.npy`; stage 2 re-embeds
(image, caption) pairs with Qwen2-VL-7B, saving selected hidden layers
(0/1/15/last) mean-pooled per image into `text_embeds_qwen7b_l{k}/`.

Host-side torch/transformers (this is offline preprocessing — the training
pipeline only reads the cached `.npy`s). Gated on model weights being
available locally (zero-egress environments precompute elsewhere). The
transformers calls live behind `QwenBackend`; the stage functions own only
prompt/file-layout logic and accept any backend (tests stub it), so the
`text_embeds_*/<stem>.npy` layout stays pinned to what
data/image.CachedLatentDataset reads.

CLI:
  python -m reed_tpu.data.captioning caption --data-dir D --model-path P
  python -m reed_tpu.data.captioning embed --data-dir D --model-path P \
      --layers 0 1 15 -1
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

PROMPT = ("Describe this image concisely in one sentence, focusing on the "
          "main object and scene.")

# reference TEXT_Z_DIM_DICT (image/train.py:40-43)
TEXT_Z_DIMS = {"qwen2b": 1536, "qwen7b": 3584}


def mean_pool(hidden: np.ndarray) -> np.ndarray:
    """[T, D] token hidden states -> [D] pooled embedding (the reference
    mean-pools over the sequence, captioning.py:106-150)."""
    hidden = np.asarray(hidden, np.float32)
    assert hidden.ndim == 2, hidden.shape
    return hidden.mean(axis=0)


def build_messages(text: str) -> List[Dict]:
    """Chat-template message list for an (image, text) pair."""
    return [{"role": "user", "content": [
        {"type": "image"}, {"type": "text", "text": text}]}]


def layer_dir_name(prefix: str, k: int) -> str:
    """Hidden-layer k -> output subdir (the reference's
    text_embeds_qwen7b_l{0,1,15,last} layout)."""
    return f"{prefix}_l{'last' if k == -1 else k}"


def read_labels(data_dir: str) -> List:
    with open(os.path.join(data_dir, "dataset.json")) as f:
        return json.load(f)["labels"]


class QwenBackend:
    """transformers-coupled part: load Qwen2-VL, caption / embed images."""

    def __init__(self, model_path: str):
        import torch
        from transformers import AutoProcessor, Qwen2VLForConditionalGeneration

        self.torch = torch
        self.model = Qwen2VLForConditionalGeneration.from_pretrained(
            model_path, torch_dtype=torch.float32, device_map="cpu")
        self.processor = AutoProcessor.from_pretrained(model_path)

    def caption(self, img) -> Tuple[str, np.ndarray]:
        """-> (caption text, pooled last-hidden-state of the prompt pass)."""
        text = self.processor.apply_chat_template(
            build_messages(PROMPT), add_generation_prompt=True)
        inputs = self.processor(text=[text], images=[img],
                                return_tensors="pt")
        with self.torch.no_grad():
            out = self.model.generate(**inputs, max_new_tokens=64,
                                      output_hidden_states=True,
                                      return_dict_in_generate=True)
            caption_ids = out.sequences[0][inputs["input_ids"].shape[1]:]
            caption_text = self.processor.decode(caption_ids,
                                                 skip_special_tokens=True)
            hidden = out.hidden_states[0][-1][0].float().numpy()
        return caption_text, mean_pool(hidden)

    def embed(self, img, caption_text: str,
              layers: List[int]) -> Dict[int, np.ndarray]:
        """joint (image, caption) forward -> {layer: pooled}."""
        text = self.processor.apply_chat_template(
            build_messages(caption_text))
        inputs = self.processor(text=[text], images=[img],
                                return_tensors="pt")
        with self.torch.no_grad():
            out = self.model(**inputs, output_hidden_states=True)
        return {k: mean_pool(out.hidden_states[k][0].float().numpy())
                for k in layers}


def _open_image(data_dir: str, fname: str):
    from PIL import Image

    return Image.open(os.path.join(data_dir, "images", fname))


def caption(data_dir: str, model_path: Optional[str] = None,
            out_subdir: str = "captions",
            embed_subdir: str = "text_embeds_qwen2b_last",
            limit: Optional[int] = None, backend=None):
    """Stage 1 (reference: captioning.py:48-150)."""
    backend = backend if backend is not None else QwenBackend(model_path)
    labels = read_labels(data_dir)
    os.makedirs(os.path.join(data_dir, out_subdir), exist_ok=True)
    os.makedirs(os.path.join(data_dir, embed_subdir), exist_ok=True)

    for i, (fname, _) in enumerate(labels):
        if limit is not None and i >= limit:
            break
        caption_text, pooled = backend.caption(_open_image(data_dir, fname))
        stem = os.path.splitext(fname)[0]
        with open(os.path.join(data_dir, out_subdir, stem + ".txt"),
                  "w") as f:
            f.write(caption_text)
        np.save(os.path.join(data_dir, embed_subdir, stem + ".npy"), pooled)


def embed(data_dir: str, model_path: Optional[str] = None,
          layers: List[int] = (0, 1, 15, -1),
          caption_subdir: str = "captions", prefix: str = "text_embeds_qwen7b",
          limit: Optional[int] = None, backend=None):
    """Stage 2 (reference: captioning_embedding.py:107-152): joint
    (image, caption) forward, mean-pool selected hidden layers."""
    backend = backend if backend is not None else QwenBackend(model_path)
    labels = read_labels(data_dir)
    dirs = {}
    for k in layers:
        dirs[k] = os.path.join(data_dir, layer_dir_name(prefix, k))
        os.makedirs(dirs[k], exist_ok=True)

    for i, (fname, _) in enumerate(labels):
        if limit is not None and i >= limit:
            break
        stem = os.path.splitext(fname)[0]
        with open(os.path.join(data_dir, caption_subdir,
                               stem + ".txt")) as f:
            caption_text = f.read().strip()
        pooled = backend.embed(_open_image(data_dir, fname), caption_text,
                               list(layers))
        for k, vec in pooled.items():
            np.save(os.path.join(dirs[k], stem + ".npy"), vec)


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

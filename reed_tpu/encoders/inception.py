"""InceptionV3 pool3 feature extractor (FID flavor) in flax, with a
one-time torch state-dict converter.

Architecture: torchvision inception_v3 trunk with the pytorch-fid patches
(InceptionA/C and the first InceptionE use avg-pool with
count_include_pad=False; the second InceptionE uses max-pool), truncated at
the global average pool -> 2048-d "pool3" features. Weights are env-gated
like every other encoder in this repo (zero-egress image): convert the
public `pt_inception-2015-12-05` / torchvision checkpoint once with
`convert_torch_inception` and load the npz at eval time. The FID statistic
itself lives in eval/frechet.py; the reference delegates both to the
external ADM suite (image/README.md:49-63).

Input convention (pytorch-fid): uint8 [N,H,W,3] -> float/255 -> bilinear
resize to 299 (no antialias, align_corners=False) -> scale to [-1, 1].
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any


class BasicConv2d(nn.Module):
    out_channels: int
    kernel: Tuple[int, int]
    stride: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.out_channels, self.kernel, strides=self.stride,
                    padding=[(p, p) for p in self.padding], use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                         dtype=self.dtype, name="bn")(x)
        return nn.relu(x)


def _avg_pool3(x):
    """3x3 stride-1 avg pool, count_include_pad=False (the pytorch-fid
    patch): pad with zeros, divide by the number of REAL cells."""
    ones = jnp.ones(x.shape[:1] + x.shape[1:3] + (1,), x.dtype)
    summed = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 3, 3, 1),
                                   (1, 1, 1, 1),
                                   [(0, 0), (1, 1), (1, 1), (0, 0)])
    counts = jax.lax.reduce_window(ones, 0.0, jax.lax.add, (1, 3, 3, 1),
                                   (1, 1, 1, 1),
                                   [(0, 0), (1, 1), (1, 1), (0, 0)])
    return summed / counts


def _max_pool(x, window: int, stride: int, pad: int = 0):
    return nn.max_pool(x, (window, window), strides=(stride, stride),
                       padding=[(pad, pad), (pad, pad)])


class InceptionA(nn.Module):
    pool_features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), dtype=self.dtype, name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), dtype=self.dtype, name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=(2, 2), dtype=self.dtype,
                         name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), dtype=self.dtype,
                         name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), dtype=self.dtype,
                         name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), dtype=self.dtype,
                         name="branch3x3dbl_3")(b3)
        bp = BasicConv2d(self.pool_features, (1, 1), dtype=self.dtype,
                         name="branch_pool")(_avg_pool3(x))
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), stride=(2, 2), dtype=self.dtype,
                         name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), dtype=self.dtype,
                         name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=(1, 1), dtype=self.dtype,
                         name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), stride=(2, 2), dtype=self.dtype,
                         name="branch3x3dbl_3")(bd)
        bp = _max_pool(x, 3, 2)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), dtype=self.dtype, name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), dtype=self.dtype, name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=(0, 3), dtype=self.dtype,
                         name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), dtype=self.dtype,
                         name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), dtype=self.dtype,
                         name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), dtype=self.dtype,
                         name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=(0, 3), dtype=self.dtype,
                         name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), dtype=self.dtype,
                         name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=(0, 3), dtype=self.dtype,
                         name="branch7x7dbl_5")(bd)
        bp = BasicConv2d(192, (1, 1), dtype=self.dtype,
                         name="branch_pool")(_avg_pool3(x))
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), dtype=self.dtype, name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), stride=(2, 2), dtype=self.dtype,
                         name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), dtype=self.dtype,
                         name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=(0, 3), dtype=self.dtype,
                         name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), dtype=self.dtype,
                         name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), stride=(2, 2), dtype=self.dtype,
                         name="branch7x7x3_4")(b7)
        bp = _max_pool(x, 3, 2)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    pool_kind: str = "avg"   # 'avg' (first instance) | 'max' (second, FID)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), dtype=self.dtype, name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), dtype=self.dtype, name="branch3x3_1")(x)
        b3 = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=(0, 1), dtype=self.dtype,
                        name="branch3x3_2a")(b3),
            BasicConv2d(384, (3, 1), padding=(1, 0), dtype=self.dtype,
                        name="branch3x3_2b")(b3),
        ], axis=-1)
        bd = BasicConv2d(448, (1, 1), dtype=self.dtype,
                         name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=(1, 1), dtype=self.dtype,
                         name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=(0, 1), dtype=self.dtype,
                        name="branch3x3dbl_3a")(bd),
            BasicConv2d(384, (3, 1), padding=(1, 0), dtype=self.dtype,
                        name="branch3x3dbl_3b")(bd),
        ], axis=-1)
        pooled = _avg_pool3(x) if self.pool_kind == "avg" \
            else _max_pool(x, 3, 1, pad=1)
        bp = BasicConv2d(192, (1, 1), dtype=self.dtype,
                         name="branch_pool")(pooled)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Pool3(nn.Module):
    """Trunk to the 2048-d pool3 features (fc head dropped)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x float [N,299,299,3] already scaled to [-1, 1]."""
        x = BasicConv2d(32, (3, 3), stride=(2, 2), dtype=self.dtype,
                        name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), dtype=self.dtype, name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=(1, 1), dtype=self.dtype,
                        name="Conv2d_2b_3x3")(x)
        x = _max_pool(x, 3, 2)
        x = BasicConv2d(80, (1, 1), dtype=self.dtype, name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), dtype=self.dtype, name="Conv2d_4a_3x3")(x)
        x = _max_pool(x, 3, 2)
        x = InceptionA(32, dtype=self.dtype, name="Mixed_5b")(x)
        x = InceptionA(64, dtype=self.dtype, name="Mixed_5c")(x)
        x = InceptionA(64, dtype=self.dtype, name="Mixed_5d")(x)
        x = InceptionB(dtype=self.dtype, name="Mixed_6a")(x)
        x = InceptionC(128, dtype=self.dtype, name="Mixed_6b")(x)
        x = InceptionC(160, dtype=self.dtype, name="Mixed_6c")(x)
        x = InceptionC(160, dtype=self.dtype, name="Mixed_6d")(x)
        x = InceptionC(192, dtype=self.dtype, name="Mixed_6e")(x)
        x = InceptionD(dtype=self.dtype, name="Mixed_7a")(x)
        x = InceptionE("avg", dtype=self.dtype, name="Mixed_7b")(x)
        x = InceptionE("max", dtype=self.dtype, name="Mixed_7c")(x)
        return jnp.mean(x, axis=(1, 2))  # global avg pool -> [N, 2048]


def preprocess_uint8(images: jnp.ndarray) -> jnp.ndarray:
    """uint8 [N,H,W,3] -> float [-1,1] at 299x299 (bilinear, the
    pytorch-fid input convention)."""
    x = images.astype(jnp.float32) / 255.0
    if x.shape[1] != 299 or x.shape[2] != 299:
        x = jax.image.resize(x, (x.shape[0], 299, 299, 3), "bilinear")
    return x * 2.0 - 1.0


# ---- torch converter ------------------------------------------------------

def _np(t):
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def _conv_bn(sd: Dict, key: str) -> Dict:
    # torch conv weight [O,I,kh,kw] -> flax [kh,kw,I,O]
    return {
        "conv": {"kernel": _np(sd[f"{key}.conv.weight"]).transpose(2, 3, 1, 0)},
        "bn": {"scale": _np(sd[f"{key}.bn.weight"]),
               "bias": _np(sd[f"{key}.bn.bias"])},
    }


def _conv_bn_stats(sd: Dict, key: str) -> Dict:
    return {"bn": {"mean": _np(sd[f"{key}.bn.running_mean"]),
                   "var": _np(sd[f"{key}.bn.running_var"])}}


_BLOCK_BRANCHES = {
    "A": ["branch1x1", "branch5x5_1", "branch5x5_2", "branch3x3dbl_1",
          "branch3x3dbl_2", "branch3x3dbl_3", "branch_pool"],
    "B": ["branch3x3", "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3"],
    "C": ["branch1x1", "branch7x7_1", "branch7x7_2", "branch7x7_3",
          "branch7x7dbl_1", "branch7x7dbl_2", "branch7x7dbl_3",
          "branch7x7dbl_4", "branch7x7dbl_5", "branch_pool"],
    "D": ["branch3x3_1", "branch3x3_2", "branch7x7x3_1", "branch7x7x3_2",
          "branch7x7x3_3", "branch7x7x3_4"],
    "E": ["branch1x1", "branch3x3_1", "branch3x3_2a", "branch3x3_2b",
          "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3a",
          "branch3x3dbl_3b", "branch_pool"],
}

_LAYOUT = [
    ("Conv2d_1a_3x3", None), ("Conv2d_2a_3x3", None),
    ("Conv2d_2b_3x3", None), ("Conv2d_3b_1x1", None),
    ("Conv2d_4a_3x3", None),
    ("Mixed_5b", "A"), ("Mixed_5c", "A"), ("Mixed_5d", "A"),
    ("Mixed_6a", "B"),
    ("Mixed_6b", "C"), ("Mixed_6c", "C"), ("Mixed_6d", "C"),
    ("Mixed_6e", "C"),
    ("Mixed_7a", "D"), ("Mixed_7b", "E"), ("Mixed_7c", "E"),
]


def convert_torch_inception(sd: Dict) -> Dict:
    """torchvision/pytorch-fid inception_v3 state dict -> flax variables
    {params, batch_stats} for InceptionV3Pool3 (fc/AuxLogits skipped)."""
    params: Dict = {}
    stats: Dict = {}
    for name, kind in _LAYOUT:
        if kind is None:
            params[name] = _conv_bn(sd, name)
            stats[name] = _conv_bn_stats(sd, name)
        else:
            params[name] = {b: _conv_bn(sd, f"{name}.{b}")
                            for b in _BLOCK_BRANCHES[kind]}
            stats[name] = {b: _conv_bn_stats(sd, f"{name}.{b}")
                           for b in _BLOCK_BRANCHES[kind]}
    return {"params": params, "batch_stats": stats}


def load_torch_inception_checkpoint(path: str) -> Dict:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        ckpt = ckpt["state_dict"]
    return convert_torch_inception(ckpt)


def save_variables_npz(path: str, variables: Dict):
    flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    out = {}
    for p, leaf in flat:
        key = "/".join(str(getattr(k, "key", k)) for k in p)
        out[key] = np.asarray(leaf)
    np.savez(path, **out)


def load_variables_npz(path: str) -> Dict:
    data = np.load(path)
    out: Dict = {}
    for key in data.files:
        node = out
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(data[key])
    return out


def make_feature_fn(variables: Dict, batch_jit: bool = True):
    """Build feature_fn(uint8 [N,H,W,3]) -> np [N,2048] for
    eval/frechet.compute_activation_stats."""
    model = InceptionV3Pool3()

    def fwd(variables, images):
        return model.apply(variables, preprocess_uint8(images))

    if batch_jit:
        fwd = jax.jit(fwd)

    def feature_fn(images):
        return np.asarray(jax.device_get(
            fwd(variables, jnp.asarray(images))))

    return feature_fn

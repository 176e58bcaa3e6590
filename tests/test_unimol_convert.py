"""Torch UniMolGlobal conversion parity: a minimal torch model built to
the reference equations (unimol_global.py:170-330 + the un-vendored
unicore TransformerEncoderLayer/SelfMultiheadAttention semantics —
pre-LN, packed in_proj qkv, pre-softmax logits carried as the evolving
pair bias) must match the converted reed_tpu UniMolGlobal reps."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from reed_tpu.encoders.unimol import UniMolGlobal  # noqa: E402
from reed_tpu.encoders.unimol_convert import convert_torch_unimol  # noqa: E402

VOCAB, D, FFN, HEADS, LAYERS, K = 16, 32, 64, 4, 3, 8
PAD = 0


def t_gaussian(x, mean, std):
    a = (2 * math.pi) ** 0.5
    return torch.exp(-0.5 * (((x - mean) / std) ** 2)) / (a * std)


class TGaussianLayer(tnn.Module):
    """unimol.py:421-441."""

    def __init__(self, k, edge_types):
        super().__init__()
        self.K = k
        self.means = tnn.Embedding(1, k)
        self.stds = tnn.Embedding(1, k)
        self.mul = tnn.Embedding(edge_types, 1)
        self.bias = tnn.Embedding(edge_types, 1)
        tnn.init.uniform_(self.means.weight, 0, 3)
        tnn.init.uniform_(self.stds.weight, 0, 3)

    def forward(self, x, edge_type):
        mul = self.mul(edge_type).type_as(x)
        bias = self.bias(edge_type).type_as(x)
        x = mul * x.unsqueeze(-1) + bias
        x = x.expand(-1, -1, -1, self.K)
        mean = self.means.weight.float().view(-1)
        std = self.stds.weight.float().view(-1).abs() + 1e-5
        return t_gaussian(x.float(), mean, std)


class TNonLinearHead(tnn.Module):
    def __init__(self, d_in, d_out):
        super().__init__()
        self.linear1 = tnn.Linear(d_in, d_in)
        self.linear2 = tnn.Linear(d_in, d_out)

    def forward(self, x):
        return self.linear2(F.gelu(self.linear1(x)))


class TSelfAttn(tnn.Module):
    """unicore SelfMultiheadAttention: packed in_proj, q scaled."""

    def __init__(self):
        super().__init__()
        self.in_proj = tnn.Linear(D, 3 * D)
        self.out_proj = tnn.Linear(D, D)

    def forward(self, x, attn_bias):
        b, n, _ = x.shape
        hd = D // HEADS
        q, k, v = self.in_proj(x).chunk(3, dim=-1)
        q = q * (hd ** -0.5)
        q = q.view(b, n, HEADS, hd).permute(0, 2, 1, 3)
        k = k.view(b, n, HEADS, hd).permute(0, 2, 1, 3)
        v = v.view(b, n, HEADS, hd).permute(0, 2, 1, 3)
        logits = q @ k.transpose(-1, -2) + attn_bias
        probs = torch.softmax(logits, dim=-1)
        o = (probs @ v).permute(0, 2, 1, 3).reshape(b, n, D)
        return self.out_proj(o), logits


class TLayer(tnn.Module):
    """unicore TransformerEncoderLayer (post_ln=False, eval)."""

    def __init__(self):
        super().__init__()
        self.self_attn = TSelfAttn()
        self.self_attn_layer_norm = tnn.LayerNorm(D)
        self.final_layer_norm = tnn.LayerNorm(D)
        self.fc1 = tnn.Linear(D, FFN)
        self.fc2 = tnn.Linear(FFN, D)

    def forward(self, x, attn_bias):
        residual = x
        h = self.self_attn_layer_norm(x)
        o, logits = self.self_attn(h, attn_bias)
        x = residual + o
        residual = x
        h = self.final_layer_norm(x)
        x = residual + self.fc2(F.gelu(self.fc1(h)))
        return x, logits


class TEncoder(tnn.Module):
    def __init__(self):
        super().__init__()
        self.emb_layer_norm = tnn.LayerNorm(D)
        self.final_layer_norm = tnn.LayerNorm(D)
        self.layers = tnn.ModuleList([TLayer() for _ in range(LAYERS)])

    def forward(self, emb, attn_bias, padding_mask):
        x = self.emb_layer_norm(emb)
        x = x * (1 - padding_mask.unsqueeze(-1).type_as(x))
        bias = attn_bias.masked_fill(
            padding_mask[:, None, None, :].bool(), float("-inf"))
        for layer in self.layers:
            x, bias = layer(x, bias)
        return self.final_layer_norm(x)


class TUniMolGlobal(tnn.Module):
    """unimol_global.py output_global_rep_only path."""

    def __init__(self):
        super().__init__()
        self.embed_tokens = tnn.Embedding(VOCAB, D, PAD)
        self.gbf = TGaussianLayer(K, VOCAB * VOCAB)
        self.gbf_proj = TNonLinearHead(K, HEADS)
        self.encoder = TEncoder()
        self.global_rep_head = tnn.Sequential(
            tnn.Linear(D, D), tnn.GELU(), tnn.Linear(D, D), tnn.GELU(),
            tnn.Linear(D, D))

    def forward(self, tokens, dist, edge_type):
        padding = tokens.eq(PAD)
        x = self.embed_tokens(tokens)
        gbf = self.gbf(dist, edge_type)
        bias = self.gbf_proj(gbf).permute(0, 3, 1, 2)
        x = self.encoder(x, bias, padding.float())
        rep = x.mean(dim=1)
        rep = self.global_rep_head(rep)
        mean = rep.mean(dim=-1, keepdim=True)
        std = rep.std(dim=-1, keepdim=True)
        return (rep - mean) / (std + 1e-6)


def test_unimol_convert_parity():
    torch.manual_seed(0)
    tmodel = TUniMolGlobal().eval()

    b, n = 2, 7
    rng = np.random.default_rng(0)
    tokens = rng.integers(3, VOCAB, (b, n)).astype(np.int64)
    tokens[:, 0] = 1
    tokens[0, -1] = 2
    tokens[1, -2:] = [2, PAD]      # one padded position
    coords = rng.standard_normal((b, n, 3)).astype(np.float32)
    dist = np.linalg.norm(coords[:, :, None] - coords[:, None],
                          axis=-1).astype(np.float32)
    edge_type = (tokens[:, :, None] * VOCAB + tokens[:, None, :]).astype(
        np.int64)

    with torch.no_grad():
        tout = tmodel(torch.tensor(tokens), torch.tensor(dist),
                      torch.tensor(edge_type)).numpy()

    # converter expects encoder-prefixed LN names
    sd = tmodel.state_dict()
    params = convert_torch_unimol(sd)
    model = UniMolGlobal(vocab_size=VOCAB, embed_dim=D, ffn_dim=FFN,
                         heads=HEADS, layers=LAYERS, gaussian_k=K,
                         rep_dim=D, padding_idx=PAD)
    out = model.apply({"params": jax.tree.map(jnp.asarray, params)},
                      jnp.asarray(tokens.astype(np.int32)),
                      jnp.asarray(dist),
                      jnp.asarray(edge_type.astype(np.int32)))
    diff = np.max(np.abs(np.asarray(out) - tout))
    assert diff < 2e-4, diff

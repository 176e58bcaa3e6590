"""Torch-checkpoint conversion parity: a minimal torch SiT (built to the
reference architecture equations, image/models/sit.py) must produce the
same outputs as the converted reed_tpu SiT."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from reed_tpu.encoders.sit_convert import convert_torch_sit  # noqa: E402
from reed_tpu.models.sit import SiT  # noqa: E402

D, HEADS, DEPTH, P, C, SIZE, NCLS = 16, 2, 2, 2, 4, 8, 10


class TorchMiniSiT(tnn.Module):
    """Reference-equation SiT (image/models/sit.py:107-311), minimal."""

    def __init__(self):
        super().__init__()
        self.x_embedder = tnn.Conv2d(C, D, P, stride=P)
        self.t_mlp = tnn.Sequential(tnn.Linear(256, D), tnn.SiLU(),
                                    tnn.Linear(D, D))
        self.y_table = tnn.Embedding(NCLS + 1, D)
        self.blocks = tnn.ModuleList()
        for _ in range(DEPTH):
            blk = tnn.ModuleDict({
                "adaln": tnn.Linear(D, 6 * D),
                "qkv": tnn.Linear(D, 3 * D),
                "proj": tnn.Linear(D, D),
                "fc1": tnn.Linear(D, 4 * D),
                "fc2": tnn.Linear(4 * D, D),
            })
            self.blocks.append(blk)
        self.final_adaln = tnn.Linear(D, 2 * D)
        self.final_linear = tnn.Linear(D, P * P * C)

    @staticmethod
    def t_embedding(t, dim=256):
        half = dim // 2
        freqs = torch.exp(-math.log(10000) * torch.arange(half).float() / half)
        args = t[:, None].float() * freqs[None]
        return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)

    def forward(self, x_nchw, t, y, pos_embed):
        x = self.x_embedder(x_nchw).flatten(2).transpose(1, 2)  # [B,T,D]
        x = x + pos_embed
        c = self.t_mlp(self.t_embedding(t)) + self.y_table(y)
        ln = tnn.LayerNorm(D, elementwise_affine=False, eps=1e-6)
        for blk in self.blocks:
            mod = blk["adaln"](tnn.functional.silu(c))
            sh_a, sc_a, g_a, sh_m, sc_m, g_m = mod.chunk(6, dim=-1)
            h = ln(x) * (1 + sc_a.unsqueeze(1)) + sh_a.unsqueeze(1)
            b, n, _ = h.shape
            qkv = blk["qkv"](h).reshape(b, n, 3, HEADS, D // HEADS)
            q, k, v = qkv.permute(2, 0, 3, 1, 4)
            attn = torch.softmax(
                q @ k.transpose(-2, -1) / math.sqrt(D // HEADS), dim=-1)
            h = (attn @ v).transpose(1, 2).reshape(b, n, D)
            x = x + g_a.unsqueeze(1) * blk["proj"](h)
            h = ln(x) * (1 + sc_m.unsqueeze(1)) + sh_m.unsqueeze(1)
            h = blk["fc2"](tnn.functional.gelu(blk["fc1"](h)))
            x = x + g_m.unsqueeze(1) * h
        mod = self.final_adaln(tnn.functional.silu(c))
        sh, sc = mod.chunk(2, dim=-1)
        x = ln(x) * (1 + sc.unsqueeze(1)) + sh.unsqueeze(1)
        return self.final_linear(x)  # [B, T, P*P*C]

    def reference_state_dict(self):
        sd = {}
        sd["x_embedder.proj.weight"] = self.x_embedder.weight
        sd["x_embedder.proj.bias"] = self.x_embedder.bias
        sd["t_embedder.mlp.0.weight"] = self.t_mlp[0].weight
        sd["t_embedder.mlp.0.bias"] = self.t_mlp[0].bias
        sd["t_embedder.mlp.2.weight"] = self.t_mlp[2].weight
        sd["t_embedder.mlp.2.bias"] = self.t_mlp[2].bias
        sd["y_embedder.embedding_table.weight"] = self.y_table.weight
        for i, blk in enumerate(self.blocks):
            sd[f"blocks.{i}.adaLN_modulation.1.weight"] = blk["adaln"].weight
            sd[f"blocks.{i}.adaLN_modulation.1.bias"] = blk["adaln"].bias
            sd[f"blocks.{i}.attn.qkv.weight"] = blk["qkv"].weight
            sd[f"blocks.{i}.attn.qkv.bias"] = blk["qkv"].bias
            sd[f"blocks.{i}.attn.proj.weight"] = blk["proj"].weight
            sd[f"blocks.{i}.attn.proj.bias"] = blk["proj"].bias
            sd[f"blocks.{i}.mlp.fc1.weight"] = blk["fc1"].weight
            sd[f"blocks.{i}.mlp.fc1.bias"] = blk["fc1"].bias
            sd[f"blocks.{i}.mlp.fc2.weight"] = blk["fc2"].weight
            sd[f"blocks.{i}.mlp.fc2.bias"] = blk["fc2"].bias
        sd["final_layer.adaLN_modulation.1.weight"] = self.final_adaln.weight
        sd["final_layer.adaLN_modulation.1.bias"] = self.final_adaln.bias
        sd["final_layer.linear.weight"] = self.final_linear.weight
        sd["final_layer.linear.bias"] = self.final_linear.bias
        return {k: v.detach().numpy() for k, v in sd.items()}


def test_torch_conversion_matches():
    torch.manual_seed(0)
    tmodel = TorchMiniSiT().eval()

    model = SiT(input_size=SIZE, patch_size=P, in_channels=C, hidden_size=D,
                depth=DEPTH, num_heads=HEADS, num_classes=NCLS,
                encoder_depth=1, z_dims=(8,), class_dropout_prob=0.1,
                exact_gelu=True)
    variables = convert_torch_sit(tmodel.reference_state_dict(), DEPTH)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, SIZE, SIZE, C)).astype(np.float32)
    t = np.array([0.3, 0.9], np.float32)
    y = np.array([1, 7])

    from reed_tpu.nn.layers import get_2d_sincos_pos_embed

    pos = get_2d_sincos_pos_embed(D, SIZE // P)
    with torch.no_grad():
        out_t = tmodel(torch.tensor(x).permute(0, 3, 1, 2),
                       torch.tensor(t), torch.tensor(y),
                       torch.tensor(pos)[None])
    # torch output is [B, T, P*P*C]; ours is unpatchified NHWC
    out_j, _ = model.apply(variables, jnp.asarray(x), jnp.asarray(t),
                           jnp.asarray(y), train=False)
    from reed_tpu.nn.layers import patchify

    out_j_tokens = patchify(out_j, P)
    assert np.allclose(np.asarray(out_j_tokens), out_t.numpy(), atol=2e-4), \
        np.abs(np.asarray(out_j_tokens) - out_t.numpy()).max()

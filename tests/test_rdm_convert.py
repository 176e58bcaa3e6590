"""Torch RDM checkpoint conversion parity: a torch SimpleMLP built to the
reference equations (rdm/modules/diffusionmodules/latentmlp.py) + the
ClassEmbedder conditioner must match the converted reed_tpu SimpleMLP."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from reed_tpu.encoders.rdm_convert import convert_torch_rdm  # noqa: E402
from reed_tpu.models.rdm_mlp import SimpleMLP  # noqa: E402

C, MC, BC, TED, NRES, NCLS = 8, 24, 16, 12, 2, 10  # tiny dims


class TorchResBlock(tnn.Module):
    """latentmlp.py:10-75."""

    def __init__(self):
        super().__init__()
        self.in_layers = tnn.Sequential(tnn.LayerNorm(MC), tnn.SiLU(),
                                        tnn.Linear(MC, BC))
        self.emb_layers = tnn.Sequential(tnn.SiLU(), tnn.Linear(TED, BC))
        self.context_layers = tnn.Sequential(tnn.SiLU(), tnn.Linear(C, BC))
        self.out_layers = tnn.Sequential(tnn.LayerNorm(BC), tnn.SiLU(),
                                         tnn.Dropout(0.0),
                                         tnn.Linear(BC, MC))

    def forward(self, x, emb, context):
        h = self.in_layers(x)
        h = h + self.emb_layers(emb) + self.context_layers(context)
        return x + self.out_layers(h)


class TorchSimpleMLP(tnn.Module):
    """latentmlp.py:77-152 + ClassEmbedder (encoders/modules.py:12-20)."""

    def __init__(self):
        super().__init__()
        self.time_embed = tnn.Sequential(tnn.Linear(MC, TED), tnn.SiLU(),
                                         tnn.Linear(TED, TED))
        self.input_proj = tnn.Linear(C, MC)
        self.res_blocks = tnn.ModuleList(
            [TorchResBlock() for _ in range(NRES)])
        self.out = tnn.Sequential(tnn.LayerNorm(MC, eps=1e-6), tnn.SiLU(),
                                  tnn.Linear(MC, C))
        self.class_embedding = tnn.Embedding(NCLS, C)

    @staticmethod
    def t_embedding(t, dim=MC, max_period=10000.0):
        half = dim // 2
        freqs = torch.exp(-math.log(max_period)
                          * torch.arange(half).float() / half)
        args = t[:, None].float() * freqs[None]
        return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)

    def forward(self, x, t, n_nodes):
        emb = self.time_embed(self.t_embedding(t))
        ctx = self.class_embedding(n_nodes)
        h = self.input_proj(x)
        for blk in self.res_blocks:
            h = blk(h, emb, ctx)
        return self.out(h)

    def ldm_state_dict(self):
        """LatentDiffusion checkpoint key layout."""
        sd = {}
        for k, v in self.state_dict().items():
            if k.startswith("class_embedding."):
                sd["cond_stage_model.embedding."
                   + k.split(".", 1)[1]] = v
            else:
                sd[f"model.diffusion_model.{k}"] = v
        return sd


def test_rdm_conversion_parity():
    torch.manual_seed(0)
    tmodel = TorchSimpleMLP().eval()
    g = torch.Generator().manual_seed(1)
    x = torch.randn(4, C, generator=g)
    t = torch.randint(0, 1000, (4,), generator=g)
    n_nodes = torch.randint(0, NCLS, (4,), generator=g)
    with torch.no_grad():
        ref = tmodel(x, t, n_nodes).numpy()

    params = convert_torch_rdm(tmodel.ldm_state_dict(),
                               num_classes=NCLS + 1)  # reed table = +1 row
    model = SimpleMLP(in_channels=C, time_embed_dim=TED, model_channels=MC,
                      bottleneck_channels=BC, out_channels=C,
                      num_res_blocks=NRES, use_context=True,
                      num_classes=NCLS, context_channels=C)
    out = model.apply({"params": params}, jnp.asarray(x.numpy()),
                      jnp.asarray(t.numpy()), jnp.asarray(n_nodes.numpy()))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def test_rdm_conversion_bare_state_dict_and_padding():
    torch.manual_seed(1)
    tmodel = TorchSimpleMLP().eval()
    # bare SimpleMLP keys (no model.diffusion_model prefix, no embedder)
    bare = {k: v for k, v in tmodel.state_dict().items()
            if not k.startswith("class_embedding.")}
    params = convert_torch_rdm(bare)
    assert "res_1" in params and "class_embedder" not in params
    # embedder table zero-padded up to the requested row count
    params = convert_torch_rdm(tmodel.ldm_state_dict(), num_classes=NCLS + 3)
    table = params["class_embedder"]["embedding"]
    assert table.shape == (NCLS + 3, C)
    assert np.allclose(table[NCLS:], 0.0)


def test_rdm_sampling_with_converted_params():
    """Converted params drive the reed_tpu RDM DDIM sampler end to end."""
    from reed_tpu.diffusion.rdm import RDMConfig, RDMDiffusion

    torch.manual_seed(2)
    tmodel = TorchSimpleMLP().eval()
    params = convert_torch_rdm(tmodel.ldm_state_dict(),
                               num_classes=NCLS + 1)
    model = SimpleMLP(in_channels=C, time_embed_dim=TED, model_channels=MC,
                      bottleneck_channels=BC, out_channels=C,
                      num_res_blocks=NRES, use_context=True,
                      num_classes=NCLS, context_channels=C)

    def model_fn(x_t, t, n_nodes):
        return model.apply({"params": params}, x_t, t, n_nodes)

    diffusion = RDMDiffusion(RDMConfig(channels=C, timesteps=20), model_fn)
    reps = diffusion.ddim_sample(jax.random.PRNGKey(0), (3, C),
                                 jnp.array([3, 5, 7]), num_steps=5)
    assert reps.shape == (3, C)
    assert np.isfinite(np.asarray(reps)).all()


@pytest.mark.slow
def test_eval_molecule_with_converted_rdm(tmp_path, capsys):
    """eval-molecule --rdm-ref-ckpt: two-stage sampling with a converted
    reference RDM as the DDIM rep sampler."""
    import json

    from reed_tpu.cli import main

    torch.manual_seed(3)
    tmodel = TorchSimpleMLP().eval()
    path = str(tmp_path / "rdm.ckpt")
    torch.save({"state_dict": tmodel.ldm_state_dict()}, path)

    main(["eval-molecule", "--rdm-ref-ckpt", path, "--n-replicates", "1",
          "--num-steps", "4", "--batch-size", "4",
          "--set", "hidden_nf=16", "--set", "n_layers=1",
          "--set", "max_nodes=8", "--set", f"rep_nf={C}",
          "--dp", "1", "--fsdp", "1", "--tp", "1"])
    out = capsys.readouterr().out
    assert "DDIM rep sampler from converted RDM" in out
    lines = out.strip().splitlines()
    start = max(i for i, l in enumerate(lines) if l.startswith("{"))
    metrics = json.loads("\n".join(lines[start:]))
    assert metrics  # metric block printed

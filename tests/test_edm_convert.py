"""Torch EDM checkpoint conversion parity: a minimal torch EGNN dynamics
built to the reference equations (molecule/egnn/egnn_new.py,
egnn/models.py, models/attention.py) must produce the same outputs as the
converted reed_tpu EGNNDynamics; GammaNetwork params must match the
reference PositiveLinear formulation (en_diffusion.py:120-245)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from reed_tpu.diffusion.edm import GammaNetwork  # noqa: E402
from reed_tpu.encoders.edm_convert import (convert_gamma_network,  # noqa
                                           convert_torch_edm)
from reed_tpu.models.egnn import EGNNDynamics  # noqa: E402

H, NTYPES, REP, NH = 16, 4, 8, 4      # hidden, atom types, rep dim, heads
IN_NF = NTYPES + 1                    # + charges
NORM_FACTOR = 100.0
NORM_CONST = 1.0
COORDS_RANGE = 15.0
N_LAYERS, INV_SUB = 2, 2


class TorchGCL(tnn.Module):
    """egnn_new.py:6-68 with dense-batched forward."""

    def __init__(self):
        super().__init__()
        self.edge_mlp = tnn.Sequential(tnn.Linear(2 * H + 2, H), tnn.SiLU(),
                                       tnn.Linear(H, H), tnn.SiLU())
        self.node_mlp = tnn.Sequential(tnn.Linear(2 * H, H), tnn.SiLU(),
                                       tnn.Linear(H, H))
        self.att_mlp = tnn.Sequential(tnn.Linear(H, 1), tnn.Sigmoid())

    def forward(self, h, edge_attr, node_mask, edge_mask):
        b, n, d = h.shape
        hi = h[:, :, None, :].expand(b, n, n, d)
        hj = h[:, None, :, :].expand(b, n, n, d)
        m = self.edge_mlp(torch.cat([hi, hj, edge_attr], -1))
        m = m * self.att_mlp(m) * edge_mask
        agg = m.sum(2) / NORM_FACTOR
        h = h + self.node_mlp(torch.cat([h, agg], -1))
        return h * node_mask


class TorchEquivUpdate(tnn.Module):
    """egnn_new.py:71-108."""

    def __init__(self):
        super().__init__()
        self.coord_mlp = tnn.Sequential(
            tnn.Linear(2 * H + 2, H), tnn.SiLU(), tnn.Linear(H, H),
            tnn.SiLU(), tnn.Linear(H, 1, bias=False))

    def forward(self, h, x, coord_diff, edge_attr, node_mask, edge_mask):
        b, n, d = h.shape
        hi = h[:, :, None, :].expand(b, n, n, d)
        hj = h[:, None, :, :].expand(b, n, n, d)
        scalar = self.coord_mlp(torch.cat([hi, hj, edge_attr], -1))
        trans = coord_diff * torch.tanh(scalar) * (COORDS_RANGE / N_LAYERS)
        trans = trans * edge_mask
        x = x + trans.sum(2) / NORM_FACTOR
        return x * node_mask


class TorchEBlock(tnn.Module):
    """egnn_new.py:115-157 (distances recomputed with norm_constant)."""

    def __init__(self):
        super().__init__()
        for j in range(INV_SUB):
            self.add_module(f"gcl_{j}", TorchGCL())
        self.add_module("gcl_equiv", TorchEquivUpdate())

    def forward(self, h, x, node_mask, edge_mask, edge_attr0):
        diff = x[:, :, None, :] - x[:, None, :, :]
        radial = (diff ** 2).sum(-1, keepdim=True)
        coord_diff = diff / (radial.add(1e-8).sqrt() + NORM_CONST)
        edge_attr = torch.cat([radial, edge_attr0], -1)
        for j in range(INV_SUB):
            h = self._modules[f"gcl_{j}"](h, edge_attr, node_mask, edge_mask)
        x = self.gcl_equiv(h, x, coord_diff, edge_attr, node_mask, edge_mask)
        return h * node_mask, x


class TorchAttnBlock(tnn.Module):
    """models/attention.py BasicTransformerBlock, self_attention=False."""

    def __init__(self):
        super().__init__()
        self.norm2 = tnn.LayerNorm(H)
        self.norm3 = tnn.LayerNorm(H)
        self.attn2 = tnn.Module()
        self.attn2.to_q = tnn.Linear(H, H, bias=False)
        self.attn2.to_k = tnn.Linear(REP, H, bias=False)
        self.attn2.to_v = tnn.Linear(REP, H, bias=False)
        self.attn2.to_out = tnn.Sequential(tnn.Linear(H, H), tnn.Dropout(0.0))
        self.ff = tnn.Module()
        proj = tnn.Module()
        proj.proj = tnn.Linear(H, 4 * H * 2)
        self.ff.net = tnn.Sequential(proj, tnn.Dropout(0.0),
                                     tnn.Linear(4 * H, H))

    def forward(self, x, context):
        q_in = self.norm2(x)
        b, n, _ = x.shape
        hd = H // NH
        q = self.attn2.to_q(q_in).view(b, n, NH, hd)
        k = self.attn2.to_k(context).view(b, 1, NH, hd)
        v = self.attn2.to_v(context).view(b, 1, NH, hd)
        sim = torch.einsum("bnhd,bmhd->bhnm", q, k) / math.sqrt(hd)
        attn = sim.softmax(-1)
        out = torch.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, n, H)
        x = x + self.attn2.to_out(out)
        a, g = self.ff.net[0].proj(self.norm3(x)).chunk(2, -1)
        x = x + self.ff.net[2](a * F.gelu(g))
        return x


class TorchMiniEGNN(tnn.Module):
    """egnn_new.py:157-250 EGNN (dense-batched)."""

    def __init__(self):
        super().__init__()
        in_nf = IN_NF + 1  # + time
        self.embedding = tnn.Linear(in_nf, H)
        self.embedding_out = tnn.Linear(H, in_nf)
        self.attns = tnn.ModuleList(
            [tnn.Sequential(TorchAttnBlock()) for _ in range(N_LAYERS)])
        for i in range(N_LAYERS):
            self.add_module(f"e_block_{i}", TorchEBlock())

    def forward(self, h, x, node_mask, edge_mask, rep):
        diff = x[:, :, None, :] - x[:, None, :, :]
        dist0 = (diff ** 2).sum(-1, keepdim=True)
        h = self.embedding(h) * node_mask
        ctx = rep[:, None, :]
        for i in range(N_LAYERS):
            for blk in self.attns[i]:
                h = blk(h, ctx) * node_mask
            h, x = self._modules[f"e_block_{i}"](h, x, node_mask, edge_mask,
                                                 dist0)
        return self.embedding_out(h) * node_mask, x


class TorchMiniDynamics(tnn.Module):
    """egnn/models.py EGNN_dynamics_QM9 (dense)."""

    def __init__(self):
        super().__init__()
        self.fake_latent = tnn.Parameter(torch.randn(1, REP) * 0.02)
        self.egnn = TorchMiniEGNN()

    def forward(self, t, xh, node_mask, edge_mask, rep):
        b, n, _ = xh.shape
        xh = xh * node_mask
        x = xh[:, :, :3]
        h = xh[:, :, 3:]
        t_arr = t.view(-1, 1, 1).expand(b, n, 1)
        h = torch.cat([h, t_arr], -1)
        h_final, x_final = self.egnn(h, x, node_mask, edge_mask, rep)
        vel = (x_final - x) * node_mask
        h_final = h_final[:, :, :-1]
        nmean = (vel * node_mask).sum(1, keepdim=True) \
            / node_mask.sum(1, keepdim=True)
        vel = (vel - nmean) * node_mask
        return torch.cat([vel, h_final], -1)


def _batch(b=2, n=6, real=5, seed=0):
    g = torch.Generator().manual_seed(seed)
    node_mask = (torch.arange(n)[None, :] < real).float()[..., None]
    node_mask = node_mask.expand(b, n, 1).contiguous()
    diag = torch.eye(n)[None, :, :, None]
    edge_mask = node_mask[:, :, None, :] * node_mask[:, None, :, :] * (1 - diag)
    x = torch.randn(b, n, 3, generator=g) * node_mask
    x = x - (x.sum(1, keepdim=True) / node_mask.sum(1, keepdim=True))
    x = x * node_mask
    h = torch.randn(b, n, IN_NF, generator=g) * node_mask
    rep = torch.randn(b, REP, generator=g)
    t = torch.rand(b, generator=g)
    return torch.cat([x, h], -1), node_mask, edge_mask, rep, t


def test_egnn_dynamics_conversion_parity():
    torch.manual_seed(0)
    tmodel = TorchMiniDynamics().eval()
    xh, node_mask, edge_mask, rep, t = _batch()
    with torch.no_grad():
        ref_out = tmodel(t, xh, node_mask, edge_mask, rep).numpy()

    params, gamma = convert_torch_edm(tmodel.state_dict())
    assert gamma is None
    model = EGNNDynamics(
        in_node_nf=IN_NF, hidden_nf=H, n_layers=N_LAYERS,
        inv_sublayers=INV_SUB, attention=True, tanh=True,
        coords_range=COORDS_RANGE, norm_constant=NORM_CONST,
        normalization_factor=NORM_FACTOR, rep_nf=REP, rep_dropout_prob=0.1)
    out = model.apply(
        {"params": params}, jnp.asarray(t.numpy()), jnp.asarray(xh.numpy()),
        jnp.asarray(node_mask.numpy()), jnp.asarray(edge_mask.numpy()),
        rep=jnp.asarray(rep.numpy()), train=False)
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=2e-4)


def test_egnn_conversion_with_dynamics_prefix_and_ddp():
    torch.manual_seed(1)
    tmodel = TorchMiniDynamics().eval()
    sd = {f"module.dynamics.{k}": v for k, v in tmodel.state_dict().items()}
    sd["module.gamma.l1.weight"] = torch.randn(1, 1)
    sd["module.gamma.l1.bias"] = torch.zeros(1)
    sd["module.gamma.l2.weight"] = torch.randn(32, 1)
    sd["module.gamma.l2.bias"] = torch.zeros(32)
    sd["module.gamma.l3.weight"] = torch.randn(1, 32)
    sd["module.gamma.l3.bias"] = torch.zeros(1)
    sd["module.gamma.gamma_0"] = torch.tensor([-5.0])
    sd["module.gamma.gamma_1"] = torch.tensor([10.0])
    params, gamma = convert_torch_edm(sd)
    assert "egnn" in params and "fake_latent" in params
    assert gamma is not None and gamma["l2_w"].shape == (1, 32)


@pytest.mark.slow
def test_eval_molecule_cli_with_ref_ckpt(tmp_path, capsys):
    """eval-molecule --ref-ckpt samples from a converted reference-format
    torch checkpoint end to end."""
    import json

    from reed_tpu.cli import main

    torch.manual_seed(3)
    tmodel = TorchMiniDynamics().eval()
    sd = {f"dynamics.{k}": v for k, v in tmodel.state_dict().items()}
    path = str(tmp_path / "generative_model_ema.npy")
    torch.save(sd, path)

    main(["eval-molecule", "--ref-ckpt", path, "--n-replicates", "1",
          "--num-steps", "5", "--batch-size", "4",
          "--set", "hidden_nf=16", "--set", "n_layers=2",
          "--set", "inv_sublayers=2", "--set", "num_atom_types=4",
          "--set", "max_nodes=8", "--set", "rep_nf=8",
          "--set", "normalization_factor=100.0",
          "--dp", "1", "--fsdp", "1", "--tp", "1"])
    lines = capsys.readouterr().out.strip().splitlines()
    start = max(i for i, l in enumerate(lines) if l.startswith("{"))
    out = json.loads("\n".join(lines[start:]))
    assert "validity" in json.dumps(out) or out  # metrics block printed


def test_gamma_network_conversion_parity():
    """Converted gamma params reproduce the reference PositiveLinear
    gamma(t) = gamma_0 + (gamma_1-gamma_0) * norm(gamma_tilde)."""
    torch.manual_seed(2)
    sd = {
        "gamma.l1.weight": torch.randn(1, 1),
        "gamma.l1.bias": torch.randn(1),
        "gamma.l2.weight": torch.randn(16, 1),
        "gamma.l2.bias": torch.randn(16),
        "gamma.l3.weight": torch.randn(1, 16),
        "gamma.l3.bias": torch.randn(1),
        "gamma.gamma_0": torch.tensor([-5.0]),
        "gamma.gamma_1": torch.tensor([10.0]),
    }
    gamma = convert_gamma_network(sd)

    def ref_tilde(t):
        l1 = F.linear(t, F.softplus(sd["gamma.l1.weight"]),
                      sd["gamma.l1.bias"])
        l2 = torch.sigmoid(F.linear(l1, F.softplus(sd["gamma.l2.weight"]),
                                    sd["gamma.l2.bias"]))
        return l1 + F.linear(l2, F.softplus(sd["gamma.l3.weight"]),
                             sd["gamma.l3.bias"])

    t = torch.linspace(0, 1, 11).view(-1, 1)
    tilde = ref_tilde(t)
    t0, t1 = ref_tilde(torch.zeros(1, 1)), ref_tilde(torch.ones(1, 1))
    ref_gamma = (-5.0 + 15.0 * (tilde - t0) / (t1 - t0)).squeeze(1).numpy()

    got = GammaNetwork.apply(gamma, jnp.linspace(0, 1, 11))
    np.testing.assert_allclose(np.asarray(got), ref_gamma, atol=1e-5)


@pytest.mark.slow
def test_train_edm_warm_start_from_ref_ckpt(tmp_path, capsys):
    """train-molecule-edm --ref-ckpt warm-starts training from a converted
    reference checkpoint."""
    from reed_tpu.cli import main

    torch.manual_seed(6)
    tmodel = TorchMiniDynamics().eval()
    path = str(tmp_path / "generative_model.npy")
    torch.save({f"dynamics.{k}": v for k, v in tmodel.state_dict().items()},
               path)
    main(["train-molecule-edm", "--ref-ckpt", path, "--synthetic",
          "--steps", "6", "--batch-size", "4", "--log-every", "3",
          "--set", "hidden_nf=16", "--set", "n_layers=2",
          "--set", "inv_sublayers=2", "--set", "num_atom_types=4",
          "--set", "max_nodes=8", "--set", "rep_nf=8",
          "--set", "normalization_factor=100.0",
          "--dp", "1", "--fsdp", "1", "--tp", "1"])
    out = capsys.readouterr().out
    assert "warm-started from reference checkpoint" in out
    assert "[step 6]" in out

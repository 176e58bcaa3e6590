"""Torch fmif checkpoint conversion parity: a minimal torch ProteinMPNNFMIF
built to the reference equations (protein/fmif/model_utils.py:286-653) must
match the converted reed_tpu model's log-probs and projector outputs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from reed_tpu.encoders.fmif_convert import convert_torch_fmif  # noqa: E402
from reed_tpu.models.pmpnn import ProteinMPNNFMIF  # noqa: E402

H, K, VOCAB = 16, 5, 22
NPOS, NRBF = 16, 16
SD, PD, STD = 12, 8, 10   # single/pair/structure projector dims
ENC, DEC = 2, 2
ALIGN = 1


def t_gather_edges(edges, e_idx):
    neighbors = e_idx.unsqueeze(-1).expand(-1, -1, -1, edges.size(-1))
    return torch.gather(edges, 2, neighbors)


def t_gather_nodes(nodes, e_idx):
    flat = e_idx.reshape(e_idx.shape[0], -1, 1).expand(-1, -1, nodes.size(2))
    nf = torch.gather(nodes, 1, flat)
    return nf.view(list(e_idx.shape[:3]) + [-1])


def t_cat_neighbors_nodes(h_nodes, h_neighbors, e_idx):
    # reference order: [h_neighbors, gathered h_nodes] (model_utils.py:280-283)
    return torch.cat([h_neighbors, t_gather_nodes(h_nodes, e_idx)], -1)


class TFeatures(tnn.Module):
    """model_utils.py:421-517 (augment_eps=0)."""

    def __init__(self):
        super().__init__()
        self.embeddings = tnn.Module()
        self.embeddings.linear = tnn.Linear(2 * 32 + 2, NPOS)
        self.edge_embedding = tnn.Linear(NPOS + NRBF * 25, H, bias=False)
        self.norm_edges = tnn.LayerNorm(H)

    @staticmethod
    def _rbf(d):
        mu = torch.linspace(2.0, 22.0, NRBF).view(1, 1, 1, -1)
        sigma = 20.0 / NRBF
        return torch.exp(-((d.unsqueeze(-1) - mu) / sigma) ** 2)

    def forward(self, x, mask, residue_idx, chain_labels):
        b_v = x[:, :, 1] - x[:, :, 0]
        c_v = x[:, :, 2] - x[:, :, 1]
        a_v = torch.cross(b_v, c_v, dim=-1)
        cb = -0.58273431 * a_v + 0.56802827 * b_v - 0.54067466 * c_v \
            + x[:, :, 1]
        atoms = {"N": x[:, :, 0], "Ca": x[:, :, 1], "C": x[:, :, 2],
                 "O": x[:, :, 3], "Cb": cb}
        ca = atoms["Ca"]
        m2 = mask.unsqueeze(1) * mask.unsqueeze(2)
        dx = ca.unsqueeze(1) - ca.unsqueeze(2)
        d = m2 * torch.sqrt((dx ** 2).sum(3) + 1e-6)
        d_max, _ = d.max(-1, keepdim=True)
        d_adj = d + (1.0 - m2) * d_max
        d_nb, e_idx = torch.topk(d_adj, K, dim=-1, largest=False)

        pairs = [("Ca", "Ca"), ("N", "N"), ("C", "C"), ("O", "O"),
                 ("Cb", "Cb"), ("Ca", "N"), ("Ca", "C"), ("Ca", "O"),
                 ("Ca", "Cb"), ("N", "C"), ("N", "O"), ("N", "Cb"),
                 ("Cb", "C"), ("Cb", "O"), ("O", "C"), ("N", "Ca"),
                 ("C", "Ca"), ("O", "Ca"), ("Cb", "Ca"), ("C", "N"),
                 ("O", "N"), ("Cb", "N"), ("C", "Cb"), ("O", "Cb"),
                 ("C", "O")]
        rbf_all = [self._rbf(d_nb)]
        for a_n, b_n in pairs[1:]:
            aa, bb = atoms[a_n], atoms[b_n]
            dab = torch.sqrt(((aa[:, :, None] - bb[:, None, :]) ** 2
                              ).sum(-1) + 1e-6)
            dab = t_gather_edges(dab[..., None], e_idx)[..., 0]
            rbf_all.append(self._rbf(dab))
        rbf_all = torch.cat(rbf_all, -1)

        offset = residue_idx[:, :, None] - residue_idx[:, None, :]
        offset = t_gather_edges(offset[..., None], e_idx)[..., 0]
        d_chains = ((chain_labels[:, :, None]
                     - chain_labels[:, None, :]) == 0).long()
        e_chains = t_gather_edges(d_chains[..., None], e_idx)[..., 0]
        dd = torch.clip(offset.long() + 32, 0, 64) * e_chains \
            + (1 - e_chains) * 65
        e_pos = self.embeddings.linear(F.one_hot(dd, 66).float())
        e = torch.cat((e_pos, rbf_all), -1)
        return self.norm_edges(self.edge_embedding(e)), e_idx


class TFFN(tnn.Module):
    def __init__(self):
        super().__init__()
        self.W_in = tnn.Linear(H, 4 * H)
        self.W_out = tnn.Linear(4 * H, H)

    def forward(self, x):
        return self.W_out(F.gelu(self.W_in(x)))


class TEnc(tnn.Module):
    def __init__(self):
        super().__init__()
        for w, din in [("W1", 3 * H), ("W2", H), ("W3", H),
                       ("W11", 3 * H), ("W12", H), ("W13", H)]:
            setattr(self, w, tnn.Linear(din, H))
        self.norm1, self.norm2, self.norm3 = (tnn.LayerNorm(H)
                                              for _ in range(3))
        self.dense = TFFN()

    def forward(self, h_v, h_e, e_idx, mask, mask_attend):
        h_ev = t_cat_neighbors_nodes(h_v, h_e, e_idx)
        h_exp = h_v.unsqueeze(-2).expand(-1, -1, h_ev.size(-2), -1)
        h_ev = torch.cat([h_exp, h_ev], -1)
        msg = self.W3(F.gelu(self.W2(F.gelu(self.W1(h_ev)))))
        msg = mask_attend.unsqueeze(-1) * msg
        h_v = self.norm1(h_v + msg.sum(-2) / 30.0)
        h_v = self.norm2(h_v + self.dense(h_v))
        h_v = mask.unsqueeze(-1) * h_v
        h_ev = t_cat_neighbors_nodes(h_v, h_e, e_idx)
        h_exp = h_v.unsqueeze(-2).expand(-1, -1, h_ev.size(-2), -1)
        h_ev = torch.cat([h_exp, h_ev], -1)
        msg = self.W13(F.gelu(self.W12(F.gelu(self.W11(h_ev)))))
        h_e = self.norm3(h_e + msg)
        return h_v, h_e


class TDec(tnn.Module):
    def __init__(self):
        super().__init__()
        self.W1 = tnn.Linear(4 * H, H)
        self.W2 = tnn.Linear(H, H)
        self.W3 = tnn.Linear(H, H)
        self.norm1, self.norm2 = tnn.LayerNorm(H), tnn.LayerNorm(H)
        self.dense = TFFN()
        self.W_edge = tnn.Sequential(tnn.LayerNorm(3 * H),
                                     tnn.Linear(3 * H, 3 * H), tnn.GELU(),
                                     tnn.Linear(3 * H, 2 * H))
        self.norm_edge = tnn.LayerNorm(2 * H)

    def forward(self, h_v, h_esv, h_es, mask):
        h_exp = h_v.unsqueeze(-2).expand(-1, -1, h_esv.size(-2), -1)
        h_ev = torch.cat([h_exp, h_esv], -1)
        msg = self.W3(F.gelu(self.W2(F.gelu(self.W1(h_ev)))))
        de = self.W_edge(torch.cat([msg, h_es], -1))
        h_es_new = self.norm_edge(h_es + de)
        h_v = self.norm1(h_v + msg.sum(-2) / 30.0)
        h_v = self.norm2(h_v + self.dense(h_v))
        h_v = mask.unsqueeze(-1) * h_v
        return h_v, h_es_new


class TorchMiniFMIF(tnn.Module):
    def __init__(self):
        super().__init__()
        self.features = TFeatures()
        self.node_embeds = tnn.Parameter(torch.randn(H) * 0.1)
        self.W_e = tnn.Linear(H, H)
        self.W_s = tnn.Embedding(VOCAB, H)
        self.encoder_layers = tnn.ModuleList([TEnc() for _ in range(ENC)])
        self.decoder_layers = tnn.ModuleList([TDec() for _ in range(DEC)])
        self.W_out = tnn.Linear(H, VOCAB)
        self.projectors_single = tnn.Sequential(
            tnn.Linear(H, 2 * SD), tnn.SiLU(), tnn.Linear(2 * SD, SD))
        self.projectors_pair = tnn.Sequential(
            tnn.Linear(2 * H, 2 * PD), tnn.SiLU(), tnn.Linear(2 * PD, PD))
        self.projectors_structure = tnn.Sequential(
            tnn.Linear(H, 2 * STD), tnn.SiLU(), tnn.Linear(2 * STD, STD))

    def forward(self, x, s, mask, residue_idx, chain_enc):
        e, e_idx = self.features(x, mask, residue_idx, chain_enc)
        h_v = self.node_embeds[None, None].repeat(e.shape[0], e.shape[1], 1)
        h_e = self.W_e(e)
        mask_attend = t_gather_nodes(mask.unsqueeze(-1), e_idx).squeeze(-1)
        mask_attend = mask.unsqueeze(-1) * mask_attend
        for layer in self.encoder_layers:
            h_v, h_e = layer(h_v, h_e, e_idx, mask, mask_attend)
        zs_structure = h_v
        h_s = self.W_s(s)
        h_es = t_cat_neighbors_nodes(h_s, h_e, e_idx)
        mask_1d = mask.view(mask.size(0), mask.size(1), 1, 1)
        for i, layer in enumerate(self.decoder_layers):
            h_esv = t_cat_neighbors_nodes(h_v, h_es, e_idx)
            h_esv = mask_1d * h_esv
            h_v, h_es_new = layer(h_v, h_esv, h_es, mask)
            h_es = h_es_new         # update_edge=True
            if i == ALIGN:
                zs_single, zs_pair = h_v, h_es_new
        log_probs = F.log_softmax(self.W_out(h_v), dim=-1)
        return (log_probs, self.projectors_single(zs_single),
                self.projectors_pair(zs_pair),
                self.projectors_structure(zs_structure), e_idx)


def test_fmif_conversion_parity():
    torch.manual_seed(0)
    tmodel = TorchMiniFMIF().eval()

    b, length = 2, 12
    g = torch.Generator().manual_seed(1)
    x = torch.randn(b, length, 4, 3, generator=g) * 3.0
    s = torch.randint(0, VOCAB, (b, length), generator=g)
    mask = torch.ones(b, length)
    mask[1, 9:] = 0.0
    residue_idx = torch.arange(length)[None].repeat(b, 1)
    chain_enc = torch.ones(b, length, dtype=torch.long)

    with torch.no_grad():
        ref_lp, ref_s, ref_p, ref_st, ref_eidx = tmodel(
            x, s, mask, residue_idx, chain_enc)

    params = convert_torch_fmif(tmodel.state_dict())
    model = ProteinMPNNFMIF(
        hidden_dim=H, edge_features=H, num_encoder_layers=ENC,
        num_decoder_layers=DEC, k_neighbors=K, augment_eps=0.0,
        dropout=0.0, update_edge=True, align_depth=ALIGN,
        single_dim=SD, pair_dim=PD, structure_dim=STD)
    out = model.apply(
        {"params": params}, jnp.asarray(x.numpy()), jnp.asarray(s.numpy()),
        jnp.asarray(mask.numpy()), jnp.asarray(mask.numpy()),
        jnp.asarray(residue_idx.numpy()), jnp.asarray(chain_enc.numpy()),
        return_rep=True, train=False)
    lp, zs_s, zs_p, zs_st, e_idx = out

    # padded rows can differ (masked; their neighbor lists are arbitrary
    # and everything they feed is masked) — compare real residues
    real = np.asarray(mask.numpy()) > 0
    np.testing.assert_array_equal(np.asarray(e_idx)[real],
                                  ref_eidx.numpy()[real])
    np.testing.assert_allclose(np.asarray(lp)[real],
                               ref_lp.numpy()[real], atol=5e-4)
    np.testing.assert_allclose(np.asarray(zs_s)[real],
                               ref_s.numpy()[real], atol=5e-4)
    np.testing.assert_allclose(np.asarray(zs_p)[real],
                               ref_p.numpy()[real], atol=5e-4)
    np.testing.assert_allclose(np.asarray(zs_st)[real],
                               ref_st.numpy()[real], atol=5e-4)


@pytest.mark.slow
def test_eval_protein_cli_with_ref_ckpt(tmp_path, capsys):
    """eval-protein --ref-ckpt samples sequences from a converted
    reference-format fmif checkpoint (epoch_last.pt layout)."""
    from reed_tpu.cli import main

    torch.manual_seed(4)
    tmodel = TorchMiniFMIF().eval()
    path = str(tmp_path / "epoch_last.pt")
    torch.save({"epoch": 3, "step": 100,
                "model_state_dict": tmodel.state_dict()}, path)

    main(["eval-protein", "--ref-ckpt", path, "--batch-size", "2",
          "--num-steps", "4", "--length", "16", "--seed", "0",
          "--set", "hidden_dim=16", "--set", "num_encoder_layers=2",
          "--set", "num_decoder_layers=2", "--set", "k_neighbors=5",
          "--set", "single_dim=12", "--set", "pair_dim=8",
          "--set", "structure_dim=10", "--set", "align_depth=1",
          "--dp", "1", "--fsdp", "1", "--tp", "1"])
    out = capsys.readouterr().out
    assert "loaded reference torch checkpoint" in out
    import json as _json

    rep = _json.loads(out[out.index("{"):])
    # golden value from this exact converted mini-checkpoint + fixed seeds
    # (generated 2026-08-17): pins the whole converted-weights -> featurize
    # -> Euler-unmask-sample -> recovery path against silent drift
    assert rep["sequence_recovery"] == pytest.approx(0.09375, abs=1e-9)
    assert rep["sample_0"] == "DDKVDVKMVVKKVDDD"


def test_fmif_conversion_cls_layers():
    """cls/CFG extras map when present."""
    torch.manual_seed(2)
    tmodel = TorchMiniFMIF()
    sd = dict(tmodel.state_dict())
    sd["cls_embedder.weight"] = torch.randn(3, H)
    for i in range(ENC):
        sd[f"cls_layers_enc.{i}.weight"] = torch.randn(H, H)
        sd[f"cls_layers_enc.{i}.bias"] = torch.randn(H)
    for i in range(DEC):
        sd[f"cls_layers_dec.{i}.weight"] = torch.randn(H, H)
        sd[f"cls_layers_dec.{i}.bias"] = torch.randn(H)
    params = convert_torch_fmif(sd)
    assert params["cls_embedder"]["embedding"].shape == (3, H)
    assert params["cls_layers_dec_1"]["kernel"].shape == (H, H)


@pytest.mark.slow
def test_train_protein_warm_start_from_ref_ckpt(tmp_path, capsys):
    """train-protein --ref-ckpt warm-starts and keeps training (loss
    finite across steps; migration from the reference's torch ckpts)."""
    from reed_tpu.cli import main

    torch.manual_seed(5)
    tmodel = TorchMiniFMIF().eval()
    path = str(tmp_path / "epoch_last.pt")
    torch.save({"model_state_dict": tmodel.state_dict()}, path)
    main(["train-protein", "--ref-ckpt", path, "--synthetic",
          "--steps", "6", "--batch-size", "2", "--log-every", "3",
          "--set", "hidden_dim=16", "--set", "num_encoder_layers=2",
          "--set", "num_decoder_layers=2", "--set", "k_neighbors=5",
          "--set", "single_dim=12", "--set", "pair_dim=8",
          "--set", "structure_dim=10", "--set", "max_len=16",
          "--dp", "1", "--fsdp", "1", "--tp", "1"])
    out = capsys.readouterr().out
    assert "warm-started from reference checkpoint" in out
    assert "[step 6]" in out

"""Torch SemlaFlow checkpoint conversion parity: a minimal torch Semla
generator built to the reference equations
(molecule/semlaflow/flowmodels/semla.py:41-995) must match the converted
reed_tpu models.semla.SemlaGenerator outputs exactly."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from reed_tpu.encoders.semla_convert import convert_torch_semla  # noqa: E402
from reed_tpu.models.semla import SemlaGenerator  # noqa: E402

D, DMSG, SETS, HEADS = 64, 32, 8, 8
DMSG_HID, DEDGE, LAYERS = 32, 16, 4
VOCAB, NEDGE, NCHARGE = 6, 5, 7
SIZE_EMB, MAX_ATOMS = 8, 12
DREP = 16
ALIGN = (2,)


def t_zero_com(coords, mask):
    m = mask.unsqueeze(-1)
    n = (m.sum(dim=-2, keepdim=True)).clamp(min=1.0)
    com = (coords * m).sum(dim=-2, keepdim=True) / n
    return (coords - com) * m


def t_adj_mask(adj):
    mask = torch.where(adj == 0, torch.tensor(-1e6), torch.tensor(0.0))
    n_conn = adj.sum(dim=-1, keepdim=True)
    return torch.where(n_conn == 0, torch.tensor(0.0), mask)


class TCoordNorm(tnn.Module):
    """semla.py:41-100."""

    def __init__(self, n_sets, norm="length", eps=1e-6):
        super().__init__()
        self.norm, self.eps, self.n_sets = norm, eps, n_sets
        self.set_weights = tnn.Parameter(torch.ones((1, n_sets, 1, 1)))

    def forward(self, coord_sets, node_mask):
        coord_sets = t_zero_com(coord_sets, node_mask)
        coord_sets = coord_sets * node_mask.unsqueeze(-1)
        n_atoms = node_mask.sum(dim=-1, keepdim=True)
        lengths = torch.linalg.vector_norm(coord_sets, dim=-1)
        if self.norm == "length":
            scaled = lengths.sum(dim=2, keepdim=True) / n_atoms
            coord_div = scaled.unsqueeze(-1) + self.eps
        elif self.norm == "none":
            coord_div = torch.ones_like(coord_sets)
        else:
            raise ValueError(self.norm)
        coord_sets = (coord_sets * self.set_weights) / coord_div
        return coord_sets * node_mask.unsqueeze(-1)


class TEdgeMessages(tnn.Module):
    """semla.py:102-166."""

    def __init__(self, d_out, d_ff=None, d_edge=None):
        super().__init__()
        self.d_edge = d_edge
        d_ff = d_out if d_ff is None else d_ff
        in_feats = DMSG * 2 + SETS + (d_edge or 0)
        self.coord_norm = TCoordNorm(SETS, norm="none")
        self.node_norm = tnn.LayerNorm(D)
        self.edge_norm = tnn.LayerNorm(d_edge) if d_edge else None
        self.node_proj = tnn.Linear(D, DMSG)
        self.message_mlp = tnn.Sequential(
            tnn.Linear(in_feats, d_ff), tnn.SiLU(), tnn.Linear(d_ff, d_out))

    def forward(self, coords, node_feats, node_mask, edge_feats=None):
        b, n, _ = node_feats.shape
        node_feats = self.node_norm(node_feats)
        coords = self.coord_norm(coords, node_mask).flatten(0, 1)
        dots = torch.bmm(coords, coords.transpose(1, 2))
        coord_feats = dots.unflatten(0, (-1, SETS)).movedim(1, -1)
        nf = self.node_proj(node_feats)
        nf_i = nf.unsqueeze(2).expand(b, n, n, -1)
        nf_j = nf.unsqueeze(1).expand(b, n, n, -1)
        x = torch.cat((nf_i, nf_j, coord_feats), dim=-1)
        if edge_feats is not None:
            x = torch.cat((x, self.edge_norm(edge_feats)), dim=-1)
        return self.message_mlp(x)


class TNodeAttention(tnn.Module):
    """semla.py:168-222 (GNN-VPA weighting)."""

    def __init__(self):
        super().__init__()
        self.feat_norm = tnn.LayerNorm(D)
        self.in_proj = tnn.Linear(D, D)
        self.out_proj = tnn.Linear(D, D)

    def forward(self, node_feats, messages, adj):
        d_head = D // HEADS
        messages = messages + t_adj_mask(adj).unsqueeze(3)
        attn = torch.softmax(messages, dim=2)
        x = self.in_proj(self.feat_norm(node_feats))
        heads = x.unflatten(-1, (HEADS, d_head)).movedim(-2, 1).flatten(0, 1)
        a = attn.movedim(-1, 1).flatten(0, 1)
        out = torch.bmm(a, heads)
        weights = torch.sqrt((a ** 2).sum(dim=-1))
        out = out * weights.unsqueeze(-1)
        out = out.unflatten(0, (-1, HEADS)).movedim(1, -2).flatten(2, 3)
        return self.out_proj(out)


class TCoordAttention(tnn.Module):
    """semla.py:224-273."""

    def __init__(self, proj_sets, eps=1e-6):
        super().__init__()
        self.eps = eps
        self.coord_norm = TCoordNorm(SETS, norm="length")
        self.coord_proj = tnn.Linear(SETS, proj_sets, bias=False)
        self.attn_proj = tnn.Linear(proj_sets, SETS, bias=False)

    def forward(self, coord_sets, messages, adj, node_mask):
        coord_sets = self.coord_norm(coord_sets, node_mask)
        proj = self.coord_proj(coord_sets.transpose(1, -1))
        vec = proj.unsqueeze(3) - proj.unsqueeze(2)
        lengths = torch.linalg.vector_norm(vec, dim=1, keepdim=True)
        norm_dists = vec / (lengths + self.eps)
        messages = messages + t_adj_mask(adj).unsqueeze(3)
        attn = torch.softmax(messages, dim=2)
        updates = (norm_dists * attn.unsqueeze(1)).sum(dim=3)
        weights = torch.sqrt((attn ** 2).sum(dim=2))
        updates = updates * weights.unsqueeze(1)
        return self.attn_proj(updates).transpose(1, -1)


class TLengthsMLP(tnn.Module):
    def __init__(self, d_ff):
        super().__init__()
        self.node_ff = tnn.Sequential(
            tnn.Linear(D + SETS, d_ff), tnn.SiLU(), tnn.Linear(d_ff, D))

    def forward(self, coord_sets, node_feats):
        lengths = torch.linalg.vector_norm(coord_sets, dim=-1).movedim(1, -1)
        return self.node_ff(torch.cat((node_feats, lengths), dim=2))


class TEquivariantMLP(tnn.Module):
    def __init__(self, proj_sets):
        super().__init__()
        self.node_proj = tnn.Sequential(
            tnn.Linear(D, proj_sets), tnn.SiLU(),
            tnn.Linear(proj_sets, proj_sets))
        self.coord_proj = tnn.Linear(SETS, proj_sets, bias=False)
        self.attn_proj = tnn.Linear(proj_sets, SETS, bias=False)

    def forward(self, coord_sets, node_feats):
        inv = self.node_proj(node_feats).unsqueeze(1)
        proj = self.coord_proj(coord_sets.transpose(1, -1))
        attn = (inv.unsqueeze(-1) * proj.unsqueeze(-2)).sum(-1)
        return self.attn_proj(attn).transpose(1, -1)


class TNodeFeedForward(tnn.Module):
    """semla.py:345-372."""

    def __init__(self, d_ff=None, proj_sets=None):
        super().__init__()
        self.node_norm = tnn.LayerNorm(D)
        self.coord_norm = TCoordNorm(SETS, norm="length")
        self.invariant_mlp = TLengthsMLP(d_ff or D * 4)
        self.equivariant_mlp = TEquivariantMLP(proj_sets or SETS)

    def forward(self, coord_sets, node_feats, node_mask):
        node_feats = self.node_norm(node_feats)
        coord_sets = self.coord_norm(coord_sets, node_mask)
        return (self.equivariant_mlp(coord_sets, node_feats),
                self.invariant_mlp(coord_sets, node_feats))


class TBondRefine(tnn.Module):
    """semla.py:376-430."""

    def __init__(self):
        super().__init__()
        in_feats = 2 * DMSG + DEDGE + 2
        self.coord_norm = TCoordNorm(1, norm="none")
        self.node_norm = tnn.LayerNorm(D)
        self.edge_norm = tnn.LayerNorm(DEDGE)
        self.node_proj = tnn.Linear(D, DMSG)
        self.message_mlp = tnn.Sequential(
            tnn.Linear(in_feats, DMSG), tnn.SiLU(),
            tnn.Linear(DMSG, DEDGE))

    def forward(self, coords, node_feats, node_mask, edge_feats):
        b, n, _ = node_feats.shape
        coords = self.coord_norm(coords.unsqueeze(1),
                                 node_mask.unsqueeze(1)).squeeze(1)
        diffs = coords.unsqueeze(2) - coords.unsqueeze(1)
        dists = (diffs * diffs).sum(dim=-1).unsqueeze(-1)
        dots = torch.bmm(coords, coords.transpose(1, 2)).unsqueeze(-1)
        nf = self.node_proj(self.node_norm(node_feats))
        nf_i = nf.unsqueeze(2).expand(b, n, n, -1)
        nf_j = nf.unsqueeze(1).expand(b, n, n, -1)
        ef = self.edge_norm(edge_feats)
        x = torch.cat((nf_i, nf_j, dists, dots, ef), dim=3)
        return self.message_mlp(x)


class TMPLayer(tnn.Module):
    """semla.py:433-576 (cond_type 'none')."""

    def __init__(self, d_message_hidden=None, d_edge_in=None,
                 d_edge_out=None):
        super().__init__()
        self.d_edge_in, self.d_edge_out = d_edge_in, d_edge_out
        d_message_out = HEADS + SETS
        if d_edge_out is not None:
            d_message_out += d_edge_out
        self.node_ff = TNodeFeedForward(d_ff=D * 4, proj_sets=DMSG)
        self.message_ff = TEdgeMessages(d_message_out, d_ff=d_message_hidden,
                                        d_edge=d_edge_in)
        self.coord_attn = TCoordAttention(SETS)
        self.node_attn = TNodeAttention()

    def forward(self, coords, node_feats, adj, node_mask, edge_feats=None):
        c_up, n_up = self.node_ff(coords, node_feats, node_mask)
        coords = coords + c_up
        node_feats = node_feats + n_up
        messages = self.message_ff(coords, node_feats, node_mask,
                                   edge_feats=edge_feats)
        node_msgs = messages[..., :HEADS]
        coord_msgs = messages[..., HEADS:HEADS + SETS]
        node_feats = node_feats + self.node_attn(node_feats, node_msgs, adj)
        coords = coords + self.coord_attn(coords, coord_msgs, adj, node_mask)
        if self.d_edge_out is not None:
            edge_out = messages[..., HEADS + SETS:]
            if edge_feats is not None:
                edge_out = edge_feats + edge_out
            return coords, node_feats, edge_out
        return coords, node_feats


def t_timestep_embedding(t, dim, max_period=10000):
    half = dim // 2
    freqs = torch.exp(
        -math.log(max_period)
        * torch.arange(half, dtype=torch.float32) / half)
    args = t[:, None].float() * freqs[None]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


class TTimestepEmbedder(tnn.Module):
    """flowmodels/attention.py:294-330 (frequency size 512)."""

    def __init__(self, hidden):
        super().__init__()
        self.mlp = tnn.Sequential(
            tnn.Linear(512, hidden), tnn.SiLU(), tnn.Linear(hidden, hidden))

    def forward(self, t):
        return self.mlp(t_timestep_embedding(t, 512))


def t_build_mlp(hidden, proj, z):
    return tnn.Sequential(tnn.Linear(hidden, proj), tnn.SiLU(),
                          tnn.Linear(proj, proj), tnn.SiLU(),
                          tnn.Linear(proj, z))


class TDynamics(tnn.Module):
    """semla.py:579-796 (self_cond, bond_refine, rep_alignment)."""

    def __init__(self):
        super().__init__()
        core = [TMPLayer(d_message_hidden=DMSG_HID)
                for _ in range(LAYERS - 2)]
        self.layers = tnn.ModuleList(
            [TMPLayer(d_edge_in=DEDGE)] + core + [TMPLayer(d_edge_out=DEDGE)])
        self.final_ff_block = TNodeFeedForward()
        self.coord_norm = TCoordNorm(SETS, norm="length")
        self.feat_norm = tnn.LayerNorm(D)
        self.coord_proj = tnn.Linear(2, SETS, bias=False)   # self_cond
        self.coord_head = tnn.Linear(SETS, 1, bias=False)
        self.bond_norm = tnn.LayerNorm(DEDGE)
        self.refine_layer = TBondRefine()
        self.time_embedder = TTimestepEmbedder(DREP)
        self.projectors = tnn.ModuleList(
            [t_build_mlp(D, D, DREP) for _ in ALIGN])

    def forward(self, coords, inv_feats, adj, atom_mask, edge_feats,
                cond_coords, rep, times):
        if rep is not None and times is not None:
            rep = rep + self.time_embedder(times)
        coords = torch.stack((coords, cond_coords))
        coords = self.coord_proj(coords.movedim(0, -1)).movedim(-1, 1)
        atom_mask = atom_mask.unsqueeze(1).expand(-1, SETS, -1)
        coords = coords * atom_mask.unsqueeze(-1)

        zs, aligned = [], 0
        for i, layer in enumerate(self.layers):
            out = layer(coords, inv_feats, adj, atom_mask,
                        edge_feats=edge_feats)
            if len(out) == 2:
                coords, inv_feats = out
                edge_feats = None
            else:
                coords, inv_feats, edge_feats = out
            if i in ALIGN:
                zs.append(self.projectors[aligned](inv_feats.sum(dim=1)))
                aligned += 1

        coords, inv_feats = self.final_ff_block(coords, inv_feats, atom_mask)
        out_coords = self.coord_norm(coords, atom_mask)
        out_coords = self.coord_head(out_coords.transpose(1, -1))
        out_coords = out_coords.transpose(1, -1).squeeze(1)
        edge_feats = self.refine_layer(out_coords, inv_feats,
                                       atom_mask[:, 0, :], edge_feats)
        inv_feats = self.feat_norm(inv_feats)
        edge_feats = self.bond_norm(edge_feats)
        return out_coords, inv_feats, edge_feats, zs


class TSemlaGenerator(tnn.Module):
    """semla.py:822-995 (self_cond, bonds, rep_alignment)."""

    def __init__(self):
        super().__init__()
        self.dynamics = TDynamics()
        self.size_emb = tnn.Embedding(MAX_ATOMS, SIZE_EMB)
        self.feat_proj = tnn.Sequential(
            tnn.Linear(VOCAB + SIZE_EMB + VOCAB, D), tnn.SiLU(),
            tnn.Linear(D, D))
        self.edge_in_proj = tnn.Sequential(
            tnn.Linear(NEDGE * 2, DEDGE), tnn.SiLU(),
            tnn.Linear(DEDGE, DEDGE))
        self.edge_out_proj = tnn.Sequential(
            tnn.Linear(DEDGE, DEDGE), tnn.SiLU(), tnn.Linear(DEDGE, NEDGE))
        self.atom_classifier_head = tnn.Sequential(
            tnn.Linear(D, D), tnn.SiLU(), tnn.Linear(D, VOCAB))
        self.charge_classifier_head = tnn.Sequential(
            tnn.Linear(D, D), tnn.SiLU(), tnn.Linear(D, NCHARGE))

    def forward(self, coords, inv_feats, edge_feats, cond_coords,
                cond_atomics, cond_bonds, atom_mask, rep, times):
        adj = (atom_mask.unsqueeze(2) * atom_mask.unsqueeze(1)) \
            * (1 - torch.eye(coords.shape[1])[None])
        n_atoms = atom_mask.sum(dim=-1, keepdim=True).long()
        size_emb = self.size_emb(n_atoms).expand(-1, inv_feats.size(1), -1)
        inv_feats = torch.cat((inv_feats, size_emb, cond_atomics), dim=-1)
        atom_feats = self.feat_proj(inv_feats)
        edge_feats = torch.cat((edge_feats.float(), cond_bonds), dim=-1)
        edge_feats = self.edge_in_proj(edge_feats)

        pred_coords, pred_feats, pred_edges, zs = self.dynamics(
            coords, atom_feats, adj, atom_mask, edge_feats, cond_coords,
            rep, times)
        pred_coords = t_zero_com(pred_coords, atom_mask)
        pred_coords = pred_coords * atom_mask.unsqueeze(-1)
        type_logits = self.atom_classifier_head(pred_feats)
        charge_logits = self.charge_classifier_head(pred_feats)
        pred_edges = pred_edges + pred_edges.transpose(1, 2)
        edge_logits = self.edge_out_proj(pred_edges)
        return pred_coords, type_logits, edge_logits, charge_logits, zs


@pytest.mark.slow
def test_eval_semla_ref_ckpt(tmp_path, capsys):
    """eval-semla --ref-ckpt loads a Lightning MolecularCFM-style
    checkpoint (ema_gen.module. prefix) end-to-end through the converter."""
    from reed_tpu.cli import main

    torch.manual_seed(3)
    tmodel = TSemlaGenerator().eval()
    path = str(tmp_path / "last.ckpt")
    torch.save({"state_dict": {
        f"ema_gen.module.{k}": v for k, v in tmodel.state_dict().items()}},
        path)

    main(["eval-semla", "--ref-ckpt", path, "--out", str(tmp_path / "sdf"),
          "--n-samples", "4", "--n-replicates", "1", "--num-steps", "4",
          "--n-atoms-min", "3", "--n-atoms-max", "6",
          "--atom-decoder", "H,C,N,O,F,S",
          "--set", "d_model=64", "--set", "d_message=32",
          "--set", "n_layers=4", "--set", "n_coord_sets=8",
          "--set", "n_attn_heads=8", "--set", "d_message_hidden=32",
          "--set", "d_edge=16", "--set", "vocab_size=6",
          "--set", "n_bond_types=5", "--set", "size_emb=8",
          "--set", "max_atoms=12", "--set", "d_rep=16",
          "--set", "align_depth=[2]",
          "--set", "interpolant.prior.vocab_size=6",
          "--dp", "1", "--fsdp", "1", "--tp", "1"])
    import json as _json

    text = capsys.readouterr().out
    assert "loaded reference torch checkpoint" in text
    out = _json.loads(text[text.index("{"):])
    assert 0.0 <= out["validity"] <= 1.0
    import os

    sdfs = [f for f in os.listdir(tmp_path / "sdf") if f.endswith(".sdf")]
    assert len(sdfs) == 4
    body = open(tmp_path / "sdf" / sorted(sdfs)[0]).read()
    assert "V2000" in body and body.rstrip().endswith("$$$$")


@pytest.mark.slow
def test_semla_convert_parity():
    torch.manual_seed(0)
    tmodel = TSemlaGenerator().eval()

    b, n = 2, 9
    rng = np.random.default_rng(0)
    mask = np.ones((b, n), np.float32)
    mask[1, -3:] = 0.0
    coords = rng.standard_normal((b, n, 3)).astype(np.float32) \
        * mask[..., None]
    atomics = rng.standard_normal((b, n, VOCAB)).astype(np.float32)
    bonds = rng.standard_normal((b, n, n, NEDGE)).astype(np.float32)
    bonds = (bonds + bonds.transpose(0, 2, 1, 3)) / 2
    cond_coords = rng.standard_normal((b, n, 3)).astype(np.float32) \
        * mask[..., None]
    cond_atomics = rng.standard_normal((b, n, VOCAB)).astype(np.float32)
    cond_bonds = rng.standard_normal((b, n, n, NEDGE)).astype(np.float32)
    rep = rng.standard_normal((b, DREP)).astype(np.float32)
    times = rng.uniform(0.1, 0.9, (b,)).astype(np.float32)

    with torch.no_grad():
        touts = tmodel(*[torch.tensor(x) for x in
                         (coords, atomics, bonds, cond_coords, cond_atomics,
                          cond_bonds, mask, rep, times)])

    params = convert_torch_semla(tmodel.state_dict())
    model = SemlaGenerator(
        d_model=D, vocab_size=VOCAB, n_atom_feats=VOCAB, d_edge=DEDGE,
        n_edge_types=NEDGE, self_cond=True, size_emb=SIZE_EMB,
        max_atoms=MAX_ATOMS, n_charge_types=NCHARGE, rep_alignment=True,
        d_message=DMSG, n_coord_sets=SETS, n_layers=LAYERS,
        n_attn_heads=HEADS, d_message_hidden=DMSG_HID, d_rep=DREP,
        cond_type="none", align_depth=ALIGN)

    jparams = jax.tree.map(jnp.asarray, params)
    # shape-check against a fresh init
    ref = model.init({"params": jax.random.PRNGKey(0)},
                     jnp.asarray(coords), jnp.asarray(atomics),
                     edge_feats=jnp.asarray(bonds),
                     cond_coords=jnp.asarray(cond_coords),
                     cond_atomics=jnp.asarray(cond_atomics),
                     cond_bonds=jnp.asarray(cond_bonds),
                     atom_mask=jnp.asarray(mask), rep=jnp.asarray(rep),
                     times=jnp.asarray(times))["params"]
    ref_flat = jax.tree_util.tree_flatten_with_path(ref)[0]
    conv_flat = jax.tree_util.tree_flatten_with_path(jparams)[0]
    assert len(ref_flat) == len(conv_flat), (
        sorted(str(p) for p, _ in ref_flat),
        sorted(str(p) for p, _ in conv_flat))
    for (pa, la), (pb, lb) in zip(
            sorted(ref_flat, key=lambda kv: str(kv[0])),
            sorted(conv_flat, key=lambda kv: str(kv[0]))):
        assert str(pa) == str(pb), (pa, pb)
        assert la.shape == lb.shape, (pa, la.shape, lb.shape)

    outs = model.apply({"params": jparams},
                       jnp.asarray(coords), jnp.asarray(atomics),
                       edge_feats=jnp.asarray(bonds),
                       cond_coords=jnp.asarray(cond_coords),
                       cond_atomics=jnp.asarray(cond_atomics),
                       cond_bonds=jnp.asarray(cond_bonds),
                       atom_mask=jnp.asarray(mask), rep=jnp.asarray(rep),
                       times=jnp.asarray(times))

    names = ("pred_coords", "type_logits", "bond_logits", "charge_logits")
    for name, a, bt in zip(names, outs[:4], touts[:4]):
        diff = np.max(np.abs(np.asarray(a) - bt.numpy()))
        assert diff < 5e-4, (name, diff)
    assert len(outs[4]) == len(touts[4]) == len(ALIGN)
    for a, bt in zip(outs[4], touts[4]):
        diff = np.max(np.abs(np.asarray(a) - bt.numpy()))
        assert diff < 5e-4, ("zs", diff)

"""Torch SemlaFlow checkpoint conversion: reference Semla generator state
dicts (molecule/semlaflow/flowmodels/semla.py:822-995 SemlaGenerator wrapping
EquiInvDynamics :579-819; Lightning checkpoints store them under
`gen.`/`ema_gen.` prefixes from MolecularCFM) -> reed_tpu models.semla
SemlaGenerator params.

The two implementations are module-for-module weight compatible; the only
non-transpose details are:
  * size_emb: the reference Embedding(max_atoms, E) indexes n_atoms
    directly, so index max_atoms is out of range there (a latent
    off-by-one); our table has max_atoms+1 rows — the extra row is zeroed.
  * Sequential MLPs (feat_proj, edge projections, heads, invariant /
    equivariant MLPs, projectors) flatten to our explicitly-named Dense
    pairs/triples.
All dims are inferred from the state dict.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np


def _np(t):
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def _dense(sd: Dict, key: str, bias: bool = True) -> Dict:
    out = {"kernel": _np(sd[f"{key}.weight"]).T}
    if bias:
        out["bias"] = _np(sd[f"{key}.bias"])
    return out


def _ln(sd: Dict, key: str) -> Dict:
    return {"scale": _np(sd[f"{key}.weight"]), "bias": _np(sd[f"{key}.bias"])}


def _coord_norm(sd: Dict, key: str) -> Dict:
    return {"set_weights": _np(sd[f"{key}.set_weights"])}


def _node_ff(sd: Dict, key: str) -> Dict:
    """NodeFeedForward = LengthsMLP + EquivariantMLP (semla.py:275-372)."""
    return {
        "node_norm": _ln(sd, f"{key}.node_norm"),
        "coord_norm": _coord_norm(sd, f"{key}.coord_norm"),
        "inv_fc1": _dense(sd, f"{key}.invariant_mlp.node_ff.0"),
        "inv_fc2": _dense(sd, f"{key}.invariant_mlp.node_ff.2"),
        "equi_node_fc1": _dense(sd, f"{key}.equivariant_mlp.node_proj.0"),
        "equi_node_fc2": _dense(sd, f"{key}.equivariant_mlp.node_proj.2"),
        "equi_coord_proj": _dense(sd, f"{key}.equivariant_mlp.coord_proj",
                                  bias=False),
        "equi_attn_proj": _dense(sd, f"{key}.equivariant_mlp.attn_proj",
                                 bias=False),
    }


def _mp_layer(sd: Dict, key: str) -> Dict:
    """EquiMessagePassingLayer (semla.py:433-576)."""
    message_ff = {
        "node_norm": _ln(sd, f"{key}.message_ff.node_norm"),
        "coord_norm": _coord_norm(sd, f"{key}.message_ff.coord_norm"),
        "node_proj": _dense(sd, f"{key}.message_ff.node_proj"),
        "message_fc1": _dense(sd, f"{key}.message_ff.message_mlp.0"),
        "message_fc2": _dense(sd, f"{key}.message_ff.message_mlp.2"),
    }
    if f"{key}.message_ff.edge_norm.weight" in sd:
        message_ff["edge_norm"] = _ln(sd, f"{key}.message_ff.edge_norm")
    return {
        "node_ff": _node_ff(sd, f"{key}.node_ff"),
        "message_ff": message_ff,
        "node_attn": {
            "feat_norm": _ln(sd, f"{key}.node_attn.feat_norm"),
            "in_proj": _dense(sd, f"{key}.node_attn.in_proj"),
            "out_proj": _dense(sd, f"{key}.node_attn.out_proj"),
        },
        "coord_attn": {
            "coord_norm": _coord_norm(sd, f"{key}.coord_attn.coord_norm"),
            "coord_proj": _dense(sd, f"{key}.coord_attn.coord_proj",
                                 bias=False),
            "attn_proj": _dense(sd, f"{key}.coord_attn.attn_proj",
                                bias=False),
        },
    }


def convert_torch_semla(sd: Dict, prefix: str = "") -> Dict:
    """SemlaGenerator state dict -> flax params for
    reed_tpu.models.semla.SemlaGenerator.

    `prefix`: key prefix to strip, e.g. 'gen.' or 'ema_gen.module.' for
    MolecularCFM Lightning checkpoints."""
    if prefix:
        sd = {k[len(prefix):]: v for k, v in sd.items()
              if k.startswith(prefix)}

    n_layers = 1 + max(int(k.split(".")[2]) for k in sd
                       if k.startswith("dynamics.layers."))

    size_table = _np(sd["size_emb.weight"])
    params: Dict = {
        # extra zero row for the max_atoms index (reference off-by-one)
        "size_emb": {"embedding": np.concatenate(
            [size_table, np.zeros_like(size_table[:1])], axis=0)},
        "feat_proj_fc1": _dense(sd, "feat_proj.0"),
        "feat_proj_fc2": _dense(sd, "feat_proj.2"),
        "atom_head_fc1": _dense(sd, "atom_classifier_head.0"),
        "atom_head_fc2": _dense(sd, "atom_classifier_head.2"),
        "charge_head_fc1": _dense(sd, "charge_classifier_head.0"),
        "charge_head_fc2": _dense(sd, "charge_classifier_head.2"),
    }
    if "edge_in_proj.0.weight" in sd:
        params["edge_in_fc1"] = _dense(sd, "edge_in_proj.0")
        params["edge_in_fc2"] = _dense(sd, "edge_in_proj.2")
        params["edge_out_fc1"] = _dense(sd, "edge_out_proj.0")
        params["edge_out_fc2"] = _dense(sd, "edge_out_proj.2")

    dyn: Dict = {
        "coord_proj": _dense(sd, "dynamics.coord_proj", bias=False),
        "coord_head": _dense(sd, "dynamics.coord_head", bias=False),
        "coord_norm": _coord_norm(sd, "dynamics.coord_norm"),
        "feat_norm": _ln(sd, "dynamics.feat_norm"),
        "final_ff_block": _node_ff(sd, "dynamics.final_ff_block"),
    }
    for i in range(n_layers):
        dyn[f"layers_{i}"] = _mp_layer(sd, f"dynamics.layers.{i}")
    if "dynamics.bond_norm.weight" in sd:
        dyn["bond_norm"] = _ln(sd, "dynamics.bond_norm")
    if "dynamics.refine_layer.node_norm.weight" in sd:
        dyn["refine_layer"] = {
            "coord_norm": _coord_norm(sd, "dynamics.refine_layer.coord_norm"),
            "node_norm": _ln(sd, "dynamics.refine_layer.node_norm"),
            "edge_norm": _ln(sd, "dynamics.refine_layer.edge_norm"),
            "node_proj": _dense(sd, "dynamics.refine_layer.node_proj"),
            "message_fc1": _dense(sd, "dynamics.refine_layer.message_mlp.0"),
            "message_fc2": _dense(sd, "dynamics.refine_layer.message_mlp.2"),
        }
    if "dynamics.time_embedder.mlp.0.weight" in sd:
        dyn["time_emb_fc1"] = _dense(sd, "dynamics.time_embedder.mlp.0")
        dyn["time_emb_fc2"] = _dense(sd, "dynamics.time_embedder.mlp.2")
    i = 0
    while f"dynamics.projectors.{i}.0.weight" in sd:
        dyn[f"projectors_{i}"] = {
            "Dense_0": _dense(sd, f"dynamics.projectors.{i}.0"),
            "Dense_1": _dense(sd, f"dynamics.projectors.{i}.2"),
            "Dense_2": _dense(sd, f"dynamics.projectors.{i}.4"),
        }
        i += 1
    params["dynamics"] = dyn
    return params


def load_torch_semla_checkpoint(path: str, prefix: Optional[str] = None,
                                ema: bool = True) -> Dict:
    """Load a torch/Lightning SemlaFlow checkpoint file and convert.

    Auto-detects the MolecularCFM prefix: 'ema_gen.module.' (preferred when
    ema=True), 'ema_gen.', 'gen.', or none."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        ckpt = ckpt["state_dict"]
    if prefix is None:
        candidates = (["ema_gen.module.", "ema_gen."] if ema else []) \
            + ["gen.", ""]
        for cand in candidates:
            if any(k.startswith(cand + "dynamics.") for k in ckpt):
                prefix = cand
                break
        else:
            prefix = ""
    return convert_torch_semla(ckpt, prefix=prefix)

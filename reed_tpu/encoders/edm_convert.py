"""Torch EDM checkpoint conversion: reference `generative_model[_ema].npy`
state dicts -> reed_tpu EGNNDynamics / GammaNetwork params.

The reference saves `torch.save(model.state_dict(), 'generative_model.npy')`
(molecule/utils.py:23-24) where model is EnVariationalDiffusion wrapping an
EGNN_dynamics_QM9 (keys `dynamics.egnn.*`, `dynamics.fake_latent`) and,
with noise_schedule='learned', a GammaNetwork (keys `gamma.l{1,2,3}.*`,
`gamma.gamma_{0,1}`). Architecture sources: molecule/egnn/egnn_new.py
(GCL/EquivariantUpdate/EquivariantBlock/EGNN), molecule/egnn/models.py
(EGNN_dynamics_QM9), molecule/models/attention.py (BasicTransformerBlock
cross-attention + GEGLU), en_diffusion.py:120-245 (PositiveLinear /
GammaNetwork).

Numerical parity notes: torch Linear stores weight [out, in] -> flax kernel
is its transpose; LayerNorm weight/bias -> scale/bias; head-major qkv
reshape layouts already agree; the GEGLU uses exact (erf) GELU on both
sides (RepCrossAttention passes approximate=False).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

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


def _layernorm(sd: Dict, key: str) -> Dict:
    return {"scale": _np(sd[f"{key}.weight"]),
            "bias": _np(sd[f"{key}.bias"])}


def strip_prefix(sd: Dict, prefix: str = "module.") -> Dict:
    return {(k[len(prefix):] if k.startswith(prefix) else k): v
            for k, v in sd.items()}


def convert_gamma_network(sd: Dict, prefix: str = "gamma."
                          ) -> Optional[Dict]:
    """GammaNetwork state dict -> reed_tpu.diffusion.edm.GammaNetwork
    params (en_diffusion.py:208-245: l1/l2/l3 PositiveLinear + endpoints).
    reed_tpu stores l{i}_w as [in, out] (x @ softplus(w)), torch as
    [out, in] under F.linear(softplus(weight))."""
    if f"{prefix}l1.weight" not in sd:
        return None
    return {
        "l1_w": _np(sd[f"{prefix}l1.weight"]).T,
        "l1_b": _np(sd[f"{prefix}l1.bias"]),
        "l2_w": _np(sd[f"{prefix}l2.weight"]).T,
        "l2_b": _np(sd[f"{prefix}l2.bias"]),
        "l3_w": _np(sd[f"{prefix}l3.weight"]).T,
        "l3_b": _np(sd[f"{prefix}l3.bias"]),
        "gamma_0": _np(sd[f"{prefix}gamma_0"]),
        "gamma_1": _np(sd[f"{prefix}gamma_1"]),
    }


def convert_torch_egnn_dynamics(sd: Dict) -> Dict:
    """EGNN_dynamics_QM9 state dict (keys relative to the dynamics module,
    i.e. `egnn.*` + optional `fake_latent`) -> flax EGNNDynamics params."""
    params: Dict = {}
    if "fake_latent" in sd:
        params["fake_latent"] = _np(sd["fake_latent"])

    egnn: Dict = {
        "embedding": _dense(sd, "egnn.embedding"),
        "embedding_out": _dense(sd, "egnn.embedding_out"),
    }

    n_layers = 1 + max(int(k.split(".")[1].split("_")[-1])
                       for k in sd if k.startswith("egnn.e_block_"))
    for i in range(n_layers):
        blk_prefix = f"egnn.e_block_{i}"
        blk: Dict = {}
        sub = [k for k in sd if k.startswith(f"{blk_prefix}.gcl_")
               and "equiv" not in k]
        n_gcl = 1 + max(int(k.split(".")[2].split("_")[-1]) for k in sub)
        for j in range(n_gcl):
            g = f"{blk_prefix}.gcl_{j}"
            gcl = {
                "edge_fc1": _dense(sd, f"{g}.edge_mlp.0"),
                "edge_fc2": _dense(sd, f"{g}.edge_mlp.2"),
                "node_fc1": _dense(sd, f"{g}.node_mlp.0"),
                "node_fc2": _dense(sd, f"{g}.node_mlp.2"),
            }
            if f"{g}.att_mlp.0.weight" in sd:
                gcl["att"] = _dense(sd, f"{g}.att_mlp.0")
            blk[f"gcl_{j}"] = gcl
        e = f"{blk_prefix}.gcl_equiv"
        blk["gcl_equiv"] = {
            "coord_fc1": _dense(sd, f"{e}.coord_mlp.0"),
            "coord_fc2": _dense(sd, f"{e}.coord_mlp.2"),
            "coord_out": _dense(sd, f"{e}.coord_mlp.4", bias=False),
        }
        egnn[f"e_block_{i}"] = blk

        # rep cross-attention stack (models/attention.py
        # BasicTransformerBlock, self_attention=False)
        k = 0
        while f"egnn.attns.{i}.{k}.attn2.to_q.weight" in sd:
            a = f"egnn.attns.{i}.{k}"
            egnn[f"attn_{i}_{k}"] = {
                "norm_attn": _layernorm(sd, f"{a}.norm2"),
                "to_q": _dense(sd, f"{a}.attn2.to_q", bias=False),
                "to_k": _dense(sd, f"{a}.attn2.to_k", bias=False),
                "to_v": _dense(sd, f"{a}.attn2.to_v", bias=False),
                "to_out": _dense(sd, f"{a}.attn2.to_out.0"),
                "norm_ff": _layernorm(sd, f"{a}.norm3"),
                "ff_proj": _dense(sd, f"{a}.ff.net.0.proj"),
                "ff_out": _dense(sd, f"{a}.ff.net.2"),
            }
            k += 1

    params["egnn"] = egnn
    return params


def convert_torch_edm(sd: Dict) -> Tuple[Dict, Optional[Dict]]:
    """Full EnVariationalDiffusion state dict -> (EGNNDynamics params,
    GammaNetwork params or None for predefined schedules)."""
    sd = strip_prefix(sd)
    dyn_sd = {k[len("dynamics."):]: v for k, v in sd.items()
              if k.startswith("dynamics.")}
    if not dyn_sd:   # a bare dynamics state dict
        dyn_sd = {k: v for k, v in sd.items() if not k.startswith("gamma.")}
    return (convert_torch_egnn_dynamics(dyn_sd),
            convert_gamma_network(sd))


def load_torch_edm_checkpoint(path: str) -> Tuple[Dict, Optional[Dict]]:
    """Read a reference generative_model[_ema].npy (a torch pickle)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return convert_torch_edm(sd)

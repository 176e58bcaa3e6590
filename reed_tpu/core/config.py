"""Typed configuration tree (replaces the reference's three coexisting
config systems — argparse / Hydra / loose YAML; SURVEY.md §5.6)."""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Sequence, Tuple


@dataclass(frozen=True)
class OptimConfig:
    lr: float = 1e-4
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-8
    weight_decay: float = 0.0
    grad_clip: Optional[float] = None   # max global grad norm
    schedule: str = "constant"          # constant | onecycle | cosine
    warmup_steps: int = 0
    total_steps: int = 1_000_000
    accum_steps: int = 1                # gradient accumulation (optax.MultiSteps)
    mu_dtype: Optional[str] = None      # adam first-moment dtype (HBM saver:
    #                                     'bfloat16' halves m on big models)


@dataclass(frozen=True)
class CurriculumConfig:
    """REED curriculum (reference: image/train.py:362-398)."""

    proj_coeff: float = 0.5
    repa_decay: str = "constant"        # constant | linear | cosine
    repa_steps: int = 1_000_000
    start_diffusion_steps: int = 0
    diffusion_warmup_steps: int = 50_000
    diffusion_decay: str = "constant"   # constant | linear | cosine
    max_steps: int = 1_000_000
    ema_decay: float = 0.9999
    ema_dtype: Optional[str] = None     # EMA param dtype ('bfloat16' halves
    #                                     the EMA copy's HBM footprint, but
    #                                     decay>=0.999 updates round away —
    #                                     prefer ema_every)
    ema_every: int = 1                  # apply EMA every k optimizer steps
    #                                     with decay^k: identical average,
    #                                     skips the EMA HBM traffic on k-1
    #                                     of k steps


@dataclass(frozen=True)
class MeshConfig:
    data: Optional[int] = None
    fsdp: int = 1
    tensor: int = 1
    # Sequence parallelism (image domain): shards the token axis of SiT
    # activations over the 'seq' mesh axis. Post-parity extension for 512px+
    # (SURVEY.md §5.7) — the reference has no sequence parallelism at all.
    seq: int = 1
    # Minimum param size (elements) for FSDP sharding; None = library
    # default (parallel/mesh.FSDP_MIN_SIZE). Small params are replicated:
    # sharding them pollutes activation shardings (involuntary remat).
    fsdp_min_size: Optional[int] = None


def to_dict(cfg) -> Dict[str, Any]:
    return dataclasses.asdict(cfg)


def to_json(cfg) -> str:
    return json.dumps(to_dict(cfg), indent=2, default=str)


def from_dict(cls, d: Dict[str, Any]):
    names = {f.name for f in dataclasses.fields(cls)}
    return cls(**{k: v for k, v in d.items() if k in names})

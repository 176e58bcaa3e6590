"""Device mesh and sharding utilities.

The reference reaches NCCL through three different DP wrappers
(SURVEY.md §5.8; image/train.py:151, molecule/semlaflow/train.py:408-418,
molecule/src/self_condition_train_qm9.py:33-38). Here all domains share one
`jax.sharding.Mesh` with three axes:

  * 'data'   — batch (data parallel); gradients psum'd implicitly by jit
  * 'fsdp'   — optional ZeRO-3-style parameter sharding (largest divisible dim)
  * 'tensor' — optional tensor parallelism via per-module PartitionSpec rules

Single-chip runs use a trivial (1,1,1) mesh and compile to the identical
program with collectives elided.
"""

from __future__ import annotations

import re
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
FSDP_AXIS = "fsdp"
TENSOR_AXIS = "tensor"
MESH_AXES = (DATA_AXIS, FSDP_AXIS, TENSOR_AXIS)


def make_mesh(
    data: Optional[int] = None,
    fsdp: int = 1,
    tensor: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ('data','fsdp','tensor') mesh. `data=None` absorbs all
    remaining devices. ICI-adjacent axes should be the fastest-varying ones;
    we put 'tensor' innermost so TP collectives ride the shortest links.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        assert n % (fsdp * tensor) == 0, (n, fsdp, tensor)
        data = n // (fsdp * tensor)
    need = data * fsdp * tensor
    assert need <= n, (data, fsdp, tensor, n)
    dev_array = np.asarray(devices[:need]).reshape(data, fsdp, tensor)
    return Mesh(dev_array, MESH_AXES)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data' (and 'fsdp' if present, so
    pure-DP jobs on a (d, f, 1) mesh still use every device for data)."""
    if mesh.shape[FSDP_AXIS] > 1:
        return NamedSharding(mesh, P((DATA_AXIS, FSDP_AXIS)))
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def fsdp_spec(shape: tuple, fsdp_size: int, tensor_spec: P | None = None) -> P:
    """PartitionSpec sharding the largest divisible dim of `shape` on 'fsdp',
    respecting dims already claimed by a tensor-parallel spec."""
    taken = set()
    parts = [None] * len(shape)
    if tensor_spec is not None:
        for i, ax in enumerate(tensor_spec):
            if ax is not None:
                parts[i] = ax
                taken.add(i)
    if fsdp_size > 1:
        order = sorted(range(len(shape)), key=lambda i: -shape[i])
        for i in order:
            if i in taken or shape[i] % fsdp_size != 0 or shape[i] < 2 * fsdp_size:
                continue
            parts[i] = (FSDP_AXIS,) if parts[i] is None else parts[i]
            break
    return P(*parts)


def shard_params(params, mesh: Mesh, tp_rules: Sequence[tuple] = ()):
    """Compute a NamedSharding pytree for `params`.

    `tp_rules` is a list of (regex, PartitionSpec) matched against the
    '/'-joined param path; first match wins for the tensor axis. FSDP then
    shards the largest remaining dim. With fsdp=tensor=1 everything is
    replicated.
    """
    fsdp_size = mesh.shape[FSDP_AXIS]

    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def path_str(path):
        out = []
        for k in path:
            if hasattr(k, "key"):
                out.append(str(k.key))
            elif hasattr(k, "idx"):
                out.append(str(k.idx))
            else:
                out.append(str(k))
        return "/".join(out)

    shardings = {}
    for path, leaf in flat:
        ps = path_str(path)
        tspec = None
        if mesh.shape[TENSOR_AXIS] > 1:
            for pat, spec in tp_rules:
                if re.search(pat, ps):
                    tspec = spec
                    break
        spec = fsdp_spec(np.shape(leaf), fsdp_size, tspec)
        # Drop axes that don't divide the dim (safety for odd shapes).
        fixed = []
        for i, ax in enumerate(spec):
            if ax is None:
                fixed.append(None)
                continue
            size = np.prod([mesh.shape[a] for a in (ax if isinstance(ax, tuple) else (ax,))])
            fixed.append(ax if np.shape(leaf)[i] % size == 0 else None)
        shardings[ps] = NamedSharding(mesh, P(*fixed))

    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: shardings[path_str(path)], params
    )


# Tensor-parallel rules for the SiT transformer: column-parallel qkv / mlp-in,
# row-parallel attn-out / mlp-out (Megatron layout → one psum per block).
SIT_TP_RULES = (
    (r"attn/qkv/kernel", P(None, TENSOR_AXIS)),
    (r"attn/proj/kernel", P(TENSOR_AXIS, None)),
    (r"mlp/fc1/kernel", P(None, TENSOR_AXIS)),
    (r"mlp/fc2/kernel", P(TENSOR_AXIS, None)),
)

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
SEQ_AXIS = "seq"
MESH_AXES = (DATA_AXIS, FSDP_AXIS, SEQ_AXIS, TENSOR_AXIS)


def make_mesh(
    data: Optional[int] = None,
    fsdp: int = 1,
    tensor: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
    seq: int = 1,
) -> Mesh:
    """Build a ('data','fsdp','seq','tensor') mesh. `data=None` absorbs all
    remaining devices. ICI-adjacent axes should be the fastest-varying ones;
    we put 'tensor' innermost so TP collectives ride the shortest links,
    with 'seq' (attention all-gathers, image SP) next.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        assert n % (fsdp * tensor * seq) == 0, (n, fsdp, tensor, seq)
        data = n // (fsdp * tensor * seq)
    need = data * fsdp * tensor * seq
    assert need <= n, (data, fsdp, tensor, seq, n)
    dev_array = np.asarray(devices[:need]).reshape(data, fsdp, seq, tensor)
    return Mesh(dev_array, MESH_AXES)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data' (and 'fsdp' if present, so
    pure-DP jobs on a (d, f, 1) mesh still use every device for data)."""
    if mesh.shape[FSDP_AXIS] > 1:
        return NamedSharding(mesh, P((DATA_AXIS, FSDP_AXIS)))
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def token_sharding(mesh: Mesh) -> Optional[NamedSharding]:
    """NamedSharding for [B, S, D] token activations with the token axis
    sharded over 'seq' (image sequence parallelism). None when SP is off,
    so the model skips its constraints entirely."""
    if SEQ_AXIS not in mesh.shape or mesh.shape[SEQ_AXIS] <= 1:
        return None
    batch = (DATA_AXIS, FSDP_AXIS) if mesh.shape[FSDP_AXIS] > 1 else DATA_AXIS
    return NamedSharding(mesh, P(batch, SEQ_AXIS, None))


# Minimum leaf size (elements) for FSDP sharding. Sharding small params
# saves no meaningful HBM but pollutes activation shardings: XLA propagates
# the param's feature-dim sharding into the activation graph, conflicts
# with the batch sharding, and falls back to replicate-then-repartition
# ("[SPMD] Involuntary full rematerialization" in the r02 dryrun).
FSDP_MIN_SIZE = 65536


def fsdp_spec(shape: tuple, fsdp_size: int, tensor_spec: P | None = None,
              min_size: int = FSDP_MIN_SIZE) -> P:
    """PartitionSpec sharding the largest divisible dim of `shape` on 'fsdp',
    respecting dims already claimed by a tensor-parallel spec.

    1-D params (biases, norm scales) and leaves smaller than `min_size`
    elements are never FSDP-sharded (see FSDP_MIN_SIZE note)."""
    taken = set()
    parts = [None] * len(shape)
    if tensor_spec is not None:
        for i, ax in enumerate(tensor_spec):
            if ax is not None:
                parts[i] = ax
                taken.add(i)
    if fsdp_size > 1 and len(shape) >= 2 and \
            int(np.prod(shape)) >= max(1, min_size):
        # Prefer dim 0 (the contraction dim of a [in, out] Dense kernel):
        # sharding the output dim makes XLA propagate a feature-dim sharding
        # into downstream activations, which conflicts with batch sharding
        # at fan-out points (e.g. the adaLN conditioning vector, r02 dryrun
        # involuntary-remat). Contraction-dim shards just all-gather the
        # kernel before the matmul — pure ZeRO semantics.
        order = [0] + sorted(range(1, len(shape)), key=lambda i: -shape[i])
        for i in order:
            if i in taken or shape[i] % fsdp_size != 0 or shape[i] < 2 * fsdp_size:
                continue
            parts[i] = (FSDP_AXIS,) if parts[i] is None else parts[i]
            break
    return P(*parts)


def shard_params(params, mesh: Mesh, tp_rules: Sequence[tuple] = (),
                 fsdp_min_size: Optional[int] = None):
    """Compute a NamedSharding pytree for `params`.

    `tp_rules` is a list of (regex, PartitionSpec) matched against the
    '/'-joined param path; first match wins for the tensor axis. FSDP then
    shards the largest remaining dim of leaves >= `fsdp_min_size` elements
    (default FSDP_MIN_SIZE; 1-D leaves never shard). With fsdp=tensor=1
    everything is replicated.
    """
    fsdp_size = mesh.shape[FSDP_AXIS]
    min_size = FSDP_MIN_SIZE if fsdp_min_size is None else fsdp_min_size

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
        spec = fsdp_spec(np.shape(leaf), fsdp_size, tspec, min_size=min_size)
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


# Tensor-parallel rules per model family: Megatron layout — column-parallel
# first projection (P(None, 'tensor') on the [in, out] kernel), row-parallel
# second projection (P('tensor', None)) → one psum per block. Rules are
# layout hints only; SPMD guarantees identical numerics, and dims that don't
# divide the tensor axis are dropped by shard_params' safety check.

# SiT transformer (models/sit.py): qkv/mlp-in columns, attn-out/mlp-out rows.
SIT_TP_RULES = (
    (r"attn/qkv/kernel", P(None, TENSOR_AXIS)),
    (r"attn/proj/kernel", P(TENSOR_AXIS, None)),
    (r"mlp/fc1/kernel", P(None, TENSOR_AXIS)),
    (r"mlp/fc2/kernel", P(TENSOR_AXIS, None)),
)

# ProteinMPNN (models/pmpnn.py): position-wise FFN, 3-layer message MLPs
# (outer pair sharded, middle replicated), edge-update MLP, and the REPA
# projector MLPs (the largest params in the model).
PMPNN_TP_RULES = (
    (r"dense/fc1/kernel", P(None, TENSOR_AXIS)),
    (r"dense/fc2/kernel", P(TENSOR_AXIS, None)),
    (r"/W1/kernel", P(None, TENSOR_AXIS)),
    (r"/W3/kernel", P(TENSOR_AXIS, None)),
    (r"/W11/kernel", P(None, TENSOR_AXIS)),
    (r"/W13/kernel", P(TENSOR_AXIS, None)),
    (r"W_edge_fc1/kernel", P(None, TENSOR_AXIS)),
    (r"W_edge_fc2/kernel", P(TENSOR_AXIS, None)),
    (r"projectors_\w+/Dense_0/kernel", P(None, TENSOR_AXIS)),
    (r"projectors_\w+/Dense_2/kernel", P(TENSOR_AXIS, None)),
)

# Semla (models/semla.py): node-FF invariant MLP, edge-message MLP,
# head-parallel node attention, and the input feature projection.
SEMLA_TP_RULES = (
    (r"inv_fc1/kernel", P(None, TENSOR_AXIS)),
    (r"inv_fc2/kernel", P(TENSOR_AXIS, None)),
    (r"message_fc1/kernel", P(None, TENSOR_AXIS)),
    (r"message_fc2/kernel", P(TENSOR_AXIS, None)),
    (r"node_attn/in_proj/kernel", P(None, TENSOR_AXIS)),
    (r"node_attn/out_proj/kernel", P(TENSOR_AXIS, None)),
    (r"feat_proj_fc1/kernel", P(None, TENSOR_AXIS)),
    (r"feat_proj_fc2/kernel", P(TENSOR_AXIS, None)),
)

# EGNN (models/egnn.py): GCL edge/node/coord MLP pairs and the DiT-style
# rep-conditioning blocks.
EGNN_TP_RULES = (
    (r"edge_fc1/kernel", P(None, TENSOR_AXIS)),
    (r"edge_fc2/kernel", P(TENSOR_AXIS, None)),
    (r"node_fc1/kernel", P(None, TENSOR_AXIS)),
    (r"node_fc2/kernel", P(TENSOR_AXIS, None)),
    (r"coord_fc1/kernel", P(None, TENSOR_AXIS)),
    (r"coord_fc2/kernel", P(TENSOR_AXIS, None)),
    (r"ff_proj/kernel", P(None, TENSOR_AXIS)),
    (r"ff_out/kernel", P(TENSOR_AXIS, None)),
)

# MultiFlow IPA trunk (models/ipa.py): head-parallel IPA projections,
# row-parallel output, seq-transformer qkv/proj + MLP pairs.
IPA_TP_RULES = (
    (r"linear_q/kernel", P(None, TENSOR_AXIS)),
    (r"linear_kv/kernel", P(None, TENSOR_AXIS)),
    (r"linear_q_points/kernel", P(None, TENSOR_AXIS)),
    (r"linear_kv_points/kernel", P(None, TENSOR_AXIS)),
    (r"linear_out/kernel", P(TENSOR_AXIS, None)),
    (r"qkv/kernel", P(None, TENSOR_AXIS)),
    (r"proj/kernel", P(TENSOR_AXIS, None)),
    (r"fc1/kernel", P(None, TENSOR_AXIS)),
    (r"fc2/kernel", P(TENSOR_AXIS, None)),
)

# RDM SimpleMLP (models/rdm_mlp.py): residual in/out pairs; the embedding
# adds (emb_fc/context_fc) are column-sharded so the elementwise add inside
# the block stays aligned with in_fc's output sharding.
RDM_TP_RULES = (
    (r"res_\d+/in_fc/kernel", P(None, TENSOR_AXIS)),
    (r"res_\d+/emb_fc/kernel", P(None, TENSOR_AXIS)),
    (r"res_\d+/context_fc/kernel", P(None, TENSOR_AXIS)),
    (r"res_\d+/out_fc/kernel", P(TENSOR_AXIS, None)),
)

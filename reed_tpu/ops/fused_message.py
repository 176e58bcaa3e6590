"""Fused neighbor-message MLP Pallas kernel for k-NN message passing.

The ProteinMPNN message chains (reference: protein/fmif/model_utils.py:
296-390) compute, for every edge (i, k):

    msg = W3 @ gelu(W2 @ gelu(pre_self_i + e_feat_ik @ W_e + nbr_src_{j(i,k)}))
    dh_i = sum_k msg_ik / scale            (node update)
    (optionally the full msg tensor feeds the edge-state residual)

On TPU the XLA lowering of the unfused form materializes every [B,L,K,D]
intermediate in HBM (pre, both gelu outputs, the one-hot gather tensor, and
the dW convolutions that read them back), which makes the step bandwidth-
bound (device trace, v5e: ~85 ms/step of elementwise traffic on
[64,256,30,128] tensors at bs64/L256). This kernel keeps the whole chain in
VMEM for one (batch, L-tile) at a time:

- the neighbor gather is an in-register one-hot matmul (iota-compare against
  e_idx, then MXU dot against the per-batch nbr_src block) — the one-hot
  selection tensor never exists in HBM;
- the three matmuls run back-to-back on the MXU with f32 accumulation;
- only the requested outputs (the K-sum and/or the full message) are written.

The backward pass is a second Pallas kernel that recomputes the forward
intermediates per tile (flash-attention-style) and accumulates the weight
gradients and the scatter-add into nbr_src across the sequential TPU grid
(dns for a batch accumulates over that batch's L-tiles; dW accumulates over
the whole grid — both rely on TPU grids executing sequentially).

MEASURED OUTCOME (v5e, full fmif train step, bs64/L256/bf16/rbg): the fused
step is slower than the one-hot-einsum XLA path — 83k vs 107k tok/s — and
block-size sweeps (fwd 32/64/128, bwd capped at 32 by the 16 MiB scoped-VMEM
budget) do not change it. The chain is compute-bound at this part's measured
~320 flop/byte balance (127 TF/s dense : 400 GB/s copy), so XLA's
full-tensor convolutions beat per-tile kernel dots and the saved HBM traffic
doesn't pay; same verdict as the SiT attention kernel at S<=256
(ops/flash_attention.py). The kernel stays as an opt-in
(ProteinTrainConfig.fused_messages="on") and as the pattern to reach for if
REED protein configs ever grow to bandwidth-bound shapes.

Exact to f32 rounding vs the unfused form (erf is the Eigen rational
approximation XLA itself lowers to); pinned by tests/test_fused_message.py
(interpret mode on CPU) including a full-model fused-vs-direct parity test.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INV_SQRT2 = 1.0 / math.sqrt(2.0)
_INV_SQRT2PI = 1.0 / math.sqrt(2.0 * math.pi)


# Mosaic has no erf lowering; this is the Eigen generic_fast_erf_float
# rational approximation (the polynomial XLA itself lowers f32 erf to),
# accurate to f32 rounding on [-4, 4] and exactly ±1 outside.
_ERF_ALPHA = (-2.72614225801306e-10, 2.77068142495902e-08,
              -2.10102402082508e-06, -5.69250639462346e-05,
              -7.34990630326855e-04, -2.95459980854025e-03,
              -1.60960333262415e-02)
_ERF_BETA = (-1.45660718464996e-05, -2.13374055278905e-04,
             -1.68282697438203e-03, -7.37332916720468e-03,
             -1.42647390514189e-02)


def _erf(x):
    x = jnp.clip(x, -4.0, 4.0)
    x2 = x * x
    p = jnp.float32(_ERF_ALPHA[0])
    for c in _ERF_ALPHA[1:]:
        p = p * x2 + jnp.float32(c)
    q = jnp.float32(_ERF_BETA[0])
    for c in _ERF_BETA[1:]:
        q = q * x2 + jnp.float32(c)
    return (x * p) / q


def _gelu(x):
    # exact (erf) GELU in f32, matching jax.nn.gelu(approximate=False)
    return 0.5 * x * (1.0 + _erf(x * _INV_SQRT2))


def _dgelu(x):
    # d/dx gelu(x) = Phi(x) + x * phi(x)
    return (0.5 * (1.0 + _erf(x * _INV_SQRT2))
            + x * _INV_SQRT2PI * jnp.exp(-0.5 * x * x))


def _dot(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dot_tn(a, b):
    """a^T @ b with a,b: [rows, ...] contracting the row dim."""
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _recompute(ps_ref, ef_ref, ns_ref, idx_ref, mask_ref,
               we_ref, w2_ref, b2_ref, w3_ref, b3_ref,
               *, bl, K, L, D, Ce, mask_mode, cdt):
    """Shared forward math on one (batch, L-tile) block. Returns the
    intermediates the backward pass needs."""
    ef = ef_ref[0].reshape(bl * K, Ce).astype(cdt)
    we = we_ref[...].astype(cdt)
    edge = _dot(ef, we)                                      # [blK, D] f32
    idx = idx_ref[0]                                         # [bl, K] i32
    iota = jax.lax.broadcasted_iota(jnp.int32, (bl, K, L), 2)
    oh = (iota == idx[:, :, None]).astype(cdt).reshape(bl * K, L)
    nbr = _dot(oh, ns_ref[0].astype(cdt))                    # [blK, D] f32
    et = edge + nbr
    mask3 = mask_ref[0][:, :, None].astype(jnp.float32)      # [bl, K, 1]
    if mask_mode == "pre":
        et = (et.reshape(bl, K, D) * mask3).reshape(bl * K, D)
    ps = ps_ref[0].astype(jnp.float32)                       # [bl, D]
    pre = (et.reshape(bl, K, D) + ps[:, None, :]).reshape(bl * K, D)
    m1 = _gelu(pre)
    z2 = _dot(m1.astype(cdt), w2_ref[...].astype(cdt)) \
        + b2_ref[...].astype(jnp.float32)
    m2 = _gelu(z2)
    return ef, oh, mask3, pre, m1, z2, m2, we


def _fwd_kernel(ps_ref, ef_ref, ns_ref, idx_ref, mask_ref,
                we_ref, w2_ref, b2_ref, w3_ref, b3_ref, *outs,
                bl, K, L, D, Ce, scale, mask_mode, want_sum, want_msg, cdt):
    _, _, mask3, _, _, _, m2, _ = _recompute(
        ps_ref, ef_ref, ns_ref, idx_ref, mask_ref,
        we_ref, w2_ref, b2_ref, w3_ref, b3_ref,
        bl=bl, K=K, L=L, D=D, Ce=Ce, mask_mode=mask_mode, cdt=cdt)
    z3 = _dot(m2.astype(cdt), w3_ref[...].astype(cdt)) \
        + b3_ref[...].astype(jnp.float32)
    out3 = z3.reshape(bl, K, D)
    if mask_mode == "post":
        out3 = out3 * mask3
    o = 0
    if want_sum:
        outs[o][0] = (jnp.sum(out3, axis=1) / scale).astype(outs[o].dtype)
        o += 1
    if want_msg:
        outs[o][0] = out3.astype(outs[o].dtype)


def _bwd_kernel(ps_ref, ef_ref, ns_ref, idx_ref, mask_ref,
                we_ref, w2_ref, b2_ref, w3_ref, b3_ref, *grefs_and_outs,
                bl, K, L, D, Ce, scale, mask_mode, want_sum, want_msg, cdt):
    n_g = int(want_sum) + int(want_msg)
    gs = grefs_and_outs[:n_g]
    (dps_ref, def_ref, dns_ref, dwe_ref, dw2_ref, db2_ref,
     dw3_ref, db3_ref) = grefs_and_outs[n_g:]
    b = pl.program_id(0)
    i = pl.program_id(1)

    ef, oh, mask3, pre, m1, z2, m2, we = _recompute(
        ps_ref, ef_ref, ns_ref, idx_ref, mask_ref,
        we_ref, w2_ref, b2_ref, w3_ref, b3_ref,
        bl=bl, K=K, L=L, D=D, Ce=Ce, mask_mode=mask_mode, cdt=cdt)

    g = 0
    gi = 0
    if want_sum:
        gdh = gs[gi][0].astype(jnp.float32)                  # [bl, D]
        g = jnp.broadcast_to(gdh[:, None, :] / scale, (bl, K, D))
        gi += 1
    if want_msg:
        gmsg = gs[gi][0].astype(jnp.float32)                 # [bl, K, D]
        g = g + gmsg if want_sum else gmsg
    if mask_mode == "post":
        g = g * mask3
    g3 = g.reshape(bl * K, D)

    w3 = w3_ref[...].astype(cdt)
    g2 = _dot(g3.astype(cdt), w3.T) * _dgelu(z2)
    w2 = w2_ref[...].astype(cdt)
    g1 = _dot(g2.astype(cdt), w2.T) * _dgelu(pre)

    dps_ref[0] = jnp.sum(g1.reshape(bl, K, D), axis=1).astype(dps_ref.dtype)
    ge = g1
    if mask_mode == "pre":
        ge = (g1.reshape(bl, K, D) * mask3).reshape(bl * K, D)
    gec = ge.astype(cdt)
    def_ref[0] = _dot(gec, we.T).reshape(bl, K, Ce).astype(def_ref.dtype)

    # scatter-add into nbr_src for this batch: accumulate over L-tiles
    dns_tile = _dot_tn(oh, gec)                              # [L, D]
    @pl.when(i == 0)
    def _init_dns():
        dns_ref[0] = dns_tile
    @pl.when(i > 0)
    def _acc_dns():
        dns_ref[0] += dns_tile

    # weight/bias grads: accumulate over the whole (sequential) grid
    dwe_t = _dot_tn(ef, gec)
    dw2_t = _dot_tn(m1.astype(cdt), g2.astype(cdt))
    db2_t = jnp.sum(g2, axis=0, keepdims=True)
    dw3_t = _dot_tn(m2.astype(cdt), g3.astype(cdt))
    db3_t = jnp.sum(g3, axis=0, keepdims=True)
    first = jnp.logical_and(b == 0, i == 0)
    @pl.when(first)
    def _init_dw():
        dwe_ref[...] = dwe_t
        dw2_ref[...] = dw2_t
        db2_ref[...] = db2_t
        dw3_ref[...] = dw3_t
        db3_ref[...] = db3_t
    @pl.when(jnp.logical_not(first))
    def _acc_dw():
        dwe_ref[...] += dwe_t
        dw2_ref[...] += dw2_t
        db2_ref[...] += db2_t
        dw3_ref[...] += dw3_t
        db3_ref[...] += db3_t


# process-wide defaults (tuned on v5e; see tools/bench_fused_message.py)
DEFAULT_BLOCK_L: Optional[int] = None
DEFAULT_BLOCK_L_BWD: Optional[int] = None


def _block_l(L: int, block_l: Optional[int]) -> int:
    cap = min(block_l or 32, L)
    for bl in range(cap, 0, -1):
        if L % bl == 0:
            return bl
    return 1


def _in_specs(bl, K, L, D, Ce):
    c = lambda b, i: (b, i, 0)
    return [
        pl.BlockSpec((1, bl, D), c),                # pre_self
        pl.BlockSpec((1, bl, K, Ce), lambda b, i: (b, i, 0, 0)),  # e_feat
        pl.BlockSpec((1, L, D), lambda b, i: (b, 0, 0)),          # nbr_src
        pl.BlockSpec((1, bl, K), c),                # e_idx
        pl.BlockSpec((1, bl, K), c),                # mask
        pl.BlockSpec((Ce, D), lambda b, i: (0, 0)),  # w_e
        pl.BlockSpec((D, D), lambda b, i: (0, 0)),   # w2
        pl.BlockSpec((1, D), lambda b, i: (0, 0)),   # b2
        pl.BlockSpec((D, D), lambda b, i: (0, 0)),   # w3
        pl.BlockSpec((1, D), lambda b, i: (0, 0)),   # b3
    ]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused(cfg, pre_self, e_feat, nbr_src, e_idx, mask, w_e, w2, b2, w3, b3):
    outs = _fused_fwd_call(cfg, pre_self, e_feat, nbr_src, e_idx, mask,
                           w_e, w2, b2, w3, b3)
    return outs


def _fused_fwd_call(cfg, pre_self, e_feat, nbr_src, e_idx, mask,
                    w_e, w2, b2, w3, b3):
    (bl, bl_bwd, K, L, D, Ce, scale, mask_mode, want_sum, want_msg,
     interpret) = cfg
    B = pre_self.shape[0]
    cdt = e_feat.dtype if e_feat.dtype in (jnp.bfloat16, jnp.float16) \
        else jnp.float32
    out_dt = e_feat.dtype
    out_shapes, out_specs = [], []
    if want_sum:
        out_shapes.append(jax.ShapeDtypeStruct((B, L, D), out_dt))
        out_specs.append(pl.BlockSpec((1, bl, D), lambda b, i: (b, i, 0)))
    if want_msg:
        out_shapes.append(jax.ShapeDtypeStruct((B, L, K, D), out_dt))
        out_specs.append(pl.BlockSpec((1, bl, K, D),
                                      lambda b, i: (b, i, 0, 0)))
    kern = functools.partial(
        _fwd_kernel, bl=bl, K=K, L=L, D=D, Ce=Ce, scale=scale,
        mask_mode=mask_mode, want_sum=want_sum, want_msg=want_msg, cdt=cdt)
    outs = pl.pallas_call(
        kern,
        grid=(B, L // bl),
        in_specs=_in_specs(bl, K, L, D, Ce),
        out_specs=out_specs if len(out_specs) > 1 else out_specs[0],
        out_shape=out_shapes if len(out_shapes) > 1 else out_shapes[0],
        interpret=interpret,
    )(pre_self, e_feat, nbr_src, e_idx, mask,
      w_e, w2, b2.reshape(1, -1), w3, b3.reshape(1, -1))
    return outs if isinstance(outs, (tuple, list)) else (outs,)


def _fused_fwd(cfg, pre_self, e_feat, nbr_src, e_idx, mask,
               w_e, w2, b2, w3, b3):
    outs = _fused_fwd_call(cfg, pre_self, e_feat, nbr_src, e_idx, mask,
                           w_e, w2, b2, w3, b3)
    res = (pre_self, e_feat, nbr_src, e_idx, mask, w_e, w2, b2, w3, b3)
    return outs, res


def _fused_bwd(cfg, res, gouts):
    (_, bl, K, L, D, Ce, scale, mask_mode, want_sum, want_msg,
     interpret) = cfg
    pre_self, e_feat, nbr_src, e_idx, mask, w_e, w2, b2, w3, b3 = res
    B = pre_self.shape[0]
    cdt = e_feat.dtype if e_feat.dtype in (jnp.bfloat16, jnp.float16) \
        else jnp.float32

    g_in_specs, g_ins = [], []
    gi = 0
    if want_sum:
        g_in_specs.append(pl.BlockSpec((1, bl, D), lambda b, i: (b, i, 0)))
        g_ins.append(gouts[gi])
        gi += 1
    if want_msg:
        g_in_specs.append(pl.BlockSpec((1, bl, K, D),
                                       lambda b, i: (b, i, 0, 0)))
        g_ins.append(gouts[gi])

    f32 = jnp.float32
    out_shapes = [
        jax.ShapeDtypeStruct((B, L, D), f32),        # d pre_self
        jax.ShapeDtypeStruct((B, L, K, Ce), f32),    # d e_feat
        jax.ShapeDtypeStruct((B, L, D), f32),        # d nbr_src
        jax.ShapeDtypeStruct((Ce, D), f32),          # d w_e
        jax.ShapeDtypeStruct((D, D), f32),           # d w2
        jax.ShapeDtypeStruct((1, D), f32),           # d b2
        jax.ShapeDtypeStruct((D, D), f32),           # d w3
        jax.ShapeDtypeStruct((1, D), f32),           # d b3
    ]
    out_specs = [
        pl.BlockSpec((1, bl, D), lambda b, i: (b, i, 0)),
        pl.BlockSpec((1, bl, K, Ce), lambda b, i: (b, i, 0, 0)),
        pl.BlockSpec((1, L, D), lambda b, i: (b, 0, 0)),
        pl.BlockSpec((Ce, D), lambda b, i: (0, 0)),
        pl.BlockSpec((D, D), lambda b, i: (0, 0)),
        pl.BlockSpec((1, D), lambda b, i: (0, 0)),
        pl.BlockSpec((D, D), lambda b, i: (0, 0)),
        pl.BlockSpec((1, D), lambda b, i: (0, 0)),
    ]
    kern = functools.partial(
        _bwd_kernel, bl=bl, K=K, L=L, D=D, Ce=Ce, scale=scale,
        mask_mode=mask_mode, want_sum=want_sum, want_msg=want_msg, cdt=cdt)
    (dps, def_, dns, dwe, dw2, db2, dw3, db3) = pl.pallas_call(
        kern,
        grid=(B, L // bl),
        in_specs=_in_specs(bl, K, L, D, Ce) + g_in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(pre_self, e_feat, nbr_src, e_idx, mask,
      w_e, w2, b2.reshape(1, -1), w3, b3.reshape(1, -1), *g_ins)

    d_idx = np.zeros(e_idx.shape, jax.dtypes.float0)
    return (dps.astype(pre_self.dtype), def_.astype(e_feat.dtype),
            dns.astype(nbr_src.dtype), d_idx, jnp.zeros_like(mask),
            dwe.astype(w_e.dtype), dw2.astype(w2.dtype),
            db2.reshape(b2.shape).astype(b2.dtype),
            dw3.astype(w3.dtype),
            db3.reshape(b3.shape).astype(b3.dtype))


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_message_mlp(pre_self, e_feat, nbr_src, e_idx, w_e, w2, b2, w3, b3,
                      mask=None, mask_mode: str = "post", scale: float = 30.0,
                      want_sum: bool = True, want_msg: bool = False,
                      block_l: Optional[int] = None,
                      block_l_bwd: Optional[int] = None,
                      interpret: Optional[bool] = None):
    """Fused k-NN message MLP.

    pre_self [B,L,D] (self term incl. first-layer bias), e_feat [B,L,K,Ce],
    nbr_src [B,L,D] (per-node neighbor term, gathered by e_idx [B,L,K]),
    weights of the W2/W3 denses, optional per-edge mask [B,L,K] applied
    'pre' (to edge+neighbor terms, DecLayer) or 'post' (to the final
    message, EncLayer). Returns (dh, msg): dh = sum_k msg / scale when
    want_sum, the full [B,L,K,D] message when want_msg; None otherwise.
    """
    assert want_sum or want_msg
    assert mask_mode in ("none", "pre", "post")
    B, L, D = pre_self.shape
    K = e_idx.shape[-1]
    Ce = e_feat.shape[-1]
    if mask is None:
        mask = jnp.ones((B, L, K), jnp.float32)
        mask_mode = "none"
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if block_l is None:
        block_l = DEFAULT_BLOCK_L
    if block_l_bwd is None:
        block_l_bwd = DEFAULT_BLOCK_L_BWD
    bl = _block_l(L, block_l)
    # the backward holds ~3x the live intermediates; default to a smaller
    # tile so it stays inside the 16 MiB scoped-VMEM budget
    bl_bwd = _block_l(L, block_l_bwd) if block_l_bwd is not None \
        else min(bl, 32)
    cfg = (bl, bl_bwd, K, L, D, Ce, float(scale), mask_mode,
           bool(want_sum), bool(want_msg), bool(interpret))
    outs = _fused(cfg, pre_self, e_feat, nbr_src,
                  e_idx.astype(jnp.int32), mask.astype(jnp.float32),
                  w_e, w2, b2, w3, b3)
    dh = outs[0] if want_sum else None
    msg = outs[int(want_sum)] if want_msg else None
    return dh, msg

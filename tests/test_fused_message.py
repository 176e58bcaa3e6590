"""Fused neighbor-message kernel vs the direct (unfused) formulation.

Runs the Pallas kernel in interpret mode on the CPU test mesh; the same
code path compiles for TPU. Exactness is modulo fp summation order, so
tolerances are tight-f32.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reed_tpu.ops.fused_message import fused_message_mlp


def _gelu(x):
    return jax.nn.gelu(x, approximate=False)


def _direct(pre_self, e_feat, nbr_src, e_idx, w_e, w2, b2, w3, b3,
            mask, mask_mode, scale):
    from reed_tpu.ops.graph import gather_nodes

    nbr = gather_nodes(nbr_src, e_idx)
    et = e_feat @ w_e + nbr
    if mask_mode == "pre":
        et = et * mask[..., None]
    pre = et + pre_self[:, :, None, :]
    m = _gelu(_gelu(pre) @ w2 + b2) @ w3 + b3
    if mask_mode == "post":
        m = m * mask[..., None]
    return jnp.sum(m, axis=2) / scale, m


def _inputs(key, B=2, L=16, K=4, D=128, Ce=256, dtype=jnp.float32):
    ks = jax.random.split(key, 9)
    s = 0.3
    return dict(
        pre_self=(s * jax.random.normal(ks[0], (B, L, D))).astype(dtype),
        e_feat=(s * jax.random.normal(ks[1], (B, L, K, Ce))).astype(dtype),
        nbr_src=(s * jax.random.normal(ks[2], (B, L, D))).astype(dtype),
        e_idx=jax.random.randint(ks[3], (B, L, K), 0, L),
        w_e=(s * jax.random.normal(ks[4], (Ce, D))).astype(dtype),
        w2=(s * jax.random.normal(ks[5], (D, D))).astype(dtype),
        b2=(s * jax.random.normal(ks[6], (D,))).astype(dtype),
        w3=(s * jax.random.normal(ks[7], (D, D))).astype(dtype),
        b3=(s * jax.random.normal(ks[8], (D,))).astype(dtype),
        mask=jax.random.bernoulli(ks[3], 0.8, (B, L, K)).astype(jnp.float32),
    )


@pytest.mark.parametrize("mask_mode", ["none", "pre", "post"])
@pytest.mark.parametrize("outputs", ["sum", "msg", "both"])
def test_forward_matches_direct(mask_mode, outputs):
    inp = _inputs(jax.random.PRNGKey(0))
    mask = None if mask_mode == "none" else inp["mask"]
    want_sum = outputs in ("sum", "both")
    want_msg = outputs in ("msg", "both")
    dh, msg = fused_message_mlp(
        inp["pre_self"], inp["e_feat"], inp["nbr_src"], inp["e_idx"],
        inp["w_e"], inp["w2"], inp["b2"], inp["w3"], inp["b3"],
        mask=mask, mask_mode=mask_mode, scale=30.0,
        want_sum=want_sum, want_msg=want_msg, interpret=True)
    ref_dh, ref_msg = _direct(
        inp["pre_self"], inp["e_feat"], inp["nbr_src"], inp["e_idx"],
        inp["w_e"], inp["w2"], inp["b2"], inp["w3"], inp["b3"],
        inp["mask"] if mask is not None else jnp.ones_like(inp["mask"]),
        mask_mode, 30.0)
    if want_sum:
        np.testing.assert_allclose(dh, ref_dh, rtol=2e-5, atol=2e-5)
    if want_msg:
        np.testing.assert_allclose(msg, ref_msg, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("mask_mode,outputs",
                         [("post", "sum"), ("none", "msg"), ("pre", "both")])
def test_grads_match_direct(mask_mode, outputs):
    inp = _inputs(jax.random.PRNGKey(1))
    mask = None if mask_mode == "none" else inp["mask"]
    want_sum = outputs in ("sum", "both")
    want_msg = outputs in ("msg", "both")
    diff_names = ("pre_self", "e_feat", "nbr_src", "w_e", "w2", "b2",
                  "w3", "b3")
    # distinct weights on each output so both cotangents are exercised
    cot_dh = jax.random.normal(jax.random.PRNGKey(2), inp["pre_self"].shape)
    cot_msg = jax.random.normal(jax.random.PRNGKey(3),
                                inp["e_feat"].shape[:3] + (128,))

    def fused_loss(*args):
        kw = dict(zip(diff_names, args))
        dh, msg = fused_message_mlp(
            kw["pre_self"], kw["e_feat"], kw["nbr_src"], inp["e_idx"],
            kw["w_e"], kw["w2"], kw["b2"], kw["w3"], kw["b3"],
            mask=mask, mask_mode=mask_mode, scale=30.0,
            want_sum=want_sum, want_msg=want_msg, interpret=True)
        tot = 0.0
        if want_sum:
            tot += jnp.sum(dh * cot_dh)
        if want_msg:
            tot += jnp.sum(msg * cot_msg)
        return tot

    def direct_loss(*args):
        kw = dict(zip(diff_names, args))
        dh, msg = _direct(
            kw["pre_self"], kw["e_feat"], kw["nbr_src"], inp["e_idx"],
            kw["w_e"], kw["w2"], kw["b2"], kw["w3"], kw["b3"],
            inp["mask"] if mask is not None else jnp.ones_like(inp["mask"]),
            mask_mode, 30.0)
        tot = 0.0
        if want_sum:
            tot += jnp.sum(dh * cot_dh)
        if want_msg:
            tot += jnp.sum(msg * cot_msg)
        return tot

    args = tuple(inp[n] for n in diff_names)
    g_fused = jax.grad(fused_loss, argnums=tuple(range(len(args))))(*args)
    g_direct = jax.grad(direct_loss, argnums=tuple(range(len(args))))(*args)
    for name, gf, gd in zip(diff_names, g_fused, g_direct):
        np.testing.assert_allclose(gf, gd, rtol=3e-5, atol=3e-5,
                                   err_msg=name)


def test_bfloat16_close_to_f32_reference():
    inp = _inputs(jax.random.PRNGKey(4), dtype=jnp.bfloat16)
    dh, msg = fused_message_mlp(
        inp["pre_self"], inp["e_feat"], inp["nbr_src"], inp["e_idx"],
        inp["w_e"], inp["w2"], inp["b2"], inp["w3"], inp["b3"],
        mask=inp["mask"], mask_mode="post", scale=30.0,
        want_sum=True, want_msg=True, interpret=True)
    f32 = {k: (v.astype(jnp.float32) if v.dtype == jnp.bfloat16 else v)
           for k, v in inp.items()}
    ref_dh, ref_msg = _direct(
        f32["pre_self"], f32["e_feat"], f32["nbr_src"], f32["e_idx"],
        f32["w_e"], f32["w2"], f32["b2"], f32["w3"], f32["b3"],
        f32["mask"], "post", 30.0)
    assert dh.dtype == jnp.bfloat16 and msg.dtype == jnp.bfloat16
    np.testing.assert_allclose(dh.astype(jnp.float32), ref_dh,
                               rtol=0.1, atol=0.1)
    np.testing.assert_allclose(msg.astype(jnp.float32), ref_msg,
                               rtol=0.1, atol=0.1)


def test_full_model_fused_matches_direct():
    """ProteinMPNNFMIF with fused=True (interpret-mode kernel) matches the
    direct model: same params, same log-probs, same loss gradients."""
    from reed_tpu.models.pmpnn import ProteinMPNNFMIF
    from reed_tpu.train.protein import (ProteinTrainConfig,
                                        synthetic_protein_batch)

    cfg = ProteinTrainConfig(batch_size=2, max_len=16)
    batch = synthetic_protein_batch(jax.random.PRNGKey(0), 2, 16, cfg)
    kw = dict(hidden_dim=32, edge_features=32, k_neighbors=4,
              augment_eps=0.0, dropout=0.0)
    direct = ProteinMPNNFMIF(fused=False, **kw)
    fused = ProteinMPNNFMIF(fused=True, **kw)
    args = (batch["X"], batch["S"], batch["mask"], batch["chain_M"],
            batch["residue_idx"], batch["chain_encoding_all"])
    variables = direct.init(jax.random.PRNGKey(1), *args)
    lp_d = direct.apply(variables, *args)
    lp_f = fused.apply(variables, *args)
    np.testing.assert_allclose(np.asarray(lp_f), np.asarray(lp_d),
                               rtol=2e-4, atol=2e-4)

    def loss(model, params):
        lp = model.apply({"params": params}, *args)
        oh = jax.nn.one_hot(batch["S"], lp.shape[-1])
        return -jnp.mean(jnp.sum(oh * lp, -1))

    g_d = jax.grad(lambda p: loss(direct, p))(variables["params"])
    g_f = jax.grad(lambda p: loss(fused, p))(variables["params"])
    flat_d = jax.tree_util.tree_leaves_with_path(g_d)
    flat_f = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(g_f)}
    for k, v in flat_d:
        np.testing.assert_allclose(
            np.asarray(flat_f[jax.tree_util.keystr(k)]), np.asarray(v),
            rtol=5e-4, atol=5e-4, err_msg=jax.tree_util.keystr(k))

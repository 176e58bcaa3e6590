"""Equivariant flow matching (EFM / 'fm' probabilistic model): path math,
decode wrapper scalings, sampler invariants, trainer integration.

Reference: molecule/models/equifm/cnf.py (Cnflows) +
configs/drug_efm_config.yaml probabilistic_model='fm'."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reed_tpu.diffusion.efm import (
    EFMConfig,
    EquivariantCNF,
    T_hat,
    T_int,
    dequantize,
    vp_scale,
)
from reed_tpu.train.molecule_edm import MoleculeEDMConfig, MoleculeEDMTrainer


def _mask(b=2, n=6, real=4):
    m = (jnp.arange(n)[None, :] < real).astype(jnp.float32)[..., None]
    m = jnp.broadcast_to(m, (b, n, 1))
    diag = jnp.eye(n)[None, :, :, None]
    em = m[:, :, None, :] * m[:, None, :, :] * (1 - diag)
    return m, em


def _zero_dynamics(t, z, nm, em, ctx, rep, rng, train):
    return jnp.zeros_like(z)


def test_beta_schedule_closed_form():
    # T(t) = 0.5 (beta_max-beta_min) t^2 + beta_min t; T'(t) = T_hat(t)
    for t in [0.1, 0.5, 0.9]:
        assert np.isclose(float(T_int(jnp.asarray(t))),
                          0.5 * 19.9 * t ** 2 + 0.1 * t)
        assert np.isclose(float(T_hat(jnp.asarray(t))), 19.9 * t + 0.1)
        expect = -0.5 * (19.9 * t + 0.1) / (
            1 - np.exp(-(0.5 * 19.9 * t ** 2 + 0.1 * t)) + 1e-5)
        assert np.isclose(float(vp_scale(jnp.asarray(t))), expect, rtol=1e-5)


def test_dequantize_round_trip():
    rng = jax.random.PRNGKey(0)
    nm, _ = _mask()
    h_cat = jax.nn.one_hot(jnp.zeros((2, 6), jnp.int32), 4) * nm
    h_int = jnp.ones((2, 6, 1)) * nm
    dc, di = dequantize(rng, h_cat, h_int, nm)
    # uniform(-.5,.5) dequantization rounds back to the original integers
    assert np.allclose(np.asarray(jnp.round(dc) - h_cat), 0.0)
    assert np.allclose(np.asarray(jnp.round(di) - h_int), 0.0)
    # padded nodes stay zero
    assert np.allclose(np.asarray(dc[:, 4:]), 0.0)


def test_ot_path_x0_recovery():
    """On the OT path, z_t - t*(eps - xh) == xh exactly."""
    rng = jax.random.PRNGKey(1)
    xh = jax.random.normal(rng, (2, 5, 7))
    eps = jax.random.normal(jax.random.fold_in(rng, 1), (2, 5, 7))
    t = jnp.array([0.3, 0.8])[:, None, None]
    z_t = (1 - t) * xh + t * eps
    v = eps - xh
    assert np.allclose(np.asarray(z_t - t * v), np.asarray(xh), atol=1e-6)


def test_loss_finite_and_masked():
    cfg = EFMConfig(in_node_nf=5, include_charges=True)
    captured = {}

    def dyn(t, z, nm, em, ctx, rep, rng, train):
        captured["z"] = z
        return jnp.zeros_like(z)

    cnf = EquivariantCNF(cfg, dyn)
    nm, em = _mask()
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 6, 3)) * nm
    h_cat = jax.nn.one_hot(jnp.zeros((2, 6), jnp.int32), 4) * nm
    h_int = jnp.ones((2, 6, 1)) * nm
    loss, aux = cnf.loss(rng, x, h_cat, h_int, nm, em)
    assert loss.shape == (2,)
    assert np.all(np.isfinite(np.asarray(loss)))
    # corrupted input respects the node mask
    assert np.allclose(np.asarray(captured["z"][:, 4:]), 0.0)


def test_loss_zero_when_prediction_exact():
    """A dynamics that returns the true velocity gives ~zero loss."""
    cfg = EFMConfig(in_node_nf=5, include_charges=True)
    nm, em = _mask()
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 6, 3)) * nm

    # run once with zero dynamics to capture (z_t, t); then verify the
    # loss-internal target via the closed form on a second pass where the
    # dynamics inverts the path: v = (z_t - xh)/t would need xh; instead
    # check loss ordering: exact-velocity oracle cannot be built without
    # the internal eps, so check that loss scales with prediction error.
    def scaled(s):
        def dyn(t, z, nmm, emm, ctx, rep, rngg, train):
            return jnp.full_like(z, s)
        cnf = EquivariantCNF(cfg, dyn)
        h_cat = jax.nn.one_hot(jnp.zeros((2, 6), jnp.int32), 4) * nm
        h_int = jnp.zeros((2, 6, 1))
        loss, _ = cnf.loss(jax.random.PRNGKey(7), x, h_cat, h_int, nm, em)
        return float(loss.mean())

    assert scaled(100.0) > scaled(0.0)


def test_wrap_velocity_cat_freeze():
    cfg = EFMConfig(in_node_nf=5, include_charges=True, cat_loss_step=0.5)

    def ones(t, z, nm, em, ctx, rep, rng, train):
        return jnp.ones_like(z)

    cnf = EquivariantCNF(cfg, ones)
    nm, em = _mask()
    z = jnp.ones((2, 6, 9)) * nm
    hi = cnf.wrap_velocity(0.9, z, nm, em, None, None)
    lo = cnf.wrap_velocity(0.2, z, nm, em, None, None)
    hi, lo = np.asarray(hi), np.asarray(lo)
    # above cat_loss_step the categorical channels are frozen
    assert np.allclose(hi[:, :4, 3:7], 0.0)
    assert np.allclose(hi[:, :4, :3], 1.0)   # coords untouched
    assert np.allclose(hi[:, :4, 7:], 1.0)   # charges untouched
    # below it they are rescaled by 1/cat_loss_step
    assert np.allclose(lo[:, :4, 3:7], 2.0)


def test_wrap_velocity_vp_and_hb_paths():
    nm, em = _mask()
    z = jnp.ones((2, 6, 9)) * nm

    def ones(t, z, nmm, emm, ctx, rep, rng, train):
        return jnp.ones_like(z)

    t = 0.5
    m = float(vp_scale(jnp.asarray(t)))
    vp = EquivariantCNF(EFMConfig(in_node_nf=5, discrete_path="VP_path"),
                        ones).wrap_velocity(t, z, nm, em, None, None)
    assert np.allclose(np.asarray(vp[:, :4]), m, rtol=1e-5)
    hb = EquivariantCNF(EFMConfig(in_node_nf=5, discrete_path="HB_path"),
                        ones).wrap_velocity(t, z, nm, em, None, None)
    hb = np.asarray(hb)
    assert np.allclose(hb[:, :4, :3], 1.0)       # coords unscaled
    assert np.allclose(hb[:, :4, 3:], m, rtol=1e-5)  # features scaled


def test_decode_zero_field_is_identity():
    cfg = EFMConfig(in_node_nf=5, ode_steps=8)
    cnf = EquivariantCNF(cfg, _zero_dynamics)
    nm, em = _mask()
    z = cnf.sample_combined_noise(jax.random.PRNGKey(0), 2, 6, nm)
    out = cnf.decode(z, nm, em)
    assert np.allclose(np.asarray(out), np.asarray(z), atol=1e-6)


def test_decode_constant_field_euler_vs_rk4():
    """For a constant field both integrators give z - v exactly."""
    def const(t, z, nm, em, ctx, rep, rng, train):
        return jnp.ones_like(z) * nm

    nm, em = _mask()
    z0 = jnp.ones((2, 6, 9)) * nm
    for method in ["euler", "rk4"]:
        cfg = EFMConfig(in_node_nf=5, ode_steps=10, ode_method=method)
        out = EquivariantCNF(cfg, const).decode(z0, nm, em)
        # dt = -1/N summed N times -> z - 1
        assert np.allclose(np.asarray(out[:, :4]), 0.0, atol=1e-5), method


def test_sample_shapes_masks_and_com():
    cfg = EFMConfig(in_node_nf=5, include_charges=True, ode_steps=6)

    def dyn(t, z, nm, em, ctx, rep, rng, train):
        return z * 0.1  # linear contraction field

    cnf = EquivariantCNF(cfg, dyn)
    nm, em = _mask(b=3, n=6, real=4)
    x, h_cat, h_int = cnf.sample(jax.random.PRNGKey(3), 3, 6, nm, em)
    assert x.shape == (3, 6, 3)
    assert h_cat.shape == (3, 6, 4)
    assert h_int.shape == (3, 6, 1)
    # padded nodes zero; one-hot rows sum to mask; coords zero-CoM
    assert np.allclose(np.asarray(x[:, 4:]), 0.0)
    assert np.allclose(np.asarray(h_cat.sum(-1)), np.asarray(nm[..., 0]))
    assert np.allclose(np.asarray((x * nm).sum(axis=1)), 0.0, atol=1e-4)


def test_sample_gradient_refinement_runs():
    cfg = EFMConfig(in_node_nf=5, ode_steps=4, sampling_method="gradient",
                    gradient_refine_steps=5)

    def dyn(t, z, nm, em, ctx, rep, rng, train):
        return -z * 0.2

    nm, em = _mask()
    x, _, _ = EquivariantCNF(cfg, dyn).sample(jax.random.PRNGKey(0), 2, 6,
                                              nm, em)
    assert np.all(np.isfinite(np.asarray(x)))


@pytest.mark.slow
def test_trainer_fm_steps_decrease_loss():
    cfg = MoleculeEDMConfig(
        num_atom_types=4, max_nodes=8, hidden_nf=32, n_layers=1,
        inv_sublayers=1, rep_nf=None, batch_size=8,
        probabilistic_model="fm",
        efm=EFMConfig(ode_steps=4))
    trainer = MoleculeEDMTrainer(cfg)
    state = trainer.init_state()
    batch = trainer.synthetic_batch(jax.random.PRNGKey(0))
    batch = jax.device_put(batch, trainer.batch_sharding)
    losses = []
    with trainer.mesh:
        for i in range(8):
            state, metrics = trainer.train_step(state, batch,
                                                jax.random.PRNGKey(i))
            losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses)), losses
    assert losses[-1] < losses[0], losses


@pytest.mark.slow
def test_trainer_fm_sample():
    cfg = MoleculeEDMConfig(
        num_atom_types=4, max_nodes=8, hidden_nf=32, n_layers=1,
        inv_sublayers=1, rep_nf=None, batch_size=4,
        probabilistic_model="fm", efm=EFMConfig(ode_steps=3))
    trainer = MoleculeEDMTrainer(cfg)
    state = trainer.init_state()
    b = trainer.synthetic_batch(jax.random.PRNGKey(0), 4)
    x, h_cat, h_int = trainer.sample(state.params, jax.random.PRNGKey(1), 4,
                                     b["node_mask"], b["edge_mask"])
    assert x.shape == (4, 8, 3)
    assert h_cat.shape == (4, 8, 4)
    assert np.all(np.isfinite(np.asarray(x)))
    # deterministic under the same key
    x2, _, _ = trainer.sample(state.params, jax.random.PRNGKey(1), 4,
                              b["node_mask"], b["edge_mask"])
    assert np.allclose(np.asarray(x), np.asarray(x2))


@pytest.mark.slow
def test_decode_equivariance_with_egnn_dynamics():
    """EFM decoding with the EGNN field is E(3)-equivariant: rotating the
    initial coords rotates the decoded coords, features unchanged."""
    import numpy as np

    from reed_tpu.models.egnn import EGNNDynamics

    model = EGNNDynamics(in_node_nf=5, hidden_nf=16, n_layers=1,
                         inv_sublayers=1, attention=True, tanh=True,
                         rep_nf=None, rep_dropout_prob=0.0)
    nm, em = _mask(b=2, n=6, real=5)
    rng = jax.random.PRNGKey(0)
    z = jax.random.normal(rng, (2, 6, 8)) * nm
    zx = z[:, :, :3]
    zx = zx - (zx * nm).sum(1, keepdims=True) / nm.sum(1, keepdims=True)
    z = jnp.concatenate([zx * nm, z[:, :, 3:]], axis=-1)
    params = model.init({"params": rng}, jnp.zeros((2,)), z, nm, em,
                        train=False)["params"]

    def dyn(t, zz, nmm, emm, ctx, rep, rngg, train):
        return model.apply({"params": params}, t, zz, nmm, emm, train=False)

    cfg = EFMConfig(in_node_nf=5, ode_steps=5)
    cnf = EquivariantCNF(cfg, dyn)

    theta = 0.7
    rot = jnp.array([[np.cos(theta), -np.sin(theta), 0],
                     [np.sin(theta), np.cos(theta), 0],
                     [0, 0, 1.0]])
    out = cnf.decode(z, nm, em)
    z_rot = jnp.concatenate([jnp.einsum("ij,bnj->bni", rot, z[:, :, :3]),
                             z[:, :, 3:]], axis=-1) * nm
    out_rot = cnf.decode(z_rot, nm, em)
    np.testing.assert_allclose(
        np.asarray(out_rot[:, :, :3]),
        np.asarray(jnp.einsum("ij,bnj->bni", rot, out[:, :, :3]) * nm),
        atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_rot[:, :, 3:]),
                               np.asarray(out[:, :, 3:]), atol=1e-4)

"""Molecule EDM: schedules, equivariance, masking, loss, sampling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reed_tpu.diffusion.edm import (
    EDMConfig,
    EnVariationalDiffusion,
    cosine_beta_schedule,
    make_gamma_table,
    polynomial_schedule,
    sample_center_gravity_zero_gaussian_with_mask,
)
from reed_tpu.models.egnn import remove_mean_with_mask
from reed_tpu.train.molecule_edm import (
    MoleculeEDMConfig,
    MoleculeEDMTrainer,
    build_dynamics,
    random_rotation,
)

TINY = MoleculeEDMConfig(
    num_atom_types=4, max_nodes=8, hidden_nf=32, n_layers=2, inv_sublayers=1,
    rep_nf=16, batch_size=4,
    edm=EDMConfig(timesteps=50, in_node_nf=5, noise_schedule="polynomial_2"),
)


def test_gamma_table_monotonic():
    g = make_gamma_table("polynomial_2", 1000)
    assert g.shape == (1001,)
    assert np.all(np.diff(g) > 0)  # gamma increases with t (SNR decreases)
    g = make_gamma_table("cosine", 100)
    assert np.all(np.diff(g) > 0)


def test_schedules_range():
    a2 = polynomial_schedule(100)
    assert a2[0] > 0.99 and a2[-1] < 0.01
    a2 = cosine_beta_schedule(100)
    assert a2[0] > 0.9 and a2[-1] < 0.05


def test_zero_com_noise():
    rng = jax.random.PRNGKey(0)
    mask = jnp.ones((2, 6, 1))
    z = sample_center_gravity_zero_gaussian_with_mask(rng, (2, 6, 3), mask)
    assert np.allclose(np.asarray(z.sum(axis=1)), 0.0, atol=1e-5)


def test_remove_mean_respects_mask():
    rng = jax.random.PRNGKey(0)
    mask = jnp.array([[1, 1, 1, 0]], jnp.float32)[..., None]
    x = jax.random.normal(rng, (1, 4, 3))
    out = remove_mean_with_mask(x * mask, mask)
    assert np.allclose(np.asarray(out[0, 3]), 0.0)
    assert np.allclose(np.asarray(out.sum(axis=1)), 0.0, atol=1e-5)


def _tiny_model_and_batch():
    trainer = MoleculeEDMTrainer(TINY.__class__(
        **{**TINY.__dict__, "mesh": TINY.mesh.__class__(data=1)}))
    state = trainer.init_state()
    batch = trainer.synthetic_batch(jax.random.PRNGKey(3), 4)
    return trainer, state, batch


@pytest.mark.slow
def test_egnn_equivariance():
    """Rotating inputs rotates velocity output; features invariant."""
    cfg = TINY
    model = build_dynamics(cfg)
    trainer = MoleculeEDMTrainer(cfg.__class__(
        **{**cfg.__dict__, "mesh": cfg.mesh.__class__(data=1)}))
    batch = trainer.synthetic_batch(jax.random.PRNGKey(0), 2)
    xh = jnp.concatenate([batch["positions"], batch["one_hot"],
                          batch["charges"]], axis=-1)
    variables = model.init({"params": jax.random.PRNGKey(1),
                            "rep_dropout": jax.random.PRNGKey(2)},
                           jnp.zeros((2,)), xh, batch["node_mask"],
                           batch["edge_mask"], rep=batch["rep"], train=False)

    out = model.apply(variables, jnp.full((2,), 0.5), xh, batch["node_mask"],
                      batch["edge_mask"], rep=batch["rep"], train=False)

    rot_x = random_rotation(jax.random.PRNGKey(7),
                            batch["positions"]) * batch["node_mask"]
    xh_rot = jnp.concatenate([rot_x, batch["one_hot"], batch["charges"]],
                             axis=-1)
    out_rot = model.apply(variables, jnp.full((2,), 0.5), xh_rot,
                          batch["node_mask"], batch["edge_mask"],
                          rep=batch["rep"], train=False)
    # rotate the velocity part of `out` with the same rotation
    vel_rotated = random_rotation(jax.random.PRNGKey(7), out[:, :, :3])
    assert np.allclose(np.asarray(out_rot[:, :, :3]),
                       np.asarray(vel_rotated * batch["node_mask"]),
                       atol=1e-3)
    # invariant features unchanged
    assert np.allclose(np.asarray(out_rot[:, :, 3:]),
                       np.asarray(out[:, :, 3:]), atol=1e-3)


@pytest.mark.slow
def test_edm_loss_finite_and_masked():
    trainer, state, batch = _tiny_model_and_batch()
    with trainer.mesh:
        state, metrics = trainer.train_step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))


@pytest.mark.slow
def test_edm_train_loss_decreases():
    trainer, state, batch = _tiny_model_and_batch()
    losses = []
    with trainer.mesh:
        for _ in range(6):
            state, metrics = trainer.train_step(state, batch,
                                                jax.random.PRNGKey(1))
            losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]


@pytest.mark.slow
def test_edm_sampling_shapes_and_com():
    trainer, state, batch = _tiny_model_and_batch()
    x, h_cat, h_int = trainer.sample(
        jax.device_get(state.params) and state.params, jax.random.PRNGKey(2),
        4, batch["node_mask"], batch["edge_mask"], rep=batch["rep"])
    assert x.shape == (4, TINY.max_nodes, 3)
    assert h_cat.shape == (4, TINY.max_nodes, TINY.num_atom_types)
    # center of mass ~ 0 and masked nodes zero
    assert np.allclose(np.asarray(x.sum(axis=1)), 0.0, atol=1e-3)
    assert np.allclose(np.asarray(x * (1 - batch["node_mask"])), 0.0)
    # one-hot valid
    sums = np.asarray(h_cat.sum(-1))
    nm = np.asarray(batch["node_mask"][..., 0])
    assert np.allclose(sums * nm, nm)


@pytest.mark.slow
def test_edm_cfg_sampling_runs():
    trainer, state, batch = _tiny_model_and_batch()
    x, h_cat, h_int = trainer.sample(state.params, jax.random.PRNGKey(2), 4,
                                     batch["node_mask"], batch["edge_mask"],
                                     rep=batch["rep"], cfg_scale=1.5)
    assert np.all(np.isfinite(np.asarray(x)))


def test_gamma_network_monotonic_and_pinned():
    from reed_tpu.diffusion.edm import GammaNetwork

    params = jax.tree.map(jnp.asarray, GammaNetwork.init_params(hidden=32))
    t = jnp.linspace(0, 1, 64)
    g = GammaNetwork.apply(params, t)
    assert np.all(np.diff(np.asarray(g)) >= -1e-5)  # monotone increasing
    assert float(g[0]) == pytest.approx(-5.0, abs=1e-4)
    assert float(g[-1]) == pytest.approx(10.0, abs=1e-4)


@pytest.mark.slow
def test_edm_with_learned_gamma():
    from reed_tpu.diffusion.edm import EnVariationalDiffusion, GammaNetwork

    gparams = jax.tree.map(jnp.asarray, GammaNetwork.init_params(hidden=16))
    cfg = EDMConfig(timesteps=20, in_node_nf=5, loss_type="vlb")
    edm = EnVariationalDiffusion(
        cfg, lambda t, z, nm, em, c, r, rng, train: jnp.zeros_like(z),
        gamma_fn=lambda t: GammaNetwork.apply(gparams, t))
    mask = jnp.ones((2, 4, 1))
    diag = jnp.eye(4)[None, :, :, None]
    em = mask[:, :, None] * mask[:, None] * (1 - diag)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 4, 3))
    from reed_tpu.models.egnn import remove_mean_with_mask

    x = remove_mean_with_mask(x, mask)
    h_cat = jax.nn.one_hot(jnp.zeros((2, 4), jnp.int32), 4) * mask
    h_int = jnp.ones((2, 4, 1)) * mask
    nll, _ = edm.loss(rng, x, h_cat, h_int, mask, em, train=False)
    assert np.all(np.isfinite(np.asarray(nll)))


def test_gcl_factored_matches_direct_concat():
    """GCL's sliced-kernel edge_fc1 equals the direct Dense-on-concat
    ([h_i, h_j, edge_attr]) formula (egnn_new.py:6-68)."""
    import numpy as np

    from reed_tpu.models.egnn import GCL

    rng = jax.random.PRNGKey(11)
    b, n, d, e = 2, 7, 8, 2
    h = jax.random.normal(jax.random.fold_in(rng, 0), (b, n, d))
    edge_attr = jax.random.normal(jax.random.fold_in(rng, 1), (b, n, n, e))
    node_mask = jnp.ones((b, n, 1))
    edge_mask = jnp.ones((b, n, n, 1))
    layer = GCL(hidden_nf=d, attention=True)
    variables = layer.init(jax.random.PRNGKey(2), h, edge_attr, node_mask,
                           edge_mask)
    out = layer.apply(variables, h, edge_attr, node_mask, edge_mask)

    w1 = variables["params"]["edge_fc1"]["kernel"]
    b1 = variables["params"]["edge_fc1"]["bias"]
    h_i = jnp.broadcast_to(h[:, :, None, :], (b, n, n, d))
    h_j = jnp.broadcast_to(h[:, None, :, :], (b, n, n, d))
    direct = jnp.concatenate([h_i, h_j, edge_attr], axis=-1) @ w1 + b1
    factored = ((h @ w1[:d])[:, :, None, :] + (h @ w1[d:2 * d])[:, None, :, :]
                + edge_attr @ w1[2 * d:] + b1)
    np.testing.assert_allclose(np.asarray(factored), np.asarray(direct),
                               atol=1e-5)
    assert out.shape == (b, n, d)
    assert np.all(np.isfinite(np.asarray(out)))

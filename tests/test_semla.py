"""SemlaFlow path: interpolant/OT, Semla model equivariance, losses,
training step, generation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reed_tpu.core.config import MeshConfig, OptimConfig
from reed_tpu.diffusion.molecule_fm import (
    IntegratorConfig,
    MoleculeInterpolantConfig,
    MoleculePriorConfig,
    interpolate_batch,
    kabsch_rotation,
    match_mol,
    sample_prior_batch,
)
from reed_tpu.models.semla import zero_com
from reed_tpu.train.molecule_semla import SemlaTrainConfig, SemlaTrainer

TINY = SemlaTrainConfig(
    vocab_size=6, n_bond_types=4, n_charge_types=3, max_atoms=16,
    d_model=32, d_message=16, n_layers=4, n_coord_sets=8,
    d_message_hidden=16, d_edge=16, n_attn_heads=4, size_emb=8,
    d_rep=12, cond_type="cross_attn", rep_alignment=True, align_depth=(1,),
    integrator=IntegratorConfig(steps=8, type_strategy="uniform-sample",
                                bond_strategy="uniform-sample"),
    interpolant=MoleculeInterpolantConfig(
        prior=MoleculePriorConfig(vocab_size=6, n_bond_types=4)),
    batch_size=4, optim=OptimConfig(lr=1e-3, grad_clip=1.0),
    mesh=MeshConfig(data=1),
)


def test_kabsch_exact_recovery():
    rng = np.random.default_rng(0)
    p = rng.standard_normal((10, 3))
    p -= p.mean(0)
    # random rotation via QR
    q_mat, _ = np.linalg.qr(rng.standard_normal((3, 3)))
    if np.linalg.det(q_mat) < 0:
        q_mat[:, 0] *= -1
    q = p @ q_mat.T
    rot = kabsch_rotation(p, q)
    assert np.allclose(p @ rot.T, q, atol=1e-8)


def test_match_mol_reduces_cost():
    rng = np.random.default_rng(0)
    to_c = rng.standard_normal((8, 3)).astype(np.float32)
    to_c -= to_c.mean(0)
    from_c = rng.standard_normal((8, 3)).astype(np.float32)
    from_c -= from_c.mean(0)
    matched = match_mol(from_c.copy(), to_c, equivariant=True)
    before = ((from_c - to_c) ** 2).sum(-1).mean()
    after = ((matched - to_c) ** 2).sum(-1).mean()
    assert after <= before + 1e-6


def test_prior_batch_masked_and_zero_com():
    rng = np.random.default_rng(0)
    mask = np.ones((2, 10), np.float32)
    mask[1, 6:] = 0
    prior = sample_prior_batch(rng, TINY.interpolant.prior, mask)
    assert np.allclose((prior["coords"] * mask[..., None]).sum(1), 0, atol=1e-5)
    assert np.allclose(prior["coords"][1, 6:], 0)
    # bonds symmetric
    assert np.allclose(prior["bonds"], prior["bonds"].transpose(0, 2, 1, 3))


def test_interpolation_endpoints():
    rng = np.random.default_rng(0)
    trainer_cfg = TINY
    mask = np.ones((2, 8), np.float32)
    data = {
        "coords": rng.standard_normal((2, 8, 3)).astype(np.float32),
        "atomics": np.eye(6, dtype=np.float32)[rng.integers(0, 6, (2, 8))],
        "bonds": np.eye(4, dtype=np.float32)[np.zeros((2, 8, 8), int)],
        "charges": np.eye(3, dtype=np.float32)[np.zeros((2, 8), int)],
        "mask": mask,
    }
    cfg1 = MoleculeInterpolantConfig(
        prior=trainer_cfg.interpolant.prior, fixed_time=1.0)
    _, interp, times = interpolate_batch(rng, cfg1, data)
    # at t=1 the interpolated batch equals the data
    assert np.allclose(interp["coords"], data["coords"] * mask[..., None],
                       atol=1e-5)
    assert np.allclose(interp["atomics"], data["atomics"])


def _trainer():
    return SemlaTrainer(TINY)


@pytest.mark.slow
def test_semla_train_step_decreases():
    trainer = _trainer()
    state = trainer.init_state()
    batch = jax.tree.map(jnp.asarray, trainer.example_batch(4, 12, seed=1))
    losses = []
    with trainer.mesh:
        for _ in range(6):
            state, metrics = trainer.train_step(state, batch,
                                                jax.random.PRNGKey(0))
            losses.append(float(metrics["loss"]))
    assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0]


@pytest.mark.slow
def test_coord_attention_factored_matches_direct():
    """The factored gram-trick update (no [B,3,N,N,P] tensor) must match
    the direct pairwise-difference formula to f32 reassociation error,
    including zero-coordinate (masked/fake) nodes and a masked-out pair."""
    from reed_tpu.models.semla import _coord_attention_updates, safe_norm

    rng = np.random.default_rng(0)
    b, n, p, eps = 3, 10, 4, 1e-6
    proj = jnp.asarray(rng.standard_normal((b, n, 3, p)), jnp.float32)
    # last two nodes sit exactly at zero (padded atoms)
    proj = proj.at[:, -2:].set(0.0)
    logits = jnp.asarray(rng.standard_normal((b, n, n, p)), jnp.float32)
    attn = jax.nn.softmax(logits, axis=2)

    vec = proj[:, :, None, :, :] - proj[:, None, :, :, :]   # [B,i,j,3,P]
    lengths = safe_norm(vec, axis=3, keepdims=True)
    direct = jnp.einsum("bijdp,bijp->bidp", vec / (lengths + eps), attn)

    factored = _coord_attention_updates(proj, attn, eps)
    np.testing.assert_allclose(np.asarray(factored), np.asarray(direct),
                               rtol=2e-4, atol=2e-5)


def test_semla_model_equivariance():
    """Predicted coords rotate with input; type logits invariant."""
    trainer = _trainer()
    state = trainer.init_state()
    batch = jax.tree.map(jnp.asarray, trainer.example_batch(2, 8, seed=2))
    interp = batch["interpolated"]
    cond = {"coords": jnp.zeros_like(interp["coords"]),
            "atomics": jnp.zeros_like(interp["atomics"]),
            "bonds": jnp.zeros_like(interp["bonds"])}

    def fwd(coords):
        return trainer.model.apply(
            {"params": state.params}, coords, interp["atomics"],
            edge_feats=interp["bonds"], cond_coords=cond["coords"],
            cond_atomics=cond["atomics"], cond_bonds=cond["bonds"],
            atom_mask=interp["mask"], rep=batch["rep"], times=batch["times"])

    out = fwd(interp["coords"])
    theta = 0.7
    rot = jnp.array([[np.cos(theta), -np.sin(theta), 0],
                     [np.sin(theta), np.cos(theta), 0],
                     [0, 0, 1.0]], jnp.float32)
    coords_rot = jnp.einsum("ij,bnj->bni", rot, interp["coords"])
    out_rot = fwd(coords_rot)
    pred_rot = jnp.einsum("ij,bnj->bni", rot, out[0])
    assert np.allclose(np.asarray(out_rot[0]), np.asarray(pred_rot), atol=2e-3)
    assert np.allclose(np.asarray(out_rot[1]), np.asarray(out[1]), atol=2e-3)


@pytest.mark.slow
def test_semla_generation_runs():
    trainer = _trainer()
    state = trainer.init_state()
    rng_np = np.random.default_rng(0)
    mask = np.ones((2, 8), np.float32)
    prior = trainer.sample_prior(rng_np, mask)
    out = trainer.generate(state.params, jax.random.PRNGKey(0), prior,
                           rep=jnp.asarray(
                               rng_np.standard_normal((2, 12)).astype(
                                   np.float32)))
    assert out["coords"].shape == (2, 8, 3)
    assert np.all(np.isfinite(np.asarray(out["coords"])))
    # atomics are probabilities
    assert np.allclose(np.asarray(out["atomics"].sum(-1)), 1.0, atol=1e-4)


def test_integrator_mask_strategy_unmasks():
    from reed_tpu.diffusion.molecule_fm import IntegratorConfig, integrator_step

    cfg = IntegratorConfig(steps=10, type_strategy="mask",
                           bond_strategy="mask", type_mask_index=0,
                           bond_mask_index=0)
    b, n, v, e = 2, 6, 5, 4
    rng = jax.random.PRNGKey(0)
    mask = jnp.ones((b, n))
    curr = {
        "coords": jnp.zeros((b, n, 3)),
        "atomics": jax.nn.one_hot(jnp.zeros((b, n), jnp.int32), v),  # masked
        "bonds": jax.nn.one_hot(jnp.zeros((b, n, n), jnp.int32), e),
        "mask": mask,
    }
    predicted = {
        "coords": jnp.ones((b, n, 3)),
        "atomics": jax.nn.one_hot(jnp.full((b, n), 2, jnp.int32), v),
        "bonds": jax.nn.one_hot(jnp.full((b, n, n), 1, jnp.int32), e),
    }
    prior = curr
    # large step size from t=0 -> everything unmasks to the prediction
    out = integrator_step(rng, cfg, curr, predicted, prior,
                          jnp.zeros((b,)), step_size=0.99)
    assert float((out["atomics"].argmax(-1) == 2).mean()) > 0.9
    assert out["coords"].shape == (b, n, 3)


@pytest.mark.parametrize("strategy", ["uniform-sample", "mask", "dirichlet"])
def test_integrator_keeps_bonds_symmetric(strategy):
    """Training states are always bond-symmetric (sample_prior_batch /
    interpolate_batch symmetrize), so integrated states must stay on that
    manifold: independent ij/ji draws were measured to corrupt semla
    generation (teacher-forced t0=0.95 starts degraded to atom_stable
    0.47, round-4 chains diagnosis)."""
    from reed_tpu.diffusion.molecule_fm import (IntegratorConfig,
                                                MoleculePriorConfig,
                                                integrator_step,
                                                sample_prior_batch)

    mask_idx = 0 if strategy == "mask" else None
    cfg = IntegratorConfig(steps=10, type_strategy=strategy,
                           bond_strategy=strategy, cat_noise_level=0.2,
                           type_mask_index=mask_idx, bond_mask_index=mask_idx)
    b, n, v, e = 3, 7, 5, 4
    prior_np = sample_prior_batch(
        np.random.default_rng(0),
        MoleculePriorConfig(vocab_size=v, n_bond_types=e,
                            type_noise=("mask" if strategy == "mask"
                                        else "uniform-sample"),
                            bond_noise=("mask" if strategy == "mask"
                                        else "uniform-sample"),
                            type_mask_index=mask_idx,
                            bond_mask_index=mask_idx),
        np.ones((b, n), np.float32))
    curr = {k: jnp.asarray(val) for k, val in prior_np.items()}
    r = np.random.default_rng(1)
    pred_bonds = jnp.asarray(r.dirichlet(np.ones(e), size=(b, n, n)),
                             jnp.float32)
    pred_bonds = 0.5 * (pred_bonds + jnp.swapaxes(pred_bonds, 1, 2))
    predicted = {
        "coords": jnp.asarray(r.standard_normal((b, n, 3)), jnp.float32),
        "atomics": jnp.asarray(r.dirichlet(np.ones(v), size=(b, n)),
                               jnp.float32),
        "bonds": pred_bonds,
    }
    out = curr
    for i in range(5):
        out = integrator_step(jax.random.PRNGKey(i), cfg, out, predicted,
                              curr, jnp.full((3,), 0.1 + 0.1 * i),
                              step_size=0.1)
        bonds = np.asarray(out["bonds"])
        np.testing.assert_allclose(bonds, bonds.swapaxes(1, 2), atol=1e-6,
                                   err_msg=f"asymmetric after step {i}")


def test_coord_skip_is_param_neutral_residual():
    """coord_skip=True adds NO parameters (converted checkpoints are
    unaffected) and, with identical params, shifts the predicted coords by
    exactly zero_com(input coords) — i.e. it is a pure residual
    reparameterization of the head."""
    from reed_tpu.models.semla import SemlaGenerator, zero_com

    kwargs = dict(d_model=32, vocab_size=5, n_atom_feats=5, d_edge=16,
                  n_edge_types=4, self_cond=False, size_emb=8, max_atoms=9,
                  n_charge_types=7, rep_alignment=False, d_message=16,
                  n_coord_sets=8, n_layers=3, n_attn_heads=4,
                  d_message_hidden=16, d_rep=None)
    base = SemlaGenerator(**kwargs)
    skip = SemlaGenerator(coord_skip=True, **kwargs)
    b, n = 2, 9
    r = np.random.default_rng(3)
    coords = jnp.asarray(r.standard_normal((b, n, 3)), jnp.float32)
    feats = jnp.asarray(r.dirichlet(np.ones(5), size=(b, n)), jnp.float32)
    bonds = jnp.asarray(r.dirichlet(np.ones(4), size=(b, n, n)), jnp.float32)
    mask = jnp.ones((b, n), jnp.float32)
    params = base.init(jax.random.PRNGKey(0), coords, feats,
                       edge_feats=bonds, atom_mask=mask)["params"]
    params_skip = skip.init(jax.random.PRNGKey(0), coords, feats,
                            edge_feats=bonds, atom_mask=mask)["params"]
    assert (jax.tree.structure(params) == jax.tree.structure(params_skip))
    out_base = base.apply({"params": params}, coords, feats,
                          edge_feats=bonds, atom_mask=mask)[0]
    out_skip = skip.apply({"params": params}, coords, feats,
                          edge_feats=bonds, atom_mask=mask)[0]
    np.testing.assert_allclose(np.asarray(out_skip - out_base),
                               np.asarray(zero_com(coords, mask)),
                               atol=1e-5)


def test_integrator_linear_strategy_moves_toward_prediction():
    from reed_tpu.diffusion.molecule_fm import IntegratorConfig, integrator_step

    cfg = IntegratorConfig(steps=10, type_strategy="linear",
                           bond_strategy="linear")
    b, n, v, e = 1, 4, 5, 4
    rng = jax.random.PRNGKey(0)
    uniform = jnp.full((b, n, v), 1.0 / v)
    curr = {"coords": jnp.zeros((b, n, 3)), "atomics": uniform,
            "bonds": jnp.full((b, n, n, e), 1.0 / e),
            "mask": jnp.ones((b, n))}
    target = jax.nn.one_hot(jnp.full((b, n), 3, jnp.int32), v)
    predicted = {"coords": jnp.ones((b, n, 3)), "atomics": target,
                 "bonds": jnp.full((b, n, n, e), 1.0 / e)}
    out = integrator_step(rng, cfg, curr, predicted, curr,
                          jnp.zeros((b,)), step_size=0.5)
    # mass on class 3 increased
    assert float(out["atomics"][..., 3].mean()) > 1.0 / v


@pytest.mark.slow
def test_full_size_molecule_no_nan():
    """A molecule whose size equals max_atoms must not NaN: the size
    embedding table is max_atoms+1 entries (out-of-range jnp.take fills
    NaN; regression for the n_atoms == max_atoms edge)."""
    import jax

    from reed_tpu.core.config import MeshConfig
    from reed_tpu.train.molecule_semla import SemlaTrainConfig, SemlaTrainer

    cfg = SemlaTrainConfig(max_atoms=8, batch_size=4, d_model=32,
                           d_message=16, n_layers=1, n_coord_sets=4,
                           d_message_hidden=16, d_edge=16, n_attn_heads=4,
                           size_emb=8, d_rep=8, mesh=MeshConfig(data=1))
    trainer = SemlaTrainer(cfg)
    state = trainer.init_state()
    batch = trainer.example_batch(4, max_n=8, seed=3)
    # force every molecule to the full max_atoms size via all-ones masks
    import numpy as np

    def force_mask(d):
        out = {}
        for k, v in d.items():
            if isinstance(v, dict):
                out[k] = force_mask(v)
            elif k == "mask":
                out[k] = np.ones_like(np.asarray(v))
            else:
                out[k] = v
        return out

    batch = force_mask(batch)
    batch = jax.device_put(batch, trainer.batch_sharding)
    with trainer.mesh:
        state, metrics = trainer.train_step(state, batch,
                                            jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"])), metrics

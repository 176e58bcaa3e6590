"""Two-stage sampling wrapper + replicate evaluation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reed_tpu.eval.molecule_metrics import MoleculeMetrics
from reed_tpu.eval.rep_samplers import GtSampler
from reed_tpu.eval.two_stage import (
    TwoStageSampler,
    evaluate_replicates,
    molecules_from_samples,
)

WATER_POS = np.array([[0.0, 0.0, 0.0], [0.96, 0.0, 0.0],
                      [-0.24, 0.93, 0.0]], np.float32)


def test_two_stage_sampler_plumbs_reps():
    rng_np = np.random.default_rng(0)
    reps = rng_np.standard_normal((20, 8)).astype(np.float32)
    sampler = GtSampler(reps, np.full(20, 3))
    seen = {}

    def mol_sampler(rng, node_mask, edge_mask, rep):
        seen["rep"] = rep
        seen["node_mask"] = node_mask
        b, n = node_mask.shape[:2]
        x = jnp.zeros((b, n, 3))
        h_cat = jax.nn.one_hot(jnp.zeros((b, n), jnp.int32), 5)
        return x, h_cat, jnp.zeros((b, n, 1))

    ts = TwoStageSampler(sampler, mol_sampler)
    x, h_cat, h_int, node_mask = ts.sample(jax.random.PRNGKey(0),
                                           np.array([3, 3]), max_nodes=5,
                                           np_rng=rng_np)
    assert seen["rep"].shape == (2, 8)
    assert x.shape == (2, 5, 3)
    assert np.allclose(np.asarray(node_mask[..., 0]),
                       [[1, 1, 1, 0, 0], [1, 1, 1, 0, 0]])


def test_molecules_from_samples_strips_padding():
    x = jnp.asarray(np.tile(WATER_POS[None], (1, 1, 1)))
    x = jnp.pad(x, ((0, 0), (0, 2), (0, 0)))
    h_cat = jax.nn.one_hot(jnp.array([[3, 0, 0, 0, 0]]), 5)
    node_mask = jnp.array([[1, 1, 1, 0, 0]], jnp.float32)[..., None]
    mols = molecules_from_samples(x, h_cat, node_mask)
    assert len(mols) == 1
    pos, types = mols[0]
    assert pos.shape == (3, 3) and list(types) == [3, 0, 0]


def test_evaluate_replicates_aggregates():
    mols = [(WATER_POS, np.array([3, 0, 0]))]

    out = evaluate_replicates(lambda r: mols, MoleculeMetrics(),
                              n_replicates=3)
    assert out["mean"]["mol_stable"] == 1.0
    assert out["std"]["mol_stable"] == 0.0
    assert len(out["all"]["validity"]) == 3


@pytest.mark.slow
def test_fid_pixel_npz_with_vae_decode(tmp_path):
    """generate_samples + VAE decode_fn writes 8x-upsampled uint8 pixels
    (the ADM-suite contract, reference image/generate.py:156-171)."""
    import jax
    import numpy as np

    from reed_tpu.eval.fid import (FIDGenConfig, generate_samples,
                                   make_vae_decode_fn)

    latent = 4
    cfg = FIDGenConfig(num_samples=2, batch_size=2, num_classes=4,
                       latent_size=latent, latent_channels=4, mode="ode",
                       num_steps=2, seed=0)

    def model_fn(params, x, t, y):
        return -x  # trivial contraction field

    decode_fn = make_vae_decode_fn(None, latent_size=latent,
                                   _random_init_for_tests=True)
    out = str(tmp_path / "samples.npz")
    samples = generate_samples(model_fn, {}, cfg, decode_fn=decode_fn,
                               out_npz=out)
    assert samples.shape == (2, latent * 8, latent * 8, 3)
    assert samples.dtype == np.uint8
    z = np.load(out)
    assert z["arr_0"].shape == (2, latent * 8, latent * 8, 3)


def test_vae_params_npz_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from reed_tpu.eval.fid import load_params_npz, save_params_npz

    tree = {"params": {"a": np.ones((2, 3), np.float32),
                       "b": {"c": np.zeros((4,), np.float32)}}}
    p = str(tmp_path / "p.npz")
    save_params_npz(p, tree)
    back = load_params_npz(p)
    assert set(back["params"]) == {"a", "b"}
    assert np.allclose(back["params"]["b"]["c"], 0)

"""TorchMD-ET JAX encoder: invariance/equivariance and masking."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reed_tpu.encoders.torchmd_et import (
    ExpNormalSmearing,
    FradEncoder,
    TorchMDET,
    cosine_cutoff,
)


def _random_rot(seed=0):
    q, _ = np.linalg.qr(np.random.default_rng(seed).standard_normal((3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    return jnp.asarray(q, jnp.float32)


def _inputs(seed=0, b=2, n=7):
    rng = np.random.default_rng(seed)
    z = jnp.asarray(rng.integers(1, 10, (b, n)))
    pos = jnp.asarray(rng.standard_normal((b, n, 3)).astype(np.float32) * 2)
    mask = jnp.ones((b, n), jnp.float32)
    return z, pos, mask


def test_cutoff_and_rbf():
    d = jnp.array([0.0, 2.5, 4.99, 5.01, 10.0])
    c = cosine_cutoff(d, 5.0)
    assert float(c[0]) == pytest.approx(1.0)
    assert float(c[3]) == 0.0 and float(c[4]) == 0.0
    rbf = ExpNormalSmearing(num_rbf=8)
    variables = rbf.init(jax.random.PRNGKey(0), d)
    out = rbf.apply(variables, d)
    assert out.shape == (5, 8)
    assert np.allclose(np.asarray(out[3:]), 0.0)  # beyond cutoff


@pytest.mark.slow
def test_et_scalar_invariance_vector_equivariance():
    z, pos, mask = _inputs()
    model = TorchMDET(hidden=32, num_layers=2, num_rbf=16, num_heads=4)
    variables = model.init(jax.random.PRNGKey(0), z, pos, mask)
    x, vec = model.apply(variables, z, pos, mask)
    rot = _random_rot()
    x_r, vec_r = model.apply(variables, z,
                             jnp.einsum("ij,bnj->bni", rot, pos), mask)
    assert np.allclose(np.asarray(x_r), np.asarray(x), atol=1e-4)
    # vec transforms as a vector: vec_r == rot @ vec
    vec_rot = jnp.einsum("ij,bnjh->bnih", rot, vec)
    assert np.allclose(np.asarray(vec_r), np.asarray(vec_rot), atol=1e-4)
    # translation invariance
    x_t, _ = model.apply(variables, z, pos + 7.0, mask)
    assert np.allclose(np.asarray(x_t), np.asarray(x), atol=1e-4)


@pytest.mark.slow
def test_masking_isolates_fake_atoms():
    z, pos, _ = _inputs(b=1, n=6)
    mask = jnp.array([[1, 1, 1, 1, 0, 0]], jnp.float32)
    model = TorchMDET(hidden=16, num_layers=1, num_rbf=8, num_heads=2)
    variables = model.init(jax.random.PRNGKey(0), z, pos, mask)
    x1, _ = model.apply(variables, z, pos, mask)
    # perturb masked atom positions: real-atom features unchanged
    pos2 = pos.at[0, 4:].add(100.0)
    x2, _ = model.apply(variables, z, pos2, mask)
    assert np.allclose(np.asarray(x1[0, :4]), np.asarray(x2[0, :4]),
                       atol=1e-5)


def test_frad_global_rep():
    z, pos, mask = _inputs()
    enc = FradEncoder(et=TorchMDET(hidden=16, num_layers=1, num_rbf=8,
                                   num_heads=2))
    variables = enc.init(jax.random.PRNGKey(0), z, pos, mask)
    rep = enc.apply(variables, z, pos, mask)
    assert rep.shape == (2, 16)
    # permutation invariance of the pooled rep
    perm = np.array([3, 1, 0, 2, 5, 4, 6])
    rep_p = enc.apply(variables, z[:, perm], pos[:, perm], mask[:, perm])
    assert np.allclose(np.asarray(rep), np.asarray(rep_p), atol=1e-4)


def test_torch_checkpoint_file_conversion(tmp_path):
    """Frad-style torch checkpoint file ('representation_model.' prefixes,
    reference torchmdnet/models/model.py load_model) -> strip -> convert ->
    forward runs with the loaded weights."""
    torch = pytest.importorskip("torch")

    from reed_tpu.encoders.torchmd_et import TorchMDET, convert_torchmd_et

    H, R, L, MAXZ = 32, 16, 2, 20
    g = torch.Generator().manual_seed(0)

    def t(*shape):
        return torch.randn(*shape, generator=g) * 0.05

    sd = {
        "embedding.weight": t(MAXZ, H),
        "distance_expansion.means": t(R),
        "distance_expansion.betas": torch.abs(t(R)) + 0.1,
        "out_norm.weight": torch.ones(H), "out_norm.bias": torch.zeros(H),
        "neighbor_embedding.embedding.weight": t(MAXZ, H),
        "neighbor_embedding.distance_proj.weight": t(H, R),
        "neighbor_embedding.distance_proj.bias": t(H),
        "neighbor_embedding.combine.weight": t(H, 2 * H),
        "neighbor_embedding.combine.bias": t(H),
    }
    for i in range(L):
        p = f"attention_layers.{i}"
        sd.update({
            f"{p}.layernorm.weight": torch.ones(H),
            f"{p}.layernorm.bias": torch.zeros(H),
            f"{p}.q_proj.weight": t(H, H), f"{p}.q_proj.bias": t(H),
            f"{p}.k_proj.weight": t(H, H), f"{p}.k_proj.bias": t(H),
            f"{p}.v_proj.weight": t(3 * H, H), f"{p}.v_proj.bias": t(3 * H),
            f"{p}.o_proj.weight": t(3 * H, H), f"{p}.o_proj.bias": t(3 * H),
            f"{p}.vec_proj.weight": t(3 * H, H),
            f"{p}.dk_proj.weight": t(H, R), f"{p}.dk_proj.bias": t(H),
            f"{p}.dv_proj.weight": t(3 * H, R), f"{p}.dv_proj.bias": t(3 * H),
        })
    ckpt_path = str(tmp_path / "frad_qm9.ckpt")
    torch.save({"state_dict": {f"representation_model.{k}": v
                               for k, v in sd.items()}}, ckpt_path)

    loaded = torch.load(ckpt_path, map_location="cpu",
                        weights_only=True)["state_dict"]
    stripped = {k[len("representation_model."):]: v.numpy()
                for k, v in loaded.items()
                if k.startswith("representation_model.")}
    variables = convert_torchmd_et(stripped, num_layers=L)

    model = TorchMDET(hidden=H, num_rbf=R, num_layers=L, max_z=MAXZ,
                      num_heads=4)
    rng = np.random.default_rng(0)
    z = rng.integers(1, MAXZ, (2, 6))
    pos = rng.standard_normal((2, 6, 3)).astype(np.float32)
    mask = np.ones((2, 6), np.float32)
    mask[1, 4:] = 0
    x, vec = model.apply(variables, jnp.asarray(z), jnp.asarray(pos),
                         jnp.asarray(mask))
    assert x.shape == (2, 6, H)
    assert np.isfinite(np.asarray(x)).all()
    # converted embedding actually used: row for z=3 equals the torch row
    emb = variables["params"]["embedding"]["embedding"]
    np.testing.assert_allclose(np.asarray(emb[3]), sd["embedding.weight"][3])

"""SiT backbone: shapes, projector capture, CFG embedding, zero-init output."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reed_tpu.models.sit import SiT, create_sit

TINY = dict(input_size=8, patch_size=2, in_channels=4, hidden_size=32,
            depth=3, num_heads=2, encoder_depth=2, z_dims=(16,),
            z_types=("i",), projector_dim=24, num_classes=10)


def _init(model, train=True):
    x = jnp.zeros((2, 8, 8, 4))
    t = jnp.zeros((2,))
    y = jnp.zeros((2,), jnp.int32)
    rngs = {"params": jax.random.PRNGKey(0),
            "label_dropout": jax.random.PRNGKey(1)}
    variables = model.init(rngs, x, t, y, train=train)
    return variables, (x, t, y)


@pytest.mark.slow
def test_forward_shapes_and_zs():
    model = SiT(**TINY)
    variables, (x, t, y) = _init(model)
    out, zs = model.apply(variables, x, t, y, train=True,
                          rngs={"label_dropout": jax.random.PRNGKey(2)})
    assert out.shape == (2, 8, 8, 4)
    assert len(zs) == 1 and zs[0].shape == (2, 16, 16)  # [B, T, z_dim]


def test_inference_no_zs():
    model = SiT(**TINY)
    variables, (x, t, y) = _init(model)
    out, zs = model.apply(variables, x, t, y, train=False)
    assert zs is None


def test_zero_init_output():
    # final layer is zero-init -> output is exactly 0 at init
    model = SiT(**TINY)
    variables, (x, t, y) = _init(model)
    out, _ = model.apply(variables, jax.random.normal(jax.random.PRNGKey(3),
                                                      x.shape), t, y,
                         train=False)
    assert np.allclose(out, 0.0)


def test_text_projector_pooled():
    model = SiT(**dict(TINY, z_dims=(16, 12), z_types=("i", "t"),
                       encoder_depth=1, encoder_depth_text=3))
    variables, (x, t, y) = _init(model)
    out, zs = model.apply(variables, x, t, y, train=True,
                          rngs={"label_dropout": jax.random.PRNGKey(2)})
    assert zs[0].shape == (2, 16, 16)
    assert zs[1].shape == (2, 12)  # pooled text projection


def test_cfg_null_class_embedding():
    # embedding table has num_classes+1 rows when dropout active
    model = SiT(**TINY)
    variables, _ = _init(model)
    table = variables["params"]["y_embedder"]["Embed_0"]["embedding"]
    assert table.shape[0] == TINY["num_classes"] + 1


def test_label_dropout_changes_output():
    model = SiT(**dict(TINY, class_dropout_prob=1.0))
    variables, (x, t, y) = _init(model)
    xr = jax.random.normal(jax.random.PRNGKey(3), x.shape)
    # with p=1 dropout all labels become the null class -> outputs equal for
    # different labels
    _, zs1 = model.apply(variables, xr, t, jnp.array([0, 1]), train=True,
                         rngs={"label_dropout": jax.random.PRNGKey(2)})
    _, zs2 = model.apply(variables, xr, t, jnp.array([5, 7]), train=True,
                         rngs={"label_dropout": jax.random.PRNGKey(2)})
    assert np.allclose(zs1[0], zs2[0], atol=1e-5)


def test_registry():
    m = create_sit("SiT-S/4", input_size=16, num_classes=10)
    assert m.hidden_size == 384 and m.patch_size == 4 and m.depth == 12


def test_patchify_roundtrip():
    from reed_tpu.nn.layers import patchify, unpatchify

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 4))
    p = patchify(x, 2)
    assert p.shape == (2, 16, 16)
    x2 = unpatchify(p, 2, 4)
    assert np.allclose(x, x2)

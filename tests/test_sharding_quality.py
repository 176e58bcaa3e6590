"""Sharding-quality guarantees: the FSDP/TP rules must not trigger XLA's
replicate-then-repartition fallback ("[SPMD] Involuntary full
rematerialization"), which the r02 dryrun carried on the multiflow
node_feature_net and the SiT conditioning vector.

Root causes fixed in parallel/mesh.py: 1-D params and sub-FSDP_MIN_SIZE
leaves are never FSDP-sharded, and 2-D kernels shard their contraction dim
(dim 0) so param shardings cannot leak feature-dim shardings into the
activation graph."""

import os
import subprocess
import sys

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from reed_tpu.parallel import mesh as meshlib


def test_fsdp_spec_skips_1d_and_small():
    # biases / norm scales never shard
    assert meshlib.fsdp_spec((1024,), 2, min_size=0) == P(None)
    # below min_size not sharded
    assert meshlib.fsdp_spec((64, 64), 2, min_size=65536) == P(None, None)
    # large 2-D kernel shards its contraction dim
    assert meshlib.fsdp_spec((1152, 3456), 2) == P(("fsdp",), None)
    # dim0 not divisible -> falls back to the largest divisible dim
    assert meshlib.fsdp_spec((1153, 3456), 2) == P(None, ("fsdp",))


def test_fsdp_respects_tensor_claim():
    spec = meshlib.fsdp_spec((1152, 3456), 2,
                             tensor_spec=P(None, meshlib.TENSOR_AXIS))
    assert spec == P(("fsdp",), meshlib.TENSOR_AXIS)


@pytest.mark.parametrize("rules,path,expected_axis", [
    (meshlib.SIT_TP_RULES, "blocks_0/mlp/fc1/kernel", 1),
    (meshlib.PMPNN_TP_RULES, "encoder_layers_0/dense/fc1/kernel", 1),
    (meshlib.SEMLA_TP_RULES, "dynamics/layers_0/node_ff/inv_fc1/kernel", 1),
    (meshlib.EGNN_TP_RULES, "egnn/e_block_0/gcl_0/edge_fc1/kernel", 1),
    (meshlib.IPA_TP_RULES, "ipa_0/linear_out/kernel", 0),
    (meshlib.RDM_TP_RULES, "res_3/out_fc/kernel", 0),
])
def test_tp_rules_match_param_paths(rules, path, expected_axis):
    import re

    matched = [spec for pat, spec in rules if re.search(pat, path)]
    assert matched, (rules, path)
    assert matched[0][expected_axis] == meshlib.TENSOR_AXIS


def test_all_trainers_apply_tensor_rules():
    """Every domain trainer passes family TP rules to shard_params: on a
    tensor=2 mesh at least one kernel must carry the tensor axis."""
    import re

    for trainer_mod, rules in [
        ("image", meshlib.SIT_TP_RULES),
        ("protein", meshlib.PMPNN_TP_RULES),
        ("molecule_semla", meshlib.SEMLA_TP_RULES),
        ("molecule_edm", meshlib.EGNN_TP_RULES),
        ("multiflow", meshlib.IPA_TP_RULES),
        ("rdm", meshlib.RDM_TP_RULES),
    ]:
        src = open(os.path.join(os.path.dirname(__file__), "..", "reed_tpu",
                                "train", trainer_mod + ".py")).read()
        rule_name = [n for n in dir(meshlib) if n.endswith("_TP_RULES")
                     and getattr(meshlib, n) is rules]
        assert any(n in src for n in rule_name), (trainer_mod, rule_name)


_COMPILE_SNIPPET = r"""
import os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
from reed_tpu.core.config import CurriculumConfig, MeshConfig, OptimConfig
from reed_tpu.diffusion.continuous import FlowMatchingLossConfig
from reed_tpu.train.image import ImageTrainConfig, ImageTrainer
from reed_tpu.train.multiflow import MultiflowTrainConfig, MultiflowTrainer

mesh = MeshConfig(data=2, fsdp=2, tensor=2)
cfg = ImageTrainConfig(model="SiT-S/4", input_size=8, in_channels=4,
    num_classes=16, encoder_depth=2, z_dims=(16,), z_types=("i",),
    projector_dim=32, compute_dtype="float32", batch_size=16,
    loss=FlowMatchingLossConfig(enc_names=("dinov2",), loss_weights=(1.0,)),
    optim=OptimConfig(lr=1e-3, grad_clip=1.0),
    curriculum=CurriculumConfig(max_steps=10, diffusion_warmup_steps=0),
    mesh=mesh)
tr = ImageTrainer(cfg)
st = tr.init_state()
b = tr.synthetic_batch()
with tr.mesh:
    st, m = tr.train_step(st, b, jax.random.PRNGKey(0))
assert float(m["loss"]) == float(m["loss"])

mf = MultiflowTrainer(MultiflowTrainConfig(
    c_s=32, c_z=16, num_blocks=1, batch_size=16, max_len=8, mesh=mesh),
    mesh=tr.mesh)
mst = mf.init_state()
mb = mf.synthetic_batch(jax.random.PRNGKey(1))
with mf.mesh:
    mst, mm = mf.train_step(mst, mb, jax.random.PRNGKey(2))
assert float(mm["loss"]) == float(mm["loss"])
print("COMPILED-OK")
"""


@pytest.mark.slow
def test_no_involuntary_rematerialization():
    """Compile the image + multiflow sharded train steps on a full
    data=2 x fsdp=2 x tensor=2 mesh and assert XLA never falls back to
    replicate-then-repartition (the exact r02 regression)."""
    env = dict(os.environ)
    proc = subprocess.run(
        [sys.executable, "-c", _COMPILE_SNIPPET], env=env,
        capture_output=True, text=True, timeout=900,
        cwd=os.path.join(os.path.dirname(__file__), ".."))
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "COMPILED-OK" in proc.stdout
    assert "Involuntary full rematerialization" not in proc.stderr, \
        [l for l in proc.stderr.splitlines() if "Involuntary" in l][:3]


_SP_SNIPPET = """
import jax
jax.config.update("jax_platforms", "cpu")
from reed_tpu.core.config import CurriculumConfig, MeshConfig, OptimConfig
from reed_tpu.diffusion.continuous import FlowMatchingLossConfig
from reed_tpu.parallel import mesh as meshlib
from reed_tpu.train.image import ImageTrainConfig, ImageTrainer

mesh = MeshConfig(data=2, fsdp=1, tensor=2, seq=2)
cfg = ImageTrainConfig(model="SiT-S/4", input_size=16, in_channels=4,
    num_classes=16, encoder_depth=2, z_dims=(16,), z_types=("i",),
    projector_dim=32, compute_dtype="float32", batch_size=16,
    loss=FlowMatchingLossConfig(enc_names=("dinov2",), loss_weights=(1.0,)),
    optim=OptimConfig(lr=1e-3, grad_clip=1.0),
    curriculum=CurriculumConfig(max_steps=10, diffusion_warmup_steps=0),
    mesh=mesh)
tr = ImageTrainer(cfg)
assert meshlib.token_sharding(tr.mesh) is not None
st = tr.init_state()
b = tr.synthetic_batch()
with tr.mesh:
    st, m = tr.train_step(st, b, jax.random.PRNGKey(0))
loss = float(m["loss"])
assert loss == loss and loss > 0.0
print("SP-COMPILED-OK", loss)
"""


@pytest.mark.slow
def test_sequence_parallel_image_step():
    """Image train step compiles + runs with the token axis sharded over a
    'seq' mesh axis (data=2 x seq=2 x tensor=2) — sequence parallelism the
    reference does not have (SURVEY.md §5.7) — with no involuntary-remat
    fallback."""
    env = dict(os.environ)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8")
    proc = subprocess.run(
        [sys.executable, "-c", _SP_SNIPPET], env=env,
        capture_output=True, text=True, timeout=900,
        cwd=os.path.join(os.path.dirname(__file__), ".."))
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "SP-COMPILED-OK" in proc.stdout
    assert "Involuntary full rematerialization" not in proc.stderr, \
        [l for l in proc.stderr.splitlines() if "Involuntary" in l][:3]

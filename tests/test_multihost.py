"""Multi-process mesh: two jax processes x 4 virtual CPU devices run one
sharded train step with per-host input (the v5p multi-host launch story;
reference reaches the same topology via four NCCL wrappers,
image/train.py:151, molecule/semlaflow/train.py:408-418)."""

import os
import re
import socket
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _launch_two_procs(cache_dir: str):
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # each process sets its own device count
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")

    def start(i):
        return subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tools", "multihost_smoke.py"),
             str(i), "2", str(port), cache_dir],
            cwd=REPO, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)

    # start the coordinator (proc 0) first so proc 1 never races its bind
    procs = [start(0)]
    time.sleep(1.5)
    procs.append(start(1))
    # two jax processes compile on one CPU core; the shared compilation
    # cache (multihost_smoke.py) keeps repeats fast
    outs = [p.communicate(timeout=1500)[0] for p in procs]
    return procs, outs


@pytest.mark.slow
def test_two_process_mesh_train_step(tmp_path):
    procs, outs = _launch_two_procs(str(tmp_path / "xla_cache"))
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-2000:]}"
    losses = []
    for out in outs:
        m = re.search(r"MULTIHOST_OK proc=\d/2 devices=8 loss=([0-9.]+)", out)
        assert m, out[-2000:]
        losses.append(float(m.group(1)))
    # SPMD: both hosts computed the same global loss
    assert losses[0] == pytest.approx(losses[1], rel=1e-6)

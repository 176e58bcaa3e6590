"""Multi-host smoke: one REED image train step over a multi-process mesh.

Each process owns 4 virtual CPU devices; jax.distributed.initialize wires
them into one global mesh (the same call path a v5p pod uses — the CLI's
--distributed flag). Per-host input goes through
jax.make_array_from_process_local_data, proving the per-host data loading
(reed_tpu.data.image.epoch_batches process_index/process_count slicing)
composes with the global batch sharding.

Usage (launched per process, or via tests/test_multihost.py):
  python tools/multihost_smoke.py <proc_id> <num_procs> <coordinator_port>
"""

from __future__ import annotations

import os
import sys


def main(proc_id: int, num_procs: int, port: str,
         cache_dir: str = "", local_devices: int = 4) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={local_devices}"
    ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    if cache_dir:
        # shared persistent compilation cache: the two processes compile
        # the SAME train step — whichever lowers first writes the cache,
        # and any repeat run skips the compile entirely. This is what made
        # the test flaky on one contended core (two concurrent multi-minute
        # compiles), not the distributed handshake itself.
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    # generous init timeout: on a contended single core the second process
    # can take minutes to reach the coordinator handshake
    jax.distributed.initialize(f"localhost:{port}", num_processes=num_procs,
                               process_id=proc_id,
                               initialization_timeout=1200)
    assert jax.process_count() == num_procs
    assert jax.local_device_count() == local_devices
    n_global = jax.device_count()

    import numpy as np

    from reed_tpu.core.config import CurriculumConfig, MeshConfig, OptimConfig
    from reed_tpu.diffusion.continuous import FlowMatchingLossConfig
    from reed_tpu.train.image import ImageTrainConfig, ImageTrainer

    per_host = 2 * local_devices
    cfg = ImageTrainConfig(
        model="SiT-S/4", input_size=8, num_classes=8, encoder_depth=2,
        z_dims=(16,), z_types=("i",), projector_dim=32,
        compute_dtype="float32", batch_size=per_host * num_procs,
        loss=FlowMatchingLossConfig(enc_names=("dinov2",),
                                    loss_weights=(1.0,)),
        optim=OptimConfig(lr=1e-3),
        curriculum=CurriculumConfig(max_steps=10, diffusion_warmup_steps=0),
        mesh=MeshConfig(data=n_global, fsdp=1, tensor=1),
    )
    trainer = ImageTrainer(cfg)
    state = trainer.init_state()

    # per-host local shard, different per process (as epoch_batches'
    # process_index/process_count slicing produces)
    local = trainer.synthetic_batch(jax.random.PRNGKey(proc_id),
                                    batch_size=per_host)
    global_batch = jax.tree.map(
        lambda x, sh: jax.make_array_from_process_local_data(
            sh, np.asarray(x)),
        dict(local), dict(trainer.batch_sharding))

    with trainer.mesh:
        state, metrics = trainer.train_step(state, global_batch,
                                            jax.random.PRNGKey(0))
    loss = float(jax.device_get(metrics["loss"]))
    assert np.isfinite(loss), loss
    print(f"MULTIHOST_OK proc={proc_id}/{num_procs} "
          f"devices={n_global} loss={loss:.6f}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]), sys.argv[3],
         sys.argv[4] if len(sys.argv) > 4 else "")

"""Orbax checkpointing of {params, ema_params, opt_state, step} + config.

Replaces the reference's four checkpoint formats (image/train.py:418-429,
protein/fmif/train_fmif.py:704-723, molecule npy dumps, Lightning ckpts)
with one async-capable orbax layout supporting resume and EMA-only export
for inference (image/generate.py:77 loads ['ema']).
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

from reed_tpu.core.train_state import TrainState


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 5,
                 save_interval_steps: int = 1):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            save_interval_steps=save_interval_steps,
            create=True)
        self.manager = ocp.CheckpointManager(self.directory, options=options)

    def save(self, state: TrainState, config_json: Optional[str] = None,
             wait: bool = False):
        step = int(jax.device_get(state.step))
        self.manager.save(step, args=ocp.args.StandardSave(state))
        if config_json is not None and jax.process_index() == 0:
            with open(os.path.join(self.directory, "config.json"), "w") as f:
                f.write(config_json)
        if wait:
            self.manager.wait_until_finished()

    def restore(self, abstract_state: TrainState,
                step: Optional[int] = None) -> TrainState:
        step = step if step is not None else self.manager.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        return self.manager.restore(
            step, args=ocp.args.StandardRestore(abstract_state))

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def close(self):
        self.manager.wait_until_finished()
        self.manager.close()

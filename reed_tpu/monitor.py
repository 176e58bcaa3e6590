"""Fault-tolerance supervisor: launch training, poll liveness, relaunch with
resume from the latest checkpoint on failure.

Clean-room rebuild of molecule/scripts/monitor.py:29-120 (the reference's
only elastic-recovery mechanism): subprocess launch + poll loop + automatic
`--ckpt-dir` resume injection. Works with any `reed_tpu.cli train-*`
command since all trainers resume from orbax checkpoints.

Usage:
  python -m reed_tpu.monitor --interval 60 --max-restarts 100 \
      -- python -m reed_tpu.cli train-image --ckpt-dir out/run1 \
         --ckpt-every 500 --steps 100000 --synthetic
"""

from __future__ import annotations

import argparse
import os
import signal
import subprocess
import sys
import time


def latest_checkpoint_step(ckpt_dir: str):
    if not ckpt_dir or not os.path.isdir(ckpt_dir):
        return None
    steps = [int(d) for d in os.listdir(ckpt_dir) if d.isdigit()]
    return max(steps) if steps else None


def monitor(command, interval: float = 60.0, max_restarts: int = 100,
            ckpt_dir: str | None = None):
    """Run `command`; on non-zero exit, relaunch (the trainer resumes from
    its own checkpoint dir). Returns the final exit code."""
    restarts = 0
    if ckpt_dir is None and "--ckpt-dir" in command:
        ckpt_dir = command[command.index("--ckpt-dir") + 1]

    while True:
        start_step = latest_checkpoint_step(ckpt_dir)
        print(f"[monitor] launching (restart {restarts}, "
              f"latest ckpt step: {start_step}): {' '.join(command)}",
              flush=True)
        proc = subprocess.Popen(command)
        try:
            while proc.poll() is None:
                time.sleep(interval)
        except KeyboardInterrupt:
            proc.send_signal(signal.SIGINT)
            proc.wait()
            return proc.returncode

        code = proc.returncode
        if code == 0:
            print("[monitor] training finished cleanly", flush=True)
            return 0
        restarts += 1
        if restarts > max_restarts:
            print(f"[monitor] giving up after {restarts - 1} restarts "
                  f"(last exit code {code})", flush=True)
            return code
        new_step = latest_checkpoint_step(ckpt_dir)
        made_progress = (new_step is not None
                         and (start_step is None or new_step > start_step))
        print(f"[monitor] process died with code {code}; progress since "
              f"launch: {made_progress} (ckpt step {new_step}); "
              f"relaunching in {interval:.0f}s", flush=True)
        time.sleep(interval)


def main(argv=None):
    parser = argparse.ArgumentParser("reed_tpu.monitor")
    parser.add_argument("--interval", type=float, default=60.0)
    parser.add_argument("--max-restarts", type=int, default=100)
    parser.add_argument("--ckpt-dir", type=str, default=None)
    parser.add_argument("command", nargs=argparse.REMAINDER,
                        help="training command after --")
    args = parser.parse_args(argv)
    command = args.command
    if command and command[0] == "--":
        command = command[1:]
    if not command:
        parser.error("no training command given (put it after --)")
    sys.exit(monitor(command, args.interval, args.max_restarts,
                     args.ckpt_dir))


if __name__ == "__main__":
    main()

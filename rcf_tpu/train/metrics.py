"""Run metrics logging: JSONL file + optional jax profiler traces.

The reference logs through wandb (disabled in every shipped config,
`main.py:430-431`) and offers no profiler (SURVEY.md §5). Here:

* every logged step/epoch metric is appended to
  ``<checkpoints_dir>/metrics.jsonl`` (zero-egress friendly);
* ``tpu.profile_dir`` in the config captures a `jax.profiler` trace of
  steps [profile_start, profile_start + profile_steps) viewable in
  TensorBoard/XProf.
"""

from __future__ import annotations

import json
import os
import time


class MetricsLogger:
    def __init__(self, ckpt_dir: str):
        self.path = os.path.join(ckpt_dir, "metrics.jsonl")
        os.makedirs(ckpt_dir, exist_ok=True)

    def log(self, **metrics) -> None:
        record = {"ts": time.time(), **metrics}
        with open(self.path, "a") as f:
            f.write(json.dumps(record) + "\n")


class StepProfiler:
    """Trace steps [start, start+steps) with jax.profiler."""

    def __init__(self, profile_dir: str | None, start: int = 10, steps: int = 5):
        self.profile_dir = profile_dir
        self.start = start
        self.stop = start + steps
        self._active = False

    def maybe_start(self, step: int) -> None:
        # Window test (not equality): scan mode advances global_step by
        # scan_k per dispatch and may never land exactly on `start`.
        if self.profile_dir and not self._active and self.start <= step < self.stop:
            import jax

            os.makedirs(self.profile_dir, exist_ok=True)
            jax.profiler.start_trace(self.profile_dir)
            self._active = True

    def maybe_stop(self, step: int) -> None:
        if self._active and step >= self.stop:
            import jax

            jax.profiler.stop_trace()
            self._active = False

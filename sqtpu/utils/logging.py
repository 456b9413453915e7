"""Training observability: stdout progress + metrics.jsonl + NaN guard.

Upgrades the reference's ANSI-rewrite stdout logging
(``torch/train.py:118-127``) and NaN-gradient watchdog (``:115-116``)
into structured, appendable artifacts (SURVEY.md §5.1/§5.2/§5.5).
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


class MetricLogger:
    def __init__(self, out_dir: str = "", run_name: str = "train"):
        self.out_dir = out_dir
        self.path = os.path.join(out_dir, f"{run_name}_metrics.jsonl") if out_dir else None
        if self.path:
            os.makedirs(out_dir, exist_ok=True)
        self._t0 = time.time()

    def log(self, **kv):
        rec = {"t": round(time.time() - self._t0, 3)}
        rec.update({k: (float(v) if isinstance(v, (jax.Array, np.floating, np.ndarray))
                        else v) for k, v in kv.items()})
        if self.path:
            with open(self.path, "a") as f:
                f.write(json.dumps(rec) + "\n")
        return rec

    @staticmethod
    def progress(msg: str):
        sys.stdout.write("\033[K" + msg + "\r")
        sys.stdout.flush()

    @staticmethod
    def line(msg: str):
        sys.stdout.write("\033[K" + msg + "\n")
        sys.stdout.flush()


class NanGuard:
    """Counts non-finite losses; optionally signals the step be skipped.

    Equivalent role to the reference NaN watchdog (``train.py:115-116``)
    but acts on the loss/global-grad-norm instead of one layer's grads.
    """

    def __init__(self, policy: str = "warn"):
        assert policy in ("warn", "skip")
        self.policy = policy
        self.count = 0

    def check(self, loss) -> bool:
        """Returns True if the step result should be KEPT."""
        ok = bool(jnp.isfinite(loss))
        if not ok:
            self.count += 1
            MetricLogger.line(
                f"--------------- NON-FINITE LOSS (#{self.count}) ---------------"
            )
            if self.policy == "skip":
                return False
        return True


class Throughput:
    """imgs/sec meter (the perf counter the reference never had)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._n = 0
        self._t0 = time.time()

    def update(self, n: int):
        self._n += n

    @property
    def rate(self) -> float:
        dt = time.time() - self._t0
        return self._n / dt if dt > 0 else 0.0

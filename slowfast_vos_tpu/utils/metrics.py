"""Scalar metrics logging.

The reference logs batch/epoch losses and eval times to TensorBoard
(`code/train.py:82,103,109-111`) — and rmtree's the log dir at import time
(`helpers/constants.py:14-15`). Here: append-only JSONL (one object per
scalar, tagged with step and wall time), greppable and plottable without a TF
dependency; a fresh run writes a new file instead of deleting history.
"""
from __future__ import annotations

import json
import os
import time


class MetricsLogger:
    def __init__(self, log_dir: str, run_name: str = "run"):
        os.makedirs(log_dir, exist_ok=True)
        stamp = time.strftime("%Y%m%d-%H%M%S")
        self.path = os.path.join(log_dir, f"{run_name}-{stamp}.jsonl")
        self._f = open(self.path, "a")

    def scalar(self, tag: str, value, step: int):
        self._f.write(
            json.dumps({"tag": tag, "value": float(value), "step": int(step), "time": time.time()})
            + "\n"
        )
        self._f.flush()

    def scalars(self, values: dict, step: int, prefix: str = ""):
        for k, v in values.items():
            self.scalar(prefix + k, v, step)

    def close(self):
        self._f.close()

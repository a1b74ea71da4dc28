"""Scalar metrics logging.

The reference logs batch/epoch losses and eval times to TensorBoard
(`code/train.py:82,103,109-111`) — and rmtree's the log dir at import time
(`helpers/constants.py:14-15`). Here: append-only JSONL (one object per
scalar, tagged with step and wall time), greppable and plottable without a TF
dependency, PLUS an optional TensorBoard event-file sink (`tensorboard=True`,
needs `torch.utils.tensorboard`) for drop-in parity with the reference's
SummaryWriter dashboards; a fresh run writes new files instead of deleting
history.
"""
from __future__ import annotations

import json
import os
import time


class MetricsLogger:
    def __init__(self, log_dir: str, run_name: str = "run", tensorboard: bool = False):
        os.makedirs(log_dir, exist_ok=True)
        stamp = time.strftime("%Y%m%d-%H%M%S")
        self.path = os.path.join(log_dir, f"{run_name}-{stamp}.jsonl")
        self._f = open(self.path, "a")
        self._tb = None
        if tensorboard:
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(os.path.join(log_dir, f"tb-{run_name}-{stamp}"))

    def scalar(self, tag: str, value, step: int):
        self._f.write(
            json.dumps({"tag": tag, "value": float(value), "step": int(step), "time": time.time()})
            + "\n"
        )
        self._f.flush()
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), int(step))

    def scalars(self, values: dict, step: int, prefix: str = ""):
        for k, v in values.items():
            self.scalar(prefix + k, v, step)

    def close(self):
        self._f.close()
        if self._tb is not None:
            self._tb.close()

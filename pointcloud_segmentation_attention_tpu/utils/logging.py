"""Metric logging: JSONL writer + optional TensorBoard events.

The reference wrote manual ``tf.Summary`` values per epoch to separate
train/val FileWriters (``attention_points/train.py:167-218,354-355``) and
scraped event files offline (``visualization/extract_scores_from_summaries.py``).
Here the primary sink is a JSONL file (one record per logged step — trivially
parseable by ``viz.curves``); TensorBoard event output is attempted via
torch.utils.tensorboard when present, so existing TB tooling keeps working.
"""
from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class MetricLogger:
    def __init__(self, log_dir: str, name: str = "train", tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, f"{name}_metrics.jsonl")
        self._f = open(self.path, "a")
        self._tb = None
        if tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(os.path.join(log_dir, name))
            except Exception:
                self._tb = None

    def log(self, step: int, metrics: Dict[str, float]):
        record = {"step": int(step), "time": time.time()}
        record.update({k: float(v) for k, v in metrics.items()})
        self._f.write(json.dumps(record) + "\n")
        self._f.flush()
        if self._tb is not None:
            for k, v in metrics.items():
                self._tb.add_scalar(k, float(v), int(step))

    def close(self):
        self._f.close()
        if self._tb is not None:
            self._tb.close()


def read_metrics(path: str):
    """Load a metrics JSONL file into a list of dicts (for viz.curves)."""
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                out.append(json.loads(line))
    return out

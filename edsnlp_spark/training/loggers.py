"""Metric trackers for the training loop.

Parity target: edsnlp/training/loggers.py:13-167 (flatten_dict,
sanitize_hparams, CSVTracker, JSONTracker).  The reference builds on
accelerate's tracker protocol; the same ``start / store_init_configuration
/ log(values, step) / finish`` surface is kept so a torch training loop
can swap these in unchanged.  Rich/TensorBoard/W&B/... trackers are
thin wrappers over absent third-party binaries and are out of scope.
"""

from __future__ import annotations

import csv
import json
import os
import warnings
from typing import Any, Dict, Optional


def flatten_dict(d, path=""):
    """Nested dicts/lists -> one level with '/'-joined keys
    (loggers.py:13-26)."""
    if not isinstance(d, (list, dict)):
        return {path: d}
    items = enumerate(d) if isinstance(d, list) else d.items()
    return {
        k: v
        for key, val in items
        for k, v in flatten_dict(val, f"{path}/{key}" if path else str(key))
        .items()
    }


def sanitize_hparams(values: Dict[str, Any]) -> Dict[str, Any]:
    """Non-scalar hyperparameters -> str (loggers.py:29-40)."""
    return {k: (v if isinstance(v, (int, float, str, bool)) else str(v))
            for k, v in values.items()}


class CSVTracker:
    """First log() call fixes the column set (plus a leading 'step');
    later calls pad missing columns and WARN on new ones
    (loggers.py:80-118)."""

    name = "csv"

    def __init__(self, logging_dir: str, file_name: str = "metrics.csv",
                 **kwargs):
        self.logging_dir = logging_dir
        self.file_path = os.path.join(logging_dir, file_name)
        self._file = None
        self._writer = None
        self._columns = None

    def start(self):
        if self._file is not None:
            return
        os.makedirs(self.logging_dir, exist_ok=True)
        self._file = open(self.file_path, mode="w", newline="")
        self._writer = csv.writer(self._file)

    def store_init_configuration(self, values: Dict[str, Any]):
        pass

    def log(self, values: Dict[str, Any], step: Optional[int] = None):
        self.start()
        values = flatten_dict(values)
        if self._columns is None:
            self._columns = list({**{"step": None}, **values}.keys())
            self._writer.writerow(self._columns)
        row = [(step if step is not None else "") if col == "step"
               else values.get(col, "") for col in self._columns]
        for extra in values:
            if extra not in self._columns:
                warnings.warn(
                    f"CSVTracker: encountered a new field '{extra}' that "
                    f"was not in the field keys of the first logged step. "
                    f"It will not be logged.")
        self._writer.writerow(row)
        self._file.flush()

    def finish(self):
        if self._file is not None:
            self._file.close()
            self._file = None


class JSONTracker:
    """Append each record in memory and rewrite the whole JSON array per
    log() call (loggers.py:148-163 — crash-safe resumable file)."""

    name = "json"

    def __init__(self, logging_dir: str, file_name: str = "metrics.json",
                 **kwargs):
        self.logging_dir = logging_dir
        self._file_path = os.path.join(logging_dir, file_name)
        self._logs: list = []

    def start(self):
        pass

    def store_init_configuration(self, values: Dict[str, Any]):
        pass

    def log(self, values: Dict[str, Any], step: Optional[int] = None):
        self._logs.append({"step": step, **values})
        os.makedirs(self.logging_dir, exist_ok=True)
        with open(self._file_path, mode="w") as f:
            json.dump(self._logs, f, indent=2)

    def finish(self):
        pass

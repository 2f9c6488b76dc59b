"""Timestamped training log file (reference: train.py:382-387)."""

from __future__ import annotations

import os
from datetime import datetime


class TrainingLogger:
    """Appends timestamped lines to ``<checkpoint_dir>/training_log.txt``
    and mirrors them to stdout."""

    def __init__(self, checkpoint_dir: str, filename: str = "training_log.txt",
                 echo: bool = True, enabled: bool = True):
        """``enabled=False`` suppresses the file write (non-lead processes
        of a multi-host run share checkpoint_dir; only process 0 writes)
        while still echoing to that process's stdout."""
        os.makedirs(checkpoint_dir, exist_ok=True)
        self.path = os.path.join(checkpoint_dir, filename)
        self.echo = echo
        self.enabled = enabled

    def log(self, msg: str) -> None:
        if self.enabled:
            ts = datetime.now().strftime("%Y-%m-%d %H:%M:%S")
            with open(self.path, "a", encoding="utf-8") as f:
                f.write(f"[{ts}] {msg}\n")
        if self.echo:
            print(msg)

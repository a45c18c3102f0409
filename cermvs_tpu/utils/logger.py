"""Training metrics logger: running means -> stdout + JSONL (+ TensorBoard).

Parity with ``/root/reference/utils/logger.py``: SUM_FREQ-step running means,
an optional unbuffered plain-text file for tunnel-impaired users, TensorBoard
when available.  Multi-host safe: only process 0 writes.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class Logger:
    def __init__(self, name: str, run_dir: str = "runs",
                 output_file: Optional[str] = None, SUM_FREQ: int = 100,
                 lr_fn=None, is_host0: bool = True):
        self.name = name
        self.SUM_FREQ = SUM_FREQ
        self.total_steps = 0
        self.running: Dict[str, float] = {}
        self.lr_fn = lr_fn
        self.is_host0 = is_host0
        self.run_dir = os.path.join(run_dir, name)
        self._writer = None
        self._jsonl = None
        self.output_file = output_file
        if is_host0:
            os.makedirs(self.run_dir, exist_ok=True)
            self._jsonl = open(os.path.join(self.run_dir, "metrics.jsonl"), "a")
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._writer = SummaryWriter(log_dir=self.run_dir)
            except Exception:
                self._writer = None
            if output_file:
                open(os.path.join(run_dir, output_file), "w").close()

    def push(self, metrics: Dict[str, float]) -> None:
        self.total_steps += 1
        for k, v in metrics.items():
            self.running[k] = self.running.get(k, 0.0) + float(v)
        if self.total_steps % self.SUM_FREQ == self.SUM_FREQ - 1:
            self._flush()

    def _flush(self) -> None:
        if not self.is_host0:
            self.running = {}
            return
        means = {k: v / self.SUM_FREQ for k, v in sorted(self.running.items())}
        lr = float(self.lr_fn(self.total_steps)) if self.lr_fn else 0.0
        header = f"[{self.total_steps + 1:6d}, {lr:10.7f}] "
        body = ", ".join(f"{v:10.4f}" for v in means.values())
        print(f"Training Metrics ({self.total_steps}): {header}{body}")
        record = {"step": self.total_steps, "lr": lr, "time": time.time(),
                  **means}
        if self._jsonl:
            self._jsonl.write(json.dumps(record) + "\n")
            self._jsonl.flush()
        if self._writer:
            for k, v in means.items():
                self._writer.add_scalar(k, v, self.total_steps)
        if self.output_file:
            with open(os.path.join(os.path.dirname(self.run_dir),
                                   self.output_file), "a") as f:
                f.write(f"{header}{body}\n")
        self.running = {}

    def close(self) -> None:
        if self._writer:
            self._writer.close()
        if self._jsonl:
            self._jsonl.close()

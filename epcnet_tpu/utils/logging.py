"""Structured JSONL metrics + plain-text logging.

Reference equivalent: train.py's ``log_string()`` appending to
log_train.txt and tf.summary scalars [LINEAGE; SURVEY.md §5.5]. JSONL is
the machine-readable upgrade: one {"step": ..., metrics...} object per line.
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Any, Mapping


def log_string(msg: str, log_file=None) -> None:
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    if log_file is not None:
        log_file.write(line + "\n")
        log_file.flush()


class MetricsLogger:
    """JSONL metrics writer (+ echo to stdout every ``echo_every`` calls).

    ``tensorboard=True`` additionally mirrors every numeric metric as a
    TensorBoard scalar under ``<log_dir>/tb`` — the analogue of the
    reference's ``tf.summary.FileWriter`` scalars [LINEAGE; SURVEY.md §5.5].
    Optional and gated: if no TB backend is importable the logger degrades
    to JSONL-only with a logged notice.
    """

    def __init__(
        self, log_dir: str, name: str = "metrics", echo_every: int = 0,
        tensorboard: bool = False, primary: bool = True,
    ):
        """``primary=False`` (non-zero processes of a multi-process run)
        turns every write into a no-op: N processes appending to one JSONL
        file through N buffered handles interleave corrupt lines."""
        self._primary = primary
        if not primary:
            self._f = self._tb = None
            self.path = os.path.join(log_dir, f"{name}.jsonl")
            self.echo_every, self._count, self._name = 0, 0, name
            return
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, f"{name}.jsonl")
        self._f = open(self.path, "a")
        self.echo_every = echo_every
        self._count = 0
        self._name = name
        self._tb = None
        if tensorboard:
            try:
                from flax.metrics.tensorboard import SummaryWriter

                self._tb = SummaryWriter(os.path.join(log_dir, "tb"))
            except Exception as e:  # missing backend: degrade, don't fail
                log_string(f"tensorboard writer unavailable ({e!r}); JSONL only")

    def write(self, step: int, metrics: Mapping[str, Any], **extra) -> None:
        if not self._primary:
            return
        rec = {"step": int(step), "time": time.time(), **extra}
        for k, v in metrics.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                rec[k] = v
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        self._count += 1
        if self._tb is not None:
            for k, v in rec.items():
                if k not in ("step", "time") and isinstance(v, (int, float)):
                    self._tb.scalar(f"{self._name}/{k}", float(v), int(step))
        if self.echo_every and self._count % self.echo_every == 0:
            short = {k: (round(v, 5) if isinstance(v, float) else v) for k, v in rec.items() if k != "time"}
            print(short, file=sys.stderr, flush=True)

    def flush(self) -> None:
        """Durability point without ending the logger's life: the JSONL file
        is flushed per write, but the TB SummaryWriter buffers — call this
        at end-of-train and on preemption (SIGTERM grace windows kill the
        process before GC would flush)."""
        if self._f is not None:
            self._f.flush()
        if self._tb is not None:
            self._tb.flush()

    def close(self) -> None:
        if self._f is not None:
            self._f.close()
        if self._tb is not None:
            self._tb.flush()
            self._tb.close()

"""Metrics / logging / profiling hooks.

The reference logs sub-losses through HF Trainer + wandb (train.py:107-114,
report_to default "wandb" at train.py:526-529). Here: a JSONL sink (always),
stdout every logging_steps, optional wandb when importable and requested,
and jax.profiler trace capture around a step window.
"""
from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional


class MetricsLogger:
    def __init__(self, output_dir: str, report_to: str = "none",
                 run_name: str = "run", write: bool = True):
        """``write=False``: a silent sink (non-primary hosts of a
        multi-process run — they must not race the primary on the shared
        metrics.jsonl / stdout)."""
        self._write = write
        self.path = os.path.join(output_dir, "metrics.jsonl")
        self._f = None
        if write:
            os.makedirs(output_dir, exist_ok=True)
            self._f = open(self.path, "a")
        self._wandb = None
        if report_to == "wandb":
            try:
                import wandb
                self._wandb = wandb
                wandb.init(project="speech-distill-tpu", name=run_name,
                           dir=output_dir)
            except Exception:
                self._wandb = None
        self._t_last = time.perf_counter()

    def log(self, step: int, metrics: Dict[str, Any],
            tokens_per_step: Optional[int] = None, echo: bool = True):
        now = time.perf_counter()
        dt = now - self._t_last
        self._t_last = now
        rec = {"step": step, "time_per_step": round(dt, 4)}
        rec.update({k: float(v) for k, v in metrics.items()})
        if tokens_per_step:
            rec["tokens_per_sec"] = round(tokens_per_step / max(dt, 1e-9), 1)
        if not self._write:
            return
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._wandb is not None:
            self._wandb.log(rec, step=step)
        if echo:
            parts = " ".join(f"{k}={v:.4f}" if isinstance(v, float) else f"{k}={v}"
                             for k, v in rec.items() if k != "step")
            print(f"[step {step}] {parts}", flush=True)

    def close(self):
        if self._f is not None:
            self._f.close()
        if self._wandb is not None:
            self._wandb.finish()


class ProfilerWindow:
    """Capture a jax.profiler trace for steps [start, stop)."""

    def __init__(self, log_dir: str, start: int = 10, stop: int = 13,
                 enabled: bool = False):
        self.log_dir = log_dir
        self.start = start
        self.stop = stop
        self.enabled = enabled
        self._active = False

    def on_step(self, step: int):
        if not self.enabled:
            return
        import jax
        if step == self.start and not self._active:
            jax.profiler.start_trace(self.log_dir)
            self._active = True
        elif step >= self.stop and self._active:
            jax.profiler.stop_trace()
            self._active = False

"""Observability: colored logging, per-phase timing, jax.profiler hooks,
metric recording.

The reference has no tracing/profiling (SURVEY.md §5 — tqdm bars and a
vestigial timer only); here timing and profiling are first-class: every
phase wrapper can be timed with `phase_timer`, traces go to TensorBoard
via jax.profiler, and scalar metrics accumulate into a JSONL history.
"""
from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Dict, Optional


class Log:
    """Minimal colored stdout logger (ref `utils/util.py:96-133` surface)."""
    _COLORS = {"info": "\033[96m", "warn": "\033[93m", "error": "\033[91m",
               "title": "\033[95m", "ok": "\033[92m"}
    _END = "\033[0m"
    enabled = True

    @classmethod
    def _emit(cls, level, *msg):
        if not cls.enabled:
            return
        color = cls._COLORS.get(level, "")
        print(f"{color}[{level}]{cls._END}", *msg, flush=True)

    @classmethod
    def info(cls, *msg):
        cls._emit("info", *msg)

    @classmethod
    def warn(cls, *msg):
        cls._emit("warn", *msg)

    @classmethod
    def error(cls, *msg):
        cls._emit("error", *msg)

    @classmethod
    def title(cls, *msg):
        cls._emit("title", *msg)


class MetricRecorder:
    """Append-only JSONL scalar history + in-memory aggregates.

    Replaces the reference's (mostly commented-out) TensorBoard scalars
    (`pipelines/base.py:86-129`) with a dependency-free record the bench
    and judge can read back.
    """

    def __init__(self, path: Optional[str] = None, tb_dir: Optional[str] = None):
        self.path = path
        self.history = []
        self._tb = None
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        if tb_dir:
            # optional TensorBoard scalars (ref `pipelines/base.py:54-57,
            # 86-129`); torch's SummaryWriter ships in the image — fail
            # soft if it ever doesn't
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(log_dir=tb_dir)
            except Exception:
                self._tb = None

    @staticmethod
    def _json_default(o):
        # numpy / jax scalars and arrays (e.g. np.int64 view ids) are not
        # JSON serializable; `.tolist()` maps them to native python values
        if hasattr(o, "tolist"):
            return o.tolist()
        raise TypeError(
            f"Object of type {type(o).__name__} is not JSON serializable")

    def log(self, step: int, **scalars):
        rec = {"step": step, "t": time.time(), **scalars}
        self.history.append(rec)
        if self.path:
            with open(self.path, "a") as f:
                f.write(json.dumps(rec, default=self._json_default) + "\n")
        if self._tb is not None:
            for k, v in scalars.items():
                try:
                    self._tb.add_scalar(k, float(v), step)
                except (TypeError, ValueError):
                    pass
            self._tb.flush()

    def log_image(self, step: int, name: str, image):
        """TensorBoard image (ref `util_vis.py:24-34` tb_image); no-op
        without a tb_dir. image: [H,W,3] float in [0,1] or uint8."""
        if self._tb is None:
            return
        import numpy as np
        img = np.asarray(image)
        if img.dtype != np.uint8:
            img = (np.clip(img, 0.0, 1.0) * 255).astype(np.uint8)
        try:
            self._tb.add_image(name, img, step, dataformats="HWC")
            self._tb.flush()
        except Exception:
            pass

    def last(self, key: str):
        for rec in reversed(self.history):
            if key in rec:
                return rec[key]
        return None


class PhaseTimers:
    """Accumulated wall-time per phase name."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def track(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {k: {"total_s": round(v, 3), "count": self.counts[k],
                    "mean_s": round(v / self.counts[k], 3)}
                for k, v in self.totals.items()}


# module-level timer for host-side work that happens OUTSIDE the phase
# timers (pose eval, checkpointing, batch assembly) — the round-2
# synthprep run had >1h of wall-clock unaccounted for by phase timing;
# this makes that bucket visible in the end-of-run summary.
HOST_TIMERS = PhaseTimers()


class CompileCounter:
    """Distinct (phase, batch-shape-signature) tracker.

    A shape-bucket miss triggers a fresh XLA compile — minutes each via
    the remote-TPU compiler — so per-view recompiles would dominate
    wall-clock on a real scene. Phases record each run's shape signature
    here; the end-of-run summary shows how many distinct programs each
    phase compiled (1 = perfect bucketing)."""

    def __init__(self):
        self.signatures: Dict[str, set] = {}
        self.calls: Dict[str, int] = {}

    def record(self, phase_name: str, tree) -> None:
        import jax
        sig = tuple(getattr(leaf, "shape", ())
                    for leaf in jax.tree_util.tree_leaves(tree))
        self.signatures.setdefault(phase_name, set()).add(hash(sig))
        self.calls[phase_name] = self.calls.get(phase_name, 0) + 1

    def summary(self) -> Dict[str, Dict[str, int]]:
        return {k: {"distinct_shape_sigs": len(v), "calls": self.calls[k]}
                for k, v in self.signatures.items()}


COMPILES = CompileCounter()


@contextlib.contextmanager
def jax_trace(logdir: Optional[str]):
    """Capture a jax.profiler trace around a block when logdir is set."""
    if not logdir:
        yield
        return
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


TIMERS = PhaseTimers()

"""Metrics / observability (SURVEY.md §5.5): JSONL scalar writer + a
block_until_ready timing harness for the benchmark paths. The reference has
only tqdm prints; images/sec/chip and step-time are first-class here."""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional

import jax


class MetricWriter:
    """Append-only JSONL scalars: {"step": n, "name": ..., "value": ...}."""

    def __init__(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self.path = path

    def write(self, step: int, **scalars: float) -> None:
        with open(self.path, "a") as f:
            for name, value in scalars.items():
                f.write(json.dumps({"step": step, "name": name,
                                    "value": float(value)}) + "\n")


class Timer:
    """Wall-clock timing with device sync — the correct way to time jitted
    work (block_until_ready on outputs; never trust dispatch time)."""

    def __init__(self):
        self.elapsed = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self._t0
        return False


def time_fn(fn, *args, warmup: int = 2, iters: int = 10,
            **kwargs) -> Dict[str, float]:
    """Run fn with warmup (compile) excluded; returns seconds/iter stats."""
    for _ in range(warmup):
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    times.sort()
    return {"mean_s": sum(times) / len(times), "min_s": times[0],
            "median_s": times[len(times) // 2], "max_s": times[-1]}

"""Benchmark timers emitting the reference's CSV contract.

Equivalent of the reference's CUDATimer / ChronoTimer
(include/cuda_wrapper.cuh:191-283, include/util.cuh:38-127): per-op trials
with `function,trials,median,mean` CSV rows (microseconds).  Device work is
bracketed with block_until_ready(), the JAX analogue of cudaEvent pairs.

CAVEAT on the axon TPU runtime: a sync-per-trial loop includes the
~15-26 ms per-dispatch tunnel round trip in every sample (CLAUDE.md
measurement rules), so OpTimer numbers there upper-bound the device
cost.  For sub-RTT ops use a chained fori_loop with K >= 25 instead —
benchmarks/op_table.py is the reference implementation.
"""

from __future__ import annotations

import time
from typing import Callable, List

import numpy as np


def print_timer_banner():
    print("function,trials,median time (us),mean time (us)")


class OpTimer:
    """Times a callable returning jax arrays (or pytrees of them)."""

    def __init__(self, name: str, trials: int = 100, warmup: int = 2):
        self.name = name
        self.trials = trials
        self.warmup = warmup
        self.samples_us: List[float] = []

    def run(self, fn: Callable, *args, **kwargs):
        import jax
        for _ in range(self.warmup):
            out = fn(*args, **kwargs)
            jax.block_until_ready(out)
        for _ in range(self.trials):
            t0 = time.perf_counter()
            out = fn(*args, **kwargs)
            jax.block_until_ready(out)
            self.samples_us.append((time.perf_counter() - t0) * 1e6)
        return out

    @property
    def median_us(self) -> float:
        return float(np.median(self.samples_us))

    @property
    def mean_us(self) -> float:
        return float(np.mean(self.samples_us))

    def print_csv(self):
        print(f"{self.name},{len(self.samples_us)},{self.median_us:.2f},"
              f"{self.mean_us:.2f}")


def time_op(name: str, fn: Callable, *args, trials: int = 100,
            **kwargs) -> float:
    """Convenience: time fn, print the CSV row, return median us."""
    t = OpTimer(name, trials=trials)
    t.run(fn, *args, **kwargs)
    t.print_csv()
    return t.median_us

"""Batched stream executor for FHE verb pipelines.

Design (TPU-first, contrast with the reference's per-call launches,
src/evaluate.cu:130 on cudaStreamPerThread):

- **One executable.** The per-item step function is `vmap`ped over a
  *static* batch axis B and jitted once; every batch reuses the same
  XLA executable (no retrace, no dynamic shapes).
- **Async pipelining.** `jax.jit` dispatch is asynchronous: the host
  thread returns as soon as the computation is enqueued, so batch k+1
  is assembled on the host while batch k runs on the device.  JAX's
  dispatch queue provides the double-buffering the reference gets from
  CUDA streams — no thread pool needed.
- **Buffer donation.** The stacked input arrays of each batch are
  donated to XLA (`donate_argnums`), so the executor's steady-state HBM
  footprint is outputs + one in-flight batch, independent of stream
  length.
- **Tail padding.** A final partial batch is padded by repetition to
  the static B and the padded lanes dropped on output, keeping the
  single-executable property for arbitrary stream lengths.

Typical use (the headline CKKS step)::

    pipe = pipeline32.build_pipeline32(ctx, rlk)
    ex = StreamExecutor(pipeline32.mult_relin_rescale32, pipe, batch=8)
    handles = [ex.submit(d1, d2) for d1, d2 in pairs]
    outs = [h.result() for h in ex.flush(handles)]
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Any, Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp


@dataclass
class ExecutorStats:
    items: int = 0
    batches: int = 0
    padded_lanes: int = 0
    dispatch_s: float = 0.0     # host time spent assembling + enqueueing
    first_batch_s: float = 0.0  # includes compile


class BatchHandle:
    """Result handle for one submitted item.

    `result()` returns the per-item output pytree; it blocks only on the
    batch that contains this item (and triggers a flush if the item is
    still waiting in a partial batch).
    """

    def __init__(self, executor: "StreamExecutor"):
        self._executor = executor
        self._out: Any = None
        self._done = False

    def _resolve(self, out: Any) -> None:
        self._out = out
        self._done = True

    def result(self) -> Any:
        if not self._done:
            self._executor.flush()
        return self._out


class StreamExecutor:
    """Fixed-batch streaming executor for a jitted per-item step.

    Parameters
    ----------
    step_fn : callable ``(consts, *item_args) -> pytree``
        The per-item computation (e.g. ``mult_relin_rescale32``).
        ``consts`` is broadcast (in_axes=None); every other argument
        gains a leading batch axis.
    consts : pytree
        Pipeline constants passed through unbatched (tables, evk, ...).
        Passed as a jit *argument* so XLA does not constant-fold the
        tables into the executable (CLAUDE.md invariant).
    batch : int
        Static batch size B.  One XLA executable is compiled for this B.
    donate : bool
        Donate the stacked per-batch input buffers to XLA.
    """

    def __init__(self, step_fn: Callable, consts: Any, batch: int = 8,
                 donate: bool = True):
        if batch < 1:
            raise ValueError("batch must be >= 1")
        self.batch = int(batch)
        self.consts = consts
        self.stats = ExecutorStats()
        n_item_args: Optional[int] = None  # fixed on first submit

        if batch == 1:
            batched = step_fn
        else:
            # in_axes for item args resolved lazily (arg count unknown
            # until first submit) — build per-arity on demand
            batched = None
        self._step_fn = step_fn
        self._batched = batched
        self._jitted = None
        self._donate = donate
        self._n_item_args = n_item_args
        self._pending_args: List[tuple] = []
        self._pending_handles: List[BatchHandle] = []
        self._last_out: Any = None

    # -- internal -----------------------------------------------------

    def _build_jit(self, n_item_args: int):
        if self.batch == 1:
            fn = self._step_fn
            # batch=1 passes the caller's arrays through unstacked;
            # donating them would invalidate buffers the caller may
            # still hold — only batches own fresh stacked copies
            donate = ()
        else:
            in_axes = (None,) + (0,) * n_item_args
            fn = jax.vmap(self._step_fn, in_axes=in_axes)
            # donation is a no-op on the CPU backend (and warns); only
            # request it where XLA can actually alias HBM buffers
            on_accel = jax.devices()[0].platform != "cpu"
            donate = (tuple(range(1, 1 + n_item_args))
                      if self._donate and on_accel else ())
        self._jitted = jax.jit(fn, donate_argnums=donate)
        self._n_item_args = n_item_args

    def _dispatch(self) -> None:
        """Stack pending items, pad the tail, enqueue one batch."""
        if not self._pending_args:
            return
        t0 = time.time()
        args, handles = self._pending_args, self._pending_handles
        self._pending_args, self._pending_handles = [], []
        live = len(args)
        if self._jitted is None:
            self._build_jit(len(args[0]))
        pad = self.batch - live
        if pad:
            args = args + [args[-1]] * pad
        if self.batch == 1:
            stacked = args[0]
        else:
            stacked = tuple(
                jnp.stack([a[i] for a in args])
                for i in range(self._n_item_args))
        first = self.stats.batches == 0
        out = self._jitted(self.consts, *stacked)
        self._last_out = out
        for i, h in enumerate(handles):
            if self.batch == 1:
                h._resolve(out)
            else:
                h._resolve(jax.tree_util.tree_map(lambda x: x[i], out))
        dt = time.time() - t0
        self.stats.batches += 1
        self.stats.items += live
        self.stats.padded_lanes += pad
        self.stats.dispatch_s += dt
        if first:
            self.stats.first_batch_s = dt

    # -- public -------------------------------------------------------

    def submit(self, *item_args) -> BatchHandle:
        """Queue one item; dispatches automatically when B items are
        pending.  Returns a handle whose `result()` yields the output."""
        h = BatchHandle(self)
        self._pending_args.append(tuple(item_args))
        self._pending_handles.append(h)
        if len(self._pending_args) == self.batch:
            self._dispatch()
        return h

    def flush(self, handles: Optional[Sequence[BatchHandle]] = None):
        """Dispatch any pending partial batch.  Returns `handles` (or
        None) for fluent use."""
        self._dispatch()
        return handles

    def map(self, items: Sequence[Sequence[Any]]) -> List[Any]:
        """Submit every item, flush, and gather results in order."""
        handles = [self.submit(*it) for it in items]
        self.flush()
        return [h.result() for h in handles]

    def throughput(self) -> float:
        """Items/s over host dispatch time, after forcing completion of
        everything dispatched so far."""
        if self._last_out is not None:
            for leaf in jax.tree_util.tree_leaves(self._last_out):
                leaf.block_until_ready()
        if self.stats.dispatch_s <= 0:
            return 0.0
        return self.stats.items / self.stats.dispatch_s


def pipeline_map(step_fn: Callable, consts: Any,
                 items: Sequence[Sequence[Any]], batch: int = 8,
                 donate: bool = True) -> List[Any]:
    """One-shot convenience: run `items` through a StreamExecutor."""
    ex = StreamExecutor(step_fn, consts, batch=batch, donate=donate)
    return ex.map(items)

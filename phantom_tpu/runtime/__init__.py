"""Serving runtime: sustained-throughput execution of FHE op streams.

The reference is a single-request CUDA library (every verb is one kernel
launch sequence on cudaStreamPerThread, include/cuda_wrapper.cuh:47-63);
production serving on TPU instead wants *batched, pipelined* dispatch:
one fixed-shape XLA executable per (op, batch) pair, host batch assembly
overlapped with device compute via JAX async dispatch, and input buffer
donation so HBM working-set stays flat.  This package provides that
runtime layer.
"""

from .executor import BatchHandle, ExecutorStats, StreamExecutor, pipeline_map

__all__ = ["StreamExecutor", "BatchHandle", "ExecutorStats", "pipeline_map"]

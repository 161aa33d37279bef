"""Multi-host (pod) support.

Single-controller JAX semantics: after `initialize()`, every host runs the
same SPMD program over the global mesh; the codec pipeline
(`parallel.pipeline.BatchCodec`) then shards streams globally, and each
host addresses only its local shard of the byte buffers.

Determinism contract for tables (SURVEY.md hard part #4): range-coding
tables must be identical on every host.  `build_tables_replicated` builds
them on process 0 and broadcasts, sidestepping any cross-host float
nondeterminism.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np

__all__ = ["initialize", "build_tables_replicated", "gather_bytes"]


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None):
    """jax.distributed.initialize wrapper (no-op when single-process)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)


def build_tables_replicated(build_fn):
    """Builds range-coding tables on process 0 and broadcasts them.

    Args:
      build_fn: () -> (cdf ragged np.int32, cdf_offset np.int32).

    Returns:
      (cdf, cdf_offset), identical on every process.
    """
    if jax.process_count() == 1:
        return build_fn()
    from jax.experimental import multihost_utils

    if jax.process_index() == 0:
        cdf, cdf_offset = build_fn()
        shapes = np.asarray([cdf.shape[0], cdf_offset.shape[0]], np.int32)
    else:
        shapes = np.zeros(2, np.int32)
    shapes = multihost_utils.broadcast_one_to_all(shapes)
    if jax.process_index() != 0:
        cdf = np.zeros(int(shapes[0]), np.int32)
        cdf_offset = np.zeros(int(shapes[1]), np.int32)
    cdf = multihost_utils.broadcast_one_to_all(cdf)
    cdf_offset = multihost_utils.broadcast_one_to_all(cdf_offset)
    return np.asarray(cdf, np.int32), np.asarray(cdf_offset, np.int32)


def gather_bytes(buf_local, lengths_local):
    """Gathers per-stream byte buffers from all processes in process order.

    The stream axis is sharded process-major, so concatenating per-process
    shards in process_index order reproduces the global stream order (and
    therefore the container byte layout) exactly.
    """
    if jax.process_count() == 1:
        return np.asarray(buf_local), np.asarray(lengths_local)
    from jax.experimental import multihost_utils

    buf = multihost_utils.process_allgather(np.asarray(buf_local))
    lengths = multihost_utils.process_allgather(np.asarray(lengths_local))
    return (buf.reshape(-1, buf.shape[-1]), lengths.reshape(-1))

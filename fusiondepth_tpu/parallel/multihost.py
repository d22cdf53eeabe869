"""Multi-host distributed bring-up and per-host input sharding.

The reference is a single-process, single-GPU codebase (SURVEY §2.3); the
multi-host story here is the *introduced* TPU-pod plan from SURVEY §5:

  - `jax.distributed.initialize` connects the per-host processes (one
    process per TPU host); ICI carries the gradient psum inside the jitted
    step, DCN is used only for this control-plane bring-up and for input
    dispatch.
  - Each host reads a DISJOINT slice of the training split
    (`shard_lines`) and assembles its process-local arrays into globally
    sharded `jax.Array`s with `jax.make_array_from_process_local_data`
    (`global_batch`) — no host ever materializes the global batch.

Everything here degrades to a no-op in single-process runs, so the same
Trainer code path serves one chip, one host with N chips, and M hosts.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_initialize_distributed(cfg) -> bool:
    """Connect this process to the coordinator when multi-host flags are
    set (--coordinator_address/--num_processes/--process_id, or the JAX
    env/TPU-metadata auto-detection when only --num_processes > 1).

    Must run before first backend use. Returns True if initialize() ran.
    """
    if cfg.coordinator_address is None and cfg.num_processes <= 1:
        return False
    kw = {}
    if cfg.coordinator_address:
        kw["coordinator_address"] = cfg.coordinator_address
    if cfg.num_processes > 1:
        kw["num_processes"] = cfg.num_processes
    if cfg.process_id >= 0:
        kw["process_id"] = cfg.process_id
    jax.distributed.initialize(**kw)
    return True


def shard_lines(lines: Sequence[str],
                process_index: Optional[int] = None,
                process_count: Optional[int] = None) -> list:
    """This host's strided slice of the split's file lines.

    Truncates to a per-host-equal count so every process runs the same
    number of steps (collectives stay aligned). Single-process: identity.
    """
    pc = process_count if process_count is not None else jax.process_count()
    pi = process_index if process_index is not None else jax.process_index()
    assert 0 <= pi < pc, (pi, pc)
    if pc == 1:
        return list(lines)
    n = (len(lines) // pc) * pc
    return list(lines[pi:n:pc])


def local_batch_size(global_batch_size: int,
                     process_count: Optional[int] = None) -> int:
    """Per-host batch size for a global batch. The global size must divide
    evenly — uneven host batches would desynchronize the data-parallel
    collectives."""
    pc = process_count if process_count is not None else jax.process_count()
    assert global_batch_size % pc == 0, (
        f"global batch {global_batch_size} not divisible by "
        f"{pc} processes")
    return global_batch_size // pc


def global_batch(local: Dict[str, np.ndarray], mesh: Mesh,
                 axis: str = "data") -> Dict[str, jax.Array]:
    """Assemble process-local host arrays into globally batch-sharded
    jax.Arrays (leading axis over `axis`). Works single-process too, where
    it is equivalent to parallel.shard_batch."""
    sh = NamedSharding(mesh, P(axis))
    return {
        k: jax.make_array_from_process_local_data(sh, np.asarray(v))
        for k, v in local.items()
    }

"""Multi-host scaffolding (parallel/multihost.py): per-host split sharding,
local->global batch assembly, and the single-process degenerate path.

The logic that CAN run without multiple processes is unit-tested directly
(SURVEY §5's plan: jax.distributed.initialize + DCN input sharding); the
initialize() call itself is exercised only for its no-op path.
"""

import jax
import jax.numpy as jnp
import numpy as np

from fusiondepth_tpu.config import Config
from fusiondepth_tpu.parallel import (
    global_batch,
    local_batch_size,
    make_mesh,
    maybe_initialize_distributed,
    shard_batch,
    shard_lines,
)


def test_shard_lines_partitions_disjoint_and_equal():
    lines = [f"l{i}" for i in range(23)]
    shards = [shard_lines(lines, pi, 4) for pi in range(4)]
    # equal per-host counts (truncated to a multiple of process_count)
    assert all(len(s) == 5 for s in shards)
    flat = [x for s in shards for x in s]
    assert len(set(flat)) == len(flat) == 20
    assert set(flat) <= set(lines)


def test_shard_lines_single_process_identity():
    lines = ["a", "b", "c"]
    assert shard_lines(lines, 0, 1) == lines


def test_local_batch_size():
    assert local_batch_size(12, 4) == 3
    assert local_batch_size(12, 1) == 12
    try:
        local_batch_size(10, 4)
        assert False, "expected assertion"
    except AssertionError:
        pass


def test_global_batch_matches_shard_batch_single_process():
    assert len(jax.devices()) == 8
    mesh = make_mesh()
    rng = np.random.default_rng(0)
    local = {"x": rng.random((8, 4, 6), np.float32),
             "y": rng.random((8, 2), np.float32)}
    ga = global_batch(local, mesh)
    sb = shard_batch({k: jnp.asarray(v) for k, v in local.items()}, mesh)
    for k in local:
        np.testing.assert_array_equal(np.asarray(ga[k]), np.asarray(sb[k]))
        assert ga[k].sharding.is_equivalent_to(sb[k].sharding, ga[k].ndim)


def test_maybe_initialize_distributed_noop_by_default():
    assert maybe_initialize_distributed(Config()) is False


def test_trainer_uses_local_batch_and_sharded_lines(monkeypatch):
    """The Trainer divides the global batch across processes and strides the
    split lines — simulated by faking process_count/index."""
    import fusiondepth_tpu.parallel.multihost as mh

    monkeypatch.setattr(jax, "process_count", lambda: 4)
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    lines = [str(i) for i in range(10)]
    assert mh.shard_lines(lines) == ["1", "5"]
    assert mh.local_batch_size(8) == 2

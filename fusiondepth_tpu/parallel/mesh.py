"""Device mesh + sharding helpers.

The reference is single-GPU with no distributed backend (SURVEY §2.3), so
parallelism here is *introduced*, TPU-style: a 1-D data mesh over all chips
(ICI), params replicated, batches sharded on the leading axis. XLA GSPMD
inserts the gradient psum automatically when the jitted train step closes
over sharded inputs — no hand-written collectives needed for pure DP.

The largest model (ResNet-50 x4 encoders + decoders, ~60M params at 640x192)
fits one chip comfortably; TP/PP are unnecessary for this workload. The mesh
axes are still named ("data", "model") so spatial/model sharding can be added
without changing call sites.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Sequence[int] = (), axis_names: Sequence[str] = ()):
    """Create a device mesh. Default: all devices on one 'data' axis."""
    devices = jax.devices()
    if not shape:
        shape = (len(devices),)
        axis_names = ("data",)
    elif not axis_names:
        axis_names = ("data", "model")[: len(shape)]
    dev_array = np.array(devices[: int(np.prod(shape))]).reshape(shape)
    return Mesh(dev_array, axis_names)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis across `axis`."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Device-put a host batch with its leading axis sharded over the mesh."""
    sh = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)

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

from typing import Sequence

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


# ---- spatial (H-axis) sharding: batch x space meshes --------------------
#
# For full-resolution workloads (352x1216 completion) the image height can
# be sharded over a second mesh axis; XLA GSPMD inserts the conv halo
# exchanges and warp-gather collectives automatically. Batch keys and their
# sharded dims:

_SPATIAL_SPECS = {
    "color": P("data", None, "space"),        # (B, F, H, W, C)
    "color_aug": P("data", None, "space"),
    "two_channel": P("data", None, "space"),
    "four_beam": P("data", "space"),          # (B, H, W, 1)
    "inf_gdc": P("data", "space"),
    "K": P("data"),
    "inv_K": P("data"),
    "stereo_T": P("data"),
}


def make_mesh_2d(dp: int, sp: int) -> Mesh:
    """(data, space) mesh: dp-way batch x sp-way image-height sharding."""
    devices = jax.devices()
    assert dp * sp <= len(devices), (dp, sp, len(devices))
    return Mesh(np.array(devices[: dp * sp]).reshape(dp, sp),
                ("data", "space"))


def shard_batch_spatial(batch, mesh: Mesh):
    out = {}
    for k, v in batch.items():
        spec = _SPATIAL_SPECS.get(k, P("data"))
        out[k] = jax.device_put(v, NamedSharding(mesh, spec))
    return out

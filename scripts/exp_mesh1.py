"""One-off: validate the MESHED train step on the real chip.

The 8-device dryrun runs on CPU, where the Pallas fast paths are gated
off — so the composition GSPMD + shard_map + Mosaic (the path a real
multi-chip pod executes) is otherwise never compiled against the actual
TPU toolchain. A 1-device mesh exercises exactly that program: shardings
annotated, shard_map wrapping the Pallas warp, collectives degenerate.

Usage: python scripts/exp_mesh1.py [--set key=value ...]
Prints `mesh1: ok loss=<finite>` on success.
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from bench import _parse_set


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--set", action="append", metavar="KEY=VALUE")
    args = p.parse_args()

    from fusiondepth_tpu.config import Config
    from fusiondepth_tpu.data.synthetic import make_batch
    from fusiondepth_tpu.models.fusion import FusionNets
    from fusiondepth_tpu.parallel.mesh import (
        make_mesh,
        replicated_sharding,
        shard_batch,
    )
    from fusiondepth_tpu.training.train_state import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    n = jax.device_count()
    on_tpu = jax.devices()[0].platform != "cpu"
    base = dict(num_layers=18, height=192, width=640, batch_size=4 * n,
                compute_dtype="bfloat16" if on_tpu else "float32",
                pallas_warp=on_tpu, use_mesh=True)
    base.update(_parse_set(getattr(args, "set", None)))
    cfg = Config(**base)

    mesh = make_mesh()
    print(f"mesh={mesh.shape} devices={n}", file=sys.stderr)
    nets = FusionNets(cfg)
    tx = make_optimizer(cfg, 1000)
    state = create_train_state(cfg, nets, jax.random.PRNGKey(0), tx)
    state = jax.device_put(state, replicated_sharding(mesh))
    batch = shard_batch(
        jax.tree.map(jnp.asarray, make_batch(cfg, cfg.batch_size)), mesh)

    step = jax.jit(make_train_step(cfg, nets, tx, mesh=mesh),
                   donate_argnums=0)
    rng = jax.random.PRNGKey(1)
    for i in range(2):
        rng, k = jax.random.split(rng)
        state, losses = step(state, batch, k)
    loss = float(losses["loss"])  # true sync
    ok = bool(jnp.isfinite(loss))
    print(f"mesh1: {'ok' if ok else 'NON-FINITE'} loss={loss:.4f}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())

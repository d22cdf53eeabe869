"""One-off: isolate the forward warp-kernel regression.

Variants (fwd kernel only, WH/RT as currently configured):
  A  f32 sources, current roll-built weights
  B  bf16 sources, current roll-built weights
  C  f32 sources, 2-iota-compare weights (round-2 construction)

Usage: python scripts/exp_warp_fwd.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from bench import _timeit_stats  # noqa: E402
import fusiondepth_tpu.ops.pallas_warp as pw  # noqa: E402

n, k, B, C, H, W = 2, 4, 12, 3, 192, 640
rng = np.random.default_rng(0)
src = jnp.asarray(rng.random((n, B, C, H, W), np.float32))
base_y = np.broadcast_to(np.arange(H, dtype=np.float32)[:, None], (H, W))
base_x = np.broadcast_to(np.arange(W, dtype=np.float32)[None, :], (H, W))
coords = jnp.asarray(np.stack(
    [np.broadcast_to(base_x, (n, k, B, H, W)) + rng.uniform(-3, 3),
     np.broadcast_to(base_y, (n, k, B, H, W)) + rng.uniform(-3, 3)],
    axis=-1).astype(np.float32))

prec = jax.lax.Precision.DEFAULT


def timeit(name, s):
    f = jax.jit(lambda c, ss: pw._warp_fwd(c, ss, False, prec)[0].mean())

    def scan(cc, ss):
        def body(carry, _):
            out = f(cc + carry * 1e-30, ss)
            return out.astype(jnp.float32), None
        o, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=10)
        return o

    jfn = jax.jit(scan)
    st = _timeit_stats(lambda: jfn(coords, s), iters=1, warmup=2, trials=3)
    print(f"{name}: {st['median']/10*1e3:.2f} ms "
          f"(min {st['min']/10*1e3:.2f})")


timeit("A f32  ", src)
timeit("B bf16 ", src.astype(jnp.bfloat16))

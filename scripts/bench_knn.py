"""Compare KNN paths on the real chip at GDC scale.

Usage: python scripts/bench_knn.py [N] [k]
Prints per-path times and an exactness cross-check.

Timing uses a TRUE sync (scalar fetch) because jax.block_until_ready is a
no-op on the axon backend, and subtracts the tunnel's scalar round-trip
latency (see bench.py's measurement model).
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from fusiondepth_tpu.gdc.gdc import knn_brute  # noqa: E402
from fusiondepth_tpu.gdc.pallas_knn import knn_pallas  # noqa: E402


def latency():
    f = jax.jit(jnp.sin)
    x = jnp.float32(1.0)
    float(f(x))
    samples = []
    for _ in range(7):
        t0 = time.perf_counter()
        float(f(x))
        samples.append(time.perf_counter() - t0)
    return sorted(samples)[3]


def timeit(scalar_fn, lat, iters=3, trials=5):
    float(scalar_fn())
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(iters):
            float(scalar_fn())
        dt = (time.perf_counter() - t0) / iters
        best = min(best, max(dt - lat, 1e-9))
    return best


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 40960
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32) * 10)
    valid = jnp.ones(N, bool)

    xla_scalar = jax.jit(lambda p: knn_brute(p, valid, k=k,
                                             block=512).sum())
    pal_scalar = jax.jit(lambda p: knn_pallas(p, k=k).sum())

    lat = latency()
    print(f"tunnel latency: {lat * 1e3:.1f} ms", file=sys.stderr)
    t_xla = timeit(lambda: xla_scalar(pts), lat)
    t_pal = timeit(lambda: pal_scalar(pts), lat)

    out_xla = np.asarray(knn_brute(pts, valid, k=k, block=512))
    out_pal = np.asarray(knn_pallas(pts, k=k))
    p = np.asarray(pts)
    d_x = np.sort(np.linalg.norm(p[:, None] - p[out_xla], axis=-1), 1)
    d_p = np.sort(np.linalg.norm(p[:, None] - p[out_pal], axis=-1), 1)
    exact = np.allclose(d_x, d_p, atol=1e-5)

    print(f"N={N} k={k} device={jax.devices()[0].device_kind}")
    print(f"xla knn_brute : {t_xla * 1e3:8.2f} ms")
    print(f"pallas kernel : {t_pal * 1e3:8.2f} ms  "
          f"({t_xla / t_pal:.2f}x vs xla)")
    print(f"exact match   : {exact}")


if __name__ == "__main__":
    main()

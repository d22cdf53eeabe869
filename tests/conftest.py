"""Test config: force CPU JAX with 8 virtual devices for sharding tests.

Must run before jax is imported anywhere. Note: the axon TPU sitecustomize
(PYTHONPATH=/root/.axon_site) registers the remote-TPU backend whenever
PALLAS_AXON_POOL_IPS is set — clear it so tests run on local CPU and not
through the TPU tunnel.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
if "collective_call" not in flags:
    # 8 per-device threads reach each all-reduce serially on this 1-core
    # box; XLA CPU's default 20 s/40 s rendezvous timers abort flakily
    # under load (same fix as __graft_entry__.dryrun_multichip)
    flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
              " --xla_cpu_collective_call_terminate_timeout_seconds=1800")
os.environ["XLA_FLAGS"] = flags.strip()

# the axon sitecustomize imports jax at interpreter start with
# JAX_PLATFORMS=axon baked in; env vars alone no longer win — the config
# value must be updated explicitly before first backend use.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

"""Test harness: force an 8-device virtual CPU mesh before any backend init.

The container's sitecustomize registers the `axon` TPU plugin and pins
jax_platforms to it; tests must run CPU-only (the single real chip is reserved
for bench runs, and two processes cannot share the tunnel).  jax.config.update
takes precedence over the env var, so we set it here, before any test imports
trigger backend initialization.  Multi-chip sharding paths are validated on
the 8 virtual CPU devices; the driver separately dry-runs
`__graft_entry__.dryrun_multichip`.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# xla::DefaultThreadPoolSize() honors NPROC: the CPU client's execution pool
# must be able to run 8 blocking partitions concurrently (the pallas TPU
# interpret simulator parks one thread per simulated device inside in-kernel
# semaphore waits; a cpu_count-sized pool deadlocks the 8-way butterfly)
os.environ.setdefault("NPROC", "24")

import jax

jax.config.update("jax_platforms", "cpu")

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

import jax

jax.config.update("jax_platforms", "cpu")

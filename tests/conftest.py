"""Test configuration: force CPU with 8 virtual devices so multi-chip sharding
paths are exercised without TPU hardware.

NOTE: on this machine a sitecustomize imports jax at interpreter startup (TPU
'axon' plugin), so environment variables set here are too late for jax's
config snapshot — but backends initialize lazily, so `jax.config.update`
still wins as long as no array op has run yet.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

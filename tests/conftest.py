"""Test configuration: force CPU with 8 virtual devices and x64.

Mirrors the reference's test precision (``run_tsadar.py:7`` enables x64 everywhere).
Multi-chip sharding paths are exercised on a virtual 8-device CPU mesh, per the
standard TPU-development workflow (real multi-chip hardware is not required for
compile/execute validation of shardings).
"""

import os

# must be set before jax is imported anywhere (the outer environment pins
# JAX_PLATFORMS=axon, the single real TPU chip; tests run on a virtual CPU mesh)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# also set via config in case a plugin imported jax before this conftest ran
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)

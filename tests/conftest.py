"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Mirrors the distributed-test strategy from SURVEY.md §4(4): multi-chip sharding
is validated on host CPU devices; real-TPU runs happen in bench.py only.
"""
import os

# Force CPU: the harness exports JAX_PLATFORMS=axon (real TPU tunnel) and its
# sitecustomize re-forces the platform after jax import, so setting the env
# var is not enough — update the config before any backend initializes.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

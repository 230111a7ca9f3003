"""Test harness: run everything on a virtual 8-device CPU mesh.

This is the TPU-native substitute for the reference's missing fake distributed
backend (SURVEY.md §4): sharding/pjit logic is validated on
``--xla_force_host_platform_device_count=8`` CPU devices, exactly how the
driver's ``dryrun_multichip`` validates the real multi-chip path.

NOTE: the environment's axon TPU plugin force-sets ``jax_platforms=axon,cpu``
at import time (env vars like JAX_PLATFORMS are ignored), so we must override
through ``jax.config`` after importing jax but before any backend is created.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.pop("JAX_PLATFORMS", None)
os.environ["JAX_PLATFORM_NAME"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.device_count() == 8, jax.devices()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the TPU-native substitute for multi-node testing without a cluster
(see SURVEY.md §4): XLA exposes 8 host devices, so sharding/collective code
paths compile and execute exactly as they would across a TPU slice.

NOTE: in this environment the axon TPU plugin ignores the JAX_PLATFORMS
environment variable, so we must also force the platform through jax.config
before any backend is initialized.
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

"""Test configuration: run all tests on a virtual 8-device CPU backend.

Multi-device sharding tests use the standard JAX fake-backend trick
(``xla_force_host_platform_device_count``) so pjit/shard_map paths are
exercised without a real TPU slice (SURVEY.md §4).

Note: this container's sitecustomize pre-imports jax and registers the
'axon' TPU platform, so env vars alone are too late — we must flip the
platform via ``jax.config`` before any backend is initialized.
"""
import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

"""Test harness config: run all tests on a virtual 8-device CPU mesh.

Mirrors SURVEY §4's prescription: multi-device logic is validated with
``xla_force_host_platform_device_count=8`` on the CPU backend so no real
multi-chip hardware is needed. The sandbox presets the ``axon`` TPU platform
via env, which ignores ``JAX_PLATFORMS`` — so we override through
``jax.config`` after import (before any backend touch).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

"""Test harness config: run all tests on a virtual 8-device CPU mesh.

Mirrors SURVEY §4's prescription: multi-device logic is validated with
``XLA_FLAGS=--xla_force_host_platform_device_count=8`` on the CPU backend so
no real multi-chip hardware is needed.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

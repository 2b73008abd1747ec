"""Test env: force an 8-device virtual CPU mesh before JAX initializes.

This is the TPU analogue of 'multi-node without a real cluster' (SURVEY.md §4):
sharding tests run on 8 virtual CPU devices via
--xla_force_host_platform_device_count.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the host may pre-set a TPU platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

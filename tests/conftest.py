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

# The sandbox's sitecustomize pins JAX_PLATFORMS=axon (a tunneled TPU with
# ~1s/op dispatch and minutes-long remote compiles); the env var alone is not
# honored after the plugin registers, so force the CPU platform through the
# config API before any backend initialization.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()
assert jax.local_device_count() == 8, jax.devices()

# Persistent compilation cache: XLA:CPU compiles are extremely slow in this
# sandbox (~minutes for the train step), so cache executables on disk across
# test processes.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_ENABLE_XLA_CACHES",
                      "all")

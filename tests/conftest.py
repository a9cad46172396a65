"""Test harness: force the CPU backend with a virtual 8-device mesh so
sharding semantics are testable without TPU hardware.

NOTE: the environment presets JAX_PLATFORMS=axon (a remote TPU tunnel) and
some pytest plugin may import jax before this file's env mutations, so the
backend is forced via jax.config (effective until the first backend use),
not just the environment."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)

assert jax.default_backend() == "cpu", jax.default_backend()

# Persistent compilation cache: kernels with associative scans compile
# slowly; cache across test runs.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

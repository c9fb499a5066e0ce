"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding logic is validated without TPU hardware by forcing the host
platform to expose 8 XLA CPU devices; Pallas kernels run in interpreter mode
(they detect the CPU backend themselves).
"""

import os

# Force CPU: the driver environment presets JAX_PLATFORMS=axon (the real TPU
# tunnel) — tests must run on the virtual CPU device mesh instead.
os.environ["JAX_PLATFORMS"] = "cpu"
# torch (used as the golden reference in parity tests) and XLA-CPU both spin up
# OpenMP/Eigen thread pools; unpinned they intermittently deadlock each other.
os.environ.setdefault("OMP_NUM_THREADS", "1")
os.environ.setdefault("MKL_NUM_THREADS", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The env var alone is not enough: the driver's site config pre-seeds
# jax_platforms="axon,cpu", so override the config directly.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)
# Parity tests compare against float64 NumPy: keep f32 matmuls exact.
jax.config.update("jax_default_matmul_precision", "highest")
# Cache compiled executables across test runs (single-threaded XLA-CPU compiles
# dominate wall time otherwise).
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

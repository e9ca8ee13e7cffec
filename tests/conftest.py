"""Test configuration: force an 8-virtual-device CPU backend.

TPU-build analogue of the reference's multi-GPU CI (SURVEY §4): sharding logic is
validated on a virtual 8-device CPU mesh so the suite runs anywhere.

NOTE: the axon TPU sandbox initializes jax at interpreter startup (sitecustomize), so
env vars set here are too late — ``jax.config.update`` is the reliable override.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # for any subprocesses
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_backend_optimization_level" not in flags:
    # tests are compile-bound, not compute-bound: O0 cuts cold-cache compile time
    # ~30% with no effect on the golden-parity tolerances (validated full-suite)
    flags = (flags + " --xla_backend_optimization_level=0").strip()
os.environ["XLA_FLAGS"] = flags

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Persistent compilation cache: repeated jit compiles dominate suite runtime
# (model configs are identical across tests/runs) — shared across xdist workers.
jax.config.update("jax_compilation_cache_dir", os.environ.get("SG_JAX_CACHE", "/tmp/sg_tpu_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

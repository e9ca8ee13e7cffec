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
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

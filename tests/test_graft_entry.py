"""Execute the driver entry points (``__graft_entry__.py``) exactly as the driver does.

Round-4 postmortem: the multichip dryrun regressed (TP probe batch 2 on a batch-axis-4
mesh) and sailed through a 471-test suite because nothing in ``tests/`` ran the one
program the outside world runs. These tests close that hole — they are the repo-side
equivalent of the reference running its distributed tests directly in CI
(``/root/reference/.circleci/config.yml:604-605``).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.heavy
def test_entry_compiles_and_runs():
    """entry() returns (fn, example_args) and fn compiles + executes under jit."""
    sys.path.insert(0, REPO)
    import jax

    from __graft_entry__ import entry

    fn, example_args = entry()
    out = jax.jit(fn)(*example_args)
    # fused predict program: boxes/scores/labels/valid counts, all fixed-shape
    leaves = jax.tree_util.tree_leaves(out)
    assert leaves, "entry() returned no arrays"
    for arr in leaves:
        assert arr.shape[0] == 1  # batch dim preserved


@pytest.mark.heavy
def test_dryrun_multichip_8_devices():
    """Run dryrun_multichip(8) in a fresh process — the exact driver invocation.

    A subprocess (not in-process) so the CPU-backend forcing, import-time behavior,
    and global device_config mutation are exercised exactly as the driver sees them.
    """
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        flags = (flags + " --xla_force_host_platform_device_count=8").strip()
    env["XLA_FLAGS"] = flags
    env.setdefault("JAX_COMPILATION_CACHE_DIR", os.environ.get("SG_JAX_CACHE", "/tmp/sg_tpu_jax_cache"))

    proc = subprocess.run(
        [sys.executable, "-c", "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    assert proc.returncode == 0, (
        f"dryrun_multichip(8) failed (rc={proc.returncode})\n"
        f"--- stdout tail ---\n{proc.stdout[-3000:]}\n--- stderr tail ---\n{proc.stderr[-3000:]}"
    )
    assert "dryrun_multichip OK" in proc.stdout
    # the flagship demo must not trip the repo's own silent-drop guard
    combined = proc.stdout + proc.stderr
    assert "silent-drop guard" not in combined, (
        f"dryrun passed unconsumed training_params:\n{combined[-2000:]}"
    )

"""Smoke tests for the driver entry points.

Round-1 post-mortem: the driver's 8-device dryrun failed on a platform
pinning bug that no default-suite test exercised (VERDICT.md "What's weak"
#8). These tests run the exact driver path — ``entry()`` compile check and
``dryrun_multichip`` — so a platform or sharding regression fails the suite
before the driver sees it.
"""

import os
import subprocess
import sys

import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_entry_compiles_and_runs():
    sys.path.insert(0, REPO)
    try:
        import __graft_entry__ as g
    finally:
        sys.path.remove(REPO)
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out.alive)
    assert int(out.alive.sum()) > 0


def test_dryrun_multichip_in_process():
    # conftest already pinned an 8-device CPU mesh; this exercises the
    # sharded step + render logic on 2 devices.
    sys.path.insert(0, REPO)
    try:
        import __graft_entry__ as g
    finally:
        sys.path.remove(REPO)
    g.dryrun_multichip(2)


def test_dryrun_multichip_fresh_process():
    # The real driver path: a fresh interpreter with the ambient TPU plugin
    # still registered and no XLA_FLAGS preset. dryrun_multichip must pin
    # the CPU platform itself (the round-1 failure mode).
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    env.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(REPO, ".jax_test_cache"),
    )
    proc = subprocess.run(
        [sys.executable, "-c", "import __graft_entry__ as g; g.dryrun_multichip(2)"],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, f"stdout={proc.stdout}\nstderr={proc.stderr}"
    assert "dryrun_multichip OK" in proc.stdout

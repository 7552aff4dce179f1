"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Real-TPU benchmarking happens in ``bench.py``; unit and sharding tests run on
the host so they exercise the multi-device code paths (pjit/shard_map over a
Mesh) without TPU hardware — same trick as the reference's headless CPU
contract tests (reference: src/render/headless_batching_tests.rs).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)

"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Real-TPU benchmarking happens in ``bench.py``; unit and sharding tests run on
the host so they exercise the multi-device code paths (pjit/shard_map over a
Mesh) without TPU hardware — same trick as the reference's headless CPU
contract tests (reference: src/render/headless_batching_tests.rs).
"""

import os

# Force CPU: the ambient environment pre-sets JAX_PLATFORMS=axon (the real
# TPU tunnel), which would funnel every unit-test op through the tunnel.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin (registered by a sitecustomize hook) overrides the
# JAX_PLATFORMS env var; the config update is authoritative. Backends lock
# at first init, so the on-device suite (HANABI_TPU_TESTS=1, see
# test_tpu_device.py) must keep the TPU platform registered.
if os.environ.get("HANABI_TPU_TESTS") != "1":
    jax.config.update("jax_platforms", "cpu")
    assert (
        jax.default_backend() == "cpu"
    ), "unit tests must not run over the TPU tunnel"
jax.config.update("jax_enable_x64", False)

# Persistent compile cache: the suite triggers hundreds of small jit
# compiles; caching them makes warm reruns several times faster.
_CACHE_DIR = os.path.join(os.path.dirname(__file__), "..", ".jax_test_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE_DIR))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.05)

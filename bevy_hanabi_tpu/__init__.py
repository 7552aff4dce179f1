"""bevy_hanabi_tpu — a TPU-native particle-VFX framework.

A brand-new JAX/XLA/Pallas re-design of the capabilities of the ``bevy_hanabi``
GPU particle system (reference mounted read-only at ``/root/reference``):
effect authoring via an expression graph + modifiers, compiled to fused,
jit-compiled TPU step functions over SoA particle pools, with a point-splat
rasterizer for billboard/ribbon rendering and mesh-sharded multi-chip scaling.
"""

from .values import (  # noqa: F401
    BOOL,
    FLOAT,
    INT,
    UINT,
    VEC2F,
    VEC3F,
    VEC4F,
    MatrixType,
    MatrixValue,
    ScalarType,
    ScalarValue,
    VectorType,
    VectorValue,
    as_value,
)
from .attributes import Attribute, ParticleLayout  # noqa: F401
from .asset import (  # noqa: F401
    AlphaMode,
    EffectAsset,
    EffectParent,
    MotionIntegration,
    SimulationCondition,
    SimulationSpace,
)
from .compiler import SimParams  # noqa: F401
from .cpu_value import CpuValue  # noqa: F401
from .gradient import Gradient, GradientKey  # noqa: F401
from .graph import ExprWriter, Module  # noqa: F401
from .properties import EffectProperties, Property, PropertyLayout  # noqa: F401
from .spawn import EffectSpawner, SpawnerBank, SpawnerSettings  # noqa: F401
from .time import EffectSimulationClock  # noqa: F401
from . import modifiers  # noqa: F401
from .modifiers import *  # noqa: F401,F403

# Prelude-style re-exports of the runtime and render surface, mirroring the
# reference's ``pub mod prelude`` (lib.rs:223-226) so a user of the reference
# finds the whole working set at the package top level.
from .runtime.effect import CompiledEffect, StepInputs  # noqa: F401
from .runtime.scene import EffectInstance, HanabiScene  # noqa: F401
from .runtime.instanced import InstancedEffect  # noqa: F401
from .render.camera import CameraParams  # noqa: F401
from .render.mesh import ParticleMesh  # noqa: F401
from .render.raster import RasterConfig, rasterize  # noqa: F401
from .render.renderer import EffectRenderer  # noqa: F401
from .parallel.mesh import ShardedEffect, make_mesh  # noqa: F401
from .parallel.render import ShardedRenderer  # noqa: F401
from .utils.profiling import DebugSettings, profile_span  # noqa: F401

__version__ = "0.3.0"

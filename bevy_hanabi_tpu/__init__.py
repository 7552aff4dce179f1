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
from .gradient import Gradient  # noqa: F401
from .graph import ExprWriter, Module  # noqa: F401
from .properties import EffectProperties, Property, PropertyLayout  # noqa: F401
from .spawn import EffectSpawner, SpawnerBank, SpawnerSettings  # noqa: F401
from .time import EffectSimulationClock  # noqa: F401
from . import modifiers  # noqa: F401
from .modifiers import *  # noqa: F401,F403

__version__ = "0.3.0"

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

__version__ = "0.1.0"

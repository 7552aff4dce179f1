"""Simulation runtime: particle pools, compiled effect steps, scenes."""

from .pool import ParticlePool  # noqa: F401
from .effect import CompiledEffect, StepInputs  # noqa: F401

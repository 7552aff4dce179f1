"""Auxiliary subsystems: profiling, debug capture, checkpointing."""

from .profiling import DebugSettings, profile_span  # noqa: F401
from .checkpoint import load_scene_state, save_scene_state  # noqa: F401

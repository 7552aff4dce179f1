"""Auxiliary subsystems: profiling, debug capture, checkpointing, logging."""

from .profiling import DebugSettings, profile_span  # noqa: F401
from .checkpoint import load_scene_state, save_scene_state  # noqa: F401
from .diag import logger, reset_warn_once, warn_once  # noqa: F401

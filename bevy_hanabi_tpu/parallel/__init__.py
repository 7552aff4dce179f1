"""Multi-chip scaling via jax.sharding meshes."""

from .mesh import ShardedEffect, make_mesh  # noqa: F401
from .render import ShardedRenderer  # noqa: F401

"""Camera parameters and projection math.

The reference leans on Bevy's render pipeline for view/projection (its
``View`` uniform); here cameras are small pytrees of matrices consumed by
the extraction and raster stages.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["CameraParams", "look_at", "perspective", "orthographic"]


@dataclass
class CameraParams:
    """View/projection for one render view.

    view:      4x4 world→view matrix
    proj:      4x4 view→clip matrix
    viewport:  (width, height) in pixels
    """

    view: Any
    proj: Any
    viewport: Tuple[int, int]

    # -- derived quantities used by render modifiers -----------------------

    @property
    def world_from_view(self) -> jnp.ndarray:
        """Inverse view matrix (camera→world)."""
        return jnp.linalg.inv(self.view)

    @property
    def rotation(self) -> jnp.ndarray:
        """3x3 camera rotation in world space: columns = right, up, back.

        Equivalent of the reference's ``get_camera_rotation_effect_space()``
        (vfx_render.wgsl) for global-space effects.
        """
        return self.world_from_view[:3, :3]

    @property
    def position(self) -> jnp.ndarray:
        """Camera position in world space."""
        return self.world_from_view[:3, 3]

    @property
    def up(self) -> jnp.ndarray:
        """Camera up axis in world space (view.world_from_view[1].xyz)."""
        return self.world_from_view[:3, 1]

    @property
    def proj_scale(self) -> jnp.ndarray:
        """(clip_from_view[0][0], clip_from_view[1][1]) — used by
        ScreenSpaceSizeModifier."""
        return jnp.stack([self.proj[0, 0], self.proj[1, 1]])


jax.tree_util.register_dataclass(
    CameraParams, data_fields=["view", "proj"], meta_fields=["viewport"]
)


def look_at(eye, target, up=(0.0, 1.0, 0.0)) -> jnp.ndarray:
    """Right-handed world→view matrix looking from ``eye`` at ``target``."""
    eye = jnp.asarray(eye, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    up = jnp.asarray(up, jnp.float32)
    f = target - eye
    f = f / jnp.linalg.norm(f)
    r = jnp.cross(f, up)
    r = r / jnp.linalg.norm(r)
    u = jnp.cross(r, f)
    # camera looks down -Z in view space
    rot = jnp.stack([r, u, -f], axis=0)
    t = -rot @ eye
    m = jnp.zeros((4, 4), jnp.float32)
    m = m.at[:3, :3].set(rot).at[:3, 3].set(t).at[3, 3].set(1.0)
    return m


def perspective(fov_y: float, aspect: float, near: float, far: float) -> jnp.ndarray:
    """Right-handed perspective projection, depth mapped to [0, 1]."""
    f = 1.0 / np.tan(fov_y / 2.0)
    m = jnp.zeros((4, 4), jnp.float32)
    m = m.at[0, 0].set(f / aspect)
    m = m.at[1, 1].set(f)
    m = m.at[2, 2].set(far / (near - far))
    m = m.at[2, 3].set(near * far / (near - far))
    m = m.at[3, 2].set(-1.0)
    return m


def orthographic(
    left: float, right: float, bottom: float, top: float, near: float, far: float
) -> jnp.ndarray:
    """Orthographic projection (2D camera analogue), depth to [0, 1]."""
    m = jnp.zeros((4, 4), jnp.float32)
    m = m.at[0, 0].set(2.0 / (right - left))
    m = m.at[1, 1].set(2.0 / (top - bottom))
    m = m.at[2, 2].set(1.0 / (near - far))
    m = m.at[0, 3].set(-(right + left) / (right - left))
    m = m.at[1, 3].set(-(top + bottom) / (top - bottom))
    m = m.at[2, 3].set(near / (near - far))
    m = m.at[3, 3].set(1.0)
    return m


def camera_2d(viewport, scale: float = 1.0, z: float = 5.0) -> "CameraParams":
    """A Bevy-style 2D camera: orthographic, looking down -Z at the origin.

    ``scale`` is world units per half viewport height (zoom).
    """
    width, height = viewport
    aspect = width / height
    return CameraParams(
        view=look_at((0.0, 0.0, z), (0.0, 0.0, 0.0)),
        proj=orthographic(
            -scale * aspect, scale * aspect, -scale, scale, 0.1, z * 2.0
        ),
        viewport=viewport,
    )

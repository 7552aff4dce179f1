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

__all__ = [
    "CameraParams",
    "look_at",
    "perspective",
    "orthographic",
    "frustum_planes",
    "aabb_in_frustum",
]


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
        """Inverse view matrix (camera→world). View matrices built by this
        framework are always affine (look_at, optionally composed with an
        affine local transform), so the closed-form adjugate inverse
        applies — ``jnp.linalg.inv`` would lower to MXU dot_generals
        (ops/linalg.py). A user-supplied CONCRETE view with a projective
        bottom row still gets the true inverse (host f64, constant-folds
        into jitted programs); only a traced non-affine view — which
        nothing in this codebase produces, and whose values a trace cannot
        inspect — is assumed affine."""
        from ..ops.linalg import affine4_inv

        v = self.view
        if not isinstance(v, jax.core.Tracer):
            bottom = np.asarray(v)[3]
            if not np.array_equal(bottom, [0.0, 0.0, 0.0, 1.0]):
                return jnp.asarray(
                    np.linalg.inv(np.asarray(v, np.float64)).astype(
                        np.float32
                    )
                )
        return affine4_inv(jnp.asarray(v, jnp.float32))

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


def look_at(eye, target, up=(0.0, 1.0, 0.0)) -> np.ndarray:
    """Right-handed world→view matrix looking from ``eye`` at ``target``.

    Host numpy: camera matrices are authored on the host and constant-fold
    into jitted render programs (building them as device arrays costs a
    tunnel round-trip per op and makes scene depth sorting read back).
    """
    eye = np.asarray(eye, np.float32)
    target = np.asarray(target, np.float32)
    up = np.asarray(up, np.float32)
    f = target - eye
    f = f / np.linalg.norm(f)
    r = np.cross(f, up)
    r = r / np.linalg.norm(r)
    u = np.cross(r, f)
    # camera looks down -Z in view space
    rot = np.stack([r, u, -f], axis=0)
    t = -rot @ eye
    m = np.zeros((4, 4), np.float32)
    m[:3, :3] = rot
    m[:3, 3] = t
    m[3, 3] = 1.0
    return m


def perspective(fov_y: float, aspect: float, near: float, far: float) -> np.ndarray:
    """Right-handed perspective projection, depth mapped to [0, 1].

    ``fov_y`` is in RADIANS (like Bevy's PerspectiveProjection.fov).
    """
    if not 0.0 < fov_y < np.pi:
        raise ValueError(
            f"fov_y is in radians and must be in (0, pi); got {fov_y!r} — "
            "for degrees use math.radians(...)"
        )
    f = 1.0 / np.tan(fov_y / 2.0)
    m = np.zeros((4, 4), np.float32)
    m[0, 0] = f / aspect
    m[1, 1] = f
    m[2, 2] = far / (near - far)
    m[2, 3] = near * far / (near - far)
    m[3, 2] = -1.0
    return m


def orthographic(
    left: float, right: float, bottom: float, top: float, near: float, far: float
) -> np.ndarray:
    """Orthographic projection (2D camera analogue), depth to [0, 1]."""
    m = np.zeros((4, 4), np.float32)
    m[0, 0] = 2.0 / (right - left)
    m[1, 1] = 2.0 / (top - bottom)
    m[2, 2] = 1.0 / (near - far)
    m[0, 3] = -(right + left) / (right - left)
    m[1, 3] = -(top + bottom) / (top - bottom)
    m[2, 3] = near / (near - far)
    m[3, 3] = 1.0
    return m


def frustum_planes(camera: "CameraParams") -> np.ndarray:
    """Six world-space frustum planes of ``camera``, rows of [6, 4]
    ``(a, b, c, d)`` with ``a*x + b*y + c*z + d >= 0`` inside.

    Gribb-Hartmann extraction from the composite clip-from-world matrix.
    The projection maps depth to [0, 1] (see :func:`perspective`), so the
    near plane is clip row 2 itself (``z >= 0``), not ``w + z``. Host
    numpy: culling decisions are host-side plan decisions (the analogue of
    Bevy's frustum culling feeding RenderVisibleEntities, which the
    reference's queue_effects consumes per view, render/mod.rs:5581).
    """
    m = np.asarray(camera.proj, np.float64) @ np.asarray(
        camera.view, np.float64
    )
    return np.stack(
        [
            m[3] + m[0],  # left
            m[3] - m[0],  # right
            m[3] + m[1],  # bottom
            m[3] - m[1],  # top
            m[2],         # near (0 <= z_clip)
            m[3] - m[2],  # far  (z_clip <= w)
        ]
    ).astype(np.float32)


def aabb_in_frustum(planes: np.ndarray, mn, mx) -> bool:
    """Conservative AABB-vs-frustum test: False only when the box is fully
    outside some plane (the standard positive-vertex test; boxes straddling
    plane corners may report visible — never the reverse)."""
    mn = np.asarray(mn, np.float32)
    mx = np.asarray(mx, np.float32)
    n = planes[:, :3]
    p = np.where(n > 0.0, mx[None, :], mn[None, :])
    return bool(np.all((n * p).sum(axis=1) + planes[:, 3] >= 0.0))


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

"""Per-particle meshes (reference: EffectMesh component, lib.rs:745).

The reference instances an arbitrary Bevy mesh per particle. Here a
:class:`ParticleMesh` is a union of oriented quads in mesh space — each quad
becomes one raster entry, so the tile rasterizer needs no new primitive.
Quads are expressive enough for the particle-mesh use cases (billboards,
crosses, boxes, axis-aligned impostors); arbitrary triangle meshes would bin
triangle entries the same way.

Each quad q is (offset[3], axis_x[3], axis_y[3]) in mesh space; a particle's
frame (axis_x/axis_y/axis_z from orient modifiers, scaled by size) maps mesh
space into world space.
"""

from __future__ import annotations


import jax.numpy as jnp
import numpy as np

from .extract import ParticleDrawData

__all__ = ["ParticleMesh", "expand_mesh_draw"]


class ParticleMesh:
    """A union of oriented quads instanced per particle."""

    def __init__(self, offsets, axes_x, axes_y):
        self.offsets = np.asarray(offsets, np.float32).reshape(-1, 3)
        self.axes_x = np.asarray(axes_x, np.float32).reshape(-1, 3)
        self.axes_y = np.asarray(axes_y, np.float32).reshape(-1, 3)
        if not (len(self.offsets) == len(self.axes_x) == len(self.axes_y)):
            raise ValueError("mesh arrays must have equal quad counts")

    @property
    def num_quads(self) -> int:
        return len(self.offsets)

    # -- stock meshes ------------------------------------------------------

    @staticmethod
    def quad() -> "ParticleMesh":
        """The default single camera-oriented quad (the reference default)."""
        return ParticleMesh([[0, 0, 0]], [[1, 0, 0]], [[0, 1, 0]])

    @staticmethod
    def cross() -> "ParticleMesh":
        """Two perpendicular quads (cheap volumetric impostor)."""
        return ParticleMesh(
            [[0, 0, 0], [0, 0, 0]],
            [[1, 0, 0], [0, 0, 1]],
            [[0, 1, 0], [0, 1, 0]],
        )

    @staticmethod
    def cube(size: float = 1.0) -> "ParticleMesh":
        """Axis-aligned box from 6 face quads."""
        s = size / 2.0
        offsets, ax, ay = [], [], []
        for axis in range(3):
            for sign in (-1.0, 1.0):
                normal = np.zeros(3)
                normal[axis] = sign * s
                u = np.zeros(3)
                u[(axis + 1) % 3] = size
                v = np.zeros(3)
                v[(axis + 2) % 3] = size
                offsets.append(normal)
                ax.append(u)
                ay.append(v)
        return ParticleMesh(offsets, ax, ay)

    # -- serde --------------------------------------------------------------

    def to_json(self):
        return {
            "offsets": self.offsets.tolist(),
            "axes_x": self.axes_x.tolist(),
            "axes_y": self.axes_y.tolist(),
        }

    @staticmethod
    def from_json(data) -> "ParticleMesh":
        return ParticleMesh(data["offsets"], data["axes_x"], data["axes_y"])


def expand_mesh_draw(draw: ParticleDrawData, mesh: ParticleMesh) -> ParticleDrawData:
    """Expand per-particle draw data into per-quad entries (N*Q lanes).

    The particle frame is (axis_x, axis_y, axis_z) — already scaled by size
    in extraction — so a mesh-space point m maps to
    ``position + m.x*axis_x + m.y*axis_y + m.z*axis_z``.
    """
    if mesh.num_quads == 1 and np.allclose(mesh.offsets, 0) and np.allclose(
        mesh.axes_x, [[1, 0, 0]]
    ) and np.allclose(mesh.axes_y, [[0, 1, 0]]):
        return draw  # default quad: nothing to expand

    ax = draw.axis_x  # [N,3] world, scaled by size.x
    ay = draw.axis_y
    az = jnp.cross(ax, ay)
    azn = az / jnp.maximum(jnp.sqrt(jnp.sum(az * az, axis=-1, keepdims=True)), 1e-9)
    # size.z approximated by |axis_x| (isotropic z scale for quad unions)
    sz = jnp.sqrt(jnp.sum(ax * ax, axis=-1, keepdims=True))
    az = azn * sz

    def map_vec(m):  # mesh-space [3] per quad -> world [N,3]
        return m[0] * ax + m[1] * ay + m[2] * az

    q = mesh.num_quads
    pos, axx, axy = [], [], []
    for i in range(q):
        pos.append(draw.position + map_vec(mesh.offsets[i]))
        axx.append(map_vec(mesh.axes_x[i]))
        axy.append(map_vec(mesh.axes_y[i]))

    def rep(x):
        return jnp.concatenate([x] * q, axis=0)

    return ParticleDrawData(
        position=jnp.concatenate(pos, axis=0),
        axis_x=jnp.concatenate(axx, axis=0),
        axis_y=jnp.concatenate(axy, axis=0),
        color=rep(draw.color),
        alive=rep(draw.alive),
        roundness=rep(draw.roundness) if draw.roundness is not None else None,
        sprite_index=rep(draw.sprite_index),
        sprite_grid_size=draw.sprite_grid_size,
        texture_layers=draw.texture_layers,
        needs_uv=draw.needs_uv,
        ribbon_id=rep(draw.ribbon_id) if draw.ribbon_id is not None else None,
        age=rep(draw.age) if draw.age is not None else None,
        alpha_cutoff=(
            rep(draw.alpha_cutoff) if draw.alpha_cutoff is not None else None
        ),
        counter=rep(draw.counter) if draw.counter is not None else None,
    )

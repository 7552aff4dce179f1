"""Per-particle meshes (reference: EffectMesh component, lib.rs:745).

The reference instances an arbitrary Bevy mesh per particle (draw path
render/mod.rs:6622-6758 with vertex+index buffers). Here a
:class:`ParticleMesh` is a union of oriented quads AND indexed triangles in
mesh space — each quad or triangle becomes one raster entry, binned by bbox
exactly like billboards, so arbitrary triangle meshes draw through the same
tile rasterizer (triangles use a barycentric inside test, raster.py).

Each quad q is (offset[3], axis_x[3], axis_y[3]) in mesh space; triangles
are (vertices [V,3], indices [T,3]). A particle's frame (axis_x/axis_y/
axis_z from orient modifiers, scaled by size) maps mesh space into world
space.
"""

from __future__ import annotations


import jax.numpy as jnp
import numpy as np

from .extract import ParticleDrawData

__all__ = ["ParticleMesh", "expand_mesh_draw"]


class ParticleMesh:
    """A union of oriented quads and indexed triangles instanced per particle."""

    def __init__(self, offsets=None, axes_x=None, axes_y=None,
                 vertices=None, indices=None):
        self.offsets = np.asarray(
            offsets if offsets is not None else np.zeros((0, 3)), np.float32
        ).reshape(-1, 3)
        self.axes_x = np.asarray(
            axes_x if axes_x is not None else np.zeros((0, 3)), np.float32
        ).reshape(-1, 3)
        self.axes_y = np.asarray(
            axes_y if axes_y is not None else np.zeros((0, 3)), np.float32
        ).reshape(-1, 3)
        if not (len(self.offsets) == len(self.axes_x) == len(self.axes_y)):
            raise ValueError("mesh arrays must have equal quad counts")
        self.vertices = np.asarray(
            vertices if vertices is not None else np.zeros((0, 3)), np.float32
        ).reshape(-1, 3)
        self.indices = np.asarray(
            indices if indices is not None else np.zeros((0, 3)), np.int32
        ).reshape(-1, 3)
        if self.indices.size and self.indices.max() >= len(self.vertices):
            raise ValueError("triangle index out of range")
        if self.num_quads + self.num_triangles == 0:
            raise ValueError("mesh needs at least one quad or triangle")

    @property
    def num_quads(self) -> int:
        return len(self.offsets)

    @property
    def num_triangles(self) -> int:
        return len(self.indices)

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

    @staticmethod
    def from_triangles(vertices, indices) -> "ParticleMesh":
        """An arbitrary indexed triangle mesh (the general EffectMesh case)."""
        return ParticleMesh(vertices=vertices, indices=indices)

    @staticmethod
    def icosphere(radius: float = 0.5, subdivisions: int = 1) -> "ParticleMesh":
        """Subdivided icosahedron (the reference's puffs.rs mesh,
        SphereMeshBuilder SphereKind::Ico). 20*4^subdivisions triangles —
        every triangle becomes one raster entry per particle, so keep
        subdivisions small for large pools."""
        phi = (1.0 + np.sqrt(5.0)) / 2.0
        verts = np.array(
            [
                [-1, phi, 0], [1, phi, 0], [-1, -phi, 0], [1, -phi, 0],
                [0, -1, phi], [0, 1, phi], [0, -1, -phi], [0, 1, -phi],
                [phi, 0, -1], [phi, 0, 1], [-phi, 0, -1], [-phi, 0, 1],
            ],
            np.float64,
        )
        faces = [
            (0, 11, 5), (0, 5, 1), (0, 1, 7), (0, 7, 10), (0, 10, 11),
            (1, 5, 9), (5, 11, 4), (11, 10, 2), (10, 7, 6), (7, 1, 8),
            (3, 9, 4), (3, 4, 2), (3, 2, 6), (3, 6, 8), (3, 8, 9),
            (4, 9, 5), (2, 4, 11), (6, 2, 10), (8, 6, 7), (9, 8, 1),
        ]
        verts = [v / np.linalg.norm(v) for v in verts]
        cache = {}

        def midpoint(i, j):
            key = (min(i, j), max(i, j))
            if key not in cache:
                m = verts[i] + verts[j]
                verts.append(m / np.linalg.norm(m))
                cache[key] = len(verts) - 1
            return cache[key]

        for _ in range(subdivisions):
            nxt = []
            for a, b, c in faces:
                ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
                nxt += [(a, ab, ca), (b, bc, ab), (c, ca, bc), (ab, bc, ca)]
            faces = nxt
        return ParticleMesh.from_triangles(
            np.asarray(verts, np.float32) * radius, faces
        )

    @staticmethod
    def tetrahedron(size: float = 1.0) -> "ParticleMesh":
        """A regular tetrahedron — the smallest closed triangle mesh."""
        s = size / 2.0
        verts = np.array(
            [[s, s, s], [s, -s, -s], [-s, s, -s], [-s, -s, s]], np.float32
        )
        idx = [[0, 1, 2], [0, 3, 1], [0, 2, 3], [1, 3, 2]]
        return ParticleMesh.from_triangles(verts, idx)

    # -- serde --------------------------------------------------------------

    def to_json(self):
        data = {
            "offsets": self.offsets.tolist(),
            "axes_x": self.axes_x.tolist(),
            "axes_y": self.axes_y.tolist(),
        }
        if self.num_triangles:
            data["vertices"] = self.vertices.tolist()
            data["indices"] = self.indices.tolist()
        return data

    @staticmethod
    def from_json(data) -> "ParticleMesh":
        return ParticleMesh(
            data.get("offsets"),
            data.get("axes_x"),
            data.get("axes_y"),
            vertices=data.get("vertices"),
            indices=data.get("indices"),
        )


def expand_mesh_draw(draw: ParticleDrawData, mesh: ParticleMesh) -> ParticleDrawData:
    """Expand per-particle draw data into per-quad/per-triangle entries.

    The particle frame is (axis_x, axis_y, axis_z) — already scaled by size
    in extraction — so a mesh-space point m maps to
    ``position + m.x*axis_x + m.y*axis_y + m.z*axis_z``. Triangle entries
    carry ``position = world(A)`` and ``axis = 2*world(edge)`` so the
    rasterizer's half-extent convention recovers the exact edges.
    """
    if (
        mesh.num_triangles == 0
        and mesh.num_quads == 1
        and np.allclose(mesh.offsets, 0)
        and np.allclose(mesh.axes_x, [[1, 0, 0]])
        and np.allclose(mesh.axes_y, [[0, 1, 0]])
    ):
        return draw  # default quad: nothing to expand

    ax = draw.axis_x  # [N,3] world, scaled by size.x
    ay = draw.axis_y
    az = jnp.cross(ax, ay)
    azn = az / jnp.maximum(jnp.sqrt(jnp.sum(az * az, axis=-1, keepdims=True)), 1e-9)
    # size.z approximated by |axis_x| (isotropic z scale for mesh unions)
    sz = jnp.sqrt(jnp.sum(ax * ax, axis=-1, keepdims=True))
    az = azn * sz

    def map_vec(m):  # mesh-space [3] per element -> world [N,3]
        return m[0] * ax + m[1] * ay + m[2] * az

    q = mesh.num_quads
    t = mesh.num_triangles
    pos, axx, axy = [], [], []
    for i in range(q):
        pos.append(draw.position + map_vec(mesh.offsets[i]))
        axx.append(map_vec(mesh.axes_x[i]))
        axy.append(map_vec(mesh.axes_y[i]))
    for i in range(t):
        a, b, c = mesh.vertices[mesh.indices[i]]
        # Anchor at (B+C)/2 so the rasterizer's centered-bbox binning covers
        # the triangle: p = center + u*AB + v*AC with barycentric
        # (s, t) = (u+0.5, v+0.5); the tight extent is |u|,|v| <= 0.5.
        pos.append(draw.position + map_vec(0.5 * (b + c)))
        axx.append(2.0 * map_vec(b - a))
        axy.append(2.0 * map_vec(c - a))

    k = q + t
    n = draw.position.shape[0]
    tri_flag = jnp.concatenate(
        [jnp.zeros((n * q,), jnp.float32), jnp.ones((n * t,), jnp.float32)]
    ) if t else None

    def rep(x):
        return jnp.concatenate([x] * k, axis=0)

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
        tri=tri_flag,
    )

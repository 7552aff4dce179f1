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
                 vertices=None, indices=None, uvs=None, normals=None,
                 colors=None):
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
        if self.indices.size and (
            self.indices.max() >= len(self.vertices) or self.indices.min() < 0
        ):
            raise ValueError("triangle index out of range")
        if self.num_quads + self.num_triangles == 0:
            raise ValueError("mesh needs at least one quad or triangle")
        # Optional per-vertex attributes (the reference binds full Bevy mesh
        # vertex buffers — ATTRIBUTE_UV_0 / _NORMAL / _COLOR — to its draw,
        # render/mod.rs:6622-6758; vfx_render.wgsl:286-288 expands real mesh
        # vertices). Indexed by the same `indices`, interpolated
        # barycentrically per fragment by the rasterizer.
        self.uvs = (
            None if uvs is None else np.asarray(uvs, np.float32).reshape(-1, 2)
        )
        self.normals = (
            None
            if normals is None
            else np.asarray(normals, np.float32).reshape(-1, 3)
        )
        self.colors = (
            None
            if colors is None
            else np.asarray(colors, np.float32).reshape(-1, 4)
        )
        for name in ("uvs", "normals", "colors"):
            arr = getattr(self, name)
            if arr is not None and len(arr) != len(self.vertices):
                raise ValueError(
                    f"per-vertex {name} must match vertex count "
                    f"({len(arr)} vs {len(self.vertices)})"
                )

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
    def from_triangles(vertices, indices, uvs=None, normals=None,
                       colors=None) -> "ParticleMesh":
        """An arbitrary indexed triangle mesh (the general EffectMesh case),
        optionally with per-vertex UVs, normals, and colors."""
        return ParticleMesh(
            vertices=vertices, indices=indices, uvs=uvs, normals=normals,
            colors=colors,
        )

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
        unit = np.asarray(verts, np.float32)
        # exact per-vertex attributes for a sphere: normal = unit position,
        # UV = equirectangular mapping (seam triangles wrap — fine for
        # particles; authors needing a seamless atlas pass their own uvs)
        uvs = np.stack(
            [
                0.5 + np.arctan2(unit[:, 2], unit[:, 0]) / (2.0 * np.pi),
                0.5 - np.arcsin(np.clip(unit[:, 1], -1.0, 1.0)) / np.pi,
            ],
            axis=1,
        )
        return ParticleMesh.from_triangles(
            unit * radius, faces, uvs=uvs, normals=unit
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
            for name in ("uvs", "normals", "colors"):
                arr = getattr(self, name)
                if arr is not None:
                    data[name] = arr.tolist()
        return data

    @staticmethod
    def from_json(data) -> "ParticleMesh":
        return ParticleMesh(
            data.get("offsets"),
            data.get("axes_x"),
            data.get("axes_y"),
            vertices=data.get("vertices"),
            indices=data.get("indices"),
            uvs=data.get("uvs"),
            normals=data.get("normals"),
            colors=data.get("colors"),
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
    n = draw.position.shape[0]
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

    # ---- per-vertex attributes -> per-entry (A, B, C) triplets ----
    # Vertex UVs/colors are mesh constants: broadcast [6]/[12] per element
    # over the N particles. Normals vary per particle (the frame rotates):
    # mapped through the NORMALIZED particle axes (rotation only — under
    # non-uniform size scaling this is the small-angle approximation of the
    # inverse-transpose) and interpolated per fragment in the rasterizer.
    # Quad entries get constant triplets (uv corners / face normal / white)
    # so one interpolation formula serves the whole union.
    uv_abc = nrm_abc = vcol_abc = None
    want_uv = mesh.uvs is not None and t > 0
    want_nrm = (
        mesh.normals is not None and t > 0 and draw.lighting is not None
    )
    want_vcol = mesh.colors is not None and t > 0
    if want_nrm:
        axl = jnp.sqrt(jnp.sum(ax * ax, axis=-1, keepdims=True))
        ayl = jnp.sqrt(jnp.sum(ay * ay, axis=-1, keepdims=True))
        axn = ax / jnp.maximum(axl, 1e-9)
        ayn = ay / jnp.maximum(ayl, 1e-9)

        def map_nrm(m):  # unit mesh-space normal -> world unit-ish normal
            v = m[0] * axn + m[1] * ayn + m[2] * azn
            return v / jnp.maximum(
                jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True)), 1e-9
            )

    if want_uv:
        parts = []
        quad_uv = np.array([0.0, 0.0, 1.0, 0.0, 0.0, 1.0], np.float32)
        for _ in range(q):
            parts.append(jnp.broadcast_to(quad_uv, (n, 6)))
        for i in range(t):
            ua, ub, uc = mesh.uvs[mesh.indices[i]]
            tri_uv = np.concatenate([ua, ub, uc]).astype(np.float32)
            parts.append(jnp.broadcast_to(tri_uv, (n, 6)))
        uv_abc = jnp.concatenate(parts, axis=0)
    if want_nrm:
        parts = []
        for _ in range(q):
            parts.append(jnp.concatenate([azn, azn, azn], axis=-1))
        for i in range(t):
            na, nb, nc = mesh.normals[mesh.indices[i]]
            parts.append(
                jnp.concatenate(
                    [map_nrm(na), map_nrm(nb), map_nrm(nc)], axis=-1
                )
            )
        nrm_abc = jnp.concatenate(parts, axis=0)
    if want_vcol:
        parts = []
        white = np.ones((12,), np.float32)
        for _ in range(q):
            parts.append(jnp.broadcast_to(white, (n, 12)))
        for i in range(t):
            ca, cb, cc = mesh.colors[mesh.indices[i]]
            tri_c = np.concatenate([ca, cb, cc]).astype(np.float32)
            parts.append(jnp.broadcast_to(tri_c, (n, 12)))
        vcol_abc = jnp.concatenate(parts, axis=0)

    k = q + t
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
        uv_abc=uv_abc,
        nrm_abc=nrm_abc,
        vcol_abc=vcol_abc,
        lighting=draw.lighting if want_nrm else None,
    )

"""Exact small-matrix transforms as broadcast VPU math — never the MXU.

``jnp``'s ``@`` inside jit lowers tiny products onto the TPU MXU at
DEFAULT matmul precision, which truncates f32 operands to bf16. Two real
consequences measured in round 5:

* the ``[N, 3] @ [3, 3]`` emitter rotation (vfx_init.wgsl:186-188
  analogue) quantized every spawn position/velocity to ~2^-11 relative
  (4.9e-4 absolute on the device gate's scenes) — enough to flip pixel
  coverage at primitive edges and visibly soften any effect authored in
  world space;
* a traced ``proj @ view`` did the same to the MVP matrix itself.

Tiny matmuls are ALSO slow on the MXU (a (4,4)@(4,N) projection measured
~17 ms per 1M points in round 2 — ``raster._project``'s original
motivation), and the profiler shows them as un-fusable "convolution
fusion" ops. Every helper here is plain mul/add broadcasting with a
fixed association order: exact f32, identical across backends (the CPU
backend is the correctness reference for the on-device gate), and free
to fuse into neighboring elementwise work.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["rotate3", "affine3", "mat4_mul", "mvp_w", "affine4_inv"]


def rotate3(v, rot):
    """``v @ rot.T`` for ``v: [N, 3]``, ``rot: [3, 3]`` — exact f32."""
    x, y, z = v[:, 0], v[:, 1], v[:, 2]
    return jnp.stack(
        [
            x * rot[0, 0] + y * rot[0, 1] + z * rot[0, 2],
            x * rot[1, 0] + y * rot[1, 1] + z * rot[1, 2],
            x * rot[2, 0] + y * rot[2, 1] + z * rot[2, 2],
        ],
        axis=1,
    )


def affine3(v, rot, tr):
    """``v @ rot.T + tr`` for ``v: [N, 3]``, ``rot: [3, 3]``, ``tr: [3]``."""
    return rotate3(v, rot) + tr


def mat4_mul(a, b):
    """``a @ b`` for two 4x4 matrices, unrolled over the contraction so the
    f32 adds have a fixed left-to-right order on every backend."""
    return (
        a[:, 0:1] * b[0:1, :]
        + a[:, 1:2] * b[1:2, :]
        + a[:, 2:3] * b[2:3, :]
        + a[:, 3:4] * b[3:4, :]
    )


def affine4_inv(m):
    """Closed-form inverse of an AFFINE 4x4 (last row ``0 0 0 1`` — every
    view matrix here: look_at optionally composed with an affine local
    transform) via the 3x3 adjugate. ``jnp.linalg.inv`` lowers to LU
    solves full of dot_generals; this is pure scalar mul/add."""
    a, b, c = m[0, 0], m[0, 1], m[0, 2]
    d, e, f = m[1, 0], m[1, 1], m[1, 2]
    g, h, i = m[2, 0], m[2, 1], m[2, 2]
    ca, cb, cc = e * i - f * h, c * h - b * i, b * f - c * e
    cd, ce, cf = f * g - d * i, a * i - c * g, c * d - a * f
    cg, ch, ci = d * h - e * g, b * g - a * h, a * e - b * d
    det = a * ca + b * cd + c * cg
    inv3 = (
        jnp.stack(
            [
                jnp.stack([ca, cb, cc]),
                jnp.stack([cd, ce, cf]),
                jnp.stack([cg, ch, ci]),
            ]
        )
        / det
    )
    tx, ty, tz = m[0, 3], m[1, 3], m[2, 3]
    ti = jnp.stack(
        [
            -(inv3[0, 0] * tx + inv3[0, 1] * ty + inv3[0, 2] * tz),
            -(inv3[1, 0] * tx + inv3[1, 1] * ty + inv3[1, 2] * tz),
            -(inv3[2, 0] * tx + inv3[2, 1] * ty + inv3[2, 2] * tz),
        ]
    )
    top = jnp.concatenate([inv3, ti[:, None]], axis=1)
    bottom = jnp.asarray([[0.0, 0.0, 0.0, 1.0]], jnp.float32)
    return jnp.concatenate([top, bottom], axis=0)


def mvp_w(mvp, p):
    """Clip-space ``w`` of points ``p: [N, 3]`` under ``mvp: [4, 4]`` —
    the one row of the full ``mvp @ [p, 1]`` product the screen-space-size
    path needs (output.rs:838-862)."""
    return (
        p[:, 0] * mvp[3, 0]
        + p[:, 1] * mvp[3, 1]
        + p[:, 2] * mvp[3, 2]
        + mvp[3, 3]
    )

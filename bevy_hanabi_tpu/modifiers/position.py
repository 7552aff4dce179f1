"""Position-shape init modifiers (reference: src/modifier/position.rs).

All shapes sample in emitter space; the runtime applies the emitter transform
once when the effect simulates in global space (reference applies it in
vfx_init.wgsl:186-188). Random draws use the context's per-lane PCG stream in
the same order as the generated WGSL, so trajectories match.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from ..attributes import Attribute
from ..values import FLOAT
from .base import Modifier, ModifierContext, ShapeDimension, register_modifier

__all__ = [
    "SetPositionCircleModifier",
    "SetPositionSphereModifier",
    "SetPositionCone3dModifier",
]

_TAU = 6.283185307179586476925286766559


def orthonormal_basis(n):
    """Branchless ONB from a unit normal (same construction as the WGSL in
    position.rs:80-95, after Duff et al. 2017)."""
    sign = jnp.where(n[..., 2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + n[..., 2])
    b = n[..., 0] * n[..., 1] * a
    tangent = jnp.stack(
        [
            1.0 + sign * n[..., 0] * n[..., 0] * a,
            sign * b,
            -sign * n[..., 0],
        ],
        axis=-1,
    )
    bitangent = jnp.stack(
        [b, sign + n[..., 1] * n[..., 1] * a, -n[..., 1]], axis=-1
    )
    return tangent, bitangent


@register_modifier
@dataclass
class SetPositionCircleModifier(Modifier):
    """Random position on a circle perimeter or disc (position.rs:23)."""

    center: int  # vec3
    axis: int  # vec3 (unit)
    radius: int  # f32
    dimension: ShapeDimension = ShapeDimension.SURFACE

    CONTEXT = ModifierContext.INIT | ModifierContext.UPDATE
    ATTRIBUTES = (Attribute.POSITION,)

    def apply(self, module, ctx) -> None:
        c = ctx.eval(self.center)
        n = ctx.eval(self.axis)
        n = jnp.broadcast_to(n, (len(ctx.seed), 3)) if jnp.ndim(n) == 1 else n
        tangent, bitangent = orthonormal_basis(n)
        if self.dimension is ShapeDimension.VOLUME:
            r = jnp.sqrt(ctx.draw(FLOAT)) * ctx.eval(self.radius)
        else:
            r = ctx.eval(self.radius)
        theta = ctx.draw(FLOAT) * _TAU
        direction = tangent * jnp.cos(theta)[..., None] + bitangent * jnp.sin(theta)[..., None]
        if jnp.ndim(r) >= 1:
            r = r[..., None]
        ctx.set_attr("position", c + r * direction)


@register_modifier
@dataclass
class SetPositionSphereModifier(Modifier):
    """Random position on/in a sphere via Archimedes' hat-box (position.rs:138)."""

    center: int  # vec3
    radius: int  # f32
    dimension: ShapeDimension = ShapeDimension.SURFACE

    CONTEXT = ModifierContext.INIT | ModifierContext.UPDATE
    ATTRIBUTES = (Attribute.POSITION,)

    def apply(self, module, ctx) -> None:
        c = ctx.eval(self.center)
        if self.dimension is ShapeDimension.VOLUME:
            r = jnp.power(ctx.draw(FLOAT), 1.0 / 3.0) * ctx.eval(self.radius)
        else:
            r = ctx.eval(self.radius)
        theta = ctx.draw(FLOAT) * _TAU
        z = ctx.draw(FLOAT) * 2.0 - 1.0
        # sin(acos(z)) == sqrt(1 - z^2); avoids acos (no Mosaic lowering)
        sinphi = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
        x = sinphi * jnp.cos(theta)
        y = sinphi * jnp.sin(theta)
        direction = jnp.stack([x, y, z], axis=-1)
        if jnp.ndim(r) >= 1:
            r = r[..., None]
        ctx.set_attr("position", c + r * direction)


@register_modifier
@dataclass
class SetPositionCone3dModifier(Modifier):
    """Random position in a truncated cone along +Y (position.rs:248).

    Matches the reference's sampling: height ratio ``frand()^(1/3)``, radius
    ratio ``sqrt(frand())`` at the interpolated ring radius, uniform angle.
    (The reference's generated code ignores ``dimension`` too.)
    """

    height: int  # f32
    base_radius: int  # f32
    top_radius: int  # f32
    dimension: ShapeDimension = ShapeDimension.VOLUME

    CONTEXT = ModifierContext.INIT | ModifierContext.UPDATE
    ATTRIBUTES = (Attribute.POSITION,)

    def apply(self, module, ctx) -> None:
        h0 = ctx.eval(self.height)
        alpha_h = jnp.power(ctx.draw(FLOAT), 1.0 / 3.0)
        h = h0 * alpha_h
        rt = ctx.eval(self.top_radius)
        rb = ctx.eval(self.base_radius)
        r0 = rb + (rt - rb) * alpha_h
        alpha_r = jnp.sqrt(ctx.draw(FLOAT))
        r = r0 * alpha_r
        theta = ctx.draw(FLOAT) * _TAU
        pos = jnp.stack([r * jnp.cos(theta), h, r * jnp.sin(theta)], axis=-1)
        ctx.set_attr("position", pos)

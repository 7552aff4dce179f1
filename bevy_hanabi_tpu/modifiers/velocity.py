"""Velocity-shape init modifiers (reference: src/modifier/velocity.rs).

Velocities are produced in emitter space; the runtime rotates them by the
emitter transform for global-space effects (w=0 transform, like
vfx_init.wgsl's velocity handling).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..attributes import Attribute
from .base import Modifier, ModifierContext, register_modifier

__all__ = [
    "SetVelocityCircleModifier",
    "SetVelocitySphereModifier",
    "SetVelocityTangentModifier",
]


def _normalize(v):
    # Safe normalize: a zero-length vector yields zero velocity rather than
    # NaN (WGSL normalize(0) is undefined; silently poisoning the pool with
    # NaNs when position == center is a footgun we choose not to keep).
    sq = jnp.sum(v * v, axis=-1, keepdims=True)
    return v * jax.lax.rsqrt(jnp.maximum(sq, 1e-24))


@register_modifier
@dataclass
class SetVelocityCircleModifier(Modifier):
    """Radial velocity in the plane orthogonal to ``axis`` (velocity.rs:28)."""

    center: int  # vec3
    axis: int  # vec3 (unit)
    speed: int  # f32

    CONTEXT = ModifierContext.INIT | ModifierContext.UPDATE
    ATTRIBUTES = (Attribute.POSITION, Attribute.VELOCITY)

    def apply(self, module, ctx) -> None:
        center = ctx.eval(self.center)
        axis = ctx.eval(self.axis)
        speed = ctx.eval(self.speed)
        delta = ctx.get_attr("position") - center
        radial = _normalize(delta - jnp.sum(delta * axis, axis=-1, keepdims=True) * axis)
        if jnp.ndim(speed) >= 1:
            speed = speed[..., None]
        ctx.set_attr("velocity", radial * speed)


@register_modifier
@dataclass
class SetVelocitySphereModifier(Modifier):
    """Velocity radially away from a center point (velocity.rs:111)."""

    center: int  # vec3
    speed: int  # f32

    CONTEXT = ModifierContext.INIT | ModifierContext.UPDATE
    ATTRIBUTES = (Attribute.POSITION, Attribute.VELOCITY)

    def apply(self, module, ctx) -> None:
        center = ctx.eval(self.center)
        speed = ctx.eval(self.speed)
        direction = _normalize(ctx.get_attr("position") - center)
        if jnp.ndim(speed) >= 1:
            speed = speed[..., None]
        ctx.set_attr("velocity", direction * speed)


@register_modifier
@dataclass
class SetVelocityTangentModifier(Modifier):
    """Velocity tangent to an axis through an origin (velocity.rs:170)."""

    origin: int  # vec3
    axis: int  # vec3
    speed: int  # f32

    CONTEXT = ModifierContext.INIT | ModifierContext.UPDATE
    ATTRIBUTES = (Attribute.POSITION, Attribute.VELOCITY)

    def apply(self, module, ctx) -> None:
        origin = ctx.eval(self.origin)
        axis = ctx.eval(self.axis)
        speed = ctx.eval(self.speed)
        radial = ctx.get_attr("position") - origin
        tangent = _normalize(jnp.cross(jnp.broadcast_to(axis, radial.shape), radial))
        if jnp.ndim(speed) >= 1:
            speed = speed[..., None]
        ctx.set_attr("velocity", tangent * speed)

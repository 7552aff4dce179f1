"""Render extraction: pool → per-particle draw data.

The TPU analogue of the reference's vertex-stage particle fetch + render
modifier code (vfx_render.wgsl VS + the {{INPUTS}}/{{VERTEX_MODIFIERS}}
blocks). Defaults mirror the reference's render input defaults
(lib.rs:867-951): color from COLOR (packed unorm) else HDR_COLOR else white;
size from SIZE/SIZE2/SIZE3 else 1; axes default to camera-facing billboards.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..asset import EffectAsset, SimulationSpace
from ..compiler import RenderContext, SimParams
from ..runtime.pool import ParticlePool
from .camera import CameraParams

__all__ = ["ParticleDrawData", "extract_draw_data"]


@dataclass
class ParticleDrawData:
    """Everything the rasterizer needs, SoA over particles."""

    position: Any  # [N,3] world space
    axis_x: Any  # [N,3] world, scaled by size.x (half extents = 0.5*axis)
    axis_y: Any  # [N,3] world, scaled by size.y
    color: Any  # [N,4] linear RGBA (HDR allowed)
    alive: Any  # bool[N]
    roundness: Any  # [N] 0=quad .. 1=ellipse
    sprite_index: Any  # int32[N] flipbook frame
    # static (non-traced) draw state
    sprite_grid_size: Tuple[int, int]
    texture_layers: tuple  # ((slot, ImageSampleMapping), ...)
    needs_uv: bool
    ribbon_id: Any = None  # uint32[N] when ribbons are drawn
    age: Any = None


jax.tree_util.register_dataclass(
    ParticleDrawData,
    data_fields=[
        "position",
        "axis_x",
        "axis_y",
        "color",
        "alive",
        "roundness",
        "sprite_index",
        "ribbon_id",
        "age",
    ],
    meta_fields=["sprite_grid_size", "texture_layers", "needs_uv"],
)


def extract_draw_data(
    asset: EffectAsset,
    pool: ParticlePool,
    camera: CameraParams,
    sim: SimParams = None,
    properties=None,
    textures: Optional[List[Any]] = None,
    transform: Optional[Any] = None,
) -> ParticleDrawData:
    """Run render modifiers over the pool and build draw data.

    ``transform`` (3x4 emitter transform) positions LOCAL-space effects in
    the world each frame (reference: local-space handling,
    vfx_render.wgsl:113-146); GLOBAL-space pools are already in world space.
    """
    n = pool.alive.shape[-1]
    particle = dict(pool.attrs)

    ctx = RenderContext(
        asset.module,
        particle,
        pool.seed,
        sim=sim if sim is not None else SimParams(),
        properties=properties or {},
        particle_index=jnp.arange(n, dtype=jnp.uint32),
        alive=pool.alive,
        camera=camera,
        textures=textures or [],
        alpha_cutoff=0.0,
    )

    # ---- defaults (lib.rs:867-951) ----
    if "color" in particle:
        packed = particle["color"].astype(jnp.uint32)
        comps = [
            ((packed >> jnp.uint32(8 * i)) & jnp.uint32(0xFF)).astype(jnp.float32)
            / 255.0
            for i in range(4)
        ]
        ctx.color = jnp.stack(comps, axis=-1)
    elif "hdr_color" in particle:
        ctx.color = particle["hdr_color"]
    else:
        ctx.color = jnp.ones((n, 4), jnp.float32)
    if "alpha" in particle:
        ctx.color = ctx.color.at[:, 3].multiply(particle["alpha"])

    size = jnp.ones((n, 3), jnp.float32)
    if "size" in particle:
        size = size * particle["size"][:, None]
    if "size2" in particle:
        size = size.at[:, :2].multiply(particle["size2"])
    if "size3" in particle:
        size = size * particle["size3"]
    ctx.size = size

    rot = camera.rotation
    ctx.axis_x = jnp.broadcast_to(rot[:, 0], (n, 3))
    ctx.axis_y = jnp.broadcast_to(rot[:, 1], (n, 3))
    ctx.axis_z = jnp.broadcast_to(rot[:, 2], (n, 3))

    # ---- render modifiers ----
    for m in asset.render_modifiers:
        m.apply_render(asset.module, ctx)

    position = ctx.particle.get("position", jnp.zeros((n, 3), jnp.float32))
    if asset.simulation_space is SimulationSpace.LOCAL and transform is not None:
        rot3 = transform[:, :3]
        position = position @ rot3.T + transform[:, 3]

    # ---- screen-space size (output.rs:838-862) ----
    sz = ctx.size
    if ctx.screen_space_size:
        hom = jnp.concatenate([position, jnp.ones((n, 1), jnp.float32)], axis=1)
        clip = (camera.proj @ (camera.view @ hom.T)).T
        w_cs = clip[:, 3]
        wpx, hpx = camera.viewport
        denom = jnp.minimum(wpx * camera.proj_scale[0], hpx * camera.proj_scale[1])
        sz = sz * (w_cs[:, None] * 2.0) / denom

    roundness = (
        ctx.roundness
        if ctx.roundness is not None
        else jnp.zeros((n,), jnp.float32)
    )
    roundness = jnp.broadcast_to(roundness, (n,))
    sprite_index = (
        particle["sprite_index"].astype(jnp.int32)
        if "sprite_index" in particle
        else jnp.zeros((n,), jnp.int32)
    )

    return ParticleDrawData(
        position=position,
        axis_x=ctx.axis_x * sz[:, 0:1],
        axis_y=ctx.axis_y * sz[:, 1:2],
        color=ctx.color,
        alive=pool.alive,
        roundness=roundness,
        sprite_index=sprite_index,
        sprite_grid_size=ctx.sprite_grid_size or (1, 1),
        texture_layers=tuple(ctx.texture_layers),
        needs_uv=ctx.needs_uv,
        ribbon_id=particle.get("ribbon_id"),
        age=particle.get("age"),
    )

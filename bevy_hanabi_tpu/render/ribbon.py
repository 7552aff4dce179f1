"""Ribbon/trail rendering: sorted segment quads.

The reference renders ribbons by sorting alive particles by
``(RIBBON_ID, AGE)`` on the GPU — with a single-threaded insertion sort it
itself calls a TODO (vfx_sort.wgsl:33-39) — and drawing a quad between each
particle and its predecessor (vfx_render.wgsl:239-282), discarding the first
instance of each ribbon and cross-ribbon segments.

Here the sort is one ``jax.lax.sort`` over (ribbon_id, age) — massively
parallel where the reference is serial — and each segment becomes a regular
particle quad (center = midpoint, axis_x = the segment delta, axis_y = the
camera-facing side vector), so the tile rasterizer needs no ribbon-specific
path at all.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .camera import CameraParams
from .extract import ParticleDrawData

__all__ = ["build_ribbon_segments"]


def build_ribbon_segments(
    draw: ParticleDrawData, camera: CameraParams
) -> ParticleDrawData:
    """Convert per-particle draw data into per-segment quad draw data.

    Requires ``draw.ribbon_id`` and ``draw.age``. Output has the same array
    length; invalid segments (ribbon heads, cross-ribbon pairs, dead lanes)
    have ``alive=False``.
    """
    if draw.ribbon_id is None or draw.age is None:
        raise ValueError("ribbon rendering requires RIBBON_ID and AGE attributes")
    n = draw.position.shape[0]

    # Sort alive particles by (ribbon_id, age desc): a ribbon runs from the
    # oldest particle (tail) to the newest (head). Dead lanes sort last.
    # PARTICLE_COUNTER (spawn order) breaks age ties deterministically —
    # burst-spawned trail particles share an age, and without the third key
    # their segment order flickers frame to frame (the reference sorts on
    # the same two keys, render/mod.rs:6037-6044, and has the same flicker;
    # the counter key is free here).
    big = jnp.uint32(0xFFFFFFFF)
    rid = jnp.where(draw.alive, draw.ribbon_id.astype(jnp.uint32), big)
    age_key = jnp.where(draw.alive, -draw.age, jnp.inf)
    idx = jnp.arange(n, dtype=jnp.int32)
    # The segment GEOMETRY (position + ribbon width -- what the quad build
    # and tile binning need) rides the sort as payload operands: measured
    # on-chip, extra lax.sort operands are FREE at 1M (3.3 ms flat from 0
    # to +8 f32 payloads, experiments/gather_cost.py) while a [N, F]
    # permutation gather costs 4.4-7.6 ms -- the single biggest line of
    # the old ribbon frame (docs/PERF.md "Ribbon frame anatomy").
    # Appearance columns (color, sprite, cutoff, ...) never materialize
    # in segment order at all: they stay in SOURCE order behind ``remap``
    # (the sort's ``order`` payload) and the rasterizer fetches them at
    # WINDOW granularity (remap[t_p], ~M*num_tiles rows, far below N).
    width_in = jnp.sqrt(jnp.sum(draw.axis_y * draw.axis_y, axis=-1))
    geom = (
        draw.position[:, 0],
        draw.position[:, 1],
        draw.position[:, 2],
        width_in,
    )
    if draw.counter is not None:
        counter_key = jnp.where(draw.alive, draw.counter.astype(jnp.uint32), big)
        (rid_sorted, neg_age, counter_sorted, order, sx, sy, sz,
         width) = jax.lax.sort(
            (rid, age_key, counter_key, idx) + geom, num_keys=3
        )
    else:
        rid_sorted, neg_age, order, sx, sy, sz, width = jax.lax.sort(
            (rid, age_key, idx) + geom, num_keys=2
        )
        counter_sorted = None
    pos = jnp.stack([sx, sy, sz], axis=1)

    alive = rid_sorted != big  # dead lanes (and rid==sentinel) sort last
    pos_prev = jnp.roll(pos, 1, axis=0)
    alive_prev = jnp.roll(alive, 1)
    rid_prev = jnp.roll(rid_sorted, 1)

    same_ribbon = rid_sorted == rid_prev
    is_first = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), jnp.zeros((n - 1,), jnp.bool_)]
    )
    seg_valid = alive & alive_prev & same_ribbon & jnp.logical_not(is_first)

    delta = pos - pos_prev
    center = 0.5 * (pos + pos_prev)

    # Camera-facing side vector: width along cross(view_dir, delta) — the
    # reference's orientation-from-delta gives axis_y = cross(axis_x, axis_z)
    # with axis_x ∝ delta and axis_z pointing AT the camera
    # (vfx_render.wgsl:273-276), which equals cross(view_dir, delta) for our
    # from-camera view_dir. The sign only shows for asymmetric ribbon
    # textures (it mirrors the V axis across the width).
    view_dir = center - camera.position
    side = jnp.cross(view_dir, delta)
    side_norm = jnp.sqrt(jnp.sum(side * side, axis=-1, keepdims=True))
    side = side / jnp.where(side_norm > 1e-8, side_norm, 1.0)

    return ParticleDrawData(
        position=center,
        axis_x=delta,  # full segment length (raster uses 0.5*axis half-extent)
        axis_y=side * width[:, None],
        color=draw.color,  # SOURCE order, behind remap
        alive=seg_valid,
        roundness=None,
        sprite_index=draw.sprite_index,  # SOURCE order, behind remap
        sprite_grid_size=draw.sprite_grid_size,
        texture_layers=draw.texture_layers,
        needs_uv=draw.needs_uv,
        ribbon_id=rid_sorted,
        age=jnp.where(alive, -neg_age, 0.0),
        alpha_cutoff=draw.alpha_cutoff,  # SOURCE order, behind remap
        counter=counter_sorted,
        remap=order,
    )

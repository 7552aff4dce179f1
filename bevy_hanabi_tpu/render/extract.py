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
from ..ops.linalg import affine3, mat4_mul, mvp_w, rotate3
from ..runtime.pool import ParticlePool
from .camera import CameraParams

__all__ = [
    "ParticleDrawData",
    "extract_draw_data",
    "flatten_instance_axis",
    "resolve_remap",
    "APPEARANCE_FIELDS",
]

# Per-entry columns read in SOURCE order via ``ParticleDrawData.remap``
# (everything the blend phase samples that is not derived from the
# projected geometry).
APPEARANCE_FIELDS = (
    "color",
    "roundness",
    "sprite_index",
    "alpha_cutoff",
    "mode_id",
    "tex_entry",
    "tri",
    "uv_abc",
    "nrm_abc",
    "vcol_abc",
    "light_entry",
)


def resolve_remap(draw):
    """Materialize a draw's appearance indirection (full-N gather).

    Paths that reorder or route draw ROWS across devices (sharded slice
    rendering) need appearance in draw-row order; everything else leaves
    the indirection in place for the rasterizer's cheap window-level
    composition.

    All present fields are packed into ONE [N, F] float32 matrix and
    fetched with a single row gather: random-row HBM traffic is
    row-count-bound, not byte-bound (measured 2.4x over per-field
    gathers, raster.py packed-window note). 32-bit integer fields
    (sprite frame, painter mode id) ride the float matrix as BITCASTS —
    value-preserving for any magnitude, the same convention as
    parallel/render.py's _pack_draw."""
    if draw.remap is None:
        return draw
    import dataclasses

    def is_int32(dt):
        return jnp.issubdtype(dt, jnp.integer) and jnp.dtype(dt).itemsize == 4

    cols = []
    spans = {}  # field -> (start col, width, dtype, trailing shape)
    for f in APPEARANCE_FIELDS:
        v = getattr(draw, f)
        if v is None:
            continue
        flat = v.reshape(v.shape[0], -1)
        spans[f] = (sum(c.shape[1] for c in cols), flat.shape[1],
                    v.dtype, v.shape[1:])
        if is_int32(v.dtype):
            flat = jax.lax.bitcast_convert_type(flat, jnp.float32)
        else:
            flat = flat.astype(jnp.float32)
        cols.append(flat)
    upd = {"remap": None}
    if cols:
        packed = jnp.concatenate(cols, axis=1)[draw.remap]
        for f, (start, width, dtype, suffix) in spans.items():
            col = packed[:, start : start + width]
            if is_int32(dtype):
                col = jax.lax.bitcast_convert_type(col, dtype)
            else:
                col = col.astype(dtype)
            upd[f] = col.reshape((col.shape[0],) + suffix)
    return dataclasses.replace(draw, **upd)


def flatten_instance_axis(tree):
    """Merge a leading instance axis: [I, N, ...] leaves -> [I*N, ...].

    Used to feed vmapped (per-instance) draw data into the single-pass
    rasterizer (instanced and sharded rendering)."""
    return jax.tree_util.tree_map(
        lambda x: x.reshape((-1,) + x.shape[2:]), tree
    )


@dataclass
class ParticleDrawData:
    """Everything the rasterizer needs, SoA over particles."""

    position: Any  # [N,3] world space
    axis_x: Any  # [N,3] world, scaled by size.x (half extents = 0.5*axis)
    axis_y: Any  # [N,3] world, scaled by size.y
    color: Any  # [N,4] linear RGBA (HDR allowed)
    alive: Any  # bool[N]
    roundness: Any  # [N] 0=quad .. 1=ellipse, or None when no RoundModifier
    sprite_index: Any  # int32[N] flipbook frame
    # static (non-traced) draw state
    sprite_grid_size: Tuple[int, int]
    texture_layers: tuple  # ((slot, ImageSampleMapping), ...)
    needs_uv: bool
    ribbon_id: Any = None  # uint32[N] when ribbons are drawn
    age: Any = None
    alpha_cutoff: Any = None  # [N] per-particle mask cutoff (AlphaMode::Mask)
    counter: Any = None  # uint32[N] PARTICLE_COUNTER (ribbon sort tie-break)
    # [N] 1.0 where the entry is a TRIANGLE (axis_x/axis_y are then the full
    # A->B / A->C edges x2 and position is vertex A; inside test is
    # barycentric). None = all quads. Set by mesh expansion (mesh.py).
    tri: Any = None
    # Per-entry vertex-attribute triplets, interpolated barycentrically per
    # fragment (the reference's mesh vertex buffers — UVs feed texture
    # sampling, vfx_render.wgsl:286-288). Set by mesh expansion.
    uv_abc: Any = None  # [N,6] (ua,va, ub,vb, uc,vc)
    nrm_abc: Any = None  # [N,9] world-space unit normals at A,B,C
    vcol_abc: Any = None  # [N,12] RGBA vertex colors at A,B,C
    # ((lx,ly,lz), band) Lambert params when a lighting render modifier
    # deferred shading to the rasterizer (per-fragment mesh normals)
    lighting: Any = None
    # [N, 4] per-entry Lambert params (lx, ly, lz, band) when a painter
    # merge carries MULTIPLE distinct lighting setups (concat_painter_draws;
    # unlit entries carry band 1.0 so shade is exactly 1). None elsewhere —
    # a single setup stays static per-draw via ``lighting``.
    light_entry: Any = None
    # [N] per-entry blend mode id for the unified scene painter pass
    # (alpha_mode="scene"): 0=blend 1=premultiply 2=add 3=multiply
    # 4=opaque 5=mask. None everywhere else.
    mode_id: Any = None
    # int32[N] appearance indirection (ribbon segments): when set, the
    # APPEARANCE columns (color, roundness, sprite_index, alpha_cutoff,
    # mode_id, tex_entry, uv/nrm/vcol triplets, light_entry, tri) live in
    # SOURCE order and row k of the draw reads them at ``remap[k]``;
    # geometry (position, axis_x/y, alive) stays in draw-row order. The
    # rasterizer composes the indirection at WINDOW granularity
    # (remap[t_p], ~M*nt rows) instead of materializing a full-N
    # permutation gather — the measured bottleneck of the ribbon frame
    # (docs/PERF.md "Ribbon frame anatomy").
    remap: Any = None
    # Painter texture merging (concat_painter_draws): a stacked atlas of
    # every merged effect's texture layers, [T, Hmax, Wmax, 4] (each
    # texture zero-padded to the max extent; per-entry true sizes keep
    # sampling off the pad), plus per-entry sampling state
    # [N, 2 + 4*Lmax]: (grid_cols, grid_rows) then per texture layer
    # (tex_id, tex_w, tex_h, map_mode) where map_mode 0=absent layer
    # (modulates by exactly 1) 1=modulate 2=modulate_rgb
    # 3=modulate_opacity_from_r. Lmax is the max layer count across the
    # merged effects. None outside merged painter draws.
    atlas: Any = None
    tex_entry: Any = None


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
        "alpha_cutoff",
        "counter",
        "tri",
        "uv_abc",
        "nrm_abc",
        "vcol_abc",
        "mode_id",
        "atlas",
        "tex_entry",
        "light_entry",
        "remap",
    ],
    meta_fields=["sprite_grid_size", "texture_layers", "needs_uv", "lighting"],
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

    # LOCAL-space effects run the whole vertex stage in emitter (simulation)
    # space, exactly like the reference: the camera is transformed INTO
    # effect space for orient modes (vfx_render.wgsl:60-90,
    # get_camera_{position,rotation}_effect_space), modifiers compute axes in
    # effect space, and the expanded frame is transformed to world at the end
    # (vfx_render.wgsl:117-124, 293-295).
    is_local = (
        asset.simulation_space is SimulationSpace.LOCAL and transform is not None
    )
    if is_local:
        transform = jnp.asarray(transform, jnp.float32)
        rot3 = transform[:, :3]
        m4 = jnp.concatenate(
            [transform, jnp.asarray([[0.0, 0.0, 0.0, 1.0]], jnp.float32)], axis=0
        )
        # view_local = world→view ∘ local→world: every derived camera
        # quantity (rotation/position/up) lands in effect space.
        ctx_camera = CameraParams(
            view=mat4_mul(camera.view, m4),
            proj=camera.proj,
            viewport=camera.viewport,
        )
    else:
        ctx_camera = camera

    ctx = RenderContext(
        asset.module,
        particle,
        pool.seed,
        sim=sim if sim is not None else SimParams(),
        properties=properties or {},
        particle_index=jnp.arange(n, dtype=jnp.uint32),
        alive=pool.alive,
        camera=ctx_camera,
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

    # The FIRST size attribute in layout order wins; any further size
    # attribute is ignored with a warning, exactly like the reference's
    # shader generation (lib.rs:876-905) — multiplying them together would
    # silently compound sizes on conflicting layouts.
    size = jnp.ones((n, 3), jnp.float32)
    size_attrs = [
        a.name
        for a in asset.particle_layout().attributes()
        if a.name in ("size", "size2", "size3")
    ]
    if size_attrs:
        first = size_attrs[0]
        if first == "size":
            size = size * particle["size"][:, None]
        elif first == "size2":
            size = size.at[:, :2].multiply(particle["size2"])
        else:
            size = jnp.broadcast_to(particle["size3"], (n, 3))
        for extra in size_attrs[1:]:
            from ..utils.diag import warn_once

            warn_once(
                f"size-conflict:{asset.name}:{extra}",
                f"effect {asset.name!r}: attribute {extra.upper()} "
                "conflicts with another size attribute; ignored "
                "(lib.rs:885).",
            )
    ctx.size = size

    rot = ctx_camera.rotation
    ctx.axis_x = jnp.broadcast_to(rot[:, 0], (n, 3))
    ctx.axis_y = jnp.broadcast_to(rot[:, 1], (n, 3))
    ctx.axis_z = jnp.broadcast_to(rot[:, 2], (n, 3))

    # ---- alpha-mask cutoff (per particle) ----
    # The reference evaluates the cutoff expr at the top of the fragment
    # shader (vfx_render.wgsl:303-305) so it varies per particle and render
    # modifiers can read it via the AlphaCutoff builtin; the discard test is
    # color.a >= alpha_cutoff (vfx_render.wgsl:319-325, asset.rs:152-176).
    alpha_cutoff = None
    cutoff_handle = getattr(asset.alpha_mode, "mask_cutoff", None)
    if cutoff_handle is not None:
        alpha_cutoff = jnp.broadcast_to(
            jnp.asarray(ctx.eval(cutoff_handle), jnp.float32), (n,)
        )
        ctx.alpha_cutoff = alpha_cutoff

    # ---- render modifiers (in effect space for LOCAL sims) ----
    ctx.mesh_has_normals = (
        asset.mesh is not None
        and getattr(asset.mesh, "normals", None) is not None
        and asset.mesh.num_triangles > 0
    )
    for m in asset.render_modifiers:
        m.apply_render(asset.module, ctx)

    position = ctx.particle.get("position", jnp.zeros((n, 3), jnp.float32))
    if is_local:
        # Transform the whole particle frame to world space: position affine,
        # axes by the 3x3 (scale included — the reference transforms the
        # expanded sim-space vertex, vfx_render.wgsl:293-295). Broadcast
        # math, NOT `@` (bf16 MXU quantization — ops/linalg.py).
        position = affine3(position, rot3, transform[:, 3])
        ctx.axis_x = rotate3(ctx.axis_x, rot3)
        ctx.axis_y = rotate3(ctx.axis_y, rot3)
        ctx.axis_z = rotate3(ctx.axis_z, rot3)

    # ---- screen-space size (output.rs:838-862) ----
    sz = ctx.size
    if ctx.screen_space_size:
        # only clip w is consumed: one broadcast row instead of the full
        # (4,4)@(4,N) product (which lowers terribly AND at bf16 — linalg)
        w_cs = mvp_w(mat4_mul(camera.proj, camera.view), position)
        wpx, hpx = camera.viewport
        denom = jnp.minimum(wpx * camera.proj_scale[0], hpx * camera.proj_scale[1])
        sz = sz * (w_cs[:, None] * 2.0) / denom

    # None (not zeros) when no RoundModifier ran: the rasterizer statically
    # skips the squircle pow() — ~10x on the blend loop's per-entry cost.
    roundness = ctx.roundness
    if roundness is not None:
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
        alpha_cutoff=alpha_cutoff,
        counter=particle.get("particle_counter"),
        lighting=ctx.mesh_lighting,
    )


# Blend-mode ids carried per entry by the unified scene painter pass
# (raster.py alpha_mode="scene"): one global back-to-front sort blends
# every effect's entries with per-entry equations instead of one raster
# pass per blend state.
PAINTER_MODE_IDS = {
    "blend": 0,
    "premultiply": 1,
    "add": 2,
    "multiply": 3,
    "opaque": 4,
    "mask": 5,
}


def concat_painter_draws(draws, kinds, textures_per_draw=None):
    """Concatenate per-effect draw sets into ONE painter draw set.

    ``kinds`` are the effects' alpha-mode kinds, becoming the per-entry
    ``mode_id`` column; mask effects contribute their per-particle
    ``alpha_cutoff`` (others pad 0, never read). Draw sets may mix plain
    quads, expanded meshes (triangle entries pad ``tri`` 0 on quads,
    neutral vertex colors, light-direction normals so Lambert shade is
    exactly 1 on unlit entries) and ribbon segments (already quads after
    ``build_ribbon_segments``).

    Textured draw sets merge through a stacked atlas: every texture
    layer of every effect is zero-padded to the common max extent and
    stacked into ``atlas`` [T, H, W, 4], and every entry carries its
    flipbook grid plus per-layer (tex_id, true size, sample mapping)
    columns in ``tex_entry`` [N, 2 + 4*Lmax] so the rasterizer samples
    and modulates per entry per layer, layers applied in modifier order
    (absent layers carry map_mode 0 → factor 1, bit-neutral).
    ``textures_per_draw`` aligns with ``draws`` (each effect's texture
    list, as passed to extraction). Lambert-lit mesh draws merge too:
    one distinct setup stays per-draw static, several ride per-entry
    (light dir, band) columns."""
    cat = lambda field: jnp.concatenate([getattr(d, field) for d in draws])

    def cat_or(field, fill, width=None):
        """Concat an optional [n] / [n, width] column, padding absentees."""
        if not any(getattr(d, field) is not None for d in draws):
            return None
        parts = []
        for d in draws:
            v = getattr(d, field)
            if v is None:
                n = d.alive.shape[0]
                shape = (n,) if width is None else (n, width)
                v = jnp.full(shape, fill, jnp.float32)
            parts.append(v)
        return jnp.concatenate(parts)

    roundness = cat_or("roundness", 0.0)
    tri = cat_or("tri", 0.0)
    cutoff = jnp.concatenate(
        [
            d.alpha_cutoff
            if d.alpha_cutoff is not None
            else jnp.zeros(d.alive.shape, jnp.float32)
            for d in draws
        ]
    )
    mode_id = jnp.concatenate(
        [
            jnp.full(d.alive.shape, PAINTER_MODE_IDS[k], jnp.int32)
            for d, k in zip(draws, kinds)
        ]
    )
    # Lambert lighting: ONE distinct setup stays per-draw static state
    # (the cheap path — no extra row columns). Entries from unlit draws
    # then pad their normal triplets with the LIGHT DIRECTION itself: the
    # raster normalizes the interpolated normal, so shade ==
    # clip(|light_dir|, band, 1) == exactly 1 for the conventional unit
    # light dir (non-unit dirs shade unlit entries by min(|l|, 1), an
    # authoring error Lambert itself already amplifies). MULTIPLE
    # distinct setups ride per-entry (lx, ly, lz, band) columns instead
    # (``light_entry``); unlit entries carry band 1.0, clamping their
    # shade to exactly 1 regardless of padded normals.
    lightings = [
        d.lighting
        for d in draws
        if d.lighting is not None and d.nrm_abc is not None
    ]
    light_entry = None
    if len({(tuple(l[0]), l[1]) for l in lightings}) > 1:
        lighting = None
        up = jnp.asarray((0.0, 0.0, 1.0) * 3, jnp.float32)
        nrm_parts, light_parts = [], []
        for d in draws:
            n = d.alive.shape[0]
            if d.nrm_abc is not None and d.lighting is not None:
                (lx, ly, lz), band = d.lighting
                nrm_parts.append(d.nrm_abc)
                light_parts.append(
                    jnp.broadcast_to(
                        jnp.asarray(
                            (float(lx), float(ly), float(lz), float(band)),
                            jnp.float32,
                        ),
                        (n, 4),
                    )
                )
            else:
                nrm_parts.append(jnp.broadcast_to(up, (n, 9)))
                light_parts.append(
                    jnp.broadcast_to(
                        jnp.asarray((0.0, 0.0, 1.0, 1.0), jnp.float32),
                        (n, 4),
                    )
                )
        nrm_abc = jnp.concatenate(nrm_parts)
        light_entry = jnp.concatenate(light_parts)
    elif lightings:
        lighting = lightings[0]
        ldir = jnp.asarray(list(lighting[0]) * 3, jnp.float32)
        nrm_parts = []
        for d in draws:
            if d.nrm_abc is not None and d.lighting is not None:
                nrm_parts.append(d.nrm_abc)
            else:
                nrm_parts.append(
                    jnp.broadcast_to(ldir, (d.alive.shape[0], 9))
                )
        nrm_abc = jnp.concatenate(nrm_parts)
    else:
        lighting = None
        nrm_abc = None
    vcol_abc = cat_or("vcol_abc", 1.0, width=12)

    # ---- texture atlas + per-entry sampling state ----
    atlas = None
    tex_entry = None
    uv_abc = None
    if any(d.texture_layers for d in draws):
        if textures_per_draw is None:
            raise ValueError(
                "textured draw sets need textures_per_draw to merge into "
                "the painter pass"
            )
        MAP_CODES = {
            "modulate": 1.0,
            "modulate_rgb": 2.0,
            "modulate_opacity_from_r": 3.0,
        }
        lmax = max(len(d.texture_layers) for d in draws)
        width = 2 + 4 * lmax
        uniq = {}  # id(texture) -> (atlas index, texture)
        entry_parts = []
        for d, texs in zip(draws, textures_per_draw):
            n = d.alive.shape[0]
            gc, gr = d.sprite_grid_size
            row = [float(gc), float(gr)]
            for slot, mapping in d.texture_layers:
                if slot >= len(texs):
                    raise ValueError(
                        f"texture slot {slot} is referenced but only "
                        f"{len(texs)} texture(s) were provided for the "
                        "effect — pass textures=[...] when adding it"
                    )
                tex = jnp.asarray(texs[slot], jnp.float32)
                if tex.ndim != 3 or tex.shape[2] != 4:
                    raise ValueError(
                        "painter texture merging needs [H, W, 4] RGBA "
                        f"textures, got shape {tex.shape} — render with "
                        "pipeline='split'"
                    )
                tid = uniq.setdefault(id(tex), (len(uniq), tex))[0]
                mode = getattr(mapping, "value", mapping)
                row += [
                    float(tid),
                    float(tex.shape[1]),
                    float(tex.shape[0]),
                    MAP_CODES[mode],
                ]
            row += [0.0, 1.0, 1.0, 0.0] * (lmax - len(d.texture_layers))
            entry_parts.append(
                jnp.broadcast_to(jnp.asarray(row, jnp.float32), (n, width))
            )
        tex_entry = jnp.concatenate(entry_parts)
        texs_u = [t for _, t in sorted(uniq.values(), key=lambda p: p[0])]
        hm = max(t.shape[0] for t in texs_u)
        wm = max(t.shape[1] for t in texs_u)
        atlas = jnp.stack(
            [
                jnp.pad(
                    t, ((0, hm - t.shape[0]), (0, wm - t.shape[1]), (0, 0))
                )
                for t in texs_u
            ]
        )
        # textured MESH entries sample their vertex UVs; absentee draws
        # (quads, and meshes WITHOUT vertex UVs — which must keep the quad
        # parameterization, matching their own split pass) pad NaN, and the
        # raster substitutes mesh UVs only where the triplet is finite
        uv_abc = cat_or("uv_abc", jnp.nan, width=6)

    # Appearance indirection: if any draw carries a remap (ribbon
    # segments), the merged draw needs one too — each block's remap
    # offsets by its base row (appearance concatenates in the same draw
    # order, so source indices stay within the block), identity for
    # blocks without one. Per-draw-constant columns (mode_id, tri,
    # tex_entry, ...) are unaffected by within-block reordering.
    remap = None
    if any(d.remap is not None for d in draws):
        parts = []
        base = 0
        for d in draws:
            n = d.alive.shape[0]
            local = (
                d.remap
                if d.remap is not None
                else jnp.arange(n, dtype=jnp.int32)
            )
            parts.append(local.astype(jnp.int32) + base)
            base += n
        remap = jnp.concatenate(parts)

    return ParticleDrawData(
        position=cat("position"),
        axis_x=cat("axis_x"),
        axis_y=cat("axis_y"),
        color=cat("color"),
        alive=cat("alive"),
        remap=remap,
        roundness=roundness,
        sprite_index=cat("sprite_index"),
        sprite_grid_size=(1, 1),
        texture_layers=(),
        needs_uv=False,
        alpha_cutoff=cutoff,
        mode_id=mode_id,
        tri=tri,
        uv_abc=uv_abc,
        nrm_abc=nrm_abc,
        vcol_abc=vcol_abc,
        lighting=lighting,
        light_entry=light_entry,
        atlas=atlas,
        tex_entry=tex_entry,
    )

"""Tile-binned particle splat rasterizer (pure XLA).

The reference gets rasterization for free from the GPU graphics pipeline
(vfx_render.wgsl + ROP blending). TPUs have no ROP hardware, no atomics and
no warp scatter, so this renderer is built the way TPU splatting renderers
are: **bin → sort → bounded per-tile blend**, all with static shapes:

1. project particle quads to screen; compute conservative pixel bboxes;
2. replicate each particle into the (bounded) set of tiles its bbox touches;
3. one ``lax.sort`` orders all (tile, depth) entries back-to-front per tile —
   this also replaces the reference's per-view transparent-phase sorting;
4. a bounded ``fori_loop`` blends up to ``max_entries_per_tile`` entries into
   each tile's [T, T, 4] block held in registers/VMEM (carry of a scan), which
   XLA fuses into one pass per entry step.

Alpha modes follow the reference's blend-state mapping (asset.rs:212-240):
blend/premultiply/add/multiply are order-dependent (hence the depth sort);
opaque/mask use last-write-wins which the back-to-front order makes a depth
test.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .camera import CameraParams
from .extract import ParticleDrawData

__all__ = ["RasterConfig", "rasterize"]


@dataclass(frozen=True)
class RasterConfig:
    """Static rasterizer configuration (part of the jit signature)."""

    width: int = 512
    height: int = 512
    tile_size: int = 16
    # Each particle is binned into at most tile_span^2 tiles; splats larger
    # than tile_span*tile_size pixels are cropped (raise tile_span for big
    # quads, at linear memory cost in bin entries).
    tile_span: int = 2
    # Bin-entry slots per particle. 0 (default) = tile_span^2, fully exact.
    # 2 emits the bbox-corner tile plus the dominant-spill neighbor: exact
    # whenever a splat crosses at most one tile boundary (the overwhelming
    # case for particles smaller than a tile); a splat straddling BOTH axes
    # keeps its corner tile + largest spill and loses the remaining
    # sub-splat slivers (<2% of particles at typical sizes). The
    # (tile, depth) sort is the render bottleneck and scales linearly with
    # slots: 2 slots is ~1.4x faster end-to-end at 1M small particles.
    # 1 bins each splat ONLY to the tile containing its center: exact for
    # splats inside one tile, but a boundary-crossing splat loses every
    # fragment outside its center tile (larger tiles shrink that loss —
    # at tile_size=32 a 2px splat crosses a boundary ~12% of the time and
    # loses <¼ of its area when it does). The multi-million-particle
    # scaling config: the sort sees exactly N entries.
    tile_slots: int = 0
    # Blend budget per tile: entries beyond this (back-to-front) are dropped.
    max_entries_per_tile: int = 64
    # Entries composited per loop iteration: XLA fuses the unrolled chain into
    # one framebuffer pass, dividing blend-loop HBM traffic by this factor.
    blend_unroll: int = 8
    # Analytic edge antialiasing: per-pixel fractional coverage instead of
    # binary inside tests — sub-pixel particles fade smoothly instead of
    # popping (the reference gets this from MSAA + texture filtering).
    antialias: bool = False
    # ADD and MULTIPLY blending commute, so those modes only need per-tile
    # grouping, not depth ordering (the reference still depth-sorts them in
    # the transparent phase, but the result is order-invariant). When the
    # key bits fit, the rasterizer then sorts ONE packed u32
    # (tile | entry-index) instead of (key, payload): half the sort bytes
    # and one fewer window gather. Deterministic (entry-index order within
    # a tile). Disable to force the ordered path (testing).
    order_independent_fast: bool = True
    # Which entries survive when a tile exceeds max_entries_per_tile, on
    # the order-independent fast path (the ordered path ALWAYS keeps the
    # nearest M — its window sits at the front of the depth-sorted run):
    # * "nearest" (default): the kept M are (approximately) the nearest —
    #   coarse front-to-back depth is packed into the sort key's slack
    #   bits when >= 4 fit, else the sort carries a payload operand
    #   (~15% slower lax.sort) so the window is exactly the nearest M.
    # * "first": the kept M are the first in entry-index order —
    #   depth-blind under overflow (a deep additive stack may drop near
    #   fragments in favor of far ones), but always the cheapest 1-op
    #   sort. Size max_entries_per_tile generously if you use this.
    overflow_policy: str = "nearest"
    background: Tuple[float, float, float, float] = (0.0, 0.0, 0.0, 0.0)

    def __post_init__(self):
        if self.tile_slots not in (0, 1, 2):
            raise ValueError(
                "tile_slots must be 0 (exact span^2 binning), 1 "
                "(center-tile-only fast binning), or 2 (corner + "
                "dominant-spill fast binning); got "
                f"{self.tile_slots}"
            )
        if self.overflow_policy not in ("nearest", "first"):
            raise ValueError(
                "overflow_policy must be 'nearest' or 'first'; got "
                f"{self.overflow_policy!r}"
            )

    @property
    def tiles_x(self) -> int:
        return -(-self.width // self.tile_size)

    @property
    def tiles_y(self) -> int:
        return -(-self.height // self.tile_size)

    @property
    def num_tiles(self) -> int:
        return self.tiles_x * self.tiles_y


def _bilinear_wrap(lookup, tw, th, u, v):
    """4-tap bilinear filtering with wrap addressing, half-texel centered.

    ``lookup(vi, ui) -> [..., C]`` resolves integer texel indices (a plain
    texture or an atlas layer); ``tw``/``th`` may be python ints or
    per-entry float arrays — all index math mods by the TRUE size, so
    padded atlas texels are never sampled. The single definition keeps the
    split-pass and painter-pass filtering conventions identical."""
    uu = u * tw - 0.5
    vv = v * th - 0.5
    u0 = jnp.floor(uu)
    v0 = jnp.floor(vv)
    fu = (uu - u0)[..., None]
    fv = (vv - v0)[..., None]
    u0i = jnp.mod(u0, tw).astype(jnp.int32)
    v0i = jnp.mod(v0, th).astype(jnp.int32)
    u1i = jnp.mod(u0 + 1.0, tw).astype(jnp.int32)
    v1i = jnp.mod(v0 + 1.0, th).astype(jnp.int32)
    t00 = lookup(v0i, u0i)
    t01 = lookup(v0i, u1i)
    t10 = lookup(v1i, u0i)
    t11 = lookup(v1i, u1i)
    top = t00 + (t01 - t00) * fu
    bot = t10 + (t11 - t10) * fu
    return top + (bot - top) * fv


def _project(camera: CameraParams, p: jnp.ndarray):
    """World [N,3] -> (screen_xy [N,2] px, view_dist [N], ndc_z [N]).

    ``view_dist`` is the distance along the camera forward axis (-view z):
    a valid painter's-order depth for both perspective and orthographic
    projections (clip w degenerates to 1 under ortho).
    """
    # Elementwise 4x4 transform: tiny (4,4)@(4,N) matmuls lower terribly on
    # TPU (measured ~17ms per projection at 1M); broadcasting scalars is
    # ~free. The 4x4 product itself also avoids `@`: traced camera matrices
    # would hit the MXU at bf16 default precision (ops/linalg.py).
    from ..ops.linalg import mat4_mul

    mvp = mat4_mul(camera.proj, camera.view)
    px, py, pz = p[:, 0], p[:, 1], p[:, 2]

    def row(m, i):
        return m[i, 0] * px + m[i, 1] * py + m[i, 2] * pz + m[i, 3]

    view_z = row(camera.view, 2)
    cx = row(mvp, 0)
    cy = row(mvp, 1)
    cz = row(mvp, 2)
    w = row(mvp, 3)
    safe_w = jnp.where(jnp.abs(w) < 1e-6, 1e-6, w)
    width, height = camera.viewport
    x = (cx / safe_w * 0.5 + 0.5) * width
    y = (1.0 - (cy / safe_w * 0.5 + 0.5)) * height
    return jnp.stack([x, y], axis=1), -view_z, cz / safe_w


def rasterize(
    draw: ParticleDrawData,
    camera: CameraParams,
    config: RasterConfig,
    alpha_mode: str = "blend",
    textures: Sequence[Any] = (),
    alpha_cutoff: Any = 0.5,
    scene_depth: Any = None,
    return_depth: bool = False,
    y_offset: Any = None,
    framebuffer: Any = None,
) -> jnp.ndarray:
    """Render particles to a [height, width, 4] float32 image.

    ``framebuffer`` (traced [height, width, 4], optional) seeds the blend
    target instead of ``config.background`` — the painter pass
    (``alpha_mode="scene"``) blends the whole scene directly onto it, no
    post-hoc compositing.

    ``y_offset`` (traced scalar, optional) shifts projected screen y by
    ``-y_offset`` pixels: the raster grid then covers viewport rows
    [y_offset, y_offset + height) — a horizontal SLICE of a taller
    viewport. Image-space sharded rendering rasterizes one slice per
    device this way (parallel/render.py); ``scene_depth`` must then be the
    matching slice.

    Draw integration with surrounding scene geometry (the reference gets
    this from the game's depth buffer — its draws are depth-tested against
    Bevy's Opaque3d depth and its opaque/mask phases write depth,
    render/mod.rs:6607-6846):

    * ``scene_depth``: optional [height, width] float32 view-axis distance
      of existing scene geometry (+inf where empty). Fragments behind it
      are discarded (depth test ``LessEqual``), for every alpha mode.
    * ``return_depth``: if True, returns ``(image, depth)`` where ``depth``
      is the [height, width] view-axis distance of the nearest surviving
      fragment, seeded from ``scene_depth`` (or +inf). Only ``opaque`` and
      ``mask`` modes write depth, like the reference's Opaque3d/AlphaMask3d
      phases; transparent modes raise (they are read-only depth clients).
    """
    n = draw.position.shape[0]
    T = config.tile_size
    span = config.tile_span
    ntx, nty, nt = config.tiles_x, config.tiles_y, config.num_tiles
    painter = alpha_mode == "scene"
    if painter and draw.mode_id is None:
        raise ValueError(
            'alpha_mode="scene" needs per-entry blend modes: populate '
            "draw.mode_id (0=blend 1=premultiply 2=add 3=multiply "
            "4=opaque 5=mask)"
        )
    if return_depth and alpha_mode not in ("opaque", "mask", "scene"):
        raise ValueError(
            "return_depth requires an opaque or mask alpha mode (transparent"
            " modes are read-only depth clients, like the reference's"
            " Transparent3d phase)"
        )
    # The painter pass always threads a depth buffer: its opaque/mask
    # entries write depth mid-loop so later (nearer) transparent entries
    # can be tested against it.
    need_depth = scene_depth is not None or return_depth or painter

    # ---- 1. project centers and half-axes ----
    center, w, _ = _project(camera, draw.position)
    c_x1, _, _ = _project(camera, draw.position + 0.5 * draw.axis_x)
    c_y1, _, _ = _project(camera, draw.position + 0.5 * draw.axis_y)
    h1 = c_x1 - center  # screen half-extent along particle x axis
    h2 = c_y1 - center
    if y_offset is not None:
        # slice rendering: the grid covers viewport rows starting at
        # y_offset (half-extents are differences — unaffected)
        center = jnp.concatenate(
            [center[:, :1], center[:, 1:2] - jnp.asarray(y_offset, jnp.float32)],
            axis=1,
        )
    depth = w  # view distance for perspective; affine for ortho

    valid = jnp.logical_and(draw.alive, w > 1e-4)
    rx = jnp.abs(h1[:, 0]) + jnp.abs(h2[:, 0])
    ry = jnp.abs(h1[:, 1]) + jnp.abs(h2[:, 1])
    if draw.tri is not None:
        # triangle entries span |u|,|v| <= 0.5 around their midpoint anchor
        # (mesh.py) — half the quad extent
        half = jnp.where(draw.tri > 0.5, 0.5, 1.0)
        rx = rx * half
        ry = ry * half
    valid &= (center[:, 0] + rx > 0) & (center[:, 0] - rx < config.width)
    valid &= (center[:, 1] + ry > 0) & (center[:, 1] - ry < config.height)
    valid &= (rx > 1e-6) & (ry > 1e-6)

    # ---- 2. bin into tiles (bounded replication) ----
    tx0 = jnp.floor((center[:, 0] - rx) / T).astype(jnp.int32)
    ty0 = jnp.floor((center[:, 1] - ry) / T).astype(jnp.int32)
    tx1 = jnp.floor((center[:, 0] + rx) / T).astype(jnp.int32)
    ty1 = jnp.floor((center[:, 1] + ry) / T).astype(jnp.int32)

    entry_tile = []
    entry_pidx = []
    entry_depth = []
    pidx = jnp.arange(n, dtype=jnp.int32)
    if config.tile_slots == 1:
        # Center-tile-only binning: ONE entry per particle, at the tile
        # holding the splat center (clamped on screen). Boundary-crossing
        # fragments outside that tile drop — see the tile_slots docstring.
        tcx = jnp.clip(
            jnp.floor(center[:, 0] / T).astype(jnp.int32), 0, ntx - 1
        )
        tcy = jnp.clip(
            jnp.floor(center[:, 1] / T).astype(jnp.int32), 0, nty - 1
        )
        tile0 = jnp.where(valid, tcy * ntx + tcx, nt)
        entry_tile = [tile0]
        entry_pidx = [pidx]
        entry_depth = [jnp.where(valid, depth, -jnp.inf)]
    elif config.tile_slots == 2:
        # Two slots per particle: the (screen-clamped) bbox-corner tile and
        # the dominant-spill neighbor. Exact unless a splat straddles both a
        # vertical and a horizontal tile boundary (then only the largest
        # spill is kept); halves the entry count the sort sees vs span^2.
        tcx = jnp.clip(tx0, 0, ntx - 1)
        tcy = jnp.clip(ty0, 0, nty - 1)
        ok0 = valid & (tcx <= tx1) & (tcy <= ty1)
        tile0 = jnp.where(ok0, tcy * ntx + tcx, nt)
        # spill extents (px) past the corner tile's right/bottom edges
        sx = (tx1 > tcx) & (tcx + 1 < ntx)
        sy = (ty1 > tcy) & (tcy + 1 < nty)
        spill_x = (center[:, 0] + rx) - (tcx + 1).astype(jnp.float32) * T
        spill_y = (center[:, 1] + ry) - (tcy + 1).astype(jnp.float32) * T
        use_x = sx & (jnp.logical_not(sy) | (spill_x >= spill_y))
        ok1 = valid & (sx | sy)
        tile1 = jnp.where(
            ok1,
            jnp.where(use_x, tile0 + 1, tile0 + ntx),
            nt,
        )
        entry_tile = [tile0, tile1]
        entry_pidx = [pidx, pidx]
        entry_depth = [
            jnp.where(ok0, depth, -jnp.inf),
            jnp.where(ok1, depth, -jnp.inf),
        ]
    else:
        for dy in range(span):
            for dx in range(span):
                tx = tx0 + dx
                ty = ty0 + dy
                ok = valid & (tx <= tx1) & (ty <= ty1)
                ok &= (tx >= 0) & (tx < ntx) & (ty >= 0) & (ty < nty)
                tile = jnp.where(ok, ty * ntx + tx, nt)  # nt = sentinel bin
                entry_tile.append(tile)
                entry_pidx.append(pidx)
                entry_depth.append(jnp.where(ok, depth, -jnp.inf))
    tile_ids = jnp.concatenate(entry_tile)
    pidxs = jnp.concatenate(entry_pidx)
    depths = jnp.concatenate(entry_depth)

    # ---- 3. sort by (tile asc, depth desc) => back-to-front per tile ----
    num_entries = tile_ids.shape[0]
    tile_bits = max(1, int(np.ceil(np.log2(nt + 2))))
    idx_bits = max(1, int(np.ceil(np.log2(max(num_entries, 2)))))
    slack = 32 - tile_bits - idx_bits
    # ADD/MULTIPLY blending commutes (saturating alpha-add included), so
    # the sort only has to GROUP entries per tile, not order them by depth.
    # Three fast variants, picked statically:
    # * "first":  1-op key (tile | entry-index); overflow keeps the first M
    #   in entry order (depth-blind).
    # * "depth":  1-op key (tile | coarse-front-to-back-depth | entry-index)
    #   when >= 4 slack bits fit; overflow keeps ~the nearest M.
    # * "payload": 2-op (tile | exact-front-to-back-depth, pidx) when no
    #   slack bits are left; overflow keeps exactly the nearest M at ~15%
    #   more sort cost.
    fast = config.order_independent_fast and alpha_mode in ("add", "multiply")
    if not fast:
        fast_mode = None
    elif config.overflow_policy == "first" and slack >= 0:
        fast_mode = "first"
    elif slack >= 4:
        fast_mode = "depth"
    else:
        fast_mode = "payload"
    fast_decode = fast_mode in ("first", "depth")

    def quant_depth(depth_bits):
        """Quantize entry depths ascending (near = small) to depth_bits."""
        finite = depths > -jnp.inf
        dmin = jnp.min(jnp.where(finite, depths, jnp.inf))
        dmax = jnp.max(jnp.where(finite, depths, -jnp.inf))
        span_d = jnp.maximum(dmax - dmin, 1e-9)
        scale = jnp.float32((1 << depth_bits) - 1)
        dq = (jnp.clip((depths - dmin) / span_d, 0.0, 1.0) * scale).astype(
            jnp.uint32
        )
        return dq, scale

    if fast_decode:
        # One packed u32: lax.sort moves half the bytes of a (key, payload)
        # pair, the entry index recovers the particle id arithmetically
        # (entries are slot-concatenated pidx repeats), and the in-tile
        # order is deterministic by construction.
        db = min(slack, 8) if fast_mode == "depth" else 0
        key = (tile_ids.astype(jnp.uint32) << (db + idx_bits)) | jnp.arange(
            num_entries, dtype=jnp.uint32
        )
        if db:
            dq, _ = quant_depth(db)
            key = key | (dq << idx_bits)
        (key_sorted,) = jax.lax.sort((key,), num_keys=1)
        # All keys of tile t lie in [t << shift, (t+1) << shift), so ONE
        # searchsorted of the nt+1 bounds yields every run: starts[t] =
        # r[t], ends[t] = r[t+1] (two separate calls measured ~0.14 ms
        # extra per pass — searchsorted lowers to a sequential while).
        bound = jnp.arange(nt + 1, dtype=jnp.uint32) << (db + idx_bits)
        r = jnp.searchsorted(key_sorted, bound)
        starts, ends = r[:-1], r[1:]
        pidx_sorted = None  # windows decode pidx from key_sorted directly
    else:
        # The ordered path packs (tile | quantized-depth) into a uint32 key:
        # one sort operand instead of three (~17% faster lax.sort at 4M
        # entries). Depth quantizes to the bits left under the tile id; ties
        # blend in arbitrary order (only equal-depth overlaps are affected —
        # the same tie behavior GPU rasterization has). Depth runs
        # back-to-front for ordered blends (window at the END = nearest M)
        # and front-to-back for the commutative payload fast path (window
        # at the START = nearest M).
        # cap depth bits at 22 so the f32 quantization math stays exact
        depth_bits = min(22, 32 - tile_bits)
        dq, scale = quant_depth(depth_bits)
        if fast_mode == "payload":
            dq_key = dq  # ascending: near first
        else:
            dq_key = scale.astype(jnp.uint32) - dq  # descending: far first
        key = (tile_ids.astype(jnp.uint32) << depth_bits) | dq_key
        # lax.sort is the measured optimum here: every hand-rolled
        # alternative (VMEM bitonic with roll/matmul exchanges, streaming
        # matmul compaction, scatter/radix placement) lost to it at every
        # size — see docs/PERF.md "Sorting & compaction: measured dead
        # ends".
        key_sorted, pidx_sorted = jax.lax.sort((key, pidxs), num_keys=1)
        # Tile runs come from ONE searchsorted of the nt+1 tile-key bounds
        # against the sorted keys: entries of tile t occupy [r[t], r[t+1])
        # (invalid entries carry tile nt and land past the last bound).
        # One call instead of two and no materialized tile_sorted array.
        bound = jnp.arange(nt + 1, dtype=jnp.uint32) << depth_bits
        r = jnp.searchsorted(key_sorted, bound)
        starts, ends = r[:-1], r[1:]

    # ---- 4. bounded per-tile blend ----
    tile_row = jnp.arange(nt, dtype=jnp.int32) // ntx
    tile_col = jnp.arange(nt, dtype=jnp.int32) % ntx
    py = (
        tile_row[:, None, None] * T
        + jnp.arange(T, dtype=jnp.int32)[None, :, None]
    ).astype(jnp.float32) + 0.5
    px = (
        tile_col[:, None, None] * T
        + jnp.arange(T, dtype=jnp.int32)[None, None, :]
    ).astype(jnp.float32) + 0.5

    if framebuffer is not None:
        fbp = jnp.pad(
            jnp.asarray(framebuffer, jnp.float32),
            (
                (0, nty * T - config.height),
                (0, ntx * T - config.width),
                (0, 0),
            ),
        )
        fb0 = (
            fbp.reshape(nty, T, ntx, T, 4)
            .transpose(0, 2, 1, 3, 4)
            .reshape(nt, T, T, 4)
        )
    else:
        bg = jnp.asarray(config.background, jnp.float32)
        fb0 = jnp.broadcast_to(bg, (nt, T, T, 4)).astype(jnp.float32)

    # Tiled scene-depth plane, [nt, T, T] (pad = +inf: no geometry there).
    if need_depth:
        if scene_depth is not None:
            sd = jnp.asarray(scene_depth, jnp.float32)
            sd = jnp.pad(
                sd,
                ((0, nty * T - config.height), (0, ntx * T - config.width)),
                constant_values=jnp.inf,
            )
        else:
            sd = jnp.full((nty * T, ntx * T), jnp.inf, jnp.float32)
        sd_tiles = sd.reshape(nty, T, ntx, T).transpose(0, 2, 1, 3).reshape(
            nt, T, T
        )
    else:
        sd_tiles = None

    grid_cols, grid_rows = draw.sprite_grid_size

    # ---- pre-gather entry tables [M, nt] ----
    # All per-particle blend fields are packed into ONE [N, F] row matrix and
    # fetched with a single row gather: measured 2.4x faster than one gather
    # per field (random-row HBM traffic is row-count-bound, not byte-bound),
    # and the gather dominates the whole blend phase.
    M = config.max_entries_per_tile
    # Overflowing tiles keep the NEAREST M entries: the viewer sees the
    # front of a deep stack, so dropping must trim the far tail, not the
    # near head. On the ordered path the window sits at the END of the
    # back-to-front run; on the fast paths it sits at the START, which is
    # nearest-first under "depth"/"payload" overflow policy (and plain
    # entry-index order — slot-0 full splats before slot-1 spill slivers —
    # under "first"; for commutative blends any M-subset is a valid
    # truncation).
    base = starts if fast else jnp.maximum(ends - M, starts)  # [nt]
    raw = base[None, :] + jnp.arange(M, dtype=starts.dtype)[:, None]
    idx = jnp.minimum(raw, num_entries - 1)  # [M, nt]
    if fast_decode:
        # One window gather of the packed key; tile membership is implied by
        # the searchsorted bounds and pidx = entry_index mod n (entries are
        # slot-concatenated repeats of arange(n)).
        k_win = key_sorted[idx]
        t_has = raw < ends[None, :]
        entry_win = (k_win & jnp.uint32((1 << idx_bits) - 1)).astype(jnp.int32)
        t_p = jnp.remainder(entry_win, n)
    else:
        # Tile membership is implied by the run bounds: every entry in
        # [starts[t], ends[t]) has tile exactly t, so ``raw < ends`` alone
        # masks the window — re-gathering the sorted tiles to check
        # membership cost a redundant [M, nt] gather (~0.47 ms/frame per
        # pass at M=64, nt=1024 on v5e).
        t_has = raw < ends[None, :]
        t_p = pidx_sorted[idx]  # [M, nt]

    # Geometry columns (projected quad frame + depth) are in DRAW-ROW
    # order; appearance columns may sit behind ``draw.remap`` in SOURCE
    # order (ribbon segments — extract.APPEARANCE_FIELDS). Without a
    # remap both stacks fuse into the single row gather below; with one,
    # appearance is fetched by a SECOND window gather through the
    # composed index remap[t_p] — window-sized (M*nt rows), so the
    # indirection costs ~nothing while deleting the full-N appearance
    # permutation gather from the ribbon prepass.
    gcols = [
        center[:, 0],
        center[:, 1],
        h1[:, 0],
        h1[:, 1],
        h2[:, 0],
        h2[:, 1],
    ]
    cols = [
        draw.color[:, 0],
        draw.color[:, 1],
        draw.color[:, 2],
        draw.color[:, 3],
    ]
    if draw.roundness is not None:
        i_round = len(cols)
        cols.append(draw.roundness)
    if draw.tri is not None:
        i_tri = len(cols)
        cols.append(draw.tri)
    # merged painter draws sample a stacked atlas with per-entry state
    # (tex id, true size, mapping, flipbook grid — concat_painter_draws)
    has_ptex = draw.atlas is not None and draw.tex_entry is not None
    need_sprite = (
        draw.texture_layers and draw.sprite_grid_size != (1, 1)
    ) or has_ptex
    if need_sprite:
        i_sprite = len(cols)
        cols.append(draw.sprite_index.astype(jnp.float32))
    if has_ptex:
        i_ptex = len(cols)
        n_ptex = draw.tex_entry.shape[1]  # 2 + 4 * layer count
        cols.extend(draw.tex_entry[:, j] for j in range(n_ptex))
    need_cutoff = alpha_mode == "mask" or painter
    if need_cutoff and draw.alpha_cutoff is not None:
        i_cutoff = len(cols)
        cols.append(draw.alpha_cutoff)
    if painter:
        i_mode = len(cols)
        cols.append(draw.mode_id.astype(jnp.float32))
    # mesh vertex-attribute triplets (interpolated barycentrically below)
    has_mesh_uv = draw.uv_abc is not None and (
        bool(draw.texture_layers) or has_ptex
    )
    if has_mesh_uv:
        i_uv = len(cols)
        cols.extend(draw.uv_abc[:, j] for j in range(6))
    has_lighting = draw.nrm_abc is not None and (
        draw.lighting is not None or draw.light_entry is not None
    )
    if has_lighting:
        i_nrm = len(cols)
        cols.extend(draw.nrm_abc[:, j] for j in range(9))
    # per-entry Lambert params (painter merge of >1 distinct setup)
    has_light_entry = has_lighting and draw.light_entry is not None
    if has_light_entry:
        i_light = len(cols)
        cols.extend(draw.light_entry[:, j] for j in range(4))
    has_vcol = draw.vcol_abc is not None
    if has_vcol:
        i_vcol = len(cols)
        cols.extend(draw.vcol_abc[:, j] for j in range(12))
    if need_depth:
        i_depth = len(gcols)
        gcols.append(depth)
    if draw.remap is not None:
        grows = jnp.stack(gcols, axis=1)[t_p]  # [M, nt, G]
        t_pa = draw.remap[t_p]
        rows = jnp.stack(cols, axis=1)[t_pa]  # [M, nt, A]
    else:
        both = jnp.stack(gcols + cols, axis=1)[t_p]
        grows = both[..., : len(gcols)]
        rows = both[..., len(gcols):]

    t_cx = grows[..., 0]
    t_cy = grows[..., 1]
    t_h1x = grows[..., 2]
    t_h1y = grows[..., 3]
    t_h2x = grows[..., 4]
    t_h2y = grows[..., 5]
    t_color = rows[..., 0:4]  # [M, nt, 4]
    t_round = rows[..., i_round] if draw.roundness is not None else None
    t_tri = rows[..., i_tri] if draw.tri is not None else None
    t_sprite = rows[..., i_sprite].astype(jnp.int32) if need_sprite else None
    # Per-particle mask cutoff (vfx_render.wgsl:319-325); scalar fallback
    # when the draw data carries none.
    if need_cutoff and draw.alpha_cutoff is not None:
        t_cutoff = rows[..., i_cutoff]
    else:
        t_cutoff = jnp.broadcast_to(
            jnp.asarray(alpha_cutoff, jnp.float32), t_p.shape
        )
    t_mode = rows[..., i_mode] if painter else None
    t_ptex = rows[..., i_ptex : i_ptex + n_ptex] if has_ptex else None
    t_uv = rows[..., i_uv : i_uv + 6] if has_mesh_uv else None
    t_nrm = rows[..., i_nrm : i_nrm + 9] if has_lighting else None
    t_light = rows[..., i_light : i_light + 4] if has_light_entry else None
    t_vcol = rows[..., i_vcol : i_vcol + 12] if has_vcol else None
    t_fragd = grows[..., i_depth] if need_depth else None

    def sample_texture(tex, u, v):
        th, tw = tex.shape[0], tex.shape[1]
        return _bilinear_wrap(lambda vi, ui: tex[vi, ui], tw, th, u, v)

    def blend_one(m, fb, dbuf):
        in_range = m < M
        m = jnp.minimum(m, M - 1)
        has = t_has[m] & in_range
        col = t_color[m]  # [nt,4]
        dx = px - t_cx[m][:, None, None]  # [nt,T,T]
        dy = py - t_cy[m][:, None, None]
        a1x, a1y = t_h1x[m], t_h1y[m]
        a2x, a2y = t_h2x[m], t_h2y[m]
        det_f = a1x * a2y - a1y * a2x
        det_f = jnp.where(jnp.abs(det_f) < 1e-9, 1e-9, det_f)
        det = det_f[:, None, None]
        u = (a2y[:, None, None] * dx - a2x[:, None, None] * dy) / det
        v = (-a1y[:, None, None] * dx + a1x[:, None, None] * dy) / det
        inside = (jnp.abs(u) <= 1.0) & (jnp.abs(v) <= 1.0)
        if t_tri is not None:
            # Triangle entries (mesh.py): position is the midpoint (B+C)/2
            # and h1/h2 are the screen-space edges AB/AC, so barycentric
            # coords are (u+0.5, v+0.5): inside iff u>=-0.5, v>=-0.5,
            # u+v<=0 (and |u|,|v|<=0.5, within the quad bbox).
            is_tri = (t_tri[m] > 0.5)[:, None, None]
            tri_inside = (u >= -0.5) & (v >= -0.5) & (u + v <= 0.0)
            inside = jnp.where(is_tri, tri_inside, inside)
        inside &= has[:, None, None]
        if config.antialias:
            # fractional coverage: ramp width = one pixel at the quad edge
            eu = jnp.sqrt(a1x * a1x + a1y * a1y)[:, None, None]  # half-extent px
            ev = jnp.sqrt(a2x * a2x + a2y * a2y)[:, None, None]
            cov_u = jnp.clip((1.0 - jnp.abs(u)) * eu + 0.5, 0.0, 1.0)
            cov_v = jnp.clip((1.0 - jnp.abs(v)) * ev + 0.5, 0.0, 1.0)
            coverage = cov_u * cov_v * has[:, None, None]
            if t_tri is not None:
                # Analytic triangle edge ramp: signed pixel distance to each
                # of the three half-planes (u>=-0.5, v>=-0.5, u+v<=0). The
                # uv-space gradients have pixel magnitudes |grad u| =
                # |a2|/|det|, |grad v| = |a1|/|det|, |grad(u+v)| =
                # |a2-a1|/|det|, so dividing the uv-space slack by them
                # converts to pixels — the same one-pixel ramp quads get.
                absdet = jnp.abs(det_f)[:, None, None]
                e12x = a2x - a1x
                e12y = a2y - a1y
                e12 = jnp.sqrt(e12x * e12x + e12y * e12y)[:, None, None]
                eps = 1e-9
                d1 = (u + 0.5) * absdet / jnp.maximum(ev, eps)
                d2 = (v + 0.5) * absdet / jnp.maximum(eu, eps)
                d3 = -(u + v) * absdet / jnp.maximum(e12, eps)
                cov_tri = (
                    jnp.clip(d1 + 0.5, 0.0, 1.0)
                    * jnp.clip(d2 + 0.5, 0.0, 1.0)
                    * jnp.clip(d3 + 0.5, 0.0, 1.0)
                ) * has[:, None, None]
                coverage = jnp.where(is_tri, cov_tri, coverage)
            inside = coverage > 0.0
        else:
            coverage = inside.astype(jnp.float32)
        if need_depth:
            # depth test LessEqual against scene geometry (and, when this
            # pass writes depth, against fragments written so far — back-to-
            # front order makes the two equivalent within the pass)
            frag_d = t_fragd[m][:, None, None]
            vis = frag_d <= (dbuf if dbuf is not None else sd_tiles)
            inside &= vis
            coverage = coverage * vis.astype(jnp.float32)
        u01 = u * 0.5 + 0.5
        v01 = v * 0.5 + 0.5

        # squircle rounding (output.rs:899-918): discard where
        # |1-2u|^nexp + |1-2v|^nexp > 1. Statically skipped when no
        # RoundModifier ran: the two pow() transcendentals per pixel are
        # ~10x the rest of the blend math.
        if t_round is not None:
            rnd = t_round[m]
            nexp = (2.0 / jnp.maximum(rnd, 1e-6))[:, None, None]
            squircle = jnp.power(jnp.abs(1.0 - 2.0 * u01), nexp) + jnp.power(
                jnp.abs(1.0 - 2.0 * v01), nexp
            )
            sq_ok = (rnd[:, None, None] <= 0.0) | (squircle <= 1.0)
            if t_tri is not None:
                sq_ok |= is_tri  # rounding is a quad-space concept
            inside &= sq_ok
            coverage = coverage * sq_ok.astype(jnp.float32)

        # Barycentric coordinates for triangle entries: (s, t) = (u,v)+0.5
        # (mesh.py anchors at (B+C)/2). Attribute at (s,t) interpolates as
        # A + s*(B-A) + t*(C-A); quad entries carry constant triplets, so
        # the same formula degenerates to A and needs no branch.
        def bary_interp(trip, j0, nc):
            """Interpolate triplet columns [j0:j0+3*nc] -> [nt,T,T,nc]."""
            s = u + 0.5
            tt = v + 0.5
            out = []
            for c in range(nc):
                va_ = trip[:, j0 + c][:, None, None]
                vb_ = trip[:, j0 + nc + c][:, None, None]
                vc_ = trip[:, j0 + 2 * nc + c][:, None, None]
                out.append(va_ + s * (vb_ - va_) + tt * (vc_ - va_))
            return jnp.stack(out, axis=-1)

        src = jnp.broadcast_to(col[:, None, None, :], (nt, T, T, 4))
        if t_vcol is not None:
            # per-vertex colors modulate the particle color (the reference
            # multiplies mesh ATTRIBUTE_COLOR into the fragment color)
            src = src * bary_interp(t_vcol[m], 0, 4)
        if t_nrm is not None:
            if t_light is not None:
                # per-entry Lambert params (>1 distinct setup merged by the
                # painter pass; unlit entries carry band 1 → shade == 1)
                lt = t_light[m]  # [nt, 4]
                lx = lt[..., 0][:, None, None]
                ly = lt[..., 1][:, None, None]
                lz = lt[..., 2][:, None, None]
                band = lt[..., 3][:, None, None]
            else:
                (lx, ly, lz), band = draw.lighting
            nvec = bary_interp(t_nrm[m], 0, 3)
            nn = nvec / jnp.maximum(
                jnp.sqrt(jnp.sum(nvec * nvec, axis=-1, keepdims=True)), 1e-9
            )
            ndotl = nn[..., 0] * lx + nn[..., 1] * ly + nn[..., 2] * lz
            shade = jnp.clip(ndotl, band, 1.0)
            src = src.at[..., :3].multiply(shade[..., None])
        if draw.texture_layers:
            if t_uv is not None:
                # mesh vertex UVs replace the quad parameterization for
                # triangle entries (vfx_render.wgsl:286-288: real mesh UVs
                # feed texture sampling); NaN-padded entries (no vertex
                # UVs) keep the quad parameterization
                muv = bary_interp(t_uv[m], 0, 2)
                uv_ok = jnp.isfinite(t_uv[m][..., 0])[:, None, None]
                u01 = jnp.where(is_tri & uv_ok, muv[..., 0], u01)
                v01 = jnp.where(is_tri & uv_ok, muv[..., 1], v01)
            # flipbook cell mapping (FlipbookModifier)
            if (grid_cols, grid_rows) != (1, 1):
                sprite = t_sprite[m].astype(jnp.float32)
                cell_c = jnp.mod(sprite, grid_cols)[:, None, None]
                cell_r = jnp.floor_divide(sprite, grid_cols)[:, None, None]
                tu = (u01 + cell_c) / grid_cols
                tv = (v01 + cell_r) / grid_rows
            else:
                tu, tv = u01, v01
            for slot, mapping in draw.texture_layers:
                if slot >= len(textures):
                    raise ValueError(
                        f"texture slot {slot} is referenced by a "
                        f"ParticleTextureModifier but only {len(textures)} "
                        "texture(s) were provided — pass textures=[...] "
                        "when creating the renderer / adding the effect"
                    )
                tex = textures[slot]
                texel = sample_texture(tex, tu, tv)
                mode = getattr(mapping, "value", mapping)
                if mode == "modulate":
                    src = src * texel
                elif mode == "modulate_rgb":
                    src = src.at[..., :3].multiply(texel[..., :3])
                else:  # modulate_opacity_from_r
                    src = src.at[..., 3].multiply(texel[..., 0])
        elif has_ptex:
            # Merged painter textures: per-entry flipbook grid plus
            # per-LAYER (tex_id, true size, mapping) columns against the
            # stacked atlas, layers applied in modifier order. All index
            # math mods by the layer's TRUE size, so the zero padding to
            # the common atlas extent is never sampled.
            pt = t_ptex[m]  # [nt, 2 + 4*L]
            if t_uv is not None:
                muv = bary_interp(t_uv[m], 0, 2)
                uv_ok = jnp.isfinite(t_uv[m][..., 0])[:, None, None]
                u01 = jnp.where(is_tri & uv_ok, muv[..., 0], u01)
                v01 = jnp.where(is_tri & uv_ok, muv[..., 1], v01)
            gc = pt[..., 0][:, None, None]
            gr = pt[..., 1][:, None, None]
            sprite = t_sprite[m].astype(jnp.float32)[:, None, None]
            cell_c = jnp.mod(sprite, gc)
            cell_r = jnp.floor(sprite / gc)
            tu = (u01 + cell_c) / gc
            tv = (v01 + cell_r) / gr
            at = draw.atlas
            for layer in range((n_ptex - 2) // 4):
                o = 2 + 4 * layer
                tid = pt[..., o].astype(jnp.int32)[:, None, None]
                tw_e = pt[..., o + 1][:, None, None]
                th_e = pt[..., o + 2][:, None, None]
                texel = _bilinear_wrap(
                    lambda vi, ui: at[tid, vi, ui], tw_e, th_e, tu, tv
                )
                # per-entry mapping as neutral-by-default factors:
                # rgb ×= texel.rgb for modulate(1)/modulate_rgb(2);
                # a ×= texel.a for modulate(1), texel.r for
                # modulate_opacity_from_r(3); absent layer (0) stays ×1
                mm = pt[..., o + 3][:, None, None]
                rgbf = jnp.where(
                    ((mm == 1.0) | (mm == 2.0))[..., None],
                    texel[..., :3],
                    1.0,
                )
                af = jnp.where(
                    mm == 1.0,
                    texel[..., 3],
                    jnp.where(mm == 3.0, texel[..., 0], 1.0),
                )
                src = src * jnp.concatenate([rgbf, af[..., None]], axis=-1)

        # Zero-coverage lanes must contribute EXACTLY zero even when src or
        # the quad math is non-finite (NaN·0 = NaN would poison every pixel
        # of the tile; hardware ROP blending only touches covered
        # fragments, vfx_render.wgsl's FS never runs on uncovered pixels).
        covered = coverage[..., None] > 0.0
        a = jnp.where(covered, (src[..., 3] * coverage)[..., None], 0.0)
        rgb_s = jnp.where(covered, src[..., :3], 0.0)
        rgb_d = fb[..., :3]
        a_d = fb[..., 3:4]

        if alpha_mode == "blend":
            rgb = rgb_s * a + rgb_d * (1.0 - a)
            alpha = a + a_d * (1.0 - a)
        elif alpha_mode == "premultiply":
            # src RGB is premultiplied, so fractional coverage scales it the
            # same way it scales alpha — otherwise antialiased edges add
            # full-strength color at partial alpha
            rgb = rgb_s * coverage[..., None] + rgb_d * (1.0 - a)
            alpha = a + a_d * (1.0 - a)
        elif alpha_mode == "add":
            rgb = rgb_s * a + rgb_d
            alpha = jnp.minimum(a + a_d, 1.0)
        elif alpha_mode == "multiply":
            rgb = rgb_s * rgb_d * a + rgb_d * (1.0 - a)
            alpha = a_d
        elif alpha_mode in ("opaque", "mask"):
            write = inside
            if alpha_mode == "mask":
                write &= src[..., 3] >= t_cutoff[m][:, None, None]
            wr = write[..., None]
            rgb = jnp.where(wr, rgb_s, rgb_d)
            alpha = jnp.where(wr, 1.0, a_d)
            if dbuf is not None:
                dbuf = jnp.where(write, frag_d, dbuf)
        elif alpha_mode == "scene":
            # Unified painter pass: ONE back-to-front loop over every
            # entry of every effect, the per-entry mode selecting the
            # blend equation. The phase split (opaque first writing
            # depth, then transparents) is a GPU-ROP-ism; with a global
            # painter order, an opaque entry simply OVERWRITES everything
            # behind it — pixel-identical occlusion — while transparents
            # interleave in true depth order ACROSS effects (the split
            # pipeline can only order whole passes by emitter distance).
            mode = t_mode[m]  # [nt], small-int-valued f32 (exact)
            b_ = (mode == 0.0)[:, None, None, None]
            p_ = (mode == 1.0)[:, None, None, None]
            a_ = (mode == 2.0)[:, None, None, None]
            m_ = (mode == 3.0)[:, None, None, None]
            is_o = (mode == 4.0)[:, None, None]
            is_k = (mode == 5.0)[:, None, None]
            cov1 = coverage[..., None]
            one_m_a = 1.0 - a
            cs = (
                jnp.where(b_ | a_, a, 0.0)
                + jnp.where(p_, cov1, 0.0)
            )
            cd = jnp.where(b_ | p_ | m_, one_m_a, 0.0) + jnp.where(
                a_, 1.0, 0.0
            )
            cm = jnp.where(m_, a, 0.0)
            rgb_t = rgb_s * cs + rgb_d * cd + rgb_s * rgb_d * cm
            al_t = (
                jnp.where(b_ | p_, a + a_d * one_m_a, 0.0)
                + jnp.where(a_, jnp.minimum(a + a_d, 1.0), 0.0)
                + jnp.where(m_, a_d, 0.0)
            )
            cut_ok = src[..., 3] >= t_cutoff[m][:, None, None]
            write = inside & (is_o | (is_k & cut_ok))
            wr = write[..., None]
            opq4 = (is_o | is_k)[..., None]
            rgb = jnp.where(opq4, jnp.where(wr, rgb_s, rgb_d), rgb_t)
            alpha = jnp.where(opq4, jnp.where(wr, 1.0, a_d), al_t)
            if dbuf is not None:
                dbuf = jnp.where(write, frag_d, dbuf)
        else:
            raise ValueError(f"unknown alpha mode {alpha_mode!r}")
        return jnp.concatenate([rgb, alpha], axis=-1), dbuf

    unroll = max(1, min(config.blend_unroll, config.max_entries_per_tile))
    n_outer = -(-config.max_entries_per_tile // unroll)

    def body(o, carry):
        fb, db = carry
        for j in range(unroll):
            fb, db = blend_one(o * unroll + j, fb, db)
        return fb, db

    db0 = sd_tiles if (return_depth or painter) else None
    fb, db = jax.lax.fori_loop(0, n_outer, body, (fb0, db0))

    # ---- 5. untile to the image ----
    img = fb.reshape(nty, ntx, T, T, 4).transpose(0, 2, 1, 3, 4)
    img = img.reshape(nty * T, ntx * T, 4)
    img = img[: config.height, : config.width]
    if return_depth:
        dimg = db.reshape(nty, ntx, T, T).transpose(0, 2, 1, 3)
        dimg = dimg.reshape(nty * T, ntx * T)
        return img, dimg[: config.height, : config.width]
    return img

"""Multi-chip rendering of sharded particle pools.

The reference is single-GPU; its draw path reads the whole particle buffer
from one device (DrawEffects, render/mod.rs:6607-6846). When a pool is
sharded over a TPU mesh (``ShardedEffect``: instances over ``dp``, the
particle axis over ``sp``), rasterization is the one step that needs
cross-chip data (SURVEY.md §2e "render gather is the only cross-shard op").
Three strategies, all riding ICI via XLA collectives:

* **psum** — exact for additive blending (``AlphaMode.ADD``): every device
  extracts + rasterizes only its *local* particle shard into a transparent
  framebuffer, then one ``lax.psum`` reduces the [H,W,4] partial images.
  Particle data never crosses chips — only the framebuffer does, and add
  blending is commutative (rgb accumulates linearly; the per-step alpha
  min-clamp commutes with summation because alpha contributions are
  non-negative).
* **slice** — exact for EVERY blend mode with per-device memory
  ∝ local shard, not full pool: the framebuffer is decomposed in image
  space into D horizontal slices, one per device. Each device extracts
  its local shard, routes each draw entry to the device(s) whose slice
  its screen bbox touches (ONE ``all_to_all`` of packed draw rows — the
  only pool-sized communication), rasterizes its slice with full depth
  ordering, and the slices ``all_gather`` into the replicated image.
  Ribbons route by ribbon id first (so each device sorts and connects
  whole trails — the distributed analogue of vfx_sort.wgsl:33-55), then
  the resulting segments route by slice; triangle meshes expand locally
  before slice routing.
* **gather** — the direct analogue of the reference's single-device draw:
  the full draw set is ``all_gather``-ed and rasterized identically on
  every device. Simple and exact, but replicates all draw data per
  device; prefer ``slice`` for pools that shard because they are big.

``mode="auto"`` picks psum for additive effects and slice otherwise.
Extraction (render modifiers) always runs sharded — it is elementwise over
particles, so it never needs communication.

Slice-routing capacity: each device accepts at most
``slice_capacity_factor × (2·local_entries / D)`` routed entries per
source device (static shapes require a bound); entries beyond it are
dropped, and entries spanning more than two slices lose their middle
slices (the same cropping philosophy as RasterConfig.tile_span). Raise
the factor for pathologically view-concentrated pools.

Tile-overflow semantics under psum: the rasterizer blends at most
``RasterConfig.max_entries_per_tile`` particles per tile PER SHARD, so a
saturated tile can accumulate up to ``n_devices×`` more contributions
than a single-device pass — strictly more complete, but not
bit-identical under overflow. ``slice`` mode rasterizes each slice from
the row-relevant entry subset, so an overflowing tile keeps the nearest
M entries *that touch its slice* — at least as complete for those rows
as the single-device pass (which spends the same budget on the whole
tile height), but not bit-identical under overflow either. All three
modes match the single-device render exactly when no tile overflows.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

try:  # jax >= 0.8
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map as _shard_map

import numpy as np

from ..compiler import SimParams
from ..render.extract import (
    ParticleDrawData,
    extract_draw_data,
    flatten_instance_axis,
)
from ..render.raster import RasterConfig, _project, rasterize
from .mesh import ShardedEffect

__all__ = ["ShardedRenderer"]


def _pool_pspec(x) -> P:
    """[I, N, ...] pool leaves shard (dp, sp); [I] leaves shard dp."""
    if x.ndim == 1:
        return P("dp")
    return P("dp", "sp", *([None] * (x.ndim - 2)))


_flatten_instances = flatten_instance_axis

# Draw-data fields routable between devices (packed as f32 rows; 32-bit
# int fields travel bitcast so every bit survives the trip).
_INT_FIELDS = {"sprite_index", "ribbon_id", "counter"}


def _pack_draw(draw: ParticleDrawData, fields):
    """Pack the given present fields of ``draw`` into ([N, F] f32, schema)."""
    cols = []
    schema = []
    for name in fields:
        arr = getattr(draw, name)
        if arr is None:
            continue
        a2 = arr[:, None] if arr.ndim == 1 else arr
        if name == "alive":
            a2 = a2.astype(jnp.float32)
            kind = "bool"
        elif name in _INT_FIELDS:
            a2 = jax.lax.bitcast_convert_type(
                a2.astype(jnp.uint32), jnp.float32
            )
            kind = "u32" if arr.dtype == jnp.uint32 else "i32"
        else:
            a2 = a2.astype(jnp.float32)
            kind = "f32"
        schema.append((name, arr.ndim, a2.shape[1], kind))
        cols.append(a2)
    return jnp.concatenate(cols, axis=1), schema


_DATA_FIELDS = (
    "position", "axis_x", "axis_y", "color", "alive", "roundness",
    "sprite_index", "ribbon_id", "age", "alpha_cutoff", "counter", "tri",
    "uv_abc", "nrm_abc", "vcol_abc",
)


def _unpack_draw(rows, schema, meta):
    """Inverse of :func:`_pack_draw`; ``meta`` carries the static fields."""
    out = {f: None for f in _DATA_FIELDS}
    out.update(meta)
    off = 0
    for name, nd, w, kind in schema:
        sl = rows[:, off : off + w]
        off += w
        if kind == "bool":
            val = sl[:, 0] > 0.5 if nd == 1 else sl > 0.5
        elif kind in ("u32", "i32"):
            val = jax.lax.bitcast_convert_type(sl, jnp.uint32)
            if kind == "i32":
                val = val.astype(jnp.int32)
            val = val[:, 0] if nd == 1 else val
        else:
            val = sl[:, 0] if nd == 1 else sl
        out[name] = val
    return ParticleDrawData(**out)


def _route_rows(rows, dest0, dest1, dp, sp, cap):
    """Deliver each row to up to two destination devices over the mesh.

    ``rows`` [N, F] f32; ``dest0/dest1`` int32 in [0, D] (D = dp*sp;
    value D = drop). Returns ``(recv_rows [D*cap, F], recv_valid
    [D*cap])`` on every device — the rows all peers routed to it. The
    routing is ONE 1-op (or 2-op) lax.sort into per-destination runs,
    a window gather per destination, and an ``all_to_all`` per mesh
    axis — the same bin→sort→window machinery as the rasterizer, in
    device space instead of tile space.
    """
    n_dev = dp * sp
    n2 = dest0.shape[0] * 2
    dests = jnp.concatenate([dest0, dest1]).astype(jnp.uint32)
    idx_bits = max(1, int(np.ceil(np.log2(max(n2, 2)))))
    dev_bits = max(1, int(np.ceil(np.log2(n_dev + 2))))
    if idx_bits + dev_bits <= 32:
        key = (dests << idx_bits) | jnp.arange(n2, dtype=jnp.uint32)
        (key_sorted,) = jax.lax.sort((key,), num_keys=1)
        bound = jnp.arange(n_dev + 1, dtype=jnp.uint32) << idx_bits
        r = jnp.searchsorted(key_sorted, bound)
        starts, ends = r[:-1], r[1:]
        raw = starts[:, None] + jnp.arange(cap, dtype=starts.dtype)[None, :]
        idx = jnp.minimum(raw, n2 - 1)
        k_win = key_sorted[idx]
        entry = (k_win & jnp.uint32((1 << idx_bits) - 1)).astype(jnp.int32)
    else:
        eidx = jnp.arange(n2, dtype=jnp.int32)
        key_sorted, ent_sorted = jax.lax.sort((dests, eidx), num_keys=1)
        r = jnp.searchsorted(
            key_sorted, jnp.arange(n_dev + 1, dtype=jnp.uint32)
        )
        starts, ends = r[:-1], r[1:]
        raw = starts[:, None] + jnp.arange(cap, dtype=starts.dtype)[None, :]
        idx = jnp.minimum(raw, n2 - 1)
        entry = ent_sorted[idx]
    valid = raw < ends[:, None]
    src_row = jnp.remainder(entry, dest0.shape[0])
    send = jnp.take(rows, src_row.reshape(-1), axis=0).reshape(
        n_dev, cap, rows.shape[1]
    )
    send = jnp.concatenate(
        [send, valid[..., None].astype(jnp.float32)], axis=-1
    )
    send = send.reshape(dp, sp, cap, send.shape[-1])
    recv = jax.lax.all_to_all(send, "dp", split_axis=0, concat_axis=0)
    recv = jax.lax.all_to_all(recv, "sp", split_axis=1, concat_axis=1)
    recv = recv.reshape(n_dev * cap, -1)
    return recv[:, :-1], recv[:, -1] > 0.5


class ShardedRenderer:
    """Renders a :class:`ShardedEffect`'s pools on its device mesh.

    Supports GLOBAL simulation-space effects. Quads work in every mode;
    ribbons and triangle meshes need ``mode="slice"`` (the default via
    "auto"): ribbon particles route by ribbon id so each device sorts and
    connects whole trails, meshes expand locally, then segments/triangles
    route to their framebuffer-slice owners like plain quads.
    """

    def __init__(
        self,
        effect: ShardedEffect,
        config: RasterConfig,
        textures: Sequence[Any] = (),
        mode: str = "auto",
        slice_capacity_factor: float = 4.0,
    ) -> None:
        if mode not in ("auto", "psum", "gather", "slice"):
            raise ValueError(f"unknown mode {mode!r}")
        asset = effect.effect.asset
        alpha = asset.alpha_mode.kind
        has_ribbons = asset.particle_layout().contains("ribbon_id")
        if mode == "auto":
            mode = "psum" if alpha == "add" and not has_ribbons else "slice"
        if mode == "psum" and alpha != "add":
            raise ValueError(
                f"psum compositing is only exact for additive blending, "
                f"asset uses {alpha!r}; use mode='slice'"
            )
        if mode in ("psum", "gather") and (
            has_ribbons or asset.mesh is not None
        ):
            raise ValueError(
                "psum/gather sharded rendering supports quad effects only; "
                "use mode='slice' (or 'auto') for ribbons and meshes"
            )
        self.slice_capacity_factor = float(slice_capacity_factor)
        if mode == "slice":
            n_dev = effect.mesh.shape["dp"] * effect.mesh.shape["sp"]
            if config.height % n_dev:
                raise ValueError(
                    f"slice mode needs a height ({config.height}) divisible "
                    f"by the device count ({n_dev})"
                )
        self.effect = effect
        self.asset = asset
        self.mesh = effect.mesh
        self.config = config
        self.mode = mode
        self.textures = tuple(jnp.asarray(t, jnp.float32) for t in textures)
        self._alpha_mode = alpha
        # one jitted fn per depth-presence so toggling scene_depth between
        # None and an array does not recompile the shard_map every call
        self._jit_render = {}

    # -- device-local body (runs under shard_map) --------------------------

    def _route_cap(self, n: int, n_dev: int) -> int:
        """Static per-destination routing capacity for n local entries."""
        cap = int(np.ceil(2 * n * self.slice_capacity_factor / n_dev))
        return max(256, min(2 * n, -(-cap // 256) * 256))

    def _local_slice(self, pool, camera, sim, properties, scene_depth,
                     config, return_depth=False):
        """Image-space decomposition: this device rasterizes ONE horizontal
        framebuffer slice from the entries all peers routed to it."""
        dp = self.mesh.shape["dp"]
        sp = self.mesh.shape["sp"]
        n_dev = dp * sp
        H, W = config.height, config.width
        slice_h = H // n_dev
        texs = list(self.textures)
        d_lin = jax.lax.axis_index("dp") * sp + jax.lax.axis_index("sp")

        draw = jax.vmap(
            lambda p: extract_draw_data(
                self.asset, p, camera, sim=sim, properties=properties,
                textures=texs,
            )
        )(pool)
        draw = _flatten_instances(draw)
        meta = dict(
            sprite_grid_size=draw.sprite_grid_size,
            texture_layers=draw.texture_layers,
            needs_uv=draw.needs_uv,
            lighting=draw.lighting,
        )

        if draw.ribbon_id is not None:
            # Distributed ribbon pass: deliver every particle of ribbon r to
            # device r mod D (rid routing), connect trails there (the local
            # (rid, age, counter) lax.sort has the whole trail), then the
            # segments fall through to slice routing below. Composite ids
            # keep per-instance trails distinct across the dp axis.
            n_loc = draw.position.shape[0]
            i_local = self.effect.num_instances // dp
            n_per = n_loc // max(i_local, 1)
            li = jnp.arange(n_loc, dtype=jnp.uint32) // jnp.uint32(
                max(n_per, 1)
            )
            g_inst = (
                jax.lax.axis_index("dp").astype(jnp.uint32)
                * jnp.uint32(i_local)
                + li
            )
            comp_rid = (
                draw.ribbon_id.astype(jnp.uint32)
                * jnp.uint32(self.effect.num_instances)
                + g_inst
            )
            draw = dataclasses.replace(draw, ribbon_id=comp_rid)
            fields = [
                "position", "axis_x", "axis_y", "color", "alive",
                "roundness", "sprite_index", "alpha_cutoff", "ribbon_id",
                "age", "counter",
            ]
            rows, schema = _pack_draw(draw, fields)
            dest = jnp.where(
                draw.alive, (comp_rid % n_dev).astype(jnp.int32), n_dev
            )
            recv, valid = _route_rows(
                rows, dest, jnp.full_like(dest, n_dev), dp, sp,
                self._route_cap(n_loc, n_dev),
            )
            rdraw = _unpack_draw(recv, schema, meta)
            rdraw = dataclasses.replace(
                rdraw, alive=jnp.logical_and(rdraw.alive, valid)
            )
            from ..render.extract import resolve_remap
            from ..render.ribbon import build_ribbon_segments

            # Slice routing below reorders draw ROWS across devices, so
            # the segment build's appearance indirection must be
            # materialized here (the local arrays it points into don't
            # travel).
            draw = resolve_remap(build_ribbon_segments(rdraw, camera))
        elif self.asset.mesh is not None:
            from ..render.mesh import expand_mesh_draw

            draw = expand_mesh_draw(draw, self.asset.mesh)
            meta["lighting"] = draw.lighting

        # ---- route entries to the slice(s) their screen bbox touches ----
        center, w, _ = _project(camera, draw.position)
        c_x1, _, _ = _project(camera, draw.position + 0.5 * draw.axis_x)
        c_y1, _, _ = _project(camera, draw.position + 0.5 * draw.axis_y)
        h1 = c_x1 - center
        h2 = c_y1 - center
        rx = jnp.abs(h1[:, 0]) + jnp.abs(h2[:, 0])
        ry = jnp.abs(h1[:, 1]) + jnp.abs(h2[:, 1])
        if draw.tri is not None:
            half = jnp.where(draw.tri > 0.5, 0.5, 1.0)
            rx = rx * half
            ry = ry * half
        valid_e = jnp.logical_and(draw.alive, w > 1e-4)
        valid_e &= (center[:, 0] + rx > 0) & (center[:, 0] - rx < W)
        valid_e &= (center[:, 1] + ry > 0) & (center[:, 1] - ry < H)
        s0 = jnp.clip(
            jnp.floor((center[:, 1] - ry) / slice_h).astype(jnp.int32),
            0, n_dev - 1,
        )
        s1 = jnp.clip(
            jnp.floor((center[:, 1] + ry) / slice_h).astype(jnp.int32),
            0, n_dev - 1,
        )
        # up to two slices per entry (taller splats lose middle slices —
        # the same cropping philosophy as RasterConfig.tile_span)
        dest0 = jnp.where(valid_e, s0, n_dev)
        dest1 = jnp.where(
            jnp.logical_and(valid_e, s1 > s0),
            jnp.minimum(s0 + 1, n_dev - 1),
            n_dev,
        )
        fields = [
            "position", "axis_x", "axis_y", "color", "alive", "roundness",
            "sprite_index", "alpha_cutoff", "tri", "uv_abc", "nrm_abc",
            "vcol_abc",
        ]
        rows, schema = _pack_draw(draw, fields)
        recv, valid = _route_rows(
            rows, dest0, dest1, dp, sp,
            self._route_cap(draw.position.shape[0], n_dev),
        )
        sdraw = _unpack_draw(recv, schema, meta)
        sdraw = dataclasses.replace(
            sdraw, alive=jnp.logical_and(sdraw.alive, valid)
        )

        cfg = dataclasses.replace(config, height=slice_h)
        y_off = (d_lin * slice_h).astype(jnp.float32)
        sd_slice = None
        if scene_depth is not None:
            sd_slice = jax.lax.dynamic_slice_in_dim(
                scene_depth, d_lin * slice_h, slice_h, axis=0
            )
        out = rasterize(
            sdraw, camera, cfg, alpha_mode=self._alpha_mode, textures=texs,
            scene_depth=sd_slice, return_depth=return_depth, y_offset=y_off,
        )
        img, dep = out if return_depth else (out, None)
        img = jax.lax.all_gather(img, "sp", axis=0, tiled=True)
        img = jax.lax.all_gather(img, "dp", axis=0, tiled=True)
        if return_depth:
            dep = jax.lax.all_gather(dep, "sp", axis=0, tiled=True)
            dep = jax.lax.all_gather(dep, "dp", axis=0, tiled=True)
            return img, dep
        return img

    def _local(self, pool, camera, sim, properties, scene_depth,
               config, return_depth=False):
        if self.mode == "slice":
            return self._local_slice(
                pool, camera, sim, properties, scene_depth, config,
                return_depth=return_depth,
            )
        texs = list(self.textures)
        draw = jax.vmap(
            lambda p: extract_draw_data(
                self.asset, p, camera, sim=sim, properties=properties,
                textures=texs,
            )
        )(pool)
        if self.mode == "psum":
            # psum is additive-only, and additive never writes depth
            flat = _flatten_instances(draw)
            cfg = dataclasses.replace(
                config, background=(0.0, 0.0, 0.0, 0.0)
            )
            img = rasterize(
                flat, camera, cfg, alpha_mode="add", textures=texs,
                scene_depth=scene_depth,
            )
            img = jax.lax.psum(img, ("dp", "sp"))
            bg = jnp.asarray(config.background, jnp.float32)
            rgb = img[..., :3] + bg[:3]
            alpha = jnp.minimum(img[..., 3:4] + bg[3], 1.0)
            return jnp.concatenate([rgb, alpha], axis=-1)
        # gather: reassemble natural [I, N] order (sp tiles axis 1, dp axis 0)
        full = jax.tree_util.tree_map(
            lambda x: jax.lax.all_gather(
                jax.lax.all_gather(x, "sp", axis=1, tiled=True),
                "dp", axis=0, tiled=True,
            ),
            draw,
        )
        flat = _flatten_instances(full)
        # gather mode rasterizes the full particle set identically on every
        # device, so the depth plane comes out replicated for free
        return rasterize(
            flat, camera, config,
            alpha_mode=self._alpha_mode, textures=texs,
            scene_depth=scene_depth, return_depth=return_depth,
        )

    def render(
        self,
        pools,
        camera,
        sim: SimParams = None,
        properties: Optional[Dict[str, Any]] = None,
        scene_depth=None,
        return_depth: bool = False,
    ) -> jnp.ndarray:
        """Rasterize the sharded pools to one replicated [H, W, 4] image.

        ``scene_depth`` ([H, W], replicated) occludes fragments behind
        external scene geometry on every shard — the depth test is
        per-fragment, so psum partial images stay exact under it.
        ``return_depth=True`` (opaque/mask assets; those always use gather
        mode) additionally returns the replicated depth plane.
        """
        if return_depth and self.mode == "psum":
            raise ValueError(
                "return_depth requires slice or gather mode (additive psum "
                "effects never write depth)"
            )
        sim = sim if sim is not None else SimParams()
        properties = properties or {}
        vw, vh = camera.viewport
        if (self.config.width, self.config.height) != (vw, vh):
            if self.mode == "slice":
                n_dev = self.mesh.shape["dp"] * self.mesh.shape["sp"]
                if vh % n_dev:
                    raise ValueError(
                        f"slice mode needs a viewport height ({vh}) "
                        f"divisible by the device count ({n_dev})"
                    )
            # The raster grid follows the camera viewport (see
            # EffectRenderer). Pure function of the inputs: the resized
            # config rides the jit cache key instead of mutating
            # self.config, so alternating cameras reuse both compilations.
            config = dataclasses.replace(self.config, width=vw, height=vh)
        else:
            config = self.config
        key = (config.width, config.height, scene_depth is not None, return_depth)
        fn = self._jit_render.get(key)
        if fn is None:
            in_specs = (
                jax.tree_util.tree_map(_pool_pspec, pools),
                jax.tree_util.tree_map(
                    lambda _: P(), (camera, sim, properties, scene_depth)
                ),
            )
            out_spec = (P(), P()) if return_depth else P()
            fn = jax.jit(
                _shard_map(
                    lambda pool, rest: self._local(
                        pool, *rest, config, return_depth=return_depth
                    ),
                    mesh=self.mesh,
                    in_specs=in_specs,
                    out_specs=out_spec,
                    check_vma=False,
                )
            )
            self._jit_render[key] = fn
        with self.mesh:
            return fn(pools, (camera, sim, properties, scene_depth))

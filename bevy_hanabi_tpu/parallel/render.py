"""Multi-chip rendering of sharded particle pools.

The reference is single-GPU; its draw path reads the whole particle buffer
from one device (DrawEffects, render/mod.rs:6607-6846). When a pool is
sharded over a TPU mesh (``ShardedEffect``: instances over ``dp``, the
particle axis over ``sp``), rasterization is the one step that needs
cross-chip data (SURVEY.md §2e "render gather is the only cross-shard op").
Two strategies, both riding ICI via XLA collectives:

* **psum** — exact for additive blending (``AlphaMode.ADD``): every device
  extracts + rasterizes only its *local* particle shard into a transparent
  framebuffer, then one ``lax.psum`` reduces the [H,W,4] partial images.
  Particle data never crosses chips — only the framebuffer does, and add
  blending is commutative (rgb accumulates linearly; the per-step alpha
  min-clamp commutes with summation because alpha contributions are
  non-negative).
* **gather** — exact for every blend mode: per-particle draw data (a few
  dozen bytes/particle after extraction) is ``all_gather``-ed in natural
  pool order, then the full set is rasterized identically on every device.
  This is the direct analogue of the reference's single-device draw, with
  the gather as the explicit communication step.

``mode="auto"`` picks psum for additive effects and gather otherwise.
Extraction (render modifiers) always runs sharded — it is elementwise over
particles, so it never needs communication.

Tile-overflow semantics: the rasterizer blends at most
``RasterConfig.max_entries_per_tile`` particles per tile. Under psum each
shard applies that cap to its *local* particles, so a saturated tile can
accumulate up to ``n_devices×`` more contributions than a single-device
pass — strictly more complete, but not bit-identical under overflow. Size
``max_entries_per_tile`` for the per-shard density.
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

from ..compiler import SimParams
from ..render.extract import extract_draw_data, flatten_instance_axis
from ..render.raster import RasterConfig, rasterize
from .mesh import ShardedEffect

__all__ = ["ShardedRenderer"]


def _pool_pspec(x) -> P:
    """[I, N, ...] pool leaves shard (dp, sp); [I] leaves shard dp."""
    if x.ndim == 1:
        return P("dp")
    return P("dp", "sp", *([None] * (x.ndim - 2)))


_flatten_instances = flatten_instance_axis


class ShardedRenderer:
    """Renders a :class:`ShardedEffect`'s pools on its device mesh.

    Supports GLOBAL simulation-space quad effects (no ribbons/meshes: ribbon
    connectivity crosses shard boundaries and is rendered single-device).
    """

    def __init__(
        self,
        effect: ShardedEffect,
        config: RasterConfig,
        textures: Sequence[Any] = (),
        mode: str = "auto",
    ) -> None:
        if mode not in ("auto", "psum", "gather"):
            raise ValueError(f"unknown mode {mode!r}")
        asset = effect.effect.asset
        alpha = asset.alpha_mode.kind
        if mode == "auto":
            mode = "psum" if alpha == "add" else "gather"
        if mode == "psum" and alpha != "add":
            raise ValueError(
                f"psum compositing is only exact for additive blending, "
                f"asset uses {alpha!r}; use mode='gather'"
            )
        if asset.particle_layout().contains("ribbon_id") or asset.mesh is not None:
            raise ValueError(
                "sharded rendering supports quad effects only "
                "(ribbons/meshes: use the single-device renderer)"
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

    def _local(self, pool, camera, sim, properties, scene_depth,
               return_depth=False):
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
                self.config, background=(0.0, 0.0, 0.0, 0.0)
            )
            img = rasterize(
                flat, camera, cfg, alpha_mode="add", textures=texs,
                scene_depth=scene_depth,
            )
            img = jax.lax.psum(img, ("dp", "sp"))
            bg = jnp.asarray(self.config.background, jnp.float32)
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
            flat, camera, self.config,
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
                "return_depth requires gather mode (additive psum effects "
                "never write depth)"
            )
        sim = sim if sim is not None else SimParams()
        properties = properties or {}
        vw, vh = camera.viewport
        if (self.config.width, self.config.height) != (vw, vh):
            # raster grid follows the camera viewport (see EffectRenderer)
            self.config = dataclasses.replace(self.config, width=vw, height=vh)
            self._jit_render = {}
        key = (scene_depth is not None, return_depth)
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
                        pool, *rest, return_depth=return_depth
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

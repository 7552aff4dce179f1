"""High-level renderer: pool → image, one jitted function per effect/view.

Equivalent of the reference's DrawEffects draw function + render phases
(render/mod.rs:6607-6846): effects render back-to-front into a shared
float framebuffer; HDR colors pass through linearly (tonemap separately).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp

from ..asset import EffectAsset
from ..compiler import SimParams
from ..runtime.pool import ParticlePool
from .camera import CameraParams
from .extract import extract_draw_data
from .raster import RasterConfig, rasterize

__all__ = ["EffectRenderer", "composite_by_mode"]


def composite_by_mode(img, framebuffer, alpha_mode: str):
    """Composite a pre-rendered effect layer onto a framebuffer using the
    effect's blend equation (the dst factors of asset.rs:212-240):

    * ``add``: dst accumulates (src blended with ONE dst factor), so the
      layer's premultiplied sums simply add; no dst attenuation.
    * ``multiply``: the layer (rendered over a neutral WHITE transparent
      background) is a per-pixel modulation factor for dst.
    * everything else ("blend"/"premultiply"/"opaque"/"mask"): "over".
    """
    if alpha_mode == "add":
        rgb = framebuffer[..., :3] + img[..., :3]
        alpha = jnp.minimum(framebuffer[..., 3:4] + img[..., 3:4], 1.0)
    elif alpha_mode == "multiply":
        rgb = framebuffer[..., :3] * img[..., :3]
        alpha = framebuffer[..., 3:4]
    else:
        a = img[..., 3:4]
        rgb = img[..., :3] + framebuffer[..., :3] * (1.0 - a)
        alpha = a + framebuffer[..., 3:4] * (1.0 - a)
    return jnp.concatenate([rgb, alpha], axis=-1)


class EffectRenderer:
    """Renders one effect's pool with its render modifiers applied."""

    def __init__(
        self,
        asset: EffectAsset,
        config: RasterConfig,
        textures: Sequence[Any] = (),
    ) -> None:
        self.asset = asset
        self.config = config
        self._aligned = False
        self.textures = tuple(jnp.asarray(t, jnp.float32) for t in textures)
        mode = asset.alpha_mode.kind
        self._alpha_mode = mode
        self._make_jits()

    def _make_jits(self):
        import functools

        # one jitted fn per return_depth value (a Python-level branch)
        self._jit_render = {
            flag: jax.jit(functools.partial(self._render, return_depth=flag))
            for flag in (False, True)
        }

    def render(
        self,
        pool: ParticlePool,
        camera: CameraParams,
        sim: SimParams = None,
        properties: Optional[Dict[str, Any]] = None,
        transform: Optional[Any] = None,
        framebuffer: Optional[jnp.ndarray] = None,
        scene_depth: Optional[jnp.ndarray] = None,
        return_depth: bool = False,
    ) -> jnp.ndarray:
        """Rasterize the pool; optionally composite over ``framebuffer``.

        ``scene_depth`` ([H, W] view-axis distances) occludes fragments
        behind existing scene geometry — the analogue of the reference
        depth-testing its draws against the game's depth buffer.
        ``return_depth=True`` (opaque/mask modes) additionally returns the
        written depth plane, seeded from ``scene_depth``, enabling the
        reference's phase pipeline (Opaque3d/AlphaMask3d write depth,
        Transparent3d tests it).

        The raster grid follows the camera viewport: a ``RasterConfig`` whose
        width/height disagree with ``camera.viewport`` is aligned to it on
        first use (a mismatch only ever crops or pads the image).
        """
        if not self._aligned:
            import dataclasses

            vw, vh = camera.viewport
            if (self.config.width, self.config.height) != (vw, vh):
                self.config = dataclasses.replace(
                    self.config, width=vw, height=vh
                )
                self._make_jits()
            self._aligned = True
        return self._jit_render[bool(return_depth)](
            pool,
            camera,
            sim if sim is not None else SimParams(),
            properties or {},
            transform,
            framebuffer,
            scene_depth,
        )

    def _render(
        self, pool, camera, sim, properties, transform, framebuffer,
        scene_depth=None, return_depth=False,
    ):
        draw = extract_draw_data(
            self.asset,
            pool,
            camera,
            sim=sim,
            properties=properties,
            textures=list(self.textures),
            transform=transform,
        )
        if self.asset.particle_layout().contains("ribbon_id"):
            from .ribbon import build_ribbon_segments

            draw = build_ribbon_segments(draw, camera)
        elif self.asset.mesh is not None:
            from .mesh import expand_mesh_draw

            draw = expand_mesh_draw(draw, self.asset.mesh)
        # The mask cutoff is evaluated per particle inside extract_draw_data
        # (draw.alpha_cutoff); 0.5 is only the fallback for draw data built
        # without the asset (reference default, asset.rs:152).
        config = self.config
        if framebuffer is not None:
            # Composite against the existing framebuffer with the effect's
            # own blend equation (asset.rs:212-240 blend-state mapping):
            # additive contributions ADD onto dst (src·α + dst·1), multiply
            # modulates it, everything else is "over".
            import dataclasses

            neutral = (
                (1.0, 1.0, 1.0, 0.0)
                if self._alpha_mode == "multiply"
                else (0.0, 0.0, 0.0, 0.0)
            )
            config = dataclasses.replace(config, background=neutral)
        out = rasterize(
            draw,
            camera,
            config,
            alpha_mode=self._alpha_mode,
            textures=list(self.textures),
            scene_depth=scene_depth,
            return_depth=return_depth,
        )
        img, depth = out if return_depth else (out, None)
        if framebuffer is not None:
            img = composite_by_mode(img, framebuffer, self._alpha_mode)
        return (img, depth) if return_depth else img


# tonemapping + bloom live in render/post.py; re-exported here for
# compatibility (this module was tonemap_reinhard's original home)
from .post import tonemap_reinhard  # noqa: E402, F401

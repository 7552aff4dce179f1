#!/usr/bin/env python
"""Run every re-created reference example headlessly and render a gallery.

Equivalent of the reference's ``run_examples.sh`` + .github/example-run
screenshot harness: each example simulates a characteristic number of
frames and renders one PNG into ``examples/gallery/``.

Usage: python examples/run_all.py [--size 256] [--out examples/gallery]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from bevy_hanabi_tpu.models.examples import (
    example_lifetime,
    example_spawn_on_command,
    example_worms,
    examples_registry,
)
from bevy_hanabi_tpu.models import (
    firework_effect,
    instancing_effect,
    firework_trail_effect,
    force_field_effect,
    gradient_effect,
    spawn_gravity_effect,
)
from bevy_hanabi_tpu.models.texutils import make_anim_sprite_sheet, make_circle_texture
from bevy_hanabi_tpu.render import CameraParams, RasterConfig, look_at, perspective
from bevy_hanabi_tpu.runtime import HanabiScene

DT = 1.0 / 60.0

# name -> (scene builder, frames to simulate, camera eye, camera target)
def _single(builder, textures=()):
    def make(scene):
        scene.add(builder(), "fx", textures=textures)

    return make


def _worms(scene):
    assets = example_worms()
    scene.add(assets["heads"], "heads")
    scene.add(assets["bodies"], "bodies", parent="heads")


def _firework(scene):
    scene.add(firework_effect(capacity=8192), "rocket")
    scene.add(firework_trail_effect(capacity=32768), "trail", parent="rocket")


def _activated(builder):
    def make(scene):
        scene.add(builder(), "fx")
        scene.set_spawner_active("fx", True)
        scene.reset_spawner("fx")

    return make


def _lifetime(scene):
    for key, asset in example_lifetime().items():
        scene.add(asset, f"life_{key}")


def _spawn_on_command(scene):
    scene.add(example_spawn_on_command(), "fx")
    scene.set_property("fx", "spawn_color", 0xFF80C0FF)
    scene.set_property("fx", "normal", (0.0, 1.0, 0.0))
    scene.set_spawner_active("fx", True)
    scene.reset_spawner("fx")


def _instancing(scene):
    # 5x5 grid of small emitters stepped as ONE vmapped dispatch
    # (instancing.rs's grid of entities -> add_group)
    grid = []
    for gy in range(5):
        for gx in range(5):
            t = np.eye(3, 4, dtype=np.float32)
            t[0, 3] = (gx - 2) * 2.0
            t[1, 3] = (gy - 2) * 2.0
            grid.append(t)
    from bevy_hanabi_tpu.gradient import Gradient
    from bevy_hanabi_tpu.modifiers import SizeOverLifetimeModifier

    asset = instancing_effect(capacity=512).render(
        SizeOverLifetimeModifier(Gradient.linear((0.15,), (0.05,)))
    )
    scene.add_group(asset, 25, "grid", transforms=np.stack(grid))


def _pillar_depth(size):
    """Scene-depth plane: a vertical pillar at view distance 5.5 (between
    the camera at z=6 and the particle cloud around z=0) covering the
    middle third of the screen."""
    d = np.full((size, size), np.inf, np.float32)
    d[:, size // 3 : 2 * size // 3] = 5.5
    return d


def _painter_showcase(scene):
    """Round-3 feature reel rendered by ONE unified painter pass: a
    two-layer textured blend cloud, two opaque icospheres lit from
    different directions (per-entry Lambert columns), a ribbon trail,
    and an additive spark shell — one global back-to-front sort, one
    blend loop, per-entry blend equations."""
    from bevy_hanabi_tpu import attributes as A
    from bevy_hanabi_tpu.asset import AlphaMode, EffectAsset
    from bevy_hanabi_tpu.graph import ExprWriter
    from bevy_hanabi_tpu.models.examples import (
        LambertianLightingModifier,
        examples_registry as _reg,
    )
    from bevy_hanabi_tpu.modifiers import (
        ImageSampleMapping,
        ParticleTextureModifier,
        SetAttributeModifier,
        SetPositionSphereModifier,
        SetSizeModifier,
        SetVelocitySphereModifier,
        ShapeDimension,
    )
    from bevy_hanabi_tpu.render.mesh import ParticleMesh
    from bevy_hanabi_tpu.spawn import SpawnerSettings

    disc = make_circle_texture(32)
    yy, xx = np.mgrid[0:16, 0:16]
    r = np.clip(1.0 - np.hypot(xx - 7.5, yy - 7.5) / 8.0, 0.0, 1.0)
    fade = np.stack([r, r, r, np.ones_like(r)], -1).astype(np.float32)

    def base(name, cap, rate, center, radius, speed, lifetime, color, size):
        w = ExprWriter()
        return (
            EffectAsset(name, cap, SpawnerSettings.rate(rate), w.finish())
            .init(SetAttributeModifier(A.AGE, w.lit(0.0).expr()))
            .init(SetAttributeModifier(A.LIFETIME, w.lit(lifetime).expr()))
            .init(
                SetPositionSphereModifier(
                    w.lit(center).expr(), w.lit(radius).expr(),
                    ShapeDimension.VOLUME,
                )
            )
            .init(
                SetVelocitySphereModifier(
                    w.lit((0.0, 0.0, 0.0)).expr(), w.lit(speed).expr()
                )
            )
            .init(SetAttributeModifier(A.HDR_COLOR, w.lit(color).expr()))
            .render(SetSizeModifier((size,) * 3))
        )

    cloud = base(
        "cloud", 4096, 1500.0, (-1.2, 0.6, -1.0), 1.0, 0.15, 3.0,
        (0.9, 0.95, 1.0, 0.35), 0.35,
    )
    cloud.render(ParticleTextureModifier(0, ImageSampleMapping.MODULATE))
    cloud.render(
        ParticleTextureModifier(1, ImageSampleMapping.MODULATE_OPACITY_FROM_R)
    )
    cloud.with_alpha_mode(AlphaMode.BLEND)
    scene.add(cloud, "cloud", textures=[disc, fade])

    for name, pos, ldir, col in (
        ("sun", (1.4, 0.9, 0.0), (1.0, 0.3, 0.4), (1.0, 0.75, 0.3, 1.0)),
        ("moon", (1.1, -1.0, 0.8), (-0.4, 1.0, 0.2), (0.55, 0.65, 1.0, 1.0)),
    ):
        w = ExprWriter()
        sphere = (
            EffectAsset(name, 4, SpawnerSettings.once(1.0), w.finish())
            .init(SetAttributeModifier(A.POSITION, w.lit(pos).expr()))
            .init(SetAttributeModifier(A.LIFETIME, w.lit(100.0).expr()))
            .init(SetAttributeModifier(A.AGE, w.lit(0.0).expr()))
            .init(SetAttributeModifier(A.HDR_COLOR, w.lit(col).expr()))
            .render(SetSizeModifier((1.5, 1.5, 1.5)))
            .with_mesh(ParticleMesh.icosphere(0.45, subdivisions=2))
            .with_alpha_mode(AlphaMode.OPAQUE)
        )
        sphere.render(LambertianLightingModifier(ldir, 0.15))
        scene.add(sphere, name)

    scene.add(_reg()["ribbon"](), "trail")

    sparks = base(
        "sparks", 8192, 3000.0, (0.0, -0.9, 1.2), 0.15, 1.8, 1.2,
        (2.2, 1.1, 0.25, 1.0), 0.05,
    )
    sparks.with_alpha_mode(AlphaMode.ADD)
    scene.add(sparks, "sparks")


def build_gallery_specs():
    reg = examples_registry()
    sheet = make_anim_sprite_sheet(frames=8, size=32)
    disc = make_circle_texture(64)
    return {
        "painter": (_painter_showcase, 150, (0, 0, 7), (0, 0, 0)),
        "2d": (_single(reg["2d"]), 150, (0, 0, 4), (0, 0, 0)),
        "activate": (_activated(reg["activate"]), 180, (0, 0, 3), (0, 0.3, 0)),
        "billboard": (_single(reg["billboard"], textures=[disc]), 150, (0, 1.5, 4), (0, 0.5, 0)),
        "circle": (_single(reg["circle"], textures=[sheet]), 150, (0, 2, 4), (0, 0.5, 0)),
        "expr": (_single(reg["expr"]), 240, (0, 2, 12), (0, -2, 0)),
        "init_circle": (_single(reg["init_circle"]), 2, (0, 0, 14), (0, 0, 0)),
        "init_sphere": (_single(reg["init_sphere"]), 2, (0, 0, 14), (0, 0, 0)),
        "init_cone": (_single(reg["init_cone"]), 2, (14, 5, 0), (0, 5, 0)),
        "lightning": (_activated(reg["lightning"]), 3, (0, 4, 10), (0, 4, 0)),
        "multicam": (_single(reg["multicam"]), 200, (0, 0, 10), (0, 0, 0)),
        "ordering": (_single(reg["ordering"]), 90, (0, 0, 18), (0, 0, 0)),
        "portal": (_single(reg["portal"]), 90, (0, 0, 10), (0, 0, 0)),
        "puffs": (_single(reg["puffs"]), 120, (0, 0, 6), (0, 0, 0)),
        "random": (_single(reg["random"]), 120, (0, 0, 6), (0, 0, 0)),
        "ribbon": (_single(reg["ribbon"]), 90, (0, 0, 4), (0, 0, 0)),
        "visibility": (_single(reg["visibility"]), 60, (0, 0, 6), (0, 0, 0)),
        "worms": (_worms, 150, (0, 0, 10), (0, 0, 0)),
        "firework": (_firework, 24, (0, 3, 6), (0, 3, 0)),
        "lifetime": (_lifetime, 150, (0, 2, 12), (0, 0, 0)),
        "spawn_on_command": (_spawn_on_command, 60, (0, 1, 5), (0, 0.5, 0)),
        "instancing": (_instancing, 120, (0, 0, 14), (0, 0, 0)),
        "gradient_bench": (_single(lambda: gradient_effect(16384)), 120, (0, 0, 6), (0, 0, 0)),
        "force_field_bench": (_single(lambda: force_field_effect(20000)), 150, (0, 0, 8), (0, 0, 0)),
        "spawn_bench": (_single(lambda: spawn_gravity_effect(16384, 4096.0)), 120, (0, -1, 8), (0, -1, 0)),
        # scene-depth integration: an (invisible) pillar of near geometry
        # occludes the particles behind it — the analogue of the reference's
        # draws being depth-tested against the game's depth buffer
        "depth_occlusion": (
            _single(lambda: gradient_effect(16384)),
            120,
            (0, 0, 6),
            (0, 0, 0),
            _pillar_depth,
        ),
    }


def main() -> None:
    # gallery runs headless on host; pinned here (not at import time) so
    # importing this module for tests does not mutate global JAX state
    jax.config.update("jax_platforms", "cpu")
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--out", default=os.path.join(os.path.dirname(__file__), "gallery"))
    ap.add_argument("--only", nargs="*", default=None)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    cfg = RasterConfig(
        width=args.size, height=args.size, tile_size=16, tile_span=2,
        max_entries_per_tile=128, antialias=True,
    )
    specs = build_gallery_specs()
    if args.only:
        specs = {k: v for k, v in specs.items() if k in args.only}

    for name, (make, frames, eye, target, *extra) in specs.items():
        scene = HanabiScene(seed=hash(name) % 100000)
        make(scene)
        for _ in range(frames):
            scene.update(DT)
        cam = CameraParams(
            view=look_at(eye, target),
            proj=perspective(0.9, 1.0, 0.1, 200.0),
            viewport=(args.size, args.size),
        )
        depth = extra[0](args.size) if extra else None
        if name == "multicam":
            # true split-screen through scene.render_views: two cameras
            # (front + raised three-quarter view) in ONE dispatch, halves
            # composited side by side (reference: examples/multicam.rs
            # renders the same effects from two Bevy cameras)
            cam_b = CameraParams(
                view=look_at((4.0, 3.0, 8.0), target),
                proj=perspective(0.9, 1.0, 0.1, 200.0),
                viewport=(args.size, args.size),
            )
            both = np.asarray(scene.render_views([cam, cam_b], cfg))
            half = args.size // 2
            img = np.concatenate(
                [both[0][:, ::2][:, :half], both[1][:, ::2][:, :half]], axis=1
            )
        else:
            img = scene.render(cam, cfg, scene_depth=depth)
        if name == "firework":
            # HDR pipeline: the reference's firework look relies on Bevy's
            # Bloom pass; render/post.py is the headless equivalent
            from bevy_hanabi_tpu.render import bloom

            img = bloom(img, threshold=1.0, sigma=3.0, intensity=0.8)
        img = np.asarray(img)
        rgb = img[..., :3]
        if depth is not None:
            # paint the occluding geometry dim gray so the cutout reads
            geo = (np.isfinite(depth))[..., None]
            rgb = np.where(geo & (img[..., 3:4] < 0.05), 0.08, rgb)
        ldr = np.clip(rgb / (1.0 + rgb) * 1.6, 0.0, 1.0)  # reinhard-ish
        path = os.path.join(args.out, f"{name}.png")
        try:
            from PIL import Image

            Image.fromarray((ldr * 255).astype(np.uint8)).save(path)
        except ImportError:
            with open(path.replace(".png", ".ppm"), "wb") as f:
                f.write(
                    f"P6\n{args.size} {args.size}\n255\n".encode()
                    + (ldr * 255).astype(np.uint8).tobytes()
                )
        print(f"{name}: alive={scene.total_alive()} -> {path}")


if __name__ == "__main__":
    main()

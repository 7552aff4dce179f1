#!/usr/bin/env python
"""Production serving loop: a whole mixed scene in one dispatch per chunk.

The reference's frame is one command encoder carrying every compute pass
and draw (render/mod.rs:6942-7613). The TPU-native serving equivalent is
``HanabiScene.update_render_chunk``: K frames of the full pipeline —
every effect step (event trees ride the scan carry), phase-split
rendering with a real depth buffer, same-blend batching, composites —
per device round-trip, with ``on_frame`` animating transforms and
properties host-side WITHIN the chunk.

Scene: opaque debris + a transparent half-million-particle cloud + a
firework parent→child event tree, with the emitter orbiting via the
on_frame hook. On one TPU v5e chip this scene serves at ~80 fps at 512²
(bench.py ``mixed_scene_4fx_512sq``); on CPU it demonstrates the same
API at toy sizes.

Usage: python examples/serve.py [--chunks 4] [--k 60] [--size 256]
"""

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunks", type=int, default=4)
    ap.add_argument("--k", type=int, default=60, help="frames per dispatch")
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--cpu", action="store_true", help="force the host CPU")
    ap.add_argument(
        "--out",
        default=os.path.join(os.path.dirname(__file__), "gallery", "serve.png"),
    )
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from bevy_hanabi_tpu import attributes as A
    from bevy_hanabi_tpu.asset import AlphaMode, EffectAsset
    from bevy_hanabi_tpu.graph import ExprWriter
    from bevy_hanabi_tpu.models import firework_effect, firework_trail_effect, gradient_effect
    from bevy_hanabi_tpu.modifiers import (
        SetAttributeModifier,
        SetPositionSphereModifier,
        SetSizeModifier,
        SetVelocitySphereModifier,
        ShapeDimension,
    )
    from bevy_hanabi_tpu.render import CameraParams, RasterConfig, look_at, perspective
    from bevy_hanabi_tpu.runtime import HanabiScene
    from bevy_hanabi_tpu.spawn import SpawnerSettings

    DT = 1.0 / 60.0
    cap = 4096 if args.cpu else 65536
    w = ExprWriter()
    debris = (
        EffectAsset("debris", cap, SpawnerSettings.rate(cap / 4.0), w.finish())
        .init(
            SetPositionSphereModifier(
                w.module.lit((0.0, 0.0, 0.0)), w.module.lit(3.0),
                ShapeDimension.VOLUME,
            )
        )
        .init(
            SetVelocitySphereModifier(
                w.module.lit((0.0, 0.0, 0.0)), w.module.lit(1.0)
            )
        )
        .init(SetAttributeModifier(A.LIFETIME, w.lit(4.0).expr()))
        .init(SetAttributeModifier(A.AGE, w.lit(0.0).expr()))
        .init(SetAttributeModifier(A.HDR_COLOR, w.lit((0.9, 0.6, 0.2, 1.0)).expr()))
        .render(SetSizeModifier((0.05,) * 3))
        .with_alpha_mode(AlphaMode.OPAQUE)
    )
    scene = HanabiScene(seed=3)
    scene.add(debris, "debris")
    scene.add(gradient_effect(capacity=(1 << 14) if args.cpu else (1 << 19)), "grad")
    scene.add(firework_effect(capacity=cap), "rocket")
    scene.add(firework_trail_effect(capacity=4 * cap), "trail", parent="rocket")

    cam = CameraParams(
        view=look_at(
            np.array([0.0, 0.0, 26.0]), np.zeros(3), np.array([0.0, 1.0, 0.0])
        ),
        proj=perspective(math.radians(60.0), 1.0, 0.1, 200.0),
        viewport=(args.size, args.size),
    )
    cfg = RasterConfig(width=args.size, height=args.size, tile_slots=2)

    def orbit(s, i):
        # the host-side per-frame hook: animate the rocket emitter WITHIN
        # the chunk (dispatches stay chunked; only input capture sees this)
        a = 0.04 * (s._frame + i)
        t = np.eye(3, 4, dtype=np.float32)
        t[0, 3] = 2.5 * math.cos(a)
        t[2, 3] = 2.5 * math.sin(a)
        s.set_transform("rocket", t)

    img = None
    t_total = 0.0
    for c in range(args.chunks):
        t0 = time.perf_counter()
        img, sums = scene.update_render_chunk(
            args.k, DT, cam, cfg, on_frame=orbit
        )
        float(sums[-1])  # block
        dt = time.perf_counter() - t0
        if c:  # skip compile chunk
            t_total += dt
        print(
            f"chunk {c}: {args.k} frames in {dt*1e3:.1f} ms "
            f"({args.k/dt:.1f} fps), alive={scene.total_alive()}"
        )
    if args.chunks > 1:
        print(
            f"steady-state: {(args.chunks - 1) * args.k / t_total:.1f} fps "
            f"({args.size}x{args.size}, whole scene per frame)"
        )

    rgb = np.asarray(img)[..., :3]
    ldr = np.clip(rgb / (1.0 + rgb) * 1.6, 0.0, 1.0)
    try:
        from PIL import Image

        Image.fromarray((ldr * 255).astype(np.uint8)).save(args.out)
        print("wrote", args.out)
    except ImportError:
        pass


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Render an animated firework GIF (reference examples/firework.rs look).

Reproducible source of examples/gallery/firework.gif: burst rockets with
OnDie trail children, HDR color gradients, additive blending, bloom +
ACES tonemap (the reference gets bloom from Bevy's camera).

Usage: python examples/animate.py [--frames 120] [--size 256] [--out ...]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np


def main() -> None:
    jax.config.update("jax_platforms", "cpu")  # headless host render
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--warmup", type=int, default=30)
    ap.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(__file__), "gallery", "firework.gif"
        ),
    )
    args = ap.parse_args()

    from bevy_hanabi_tpu.models import firework_effect, firework_trail_effect
    from bevy_hanabi_tpu.render import (
        CameraParams,
        RasterConfig,
        bloom,
        look_at,
        perspective,
        tonemap_aces,
    )
    from bevy_hanabi_tpu.runtime import HanabiScene

    scene = HanabiScene(seed=7)
    scene.add(firework_effect(capacity=8192), "rocket")
    scene.add(firework_trail_effect(capacity=32768), "trail", parent="rocket")
    cam = CameraParams(
        view=look_at((0.0, 3.0, 7.0), (0.0, 3.0, 0.0)),
        proj=perspective(0.9, 1.0, 0.1, 100.0),
        viewport=(args.size, args.size),
    )
    cfg = RasterConfig(
        width=args.size, height=args.size, tile_span=2,
        max_entries_per_tile=128, antialias=True,
    )
    for _ in range(args.warmup):
        scene.update(1 / 60)

    frames = []
    for _ in range(args.frames):
        scene.update(1 / 60)
        img = scene.render(cam, cfg, background=(0.0, 0.0, 0.0, 1.0))
        img = tonemap_aces(bloom(img, threshold=0.8, sigma=2.5, intensity=0.9))
        frames.append(
            (np.clip(np.asarray(img)[..., :3], 0, 1) * 255).astype(np.uint8)
        )

    from PIL import Image

    imgs = [Image.fromarray(f) for f in frames]
    # GIF delays are 10 ms ticks and browsers clamp delays < 20 ms to
    # 100 ms, so 20 ms (50 fps) is the closest honored match to the
    # 1/60 s sim step
    imgs[0].save(
        args.out, save_all=True, append_images=imgs[1:], duration=20, loop=0
    )
    print(f"{len(frames)} frames -> {args.out}")


if __name__ == "__main__":
    main()

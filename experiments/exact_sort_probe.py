"""Probe: what does the exact-binning (tile_slots=0) sort actually cost,
and would a depth-presort + 1-op big sort beat the current 2-op big sort?

Current ordered path (raster.py): ONE lax.sort of 4N entries with TWO
operands (packed u32 (tile|depth22) key + i32 pidx payload).

Candidate: (1) sort the N particles by depth (2-op or with free payloads),
(2) build 4N entries against the depth-ordered rows, key = tile | row
(row = depth rank), (3) ONE 1-op lax.sort of the 4N u32 keys — per-tile
runs come out in EXACT back-to-front depth order (no quantization) and
pidx decodes arithmetically.

Run on the real TPU: python experiments/exact_sort_probe.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit_chained(step, carry, iters=20, warmup=3):
    for _ in range(warmup):
        carry = step(carry)
    jax.block_until_ready(carry)
    t0 = time.perf_counter()
    c = carry
    for _ in range(iters):
        c = step(c)
    jax.block_until_ready(c)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)

    for N in (1 << 20, 1 << 21):
        E = 4 * N  # span^2 entries
        keys = jnp.asarray(rng.integers(0, 2**32, size=E, dtype=np.uint32))
        pidx = jnp.asarray(rng.integers(0, N, size=E).astype(np.int32))
        depth = jnp.asarray(rng.random(N, dtype=np.float32))
        pid_n = jnp.asarray(np.arange(N, dtype=np.int32))
        pay1 = jnp.asarray(rng.random(N, dtype=np.float32))
        pay4 = [jnp.asarray(rng.random(N, dtype=np.float32)) for _ in range(4)]

        @jax.jit
        def sort1(c):
            (k,) = jax.lax.sort((c,), num_keys=1)
            return jnp.roll(k, 1)

        @jax.jit
        def sort2(c):
            k, p = c
            ks, ps = jax.lax.sort((k, p), num_keys=1)
            return jnp.roll(ks, 1), ps

        @jax.jit
        def presort(c):
            d, = c
            out = jax.lax.sort((d, pid_n, pay1) + tuple(pay4), num_keys=1)
            return (jnp.roll(out[0], 1),)

        ms1 = timeit_chained(sort1, keys)
        ms2 = timeit_chained(sort2, (keys, pidx))
        msp = timeit_chained(presort, (depth,))
        print(
            f"N={N>>20}M  E={E>>20}M:  big 1-op {ms1:7.3f} ms | "
            f"big 2-op {ms2:7.3f} ms | N-presort(f32 key + 6 payloads) "
            f"{msp:7.3f} ms | candidate total {ms1 + msp:7.3f} ms",
            flush=True,
        )

    # end-to-end: current exact rasterize at 2M/512^2 for reference
    from bevy_hanabi_tpu.render.camera import (
        CameraParams,
        look_at,
        perspective,
    )
    from bevy_hanabi_tpu.render.extract import ParticleDrawData
    from bevy_hanabi_tpu.render.raster import RasterConfig, rasterize
    import math

    N = 1 << 21
    pos = rng.normal(0, 2.0, size=(N, 3)).astype(np.float32)
    draw = ParticleDrawData(
        position=jnp.asarray(pos),
        axis_x=jnp.broadcast_to(
            jnp.asarray([0.04, 0.0, 0.0], jnp.float32), (N, 3)
        ),
        axis_y=jnp.broadcast_to(
            jnp.asarray([0.0, 0.04, 0.0], jnp.float32), (N, 3)
        ),
        color=jnp.broadcast_to(
            jnp.asarray([0.8, 0.5, 0.3, 0.4], jnp.float32), (N, 4)
        ),
        alive=jnp.ones((N,), jnp.bool_),
        roundness=None,
        sprite_index=jnp.zeros((N,), jnp.int32),
        sprite_grid_size=(1, 1),
        texture_layers=(),
        needs_uv=False,
    )
    cam = CameraParams(
        view=look_at(np.asarray([0.0, 0.0, 8.0]), np.zeros(3)),
        proj=perspective(math.radians(60.0), 1.0, 0.1, 100.0),
        viewport=(512, 512),
    )
    cfg = RasterConfig(width=512, height=512)  # tile_slots=0 exact

    @jax.jit
    def render(p):
        d = ParticleDrawData(
            position=p, axis_x=draw.axis_x, axis_y=draw.axis_y,
            color=draw.color, alive=draw.alive, roundness=None,
            sprite_index=draw.sprite_index, sprite_grid_size=(1, 1),
            texture_layers=(), needs_uv=False,
        )
        img = rasterize(d, cam, cfg, alpha_mode="blend")
        # feed the image back so iterations chain
        return p + img[0, 0, 0] * 1e-12

    ms = timeit_chained(render, draw.position, iters=10)
    print(f"rasterize 2M exact blend 512^2 (current): {ms:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()

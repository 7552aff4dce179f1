"""Pin the exact-binning (tile_slots=0) performance wall at 2M @ 512².

VERDICT r4 next-round item 2: get exact 2M@512² to >= 60 fps, or produce a
measured dead-end record of the same quality as the Pallas-gather
post-mortems, plus the pool size where exact binning crosses 60 fps.

Three parts:

A. lax.sort cost curve for the raster's ordered path at exact-binning
   entry counts (4N for span=2): operand-count variants, u16-key variant,
   and a batched per-slot variant — is there ANY sort configuration
   meaningfully under the measured ~1.7 ns/entry floor?
B. Frame decomposition at a 2M pool, exact config: step-only chunk vs
   full step+render chunk — how much of the frame is the render, and how
   does it split against the part-A sort number?
C. The 60 fps crossing: exact-binning fps at 1.25M / 1.5M / 2M pools.

Methodology as in gather_cost.py: the axon tunnel does not synchronize on
block_until_ready, so every timing chains ITERS data-dependent repetitions
inside ONE jit and reads back a scalar.
"""
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 20


def timeit_chained(make_step, init_carry, iters=ITERS):
    @jax.jit
    def run(carry):
        def body(c, _):
            return make_step(c), 0

        c, _ = jax.lax.scan(body, carry, None, length=iters)
        return jax.tree_util.tree_reduce(
            lambda a, x: a
            + jnp.sum((x.reshape(-1)[:1] if x.ndim else x).astype(jnp.float32)),
            c,
            0.0,
        )

    float(run(init_carry))  # compile + warm
    t0 = time.perf_counter()
    float(run(init_carry))
    t1 = time.perf_counter()
    float(run(init_carry))
    t2 = time.perf_counter()
    return min(t1 - t0, t2 - t1) / iters * 1e3


def part_a_sort_curve():
    print("== A. sort cost curve (raster ordered path shapes) ==", flush=True)
    rng = np.random.default_rng(0)
    for m in (1 << 21, 1 << 22, 1 << 23):
        keys = jnp.asarray(
            rng.integers(0, 2**32, size=m, dtype=np.uint64).astype(np.uint32)
        )
        pidx = jnp.arange(m, dtype=jnp.int32)

        def step_2op(c):
            k, p = jax.lax.sort(c, num_keys=1)
            return jnp.roll(k, 1), p

        ms = timeit_chained(step_2op, (keys, pidx))
        print(
            f"sort (u32 key, i32 payload) [{m:>8}]: {ms:7.3f} ms "
            f"({ms * 1e6 / m:5.2f} ns/entry)",
            flush=True,
        )

        def step_1op(c):
            (k,) = jax.lax.sort((c,), num_keys=1)
            return jnp.roll(k, 1)

        ms1 = timeit_chained(step_1op, keys)
        print(f"sort 1-op u32           [{m:>8}]: {ms1:7.3f} ms", flush=True)

        # u16 key: 11 tile bits + 5 coarse-depth bits would fit 512^2/T16.
        # If the comparison network ran 2x wider on 16-bit lanes this would
        # fund a group-by-tile + re-sort-windows two-phase raster.
        k16 = (keys >> 16).astype(jnp.uint16)

        def step_u16(c):
            k, p = jax.lax.sort(c, num_keys=1)
            return jnp.roll(k, 1), p

        ms16 = timeit_chained(step_u16, (k16, pidx))
        print(
            f"sort (u16 key, i32 payload) [{m:>8}]: {ms16:7.3f} ms",
            flush=True,
        )

        # batched per-slot sorts: [4, m/4] independent rows (the 4 bin
        # slots sorted separately; would need a 4-way merge in the blend)
        kb = keys.reshape(4, m // 4)
        pb = pidx.reshape(4, m // 4)

        def step_batched(c):
            k, p = jax.lax.sort(c, dimension=1, num_keys=1)
            return jnp.roll(k, 1, axis=1), p

        msb = timeit_chained(step_batched, (kb, pb))
        print(
            f"sort batched [4, {m // 4:>8}] 2-op:  {msb:7.3f} ms",
            flush=True,
        )


def part_a2_rank_pipeline():
    """Decisive probe for the depth-rank exact path: replace ONE 2-op sort
    of 4N entries with [1-op sort of N particles by depth, geometry riding
    as payloads] + [1-op sort of 4N (tile | rank) keys]. The u32 key fits
    because rank (21 bits at 2M) replaces (depth_q, pidx-payload); the
    window decodes pidx via rank -> sort1's pidx payload (window-sized
    gather, ~free)."""
    print("== A2. rank-pipeline sort chain vs current 2-op chain ==",
          flush=True)
    rng = np.random.default_rng(1)
    for n in (1 << 20, 1 << 21):
        m = 4 * n
        keys_m = jnp.asarray(
            rng.integers(0, 2**32, size=m, dtype=np.uint64).astype(np.uint32)
        )
        pidx_m = jnp.arange(m, dtype=jnp.int32)

        def chain_current(c):
            k, p = jax.lax.sort(c, num_keys=1)
            return jnp.roll(k, 1), p

        ms_cur = timeit_chained(chain_current, (keys_m, pidx_m))

        depth = jnp.asarray(rng.random(n, dtype=np.float32))
        pidx_n = jnp.arange(n, dtype=jnp.int32)
        # 10 payload lanes: position xyz, axis_x xyz, axis_y xyz, alive
        pays = tuple(
            jnp.asarray(rng.random(n, dtype=np.float32)) for _ in range(10)
        )

        def chain_rank(c):
            d, px = c
            out = jax.lax.sort((d, px) + pays, num_keys=1)
            # synthetic binning: 4 slots keyed (tile11 | rank21) from the
            # sorted positions (elementwise, like the real bin phase)
            x = out[2]
            y = out[3]
            tile = (
                (jnp.clip(x * 31, 0, 31).astype(jnp.uint32) * 32)
                + jnp.clip(y * 31, 0, 31).astype(jnp.uint32)
            )
            rank = jnp.arange(n, dtype=jnp.uint32)
            k4 = jnp.concatenate(
                [(tile << 21) | rank, ((tile + 1) % 1024 << 21) | rank,
                 ((tile + 32) % 1024 << 21) | rank,
                 ((tile + 33) % 1024 << 21) | rank]
            )
            (ks,) = jax.lax.sort((k4,), num_keys=1)
            return jnp.roll(out[0], 1) + ks[:n].astype(jnp.float32) * 0, out[1]

        ms_rank = timeit_chained(chain_rank, (depth, pidx_n))
        print(
            f"N={n:>8}: current 2-op sort[4N]: {ms_cur:7.3f} ms | "
            f"rank chain (1-op[N]+10pay + 1-op[4N]): {ms_rank:7.3f} ms",
            flush=True,
        )


def _scene(cap, res=512):
    from bevy_hanabi_tpu.models import gradient_effect
    from bevy_hanabi_tpu.render.camera import (
        CameraParams,
        look_at,
        perspective,
    )
    from bevy_hanabi_tpu.runtime import CompiledEffect
    from bevy_hanabi_tpu.spawn import EffectSpawner

    asset = gradient_effect(capacity=cap)
    fx = CompiledEffect(asset)
    pool = fx.create_pool()
    spawner = EffectSpawner(asset.spawner, rng=np.random.default_rng(0))
    cam = CameraParams(
        view=look_at(
            np.array([0.0, 0.0, 26.0]), np.zeros(3), np.array([0.0, 1.0, 0.0])
        ),
        proj=perspective(math.radians(60.0), 1.0, 0.1, 200.0),
        viewport=(res, res),
    )
    return fx, pool, spawner, cam


def bench_config(cap, cfg, K=120, render=True, dt=1 / 60):
    from bevy_hanabi_tpu.compiler import SimParams
    from bevy_hanabi_tpu.runtime import StepInputs

    fx, pool, spawner, cam = _scene(cap)
    frame = 0

    def chunk(frame):
        inputs, sims = [], []
        for j in range(K):
            inputs.append(StepInputs.make(spawner.tick(dt), frame + j))
            sims.append(SimParams(time=(frame + j) * dt, delta_time=dt))
        return fx.stack_frames(inputs, sims)

    for _ in range((int(5.0 / dt) + K) // K + 1):
        ii, ss = chunk(frame)
        frame += K
        pool = fx.step_chunk(pool, ii, ss)
    best = float("inf")
    alive = 0
    for r in range(4):
        ii, ss = chunk(frame)
        frame += K
        int(pool.alive_count())
        t0 = time.perf_counter()
        if render:
            pool, img, sums = fx.step_render_chunk(pool, ii, ss, cam, cfg)
        else:
            pool = fx.step_chunk(pool, ii, ss)
        alive = int(pool.alive_count())
        if r:
            best = min(best, time.perf_counter() - t0)
    return K / best, alive


def part_b_decomposition():
    from bevy_hanabi_tpu.render.raster import RasterConfig

    print("== B. 2M-pool frame decomposition ==", flush=True)
    cap = 1 << 21
    fps_step, alive = bench_config(cap, None, render=False)
    print(
        f"2M step-only chunk: {fps_step:6.1f} steps/s "
        f"({1e3 / fps_step:5.2f} ms/frame, alive={alive})",
        flush=True,
    )
    for label, cfg in (
        ("exact slots=0", RasterConfig(width=512, height=512)),
        ("slots=2", RasterConfig(width=512, height=512, tile_slots=2)),
        ("slots=1", RasterConfig(width=512, height=512, tile_slots=1)),
    ):
        fps, alive = bench_config(cap, cfg)
        print(
            f"2M step+render {label:14s}: {fps:6.1f} fps "
            f"({1e3 / fps:5.2f} ms/frame, alive={alive})",
            flush=True,
        )


def part_c_crossing():
    from bevy_hanabi_tpu.render.raster import RasterConfig

    print("== C. exact-binning 60 fps crossing ==", flush=True)
    cfg = RasterConfig(width=512, height=512)
    for cap in (1 << 20, (1 << 20) + (1 << 18), (1 << 20) + (1 << 19)):
        fps, alive = bench_config(cap, cfg)
        print(
            f"exact {cap / 2**20:.2f}M @ 512²: {fps:6.1f} fps "
            f"(alive={alive})",
            flush=True,
        )


if __name__ == "__main__":
    print("backend:", jax.devices()[0].platform, flush=True)
    parts = sys.argv[1:] or ["a", "a2", "b", "c"]
    if "a" in parts:
        part_a_sort_curve()
    if "a2" in parts:
        part_a2_rank_pipeline()
    if "b" in parts:
        part_b_decomposition()
    if "c" in parts:
        part_c_crossing()

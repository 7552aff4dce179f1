"""Frame-level achieved-HBM roofline for the flagship render configs.

VERDICT r4 weak #5: utilization was only stated as guaranteed floors
(`hbm_gbps_min` counts pool+framebuffer traffic and excludes the
sort/gather traffic that dominates the frame). This measures what the
frame ACTUALLY does, from a device-side profiler capture (xplane.pb,
parsed by bevy_hanabi_tpu.utils.xplane — no xprof bindings exist here):

* per-op executed durations — leaf-op sums reproduce the measured frame
  time (validation that the attribution is trustworthy);
* per-op `bytes_accessed` x occurrences -> achieved dataflow GB/s
  against the 590 GB/s measured elementwise peak. XLA's accounting
  counts each op's operand+result traffic; a sort's INTERNAL merge
  passes are invisible, so the figure is a lower bound — but a far
  tighter one than the floors;
* the top consumers by time and by bytes, with Python source attribution
  (the capture carries the traced source line per op).

Configs: the 1M slots=1 headline, ribbons 1M/4096, 4M slots=1 (the three
the verdict asked for) plus 2M exact for the wall record.

Run:      python experiments/roofline.py            (capture + analyze)
Re-run:   python experiments/roofline.py analyze    (reuse old captures)

Note cost_analysis() was tried first and measured USELESS for this: it
counts while-loop bodies once (or inconsistently), so chunked (lax.scan)
programs report garbage totals. The xplane capture records actual
executions.
"""

import glob
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

HBM_PEAK_GBPS = 590.0
DT = 1.0 / 60.0
K = 120
TRACE_FRAMES = 8
TRACE_DIR = "/tmp/hanabi_roofline"


def _cam(res=512, z=26.0):
    from bevy_hanabi_tpu.render.camera import (
        CameraParams,
        look_at,
        perspective,
    )

    return CameraParams(
        view=look_at(
            np.array([0.0, 0.0, z]), np.zeros(3), np.array([0.0, 1.0, 0.0])
        ),
        proj=perspective(math.radians(60.0), 1.0, 0.1, 200.0),
        viewport=(res, res),
    )


def make(name, cap):
    from bevy_hanabi_tpu.models import gradient_effect, ribbon_bench_effect
    from bevy_hanabi_tpu.runtime import CompiledEffect
    from bevy_hanabi_tpu.spawn import EffectSpawner

    if name == "ribbon":
        asset = ribbon_bench_effect(capacity=cap, num_ribbons=4096)
    else:
        asset = gradient_effect(capacity=cap)
    fx = CompiledEffect(asset)
    return fx, fx.create_pool(), EffectSpawner(
        asset.spawner, rng=np.random.default_rng(0)
    )


def capture_config(label, name, cap, cfg):
    from bevy_hanabi_tpu.compiler import SimParams
    from bevy_hanabi_tpu.runtime import StepInputs

    fx, pool, spawner = make(name, cap)
    cam = _cam(cfg.width, z=10.0 if name == "ribbon" else 26.0)
    frame = 0

    def chunk(frame, k=K):
        inputs, sims = [], []
        for j in range(k):
            inputs.append(StepInputs.make(spawner.tick(DT), frame + j))
            sims.append(SimParams(time=(frame + j) * DT, delta_time=DT))
        return fx.stack_frames(inputs, sims)

    for _ in range((int(5.0 / DT) + K) // K + 1):
        ii, ss = chunk(frame)
        frame += K
        pool, img, sums = fx.step_render_chunk(pool, ii, ss, cam, cfg)
    best = float("inf")
    for r in range(4):
        ii, ss = chunk(frame)
        frame += K
        int(pool.alive_count())
        t0 = time.perf_counter()
        pool, img, sums = fx.step_render_chunk(pool, ii, ss, cam, cfg)
        alive = int(pool.alive_count())
        if r:
            best = min(best, time.perf_counter() - t0)
    fps = K / best

    # short-chunk device capture (separate K so the trace stays small)
    sub = os.path.join(TRACE_DIR, label)
    ii8, ss8 = chunk(frame, TRACE_FRAMES)
    pool, _, _ = fx.step_render_chunk(pool, ii8, ss8, cam, cfg)  # compile
    ii8, ss8 = chunk(frame + TRACE_FRAMES, TRACE_FRAMES)
    jax.profiler.start_trace(sub)
    pool, img2, sums2 = fx.step_render_chunk(pool, ii8, ss8, cam, cfg)
    float(jnp.sum(sums2))
    jax.profiler.stop_trace()
    return fps, alive


def analyze_config(label, fps, alive=None):
    from bevy_hanabi_tpu.utils.xplane import (
        CONTAINER_CATEGORIES,
        leaf_totals,
        op_stats,
    )

    pbs = sorted(
        glob.glob(
            os.path.join(TRACE_DIR, label, "**", "*.xplane.pb"),
            recursive=True,
        )
    )
    if not pbs:
        print(f"== {label}: no capture found ==", flush=True)
        return
    st = op_stats(pbs[-1])
    leaf_ms, leaf_bytes = leaf_totals(st)
    ms_frame = leaf_ms / TRACE_FRAMES
    bytes_frame = leaf_bytes / TRACE_FRAMES
    gbps = bytes_frame * fps / 1e9

    print(f"\n== {label} ==", flush=True)
    alive_s = f", alive={alive}" if alive else ""
    print(
        f"measured: {fps:7.1f} fps ({1e3 / fps:6.2f} ms/frame{alive_s}); "
        f"leaf-op device time {ms_frame:6.2f} ms/frame "
        f"({ms_frame * fps / 10:4.1f}% of wall — attribution check)",
        flush=True,
    )
    print(
        f"dataflow: {bytes_frame / 1e6:8.1f} MB/frame -> achieved "
        f"{gbps:6.1f} GB/s = {gbps / HBM_PEAK_GBPS * 100:4.1f}% of "
        f"{HBM_PEAK_GBPS:.0f} GB/s peak (sort-internal passes excluded)",
        flush=True,
    )
    leafs = {
        n: r for n, r in st.items()
        if r["category"] not in CONTAINER_CATEGORIES
    }
    print("top ops by device time:", flush=True)
    for n, r in sorted(leafs.items(), key=lambda kv: -kv[1]["ms"])[:5]:
        src = r["source"].rsplit("/", 1)[-1] or "?"
        print(
            f"  {r['ms'] / TRACE_FRAMES:8.3f} ms/frame "
            f"({r['ms'] / leaf_ms * 100:4.1f}%) "
            f"{r['bytes'] / TRACE_FRAMES / 1e6:8.1f} MB/frame "
            f"[{r['category'][:14]:14s}] {n[:22]:22s} {src}",
            flush=True,
        )
    print("top ops by dataflow bytes:", flush=True)
    for n, r in sorted(leafs.items(), key=lambda kv: -kv[1]["bytes"])[:3]:
        src = r["source"].rsplit("/", 1)[-1] or "?"
        print(
            f"  {r['bytes'] / TRACE_FRAMES / 1e6:8.1f} MB/frame "
            f"({r['bytes'] / leaf_bytes * 100:4.1f}%) "
            f"{r['ms'] / TRACE_FRAMES:8.3f} ms/frame "
            f"[{r['category'][:14]:14s}] {n[:22]:22s} {src}",
            flush=True,
        )


CONFIGS = [
    ("headline_1M_slots1", "gradient", 1 << 20, dict(tile_slots=1)),
    ("ribbon_1M_4096", "ribbon", 1 << 20, dict(tile_slots=1)),
    ("scaling_4M_slots1", "gradient", 1 << 22, dict(tile_slots=1)),
    ("exact_2M_slots0", "gradient", 1 << 21, dict()),
]

# measured fps from the capture run on 2026-08-19 (for `analyze` mode)
LAST_FPS = {
    "headline_1M_slots1": 277.5,
    "ribbon_1M_4096": 116.1,
    "scaling_4M_slots1": 76.9,
    "exact_2M_slots0": 41.2,
}


def main():
    from bevy_hanabi_tpu.render.raster import RasterConfig

    analyze_only = "analyze" in sys.argv[1:]
    print("backend:", jax.devices()[0].platform, flush=True)
    for label, name, cap, kw in CONFIGS:
        cfg = RasterConfig(width=512, height=512, **kw)
        if analyze_only:
            fps, alive = LAST_FPS[label], None
        else:
            fps, alive = capture_config(label, name, cap, cfg)
        analyze_config(label, fps, alive)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Headline benchmark: alive particles stepped/sec on one TPU chip, 1M pool.

BASELINE.json metric: "alive particles stepped/sec/chip at 1M pool".
Baseline target: 1M alive particles at >= 60 sim-steps/sec => 6.0e7
particles-stepped/sec. ``vs_baseline`` is measured/6.0e7.

Runs the BASELINE config-1 effect (spawn.rs analogue: rate spawner + gravity
+ sphere init + uniform-random velocities) at a 1,048,576-particle pool in
steady-state churn: slots die (lifetime 4 s) and respawn every frame, so the
measured step includes the full spawn-ranking + init + update + reap pipeline,
not just integration.
"""

import json
import os
import time

import jax

# Persistent compile cache: the axon remote-compile path has high and
# variable latency (20s .. minutes); cache XLA executables across runs.
jax.config.update("jax_compilation_cache_dir", os.environ.get("JAX_CACHE_DIR", "/root/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

from bevy_hanabi_tpu.compiler import SimParams
from bevy_hanabi_tpu.models import spawn_gravity_effect
from bevy_hanabi_tpu.runtime import CompiledEffect, StepInputs
from bevy_hanabi_tpu.spawn import EffectSpawner

CAPACITY = 1 << 20  # 1,048,576
LIFETIME = 4.0
DT = 1.0 / 60.0
MEASURE_STEPS = 120  # one scan-chunk; every chunk reuses this one executable
# Warmup covers one full lifetime so deaths de-synchronize and the pool
# reaches steady-state churn before measurement.
WARMUP_CHUNKS = (int(LIFETIME / DT) + MEASURE_STEPS) // MEASURE_STEPS + 1
BASELINE_PARTICLES_PER_SEC = 6.0e7  # 1M alive @ 60 steps/s


def main() -> None:
    asset = spawn_gravity_effect(capacity=CAPACITY, rate=CAPACITY / LIFETIME * 1.1)
    fx = CompiledEffect(asset)
    pool = fx.create_pool()
    spawner = EffectSpawner(asset.spawner, rng=np.random.default_rng(0))
    sim = SimParams(time=0.0, delta_time=DT)

    # Saturate the pool: one bulk spawn, then steady-state churn.
    pool, _ = fx.step(pool, StepInputs.make(CAPACITY, 0), sim)

    frame = 1

    def make_chunk(frame, k):
        """Host-side spawner ticks for k frames, stacked for one dispatch."""
        inputs, sims = [], []
        for j in range(k):
            n = spawner.tick(DT)
            inputs.append(StepInputs.make(n, frame + j))
            sims.append(SimParams(time=(frame + j) * DT, delta_time=DT))
        return fx.stack_frames(inputs, sims)

    # One chunked dispatch = MEASURE_STEPS frames: amortizes the host→chip
    # tunnel latency exactly like the reference records a whole frame of
    # compute passes into one command encoder.
    for _ in range(WARMUP_CHUNKS):
        inputs, sims = make_chunk(frame, MEASURE_STEPS)
        frame += MEASURE_STEPS
        pool = fx.step_chunk(pool, inputs, sims)

    # NOTE: block_until_ready is NOT a reliable barrier over the axon relay
    # (observed returning before execution completes); a value readback is.
    alive_before = int(pool.alive_count())
    best = float("inf")
    for _ in range(3):
        inputs, sims = make_chunk(frame, MEASURE_STEPS)
        frame += MEASURE_STEPS
        int(pool.alive_count())  # sync point before starting the clock
        t0 = time.perf_counter()
        pool = fx.step_chunk(pool, inputs, sims)
        alive_after = int(pool.alive_count())  # readback = true barrier
        best = min(best, time.perf_counter() - t0)

    steps_per_sec = MEASURE_STEPS / best
    alive_mean = 0.5 * (alive_before + alive_after)
    particles_per_sec = alive_mean * steps_per_sec

    print(
        json.dumps(
            {
                "metric": "alive particles stepped/sec/chip at 1M pool",
                "value": particles_per_sec,
                "unit": "particles/s",
                "vs_baseline": particles_per_sec / BASELINE_PARTICLES_PER_SEC,
                "detail": {
                    "steps_per_sec": steps_per_sec,
                    "alive_mean": alive_mean,
                    "capacity": CAPACITY,
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Measure: Pallas per-row DMA gather vs XLA gather (jnp.take) on TPU.

The packed-row gather is the measured floor of the ribbon frame (6.5 ms
for 1M [N, 9] f32 rows, ~6.2 ns/row — docs/PERF.md "Ribbon frame
anatomy") and a fixed cost of every raster pass (the [M, nt] window
gathers). XLA's TPU gather issues one transaction per row and doesn't
pipeline; a Pallas kernel with scalar-prefetched indices can keep D
row-DMAs in flight from HBM and may beat it.

Run on the real chip: python experiments/pallas_gather_bench.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def gather_kernel(idx_ref, table_ref, out_ref, sem):
    """One grid step gathers B rows: out_ref[j] = table[idx[i*B + j]].

    idx_ref: SMEM scalar-prefetch [M]; table_ref: HBM [N, F];
    out_ref: VMEM block [B, F]; sem: DMA semaphore array [D].
    """
    i = pl.program_id(0)
    B = out_ref.shape[0]
    D = sem.shape[0]
    base = i * B

    def dma(j, slot):
        return pltpu.make_async_copy(
            table_ref.at[idx_ref[base + j]],
            out_ref.at[j],
            sem.at[slot],
        )

    def start(j):
        dma(j, jax.lax.rem(j, D)).start()

    def warm(j, _):
        start(j)
        return _

    jax.lax.fori_loop(0, D, warm, None)

    def body(j, _):
        slot = jax.lax.rem(j, D)

        @pl.when(j + D < B)
        def _():
            start(j + D)

        dma(j, slot).wait()
        return _

    jax.lax.fori_loop(0, B, body, None)


@functools.partial(jax.jit, static_argnames=("block", "depth"))
def pallas_gather(table, idx, block=2048, depth=16):
    M = idx.shape[0]
    N, F = table.shape
    assert M % block == 0
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(M // block,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((block, F), lambda i, idx: (i, 0)),
        scratch_shapes=[pltpu.SemaphoreType.DMA((depth,))],
    )
    return pl.pallas_call(
        gather_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M, F), table.dtype),
    )(idx, table)


def timeit(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    # timing barrier over the tunnel: read back one scalar
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(out[-1]))
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    print("devices:", jax.devices())
    N = 1 << 20
    for F in (9, 12):
        for kind in ("perm", "sorted", "random"):
            rng = np.random.default_rng(0)
            table = jnp.asarray(rng.standard_normal((N, F)), jnp.float32)
            if kind == "perm":
                idx = rng.permutation(N).astype(np.int32)
            elif kind == "sorted":
                idx = np.sort(rng.integers(0, N, N)).astype(np.int32)
            else:
                idx = rng.integers(0, N, N, dtype=np.int32)
            idx = jnp.asarray(idx)

            t_xla, ref = timeit(
                jax.jit(
                    lambda t, i: jnp.take(
                        t, i, axis=0, indices_are_sorted=(kind == "sorted"),
                        mode="clip",
                    )
                ),
                table,
                idx,
            )
            try:
                t_pl, out = timeit(pallas_gather, table, idx)
                ok = bool(jnp.array_equal(out, ref))
            except Exception as e:  # noqa: BLE001
                print(f"F={F} {kind}: pallas FAILED: {type(e).__name__}: {e}")
                continue
            print(
                f"F={F} idx={kind}: xla {t_xla*1e3:7.3f} ms  "
                f"pallas {t_pl*1e3:7.3f} ms  "
                f"({t_xla/t_pl:4.2f}x)  match={ok}  "
                f"({t_pl/N*1e9:.2f} ns/row)"
            )


if __name__ == "__main__":
    main()

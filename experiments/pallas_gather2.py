#!/usr/bin/env python
"""Pallas row-gather, take 2: per-block SMEM index staging + row DMAs.

Mosaic constraints discovered by take 1 (pallas_gather_bench.py):
* an HBM slice's lane dim must align to the (1, 128) tiling — per-row
  DMA needs 128-column rows (f32: 512 B/row);
* scalar-prefetch operands live in SMEM (1 MB) — a 1M-row index array
  (4 MB) cannot prefetch whole; each grid step DMAs its index block
  HBM -> SMEM first.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def gather_kernel(idx_hbm, table_ref, out_ref, idx_s, sem_i, sem):
    i = pl.program_id(0)
    B = out_ref.shape[0]
    D = sem.shape[0]

    idma = pltpu.make_async_copy(
        idx_hbm.at[pl.ds(i * B, B)], idx_s, sem_i
    )
    idma.start()
    idma.wait()

    def dma(j, slot):
        return pltpu.make_async_copy(
            table_ref.at[idx_s[j]], out_ref.at[j], sem.at[slot]
        )

    def warm(j, _):
        dma(j, jax.lax.rem(j, D)).start()
        return _

    jax.lax.fori_loop(0, D, warm, None)

    def body(j, _):
        slot = jax.lax.rem(j, D)

        @pl.when(j + D < B)
        def _():
            dma(j + D, jax.lax.rem(j + D, D)).start()

        dma(j, slot).wait()
        return _

    jax.lax.fori_loop(0, B, body, None)


@functools.partial(jax.jit, static_argnames=("block", "depth"))
def pallas_gather(table, idx, block=2048, depth=16):
    M = idx.shape[0]
    N, F = table.shape
    assert M % block == 0
    return pl.pallas_call(
        gather_kernel,
        grid=(M // block,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((block, F), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((M, F), table.dtype),
        scratch_shapes=[
            pltpu.SMEM((block,), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((depth,)),
        ],
    )(idx, table)


def timeit(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(out[-1]))
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    N = 1 << 20
    F = 128
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal((N, F)), jnp.float32)
    idx = jnp.asarray(rng.permutation(N).astype(np.int32))
    t_xla, ref = timeit(
        jax.jit(lambda t, i: jnp.take(t, i, axis=0, mode="clip")), table, idx
    )
    print(f"xla F=128: {t_xla*1e3:.3f} ms ({t_xla/N*1e9:.2f} ns/row)")
    for block, depth in ((2048, 16), (2048, 32), (8192, 32)):
        try:
            t_pl, out = timeit(
                functools.partial(pallas_gather, block=block, depth=depth),
                table,
                idx,
            )
            ok = bool(jnp.array_equal(out, ref))
        except Exception as e:  # noqa: BLE001
            print(f"block={block} depth={depth}: FAILED {type(e).__name__}: {e}")
            continue
        print(
            f"pallas block={block} depth={depth}: {t_pl*1e3:.3f} ms "
            f"({t_xla/t_pl:.2f}x) match={ok} ({t_pl/N*1e9:.2f} ns/row)"
        )


if __name__ == "__main__":
    main()

"""Measure the TPU cost model for permutation gathers and lax.sort operands.

Decides the ribbon-path optimization (docs/PERF.md "Ribbon frame anatomy"):
is a random row gather row-count-bound or byte-bound, and what does each
extra lax.sort operand cost at 1M?

NOTE the axon tunnel backend does not synchronize on block_until_ready —
every timing chains ITERS data-dependent repetitions inside one jit and
forces a scalar readback, dividing by ITERS.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 1 << 20
ITERS = 30


def timeit_chained(make_step, init_carry, iters=ITERS):
    """Time one chained-step; make_step(carry) -> carry (data-dependent)."""

    @jax.jit
    def run(carry):
        def body(c, _):
            return make_step(c), 0
        c, _ = jax.lax.scan(body, carry, None, length=iters)
        return jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(
                (x.reshape(-1)[:1] if x.ndim else x).astype(jnp.float32)
            ),
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


def main():
    print("backend:", jax.devices()[0].platform, flush=True)
    rng = np.random.default_rng(0)
    perm = jnp.asarray(rng.permutation(N).astype(np.int32))

    for f in (4, 5, 6, 8, 12, 16):
        data = jnp.asarray(rng.random((N, f), dtype=np.float32))

        def step(c, perm=perm):
            d, p = c
            out = d[p]
            # rotate the permutation so successive gathers differ (CSE-proof)
            return out, jnp.roll(p, 1)

        ms = timeit_chained(step, (data, perm))
        print(f"gather [{N},{f:2d}] random rows: {ms:7.3f} ms "
              f"({ms*1e6/N:5.2f} ns/row)", flush=True)

    data1 = jnp.asarray(rng.random(N, dtype=np.float32))

    def step1(c):
        d, p = c
        return d[p], jnp.roll(p, 1)

    ms = timeit_chained(step1, (data1, perm))
    print(f"gather [{N}] 1D random:        {ms:7.3f} ms", flush=True)

    # window gather: 65k rows of [N,10] via composed remap
    w = 64 * 1024
    widx = jnp.asarray(rng.integers(0, N, size=w).astype(np.int32))
    data = jnp.asarray(rng.random((N, 10), dtype=np.float32))

    def stepw(c):
        wi, acc = c
        out = data[perm[wi]]
        # consume the ENTIRE gathered block: reducing only out[0,0] lets
        # XLA legally shrink the gather to one element, under-measuring it
        return jnp.roll(wi, 1), acc + jnp.sum(out)

    ms = timeit_chained(stepw, (widx, jnp.float32(0)))
    print(f"window gather {w} rows of [N,10] via remap: {ms:7.3f} ms",
          flush=True)

    # lax.sort with k extra f32 operands (3 keys + idx payload, like ribbon)
    rid = jnp.asarray(rng.integers(0, 4096, size=N).astype(np.uint32))
    age = jnp.asarray(rng.random(N, dtype=np.float32))
    ctr = jnp.asarray(rng.integers(0, N, size=N).astype(np.uint32))
    idx = jnp.arange(N, dtype=jnp.int32)
    extras = [jnp.asarray(rng.random(N, dtype=np.float32)) for _ in range(8)]

    for k in (0, 1, 2, 3, 4, 8):
        def stepk(c, k=k):
            r, a = c
            out = jax.lax.sort((r, a, ctr, idx) + tuple(extras[:k]),
                               num_keys=3)
            # feed sorted age back (rotated) so successive sorts differ
            return jnp.roll(out[0], 1), out[1]

        ms = timeit_chained(stepk, (rid, age))
        print(f"lax.sort 3 keys + idx + {k} f32 operands: {ms:7.3f} ms",
              flush=True)

    # raster-style 1-op u32 sort at 1M and 2M
    for m in (N, 2 * N):
        keys = jnp.asarray(rng.integers(0, 2**32, size=m, dtype=np.uint64)
                           .astype(np.uint32))

        def steps(c):
            (k,) = jax.lax.sort((c,), num_keys=1)
            return jnp.roll(k, 1)

        ms = timeit_chained(steps, keys)
        print(f"lax.sort 1-op u32 [{m}]: {ms:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()

"""Pallas bitonic key/value sort for VMEM-resident arrays.

``jax.lax.sort`` on this TPU costs ~30-40 ms nearly independent of size:
its O(log^2 n) compare-exchange passes each run as a separate kernel over
HBM, so per-pass overhead dominates. This kernel runs the whole bitonic
network inside ONE kernel on VMEM-resident data (<= 2^18 key/value pairs).

STATUS (measured on v5e): correctness-proven, but ``pltpu.roll``-based
exchanges run at ~32 ms for 128k pairs - no faster than lax.sort. The roll
lowering appears to serialize. Kept as the foundation for the renderer's
sort-bound fix; the likely next step is a radix binning kernel with SMEM
bucket counters instead of a comparison sort. RasterConfig.use_pallas_sort
stays False by default until this beats lax.sort.

Data lives as ``[R, 128]`` with virtual index ``i = row*128 + lane``. The
xor-partner exchange of a bitonic stage is two ``pltpu.roll``s + a select —
lane-axis rolls for strides < 128, sublane-axis rolls for larger strides —
so the whole network is iota/roll/where ops, all of which Mosaic lowers.

Keys are uint32, values int32. Ascending, not stable (pack tie-breakers
into the key if order among equals matters).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["bitonic_sort_pairs", "VMEM_SORT_MAX"]

LANES = 128
# 2^18 pairs = 2 MB keys + 2 MB values (+ staging) comfortably fits 16MB VMEM.
VMEM_SORT_MAX = 1 << 18


def _exchange(x, j, rows):
    """Value at each element's xor-partner index i^j (j a power of two)."""
    if j < LANES:
        fwd = pltpu.roll(x, LANES - j, 1)  # lane l reads l+j (mod 128)
        bwd = pltpu.roll(x, j, 1)  # lane l reads l-j
        lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        low = (lane & j) == 0
    else:
        jr = j // LANES
        fwd = pltpu.roll(x, rows - jr, 0)
        bwd = pltpu.roll(x, jr, 0)
        row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
        low = (row & jr) == 0
    return jnp.where(low, fwd, bwd), low


def _bitonic_body(keys, vals):
    """Full bitonic network over [R, 128] (virtual index i = r*128 + l)."""
    rows = keys.shape[0]
    n = rows * LANES
    row_i = jax.lax.broadcasted_iota(jnp.int32, keys.shape, 0)
    lane_i = jax.lax.broadcasted_iota(jnp.int32, keys.shape, 1)
    idx = row_i * LANES + lane_i

    k = 2
    while k <= n:
        j = k // 2
        while j >= 1:
            kp, i_low = _exchange(keys, j, rows)
            vp, _ = _exchange(vals, j, rows)
            asc = (idx & k) == 0
            k_lo = jnp.where(i_low, keys, kp)
            k_hi = jnp.where(i_low, kp, keys)
            # boolean-payload selects lower as i8 truncations Mosaic rejects;
            # express the direction choice with logical ops instead
            swap = (asc & (k_lo > k_hi)) | (jnp.logical_not(asc) & (k_lo < k_hi))
            keys = jnp.where(swap, kp, keys)
            vals = jnp.where(swap, vp, vals)
            j //= 2
        k *= 2
    return keys, vals


def _sort_kernel(keys_ref, vals_ref, out_k_ref, out_v_ref):
    keys, vals = _bitonic_body(keys_ref[:], vals_ref[:])
    out_k_ref[:] = keys
    out_v_ref[:] = vals


@functools.partial(jax.jit, static_argnames=("interpret",))
def bitonic_sort_pairs(keys: jnp.ndarray, vals: jnp.ndarray, interpret: bool = False):
    """Sort (uint32 keys, int32 vals) ascending by key in one Pallas kernel.

    ``len(keys)`` must be a power of two, >= 256 and <= VMEM_SORT_MAX.
    """
    n = keys.shape[0]
    if n & (n - 1):
        raise ValueError(f"bitonic sort needs a power-of-two size, got {n}")
    if n < 2 * LANES:
        raise ValueError(f"size must be >= {2 * LANES}, got {n}")
    if n > VMEM_SORT_MAX:
        raise ValueError(f"{n} pairs exceed the VMEM sort limit {VMEM_SORT_MAX}")
    rows = n // LANES
    keys = keys.astype(jnp.uint32).reshape(rows, LANES)
    vals = vals.astype(jnp.int32).reshape(rows, LANES)
    out_k, out_v = pl.pallas_call(
        _sort_kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rows, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
        ),
        interpret=interpret,
    )(keys, vals)
    return out_k.reshape(n), out_v.reshape(n)

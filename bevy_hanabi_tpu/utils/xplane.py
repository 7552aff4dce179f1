"""Minimal XSpace/XPlane protobuf wire-format reader (device profiles).

``jax.profiler.start_trace`` writes ``*.xplane.pb`` (the tensorflow.profiler
``XSpace`` message) containing DEVICE-side XLA op timings and XLA's per-op
traffic accounting — over the axon tunnel the ``trace.json.gz`` next to it
only carries host Python threads, so the xplane file is the only source of
on-device truth. No tensorflow/xprof proto bindings exist in this image;
this decodes the wire format directly (schema per
tensorflow/core/profiler/protobuf/xplane.proto):

    XSpace.planes[]                          field 1
    XPlane.name / lines / event_metadata /
        stat_metadata                        fields 2 / 3 / 4 / 5
    XLine.name / events / display_name      fields 2 / 4 / 11
    XEvent.metadata_id / duration_ps        fields 1 / 3
    XEventMetadata.name / display_name /
        stats                               fields 2 / 4 / 5
    XStat.metadata_id / value oneof         fields 1 / 2-7

The per-op stats ride on the EVENT METADATA (they are static per op):
``bytes_accessed`` (HBM bytes one execution of the op moves, per XLA's
accounting — operands + results; a sort's INTERNAL merge passes are not
included), ``flops``, ``hlo_category``, and ``source`` (the Python line
the op was traced from). Events are actual executions, so a lax.scan
body's ops appear once per iteration and occurrence-summing accumulates
real per-chunk totals.

Used by bench.py (``hbm_gbps_measured``) and experiments/roofline.py;
complements utils/profiling.py's DebugSettings capture (the reference's
analogue is the RenderDoc capture hook, render/mod.rs:2484-2533 — this is
the TPU version: capture, then read op truth out of the capture).
"""

from __future__ import annotations

import collections
import struct
from typing import Dict, Iterator, Tuple

__all__ = ["op_durations", "op_stats", "leaf_totals", "CONTAINER_CATEGORIES"]

#: hlo_category values whose events NEST other ops' events (summing them
#: alongside their children double-counts time/bytes).
CONTAINER_CATEGORIES = frozenset({"while", "conditional", "call"})


def _varint(buf: bytes, i: int) -> Tuple[int, int]:
    shift = 0
    val = 0
    while True:
        b = buf[i]
        val |= (b & 0x7F) << shift
        i += 1
        if not b & 0x80:
            return val, i
        shift += 7


def _fields(buf: bytes) -> Iterator[Tuple[int, int, object]]:
    """Yield (field_number, wire_type, value) over a message's wire bytes."""
    i, n = 0, len(buf)
    while i < n:
        tag, i = _varint(buf, i)
        fnum, wt = tag >> 3, tag & 7
        if wt == 0:  # varint
            v, i = _varint(buf, i)
        elif wt == 1:  # 64-bit
            v = struct.unpack_from("<Q", buf, i)[0]
            i += 8
        elif wt == 2:  # length-delimited
            ln, i = _varint(buf, i)
            v = buf[i : i + ln]
            i += ln
        elif wt == 5:  # 32-bit
            v = struct.unpack_from("<I", buf, i)[0]
            i += 4
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield fnum, wt, v


def _map_entry(buf: bytes) -> Tuple[int, bytes]:
    key, val = 0, b""
    for fnum, _, v in _fields(buf):
        if fnum == 1:
            key = v
        elif fnum == 2:
            val = v
    return key, val


def _stat(buf: bytes) -> Tuple[int, object]:
    """Decode one XStat -> (stat_metadata_id, value)."""
    mid, val = 0, None
    for fnum, _, v in _fields(buf):
        if fnum == 1:
            mid = v
        elif fnum == 2:  # double (varint-decoded 64 bits)
            val = struct.unpack("<d", struct.pack("<Q", v))[0]
        elif fnum in (3, 4, 7):  # uint64 / int64 / ref
            val = v
        elif fnum == 5:  # str
            val = v.decode("utf-8", "replace")
        elif fnum == 6:  # bytes
            val = v
    return mid, val


def _planes(data: bytes):
    """Yield (plane_name, event_metadata, lines) per XPlane.

    ``event_metadata``: {id: {"name": display-or-name, "stats": {...}}}
    resolved against the plane's stat_metadata table.
    """
    for fnum, _, plane_buf in _fields(data):
        if fnum != 1:
            continue
        plane_name = ""
        raw_meta = []
        stat_meta: Dict[int, str] = {}
        lines = []
        for pf, _, pv in _fields(plane_buf):
            if pf == 2:
                plane_name = pv.decode("utf-8", "replace")
            elif pf == 3:
                lines.append(pv)
            elif pf == 4:
                raw_meta.append(pv)
            elif pf == 5:
                mid, mbuf = _map_entry(pv)
                for mf, _, mv in _fields(mbuf):
                    if mf == 2:
                        stat_meta[mid] = mv.decode("utf-8", "replace")
        meta: Dict[int, dict] = {}
        for b in raw_meta:
            mid, mbuf = _map_entry(b)
            name = display = ""
            stats: Dict[str, object] = {}
            for mf, _, mv in _fields(mbuf):
                if mf == 2:
                    name = mv.decode("utf-8", "replace")
                elif mf == 4:
                    display = mv.decode("utf-8", "replace")
                elif mf == 5:
                    sid, sval = _stat(mv)
                    stats[stat_meta.get(sid, sid)] = sval
            meta[mid] = {"name": display or name, "stats": stats}
        yield plane_name, meta, lines


def _line_events(line_buf: bytes):
    """Decode one XLine -> (line_name, [(metadata_id, duration_ps), ...])."""
    line_name = ""
    events = []
    for lf, _, lv in _fields(line_buf):
        if lf == 2:
            line_name = lv.decode("utf-8", "replace")
        elif lf == 11:
            line_name = lv.decode("utf-8", "replace") or line_name
        elif lf == 4:
            mid = dur_ps = 0
            for ef, _, ev in _fields(lv):
                if ef == 1:
                    mid = ev
                elif ef == 3:
                    dur_ps = ev
            events.append((mid, dur_ps))
    return line_name, events


def op_durations(path: str) -> Dict[str, collections.Counter]:
    """Per-line total device op durations (ms) from an xplane.pb.

    Returns {f"{plane_name}/{line_name}": Counter({op_name: total_ms})}.
    """
    data = open(path, "rb").read()
    out: Dict[str, collections.Counter] = {}
    for plane_name, meta, lines in _planes(data):
        for line_buf in lines:
            line_name, events = _line_events(line_buf)
            ctr = out.setdefault(
                f"{plane_name}/{line_name}", collections.Counter()
            )
            for mid, dur_ps in events:
                name = meta.get(mid, {}).get("name", f"<{mid}>")
                ctr[name] += dur_ps / 1e9  # ps -> ms
    return {k: v for k, v in out.items() if v}


def op_stats(
    path: str, plane: str = "/device:TPU:0", line: str = "XLA Ops"
) -> Dict[str, dict]:
    """Aggregate per-op execution stats from a device capture.

    Each event is one actual execution; the per-op stats (static, on the
    event metadata) are multiplied out by occurrence. Returns
    {op_name: {"ms", "bytes", "flops", "occurrences", "category",
    "source"}} where "bytes" is XLA's `bytes_accessed` accounting
    (operand+result HBM traffic; a sort's internal merge passes are NOT
    included) summed over executions. Filter out
    ``CONTAINER_CATEGORIES`` before totalling — a `while` event nests its
    body ops' events.
    """
    data = open(path, "rb").read()
    out: Dict[str, dict] = {}
    for plane_name, meta, lines in _planes(data):
        if plane_name != plane:
            continue
        for line_buf in lines:
            line_name, events = _line_events(line_buf)
            if line_name != line:
                continue
            for mid, dur_ps in events:
                m = meta.get(mid, {"name": f"<{mid}>", "stats": {}})
                stats = m["stats"]
                rec = out.setdefault(
                    m["name"],
                    {
                        "ms": 0.0,
                        "bytes": 0,
                        "flops": 0,
                        "occurrences": 0,
                        "category": str(stats.get("hlo_category", "")),
                        "source": str(stats.get("source", "")),
                    },
                )
                rec["ms"] += dur_ps / 1e9
                rec["bytes"] += int(stats.get("bytes_accessed", 0) or 0)
                rec["flops"] += int(stats.get("flops", 0) or 0)
                rec["occurrences"] += 1
    return out


def leaf_totals(stats: Dict[str, dict]) -> Tuple[float, int]:
    """(total_ms, total_bytes) over non-container ops of an op_stats dict."""
    ms = 0.0
    nbytes = 0
    for rec in stats.values():
        if rec["category"] in CONTAINER_CATEGORIES:
            continue
        ms += rec["ms"]
        nbytes += rec["bytes"]
    return ms, nbytes

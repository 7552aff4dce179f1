"""Minimal XSpace/XPlane protobuf wire-format reader.

``jax.profiler.start_trace`` writes ``*.xplane.pb`` (tensorflow.profiler
XSpace) containing DEVICE-side XLA op timings — the host-side
``trace.json.gz`` only carries Python threads over the axon tunnel. No
tensorflow/xprof proto bindings exist in this image, so this decodes the
few fields the roofline tool needs straight from the wire format:

    XSpace.planes[].name                      (field 1 / 2)
    XPlane.lines[].name,events[]              (field 3)
    XPlane.event_metadata[id].name            (field 4 map)
    XLine.events[].metadata_id,duration_ps    (fields 1, 3)

Schema per tensorflow/core/profiler/protobuf/xplane.proto.
"""

from __future__ import annotations

import collections
import struct
from typing import Dict, Iterator, Tuple


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


def op_durations(path: str) -> Dict[str, Dict[str, float]]:
    """Per-line total device op durations (ms) from an xplane.pb.

    Returns {plane_name: {line_name: {op_name: total_ms}}} flattened to
    {f"{plane}/{line}": Counter({op_name: ms})}.
    """
    data = open(path, "rb").read()
    out: Dict[str, collections.Counter] = {}
    for fnum, _, plane_buf in _fields(data):
        if fnum != 1:  # XSpace.planes
            continue
        plane_name = ""
        meta: Dict[int, str] = {}
        lines = []
        for pf, _, pv in _fields(plane_buf):
            if pf == 2:
                plane_name = pv.decode("utf-8", "replace")
            elif pf == 3:
                lines.append(pv)
            elif pf == 4:  # event_metadata map<int64, XEventMetadata>
                mid, mbuf = _map_entry(pv)
                name = ""
                display = ""
                for mf, _, mv in _fields(mbuf):
                    if mf == 2:
                        name = mv.decode("utf-8", "replace")
                    elif mf == 4:
                        display = mv.decode("utf-8", "replace")
                meta[mid] = display or name
        for line_buf in lines:
            line_name = ""
            events = []
            for lf, _, lv in _fields(line_buf):
                if lf == 2:
                    line_name = lv.decode("utf-8", "replace")
                elif lf == 11:
                    line_name = lv.decode("utf-8", "replace") or line_name
                elif lf == 4:
                    events.append(lv)
            ctr = collections.Counter()
            for ev_buf in events:
                mid = 0
                dur_ps = 0
                for ef, _, ev in _fields(ev_buf):
                    if ef == 1:
                        mid = ev
                    elif ef == 3:
                        dur_ps = ev
                ctr[meta.get(mid, f"<{mid}>")] += dur_ps / 1e9  # ps -> ms
            if ctr:
                out[f"{plane_name}/{line_name}"] = ctr
    return out


def _stat_value(buf: bytes):
    mid, val = 0, None
    for fnum, wt, v in _fields(buf):
        if fnum == 1:
            mid = v
        elif fnum == 2:  # double
            val = struct.unpack("<d", struct.pack("<Q", v))[0]
        elif fnum in (3, 4, 7):  # uint64 / int64 / ref
            val = v
        elif fnum in (5, 6):  # str / bytes
            val = v.decode("utf-8", "replace") if fnum == 5 else v
    return mid, val


def op_stats(path: str, line: str = "XLA Ops"):
    """Aggregate per-op stats from the device plane's op-level line.

    Each XEvent is one actual op EXECUTION (a while body's ops appear once
    per iteration), carrying XLA's per-op stats: `bytes_accessed` (HBM
    bytes the op moves per the compiler's accounting, counted per
    occurrence here — so loop iterations accumulate), `flops`, and
    `hlo_category`. Returns {op_name: {"ms", "bytes", "flops",
    "occurrences", "category"}}. Container ops (the `while` wrapping a
    lax.scan/fori_loop) nest their children — exclude categories/names you
    consider containers when summing totals to avoid double counting.
    """
    data = open(path, "rb").read()
    for fnum, _, plane_buf in _fields(data):
        if fnum != 1:
            continue
        plane_name = ""
        ev_meta: Dict[int, str] = {}
        stat_meta: Dict[int, str] = {}
        lines = []
        for pf, _, pv in _fields(plane_buf):
            if pf == 2:
                plane_name = pv.decode("utf-8", "replace")
            elif pf == 3:
                lines.append(pv)
            elif pf == 4:
                mid, mbuf = _map_entry(pv)
                name = display = ""
                for mf, _, mv in _fields(mbuf):
                    if mf == 2:
                        name = mv.decode("utf-8", "replace")
                    elif mf == 4:
                        display = mv.decode("utf-8", "replace")
                ev_meta[mid] = display or name
            elif pf == 5:
                mid, mbuf = _map_entry(pv)
                for mf, _, mv in _fields(mbuf):
                    if mf == 2:
                        stat_meta[mid] = mv.decode("utf-8", "replace")
        if "TPU" not in plane_name or plane_name.startswith("#"):
            continue
        out: Dict[str, dict] = {}
        for line_buf in lines:
            line_name = ""
            events = []
            for lf, _, lv in _fields(line_buf):
                if lf == 2:
                    line_name = lv.decode("utf-8", "replace")
                elif lf == 11:
                    line_name = lv.decode("utf-8", "replace") or line_name
                elif lf == 4:
                    events.append(lv)
            if line_name != line:
                continue
            for ev_buf in events:
                mid = dur_ps = 0
                stats = {}
                for ef, _, ev in _fields(ev_buf):
                    if ef == 1:
                        mid = ev
                    elif ef == 3:
                        dur_ps = ev
                    elif ef == 4:
                        sid, sval = _stat_value(ev)
                        stats[stat_meta.get(sid, sid)] = sval
                name = ev_meta.get(mid, f"<{mid}>")
                rec = out.setdefault(
                    name,
                    {"ms": 0.0, "bytes": 0, "flops": 0, "occurrences": 0,
                     "category": stats.get("hlo_category", "")},
                )
                if stats.get("hlo_category") and not rec["category"]:
                    rec["category"] = stats["hlo_category"]
                rec["ms"] += dur_ps / 1e9
                rec["bytes"] += int(stats.get("bytes_accessed", 0) or 0)
                rec["flops"] += int(stats.get("flops", 0) or 0)
                rec["occurrences"] += 1
        return out
    return {}


if __name__ == "__main__":
    import sys

    path = sys.argv[1]
    for key, ctr in op_durations(path).items():
        total = sum(ctr.values())
        print(f"== {key}: {total:.3f} ms total ==")
        for name, ms in ctr.most_common(12):
            print(f"  {ms:9.3f} ms ({ms / total * 100:4.1f}%)  {name[:90]}")
    stats = op_stats(path)
    if stats:
        leaf = {n: r for n, r in stats.items()
                if not n.startswith("while")}
        tb = sum(r["bytes"] for r in leaf.values())
        tm = sum(r["ms"] for r in leaf.values())
        print(f"\n== leaf op stats: {tb / 1e6:.1f} MB, {tm:.3f} ms ==")
        for n, r in sorted(leaf.items(), key=lambda kv: -kv[1]["bytes"])[:12]:
            print(f"  {r['bytes'] / 1e6:9.1f} MB {r['ms']:9.3f} ms "
                  f"x{r['occurrences']:<4d} [{r['category'][:18]:18s}] {n[:60]}")

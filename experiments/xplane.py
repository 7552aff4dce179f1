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


if __name__ == "__main__":
    import sys

    for key, ctr in op_durations(sys.argv[1]).items():
        total = sum(ctr.values())
        print(f"== {key}: {total:.3f} ms total ==")
        for name, ms in ctr.most_common(12):
            print(f"  {ms:9.3f} ms ({ms / total * 100:4.1f}%)  {name[:90]}")

"""Unit tests for the xplane device-profile reader (utils/xplane.py).

A synthetic XSpace is wire-encoded by hand (the same protobuf encoding
``jax.profiler`` emits) and parsed back: one TPU plane with an "XLA Ops"
line whose events reference metadata carrying bytes_accessed /
hlo_category / source stats, plus a container `while` op that must be
excluded from leaf totals, plus a non-matching host plane.
"""

import struct

from bevy_hanabi_tpu.utils.xplane import (
    CONTAINER_CATEGORIES,
    leaf_totals,
    op_durations,
    op_stats,
)


def _varint(v: int) -> bytes:
    out = b""
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _field(num: int, wt: int, payload) -> bytes:
    tag = _varint(num << 3 | wt)
    if wt == 0:
        return tag + _varint(payload)
    if wt == 2:
        return tag + _varint(len(payload)) + payload
    raise ValueError(wt)


def _stat(meta_id: int, value, kind: str) -> bytes:
    body = _field(1, 0, meta_id)
    if kind == "uint":
        body += _field(3, 0, value)
    elif kind == "str":
        body += _field(5, 2, value.encode())
    elif kind == "double":
        body += _field(2, 0, struct.unpack("<Q", struct.pack("<d", value))[0])
    return body


def _stat_metadata(mid: int, name: str) -> bytes:
    inner = _field(1, 0, mid) + _field(2, 2, name.encode())
    return _field(1, 0, mid) + _field(2, 2, inner)  # map entry {key, value}


def _event_metadata(mid: int, name: str, stats: bytes) -> bytes:
    inner = _field(1, 0, mid) + _field(2, 2, name.encode()) + stats
    return _field(1, 0, mid) + _field(2, 2, inner)


def _event(mid: int, dur_ps: int) -> bytes:
    return _field(1, 0, mid) + _field(3, 0, dur_ps)


# stat-metadata ids
SID_BYTES, SID_CAT, SID_SRC = 7, 8, 9


def _plane(name: str, with_ops: bool) -> bytes:
    plane = _field(2, 2, name.encode())
    if with_ops:
        for sid, sname in (
            (SID_BYTES, "bytes_accessed"),
            (SID_CAT, "hlo_category"),
            (SID_SRC, "source"),
        ):
            plane += _field(5, 2, _stat_metadata(sid, sname))
        # op 1: a sort, 2 executions of 1.5 ms, 8 MB each
        plane += _field(
            4,
            2,
            _event_metadata(
                1,
                "sort.5",
                _field(5, 2, _stat(SID_BYTES, 8_000_000, "uint"))
                + _field(5, 2, _stat(SID_CAT, "sort", "str"))
                + _field(5, 2, _stat(SID_SRC, "render/raster.py:412", "str")),
            ),
        )
        # op 2: the containing while loop (must NOT count in leaf totals)
        plane += _field(
            4,
            2,
            _event_metadata(
                2,
                "while.9",
                _field(5, 2, _stat(SID_BYTES, 999_000_000, "uint"))
                + _field(5, 2, _stat(SID_CAT, "while", "str")),
            ),
        )
        line = _field(2, 2, b"XLA Ops")
        line += _field(4, 2, _event(1, 1_500_000_000))  # 1.5 ms
        line += _field(4, 2, _event(1, 1_500_000_000))
        line += _field(4, 2, _event(2, 4_000_000_000))  # 4 ms container
        plane += _field(3, 2, line)
    return _field(1, 2, plane)


def _write_space(tmp_path):
    space = _plane("/device:TPU:0", True) + _plane("/host:CPU", False)
    p = tmp_path / "vm.xplane.pb"
    p.write_bytes(space)
    return str(p)


def test_op_durations_groups_by_plane_line(tmp_path):
    path = _write_space(tmp_path)
    durs = op_durations(path)
    ops = durs["/device:TPU:0/XLA Ops"]
    assert abs(ops["sort.5"] - 3.0) < 1e-9  # 2 x 1.5 ms
    assert abs(ops["while.9"] - 4.0) < 1e-9


def test_op_stats_accumulates_executions(tmp_path):
    path = _write_space(tmp_path)
    st = op_stats(path)
    s = st["sort.5"]
    assert s["occurrences"] == 2
    assert s["bytes"] == 16_000_000  # per-exec bytes accumulate
    assert s["category"] == "sort"
    assert s["source"].endswith("raster.py:412")
    assert st["while.9"]["category"] in CONTAINER_CATEGORIES


def test_leaf_totals_exclude_containers(tmp_path):
    path = _write_space(tmp_path)
    ms, nbytes = leaf_totals(op_stats(path))
    assert abs(ms - 3.0) < 1e-9  # the 4 ms while is excluded
    assert nbytes == 16_000_000


def test_missing_plane_returns_empty(tmp_path):
    path = _write_space(tmp_path)
    assert op_stats(path, plane="/device:TPU:7") == {}

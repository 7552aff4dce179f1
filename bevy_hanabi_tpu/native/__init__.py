"""Native (C++) host runtime: spawner banks and slab allocation via ctypes.

The reference's host-side runtime (spawner ticking spawn.rs:838-921, slab
sub-allocation effect_cache.rs:482-612) is Rust; this package provides the
same components in C++ with a C ABI, loaded through ctypes. The shared
library is compiled on first use with the local toolchain and cached next to
the source; every entry point has a pure-Python fallback so the framework
works without a compiler.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

__all__ = ["load_native", "native_available", "NativeSpawnerBank", "SlabAllocator"]

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(__file__), "src", "hanabi_native.cpp")
_SO = os.path.join(os.path.dirname(__file__), "libhanabi_native.so")


def _build() -> bool:
    cmd = [
        "g++",
        "-O3",
        "-shared",
        "-fPIC",
        "-std=c++17",
        _SRC,
        "-o",
        _SO,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def load_native() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library, or None on failure."""
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        # signatures
        lib.hanabi_spawner_bank_create.restype = ctypes.c_void_p
        lib.hanabi_spawner_bank_create.argtypes = [
            ctypes.c_int32,
            ctypes.c_float,
            ctypes.c_float,
            ctypes.c_float,
            ctypes.c_float,
            ctypes.c_float,
            ctypes.c_float,
            ctypes.c_uint32,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_uint64,
        ]
        lib.hanabi_spawner_bank_destroy.argtypes = [ctypes.c_void_p]
        lib.hanabi_spawner_bank_reset.argtypes = [ctypes.c_void_p, ctypes.c_int32]
        lib.hanabi_spawner_bank_set_active.argtypes = [
            ctypes.c_void_p,
            ctypes.c_int32,
            ctypes.c_int32,
        ]
        lib.hanabi_spawner_bank_tick.argtypes = [
            ctypes.c_void_p,
            ctypes.c_double,
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.hanabi_slab_create.restype = ctypes.c_void_p
        lib.hanabi_slab_create.argtypes = [ctypes.c_uint32]
        lib.hanabi_slab_destroy.argtypes = [ctypes.c_void_p]
        lib.hanabi_slab_alloc.restype = ctypes.c_uint32
        lib.hanabi_slab_alloc.argtypes = [ctypes.c_void_p, ctypes.c_uint32]
        lib.hanabi_slab_free.restype = ctypes.c_int32
        lib.hanabi_slab_free.argtypes = [
            ctypes.c_void_p,
            ctypes.c_uint32,
            ctypes.c_uint32,
        ]
        for name in (
            "hanabi_slab_used",
            "hanabi_slab_capacity",
            "hanabi_slab_num_free_ranges",
            "hanabi_slab_largest_free",
        ):
            fn = getattr(lib, name)
            fn.restype = ctypes.c_uint32
            fn.argtypes = [ctypes.c_void_p]
        _LIB = lib
        return _LIB


def native_available() -> bool:
    return load_native() is not None


class NativeSpawnerBank:
    """C++ spawner bank: N state machines ticked in one native pass."""

    def __init__(self, settings, num_instances: int, seed: int = 0):
        lib = load_native()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self.n = num_instances
        c_lo, c_hi = settings.count.range()
        d_lo, d_hi = settings.spawn_duration.range()
        p_lo, p_hi = settings.period.range()
        self._handle = lib.hanabi_spawner_bank_create(
            num_instances,
            float(c_lo),
            float(c_hi),
            float(d_lo),
            float(d_hi),
            float(p_lo),
            float(p_hi),
            int(settings.cycle_count),
            1 if settings.starts_active else 0,
            1 if settings.emit_on_start else 0,
            int(seed) & 0xFFFFFFFFFFFFFFFF,
        )
        if not self._handle:
            raise RuntimeError("failed to create native spawner bank")
        self._out = np.zeros(num_instances, np.int32)

    def tick(self, dt: float) -> np.ndarray:
        self._lib.hanabi_spawner_bank_tick(
            self._handle,
            ctypes.c_double(dt),
            self._out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        return self._out.copy()

    def reset(self, index: int = -1) -> None:
        self._lib.hanabi_spawner_bank_reset(self._handle, index)

    def set_active(self, active: bool, index: int = -1) -> None:
        self._lib.hanabi_spawner_bank_set_active(self._handle, index, 1 if active else 0)

    def __del__(self):
        try:
            self._lib.hanabi_spawner_bank_destroy(self._handle)
        except Exception:
            pass


NO_SPACE = 0xFFFFFFFF


class SlabAllocator:
    """Row-range allocator over a shared particle pool (EffectCache analogue).

    Native best-fit free-list with coalescing; pure-Python fallback with the
    same behavior if the toolchain is unavailable.
    """

    def __init__(self, capacity: int):
        self.capacity = int(capacity)
        lib = load_native()
        self._lib = lib
        if lib is not None:
            self._handle = lib.hanabi_slab_create(self.capacity)
        else:
            self._handle = None
            self._free = {0: self.capacity}  # offset -> size
            self._used = 0

    def alloc(self, size: int) -> Optional[int]:
        """Allocate ``size`` rows; returns row offset or None."""
        if self._handle is not None:
            off = self._lib.hanabi_slab_alloc(self._handle, int(size))
            return None if off == NO_SPACE else int(off)
        if size <= 0:
            return None
        best = None
        for off, sz in self._free.items():
            if sz >= size and (best is None or sz < self._free[best]):
                best = off
        if best is None:
            return None
        sz = self._free.pop(best)
        if sz > size:
            self._free[best + size] = sz - size
        self._used += size
        return best

    def free(self, offset: int, size: int) -> None:
        if self._handle is not None:
            rc = self._lib.hanabi_slab_free(self._handle, int(offset), int(size))
            if rc != 0:
                raise ValueError(f"invalid free({offset}, {size}): rc={rc}")
            return
        if offset + size > self.capacity or size <= 0:
            raise ValueError(f"invalid free({offset}, {size})")
        for off, sz in self._free.items():
            if off < offset + size and offset < off + sz:
                raise ValueError(f"double free at {offset}")
        self._free[offset] = size
        # coalesce
        items = sorted(self._free.items())
        merged = []
        for off, sz in items:
            if merged and merged[-1][0] + merged[-1][1] == off:
                merged[-1] = (merged[-1][0], merged[-1][1] + sz)
            else:
                merged.append((off, sz))
        self._free = dict(merged)
        self._used -= size

    @property
    def used(self) -> int:
        if self._handle is not None:
            return int(self._lib.hanabi_slab_used(self._handle))
        return self._used

    @property
    def largest_free(self) -> int:
        if self._handle is not None:
            return int(self._lib.hanabi_slab_largest_free(self._handle))
        return max(self._free.values(), default=0)

    def num_free_ranges(self) -> int:
        if self._handle is not None:
            return int(self._lib.hanabi_slab_num_free_ranges(self._handle))
        return len(self._free)

    def __del__(self):
        if getattr(self, "_handle", None) is not None:
            try:
                self._lib.hanabi_slab_destroy(self._handle)
            except Exception:
                pass

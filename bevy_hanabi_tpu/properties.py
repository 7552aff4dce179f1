"""Runtime-tunable effect properties (reference: src/properties.rs).

Properties are named values, uniform per effect instance, changeable every
frame without recompiling. On TPU they are simply runtime arguments to the
jitted step (a dict of small arrays), so "re-upload on change" is automatic
and free of retraces. :class:`PropertyLayout` keeps the reference's packed
byte layout (size-sorted, properties.rs:521-870) for serialization parity
and the native-bridge C struct.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from .values import Value, ValueType, as_value

__all__ = ["Property", "PropertyLayout", "EffectProperties"]


@dataclass(frozen=True)
class Property:
    """A named property declaration with a typed default (properties.rs:113)."""

    name: str
    default: Value

    @staticmethod
    def new(name: str, default) -> "Property":
        return Property(name, as_value(default))

    @property
    def value_type(self) -> ValueType:
        return self.default.value_type

    @property
    def size(self) -> int:
        return self.default.value_type.size


class PropertyLayout:
    """Packed layout of a property block (properties.rs:521-870).

    The reference sorts properties by decreasing alignment/size then packs
    them back-to-back with alignment padding; offsets here follow the same
    rule so serialized blocks interoperate with the native bridge.
    """

    def __init__(self, properties: Sequence[Property] = ()):
        self._properties = tuple(properties)
        # sort by decreasing alignment, then size, stable on name order
        order = sorted(
            range(len(self._properties)),
            key=lambda i: (
                -self._properties[i].value_type.align,
                -self._properties[i].size,
                i,
            ),
        )
        offset = 0
        fields: List[Tuple[str, int]] = []
        for i in order:
            p = self._properties[i]
            align = p.value_type.align
            offset = (offset + align - 1) // align * align
            fields.append((p.name, offset))
            offset += p.size
        self._fields = dict(fields)
        self._size = (offset + 15) // 16 * 16 if fields else 0

    def is_empty(self) -> bool:
        return not self._properties

    def properties(self) -> Tuple[Property, ...]:
        return self._properties

    def offset(self, name: str) -> Optional[int]:
        return self._fields.get(name)

    def cpu_size(self) -> int:
        return self._size

    min_binding_size = cpu_size

    def pack(self, values: Dict[str, Any]) -> bytes:
        """Pack property values (or defaults) into one byte block."""
        buf = bytearray(self._size)
        for p in self._properties:
            v = values.get(p.name)
            val = as_value(v, p.value_type) if v is not None else p.default
            raw = val.as_bytes()
            off = self._fields[p.name]
            buf[off : off + len(raw)] = raw
        return bytes(buf)

    def __eq__(self, other) -> bool:
        return (
            isinstance(other, PropertyLayout)
            and self._properties == other._properties
        )

    def __hash__(self) -> int:
        return hash(self._properties)


class EffectProperties:
    """Per-instance runtime property values with change detection
    (reference: EffectProperties component, properties.rs:216)."""

    def __init__(self, declared: Sequence[Property] = ()):
        self._declared: Dict[str, Property] = {p.name: p for p in declared}
        self._values: Dict[str, np.ndarray] = {}
        self._dirty = True

    def declare(self, prop: Property) -> None:
        self._declared[prop.name] = prop

    def set(self, name: str, value) -> None:
        if name not in self._declared:
            raise KeyError(f"unknown property {name!r}; declared: {sorted(self._declared)}")
        vt = self._declared[name].value_type
        arr = np.asarray(as_value(value, vt).to_numpy())
        self._values[name] = arr
        self._dirty = True

    def set_if_changed(self, name: str, value) -> None:
        vt = self._declared[name].value_type
        arr = np.asarray(as_value(value, vt).to_numpy())
        cur = self._values.get(name)
        if cur is None or not np.array_equal(cur, arr):
            self._values[name] = arr
            self._dirty = True

    def get(self, name: str):
        if name in self._values:
            return self._values[name]
        if name in self._declared:
            return self._declared[name].default.to_numpy()
        raise KeyError(name)

    def as_dict(self) -> Dict[str, np.ndarray]:
        """Resolved name→value dict (defaults filled in) for the jitted step."""
        out = {}
        for name, p in self._declared.items():
            out[name] = self._values.get(name, p.default.to_numpy())
        return out

    def consume_dirty(self) -> bool:
        d = self._dirty
        self._dirty = False
        return d

import numpy as np
import pytest

from bevy_hanabi_tpu import attributes as A
from bevy_hanabi_tpu.graph import (
    BinaryOp,
    BuiltInOp,
    ExprWriter,
    Module,
    TernaryOp,
    UnaryOp,
)
from bevy_hanabi_tpu.values import FLOAT, INT, UINT, VEC2F, VEC3F, VEC4F, BOOL, VectorType


def test_module_arena_handles_are_one_based():
    m = Module()
    h1 = m.lit(1.0)
    h2 = m.lit(2.0)
    assert h1 == 1 and h2 == 2
    assert m.get(h1).value.value == 1.0
    with pytest.raises(IndexError):
        m.get(0)
    with pytest.raises(IndexError):
        m.get(3)


def test_infer_types_basic():
    m = Module()
    f = m.lit(1.0)
    v = m.lit((1.0, 2.0, 3.0))
    assert m.infer_type(f) == FLOAT
    assert m.infer_type(v) == VEC3F
    assert m.infer_type(m.add(v, f)) == VEC3F
    assert m.infer_type(m.binary(BinaryOp.DOT, v, v)) == FLOAT
    assert m.infer_type(m.binary(BinaryOp.LT, v, v)) == VectorType(BOOL, 3)
    assert m.infer_type(m.unary(UnaryOp.LENGTH, v)) == FLOAT
    assert m.infer_type(m.unary(UnaryOp.X, v)) == FLOAT
    assert m.infer_type(m.cast(f, INT)) == INT
    assert m.infer_type(m.attr(A.POSITION)) == VEC3F
    assert m.infer_type(m.time()) == FLOAT
    assert m.infer_type(m.rand(VEC2F)) == VEC2F
    assert m.infer_type(m.binary(BinaryOp.VEC4_XYZ_W, v, f)) == VEC4F
    assert m.infer_type(m.vec3(f, f, f)) == VEC3F
    assert m.infer_type(m.unary(UnaryOp.PACK4X8UNORM, m.lit((0.0,) * 4))) == UINT


def test_side_effect_tracking():
    m = Module()
    r = m.rand(FLOAT)
    c = m.lit(2.0)
    s = m.add(r, c)
    assert m.has_side_effect(r)
    assert m.has_side_effect(s)
    assert not m.has_side_effect(c)
    u = m.uniform(m.lit(0.0), m.lit(1.0))
    assert m.has_side_effect(u)


def test_is_const():
    m = Module()
    assert m.is_const(m.add(m.lit(1.0), m.lit(2.0)))
    assert not m.is_const(m.attr(A.AGE))
    assert not m.is_const(m.time())


def test_property_declaration_required():
    m = Module()
    with pytest.raises(KeyError):
        m.prop("gravity")
    m.add_property("gravity", (0.0, -9.8, 0.0))
    h = m.prop("gravity")
    assert m.infer_type(h) == VEC3F


def test_writer_operator_overloads():
    w = ExprWriter()
    e = (w.lit(1.0) + w.lit(2.0)) * w.attr(A.AGE)
    m = w.finish()
    node = m.get(e.expr())
    assert node.op is BinaryOp.MUL
    lhs = m.get(node.args[0])
    assert lhs.op is BinaryOp.ADD


def test_writer_scalar_coercion():
    w = ExprWriter()
    e = w.attr(A.AGE) * 2.0 + 1.0
    assert w.module.get(e.expr()).op is BinaryOp.ADD
    e2 = 3.0 * w.attr(A.AGE)  # __rmul__
    n = w.module.get(e2.expr())
    assert n.op is BinaryOp.MUL
    assert w.module.get(n.args[0]).value.value == 3.0


def test_writer_method_chains():
    w = ExprWriter()
    e = w.attr(A.VELOCITY).length().clamp(0.0, 10.0).sqrt()
    node = w.module.get(e.expr())
    assert node.op is UnaryOp.SQRT
    mid = w.module.get(node.args[0])
    assert mid.op is TernaryOp.CLAMP


def test_writer_neg():
    w = ExprWriter()
    e = -w.attr(A.AGE)
    n = w.module.get(e.expr())
    assert n.op is BinaryOp.SUB


def test_module_json_roundtrip():
    m = Module()
    m.add_property("radius", 2.0)
    v = m.lit((1.0, 2.0, 3.0))
    r = m.rand(FLOAT)
    e = m.mix(v, m.attr(A.POSITION), m.prop("radius"))
    cast = m.cast(r, UINT)
    slot = m.add_texture_slot("color_map")
    ts = m.texture_sample(slot, m.lit((0.5, 0.5)))

    data = m.to_json()
    m2 = Module.from_json(data)
    assert len(m2) == len(m)
    assert m2.infer_type(e) == VEC3F
    assert m2.infer_type(cast) == UINT
    assert m2.get(r).builtin is BuiltInOp.RAND
    assert m2.texture_slots() == ["color_map"]
    assert m2.to_json() == data


def test_rand_requires_type():
    m = Module()
    with pytest.raises(ValueError):
        m.builtin(BuiltInOp.RAND)

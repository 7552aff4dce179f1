"""Operator-matrix contract: every expression operator vs a numpy oracle.

The reference unit-tests each operator's WGSL rendering; here each operator's
*numeric semantics* are asserted against numpy over randomized batched
inputs — the full UnaryOp/BinaryOp/TernaryOp surface in one sweep.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from bevy_hanabi_tpu.compiler import EvalContext, SimParams
from bevy_hanabi_tpu.graph import BinaryOp, Module, TernaryOp, UnaryOp
from bevy_hanabi_tpu.values import FLOAT, VEC3F

N = 16
RNG = np.random.default_rng(7)


def ctx_for(module, **particle):
    return EvalContext(module, particle, jnp.arange(N, dtype=jnp.uint32), sim=SimParams())


def scalar_input():
    return RNG.random(N).astype(np.float32) * 1.6 + 0.1  # (0.1, 1.7)


def vec_input():
    return (RNG.random((N, 3)).astype(np.float32) - 0.3) * 2.0


UNARY_ORACLES = {
    UnaryOp.ABS: np.abs,
    UnaryOp.ACOS: lambda x: np.arccos(np.clip(x, -1, 1)),
    UnaryOp.ASIN: lambda x: np.arcsin(np.clip(x, -1, 1)),
    UnaryOp.ATAN: np.arctan,
    UnaryOp.CEIL: np.ceil,
    UnaryOp.COS: np.cos,
    UnaryOp.EXP: np.exp,
    UnaryOp.EXP2: np.exp2,
    UnaryOp.FLOOR: np.floor,
    UnaryOp.FRACT: lambda x: x - np.floor(x),
    UnaryOp.INV_SQRT: lambda x: 1.0 / np.sqrt(x),
    UnaryOp.LOG: np.log,
    UnaryOp.LOG2: np.log2,
    UnaryOp.ROUND: np.round,
    UnaryOp.SATURATE: lambda x: np.clip(x, 0, 1),
    UnaryOp.SIGN: np.sign,
    UnaryOp.SIN: np.sin,
    UnaryOp.SQRT: np.sqrt,
    UnaryOp.TAN: np.tan,
}


@pytest.mark.parametrize("op", sorted(UNARY_ORACLES, key=lambda o: o.value))
def test_unary_scalar_ops(op):
    m = Module()
    x = scalar_input()
    if op in (UnaryOp.ACOS, UnaryOp.ASIN):
        x = np.clip(x, 0.1, 0.95)
    h = m.unary(op, m.attr("f32_0"))
    out = np.asarray(ctx_for(m, f32_0=jnp.asarray(x)).eval(h))
    np.testing.assert_allclose(out, UNARY_ORACLES[op](x), rtol=2e-5, atol=2e-6)


def test_unary_vector_ops():
    m = Module()
    v = vec_input()
    ctx = ctx_for(m, f32x3_0=jnp.asarray(v))
    a = m.attr("f32x3_0")
    np.testing.assert_allclose(
        np.asarray(ctx.eval(m.unary(UnaryOp.LENGTH, a))),
        np.linalg.norm(v, axis=-1),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(ctx.eval(m.unary(UnaryOp.NORMALIZE, a))),
        v / np.linalg.norm(v, axis=-1, keepdims=True),
        rtol=1e-5,
    )
    for comp, i in ((UnaryOp.X, 0), (UnaryOp.Y, 1), (UnaryOp.Z, 2)):
        np.testing.assert_array_equal(
            np.asarray(ctx.eval(m.unary(comp, a))), v[:, i]
        )


BINARY_ORACLES = {
    BinaryOp.ADD: np.add,
    BinaryOp.SUB: np.subtract,
    BinaryOp.MUL: np.multiply,
    BinaryOp.DIV: np.divide,
    BinaryOp.MIN: np.minimum,
    BinaryOp.MAX: np.maximum,
    BinaryOp.ATAN2: np.arctan2,
    BinaryOp.REM: np.fmod,
    BinaryOp.LT: np.less,
    BinaryOp.LE: np.less_equal,
    BinaryOp.GT: np.greater,
    BinaryOp.GE: np.greater_equal,
    BinaryOp.STEP: lambda e, x: np.where(x < e, 0.0, 1.0),
}


@pytest.mark.parametrize("op", sorted(BINARY_ORACLES, key=lambda o: o.value))
def test_binary_scalar_ops(op):
    m = Module()
    a = scalar_input()
    b = scalar_input()
    h = m.binary(op, m.attr("f32_0"), m.attr("f32_1"))
    out = np.asarray(
        ctx_for(m, f32_0=jnp.asarray(a), f32_1=jnp.asarray(b)).eval(h)
    )
    np.testing.assert_allclose(
        out.astype(np.float32), BINARY_ORACLES[op](a, b).astype(np.float32),
        rtol=2e-5, atol=1e-6,
    )


def test_binary_vector_ops():
    m = Module()
    a = vec_input()
    b = vec_input()
    ctx = ctx_for(m, f32x3_0=jnp.asarray(a), f32x3_1=jnp.asarray(b))
    ha, hb = m.attr("f32x3_0"), m.attr("f32x3_1")
    np.testing.assert_allclose(
        np.asarray(ctx.eval(m.binary(BinaryOp.DOT, ha, hb))),
        np.sum(a * b, axis=-1), rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(ctx.eval(m.binary(BinaryOp.CROSS, ha, hb))),
        np.cross(a, b), rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(ctx.eval(m.binary(BinaryOp.DISTANCE, ha, hb))),
        np.linalg.norm(a - b, axis=-1), rtol=1e-5,
    )


def test_ternary_ops():
    m = Module()
    a = scalar_input()
    b = scalar_input()
    t = np.clip(scalar_input(), 0, 1)
    ctx = ctx_for(
        m,
        f32_0=jnp.asarray(a),
        f32_1=jnp.asarray(b),
        f32_2=jnp.asarray(t),
    )
    ha, hb, ht = m.attr("f32_0"), m.attr("f32_1"), m.attr("f32_2")
    np.testing.assert_allclose(
        np.asarray(ctx.eval(m.ternary(TernaryOp.MIX, ha, hb, ht))),
        a + (b - a) * t, rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(ctx.eval(m.ternary(TernaryOp.CLAMP, ht, ha, hb))),
        np.clip(t, a, b), rtol=1e-5,
    )
    lo = np.minimum(a, b)
    hi = np.maximum(a, b) + 0.1
    m2 = Module()
    ctx2 = ctx_for(
        m2, f32_0=jnp.asarray(lo), f32_1=jnp.asarray(hi), f32_2=jnp.asarray(t)
    )
    s = np.clip((t - lo) / (hi - lo), 0, 1)
    np.testing.assert_allclose(
        np.asarray(
            ctx2.eval(
                m2.ternary(
                    TernaryOp.SMOOTHSTEP,
                    m2.attr("f32_0"),
                    m2.attr("f32_1"),
                    m2.attr("f32_2"),
                )
            )
        ),
        s * s * (3 - 2 * s),
        rtol=1e-5, atol=1e-6,
    )


def test_camera_2d_helper():
    from bevy_hanabi_tpu.render import camera_2d

    cam = camera_2d((128, 64), scale=2.0)
    assert cam.viewport == (128, 64)
    # a point at world (0, 2, 0) (top of view) projects to y ~= 0 px
    import jax.numpy as jnp
    from bevy_hanabi_tpu.render.raster import _project

    xy, dist, _ = _project(cam, jnp.asarray([[0.0, 2.0, 0.0], [4.0, 0.0, 0.0]]))
    xy = np.asarray(xy)
    assert abs(xy[0, 1] - 0.0) < 1e-4  # top edge
    assert abs(xy[1, 0] - 128.0) < 1e-4  # right edge (aspect 2 => ±4 world)

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bevy_hanabi_tpu import attributes as A
from bevy_hanabi_tpu.compiler import EvalContext, SimParams, UpdateContext
from bevy_hanabi_tpu.graph import BinaryOp, BuiltInOp, ExprWriter, Module, UnaryOp
from bevy_hanabi_tpu.ops import rng
from bevy_hanabi_tpu.values import FLOAT, INT, UINT, VEC3F


N = 8


def make_ctx(module, **kw):
    particle = {
        "position": jnp.zeros((N, 3), jnp.float32),
        "velocity": jnp.ones((N, 3), jnp.float32) * 2.0,
        "age": jnp.arange(N, dtype=jnp.float32),
        "lifetime": jnp.full((N,), 4.0, jnp.float32),
    }
    particle.update(kw.pop("particle", {}))
    seed = kw.pop("seed", jnp.arange(N, dtype=jnp.uint32))
    return EvalContext(module, particle, seed, **kw)


def test_literal_and_attr_arithmetic():
    w = ExprWriter()
    e = w.attr(A.AGE) * 2.0 + 1.0
    ctx = make_ctx(w.module)
    out = ctx.eval(e.expr())
    np.testing.assert_allclose(np.asarray(out), np.arange(N) * 2.0 + 1.0)


def test_scalar_vector_broadcast():
    w = ExprWriter()
    e = w.attr(A.VELOCITY) * w.attr(A.AGE)  # [N,3] * [N]
    ctx = make_ctx(w.module)
    out = np.asarray(ctx.eval(e.expr()))
    assert out.shape == (N, 3)
    np.testing.assert_allclose(out[:, 0], 2.0 * np.arange(N))


def test_vector_ops():
    w = ExprWriter()
    v = w.lit((3.0, 4.0, 0.0))
    ctx = make_ctx(w.module)
    assert float(ctx.eval(v.length().expr())) == 5.0
    n = np.asarray(ctx.eval(v.normalized().expr()))
    np.testing.assert_allclose(n, [0.6, 0.8, 0.0])
    d = ctx.eval(v.dot(v).expr())
    assert float(d) == 25.0
    c = np.asarray(ctx.eval(w.lit((1.0, 0.0, 0.0)).cross(w.lit((0.0, 1.0, 0.0))).expr()))
    np.testing.assert_allclose(c, [0, 0, 1])
    dist = ctx.eval(v.distance(w.lit((3.0, 0.0, 0.0))).expr())
    assert float(dist) == 4.0


def test_uniform_rand_scalar_lo_vector_hi():
    """uniform(scalar, vecN) must draw N lanes (the lane count comes from
    the vector operand, not the left operand's type)."""
    w = ExprWriter()
    e = w.lit(0.0).uniform(w.lit((1.0, 2.0, 3.0)))
    ctx = make_ctx(w.module)
    out = np.asarray(ctx.eval(e.expr()))
    assert out.shape == (N, 3)
    assert (out >= 0.0).all()
    assert (out <= np.array([1.0, 2.0, 3.0])).all()
    # lanes draw independently: components differ within a particle
    assert not np.allclose(out[:, 0] / 1.0, out[:, 2] / 3.0)


def test_vec4_xyz_w_unbatched_vec_per_particle_w():
    """vec4_xyz_w(lit vec3, per-particle scalar) batches the xyz."""
    w = ExprWriter()
    e = w.lit((0.5, 0.25, 0.125)).vec4_xyz_w(w.attr(A.AGE))
    ctx = make_ctx(w.module)
    out = np.asarray(ctx.eval(e.expr()))
    assert out.shape == (N, 4)
    np.testing.assert_allclose(out[:, :3], [[0.5, 0.25, 0.125]] * N)
    np.testing.assert_allclose(out[:, 3], np.arange(N, dtype=np.float32))


def test_component_extraction_and_vec_ctors():
    w = ExprWriter()
    v = w.lit((1.0, 2.0, 3.0))
    ctx = make_ctx(w.module)
    assert float(ctx.eval(v.y().expr())) == 2.0
    v4 = ctx.eval(v.vec4_xyz_w(w.lit(9.0)).expr())
    np.testing.assert_allclose(np.asarray(v4), [1, 2, 3, 9])
    v2 = ctx.eval(w.lit(5.0).vec2(w.lit(6.0)).expr())
    np.testing.assert_allclose(np.asarray(v2), [5, 6])
    v3 = ctx.eval(w.lit(1.0).vec3(2.0, 3.0).expr())
    np.testing.assert_allclose(np.asarray(v3), [1, 2, 3])


def test_mix_clamp_smoothstep_step():
    w = ExprWriter()
    ctx = make_ctx(w.module)
    m = ctx.eval(w.lit(0.0).mix(w.lit(10.0), w.lit(0.25)).expr())
    assert float(m) == 2.5
    c = ctx.eval(w.lit(5.0).clamp(0.0, 2.0).expr())
    assert float(c) == 2.0
    s = ctx.eval(w.lit(0.0).smoothstep(1.0, w.lit(0.5)).expr())
    assert float(s) == 0.5
    st = ctx.eval(w.lit(3.0).step(w.lit(2.0)).expr())  # step(edge=3, x=2) -> 0
    assert float(st) == 0.0


def test_mix_vector_with_scalar_t():
    w = ExprWriter()
    e = w.lit((0.0, 0.0, 0.0)).mix(w.lit((2.0, 4.0, 6.0)), w.attr(A.AGE))
    ctx = make_ctx(w.module, particle={"age": jnp.full((N,), 0.5, jnp.float32)})
    out = np.asarray(ctx.eval(e.expr()))
    assert out.shape == (N, 3)
    np.testing.assert_allclose(out[0], [1, 2, 3])


def test_builtins_time():
    w = ExprWriter()
    ctx = make_ctx(w.module)
    ctx.sim = SimParams(time=12.0, delta_time=0.5)
    assert float(ctx.eval(w.time().expr())) == 12.0
    assert float(ctx.eval(w.delta_time().expr())) == 0.5


def test_rand_is_deterministic_and_memoized_per_handle():
    """A rand handle draws ONCE per context and reuse sees the same value
    — the reference stores side-effecting exprs in a local shader var and
    refuses to re-evaluate on cache hit (modifier/mod.rs:309-313).
    Independent draws need distinct handles."""
    w = ExprWriter()
    r = w.rand(FLOAT)
    seeds = jnp.arange(N, dtype=jnp.uint32)
    ctx = make_ctx(w.module, seed=seeds)
    v1 = np.asarray(ctx.eval(r.expr()))
    # identical to calling the rng directly
    _, want = rng.frand(np.arange(N, dtype=np.uint32))
    np.testing.assert_array_equal(v1, np.asarray(want))
    # SAME handle re-used: same value, no duplicate side-effect
    v2 = np.asarray(ctx.eval(r.expr()))
    np.testing.assert_array_equal(v1, v2)
    # a DISTINCT rand handle draws independently (seed advanced)
    v3 = np.asarray(ctx.eval(w.rand(FLOAT).expr()))
    assert not np.array_equal(v1, v3)


def test_distinct_rand_handles_draw_independently():
    w = ExprWriter()
    r = w.rand(FLOAT) + w.rand(FLOAT)
    ctx = make_ctx(w.module)
    out = np.asarray(ctx.eval(r.expr()))
    assert out.shape == (N,)
    # the two handles drew different values: the sum is not 2x either draw
    single = np.asarray(make_ctx(w.module).eval(w.rand(FLOAT).expr()))
    assert not np.allclose(out, 2.0 * single)


def test_uniform_rand_vec3_bounds():
    w = ExprWriter()
    e = w.lit((-1.0, 0.0, 1.0)).uniform(w.lit((0.0, 1.0, 2.0)))
    ctx = make_ctx(w.module)
    out = np.asarray(ctx.eval(e.expr()))
    assert out.shape == (N, 3)
    assert (out[:, 0] >= -1).all() and (out[:, 0] < 0).all()
    assert (out[:, 2] >= 1).all() and (out[:, 2] < 2).all()


def test_pack_unpack_roundtrip():
    w = ExprWriter()
    v = w.lit((0.0, 0.25, 0.5, 1.0))
    packed = v.pack4x8unorm()
    unpacked = packed.unpack4x8unorm()
    ctx = make_ctx(w.module)
    p = ctx.eval(packed.expr())
    assert p.dtype == jnp.uint32
    u = np.asarray(ctx.eval(unpacked.expr()))
    np.testing.assert_allclose(u, [0.0, 0.25, 0.5, 1.0], atol=1 / 255)


def test_cast():
    w = ExprWriter()
    ctx = make_ctx(w.module)
    i = ctx.eval(w.lit(2.9).cast(INT).expr())
    assert int(i) == 2 and i.dtype == jnp.int32
    f = ctx.eval(w.lit(3).cast(FLOAT).expr())
    assert float(f) == 3.0


def test_property_access_with_default_and_override():
    w = ExprWriter()
    w.add_property("accel", (0.0, -9.8, 0.0))
    e = w.prop("accel") * w.lit(2.0)
    ctx = make_ctx(w.module)
    out = np.asarray(ctx.eval(e.expr()))
    np.testing.assert_allclose(out, [0, -19.6, 0])
    ctx2 = make_ctx(w.module, properties={"accel": np.array([1.0, 2.0, 3.0], np.float32)})
    out2 = np.asarray(ctx2.eval(e.expr()))
    np.testing.assert_allclose(out2, [2, 4, 6])


def test_parent_attr():
    w = ExprWriter()
    e = w.parent_attr(A.POSITION)
    parent = {"position": jnp.ones((N, 3), jnp.float32) * 7.0}
    ctx = make_ctx(w.module, parent_particle=parent)
    np.testing.assert_allclose(np.asarray(ctx.eval(e.expr()))[0], [7, 7, 7])
    ctx2 = make_ctx(w.module)
    with pytest.raises(ValueError):
        ctx2.eval(e.expr())


def test_is_alive_builtin_requires_update_ctx():
    w = ExprWriter()
    e = w.builtin(BuiltInOp.IS_ALIVE)
    ctx = make_ctx(w.module)
    with pytest.raises(ValueError):
        ctx.eval(e.expr())
    ctx2 = make_ctx(w.module, alive=jnp.ones((N,), jnp.bool_))
    assert np.asarray(ctx2.eval(e.expr())).all()


def test_kill_invalidates_memoized_is_alive():
    """A modifier reading is_alive after an earlier kill() must observe the
    post-kill mask, not a memoized pre-kill read (ADVICE r1)."""
    w = ExprWriter()
    e = w.builtin(BuiltInOp.IS_ALIVE).expr()
    particle = {
        "position": jnp.zeros((N, 3), jnp.float32),
        "velocity": jnp.zeros((N, 3), jnp.float32),
        "age": jnp.zeros(N, jnp.float32),
        "lifetime": jnp.ones(N, jnp.float32),
    }
    ctx = UpdateContext(
        w.module,
        particle,
        jnp.arange(N, dtype=jnp.uint32),
        alive=jnp.ones(N, jnp.bool_),
        sim=SimParams(),
    )
    before = np.asarray(ctx.eval(e))
    assert before.all()
    kill_mask = jnp.arange(N) < 3
    ctx.kill(kill_mask)
    after = np.asarray(ctx.eval(e))
    np.testing.assert_array_equal(after, ~np.asarray(kill_mask))


def test_texture_sample_bilinear():
    w = ExprWriter()
    slot = w.module.add_texture_slot("tex")
    uv = w.lit((0.25, 0.25))
    e = w.module.texture_sample(slot, uv.expr())
    tex = jnp.zeros((2, 2, 4), jnp.float32).at[0, 0].set(jnp.ones(4))
    ctx = make_ctx(w.module, textures=[tex])
    out = np.asarray(ctx.eval(e))
    np.testing.assert_allclose(out, [1, 1, 1, 1], atol=1e-6)


def test_eval_under_jit():
    w = ExprWriter()
    e = (w.attr(A.VELOCITY) * w.delta_time() + w.attr(A.POSITION)).expr()

    def f(pos, vel, dt):
        ctx = EvalContext(
            w.module,
            {"position": pos, "velocity": vel},
            jnp.zeros(pos.shape[0], jnp.uint32),
            sim=SimParams(delta_time=dt),
        )
        return ctx.eval(e)

    jf = jax.jit(f)
    pos = jnp.zeros((N, 3))
    vel = jnp.ones((N, 3))
    out = jf(pos, vel, 0.25)
    np.testing.assert_allclose(np.asarray(out), 0.25)
    # no retrace for new dt
    out2 = jf(pos, vel, 0.5)
    np.testing.assert_allclose(np.asarray(out2), 0.5)


def test_wgsl_fmod_semantics():
    w = ExprWriter()
    e = w.lit(-3.5) % w.lit(2.0)
    ctx = make_ctx(w.module)
    assert float(ctx.eval(e.expr())) == pytest.approx(-1.5)

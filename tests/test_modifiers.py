import jax.numpy as jnp
import numpy as np
import pytest

from bevy_hanabi_tpu import attributes as A
from bevy_hanabi_tpu.compiler import (
    InitContext,
    RenderContext,
    SimParams,
    UpdateContext,
)
from bevy_hanabi_tpu.gradient import Gradient
from bevy_hanabi_tpu.graph import Module
from bevy_hanabi_tpu.modifiers import (
    AccelModifier,
    ColorBlendMask,
    ColorBlendMode,
    ColorOverLifetimeModifier,
    ConformToSphereModifier,
    EmitSpawnEventModifier,
    EventEmitCondition,
    InheritAttributeModifier,
    KillAabbModifier,
    KillSphereModifier,
    LinearDragModifier,
    OrientMode,
    OrientModifier,
    RadialAccelModifier,
    SetAttributeModifier,
    SetPositionCircleModifier,
    SetPositionCone3dModifier,
    SetPositionSphereModifier,
    SetVelocityCircleModifier,
    SetVelocitySphereModifier,
    SetVelocityTangentModifier,
    ShapeDimension,
    SizeOverLifetimeModifier,
    TangentAccelModifier,
    modifier_from_json,
)

N = 64
DT = 0.25


def particle(n=N, **over):
    p = {
        "position": jnp.zeros((n, 3), jnp.float32),
        "velocity": jnp.zeros((n, 3), jnp.float32),
        "age": jnp.zeros((n,), jnp.float32),
        "lifetime": jnp.ones((n,), jnp.float32),
    }
    p.update(over)
    return p


def update_ctx(m, p=None, **kw):
    p = p if p is not None else particle()
    n = next(iter(p.values())).shape[0]
    kw.setdefault("alive", jnp.ones((n,), jnp.bool_))
    return UpdateContext(m, p, jnp.arange(n, dtype=jnp.uint32), sim=SimParams(delta_time=DT), **kw)


def init_ctx(m, p=None, **kw):
    p = p if p is not None else particle()
    n = next(iter(p.values())).shape[0]
    return InitContext(m, p, jnp.arange(n, dtype=jnp.uint32), sim=SimParams(delta_time=DT), **kw)


def test_accel():
    m = Module()
    mod = AccelModifier(m.lit((0.0, -10.0, 0.0)))
    ctx = update_ctx(m)
    mod.apply(m, ctx)
    np.testing.assert_allclose(np.asarray(ctx.particle["velocity"])[0], [0, -2.5, 0])


def test_radial_accel():
    m = Module()
    p = particle(position=jnp.tile(jnp.asarray([[2.0, 0.0, 0.0]]), (N, 1)))
    mod = RadialAccelModifier(m.lit((0.0, 0.0, 0.0)), m.lit(8.0))
    ctx = update_ctx(m, p)
    mod.apply(m, ctx)
    np.testing.assert_allclose(np.asarray(ctx.particle["velocity"])[0], [2.0, 0, 0])


def test_tangent_accel():
    m = Module()
    p = particle(position=jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]]), (N, 1)))
    mod = TangentAccelModifier(m.lit((0.0, 0.0, 0.0)), m.lit((0.0, 0.0, 1.0)), m.lit(4.0))
    ctx = update_ctx(m, p)
    mod.apply(m, ctx)
    # tangent of +x around +z is +y
    np.testing.assert_allclose(
        np.asarray(ctx.particle["velocity"])[0], [0, 1.0, 0], atol=1e-6
    )


def test_linear_drag():
    m = Module()
    p = particle(velocity=jnp.ones((N, 3), jnp.float32) * 4.0)
    mod = LinearDragModifier(m.lit(2.0))
    ctx = update_ctx(m, p)
    mod.apply(m, ctx)
    np.testing.assert_allclose(np.asarray(ctx.particle["velocity"])[0], [2, 2, 2])
    # huge drag clamps at zero, never negative
    mod2 = LinearDragModifier(m.lit(100.0))
    ctx2 = update_ctx(m, particle(velocity=jnp.ones((N, 3), jnp.float32)))
    mod2.apply(m, ctx2)
    np.testing.assert_allclose(np.asarray(ctx2.particle["velocity"])[0], [0, 0, 0])


def test_conform_to_sphere_pulls_in():
    m = Module()
    # particle at distance 5 from origin, sphere r=1, influence 100
    p = particle(position=jnp.tile(jnp.asarray([[5.0, 0.0, 0.0]]), (N, 1)))
    mod = ConformToSphereModifier(
        m.lit((0.0, 0.0, 0.0)), m.lit(1.0), m.lit(100.0), m.lit(10.0), m.lit(3.0)
    )
    ctx = update_ctx(m, p)
    mod.apply(m, ctx)
    v = np.asarray(ctx.particle["velocity"])[0]
    assert v[0] < 0  # accelerating toward origin
    # outside influence: unaffected
    p2 = particle(position=jnp.tile(jnp.asarray([[500.0, 0.0, 0.0]]), (N, 1)))
    mod2 = ConformToSphereModifier(
        m.lit((0.0, 0.0, 0.0)), m.lit(1.0), m.lit(10.0), m.lit(10.0), m.lit(3.0)
    )
    ctx2 = update_ctx(m, p2)
    mod2.apply(m, ctx2)
    np.testing.assert_allclose(np.asarray(ctx2.particle["velocity"])[0], [0, 0, 0])


def test_kill_sphere():
    m = Module()
    pos = np.zeros((N, 3), np.float32)
    pos[0] = [0.1, 0, 0]  # inside r=1
    pos[1] = [5, 0, 0]  # outside
    p = particle(position=jnp.asarray(pos))
    mod = KillSphereModifier(m.lit((0.0, 0.0, 0.0)), m.lit(1.0))  # sqr_radius=1
    ctx = update_ctx(m, p)
    mod.apply(m, ctx)
    alive = np.asarray(ctx.alive)
    assert not alive[0] and alive[1]
    # kill_inside=False kills the far one
    ctx2 = update_ctx(m, p)
    mod.with_kill_inside(False).apply(m, ctx2)
    alive2 = np.asarray(ctx2.alive)
    assert alive2[0] and not alive2[1]


def test_kill_aabb():
    m = Module()
    pos = np.full((N, 3), 10.0, np.float32)
    pos[0] = [0, 0, 0]
    p = particle(position=jnp.asarray(pos))
    mod = KillAabbModifier(m.lit((0.0, 0.0, 0.0)), m.lit((1.0, 1.0, 1.0)))
    ctx = update_ctx(m, p)
    mod.apply(m, ctx)
    alive = np.asarray(ctx.alive)
    assert not alive[0] and alive[1]


def test_set_attribute_init_and_serde():
    m = Module()
    mod = SetAttributeModifier(A.LIFETIME, m.lit(9.0))
    ctx = init_ctx(m)
    mod.apply(m, ctx)
    np.testing.assert_allclose(np.asarray(ctx.particle["lifetime"]), 9.0)
    m2 = modifier_from_json(mod.to_json())
    assert isinstance(m2, SetAttributeModifier)
    assert m2.attribute == "lifetime" and m2.value == mod.value


def test_inherit_attribute():
    m = Module()
    parent = {"position": jnp.ones((N, 3), jnp.float32) * 3.0}
    mod = InheritAttributeModifier(A.POSITION)
    ctx = init_ctx(m, parent_particle=parent)
    mod.apply(m, ctx)
    np.testing.assert_allclose(np.asarray(ctx.particle["position"])[0], [3, 3, 3])


def test_position_sphere_surface():
    m = Module()
    mod = SetPositionSphereModifier(
        m.lit((1.0, 2.0, 3.0)), m.lit(2.0), ShapeDimension.SURFACE
    )
    ctx = init_ctx(m)
    mod.apply(m, ctx)
    pos = np.asarray(ctx.particle["position"])
    d = np.linalg.norm(pos - np.array([1, 2, 3]), axis=-1)
    np.testing.assert_allclose(d, 2.0, rtol=1e-5)
    # different lanes get different positions
    assert np.std(pos[:, 0]) > 0.1


def test_position_sphere_volume():
    m = Module()
    mod = SetPositionSphereModifier(m.lit((0.0, 0.0, 0.0)), m.lit(1.0), ShapeDimension.VOLUME)
    ctx = init_ctx(m, particle(4096))
    mod.apply(m, ctx)
    pos = np.asarray(ctx.particle["position"])
    d = np.linalg.norm(pos, axis=-1)
    assert (d <= 1.0 + 1e-5).all()
    # cube-root law => mean radius 0.75
    assert abs(d.mean() - 0.75) < 0.02


def test_position_circle():
    m = Module()
    mod = SetPositionCircleModifier(
        m.lit((0.0, 0.0, 0.0)), m.lit((0.0, 1.0, 0.0)), m.lit(3.0), ShapeDimension.SURFACE
    )
    ctx = init_ctx(m)
    mod.apply(m, ctx)
    pos = np.asarray(ctx.particle["position"])
    np.testing.assert_allclose(pos[:, 1], 0.0, atol=1e-5)  # in plane
    np.testing.assert_allclose(np.linalg.norm(pos, axis=-1), 3.0, rtol=1e-5)


def test_position_cone():
    m = Module()
    mod = SetPositionCone3dModifier(m.lit(2.0), m.lit(1.0), m.lit(0.5), ShapeDimension.VOLUME)
    ctx = init_ctx(m, particle(2048))
    mod.apply(m, ctx)
    pos = np.asarray(ctx.particle["position"])
    assert (pos[:, 1] >= 0).all() and (pos[:, 1] <= 2.0 + 1e-5).all()
    r = np.linalg.norm(pos[:, [0, 2]], axis=-1)
    r_max = 1.0 + (0.5 - 1.0) * (pos[:, 1] / 2.0)
    assert (r <= r_max + 1e-4).all()


def test_velocity_sphere():
    m = Module()
    p = particle(position=jnp.tile(jnp.asarray([[0.0, 3.0, 0.0]]), (N, 1)))
    mod = SetVelocitySphereModifier(m.lit((0.0, 0.0, 0.0)), m.lit(6.0))
    ctx = init_ctx(m, p)
    mod.apply(m, ctx)
    np.testing.assert_allclose(
        np.asarray(ctx.particle["velocity"])[0], [0, 6, 0], atol=1e-5
    )


def test_velocity_sphere_degenerate_center_is_finite():
    """position == center has zero radial length; safe normalize must yield
    zero velocity, not NaN (WGSL normalize(0) is undefined — we pick zero)."""
    m = Module()
    p = particle(position=jnp.tile(jnp.asarray([[1.0, 2.0, 3.0]]), (N, 1)))
    mod = SetVelocitySphereModifier(m.lit((1.0, 2.0, 3.0)), m.lit(6.0))
    ctx = init_ctx(m, p)
    mod.apply(m, ctx)
    vel = np.asarray(ctx.particle["velocity"])
    assert np.isfinite(vel).all()
    np.testing.assert_allclose(vel[0], [0, 0, 0], atol=1e-5)


def test_velocity_circle():
    m = Module()
    p = particle(position=jnp.tile(jnp.asarray([[2.0, 5.0, 0.0]]), (N, 1)))
    mod = SetVelocityCircleModifier(
        m.lit((0.0, 0.0, 0.0)), m.lit((0.0, 1.0, 0.0)), m.lit(4.0)
    )
    ctx = init_ctx(m, p)
    mod.apply(m, ctx)
    # radial component in the plane orthogonal to Y
    np.testing.assert_allclose(
        np.asarray(ctx.particle["velocity"])[0], [4, 0, 0], atol=1e-5
    )


def test_velocity_tangent():
    m = Module()
    p = particle(position=jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]]), (N, 1)))
    mod = SetVelocityTangentModifier(
        m.lit((0.0, 0.0, 0.0)), m.lit((0.0, 0.0, 1.0)), m.lit(2.0)
    )
    ctx = init_ctx(m, p)
    mod.apply(m, ctx)
    np.testing.assert_allclose(
        np.asarray(ctx.particle["velocity"])[0], [0, 2, 0], atol=1e-5
    )


def test_emit_spawn_events():
    m = Module()
    mod = EmitSpawnEventModifier(EventEmitCondition.ON_DIE, m.lit(3, None), 0)
    ctx = update_ctx(m)
    # kill half the particles first
    ctx.kill(jnp.arange(N) < N // 2)
    mod.apply(m, ctx)
    assert len(ctx.events_out) == 1
    channel, mask, count = ctx.events_out[0]
    assert channel == 0
    assert np.asarray(mask).sum() == N // 2
    assert (np.asarray(count) == 3).all()


def test_emit_spawn_events_always():
    m = Module()
    mod = EmitSpawnEventModifier(EventEmitCondition.ALWAYS, m.lit(1, None), 2)
    ctx = update_ctx(m)
    mod.apply(m, ctx)
    channel, mask, _ = ctx.events_out[0]
    assert channel == 2
    assert np.asarray(mask).all()


# ---- render modifiers -----------------------------------------------------


class FakeCamera:
    def __init__(self):
        self.rotation = jnp.eye(3)
        self.position = jnp.asarray([0.0, 0.0, 10.0])
        self.up = jnp.asarray([0.0, 1.0, 0.0])


def render_ctx(m, p=None, **kw):
    p = p if p is not None else particle()
    n = next(iter(p.values())).shape[0]
    ctx = RenderContext(
        m, p, jnp.arange(n, dtype=jnp.uint32), sim=SimParams(), camera=FakeCamera(), **kw
    )
    ctx.color = jnp.ones((n, 4), jnp.float32)
    ctx.size = jnp.ones((n, 3), jnp.float32)
    return ctx


def test_color_over_lifetime():
    m = Module()
    g = Gradient.linear((0.0, 0.0, 0.0, 0.0), (1.0, 1.0, 1.0, 1.0))
    mod = ColorOverLifetimeModifier(g)
    p = particle(age=jnp.full((N,), 0.5, jnp.float32))
    ctx = render_ctx(m, p)
    mod.apply_render(m, ctx)
    np.testing.assert_allclose(np.asarray(ctx.color)[0], [0.5] * 4)


def test_color_blend_add_masked():
    m = Module()
    g = Gradient.constant((0.5, 0.5, 0.5, 0.5))
    mod = ColorOverLifetimeModifier(g, ColorBlendMode.ADD, ColorBlendMask.RGB)
    ctx = render_ctx(m)
    mod.apply_render(m, ctx)
    np.testing.assert_allclose(np.asarray(ctx.color)[0], [1.5, 1.5, 1.5, 1.0])


def test_size_over_lifetime():
    m = Module()
    g = Gradient.linear((2.0,), (0.0,))
    mod = SizeOverLifetimeModifier(g)
    p = particle(age=jnp.full((N,), 0.25, jnp.float32))
    ctx = render_ctx(m, p)
    mod.apply_render(m, ctx)
    np.testing.assert_allclose(np.asarray(ctx.size)[0], [1.5] * 3)


def test_orient_parallel_camera():
    m = Module()
    mod = OrientModifier(OrientMode.PARALLEL_CAMERA_DEPTH_PLANE)
    ctx = render_ctx(m)
    mod.apply_render(m, ctx)
    np.testing.assert_allclose(np.asarray(ctx.axis_x)[0], [1, 0, 0])
    np.testing.assert_allclose(np.asarray(ctx.axis_y)[0], [0, 1, 0])


def test_orient_face_camera():
    m = Module()
    mod = OrientModifier(OrientMode.FACE_CAMERA_POSITION)
    ctx = render_ctx(m)
    mod.apply_render(m, ctx)
    np.testing.assert_allclose(np.asarray(ctx.axis_z)[0], [0, 0, 1], atol=1e-6)


def test_orient_along_velocity():
    m = Module()
    p = particle(velocity=jnp.tile(jnp.asarray([[0.0, 5.0, 0.0]]), (N, 1)))
    mod = OrientModifier(OrientMode.ALONG_VELOCITY)
    ctx = render_ctx(m, p)
    mod.apply_render(m, ctx)
    np.testing.assert_allclose(np.asarray(ctx.axis_x)[0], [0, 1, 0], atol=1e-6)


def test_modifier_serde_roundtrip_all():
    m = Module()
    g = Gradient.linear((0.0,) * 4, (1.0,) * 4)
    mods = [
        AccelModifier(m.lit((0.0, -9.8, 0.0))),
        KillAabbModifier(m.lit((0.0, 0.0, 0.0)), m.lit((1.0, 1.0, 1.0)), False),
        SetPositionSphereModifier(m.lit((0.0, 0.0, 0.0)), m.lit(1.0), ShapeDimension.VOLUME),
        ColorOverLifetimeModifier(g, ColorBlendMode.MODULATE, ColorBlendMask.RGBA),
        OrientModifier(OrientMode.ALONG_VELOCITY),
        EmitSpawnEventModifier(EventEmitCondition.ON_DIE, m.lit(1, None), 1),
    ]
    for mod in mods:
        j = mod.to_json()
        back = modifier_from_json(j)
        assert back.to_json() == j, type(mod).__name__

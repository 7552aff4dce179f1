"""End-to-end runtime tests: the minimum slice (SURVEY.md §7) and contracts.

Mirrors the reference's CPU-contract-test strategy
(render/headless_batching_tests.rs): a plain numpy mirror of the masked
spawn/update semantics is asserted against the jitted step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bevy_hanabi_tpu import attributes as A
from bevy_hanabi_tpu.asset import EffectAsset, MotionIntegration, SimulationSpace
from bevy_hanabi_tpu.compiler import SimParams
from bevy_hanabi_tpu.graph import ExprWriter
from bevy_hanabi_tpu.modifiers import (
    AccelModifier,
    EmitSpawnEventModifier,
    EventEmitCondition,
    InheritAttributeModifier,
    KillAabbModifier,
    SetAttributeModifier,
)
from bevy_hanabi_tpu.runtime import CompiledEffect, ParticlePool, StepInputs
from bevy_hanabi_tpu.spawn import EffectSpawner, SpawnerSettings

DT = 1.0 / 60.0


def gravity_asset(capacity=1024, lifetime=5.0, rate=32.0):
    w = ExprWriter()
    w.add_property("gravity", (0.0, -9.8, 0.0))
    return (
        EffectAsset("spawn_rs", capacity, SpawnerSettings.rate(rate), w.finish())
        .init(SetAttributeModifier(A.AGE, w.lit(0.0).expr()))
        .init(SetAttributeModifier(A.LIFETIME, w.lit(lifetime).expr()))
        .init(SetAttributeModifier(A.POSITION, w.lit((0.0, 0.0, 0.0)).expr()))
        .init(SetAttributeModifier(A.VELOCITY, w.lit((0.0, 0.0, 0.0)).expr()))
        .update(AccelModifier(w.prop("gravity").expr()))
    )


def sim(asset, frames, spawn_counts=None, dt=DT):
    fx = CompiledEffect(asset)
    pool = fx.create_pool()
    spawner = EffectSpawner(asset.spawner)
    t = 0.0
    for i in range(frames):
        n = spawn_counts[i] if spawn_counts is not None else spawner.tick(dt)
        t += dt
        pool, _ = fx.step(
            pool,
            StepInputs.make(spawn_count=n, frame_seed=i),
            SimParams(time=t, delta_time=dt),
        )
    return fx, pool


def test_minimum_slice_spawn_and_gravity():
    """BASELINE config 1: rate spawner + gravity, headless step loop."""
    asset = gravity_asset()
    fx, pool = sim(asset, 120)  # 2 seconds
    alive = int(pool.alive_count())
    # rate 32/s for 2s
    assert alive == 64
    vel = np.asarray(pool.get("velocity"))[np.asarray(pool.alive)]
    # all alive particles fall straight down
    assert (vel[:, 1] < 0).all()
    assert np.allclose(vel[:, [0, 2]], 0)


def test_gravity_trajectory_matches_closed_form():
    asset = gravity_asset(rate=0.0)  # no auto spawns; drive manually
    fx = CompiledEffect(asset)
    pool = fx.create_pool(64)
    # frame 0: spawn 1 particle, then 9 more update-only frames
    for i in range(10):
        pool, _ = fx.step(
            pool,
            StepInputs.make(spawn_count=1 if i == 0 else 0, frame_seed=i),
            SimParams(time=(i + 1) * DT, delta_time=DT),
        )
    alive = np.asarray(pool.alive)
    assert alive.sum() == 1
    v = np.asarray(pool.get("velocity"))[alive][0]
    p = np.asarray(pool.get("position"))[alive][0]
    k = 10  # update ran 10 times on this particle (spawn frame included)
    g = -9.8
    assert v[1] == pytest.approx(g * DT * k, rel=1e-5)
    # post-update Euler: p += v*dt after each accel, so p = g dt^2 (1+..+k)
    assert p[1] == pytest.approx(g * DT * DT * k * (k + 1) / 2, rel=1e-4)
    # age advanced
    age = np.asarray(pool.get("age"))[alive][0]
    assert age == pytest.approx(10 * DT, rel=1e-5)


def test_reap_recycles_slots():
    asset = gravity_asset(capacity=8, lifetime=3 * DT, rate=0.0)
    fx = CompiledEffect(asset)
    pool = fx.create_pool()
    # spawn 4, let them die (lifetime 3 frames), spawn 4 more
    pool, _ = fx.step(pool, StepInputs.make(4, 0), SimParams(delta_time=DT))
    assert int(pool.alive_count()) == 4
    for i in range(3):
        pool, _ = fx.step(pool, StepInputs.make(0, i + 1), SimParams(delta_time=DT))
    assert int(pool.alive_count()) == 0
    pool, _ = fx.step(pool, StepInputs.make(6, 9), SimParams(delta_time=DT))
    assert int(pool.alive_count()) == 6  # slots recycled
    assert int(pool.counter) == 10


def test_capacity_clamps_spawn():
    asset = gravity_asset(capacity=16, rate=0.0)
    fx = CompiledEffect(asset)
    pool = fx.create_pool()
    pool, _ = fx.step(pool, StepInputs.make(100, 0), SimParams(delta_time=DT))
    assert int(pool.alive_count()) == 16
    assert int(pool.counter) == 16


def test_determinism_same_seed():
    asset = gravity_asset()
    _, p1 = sim(asset, 30, spawn_counts=[2] * 30)
    _, p2 = sim(asset, 30, spawn_counts=[2] * 30)
    np.testing.assert_array_equal(np.asarray(p1.get("position")), np.asarray(p2.get("position")))
    np.testing.assert_array_equal(np.asarray(p1.seed), np.asarray(p2.seed))


def test_numpy_mirror_contract():
    """CPU mirror of masked-spawn + euler update vs the jitted step."""
    asset = gravity_asset(capacity=32, lifetime=0.08, rate=0.0)
    fx = CompiledEffect(asset)
    pool = fx.create_pool()
    # numpy mirror state
    N = 32
    alive = np.zeros(N, bool)
    age = np.zeros(N, np.float32)
    vel = np.zeros((N, 3), np.float32)
    pos = np.zeros((N, 3), np.float32)
    g = np.array([0, -9.8, 0], np.float32)

    spawn_plan = [5, 0, 3, 8, 0, 4, 2]
    for i, s in enumerate(spawn_plan):
        # mirror
        dead_idx = np.flatnonzero(~alive)
        take = dead_idx[: min(s, len(dead_idx))]
        alive[take] = True
        age[take] = 0.0
        vel[take] = 0.0
        pos[take] = 0.0
        age[alive] += DT
        reaped = alive & (age >= 0.08)
        alive &= ~reaped
        vel[alive] += g * DT
        pos[alive] += vel[alive] * DT
        # device
        pool, _ = fx.step(pool, StepInputs.make(s, i), SimParams(delta_time=DT))
        np.testing.assert_array_equal(np.asarray(pool.alive), alive, err_msg=f"frame {i}")
        np.testing.assert_allclose(
            np.asarray(pool.get("position"))[alive], pos[alive], rtol=1e-5
        )


def test_global_space_transform_applied_at_spawn():
    w = ExprWriter()
    asset = (
        EffectAsset("tf", 8, SpawnerSettings.once(1.0), w.finish())
        .init(SetAttributeModifier(A.POSITION, w.lit((1.0, 0.0, 0.0)).expr()))
        .init(SetAttributeModifier(A.VELOCITY, w.lit((0.0, 0.0, 1.0)).expr()))
        .init(SetAttributeModifier(A.LIFETIME, w.lit(100.0).expr()))
        .with_motion_integration(MotionIntegration.NONE)
    )
    fx = CompiledEffect(asset)
    pool = fx.create_pool()
    # rotate 90deg about y: x->-z... use R = [[0,0,1],[0,1,0],[-1,0,0]]
    rot = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 1.0, 0.0], [-1.0, 0.0, 0.0]])
    tf = jnp.concatenate([rot, jnp.asarray([[5.0], [6.0], [7.0]])], axis=1)
    pool, _ = fx.step(
        pool, StepInputs.make(1, 0, transform=tf), SimParams(delta_time=DT)
    )
    alive = np.asarray(pool.alive)
    p = np.asarray(pool.get("position"))[alive][0]
    v = np.asarray(pool.get("velocity"))[alive][0]
    np.testing.assert_allclose(p, [5.0, 6.0, 6.0], atol=1e-5)  # R@(1,0,0)+t
    np.testing.assert_allclose(v, [1.0, 0.0, 0.0], atol=1e-5)  # R@(0,0,1), w=0


def test_local_space_no_transform():
    w = ExprWriter()
    asset = (
        EffectAsset("loc", 8, SpawnerSettings.once(1.0), w.finish())
        .init(SetAttributeModifier(A.POSITION, w.lit((1.0, 2.0, 3.0)).expr()))
        .init(SetAttributeModifier(A.LIFETIME, w.lit(100.0).expr()))
        .with_simulation_space(SimulationSpace.LOCAL)
    )
    fx = CompiledEffect(asset)
    pool = fx.create_pool()
    tf = jnp.concatenate([jnp.eye(3), jnp.asarray([[9.0], [9.0], [9.0]])], axis=1)
    pool, _ = fx.step(pool, StepInputs.make(1, 0, transform=tf), SimParams(delta_time=DT))
    p = np.asarray(pool.get("position"))[np.asarray(pool.alive)][0]
    np.testing.assert_allclose(p, [1, 2, 3], atol=1e-6)


def test_particle_counter_attribute():
    w = ExprWriter()
    asset = (
        EffectAsset("ctr", 16, SpawnerSettings.once(1.0), w.finish())
        .init(SetAttributeModifier(A.LIFETIME, w.lit(100.0).expr()))
        # POSITION is mandatory (reference lib.rs:840)
        .init(SetAttributeModifier(A.POSITION, w.lit((0.0, 0.0, 0.0)).expr()))
        .init(
            SetAttributeModifier(
                A.F32_0, w.attr(A.PARTICLE_COUNTER).cast(__import__("bevy_hanabi_tpu").FLOAT).expr()
            )
        )
    )
    fx = CompiledEffect(asset)
    pool = fx.create_pool()
    pool, _ = fx.step(pool, StepInputs.make(3, 0), SimParams(delta_time=DT))
    pool, _ = fx.step(pool, StepInputs.make(2, 1), SimParams(delta_time=DT))
    alive = np.asarray(pool.alive)
    counters = np.sort(np.asarray(pool.get("particle_counter"))[alive])
    np.testing.assert_array_equal(counters, [0, 1, 2, 3, 4])


def test_parent_child_events_on_die():
    """BASELINE firework trail pattern: parent OnDie -> child inherits."""
    wp = ExprWriter()
    parent = (
        EffectAsset("parent", 16, SpawnerSettings.once(4.0), wp.finish())
        .init(SetAttributeModifier(A.AGE, wp.lit(0.0).expr()))
        .init(SetAttributeModifier(A.LIFETIME, wp.lit(2.5 * DT).expr()))
        .init(SetAttributeModifier(A.POSITION, wp.lit((3.0, 2.0, 1.0)).expr()))
        .update(
            EmitSpawnEventModifier(
                EventEmitCondition.ON_DIE, wp.module.lit(2, None), 0
            )
        )
    )
    wc = ExprWriter()
    child = (
        EffectAsset("child", 64, SpawnerSettings.once(0.0), wc.finish())
        .init(InheritAttributeModifier(A.POSITION))
        .init(SetAttributeModifier(A.LIFETIME, wc.lit(100.0).expr()))
    )
    pfx = CompiledEffect(parent)
    cfx = CompiledEffect(child, parent_layout=parent.particle_layout())
    ppool = pfx.create_pool()
    cpool = cfx.create_pool()
    from bevy_hanabi_tpu.runtime.events import EventBuffer

    events = EventBuffer.empty(ppool.capacity)
    spawned = []
    for i in range(5):
        # child consumes last frame's events (1-frame latency)
        cpool, _ = cfx.step(
            cpool,
            StepInputs.make(0, 100 + i),
            SimParams(delta_time=DT),
            events_in=events,
            parent_pool=ppool,
        )
        ppool, ev = pfx.step(
            ppool, StepInputs.make(4 if i == 0 else 0, i), SimParams(delta_time=DT)
        )
        events = ev[0]
        spawned.append(int(cpool.alive_count()))
    # parents die on frame 2 (age 3*DT > 2.5*DT); children appear frame 3
    assert spawned[:3] == [0, 0, 0]
    assert spawned[3] == 8  # 4 parents x 2 events
    pos = np.asarray(cpool.get("position"))[np.asarray(cpool.alive)]
    np.testing.assert_allclose(pos, 3.0 * np.ones((8, 3)) * [1, 2 / 3, 1 / 3], atol=1e-5)


def test_pool_checkpoint_roundtrip(tmp_path):
    asset = gravity_asset()
    fx, pool = sim(asset, 30)
    path = str(tmp_path / "pool.npz")
    pool.save(path)
    back = ParticlePool.load(path)
    np.testing.assert_array_equal(np.asarray(pool.alive), np.asarray(back.alive))
    np.testing.assert_array_equal(
        np.asarray(pool.get("position")), np.asarray(back.get("position"))
    )
    assert int(back.counter) == int(pool.counter)
    # resume simulation from the checkpoint
    pool2, _ = fx.step(back, StepInputs.make(1, 99), SimParams(delta_time=DT))
    assert int(pool2.alive_count()) == int(pool.alive_count()) + 1


def test_kill_modifier_in_runtime():
    w = ExprWriter()
    asset = (
        EffectAsset("kill", 32, SpawnerSettings.once(8.0), w.finish())
        .init(SetAttributeModifier(A.LIFETIME, w.lit(100.0).expr()))
        .init(SetAttributeModifier(A.VELOCITY, w.lit((1.0, 0.0, 0.0)).expr()))
        .update(
            KillAabbModifier(
                w.lit((0.0, 0.0, 0.0)).expr(), w.lit((0.05, 10.0, 10.0)).expr(), False
            )
        )
    )
    fx = CompiledEffect(asset)
    pool = fx.create_pool()
    pool, _ = fx.step(pool, StepInputs.make(8, 0), SimParams(delta_time=DT))
    assert int(pool.alive_count()) == 8  # still inside box (|x| < .05 after 1 frame)
    for i in range(10):
        pool, _ = fx.step(pool, StepInputs.make(0, i), SimParams(delta_time=DT))
    assert int(pool.alive_count()) == 0  # walked out of the box and got killed


def test_poison_pool_debug_mode():
    asset = gravity_asset(capacity=16)
    fx = CompiledEffect(asset)
    pool = fx.create_pool(poison=True)
    raw = np.asarray(pool.get("position"))
    assert np.isnan(raw).all()  # 0xFFFFFFFF bit pattern is NaN for f32
    # spawning overwrites poison
    pool, _ = fx.step(pool, StepInputs.make(16, 0), SimParams(delta_time=DT))
    assert np.isfinite(np.asarray(pool.get("position"))).all()


def test_edge_cases_zero_dt_negative_spawn_tiny_pool():
    w = ExprWriter()
    asset = (
        EffectAsset("edge", 64, SpawnerSettings.once(0.0), w.finish())
        .init(SetAttributeModifier(A.AGE, w.lit(0.0).expr()))
        .init(SetAttributeModifier(A.LIFETIME, w.lit(1.0).expr()))
        .init(SetAttributeModifier(A.POSITION, w.lit((0.0, 0.0, 0.0)).expr()))
    )
    fx = CompiledEffect(asset)
    pool = fx.create_pool()
    # empty pool, zero spawns
    pool, _ = fx.step(pool, StepInputs.make(0, 0), SimParams(delta_time=DT))
    assert int(pool.alive_count()) == 0
    # dt=0: spawns land, nothing ages
    pool, _ = fx.step(pool, StepInputs.make(5, 1), SimParams(delta_time=0.0))
    assert int(pool.alive_count()) == 5
    alive_ages = np.asarray(pool.get("age"))[np.asarray(pool.alive)]
    assert float(alive_ages.max()) == 0.0  # dt=0: spawned but not aged
    # negative spawn count is a no-op
    pool, _ = fx.step(pool, StepInputs.make(-3, 2), SimParams(delta_time=DT))
    assert int(pool.alive_count()) == 5
    # capacity-1 pool works
    tiny = fx.create_pool(1)
    tiny, _ = fx.step(tiny, StepInputs.make(10, 3), SimParams(delta_time=DT))
    assert int(tiny.alive_count()) == 1


def test_instanced_property_shapes_and_dtypes():
    """make_inputs must keep declared property dtypes (float32 coercion
    corrupts ints > 2^24) and use the DECLARED shape to tell a shared
    vec-k value from per-instance scalars when k == num_instances."""
    import pytest

    from bevy_hanabi_tpu.runtime.instanced import InstancedEffect

    w = ExprWriter()
    w.add_property("accel3", (0.0, -1.0, 0.0))
    w.add_property("tick", np.uint32(16777217))  # not float32-representable
    asset = (
        EffectAsset("ip", 16, SpawnerSettings.once(4.0), w.finish())
        .init(SetAttributeModifier(A.POSITION, w.lit([0.0, 0.0, 0.0]).expr()))
        .init(SetAttributeModifier(A.LIFETIME, w.lit(5.0).expr()))
    )
    fx = InstancedEffect(asset, 3)
    ins = fx.make_inputs(
        [4, 4, 4],
        [1, 2, 3],
        properties={
            # a bare vec3 with num_instances == 3: SHARED, not per-instance
            "accel3": np.asarray([1.0, 2.0, 3.0], np.float32),
            "tick": np.uint32(16777217),
        },
    )
    assert ins.properties["accel3"].shape == (3, 3)
    np.testing.assert_allclose(ins.properties["accel3"][2], [1.0, 2.0, 3.0])
    assert ins.properties["tick"].dtype == np.uint32
    assert int(ins.properties["tick"][0]) == 16777217
    per = np.arange(9, dtype=np.float32).reshape(3, 3)
    ins2 = fx.make_inputs([0] * 3, [0] * 3, properties={"accel3": per})
    np.testing.assert_allclose(ins2.properties["accel3"], per)
    with pytest.raises(ValueError):
        fx.make_inputs(
            [0] * 3, [0] * 3, properties={"accel3": np.zeros((2, 3))}
        )


def test_event_payload_immune_to_parent_slot_recycling():
    """Inherited attributes come from emission-time payload: even if the
    parent slot is recycled before the child consumes the event, the child
    inherits the ORIGINAL emitter's values (the reference reads the live
    slot and can observe recycled data)."""
    wp = ExprWriter()
    wp.add_property("where", (7.0, 7.0, 7.0))
    parent = (
        EffectAsset("par", 4, SpawnerSettings.once(0.0), wp.finish())
        .init(SetAttributeModifier(A.AGE, wp.lit(0.0).expr()))
        .init(SetAttributeModifier(A.LIFETIME, wp.lit(1.5 * DT).expr()))
        .init(SetAttributeModifier(A.POSITION, wp.prop("where").expr()))
        .update(
            EmitSpawnEventModifier(EventEmitCondition.ON_DIE, wp.module.lit(1, None), 0)
        )
    )
    wc = ExprWriter()
    child = (
        EffectAsset("chi", 16, SpawnerSettings.once(0.0), wc.finish())
        .init(InheritAttributeModifier(A.POSITION))
        .init(SetAttributeModifier(A.LIFETIME, wc.lit(100.0).expr()))
    )
    pfx = CompiledEffect(parent)
    cfx = CompiledEffect(child, parent_layout=parent.particle_layout())
    ppool = pfx.create_pool()
    cpool = cfx.create_pool()

    # frame 1: spawn a parent at (7,7,7); frame 2: it dies, emits event
    ppool, ev = pfx.step(
        ppool,
        StepInputs.make(1, 0, properties={"where": np.asarray([7.0, 7.0, 7.0], np.float32)}),
        SimParams(delta_time=DT),
    )
    ppool, ev = pfx.step(
        ppool, StepInputs.make(0, 1), SimParams(delta_time=DT)
    )
    assert int(ev[0].num_events) == 1
    # frame 3 (parent side): the dead slot is RECYCLED by a new parent at (9,9,9)
    ppool, _ = pfx.step(
        ppool,
        StepInputs.make(1, 2, properties={"where": np.asarray([9.0, 9.0, 9.0], np.float32)}),
        SimParams(delta_time=DT),
    )
    # child consumes the frame-2 event AFTER the recycle
    cpool, _ = cfx.step(
        cpool,
        StepInputs.make(0, 3),
        SimParams(delta_time=DT),
        events_in=ev[0],
        parent_pool=ppool,
    )
    pos = np.asarray(cpool.get("position"))[np.asarray(cpool.alive)]
    # payload capture => inherits the DEAD emitter's position, not the recycler's
    np.testing.assert_allclose(pos, [[7.0, 7.0, 7.0]], atol=1e-5)


def test_build_event_buffer_bit_exact_eager_and_jit():
    """The compacted event buffer packs slot/count/payload lanes into one
    row scatter via an int32 carrier. Pin bit-exactness in BOTH eager and
    jit modes: a float32 carrier regressed here once — u32 slot ids bitcast
    to f32 denormals, which XLA:CPU eager mode flushes to zero between ops
    (parent_slot came back all-zero, silently killing every child spawn in
    the per-frame scene path while the jitted tests stayed green)."""
    from bevy_hanabi_tpu.runtime.events import build_event_buffer

    active = jnp.array([0, 1, 0, 1, 0, 0, 1, 0], bool)
    count = jnp.array([0, 4, 0, 2, 0, 0, 3, 0], jnp.int32)
    attrs = {
        # f32 rows incl. negative zero and tiny (denormal-adjacent) values
        "position": jnp.array(
            [[float(i), -0.0, 1e-40] for i in range(8)], jnp.float32
        ),
        # u32 lane with the high bit set (bitcasts to a negative i32)
        "seed": (jnp.arange(8, dtype=jnp.uint32) * 7) | jnp.uint32(0x80000000),
        "age": jnp.linspace(0.0, 1.0, 8, dtype=jnp.float32),
    }
    for label, fn in (("eager", build_event_buffer), ("jit", jax.jit(build_event_buffer))):
        buf = fn(active, count, attrs)
        assert int(buf.num_events) == 3, label
        np.testing.assert_array_equal(np.asarray(buf.parent_slot[:3]), [1, 3, 6], label)
        np.testing.assert_array_equal(np.asarray(buf.count[:3]), [4, 2, 3], label)
        np.testing.assert_array_equal(
            np.asarray(buf.payload["position"][:3]),
            np.asarray(attrs["position"])[[1, 3, 6]],
            label,
        )
        np.testing.assert_array_equal(
            np.asarray(buf.payload["seed"][:3]),
            np.asarray(attrs["seed"])[[1, 3, 6]],
            label,
        )
        np.testing.assert_array_equal(
            np.asarray(buf.payload["age"][:3]),
            np.asarray(attrs["age"])[[1, 3, 6]],
            label,
        )

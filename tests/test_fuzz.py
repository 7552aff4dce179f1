"""Property-based fuzz: random modifier stacks must step without NaNs.

Builds randomized assets (random init/update modifier combinations with
randomized literal parameters), steps them several frames, and asserts
invariants: alive counts bounded by spawns, no NaN/Inf in alive lanes, and
determinism under identical seeds.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from bevy_hanabi_tpu import attributes as A
from bevy_hanabi_tpu.asset import EffectAsset
from bevy_hanabi_tpu.compiler import SimParams
from bevy_hanabi_tpu.graph import ExprWriter
from bevy_hanabi_tpu.modifiers import (
    AccelModifier,
    ConformToSphereModifier,
    KillAabbModifier,
    KillSphereModifier,
    LinearDragModifier,
    RadialAccelModifier,
    SetAttributeModifier,
    SetPositionCircleModifier,
    SetPositionCone3dModifier,
    SetPositionSphereModifier,
    SetVelocityCircleModifier,
    SetVelocitySphereModifier,
    SetVelocityTangentModifier,
    ShapeDimension,
    TangentAccelModifier,
)
from bevy_hanabi_tpu.runtime import CompiledEffect, StepInputs
from bevy_hanabi_tpu.spawn import SpawnerSettings

DT = 1.0 / 60.0


def random_asset(rng: np.random.Generator) -> EffectAsset:
    w = ExprWriter()
    m = w.module

    def v3():
        return m.lit(tuple(rng.uniform(-2, 2, 3).astype(float)))

    def unit3():
        d = rng.uniform(-1, 1, 3)
        d /= np.linalg.norm(d) + 1e-6
        return m.lit(tuple(d.astype(float)))

    def pos_f():
        return m.lit(float(rng.uniform(0.05, 3.0)))

    asset = EffectAsset("fuzz", 512, SpawnerSettings.rate(600.0), m)
    asset.init(SetAttributeModifier(A.AGE, w.lit(0.0).expr()))
    asset.init(
        SetAttributeModifier(
            A.LIFETIME, w.lit(float(rng.uniform(0.05, 0.5))).expr()
        )
    )

    pos_mods = [
        lambda: SetPositionSphereModifier(
            v3(), pos_f(), rng.choice([ShapeDimension.SURFACE, ShapeDimension.VOLUME])
        ),
        lambda: SetPositionCircleModifier(
            v3(), unit3(), pos_f(),
            rng.choice([ShapeDimension.SURFACE, ShapeDimension.VOLUME]),
        ),
        lambda: SetPositionCone3dModifier(pos_f(), pos_f(), pos_f()),
    ]
    asset.init(pos_mods[rng.integers(len(pos_mods))]())

    vel_mods = [
        lambda: SetVelocitySphereModifier(v3(), pos_f()),
        lambda: SetVelocityCircleModifier(v3(), unit3(), pos_f()),
        lambda: SetVelocityTangentModifier(v3(), unit3(), pos_f()),
        lambda: SetAttributeModifier(A.VELOCITY, w.rand(__import__("bevy_hanabi_tpu").VEC3F).expr()),
    ]
    asset.init(vel_mods[rng.integers(len(vel_mods))]())

    upd_mods = [
        lambda: AccelModifier(v3()),
        lambda: RadialAccelModifier(v3(), pos_f()),
        lambda: TangentAccelModifier(v3(), unit3(), pos_f()),
        lambda: LinearDragModifier(pos_f()),
        lambda: ConformToSphereModifier(v3(), pos_f(), pos_f(), pos_f(), pos_f()),
        lambda: KillSphereModifier(v3(), pos_f(), bool(rng.integers(2))),
        lambda: KillAabbModifier(v3(), v3(), bool(rng.integers(2))),
    ]
    for _ in range(int(rng.integers(1, 4))):
        asset.update(upd_mods[rng.integers(len(upd_mods))]())
    return asset


@pytest.mark.parametrize("seed", range(8))
def test_random_modifier_stacks_step_cleanly(seed):
    rng = np.random.default_rng(seed)
    asset = random_asset(rng)
    fx = CompiledEffect(asset)
    pool = fx.create_pool()
    total_spawned = 0
    for i in range(8):
        n = int(rng.integers(0, 100))
        total_spawned += n
        pool, _ = fx.step(
            pool,
            StepInputs.make(n, seed * 1000 + i),
            SimParams(time=i * DT, delta_time=DT),
        )
    alive = np.asarray(pool.alive)
    assert alive.sum() <= min(total_spawned, 512)
    # alive lanes hold finite state
    for name in ("position", "velocity", "age", "lifetime"):
        vals = np.asarray(pool.get(name))[alive]
        assert np.isfinite(vals).all(), f"{name} has non-finite values (seed {seed})"
    assert int(pool.counter) == min(total_spawned, 512) or int(pool.counter) <= total_spawned


# ---------------------------------------------------------------------------
# Chunked event trees: fuzz equivalence vs the per-frame path
# ---------------------------------------------------------------------------

from bevy_hanabi_tpu.modifiers import (
    EmitSpawnEventModifier,
    EventEmitCondition,
    InheritAttributeModifier,
)
from bevy_hanabi_tpu.runtime import HanabiScene


def _fuzz_tree_assets(rng: np.random.Generator):
    """Random 2-3 level event tree with deterministic (rand-free) modifiers
    so per-frame and chunked paths must agree bit-exactly."""
    def emitter(name, cap, spawner, lifetime, pos, channels):
        w = ExprWriter()
        a = (
            EffectAsset(name, cap, spawner, w.finish())
            .init(SetAttributeModifier(A.AGE, w.lit(0.0).expr()))
            .init(SetAttributeModifier(A.LIFETIME, w.lit(float(lifetime)).expr()))
            .init(SetAttributeModifier(A.POSITION, w.lit(tuple(map(float, pos))).expr()))
        )
        for ch in range(channels):
            cond = (
                EventEmitCondition.ON_DIE
                if rng.integers(2)
                else EventEmitCondition.ALWAYS
            )
            a.update(
                EmitSpawnEventModifier(cond, w.module.lit(int(rng.integers(1, 3)), None), ch)
            )
        return a

    def inheritor(name, cap, lifetime, channels):
        w = ExprWriter()
        a = (
            EffectAsset(name, cap, SpawnerSettings.once(0.0), w.finish())
            .init(InheritAttributeModifier(A.POSITION))
            .init(SetAttributeModifier(A.AGE, w.lit(0.0).expr()))
            .init(SetAttributeModifier(A.LIFETIME, w.lit(float(lifetime)).expr()))
        )
        for ch in range(channels):
            a.update(
                EmitSpawnEventModifier(
                    EventEmitCondition.ON_DIE, w.module.lit(int(rng.integers(1, 3)), None), ch
                )
            )
        return a

    n_children = int(rng.integers(1, 3))
    root = emitter(
        "root", 32,
        SpawnerSettings.once(float(rng.integers(2, 6))),
        rng.uniform(2, 6) * DT, rng.uniform(-3, 3, 3), n_children,
    )
    specs = [("root", root, None, 0)]
    for c in range(n_children):
        deep = rng.integers(2) == 0
        mid = inheritor(f"mid{c}", 64, rng.uniform(2, 5) * DT, 1 if deep else 0)
        specs.append((f"mid{c}", mid, "root", c))
        if deep:
            leaf = inheritor(f"leaf{c}", 128, 100.0, 0)
            specs.append((f"leaf{c}", leaf, f"mid{c}", 0))
    return specs


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_chunked_event_tree_matches_per_frame(seed):
    rng = np.random.default_rng(100 + seed)
    specs = _fuzz_tree_assets(rng)

    def build():
        s = HanabiScene(seed=seed)
        for name, asset, parent, _ in specs:
            s.add(asset, name, parent=parent)
        return s

    frames = int(rng.integers(8, 25))
    a = build()
    for _ in range(frames):
        a.update(DT)
    b = build()
    b.update_chunk(frames, DT)
    for name, _, _, _ in specs:
        assert a[name].alive_count() == b[name].alive_count(), (name, seed)
        np.testing.assert_array_equal(
            np.asarray(a[name].pool.alive), np.asarray(b[name].pool.alive)
        )
        np.testing.assert_allclose(
            np.asarray(a[name].pool.get("position")),
            np.asarray(b[name].pool.get("position")),
            atol=1e-6, err_msg=f"{name} seed {seed}",
        )

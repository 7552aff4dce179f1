"""Fused Pallas step kernel vs the XLA step: bit-exact trajectory contract.

Runs in pallas interpret mode on CPU (the reference's MockRenderer trick:
same algorithm, testable without the real device)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bevy_hanabi_tpu import attributes as A
from bevy_hanabi_tpu.asset import EffectAsset
from bevy_hanabi_tpu.compiler import SimParams
from bevy_hanabi_tpu.graph import ExprWriter
from bevy_hanabi_tpu.models import spawn_gravity_effect
from bevy_hanabi_tpu.modifiers import (
    KillAabbModifier,
    SetAttributeModifier,
)
from bevy_hanabi_tpu.ops.step_kernel import FusedStep
from bevy_hanabi_tpu.runtime import CompiledEffect, StepInputs

DT = 1.0 / 60.0
CAP = 64 * 128  # 8192: one plane of 64 rows


def run_both(asset, frames, spawn_plan, transform=None):
    fx = CompiledEffect(asset)
    fused = FusedStep(fx, tile_rows=16, interpret=True)
    pool_a = fx.create_pool(CAP)
    pool_b = fx.create_pool(CAP)
    for i in range(frames):
        inputs = StepInputs.make(spawn_plan[i], i * 7919 + 13, transform=transform)
        sim = SimParams(time=(i + 1) * DT, delta_time=DT)
        pool_a, _ = fx.step(pool_a, inputs, sim)
        pool_b, _ = fused.step(pool_b, inputs, sim)
    return pool_a, pool_b


def assert_pools_equal(pool_a, pool_b):
    np.testing.assert_array_equal(np.asarray(pool_a.alive), np.asarray(pool_b.alive))
    np.testing.assert_array_equal(np.asarray(pool_a.seed), np.asarray(pool_b.seed))
    assert int(pool_a.counter) == int(pool_b.counter)
    for name, arr in pool_a.attrs.items():
        a = np.asarray(arr)
        b = np.asarray(pool_b.get(name))
        alive = np.asarray(pool_a.alive)
        if np.issubdtype(a.dtype, np.floating):
            # identical math, but XLA vs Mosaic may fuse adds differently
            np.testing.assert_allclose(a[alive], b[alive], atol=1e-6, err_msg=name)
        else:
            np.testing.assert_array_equal(a[alive], b[alive], err_msg=name)


def test_fused_matches_xla_gravity():
    asset = spawn_gravity_effect(capacity=CAP, rate=0.0)
    pool_a, pool_b = run_both(asset, 6, [700, 0, 300, 1200, 0, 50])
    assert int(pool_a.alive_count()) > 0
    assert_pools_equal(pool_a, pool_b)


def test_fused_reap_and_recycle():
    asset = spawn_gravity_effect(capacity=CAP, rate=0.0)
    # short lifetimes force death + slot recycling
    w = ExprWriter()
    asset2 = spawn_gravity_effect(capacity=CAP, rate=0.0)
    asset2.init_modifiers[1] = SetAttributeModifier(
        A.LIFETIME, asset2.module.lit(2.5 * DT)
    )
    pool_a, pool_b = run_both(asset2, 8, [900, 0, 0, 900, 0, 0, 500, 100])
    assert_pools_equal(pool_a, pool_b)


def test_fused_with_kill_and_transform():
    asset = spawn_gravity_effect(capacity=CAP, rate=0.0)
    asset.update(
        KillAabbModifier(
            asset.module.lit((0.0, 0.0, 0.0)), asset.module.lit((2.0, 2.0, 2.0)), False
        )
    )
    rot = jnp.asarray(
        [[0.0, 0.0, 1.0, 1.5], [0.0, 1.0, 0.0, -0.5], [-1.0, 0.0, 0.0, 0.25]]
    )
    pool_a, pool_b = run_both(asset, 5, [800, 100, 0, 400, 0], transform=rot)
    assert_pools_equal(pool_a, pool_b)


def test_fused_capacity_clamp():
    asset = spawn_gravity_effect(capacity=CAP, rate=0.0)
    pool_a, pool_b = run_both(asset, 2, [CAP + 5000, 100])
    assert int(pool_b.alive_count()) == CAP
    assert_pools_equal(pool_a, pool_b)


def test_fused_rejects_event_effects():
    from bevy_hanabi_tpu.models import firework_effect

    fx = CompiledEffect(firework_effect(1024))
    with pytest.raises(ValueError):
        FusedStep(fx)


def test_fused_rejects_bad_capacity():
    asset = spawn_gravity_effect(capacity=CAP, rate=0.0)
    fx = CompiledEffect(asset)
    fused = FusedStep(fx, tile_rows=16, interpret=True)
    pool = fx.create_pool(1000)  # not a multiple of 16*128
    with pytest.raises(ValueError):
        fused.step(pool, StepInputs.make(1, 0), SimParams(delta_time=DT))

"""Mesh-sharding contracts: sharded step == single-device step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bevy_hanabi_tpu.compiler import SimParams
from bevy_hanabi_tpu.models import spawn_gravity_effect
from bevy_hanabi_tpu.parallel import ShardedEffect, make_mesh
from bevy_hanabi_tpu.runtime import InstancedEffect

DT = 1.0 / 60.0


def needs_devices(n):
    return pytest.mark.skipif(
        len(jax.devices()) < n, reason=f"needs {n} virtual devices"
    )


@needs_devices(8)
def test_sharded_matches_unsharded():
    asset = spawn_gravity_effect(capacity=512, rate=0.0)
    ninst = 8
    plain = InstancedEffect(asset, ninst, capacity=512)
    mesh = make_mesh(jax.devices()[:8], dp=4, sp=2)
    shard = ShardedEffect(asset, ninst, mesh, capacity=512)

    pools_a = plain.create_pools()
    pools_b = shard.create_pools()
    spawn = np.asarray([3, 0, 17, 512, 9, 1, 0, 250], np.int32)
    seeds = np.arange(ninst, dtype=np.uint32) * 977 + 5
    for frame in range(5):
        ia = plain.make_inputs(spawn, seeds + frame)
        ib = shard.shard_inputs(shard.make_inputs(spawn, seeds + frame))
        sim = SimParams(time=frame * DT, delta_time=DT)
        pools_a, _ = plain.step(pools_a, ia, sim)
        pools_b, _ = shard.step(pools_b, ib, sim)

    np.testing.assert_array_equal(
        np.asarray(pools_a.alive), np.asarray(pools_b.alive)
    )
    np.testing.assert_array_equal(np.asarray(pools_a.seed), np.asarray(pools_b.seed))
    np.testing.assert_allclose(
        np.asarray(pools_a.attrs["position"]),
        np.asarray(pools_b.attrs["position"]),
        atol=1e-6,
    )


@needs_devices(8)
def test_mesh_construction_variants():
    devs = jax.devices()[:8]
    m1 = make_mesh(devs)
    assert m1.shape == {"dp": 8, "sp": 1}
    m2 = make_mesh(devs, sp=4)
    assert m2.shape == {"dp": 2, "sp": 4}
    with pytest.raises(ValueError):
        make_mesh(devs, dp=3, sp=3)


@needs_devices(8)
def test_sharded_validation():
    asset = spawn_gravity_effect(capacity=512, rate=0.0)
    mesh = make_mesh(jax.devices()[:8], dp=4, sp=2)
    with pytest.raises(ValueError):
        ShardedEffect(asset, 3, mesh, capacity=512)  # 3 % 4 != 0
    with pytest.raises(ValueError):
        ShardedEffect(asset, 4, mesh, capacity=511)  # 511 % 2 != 0


def test_instanced_effect_independent_instances():
    asset = spawn_gravity_effect(capacity=128, rate=0.0)
    fx = InstancedEffect(asset, 4, capacity=128)
    pools = fx.create_pools()
    inputs = fx.make_inputs([10, 0, 128, 5], [1, 2, 3, 4])
    pools, _ = fx.step(pools, inputs, SimParams(delta_time=DT))
    counts = np.asarray(fx.alive_counts(pools))
    np.testing.assert_array_equal(counts, [10, 0, 128, 5])
    assert int(fx.total_alive(pools)) == 143

"""Device-mesh sharding of instanced particle pools.

The reference is strictly single-GPU (SURVEY.md §2e): its only parallelism is
per-particle threads + multi-instance batching. On TPU the same two axes map
directly onto a 2-D device mesh:

* ``dp`` (data parallel) — the **instance axis**: independent emitters shard
  embarrassingly; zero collectives in the step.
* ``sp`` (sequence/pool parallel) — the **pool axis**: one giant effect's
  particle pool sharded across chips. The only cross-chip ops XLA inserts
  are for the spawn-ranking cumsum (a log-depth scan over ICI) and the
  alive-count reductions; everything else is lane-local.

Shardings are annotated with ``NamedSharding`` and the step is ``jax.jit``-ed
over the mesh; XLA inserts the collectives (scaling-book recipe: pick a mesh,
annotate, let XLA work).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..asset import EffectAsset
from ..compiler import SimParams
from ..runtime.effect import StepInputs
from ..runtime.instanced import InstancedEffect
from ..runtime.pool import ParticlePool

__all__ = ["make_mesh", "ShardedEffect"]


def make_mesh(
    devices=None, dp: Optional[int] = None, sp: Optional[int] = None
) -> Mesh:
    """Build a ``(dp, sp)`` mesh over the given (or all) devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None and sp is None:
        dp, sp = n, 1
    elif dp is None:
        dp = n // sp
    elif sp is None:
        sp = n // dp
    if dp * sp != n:
        raise ValueError(f"dp*sp must equal device count: {dp}*{sp} != {n}")
    arr = np.asarray(devices).reshape(dp, sp)
    return Mesh(arr, axis_names=("dp", "sp"))


class ShardedEffect(InstancedEffect):
    """Instanced effect whose pools shard over a device mesh.

    Pool arrays are [I, N, ...]: instance axis I shards over ``dp``, particle
    axis N over ``sp``. Per-instance inputs shard over ``dp``; SimParams
    replicate.
    """

    def __init__(self, asset: EffectAsset, num_instances: int, mesh: Mesh,
                 capacity: Optional[int] = None):
        super().__init__(asset, num_instances, capacity)
        self.mesh = mesh
        dp = mesh.shape["dp"]
        sp = mesh.shape["sp"]
        if num_instances % dp != 0:
            raise ValueError(f"num_instances {num_instances} not divisible by dp={dp}")
        if self.capacity % sp != 0:
            raise ValueError(f"capacity {self.capacity} not divisible by sp={sp}")

        def pool_spec(x):
            # [I, N, ...]: shard I over dp, N over sp
            extra = (None,) * (x.ndim - 2) if x.ndim >= 2 else ()
            if x.ndim == 1:  # counter [I]
                return NamedSharding(mesh, P("dp"))
            return NamedSharding(mesh, P("dp", "sp", *extra))

        def input_spec(x):
            x = jnp.asarray(x)
            extra = (None,) * (x.ndim - 1)
            return NamedSharding(mesh, P("dp", *extra))

        self._pool_spec_fn = pool_spec
        self._input_spec_fn = input_spec
        vm = jax.vmap(
            lambda pool, inputs, sim: self.effect._step(pool, inputs, sim, None, None),
            in_axes=(0, 0, None),
        )
        self._jit_step = jax.jit(vm, donate_argnums=(0,))

    def create_pools(self, poison: bool = False) -> ParticlePool:
        pools = super().create_pools(poison=poison)
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, self._pool_spec_fn(x)), pools
        )

    def shard_inputs(self, inputs: StepInputs) -> StepInputs:
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(jnp.asarray(x), self._input_spec_fn(x)), inputs
        )

    def shard_inputs_stacked(self, inputs_stacked: StepInputs) -> StepInputs:
        """Shard K-frame stacked inputs: leaves are [K, I, ...], I over dp."""

        def spec(x):
            x = jnp.asarray(x)
            extra = (None,) * (x.ndim - 2)
            return NamedSharding(self.mesh, jax.sharding.PartitionSpec(None, "dp", *extra))

        return jax.tree_util.tree_map(
            lambda x: jax.device_put(jnp.asarray(x), spec(x)), inputs_stacked
        )

    def step(self, pools: ParticlePool, inputs: StepInputs, sim: SimParams):
        with self.mesh:
            return self._jit_step(pools, inputs, sim)

    def step_chunk(self, pools: ParticlePool, inputs_stacked, sims_stacked):
        """K frames in one dispatch with pools left sharded on the mesh."""
        with self.mesh:
            return super().step_chunk(
                pools, self.shard_inputs_stacked(inputs_stacked), sims_stacked
            )

    def step_checked(self, pools: ParticlePool, inputs: StepInputs, sim: SimParams):
        with self.mesh:
            return super().step_checked(pools, inputs, sim)

    def step_chunk_checked(self, pools: ParticlePool, inputs_stacked, sims_stacked):
        with self.mesh:
            return super().step_chunk_checked(
                pools, self.shard_inputs_stacked(inputs_stacked), sims_stacked
            )

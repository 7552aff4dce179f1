"""Multi-instance batching: many emitters of one asset in one dispatch.

The reference merges compatible effect instances into one compute dispatch
with per-batch prefix sums and a per-thread binary search to locate which
instance a thread belongs to (Batcher, render/batch.rs:145-188;
vfx_update.wgsl:51-72). On TPU the natural equivalent is a **leading
instance axis + vmap**: one XLA executable steps ``[I, N]`` pools, each
instance with its own spawn count, transform, seed, and property values.
No searchsorted, no prefix-sum pass — the axis *is* the batch.

The instance axis is also the data-parallel sharding axis for multi-chip
scaling (see :mod:`bevy_hanabi_tpu.parallel`).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..asset import EffectAsset
from ..compiler import SimParams
from .effect import CompiledEffect, StepInputs, identity_transform
from .pool import ParticlePool

__all__ = ["InstancedEffect"]


class InstancedEffect:
    """``num_instances`` independent instances of one asset, one executable.

    Equivalent of the reference's EffectBatch (batch.rs:92): instances share
    the asset/layout/pipelines and differ only in per-instance runtime data.
    """

    def __init__(self, asset: EffectAsset, num_instances: int, capacity: Optional[int] = None):
        from ..properties import Property

        self.asset = asset
        # .get shares the compiled step between instances/groups of the
        # same asset (the ShaderCache dedupe, render/shader_cache.rs:18-62)
        self.effect = CompiledEffect.get(asset)
        self.num_instances = int(num_instances)
        self.capacity = int(capacity or asset.capacity)
        # declared per-instance shape+dtype of each property, for
        # disambiguating shared vs per-instance values in make_inputs
        self._prop_decl = {
            n: Property(n, v).default.to_numpy()
            for n, v in asset.module.properties().items()
        }
        # vmap the single-instance traced body over the instance axis.
        self._jit_step = jax.jit(
            jax.vmap(
                lambda pool, inputs, sim: self.effect._step(pool, inputs, sim, None, None),
                in_axes=(0, 0, None),
            ),
            donate_argnums=(0,),
        )

    def create_pools(self, poison: bool = False) -> ParticlePool:
        """Stacked pools: every array gains a leading [I] instance axis."""
        one = ParticlePool.create(self.effect.layout, self.capacity, poison=poison)
        return jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (self.num_instances,) + x.shape), one
        )

    def make_inputs(
        self,
        spawn_counts,
        frame_seeds,
        transforms=None,
        properties: Optional[Dict[str, Any]] = None,
    ) -> StepInputs:
        """Batch per-instance inputs; each leaf gains a leading [I] axis."""
        # host numpy: one device transfer at the jit boundary (see
        # StepInputs.make)
        i = self.num_instances
        if transforms is None:
            transforms = np.broadcast_to(identity_transform(), (i, 3, 4))
        props = {}
        for k, v in (properties or {}).items():
            decl = self._prop_decl.get(k)
            if decl is not None:
                # Declared dtype rules (float32 coercion would corrupt
                # int properties > 2^24); the declared shape decides
                # shared-vs-per-instance — a bare [k] vec is ALWAYS the
                # shared value, even when k == num_instances.
                v = np.asarray(v, decl.dtype)
                if v.shape == decl.shape:
                    v = np.broadcast_to(v, (i,) + v.shape)
                elif v.shape != (i,) + decl.shape:
                    raise ValueError(
                        f"property {k!r}: expected shared shape "
                        f"{decl.shape} or per-instance shape "
                        f"{(i,) + decl.shape}, got {v.shape}"
                    )
            else:
                v = np.asarray(v, np.float32)
                if v.ndim == 0 or v.shape[0] != i:
                    v = np.broadcast_to(v, (i,) + v.shape)
            props[k] = v
        return StepInputs(
            np.asarray(spawn_counts, np.int32).reshape(i),
            np.asarray(frame_seeds, np.uint32).reshape(i),
            transforms,
            props,
        )

    def step(self, pools: ParticlePool, inputs: StepInputs, sim: SimParams):
        """Advance all instances one frame; returns (pools, events_out)."""
        return self._jit_step(pools, inputs, sim)

    def _vstep(self):
        return jax.vmap(
            lambda pool, inputs, sim: self.effect._step(
                pool, inputs, sim, None, None
            ),
            in_axes=(0, 0, None),
        )

    def step_checked(self, pools: ParticlePool, inputs: StepInputs, sim: SimParams):
        """Vmapped step through a checkify-instrumented executable (index
        bounds + NaN/Inf traps; see CompiledEffect.step_checked). No
        donation — use only under ``DebugSettings.validate``."""
        if not hasattr(self, "_jit_step_checked"):
            from jax.experimental import checkify

            self._jit_step_checked = jax.jit(
                checkify.checkify(
                    self._vstep(),
                    errors=checkify.index_checks | checkify.float_checks,
                )
            )
        err, out = self._jit_step_checked(pools, inputs, sim)
        err.throw()
        return out

    def step_chunk_checked(self, pools: ParticlePool, inputs_stacked, sims_stacked):
        """Checkified K-frame x I-instance chunk (scan over vmap)."""
        if not hasattr(self, "_jit_chunk_checked"):
            from jax.experimental import checkify

            vm = self._vstep()

            def body(p, per_frame):
                inputs, sim = per_frame
                new_p, _ = vm(p, inputs, sim)
                return new_p, None

            self._jit_chunk_checked = jax.jit(
                checkify.checkify(
                    lambda p, ii, ss: jax.lax.scan(body, p, (ii, ss))[0],
                    errors=checkify.index_checks | checkify.float_checks,
                )
            )
        err, out = self._jit_chunk_checked(pools, inputs_stacked, sims_stacked)
        err.throw()
        return out

    def step_chunk(self, pools: ParticlePool, inputs_stacked, sims_stacked):
        """K frames x I instances in ONE dispatch (lax.scan over vmap).

        Leaves of ``inputs_stacked`` are [K, I, ...]; of ``sims_stacked``
        [K]. Amortizes dispatch latency like CompiledEffect.step_chunk.
        """
        if not hasattr(self, "_jit_chunk"):
            vm = jax.vmap(
                lambda pool, inputs, sim: self.effect._step(
                    pool, inputs, sim, None, None
                ),
                in_axes=(0, 0, None),
            )

            def body(p, per_frame):
                inputs, sim = per_frame
                new_p, _ = vm(p, inputs, sim)
                return new_p, None

            self._jit_chunk = jax.jit(
                lambda p, ii, ss: jax.lax.scan(body, p, (ii, ss))[0],
                donate_argnums=(0,),
            )
        return self._jit_chunk(pools, inputs_stacked, sims_stacked)

    def step_render_chunk(
        self,
        pools: ParticlePool,
        inputs_stacked,
        sims_stacked,
        camera,
        config,
        textures=(),
    ):
        """K frames x I instances stepped AND rendered in ONE dispatch.

        Mirrors :meth:`CompiledEffect.step_render_chunk` for the
        instance-blocked layout (which steps ~1.6x faster than one flat
        pool — the [I, N] tiling suits the VPU): each scan iteration runs
        the vmapped step, flattens the pools to one [I*N] draw set, and
        rasterizes all instances in a single pass (the render analogue of
        the reference batching N instances into one draw, batch.rs:92).

        GLOBAL simulation space only: world-space positions are already
        final, so flattening loses nothing. (LOCAL-space instances would
        each need their own emitter transform at render time.)
        """
        from ..asset import SimulationSpace
        from ..render.extract import extract_draw_data
        from ..render.raster import rasterize

        if self.effect.num_event_channels or self.effect.consumes_events:
            raise ValueError(
                "step_render_chunk does not support event-linked effects"
            )
        if self.asset.simulation_space == SimulationSpace.LOCAL:
            raise ValueError(
                "instanced step_render_chunk supports GLOBAL simulation "
                "space only (LOCAL instances need per-instance render "
                "transforms)"
            )
        if not hasattr(self, "_jit_render_chunk"):
            self._jit_render_chunk = {}
        fn = self._jit_render_chunk.get(config)
        if fn is None:
            from ..render.extract import flatten_instance_axis

            alpha_mode = self.asset.alpha_mode.kind
            if self.effect.layout.contains("ribbon_id") or self.asset.mesh:
                raise ValueError(
                    "instanced step_render_chunk renders quad billboards "
                    "only (ribbons/meshes: render per instance)"
                )

            def chunk(pools, ins, sims, camera, texs):
                vm = jax.vmap(
                    lambda pool, inputs, sim: self.effect._step(
                        pool, inputs, sim, None, None
                    ),
                    in_axes=(0, 0, None),
                )

                def body(carry, per_frame):
                    p, _ = carry
                    inputs, sim = per_frame
                    new_p, _ = vm(p, inputs, sim)
                    # extraction runs vmapped so render modifiers see each
                    # instance's OWN property values ([I, ...] leaves), then
                    # the [I, N] draw set flattens into one raster pass
                    draw = jax.vmap(
                        lambda pool, props: extract_draw_data(
                            self.asset,
                            pool,
                            camera,
                            sim=sim,
                            properties=props,
                            textures=list(texs),
                        )
                    )(new_p, inputs.properties)
                    draw = flatten_instance_axis(draw)
                    img = rasterize(
                        draw, camera, config,
                        alpha_mode=alpha_mode, textures=list(texs),
                    )
                    return (new_p, img), jnp.sum(img)

                img0 = jnp.zeros((config.height, config.width, 4), jnp.float32)
                (pools, img), sums = jax.lax.scan(
                    body, (pools, img0), (ins, sims)
                )
                return pools, img, sums

            fn = jax.jit(chunk, static_argnums=(), donate_argnums=(0,))
            self._jit_render_chunk[config] = fn
        return fn(pools, inputs_stacked, sims_stacked, camera, tuple(textures))

    def alive_counts(self, pools: ParticlePool) -> jnp.ndarray:
        return jnp.sum(pools.alive, axis=-1, dtype=jnp.int32)

    def total_alive(self, pools: ParticlePool):
        return jnp.sum(pools.alive, dtype=jnp.int32)

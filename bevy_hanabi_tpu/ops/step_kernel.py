"""Fused Pallas step kernel: the whole particle frame in one pass over HBM.

The XLA-built step (runtime/effect.py::_step) compiles to a dozen-plus fused
loops, each paying fixed per-kernel overhead (~0.1-0.2 ms at 1M lanes on
v5e). This kernel performs spawn-ranking + init + update + reap in a single
grid sweep: each pool tile is read from HBM into VMEM once and written once —
the speed-of-light memory profile for the step.

Key mechanics:

* The grid is sequential on a TensorCore, so the *exclusive prefix count of
  dead lanes* (the spawn ranking that replaces the reference's atomic dead
  list, vfx_init.wgsl:141) carries across tiles in SMEM scratch.
* The in-tile prefix sum runs on the MXU as two triangular matmuls
  (lanes within a row, then row offsets) — cumsum isn't lowerable in Mosaic,
  but a (R,128)x(128,128) dot is.
* Init/update modifiers and the expression graph evaluate **inside the
  kernel**: the tracing evaluator (compiler.py) is shape-agnostic, so the
  same modifier code that builds the XLA step builds the kernel body over
  VMEM-resident tiles. Per-lane PCG seeds thread through identically, so
  kernel and XLA trajectories match bit-for-bit.

Layout: every attribute is reshaped to ``[N/128, 128]`` per scalar lane
(vec3 becomes three planes), the native VPU tiling.

Limitations (assert-guarded): no GPU spawn events in or out (scene-routed
effects fall back to the XLA step).
"""

from __future__ import annotations

import functools
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..asset import MotionIntegration
from ..compiler import InitContext, SimParams, UpdateContext
from . import rng

__all__ = ["FusedStep"]

LANES = 128


def _planes(attr) -> int:
    return attr.lanes


class FusedStep:
    """Builds and calls the fused Pallas step for one CompiledEffect."""

    def __init__(self, effect, tile_rows: int = 64, interpret: bool = False,
                 vmem_limit_bytes: int = 100 * 1024 * 1024):
        if effect.num_event_channels or effect.consumes_events:
            raise ValueError("fused kernel does not support event-linked effects")
        self.effect = effect
        self.asset = effect.asset
        self.layout = effect.layout
        self.tile_rows = tile_rows
        self.interpret = interpret
        self.vmem_limit_bytes = vmem_limit_bytes

        # Stable attribute ordering and plane decomposition.
        self.attrs = list(self.layout.storage_attributes())
        self.plane_names: List[Tuple[str, int]] = []  # (attr, component)
        self.plane_dtypes: List[np.dtype] = []
        for a in self.attrs:
            for c in range(a.lanes):
                self.plane_names.append((a.name, c))
                self.plane_dtypes.append(a.np_dtype)

        # Property block layout (flattened into the f32 scalar params).
        self.prop_slots: Dict[str, Tuple[int, int]] = {}
        off = 18  # 6 sim scalars + 12 transform entries
        for name, default in self.asset.module.properties().items():
            k = int(np.atleast_1d(default.to_numpy()).size)
            self.prop_slots[name] = (off, k)
            off += k
        self.num_fparams = off

        self._jit_call = jax.jit(self._call, donate_argnums=(0,))

    # -- public -----------------------------------------------------------

    def step(self, pool, inputs, sim: SimParams):
        """Drop-in replacement for CompiledEffect.step (no events)."""
        new_pool, _ = self._jit_call(pool, inputs, sim)
        return new_pool, {}

    def step_chunk(self, pool, inputs_stacked, sims_stacked):
        def body(p, per_frame):
            i, s = per_frame
            np_, _ = self._call(p, i, s)
            return np_, None

        return jax.jit(
            lambda p, ii, ss: jax.lax.scan(body, p, (ii, ss))[0],
            donate_argnums=(0,),
        )(pool, inputs_stacked, sims_stacked)

    # -- implementation ------------------------------------------------------

    def _pack_params(self, inputs, sim: SimParams, num_free, counter):
        f = [
            jnp.float32(sim.delta_time),
            jnp.float32(sim.time),
            jnp.float32(sim.virtual_time if sim.virtual_time is not None else sim.time),
            jnp.float32(
                sim.virtual_delta_time
                if sim.virtual_delta_time is not None
                else sim.delta_time
            ),
            jnp.float32(sim.real_time if sim.real_time is not None else sim.time),
            jnp.float32(
                sim.real_delta_time
                if sim.real_delta_time is not None
                else sim.delta_time
            ),
        ]
        f.extend(jnp.ravel(jnp.asarray(inputs.transform, jnp.float32)))
        for name, (off, k) in self.prop_slots.items():
            v = inputs.properties.get(name)
            if v is None:
                v = self.asset.module.properties()[name].to_numpy()
            v = jnp.ravel(jnp.asarray(v, jnp.float32))
            f.extend([v[i] for i in range(k)])
        fparams = jnp.stack(f)
        spawn_total = jnp.minimum(
            jnp.asarray(inputs.spawn_count, jnp.int32), num_free
        )
        uparams = jnp.stack(
            [
                spawn_total.astype(jnp.uint32),
                jnp.asarray(inputs.frame_seed, jnp.uint32),
                counter.astype(jnp.uint32),
            ]
        )
        return fparams, uparams, spawn_total

    def _call(self, pool, inputs, sim: SimParams):
        n = pool.alive.shape[-1]
        rows = n // LANES
        if n % LANES != 0 or rows % self.tile_rows != 0:
            raise ValueError(
                f"pool capacity {n} must be a multiple of {LANES * self.tile_rows}"
            )
        num_free = n - jnp.sum(pool.alive, dtype=jnp.int32)
        fparams, uparams, spawn_total = self._pack_params(
            inputs, sim, num_free, pool.counter
        )

        planes = []
        for name, c in self.plane_names:
            arr = pool.attrs[name]
            p = arr if arr.ndim == 1 else arr[:, c]
            planes.append(p.reshape(rows, LANES))
        alive32 = pool.alive.astype(jnp.int32).reshape(rows, LANES)
        seed = pool.seed.reshape(rows, LANES)

        grid = (rows // self.tile_rows,)
        tile = (self.tile_rows, LANES)

        def tile_spec(i=0):
            return pl.BlockSpec(tile, lambda g: (g, 0), memory_space=pltpu.VMEM)

        num_planes = len(planes)
        in_specs = (
            [pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
            + [tile_spec() for _ in range(num_planes + 2)]
        )
        out_specs = tuple(tile_spec() for _ in range(num_planes + 2))
        out_shape = tuple(
            jax.ShapeDtypeStruct((rows, LANES), dt) for dt in self.plane_dtypes
        ) + (
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.uint32),
        )

        kernel = functools.partial(self._kernel, num_planes=num_planes)
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=self.vmem_limit_bytes
            ),
            interpret=self.interpret,
        )(fparams, uparams, *planes, alive32, seed)

        new_planes = outs[:num_planes]
        new_alive = outs[num_planes].astype(jnp.bool_).reshape(n)
        new_seed = outs[num_planes + 1].reshape(n)

        # reassemble SoA attrs
        new_attrs = {}
        i = 0
        for a in self.attrs:
            if a.lanes == 1:
                new_attrs[a.name] = new_planes[i].reshape(n)
                i += 1
            else:
                comps = [new_planes[i + c].reshape(n) for c in range(a.lanes)]
                new_attrs[a.name] = jnp.stack(comps, axis=-1)
                i += a.lanes

        from ..runtime.pool import ParticlePool

        new_pool = ParticlePool(
            attrs=new_attrs,
            alive=new_alive,
            seed=new_seed,
            counter=pool.counter + spawn_total.astype(jnp.uint32),
        )
        return new_pool, {}

    # -- kernel body -----------------------------------------------------------

    def _kernel(self, fparams, uparams, *refs, num_planes):
        carry = refs[-1]
        out_refs = refs[num_planes + 2 : -1]
        plane_refs = refs[:num_planes]
        alive_ref = refs[num_planes]
        seed_ref = refs[num_planes + 1]

        g = pl.program_id(0)

        @pl.when(g == 0)
        def _():
            carry[0] = 0

        R = self.tile_rows

        # Mosaic only allows *scalar* captured constants: rebuild any array
        # constant (vector literals, attribute defaults) from its scalar
        # elements plus a traced zero so it becomes a traced value.
        tzero = (g * 0).astype(jnp.int32)

        def materialize(arr):
            if isinstance(arr, jax.core.Tracer):
                return arr  # already traced: nothing to rebuild
            arr = np.asarray(arr)
            flat = [
                jnp.asarray(x, arr.dtype) + tzero.astype(arr.dtype)
                if arr.dtype != np.bool_
                else jnp.asarray(x, arr.dtype)
                for x in arr.reshape(-1).tolist()
            ]
            return jnp.stack(flat).reshape(arr.shape)
        dt = fparams[0]
        sim = SimParams(
            delta_time=fparams[0],
            time=fparams[1],
            virtual_time=fparams[2],
            virtual_delta_time=fparams[3],
            real_time=fparams[4],
            real_delta_time=fparams[5],
        )
        transform = jnp.stack([fparams[6 + i] for i in range(12)]).reshape(3, 4)
        properties = {}
        for name, (off, k) in self.prop_slots.items():
            if k == 1:
                properties[name] = fparams[off]
            else:
                properties[name] = jnp.stack([fparams[off + j] for j in range(k)])

        spawn_total = uparams[0].astype(jnp.int32)
        frame_seed = uparams[1]
        counter_base = uparams[2]

        alive = alive_ref[:] > 0  # (R,128) bool
        dead = jnp.logical_not(alive)

        # ---- exclusive rank of dead lanes: MXU triangular scans ----
        x = dead.astype(jnp.float32)
        ut = (
            jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
            <= jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
        ).astype(jnp.float32)
        incl = jnp.dot(x, ut, preferred_element_type=jnp.float32)
        row_sums = incl[:, LANES - 1 : LANES]
        lt = (
            jax.lax.broadcasted_iota(jnp.int32, (R, R), 1)
            < jax.lax.broadcasted_iota(jnp.int32, (R, R), 0)
        ).astype(jnp.float32)
        row_off = jnp.dot(lt, row_sums, preferred_element_type=jnp.float32)
        rank = (incl - x + row_off).astype(jnp.int32) + carry[0]
        carry[0] = carry[0] + jnp.sum(x).astype(jnp.int32)

        spawn_mask = jnp.logical_and(dead, rank < spawn_total)

        # ---- init (vfx_init.wgsl analogue, see effect.py) ----
        spawn_seed = rng.initial_seed(
            rank.astype(jnp.uint32), rng.pcg_hash(frame_seed)
        )
        # global slot index of each lane
        base = (g * R) * LANES
        slot_ids = (
            base
            + jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 0) * LANES
            + jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1)
        ).astype(jnp.uint32)

        defaults: Dict[str, jnp.ndarray] = {}
        for a in self.attrs:
            dv = np.asarray(a.default_numpy())
            if a.lanes == 1:
                defaults[a.name] = jnp.broadcast_to(
                    materialize(dv.reshape(1))[0], (R, LANES)
                ).astype(a.np_dtype)
            else:
                defaults[a.name] = jnp.broadcast_to(
                    materialize(dv), (R, LANES, a.lanes)
                ).astype(a.np_dtype)
        if "particle_counter" in defaults:
            defaults["particle_counter"] = counter_base + rank.astype(jnp.uint32)

        ictx = InitContext(
            self.asset.module,
            defaults,
            spawn_seed,
            sim=sim,
            properties=properties,
            particle_index=slot_ids,
            constant_hook=materialize,
        )
        for m in self.asset.init_modifiers:
            m.apply(self.asset.module, ictx)

        if self.effect._global_space:
            # elementwise 3x3 transform (Mosaic-safe: no 3-D dot_general)
            def xform(v, translate):
                comps = [
                    fparams[6 + 4 * i + 0] * v[..., 0]
                    + fparams[6 + 4 * i + 1] * v[..., 1]
                    + fparams[6 + 4 * i + 2] * v[..., 2]
                    + (fparams[6 + 4 * i + 3] if translate else 0.0)
                    for i in range(3)
                ]
                return jnp.stack(comps, axis=-1)

            if "position" in ictx.particle:
                ictx.particle["position"] = xform(ictx.particle["position"], True)
            if "velocity" in ictx.particle:
                ictx.particle["velocity"] = xform(ictx.particle["velocity"], False)

        # ---- merge spawned lanes with current state ----
        # (per-plane 2-D selects: Mosaic can't insert a minor dim on i1 masks)
        particle: Dict[str, jnp.ndarray] = {}
        idx = 0
        for a in self.attrs:
            new = ictx.particle[a.name]
            if a.lanes == 1:
                particle[a.name] = jnp.where(spawn_mask, new, plane_refs[idx][:])
                idx += 1
            else:
                comps = [
                    jnp.where(spawn_mask, new[..., c], plane_refs[idx + c][:])
                    for c in range(a.lanes)
                ]
                particle[a.name] = jnp.stack(comps, axis=-1)
                idx += a.lanes
        seed = jnp.where(spawn_mask, ictx.seed, seed_ref[:])
        alive = jnp.logical_or(alive, spawn_mask)

        # ---- update (vfx_update.wgsl analogue) ----
        uctx = UpdateContext(
            self.asset.module,
            particle,
            seed,
            sim=sim,
            properties=properties,
            particle_index=slot_ids,
            alive=alive,
            constant_hook=materialize,
        )
        if self.effect._has_age:
            uctx.particle["age"] = uctx.particle["age"] + dt
        if self.effect._has_age and self.effect._has_lifetime:
            uctx.alive = jnp.logical_and(
                uctx.alive, uctx.particle["age"] < uctx.particle["lifetime"]
            )
        mi = self.asset.motion_integration
        if self.effect._integrate and mi is MotionIntegration.PRE_UPDATE:
            uctx.particle["position"] = (
                uctx.particle["position"] + uctx.particle["velocity"] * dt
            )
        for m in self.asset.update_modifiers:
            m.apply(self.asset.module, uctx)
        if self.effect._integrate and mi is MotionIntegration.POST_UPDATE:
            uctx.particle["position"] = (
                uctx.particle["position"] + uctx.particle["velocity"] * dt
            )

        # ---- store ----
        idx = 0
        for a in self.attrs:
            v = uctx.particle[a.name]
            if a.lanes == 1:
                out_refs[idx][:] = v.astype(a.np_dtype)
                idx += 1
            else:
                for c in range(a.lanes):
                    out_refs[idx + c][:] = v[..., c].astype(a.np_dtype)
                idx += a.lanes
        out_refs[num_planes][:] = uctx.alive.astype(jnp.int32)
        out_refs[num_planes + 1][:] = uctx.seed

"""Compiled effect: asset → one fused, jitted simulation step.

This is the TPU replacement for the reference's whole GPU frame
(``simulate()``, render/mod.rs:6942-7613): where the reference records five
compute passes (fill-dispatch → init → indirect bookkeeping → prefix-sum →
update) connected through storage buffers and atomics, here **one jitted
function** does spawn + init + update + reap + event emission in a single
fused pass over the pool. XLA fuses the whole thing into a few HBM-bandwidth
bound loops; counts stay on device (no readback, matching the reference's
zero-readback design).

Spawn without atomics (vfx_init.wgsl:141-143's dead-list pop):
  dead lanes are ranked by exclusive cumsum; lanes with rank < S become this
  frame's spawns; their per-lane PCG seed is ``pcg_hash(rank ^ frame_seed)``
  exactly like vfx_init.wgsl:154, so trajectories are reproducible.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..asset import EffectAsset, MotionIntegration, SimulationSpace
from ..attributes import ParticleLayout
from ..compiler import InitContext, SimParams, UpdateContext
from ..ops import rng
from .events import EventBuffer, build_event_buffer, consume_events
from .pool import ParticlePool

__all__ = ["CompiledEffect", "StepInputs", "identity_transform"]


from ..ops.compaction import exclusive_rank as _exclusive_rank  # noqa: E402


def identity_transform() -> np.ndarray:
    """Emitter transform: rows of a 3x4 [R|t] matrix (GpuCompressedTransform
    analogue, render/mod.rs:291). Host-side numpy: per-frame inputs stay on
    the host until the jit boundary (one transfer per dispatch; building
    them as device arrays costs a tunnel round-trip per leaf on axon)."""
    return np.concatenate(
        [np.eye(3, dtype=np.float32), np.zeros((3, 1), np.float32)], axis=1
    )


class StepInputs(NamedTuple):
    """Per-frame host→device inputs for one effect instance.

    The only CPU→TPU traffic per frame (reference: GpuSpawnerParams upload,
    render/mod.rs:2998): a spawn count, a fresh 32-bit seed (the reference
    re-rolls the spawner PRNG seed each frame, lib.rs:1813-1820), the emitter
    transform, and property values.
    """

    spawn_count: Any  # int32[]
    frame_seed: Any  # uint32[]
    transform: Any  # f32[3,4]
    properties: Dict[str, Any]

    @staticmethod
    def make(spawn_count=0, frame_seed=0, transform=None, properties=None) -> "StepInputs":
        # Host numpy, not device arrays: inputs cross to the device once at
        # the jit call (building jnp arrays here costs a tunnel round-trip
        # per leaf per frame on axon — measured 10.9s vs 40ms for a
        # 60-frame chunk's inputs).
        return StepInputs(
            np.asarray(spawn_count, np.int32),
            np.asarray(frame_seed, np.uint32),
            transform if transform is not None else identity_transform(),
            dict(properties or {}),
        )


class CompiledEffect:
    """An :class:`EffectAsset` compiled to a jitted step function.

    One XLA executable per asset signature — the analogue of the reference's
    per-effect pipeline specialization + ShaderCache (lib.rs:1352-1555).
    Use :meth:`get` to share compilations between instances of the same
    asset (the ShaderCache dedupe, render/shader_cache.rs:18-62).
    """

    _CACHE: "dict" = {}

    @staticmethod
    def get(
        asset: EffectAsset,
        parent_layout: Optional[ParticleLayout] = None,
        parent_const_count: Optional[int] = None,
        payload_attrs: Optional[tuple] = None,
        mesh=None,
    ) -> "CompiledEffect":
        key = (
            asset.signature(),
            parent_layout.signature() if parent_layout else None,
            parent_const_count,
            payload_attrs,
            mesh,
        )
        fx = CompiledEffect._CACHE.get(key)
        if fx is None:
            fx = CompiledEffect(
                asset, parent_layout, parent_const_count, payload_attrs,
                mesh=mesh,
            )
            CompiledEffect._CACHE[key] = fx
        return fx

    def __init__(
        self,
        asset: EffectAsset,
        parent_layout: Optional[ParticleLayout] = None,
        parent_const_count: Optional[int] = None,
        payload_attrs: Optional[tuple] = None,
        mesh=None,
    ) -> None:
        self.asset = asset
        self.layout = asset.particle_layout()
        # Layout validation mirrors EffectShaderSources::generate
        # (lib.rs:840: POSITION is mandatory; lib.rs:849: ribbons need AGE)
        # so a bad asset fails loudly at compile, not obscurely at render.
        if not self.layout.contains("position"):
            raise ValueError(
                f"the particle layout of effect {asset.name!r} is missing "
                "the POSITION attribute — add a position-writing init "
                "modifier (e.g. SetPositionSphereModifier or "
                "SetAttributeModifier(A.POSITION, ...))"
            )
        if self.layout.contains("ribbon_id") and not self.layout.contains("age"):
            raise ValueError(
                f"effect {asset.name!r} uses RIBBON_ID, which requires the "
                "AGE attribute for segment ordering"
            )
        self.parent_layout = parent_layout
        self.consumes_events = parent_layout is not None
        # Compile-time-constant emit count of the parent channel this child
        # consumes (None = data-dependent): unlocks the arithmetic
        # rank->event map in consume_events.
        self.parent_const_count = parent_const_count
        # Restrict emitted event payloads to these attribute names (None =
        # capture all storage attributes). Each captured attribute costs a
        # ~0.35 ms/frame scatter at 64k on v5e; HanabiScene maintains this
        # as the union of every attached child's inherited attributes (a
        # typical child inherits 1 of the parent's ~7). Callers using a
        # restriction directly must guarantee every consumer's inherited
        # attributes are included.
        self.payload_attrs = (
            tuple(sorted(payload_attrs)) if payload_attrs is not None else None
        )
        self.num_event_channels = asset.num_event_channels()

        # Pool-axis sharding over a jax.sharding.Mesh: the particle axis
        # shards over ALL mesh axes combined (a single effect has no
        # instance axis to give dp). Event compaction then runs
        # SHARD-LOCALLY (one lax.sort per shard, zero communication) and
        # the flattened buffer keeps each shard's compacted prefix in
        # place, separated by zero-count gaps; the child's rank->event map
        # (consume_events' cumulative-count search) skips the gaps by
        # construction, so trajectories are bit-identical to the
        # single-device build. This is the cross-shard analogue of the
        # reference's per-child event buffers (event.rs:248 +
        # vfx_init.wgsl:123-171), with GSPMD inserting the all_gather of
        # the (small) compacted payload columns on the consume side.
        self.mesh = mesh
        if mesh is not None:
            self._mesh_axes = tuple(mesh.axis_names)
            self.event_shards = int(
                np.prod([mesh.shape[a] for a in mesh.axis_names])
            )
            if asset.capacity % self.event_shards:
                raise ValueError(
                    f"effect capacity {asset.capacity} not divisible by the "
                    f"mesh device count {self.event_shards}"
                )
        else:
            self._mesh_axes = ()
            self.event_shards = 1

        # attributes actually read from the parent (InheritAttributeModifier
        # + parent_attr expression reads): payload gathers are limited to
        # these — a child typically inherits 1-2 of the parent's attributes
        inherited = set()
        if self.consumes_events:
            from ..modifiers.attr import InheritAttributeModifier

            for m in (
                asset.init_modifiers
                + asset.update_modifiers
                + asset.render_modifiers
            ):
                if isinstance(m, InheritAttributeModifier):
                    inherited.add(m.attribute)
            for i in range(1, len(asset.module) + 1):
                if asset.module.get(i).kind == "parent_attribute":
                    inherited.add(asset.module.get(i).name)
        self._inherited_attrs = tuple(sorted(inherited))

        has = self.layout.contains
        self._has_age = has("age")
        self._has_lifetime = has("lifetime")
        self._integrate = (
            asset.motion_integration is not MotionIntegration.NONE
            and has("position")
            and has("velocity")
        )
        self._global_space = asset.simulation_space is SimulationSpace.GLOBAL

        # jit once per instance; donate the pool so stepping is in-place in
        # HBM (no copy of a potentially multi-GB pool).
        self._jit_step = jax.jit(self._step, donate_argnums=(0,))
        self._jit_step_chunk = jax.jit(self._step_chunk, donate_argnums=(0,))
        self._jit_render_chunk: Dict[Any, Any] = {}
        # checkify-instrumented executables, built lazily on first validated
        # use (DebugSettings.validate) — zero cost when validation is off
        self._jit_step_checked = None
        self._jit_step_chunk_checked = None

    # -- pool ------------------------------------------------------------

    def _leaf_sharding(self, x):
        """NamedSharding for a pool/event leaf: leading (particle/event)
        axis over every mesh axis, scalars replicated."""
        from jax.sharding import NamedSharding, PartitionSpec

        x = jnp.asarray(x)
        if x.ndim == 0:
            return NamedSharding(self.mesh, PartitionSpec())
        return NamedSharding(
            self.mesh,
            PartitionSpec(self._mesh_axes, *([None] * (x.ndim - 1))),
        )

    def create_pool(self, capacity: Optional[int] = None, poison: bool = False) -> ParticlePool:
        capacity = capacity or self.asset.capacity
        if self.mesh is not None and capacity % self.event_shards:
            raise ValueError(
                f"pool capacity {capacity} not divisible by the mesh device "
                f"count {self.event_shards}"
            )
        pool = ParticlePool.create(self.layout, capacity, poison=poison)
        if self.mesh is not None:
            pool = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, self._leaf_sharding(x)), pool
            )
        return pool

    def make_empty_events(self, capacity: Optional[int] = None) -> EventBuffer:
        """Empty event buffer shaped for THIS effect's emissions (payload
        restricted to ``payload_attrs``), committed to the mesh when the
        effect is sharded so the consumer's first frame compiles with the
        same sharding signature as every later frame."""
        buf = EventBuffer.empty(
            capacity or self.asset.capacity,
            self.layout,
            attrs=self.payload_attrs,
        )
        if self.mesh is not None:
            buf = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, self._leaf_sharding(x)), buf
            )
        return buf

    # -- public step -------------------------------------------------------

    def step(
        self,
        pool: ParticlePool,
        inputs: StepInputs,
        sim: SimParams,
        events_in: Optional[EventBuffer] = None,
        parent_pool: Optional[ParticlePool] = None,
    ):
        """Advance one frame. Returns ``(pool, events_out)`` where
        ``events_out`` is a dict channel→EventBuffer for child effects."""
        return self._jit_step(pool, inputs, sim, events_in, parent_pool)

    def step_checked(
        self,
        pool: ParticlePool,
        inputs: StepInputs,
        sim: SimParams,
        events_in: Optional[EventBuffer] = None,
        parent_pool: Optional[ParticlePool] = None,
    ):
        """Advance one frame through a checkify-instrumented executable
        (debug-mode validation, ≈ wgpu VALIDATION layers in the
        reference's debug/test builds, test_utils.rs:150): every gather is
        bounds-checked and every float op traps NaN/Inf production, so a
        poison read (0xFFFFFFFF == f32 NaN, effect_cache.rs:270-296) or a
        bad index raises ``JaxRuntimeError`` at the offending frame.
        Separate executable (no donation, extra error state): use only
        under ``DebugSettings.validate``."""
        if self._jit_step_checked is None:
            from jax.experimental import checkify

            self._jit_step_checked = jax.jit(
                checkify.checkify(
                    self._step,
                    errors=checkify.index_checks | checkify.float_checks,
                )
            )
        err, out = self._jit_step_checked(
            pool, inputs, sim, events_in, parent_pool
        )
        err.throw()
        return out

    def step_chunk(self, pool: ParticlePool, inputs_stacked: StepInputs, sims_stacked: SimParams):
        """Advance K frames in ONE device dispatch via ``lax.scan``.

        ``inputs_stacked``/``sims_stacked`` have a leading [K] axis on every
        leaf (stack per-frame StepInputs/SimParams). Amortizes host↔device
        dispatch latency over K frames — the TPU equivalent of the
        reference's recording many compute passes into one command encoder
        (render/mod.rs:6942). Only valid for effects without event channels
        (events need scene-level routing between dispatches).
        """
        if self.num_event_channels or self.consumes_events:
            raise ValueError("step_chunk does not support event-linked effects")
        return self._jit_step_chunk(pool, inputs_stacked, sims_stacked)

    def step_chunk_checked(self, pool, inputs_stacked, sims_stacked):
        """K-frame chunk through a checkify-instrumented scan (see
        :meth:`step_checked`): checkify composes with ``lax.scan``, so a
        poison read or bad index raises at the offending chunk instead of
        silently corrupting K frames. Separate executable, no donation —
        use only under ``DebugSettings.validate``."""
        if self.num_event_channels or self.consumes_events:
            raise ValueError("step_chunk does not support event-linked effects")
        if self._jit_step_chunk_checked is None:
            from jax.experimental import checkify

            self._jit_step_chunk_checked = jax.jit(
                checkify.checkify(
                    self._step_chunk,
                    errors=checkify.index_checks | checkify.float_checks,
                )
            )
        err, out = self._jit_step_chunk_checked(
            pool, inputs_stacked, sims_stacked
        )
        err.throw()
        return out

    def _step_chunk(self, pool, inputs_stacked, sims_stacked):
        def body(p, per_frame):
            inputs, sim = per_frame
            new_pool, _ = self._step(p, inputs, sim, None, None)
            return new_pool, None

        pool, _ = jax.lax.scan(body, pool, (inputs_stacked, sims_stacked))
        return pool

    def step_render_chunk(
        self,
        pool: ParticlePool,
        inputs_stacked: StepInputs,
        sims_stacked,
        camera,
        config,
        textures=(),
    ):
        """Advance K frames AND render each one, all in ONE device dispatch.

        The full reference frame is compute + draw (render/mod.rs:6942 then
        :6607-6846); this is its chunked TPU analogue: ``lax.scan`` over K
        frames where every iteration steps the pool, runs the render
        modifiers (extract), and rasterizes. Returns
        ``(pool, last_image, checksums)`` where ``checksums`` is a [K] array
        of per-frame framebuffer sums — each frame's raster feeds an output,
        so XLA cannot elide any per-frame draw.
        """
        if self.num_event_channels or self.consumes_events:
            raise ValueError(
                "step_render_chunk does not support event-linked effects"
            )
        fn = self._jit_render_chunk.get(config)
        if fn is None:
            from ..render.extract import extract_draw_data
            from ..render.raster import rasterize

            alpha_mode = self.asset.alpha_mode.kind
            has_ribbons = self.layout.contains("ribbon_id")
            mesh = self.asset.mesh

            def chunk(pool, ins, sims, camera, texs):
                def render(p, inputs, sim):
                    draw = extract_draw_data(
                        self.asset,
                        p,
                        camera,
                        sim=sim,
                        properties=inputs.properties,
                        textures=list(texs),
                        transform=inputs.transform,
                    )
                    if has_ribbons:
                        from ..render.ribbon import build_ribbon_segments

                        draw = build_ribbon_segments(draw, camera)
                    elif mesh is not None:
                        from ..render.mesh import expand_mesh_draw

                        draw = expand_mesh_draw(draw, mesh)
                    return rasterize(
                        draw,
                        camera,
                        config,
                        alpha_mode=alpha_mode,
                        textures=list(texs),
                    )

                def body(carry, per_frame):
                    p, _ = carry
                    inputs, sim = per_frame
                    new_pool, _ = self._step(p, inputs, sim, None, None)
                    img = render(new_pool, inputs, sim)
                    return (new_pool, img), jnp.sum(img)

                img0 = jnp.zeros(
                    (config.height, config.width, 4), jnp.float32
                )
                (pool, img), sums = jax.lax.scan(
                    body, (pool, img0), (ins, sims)
                )
                return pool, img, sums

            fn = jax.jit(chunk, donate_argnums=(0,))
            self._jit_render_chunk[config] = fn
        return fn(pool, inputs_stacked, sims_stacked, camera, tuple(textures))

    @staticmethod
    def make_family_chunk_step(members, checked: bool = False):
        """Build a jitted K-frame scan over an event-linked effect tree.

        ``members``: topologically ordered (parents first) sequence of
        ``(fx, parent_index, channel)`` — ``parent_index`` indexes into
        ``members`` (None for roots); ``channel`` is the event channel the
        member consumes from its parent. Returns
        ``fn(carry, member_inputs_K, sims_K) -> (pools, pendings)`` where
        ``carry = (tuple(pools), tuple(pendings))`` and ``pendings[i]`` is
        member i's emitted-events dict ``{channel: EventBuffer}``.

        Within each frame every member consumes its parent's PREVIOUS-frame
        buffer (the reference's one-frame latency, vfx_init.wgsl:123-129)
        from the scan carry and contributes its own emissions back to it,
        so an arbitrary-depth tree advances K frames in ONE device dispatch.
        Members inherit from event payloads, never from live parent pools,
        which is what makes the fused scan legal.

        ``checked=True`` returns a checkify-instrumented variant (index
        bounds + NaN/Inf traps through the whole family scan, no
        donation) for ``DebugSettings.validate``.
        """
        fxs = tuple(m[0] for m in members)
        parent_idx = tuple(m[1] for m in members)
        chans = tuple(m[2] for m in members)

        def fam_chunk(carry, member_inputs, sims):
            def body(c, per_frame):
                pools, pendings = c
                m_ins, sim = per_frame
                new_pools, new_pendings = [], []
                for i, fx in enumerate(fxs):
                    ev_in = (
                        None
                        if parent_idx[i] is None
                        else pendings[parent_idx[i]][chans[i]]
                    )
                    pool, ev_out = fx._step(pools[i], m_ins[i], sim, ev_in, None)
                    new_pools.append(pool)
                    new_pendings.append(ev_out)
                return (tuple(new_pools), tuple(new_pendings)), None

            (pools, pendings), _ = jax.lax.scan(body, carry, (member_inputs, sims))
            return pools, pendings

        if checked:
            from jax.experimental import checkify

            cfn = jax.jit(
                checkify.checkify(
                    fam_chunk,
                    errors=checkify.index_checks | checkify.float_checks,
                )
            )

            def checked_fn(carry, member_inputs, sims):
                err, out = cfn(carry, member_inputs, sims)
                err.throw()
                return out

            return checked_fn
        return jax.jit(fam_chunk, donate_argnums=(0,))

    @staticmethod
    def stack_frames(inputs_list, sims_list):
        """Stack per-frame StepInputs/SimParams into scan-ready pytrees.

        Stacking happens on the HOST (numpy): the stacked arrays transfer to
        the device once when the chunk dispatches. Per-leaf jnp.stack here
        would issue hundreds of tiny device ops over the axon tunnel.
        """
        inputs = jax.tree_util.tree_map(
            lambda *xs: np.stack([np.asarray(x) for x in xs]), *inputs_list
        )
        sims = jax.tree_util.tree_map(
            lambda *xs: np.stack([np.asarray(x, np.float32) for x in xs]),
            *sims_list,
        )
        return inputs, sims

    # -- traced body ---------------------------------------------------------

    def _step(
        self,
        pool: ParticlePool,
        inputs: StepInputs,
        sim: SimParams,
        events_in: Optional[EventBuffer],
        parent_pool: Optional[ParticlePool],
    ):
        n = pool.alive.shape[-1]
        slot_ids = jnp.arange(n, dtype=jnp.uint32)

        # ---- spawn ranking (replaces dead-list atomics) ----
        dead = jnp.logical_not(pool.alive)
        free_rank = _exclusive_rank(dead)  # 0-based among dead
        num_free = jnp.sum(dead, dtype=jnp.int32)

        parent_payload: Dict[str, jnp.ndarray] = {}
        if self.consumes_events:
            if events_in is None:
                raise ValueError(
                    f"effect {self.asset.name!r} consumes GPU spawn events; "
                    "pass events_in"
                )
            parent_slot, requested, parent_payload = consume_events(
                events_in,
                free_rank,
                attrs=self._inherited_attrs,
                const_count=self.parent_const_count,
            )
        else:
            parent_slot = jnp.zeros((n,), jnp.uint32)
            requested = inputs.spawn_count

        spawn_total = jnp.minimum(requested, num_free)
        spawn_mask = jnp.logical_and(dead, free_rank < spawn_total)

        # ---- init pass (vfx_init.wgsl analogue) ----
        # Per-lane seed: pcg(local_spawn_index ^ hash(frame_seed)). The
        # reference uses pcg(index ^ spawner.seed) with a spawner seed
        # re-rolled randomly each frame (vfx_init.wgsl:154, lib.rs:1813-1820);
        # hashing here keeps draws decorrelated even when callers pass frame
        # counters as seeds (rank ^ counter collides constantly otherwise).
        spawn_seed = rng.initial_seed(
            free_rank.astype(jnp.uint32), rng.pcg_hash(inputs.frame_seed)
        )

        defaults: Dict[str, jnp.ndarray] = {}
        for a in self.layout.storage_attributes():
            shape = (n,) if a.lanes == 1 else (n, a.lanes)
            defaults[a.name] = jnp.broadcast_to(
                jnp.asarray(a.default_numpy()), shape
            ).astype(a.np_dtype)
        if "particle_counter" in defaults:
            defaults["particle_counter"] = pool.counter + free_rank.astype(jnp.uint32)

        # Inherited attributes come from the event payload (captured at
        # emission — immune to parent slot recycling); a parent_pool gather
        # remains as fallback for payload-less buffers.
        parent_particle = None
        if self.consumes_events and self._inherited_attrs:
            if parent_payload:
                parent_particle = parent_payload
            elif parent_pool is not None:
                parent_particle = {
                    k: parent_pool.attrs[k][parent_slot]
                    for k in self._inherited_attrs
                    if k in parent_pool.attrs
                }

        ictx = InitContext(
            self.asset.module,
            defaults,
            spawn_seed,
            sim=sim,
            properties=inputs.properties,
            parent_particle=parent_particle,
            particle_index=slot_ids,
        )
        for m in self.asset.init_modifiers:
            m.apply(self.asset.module, ictx)

        # Emitter transform (global sim space): position w=1, velocity w=0
        # (vfx_init.wgsl:186-188). Broadcast math, NOT `@`: a tiny matmul
        # hits the MXU at bf16 default precision and quantized spawn state
        # to ~2^-11 rel (ops/linalg.py).
        if self._global_space:
            from ..ops.linalg import affine3, rotate3

            rot = inputs.transform[:, :3]
            tr = inputs.transform[:, 3]
            if "position" in ictx.particle:
                ictx.particle["position"] = affine3(
                    ictx.particle["position"], rot, tr
                )
            if "velocity" in ictx.particle:
                ictx.particle["velocity"] = rotate3(
                    ictx.particle["velocity"], rot
                )

        # Merge spawned lanes into the pool.
        new_attrs = {}
        for name, old in pool.attrs.items():
            new = ictx.particle[name]
            m = spawn_mask if old.ndim == 1 else spawn_mask[:, None]
            new_attrs[name] = jnp.where(m, new, old)
        seed = jnp.where(spawn_mask, ictx.seed, pool.seed)
        alive = jnp.logical_or(pool.alive, spawn_mask)
        counter = pool.counter + spawn_total.astype(jnp.uint32)

        # ---- update pass (vfx_update.wgsl analogue) ----
        uctx = UpdateContext(
            self.asset.module,
            new_attrs,
            seed,
            sim=sim,
            properties=inputs.properties,
            particle_index=slot_ids,
            alive=alive,
        )
        dt = jnp.float32(sim.delta_time)
        if self._has_age:
            uctx.particle["age"] = uctx.particle["age"] + dt
        if self._has_age and self._has_lifetime:
            uctx.alive = jnp.logical_and(
                uctx.alive, uctx.particle["age"] < uctx.particle["lifetime"]
            )
        if self._integrate and (
            self.asset.motion_integration is MotionIntegration.PRE_UPDATE
        ):
            uctx.particle["position"] = (
                uctx.particle["position"] + uctx.particle["velocity"] * dt
            )
        for m in self.asset.update_modifiers:
            m.apply(self.asset.module, uctx)
        if self._integrate and (
            self.asset.motion_integration is MotionIntegration.POST_UPDATE
        ):
            uctx.particle["position"] = (
                uctx.particle["position"] + uctx.particle["velocity"] * dt
            )

        # ---- emitted events, aggregated per channel ----
        events_out: Dict[int, EventBuffer] = {}
        if self.num_event_channels:
            per_channel: Dict[int, jnp.ndarray] = {}
            for channel, mask, count in uctx.events_out:
                contrib = jnp.where(mask, count, 0).astype(jnp.uint32)
                per_channel[channel] = per_channel.get(channel, 0) + contrib
            if self.payload_attrs is None:
                captured = uctx.particle
            else:
                captured = {
                    k: uctx.particle[k]
                    for k in self.payload_attrs
                    if k in uctx.particle
                }
            for channel in range(self.num_event_channels):
                counts = per_channel.get(channel)
                if counts is None:
                    events_out[channel] = EventBuffer.empty(
                        n, self.layout, attrs=self.payload_attrs
                    )
                elif self.event_shards > 1:
                    events_out[channel] = self._build_events_sharded(
                        counts, captured, n
                    )
                else:
                    events_out[channel] = build_event_buffer(
                        counts > 0, counts, parent_attrs=captured
                    )

        new_pool = ParticlePool(
            attrs=uctx.particle,
            alive=uctx.alive,
            seed=uctx.seed,
            counter=counter,
        )
        return new_pool, events_out

    def _build_events_sharded(self, counts, captured, n: int) -> EventBuffer:
        """Per-shard event compaction for a mesh-sharded pool.

        Each shard compacts its own (count, payload) lanes locally — the
        stable lax.sort partitions trivially along the shard axis, so the
        build stays communication-free — then the shards' compacted
        prefixes flatten back in place: the buffer holds
        ``[act_0.. gap_0.. act_1.. gap_1..]`` with ``count == 0`` in every
        gap row and GLOBAL parent slots. The consumer's cumulative-count
        rank->event map counts a zero-count row toward every rank at or
        past its boundary, which steps the index past the gap — so rank k
        lands on the k-th positive-count event in slot order, exactly as
        with the dense single-device buffer (bit-identical trajectories).
        The one consumer-side restriction: the ``const_count`` arithmetic
        shortcut assumes a dense prefix, so children of sharded parents
        must use the general path (HanabiScene passes
        ``parent_const_count=None`` for them).
        """
        from jax.sharding import NamedSharding, PartitionSpec

        S = self.event_shards
        if n % S:
            raise ValueError(
                f"pool capacity {n} not divisible by {S} event shards"
            )
        L = n // S

        def constrain(x):
            if self.mesh is None:
                return x
            spec = PartitionSpec(
                self._mesh_axes, *([None] * (x.ndim - 1))
            )
            return jax.lax.with_sharding_constraint(
                x, NamedSharding(self.mesh, spec)
            )

        def shard2(x):
            return constrain(x.reshape((S, L) + x.shape[1:]))

        buf = jax.vmap(
            lambda c, at: build_event_buffer(c > 0, c, parent_attrs=at)
        )(shard2(counts), {k: shard2(v) for k, v in captured.items()})
        base = (jnp.arange(S, dtype=jnp.uint32) * jnp.uint32(L))[:, None]

        def unshard(x):
            return constrain(x.reshape((n,) + x.shape[2:]))

        return EventBuffer(
            unshard(buf.parent_slot + base),
            unshard(buf.count),
            jnp.sum(buf.num_events),
            {k: unshard(v) for k, v in buf.payload.items()},
        )

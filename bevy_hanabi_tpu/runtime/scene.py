"""Scene orchestration: many effects, parent/child event routing, rendering.

The TPU analogue of the reference's main-world ECS systems + render-world
orchestration (plugin.rs:219-246, render/mod.rs extract/prepare/queue): a
host-side registry of effect instances that each frame ticks spawners,
routes last frame's GPU spawn events from parents to children (the same
one-frame latency as the reference, vfx_init.wgsl:123-129), steps every
instance's jitted function, and composites renders back-to-front.

There is no pipeline-readiness protocol (render/mod.rs:4086-4121): XLA
compilation is synchronous at first use, so a ``warmup()`` that steps once
with zero spawns replaces the whole ready-state machinery.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..asset import EffectAsset, SimulationCondition, SimulationSpace
from ..properties import EffectProperties, Property
from ..spawn import EffectSpawner
from ..time import EffectSimulationClock
from .effect import CompiledEffect, StepInputs, identity_transform
from .events import EventBuffer
from .pool import ParticlePool

__all__ = ["HanabiScene", "EffectInstance"]


def _replicate_pool(pool, mesh):
    """Replicate a sharded pool (or [I, N, ...] pools pytree) onto every
    device of ``mesh`` — one all_gather over ICI — so downstream rendering
    runs the IDENTICAL single-device algorithm bit-exactly: leaving the
    pool sharded lets GSPMD repartition the raster sort and break depth
    ties differently under the per-tile blend budget. This is the cost the
    reference's single-GPU draw pays implicitly."""
    import jax as _jax
    from jax.sharding import NamedSharding, PartitionSpec

    return _jax.device_put(pool, NamedSharding(mesh, PartitionSpec()))


def _texture_key(texs):
    """Cache-key identity for textures baked into traced closures.

    The scene's jitted render/chunk builders close over texture arrays as
    compile-time constants, so swapping an instance's texture — even for one
    of identical shape — must produce a different cache key or the stale
    constant keeps rendering. ``id()`` identifies the baked object (device
    arrays are immutable; re-adding a texture makes a new object). In-place
    mutation of a HOST numpy texture is the one case this cannot see — the
    asset-drift warning covers deliberate mutation."""
    return tuple(
        (tuple(t.shape), str(getattr(t, "dtype", "")), id(t)) for t in texs
    )


def _convert_textures_shared(lists):
    """float32 device conversions with ONE conversion per original object,
    so the painter atlas (which dedups textures by object identity) sees a
    texture shared across effects as a single atlas layer instead of
    stacking an identical padded copy per effect."""
    memo = {}
    out = []
    for ts in lists:
        conv = []
        for t in ts:
            k = id(t)
            if k not in memo:
                memo[k] = jnp.asarray(t, jnp.float32)
            conv.append(memo[k])
        out.append(tuple(conv))
    return out


@dataclass
class EffectInstance:
    """One live effect instance (≈ ParticleEffect + EffectSpawner +
    CompiledParticleEffect + EffectProperties components)."""

    name: str
    asset: EffectAsset
    fx: CompiledEffect
    pool: ParticlePool
    spawner: Optional[EffectSpawner]
    properties: EffectProperties
    transform: Any
    textures: tuple = ()
    parent: Optional[str] = None
    child_channel: int = 0
    visible: bool = True
    # per-instance RNG for frame seeds (pinned when asset.prng_seed is set)
    rng: Any = None
    # events emitted by this instance's LAST step, per channel
    last_events: Dict[int, EventBuffer] = field(default_factory=dict)
    renderer: Any = None
    # asset signature captured at add() time (drift detection, lib.rs:1796)
    compiled_signature: Any = None
    # per-effect RasterConfig field overrides (dataclasses.replace kwargs)
    # applied on top of the scene render config — e.g. a big-splat effect
    # raising tile_span without taxing the whole scene. Overridden effects
    # render in their own pass (never batched).
    raster_override: Any = None
    # frustum-culling pad (world units) added around the pool AABB to cover
    # splat extents — the analogue of a user-attached Aabb in the reference
    # (Bevy frustum culling feeds per-view visibility). None = this effect
    # opts out of per-camera raster culling (WhenVisible assets still get
    # simulation gating with the default pad).
    cull_pad: Optional[float] = None
    # explicit capacity passed to add() (None = asset.capacity); kept so a
    # hot-reload that doesn't touch asset.capacity preserves the override
    capacity_override: Optional[int] = None

    def alive_count(self) -> int:
        return int(self.pool.alive_count())


class HanabiScene:
    """Host-side effect world (≈ HanabiPlugin's systems as one object)."""

    def __init__(self, seed: int = 0) -> None:
        self._rng = np.random.default_rng(seed)
        self._effects: Dict[str, EffectInstance] = {}
        self._groups: Dict[str, dict] = {}  # instanced groups
        self._order: List[str] = []  # parents before children
        self.clock = EffectSimulationClock()
        self._frame = 0
        self._new_effect_added = False
        # jitted family scans for update_chunk, keyed (parent, child names)
        self._family_jit: Dict = {}
        # jitted batched render passes, keyed (asset sigs, alpha, config)
        self._batch_render_jit: Dict = {}
        # jitted whole-scene step+render chunks (update_render_chunk)
        self._scene_chunk_jit: Dict = {}
        # jitted batched AABB reductions for frustum culling, keyed by the
        # cullable-entity membership (names + pool shapes)
        self._aabb_jit: Dict = {}
        self._aabb_cache: Dict[str, tuple] = {}
        self._aabb_frame = -1
        # set once update(dt, cameras=...) is used: the scene is
        # camera-driven, so WhenVisible entities join render culling too
        self._frustum_sim = False
        # render_culling: tri-state override of that latch for RENDER
        # culling of WhenVisible entities. None (default) = latch-driven
        # (camera-driven scenes cull, eager-rendered scenes don't — the
        # per-render AABB dispatch+readback costs ≈ a tunnel round-trip
        # that scenes not using visibility never asked for); True = always
        # cull (an eager render loop opting into reference-parity per-view
        # culling, render/mod.rs:5580-5600); False = never render-cull.
        self.render_culling: Optional[bool] = None
        # Debug capture knobs (≈ DebugSettings resource, render/mod.rs:2425)
        from ..utils.profiling import DebugSettings

        self.debug = DebugSettings()
        # Hot-reload policy for live EffectAsset edits (the reference's
        # compile_effects change detection + rebuild, lib.rs:1703-1838):
        # * "eager" (default): every update/chunk/render entry point checks
        #   each distinct live asset for drift (~0.3 ms host JSON per
        #   distinct asset) and recompiles drifted effects immediately —
        #   the next frame runs the new definition, like the reference.
        # * "periodic": drift checks ride the rotating footgun batch (every
        #   asset within ~120 frames) — bounded host cost for scenes with
        #   very many distinct assets.
        # * "off": never recompile; drift only warns (pre-r5 behavior).
        self.hot_reload = "eager"

    # -- authoring-world API ------------------------------------------------

    def add(
        self,
        asset: EffectAsset,
        name: Optional[str] = None,
        transform: Optional[Any] = None,
        parent: Optional[str] = None,
        textures: Sequence[Any] = (),
        capacity: Optional[int] = None,
        prng_seed: Optional[int] = None,
        raster_override: Optional[Dict[str, Any]] = None,
        mesh=None,
        cull_pad: Optional[float] = None,
    ) -> str:
        """Spawn an effect instance (≈ commands.spawn(ParticleEffect)).

        ``prng_seed`` overrides ``asset.prng_seed`` for this instance
        (ParticleEffect::prng_seed, lib.rs:654-672). ``raster_override``
        (RasterConfig field -> value) customizes THIS effect's raster
        passes on top of the scene config — e.g. ``{"tile_span": 4}`` for
        a large-splat effect.

        ``mesh`` (a ``jax.sharding.Mesh``) shards THIS instance's particle
        pool over every mesh axis combined — including event-emitting and
        event-consuming effects: emission compacts per shard with zero
        communication, the child consumes the gap-separated buffer with
        bit-identical trajectories, and a whole firework tree scales
        across chips. A child of a sharded parent inherits the parent's
        mesh unless given its own (which must be the same mesh)."""
        name = name or f"{asset.name}#{len(self._effects)}"
        if name in self._effects:
            raise ValueError(f"effect instance {name!r} already exists")
        parent_layout = None
        child_channel = 0
        if parent is not None:
            if parent not in self._effects:
                raise KeyError(f"parent effect {parent!r} not found")
            p = self._effects[parent]
            if not p.asset.emits_gpu_spawn_events():
                raise ValueError(
                    f"parent {parent!r} has no EmitSpawnEventModifier"
                )
            if p.fx.mesh is not None:
                if mesh is None:
                    mesh = p.fx.mesh
                elif mesh is not p.fx.mesh:
                    raise ValueError(
                        f"child of sharded parent {parent!r} must shard on "
                        "the parent's mesh (pass the same Mesh object or "
                        "omit mesh to inherit it)"
                    )
            parent_layout = p.asset.particle_layout()
            # Children read distinct event channels (modifier/mod.rs:664).
            # Take the lowest channel unused by surviving siblings, so a
            # removed child's channel is recycled instead of duplicating a
            # live sibling's (counting children would alias channels after
            # remove+add).
            used = {
                e.child_channel
                for e in self._effects.values()
                if e.parent == parent
            }
            child_channel = next(c for c in range(len(used) + 1) if c not in used)
            if child_channel >= p.asset.num_event_channels():
                raise ValueError(
                    f"parent {parent!r} emits on "
                    f"{p.asset.num_event_channels()} event channel(s); "
                    f"cannot attach a child on channel {child_channel}"
                )
        parent_const = (
            self._effects[parent].asset.channel_const_count(child_channel)
            if parent is not None
            else None
        )
        if parent is not None and self._effects[parent].fx.mesh is not None:
            # a sharded parent's buffer keeps per-shard compacted prefixes
            # separated by zero-count gaps — the rank//K arithmetic
            # shortcut assumes a dense prefix, so use the general map
            parent_const = None
        fx = CompiledEffect.get(
            asset,
            parent_layout=parent_layout,
            parent_const_count=parent_const,
            mesh=mesh,
        )
        pool = fx.create_pool(capacity)
        # asset.prng_seed pins the instance's random streams (asset.rs PRNG
        # seed knob); otherwise they derive from the scene RNG.
        if prng_seed is not None:
            inst_seed = prng_seed
        elif asset.prng_seed is not None:
            inst_seed = asset.prng_seed
        else:
            inst_seed = int(self._rng.integers(0, 2**63))
        spawner = None if parent is not None else EffectSpawner(
            asset.spawner, rng=np.random.default_rng(inst_seed)
        )
        props = EffectProperties(
            [Property(n, v) for n, v in asset.module.properties().items()]
        )
        inst = EffectInstance(
            name=name,
            asset=asset,
            fx=fx,
            pool=pool,
            spawner=spawner,
            properties=props,
            transform=(
                np.asarray(transform, np.float32)
                if transform is not None
                else identity_transform()
            ),
            textures=tuple(textures),
            parent=parent,
            child_channel=child_channel,
            rng=np.random.default_rng(inst_seed + 1),
            compiled_signature=asset.signature(),
            raster_override=(
                dict(raster_override) if raster_override else None
            ),
            cull_pad=cull_pad,
            capacity_override=capacity,
        )
        self._effects[name] = inst
        self._new_effect_added = True
        # keep parents before children in step order
        if parent is not None:
            self._order.insert(self._order.index(parent) + 1, name)
            self._restrict_parent_payload(parent)
        else:
            self._order.append(name)
        return name

    def _restrict_parent_payload(self, parent: str) -> None:
        """Recompile the parent with event payload capture restricted to
        the union of its children's inherited attributes — each captured
        attribute costs a per-frame scatter (~0.35 ms at 64k), and a
        typical child inherits 1 of the parent's ~7 attributes."""
        p = self._effects[parent]
        union = set()
        for e in self._effects.values():
            if e.parent == parent:
                union |= set(e.fx._inherited_attrs)
        union_t = tuple(sorted(union))
        if p.fx.payload_attrs == union_t:
            return
        p.fx = CompiledEffect.get(
            p.asset,
            parent_layout=p.fx.parent_layout,
            parent_const_count=p.fx.parent_const_count,
            payload_attrs=union_t,
            mesh=p.fx.mesh,
        )
        # the event-buffer pytree structure changed: drop in-flight events
        # (one frame of events at attach time — the reference similarly
        # recompiles and resets on graph changes) and any cached chunk
        # executables whose closures captured the old parent fx
        p.last_events = {}
        self._family_jit = {
            k: v for k, v in self._family_jit.items() if parent not in k
        }
        self._scene_chunk_jit.clear()

    def add_group(
        self,
        asset: EffectAsset,
        count: int,
        name: Optional[str] = None,
        transforms: Optional[Any] = None,
        capacity: Optional[int] = None,
        textures: Sequence[Any] = (),
        raster_override: Optional[Dict[str, Any]] = None,
        cull_pad: Optional[float] = None,
    ) -> str:
        """Add ``count`` instances of one asset stepped as ONE dispatch.

        The Batcher analogue (reference render/batch.rs): instances share the
        executable via vmap and their spawners tick in one native pass.
        GLOBAL simulation space only (per-instance transforms bake in at
        spawn); event-linked assets are not batchable (route via add()).
        """
        from .instanced import InstancedEffect
        from ..spawn import make_spawner_bank

        if asset.emits_gpu_spawn_events():
            raise ValueError("event-emitting assets cannot be grouped; use add()")
        if asset.simulation_space is not SimulationSpace.GLOBAL:
            raise ValueError("instanced groups require GLOBAL simulation space")
        name = name or f"{asset.name}[group]#{len(self._groups)}"
        if name in self._groups or name in self._effects:
            raise ValueError(f"effect {name!r} already exists")
        fx = InstancedEffect(asset, count, capacity)
        if transforms is None:
            tfs = np.broadcast_to(identity_transform(), (count, 3, 4))
        else:
            tfs = np.asarray(transforms, np.float32).reshape(count, 3, 4)
        self._groups[name] = {
            "name": name,
            "asset": asset,
            "fx": fx,
            "pools": fx.create_pools(),
            "bank": make_spawner_bank(
                asset.spawner, count, seed=int(self._rng.integers(0, 2**63))
            ),
            "transforms": tfs,
            "properties": EffectProperties(
                [Property(n, v) for n, v in asset.module.properties().items()]
            ),
            "visible": True,
            "textures": tuple(textures),
            "renderer": None,
            "compiled_signature": asset.signature(),
            "raster_override": (
                dict(raster_override) if raster_override else None
            ),
            "cull_pad": cull_pad,
            "capacity_override": capacity,
        }
        self._new_effect_added = True
        return name

    def add_sharded_group(
        self,
        asset: EffectAsset,
        count: int,
        name: Optional[str] = None,
        mesh=None,
        dp: Optional[int] = None,
        sp: Optional[int] = None,
        transforms: Optional[Any] = None,
        capacity: Optional[int] = None,
        textures: Sequence[Any] = (),
        render_mode: str = "auto",
        cull_pad: Optional[float] = None,
    ) -> str:
        """Add a group whose pools shard across a ``jax.sharding.Mesh``.

        A mixed scene can place its biggest pool across chips while other
        effects stay single-device (SURVEY.md §2e: pool-axis sharding;
        the render gather/psum is the only cross-shard op). Instances shard
        over the mesh's ``dp`` axis and each pool's particle axis over
        ``sp``; stepping inserts only the spawn-ranking scan + alive-count
        collectives, and rendering uses :class:`ShardedRenderer`
        (psum compositing for additive blending, all_gather otherwise —
        pick with ``render_mode``). Pass ``mesh`` or ``dp``/``sp`` factors
        of the device count.
        """
        from ..parallel.mesh import ShardedEffect, make_mesh
        from ..spawn import make_spawner_bank

        if asset.emits_gpu_spawn_events():
            raise ValueError("event-emitting assets cannot be grouped; use add()")
        if asset.simulation_space is not SimulationSpace.GLOBAL:
            raise ValueError("instanced groups require GLOBAL simulation space")
        if mesh is None:
            mesh = make_mesh(dp=dp, sp=sp)
        name = name or f"{asset.name}[sharded]#{len(self._groups)}"
        if name in self._groups or name in self._effects:
            raise ValueError(f"effect {name!r} already exists")
        fx = ShardedEffect(asset, count, mesh, capacity)
        if transforms is None:
            tfs = np.broadcast_to(identity_transform(), (count, 3, 4))
        else:
            tfs = np.asarray(transforms, np.float32).reshape(count, 3, 4)
        self._groups[name] = {
            "name": name,
            "asset": asset,
            "fx": fx,
            "pools": fx.create_pools(),
            "bank": make_spawner_bank(
                asset.spawner, count, seed=int(self._rng.integers(0, 2**63))
            ),
            "transforms": tfs,
            "properties": EffectProperties(
                [Property(n, v) for n, v in asset.module.properties().items()]
            ),
            "visible": True,
            "textures": tuple(textures),
            "renderer": None,
            "sharded": True,
            "render_mode": render_mode,
            "compiled_signature": asset.signature(),
            "cull_pad": cull_pad,
            "capacity_override": capacity,
        }
        self._new_effect_added = True
        return name

    def group_alive(self, name: str) -> int:
        g = self._groups[name]
        return int(g["fx"].total_alive(g["pools"]))

    def _group_flat_pool(self, g) -> ParticlePool:
        """View a group's [I, N, ...] pools as one flat pool for rendering.

        Sharded groups replicate first (``_replicate_pool``) so the
        flat view — and anything downstream like the painter's global
        sort — runs the identical single-device algorithm bit-exactly
        (same rationale as the sharded-instance gather in render())."""
        pools = g["pools"]
        if g.get("sharded"):
            pools = _replicate_pool(pools, g["fx"].mesh)
        return pools.flatten(composite_ribbon_ids=True)

    def remove(self, name: str) -> None:
        if name in self._groups:
            del self._groups[name]
            return
        children = [e.name for e in self._effects.values() if e.parent == name]
        if children:
            raise ValueError(f"remove children first: {children}")
        del self._effects[name]
        self._order.remove(name)

    def __getitem__(self, name: str) -> EffectInstance:
        return self._effects[name]

    def __contains__(self, name: str) -> bool:
        return name in self._effects

    def effects(self) -> List[EffectInstance]:
        return [self._effects[n] for n in self._order]

    def set_property(self, name: str, prop: str, value) -> None:
        if name in self._groups:
            self._groups[name]["properties"].set(prop, value)
        else:
            self._effects[name].properties.set(prop, value)

    def set_textures(self, name: str, textures: Sequence[Any]) -> None:
        """Swap an effect's or group's texture images at runtime (the
        EffectMaterial image swap, lib.rs:694-702).

        Textures are baked as constants into the cached renderers and the
        jitted scene paths, so the swap invalidates the per-effect renderer
        and — via the texture-identity component of the jit cache keys —
        retraces render/render_views/update_render_chunk on next use."""
        texs = tuple(textures)
        if name in self._groups:
            g = self._groups[name]
            g["textures"] = texs
            g["renderer"] = None
            return
        inst = self._effects[name]
        inst.textures = texs
        inst.renderer = None

    def set_transform(self, name: str, transform) -> None:
        if name in self._groups:
            g = self._groups[name]
            n = g["fx"].num_instances
            g["transforms"] = np.asarray(transform, np.float32).reshape(n, 3, 4)
        else:
            self._effects[name].transform = np.asarray(transform, np.float32)

    def set_visible(self, name: str, visible: bool) -> None:
        if name in self._groups:
            self._groups[name]["visible"] = visible
        else:
            self._effects[name].visible = visible

    def reset_spawner(self, name: str) -> None:
        if name in self._groups:
            self._groups[name]["bank"].reset()
            return
        sp = self._effects[name].spawner
        if sp is not None:
            sp.reset()

    def set_spawner_active(self, name: str, active: bool) -> None:
        if name in self._groups:
            self._groups[name]["bank"].set_active(active)
            return
        sp = self._effects[name].spawner
        if sp is not None:
            sp.set_active(active)

    # -- visibility: frustum vs emitter/pool AABB ----------------------------
    # The reference derives per-effect visibility from Bevy: hierarchy
    # visibility gates spawner ticking (tick_spawners, spawn.rs:983) and
    # per-view frustum culling vs a user-attached Aabb gates the draws
    # (queue_effects over RenderVisibleEntities, render/mod.rs:5581). Here
    # the AABB is computed ON DEVICE from the pool itself (one batched
    # masked min/max over all cullable effects, read back at frame start —
    # 6 floats each), unioned with the emitter position so a fresh effect
    # is visible at its emitter, and padded by ``cull_pad`` to cover splat
    # extents. An entity participates when it sets ``cull_pad`` or its
    # asset simulates WhenVisible.

    DEFAULT_CULL_PAD = 0.5

    @staticmethod
    def _cullable(asset, cull_pad) -> bool:
        return (
            cull_pad is not None
            or asset.simulation_condition is SimulationCondition.WHEN_VISIBLE
        )

    def _refresh_aabbs(self) -> Dict[str, tuple]:
        """(Re)compute the world AABB of every cullable entity — at most
        once per frame; the values describe the pools as of frame START
        (pre-step), which is what tick gating reads."""
        if self._aabb_frame == self._frame:
            return self._aabb_cache
        import jax

        # Each entry: (name, pool, emitter transforms [K, 3, 4], pad, local).
        # LOCAL-space pools store positions in emitter space
        # (vfx_render.wgsl:113-146), so their boxes must be taken through
        # the per-instance 3x4 transform before they can meet world-space
        # frustum planes.
        entries = []
        for n, inst in self._effects.items():
            if self._cullable(inst.asset, inst.cull_pad):
                pad = (
                    inst.cull_pad
                    if inst.cull_pad is not None
                    else self.DEFAULT_CULL_PAD
                )
                entries.append(
                    (
                        n,
                        inst.pool,
                        np.asarray(inst.transform, np.float32)[None],
                        pad,
                        inst.asset.simulation_space is SimulationSpace.LOCAL,
                    )
                )
        for n, g in self._groups.items():
            if self._cullable(g["asset"], g.get("cull_pad")):
                pad = (
                    g["cull_pad"]
                    if g.get("cull_pad") is not None
                    else self.DEFAULT_CULL_PAD
                )
                entries.append(
                    (
                        n,
                        g["pools"],
                        np.asarray(g["transforms"], np.float32),
                        pad,
                        g["asset"].simulation_space is SimulationSpace.LOCAL,
                    )
                )
        cache: Dict[str, tuple] = {}
        if entries:
            key = tuple(
                (n, tuple(p.alive.shape)) for n, p, _, _, _ in entries
            )
            fn = self._aabb_jit.get(key)
            if fn is None:

                def aabb_all(pools):
                    # Per-INSTANCE min/max (axis -2): LOCAL groups need one
                    # box per instance since each has its own transform.
                    out = []
                    big = jnp.float32(3.0e38)
                    for p in pools:
                        alive = p.alive
                        pos = p.attrs["position"].reshape(alive.shape + (3,))
                        if alive.ndim == 1:
                            alive, pos = alive[None], pos[None]
                        m = alive[..., None]
                        out.append(
                            (
                                jnp.min(jnp.where(m, pos, big), axis=1),
                                jnp.max(jnp.where(m, pos, -big), axis=1),
                            )
                        )
                    return out

                fn = jax.jit(aabb_all)
                self._aabb_jit[key] = fn
            res = fn(tuple(p for _, p, _, _, _ in entries))
            for (n, _p, tfs, pad, local), (mn, mx) in zip(entries, res):
                mn, mx = np.asarray(mn), np.asarray(mx)  # [K, 3] each
                em = tfs[:, :, 3]  # emitter world positions
                if local:
                    # world box per instance: center through R|t, extents
                    # through |R| (exact for axis-aligned boxes under any
                    # rigid/affine transform's envelope). Vectorized over
                    # the K instances (a host loop here is O(K)/frame);
                    # instances with no alive particles mask out.
                    has = np.all(mn <= mx, axis=1)  # [K]
                    if np.any(has):
                        rot, t = tfs[:, :, :3], tfs[:, :, 3]  # [K,3,3],[K,3]
                        c = (
                            np.einsum("kij,kj->ki", rot, (mn + mx) * 0.5) + t
                        )
                        e = np.einsum(
                            "kij,kj->ki", np.abs(rot), (mx - mn) * 0.5
                        )
                        big = np.float32(3.0e38)
                        lo = np.where(has[:, None], c - e, big)
                        hi = np.where(has[:, None], c + e, -big)
                        mn = lo.min(axis=0)
                        mx = hi.max(axis=0)
                    else:
                        mn = np.full(3, 3.0e38, np.float32)
                        mx = -mn
                else:
                    mn, mx = mn.min(axis=0), mx.max(axis=0)
                mn = np.minimum(mn, em.min(axis=0)) - pad
                mx = np.maximum(mx, em.max(axis=0)) + pad
                if self.debug.validate and (
                    np.isnan(mn).any() or np.isnan(mx).any()
                ):
                    raise FloatingPointError(
                        f"debug validation: effect {n!r} has a nan pool "
                        "AABB — an alive lane carries a non-finite "
                        "position (poison read or bad init/update "
                        "expression); without validation this would "
                        "silently frustum-cull the effect"
                    )
                cache[n] = (mn, mx)
        self._aabb_cache = cache
        self._aabb_frame = self._frame
        return cache

    def _culled_names(self, cameras, for_render: bool = False) -> set:
        """Names of participating entities whose padded AABB is outside
        EVERY given camera frustum.

        Participation: entities with an explicit ``cull_pad`` always;
        WhenVisible entities additionally — but for RENDER culling only
        once the scene is camera-driven (``update(dt, cameras=...)`` has
        been used), because the default simulation condition is
        WhenVisible and unconditional render culling would tax every
        eager render with an AABB dispatch + readback (≈ a tunnel
        round-trip on axon) that scenes not using visibility never asked
        for. ``scene.render_culling = True/False`` overrides that latch
        either way."""
        from ..render.camera import aabb_in_frustum, frustum_planes

        cameras = list(cameras)
        if not cameras:
            return set()
        render_cull = (
            self._frustum_sim
            if self.render_culling is None
            else self.render_culling
        )

        def participates(asset, pad):
            if pad is not None:
                return True
            return (
                asset.simulation_condition
                is SimulationCondition.WHEN_VISIBLE
                and (not for_render or render_cull)
            )

        names = {
            n
            for n, inst in self._effects.items()
            if participates(inst.asset, inst.cull_pad)
        } | {
            n
            for n, g in self._groups.items()
            if participates(g["asset"], g.get("cull_pad"))
        }
        if not names:
            return set()
        aabbs = self._refresh_aabbs()
        planes = [frustum_planes(c) for c in cameras]
        return {
            n
            for n in names
            if n in aabbs
            and not any(
                aabb_in_frustum(p, aabbs[n][0], aabbs[n][1]) for p in planes
            )
        }

    def _per_view_visibility(self, cameras, insts, groups):
        """Per-camera visibility masks for multi-view rendering
        (render_views / multi-view chunks): bool [V, n_effects] and
        [V, n_groups] rows, one per camera, True where the entity's padded
        AABB meets THAT camera's frustum (the reference's per-view
        RenderVisibleEntities, render/mod.rs:5580-5600). Entities not
        participating in culling stay visible in every view; an
        all-False column is normally already excluded from the plan by
        the union-culling step. Masks AND into the draw alive masks
        inside the vmapped frame, so shapes stay static per view."""
        from ..render.camera import aabb_in_frustum, frustum_planes

        planes = [frustum_planes(c) for c in cameras]
        aabbs = self._refresh_aabbs()

        render_cull = (
            self._frustum_sim
            if self.render_culling is None
            else self.render_culling
        )

        def participates(asset, pad):
            if pad is not None:
                return True
            return (
                asset.simulation_condition
                is SimulationCondition.WHEN_VISIBLE
                and render_cull
            )

        def row(name, asset, pad):
            if not participates(asset, pad) or name not in aabbs:
                return [True] * len(planes)
            mn, mx = aabbs[name]
            return [bool(aabb_in_frustum(p, mn, mx)) for p in planes]

        vis_eff = np.asarray(
            [row(i.name, i.asset, i.cull_pad) for i in insts], np.bool_
        ).reshape(len(insts), len(planes)).T  # [V, n_eff]
        vis_grp = np.asarray(
            [row(g["name"], g["asset"], g.get("cull_pad")) for g in groups],
            np.bool_,
        ).reshape(len(groups), len(planes)).T  # [V, n_grp]
        return vis_eff, vis_grp

    # -- hot reload (≈ compile_effects change detection, lib.rs:1703-1838) ---

    def apply_asset_changes(self, name: Optional[str] = None) -> List[str]:
        """Detect live ``EffectAsset`` edits and recompile the affected
        effects/groups — the analogue of the reference's ``compile_effects``
        rebuilding shaders + pipelines when an asset changes
        (lib.rs:1703-1838, change detection :1789-1794) and of
        ``update_properties_from_asset`` re-syncing property declarations
        (lib.rs:1853).

        Semantics per drifted entity:

        * spawner-only edits retarget the live spawner state without a
          recompile (group spawner banks rebuild, resetting cycle state);
        * the particle pool is KEPT when the particle layout and capacity
          are unchanged; a layout-only change migrates it (intersecting
          attributes carry over, new ones take defaults, alive particles
          survive); a capacity change resets the pool;
        * properties re-sync (instance-set values persist for properties
          that still exist with the same type);
        * renderers and the whole-scene jitted caches invalidate, and the
          change cascades to descendants of a recompiled parent (their
          compiled step depends on the parent's layout / channel constants
          — unaffected ones no-op through the compile cache).

        With ``hot_reload == "eager"`` (default) this runs automatically at
        every update/chunk/render entry point; call it directly for
        immediate effect under other policies. Returns the names actually
        recompiled (or spawner-retargeted).
        """
        sig_memo: Dict[int, Any] = {}

        def sig_of(asset):
            s = sig_memo.get(id(asset))
            if s is None:
                s = asset.signature()
                sig_memo[id(asset)] = s
            return s

        if name is not None:
            if name in self._effects:
                eff_names, grp_names = [name], []
            elif name in self._groups:
                eff_names, grp_names = [], [name]
            else:
                raise KeyError(f"unknown effect {name!r}")
        else:
            eff_names, grp_names = list(self._order), list(self._groups)

        drifted = {
            n
            for n in eff_names
            if self._effects[n].compiled_signature is not None
            and sig_of(self._effects[n].asset)
            != self._effects[n].compiled_signature
        }
        changed: List[str] = []
        if drifted:
            # scene order keeps parents first; a recompiled parent cascades
            # to its subtree (layout / channel-const / payload deps) —
            # unaffected descendants no-op through the fx cache
            cascade = set(drifted)
            for n in self._order:
                inst = self._effects[n]
                if inst.parent is not None and inst.parent in cascade:
                    cascade.add(n)
            for n in self._order:
                if n in cascade and self._recompile_effect(
                    n, sig_of(self._effects[n].asset)
                ):
                    changed.append(n)
        for gname in grp_names:
            g = self._groups[gname]
            sig = sig_of(g["asset"])
            if (
                g.get("compiled_signature") is not None
                and sig != g["compiled_signature"]
            ):
                self._recompile_group(gname, sig)
                changed.append(gname)
        return changed

    def _recompile_effect(self, name: str, new_sig) -> bool:
        import json as _json

        inst = self._effects[name]
        asset = inst.asset
        old_sig = inst.compiled_signature
        if new_sig != old_sig:
            old_js = _json.loads(old_sig[3])
            new_js = _json.loads(new_sig[3])
            if inst.spawner is not None and old_js.get("spawner") != new_js.get(
                "spawner"
            ):
                inst.spawner.retarget(asset.spawner)
            changed_keys = {
                k
                for k in set(old_js) | set(new_js)
                if old_js.get(k) != new_js.get(k)
            }
            if changed_keys <= {"spawner"} and new_sig[:3] == old_sig[:3]:
                # spawner-only edit: host-side state retargeted above, the
                # compiled step is untouched
                inst.compiled_signature = new_sig
                return True
        parent_layout = None
        parent_const = None
        if inst.parent is not None:
            p = self._effects[inst.parent]
            parent_layout = p.asset.particle_layout()
            parent_const = p.asset.channel_const_count(inst.child_channel)
            if p.fx.mesh is not None:
                parent_const = None  # sharded parents: gap-separated buffer
        new_fx = CompiledEffect.get(
            asset,
            parent_layout=parent_layout,
            parent_const_count=parent_const,
            payload_attrs=inst.fx.payload_attrs,
            mesh=inst.fx.mesh,
        )
        layout_changed = new_sig[2] != old_sig[2]
        if asset.capacity != old_sig[1]:
            # asset capacity edit wins — and RETIRES — the add()-time
            # override, else the stale override would resurrect on the next
            # unrelated edit and reset the pool to the old capacity
            new_cap = asset.capacity
            inst.capacity_override = None
        else:
            new_cap = inst.capacity_override or inst.pool.capacity
        pool_changed = layout_changed or new_cap != inst.pool.capacity
        if new_fx is inst.fx and not pool_changed and new_sig == old_sig:
            return False  # cascade no-op: nothing this effect compiles on changed
        events_compatible = (
            not layout_changed
            and not pool_changed
            and new_fx.payload_attrs == inst.fx.payload_attrs
        )
        if pool_changed:
            inst.pool = self._migrate_pool(inst.pool, new_fx, new_cap)
        inst.fx = new_fx
        if not events_compatible:
            inst.last_events = {}
        inst.renderer = None
        inst.compiled_signature = new_sig
        inst.properties.resync(
            [Property(n, v) for n, v in asset.module.properties().items()]
        )
        self._family_jit = {
            k: v for k, v in self._family_jit.items() if name not in k
        }
        # whole-scene executables close over the old fx objects; their keys
        # (which embed asset signatures) can never hit again — drop them
        self._scene_chunk_jit.clear()
        if inst.parent is not None:
            # the child's inherited attributes may have changed: refresh the
            # parent's event-payload capture union
            self._restrict_parent_payload(inst.parent)
        return True

    @staticmethod
    def _migrate_pool(old: ParticlePool, fx, new_cap: int) -> ParticlePool:
        """Layout-changed pool migration: same capacity keeps alive/seed/
        counter and every intersecting attribute (new attributes take their
        defaults); a capacity change resets the pool."""
        new = fx.create_pool(new_cap)
        if old.alive.shape != new.alive.shape:
            return new
        attrs = dict(new.attrs)
        for k, v in new.attrs.items():
            ov = old.attrs.get(k)
            if ov is not None and ov.shape == v.shape and ov.dtype == v.dtype:
                attrs[k] = ov
        return ParticlePool(
            attrs=attrs, alive=old.alive, seed=old.seed, counter=old.counter
        )

    def _recompile_group(self, gname: str, new_sig) -> None:
        import json as _json

        g = self._groups[gname]
        asset = g["asset"]
        old_sig = g["compiled_signature"]
        old_js = _json.loads(old_sig[3])
        new_js = _json.loads(new_sig[3])
        if old_js.get("spawner") != new_js.get("spawner"):
            # group spawners are a vectorized bank; rebuild with the new
            # settings (cycle state resets — per-instance retargeting would
            # need per-lane carry the native bank doesn't expose)
            from ..spawn import make_spawner_bank

            g["bank"] = make_spawner_bank(
                asset.spawner,
                g["fx"].num_instances,
                seed=int(self._rng.integers(0, 2**63)),
            )
        changed_keys = {
            k
            for k in set(old_js) | set(new_js)
            if old_js.get(k) != new_js.get(k)
        }
        if changed_keys <= {"spawner"} and new_sig[:3] == old_sig[:3]:
            g["compiled_signature"] = new_sig
            return
        count = g["fx"].num_instances
        layout_changed = new_sig[2] != old_sig[2]
        old_cap = int(g["pools"].alive.shape[-1])
        if asset.capacity != old_sig[1]:
            # capacity edit wins and retires the add()-time override (same
            # stale-override resurrection hazard as _recompile_effect)
            new_cap = asset.capacity
            g["capacity_override"] = None
        else:
            new_cap = g.get("capacity_override") or old_cap
        if g.get("sharded"):
            from ..parallel.mesh import ShardedEffect

            fx = ShardedEffect(asset, count, g["fx"].mesh, new_cap)
        else:
            from .instanced import InstancedEffect

            fx = InstancedEffect(asset, count, new_cap)
        old_pools = g["pools"]
        g["fx"] = fx
        if layout_changed or new_cap != old_cap:
            new_pools = fx.create_pools()
            if new_cap == old_cap:
                attrs = dict(new_pools.attrs)
                for k, v in new_pools.attrs.items():
                    ov = old_pools.attrs.get(k)
                    if (
                        ov is not None
                        and ov.shape == v.shape
                        and ov.dtype == v.dtype
                    ):
                        attrs[k] = ov
                new_pools = ParticlePool(
                    attrs=attrs,
                    alive=old_pools.alive,
                    seed=old_pools.seed,
                    counter=old_pools.counter,
                )
            g["pools"] = new_pools
        g["renderer"] = None
        g["properties"].resync(
            [Property(n, v) for n, v in asset.module.properties().items()]
        )
        g["compiled_signature"] = new_sig
        self._scene_chunk_jit.clear()

    # -- per-frame update (≈ tick_spawners + simulate()) ---------------------

    def update(self, dt: float, cameras=None) -> None:
        """Advance one frame.

        ``cameras`` (optional camera or sequence): derive WhenVisible
        simulation gating from view frustums — a WhenVisible effect whose
        padded pool/emitter AABB is outside every given frustum ticks no
        spawner and does not step (the tick_spawners skip, spawn.rs:983,
        with visibility computed from culling instead of a manual flag).
        Without ``cameras`` the manual ``set_visible`` flag alone gates,
        as before."""
        import time as _time

        _t0 = _time.perf_counter()
        if self.hot_reload == "eager":
            self.apply_asset_changes()
        self.debug.on_frame_start(self._new_effect_added)
        self._new_effect_added = False
        if cameras is not None and not isinstance(cameras, (list, tuple)):
            cameras = [cameras]
        if cameras:
            self._frustum_sim = True
        culled = self._culled_names(cameras) if cameras else set()
        sim = self.clock.advance(dt)
        self._frame += 1
        self._check_footguns()
        # Children consume events emitted by their parent's PREVIOUS step.
        prev_events: Dict[str, Dict[int, EventBuffer]] = {
            n: dict(e.last_events) for n, e in self._effects.items()
        }
        # (parent, channel) pairs consumed this frame: a paused parent's
        # buffer must not be re-consumed next frame (events fire once)
        consumed: list = []
        stepped: set = set()
        from ..utils.profiling import profile_span

        for name in self._order:
            inst = self._effects[name]
            if inst.asset.simulation_condition is (
                SimulationCondition.WHEN_VISIBLE
            ) and (not inst.visible or name in culled):
                continue
            frame_seed = np.uint32(inst.rng.integers(0, 2**32))
            # debug-mode validation routes through the checkify executable
            step_fn = (
                inst.fx.step_checked if self.debug.validate else inst.fx.step
            )
            with profile_span(f"hanabi:step:{name}"):
                if inst.parent is not None:
                    parent = self._effects[inst.parent]
                    consumed.append((inst.parent, inst.child_channel))
                    events_in = prev_events[inst.parent].get(inst.child_channel)
                    if events_in is None:
                        events_in = parent.fx.make_empty_events(
                            parent.pool.capacity
                        )
                    inst.pool, events_out = step_fn(
                        inst.pool,
                        StepInputs.make(
                            0, frame_seed, inst.transform, inst.properties.as_dict()
                        ),
                        sim,
                        events_in=events_in,
                        parent_pool=parent.pool,
                    )
                else:
                    n_spawn = (
                        inst.spawner.tick(self.clock.delta) if inst.spawner else 0
                    )
                    inst.pool, events_out = step_fn(
                        inst.pool,
                        StepInputs.make(
                            n_spawn,
                            frame_seed,
                            inst.transform,
                            inst.properties.as_dict(),
                        ),
                        sim,
                    )
            inst.last_events = events_out
            stepped.add(name)

        # A parent that did not step (paused WhenVisible) keeps stale
        # last_events; drop channels a child consumed this frame.
        for pname, chan in consumed:
            if pname not in stepped:
                self._effects[pname].last_events.pop(chan, None)

        # Instanced groups: one dispatch per group.
        for gname, g in self._groups.items():
            if g["asset"].simulation_condition is (
                SimulationCondition.WHEN_VISIBLE
            ) and (not g["visible"] or gname in culled):
                continue
            counts = g["bank"].tick(self.clock.delta)
            n = g["fx"].num_instances
            seeds = self._rng.integers(0, 2**32, size=n, dtype=np.uint32)
            inputs = g["fx"].make_inputs(
                counts, seeds, g["transforms"], g["properties"].as_dict()
            )
            if g.get("sharded"):
                inputs = g["fx"].shard_inputs(inputs)
            gstep = (
                g["fx"].step_checked if self.debug.validate else g["fx"].step
            )
            g["pools"], _ = gstep(g["pools"], inputs, sim)
        self.debug.on_frame_end()
        self.last_frame_ms = (_time.perf_counter() - _t0) * 1000.0

    # -- diagnostics (≈ bevy_log warnings, reference lib.rs:1796) ------------

    def _check_footguns(self) -> None:
        """Cheap periodic checks for the classic perf footguns.

        1. Asset drift: under ``hot_reload == "periodic"`` the rotating
           batch below RECOMPILES drifted effects (every live asset is
           checked within ~120 frames); under ``"off"`` it only warns
           (the reference invalidates + recompiles and warns, lib.rs:1796).
           Eager mode already applied changes before this runs.
        2. Jit-cache churn: a new compiled variant appearing frame after
           frame means something in a render/step signature changes every
           frame — each entry is a multi-second XLA compile on TPU.
        """
        from ..utils.diag import warn_once

        if self._frame % 30 == 0 and (self._effects or self._groups):
            # Rotating batch: a quarter of all entities (effects AND groups)
            # per 30-frame tick, so every live asset is checked within 120
            # frames (~2 s at 60 fps) no matter how many there are.
            # signature() re-serializes the whole asset (~1 ms of host JSON
            # work), so the batch — not the full set — bounds per-frame cost.
            entities = [
                (n, self._effects[n].asset, self._effects[n].compiled_signature)
                for n in self._effects
            ] + [
                (n, g["asset"], g.get("compiled_signature"))
                for n, g in self._groups.items()
            ]
            batch = -(-len(entities) // 4)
            tick = self._frame // 30
            for k in range(batch):
                name, asset, sig = entities[(tick * batch + k) % len(entities)]
                if sig is not None and asset.signature() != sig:
                    if self.hot_reload == "off":
                        warn_once(
                            f"asset-drift:{name}",
                            f"effect {name!r}: EffectAsset was modified "
                            "after add(); the compiled effect still runs "
                            "the OLD definition (hot_reload='off'). Call "
                            "apply_asset_changes() or remove and re-add "
                            "the instance (reference recompiles here, "
                            "lib.rs:1796).",
                        )
                    elif name in self._effects or name in self._groups:
                        self.apply_asset_changes(name)
        cache_size = (
            len(self._family_jit)
            + len(self._batch_render_jit)
            + len(self._scene_chunk_jit)
        )
        prev = getattr(self, "_jit_cache_size", 0)
        if cache_size > prev:
            streak = getattr(self, "_jit_growth_streak", 0) + 1
            self._jit_growth_streak = streak
            if streak >= 3:
                warn_once(
                    "jit-churn",
                    f"a new jitted variant was compiled {streak} frames in "
                    "a row — a step/render signature is changing every "
                    "frame (shape, asset, or config); each variant is a "
                    "fresh XLA compile (seconds on TPU).",
                )
        else:
            self._jit_growth_streak = 0
        self._jit_cache_size = cache_size

    def _note_chunk_cache(self, hit: bool) -> None:
        """Churn detector for the whole-scene executables: 3 consecutive
        chunk/views calls that each compile a fresh variant means the cache
        key changes every call — the most expensive recompile in the
        framework, worth its own warning (per-frame update() churn has the
        separate 'jit-churn' check)."""
        from ..utils.diag import warn_once

        if hit:
            self._chunk_miss_streak = 0
            return
        streak = getattr(self, "_chunk_miss_streak", 0) + 1
        self._chunk_miss_streak = streak
        if streak >= 3:
            warn_once(
                "chunk-churn",
                f"{streak} consecutive update_render_chunk/render_views "
                "calls each compiled a fresh whole-scene executable — the "
                "cache key changes every call (commonly the back-to-front "
                "pass ordering under a moving camera, or texture/override "
                "swaps). Each variant is a multi-second XLA compile; "
                "stabilize the ordering or reuse one configuration.",
            )

    def stats(self) -> dict:
        """Scene observability snapshot (readbacks: call off the hot path).

        Returns per-effect alive counts, event-buffer fill levels, group
        totals, and the last update() wall time. Warns once per child when
        spawn events arrive while the child's pool is already full — those
        spawns are silently dropped (the analogue of the reference's
        capacity-capped event append, lib.rs:984-987; the event BUFFERS
        themselves can never overflow — capacity equals the parent pool,
        one event per particle per channel, events.py).
        """
        from ..utils.diag import warn_once

        effects = {}
        for name, inst in self._effects.items():
            events = {}
            for chan, ev in (inst.last_events or {}).items():
                num = int(ev.num_events)
                cap = int(ev.parent_slot.shape[-1])
                events[chan] = {"events": num, "capacity": cap}
            effects[name] = {
                "alive": inst.alive_count(),
                "capacity": int(inst.pool.capacity),
                "events": events,
            }
        for name, inst in self._effects.items():
            if inst.parent is None:
                continue
            pev = (self._effects[inst.parent].last_events or {}).get(
                inst.child_channel
            )
            if pev is None:
                continue
            requested = int(jnp.sum(pev.count))
            cap = int(inst.pool.capacity)
            if requested > 0 and effects[name]["alive"] >= cap:
                warn_once(
                    f"child-saturation:{name}",
                    f"child effect {name!r} has a full pool ({cap} alive) "
                    f"while {requested} spawn(s) are requested by parent "
                    f"{inst.parent!r}: those spawns are dropped. Raise the "
                    "child's capacity.",
                )
        groups = {
            name: {"alive": self.group_alive(name)} for name in self._groups
        }
        return {
            "frame": self._frame,
            "time": self.clock.time,
            "last_frame_ms": getattr(self, "last_frame_ms", None),
            "total_alive": self.total_alive(),
            "effects": effects,
            "groups": groups,
        }

    def _collect_chunk_inputs(
        self, frames: int, dt: float, on_frame=None, culled=frozenset()
    ):
        """Shared host-side prep for the chunked paths: freeze visibility,
        resolve event trees, precompute every frame's spawner ticks, seeds,
        transforms, and property values.

        ``on_frame(scene, i)`` (optional) runs on the host before frame
        ``i``'s inputs are captured — the hook for animating properties
        and transforms WITHIN a chunk (``scene.set_property`` /
        ``set_transform`` calls made inside it take effect per frame;
        visibility and scene membership stay frozen for the chunk).

        ``culled``: frustum-culled entity names (frozen for the chunk,
        like visibility) — WhenVisible entities in it pause."""

        def paused(visible, asset, name=None):
            return (
                asset.simulation_condition is SimulationCondition.WHEN_VISIBLE
                and (not visible or name in culled)
            )

        def root_of(name: str) -> str:
            inst = self._effects[name]
            while inst.parent is not None:
                inst = self._effects[inst.parent]
            return inst.name

        # Visibility is constant across the chunk: WhenVisible + hidden means
        # the effect is not stepped at all (matching the per-frame path).
        # Event trees follow their root.
        def family_paused(name):
            rname = root_of(name)
            root = self._effects[rname]
            return paused(root.visible, root.asset, rname)

        active_effects = [n for n in self._order if not family_paused(n)]
        active_groups = [
            n
            for n, g in self._groups.items()
            if not paused(g["visible"], g["asset"], n)
        ]

        # event trees: root -> topologically ordered member names (scene
        # _order keeps parents before children). Any effect that emits or
        # consumes events belongs to a tree; childless emitters run as
        # single-member trees so their last_events stay fresh.
        families: Dict[str, list] = {}
        for n in active_effects:
            inst = self._effects[n]
            if inst.parent is not None or inst.fx.num_event_channels:
                families.setdefault(root_of(n), []).append(n)

        sims = []
        per_effect_inputs = {n: [] for n in active_effects}
        per_group_inputs = {n: [] for n in active_groups}
        for i in range(frames):
            if on_frame is not None:
                on_frame(self, i)
            sim = self.clock.advance(dt)
            sims.append(sim)
            for name in active_effects:
                inst = self._effects[name]
                n_spawn = (
                    inst.spawner.tick(self.clock.delta)
                    if inst.spawner and inst.parent is None
                    else 0
                )
                per_effect_inputs[name].append(
                    StepInputs.make(
                        n_spawn,
                        np.uint32(inst.rng.integers(0, 2**32)),
                        inst.transform,
                        inst.properties.as_dict(),
                    )
                )
            for gname in active_groups:
                g = self._groups[gname]
                n = g["fx"].num_instances
                per_group_inputs[gname].append(
                    g["fx"].make_inputs(
                        g["bank"].tick(self.clock.delta),
                        self._rng.integers(0, 2**32, size=n, dtype=np.uint32),
                        g["transforms"],
                        g["properties"].as_dict(),
                    )
                )
        self._frame += frames
        return (
            active_effects,
            active_groups,
            families,
            per_effect_inputs,
            per_group_inputs,
            sims,
        )

    def update_chunk(self, frames: int, dt: float, on_frame=None) -> None:
        """Advance ``frames`` frames with ONE device dispatch per effect
        (or per event-linked effect tree).

        The production-serving path: spawner ticks for all frames are
        precomputed on the host and the jitted steps run under ``lax.scan``
        (≈12 ms dispatch latency amortized over the chunk). Event-linked
        effects are fused into family scans: the pending event buffers ride
        the scan carry, so a whole parent→child tree (any depth) advances
        together in one dispatch (descendants inherit from event payloads,
        never live parent pools). A hidden WhenVisible root pauses its
        whole tree for the chunk. ``on_frame(scene, i)`` runs host-side
        before each frame's inputs are captured (animate properties /
        transforms within the chunk).
        """
        if self.hot_reload == "eager":
            self.apply_asset_changes()
        (
            active_effects,
            active_groups,
            families,
            per_effect_inputs,
            per_group_inputs,
            sims,
        ) = self._collect_chunk_inputs(frames, dt, on_frame)
        validate = self.debug.validate
        family_members = {n for mem in families.values() for n in mem}
        for name in active_effects:
            if name in family_members:
                continue
            inst = self._effects[name]
            ii, ss = CompiledEffect.stack_frames(per_effect_inputs[name], sims)
            chunk_fn = (
                inst.fx.step_chunk_checked if validate else inst.fx.step_chunk
            )
            inst.pool = chunk_fn(inst.pool, ii, ss)

        # Event trees: one fused scan per tree (members in topo order)
        for rname, names in families.items():
            insts = [self._effects[n] for n in names]
            index = {n: i for i, n in enumerate(names)}
            # the "##checked" sentinel can never collide with an effect
            # name's membership test in the cache-invalidation paths
            key = tuple(names) + (("##checked",) if validate else ())
            fam_fn = self._family_jit.get(key)
            if fam_fn is None:
                fam_fn = CompiledEffect.make_family_chunk_step(
                    [
                        (
                            inst.fx,
                            index[inst.parent] if inst.parent is not None else None,
                            inst.child_channel,
                        )
                        for inst in insts
                    ],
                    checked=validate,
                )
                self._family_jit[key] = fam_fn
            stacked = [
                CompiledEffect.stack_frames(per_effect_inputs[n], sims)
                for n in names
            ]
            member_inputs = tuple(ii for ii, _ in stacked)
            ss = stacked[0][1]
            pendings = tuple(
                {
                    ch: inst.last_events.get(ch)
                    or inst.fx.make_empty_events(inst.pool.capacity)
                    for ch in range(inst.fx.num_event_channels)
                }
                for inst in insts
            )
            carry = (tuple(inst.pool for inst in insts), pendings)
            pools, pendings = fam_fn(carry, member_inputs, ss)
            for inst, pool, pend in zip(insts, pools, pendings):
                inst.pool = pool
                inst.last_events = pend
        import jax
        import jax.numpy as _jnp

        for gname in active_groups:
            g = self._groups[gname]
            ii = jax.tree_util.tree_map(
                lambda *xs: _jnp.stack(xs), *per_group_inputs[gname]
            )
            ss = jax.tree_util.tree_map(
                lambda *xs: _jnp.stack([_jnp.asarray(x, _jnp.float32) for x in xs]),
                *sims,
            )
            gchunk = (
                g["fx"].step_chunk_checked if validate else g["fx"].step_chunk
            )
            g["pools"] = gchunk(g["pools"], ii, ss)

    @staticmethod
    def _painter_ok(raster_override):
        """Can this effect/group join the unified painter pass?  Ribbon
        segments and expanded mesh triangles concatenate fine, textured
        effects (any layer count) merge through the painter texture atlas
        (per-entry, per-layer tex id/size/mapping columns), and sharded
        pools join with gather semantics (``_replicate_pool``) so the
        global back-to-front sort interleaves sharded and unsharded
        entries exactly. Only per-effect raster overrides (a different
        tile grid cannot share a pass) keep their own passes."""
        return not raster_override

    def _scene_render_plan(
        self, insts, groups, camera, pipeline="auto", culled=frozenset()
    ):
        """Static render plan mirroring :meth:`render`: back-to-front
        ordering by emitter distance under ``camera``, same-blend batching,
        opaque/mask vs transparent phase split. Returns
        ``(opaque_passes, transp_passes)`` — tuples of hashable pass
        descriptors ("eff", i, kind) / ("batch", idxs, kind) /
        ("grp", gi, kind).

        ``culled``: names of frustum-culled entities (see
        :meth:`_culled_names`) — treated exactly like invisible ones, so a
        culled effect contributes no pass, no batch membership, and no
        painter entries (the per-view culling of queue_effects,
        render/mod.rs:5581). Culling is a PLAN decision: under a moving
        camera, entities crossing the frustum boundary change the plan and
        retrace the jitted whole-scene paths (the chunk-churn warning
        covers pathological cases).

        ``pipeline``: "split" forces the phase-split pipeline; "painter"
        forces the unified painter pass (raises if any effect is
        ineligible); "auto" (default) picks the painter pass whenever every
        visible effect/group is eligible AND the split plan would take >= 2
        passes — one global back-to-front sort replaces per-pass sorts,
        window gathers and blend loops, and orders transparents in true
        depth order ACROSS effects. The painter plan is the single
        descriptor ("painter", eff_idxs, group_idxs) in ``transp_passes``."""
        OPAQUE_KINDS = ("opaque", "mask")
        view_h = np.asarray(camera.view)
        cam_pos = -view_h[:3, :3].T @ view_h[:3, 3]

        def dist_key(i):
            t = np.asarray(insts[i].transform)[:, 3]
            return (
                -float(np.linalg.norm(cam_pos - t)),
                insts[i].asset.z_layer_2d,
            )

        vis_idx = sorted(
            (
                i
                for i, inst in enumerate(insts)
                if inst.visible and inst.name not in culled
            ),
            key=dist_key,
        )

        def batch_key(inst):
            a = inst.asset
            if (
                a.particle_layout().contains("ribbon_id")
                or a.mesh is not None
                or a.alpha_mode.kind == "mask"
                or inst.textures
                or inst.raster_override
                or inst.fx.mesh is not None
            ):
                return None
            return a.alpha_mode.kind

        def build_passes(idxs):
            runs = []
            for i in idxs:
                k = batch_key(insts[i])
                if runs and k is not None and runs[-1][0] == k:
                    runs[-1][1].append(i)
                else:
                    runs.append([k, [i]])
            passes = []
            for k, members in runs:
                if k is not None and len(members) > 1:
                    passes.append(("batch", tuple(members), k))
                else:
                    for i in members:
                        passes.append(
                            ("eff", i, insts[i].asset.alpha_mode.kind)
                        )
            return passes

        opq_idx = [
            i for i in vis_idx if insts[i].asset.alpha_mode.kind in OPAQUE_KINDS
        ]
        trn_idx = [
            i
            for i in vis_idx
            if insts[i].asset.alpha_mode.kind not in OPAQUE_KINDS
        ]
        vis_groups = [
            gi
            for gi, g in enumerate(groups)
            if g["visible"] and g.get("name") not in culled
        ]
        opq_groups = [
            gi
            for gi in vis_groups
            if groups[gi]["asset"].alpha_mode.kind in OPAQUE_KINDS
        ]
        trn_groups = [
            gi
            for gi in vis_groups
            if groups[gi]["asset"].alpha_mode.kind not in OPAQUE_KINDS
        ]
        opaque_passes = tuple(
            build_passes(opq_idx)
            + [
                ("grp", gi, groups[gi]["asset"].alpha_mode.kind)
                for gi in opq_groups
            ]
        )
        transp_passes = tuple(
            build_passes(trn_idx)
            + [
                ("grp", gi, groups[gi]["asset"].alpha_mode.kind)
                for gi in trn_groups
            ]
        )
        if pipeline not in ("auto", "split", "painter"):
            raise ValueError(
                f"pipeline must be 'auto', 'split' or 'painter'; got "
                f"{pipeline!r}"
            )
        if pipeline in ("auto", "painter"):
            eligible = all(
                self._painter_ok(getattr(insts[i], "raster_override", None))
                for i in vis_idx
            ) and all(
                self._painter_ok(groups[gi].get("raster_override"))
                for gi in vis_groups
            )
            if pipeline == "painter" and not eligible:
                raise ValueError(
                    "pipeline='painter' requires every visible effect/group "
                    "to be painter-eligible (no per-effect raster "
                    "overrides) — use 'auto' to fall back to the split "
                    "pipeline automatically"
                )
            n_passes = len(opaque_passes) + len(transp_passes)
            if eligible and (pipeline == "painter" or n_passes >= 2):
                return (), (("painter", tuple(vis_idx), tuple(vis_groups)),)
        return opaque_passes, transp_passes

    def update_render_chunk(
        self,
        frames: int,
        dt: float,
        camera,
        config=None,
        background: Optional[Tuple[float, float, float, float]] = None,
        scene_depth=None,
        on_frame=None,
        pipeline: str = "auto",
    ):
        """Advance AND render ``frames`` frames of the WHOLE scene in ONE
        device dispatch.

        The TPU analogue of the reference recording the entire frame —
        every compute pass and every draw — into one command encoder
        (render/mod.rs:6942-7613): a single ``lax.scan`` whose body steps
        every effect (event trees ride the carry exactly like
        :meth:`update_chunk`'s family scans) and every instanced group,
        then runs the full render pipeline of :meth:`render` — phase split
        (opaque/mask writing a real depth buffer, transparents tested
        against it), same-blend batching, back-to-front compositing — on
        the fresh pools. A realistic multi-effect scene thus pays ONE
        ~12 ms dispatch per K frames instead of one per pass per frame.

        Static per chunk (frozen at call time, like update_chunk):
        visibility, effect ordering (by emitter distance under the chunk's
        starting transforms), batching, and phases.

        Sharded groups participate like instanced groups: their pools keep
        their ``NamedSharding`` through the scan and GSPMD inserts the
        step collectives and the render-side gathers automatically (the
        explicitly-placed psum/slice collectives of
        :class:`ShardedRenderer` remain the per-frame path).

        ``on_frame(scene, i)`` runs host-side before each frame's inputs
        are captured — animate properties and transforms WITHIN the chunk
        (membership/visibility stay frozen).

        ``camera`` may be a SEQUENCE of cameras sharing one viewport: the
        scan body then renders every view per frame (vmap over camera
        params, like :meth:`render_views`) — K frames × V views in one
        dispatch. Ordering/batching is planned under ``cameras[0]``.

        Returns ``(image, checksums)``: the LAST frame's [H, W, 4]
        framebuffer ([V, H, W, 4] for multi-view) and a [K] array of
        per-frame framebuffer sums (each frame's raster feeds an output,
        so XLA cannot elide any draw).
        """
        import dataclasses

        import jax

        from ..render.raster import RasterConfig

        if self.hot_reload == "eager":
            self.apply_asset_changes()
        cams = (
            list(camera) if isinstance(camera, (list, tuple)) else None
        )
        if cams is not None:
            if not cams:
                raise ValueError("camera list must not be empty")
            if any(c.viewport != cams[0].viewport for c in cams):
                raise ValueError(
                    "all update_render_chunk cameras must share one viewport"
                )
            camera0 = cams[0]
        else:
            camera0 = camera
        vw, vh = camera0.viewport
        if background is None:
            background = (
                config.background if config is not None else (0.0, 0.0, 0.0, 1.0)
            )
        if config is None:
            config = RasterConfig(width=vw, height=vh)
        elif (config.width, config.height) != (vw, vh):
            config = dataclasses.replace(config, width=vw, height=vh)

        # The chunk API is camera-driven by construction, so WhenVisible
        # frustum gating is active here exactly as for update(dt, cameras=…)
        # — without this, a scene driven only through chunks would plumb
        # ``culled`` everywhere yet never cull anything.
        self._frustum_sim = True
        culled = self._culled_names(
            cams if cams is not None else [camera], for_render=True
        )
        (
            names,
            gnames,
            _families,
            per_effect_inputs,
            per_group_inputs,
            sims,
        ) = self._collect_chunk_inputs(frames, dt, on_frame, culled=culled)
        insts = [self._effects[n] for n in names]
        groups = [self._groups[g] for g in gnames]
        index = {n: i for i, n in enumerate(names)}

        opaque_passes, transp_passes = self._scene_render_plan(
            insts, groups, camera0, pipeline=pipeline, culled=culled
        )

        key = (
            len(cams) if cams is not None else 0,
            tuple(
                (
                    n,
                    # compile_signature: live spawner edits must not churn
                    # the whole-scene jit cache (counts are runtime inputs)
                    insts[i].asset.compile_signature(),
                    int(insts[i].pool.alive.shape[-1]),
                    index.get(insts[i].parent),
                    insts[i].child_channel,
                    tuple(sorted((insts[i].raster_override or {}).items())),
                    _texture_key(insts[i].textures),
                )
                for i, n in enumerate(names)
            ),
            tuple(
                (
                    g,
                    groups[gi]["asset"].compile_signature(),
                    groups[gi]["fx"].num_instances,
                    tuple(
                        sorted(
                            (groups[gi].get("raster_override") or {}).items()
                        )
                    ),
                    _texture_key(groups[gi]["textures"]),
                )
                for gi, g in enumerate(gnames)
            ),
            opaque_passes,
            transp_passes,
            config,
            scene_depth is not None,
            self.debug.validate,
        )
        fn = self._scene_chunk_jit.get(key)
        self._note_chunk_cache(fn is not None)
        if fn is None:
            fn = self._build_scene_chunk(
                insts, groups, opaque_passes, transp_passes, config,
                n_views=len(cams) if cams is not None else 0,
                checked=self.debug.validate,
            )
            self._scene_chunk_jit[key] = fn

        stacked = [
            CompiledEffect.stack_frames(per_effect_inputs[n], sims)
            for n in names
        ]
        member_inputs = tuple(ii for ii, _ in stacked)
        ss = (
            stacked[0][1]
            if stacked
            else CompiledEffect.stack_frames(
                [StepInputs.make()] * frames, sims
            )[1]
        )
        import jax.numpy as _jnp

        g_ins = tuple(
            (
                groups[gi]["fx"].shard_inputs_stacked(
                    jax.tree_util.tree_map(
                        lambda *xs: _jnp.stack(xs), *per_group_inputs[g]
                    )
                )
                if groups[gi].get("sharded")
                else jax.tree_util.tree_map(
                    lambda *xs: _jnp.stack(xs), *per_group_inputs[g]
                )
            )
            for gi, g in enumerate(gnames)
        )
        pendings = tuple(
            {
                ch: inst.last_events.get(ch)
                or inst.fx.make_empty_events(inst.pool.capacity)
                for ch in range(inst.fx.num_event_channels)
            }
            for inst in insts
        )
        fb_shape = (
            (len(cams), config.height, config.width, 4)
            if cams is not None
            else (config.height, config.width, 4)
        )
        fb0 = jnp.broadcast_to(
            jnp.asarray(background, jnp.float32), fb_shape
        ).astype(jnp.float32)
        carry = (
            tuple(inst.pool for inst in insts),
            pendings,
            tuple(g["pools"] for g in groups),
            fb0,
        )
        bg_vec = jnp.asarray(background, jnp.float32)
        if cams is not None:
            camera_arg = jax.tree_util.tree_map(
                lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *cams
            )
            vis_eff, vis_grp = self._per_view_visibility(cams, insts, groups)
        else:
            camera_arg = camera
            vis_eff = vis_grp = None
        (pools, pendings, gpools, image), sums = fn(
            carry, member_inputs, g_ins, ss, camera_arg, scene_depth, bg_vec,
            vis_eff, vis_grp,
        )
        for inst, pool, pend in zip(insts, pools, pendings):
            inst.pool = pool
            inst.last_events = pend
        for g, gp in zip(groups, gpools):
            g["pools"] = gp
        return image, sums

    def _make_scene_frame_renderer(
        self, insts, groups, opaque_passes, transp_passes, config
    ):
        """Build the TRACED one-frame scene renderer shared by
        :meth:`update_render_chunk` (inside its scan) and
        :meth:`render_views` (vmapped over cameras): phase split with depth
        threading, same-blend batched passes, per-pass composites."""
        import dataclasses

        import jax

        from ..render.extract import ParticleDrawData, extract_draw_data
        from ..render.raster import rasterize
        from ..render.renderer import composite_by_mode

        assets = [inst.asset for inst in insts]
        _texs = _convert_textures_shared(
            [inst.textures for inst in insts] + [g["textures"] for g in groups]
        )
        eff_texs, g_texs = _texs[: len(insts)], _texs[len(insts):]
        eff_cfgs = [
            dataclasses.replace(config, **inst.raster_override)
            if getattr(inst, "raster_override", None)
            else config
            for inst in insts
        ]
        g_assets = [g["asset"] for g in groups]
        g_cfgs = [
            dataclasses.replace(config, **g["raster_override"])
            if g.get("raster_override")
            else config
            for g in groups
        ]

        def neutral(kind):
            return (
                (1.0, 1.0, 1.0, 0.0)
                if kind == "multiply"
                else (0.0, 0.0, 0.0, 0.0)
            )

        def raster_draw(asset, draw, camera, kind, texs, fb, depth_in,
                        write_depth, base_cfg=None):
            cfg = dataclasses.replace(
                base_cfg if base_cfg is not None else config,
                background=neutral(kind),
            )
            out = rasterize(
                draw,
                camera,
                cfg,
                alpha_mode=kind,
                textures=list(texs),
                scene_depth=depth_in,
                return_depth=write_depth,
            )
            img, depth = out if write_depth else (out, depth_in)
            return composite_by_mode(img, fb, kind), depth

        def mask_vis(draw, vis, i):
            # per-view culling: zero the alive mask for views this entity
            # is outside of (shapes stay static under the camera vmap)
            if vis is None:
                return draw
            import dataclasses as _dc

            return _dc.replace(
                draw, alive=jnp.logical_and(draw.alive, vis[i])
            )

        def effect_draw(i, pool, inputs, sim, camera, vis=None):
            asset = assets[i]
            draw = extract_draw_data(
                asset,
                pool,
                camera,
                sim=sim,
                properties=inputs.properties,
                textures=list(eff_texs[i]),
                transform=inputs.transform,
            )
            draw = mask_vis(draw, vis, i)
            if asset.particle_layout().contains("ribbon_id"):
                from ..render.ribbon import build_ribbon_segments

                draw = build_ribbon_segments(draw, camera)
            elif asset.mesh is not None:
                from ..render.mesh import expand_mesh_draw

                draw = expand_mesh_draw(draw, asset.mesh)
            return draw

        def group_draw(gi, gpool, g_in, sim, camera, vis=None):
            asset = g_assets[gi]
            props0 = jax.tree_util.tree_map(
                lambda x: x[0], g_in.properties
            )
            draw = extract_draw_data(
                asset,
                gpool.flatten(composite_ribbon_ids=True),
                camera,
                sim=sim,
                properties=props0,
                textures=list(g_texs[gi]),
            )
            draw = mask_vis(draw, vis, gi)
            if asset.particle_layout().contains("ribbon_id"):
                from ..render.ribbon import build_ribbon_segments

                draw = build_ribbon_segments(draw, camera)
            elif asset.mesh is not None:
                from ..render.mesh import expand_mesh_draw

                draw = expand_mesh_draw(draw, asset.mesh)
            return draw

        def batch_draws(idxs, pools, m_ins, sim, camera, vis=None):
            draws = [
                mask_vis(
                    extract_draw_data(
                        assets[i],
                        pools[i],
                        camera,
                        sim=sim,
                        properties=m_ins[i].properties,
                        textures=[],
                        transform=m_ins[i].transform,
                    ),
                    vis,
                    i,
                )
                for i in idxs
            ]
            cat = lambda field: jnp.concatenate(
                [getattr(d, field) for d in draws]
            )
            if any(d.roundness is not None for d in draws):
                roundness = jnp.concatenate(
                    [
                        d.roundness
                        if d.roundness is not None
                        else jnp.zeros(d.alive.shape, jnp.float32)
                        for d in draws
                    ]
                )
            else:
                roundness = None
            return ParticleDrawData(
                position=cat("position"),
                axis_x=cat("axis_x"),
                axis_y=cat("axis_y"),
                color=cat("color"),
                alive=cat("alive"),
                roundness=roundness,
                sprite_index=cat("sprite_index"),
                sprite_grid_size=(1, 1),
                texture_layers=(),
                needs_uv=False,
            )

        def painter_concat(idxs, gidxs, pools, gpools, m_ins, g_ins_t,
                           sim, camera, vis_eff=None, vis_grp=None):
            """Concatenate every painter-eligible effect/group into ONE
            draw set with per-entry blend-mode ids (and mask cutoffs) for
            the unified painter pass (alpha_mode="scene"). Ribbon effects
            contribute their segment quads, mesh effects their expanded
            quad/triangle entries."""
            from ..render.extract import concat_painter_draws

            draws, kinds, texs = [], [], []
            for i in idxs:
                draws.append(
                    effect_draw(i, pools[i], m_ins[i], sim, camera, vis_eff)
                )
                kinds.append(assets[i].alpha_mode.kind)
                texs.append(eff_texs[i])
            for gi in gidxs:
                draws.append(
                    group_draw(
                        gi, gpools[gi], g_ins_t[gi], sim, camera, vis_grp
                    )
                )
                kinds.append(g_assets[gi].alpha_mode.kind)
                texs.append(g_texs[gi])
            return concat_painter_draws(draws, kinds, textures_per_draw=texs)

        def run_pass(p, pools, gpools, m_ins, g_ins_t, sim, camera, fb,
                     depth_in, write_depth, vis_eff=None, vis_grp=None):
            tag = p[0]
            if tag == "painter":
                draw = painter_concat(
                    p[1], p[2], pools, gpools, m_ins, g_ins_t, sim, camera,
                    vis_eff, vis_grp,
                )
                img = rasterize(
                    draw, camera, config, alpha_mode="scene", textures=[],
                    scene_depth=depth_in, framebuffer=fb,
                )
                return img, depth_in
            kind = p[2]
            if tag == "eff":
                i = p[1]
                draw = effect_draw(i, pools[i], m_ins[i], sim, camera, vis_eff)
                return raster_draw(
                    assets[i], draw, camera, kind, eff_texs[i], fb,
                    depth_in, write_depth, base_cfg=eff_cfgs[i],
                )
            if tag == "batch":
                draw = batch_draws(p[1], pools, m_ins, sim, camera, vis_eff)
                return raster_draw(
                    None, draw, camera, kind, (), fb, depth_in, write_depth
                )
            gi = p[1]
            draw = group_draw(gi, gpools[gi], g_ins_t[gi], sim, camera, vis_grp)
            return raster_draw(
                g_assets[gi], draw, camera, kind, g_texs[gi], fb,
                depth_in, write_depth, base_cfg=g_cfgs[gi],
            )

        def render_frame(pools, gpools, m_ins, g_ins_t, sim, camera,
                         scene_depth, bg_vec, vis_eff=None, vis_grp=None):
            fb = jnp.broadcast_to(
                bg_vec, (config.height, config.width, 4)
            ).astype(jnp.float32)
            depth_acc = scene_depth
            for p in opaque_passes:
                fb, depth_acc = run_pass(
                    p, pools, gpools, m_ins, g_ins_t, sim,
                    camera, fb, depth_acc, True, vis_eff, vis_grp,
                )
            for p in transp_passes:
                fb, _ = run_pass(
                    p, pools, gpools, m_ins, g_ins_t, sim,
                    camera, fb, depth_acc, False, vis_eff, vis_grp,
                )
            return fb

        return render_frame

    def _build_scene_chunk(
        self, insts, groups, opaque_passes, transp_passes, config,
        n_views: int = 0, checked: bool = False,
    ):
        """Build the jitted whole-scene K-frame step+render scan.
        ``n_views > 0``: ``camera`` is a stacked pytree and every frame
        renders all views (vmapped), fb = [V, H, W, 4].
        ``checked=True`` (DebugSettings.validate): the WHOLE scan — every
        member step, group step, and raster pass — runs under checkify
        (index bounds + NaN/Inf traps), no donation."""
        import jax

        render_frame = self._make_scene_frame_renderer(
            insts, groups, opaque_passes, transp_passes, config
        )
        fxs = [inst.fx for inst in insts]
        parent_idx = [
            None
            if inst.parent is None
            else [j.name for j in insts].index(inst.parent)
            for inst in insts
        ]
        chans = [inst.child_channel for inst in insts]
        g_steps = [
            jax.vmap(
                (lambda gfx: lambda pool, inputs, sim: gfx.effect._step(
                    pool, inputs, sim, None, None
                ))(gfx),
                in_axes=(0, 0, None),
            )
            for gfx in [g["fx"] for g in groups]
        ]

        def chunk_fn(carry, member_inputs, g_ins, sims, camera, scene_depth,
                     bg_vec, vis_eff=None, vis_grp=None):
            def body(c, per_frame):
                pools, pendings, gpools, _ = c
                m_ins, g_ins_t, sim = per_frame
                # ---- step: whole scene as one family-style pass ----
                new_pools, new_pendings = [], []
                for i, fx in enumerate(fxs):
                    ev_in = (
                        None
                        if parent_idx[i] is None
                        else pendings[parent_idx[i]][chans[i]]
                    )
                    pool, ev_out = fx._step(
                        pools[i], m_ins[i], sim, ev_in, None
                    )
                    new_pools.append(pool)
                    new_pendings.append(ev_out)
                new_gpools = []
                for gi, vm in enumerate(g_steps):
                    gp, _ = vm(gpools[gi], g_ins_t[gi], sim)
                    new_gpools.append(gp)
                # ---- render the fresh pools ----
                if n_views:
                    # per-view culling masks ride the camera vmap (frozen
                    # for the chunk, like visibility)
                    fb = jax.vmap(
                        lambda cam, ve, vg: render_frame(
                            new_pools, new_gpools, m_ins, g_ins_t, sim,
                            cam, scene_depth, bg_vec, ve, vg,
                        )
                    )(camera, vis_eff, vis_grp)
                else:
                    fb = render_frame(
                        new_pools, new_gpools, m_ins, g_ins_t, sim, camera,
                        scene_depth, bg_vec,
                    )
                return (
                    tuple(new_pools),
                    tuple(new_pendings),
                    tuple(new_gpools),
                    fb,
                ), jnp.sum(fb)

            return jax.lax.scan(body, carry, (member_inputs, g_ins, sims))

        if checked:
            from jax.experimental import checkify

            cfn = jax.jit(
                checkify.checkify(
                    chunk_fn,
                    errors=checkify.index_checks | checkify.float_checks,
                )
            )

            def checked_fn(*args):
                err, out = cfn(*args)
                err.throw()
                return out

            return checked_fn
        return jax.jit(chunk_fn, donate_argnums=(0,))

    def render_views(
        self,
        cameras,
        config=None,
        background: Optional[Tuple[float, float, float, float]] = None,
        scene_depth=None,
        pipeline: str = "auto",
    ) -> jnp.ndarray:
        """Render the CURRENT scene state from V cameras in ONE dispatch.

        The reference queues its draws once per view within a single frame
        (render/mod.rs:5580 queue_effects over views); here the traced
        scene frame renderer — the same phase split / batching / composites
        as :meth:`render` — is ``vmap``-ed over stacked camera parameters,
        so split-screen or multi-camera rendering costs ~V× rasterization
        in one device round-trip instead of V separate dispatches.

        Culling is per view (the reference's per-view
        RenderVisibleEntities, render/mod.rs:5580-5600): an entity outside
        EVERY camera's frustum leaves the plan entirely; one outside only
        SOME cameras stays in the plan but its alive mask zeroes in those
        views, so it contributes no bin entries, no blend energy, and no
        sort keys there (shapes stay static under the vmap).

        All cameras must share one viewport (one raster grid). The
        back-to-front effect ordering is frozen under ``cameras[0]`` —
        the one remaining cross-view approximation: same-kind transparent
        PASSES composite in camera-0 depth order in every view (within a
        pass, and across all opaque/mask content, per-pixel depth is
        exact per view). For wildly different views whose pass orderings
        disagree, render per view. ``scene_depth``, if given, is shared
        by all views. Returns a [V, H, W, 4] image stack.
        """
        import dataclasses

        import jax

        from ..render.raster import RasterConfig

        if self.hot_reload == "eager":
            self.apply_asset_changes()
        cameras = list(cameras)
        if not cameras:
            raise ValueError("render_views needs at least one camera")
        vp = cameras[0].viewport
        if any(c.viewport != vp for c in cameras):
            raise ValueError(
                "all render_views cameras must share one viewport"
            )
        vw, vh = vp
        if background is None:
            background = (
                config.background if config is not None else (0.0, 0.0, 0.0, 1.0)
            )
        if config is None:
            config = RasterConfig(width=vw, height=vh)
        elif (config.width, config.height) != (vw, vh):
            config = dataclasses.replace(config, width=vw, height=vh)

        names = [n for n in self._order]
        insts = [self._effects[n] for n in names]
        gnames = list(self._groups)
        groups = [self._groups[g] for g in gnames]
        opaque_passes, transp_passes = self._scene_render_plan(
            insts, groups, cameras[0], pipeline=pipeline,
            culled=self._culled_names(cameras, for_render=True),
        )
        vis_eff, vis_grp = self._per_view_visibility(cameras, insts, groups)
        key = (
            "views",
            tuple(
                (n, insts[i].asset.compile_signature(),
                 int(insts[i].pool.alive.shape[-1]),
                 tuple(sorted((insts[i].raster_override or {}).items())),
                 _texture_key(insts[i].textures))
                for i, n in enumerate(names)
            ),
            tuple(
                (g, groups[gi]["asset"].compile_signature(),
                 groups[gi]["fx"].num_instances,
                 tuple(
                     sorted(
                         (groups[gi].get("raster_override") or {}).items()
                     )
                 ),
                 _texture_key(groups[gi]["textures"]))
                for gi, g in enumerate(gnames)
            ),
            opaque_passes,
            transp_passes,
            config,
            scene_depth is not None,
        )
        fn = self._scene_chunk_jit.get(key)
        self._note_chunk_cache(fn is not None)
        if fn is None:
            render_frame = self._make_scene_frame_renderer(
                insts, groups, opaque_passes, transp_passes, config
            )
            fn = jax.jit(
                jax.vmap(
                    render_frame,
                    in_axes=(
                        None, None, None, None, None, 0, None, None, 0, 0,
                    ),
                )
            )
            self._scene_chunk_jit[key] = fn

        sim = self.clock.sim_params()
        m_ins = tuple(
            StepInputs.make(
                0,
                0,
                inst.transform,
                inst.properties.as_dict(),
            )
            for inst in insts
        )
        g_ins = tuple(
            g["fx"].make_inputs(
                np.zeros(g["fx"].num_instances, np.int32),
                np.zeros(g["fx"].num_instances, np.uint32),
                g["transforms"],
                g["properties"].as_dict(),
            )
            for g in groups
        )
        cam_stack = jax.tree_util.tree_map(
            lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *cameras
        )
        bg_vec = jnp.asarray(background, jnp.float32)
        return fn(
            tuple(inst.pool for inst in insts),
            tuple(g["pools"] for g in groups),
            m_ins,
            g_ins,
            sim,
            cam_stack,
            scene_depth,
            bg_vec,
            vis_eff,
            vis_grp,
        )

    def warmup(self) -> None:
        """Compile every instance's step (replaces the readiness protocol)."""
        self.update(0.0)

    # -- rendering -------------------------------------------------------------

    def render(
        self,
        camera,
        config=None,
        background: Optional[Tuple[float, float, float, float]] = None,
        scene_depth=None,
        return_depth: bool = False,
        pipeline: str = "auto",
    ) -> jnp.ndarray:
        """Composite all visible effects back-to-front by emitter distance
        (≈ Transparent3d phase sorting) / z_layer_2d for 2D ties.

        ``config`` defaults to a ``RasterConfig`` sized from the camera
        viewport; an explicit config with mismatched width/height is aligned
        to the viewport (a mismatch only ever crops or pads the image).
        The clear color is ``background`` if given, else
        ``config.background``, else opaque black.

        ``scene_depth`` ([H, W] view-axis distances of surrounding scene
        geometry, +inf where empty) occludes particles behind it in every
        pass, sharded groups included — the analogue of the reference
        depth-testing its draws against the game's depth buffer.

        ``return_depth=True`` returns ``(image, depth)`` where ``depth`` is
        the scene depth merged with everything the opaque/mask phase wrote
        (+inf where neither exists) — hand it to a game engine to composite
        the particle layer against other geometry.

        ``pipeline``: "split" = the phase-split pipeline above; "painter" =
        ONE unified back-to-front pass over every effect's entries with
        per-entry blend equations — ribbons join via their segment quads,
        meshes via expanded triangles, textures (any layer count) via a
        stacked atlas, and sharded pools via gather semantics (their flat
        draw set replicates over ICI so the global sort interleaves them
        exactly; raises unless all effects are eligible: no per-effect
        raster overrides); "auto" (default) = painter whenever eligible
        and the split plan would take >= 2 passes. The painter pass keeps pixel-identical occlusion
        (an opaque entry simply overwrites everything behind it) and
        orders transparents in true depth order ACROSS effects, where the
        split pipeline can only order whole passes by emitter distance.
        """
        import dataclasses

        from ..render.renderer import EffectRenderer
        from ..render.raster import RasterConfig

        if self.hot_reload == "eager":
            self.apply_asset_changes()
        vw, vh = camera.viewport
        if background is None:
            background = (
                config.background if config is not None else (0.0, 0.0, 0.0, 1.0)
            )
        if config is None:
            config = RasterConfig(width=vw, height=vh)
        elif (config.width, config.height) != (vw, vh):
            config = dataclasses.replace(config, width=vw, height=vh)

        fb = jnp.broadcast_to(
            jnp.asarray(background, jnp.float32),
            (config.height, config.width, 4),
        )
        sim = self.clock.sim_params()

        # ONE source of truth for the pipeline: the same plan that drives
        # render_views and update_render_chunk (back-to-front ordering,
        # same-blend batching, the opaque/mask-vs-transparent phase split,
        # painter eligibility and the auto rule all live in
        # _scene_render_plan) — the eager path only executes descriptors.
        insts_all = [self._effects[n] for n in self._order]
        groups_all = list(self._groups.values())
        opaque_passes, transp_passes = self._scene_render_plan(
            insts_all, groups_all, camera, pipeline=pipeline,
            culled=self._culled_names([camera], for_render=True),
        )

        def ensure_renderer(inst):
            cfg = (
                dataclasses.replace(config, **inst.raster_override)
                if inst.raster_override
                else config
            )
            if inst.renderer is None or inst.renderer.config != cfg:
                inst.renderer = EffectRenderer(
                    inst.asset, cfg, textures=inst.textures
                )
            return inst.renderer

        def ensure_group_renderer(g):
            cfg = (
                dataclasses.replace(config, **g["raster_override"])
                if g.get("raster_override")
                else config
            )
            if g["renderer"] is None or g["renderer"].config != cfg:
                g["renderer"] = EffectRenderer(
                    g["asset"], cfg, textures=g["textures"]
                )
            return g["renderer"]

        if transp_passes and transp_passes[0][0] == "painter":
            _, eff_idxs, grp_idxs = transp_passes[0]
            return self._render_painter(
                [insts_all[i] for i in eff_idxs],
                [groups_all[gi] for gi in grp_idxs],
                camera,
                config,
                sim,
                fb,
                scene_depth,
                return_depth,
            )

        def run_pass(desc, fb, depth, want_depth):
            tag = desc[0]
            if tag == "batch":
                return self._render_batch(
                    [insts_all[i] for i in desc[1]], desc[2], camera,
                    config, sim, fb, depth, return_depth=want_depth,
                )
            if tag == "eff":
                inst = insts_all[desc[1]]
                pool = inst.pool
                if inst.fx.mesh is not None:
                    # gather-mode semantics for sharded instances: replicate
                    # then rasterize — bit-exact with the unsharded render
                    pool = _replicate_pool(pool, inst.fx.mesh)
                return ensure_renderer(inst).render(
                    pool,
                    camera,
                    sim=sim,
                    properties=inst.properties.as_dict(),
                    transform=inst.transform,
                    framebuffer=fb,
                    scene_depth=depth,
                    return_depth=want_depth,
                )
            g = groups_all[desc[1]]
            if g.get("sharded"):
                # opaque/mask sharded renders use gather mode, which
                # returns the replicated depth plane for free
                return self._render_sharded_group(
                    g, camera, config, sim, fb, depth,
                    return_depth=want_depth,
                )
            return ensure_group_renderer(g).render(
                self._group_flat_pool(g),
                camera,
                sim=sim,
                properties=g["properties"].as_dict(),
                framebuffer=fb,
                scene_depth=depth,
                return_depth=want_depth,
            )

        # Phase split, mirroring the reference's render phases: opaque and
        # mask passes draw FIRST threading a real depth buffer
        # (Opaque3d/AlphaMask3d write depth), then transparent passes are
        # depth-tested against it (Transparent3d) — cross-effect opaque
        # interleave and transparent-behind-opaque occlusion are exact per
        # pixel instead of approximated by emitter-distance ordering.
        depth_acc = scene_depth
        for desc in opaque_passes:
            fb, depth_acc = run_pass(desc, fb, depth_acc, True)
        if opaque_passes:
            scene_depth = depth_acc
        for desc in transp_passes:
            fb = run_pass(desc, fb, scene_depth, False)
        if self.debug.validate and not bool(jnp.isfinite(fb).all()):
            raise FloatingPointError(
                "debug validation: rendered framebuffer contains non-finite "
                "pixels — a NaN/Inf reached the raster output (poison read, "
                "bad color expression, or degenerate projection)"
            )
        if return_depth:
            if depth_acc is None:
                depth_acc = jnp.full(
                    (config.height, config.width), jnp.inf, jnp.float32
                )
            return fb, depth_acc
        return fb

    def _render_sharded_group(
        self, g, camera, config, sim, fb, scene_depth=None,
        return_depth=False,
    ):
        """Rasterize a sharded group on its mesh, then composite the
        replicated image onto the scene framebuffer with the effect's blend
        equation (the one cross-shard op of the frame)."""
        import dataclasses

        from ..parallel.render import ShardedRenderer
        from ..render.renderer import composite_by_mode

        alpha_kind = g["asset"].alpha_mode.kind
        neutral = (
            (1.0, 1.0, 1.0, 0.0) if alpha_kind == "multiply" else (0.0, 0.0, 0.0, 0.0)
        )
        cfg = dataclasses.replace(config, background=neutral)
        r = g["renderer"]
        if not isinstance(r, ShardedRenderer) or r.config != cfg:
            r = ShardedRenderer(
                g["fx"], cfg, textures=g["textures"], mode=g["render_mode"]
            )
            g["renderer"] = r
        out = r.render(
            g["pools"],
            camera,
            sim=sim,
            properties=g["properties"].as_dict(),
            scene_depth=scene_depth,
            return_depth=return_depth,
        )
        if return_depth:
            img, depth = out
            return composite_by_mode(img, fb, alpha_kind), depth
        return composite_by_mode(out, fb, alpha_kind)

    def _render_batch(
        self, insts, alpha_kind, camera, config, sim, fb, scene_depth=None,
        return_depth=False,
    ):
        """Rasterize several same-blend-state effects in one pass (one
        (tile, depth) sort for the whole batch)."""
        import dataclasses

        import jax

        from ..render.extract import ParticleDrawData, extract_draw_data
        from ..render.raster import rasterize

        key = (
            tuple(i.asset.compile_signature() for i in insts),
            tuple(int(i.pool.alive.shape[-1]) for i in insts),
            alpha_kind,
            config,
            return_depth,
        )
        fn = self._batch_render_jit.get(key)
        if fn is None:
            from ..render.renderer import composite_by_mode

            assets = [i.asset for i in insts]
            neutral = (
                (1.0, 1.0, 1.0, 0.0)
                if alpha_kind == "multiply"
                else (0.0, 0.0, 0.0, 0.0)
            )
            cfg0 = dataclasses.replace(config, background=neutral)

            def render_fn(pools, transforms, props, camera, sim, fb, sd):
                draws = [
                    extract_draw_data(
                        a, p, camera, sim=sim, properties=pr,
                        textures=[], transform=tr,
                    )
                    for a, p, tr, pr in zip(assets, pools, transforms, props)
                ]
                cat = lambda field: jnp.concatenate(
                    [getattr(d, field) for d in draws]
                )
                # (mask-mode effects are never batched — see batch_key — so
                # no alpha_cutoff concat is needed here)
                # roundness stays None (squircle statically skipped) unless
                # some batched effect actually uses a RoundModifier
                if any(d.roundness is not None for d in draws):
                    roundness = jnp.concatenate(
                        [
                            d.roundness
                            if d.roundness is not None
                            else jnp.zeros(d.alive.shape, jnp.float32)
                            for d in draws
                        ]
                    )
                else:
                    roundness = None
                # (mesh/ribbon effects are never batched — see _batch_key —
                # so draw.tri is always None here)
                flat = ParticleDrawData(
                    position=cat("position"),
                    axis_x=cat("axis_x"),
                    axis_y=cat("axis_y"),
                    color=cat("color"),
                    alive=cat("alive"),
                    roundness=roundness,
                    sprite_index=cat("sprite_index"),
                    sprite_grid_size=(1, 1),
                    texture_layers=(),
                    needs_uv=False,
                )
                out = rasterize(
                    flat, camera, cfg0, alpha_mode=alpha_kind, textures=[],
                    scene_depth=sd, return_depth=return_depth,
                )
                if return_depth:
                    img, depth = out
                    return composite_by_mode(img, fb, alpha_kind), depth
                return composite_by_mode(out, fb, alpha_kind)

            fn = jax.jit(render_fn)
            self._batch_render_jit[key] = fn
        return fn(
            tuple(i.pool for i in insts),
            tuple(i.transform for i in insts),
            tuple(i.properties.as_dict() for i in insts),
            camera,
            sim,
            fb,
            scene_depth,
        )

    def _render_painter(
        self, insts, groups, camera, config, sim, fb, scene_depth=None,
        return_depth=False,
    ):
        """Rasterize EVERY eligible effect and group in one unified
        painter pass (alpha_mode="scene"): one global (tile, depth) sort,
        one window gather, one blend loop — per-entry blend-mode ids
        select the blend equation, opaque/mask entries write depth
        mid-loop. ``insts`` must already be in back-to-front emitter
        order (sort ties only)."""
        import jax

        from ..render.extract import concat_painter_draws, extract_draw_data
        from ..render.raster import rasterize

        _texs = _convert_textures_shared(
            [i.textures for i in insts] + [g["textures"] for g in groups]
        )
        eff_texs, g_texs = _texs[: len(insts)], _texs[len(insts):]
        key = (
            "painter",
            tuple(i.asset.compile_signature() for i in insts),
            tuple(int(i.pool.alive.shape[-1]) for i in insts),
            tuple(g["asset"].compile_signature() for g in groups),
            tuple(g["fx"].num_instances for g in groups),
            # keyed on the ORIGINAL texture objects (eff_texs/g_texs are
            # fresh conversions every call, so their ids don't identify)
            tuple(_texture_key(i.textures) for i in insts)
            + tuple(_texture_key(g["textures"]) for g in groups),
            config,
            return_depth,
            scene_depth is not None,
        )
        fn = self._batch_render_jit.get(key)
        if fn is None:
            assets = [i.asset for i in insts]
            g_assets = [g["asset"] for g in groups]
            kinds = [a.alpha_mode.kind for a in assets] + [
                a.alpha_mode.kind for a in g_assets
            ]

            def expand(asset, draw, camera):
                if asset.particle_layout().contains("ribbon_id"):
                    from ..render.ribbon import build_ribbon_segments

                    return build_ribbon_segments(draw, camera)
                if asset.mesh is not None:
                    from ..render.mesh import expand_mesh_draw

                    return expand_mesh_draw(draw, asset.mesh)
                return draw

            def render_fn(pools, transforms, props, gpools, gprops,
                          camera, sim, fb, sd):
                draws = [
                    expand(
                        a,
                        extract_draw_data(
                            a, p, camera, sim=sim, properties=pr,
                            textures=list(ts), transform=tr,
                        ),
                        camera,
                    )
                    for a, p, tr, pr, ts in zip(
                        assets, pools, transforms, props, eff_texs
                    )
                ]
                draws += [
                    expand(
                        a,
                        extract_draw_data(
                            a, gp, camera, sim=sim, properties=gpr,
                            textures=list(ts),
                        ),
                        camera,
                    )
                    for a, gp, gpr, ts in zip(
                        g_assets, gpools, gprops, g_texs
                    )
                ]
                flat = concat_painter_draws(
                    draws, kinds, textures_per_draw=eff_texs + g_texs
                )
                return rasterize(
                    flat, camera, config, alpha_mode="scene", textures=[],
                    scene_depth=sd, framebuffer=fb,
                    return_depth=return_depth,
                )

            fn = jax.jit(render_fn)
            self._batch_render_jit[key] = fn

        def eff_pool(inst):
            # sharded single instances join the painter with gather
            # semantics: replicate first so the global sort sees the
            # identical single-device entry order (same rationale as
            # _group_flat_pool and the split-path sharded-instance render)
            if inst.fx.mesh is None:
                return inst.pool
            return _replicate_pool(inst.pool, inst.fx.mesh)

        return fn(
            tuple(eff_pool(i) for i in insts),
            tuple(i.transform for i in insts),
            tuple(i.properties.as_dict() for i in insts),
            tuple(self._group_flat_pool(g) for g in groups),
            tuple(g["properties"].as_dict() for g in groups),
            camera,
            sim,
            fb,
            scene_depth,
        )

    def total_alive(self) -> int:
        return sum(e.alive_count() for e in self.effects()) + sum(
            self.group_alive(n) for n in self._groups
        )

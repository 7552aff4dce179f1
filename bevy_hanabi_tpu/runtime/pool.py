"""SoA particle pool: the TPU equivalent of the reference's ParticleSlab.

The reference sub-allocates AoS byte ranges inside big GPU slabs
(``EffectCache``/``ParticleSlab``, render/effect_cache.rs:191-626) and tracks
alive/dead slots with atomic index lists. Here the pool is a **pytree of SoA
arrays** — ``{attr: f32[N,k]}`` + ``alive: bool[N]`` — which is the layout the
VPU/XLA wants, and alive/dead bookkeeping is a boolean mask transformed by
cumsum ranking (no atomics, no ping-pong: functional updates make the
reader/writer hazard the reference engineers around simply not exist).

Being a pytree, a pool is trivially checkpointable (``jax.tree_util`` +
numpy save), vmappable over an instance axis, and shardable over a device
mesh — three things the reference's GPU slabs cannot do.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..attributes import Attribute, ParticleLayout

__all__ = ["ParticlePool"]

# Debug poison: reference fills fresh slabs with 0xFFFFFFFF in debug builds
# (effect_cache.rs:270-296) so stale reads are obvious. Same trick here.
_POISON_BITS = np.uint32(0xFFFFFFFF)


@jax.tree_util.register_pytree_node_class
class ParticlePool:
    """Fixed-capacity SoA particle storage for one effect (or one instance).

    Fields:
      attrs:   dict attr_name -> [N] or [N, k] array
      alive:   bool[N]
      seed:    uint32[N] per-lane PCG state (hidden attr, vfx_init.wgsl:154)
      counter: uint32[] total particles ever spawned (PARTICLE_COUNTER base)
    """

    def __init__(self, attrs: Dict[str, jnp.ndarray], alive, seed, counter):
        self.attrs = attrs
        self.alive = alive
        self.seed = seed
        self.counter = counter

    # -- pytree ------------------------------------------------------------

    def tree_flatten(self):
        names = tuple(sorted(self.attrs))
        children = tuple(self.attrs[n] for n in names) + (
            self.alive,
            self.seed,
            self.counter,
        )
        return children, names

    @classmethod
    def tree_unflatten(cls, names, children):
        attrs = dict(zip(names, children[: len(names)]))
        alive, seed, counter = children[len(names) :]
        return cls(attrs, alive, seed, counter)

    # -- construction --------------------------------------------------------

    @staticmethod
    def create(
        layout: ParticleLayout,
        capacity: int,
        poison: bool = False,
    ) -> "ParticlePool":
        """Allocate a pool with every slot dead.

        ``poison=True`` bit-fills attribute storage with 0xFFFFFFFF (debug aid,
        mirrors effect_cache.rs:270-296); default is attribute defaults.
        """
        attrs: Dict[str, jnp.ndarray] = {}
        for a in layout.storage_attributes():
            shape = (capacity,) if a.lanes == 1 else (capacity, a.lanes)
            if poison:
                raw = np.broadcast_to(_POISON_BITS, shape)
                arr = jnp.asarray(raw).view(
                    jnp.uint32 if a.np_dtype == np.uint32 else a.np_dtype
                )
                if a.np_dtype == np.dtype(np.bool_):
                    arr = jnp.ones(shape, jnp.bool_)
                attrs[a.name] = arr
            else:
                default = jnp.asarray(a.default_numpy())
                attrs[a.name] = jnp.broadcast_to(default, shape).astype(a.np_dtype)
        return ParticlePool(
            attrs=attrs,
            alive=jnp.zeros((capacity,), jnp.bool_),
            seed=jnp.zeros((capacity,), jnp.uint32),
            counter=jnp.zeros((), jnp.uint32),
        )

    # -- inspection -----------------------------------------------------------

    def flatten(self, composite_ribbon_ids: bool = False) -> "ParticlePool":
        """View instanced [I, N, ...] pools as one flat [I*N] pool.

        The counter is summed (it only seeds PARTICLE_COUNTER for future
        spawns, which a flat view never performs).

        ``composite_ribbon_ids`` rewrites the flat ``ribbon_id`` to
        ``rid * I + instance`` so same-rid trails from different instances
        stay distinct ribbons after flattening (the segment sort groups by
        raw rid; ``parallel/render.py`` composites the same way across dp).
        """
        i, n = self.alive.shape
        attrs = {
            k: v.reshape((i * n,) + v.shape[2:]) for k, v in self.attrs.items()
        }
        if composite_ribbon_ids and "ribbon_id" in attrs:
            inst = jnp.arange(i * n, dtype=jnp.uint32) // jnp.uint32(n)
            attrs["ribbon_id"] = (
                attrs["ribbon_id"].astype(jnp.uint32) * jnp.uint32(i) + inst
            )
        return ParticlePool(
            attrs=attrs,
            alive=self.alive.reshape(i * n),
            seed=self.seed.reshape(i * n),
            counter=jnp.sum(self.counter),
        )

    @property
    def capacity(self) -> int:
        return int(self.alive.shape[-1])

    def alive_count(self):
        """Device scalar count of alive particles (≈ EffectMetadata.alive_count)."""
        return jnp.sum(self.alive, dtype=jnp.int32)

    def get(self, attr) -> jnp.ndarray:
        name = attr.name if isinstance(attr, Attribute) else attr
        return self.attrs[name]

    # -- checkpoint (reference has none: particle state lives only on GPU;
    #    a pytree pool makes this a one-liner win, SURVEY.md §5) -------------

    def save(self, path: str) -> None:
        arrays = {f"attr:{k}": np.asarray(v) for k, v in self.attrs.items()}
        arrays["alive"] = np.asarray(self.alive)
        arrays["seed"] = np.asarray(self.seed)
        arrays["counter"] = np.asarray(self.counter)
        np.savez(path, **arrays)

    @staticmethod
    def load(path: str) -> "ParticlePool":
        data = np.load(path if path.endswith(".npz") else path + ".npz")
        attrs = {
            k[len("attr:") :]: jnp.asarray(v)
            for k, v in data.items()
            if k.startswith("attr:")
        }
        return ParticlePool(
            attrs=attrs,
            alive=jnp.asarray(data["alive"]),
            seed=jnp.asarray(data["seed"]),
            counter=jnp.asarray(data["counter"]),
        )

"""Counter/state-based PCG random numbers, bit-exact with the reference.

The reference implements its particle RNG directly in WGSL
(``/root/reference/src/render/vfx_common.wgsl:260-364``): a per-invocation
``seed: u32`` advanced by ``pcg_hash`` with floats built by masking 23
mantissa bits. Trajectory parity with the reference requires the exact same
bit recipe, so this module reimplements that *behavior* on uint32 JAX arrays
instead of using ``jax.random`` (which uses threefry and different float
construction).

All functions are stateless over arrays: they take a ``seed`` array (any
shape, uint32) and return ``(new_seed, value)``. Per-particle seeds live in
the pool as a hidden SoA field; each rand draw inside a compiled expression
graph threads the seed through functionally, which XLA fuses into the
surrounding elementwise work (no extra memory traffic).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "pcg_hash",
    "to_float01",
    "frand",
    "frand2",
    "frand3",
    "frand4",
    "rand_uniform",
    "rand_normal",
    "initial_seed",
]

_TAU = 6.283185307179586476925286766559


def _u32(x):
    return jnp.asarray(x, dtype=jnp.uint32)


def pcg_hash(x):
    """One round of the PCG-RXS-M-XS-ish hash used by the reference.

    Matches vfx_common.wgsl ``pcg_hash`` bit-for-bit on uint32 inputs.
    """
    x = _u32(x)
    state = x * jnp.uint32(747796405) + jnp.uint32(2891336453)
    word = ((state >> ((state >> jnp.uint32(28)) + jnp.uint32(4))) ^ state) * jnp.uint32(
        277803737
    )
    return (word >> jnp.uint32(22)) ^ word


def to_float01(u):
    """Map uint32 to float in [0, 1) using the 23-mantissa-bit trick."""
    u = _u32(u)
    bits = (u & jnp.uint32(0x007FFFFF)) | jnp.uint32(0x3F800000)
    return jnp.asarray(bits).view(jnp.float32) - jnp.float32(1.0)


def initial_seed(index, spawner_seed):
    """Per-particle initial seed: ``pcg_hash(index ^ spawner_seed)``.

    Mirrors vfx_init.wgsl:154.
    """
    return pcg_hash(_u32(index) ^ _u32(spawner_seed))


def frand(seed):
    """One float in [0,1). Matches vfx_common.wgsl ``frand``."""
    seed = pcg_hash(seed)
    return seed, to_float01(pcg_hash(seed))


def frand2(seed):
    """vec2 of floats in [0,1). Matches ``frand2`` (components use the
    advanced seed directly, unlike ``frand``)."""
    s1 = pcg_hash(seed)
    x = to_float01(s1)
    s2 = pcg_hash(s1)
    y = to_float01(s2)
    return s2, jnp.stack([x, y], axis=-1)


def frand3(seed):
    s1 = pcg_hash(seed)
    s2 = pcg_hash(s1)
    s3 = pcg_hash(s2)
    v = jnp.stack([to_float01(s1), to_float01(s2), to_float01(s3)], axis=-1)
    return s3, v


def frand4(seed):
    """vec4 from 3 hashes with bit-splicing, matching ``frand4``."""
    r0 = pcg_hash(seed)
    r1 = pcg_hash(r0)
    r2 = pcg_hash(r1)
    x = to_float01(r0)
    r01 = ((r0 & jnp.uint32(0xFF000000)) >> jnp.uint32(8)) | (r1 & jnp.uint32(0x0000FFFF))
    y = to_float01(r01)
    r12 = ((r1 & jnp.uint32(0xFFFF0000)) >> jnp.uint32(8)) | (r2 & jnp.uint32(0x000000FF))
    z = to_float01(r12)
    r22 = r2 >> jnp.uint32(8)
    w = to_float01(r22)
    return r2, jnp.stack([x, y, z, w], axis=-1)


_FRAND_BY_COUNT = {1: frand, 2: frand2, 3: frand3, 4: frand4}


def rand_vec(seed, count: int):
    """[0,1) uniform of 1..4 components; returns (new_seed, value)."""
    return _FRAND_BY_COUNT[count](seed)


def rand_uniform(seed, a, b, count: int):
    """``a + frandN() * (b - a)`` (vfx_common.wgsl rand_uniform_*)."""
    seed, r = rand_vec(seed, count)
    return seed, a + r * (b - a)


def rand_normal(seed, mean, std_dev, count: int):
    """Box-Muller normal matching vfx_common.wgsl rand_normal_*.

    For vectors: one shared radius ``r = sqrt(-2 log u)`` from a scalar draw,
    per-component angles from a vector draw — exactly the reference recipe.
    """
    seed, u = frand(seed)
    seed, v = rand_vec(seed, count)
    r = jnp.sqrt(-2.0 * jnp.log(u))
    if count > 1:
        r = r[..., None]
    return seed, mean + std_dev * r * jnp.cos(_TAU * v)

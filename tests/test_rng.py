import numpy as np

from bevy_hanabi_tpu.ops import rng


def pcg_py(x: int) -> int:
    """Pure-python mirror of the WGSL pcg_hash for cross-checking."""
    x &= 0xFFFFFFFF
    state = (x * 747796405 + 2891336453) & 0xFFFFFFFF
    word = (((state >> ((state >> 28) + 4)) ^ state) * 277803737) & 0xFFFFFFFF
    return ((word >> 22) ^ word) & 0xFFFFFFFF


def to_float01_py(u: int) -> float:
    bits = (u & 0x007FFFFF) | 0x3F800000
    return np.frombuffer(np.uint32(bits).tobytes(), np.float32)[0] - 1.0


def test_pcg_hash_bit_exact():
    xs = np.array([0, 1, 2, 12345, 0xFFFFFFFF, 0xDEADBEEF], dtype=np.uint32)
    got = np.asarray(rng.pcg_hash(xs))
    want = np.array([pcg_py(int(x)) for x in xs], dtype=np.uint32)
    np.testing.assert_array_equal(got, want)


def test_to_float01_range_and_value():
    xs = np.array([0, 1, 0x007FFFFF, 0xFFFFFFFF, 12345678], dtype=np.uint32)
    got = np.asarray(rng.to_float01(xs))
    want = np.array([to_float01_py(int(x)) for x in xs], dtype=np.float32)
    np.testing.assert_array_equal(got, want)
    assert (got >= 0).all() and (got < 1).all()


def test_frand_matches_wgsl_recipe():
    seed = np.uint32(42)
    new_seed, v = rng.frand(seed)
    s1 = pcg_py(42)
    assert int(new_seed) == s1
    assert float(v) == to_float01_py(pcg_py(s1))


def test_frand2_uses_advanced_seeds_directly():
    seed = np.uint32(7)
    new_seed, v = rng.frand2(seed)
    s1 = pcg_py(7)
    s2 = pcg_py(s1)
    assert int(new_seed) == s2
    np.testing.assert_allclose(
        np.asarray(v), [to_float01_py(s1), to_float01_py(s2)], rtol=0
    )


def test_frand4_bit_splicing():
    seed = np.uint32(99)
    r0 = pcg_py(99)
    r1 = pcg_py(r0)
    r2 = pcg_py(r1)
    r01 = ((r0 & 0xFF000000) >> 8) | (r1 & 0x0000FFFF)
    r12 = ((r1 & 0xFFFF0000) >> 8) | (r2 & 0x000000FF)
    r22 = r2 >> 8
    new_seed, v = rng.frand4(seed)
    assert int(new_seed) == r2
    np.testing.assert_allclose(
        np.asarray(v),
        [to_float01_py(r0), to_float01_py(r01), to_float01_py(r12), to_float01_py(r22)],
        rtol=0,
    )


def test_vectorized_over_lanes():
    seeds = np.arange(1000, dtype=np.uint32)
    new_seeds, v = rng.frand(seeds)
    assert v.shape == (1000,)
    assert new_seeds.shape == (1000,)
    # statistically uniform-ish
    assert 0.4 < float(np.mean(np.asarray(v))) < 0.6


def test_rand_uniform_bounds():
    seeds = np.arange(512, dtype=np.uint32)
    _, v = rng.rand_uniform(seeds, -2.0, 3.0, 1)
    v = np.asarray(v)
    assert (v >= -2.0).all() and (v < 3.0).all()


def test_rand_normal_moments():
    seeds = np.arange(8192, dtype=np.uint32)
    _, v = rng.rand_normal(seeds, 1.0, 2.0, 1)
    v = np.asarray(v)
    assert abs(v.mean() - 1.0) < 0.1
    assert abs(v.std() - 2.0) < 0.1


def test_rand_normal_vec_shared_radius():
    seeds = np.arange(16, dtype=np.uint32)
    _, v = rng.rand_normal(seeds, 0.0, 1.0, 3)
    assert np.asarray(v).shape == (16, 3)


def test_initial_seed():
    assert int(rng.initial_seed(np.uint32(5), np.uint32(3))) == pcg_py(5 ^ 3)

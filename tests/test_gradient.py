import jax.numpy as jnp
import numpy as np
import pytest

from bevy_hanabi_tpu.gradient import Gradient


def test_constant_gradient():
    g = Gradient.constant((1.0, 0.5, 0.0, 1.0))
    np.testing.assert_allclose(g.sample(0.7), [1, 0.5, 0, 1])
    out = np.asarray(g.sample_jax(jnp.asarray([0.0, 0.5, 1.0])))
    assert out.shape == (3, 4)
    np.testing.assert_allclose(out[1], [1, 0.5, 0, 1])


def test_linear_gradient_lerp():
    g = Gradient.linear((0.0,), (10.0,))
    assert float(g.sample(0.25)[0]) == 2.5
    out = np.asarray(g.sample_jax(jnp.asarray([0.25, 0.75])))
    np.testing.assert_allclose(out[:, 0], [2.5, 7.5])


def test_clamping_outside_range():
    g = Gradient([(0.2, (1.0,)), (0.8, (3.0,))])
    assert float(g.sample(0.0)[0]) == 1.0
    assert float(g.sample(1.0)[0]) == 3.0
    out = np.asarray(g.sample_jax(jnp.asarray([-1.0, 0.0, 1.0, 2.0])))
    np.testing.assert_allclose(out[:, 0], [1, 1, 3, 3])


def test_multi_key_piecewise():
    g = Gradient([(0.0, (0.0,)), (0.5, (1.0,)), (1.0, (0.0,))])
    xs = np.linspace(0, 1, 11)
    want = np.array([g.sample(float(x))[0] for x in xs])
    got = np.asarray(g.sample_jax(jnp.asarray(xs, jnp.float32)))[:, 0]
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_cpu_and_jax_sampling_agree():
    g = (
        Gradient()
        .with_key(0.0, (4.0, 0.0, 0.0, 1.0))
        .with_key(0.3, (4.0, 4.0, 0.0, 1.0))
        .with_key(0.7, (0.0, 4.0, 4.0, 0.5))
        .with_key(1.0, (0.0, 0.0, 0.0, 0.0))
    )
    xs = np.random.default_rng(0).random(64).astype(np.float32)
    want = np.stack([g.sample(float(x)) for x in xs])
    got = np.asarray(g.sample_jax(jnp.asarray(xs)))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_keys_sorted_on_insert():
    g = Gradient()
    g.add_key(0.8, (8.0,))
    g.add_key(0.2, (2.0,))
    ratios = [r for r, _ in g.keys()]
    assert ratios == [0.2, 0.8]


def test_step_discontinuity_duplicate_ratio():
    g = Gradient([(0.0, (0.0,)), (0.5, (1.0,)), (0.5, (5.0,)), (1.0, (5.0,))])
    # just below 0.5 approaches 1; AT 0.5 the reference samples the FIRST
    # duplicate "for determinism" (gradient.rs:400-405); just above is 5
    assert float(g.sample(0.49)[0]) == pytest.approx(0.98, abs=1e-5)
    assert float(g.sample(0.5)[0]) == 1.0
    assert float(g.sample(0.51)[0]) == 5.0


def test_duplicate_ratio_first_wins_all_paths():
    """Exact-ratio sampling at duplicated keys returns the FIRST duplicate
    on the CPU path, the <=16-key where-chain, and the >16-key
    searchsorted path alike (gradient.rs:394-407)."""

    def check(g, x, want):
        assert float(g.sample(x)[0]) == pytest.approx(want, abs=1e-6), "cpu"
        got = float(np.asarray(g.sample_jax(jnp.asarray([x], jnp.float32)))[0, 0])
        assert got == pytest.approx(want, abs=1e-6), f"jax k={g.num_keys}"

    # duplicated FIRST key
    g1 = Gradient([(0.0, (1.0,)), (0.0, (2.0,)), (0.5, (3.0,))])
    check(g1, 0.0, 1.0)
    check(g1, 0.25, 2.5)  # just past the dup: later key interpolates
    # duplicated interior key
    g2 = Gradient(
        [(0.2, (1.0,)), (0.5, (2.0,)), (0.5, (3.0,)), (0.8, (4.0,))]
    )
    check(g2, 0.5, 2.0)
    check(g2, 0.65, 3.5)
    # duplicated LAST key
    g3 = Gradient([(0.0, (1.0,)), (1.0, (2.0,)), (1.0, (3.0,))])
    check(g3, 1.0, 2.0)
    # >16 keys forces the searchsorted path: same rules
    keys = [(i / 20.0, (float(i),)) for i in range(20)]
    keys.insert(11, (0.5, (99.0,)))  # duplicate of 10/20
    g4 = Gradient(keys)
    assert g4.num_keys > 16
    check(g4, 0.5, 10.0)
    assert float(g4.sample(0.52)[0]) == pytest.approx(
        float(np.asarray(g4.sample_jax(jnp.asarray([0.52]))[0, 0])), abs=1e-3
    )


def test_json_roundtrip():
    g = Gradient([(0.0, (1.0, 2.0)), (1.0, (3.0, 4.0))])
    g2 = Gradient.from_json(g.to_json())
    assert g == g2


def test_empty_gradient_errors():
    with pytest.raises(ValueError):
        Gradient().sample(0.5)
    with pytest.raises(ValueError):
        Gradient().bake()


def test_mismatched_widths_rejected():
    g = Gradient.constant((1.0, 2.0))
    with pytest.raises(ValueError):
        g.add_key(1.0, (1.0, 2.0, 3.0))

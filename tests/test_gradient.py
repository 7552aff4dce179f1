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
    # just below 0.5 approaches 1, at/above 0.5 is 5
    assert float(g.sample(0.49)[0]) == pytest.approx(0.98, abs=1e-5)
    assert float(g.sample(0.5)[0]) == 5.0


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

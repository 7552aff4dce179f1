"""ops/linalg.py: exact small-matrix transforms, and the no-MXU pin.

The bug these guard against (round 5): ``jnp``'s ``@`` on tiny operands
lowers onto the TPU MXU at default matmul precision, truncating f32 to
bf16 — the emitter-transform matmul quantized every spawn position to
~2^-11 relative. The helpers must be bit-exact against a float64-ground
numpy reference within f32, and the hot jitted programs must contain NO
dot_general at all (projection, transforms, and screen-space sizing are
all broadcast VPU math by design).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from bevy_hanabi_tpu.ops.linalg import affine3, mat4_mul, mvp_w, rotate3


def test_helpers_match_float64_reference_in_f32():
    rng = np.random.default_rng(3)
    v = rng.normal(0, 2, (257, 3)).astype(np.float32)
    rot = rng.normal(0, 1, (3, 3)).astype(np.float32)
    tr = rng.normal(0, 1, (3,)).astype(np.float32)
    a = rng.normal(0, 1, (4, 4)).astype(np.float32)
    b = rng.normal(0, 1, (4, 4)).astype(np.float32)

    # f32 broadcast math vs f64 ground truth: agreement to f32 roundoff,
    # NOT to bf16 roundoff (which is what the MXU default would give)
    np.testing.assert_allclose(
        np.asarray(rotate3(v, rot)),
        v.astype(np.float64) @ rot.astype(np.float64).T,
        rtol=1e-6,
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(affine3(v, rot, tr)),
        v.astype(np.float64) @ rot.astype(np.float64).T + tr,
        rtol=1e-6,
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(mat4_mul(a, b)),
        a.astype(np.float64) @ b.astype(np.float64),
        rtol=1e-6,
        atol=1e-6,
    )
    hom = np.concatenate([v, np.ones((v.shape[0], 1), np.float32)], axis=1)
    np.testing.assert_allclose(
        np.asarray(mvp_w(mat4_mul(a, b), v)),
        (hom.astype(np.float64) @ (a.astype(np.float64) @ b.astype(np.float64)).T)[:, 3],
        rtol=1e-5,
        atol=2e-5,  # cancellation headroom: terms are O(10), f32 roundoff
    )


def _assert_no_dot(jaxpr_str, what):
    assert "dot_general" not in jaxpr_str, (
        f"{what} contains a dot_general: tiny matmuls hit the MXU at bf16 "
        "default precision on TPU (see ops/linalg.py) — use the broadcast "
        "helpers instead"
    )


def test_step_and_render_programs_have_no_dot_general():
    """The fused step (emitter transform included), LOCAL-space extraction,
    screen-space sizing, and the rasterizer must stay matmul-free."""
    from bevy_hanabi_tpu.compiler import SimParams
    from bevy_hanabi_tpu.asset import SimulationSpace
    from bevy_hanabi_tpu.models import gradient_effect
    from bevy_hanabi_tpu.modifiers import ScreenSpaceSizeModifier
    from bevy_hanabi_tpu.render import (
        CameraParams,
        RasterConfig,
        look_at,
        perspective,
    )
    from bevy_hanabi_tpu.render.extract import extract_draw_data
    from bevy_hanabi_tpu.render.raster import rasterize
    from bevy_hanabi_tpu.runtime import CompiledEffect, StepInputs

    asset = gradient_effect(capacity=512).render(ScreenSpaceSizeModifier())
    asset.simulation_space = SimulationSpace.LOCAL
    fx = CompiledEffect(asset)
    pool = fx.create_pool()
    ins = StepInputs.make(64, 1)
    sim = SimParams(delta_time=1 / 60)
    cam = CameraParams(
        look_at((0, 0, 6), (0, 0, 0)),
        perspective(0.9, 1.0, 0.1, 100.0),
        (64, 64),
    )

    step_jaxpr = str(jax.make_jaxpr(lambda p, i, s: fx._step(p, i, s, None, None))(
        pool, ins, sim
    ))
    _assert_no_dot(step_jaxpr, "the fused step")

    def frame(pool, ins, sim, cam):
        draw = extract_draw_data(
            asset, pool, cam, sim=sim, properties=ins.properties,
            transform=ins.transform,
        )
        return rasterize(
            draw, cam, RasterConfig(width=64, height=64), alpha_mode="blend"
        )

    render_jaxpr = str(jax.make_jaxpr(frame)(pool, ins, sim, cam))
    _assert_no_dot(render_jaxpr, "extract+rasterize (LOCAL + screen-space size)")


def test_global_space_identity_transform_is_exact():
    """With the default identity emitter transform, the global-space
    transform application must be a bit-exact no-op on positions (the
    old `@`-based path wasn't, on TPU)."""
    v = np.asarray(
        [[1.2345678, -2.3456789, 3.4567891], [1e-5, 2e5, -3.25]], np.float32
    )
    rot = np.eye(3, dtype=np.float32)
    tr = np.zeros(3, np.float32)
    out = np.asarray(affine3(jnp.asarray(v), jnp.asarray(rot), jnp.asarray(tr)))
    np.testing.assert_array_equal(out, v)

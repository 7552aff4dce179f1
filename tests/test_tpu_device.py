"""Tier-3 on-device tests (SURVEY.md §4): run the real TPU and read back.

Skipped unless HANABI_TPU_TESTS=1 — the axon tunnel makes these slow
(compiles may take minutes without a warm cache). Run manually:

    HANABI_TPU_TESTS=1 python -m pytest tests/test_tpu_device.py -q
"""

import os

import numpy as np
import pytest

if os.environ.get("HANABI_TPU_TESTS") != "1":
    pytest.skip("set HANABI_TPU_TESTS=1 to run device tests", allow_module_level=True)

import jax


@pytest.fixture(scope="module")
def tpu():
    devs = [d for d in jax.devices() if d.platform != "cpu"]
    if not devs:
        pytest.skip("no TPU device")
    return devs[0]


def test_step_device_matches_cpu(tpu):
    """The jitted step produces identical masks/seeds on TPU and CPU."""
    import jax.numpy as jnp

    from bevy_hanabi_tpu.compiler import SimParams
    from bevy_hanabi_tpu.models import spawn_gravity_effect
    from bevy_hanabi_tpu.runtime import CompiledEffect, StepInputs

    asset = spawn_gravity_effect(capacity=4096, rate=0.0)
    fx = CompiledEffect(asset)

    def run(device):
        with jax.default_device(device):
            pool = fx.create_pool()
            for i, s in enumerate([700, 0, 300]):
                pool, _ = fx.step(
                    pool,
                    StepInputs.make(s, i * 31 + 5),
                    SimParams(time=i / 60, delta_time=1 / 60),
                )
            return (
                np.asarray(pool.alive),
                np.asarray(pool.seed),
                np.asarray(pool.get("position")),
            )

    cpu = jax.devices("cpu")[0]
    a_t, s_t, p_t = run(tpu)
    a_c, s_c, p_c = run(cpu)
    # integer state is bit-exact across devices
    np.testing.assert_array_equal(a_t, a_c)
    np.testing.assert_array_equal(s_t, s_c)
    # float trajectories agree to TPU transcendental precision (the VPU's
    # sin/cos/log approximations differ from the host's libm at ~1e-3 rel)
    np.testing.assert_allclose(p_t[a_t], p_c[a_c], rtol=1e-2, atol=1e-3)


def test_render_device_readback(tpu):
    """One frame rendered on the TPU reads back with expected coverage."""
    import jax.numpy as jnp

    from bevy_hanabi_tpu.compiler import SimParams
    from bevy_hanabi_tpu.models import gradient_effect
    from bevy_hanabi_tpu.render import (
        CameraParams,
        RasterConfig,
        look_at,
        perspective,
    )
    from bevy_hanabi_tpu.render.renderer import EffectRenderer
    from bevy_hanabi_tpu.runtime import CompiledEffect, StepInputs

    with jax.default_device(tpu):
        asset = gradient_effect(capacity=8192)
        fx = CompiledEffect(asset)
        pool = fx.create_pool()
        pool, _ = fx.step(pool, StepInputs.make(8192, 0), SimParams(delta_time=1 / 60))
        cam = CameraParams(
            look_at((0, 0, 6), (0, 0, 0)), perspective(0.9, 1.0, 0.1, 100.0), (128, 128)
        )
        cfg = RasterConfig(width=128, height=128, tile_size=16, max_entries_per_tile=64)
        img = np.asarray(EffectRenderer(asset, cfg).render(pool, cam, SimParams()))
    assert img.shape == (128, 128, 4)
    assert (img[..., 3] > 0).sum() > 100  # particles visible


def test_additive_fast_sort_matches_ordered_on_device(tpu):
    """The packed single-key fast sort (order_independent_fast) must match
    the ordered path ON THE TPU — guards the uint32 shift/mask lowering."""
    import dataclasses

    import jax.numpy as jnp

    from bevy_hanabi_tpu.render import (
        CameraParams,
        ParticleDrawData,
        RasterConfig,
        look_at,
        orthographic,
        rasterize,
    )

    rng = np.random.default_rng(5)
    n = 4096
    with jax.default_device(tpu):
        draw = ParticleDrawData(
            position=jnp.asarray(rng.uniform(-0.9, 0.9, (n, 3)), jnp.float32),
            axis_x=jnp.broadcast_to(jnp.asarray([0.05, 0.0, 0.0]), (n, 3)),
            axis_y=jnp.broadcast_to(jnp.asarray([0.0, 0.05, 0.0]), (n, 3)),
            color=jnp.asarray(rng.uniform(0.05, 0.4, (n, 4)), jnp.float32),
            alive=jnp.ones(n, bool),
            roundness=None,
            sprite_index=jnp.zeros(n, jnp.int32),
            texture_layers=(),
            sprite_grid_size=(1, 1),
            needs_uv=False,
        )
        cam = CameraParams(
            look_at((0, 0, 5), (0, 0, 0)), orthographic(-1, 1, -1, 1, 0.1, 10), (128, 128)
        )
        cfg = RasterConfig(
            width=128, height=128, tile_slots=2, max_entries_per_tile=256
        )
        fast = np.asarray(rasterize(draw, cam, cfg, "add"))
        slow = np.asarray(
            rasterize(
                draw, cam,
                dataclasses.replace(cfg, order_independent_fast=False),
                "add",
            )
        )
    np.testing.assert_allclose(fast, slow, atol=1e-5)
    assert fast[..., 3].sum() > 0


def _checksum_close(img_t, img_c, rel=0.005):
    """Framebuffer checksum agreement bound (provenance: bench.py
    run_device_checks — the raster sort keys are integers, bit-identical
    on both backends, so the delta is pure f32 blend arithmetic; measured
    TPU-vs-CPU deltas on these configs are <0.1% and 0.5% gives 5x margin
    without masking a dropped/duplicated splat, which shifts the sum >>1%)."""
    assert np.isfinite(img_t).all(), "non-finite pixels on device"
    st, sc = float(img_t.sum()), float(img_c.sum())
    assert abs(st - sc) <= rel * max(abs(sc), 1.0), (
        f"checksum TPU {st:.2f} vs CPU {sc:.2f}"
    )


def _small_cam(res=128):
    from bevy_hanabi_tpu.render import CameraParams, look_at, perspective

    return CameraParams(
        look_at((0, 0, 6), (0, 0, 0)),
        perspective(0.9, 1.0, 0.1, 100.0),
        (res, res),
    )


def test_ribbon_trail_order_on_device(tpu):
    """Trail-ORDER-sensitive path on the real chip: the (rid, age, counter)
    segment sort + geometry-in-sort raster must agree with CPU (mirrors
    bench.py run_device_checks 'ribbon_trails_8k_64'). The effect is the
    transcendental-free check variant so the comparison certifies segment
    ORDER, not VPU sin/cos ULPs (see ribbon_order_check_effect)."""
    from bevy_hanabi_tpu.compiler import SimParams
    from bevy_hanabi_tpu.models import ribbon_order_check_effect
    from bevy_hanabi_tpu.render import RasterConfig
    from bevy_hanabi_tpu.runtime import CompiledEffect, StepInputs

    r = ribbon_order_check_effect(capacity=8192, num_ribbons=64)
    rfx = CompiledEffect(r)
    cam = _small_cam()
    cfg = RasterConfig(width=128, height=128)

    def run(device):
        with jax.default_device(device):
            pool = rfx.create_pool()
            ins = [StepInputs.make(256, 7 * i + 1) for i in range(30)]
            sims = [SimParams(time=i / 60, delta_time=1 / 60) for i in range(30)]
            ii, ss = rfx.stack_frames(ins, sims)
            pool, img, _ = rfx.step_render_chunk(pool, ii, ss, cam, cfg)
            return np.asarray(pool.alive), np.asarray(img)

    a_t, img_t = run(tpu)
    a_c, img_c = run(jax.devices("cpu")[0])
    np.testing.assert_array_equal(a_t, a_c)
    _checksum_close(img_t, img_c)


def test_firework_event_tree_on_device(tpu):
    """Parent emission compaction + child consume on the real chip: event
    counts, alive masks, and PCG seeds must be BIT-EXACT vs CPU (mirrors
    bench.py run_device_checks 'firework_event_tree_2k_8k')."""
    from bevy_hanabi_tpu.models import firework_effect, firework_trail_effect
    from bevy_hanabi_tpu.runtime import HanabiScene

    def run(device):
        with jax.default_device(device):
            s = HanabiScene(seed=17)
            s.add(firework_effect(capacity=2048), "rocket")
            s.add(firework_trail_effect(capacity=8192), "trail", parent="rocket")
            for _ in range(30):
                s.update(1 / 60)
            return (
                int(s["rocket"].alive_count()),
                int(s["trail"].alive_count()),
                np.asarray(s["trail"].pool.alive),
                np.asarray(s["trail"].pool.seed),
            )

    ra_t, ta_t, m_t, s_t = run(tpu)
    ra_c, ta_c, m_c, s_c = run(jax.devices("cpu")[0])
    assert (ra_t, ta_t) == (ra_c, ta_c)
    np.testing.assert_array_equal(m_t, m_c)
    np.testing.assert_array_equal(s_t, s_c)


def test_textured_mesh_frame_on_device(tpu):
    """Barycentric mesh raster + bilinear texture sampling on the real chip
    (mirrors bench.py run_device_checks 'textured_mesh_2k'). Uses the
    transcendental-free check effect: gradient_effect's sphere init runs
    device sin/cos whose ~1e-3 backend drift flips triangle-edge coverage
    (measured 11 flipped pixels on a 31-pixel scene), which says nothing
    about the raster being certified here."""
    from bevy_hanabi_tpu.models import textured_mesh_check_effect
    from bevy_hanabi_tpu.models.texutils import make_circle_texture
    from bevy_hanabi_tpu.modifiers import ParticleTextureModifier
    from bevy_hanabi_tpu.render import RasterConfig
    from bevy_hanabi_tpu.render.mesh import ParticleMesh
    from bevy_hanabi_tpu.runtime import HanabiScene

    cam = _small_cam()
    cfg = RasterConfig(width=128, height=128)

    def run(device):
        with jax.default_device(device):
            s = HanabiScene(seed=5)
            asset = (
                textured_mesh_check_effect(capacity=2048)
                .render(ParticleTextureModifier(0))
                .with_mesh(ParticleMesh.icosphere(radius=0.4, subdivisions=1))
            )
            s.add(asset, "mesh", textures=[make_circle_texture(32)])
            for _ in range(3):
                s.update(1 / 60)
            return np.asarray(s.render(cam, cfg))

    _checksum_close(run(tpu), run(jax.devices("cpu")[0]))


def test_painter_pass_on_device(tpu):
    """Unified painter pass (one global (tile, depth) sort, per-entry blend
    equations) on the real chip (mirrors bench.py 'painter_scene_3fx')."""
    from bevy_hanabi_tpu.asset import AlphaMode
    from bevy_hanabi_tpu.models import gradient_effect, spawn_gravity_effect
    from bevy_hanabi_tpu.render import RasterConfig
    from bevy_hanabi_tpu.runtime import HanabiScene

    cam = _small_cam()
    cfg = RasterConfig(width=128, height=128)

    def run(device):
        with jax.default_device(device):
            s = HanabiScene(seed=9)
            s.add(gradient_effect(capacity=2048), "blend")
            s.add(
                gradient_effect(capacity=2048).with_alpha_mode(AlphaMode.ADD),
                "add",
            )
            s.add(
                spawn_gravity_effect(
                    capacity=1024, rate=2000.0
                ).with_alpha_mode(AlphaMode.OPAQUE),
                "opq",
            )
            for _ in range(3):
                s.update(1 / 60)
            return np.asarray(s.render(cam, cfg, pipeline="painter"))

    _checksum_close(run(tpu), run(jax.devices("cpu")[0]))


def test_scene_chunk_and_mesh_uv_on_device(tpu):
    """Round-3 surfaces on the real chip: the fused whole-scene chunk
    (event tree included) and barycentric mesh-UV texture sampling."""
    import math

    import jax.numpy as jnp

    from bevy_hanabi_tpu.asset import AlphaMode, EffectAsset
    from bevy_hanabi_tpu import attributes as A
    from bevy_hanabi_tpu.compiler import SimParams
    from bevy_hanabi_tpu.graph import ExprWriter
    from bevy_hanabi_tpu.models import firework_effect, firework_trail_effect
    from bevy_hanabi_tpu.modifiers import (
        ParticleTextureModifier,
        SetAttributeModifier,
        SetSizeModifier,
    )
    from bevy_hanabi_tpu.render import CameraParams, RasterConfig, look_at, orthographic, perspective
    from bevy_hanabi_tpu.render.mesh import ParticleMesh
    from bevy_hanabi_tpu.render.renderer import EffectRenderer
    from bevy_hanabi_tpu.runtime import CompiledEffect, HanabiScene, StepInputs
    from bevy_hanabi_tpu.spawn import SpawnerSettings

    with jax.default_device(tpu):
        # fused scene chunk with an event tree
        scene = HanabiScene(seed=5)
        scene.add(firework_effect(capacity=2048), "p")
        scene.add(firework_trail_effect(capacity=8192), "c", parent="p")
        cam = CameraParams(
            view=look_at((0.0, 3.0, 8.0), (0.0, 3.0, 0.0)),
            proj=perspective(math.radians(60.0), 1.0, 0.1, 100.0),
            viewport=(128, 128),
        )
        img, sums = scene.update_render_chunk(
            8, 1 / 60, cam, RasterConfig(width=128, height=128)
        )
        img = np.asarray(img)
        assert img.shape == (128, 128, 4) and np.isfinite(img).all()
        assert np.asarray(sums).shape == (8,)
        assert scene["c"].alive_count() >= 0  # event path executed

        # textured icosphere (vertex UVs through the device gathers)
        w = ExprWriter()
        tex = np.random.default_rng(1).uniform(0.2, 1.0, (8, 8, 4)).astype(
            np.float32
        )
        asset = (
            EffectAsset("ico", 8, SpawnerSettings.once(1.0), w.finish())
            .init(SetAttributeModifier(A.POSITION, w.lit((0.0, 0.0, 0.0)).expr()))
            .init(SetAttributeModifier(A.LIFETIME, w.lit(100.0).expr()))
            .render(SetSizeModifier((1.2,) * 3))
            .render(ParticleTextureModifier(0))
        ).with_mesh(ParticleMesh.icosphere(0.5, subdivisions=1))
        asset.alpha_mode = AlphaMode.OPAQUE
        fx = CompiledEffect(asset)
        pool = fx.create_pool()
        pool, _ = fx.step(
            pool, StepInputs.make(1, 0), SimParams(delta_time=1 / 60)
        )
        cam2 = CameraParams(
            look_at((0.0, 0.0, 5.0), (0.0, 0.0, 0.0)),
            orthographic(-1, 1, -1, 1, 0.1, 10.0),
            (64, 64),
        )
        img2 = np.asarray(
            EffectRenderer(
                asset, RasterConfig(width=64, height=64), textures=[tex]
            ).render(pool, cam2, SimParams())
        )
        cov = img2[..., 3] > 0.5
        assert cov.sum() > 500
        # UV variation: many distinct sampled colors across the sphere
        assert len(np.unique(np.round(img2[cov][:, :3], 2), axis=0)) > 20

"""Rasterizer and extraction contract tests.

Uses a 64x64 orthographic view of [-1,1]^2 so pixel math is exact:
world dx of 1 unit = 32 px. Mirrors the reference's GPU-contract-test idea
(render/shader_contract_tests.rs) with value readbacks instead of wgpu.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from bevy_hanabi_tpu import attributes as A
from bevy_hanabi_tpu.asset import AlphaMode, EffectAsset
from bevy_hanabi_tpu.compiler import SimParams
from bevy_hanabi_tpu.gradient import Gradient
from bevy_hanabi_tpu.graph import ExprWriter
from bevy_hanabi_tpu.modifiers import (
    ColorOverLifetimeModifier,
    FlipbookModifier,
    OrientMode,
    OrientModifier,
    ParticleTextureModifier,
    RoundModifier,
    SetAttributeModifier,
    SetSizeModifier,
    SizeOverLifetimeModifier,
)
from bevy_hanabi_tpu.render import (
    CameraParams,
    ParticleDrawData,
    RasterConfig,
    extract_draw_data,
    look_at,
    orthographic,
    rasterize,
)
from bevy_hanabi_tpu.render.renderer import EffectRenderer
from bevy_hanabi_tpu.runtime import CompiledEffect, StepInputs
from bevy_hanabi_tpu.spawn import SpawnerSettings
from bevy_hanabi_tpu.values import UINT

W = H = 64


def ortho_camera():
    return CameraParams(
        view=look_at((0.0, 0.0, 5.0), (0.0, 0.0, 0.0)),
        proj=orthographic(-1, 1, -1, 1, 0.1, 10.0),
        viewport=(W, H),
    )


def quad_draw(positions, colors, size=0.5, roundness=0.0, **kw):
    n = len(positions)
    return ParticleDrawData(
        position=jnp.asarray(positions, jnp.float32),
        axis_x=jnp.broadcast_to(jnp.asarray([size, 0.0, 0.0]), (n, 3)),
        axis_y=jnp.broadcast_to(jnp.asarray([0.0, size, 0.0]), (n, 3)),
        color=jnp.asarray(colors, jnp.float32),
        alive=kw.pop("alive", jnp.ones((n,), jnp.bool_)),
        roundness=jnp.full((n,), roundness, jnp.float32),
        sprite_index=jnp.zeros((n,), jnp.int32),
        sprite_grid_size=kw.pop("sprite_grid_size", (1, 1)),
        texture_layers=kw.pop("texture_layers", ()),
        needs_uv=False,
        **kw,
    )


CFG = RasterConfig(width=W, height=H, tile_size=16, tile_span=2, max_entries_per_tile=16)


def test_single_quad_coverage():
    # size 0.5 world units = 16 px wide quad centered at the image center
    draw = quad_draw([[0.0, 0.0, 0.0]], [[1.0, 0.0, 0.0, 1.0]])
    img = np.asarray(rasterize(draw, ortho_camera(), CFG, "blend"))
    assert img.shape == (H, W, 4)
    np.testing.assert_allclose(img[32, 32], [1, 0, 0, 1], atol=1e-6)  # center
    np.testing.assert_allclose(img[32, 32 - 7], [1, 0, 0, 1], atol=1e-6)  # inside
    np.testing.assert_allclose(img[32, 32 - 9], [0, 0, 0, 0], atol=1e-6)  # outside
    np.testing.assert_allclose(img[32 - 9, 32], [0, 0, 0, 0], atol=1e-6)


def test_offcenter_quad_and_y_flip():
    # world +y is up => smaller row index
    draw = quad_draw([[0.5, 0.5, 0.0]], [[0.0, 1.0, 0.0, 1.0]], size=0.25)
    img = np.asarray(rasterize(draw, ortho_camera(), CFG, "blend"))
    # (0.5, 0.5) world -> px (48, 16)
    np.testing.assert_allclose(img[16, 48], [0, 1, 0, 1], atol=1e-6)
    np.testing.assert_allclose(img[48, 16], [0, 0, 0, 0], atol=1e-6)


def test_additive_blend_accumulates():
    draw = quad_draw(
        [[0.0, 0.0, 0.0], [0.0, 0.0, 0.5]],
        [[0.25, 0.0, 0.0, 1.0], [0.25, 0.0, 0.0, 1.0]],
    )
    img = np.asarray(rasterize(draw, ortho_camera(), CFG, "add"))
    np.testing.assert_allclose(img[32, 32, 0], 0.5, atol=1e-6)


def test_alpha_blend_depth_order_independent_of_input_order():
    # red at z=0.5 (nearer to camera at z=5), blue at z=-0.5 (farther)
    for order in [(0, 1), (1, 0)]:
        pos = [[0.0, 0.0, 0.5], [0.0, 0.0, -0.5]]
        col = [[1.0, 0.0, 0.0, 0.5], [0.0, 0.0, 1.0, 1.0]]
        pos = [pos[i] for i in order]
        col = [col[i] for i in order]
        draw = quad_draw(pos, col)
        img = np.asarray(rasterize(draw, ortho_camera(), CFG, "blend"))
        # back-to-front: blue then red@0.5 => rgb = (0.5, 0, 0.5)
        np.testing.assert_allclose(img[32, 32, :3], [0.5, 0, 0.5], atol=1e-5)


def test_opaque_nearest_wins():
    pos = [[0.0, 0.0, -0.5], [0.0, 0.0, 0.5]]
    col = [[0.0, 0.0, 1.0, 1.0], [1.0, 0.0, 0.0, 1.0]]
    draw = quad_draw(pos, col)
    img = np.asarray(rasterize(draw, ortho_camera(), CFG, "opaque"))
    np.testing.assert_allclose(img[32, 32], [1, 0, 0, 1], atol=1e-6)  # red nearer


def test_mask_discards_below_cutoff():
    draw = quad_draw([[0.0, 0.0, 0.0]], [[1.0, 1.0, 1.0, 0.3]])
    img = np.asarray(rasterize(draw, ortho_camera(), CFG, "mask", alpha_cutoff=0.5))
    np.testing.assert_allclose(img[32, 32], [0, 0, 0, 0], atol=1e-6)
    img2 = np.asarray(rasterize(draw, ortho_camera(), CFG, "mask", alpha_cutoff=0.2))
    np.testing.assert_allclose(img2[32, 32, :3], [1, 1, 1], atol=1e-6)


def test_roundness_cuts_corners():
    draw = quad_draw([[0.0, 0.0, 0.0]], [[1.0, 0.0, 0.0, 1.0]], size=0.9, roundness=1.0)
    img = np.asarray(rasterize(draw, ortho_camera(), CFG, "blend"))
    assert img[32, 32, 0] == 1.0  # center filled
    # corner of the bounding quad (~(0.4, 0.4) world) should be cut by the ellipse
    assert img[32 - 13, 32 + 13, 0] == 0.0
    # edge midpoints still filled
    assert img[32, 32 + 13, 0] == 1.0


def test_tile_spanning_seamless():
    # quad centered exactly on a tile boundary (px 16) spans two tiles
    draw = quad_draw([[-0.5, 0.0, 0.0]], [[0.0, 1.0, 1.0, 1.0]], size=0.4)
    img = np.asarray(rasterize(draw, ortho_camera(), CFG, "blend"))
    xs = np.flatnonzero(img[32, :, 1] > 0.5)
    assert len(xs) > 0
    assert np.all(np.diff(xs) == 1), "coverage must be contiguous across tiles"


def test_dead_particles_not_drawn():
    draw = quad_draw(
        [[0.0, 0.0, 0.0]], [[1.0, 0.0, 0.0, 1.0]], alive=jnp.zeros((1,), jnp.bool_)
    )
    img = np.asarray(rasterize(draw, ortho_camera(), CFG, "blend"))
    assert img.max() == 0.0


def test_texture_modulate_and_flipbook():
    # 1x2 texture: left texel red, right texel green (width 2)
    tex = jnp.asarray(
        [[[1.0, 0.0, 0.0, 1.0], [0.0, 1.0, 0.0, 1.0]]], jnp.float32
    )  # [1,2,4]
    from bevy_hanabi_tpu.modifiers import ImageSampleMapping

    draw = quad_draw(
        [[0.0, 0.0, 0.0]],
        [[1.0, 1.0, 1.0, 1.0]],
        size=0.5,
        texture_layers=((0, ImageSampleMapping.MODULATE),),
    )
    img = np.asarray(rasterize(draw, ortho_camera(), CFG, "blend", textures=[tex]))
    # left half of the quad ~red, right half ~green
    assert img[32, 32 - 5, 0] > 0.6 and img[32, 32 - 5, 1] < 0.4
    assert img[32, 32 + 5, 1] > 0.6 and img[32, 32 + 5, 0] < 0.4


def test_end_to_end_effect_render():
    """BASELINE config 2 shape: sim + extract + raster via EffectRenderer."""
    w = ExprWriter()
    color = Gradient.linear((0.0, 1.0, 0.0, 1.0), (0.0, 0.0, 1.0, 1.0))
    asset = (
        EffectAsset("fx", 256, SpawnerSettings.once(64.0), w.finish())
        .init(SetAttributeModifier(A.AGE, w.lit(0.0).expr()))
        .init(SetAttributeModifier(A.LIFETIME, w.lit(10.0).expr()))
        .init(SetAttributeModifier(A.POSITION, w.lit((0.0, 0.0, 0.0)).expr()))
        .render(OrientModifier(OrientMode.PARALLEL_CAMERA_DEPTH_PLANE))
        .render(ColorOverLifetimeModifier(color))
        .render(SizeOverLifetimeModifier(Gradient.constant((0.3,))))
    )
    fx = CompiledEffect(asset)
    pool = fx.create_pool()
    pool, _ = fx.step(pool, StepInputs.make(64, 0), SimParams(delta_time=1 / 60))
    renderer = EffectRenderer(asset, CFG)
    img = np.asarray(renderer.render(pool, ortho_camera(), SimParams()))
    # all particles at origin, age/lifetime ~ 0 => green
    assert img[32, 32, 1] > 0.9
    assert img[32, 32, 2] < 0.1
    assert img[0, 0, 3] == 0.0  # background untouched


def test_extract_defaults_color_unpack_and_size():
    w = ExprWriter()
    asset = (
        EffectAsset("d", 8, SpawnerSettings.once(1.0), w.finish())
        .init(SetAttributeModifier(A.POSITION, w.lit((0.0, 0.0, 0.0)).expr()))
        .init(SetAttributeModifier(A.COLOR, w.lit(0xFF0080FF, UINT).expr()))  # packed
        .init(SetAttributeModifier(A.SIZE, w.lit(2.0).expr()))
        .init(SetAttributeModifier(A.LIFETIME, w.lit(9.0).expr()))
    )
    fx = CompiledEffect(asset)
    pool = fx.create_pool()
    pool, _ = fx.step(pool, StepInputs.make(1, 0), SimParams(delta_time=1 / 60))
    draw = extract_draw_data(asset, pool, ortho_camera())
    i = int(np.flatnonzero(np.asarray(pool.alive))[0])
    # packed u32 0xFF0080FF -> r=0xFF, g=0x80, b=0x00, a=0xFF (little-endian bytes)
    np.testing.assert_allclose(
        np.asarray(draw.color)[i], [1.0, 128 / 255, 0.0, 1.0], atol=1e-6
    )
    # SIZE=2 scales the default camera-facing axes
    np.testing.assert_allclose(np.asarray(draw.axis_x)[i], [2, 0, 0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(draw.axis_y)[i], [0, 2, 0], atol=1e-5)


def test_renderer_composite_over_framebuffer():
    draw_asset_w = ExprWriter()
    asset = (
        EffectAsset("c", 8, SpawnerSettings.once(1.0), draw_asset_w.finish())
        .init(
            SetAttributeModifier(A.POSITION, draw_asset_w.lit((0.0, 0.0, 0.0)).expr())
        )
        .init(SetAttributeModifier(A.LIFETIME, draw_asset_w.lit(9.0).expr()))
        .render(SetSizeModifier((0.25, 0.25, 0.25)))
    )
    fx = CompiledEffect(asset)
    pool = fx.create_pool()
    pool, _ = fx.step(pool, StepInputs.make(1, 0), SimParams(delta_time=1 / 60))
    renderer = EffectRenderer(asset, CFG)
    base = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 0.2, 1.0]), (H, W, 4))
    img = np.asarray(
        renderer.render(pool, ortho_camera(), SimParams(), framebuffer=base)
    )
    np.testing.assert_allclose(img[32, 32, :3], [1, 1, 1], atol=1e-5)  # particle
    np.testing.assert_allclose(img[0, 0], [0, 0, 0.2, 1.0], atol=1e-6)  # base kept


def test_premultiply_blend():
    # premultiplied src over dst: rgb = src.rgb + dst.rgb*(1-a)
    back = quad_draw([[0.0, 0.0, -0.5]], [[0.0, 0.0, 1.0, 1.0]])
    front = quad_draw([[0.0, 0.0, 0.5]], [[0.25, 0.0, 0.0, 0.5]])
    both = ParticleDrawData(
        position=jnp.concatenate([back.position, front.position]),
        axis_x=jnp.concatenate([back.axis_x, front.axis_x]),
        axis_y=jnp.concatenate([back.axis_y, front.axis_y]),
        color=jnp.concatenate([back.color, front.color]),
        alive=jnp.ones((2,), jnp.bool_),
        roundness=jnp.zeros((2,), jnp.float32),
        sprite_index=jnp.zeros((2,), jnp.int32),
        sprite_grid_size=(1, 1),
        texture_layers=(),
        needs_uv=False,
    )
    img = np.asarray(rasterize(both, ortho_camera(), CFG, "premultiply"))
    # blue back *(1-0.5) + premultiplied red 0.25
    np.testing.assert_allclose(img[32, 32, :3], [0.25, 0.0, 0.5], atol=1e-5)


def test_multiply_blend():
    back = quad_draw([[0.0, 0.0, -0.5]], [[0.8, 0.8, 0.8, 1.0]])
    front = quad_draw([[0.0, 0.0, 0.5]], [[0.5, 1.0, 0.5, 1.0]])
    both = ParticleDrawData(
        position=jnp.concatenate([back.position, front.position]),
        axis_x=jnp.concatenate([back.axis_x, front.axis_x]),
        axis_y=jnp.concatenate([back.axis_y, front.axis_y]),
        color=jnp.concatenate([back.color, front.color]),
        alive=jnp.ones((2,), jnp.bool_),
        roundness=jnp.zeros((2,), jnp.float32),
        sprite_index=jnp.zeros((2,), jnp.int32),
        sprite_grid_size=(1, 1),
        texture_layers=(),
        needs_uv=False,
    )
    # multiply only modulates the destination: needs a lit background
    from dataclasses import replace

    cfg = replace(CFG, background=(1.0, 1.0, 1.0, 1.0))
    img = np.asarray(rasterize(both, ortho_camera(), cfg, "multiply"))
    # white bg x 0.8 (back) x (0.5,1,0.5) (front)
    np.testing.assert_allclose(img[32, 32, :3], [0.4, 0.8, 0.4], atol=1e-5)


def test_sample_mappings_rgb_and_opacity():
    from bevy_hanabi_tpu.modifiers import ImageSampleMapping

    # texture: red texel with alpha 0.5
    tex = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0, 0.5]), (2, 2, 4))
    base = [[0.5, 1.0, 1.0, 1.0]]
    d_rgb = quad_draw([[0.0, 0.0, 0.0]], base,
                      texture_layers=((0, ImageSampleMapping.MODULATE_RGB),))
    img = np.asarray(rasterize(d_rgb, ortho_camera(), CFG, "blend", textures=[tex]))
    # rgb multiplied, alpha untouched (1.0)
    np.testing.assert_allclose(img[32, 32], [0.5, 0.0, 0.0, 1.0], atol=1e-5)

    d_op = quad_draw([[0.0, 0.0, 0.0]], base,
                     texture_layers=((0, ImageSampleMapping.MODULATE_OPACITY_FROM_R),))
    img2 = np.asarray(rasterize(d_op, ortho_camera(), CFG, "blend", textures=[tex]))
    # alpha *= tex.r (=1.0) -> unchanged color, full alpha
    np.testing.assert_allclose(img2[32, 32], [0.5, 1.0, 1.0, 1.0], atol=1e-5)


def test_antialias_subpixel_coverage():
    from dataclasses import replace

    # 0.5-px-wide particle: binary coverage hits 0 or 1 pixels; AA gives a
    # smooth fractional footprint whose total matches the true area better
    draw = quad_draw([[0.01, 0.01, 0.0]], [[1.0, 1.0, 1.0, 1.0]], size=0.015)
    cfg_aa = replace(CFG, antialias=True)
    img_bin = np.asarray(rasterize(draw, ortho_camera(), CFG, "add"))
    img_aa = np.asarray(rasterize(draw, ortho_camera(), cfg_aa, "add"))
    # true footprint: (0.015*32)^2 = 0.23 px^2 of full alpha
    total_aa = img_aa[..., 0].sum()
    assert 0.05 < total_aa < 0.8  # fractional, near the true area
    assert img_aa[..., 0].max() < 1.0  # no hard pixel
    # binary either misses entirely or paints a full pixel
    assert img_bin[..., 0].sum() in (0.0, 1.0) or img_bin[..., 0].sum() >= 1.0


def test_antialias_preserves_interior():
    from dataclasses import replace

    draw = quad_draw([[0.0, 0.0, 0.0]], [[1.0, 0.0, 0.0, 1.0]], size=0.5)
    cfg_aa = replace(CFG, antialias=True)
    img = np.asarray(rasterize(draw, ortho_camera(), cfg_aa, "blend"))
    np.testing.assert_allclose(img[32, 32], [1, 0, 0, 1], atol=1e-5)  # interior solid
    assert img[32, 32 - 9, 0] < 0.05  # outside still empty


def test_premultiply_antialias_edge_scales_rgb_with_coverage():
    """Antialiased premultiplied edges must scale RGB by coverage exactly
    like alpha — an edge pixel of a premultiplied [1,0,0,1] splat over a
    black background must have rgb == alpha (no full-strength color at
    partial alpha), and the ramp must be monotone toward the interior."""
    from dataclasses import replace

    # offset so the quad edge lands mid-pixel (fractional coverage exists)
    draw = quad_draw([[0.013, 0.0, 0.0]], [[1.0, 0.0, 0.0, 1.0]], size=0.5)
    cfg_aa = replace(CFG, antialias=True)
    img = np.asarray(rasterize(draw, ortho_camera(), cfg_aa, "premultiply"))
    # every pixel: rgb == alpha (coverage-scaled premultiplied red over
    # transparent black)
    np.testing.assert_allclose(img[..., 0], img[..., 3], atol=1e-5)
    # the edge column (quad spans px 24..40 in x at row 32) has a
    # fractional pixel strictly between 0 and 1
    edge = img[32, :, 0]
    frac = edge[(edge > 1e-4) & (edge < 1.0 - 1e-4)]
    assert frac.size > 0
    # monotone from outside to the interior on the left edge
    left = img[32, 20:33, 0]
    assert np.all(np.diff(left) >= -1e-6)


def test_tile_slots1_center_binning():
    """tile_slots=1 (the multi-million-particle scaling config) bins each
    splat only to its center tile: exact for interior splats, and a
    boundary-crossing splat keeps exactly its center tile's fragment."""
    from dataclasses import replace

    cfg1 = replace(CFG, tile_slots=1)
    # interior splat (tile 16px; quad at center of tile (1,1))
    draw = quad_draw([[-0.25, -0.25, 0.0]], [[1.0, 0.0, 0.0, 1.0]], size=0.2)
    img0 = np.asarray(rasterize(draw, ortho_camera(), CFG, "add"))
    img1 = np.asarray(rasterize(draw, ortho_camera(), cfg1, "add"))
    np.testing.assert_array_equal(img0, img1)
    # boundary-crossing splat: center at x=0 world = px 32 (tile boundary)
    draw_b = quad_draw([[0.02, -0.25, 0.0]], [[1.0, 0.0, 0.0, 1.0]], size=0.3)
    img0 = np.asarray(rasterize(draw_b, ortho_camera(), CFG, "add"))
    img1 = np.asarray(rasterize(draw_b, ortho_camera(), cfg1, "add"))
    # center tile (x in [32,48)) identical; fragment left of x=32 lost
    np.testing.assert_array_equal(img0[:, 32:], img1[:, 32:])
    assert img0[:, :32].sum() > 0 and img1[:, :32].sum() == 0


def test_overflow_policy_nearest_keeps_near_entries():
    """At heavy tile overflow the fast additive path must keep the NEAR
    subset: stack 32x max_entries_per_tile particles in one tile with
    alpha decreasing away from the camera — nearest-M keeps most of the
    visible energy, first-M (entry order == far-to-near here) loses it."""
    from dataclasses import replace

    rng = np.random.default_rng(0)
    m = 8
    n = 32 * m
    # all particles inside one tile (center region), spread in z, with the
    # NEAR particles bright and the FAR ones dim; entry order (pool order)
    # is far-to-near so "first" keeps the dim tail
    z = np.linspace(-0.9, 0.9, n)  # ascending z = far to near (camera at +5)
    alpha = np.where(z > 0.0, 1.0, 0.01)
    pos = np.stack([rng.uniform(-0.05, 0.05, n), rng.uniform(-0.05, 0.05, n), z], 1)
    col = np.stack([np.ones(n), np.zeros(n), np.zeros(n), alpha], 1)
    draw = quad_draw(pos.tolist(), col.tolist(), size=0.1)
    cfg = replace(CFG, max_entries_per_tile=m, tile_size=16)
    cfg_exact = replace(cfg, max_entries_per_tile=1024)

    def energy(c):
        return np.asarray(
            rasterize(draw, ortho_camera(), c, "add")
        )[..., 0].sum()

    e_exact = energy(cfg_exact)
    e_near = energy(replace(cfg, overflow_policy="nearest"))
    e_first = energy(replace(cfg, overflow_policy="first"))
    # the best possible M-subset: the M nearest (brightest) entries alone
    near_draw = quad_draw(pos[-m:].tolist(), col[-m:].tolist(), size=0.1)
    e_best = np.asarray(
        rasterize(near_draw, ortho_camera(), cfg_exact, "add")
    )[..., 0].sum()
    # nearest-M keeps (approximately) the optimal near subset
    assert e_near > 0.9 * e_best, (e_near, e_best)
    # first-M (entry order = far first here) keeps the dim tail: ~100x less
    assert e_first < 0.05 * e_near, (e_first, e_near)
    assert e_exact > e_near  # sanity: truncation always loses energy in add


def test_overflow_policy_payload_path_exact_nearest():
    """Force the no-slack-bits payload variant (tiny idx space is never
    forced naturally in tests, so disable slack by tile_span=1 config and
    verify via a big entry count is impractical — instead check that
    nearest under the 'depth' variant matches the ordered path's energy
    at overflow within quantization tolerance)."""
    from dataclasses import replace

    rng = np.random.default_rng(1)
    n = 256
    z = rng.uniform(-0.9, 0.9, n)
    pos = np.stack([rng.uniform(-0.08, 0.08, n), rng.uniform(-0.08, 0.08, n), z], 1)
    col = np.stack(
        [np.ones(n), np.zeros(n), np.zeros(n), rng.uniform(0.1, 1.0, n)], 1
    )
    draw = quad_draw(pos.tolist(), col.tolist(), size=0.1)
    cfg = replace(CFG, max_entries_per_tile=16)
    img_fast = np.asarray(
        rasterize(draw, ortho_camera(), cfg, "add")
    )
    img_ordered = np.asarray(
        rasterize(
            draw, ortho_camera(),
            replace(cfg, order_independent_fast=False), "add",
        )
    )
    # both keep the nearest M; totals agree within coarse-depth-tie slack
    a, b = img_fast[..., 0].sum(), img_ordered[..., 0].sum()
    assert abs(a - b) / max(b, 1e-6) < 0.15, (a, b)


def test_per_particle_mask_cutoff():
    """The mask cutoff expr is evaluated PER PARTICLE (vfx_render.wgsl:319-325):
    a cutoff keyed on F32_0 must discard one particle and keep another with
    the same alpha."""
    w = ExprWriter()
    # alpha = 0.5 for both particles; cutoff = F32_0 (0.2 keeps, 0.9 discards)
    asset = (
        EffectAsset("m", 8, SpawnerSettings.once(2.0), w.finish())
        .init(SetAttributeModifier(A.LIFETIME, w.lit(10.0).expr()))
        .init(
            SetAttributeModifier(
                A.POSITION,
                (w.lit((1.0, 0.0, 0.0)) * w.attr(A.F32_0) - w.lit((0.5, 0.0, 0.0))).expr(),
            )
        )
        .with_alpha_mode(AlphaMode.mask(w.attr(A.F32_0).expr()))
    )
    # need F32_0 in the layout with distinct values: set from particle index
    wr = w  # same module
    asset.init_modifiers.insert(
        0,
        SetAttributeModifier(
            A.F32_0,
            (wr.builtin_particle_index().cast(jnp.float32) if hasattr(wr, "builtin_particle_index") else wr.lit(0.0)).expr()
            if False
            else wr.lit(0.0).expr(),
        ),
    )
    # simpler: craft draw data directly
    n = 2
    draw = quad_draw(
        [[-0.5, 0.0, 0.0], [0.5, 0.0, 0.0]],
        [[1.0, 0.0, 0.0, 0.5], [0.0, 1.0, 0.0, 0.5]],
        size=0.4,
        alpha_cutoff=jnp.asarray([0.2, 0.9], jnp.float32),
    )
    img = np.asarray(rasterize(draw, ortho_camera(), CFG, "mask"))
    left = img[32, 32 - 16]  # center of left quad
    right = img[32, 32 + 16]
    assert left[0] > 0.9 and left[3] == 1.0  # kept (0.5 >= 0.2)
    assert right[1] == 0.0 and right[3] == 0.0  # discarded (0.5 < 0.9)


def test_mask_cutoff_expr_varies_per_particle_end_to_end():
    """Through EffectRenderer: cutoff driven by AGE discards old particles
    only (the round-1 jnp.mean collapse made this impossible)."""
    w = ExprWriter()
    asset = (
        EffectAsset("m2", 8, SpawnerSettings.once(2.0), w.finish())
        .init(SetAttributeModifier(A.LIFETIME, w.lit(100.0).expr()))
        .init(SetAttributeModifier(A.POSITION, w.lit((0.0, 0.0, 0.0)).expr()))
        .init(
            SetAttributeModifier(
                A.F32_0, w.rand(None).expr() if False else w.lit(0.0).expr()
            )
        )
        # cutoff = age * 3: the young particle (age 0.2, cutoff 0.6 <= alpha 1)
        # keeps; the old one (age 0.4, cutoff 1.2 > 1) discards
        .with_alpha_mode(AlphaMode.mask((w.attr(A.AGE) * w.lit(3.0)).expr()))
        .render(SetSizeModifier((0.4, 0.4, 0.4)))
    )
    fx = CompiledEffect(asset)
    pool = fx.create_pool()
    # spawn 1 at t=0
    pool, _ = fx.step(pool, StepInputs.make(1, 0), SimParams(delta_time=0.2))
    # one more step ages the first to 0.2; spawn a second at age 0
    pool, _ = fx.step(pool, StepInputs.make(1, 1), SimParams(time=0.2, delta_time=0.2))
    draw = extract_draw_data(asset, pool, ortho_camera())
    cut = np.asarray(draw.alpha_cutoff)
    alive = np.asarray(pool.alive)
    ages = np.asarray(pool.get("age"))[alive]
    cuts = cut[alive]
    np.testing.assert_allclose(np.sort(cuts), np.sort(ages * 3.0), atol=1e-6)
    renderer = EffectRenderer(asset, CFG)
    img = np.asarray(renderer.render(pool, ortho_camera(), SimParams()))
    # young particle (cutoff 0.6) renders; old one (cutoff 1.2 > alpha 1) discards
    assert img[32, 32, 3] == 1.0
    # a uniform cutoff at the OLD particle's value would discard everything:
    # per-particle evaluation is what keeps the young one (round-1 jnp.mean
    # of [0.6, 1.2] = 0.9 would also keep it, but the 0.6/1.2 split proves
    # the array path end-to-end via the assert_allclose above)


def test_local_space_rotated_emitter_matches_global():
    """A LOCAL-space effect under a rotated emitter must render identically
    to the same particles pre-rotated in GLOBAL space (vfx_render.wgsl:113-146).
    Exercises ALONG_VELOCITY so axes depend on velocity direction."""
    from bevy_hanabi_tpu.asset import SimulationSpace

    def build(space):
        w = ExprWriter()
        a = (
            EffectAsset("ls", 8, SpawnerSettings.once(1.0), w.finish())
            .init(SetAttributeModifier(A.LIFETIME, w.lit(10.0).expr()))
            .init(SetAttributeModifier(A.POSITION, w.lit((0.3, 0.0, 0.0)).expr()))
            .init(SetAttributeModifier(A.VELOCITY, w.lit((0.0, 0.8, 0.0)).expr()))
            .render(OrientModifier(OrientMode.ALONG_VELOCITY))
            .render(SetSizeModifier((0.6, 0.15, 1.0)))
            .with_simulation_space(space)
        )
        return a

    # 90-degree rotation about Z: local +x -> world +y
    c, s = 0.0, 1.0
    rot = np.asarray(
        [[c, -s, 0.0, 0.0], [s, c, 0.0, 0.0], [0.0, 0.0, 1.0, 0.0]], np.float32
    )

    # LOCAL: simulate in emitter space, render with the transform
    asset_l = build(SimulationSpace.LOCAL)
    fx_l = CompiledEffect(asset_l)
    pool_l = fx_l.create_pool()
    pool_l, _ = fx_l.step(pool_l, StepInputs.make(1, 0), SimParams(delta_time=1 / 60))
    draw_l = extract_draw_data(
        asset_l, pool_l, ortho_camera(), transform=jnp.asarray(rot)
    )

    # GLOBAL: simulate the already-rotated particle state
    w2 = ExprWriter()
    asset_g = (
        EffectAsset("gs", 8, SpawnerSettings.once(1.0), w2.finish())
        .init(SetAttributeModifier(A.LIFETIME, w2.lit(10.0).expr()))
        .init(SetAttributeModifier(A.POSITION, w2.lit((0.0, 0.3, 0.0)).expr()))
        .init(SetAttributeModifier(A.VELOCITY, w2.lit((-0.8, 0.0, 0.0)).expr()))
        .render(OrientModifier(OrientMode.ALONG_VELOCITY))
        .render(SetSizeModifier((0.6, 0.15, 1.0)))
    )
    fx_g = CompiledEffect(asset_g)
    pool_g = fx_g.create_pool()
    pool_g, _ = fx_g.step(pool_g, StepInputs.make(1, 0), SimParams(delta_time=1 / 60))
    draw_g = extract_draw_data(asset_g, pool_g, ortho_camera())

    i_l = int(np.flatnonzero(np.asarray(pool_l.alive))[0])
    i_g = int(np.flatnonzero(np.asarray(pool_g.alive))[0])
    np.testing.assert_allclose(
        np.asarray(draw_l.position)[i_l], np.asarray(draw_g.position)[i_g], atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(draw_l.axis_x)[i_l], np.asarray(draw_g.axis_x)[i_g], atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(draw_l.axis_y)[i_l], np.asarray(draw_g.axis_y)[i_g], atol=1e-5
    )
    img_l = np.asarray(rasterize(draw_l, ortho_camera(), CFG, "blend"))
    img_g = np.asarray(rasterize(draw_g, ortho_camera(), CFG, "blend"))
    np.testing.assert_allclose(img_l, img_g, atol=1e-5)


def test_tile_slots2_matches_exact_for_small_splats():
    # Many small random quads, none larger than a tile: the 2-slot binning
    # must agree with the exact span^2 path except on the (rare) splats that
    # straddle both a vertical and a horizontal tile boundary.
    import dataclasses

    rng = np.random.default_rng(7)
    n = 512
    pos = rng.uniform(-0.95, 0.95, (n, 3)).astype(np.float32)
    pos[:, 2] = rng.uniform(-0.5, 0.5, n)
    cols = rng.uniform(0.1, 1.0, (n, 4)).astype(np.float32)
    draw = quad_draw(pos.tolist(), cols.tolist(), size=0.06)
    cfg4 = dataclasses.replace(CFG, max_entries_per_tile=64)
    cfg2 = dataclasses.replace(cfg4, tile_slots=2)
    img4 = np.asarray(rasterize(draw, ortho_camera(), cfg4, "blend"))
    img2 = np.asarray(rasterize(draw, ortho_camera(), cfg2, "blend"))
    # identical on >=97% of pixels; differing pixels are corner slivers
    same = np.isclose(img4, img2, atol=1e-6).all(axis=-1)
    assert same.mean() > 0.97, same.mean()
    # every splat still renders: per-quad coverage present in both
    assert (img2[..., 3] > 0).sum() >= 0.95 * (img4[..., 3] > 0).sum()


def test_tile_slots2_single_axis_straddle_exact():
    # A quad crossing exactly one tile boundary renders identically.
    import dataclasses

    # tile boundary at x=16px => world x=-0.5; center the quad on it
    draw = quad_draw([[-0.5, 0.25, 0.0]], [[0.0, 1.0, 0.0, 1.0]], size=0.2)
    cfg2 = dataclasses.replace(CFG, tile_slots=2)
    img4 = np.asarray(rasterize(draw, ortho_camera(), CFG, "blend"))
    img2 = np.asarray(rasterize(draw, ortho_camera(), cfg2, "blend"))
    np.testing.assert_allclose(img2, img4, atol=1e-6)


def test_tile_budget_keeps_nearest_entries():
    # Three stacked quads at different depths with a per-tile budget of 2:
    # the NEAREST two must survive (the far tail is what gets dropped).
    import dataclasses

    draw = quad_draw(
        [[0.0, 0.0, -0.5], [0.0, 0.0, 0.0], [0.0, 0.0, 0.5]],
        [
            [1.0, 0.0, 0.0, 1.0],  # farthest (camera at +z looks -z)
            [0.0, 1.0, 0.0, 1.0],
            [0.0, 0.0, 1.0, 1.0],  # nearest
        ],
        size=0.4,
    )
    cfg = dataclasses.replace(CFG, max_entries_per_tile=2)
    img = np.asarray(rasterize(draw, ortho_camera(), cfg, "opaque"))
    # opaque back-to-front = nearest wins; with budget 2 the red (farthest)
    # quad is dropped and blue (nearest) still lands on top
    np.testing.assert_allclose(img[32, 32, :3], [0.0, 0.0, 1.0], atol=1e-6)
    # and with blend, the result composites green under blue (no red)
    imgb = np.asarray(rasterize(draw, ortho_camera(), cfg, "blend"))
    assert imgb[32, 32, 0] < 1e-6 and imgb[32, 32, 2] > 0.5


def test_order_independent_fast_path_matches_ordered():
    # ADD and MULTIPLY commute, so the packed single-key fast sort must
    # produce the same image as the ordered (tile, depth) path. Budget is
    # large enough that no tile overflows (the two paths may keep different
    # M-subsets on overflow).
    import dataclasses

    rng = np.random.default_rng(11)
    n = 256
    pos = rng.uniform(-0.9, 0.9, (n, 3)).astype(np.float32)
    cols = rng.uniform(0.05, 0.6, (n, 4)).astype(np.float32)
    draw = quad_draw(pos.tolist(), cols.tolist(), size=0.15)
    for slots in (0, 2):
        cfg_fast = dataclasses.replace(
            CFG, max_entries_per_tile=256, tile_slots=slots
        )
        cfg_slow = dataclasses.replace(cfg_fast, order_independent_fast=False)
        for mode in ("add", "multiply"):
            fastimg = np.asarray(rasterize(draw, ortho_camera(), cfg_fast, mode))
            slowimg = np.asarray(rasterize(draw, ortho_camera(), cfg_slow, mode))
            np.testing.assert_allclose(fastimg, slowimg, atol=1e-5)


def test_order_independent_fast_path_respects_budget():
    # Overflowing tiles still blend exactly M entries on the fast path.
    import dataclasses

    draw = quad_draw(
        [[0.0, 0.0, 0.1 * i] for i in range(4)],
        [[0.25, 0.0, 0.0, 1.0]] * 4,
        size=0.4,
    )
    cfg = dataclasses.replace(CFG, max_entries_per_tile=2)
    img = np.asarray(rasterize(draw, ortho_camera(), cfg, "add"))
    # additive with budget 2: exactly two 0.25-red quads accumulate
    np.testing.assert_allclose(img[32, 32, 0], 0.5, atol=1e-6)


def test_scene_depth_occludes_fragments():
    # A wall at view distance 4.75 covering the left half of the screen:
    # the quad at distance 5.0 (z=0, camera at z=5) is occluded there, and
    # visible on the right half where the wall is at +inf.
    depth = np.full((H, W), np.inf, np.float32)
    depth[:, : W // 2] = 4.75
    draw = quad_draw([[0.0, 0.0, 0.0]], [[0.0, 1.0, 0.0, 1.0]], size=0.9)
    for mode in ("blend", "add", "opaque"):
        img = np.asarray(
            rasterize(draw, ortho_camera(), CFG, mode, scene_depth=jnp.asarray(depth))
        )
        assert img[32, 20, 3] == 0.0, mode  # behind the wall
        assert img[32, 44, 3] > 0.0, mode  # open half
    # a wall BEHIND the particle hides nothing
    far = np.full((H, W), 6.0, np.float32)
    img = np.asarray(
        rasterize(draw, ortho_camera(), CFG, "blend", scene_depth=jnp.asarray(far))
    )
    assert img[32, 20, 3] > 0.0 and img[32, 44, 3] > 0.0


def test_return_depth_writes_nearest_opaque():
    # Two opaque quads at view distances 4.5 (z=0.5) and 5.5 (z=-0.5);
    # where they overlap the depth buffer must hold the nearest (4.5).
    draw = quad_draw(
        [[0.0, 0.0, 0.5], [0.3, 0.0, -0.5]],
        [[1.0, 0.0, 0.0, 1.0], [0.0, 0.0, 1.0, 1.0]],
        size=0.4,
    )
    img, depth = rasterize(draw, ortho_camera(), CFG, "opaque", return_depth=True)
    img, depth = np.asarray(img), np.asarray(depth)
    np.testing.assert_allclose(depth[32, 32], 4.5, atol=1e-5)  # overlap: nearest
    # blue-only region: blue spans px ~35-48, red ends at px ~38.4
    np.testing.assert_allclose(depth[32, 46], 5.5, atol=1e-5)
    assert np.isinf(depth[2, 2])  # empty pixel keeps +inf
    # transparent modes refuse to write depth
    with pytest.raises(ValueError):
        rasterize(draw, ortho_camera(), CFG, "blend", return_depth=True)


def test_return_depth_seeds_from_scene_depth():
    wall = np.full((H, W), 4.0, np.float32)  # nearer than the particle
    draw = quad_draw([[0.0, 0.0, 0.0]], [[1.0, 1.0, 1.0, 1.0]], size=0.5)
    img, depth = rasterize(
        draw,
        ortho_camera(),
        CFG,
        "opaque",
        scene_depth=jnp.asarray(wall),
        return_depth=True,
    )
    # particle (dist 5.0) fails the test everywhere; depth stays the wall's
    np.testing.assert_allclose(np.asarray(depth), 4.0, atol=1e-6)
    assert np.asarray(img)[32, 32, 3] == 0.0


def test_scene_render_threads_scene_depth():
    from bevy_hanabi_tpu.runtime import HanabiScene
    from bevy_hanabi_tpu.models import spawn_gravity_effect

    scene = HanabiScene(seed=0)
    scene.add(spawn_gravity_effect(capacity=512, rate=2000.0), "fx")
    for _ in range(20):
        scene.update(1 / 60)
    cam = ortho_camera()
    blocked = jnp.zeros((H, W), jnp.float32)  # geometry at distance 0
    img_open = np.asarray(scene.render(cam, background=(0, 0, 0, 0)))
    img_hid = np.asarray(
        scene.render(cam, background=(0, 0, 0, 0), scene_depth=blocked)
    )
    assert img_open[..., 3].sum() > 0
    assert img_hid[..., 3].sum() == 0.0


def test_bloom_and_tonemaps():
    from bevy_hanabi_tpu.render import bloom, tonemap_aces, tonemap_reinhard

    img = np.zeros((32, 32, 4), np.float32)
    img[16, 16, :3] = 5.0  # one HDR-hot pixel
    img[16, 16, 3] = 1.0
    out = np.asarray(bloom(jnp.asarray(img), threshold=1.0, sigma=2.0))
    # glow spreads beyond the hot pixel
    assert out[16, 20, 0] > 0.0 and img[16, 20, 0] == 0.0
    # hot pixel keeps at least its base energy
    assert out[16, 16, 0] >= 5.0
    # alpha unchanged
    np.testing.assert_array_equal(out[..., 3], img[..., 3])
    # sub-threshold images are untouched
    dim = np.full((8, 8, 4), 0.5, np.float32)
    np.testing.assert_allclose(
        np.asarray(bloom(jnp.asarray(dim))), dim, atol=1e-6
    )

    for tm in (tonemap_reinhard, tonemap_aces):
        mapped = np.asarray(tm(jnp.asarray(img)))
        assert mapped[..., :3].max() <= 1.0 + 1e-6
        assert np.isfinite(mapped).all()
        # monotone: hot pixel stays the brightest
        assert mapped[16, 16, 0] == mapped[..., 0].max()


def test_nonfinite_draw_data_cannot_poison_tiles():
    """A particle with degenerate (inf/NaN) axes or color must not NaN the
    pixels it does NOT cover: hardware ROP never touches uncovered
    fragments, so the masked blend must contain NaN*0."""
    bad_axis = ParticleDrawData(
        position=jnp.asarray([[0.0, 0.0, 0.0], [0.5, 0.5, 0.0]], jnp.float32),
        axis_x=jnp.asarray([[np.inf, 0.0, 0.0], [0.25, 0.0, 0.0]], jnp.float32),
        axis_y=jnp.asarray([[0.0, np.nan, 0.0], [0.0, 0.25, 0.0]], jnp.float32),
        color=jnp.asarray(
            [[1.0, 0.0, 0.0, 1.0], [0.0, 1.0, 0.0, 1.0]], jnp.float32
        ),
        alive=jnp.ones(2, bool),
        roundness=None,
        sprite_index=jnp.zeros(2, jnp.int32),
        texture_layers=(),
        sprite_grid_size=(1, 1),
        needs_uv=False,
    )
    for mode in ("blend", "add", "premultiply", "multiply", "opaque"):
        img = np.asarray(rasterize(bad_axis, ortho_camera(), CFG, mode))
        # the healthy green quad still renders (multiply over a black
        # background legitimately stays black — only check finiteness there)
        if mode != "multiply":
            assert (np.nan_to_num(img[..., 1]) > 0).any(), mode
        # ...and no pixel outside any coverage is NaN; the degenerate
        # entry contributes nothing rather than poisoning its tiles
        assert np.isfinite(img[..., 1]).all(), mode


# ---------------------------------------------------------------------------
# Differential oracle: naive per-pixel blending vs the tile rasterizer
# ---------------------------------------------------------------------------


def _oracle_rasterize(draw, camera, W_, H_, mode, background, cutoff=0.5):
    """Naive per-pixel reference: project every particle with the same
    camera math, then blend back-to-front at each pixel with the blend
    equations of the six alpha modes (asset.rs:212-240's blend states) —
    no tiles, no sort keys, no windows, no budgets. Exact for configs
    with antialias off and no tile/budget cropping."""
    view = np.asarray(camera.view, np.float32)
    proj = np.asarray(camera.proj, np.float32)
    mvp = proj @ view
    pos = np.asarray(draw.position, np.float32)
    ones = np.ones((pos.shape[0], 1), np.float32)

    def project(p):
        clip = (mvp @ np.concatenate([p, ones], 1).T).T
        w = clip[:, 3]
        safe_w = np.where(np.abs(w) < 1e-6, 1e-6, w)
        x = (clip[:, 0] / safe_w * 0.5 + 0.5) * W_
        y = (1.0 - (clip[:, 1] / safe_w * 0.5 + 0.5)) * H_
        return np.stack([x, y], 1), w

    center, w = project(pos)
    cx1, _ = project(pos + 0.5 * np.asarray(draw.axis_x, np.float32))
    cy1, _ = project(pos + 0.5 * np.asarray(draw.axis_y, np.float32))
    h1 = cx1 - center
    h2 = cy1 - center
    vz = (view[2, 0] * pos[:, 0] + view[2, 1] * pos[:, 1]
          + view[2, 2] * pos[:, 2] + view[2, 3])
    depth = -vz
    alive = np.asarray(draw.alive)
    valid = alive & (w > 1e-4)
    color = np.asarray(draw.color, np.float32)

    img = np.empty((H_, W_, 4), np.float32)
    img[:] = np.asarray(background, np.float32)
    order = np.argsort(-depth, kind="stable")  # back to front
    for i in order:
        if not valid[i]:
            continue
        det = h1[i, 0] * h2[i, 1] - h1[i, 1] * h2[i, 0]
        if abs(det) < 1e-9:
            det = 1e-9
        for py in range(H_):
            dy = py + 0.5 - center[i, 1]
            for px in range(W_):
                dx = px + 0.5 - center[i, 0]
                u = (h2[i, 1] * dx - h2[i, 0] * dy) / det
                v = (-h1[i, 1] * dx + h1[i, 0] * dy) / det
                if abs(u) > 1.0 or abs(v) > 1.0:
                    continue
                src = color[i]
                a = src[3]
                rgb_d = img[py, px, :3]
                a_d = img[py, px, 3]
                if mode == "blend":
                    img[py, px, :3] = src[:3] * a + rgb_d * (1.0 - a)
                    img[py, px, 3] = a + a_d * (1.0 - a)
                elif mode == "premultiply":
                    img[py, px, :3] = src[:3] + rgb_d * (1.0 - a)
                    img[py, px, 3] = a + a_d * (1.0 - a)
                elif mode == "add":
                    img[py, px, :3] = src[:3] * a + rgb_d
                    img[py, px, 3] = min(a + a_d, 1.0)
                elif mode == "multiply":
                    img[py, px, :3] = src[:3] * rgb_d * a + rgb_d * (1.0 - a)
                elif mode in ("opaque", "mask"):
                    if mode == "mask" and a < cutoff:
                        continue
                    img[py, px, :3] = src[:3]
                    img[py, px, 3] = 1.0
    return img


@pytest.mark.parametrize("seed", range(4))
def test_rasterizer_matches_naive_oracle_all_modes(seed):
    """bin -> sort -> window -> budgeted blend == naive per-pixel painting,
    for every alpha mode, on random scenes with no overflow/cropping.
    Pins the whole tile pipeline (binning exactness, key packing, depth
    order, window masking, blend equations) end-to-end against an
    implementation with none of its machinery."""
    rng = np.random.default_rng(1000 + seed)
    n = 24
    Ws = Hs = 48
    positions = rng.uniform(-0.9, 0.9, (n, 3)).astype(np.float32)
    positions[:, 2] = rng.uniform(-2.0, 2.0, n)  # well-separated depths
    colors = rng.uniform(0.0, 1.0, (n, 4)).astype(np.float32)
    alive = rng.random(n) > 0.2
    size = 0.35
    draw = quad_draw(positions, colors, size=size, alive=jnp.asarray(alive))
    cam = CameraParams(
        view=look_at((0.0, 0.0, 5.0), (0.0, 0.0, 0.0)),
        proj=orthographic(-1, 1, -1, 1, 0.1, 10.0),
        viewport=(Ws, Hs),
    )
    for mode, bg in [
        ("blend", (0.1, 0.2, 0.3, 0.0)),
        ("premultiply", (0.1, 0.2, 0.3, 0.0)),
        ("add", (0.05, 0.05, 0.05, 0.0)),
        ("multiply", (0.8, 0.7, 0.6, 0.5)),
        ("opaque", (0.0, 0.0, 0.0, 0.0)),
        ("mask", (0.0, 0.0, 0.0, 0.0)),
    ]:
        cfg = RasterConfig(
            width=Ws, height=Hs, tile_size=16, tile_span=3,
            max_entries_per_tile=n, background=bg,
        )
        got = np.asarray(rasterize(draw, cam, cfg, alpha_mode=mode))
        want = _oracle_rasterize(draw, cam, Ws, Hs, mode, bg)
        np.testing.assert_allclose(
            got, want, atol=3e-6, rtol=0,
            err_msg=f"mode={mode} seed={seed}",
        )

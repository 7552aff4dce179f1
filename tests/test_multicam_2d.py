"""Multi-camera rendering and 2D (ortho + z-layer) support tests
(reference examples: multicam.rs, 2d.rs, ordering via z_layer_2d)."""

import jax.numpy as jnp
import numpy as np

from bevy_hanabi_tpu import attributes as A
from bevy_hanabi_tpu.asset import EffectAsset
from bevy_hanabi_tpu.graph import ExprWriter
from bevy_hanabi_tpu.modifiers import SetAttributeModifier, SetColorModifier, SetSizeModifier
from bevy_hanabi_tpu.render import (
    CameraParams,
    RasterConfig,
    look_at,
    orthographic,
    perspective,
)
from bevy_hanabi_tpu.runtime import HanabiScene
from bevy_hanabi_tpu.spawn import SpawnerSettings

DT = 1.0 / 60.0
CFG = RasterConfig(width=64, height=64, tile_size=16, max_entries_per_tile=16)


def point_asset(name, pos, color, z_layer=0.0, size=0.3):
    w = ExprWriter()
    a = (
        EffectAsset(name, 8, SpawnerSettings.once(1.0), w.finish())
        .init(SetAttributeModifier(A.POSITION, w.lit(tuple(pos)).expr()))
        .init(SetAttributeModifier(A.LIFETIME, w.lit(100.0).expr()))
        .render(SetColorModifier(color))
        .render(SetSizeModifier((size,) * 3))
    )
    a.z_layer_2d = z_layer
    return a


def test_multicam_two_views_one_scene():
    scene = HanabiScene(seed=1)
    scene.add(point_asset("p", (1.0, 0.0, 0.0), (1.0, 0.0, 0.0, 1.0)), "p")
    scene.update(DT)
    cam_front = CameraParams(
        look_at((0, 0, 5.0), (0, 0, 0)), orthographic(-2, 2, -2, 2, 0.1, 10), (64, 64)
    )
    cam_side = CameraParams(
        look_at((5.0, 0, 0), (0, 0, 0)), orthographic(-2, 2, -2, 2, 0.1, 10), (64, 64)
    )
    img_front = np.asarray(scene.render(cam_front, CFG))
    img_side = np.asarray(scene.render(cam_side, CFG))
    # particle at +x: right half from the front, center from the side
    assert img_front[32, 48, 0] > 0.5 and img_front[32, 16, 0] < 0.1
    assert img_side[32, 32, 0] > 0.5


def test_2d_z_layer_orders_effects():
    # two coincident quads in the z=0 plane; z_layer decides paint order
    scene = HanabiScene(seed=2)
    scene.add(point_asset("below", (0, 0, 0), (1.0, 0.0, 0.0, 1.0), z_layer=0.0), "below")
    scene.add(point_asset("above", (0, 0, 0), (0.0, 0.0, 1.0, 1.0), z_layer=1.0), "above")
    scene.update(DT)
    cam = CameraParams(
        look_at((0, 0, 5.0), (0, 0, 0)), orthographic(-1, 1, -1, 1, 0.1, 10), (64, 64)
    )
    img = np.asarray(scene.render(cam, CFG))
    # higher z_layer paints later => blue on top
    np.testing.assert_allclose(img[32, 32, :3], [0, 0, 1], atol=1e-5)


def test_perspective_vs_ortho_depth():
    # same particle renders smaller when farther under perspective
    scene = HanabiScene(seed=3)
    scene.add(point_asset("near", (-0.8, 0.0, 2.0), (1, 1, 1, 1.0), size=0.4), "near")
    scene.add(point_asset("far", (0.8, 0.0, -4.0), (1, 1, 1, 1.0), size=0.4), "far")
    scene.update(DT)
    cam = CameraParams(
        look_at((0, 0, 6.0), (0, 0, 0)), perspective(0.9, 1.0, 0.1, 50.0), (64, 64)
    )
    img = np.asarray(scene.render(cam, CFG))
    a = img[..., 3] if img[..., 3].max() > 0 else img[..., 0]
    cov = (img[..., 0] > 0.3)
    left = cov[:, :32].sum()   # near particle
    right = cov[:, 32:].sum()  # far particle
    assert left > right > 0


def test_render_views_per_view_culling():
    """An effect outside camera B's frustum contributes ZERO blended energy
    to B's image while still appearing in A's (per-view visibility,
    reference render/mod.rs:5580-5600) — not just union culling."""
    scene = HanabiScene(seed=5)
    # particle at z=+4.5: inside A's frustum, outside B's (far=6 from -5)
    tf = np.array(
        [[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 4.5]], np.float32
    )
    scene.add(
        point_asset("p", (0.0, 0.0, 0.0), (1.0, 0.0, 0.0, 1.0)),
        "p",
        transform=tf,
        cull_pad=0.5,
    )
    # an always-visible reference effect so both views draw something
    # (offset laterally so the red quad cannot occlude it in view A)
    scene.add(
        point_asset("q", (1.0, 0.0, 0.0), (0.0, 1.0, 0.0, 1.0)), "q"
    )
    scene.update(DT)
    cam_a = CameraParams(
        look_at((0, 0, 5.0), (0, 0, 0)),
        orthographic(-2, 2, -2, 2, 0.1, 6.0),
        (64, 64),
    )
    cam_b = CameraParams(
        look_at((0, 0, -5.0), (0, 0, 0)),
        orthographic(-2, 2, -2, 2, 0.1, 6.0),
        (64, 64),
    )
    imgs = np.asarray(scene.render_views([cam_a, cam_b], CFG))
    assert imgs.shape[0] == 2
    # A sees the red particle; B sees zero red energy anywhere
    assert imgs[0][..., 0].max() > 0.5
    assert imgs[1][..., 0].max() == 0.0
    # both see the green reference particle
    assert imgs[0][..., 1].max() > 0.5
    assert imgs[1][..., 1].max() > 0.5


def test_render_views_per_view_culling_group():
    """Per-view masks apply to instanced groups too."""
    scene = HanabiScene(seed=6)
    tf = np.broadcast_to(
        np.array([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 4.5]], np.float32),
        (2, 3, 4),
    )
    scene.add_group(
        point_asset("g", (0.0, 0.0, 0.0), (1.0, 0.0, 1.0, 1.0)),
        2,
        "grp",
        transforms=tf,
        cull_pad=0.5,
    )
    scene.update(DT)
    cam_a = CameraParams(
        look_at((0, 0, 5.0), (0, 0, 0)),
        orthographic(-2, 2, -2, 2, 0.1, 6.0),
        (64, 64),
    )
    cam_b = CameraParams(
        look_at((0, 0, -5.0), (0, 0, 0)),
        orthographic(-2, 2, -2, 2, 0.1, 6.0),
        (64, 64),
    )
    imgs = np.asarray(scene.render_views([cam_a, cam_b], CFG))
    assert imgs[0][..., 0].max() > 0.5
    assert imgs[1][..., 0].max() == 0.0


def test_update_render_chunk_multiview_per_view_culling():
    """The multi-view chunk path threads the same per-view masks."""
    scene = HanabiScene(seed=7)
    tf = np.array(
        [[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 4.5]], np.float32
    )
    scene.add(
        point_asset("p", (0.0, 0.0, 0.0), (1.0, 0.0, 0.0, 1.0)),
        "p",
        transform=tf,
        cull_pad=0.5,
    )
    cam_a = CameraParams(
        look_at((0, 0, 5.0), (0, 0, 0)),
        orthographic(-2, 2, -2, 2, 0.1, 6.0),
        (64, 64),
    )
    cam_b = CameraParams(
        look_at((0, 0, -5.0), (0, 0, 0)),
        orthographic(-2, 2, -2, 2, 0.1, 6.0),
        (64, 64),
    )
    scene.update(DT)  # spawn first so the AABB is meaningful
    imgs, _ = scene.update_render_chunk(3, DT, [cam_a, cam_b], CFG)
    imgs = np.asarray(imgs)
    assert imgs[0][..., 0].max() > 0.5
    assert imgs[1][..., 0].max() == 0.0

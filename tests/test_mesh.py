"""Per-particle mesh (EffectMesh analogue) tests."""

import jax.numpy as jnp
import numpy as np

from bevy_hanabi_tpu import attributes as A
from bevy_hanabi_tpu.asset import EffectAsset
from bevy_hanabi_tpu.compiler import SimParams
from bevy_hanabi_tpu.graph import ExprWriter
from bevy_hanabi_tpu.modifiers import SetAttributeModifier, SetSizeModifier
from bevy_hanabi_tpu.render import CameraParams, RasterConfig, look_at, orthographic
from bevy_hanabi_tpu.render.extract import extract_draw_data
from bevy_hanabi_tpu.render.mesh import ParticleMesh, expand_mesh_draw
from bevy_hanabi_tpu.render.renderer import EffectRenderer
from bevy_hanabi_tpu.runtime import CompiledEffect, StepInputs
from bevy_hanabi_tpu.spawn import SpawnerSettings

W = H = 64
CFG = RasterConfig(width=W, height=H, tile_size=16, tile_span=2, max_entries_per_tile=32)


def cam():
    return CameraParams(
        look_at((0.0, 0.0, 5.0), (0.0, 0.0, 0.0)),
        orthographic(-1, 1, -1, 1, 0.1, 10.0),
        (W, H),
    )


def one_particle_asset(mesh=None, size=0.25):
    w = ExprWriter()
    a = (
        EffectAsset("m", 8, SpawnerSettings.once(1.0), w.finish())
        .init(SetAttributeModifier(A.POSITION, w.lit((0.0, 0.0, 0.0)).expr()))
        .init(SetAttributeModifier(A.LIFETIME, w.lit(100.0).expr()))
        .render(SetSizeModifier((size,) * 3))
    )
    if mesh is not None:
        a.with_mesh(mesh)
    return a


def render_one(asset):
    fx = CompiledEffect(asset)
    pool = fx.create_pool()
    pool, _ = fx.step(pool, StepInputs.make(1, 0), SimParams(delta_time=1 / 60))
    return np.asarray(EffectRenderer(asset, CFG).render(pool, cam(), SimParams()))


def test_stock_meshes():
    assert ParticleMesh.quad().num_quads == 1
    assert ParticleMesh.cross().num_quads == 2
    assert ParticleMesh.cube().num_quads == 6
    m2 = ParticleMesh.from_json(ParticleMesh.cube().to_json())
    np.testing.assert_array_equal(m2.offsets, ParticleMesh.cube().offsets)


def test_default_quad_mesh_is_noop():
    asset = one_particle_asset()
    img_none = render_one(asset)
    asset2 = one_particle_asset(mesh=ParticleMesh.quad())
    img_quad = render_one(asset2)
    np.testing.assert_array_equal(img_none, img_quad)


def test_cross_mesh_expands_entries():
    fx = CompiledEffect(one_particle_asset())
    pool = fx.create_pool()
    pool, _ = fx.step(pool, StepInputs.make(1, 0), SimParams(delta_time=1 / 60))
    draw = extract_draw_data(one_particle_asset(), pool, cam())
    ex = expand_mesh_draw(draw, ParticleMesh.cross())
    assert ex.position.shape[0] == draw.position.shape[0] * 2
    assert int(np.asarray(ex.alive).sum()) == 2


def test_cube_mesh_renders_wider_than_quad():
    # camera looks down -z; a cube shows front+back+4 edge-on faces; its
    # screen footprint equals the quad's, but entries = 6 (opaque depth wins)
    img_quad = render_one(one_particle_asset(size=0.5))
    cube_asset = one_particle_asset(mesh=ParticleMesh.cube(), size=0.5)
    cube_asset.render_modifiers = cube_asset.render_modifiers  # keep
    img_cube = render_one(cube_asset)
    cov_quad = (img_quad[..., 3] > 0).sum()
    cov_cube = (img_cube[..., 3] > 0).sum()
    assert cov_cube >= cov_quad > 0


def test_mesh_serde_via_asset():
    asset = one_particle_asset(mesh=ParticleMesh.cross())
    back = EffectAsset.from_json(asset.to_json())
    assert back.mesh is not None and back.mesh.num_quads == 2
    assert back.to_json() == asset.to_json()


def test_triangle_exact_coverage():
    """A single right triangle covers exactly the expected half-quad pixels.

    Reference parity: arbitrary triangle meshes per particle
    (/root/reference/src/lib.rs:745, draw path render/mod.rs:6622-6758).
    """
    # triangle A=(-0.5,-0.5), B=(0.5,-0.5), C=(-0.5,0.5) in world units on
    # the z=0 plane; ortho [-1,1]^2 over 64px -> 32px legs
    mesh = ParticleMesh.from_triangles(
        [[-0.5, -0.5, 0.0], [0.5, -0.5, 0.0], [-0.5, 0.5, 0.0]],
        [[0, 1, 2]],
    )
    asset = one_particle_asset(mesh, size=1.0)
    img = render_one(asset)
    cov = img[..., 3] > 0.5
    # screen: x = (wx+1)*32, y = (1-wy)*32 -> A=(16,48), B=(48,48), C=(16,16)
    ys, xs = np.mgrid[0:H, 0:W]
    px, py = xs + 0.5, ys + 0.5
    expect = (px >= 16) & (py <= 48) & ((px - 16) + (48 - py) <= 32)
    # allow one-pixel boundary differences
    diff = cov != expect
    assert diff.mean() < 0.02, (cov.sum(), expect.sum(), diff.sum())
    # interior & exterior exact
    assert cov[40, 20] and cov[44, 40]          # inside
    assert not cov[20, 40] and not cov[10, 10]  # outside hypotenuse / bbox


def test_triangle_antialias_matches_quad_quality():
    """Triangle edges get the same analytic one-pixel coverage ramp quads
    do: fractional edge pixels, solid interior, and a sub-pixel triangle
    integrates to (approximately) its true area instead of popping."""
    from dataclasses import replace

    cfg_aa = replace(CFG, antialias=True)
    mesh = ParticleMesh.from_triangles(
        [[-0.5, -0.5, 0.0], [0.5, -0.5, 0.0], [-0.5, 0.5, 0.0]],
        [[0, 1, 2]],
    )
    asset = one_particle_asset(mesh, size=1.0)
    fx = CompiledEffect(asset)
    pool = fx.create_pool()
    pool, _ = fx.step(pool, StepInputs.make(1, 0), SimParams(delta_time=1 / 60))
    img = np.asarray(
        EffectRenderer(asset, cfg_aa).render(pool, cam(), SimParams())
    )
    a = img[..., 3]
    # interior fully solid, exterior fully empty
    assert a[40, 20] > 0.999 and a[10, 10] < 1e-4
    # the hypotenuse crosses row 32 around x=32: fractional pixels exist
    frac = a[(a > 0.02) & (a < 0.98)]
    assert frac.size >= 10, frac.size
    # sub-pixel triangle: total energy is fractional, not a popped pixel
    tiny = ParticleMesh.from_triangles(
        [[-0.01, -0.01, 0.0], [0.01, -0.01, 0.0], [-0.01, 0.01, 0.0]],
        [[0, 1, 2]],
    )
    asset_t = one_particle_asset(tiny, size=1.0)
    fx = CompiledEffect(asset_t)
    pool = fx.create_pool()
    pool, _ = fx.step(pool, StepInputs.make(1, 0), SimParams(delta_time=1 / 60))
    img_t = np.asarray(
        EffectRenderer(asset_t, cfg_aa).render(pool, cam(), SimParams())
    )
    total = img_t[..., 3].sum()
    # true area = 0.5 * (0.02*32)^2 = 0.2 px^2
    assert 0.02 < total < 0.8, total
    assert img_t[..., 3].max() < 1.0


def test_triangle_mesh_union_with_quads():
    # a quad + a triangle render together; union coverage > quad alone
    quad = ParticleMesh.quad()
    union = ParticleMesh(
        offsets=[[0, 0, 0]], axes_x=[[1, 0, 0]], axes_y=[[0, 1, 0]],
        vertices=[[0.6, 0.6, 0.0], [1.4, 0.6, 0.0], [0.6, 1.4, 0.0]],
        indices=[[0, 1, 2]],
    )
    img_q = render_one(one_particle_asset(quad, size=0.5))
    img_u = render_one(one_particle_asset(union, size=0.5))
    assert (img_u[..., 3] > 0).sum() > (img_q[..., 3] > 0).sum()


def test_tetrahedron_mesh_renders_and_serde():
    tet = ParticleMesh.tetrahedron()
    assert tet.num_triangles == 4 and tet.num_quads == 0
    rt = ParticleMesh.from_json(tet.to_json())
    np.testing.assert_array_equal(rt.vertices, tet.vertices)
    np.testing.assert_array_equal(rt.indices, tet.indices)
    img = render_one(one_particle_asset(tet, size=0.6))
    assert (img[..., 3] > 0).sum() > 50  # silhouette has real coverage


def test_icosphere_mesh():
    ico = ParticleMesh.icosphere(0.5, subdivisions=0)
    assert ico.num_triangles == 20
    ico1 = ParticleMesh.icosphere(0.5, subdivisions=1)
    assert ico1.num_triangles == 80
    # all vertices on the sphere
    np.testing.assert_allclose(
        np.linalg.norm(ico1.vertices, axis=1), 0.5, atol=1e-6
    )
    # renders with a round silhouette: coverage close to a disc's area
    img = render_one(one_particle_asset(ico1, size=1.2))
    cov = (img[..., 3] > 0).sum()
    r_px = 0.6 * 32  # radius 0.5*1.2 world = 0.6 -> 19.2 px
    disc = np.pi * r_px * r_px
    assert 0.8 * disc < cov < 1.1 * disc, (cov, disc)

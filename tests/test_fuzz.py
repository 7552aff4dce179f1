"""Property-based fuzz: random modifier stacks must step without NaNs.

Builds randomized assets (random init/update modifier combinations with
randomized literal parameters), steps them several frames, and asserts
invariants: alive counts bounded by spawns, no NaN/Inf in alive lanes, and
determinism under identical seeds.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from bevy_hanabi_tpu import attributes as A
from bevy_hanabi_tpu.asset import EffectAsset
from bevy_hanabi_tpu.compiler import SimParams
from bevy_hanabi_tpu.graph import ExprWriter
from bevy_hanabi_tpu.modifiers import (
    AccelModifier,
    ConformToSphereModifier,
    KillAabbModifier,
    KillSphereModifier,
    LinearDragModifier,
    RadialAccelModifier,
    SetAttributeModifier,
    SetPositionCircleModifier,
    SetPositionCone3dModifier,
    SetPositionSphereModifier,
    SetVelocityCircleModifier,
    SetVelocitySphereModifier,
    SetVelocityTangentModifier,
    ShapeDimension,
    TangentAccelModifier,
)
from bevy_hanabi_tpu.runtime import CompiledEffect, StepInputs
from bevy_hanabi_tpu.spawn import SpawnerSettings

DT = 1.0 / 60.0


def random_asset(rng: np.random.Generator) -> EffectAsset:
    w = ExprWriter()
    m = w.module

    def v3():
        return m.lit(tuple(rng.uniform(-2, 2, 3).astype(float)))

    def unit3():
        d = rng.uniform(-1, 1, 3)
        d /= np.linalg.norm(d) + 1e-6
        return m.lit(tuple(d.astype(float)))

    def pos_f():
        return m.lit(float(rng.uniform(0.05, 3.0)))

    asset = EffectAsset("fuzz", 512, SpawnerSettings.rate(600.0), m)
    asset.init(SetAttributeModifier(A.AGE, w.lit(0.0).expr()))
    asset.init(
        SetAttributeModifier(
            A.LIFETIME, w.lit(float(rng.uniform(0.05, 0.5))).expr()
        )
    )

    pos_mods = [
        lambda: SetPositionSphereModifier(
            v3(), pos_f(), rng.choice([ShapeDimension.SURFACE, ShapeDimension.VOLUME])
        ),
        lambda: SetPositionCircleModifier(
            v3(), unit3(), pos_f(),
            rng.choice([ShapeDimension.SURFACE, ShapeDimension.VOLUME]),
        ),
        lambda: SetPositionCone3dModifier(pos_f(), pos_f(), pos_f()),
    ]
    asset.init(pos_mods[rng.integers(len(pos_mods))]())

    vel_mods = [
        lambda: SetVelocitySphereModifier(v3(), pos_f()),
        lambda: SetVelocityCircleModifier(v3(), unit3(), pos_f()),
        lambda: SetVelocityTangentModifier(v3(), unit3(), pos_f()),
        lambda: SetAttributeModifier(A.VELOCITY, w.rand(__import__("bevy_hanabi_tpu").VEC3F).expr()),
    ]
    asset.init(vel_mods[rng.integers(len(vel_mods))]())

    upd_mods = [
        lambda: AccelModifier(v3()),
        lambda: RadialAccelModifier(v3(), pos_f()),
        lambda: TangentAccelModifier(v3(), unit3(), pos_f()),
        lambda: LinearDragModifier(pos_f()),
        lambda: ConformToSphereModifier(v3(), pos_f(), pos_f(), pos_f(), pos_f()),
        lambda: KillSphereModifier(v3(), pos_f(), bool(rng.integers(2))),
        lambda: KillAabbModifier(v3(), v3(), bool(rng.integers(2))),
    ]
    for _ in range(int(rng.integers(1, 4))):
        asset.update(upd_mods[rng.integers(len(upd_mods))]())
    return asset


@pytest.mark.parametrize("seed", range(8))
def test_random_modifier_stacks_step_cleanly(seed):
    rng = np.random.default_rng(seed)
    asset = random_asset(rng)
    fx = CompiledEffect(asset)
    pool = fx.create_pool()
    total_spawned = 0
    for i in range(8):
        n = int(rng.integers(0, 100))
        total_spawned += n
        pool, _ = fx.step(
            pool,
            StepInputs.make(n, seed * 1000 + i),
            SimParams(time=i * DT, delta_time=DT),
        )
    alive = np.asarray(pool.alive)
    assert alive.sum() <= min(total_spawned, 512)
    # alive lanes hold finite state
    for name in ("position", "velocity", "age", "lifetime"):
        vals = np.asarray(pool.get(name))[alive]
        assert np.isfinite(vals).all(), f"{name} has non-finite values (seed {seed})"
    assert int(pool.counter) == min(total_spawned, 512) or int(pool.counter) <= total_spawned


# ---------------------------------------------------------------------------
# Chunked event trees: fuzz equivalence vs the per-frame path
# ---------------------------------------------------------------------------

from bevy_hanabi_tpu.modifiers import (
    EmitSpawnEventModifier,
    EventEmitCondition,
    InheritAttributeModifier,
)
from bevy_hanabi_tpu.runtime import HanabiScene


def _fuzz_tree_assets(rng: np.random.Generator):
    """Random 2-3 level event tree with deterministic (rand-free) modifiers
    so per-frame and chunked paths must agree bit-exactly."""
    def emitter(name, cap, spawner, lifetime, pos, channels):
        w = ExprWriter()
        a = (
            EffectAsset(name, cap, spawner, w.finish())
            .init(SetAttributeModifier(A.AGE, w.lit(0.0).expr()))
            .init(SetAttributeModifier(A.LIFETIME, w.lit(float(lifetime)).expr()))
            .init(SetAttributeModifier(A.POSITION, w.lit(tuple(map(float, pos))).expr()))
        )
        for ch in range(channels):
            cond = (
                EventEmitCondition.ON_DIE
                if rng.integers(2)
                else EventEmitCondition.ALWAYS
            )
            a.update(
                EmitSpawnEventModifier(cond, w.module.lit(int(rng.integers(1, 3)), None), ch)
            )
        return a

    def inheritor(name, cap, lifetime, channels):
        w = ExprWriter()
        a = (
            EffectAsset(name, cap, SpawnerSettings.once(0.0), w.finish())
            .init(InheritAttributeModifier(A.POSITION))
            .init(SetAttributeModifier(A.AGE, w.lit(0.0).expr()))
            .init(SetAttributeModifier(A.LIFETIME, w.lit(float(lifetime)).expr()))
        )
        for ch in range(channels):
            a.update(
                EmitSpawnEventModifier(
                    EventEmitCondition.ON_DIE, w.module.lit(int(rng.integers(1, 3)), None), ch
                )
            )
        return a

    n_children = int(rng.integers(1, 3))
    root = emitter(
        "root", 32,
        SpawnerSettings.once(float(rng.integers(2, 6))),
        rng.uniform(2, 6) * DT, rng.uniform(-3, 3, 3), n_children,
    )
    specs = [("root", root, None, 0)]
    for c in range(n_children):
        deep = rng.integers(2) == 0
        mid = inheritor(f"mid{c}", 64, rng.uniform(2, 5) * DT, 1 if deep else 0)
        specs.append((f"mid{c}", mid, "root", c))
        if deep:
            leaf = inheritor(f"leaf{c}", 128, 100.0, 0)
            specs.append((f"leaf{c}", leaf, f"mid{c}", 0))
    return specs


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_chunked_event_tree_matches_per_frame(seed):
    rng = np.random.default_rng(100 + seed)
    specs = _fuzz_tree_assets(rng)

    def build():
        s = HanabiScene(seed=seed)
        for name, asset, parent, _ in specs:
            s.add(asset, name, parent=parent)
        return s

    frames = int(rng.integers(8, 25))
    a = build()
    for _ in range(frames):
        a.update(DT)
    b = build()
    b.update_chunk(frames, DT)
    for name, _, _, _ in specs:
        assert a[name].alive_count() == b[name].alive_count(), (name, seed)
        np.testing.assert_array_equal(
            np.asarray(a[name].pool.alive), np.asarray(b[name].pool.alive)
        )
        np.testing.assert_allclose(
            np.asarray(a[name].pool.get("position")),
            np.asarray(b[name].pool.get("position")),
            atol=1e-6, err_msg=f"{name} seed {seed}",
        )


# ---------------------------------------------------------------------------
# Render-stack fuzz: random render modifiers must rasterize to finite images
# ---------------------------------------------------------------------------

from bevy_hanabi_tpu.asset import AlphaMode
from bevy_hanabi_tpu.gradient import Gradient
from bevy_hanabi_tpu.modifiers import (
    ColorOverLifetimeModifier,
    FlipbookModifier,
    OrientMode,
    OrientModifier,
    ParticleTextureModifier,
    RoundModifier,
    ScreenSpaceSizeModifier,
    SetColorModifier,
    SetSizeModifier,
    SizeOverLifetimeModifier,
)
from bevy_hanabi_tpu.render import CameraParams, RasterConfig, look_at, perspective
from bevy_hanabi_tpu.render.renderer import EffectRenderer


def random_render_asset(rng: np.random.Generator):
    """Random but valid render stack over a simple sphere emitter."""
    w = ExprWriter()
    asset = EffectAsset("rfuzz", 256, SpawnerSettings.rate(800.0), w.module)
    asset.init(SetAttributeModifier(A.AGE, w.lit(0.0).expr()))
    asset.init(SetAttributeModifier(A.LIFETIME, w.lit(float(rng.uniform(0.3, 1.0))).expr()))
    asset.init(
        SetPositionSphereModifier(
            w.lit((0.0, 0.0, 0.0)).expr(),
            w.lit(float(rng.uniform(0.3, 1.5))).expr(),
            ShapeDimension.VOLUME,
        )
    )
    asset.init(
        SetVelocitySphereModifier(
            w.lit((0.0, 0.0, 0.0)).expr(), w.lit(float(rng.uniform(0.2, 2.0))).expr()
        )
    )

    textures = []
    if rng.integers(2):
        asset.render(OrientModifier(rng.choice(list(OrientMode))))
    if rng.integers(2):
        asset.render(SetColorModifier(tuple(rng.uniform(0, 2, 4).astype(float))))
    else:
        g = Gradient()
        for t in np.sort(rng.uniform(0, 1, rng.integers(2, 5))):
            g.with_key(float(t), tuple(rng.uniform(0, 2, 4).astype(float)))
        asset.render(ColorOverLifetimeModifier(g))
    if rng.integers(2):
        asset.render(SetSizeModifier(tuple(rng.uniform(0.02, 0.3, 3).astype(float))))
    else:
        asset.render(
            SizeOverLifetimeModifier(
                Gradient.linear(
                    (float(rng.uniform(0.02, 0.3)),), (float(rng.uniform(0.0, 0.2)),)
                )
            )
        )
    if rng.integers(2):
        asset.render(RoundModifier(w.lit(float(rng.uniform(0.0, 1.0))).expr()))
    if rng.integers(2):
        asset.render(ScreenSpaceSizeModifier())
    if rng.integers(2):
        tex = rng.uniform(0, 1, (8, 8, 4)).astype(np.float32)
        asset.render(ParticleTextureModifier(0))
        textures.append(tex)
        if rng.integers(2):
            asset.render(FlipbookModifier((2, 2)))
    mode = rng.choice(["blend", "premultiply", "add", "multiply", "opaque", "mask"])
    if mode == "mask":
        asset.with_alpha_mode(AlphaMode.mask(w.lit(float(rng.uniform(0.1, 0.9))).expr()))
    else:
        asset.with_alpha_mode(getattr(AlphaMode, mode.upper()))
    return asset, textures


@pytest.mark.parametrize("seed", range(8))
def test_random_render_stacks_rasterize_cleanly(seed):
    rng = np.random.default_rng(seed + 100)
    asset, textures = random_render_asset(rng)
    fx = CompiledEffect(asset)
    pool = fx.create_pool()
    for i in range(12):
        pool, _ = fx.step(
            pool,
            StepInputs.make(int(rng.integers(0, 60)), seed * 77 + i),
            SimParams(time=i * DT, delta_time=DT),
        )
    eye = rng.uniform(-1, 1, 3) * np.array([2.0, 2.0, 0.0]) + np.array([0, 0, 4.0])
    cam = CameraParams(
        view=look_at(tuple(eye.astype(float)), (0.0, 0.0, 0.0)),
        proj=perspective(float(rng.uniform(0.6, 1.4)), 1.0, 0.1, 100.0),
        viewport=(96, 96),
    )
    cfg = RasterConfig(
        width=96, height=96,
        tile_slots=int(rng.choice([0, 2])),
        antialias=bool(rng.integers(2)),
        max_entries_per_tile=int(rng.choice([8, 64])),
    )
    img = np.asarray(
        EffectRenderer(asset, cfg, textures=textures).render(pool, cam)
    )
    assert img.shape == (96, 96, 4)
    assert np.isfinite(img).all(), f"non-finite pixels (seed {seed})"
    alive = int(np.asarray(pool.alive).sum())
    assert alive > 0  # fuzz scenes must actually draw something


@pytest.mark.parametrize("seed", range(6))
def test_random_scene_phase_mix_renders_cleanly(seed):
    """Scenes mixing random alpha modes (opaque/mask phase + transparents,
    plus an instanced group) must render finite images with the phase
    pipeline."""
    from bevy_hanabi_tpu.runtime import HanabiScene

    rng = np.random.default_rng(seed + 500)
    scene = HanabiScene(seed=seed)
    n_effects = int(rng.integers(2, 5))
    for i in range(n_effects):
        asset, textures = random_render_asset(rng)
        t = np.eye(3, 4, dtype=np.float32)
        t[:3, 3] = rng.uniform(-1, 1, 3)
        scene.add(asset, f"fx{i}", transform=t, textures=textures)
    if rng.integers(2):
        gasset, gtex = random_render_asset(rng)
        if gasset.mesh is None:  # groups render flat-pool billboards
            scene.add_group(gasset, 2, "grp", textures=gtex)
    for _ in range(10):
        scene.update(DT)
    cam = CameraParams(
        view=look_at((0.0, 0.0, 4.0), (0.0, 0.0, 0.0)),
        proj=perspective(1.0, 1.0, 0.1, 100.0),
        viewport=(96, 96),
    )
    out = scene.render(cam, background=(0, 0, 0, 0), return_depth=True)
    img, depth = np.asarray(out[0]), np.asarray(out[1])
    assert np.isfinite(img).all(), f"non-finite pixels (seed {seed})"
    assert img.shape == (96, 96, 4) and depth.shape == (96, 96)
    # depth is +inf where no opaque fragment (or everywhere if none)
    assert (depth > 0).all()


# ---------------------------------------------------------------------------
# Painter-vs-split differential fuzz: depth-separated random scenes agree
# ---------------------------------------------------------------------------


def _banded_render_asset(rng: np.random.Generator, lit: bool):
    """Random render stack whose particles stay within a tight z extent
    (sphere radius <= 0.25, |velocity| <= 0.3) so per-effect z bands
    spaced 1.2 apart never overlap in depth — the regime where the split
    pipeline's emitter-distance pass order equals the painter pass's
    global depth order, making the two pixel-identical."""
    w = ExprWriter()
    asset = EffectAsset("bfuzz", 32, SpawnerSettings.once(32.0), w.module)
    asset.init(SetAttributeModifier(A.AGE, w.lit(0.0).expr()))
    asset.init(SetAttributeModifier(A.LIFETIME, w.lit(100.0).expr()))
    asset.init(
        SetPositionSphereModifier(
            w.lit((0.0, 0.0, 0.0)).expr(),
            w.lit(float(rng.uniform(0.1, 0.25))).expr(),
            ShapeDimension.VOLUME,
        )
    )
    asset.init(
        SetVelocitySphereModifier(
            w.lit((0.0, 0.0, 0.0)).expr(),
            w.lit(float(rng.uniform(0.05, 0.3))).expr(),
        )
    )
    asset.render(
        SetColorModifier(tuple(rng.uniform(0.1, 1.5, 4).astype(float)))
    )
    asset.render(
        SetSizeModifier(tuple(rng.uniform(0.05, 0.3, 3).astype(float)))
    )
    textures = []
    if lit:
        from bevy_hanabi_tpu.models.examples import LambertianLightingModifier
        from bevy_hanabi_tpu.render.mesh import ParticleMesh

        asset.with_mesh(ParticleMesh.icosphere(0.35, subdivisions=0))
        ldir = rng.uniform(-1, 1, 3)
        ldir /= np.linalg.norm(ldir) + 1e-6
        asset.render(
            LambertianLightingModifier(
                tuple(ldir.astype(float)), float(rng.uniform(0.0, 0.4))
            )
        )
        asset.with_alpha_mode(AlphaMode.OPAQUE)
        return asset, textures
    if rng.integers(2):
        asset.render(RoundModifier(w.lit(float(rng.uniform(0.0, 1.0))).expr()))
    n_layers = int(rng.integers(0, 3))
    from bevy_hanabi_tpu.modifiers import ImageSampleMapping

    mappings = list(ImageSampleMapping)
    for layer in range(n_layers):
        hw = int(rng.integers(3, 9))
        textures.append(rng.uniform(0, 1, (hw, hw, 4)).astype(np.float32))
        asset.render(
            ParticleTextureModifier(layer, rng.choice(mappings))
        )
    if n_layers and rng.integers(2):
        asset.render(FlipbookModifier((2, 2)))
    mode = rng.choice(["blend", "premultiply", "add", "multiply", "opaque", "mask"])
    if mode == "mask":
        asset.with_alpha_mode(
            AlphaMode.mask(w.lit(float(rng.uniform(0.1, 0.9))).expr())
        )
    else:
        asset.with_alpha_mode(getattr(AlphaMode, mode.upper()))
    return asset, textures


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_painter_matches_split_depth_separated(seed):
    """Differential fuzz for the unified painter pass: random mixed
    scenes (multi-layer textures, flipbooks, roundness, lit meshes with
    per-effect Lambert setups, every alpha mode) whose effects occupy
    disjoint z bands must render PIXEL-IDENTICALLY through
    pipeline="painter" and pipeline="split"."""
    from bevy_hanabi_tpu.runtime import HanabiScene

    rng = np.random.default_rng(seed + 9000)
    scene = HanabiScene(seed=seed)
    n_effects = int(rng.integers(2, 5))
    lit_slots = set(rng.choice(n_effects, rng.integers(0, 3), replace=False))
    for i in range(n_effects):
        asset, textures = _banded_render_asset(rng, lit=i in lit_slots)
        t = np.eye(3, 4, dtype=np.float32)
        t[:2, 3] = rng.uniform(-0.6, 0.6, 2)
        t[2, 3] = -1.8 + 1.2 * i
        scene.add(asset, f"fx{i}", transform=t, textures=textures)
    for _ in range(3):
        scene.update(DT)
    cam = CameraParams(
        view=look_at((0.0, 0.0, 8.0), (0.0, 0.0, 0.0)),
        proj=perspective(0.6, 1.0, 0.1, 100.0),
        viewport=(96, 96),
    )
    # gray background: MULTIPLY effects modulate it visibly (on
    # transparent black they are no-ops and a multiply-only scene is
    # correctly blank). The per-tile budget is sized so no tile
    # overflows: under overflow the painter pass's scene-GLOBAL
    # nearest-M budget legitimately keeps a different entry subset than
    # the split pipeline's per-pass budgets (documented in PERF.md).
    bg = (0.35, 0.35, 0.35, 1.0)
    cfg = RasterConfig(
        width=96, height=96, tile_size=8, max_entries_per_tile=2048
    )
    img_split = np.asarray(
        scene.render(cam, cfg, background=bg, pipeline="split")
    )
    img_paint = np.asarray(
        scene.render(cam, cfg, background=bg, pipeline="painter")
    )
    assert np.isfinite(img_paint).all(), f"non-finite pixels (seed {seed})"
    np.testing.assert_allclose(
        img_paint, img_split, atol=1e-5,
        err_msg=f"painter != split (seed {seed})",
    )
    # any non-mask effect must visibly change the background (mask-only
    # scenes may legitimately discard every fragment below the cutoff)
    if any(scene[f"fx{i}"].asset.alpha_mode.kind != "mask"
           for i in range(n_effects)):
        assert (img_paint != np.asarray(bg, np.float32)).any(), (
            f"nothing drew (seed {seed})"
        )

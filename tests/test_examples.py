"""Acceptance tests: every re-created reference example builds, serializes,
compiles, and simulates (the reference runs examples in CI the same way)."""

import numpy as np
import pytest

from bevy_hanabi_tpu.asset import EffectAsset
from bevy_hanabi_tpu.models.examples import (
    LambertianLightingModifier,
    example_lightning,
    example_ribbon,
    example_spawn_on_command,
    example_worms,
    examples_registry,
)
from bevy_hanabi_tpu.runtime import HanabiScene

DT = 1.0 / 60.0

_SINGLE = {
    name: builder
    for name, builder in examples_registry().items()
    if name not in ("lifetime", "worms")
}


@pytest.mark.parametrize("name", sorted(_SINGLE))
def test_example_builds_serializes_and_runs(name):
    asset = _SINGLE[name]()
    # serde roundtrip
    back = EffectAsset.from_json(asset.to_json())
    assert back.to_json() == asset.to_json()
    # simulate 30 frames in a scene
    scene = HanabiScene(seed=1)
    scene.add(asset, "fx")
    for _ in range(30):
        scene.update(DT)
    expect_alive = {
        "activate": False,  # starts inactive
        "spawn_on_command": False,  # once + inactive until reset
    }.get(name, True)
    alive = scene["fx"].alive_count()
    assert (alive > 0) == expect_alive, f"{name}: alive={alive}"


def test_example_lifetime_trio():
    scene = HanabiScene(seed=1)
    for name, asset in examples_registry()["lifetime"]().items():
        scene.add(asset, name)
    for _ in range(120):  # 2s: short (1s life) dying, long (12s) retaining
        scene.update(DT)
    assert scene["short"].alive_count() < scene["long"].alive_count()


def test_example_worms_parent_child_ribbons():
    assets = example_worms()
    scene = HanabiScene(seed=2)
    scene.add(assets["heads"], "heads")
    scene.add(assets["bodies"], "bodies", parent="heads")
    for _ in range(120):
        scene.update(DT)
    assert scene["heads"].alive_count() > 0
    assert scene["bodies"].alive_count() > 0
    # each body particle carries its parent's counter as ribbon id
    bodies = scene["bodies"].pool
    alive = np.asarray(bodies.alive)
    rids = np.asarray(bodies.get("ribbon_id"))[alive]
    assert len(np.unique(rids)) > 1  # several worms


def test_example_activate_toggling():
    scene = HanabiScene(seed=3)
    from bevy_hanabi_tpu.models.examples import example_activate

    scene.add(example_activate(), "fx")
    for _ in range(30):
        scene.update(DT)
    assert scene["fx"].alive_count() == 0
    scene.set_spawner_active("fx", True)
    for _ in range(30):
        scene.update(DT)
    assert scene["fx"].alive_count() > 0
    scene.set_spawner_active("fx", False)
    a = scene["fx"].alive_count()
    for _ in range(10):
        scene.update(DT)
    assert scene["fx"].alive_count() <= a


def test_example_spawn_on_command_reset():
    scene = HanabiScene(seed=4)
    scene.add(example_spawn_on_command(), "fx")
    scene.set_property("fx", "spawn_color", 0xFF00FF00)
    scene.set_property("fx", "normal", (0.0, 1.0, 0.0))
    for _ in range(5):
        scene.update(DT)
    assert scene["fx"].alive_count() == 0
    # "on command": activate + reset fires the once-spawner
    scene.set_spawner_active("fx", True)
    scene.reset_spawner("fx")
    scene.update(DT)
    assert scene["fx"].alive_count() == 100
    colors = np.asarray(scene["fx"].pool.get("color"))[np.asarray(scene["fx"].pool.alive)]
    assert (colors == 0xFF00FF00).all()


def test_example_lightning_expression_stress():
    asset = example_lightning(particles_per_bolt=64)
    scene = HanabiScene(seed=5)
    scene.add(asset, "bolt")
    scene.set_property("bolt", "wave_seed", 3.25)
    scene.update(DT)
    pool = scene["bolt"].pool
    alive = np.asarray(pool.alive)
    assert alive.sum() == 64
    pos = np.asarray(pool.get("position"))[alive]
    # bolt spans y in [0, 8], zig-zags in x within spread bounds
    assert pos[:, 1].min() < 0.5 and pos[:, 1].max() > 7.5
    assert np.abs(pos[:, 0]).max() <= 0.9
    # changing the seed property changes the bolt shape without recompiling
    scene.set_property("bolt", "wave_seed", 7.5)
    scene.reset_spawner("bolt")
    for _ in range(30):
        scene.update(DT)


def test_example_ribbon_trails():
    scene = HanabiScene(seed=6)
    scene.add(example_ribbon(), "rib")
    for _ in range(60):
        scene.update(DT)
    inst = scene["rib"]
    assert inst.alive_count() > 50
    # all one ribbon
    rids = np.asarray(inst.pool.get("ribbon_id"))[np.asarray(inst.pool.alive)]
    assert (rids == 0).all()


def test_custom_modifier_registered_for_serde():
    from bevy_hanabi_tpu.modifiers import modifier_from_json

    m = LambertianLightingModifier((0.0, 1.0, 0.0), 0.5)
    back = modifier_from_json(m.to_json())
    assert isinstance(back, LambertianLightingModifier)
    assert back.band == 0.5


def test_ribbon_bench_effect_chains_and_renders():
    """BASELINE config 5 (ribbon half) at toy scale: counter-keyed ribbon
    ids chain spawns into trails that survive the full render path."""
    import math

    from bevy_hanabi_tpu.compiler import SimParams
    from bevy_hanabi_tpu.models import ribbon_bench_effect
    from bevy_hanabi_tpu.render import (
        CameraParams,
        RasterConfig,
        look_at,
        perspective,
    )
    from bevy_hanabi_tpu.runtime import CompiledEffect, StepInputs
    from bevy_hanabi_tpu.spawn import EffectSpawner

    asset = ribbon_bench_effect(capacity=2048, num_ribbons=32)
    fx = CompiledEffect(asset)
    pool = fx.create_pool()
    sp = EffectSpawner(asset.spawner, rng=np.random.default_rng(0))
    cam = CameraParams(
        view=look_at((0.0, 0.0, 10.0), (0.0, 0.0, 0.0)),
        proj=perspective(math.radians(60.0), 1.0, 0.1, 100.0),
        viewport=(64, 64),
    )
    cfg = RasterConfig(width=64, height=64)
    K = 16
    frame = 0
    for _ in range(4):
        ins, sims = [], []
        for j in range(K):
            ins.append(StepInputs.make(sp.tick(1 / 60), frame + j))
            sims.append(SimParams(time=(frame + j) / 60, delta_time=1 / 60))
        ii, ss = fx.stack_frames(ins, sims)
        frame += K
        pool, img, sums = fx.step_render_chunk(pool, ii, ss, cam, cfg)
    alive = np.asarray(pool.alive)
    rids = np.asarray(pool.get("ribbon_id"))[alive]
    assert alive.sum() > 500
    assert len(np.unique(rids)) == 32  # every ribbon populated
    assert (np.asarray(img)[..., 3] > 0).sum() > 50  # trails visible
    assert float(np.asarray(sums)[-1]) > 0


def test_gallery_harness_specs_run_headless():
    """Tier-4 example-run harness smoke (reference .github/example-run):
    every gallery spec builds a scene that steps; a sample renders."""
    import importlib.util
    import os
    import sys

    path = os.path.join(os.path.dirname(__file__), "..", "examples", "run_all.py")
    spec = importlib.util.spec_from_file_location("gallery_run_all", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["gallery_run_all"] = mod
    spec.loader.exec_module(mod)

    specs = mod.build_gallery_specs()
    assert len(specs) >= 24  # all 23 reference examples + bench/depth demos

    from bevy_hanabi_tpu.render import CameraParams, RasterConfig, look_at, perspective
    from bevy_hanabi_tpu.runtime import HanabiScene

    # build every scene (catches bad spec wiring), step a couple frames
    for name, (make, frames, eye, target, *extra) in specs.items():
        scene = HanabiScene(seed=1)
        make(scene)
        scene.update(1 / 60)

    # render one spec end-to-end at tiny size, with its extras
    name = "depth_occlusion"
    make, frames, eye, target, *extra = specs[name]
    scene = HanabiScene(seed=1)
    make(scene)
    for _ in range(30):
        scene.update(1 / 60)
    cam = CameraParams(
        view=look_at(eye, target),
        proj=perspective(0.9, 1.0, 0.1, 200.0),
        viewport=(64, 64),
    )
    depth = extra[0](64) if extra else None
    img = np.asarray(
        scene.render(cam, RasterConfig(width=64, height=64), scene_depth=depth)
    )
    assert img.shape == (64, 64, 4) and np.isfinite(img).all()


def test_device_check_effects_are_transcendental_free():
    """The device-gate effects (ribbon_order_check_effect,
    textured_mesh_check_effect) exist to make TPU-vs-CPU rendered frames
    bit-comparable: their expr graphs must stay free of transcendental ops,
    whose VPU-vs-libm ULP drift shifts positions ~1e-3 and flips pixel
    coverage at primitive edges (the measured failure mode that motivated
    them — see bench.py run_device_checks). PCG rand is bit-exact and
    allowed; sin/cos/exp/sqrt-family ops are not."""
    from bevy_hanabi_tpu.graph.expr import BinaryOp, UnaryOp
    from bevy_hanabi_tpu.models import (
        ribbon_order_check_effect,
        textured_mesh_check_effect,
    )

    banned_unary = {
        UnaryOp.SIN, UnaryOp.COS, UnaryOp.TAN, UnaryOp.ASIN, UnaryOp.ACOS,
        UnaryOp.ATAN, UnaryOp.EXP, UnaryOp.EXP2, UnaryOp.LOG, UnaryOp.LOG2,
        UnaryOp.SQRT, UnaryOp.INV_SQRT, UnaryOp.NORMALIZE, UnaryOp.LENGTH,
    }
    banned_binary = {BinaryOp.ATAN2, BinaryOp.DISTANCE}
    for asset in (
        ribbon_order_check_effect(capacity=256, num_ribbons=8),
        textured_mesh_check_effect(capacity=256),
    ):
        for e in asset.module._exprs:
            op = getattr(e, "op", None)
            assert op not in banned_unary and op not in banned_binary, (
                f"{asset.name}: transcendental op {op} would break the "
                "bit-comparable device gate"
            )


def test_device_check_effects_render_on_cpu():
    """The device-gate effects compile and produce non-empty frames on the
    host backend (the reference side of every TPU-vs-CPU comparison)."""
    import math

    from bevy_hanabi_tpu.models import (
        ribbon_order_check_effect,
        textured_mesh_check_effect,
    )
    from bevy_hanabi_tpu.models.texutils import make_circle_texture
    from bevy_hanabi_tpu.modifiers import ParticleTextureModifier
    from bevy_hanabi_tpu.compiler import SimParams
    from bevy_hanabi_tpu.render import (
        CameraParams,
        RasterConfig,
        look_at,
        perspective,
    )
    from bevy_hanabi_tpu.render.mesh import ParticleMesh
    from bevy_hanabi_tpu.runtime import CompiledEffect, HanabiScene, StepInputs

    cam = CameraParams(
        look_at((0, 0, 6), (0, 0, 0)),
        perspective(0.9, 1.0, 0.1, 100.0),
        (64, 64),
    )
    cfg = RasterConfig(width=64, height=64)

    r = ribbon_order_check_effect(capacity=1024, num_ribbons=16)
    rfx = CompiledEffect(r)
    pool = rfx.create_pool()
    ins = [StepInputs.make(64, 7 * i + 1) for i in range(12)]
    sims = [SimParams(time=i / 60, delta_time=1 / 60) for i in range(12)]
    ii, ss = rfx.stack_frames(ins, sims)
    pool, img, _ = rfx.step_render_chunk(pool, ii, ss, cam, cfg)
    img = np.asarray(img)
    assert np.isfinite(img).all() and (img[..., 3] > 0).sum() > 10
    rids = np.asarray(pool.get("ribbon_id"))[np.asarray(pool.alive)]
    assert len(np.unique(rids)) > 1  # trails actually chained

    s = HanabiScene(seed=5)
    s.add(
        textured_mesh_check_effect(capacity=512)
        .render(ParticleTextureModifier(0))
        .with_mesh(ParticleMesh.icosphere(radius=0.4, subdivisions=1)),
        "mesh",
        textures=[make_circle_texture(32)],
    )
    for _ in range(3):
        s.update(1 / 60)
    img2 = np.asarray(s.render(cam, cfg))
    assert np.isfinite(img2).all() and (img2[..., 3] > 0).sum() > 0

"""RON interop tests: the reference's canonical `.effect` format.

Covers the generic RON parser/writer, semantic round-trips of authored
assets through ``asset_to_ron``/``asset_from_ron``, and a hand-written
fixture in the exact shape the reference's serializer emits
(EffectAsset::serialize, reference asset.rs:674-748; the serde_asset
round-trip test asset, asset.rs:1304-1366).
"""

import math
import os

import numpy as np
import pytest

from bevy_hanabi_tpu.asset import AlphaMode, EffectAsset, MotionIntegration, SimulationCondition, SimulationSpace
from bevy_hanabi_tpu.cpu_value import CpuValue
from bevy_hanabi_tpu.gradient import Gradient
from bevy_hanabi_tpu.graph import ExprWriter
from bevy_hanabi_tpu.graph.expr import BuiltInOp, Module, UnaryOp
from bevy_hanabi_tpu.modifiers import (
    AccelModifier,
    ColorOverLifetimeModifier,
    ConformToSphereModifier,
    EmitSpawnEventModifier,
    FlipbookModifier,
    InheritAttributeModifier,
    KillAabbModifier,
    OrientMode,
    OrientModifier,
    ParticleTextureModifier,
    RoundModifier,
    ScreenSpaceSizeModifier,
    SetAttributeModifier,
    SetColorModifier,
    SetPositionSphereModifier,
    SetSizeModifier,
    ShapeDimension,
    SizeOverLifetimeModifier,
)
from bevy_hanabi_tpu.modifiers.event import EventEmitCondition
from bevy_hanabi_tpu.modifiers.output import ColorBlendMask, ColorBlendMode
from bevy_hanabi_tpu.ron import (
    Rec,
    RonError,
    Seq,
    Unit,
    asset_from_ron,
    asset_to_ron,
    dumps,
    parse,
)
from bevy_hanabi_tpu.spawn import SpawnerSettings
from bevy_hanabi_tpu.values import ScalarValue, VectorValue


# ---------------------------------------------------------------------------
# Generic parser/writer
# ---------------------------------------------------------------------------


class TestRonParser:
    def test_primitives(self):
        assert parse("42") == 42
        assert parse("-17") == -17
        assert parse("1.5") == 1.5
        assert parse("-2.5e3") == -2500.0
        assert parse("true") is True
        assert parse("false") is False
        assert parse('"hi\\n\\"there\\""') == 'hi\n"there"'
        assert parse("inf") == math.inf
        assert parse("-inf") == -math.inf
        assert math.isnan(parse("NaN"))

    def test_collections(self):
        assert parse("[1, 2, 3]") == [1, 2, 3]
        assert parse("[]") == []
        assert parse('{"a": 1, "b": 2}') == {"a": 1, "b": 2}
        assert parse("[1, 2,]") == [1, 2]  # trailing comma

    def test_structs_and_variants(self):
        v = parse("(name: \"x\", count: 3)")
        assert isinstance(v, Rec) and v.name is None
        assert v.get("name") == "x" and v.get("count") == 3
        v = parse("Single(5.0)")
        assert v == Seq("Single", (5.0,))
        assert parse("Blend") == Unit("Blend")
        v = parse("Unary(op: Abs, expr: \"#1\")")
        assert isinstance(v, Rec) and v.name == "Unary"
        assert v.get("op") == Unit("Abs")
        assert parse("(1.0, 2.0, 3.0)") == Seq(None, (1.0, 2.0, 3.0))
        assert parse("()") == Seq(None, ())
        assert parse("Some(3)") == Seq("Some", (3,))
        assert parse("None") == Unit("None")

    def test_comments(self):
        assert parse("// header\n[1, /* two */ 2]") == [1, 2]

    def test_errors(self):
        with pytest.raises(RonError):
            parse("(a: 1")  # unterminated
        with pytest.raises(RonError):
            parse("[1, 2] extra")
        with pytest.raises(RonError):
            parse('"unterminated')

    def test_dumps_round_trip(self):
        vals = [
            42,
            1.5,
            True,
            "str with \"quote\"",
            [1, 2, [3]],
            {"k": Seq("Single", (1.0,))},
            Rec("Unary", (("op", Unit("Abs")), ("expr", "#1"))),
            Seq(None, (1.0, -2.0)),
            Unit("Blend"),
            math.inf,
        ]
        for v in vals:
            assert parse(dumps(v)) == v

    def test_dumps_float_format(self):
        # floats keep a decimal point (RON floats vs ints are typed)
        assert dumps(1.0) == "1.0"
        assert dumps(-0.5) == "-0.5"


# ---------------------------------------------------------------------------
# Asset round trips
# ---------------------------------------------------------------------------


def _rich_asset() -> EffectAsset:
    w = ExprWriter()
    age = w.lit(0.0).expr()
    life = w.lit(5.0).uniform(w.lit(8.0)).expr()
    accel = w.lit((0.0, -3.0, 0.0)).expr()
    m = w.finish()
    m.add_property("strength", 2.5)
    s = m.prop("strength")
    m.unary(UnaryOp.ABS, s)
    slot = m.add_texture_slot("color_tex")
    g4 = Gradient([(0.0, (1.0, 1.0, 0.5, 1.0)), (1.0, (0.0, 0.0, 0.0, 0.0))])
    g3 = Gradient([(0.0, (1.0, 1.0, 1.0)), (0.5, (2.0, 2.0, 2.0)), (1.0, (0.1, 0.1, 0.1))])
    asset = (
        EffectAsset("rich", 4096, SpawnerSettings.burst(CpuValue.uniform(10.0, 20.0), 0.5), m)
        .init(SetAttributeModifier("age", age))
        .init(SetAttributeModifier("lifetime", life))
        .init(
            SetPositionSphereModifier(
                m.lit((0.0, 1.0, 0.0)), m.lit(1.5), ShapeDimension.VOLUME
            )
        )
        .update(AccelModifier(accel))
        .update(
            KillAabbModifier(
                m.lit((0.0, 0.0, 0.0)), m.lit((4.0, 4.0, 4.0)), kill_inside=False
            )
        )
        .update(
            EmitSpawnEventModifier(EventEmitCondition.ON_DIE, m.lit(4), 0)
        )
        .render(ColorOverLifetimeModifier(g4, ColorBlendMode.MODULATE, ColorBlendMask.RGB))
        .render(SizeOverLifetimeModifier(g3, screen_space_size=False))
        .render(ParticleTextureModifier(slot))
        .render(OrientModifier(OrientMode.FACE_CAMERA_POSITION))
        .render(FlipbookModifier((4, 2)))
        .render(RoundModifier(m.lit(0.75)))
    )
    asset.simulation_space = SimulationSpace.GLOBAL
    asset.simulation_condition = SimulationCondition.ALWAYS
    asset.motion_integration = MotionIntegration.PRE_UPDATE
    asset.alpha_mode = AlphaMode.mask(m.lit(0.25))
    asset.z_layer_2d = -2.0
    asset.prng_seed = 1234
    return asset


class TestAssetRoundTrip:
    def test_semantic_round_trip(self):
        asset = _rich_asset()
        back = asset_from_ron(asset_to_ron(asset))
        a, b = asset.to_json(), back.to_json()
        for field in (
            "name",
            "capacity",
            "spawner",
            "simulation_space",
            "simulation_condition",
            "motion_integration",
            "z_layer_2d",
            "prng_seed",
        ):
            assert a[field] == b[field], field
        # same modifier sequence with the same semantics
        for ctx in ("init_modifiers", "update_modifiers", "render_modifiers"):
            assert [m["type"] for m in a[ctx]] == [m["type"] for m in b[ctx]]
        # alpha mask preserved (handle may renumber, expression must agree)
        assert back.alpha_mode.kind == "mask"
        cut = back.module.get(back.alpha_mode.mask_cutoff)
        assert cut.kind == "literal" and float(cut.value.value) == 0.25
        # texture slot + layout preserved
        assert back.module.texture_slots() == ["color_tex"]
        assert back.render_modifiers[2].texture_slot == 0
        # blend/mask fields on color modifiers
        assert back.render_modifiers[0].blend is ColorBlendMode.MODULATE
        assert back.render_modifiers[0].mask == ColorBlendMask.RGB

    def test_round_trip_simulates_identically(self):
        """The reimported asset compiles and steps to the same trajectories
        (handles renumber under export, semantics must not)."""
        from bevy_hanabi_tpu.compiler import SimParams
        from bevy_hanabi_tpu.runtime import CompiledEffect, StepInputs

        w = ExprWriter()
        age = w.lit(0.0).expr()
        life = w.lit(2.0).expr()
        from bevy_hanabi_tpu.values import FLOAT, VectorType

        vel = w.rand(VectorType(FLOAT, 3)) * w.lit(2.0) - w.lit(1.0)
        m = w.finish()
        asset = (
            EffectAsset("sim", 512, SpawnerSettings.rate(100.0), m)
            .init(SetAttributeModifier("age", age))
            .init(SetAttributeModifier("lifetime", life))
            .init(SetAttributeModifier("velocity", vel.expr()))
            .init(SetAttributeModifier("position", w.lit((0.0, 0.0, 0.0)).expr()))
        )
        asset.prng_seed = 7
        back = asset_from_ron(asset_to_ron(asset))

        def run(a):
            fx = CompiledEffect(a)
            pool = fx.create_pool()
            for i in range(5):
                pool, _ = fx.step(
                    pool,
                    StepInputs.make(20, np.uint32(i)),
                    SimParams(time=i / 60.0, delta_time=1 / 60.0),
                )
            return np.asarray(pool.attrs["position"]), np.asarray(pool.alive)

        p0, a0 = run(asset)
        p1, a1 = run(back)
        assert np.array_equal(a0, a1)
        assert np.allclose(p0[a0], p1[a1])

    def test_all_alpha_modes(self):
        for mode in (
            AlphaMode.BLEND,
            AlphaMode.PREMULTIPLY,
            AlphaMode.ADD,
            AlphaMode.MULTIPLY,
            AlphaMode.OPAQUE,
        ):
            asset = EffectAsset("a", 16, SpawnerSettings.once(1.0), Module())
            asset.alpha_mode = mode
            back = asset_from_ron(asset_to_ron(asset))
            assert back.alpha_mode.kind == mode.kind

    def test_more_modifiers(self):
        m = Module()
        asset = (
            EffectAsset("x", 64, SpawnerSettings.once(8.0), m)
            .update(
                ConformToSphereModifier(
                    m.lit((0.0, 0.0, 0.0)),
                    m.lit(1.0),
                    m.lit(2.0),
                    m.lit(3.0),
                    m.lit(4.0),
                )
            )
            .render(SetColorModifier((1.0, 0.0, 0.0, 1.0)))
            .render(SetSizeModifier((0.1, 0.2, 0.3)))
            .render(ScreenSpaceSizeModifier())
            .init(InheritAttributeModifier("position"))
        )
        back = asset_from_ron(asset_to_ron(asset))
        cf = back.update_modifiers[0]
        assert cf.shell_half_thickness is None and cf.sticky_factor is None
        sc = back.render_modifiers[0]
        assert isinstance(sc.color, CpuValue) and tuple(np.asarray(sc.color.value)) == (1.0, 0.0, 0.0, 1.0)
        assert isinstance(back.render_modifiers[2], ScreenSpaceSizeModifier)
        assert back.init_modifiers[0].attribute == "position"

    def test_value_kinds(self):
        m = Module()
        m.lit(True)
        m.lit(np.int32(-5))
        m.lit(np.uint32(7))
        m.lit((1.0, 2.0))
        m.lit((1, 2, 3))  # ints -> ivec3? depends on as_value; just round trip
        asset = EffectAsset("v", 16, SpawnerSettings.once(1.0), m)
        back = asset_from_ron(asset_to_ron(asset))
        for i in range(1, len(m) + 1):
            ours, theirs = m.get(i), back.module.get(i)
            assert ours.kind == theirs.kind == "literal"
            assert ours.value.value_type == theirs.value.value_type
            ov, tv = ours.value, theirs.value
            if isinstance(ov, ScalarValue):
                assert ov.value == tv.value
            elif isinstance(ov, VectorValue):
                assert tuple(ov.values) == tuple(tv.values)

    def test_builtins_and_parent_attr(self):
        from bevy_hanabi_tpu.values import FLOAT, VectorType

        m = Module()
        m.time()
        m.delta_time()
        m.rand(VectorType(FLOAT, 3))
        m.builtin(BuiltInOp.IS_ALIVE)
        m.parent_attr("position")
        m.cast(m.lit(1.0), VectorType(FLOAT, 3))
        asset = EffectAsset("b", 16, SpawnerSettings.once(1.0), m)
        back = asset_from_ron(asset_to_ron(asset))
        kinds = [back.module.get(i).kind for i in range(1, len(back.module) + 1)]
        assert kinds[:5] == ["builtin"] * 4 + ["parent_attribute"]
        assert back.module.get(3).rand_type is not None
        assert back.module.get(7).kind == "cast"

    def test_save_load_autodetect(self, tmp_path):
        asset = _rich_asset()
        pj = tmp_path / "a.effect"
        pr = tmp_path / "a.ron"
        asset.save(str(pj))
        asset.save(str(pr))
        assert EffectAsset.load(str(pj)).name == "rich"
        assert EffectAsset.load(str(pr)).name == "rich"
        # .ron file really is RON
        assert pr.read_text().lstrip().startswith("(")
        assert pj.read_text().lstrip().startswith("{")


# ---------------------------------------------------------------------------
# Reference-format fixture (hand-written in the shape EffectAsset::serialize
# emits: serialize_struct field order asset.rs:727-748, ExprHandle "#N"
# strings, glam VectorValueEnum vectors, reflect type-path modifier maps)
# ---------------------------------------------------------------------------

REFERENCE_RON = """
(
  name: "Effect",
  capacity: 4096,
  spawner: (
    count: Single(30.0),
    spawn_duration: Single(1.0),
    period: Single(1.0),
    cycle_count: 0,
    starts_active: true,
    emit_on_start: true,
  ),
  z_layer_2d: 1.5,
  simulation_space: Local,
  simulation_condition: Always,
  prng_seed: 4284,
  init_modifiers: [
    {
      "bevy_hanabi::modifier::attr::SetAttributeModifier": (
        attribute: "position",
        value: "#1",
      ),
    },
  ],
  update_modifiers: [],
  render_modifiers: [
    {
      "bevy_hanabi::modifier::output::SetColorModifier": (
        color: Uniform(((0.0, 0.0, 0.0, 1.0), (1.0, 1.0, 1.0, 1.0))),
        blend: Overwrite,
        mask: (15),
      ),
    },
  ],
  motion_integration: PreUpdate,
  module: (
    expressions: [
      Literal(Vector(Vec3((1.2, -3.45, 87.54485)))),
      Literal(Vector(BVec2((false, true)))),
      Binary(
        op: Add,
        left: "#2",
        right: "#1",
      ),
      Property(1),
      Unary(
        op: Abs,
        expr: "#4",
      ),
    ],
    properties: [
      (
        name: "my_prop",
        default_value: Vector(Vec3((1.2, -2.3, 55.32))),
      ),
    ],
    texture_layout: (
      layout: [],
    ),
  ),
  alpha_mode: Multiply,
  mesh: None,
)
"""


class TestReferenceFixture:
    def test_loads(self):
        asset = asset_from_ron(REFERENCE_RON)
        assert asset.name == "Effect"
        assert asset.capacity == 4096
        assert asset.spawner.count.value == 30.0
        assert asset.z_layer_2d == 1.5
        assert asset.simulation_space is SimulationSpace.LOCAL
        assert asset.simulation_condition is SimulationCondition.ALWAYS
        assert asset.prng_seed == 4284
        assert asset.motion_integration is MotionIntegration.PRE_UPDATE
        assert asset.alpha_mode.kind == "multiply"
        # module contents
        m = asset.module
        assert len(m) == 5
        lit = m.get(1)
        assert lit.kind == "literal"
        assert np.allclose(tuple(lit.value.values), (1.2, -3.45, 87.54485))
        b2 = m.get(2)
        assert tuple(b2.value.values) == (False, True)
        add = m.get(3)
        assert add.kind == "binary" and add.args == (2, 1)
        prop = m.get(4)
        assert prop.kind == "property" and prop.name == "my_prop"
        assert m.get(5).kind == "unary"
        assert np.allclose(
            tuple(m.properties()["my_prop"].values), (1.2, -2.3, 55.32)
        )
        # modifiers
        assert asset.init_modifiers[0].attribute == "position"
        sc = asset.render_modifiers[0]
        assert sc.color.is_uniform
        assert tuple(np.asarray(sc.color.upper)) == (1.0, 1.0, 1.0, 1.0)
        assert sc.mask == ColorBlendMask.RGBA

    def test_reexport_reimports(self):
        asset = asset_from_ron(REFERENCE_RON)
        again = asset_from_ron(asset_to_ron(asset))
        assert again.to_json() == asset.to_json()

    def test_mesh_path_warns_and_ignores(self):
        text = REFERENCE_RON.replace(
            "mesh: None", 'mesh: Some("meshes/puff.glb#Mesh0")'
        )
        asset = asset_from_ron(text)
        assert asset.mesh is None

    def test_unknown_modifier_rejected(self):
        text = REFERENCE_RON.replace(
            "bevy_hanabi::modifier::attr::SetAttributeModifier",
            "bevy_hanabi::modifier::attr::MadeUpModifier",
        )
        with pytest.raises(RonError):
            asset_from_ron(text)


# ---------------------------------------------------------------------------
# Randomized round-trip fuzz: arbitrary assets over the full modifier and
# value surface must survive RON export -> import -> export unchanged.
# ---------------------------------------------------------------------------


class TestRonFuzz:
    @pytest.mark.parametrize("seed", range(8))
    def test_random_asset_round_trip(self, seed):
        rng = np.random.default_rng(seed)
        from bevy_hanabi_tpu.modifiers import (
            KillSphereModifier,
            LinearDragModifier,
            RadialAccelModifier,
            SetPositionCircleModifier,
            SetPositionCone3dModifier,
            SetVelocityCircleModifier,
            SetVelocitySphereModifier,
            SetVelocityTangentModifier,
            TangentAccelModifier,
        )
        from bevy_hanabi_tpu.values import FLOAT, VectorType

        m = Module()

        def lit_f():
            return m.lit(float(np.round(rng.uniform(-10, 10), 3)))

        def lit_v3():
            return m.lit(tuple(np.round(rng.uniform(-5, 5, 3), 3).tolist()))

        # random expression tangle (handles must survive renumbering)
        exprs = [lit_f(), lit_v3(), m.rand(VectorType(FLOAT, 3)), m.time()]
        for _ in range(int(rng.integers(2, 8))):
            kind = rng.integers(0, 3)
            if kind == 0:
                exprs.append(
                    m.unary(UnaryOp.ABS, exprs[int(rng.integers(len(exprs)))])
                )
            elif kind == 1:
                a = exprs[int(rng.integers(len(exprs)))]
                exprs.append(m.add(a, lit_f()))
            else:
                exprs.append(lit_v3())

        spawner = [
            SpawnerSettings.rate(float(rng.uniform(1, 500))),
            SpawnerSettings.once(CpuValue.uniform(1.0, 64.0)),
            SpawnerSettings.burst(16.0, float(np.round(rng.uniform(0.1, 2), 3))),
        ][seed % 3]
        asset = EffectAsset(f"fuzz{seed}", int(rng.integers(64, 8192)), spawner, m)

        inits = [
            lambda: SetAttributeModifier("age", m.lit(0.0)),
            lambda: SetPositionSphereModifier(
                lit_v3(), lit_f(), ShapeDimension.SURFACE
            ),
            lambda: SetPositionCircleModifier(
                lit_v3(), lit_v3(), lit_f(), ShapeDimension.VOLUME
            ),
            lambda: SetPositionCone3dModifier(lit_f(), lit_f(), lit_f()),
            lambda: SetVelocityCircleModifier(lit_v3(), lit_v3(), lit_f()),
            lambda: SetVelocitySphereModifier(lit_v3(), lit_f()),
            lambda: SetVelocityTangentModifier(lit_v3(), lit_v3(), lit_f()),
        ]
        updates = [
            lambda: AccelModifier(lit_v3()),
            lambda: RadialAccelModifier(lit_v3(), lit_f()),
            lambda: TangentAccelModifier(lit_v3(), lit_v3(), lit_f()),
            lambda: LinearDragModifier(lit_f()),
            lambda: KillSphereModifier(lit_v3(), lit_f(), bool(rng.integers(2))),
        ]
        renders = [
            lambda: SetColorModifier(
                tuple(np.round(rng.uniform(0, 1, 4), 3).tolist()),
                [ColorBlendMode.OVERWRITE, ColorBlendMode.ADD, ColorBlendMode.MODULATE][
                    int(rng.integers(3))
                ],
                [ColorBlendMask.RGBA, ColorBlendMask.RGB, ColorBlendMask.A][
                    int(rng.integers(3))
                ],
            ),
            lambda: SetSizeModifier(
                tuple(np.round(rng.uniform(0.01, 1, 3), 3).tolist())
            ),
            lambda: OrientModifier(
                list(OrientMode)[int(rng.integers(3))],
                None if rng.integers(2) else lit_f(),
            ),
            lambda: RoundModifier(lit_f()),
        ]
        for pool_ in (inits, updates, renders):
            picks = rng.permutation(len(pool_))[: int(rng.integers(1, len(pool_)))]
            for i in picks:
                mod = pool_[int(i)]()
                if pool_ is inits:
                    asset.init(mod)
                elif pool_ is updates:
                    asset.update(mod)
                else:
                    asset.render(mod)
        asset.z_layer_2d = float(np.round(rng.uniform(-4, 4), 3))
        asset.prng_seed = int(rng.integers(1, 2**31))

        once = asset_from_ron(asset_to_ron(asset))
        twice = asset_from_ron(asset_to_ron(once))
        # RON -> asset is a fixed point after one trip: exports agree exactly
        assert asset_to_ron(once) == asset_to_ron(twice)
        assert once.to_json() == twice.to_json()
        # and the first trip preserved everything except handle numbering
        a, b = asset.to_json(), once.to_json()
        for field in ("name", "capacity", "spawner", "z_layer_2d", "prng_seed"):
            assert a[field] == b[field], field
        for ctx in ("init_modifiers", "update_modifiers", "render_modifiers"):
            assert [x["type"] for x in a[ctx]] == [x["type"] for x in b[ctx]]


# ---------------------------------------------------------------------------
# Every re-created reference example round-trips through the RON format —
# the interop must cover the full breadth of real effect definitions
# (events, ribbons, textures, LOCAL space, masks, properties, meshes).
# ---------------------------------------------------------------------------


def _example_assets():
    from bevy_hanabi_tpu.models.examples import examples_registry

    for name, builder in sorted(examples_registry().items()):
        built = builder()
        if isinstance(built, dict):
            for sub, asset in built.items():
                yield f"{name}/{sub}", asset
        else:
            yield name, built


@pytest.mark.parametrize(
    "name,asset", list(_example_assets()), ids=lambda v: v if isinstance(v, str) else ""
)
def test_example_round_trips_through_ron(name, asset):
    if not isinstance(asset, EffectAsset):
        pytest.skip(f"{name} is not an EffectAsset")
    from bevy_hanabi_tpu.ron import _MOD_FIELDS

    custom = [
        type(m).__name__
        for m in asset.init_modifiers + asset.update_modifiers + asset.render_modifiers
        if type(m).__name__ not in _MOD_FIELDS
    ]
    if custom:
        # user-defined modifiers have no reference type path by definition —
        # the exporter must say so loudly (JSON serde still covers them)
        with pytest.raises(RonError, match="no reference RON counterpart"):
            asset_to_ron(asset)
        return
    once = asset_from_ron(asset_to_ron(asset))
    twice = asset_from_ron(asset_to_ron(once))
    assert asset_to_ron(once) == asset_to_ron(twice)
    a, b = asset.to_json(), once.to_json()
    for field in (
        "name",
        "capacity",
        "spawner",
        "simulation_space",
        "simulation_condition",
        "motion_integration",
        "z_layer_2d",
    ):
        assert a[field] == b[field], (name, field)
    for ctx in ("init_modifiers", "update_modifiers", "render_modifiers"):
        assert [m["type"] for m in a[ctx]] == [m["type"] for m in b[ctx]], (
            name,
            ctx,
        )
    assert a["alpha_mode"]["kind"] == b["alpha_mode"]["kind"], name
    # same attribute layout -> identical compiled pool structure
    assert (
        asset.particle_layout().signature()
        == once.particle_layout().signature()
    ), name


# ---------------------------------------------------------------------------
# Committed golden corpus (VERDICT r3 item 7b): every exported example
# `.effect` file is committed under tests/goldens/ and must keep parsing AND
# re-exporting byte-identically — a serde dialect drift (float formats,
# implicit Some, map ordering) breaks these before it can break real files.
# Regenerate deliberately after an intentional format/example change:
#   python -c "see tests/goldens generation in git history"
# ---------------------------------------------------------------------------

_GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def _golden_files():
    return sorted(
        f for f in os.listdir(_GOLDEN_DIR) if f.endswith(".effect")
    )


def test_golden_corpus_exists():
    assert len(_golden_files()) >= 20


@pytest.mark.parametrize("fname", _golden_files())
def test_golden_effect_file_stable(fname):
    with open(os.path.join(_GOLDEN_DIR, fname)) as f:
        text = f.read()
    asset = asset_from_ron(text)
    assert asset_to_ron(asset) == text, (
        f"{fname}: export drifted from the committed golden — if the "
        "format change is intentional, regenerate tests/goldens/"
    )


@pytest.mark.parametrize("fname", _golden_files())
def test_golden_matches_fresh_example(fname):
    """The freshly-built example still exports to the committed bytes —
    catches silent example-definition drift too."""
    from bevy_hanabi_tpu.models.examples import examples_registry

    stem = fname[: -len(".effect")]
    name, _, sub = stem.partition("__")
    built = examples_registry()[name]()
    asset = built[sub] if sub else built
    with open(os.path.join(_GOLDEN_DIR, fname)) as f:
        assert asset_to_ron(asset) == f.read()


# ---------------------------------------------------------------------------
# Mirror of the reference's own serde round-trip test (asset.rs:1303
# `serde_asset`): the same unusual knob values — Local space, Always
# condition, prng_seed 4284, PreUpdate integration, Multiply alpha,
# z_layer_2d 1.5 — and the same field-level equality assertions.
# ---------------------------------------------------------------------------


def test_serde_asset_mirror():
    import numpy as np

    from bevy_hanabi_tpu import attributes as A
    from bevy_hanabi_tpu.asset import (
        AlphaMode,
        MotionIntegration,
        SimulationCondition,
        SimulationSpace,
    )
    from bevy_hanabi_tpu.graph import ExprWriter
    from bevy_hanabi_tpu.modifiers import SetAttributeModifier
    from bevy_hanabi_tpu.spawn import SpawnerSettings

    w = ExprWriter()
    pos = w.lit((1.2, -3.45, 87.54485))
    mod_pos = SetAttributeModifier(A.POSITION, pos.expr())
    module = w.finish()
    prop = module.add_property("my_prop", np.asarray(
        [1.2, -2.3, 55.32], np.float32))
    module.unary(UnaryOp.ABS, module.prop("my_prop"))

    effect = EffectAsset("Effect", 4096, SpawnerSettings.rate(30.0), module)
    effect.z_layer_2d = 1.5
    effect.simulation_space = SimulationSpace.LOCAL
    effect.simulation_condition = SimulationCondition.ALWAYS
    effect.prng_seed = 4284
    effect.motion_integration = MotionIntegration.PRE_UPDATE
    effect.alpha_mode = AlphaMode.MULTIPLY
    effect.init(mod_pos)

    s = asset_to_ron(effect)
    effect_serde = asset_from_ron(s)

    assert effect.name == effect_serde.name
    assert effect.capacity == effect_serde.capacity
    assert effect.spawner.to_json() == effect_serde.spawner.to_json()
    assert effect.z_layer_2d == effect_serde.z_layer_2d
    assert effect.simulation_space is effect_serde.simulation_space
    assert effect.simulation_condition is effect_serde.simulation_condition
    assert effect.prng_seed == effect_serde.prng_seed
    assert effect.motion_integration is effect_serde.motion_integration
    assert effect.alpha_mode.kind == effect_serde.alpha_mode.kind
    assert len(effect.init_modifiers) == len(effect_serde.init_modifiers)
    assert len(effect.update_modifiers) == len(effect_serde.update_modifiers)
    assert len(effect.render_modifiers) == len(effect_serde.render_modifiers)
    # the property survives with its exact default value
    props = effect_serde.module.properties()
    assert "my_prop" in props
    val = props["my_prop"]
    val = np.asarray(getattr(val, "values", val), np.float32)
    np.testing.assert_array_equal(
        val, np.asarray([1.2, -2.3, 55.32], np.float32)
    )
    # export is a fixed point after one trip
    assert asset_to_ron(effect_serde) == asset_to_ron(
        asset_from_ron(asset_to_ron(effect_serde))
    )

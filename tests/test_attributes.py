import numpy as np
import pytest

from bevy_hanabi_tpu import attributes as A
from bevy_hanabi_tpu.attributes import Attribute, ParticleLayout


def test_registry_has_all_39():
    assert len(Attribute.all()) == 39
    names = {a.name for a in Attribute.all()}
    for n in [
        "id", "particle_counter", "position", "velocity", "age", "lifetime",
        "color", "hdr_color", "alpha", "size", "size2", "size3", "prev",
        "next", "axis_x", "axis_y", "axis_z", "sprite_index", "ribbon_id",
    ]:
        assert n in names
    for base in ["f32", "u32"]:
        for i in range(4):
            assert f"{base}_{i}" in names
    for k in [2, 3, 4]:
        for i in range(4):
            assert f"f32x{k}_{i}" in names


def test_defaults_match_reference():
    # reference: attributes.rs:551-676
    assert A.LIFETIME.default.value == 1.0
    assert A.COLOR.default.value == 0xFFFFFFFF
    assert A.PREV.default.value == 0xFFFFFFFF
    np.testing.assert_array_equal(A.AXIS_Y.default_numpy(), [0, 1, 0])
    np.testing.assert_array_equal(A.HDR_COLOR.default_numpy(), [1, 1, 1, 1])
    assert A.SIZE.default.value == 1.0
    np.testing.assert_array_equal(A.SIZE3.default_numpy(), [1, 1, 1])


def test_from_name():
    assert Attribute.from_name("position") is A.POSITION
    with pytest.raises(KeyError):
        Attribute.from_name("nope")


def test_class_constants():
    assert Attribute.POSITION is A.POSITION
    assert Attribute.RIBBON_ID is A.RIBBON_ID


def test_layout_dedupes_and_keeps_order():
    layout = ParticleLayout([A.POSITION, A.AGE, A.POSITION, A.LIFETIME])
    assert [a.name for a in layout] == ["position", "age", "lifetime"]
    assert layout.contains("age")
    assert not layout.contains(A.COLOR)


def test_layout_builder():
    layout = ParticleLayout.new().append(A.POSITION).append("age").build()
    assert [a.name for a in layout] == ["position", "age"]


def test_default_layout():
    layout = ParticleLayout.default()
    assert [a.name for a in layout] == ["position", "velocity", "age", "lifetime"]
    # pack: vec3+f32 row, vec3+f32 row = 32 bytes
    assert layout.min_binding_size() == 32
    assert layout.byte_offset(A.POSITION) == 0
    assert layout.byte_offset(A.AGE) == 12  # paired into position row


def test_packing_pairs_vec3_with_f32():
    layout = ParticleLayout([A.POSITION, A.AGE])
    assert layout.min_binding_size() == 16
    assert layout.byte_offset(A.POSITION) == 0
    assert layout.byte_offset(A.AGE) == 12


def test_packing_vec3_alone_pads():
    layout = ParticleLayout([A.POSITION])
    assert layout.min_binding_size() == 16


def test_packing_pairs_vec2s():
    layout = ParticleLayout([A.SIZE2, A.F32X2_0])
    assert layout.min_binding_size() == 16
    assert layout.byte_offset(A.SIZE2) == 0
    assert layout.byte_offset(A.F32X2_0) == 8


def test_packing_vec4_first():
    layout = ParticleLayout([A.AGE, A.HDR_COLOR, A.POSITION])
    assert layout.byte_offset(A.HDR_COLOR) == 0
    assert layout.byte_offset(A.POSITION) == 16
    assert layout.byte_offset(A.AGE) == 28
    assert layout.min_binding_size() == 32


def test_packing_scalar_tail_pads_to_layout_align():
    # scalar-only layouts align to 4 like the reference
    # (attributes.rs:1648 pads to the layout align, not a blanket 16)
    layout = ParticleLayout([A.AGE, A.LIFETIME, A.SIZE])
    assert layout.min_binding_size() == 12
    assert ParticleLayout([A.AGE, A.LIFETIME]).min_binding_size() == 8
    # a vec3 in the layout forces 16-byte alignment
    assert ParticleLayout([A.POSITION, A.AGE]).min_binding_size() == 16


def test_layout_empty():
    assert ParticleLayout.empty().min_binding_size() == 0
    assert len(ParticleLayout.empty()) == 0


def test_pseudo_attr_id_has_no_storage():
    layout = ParticleLayout([A.ID, A.POSITION, A.AGE])
    assert layout.contains("id")
    assert layout.byte_offset("id") is None
    assert layout.min_binding_size() == 16


def test_layout_json_roundtrip():
    layout = ParticleLayout([A.POSITION, A.VELOCITY, A.RIBBON_ID])
    assert ParticleLayout.from_json(layout.to_json()) == layout


def test_struct_code_generation():
    code = ParticleLayout([A.POSITION, A.AGE]).generate_struct_code()
    assert "float position[3];" in code
    assert "float age;" in code


def test_layout_signature_is_order_insensitive():
    a = ParticleLayout([A.POSITION, A.AGE])
    b = ParticleLayout([A.AGE, A.POSITION])
    assert a.signature() == b.signature()

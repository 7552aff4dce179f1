import numpy as np
import pytest

from bevy_hanabi_tpu.values import (
    BOOL,
    FLOAT,
    INT,
    UINT,
    VEC2F,
    VEC3F,
    VEC4F,
    MatrixType,
    MatrixValue,
    ScalarType,
    ScalarValue,
    VectorType,
    VectorValue,
    as_value,
    splat,
    value_type_from_str,
    value_type_to_str,
)


def test_scalar_sizes_and_aligns():
    for st in ScalarType:
        assert st.size == 4
        assert st.align == 4


def test_vector_sizes_and_aligns():
    assert VEC2F.size == 8 and VEC2F.align == 8
    assert VEC3F.size == 12 and VEC3F.align == 16
    assert VEC4F.size == 16 and VEC4F.align == 16


def test_matrix_size_follows_column_padding():
    # mat3x3: 3 columns of vec3, each padded to 16 bytes.
    m = MatrixType(rows=3, cols=3)
    assert m.align == 16
    assert m.size == 48
    m44 = MatrixType(rows=4, cols=4)
    assert m44.size == 64
    m22 = MatrixType(rows=2, cols=2)
    assert m22.size == 16 and m22.align == 8


def test_scalar_value_bytes():
    assert ScalarValue(FLOAT, 1.0).as_bytes() == b"\x00\x00\x80\x3f"
    assert ScalarValue(UINT, 0xFFFFFFFF).as_bytes() == b"\xff\xff\xff\xff"
    assert ScalarValue(INT, -1).as_bytes() == b"\xff\xff\xff\xff"
    assert ScalarValue(BOOL, True).as_bytes() == b"\x01\x00\x00\x00"


def test_vector_value_roundtrip():
    v = VectorValue(VEC3F, (1.0, 2.0, 3.0))
    assert v.as_bytes() == np.asarray([1, 2, 3], np.float32).tobytes()
    np.testing.assert_array_equal(v.to_numpy(), np.asarray([1, 2, 3], np.float32))


def test_matrix_value_column_major_padded():
    m = MatrixValue(
        MatrixType(rows=3, cols=2), ((1.0, 2.0, 3.0), (4.0, 5.0, 6.0))
    )
    raw = m.as_bytes()
    assert len(raw) == 32  # two 16-byte padded vec3 columns
    col0 = np.frombuffer(raw[:12], np.float32)
    col1 = np.frombuffer(raw[16:28], np.float32)
    np.testing.assert_array_equal(col0, [1, 2, 3])
    np.testing.assert_array_equal(col1, [4, 5, 6])
    assert m.to_numpy().shape == (3, 2)


def test_as_value_inference():
    assert as_value(1.5) == ScalarValue(FLOAT, 1.5)
    assert as_value(3) == ScalarValue(INT, 3)
    assert as_value(True) == ScalarValue(BOOL, True)
    assert as_value((1.0, 2.0)) == VectorValue(VEC2F, (1.0, 2.0))
    v = as_value((1, 2, 3))
    assert v.value_type == VectorType(INT, 3)
    v = as_value(np.asarray([0.0, 1.0, 2.0, 3.0], np.float32))
    assert v.value_type == VEC4F


def test_as_value_with_explicit_type():
    v = as_value(2, UINT)
    assert v == ScalarValue(UINT, 2)
    v = as_value((1, 2), VEC2F)
    assert v == VectorValue(VEC2F, (1.0, 2.0))


def test_splat():
    assert splat(VEC3F, 2.0) == VectorValue(VEC3F, (2.0, 2.0, 2.0))
    assert splat(FLOAT, 1.0) == ScalarValue(FLOAT, 1.0)


def test_value_type_str_roundtrip():
    for vt in [FLOAT, INT, UINT, BOOL, VEC2F, VEC3F, VEC4F,
               VectorType(INT, 3), MatrixType(rows=4, cols=4)]:
        assert value_type_from_str(value_type_to_str(vt)) == vt


def test_bad_vector_count():
    with pytest.raises(ValueError):
        VectorType(FLOAT, 5)
    with pytest.raises(ValueError):
        as_value((1.0,) * 5)

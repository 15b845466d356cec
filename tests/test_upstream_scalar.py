"""Behavioral port of the upstream grblas scalar test corpus slice
(/root/reference/tests/from_grblas2/test_scalar.py) — fresh code against
this engine's API asserting the upstream expected results.
"""

import pytest

import dask_grblas_spark as gb
from dask_grblas_spark import binary


@pytest.fixture
def s(spark):
    return gb.Scalar.from_value(5)


def test_new(spark):
    s = gb.Scalar.new("INT8")
    assert s.dtype.name == "INT8"
    assert s.value is None
    assert s.is_empty


def test_dup(s):
    s2 = s.dup()
    assert s2.dtype == s.dtype
    assert s2.value == s.value
    s4 = gb.Scalar.from_value(-2.5, dtype="FP64")
    for dtype, val in [("INT8", -2), ("INT16", -2), ("INT32", -2),
                       ("FP32", -2.5)]:
        s5 = s4.dup(dtype=dtype)
        assert s5.dtype.name == dtype and s5.value == val
    s_empty = gb.Scalar.new("FP64")
    assert s_empty.dup(dtype="INT8").is_empty


def test_from_value(spark):
    s = gb.Scalar.from_value(False)
    assert s.dtype.name == "BOOL"
    assert s.value is False
    s2 = gb.Scalar.from_value(-1.1)
    assert s2.dtype.name == "FP64"
    assert s2.value == -1.1
    s3 = gb.Scalar.from_value(s2, dtype="INT64")
    assert s3.dtype.name == "INT64"
    assert s3.value == -1  # cast truncates


def test_clear(s):
    assert s.value == 5
    assert not s.is_empty
    s.clear()
    assert s.value is None
    assert s.is_empty


def test_equal(s):
    assert s.value == 5
    assert s == 5
    assert s != 27


def test_casting(s):
    assert int(s) == 5 and type(int(s)) is int
    assert float(s) == 5.0 and type(float(s)) is float


def test_truthy(s):
    assert s
    assert gb.Scalar.from_value(True)
    assert not gb.Scalar.from_value(0)
    assert not gb.Scalar.new("INT64")


def test_set_value(s):
    assert s.value == 5
    s.value = 12
    assert s.value == 12


def test_isequal_isclose(s):
    assert s.isequal(gb.Scalar.from_value(5)).value
    t = gb.Scalar.from_value(5, dtype="INT8")
    assert s.isequal(t).value
    assert not s.isequal(t, check_dtype=True).value
    f = gb.Scalar.from_value(5.0)
    assert f.isclose(gb.Scalar.from_value(5.000000001)).value
    assert not f.isclose(gb.Scalar.from_value(5.000000001),
                         rel_tol=1e-10).value
    assert not f.isclose(gb.Scalar.from_value(6.0)).value


def test_nvals(s):
    assert s.nvals == 1
    s.clear()
    assert s.nvals == 0


def test_neg(spark):
    for dtype in ("INT64", "FP64"):
        one = gb.Scalar.from_value(1, dtype=dtype)
        assert (-one).value == -1
    empty = gb.Scalar.new("INT64")
    assert (-empty).value is None


def test_invert(spark):
    assert (~gb.Scalar.from_value(True)).value is False
    assert (~gb.Scalar.from_value(False)).value is True
    with pytest.raises(TypeError):
        ~gb.Scalar.from_value(1)


def test_scalar_update_and_accum(s):
    s << 1
    assert s.value == 1
    s << gb.Scalar.from_value(2)
    assert s.value == 2
    s(accum=binary.plus) << gb.Scalar.from_value(3)
    assert s.value == 5

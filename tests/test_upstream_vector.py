"""Behavioral port of the upstream grblas vector test corpus slice.

The reference runs the whole grblas test suite against its dask engine
(/root/reference/tests/from_grblas2/test_vector.py, with the XFAIL dict
in copytests.py:6-100). This module re-derives the same canonical
fixtures (v = [1,1,2,0] at [1,3,4,6] size 7; A = the 7x7 12-entry grblas
matrix) and asserts the same RESULTS through this engine's API — the
code is written fresh against dask_grblas_spark, only the expected
values are shared with upstream (they are the spec).

Unsupported-surface cases are marked xfail/skip with reasons, mirroring
the reference's copytests.py approach.
"""

import numpy as np
import pytest

import dask_grblas_spark as gb
from dask_grblas_spark import agg, binary, monoid, semiring, unary

# canonical grblas fixtures (test_vector.py:26-44)
A_ROWS = [3, 0, 3, 5, 6, 0, 6, 1, 6, 2, 4, 1]
A_COLS = [0, 1, 2, 2, 2, 3, 3, 4, 4, 5, 5, 6]
A_VALS = [3, 2, 3, 1, 5, 3, 7, 8, 3, 1, 7, 4]


@pytest.fixture
def v(spark):
    return gb.Vector.from_values([1, 3, 4, 6], [1, 1, 2, 0])


@pytest.fixture
def A(spark):
    return gb.Matrix.from_values(A_ROWS, A_COLS, A_VALS)


def _vec(idx, vals, size=None, dtype=None):
    return gb.Vector.from_values(idx, vals, size=size, dtype=dtype)


def test_new(spark):
    u = gb.Vector.new("INT8", 17)
    assert u.dtype.name == "INT8"
    assert u.nvals == 0
    assert u.size == 17


def test_dup(v):
    u = v.dup()
    assert u is not v
    assert u.dtype == v.dtype
    assert u.nvals == v.nvals
    assert u.size == v.size
    # modifying the dup must not touch the original
    u[0] = 1000
    assert u[0].new().value == 1000
    assert v[0].new().value is None
    # dup with cast
    u2 = v.dup(dtype="FP64")
    assert u2.dtype.name == "FP64"
    assert u2.isclose(_vec([1, 3, 4, 6], [1.0, 1.0, 2.0, 0.0]),
                      check_dtype=True).value


def test_from_values_shapes(spark):
    u = gb.Vector.from_values([0, 1, 3], [True, False, True])
    assert u.size == 4
    assert u.dtype.name == "BOOL"
    u2 = gb.Vector.from_values([0, 1, 3], [12.3, 12.4, 12.5], size=17)
    assert u2.size == 17
    assert u2.dtype.name == "FP64"
    # dup_op combines duplicate indices
    u3 = gb.Vector.from_values([0, 1, 1], [1, 2, 3], dup_op=binary.plus)
    assert u3.to_dict() == {0: 1, 1: 5}
    with pytest.raises(Exception):
        gb.Vector.from_values([], [])  # cannot infer size/dtype


def test_clear(v):
    v.clear()
    assert v.nvals == 0
    assert v.size == 7


def test_resize(v):
    assert v.size == 7
    assert v.nvals == 4
    v.resize(20)
    assert v.size == 20
    assert v.nvals == 4
    v.resize(4)
    assert v.size == 4
    assert v.nvals == 2  # entries at 4 and 6 dropped


def test_size_nvals(v):
    assert v.size == 7
    assert v.nvals == 4


def test_build(v):
    assert v.nvals == 4
    v.clear()
    v.build([0, 6], [1, 2])
    assert v.nvals == 2
    with pytest.raises(gb.OutputNotEmpty):
        v.build([1, 5], [3, 4])
    assert v.nvals == 2  # unchanged
    with pytest.raises(gb.IndexOutOfBound):
        w = gb.Vector.new("INT64", 3)
        w.build([0, 11], [1, 1])


def test_extract_values(v):
    idx, vals = v.to_values()
    np.testing.assert_array_equal(idx, (1, 3, 4, 6))
    np.testing.assert_array_equal(vals, (1, 1, 2, 0))
    idx, vals = v.to_values(dtype="int64")
    assert vals.dtype == np.int64


def test_extract_element(v):
    assert v[1].new().value == 1
    assert v[6].new().value == 0
    with pytest.raises(IndexError):
        v[100]


def test_set_element(v):
    assert v[0].new().value is None
    assert v[1].new().value == 1
    v[0] = 12
    v[1] << 9
    assert v[0].new().value == 12
    assert v[1].new().value == 9


def test_remove_element(v):
    assert v[1].new().value == 1
    del v[1]
    assert v[1].new().value is None
    assert v[4].new().value == 2


def test_vxm(v, A):
    w = v.vxm(A, semiring.plus_times).new()
    assert w.isequal(_vec([0, 2, 3, 4, 5, 6], [3, 3, 0, 8, 14, 4])).value


def test_vxm_transpose(v, A):
    w = v.vxm(A.T, semiring.plus_times).new()
    assert w.isequal(_vec([0, 1, 6], [5, 16, 13])).value


def test_vxm_nonsquare(v):
    B = gb.Matrix.from_values([0, 3], [0, 1], [10, 20], nrows=7, ncols=2)
    w1 = v.vxm(B, semiring.min_plus).new()
    assert w1.isequal(_vec([1], [21], size=2)).value
    v2 = _vec([0, 1], [1, 2])
    w2 = v2.vxm(B.T, semiring.min_plus).new()
    assert w2.size == 7


def test_vxm_mask(v, A):
    val_mask = _vec([0, 1, 2, 3, 4], [True, False, False, True, True], size=7)
    struct_mask = _vec([0, 3, 4], [False, False, False], size=7)
    u = v.dup()
    u(mask=struct_mask.S) << v.vxm(A, semiring.plus_times)
    assert u.isequal(_vec([0, 1, 3, 4, 6], [3, 1, 0, 8, 0], size=7)).value
    u = v.dup()
    u(mask=~struct_mask.S) << v.vxm(A, semiring.plus_times)
    assert u.isequal(_vec([2, 3, 4, 5, 6], [3, 1, 2, 14, 4], size=7)).value
    u = v.dup()
    u(replace=True, mask=val_mask.V) << v.vxm(A, semiring.plus_times)
    result3 = _vec([0, 3, 4], [3, 0, 8], size=7)
    assert u.isequal(result3).value
    w = v.vxm(A, semiring.plus_times).new(mask=val_mask.V)
    assert w.isequal(result3).value


def test_vxm_accum(v, A):
    w1 = v.dup()
    w1(accum=binary.plus) << v.vxm(A, semiring.plus_times)
    result = _vec([0, 1, 2, 3, 4, 5, 6], [3, 1, 3, 1, 10, 14, 4], size=7)
    assert w1.isequal(result).value
    # monoids allowed as accum
    w2 = v.dup()
    w2(accum=monoid.plus) << v.vxm(A, semiring.plus_times)
    assert w2.isequal(result).value


def test_ewise_mult(v):
    v2 = _vec([0, 3, 5, 6], [2, 3, 2, 1])
    result = _vec([3, 6], [3, 0])
    w = v.ewise_mult(v2, binary.times).new()
    assert w.isequal(result).value
    w = v.ewise_mult(v2, monoid.times).new()
    assert w.isequal(result).value


def test_ewise_mult_change_dtype(v):
    v2 = _vec([1, 3, 4, 6], [2, 2, 2, 2])
    assert v.dtype.name == "INT64"
    # float division via truediv
    w = v.ewise_mult(v2, binary.truediv).new()
    assert w.isclose(_vec([1, 3, 4, 6], [0.5, 0.5, 1.0, 0.0],
                          dtype="FP64")).value
    # comparison op gives BOOL
    w3 = v.ewise_mult(v2, binary.lt).new()
    assert w3.isequal(_vec([1, 3, 4, 6], [True, True, False, True])).value


def test_ewise_add(v):
    v2 = _vec([0, 3, 5, 6], [2, 3, 2, 1])
    result = _vec([0, 1, 3, 4, 5, 6], [2, 1, 3, 2, 2, 1])
    w = v.ewise_add(v2, binary.max).new()
    assert w.isequal(result).value
    w = v.ewise_add(v2, monoid.max).new()
    assert w.isequal(result).value


def test_extract(v):
    result = _vec([0, 1], [1, 1], size=3)
    w = v[[1, 3, 5]].new()
    assert w.isequal(result).value
    w2 = v[1::2].new()
    assert w2.isequal(result).value


def test_extract_array(v):
    w = v[np.array([1, 3, 5])].new()
    assert w.isequal(_vec(np.array([0, 1]), np.array([1, 1]), size=3)).value


def test_extract_fancy_scalars(v):
    s = v[1].new()
    assert s.value == 1
    assert s.dtype.name == "INT64"
    s2 = v[1].new(dtype=float)
    assert s2.value == 1.0
    assert s2.dtype.name == "FP64"


def test_extract_negative_indices(v):
    assert v[-1].new().value == 0
    assert v[-v.size].new().value is None
    w = v[[-1, -3]].new()
    assert w.isequal(_vec([0, 1], [0, 2])).value
    with pytest.raises(IndexError):
        v[-v.size - 1]


def test_assign(v):
    u = _vec([0, 2], [9, 8])
    result = _vec([0, 1, 3, 4, 6], [9, 1, 1, 8, 0])
    w = v.dup()
    w[[0, 2, 4]] = u
    assert w.isequal(result).value
    w = v.dup()
    w[:5:2] << u
    assert w.isequal(result).value


def test_assign_scalar(v):
    result = _vec([1, 3, 4, 5, 6], [9, 9, 2, 9, 0])
    w = v.dup()
    w[[1, 3, 5]] = 9
    assert w.isequal(result).value
    w = v.dup()
    w[1::2] = 9
    assert w.isequal(result).value
    w = _vec([0, 1, 2], [1, 1, 1])
    s = gb.Scalar.from_value(9)
    w[0] = s
    assert w.isequal(_vec([0, 1, 2], [9, 1, 1])).value
    w[:] = s
    assert w.isequal(_vec([0, 1, 2], [9, 9, 9])).value


def test_assign_scalar_mask(v):
    mask = _vec([1, 2, 5, 6], [0, 0, 1, 0])
    w = v.dup()
    w(mask=mask.V) << 5
    assert w.isequal(_vec([1, 3, 4, 5, 6], [1, 1, 2, 5, 0])).value
    w = v.dup()
    w(mask=~mask.V) << 5
    assert w.isequal(_vec([0, 1, 2, 3, 4, 6], [5, 5, 5, 5, 5, 5])).value
    w = v.dup()
    w(mask=mask.S) << 5
    assert w.isequal(_vec([1, 2, 3, 4, 5, 6], [5, 5, 1, 2, 5, 5])).value
    w = v.dup()
    w(mask=~mask.S) << 5
    assert w.isequal(_vec([0, 1, 3, 4, 6], [5, 1, 5, 5, 0])).value


def test_subassign(spark):
    u = _vec([0, 1, 2], [0, 1, 2])
    w = _vec([0, 1], [10, 20])
    m = _vec([1], [True])
    u[[0, 1]](mask=m.S) << w
    assert u.isequal(_vec([0, 1, 2], [0, 20, 2])).value


def test_apply(v):
    w = v.apply(unary.ainv).new()
    assert w.isequal(_vec([1, 3, 4, 6], [-1, -1, -2, 0])).value


def test_apply_binary(v):
    result_right = _vec([1, 3, 4, 6], [False, False, True, False])
    assert v.apply(binary.gt, right=1).new().isequal(result_right).value
    assert v.apply(binary.gt,
                   right=gb.Scalar.from_value(1)).new() \
            .isequal(result_right).value
    result_left = _vec([1, 3, 4, 6], [1, 1, 0, 2])
    assert v.apply(binary.minus, left=2).new().isequal(result_left).value
    assert v.apply(binary.minus,
                   left=gb.Scalar.from_value(2)).new() \
            .isequal(result_left).value
    # monoids accepted
    w1 = v.apply(binary.plus, left=1).new()
    w2 = v.apply(monoid.plus, left=1).new()
    assert w1.isequal(w2).value


def test_reduce(v):
    s = v.reduce(monoid.plus).new()
    assert s.value == 4
    assert s.dtype.name == "INT64"
    # accum into the result scalar
    s(accum=binary.times) << v.reduce(monoid.plus)
    assert s.value == 16


def test_reduce_agg(v):
    assert v.reduce(agg.sum).new().value == 4
    assert v.reduce(agg.count).new().value == 4
    assert v.reduce(agg.mean).new().value == 1.0
    assert v.reduce(agg.argmin).new().value == 6  # value 0 at index 6
    assert v.reduce(agg.argmax).new().value == 4  # value 2 at index 4


def test_reduce_agg_empty(spark):
    u = gb.Vector.new("FP64", 10)
    s = u.reduce(agg.sum).new()
    assert s.value is None


def test_reduce_coerce_dtype(v):
    assert v.reduce(monoid.plus).new(dtype=float).value == 4.0


def test_simple_assignment(v):
    w = gb.Vector.new(v.dtype, v.size)
    w << v
    assert w.isequal(v).value


def test_isequal(v):
    assert v.isequal(v).value
    u = _vec([1], [1])
    assert not u.isequal(v).value
    u2 = _vec([1], [1], size=7)
    assert not u2.isequal(v).value
    u3 = _vec([1, 3, 4, 6], [1.0, 1.0, 2.0, 0.0])
    assert not u3.isequal(v, check_dtype=True).value, "different dtypes"
    u4 = _vec([1, 3, 4, 6], [1.0, 1 + 1e-9, 1.999999999999, 0.0])
    assert not u4.isequal(v).value
    u5 = _vec([1, 3, 4, 5], [1.0, 1.0, 2.0, 3], size=7)
    assert not u5.isequal(v).value


def test_isclose(v):
    assert v.isclose(v).value
    u = _vec([1], [1])  # wrong size
    assert not u.isclose(v).value
    u2 = _vec([1], [1], size=7)  # missing values
    assert not u2.isclose(v).value
    u3 = _vec([1, 2, 3, 4, 6], [1.0, 1.0, 1.0, 2.0, 0.0], size=7)
    assert not u3.isclose(v).value  # extra values
    u4 = _vec([1, 3, 4, 6], [1.0, 1.0, 2.0, 0.0])
    assert not u4.isclose(v, check_dtype=True).value, "different dtypes"
    u5 = _vec([1, 3, 4, 6], [1.0, 1 + 1e-9, 1.999999999999, 0.0])
    assert u5.isclose(v).value
    u6 = _vec([1, 3, 4, 6], [1.0, 1 + 1e-4, 1.99999, 0.0])
    assert u6.isclose(v, rel_tol=1e-3).value


def test_binary_op(v):
    v2 = _vec([1, 3, 5, 6], [2, 2, 1, 0])
    w = v.ewise_mult(v2, binary.gt).new()
    assert w.dtype.name == "BOOL"
    assert w.isequal(_vec([1, 3, 6], [False, False, False])).value


def test_incompatible_shapes(A, v):
    u = v[:-1].new()
    with pytest.raises(gb.DimensionMismatch):
        A.mxv(u)
    with pytest.raises(gb.DimensionMismatch):
        u.vxm(A)
    with pytest.raises(gb.DimensionMismatch):
        u.ewise_add(v)
    with pytest.raises(gb.DimensionMismatch):
        u.ewise_mult(v)


def test_contains(v):
    assert 1 in v
    assert 2 not in v
    assert 6 in v  # explicit zero is stored
    assert 0 not in v


def test_iter(v):
    assert sorted(v) == [1, 3, 4, 6]


def test_not_to_array(v):
    with pytest.raises(TypeError):
        np.array(v)


@pytest.mark.skip(reason="GrB import/export C-interop surface is out of "
                         "scope for a Spark-backed engine (copytests.py "
                         "pattern: documented fence)")
def test_import_export():
    pass


@pytest.mark.skip(reason="pickle of a live SparkSession-backed collection "
                         "is not supported; persist via parquet instead")
def test_pickle():
    pass

"""Behavioral port of the upstream grblas matrix test corpus slice.

Same approach as tests/test_upstream_vector.py: canonical grblas fixtures
(the 7x7 12-entry matrix from /root/reference/tests/from_grblas2/
test_matrix.py:20-33), upstream expected RESULTS, fresh code against this
engine's API. The reference's chunk-loop (A_chunks) maps to a partition
sweep — Spark results must be partitioning-invariant, so we run the core
matmul checks at two partition counts.
"""

import numpy as np
import pytest

import dask_grblas_spark as gb
from dask_grblas_spark import binary, monoid, semiring, unary

A_ROWS = [3, 0, 3, 5, 6, 0, 6, 1, 6, 2, 4, 1]
A_COLS = [0, 1, 2, 2, 2, 3, 3, 4, 4, 5, 5, 6]
A_VALS = [3, 2, 3, 1, 5, 3, 7, 8, 3, 1, 7, 4]


@pytest.fixture
def A(spark):
    return gb.Matrix.from_values(A_ROWS, A_COLS, A_VALS)


@pytest.fixture
def v(spark):
    return gb.Vector.from_values([1, 3, 4, 6], [1, 1, 2, 0])


def _mat(r, c, vals, nrows=None, ncols=None, dtype=None):
    return gb.Matrix.from_values(r, c, vals, nrows=nrows, ncols=ncols,
                                 dtype=dtype)


MXM_RESULT = (
    [0, 0, 0, 0, 1, 1, 1, 1, 2, 3, 3, 3, 4, 5, 6, 6, 6],
    [0, 2, 4, 6, 2, 3, 4, 5, 2, 1, 3, 5, 2, 5, 0, 2, 5],
    [9, 9, 16, 8, 20, 28, 12, 56, 1, 6, 9, 3, 7, 1, 21, 21, 26],
)


@pytest.mark.parametrize("nparts", [1, 7])
def test_mxm(A, nparts):
    # the reference loops over dask chunkings; partitioning-invariance is
    # the Spark analogue
    A.rechunk(nparts)
    C = A.mxm(A, semiring.plus_times).new()
    assert C.isequal(_mat(*MXM_RESULT)).value


def test_mxm_transpose(A):
    C = A.dup()
    C << A.mxm(A.T, semiring.plus_times)
    result = _mat(
        [0, 0, 1, 1, 2, 2, 3, 3, 3, 4, 4, 5, 5, 5, 6, 6, 6, 6, 6],
        [0, 6, 1, 6, 2, 4, 3, 5, 6, 2, 4, 3, 5, 6, 0, 1, 3, 5, 6],
        [13, 21, 80, 24, 1, 7, 18, 3, 15, 7, 49, 3, 1, 5, 21, 24, 15, 5,
         83])
    assert C.isequal(result).value
    C << A.T.mxm(A, semiring.plus_times)
    result2 = _mat(
        [0, 0, 1, 1, 2, 2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 4, 5, 6, 6],
        [0, 2, 1, 3, 0, 2, 3, 4, 1, 2, 3, 4, 2, 3, 4, 6, 5, 4, 6],
        [9, 9, 4, 6, 9, 35, 35, 15, 6, 35, 58, 21, 15, 21, 73, 32, 50, 32,
         16])
    assert C.isequal(result2).value


def test_mxm_nonsquare(spark):
    A = _mat([0, 0, 0], [0, 2, 4], [1, 2, 3], nrows=1, ncols=5)
    B = _mat([0, 2, 4], [0, 0, 0], [10, 20, 30], nrows=5, ncols=1)
    C = A.mxm(B, semiring.max_plus).new()
    assert C[0, 0].new().value == 33
    C2 = A.T.mxm(B.T, semiring.max_plus).new()
    assert C2.nrows == 5
    assert C2.ncols == 5


def test_mxm_mask(A):
    val_mask = _mat([0, 3, 4], [2, 3, 2], [True, True, True],
                    nrows=7, ncols=7)
    struct_mask = _mat([0, 3, 4], [2, 3, 2], [1, 0, 0], nrows=7, ncols=7)
    C = A.dup()
    C(mask=val_mask.V) << A.mxm(A, semiring.plus_times)
    result = _mat(
        [0, 0, 0, 1, 1, 2, 3, 3, 3, 4, 4, 5, 6, 6, 6],
        [1, 2, 3, 4, 6, 5, 0, 2, 3, 2, 5, 2, 2, 3, 4],
        [2, 9, 3, 8, 4, 1, 3, 3, 9, 7, 7, 1, 5, 7, 3])
    assert C.isequal(result).value
    C = A.dup()
    C(mask=~val_mask.V) << A.mxm(A, semiring.plus_times)
    result2 = _mat(
        [0, 0, 0, 1, 1, 1, 1, 2, 3, 3, 5, 6, 6, 6],
        [0, 4, 6, 2, 3, 4, 5, 2, 1, 5, 5, 0, 2, 5],
        [9, 16, 8, 20, 28, 12, 56, 1, 6, 3, 1, 21, 21, 26])
    assert C.isequal(result2).value
    C = A.dup()
    C(mask=struct_mask.S, replace=True) << A.mxm(A, semiring.plus_times)
    result3 = _mat([0, 3, 4], [2, 3, 2], [9, 9, 7], nrows=7, ncols=7)
    assert C.isequal(result3).value
    C2 = A.mxm(A, semiring.plus_times).new(mask=struct_mask.S)
    assert C2.isequal(result3).value


def test_mxm_accum(A):
    A(accum=binary.plus) << A.mxm(A, semiring.plus_times)
    result = _mat(
        [0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 2, 2, 3, 3, 3, 3, 3, 4, 4, 5, 5,
         6, 6, 6, 6, 6],
        [0, 1, 2, 3, 4, 6, 2, 3, 4, 5, 6, 2, 5, 0, 1, 2, 3, 5, 2, 5, 2, 5,
         0, 2, 3, 4, 5],
        [9, 2, 9, 3, 16, 8, 20, 28, 20, 56, 4, 1, 1, 3, 6, 3, 9, 3, 7, 7,
         1, 1, 21, 26, 7, 3, 26])
    assert A.isequal(result).value


def test_mxv(A, v):
    w = A.mxv(v, semiring.plus_times).new()
    assert w.isequal(gb.Vector.from_values([0, 1, 6], [5, 16, 13])).value


def test_ewise_mult(A):
    B = _mat([0, 0, 5], [1, 2, 2], [5, 4, 8], nrows=7, ncols=7)
    result = _mat([0, 5], [1, 2], [10, 8], nrows=7, ncols=7)
    C = A.ewise_mult(B, binary.times).new()
    assert C.isequal(result).value
    C = A.ewise_mult(B, monoid.times).new()
    assert C.isequal(result).value


def test_ewise_add(A):
    B = _mat([0, 0, 5], [1, 2, 2], [5, 4, 8], nrows=7, ncols=7)
    result = _mat(
        [0, 3, 0, 3, 5, 6, 0, 6, 1, 6, 2, 4, 1],
        [2, 0, 1, 2, 2, 2, 3, 3, 4, 4, 5, 5, 6],
        [4, 3, 5, 3, 8, 5, 3, 7, 8, 3, 1, 7, 4])
    C = A.ewise_add(B, monoid.max).new()
    assert C.isequal(result).value
    C = A.ewise_add(B, binary.max).new()
    assert C.isequal(result).value


def test_extract(A):
    result = _mat([0, 0, 1, 2, 2, 2], [0, 2, 1, 1, 2, 3], [2, 3, 3, 5, 7, 3],
                  nrows=3, ncols=4)
    C = A[[0, 3, 6], [1, 2, 3, 4]].new()
    assert C.isequal(result).value
    C = A[0::3, 1:5].new()
    assert C.isequal(result).value
    C = A[[0, 3, 6], 1:5:1].new()
    assert C.isequal(result).value


def test_extract_row(A):
    result = gb.Vector.from_values([1, 2], [5, 3], size=3)
    w = A[6, [0, 2, 4]].new()
    assert w.isequal(result).value
    w = A[6, :5:2].new()
    assert w.isequal(result).value
    w = A.T[[0, 2, 4], 6].new()
    assert w.isequal(result).value
    w = A[6, np.array([0, 2, 4])].new()
    assert w.isequal(result).value


def test_extract_column(A):
    result = gb.Vector.from_values([1, 2], [3, 1], size=3)
    w = A[[1, 3, 5], 2].new()
    assert w.isequal(result).value
    w = A[1:6:2, 2].new()
    assert w.isequal(result).value
    w = A.T[2, [1, 3, 5]].new()
    assert w.isequal(result).value


def test_extract_element(A):
    assert A[3, 0].new().value == 3
    assert A[1, 6].new().value == 4
    assert A[0, 0].new().value is None


def test_set_element(A):
    assert A[1, 1].new().value is None
    A[1, 1] = 21
    A[1, 4] << -5
    assert A[1, 1].new().value == 21
    assert A[1, 4].new().value == -5


def test_remove_element(A):
    assert A[3, 0].new().value == 3
    del A[3, 0]
    assert A[3, 0].new().value is None
    assert A[6, 3].new().value == 7


def test_apply(A):
    result = _mat(A_ROWS, A_COLS, [-x for x in A_VALS])
    C = A.apply(unary.ainv).new()
    assert C.isequal(result).value


def test_apply_binary(A):
    result_right = _mat(A_ROWS, A_COLS, [x > 1 for x in A_VALS],
                        dtype="BOOL")
    assert A.apply(binary.gt, right=1).new().isequal(result_right).value
    result_left = _mat(A_ROWS, A_COLS, [8 - x for x in A_VALS])
    assert A.apply(binary.minus, left=8).new().isequal(result_left).value
    w1 = A.apply(binary.plus, left=1).new()
    w2 = A.apply(monoid.plus, left=1).new()
    assert w1.isequal(w2).value


def test_reduce_row(A):
    result = gb.Vector.from_values([0, 1, 2, 3, 4, 5, 6],
                                   [5, 12, 1, 6, 7, 1, 15])
    w = A.reduce_rowwise(monoid.plus).new()
    assert w.isequal(result).value


def test_reduce_column(A):
    result = gb.Vector.from_values([0, 1, 2, 3, 4, 5, 6],
                                   [3, 2, 9, 10, 11, 8, 4])
    w = A.reduce_columnwise(monoid.plus).new()
    assert w.isequal(result).value


def test_reduce_scalar(A):
    assert A.reduce_scalar(monoid.plus).new().value == 47


def test_transpose(A):
    T = A.T.new()
    assert T.isequal(_mat(A_COLS, A_ROWS, A_VALS)).value
    # double transpose is the identity (T of a view returns the parent)
    assert A.T.T is A
    assert T.T.new().isequal(A).value


def test_assign_row(A, v):
    A[6, :] = v
    got = A[6, :].new()
    assert got.isequal(v).value


def test_assign_column(A, v):
    A[:, 1] = v
    got = A[:, 1].new()
    assert got.isequal(v).value


def test_assign_scalar_region(A):
    A[[0, 6], [0, 6]] = 0
    for i in (0, 6):
        for j in (0, 6):
            assert A[i, j].new().value == 0
    # untouched entry survives
    assert A[1, 4].new().value == 8


def test_matrix_masked_scalar_broadcast(A):
    # w(mask) << s for matrices (mirrors vector test_assign_scalar_mask)
    m = _mat([0, 3], [1, 0], [True, True], nrows=7, ncols=7)
    C = A.dup()
    C(mask=m.S) << 99
    assert C[0, 1].new().value == 99
    assert C[3, 0].new().value == 99
    assert C[1, 4].new().value == 8
    assert C.nvals == A.nvals  # mask and A overlap exactly on those cells


def test_contains_iter(A):
    assert (3, 0) in A
    assert (0, 0) not in A
    assert sorted(A)[:3] == [(0, 1), (0, 3), (1, 4)]


def test_incompatible_shapes(A, v):
    B = A[:6, :6].new()
    with pytest.raises(gb.DimensionMismatch):
        A.mxm(B)
    with pytest.raises(gb.DimensionMismatch):
        B.mxv(v)
    with pytest.raises(gb.DimensionMismatch):
        A.ewise_add(B)


# -- assign family (reference test_matrix.py:754-1274) -----------------------


def test_assign(A):
    B = _mat([0, 0, 1], [0, 1, 0], [9, 8, 7])
    result = _mat(
        [0, 0, 2, 3, 0, 3, 5, 6, 0, 6, 1, 6, 4, 1],
        [0, 5, 0, 0, 1, 2, 2, 2, 3, 3, 4, 4, 5, 6],
        [9, 8, 7, 3, 2, 3, 1, 5, 3, 7, 8, 3, 7, 4])
    C = A.dup()
    C()[[0, 2], [0, 5]] = B
    assert C.isequal(result).value
    C = A.dup()
    C[:3:2, :6:5]() << B
    assert C.isequal(result).value
    # bare scalar update of a Matrix densifies -> refused
    with pytest.raises(TypeError, match="dense"):
        C << 1
    nvals = C.nvals
    C(C.S) << 1
    assert C.nvals == nvals
    assert C.reduce_scalar().new().value == nvals
    # transposed rhs
    BT = B.T.new()
    C = A.dup()
    C()[[0, 2], [0, 5]] = BT.T
    assert C.isequal(result).value
    C = A.dup()
    C[:3:2, :6:5]() << BT.T
    assert C.isequal(result).value


def test_assign_wrong_dims(A):
    B = _mat([0, 0, 1], [0, 1, 0], [9, 8, 7])
    with pytest.raises(gb.DimensionMismatch):
        A[[0, 2, 4], [0, 5]] = B


def test_subassign_row_col():
    A0 = _mat([0, 0, 0, 1, 1, 1, 2, 2, 2],
              [0, 1, 2, 0, 1, 2, 0, 1, 2],
              [0, 1, 2, 3, 4, 5, 6, 7, 8])
    m = gb.Vector.from_values([1], [True])
    v = gb.Vector.from_values([0, 1], [10, 20])
    A = A0.dup()

    A[[0, 1], 0](m.S) << v
    assert A.isequal(_mat([0, 0, 0, 1, 1, 1, 2, 2, 2],
                          [0, 1, 2, 0, 1, 2, 0, 1, 2],
                          [0, 1, 2, 20, 4, 5, 6, 7, 8])).value

    A[1, [1, 2]](m.V, accum=binary.plus).update(v)
    assert A.isequal(_mat([0, 0, 0, 1, 1, 1, 2, 2, 2],
                          [0, 1, 2, 0, 1, 2, 0, 1, 2],
                          [0, 1, 2, 20, 4, 25, 6, 7, 8])).value

    A[[0, 1], 0](m.S, binary.plus, replace=True) << v
    assert A.isequal(_mat([0, 0, 1, 1, 1, 2, 2, 2],
                          [1, 2, 0, 1, 2, 0, 1, 2],
                          [1, 2, 40, 4, 25, 6, 7, 8])).value

    A[[0, 1], 0](m.S) << 99
    assert A.isequal(_mat([0, 0, 1, 1, 1, 2, 2, 2],
                          [1, 2, 0, 1, 2, 0, 1, 2],
                          [1, 2, 99, 4, 25, 6, 7, 8])).value

    A[[1, 2], 0](m.S, binary.plus, replace=True) << 100
    assert A.isequal(_mat([0, 0, 1, 1, 2, 2, 2],
                          [1, 2, 1, 2, 0, 1, 2],
                          [1, 2, 4, 25, 106, 7, 8])).value

    A[2, [0, 1]](m.S) << -1
    assert A.isequal(_mat([0, 0, 1, 1, 2, 2, 2],
                          [1, 2, 1, 2, 0, 1, 2],
                          [1, 2, 4, 25, 106, -1, 8])).value


def test_subassign_matrix():
    A = _mat([0, 0, 0, 1, 1, 1, 2, 2, 2],
             [0, 1, 2, 0, 1, 2, 0, 1, 2],
             [0, 1, 2, 3, 4, 5, 6, 7, 8])
    m = _mat([1], [0], [True])
    v = _mat([0, 1], [0, 0], [10, 20])
    mT = m.T.new()

    A[[0, 1], [0]](m.S) << v
    result1 = _mat([0, 0, 0, 1, 1, 1, 2, 2, 2],
                   [0, 1, 2, 0, 1, 2, 0, 1, 2],
                   [0, 1, 2, 20, 4, 5, 6, 7, 8])
    assert A.isequal(result1).value

    # all four row/col index spellings hit the same cells
    result2 = _mat([0, 0, 0, 1, 1, 1, 2, 2, 2],
                   [0, 1, 2, 0, 1, 2, 0, 1, 2],
                   [0, 1, 2, 20, 4, 25, 6, 7, 8])
    variants = [([1], [1, 2]), ([1], slice(1, 3)),
                (slice(1, 2), [1, 2]), (slice(1, 2), slice(1, 3))]
    for rows, cols in variants:
        C = A.dup()
        C[rows, cols](mT.V, accum=binary.plus) << v.T
        assert C.isequal(result2).value
    A = C  # continue from the (identical) last variant

    A[[0, 1], [0]](m.S, binary.plus, replace=True) << v
    assert A.isequal(_mat([0, 0, 1, 1, 1, 2, 2, 2],
                          [1, 2, 0, 1, 2, 0, 1, 2],
                          [1, 2, 40, 4, 25, 6, 7, 8])).value

    A[[0, 1], [0]](m.S) << 99
    assert A.isequal(_mat([0, 0, 1, 1, 1, 2, 2, 2],
                          [1, 2, 0, 1, 2, 0, 1, 2],
                          [1, 2, 99, 4, 25, 6, 7, 8])).value

    A[[1, 2], [0]](m.S, binary.plus, replace=True) << 100
    assert A.isequal(_mat([0, 0, 1, 1, 2, 2, 2],
                          [1, 2, 1, 2, 0, 1, 2],
                          [1, 2, 4, 25, 106, 7, 8])).value

    A[[2], [0, 1]](mT.S) << -1
    assert A.isequal(_mat([0, 0, 1, 1, 2, 2, 2],
                          [1, 2, 1, 2, 0, 1, 2],
                          [1, 2, 4, 25, 106, -1, 8])).value


def test_assign_row_col_matrix_mask():
    # A         B       v1      v2
    # 0 1       4 _     100     10
    # 2 _       0 5             20
    A = _mat([0, 0, 1], [0, 1, 0], [0, 1, 2])
    B = _mat([0, 1, 1], [0, 0, 1], [4, 0, 5])
    v1 = gb.Vector.from_values([0], [100])
    v2 = gb.Vector.from_values([0, 1], [10, 20])

    # row assign, outer matrix mask
    C = A.dup()
    C(B.S)[0, :] << v2
    assert C.isequal(_mat([0, 0, 1], [0, 1, 0], [10, 1, 2])).value

    C = A.dup()
    C(B.S, accum=binary.plus)[1, :] = v2
    assert C.isequal(_mat([0, 0, 1, 1], [0, 1, 0, 1], [0, 1, 12, 20])).value

    C = A.dup()
    C(B.S, replace=True)[1, :] << v2
    assert C.isequal(_mat([0, 1, 1], [0, 0, 1], [0, 10, 20])).value

    # col assign, outer matrix mask
    C = A.dup()
    C(B.S)[:, 0] = v2
    assert C.isequal(_mat([0, 0, 1], [0, 1, 0], [10, 1, 20])).value

    C = A.dup()
    C(B.S, accum=binary.plus)[:, 1] << v2
    assert C.isequal(_mat([0, 0, 1, 1], [0, 1, 0, 1], [0, 1, 2, 20])).value

    C = A.dup()
    C(B.S, replace=True)[:, 1] = v2
    assert C.isequal(_mat([0, 1, 1], [0, 0, 1], [0, 2, 20])).value

    # row/col assign of a scalar under the matrix mask
    C = A.dup()
    C(B.S)[0, :] = 100
    assert C.isequal(_mat([0, 0, 1], [0, 1, 0], [100, 1, 2])).value

    C = A.dup()
    C(B.S, accum=binary.plus)[1, :] << 100
    assert C.isequal(_mat([0, 0, 1, 1], [0, 1, 0, 1], [0, 1, 102, 100])).value

    C = A.dup()
    C(B.S, replace=True)[1, :] = 100
    assert C.isequal(_mat([0, 1, 1], [0, 0, 1], [0, 100, 100])).value

    C = A.dup()
    C(B.S)[:, 0] << 100
    assert C.isequal(_mat([0, 0, 1], [0, 1, 0], [100, 1, 100])).value

    C = A.dup()
    C(B.S, accum=binary.plus)[:, 1] = 100
    assert C.isequal(_mat([0, 0, 1, 1], [0, 1, 0, 1], [0, 1, 2, 100])).value

    C = A.dup()
    C(B.S, replace=True)[:, 1] << 100
    assert C.isequal(_mat([0, 1, 1], [0, 0, 1], [0, 2, 100])).value

    # row/col subassign (submask in subregion coordinates)
    C = A.dup()
    C[0, :](v2.S) << v2
    assert C.isequal(_mat([0, 0, 1], [0, 1, 0], [10, 20, 2])).value

    C = A.dup()
    C[0, [0]](v1.S) << v1
    assert C.isequal(_mat([0, 0, 1], [0, 1, 0], [100, 1, 2])).value

    C = A.dup()
    C[:, 0](v2.S) << v2
    assert C.isequal(_mat([0, 0, 1], [0, 1, 0], [10, 1, 20])).value

    C = A.dup()
    C[[0], 0](v1.S) << v1
    assert C.isequal(_mat([0, 0, 1], [0, 1, 0], [100, 1, 2])).value

    # scalar subassign
    C = A.dup()
    C[0, :](v2.S) << 100
    assert C.isequal(_mat([0, 0, 1], [0, 1, 0], [100, 100, 2])).value

    C = A.dup()
    C[:, 0](v2.S) << 100
    assert C.isequal(_mat([0, 0, 1], [0, 1, 0], [100, 1, 100])).value


def test_assign_row_scalar(A, v):
    C = A.dup()
    C[0, :](v.S) << v
    D = A.dup()
    D(v.S)[0, :] << v
    assert C.isequal(D).value

    C = A.dup()
    C(v.S)[0, :] = 10
    result = _mat(
        [3, 0, 3, 5, 6, 0, 6, 1, 6, 2, 4, 1, 0, 0],
        [0, 1, 2, 2, 2, 3, 3, 4, 4, 5, 5, 6, 4, 6],
        [3, 10, 3, 1, 5, 10, 7, 8, 3, 1, 7, 4, 10, 10])
    assert C.isequal(result).value


def test_assign_column_scalar(A, v):
    C = A.dup()
    C[:, 0](v.S) << v
    D = A.dup()
    D(v.S)[:, 0] << v
    assert C.isequal(D).value

    C = A.dup()
    C[:, 1] = v
    C(v.S)[:, 1] = 10
    result = _mat(
        [3, 3, 5, 6, 0, 6, 1, 6, 2, 4, 1, 1, 3, 4, 6],
        [0, 2, 2, 2, 3, 3, 4, 4, 5, 5, 6, 1, 1, 1, 1],
        [3, 3, 1, 5, 3, 7, 8, 3, 1, 7, 4, 10, 10, 10, 10])
    assert C.isequal(result).value

    C(v.V, replace=True, accum=binary.plus)[:, 1] = 20
    result = _mat(
        [3, 3, 5, 6, 0, 6, 1, 6, 2, 4, 1, 1, 3, 4],
        [0, 2, 2, 2, 3, 3, 4, 4, 5, 5, 6, 1, 1, 1],
        [3, 3, 1, 5, 3, 7, 8, 3, 1, 7, 4, 30, 30, 30])
    assert C.isequal(result).value


def test_assign_scalar(A):
    result_block = _mat(
        [3, 0, 6, 0, 6, 6, 2, 4, 1, 1, 3, 5, 1, 3, 5],
        [0, 1, 2, 3, 3, 4, 5, 5, 6, 2, 2, 2, 4, 4, 4],
        [3, 2, 5, 3, 7, 3, 1, 7, 4, 0, 0, 0, 0, 0, 0])
    C = A.dup()
    C[[1, 3, 5], [2, 4]] = 0
    assert C.isequal(result_block).value
    C = A.dup()
    C[[1, 3, 5], [2, 4]] = gb.Scalar.from_value(0)
    assert C.isequal(result_block).value
    C = A.dup()
    C[1::2, 2:5:2] = 0
    assert C.isequal(result_block).value

    result_row = _mat(
        [3, 0, 6, 0, 6, 6, 2, 4, 1, 3, 5, 1, 1],
        [0, 1, 2, 3, 3, 4, 5, 5, 6, 2, 2, 2, 4],
        [3, 2, 5, 3, 7, 3, 1, 7, 4, 3, 1, 0, 0])
    C = A.dup()
    C[1, [2, 4]] = 0
    assert C.isequal(result_row).value
    C = A.dup()
    C[1, 2] = gb.Scalar.from_value(0)
    C[1, 4] = gb.Scalar.from_value(0)
    assert C.isequal(result_row).value
    C = A.dup()
    C[1, 2:5:2] = 0
    assert C.isequal(result_row).value

    result_column = _mat(
        [3, 0, 6, 0, 6, 6, 2, 4, 1, 1, 1, 3, 5],
        [0, 1, 2, 3, 3, 4, 5, 5, 6, 4, 2, 2, 2],
        [3, 2, 5, 3, 7, 3, 1, 7, 4, 8, 0, 0, 0])
    C = A.dup()
    C[[1, 3, 5], 2] = 0
    assert C.isequal(result_column).value
    C = A.dup()
    C[1::2, 2] = 0
    assert C.isequal(result_column).value

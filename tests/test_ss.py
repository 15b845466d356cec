"""Behavioral port of the upstream grblas `.ss` test slice (selectk,
compactify, flatten, reshape, split, build_scalar).

The reference XFAILs this entire family (/root/reference/tests/
from_grblas2/copytests.py:6-100: test_firstk, test_lastk, test_compactify,
test_split, test_flatten, test_build_scalar all "Needs investigated") —
this engine runs them. Expected results come straight from the upstream
test bodies (test_vector.py:1392-1533, test_matrix.py:2758-3300).
"""

import pytest

import dask_grblas_spark as gb
from dask_grblas_spark.exceptions import DimensionMismatch, OutputNotEmpty

A_ROWS = [3, 0, 3, 5, 6, 0, 6, 1, 6, 2, 4, 1]
A_COLS = [0, 1, 2, 2, 2, 3, 3, 4, 4, 5, 5, 6]
A_VALS = [3, 2, 3, 1, 5, 3, 7, 8, 3, 1, 7, 4]


@pytest.fixture
def A(spark):
    return gb.Matrix.from_values(A_ROWS, A_COLS, A_VALS)


@pytest.fixture
def v(spark):
    return gb.Vector.from_values([1, 3, 4, 6], [1, 1, 2, 0])


def _vec(i, vals, size=None):
    return gb.Vector.from_values(i, vals, size=size)


def _mat(r, c, vals, nrows=None, ncols=None):
    return gb.Matrix.from_values(r, c, vals, nrows=nrows, ncols=ncols)


# -- vector selectk (upstream test_vector.py:1392-1450) ----------------------


def test_firstk(v):
    data = [[1, 3, 4, 6], [1, 1, 2, 0]]
    iso_v = v.dup()
    iso_v(iso_v.S) << 1
    iso_data = [[1, 3, 4, 6], [1, 1, 1, 1]]
    for w, d in [(v, data), (iso_v, iso_data)]:
        for k in range(w.nvals + 1):
            x = w.ss.selectk("first", k)
            expected = _vec(d[0][:k], d[1][:k], size=w.size)
            assert x.isequal(expected).value
    with pytest.raises(ValueError):
        v.ss.selectk("first", -1)
    with pytest.raises(ValueError):
        v.ss.selectk("bogus", 1)


def test_lastk(v):
    data = [[1, 3, 4, 6], [1, 1, 2, 0]]
    for k in range(v.nvals + 1):
        x = v.ss.selectk("last", k)
        expected = _vec(data[0][-k:] if k else [], data[1][-k:] if k else [],
                        size=v.size)
        assert x.isequal(expected).value


def test_largestk(v):
    w = v.ss.selectk("largest", 1)
    assert w.isequal(_vec([4], [2], size=v.size)).value
    w = v.ss.selectk("largest", 2)
    # upstream accepts either 1-valued tie; ours is deterministic (lowest i)
    assert (w.isequal(_vec([1, 4], [1, 2], size=v.size)).value
            or w.isequal(_vec([3, 4], [1, 2], size=v.size)).value)
    w = v.ss.selectk("largest", 3)
    assert w.isequal(_vec([1, 3, 4], [1, 1, 2], size=v.size)).value


def test_smallestk(v):
    w = v.ss.selectk("smallest", 1)
    assert w.isequal(_vec([6], [0], size=v.size)).value
    w = v.ss.selectk("smallest", 3)
    assert w.isequal(_vec([1, 3, 6], [1, 1, 0], size=v.size)).value


def test_randomk(v):
    w = v.ss.selectk("random", 2, seed=7)
    assert w.nvals == 2
    # selected entries keep their original index/value pairing
    orig = dict(zip(*[list(x) for x in v.to_values()]))
    got = dict(zip(*[list(x) for x in w.to_values()]))
    assert all(orig[i] == val for i, val in got.items())


# -- vector compactify (upstream test_vector.py:1453-1533) -------------------


@pytest.mark.parametrize("do_iso", [False, True])
def test_compactify(spark, do_iso):
    orig_indices = [1, 3, 4, 6]
    vals = [1, 1, 1, 1] if do_iso else [1, 4, 2, 0]
    v = _vec(orig_indices, vals)

    def check(got, idx, values, size=4):
        assert got.isequal(_vec(idx, values, size=size)).value

    check(v.ss.compactify("first"), [0, 1, 2, 3], vals)
    check(v.ss.compactify("last"), [0, 1, 2, 3], vals[::-1])
    check(v.ss.compactify("first", asindex=True), [0, 1, 2, 3], orig_indices)
    check(v.ss.compactify("last", asindex=True), [0, 1, 2, 3],
          orig_indices[::-1])
    if not do_iso:
        check(v.ss.compactify("smallest"), [0, 1, 2, 3], [0, 1, 2, 4])
        check(v.ss.compactify("largest"), [0, 1, 2, 3], [4, 2, 1, 0])
        check(v.ss.compactify("smallest", asindex=True), [0, 1, 2, 3],
              [6, 1, 4, 3])
        check(v.ss.compactify("largest", asindex=True), [0, 1, 2, 3],
              [3, 4, 1, 6])
    # reverse flips the packed positions
    check(v.ss.compactify("first", reverse=True), [0, 1, 2, 3], vals[::-1])
    # size truncates to the first n packed positions (and sets logical size)
    for n in range(5):
        check(v.ss.compactify("first", size=n), list(range(n)), vals[:n],
              size=n)
        check(v.ss.compactify("first", size=n, reverse=True),
              list(range(n)), vals[:n][::-1], size=n)
    w = v.ss.compactify("first", size=0)
    assert w.size == 0 and w.nvals == 0


# -- build_scalar / is_iso (upstream test_vector.py:209-215) -----------------


def test_build_scalar(v):
    with pytest.raises(OutputNotEmpty):
        v.ss.build_scalar([1, 5], 3)
    v.clear()
    v.ss.build_scalar([1, 5], 3)
    assert v.nvals == 2
    assert v.ss.is_iso
    A = gb.Matrix.new("INT64", 3, 3)
    A.ss.build_scalar([0, 2], [1, 2], 7)
    assert A.nvals == 2
    assert A.ss.is_iso
    assert not gb.Vector.from_values([0, 1], [1, 2]).ss.is_iso


# -- matrix selectk (upstream test_matrix.py:3242-3300) ----------------------


def test_matrix_firstk(A):
    B = A.ss.selectk_rowwise("first", 1)
    assert B.isequal(_mat([0, 1, 2, 3, 4, 5, 6], [1, 4, 5, 0, 5, 2, 2],
                          [2, 8, 1, 3, 7, 1, 5],
                          nrows=A.nrows, ncols=A.ncols)).value
    B = A.ss.selectk_rowwise("first", 2)
    assert B.isequal(_mat([3, 0, 3, 5, 6, 0, 6, 1, 2, 4, 1],
                          [0, 1, 2, 2, 2, 3, 3, 4, 5, 5, 6],
                          [3, 2, 3, 1, 5, 3, 7, 8, 1, 7, 4],
                          nrows=A.nrows, ncols=A.ncols)).value
    B = A.ss.selectk_rowwise("first", 3)
    assert B.isequal(A).value
    B = A.ss.selectk_columnwise("first", 1)
    # per column, the smallest-row entry
    expected = _mat([3, 0, 3, 0, 1, 2, 1], [0, 1, 2, 3, 4, 5, 6],
                    [3, 2, 3, 3, 8, 1, 4], nrows=A.nrows, ncols=A.ncols)
    assert B.isequal(expected).value


def test_matrix_largestk(A):
    B = A.ss.selectk_rowwise("largest", 1)
    # row maxima with deterministic lowest-j tie-break
    expected = _mat([0, 1, 2, 3, 4, 5, 6], [3, 4, 5, 0, 5, 2, 3],
                    [3, 8, 1, 3, 7, 1, 7], nrows=A.nrows, ncols=A.ncols)
    assert B.isequal(expected).value


def test_matrix_compactify_rowwise(A):
    B = A.ss.compactify_rowwise("first")
    # each row's entries pack into columns 0..k-1 in index order
    expected = _mat([0, 0, 1, 1, 2, 3, 3, 4, 5, 6, 6, 6],
                    [0, 1, 0, 1, 0, 0, 1, 0, 0, 0, 1, 2],
                    [2, 3, 8, 4, 1, 3, 3, 7, 1, 5, 7, 3],
                    nrows=A.nrows, ncols=None)
    assert B.isequal(expected).value


# -- flatten / reshape (upstream test_matrix.py:3004-3040) -------------------


def test_flatten(A):
    indices = [r * A.ncols + c for r, c in zip(A_ROWS, A_COLS)]
    expected = _vec(indices, A_VALS, size=A.nrows * A.ncols)
    w = A.ss.flatten()
    assert w.isequal(expected).value
    C = w.ss.reshape(*A.shape)
    assert C.isequal(A).value
    C = w.ss.reshape(A.shape)
    assert C.isequal(A).value
    # column-wise
    indices = [c * A.nrows + r for r, c in zip(A_ROWS, A_COLS)]
    expected = _vec(indices, A_VALS, size=A.nrows * A.ncols)
    w = A.ss.flatten(order="columnwise")
    assert w.isequal(expected).value
    C = w.ss.reshape(A.nrows, A.ncols, order="columnwise")
    assert C.isequal(A).value
    with pytest.raises(DimensionMismatch):
        w.ss.reshape(3, 3)


# -- split (upstream test_matrix.py:2758-2772) -------------------------------


def test_split(A):
    for results in [A.ss.split([4, 3]), A.ss.split([[4, None], 3])]:
        row_boundaries = [0, 4, 7]
        col_boundaries = [0, 3, 6, 7]
        for i, (i1, i2) in enumerate(zip(row_boundaries[:-1],
                                         row_boundaries[1:])):
            for j, (j1, j2) in enumerate(zip(col_boundaries[:-1],
                                             col_boundaries[1:])):
                expected = A[i1:i2, j1:j2].new()
                assert expected.isequal(results[i][j]).value
    with pytest.raises(DimensionMismatch):
        A.ss.split([[5, 5], 3])

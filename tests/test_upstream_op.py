"""Port of the reference's operator-registry conformance suite
(/root/reference/tests/from_grblas2/test_op.py) against the Spark-native
registry. The grblas-internal slices (gb_obj pointers, numba UDF
compilation, lazy namespaces) have no Spark analogue; everything
API-observable is ported: repr conventions, string resolution
(from_string incl. symbols, dtype suffixes and the exact error
contract), semiring composition and its forgiving argument handling,
the div-semiring family semantics, monoid⊂binary name superset, the
full monoid × binary composition grid, and the commutation table.
"""

from __future__ import annotations

import itertools

import pytest

import dask_grblas_spark as gb
from dask_grblas_spark import binary, monoid, semiring, unary
from dask_grblas_spark.operators import (
    _BINARY, _MONOID, BinaryOp, Monoid, Semiring, from_string, get_semiring)


def test_op_repr():
    # reference test_op.py:24-28
    assert repr(unary.ainv) == "unary.ainv"
    assert repr(binary.plus) == "binary.plus"
    assert repr(monoid.times) == "monoid.times"
    assert repr(semiring.plus_times) == "semiring.plus_times"
    assert repr(gb.agg.count) == "agg.count"


def test_from_string():
    # reference test_op.py:905-940
    assert unary.from_string("-") is unary.ainv
    assert unary.from_string("abs[float]") is unary.abs
    assert binary.from_string("+") is binary.plus
    assert binary.from_string("-[int]") is binary.minus
    assert binary.from_string("true_divide") is binary.true_divide
    assert binary.from_string("//") is binary.floordiv
    assert binary.from_string("%") is binary.mod
    assert monoid.from_string("*[FP64]") is monoid.times
    assert semiring.from_string("min.plus") is semiring.min_plus
    assert semiring.from_string("min.+") is semiring.min_plus
    assert semiring.from_string("min_plus") is semiring.min_plus

    with pytest.raises(ValueError, match="does not end with"):
        binary.from_string("plus[int")
    with pytest.raises(ValueError, match="too many"):
        binary.from_string("plus[int][float]")
    with pytest.raises(ValueError, match="not matched by"):
        binary.from_string("plus][int]")
    with pytest.raises(ValueError, match="does not end with"):
        binary.from_string("plus[int]extra")
    with pytest.raises(ValueError, match="Unknown binary string"):
        binary.from_string("")
    with pytest.raises(ValueError, match="Unknown binary string"):
        binary.from_string("badname")
    with pytest.raises(ValueError, match="Bad semiring string"):
        semiring.from_string("badname")
    with pytest.raises(ValueError, match="Bad semiring string"):
        semiring.from_string("min.plus.times")

    assert from_string("-") is unary.ainv
    assert from_string("+") is binary.plus
    assert from_string("min.plus") is semiring.min_plus
    with pytest.raises(ValueError, match="Unknown op string"):
        from_string("min.plus.times")


def test_get_semiring_forgiving():
    # reference test_op.py:794-828
    assert get_semiring(monoid.plus, binary.times) is semiring.plus_times
    assert get_semiring(monoid.plus, monoid.times) is semiring.plus_times
    assert get_semiring(binary.plus, binary.times) is semiring.plus_times
    with pytest.raises(TypeError, match="switch"):
        get_semiring(binary.plus, monoid.times)
    with pytest.raises(TypeError, match="Monoid"):
        get_semiring(None, binary.times)
    with pytest.raises(TypeError, match="BinaryOp"):
        get_semiring(monoid.plus, None)
    # user binary composes on the fly
    bop = gb.register_binary("upstream_myplus", lambda x, y: x + y)
    sr = get_semiring(monoid.plus, bop)
    assert sr.monoid is monoid.plus
    assert sr.binaryop is bop


def test_div_semirings(spark):
    # reference test_op.py:776-791: cdiv truncates, truediv promotes to
    # FP64, floordiv floors
    A1 = gb.Matrix.from_values([0, 1], [0, 0], [-1, -3])
    A2 = gb.Matrix.from_values([0, 1], [0, 0], [2, 2])
    r = A1.T.mxm(A2, semiring.plus_cdiv).new()
    assert r[0, 0].value == -1
    assert r.dtype.name == "INT64"
    r = A1.T.mxm(A2, semiring.plus_truediv).new()
    assert r[0, 0].value == -2
    assert r.dtype.name == "FP64"
    r = A1.T.mxm(A2, semiring.plus_floordiv).new()
    assert r[0, 0].value == -3
    assert r.dtype.name == "INT64"


def test_binaryop_superset_monoids():
    # reference test_op.py:768-774: every BUILT-IN monoid name is a
    # binary name (user registrations elsewhere in the suite may add
    # monoid-only names — the invariant is about the shipped vocabulary)
    from dask_grblas_spark.operators import BUILTIN_BINARY, BUILTIN_MONOIDS

    assert not BUILTIN_MONOIDS - BUILTIN_BINARY


def test_create_semiring_full_grid():
    # reference test_op.py:830-842: every monoid x binary composes
    for mon_name, bin_name in itertools.product(sorted(_MONOID),
                                                sorted(_BINARY)):
        sr = Semiring(f"{mon_name}_{bin_name}", _MONOID[mon_name],
                      _BINARY[bin_name])
        assert sr.monoid is _MONOID[mon_name]
        assert sr.binaryop is _BINARY[bin_name]
    # the lazy namespace resolves any registered combination by name
    assert isinstance(semiring.max_left_shift, Semiring)
    with pytest.raises(AttributeError):
        semiring.nosuch_operator


def test_commutes_table(spark):
    # reference test_op.py:845-903, verified numerically: for every op
    # with a commutes_to, op(x, y) == commutes_to(y, x)
    import math

    from pyspark.sql import functions as F

    from dask_grblas_spark.dtypes import FP64
    from dask_grblas_spark.operators import _COMMUTES_TO

    assert binary.plus.commutes_to is binary.plus
    assert binary.minus.commutes_to is binary.rminus
    assert binary.lt.commutes_to is binary.gt
    assert binary.first.commutes_to is binary.second
    assert binary.plus.is_commutative
    assert not binary.minus.is_commutative

    checkable = [n for n in sorted(_COMMUTES_TO)
                 if n in _BINARY and not _BINARY[n].positional
                 # int-domain ops checked separately; "any" commutes by
                 # SPEC (either operand is a valid result), not by value
                 and n not in ("gcd", "lcm", "band", "bor", "bxor", "bxnor",
                               "any")]
    xs = [0.5, 2.0, -1.5, 3.0]
    ys = [1.5, -0.25, 2.5, 0.5]
    rows = [(i, n, x, y) for i, n in enumerate(checkable)
            for x, y in zip(xs, ys)]
    df = spark.createDataFrame(rows, "rid long, op string, x double, y double")
    fwd = [F.when(F.col("op") == n,
                  _BINARY[n](F.col("x"), F.col("y"), FP64).cast("double"))
           for n in checkable]
    rev = [F.when(F.col("op") == n,
                  _BINARY[_COMMUTES_TO[n]](F.col("y"), F.col("x"), FP64)
                  .cast("double"))
           for n in checkable]
    got = df.select("op", F.coalesce(*fwd).alias("a"),
                    F.coalesce(*rev).alias("b")).collect()
    def same(a, b):
        if a is None or b is None:
            return a is b
        return (a == b or (math.isnan(a) and math.isnan(b))
                or math.isclose(a, b, rel_tol=1e-12))

    bad = [(r.op, r.a, r.b) for r in got if not same(r.a, r.b)]
    assert not bad, bad[:10]


def test_int_commutes(spark):
    from pyspark.sql import functions as F

    from dask_grblas_spark.dtypes import INT64
    from dask_grblas_spark.operators import _COMMUTES_TO

    names = ["gcd", "lcm", "band", "bor", "bxor", "bxnor", "cdiv", "rcdiv",
             "floordiv", "rfloordiv", "min", "max"]
    xs = [6, 12, 7, 9]
    ys = [4, 18, 3, 2]
    rows = [(n, x, y) for n in names for x, y in zip(xs, ys)]
    df = spark.createDataFrame(rows, "op string, x long, y long")
    fwd = [F.when(F.col("op") == n,
                  _BINARY[n](F.col("x"), F.col("y"), INT64).cast("bigint"))
           for n in names]
    rev = [F.when(F.col("op") == n,
                  _BINARY[_COMMUTES_TO[n]](F.col("y"), F.col("x"), INT64)
                  .cast("bigint"))
           for n in names]
    got = df.select("op", F.coalesce(*fwd).alias("a"),
                    F.coalesce(*rev).alias("b")).collect()
    bad = [(r.op, r.a, r.b) for r in got if r.a != r.b]
    assert not bad, bad


def test_registered_monoid_and_semiring_compose():
    # reference test_op.py:493-541 (udf monoid/semiring), Spark-native
    m = gb.register_monoid("upstream_tplus", "plus", 0,
                           agg_fn=lambda c, d: __import__(
                               "pyspark.sql.functions", fromlist=["sum"]
                           ).sum(c).cast(d.spark_type))
    assert isinstance(m, Monoid)
    sr = gb.register_semiring("upstream_tplus_times", m, "times")
    assert isinstance(sr, Semiring)
    assert semiring.upstream_tplus_times is sr


def test_typed_op_strings():
    # reference test_op.py:92-105 string forms via get_typed_op
    from dask_grblas_spark.dtypes import INT64
    from dask_grblas_spark.operators import get_typed_op

    op_, _ = get_typed_op("binary.plus", INT64)
    assert op_ is binary.plus
    op_, _ = get_typed_op("plus", INT64)
    assert op_ is binary.plus
    op_, _ = get_typed_op("min_plus", INT64)
    assert isinstance(op_, Semiring)

"""Operator-registry breadth parity with the grblas registry the
reference inherits (exercised by /root/reference/tests/from_grblas2/
test_op.py:31-61 and test_numpyops.py:46-257): core + numpy-spillover
unary/binary ops, numpy-named monoids, positional variants.

Every op is numerically spot-checked against the Python/numpy reference
implementation in ONE Spark job per family (all ops as columns of a
single select)."""

import math
import statistics

import numpy as np
import pytest
from pyspark.sql import functions as F

import dask_grblas_spark as gb
from dask_grblas_spark import binary, monoid, unary
from dask_grblas_spark.dtypes import FP64, INT64
from dask_grblas_spark.operators import _BINARY, _MONOID, _UNARY

_NORM = statistics.NormalDist()

# ---- presence grids (the reference registry's vocabulary) -----------------

UNARY_EXPECTED = [
    # core GraphBLAS
    "identity", "ainv", "minv", "abs", "one", "lnot", "bnot",
    "sqrt", "exp", "exp2", "expm1", "log", "log2", "log10", "log1p",
    "sin", "cos", "tan", "asin", "acos", "atan",
    "sinh", "cosh", "tanh", "asinh", "acosh", "atanh", "cbrt",
    "ceil", "floor", "round", "trunc", "signum",
    "isinf", "isnan", "isfinite",
    "erf", "erfc", "lgamma", "tgamma", "frexpe", "frexps", "frexpx",
    "erfinv", "erfcinv",
    "positioni", "positioni1", "positionj", "positionj1",
    # numpy spillover
    "absolute", "negative", "positive", "reciprocal", "invert",
    "logical_not", "sign", "conj", "conjugate", "fabs", "square",
    "arccos", "arccosh", "arcsin", "arcsinh", "arctan", "arctanh",
    "deg2rad", "radians", "rad2deg", "degrees", "rint", "signbit",
    "spacing", "gamma",
]

BINARY_EXPECTED = [
    # core GraphBLAS
    "first", "second", "any", "pair", "plus", "minus", "rminus", "times",
    "truediv", "rtruediv", "div", "rdiv", "pow", "min", "max",
    "land", "lor", "lxor", "lxnor",
    "eq", "ne", "gt", "lt", "ge", "le",
    "iseq", "isne", "isgt", "islt", "isge", "isle",
    "atan2", "hypot", "fmod", "remainder", "copysign", "ldexp",
    "band", "bor", "bxor", "bxnor", "bget", "bset", "bclr", "bshift",
    "firsti", "firsti1", "firstj", "firstj1",
    "secondi", "secondi1", "secondj", "secondj1",
    # numpy spillover
    "add", "subtract", "multiply", "divide", "true_divide", "power",
    "maximum", "minimum", "greater", "greater_equal", "less", "less_equal",
    "equal", "not_equal", "arctan2", "bitwise_and", "bitwise_or",
    "bitwise_xor", "logical_and", "logical_or", "logical_xor",
    "float_power", "floor_divide", "floordiv", "rfloordiv", "rpow",
    "absfirst", "abssecond", "cmplx", "mod", "left_shift", "right_shift",
    "fmax", "fmin", "logaddexp", "logaddexp2", "gcd", "lcm", "nextafter",
]

MONOID_EXPECTED = [
    "plus", "times", "min", "max", "any", "land", "lor", "lxor", "lxnor",
    "band", "bor", "bxor", "bxnor",
    "add", "multiply", "maximum", "minimum", "logical_and", "logical_or",
    "logical_xor", "equal", "bitwise_and", "bitwise_or", "bitwise_xor",
    "fmax", "fmin", "hypot", "logaddexp", "logaddexp2",
]


def test_unary_registry_grid():
    missing = [n for n in UNARY_EXPECTED if n not in _UNARY]
    assert not missing, f"missing unary ops: {missing}"


def test_binary_registry_grid():
    missing = [n for n in BINARY_EXPECTED if n not in _BINARY]
    assert not missing, f"missing binary ops: {missing}"


def test_monoid_registry_grid():
    missing = [n for n in MONOID_EXPECTED if n not in _MONOID]
    assert not missing, f"missing monoids: {missing}"


def test_every_builtin_monoid_has_native_aggregate(spark):
    """100 TB contract: every built-in monoid reduces via a Spark
    aggregate expression (map-side partial agg), never the collect_list
    fallback reserved for user monoids without agg_fn."""
    for name in MONOID_EXPECTED:
        m = _MONOID[name]
        agg_expr = m.agg(F.lit(1.0), FP64)
        assert agg_expr is not None, name


# ---- numeric verification --------------------------------------------------

# name -> (python reference fn, input domain)
_D_DEFAULT = [0.5, 1.5, -2.25, 3.0]
_D_POS = [0.5, 1.5, 2.25, 3.0]
_D_UNIT = [-0.9, -0.5, 0.1, 0.8]
_D_GE1 = [1.0, 1.5, 2.25, 3.0]

UNARY_NUMERIC = {
    "identity": (lambda x: x, _D_DEFAULT),
    "ainv": (lambda x: -x, _D_DEFAULT),
    "minv": (lambda x: 1.0 / x, _D_DEFAULT),
    "abs": (abs, _D_DEFAULT),
    "absolute": (abs, _D_DEFAULT),
    "fabs": (abs, _D_DEFAULT),
    "negative": (lambda x: -x, _D_DEFAULT),
    "positive": (lambda x: x, _D_DEFAULT),
    "reciprocal": (lambda x: 1.0 / x, _D_DEFAULT),
    "sqrt": (math.sqrt, _D_POS),
    "exp": (math.exp, _D_DEFAULT),
    "exp2": (lambda x: 2.0 ** x, _D_DEFAULT),
    "expm1": (math.expm1, _D_DEFAULT),
    "log": (math.log, _D_POS),
    "log2": (math.log2, _D_POS),
    "log10": (math.log10, _D_POS),
    "log1p": (math.log1p, _D_POS),
    "sin": (math.sin, _D_DEFAULT), "cos": (math.cos, _D_DEFAULT),
    "tan": (math.tan, _D_DEFAULT),
    "asin": (math.asin, _D_UNIT), "acos": (math.acos, _D_UNIT),
    "atan": (math.atan, _D_DEFAULT),
    "arcsin": (math.asin, _D_UNIT), "arccos": (math.acos, _D_UNIT),
    "arctan": (math.atan, _D_DEFAULT),
    "sinh": (math.sinh, _D_DEFAULT), "cosh": (math.cosh, _D_DEFAULT),
    "tanh": (math.tanh, _D_DEFAULT),
    "asinh": (math.asinh, _D_DEFAULT), "arcsinh": (math.asinh, _D_DEFAULT),
    "acosh": (math.acosh, _D_GE1), "arccosh": (math.acosh, _D_GE1),
    "atanh": (math.atanh, _D_UNIT), "arctanh": (math.atanh, _D_UNIT),
    "cbrt": (lambda x: math.copysign(abs(x) ** (1 / 3), x), _D_DEFAULT),
    "signum": (lambda x: float(np.sign(x)), _D_DEFAULT),
    "sign": (lambda x: float(np.sign(x)), _D_DEFAULT),
    "square": (lambda x: x * x, _D_DEFAULT),
    "deg2rad": (math.radians, _D_DEFAULT),
    "radians": (math.radians, _D_DEFAULT),
    "rad2deg": (math.degrees, _D_DEFAULT),
    "degrees": (math.degrees, _D_DEFAULT),
    "rint": (lambda x: float(np.rint(x)), [0.5, 1.5, 2.5, -2.25]),
    "erf": (math.erf, _D_DEFAULT),
    "erfc": (math.erfc, _D_DEFAULT),
    "lgamma": (math.lgamma, _D_POS),
    "gamma": (math.gamma, _D_POS),
    "tgamma": (math.gamma, _D_POS),
    "spacing": (lambda x: float(np.spacing(x)), _D_DEFAULT),
    "frexpe": (lambda x: float(math.frexp(x)[1]), _D_DEFAULT),
    "frexps": (lambda x: math.frexp(x)[0], _D_DEFAULT),
    "frexpx": (lambda x: math.frexp(x)[0], _D_DEFAULT),
    # independent stdlib reference: erfinv(y) = probit((1+y)/2)/sqrt(2)
    "erfinv": (lambda y: _NORM.inv_cdf((1.0 + y) / 2.0) / math.sqrt(2.0),
               _D_UNIT),
    "erfcinv": (lambda y: _NORM.inv_cdf((2.0 - y) / 2.0) / math.sqrt(2.0),
                [0.1, 0.5, 1.0, 1.9]),
}

BINARY_NUMERIC = {
    "plus": (lambda x, y: x + y, None),
    "add": (lambda x, y: x + y, None),
    "minus": (lambda x, y: x - y, None),
    "subtract": (lambda x, y: x - y, None),
    "rminus": (lambda x, y: y - x, None),
    "times": (lambda x, y: x * y, None),
    "multiply": (lambda x, y: x * y, None),
    "truediv": (lambda x, y: x / y, None),
    "divide": (lambda x, y: x / y, None),
    "true_divide": (lambda x, y: x / y, None),
    "rtruediv": (lambda x, y: y / x, None),
    "pow": (lambda x, y: x ** y, "pos"),
    "power": (lambda x, y: x ** y, "pos"),
    "float_power": (lambda x, y: x ** y, "pos"),
    "min": (min, None), "minimum": (min, None),
    "max": (max, None), "maximum": (max, None),
    "atan2": (math.atan2, None), "arctan2": (math.atan2, None),
    "hypot": (math.hypot, None),
    "copysign": (math.copysign, None),
    "ldexp": (lambda x, y: x * 2.0 ** y, None),
    "fmod": (math.fmod, None),
    "mod": (lambda x, y: float(np.mod(x, y)), None),
    "floor_divide": (lambda x, y: float(np.floor_divide(x, y)), None),
    "logaddexp": (lambda x, y: float(np.logaddexp(x, y)), None),
    "logaddexp2": (lambda x, y: float(np.logaddexp2(x, y)), None),
    "fmax": (lambda x, y: float(np.fmax(x, y)), None),
    "fmin": (lambda x, y: float(np.fmin(x, y)), None),
    "nextafter": (lambda x, y: float(np.nextafter(x, y)), None),
}

BINARY_INT_NUMERIC = {
    "band": (lambda x, y: x & y,), "bitwise_and": (lambda x, y: x & y,),
    "bor": (lambda x, y: x | y,), "bitwise_or": (lambda x, y: x | y,),
    "bxor": (lambda x, y: x ^ y,), "bitwise_xor": (lambda x, y: x ^ y,),
    "bxnor": (lambda x, y: ~(x ^ y),),
    "bget": (lambda x, y: (x >> y) & 1,),
    "bset": (lambda x, y: x | (1 << y),),
    "bclr": (lambda x, y: x & ~(1 << y),),
    "bshift": (lambda x, y: x << y,),
    "left_shift": (lambda x, y: x << y,),
    "right_shift": (lambda x, y: x >> y,),
    "gcd": (math.gcd,), "lcm": (math.lcm,),
}


def test_gcd_lcm_column_fold(spark):
    """Round-6 port of gcd/lcm from pandas UDFs to a JVM-side aggregate
    fold: Fibonacci worst case (most Euclid steps for 64-bit), zeros,
    negatives, and an lcm whose quotient exceeds float53 exactness."""
    fib = [1, 1]
    while fib[-1] < (1 << 62):
        fib.append(fib[-1] + fib[-2])
    f_a, f_b = fib[-1], fib[-2]  # consecutive -> gcd 1, max steps
    cases = [
        (f_a, f_b, 1, None),
        (-12, 18, 6, 36),
        (9, 0, 9, 0),
        (0, 0, 0, 0),
        (1 << 62, 1 << 31, 1 << 31, 1 << 62),
        ((1 << 60) * 3, 3, 3, (1 << 60) * 3),
        (270, 192, 6, 8640),
    ]
    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b, _, _) in enumerate(cases)],
        "rid long, x long, y long")
    got_g = {r.rid: r.g for r in df.select(
        "rid", _BINARY["gcd"](F.col("x"), F.col("y"), INT64).alias("g"))
        .collect()}
    # lcm only where the product fits int64: the fib row's lcm overflows
    # and raises under ANSI (deliberate — numpy wraps silently, which is
    # a silently wrong answer)
    lcm_rows = [i for i, (_, _, _, wl) in enumerate(cases)
                if wl is not None]
    got_l = {r.rid: r.l for r in df.filter(F.col("rid").isin(lcm_rows))
             .select("rid", _BINARY["lcm"](F.col("x"), F.col("y"), INT64)
                     .alias("l")).collect()}
    for i, (a, b, want_g, want_l) in enumerate(cases):
        assert got_g[i] == want_g == math.gcd(a, b), (a, b, got_g[i])
        if want_l is not None:
            assert got_l[i] == want_l == math.lcm(a, b), (a, b, got_l[i])


def test_spacing_nextafter_bit_exact_edges(spark):
    """Round-7 port of spacing/nextafter from pandas UDFs to pure
    Column IEEE arithmetic: bit-exact vs numpy at the hard boundaries —
    exact powers of two (downward gap halves), the subnormal range and
    zero crossings (step 2^-1074), the smallest normal, the overflow
    edge, signed zeros, inf and nan."""
    maxd = 1.7976931348623157e308
    tiny = 2.0 ** -1074
    minn = 2.0 ** -1022
    xs = [1.0, -1.0, 2.0 ** 52, 2.0 ** -52, 1.5, -3.7e10, 0.0, -0.0,
          tiny, -tiny, 5 * tiny, minn, -minn, minn * 1.5, maxd, -maxd,
          float("inf"), float("-inf"), float("nan"), 1e-300, 0.1]
    df = spark.createDataFrame([(i, x) for i, x in enumerate(xs)],
                               "rid long, x double")
    got = {r.rid: r.s for r in df.select(
        "rid", _UNARY["spacing"](F.col("x"), FP64).alias("s")).collect()}
    for i, x in enumerate(xs):
        want = float(np.spacing(x))
        assert (math.isnan(want) and math.isnan(got[i])) or \
            got[i] == want, (x, got[i], want)
    ys = [float("inf"), float("-inf"), 0.0, 1.0, -1.0]
    pairs = [(x, y) for x in xs for y in ys]
    pdf = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(pairs)],
        "rid long, x double, y double")
    got2 = {r.rid: r.n for r in pdf.select(
        "rid", _BINARY["nextafter"](F.col("x"), F.col("y"), FP64)
        .alias("n")).collect()}
    for i, (a, b) in enumerate(pairs):
        want = float(np.nextafter(a, b))
        g = got2[i]
        if math.isnan(want):
            assert math.isnan(g), (a, b, g)
        else:
            assert g == want and math.copysign(1, g) \
                == math.copysign(1, want), (a, b, g, want)


def test_unary_numeric_grid(spark):
    names = sorted(UNARY_NUMERIC)
    cols, expected = [], []
    rows = []
    for k, name in enumerate(names):
        fn, domain = UNARY_NUMERIC[name]
        for x in domain:
            rows.append((len(rows), name, float(x), float(fn(x))))
    df = spark.createDataFrame(rows, "rid long, op string, x double, want double")
    exprs = [F.when(F.col("op") == name,
                    _UNARY[name](F.col("x"), FP64).cast("double"))
             for name in names]
    got = df.select("rid", "op", "want",
                    F.coalesce(*exprs).alias("got")).collect()
    bad = [(r.op, r.want, r.got) for r in got
           if not math.isclose(r.want, r.got, rel_tol=1e-9, abs_tol=1e-12)]
    assert not bad, bad[:10]


def test_gamma_lgamma_poles(spark):
    """C99/scipy pole semantics (round-6 advice): sin(pi*x) is ~1e-16
    (not 0) at nonpositive integers in float64, so without an explicit
    branch the reflection formula returns huge FINITE values there.
    lgamma -> +inf at 0, -1, -2, …; gamma -> +inf at 0, nan at negative
    integers; nearby non-integer points stay on the reflection path."""
    df = spark.createDataFrame(
        [(i, float(x)) for i, x in
         enumerate([0.0, -1.0, -2.0, -5.0, -0.5, -1.5, 3.0])],
        "rid long, x double")
    got = {r.x: (r.lg, r.g) for r in df.select(
        "x",
        _UNARY["lgamma"](F.col("x"), FP64).cast("double").alias("lg"),
        _UNARY["gamma"](F.col("x"), FP64).cast("double").alias("g"))
        .collect()}
    for pole in (0.0, -1.0, -2.0, -5.0):
        assert math.isinf(got[pole][0]) and got[pole][0] > 0, (pole, got[pole])
    assert math.isinf(got[0.0][1]) and got[0.0][1] > 0
    for pole in (-1.0, -2.0, -5.0):
        assert math.isnan(got[pole][1]), (pole, got[pole])
    # non-integer points: Gamma(-0.5) = -2 sqrt(pi), Gamma(-1.5) = 4/3 sqrt(pi)
    assert math.isclose(got[-0.5][1], -2.0 * math.sqrt(math.pi),
                        rel_tol=1e-12)
    assert math.isclose(got[-1.5][1], 4.0 / 3.0 * math.sqrt(math.pi),
                        rel_tol=1e-12)
    assert math.isclose(got[-0.5][0], math.lgamma(-0.5), rel_tol=1e-12)
    assert math.isclose(got[3.0][1], 2.0, rel_tol=1e-12)


def test_binary_numeric_grid(spark):
    xs = [0.5, 1.5, -2.25, 3.0]
    ys = [2.0, -0.5, 1.25, 4.0]
    xs_pos = [0.5, 1.5, 2.25, 3.0]
    rows = []
    for name, (fn, domain) in sorted(BINARY_NUMERIC.items()):
        for x, y in zip(xs_pos if domain == "pos" else xs, ys):
            rows.append((len(rows), name, float(x), float(y),
                         float(fn(x, y))))
    df = spark.createDataFrame(
        rows, "rid long, op string, x double, y double, want double")
    names = sorted(BINARY_NUMERIC)
    exprs = [F.when(F.col("op") == name,
                    _BINARY[name](F.col("x"), F.col("y"), FP64)
                    .cast("double"))
             for name in names]
    got = df.select("op", "want", F.coalesce(*exprs).alias("got")).collect()
    bad = [(r.op, r.want, r.got) for r in got
           if not math.isclose(r.want, r.got, rel_tol=1e-9, abs_tol=1e-12)]
    assert not bad, bad[:10]


def test_binary_int_numeric_grid(spark):
    xs = [5, 12, 7, 9]
    ys = [1, 2, 3, 0]
    rows = []
    for name, (fn,) in sorted(BINARY_INT_NUMERIC.items()):
        for x, y in zip(xs, ys):
            rows.append((len(rows), name, x, y, int(fn(x, y))))
    df = spark.createDataFrame(
        rows, "rid long, op string, x long, y long, want long")
    names = sorted(BINARY_INT_NUMERIC)
    exprs = [F.when(F.col("op") == name,
                    _BINARY[name](F.col("x"), F.col("y"), INT64)
                    .cast("bigint"))
             for name in names]
    got = df.select("op", "want", F.coalesce(*exprs).alias("got")).collect()
    bad = [(r.op, r.want, r.got) for r in got if r.want != r.got]
    assert not bad, bad[:10]


def test_cmplx_real_inputs_end_to_end(spark):
    """binary.cmplx consumes REAL operands but emits complex values; the
    plans must not coerce its real inputs to complex storage. Exercises
    all three usage paths: ewise_mult, apply(right=scalar), ewise_add
    (union with real pass-through -> lifted to (v, 0))."""
    re_v = gb.Vector.from_values([0, 1, 2], [1.0, 2.0, 3.0], size=4)
    im_v = gb.Vector.from_values([0, 1, 3], [10.0, 20.0, 40.0], size=4)

    z = re_v.ewise_mult(im_v, binary.cmplx).new()
    assert z.dtype.name == "FC64"
    assert z.to_dict() == {0: complex(1, 10), 1: complex(2, 20)}

    za = re_v.apply(binary.cmplx, right=5.0).new()
    assert za.to_dict() == {0: complex(1, 5), 1: complex(2, 5),
                            2: complex(3, 5)}

    zu = re_v.ewise_add(im_v, binary.cmplx).new()
    assert zu.to_dict() == {0: complex(1, 10), 1: complex(2, 20),
                            2: complex(3, 0), 3: complex(40, 0)}


def test_erfinv_domain(spark):
    """erfinv: NaN strictly outside [-1, 1], +/-inf only at exactly +/-1
    (scipy.special.erfinv contract)."""
    v = gb.Vector.from_values(list(range(5)), [1.5, -2.0, 1.0, -1.0, 0.5])
    got = v.apply(unary.erfinv).new().to_dict()
    assert math.isnan(got[0]) and math.isnan(got[1])
    assert got[2] == math.inf and got[3] == -math.inf
    assert math.isclose(got[4], _NORM.inv_cdf(0.75) / math.sqrt(2.0),
                        rel_tol=1e-6)


def test_positional_unary_apply(v):
    got = v.apply(unary.positioni).new()
    assert got.to_dict() == {i: i for i in v.to_dict()}
    got1 = v.apply(unary.positioni1).new()
    assert got1.to_dict() == {i: i + 1 for i in v.to_dict()}


def test_numpy_monoid_reduce(spark):
    vals = [0.5, 1.5, 2.25, 3.0]
    v = gb.Vector.from_values(list(range(4)), vals)
    assert math.isclose(v.reduce(monoid.logaddexp).new().value,
                        np.logaddexp.reduce(vals), rel_tol=1e-9)
    assert math.isclose(v.reduce(monoid.hypot).new().value,
                        math.sqrt(sum(x * x for x in vals)), rel_tol=1e-9)
    nan_vals = [float("nan"), 2.0, float("nan"), 1.0]
    w = gb.Vector.from_values(list(range(4)), nan_vals)
    assert w.reduce(monoid.fmax).new().value == 2.0
    assert w.reduce(monoid.fmin).new().value == 1.0

"""GraphBLAS operator registry compiled to Spark Column expressions.

The reference delegates its operator vocabulary to the grblas registry
(imports at /root/reference/dask_grblas/vector.py:6, base.py:5): ~75 unary
ops, ~90 binary ops (incl. positional firsti/firstj/secondi/secondj),
monoids, and ~1000 named semirings (SURVEY.md section 2.2). Here every op is
a factory producing JVM-side Column expressions (whole-stage codegen — no
Python UDFs in the hot path):

- ``UnaryOp``   : Column -> Column
- ``BinaryOp``  : (Column, Column[, PositionalContext]) -> Column
- ``Monoid``    : BinaryOp + identity + a Spark *aggregate* expression, so
                  groupBy gets map-side partial aggregation for free
- ``Semiring``  : (Monoid, BinaryOp) pair — matmul compiles to
                  join(mult) + groupBy(monoid-agg)
- ``Aggregator``: composite reductions (count/mean/argmin/...), reference
                  dispatch at /root/reference/dask_grblas/expr.py:242-245

Namespaces mirror the grblas API: ``unary.abs``, ``binary.plus``,
``monoid.min``, ``semiring.plus_times`` (semirings resolved lazily by
name composition, like grblas' generated registry), ``agg.count``.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

from ..dtypes import (BOOL, FC32, FC64, FP32, FP64, INT64, GbType,
                      lookup_dtype, unify)
from ..exceptions import MonoidScaleWarning

__all__ = ["unary", "binary", "monoid", "semiring", "agg",
           "UnaryOp", "BinaryOp", "Monoid", "Semiring", "Aggregator",
           "PositionalContext", "get_typed_op", "get_semiring",
           "from_string", "register_unary", "register_binary",
           "register_monoid", "register_semiring"]


class PositionalContext:
    """Join-key columns for positional ops (firsti/firstj/secondi/secondj).

    In ``C[i,k] = A[i,j] op B[j,k]`` the first operand's indices are
    (ai=i, aj=j) and the second's are (bi=j, bj=k). For element-wise ops on
    vectors/matrices all positions coincide with the output key.
    """

    __slots__ = ("ai", "aj", "bi", "bj")

    def __init__(self, ai=None, aj=None, bi=None, bj=None):
        self.ai, self.aj, self.bi, self.bj = ai, aj, bi, bj


class _Op:
    __slots__ = ("name",)
    _ns = "op"

    def __repr__(self):
        # grblas repr convention ("unary.ainv"), reference
        # tests/from_grblas2/test_op.py:24-28
        return f"{self._ns}.{self.name}"

    def __getitem__(self, dtype):
        """grblas typed-op indexing (``binary.plus["INT64"]``). Here
        typing happens when the op is compiled against its operand
        columns, so indexing validates the dtype and returns the op —
        every call path then resolves the same way the typed grblas op
        would (reference test_resolving.py:117-123)."""
        lookup_dtype(dtype)
        return self


class UnaryOp(_Op):
    __slots__ = ("_build", "_out_dtype", "positional")
    _ns = "unary"

    def __init__(self, name, build, out_dtype=None, positional=False):
        self.name = name
        self._build = build
        self._out_dtype = out_dtype
        self.positional = positional

    def __call__(self, col: Column, dtype: GbType = FP64,
                 ctx: "PositionalContext | None" = None) -> Column:
        if self.positional:
            if ctx is None:
                raise ValueError(
                    f"unary.{self.name} is positional and needs index context")
            return self._build(col, dtype, ctx)
        if dtype.is_complex:
            impl = _COMPLEX_UNARY.get(self.name)
            if impl is not None:
                return impl(col, dtype)
            if self.name not in _COMPLEX_NATIVE_UNARY:
                raise TypeError(
                    f"unary.{self.name} does not support complex dtype "
                    f"{dtype.name} (supported: "
                    f"{sorted(_COMPLEX_UNARY) + sorted(_COMPLEX_NATIVE_UNARY)})")
        return self._build(col, dtype)

    def out_dtype(self, dtype: GbType) -> GbType:
        if self._out_dtype is None:
            return dtype
        if callable(self._out_dtype):
            return self._out_dtype(dtype)
        return self._out_dtype


class BinaryOp(_Op):
    __slots__ = ("_build", "_out_dtype", "positional", "real_inputs")
    _ns = "binary"

    def __init__(self, name, build, out_dtype=None, positional=False,
                 real_inputs=False):
        self.name = name
        self._build = build
        self._out_dtype = out_dtype
        self.positional = positional
        # real_inputs: the op CONSUMES real operands even when its output
        # dtype is complex (SuiteSparse GxB_CMPLX) — plans must not coerce
        # the operands to complex storage
        self.real_inputs = real_inputs

    def __call__(self, x: Column, y: Column, dtype: GbType = FP64,
                 ctx: PositionalContext | None = None) -> Column:
        if self.positional:
            if ctx is None:
                raise ValueError(
                    f"binary.{self.name} is positional and needs index context")
            return self._build(x, y, dtype, ctx)
        if dtype.is_complex:
            impl = _COMPLEX_BINARY.get(self.name)
            if impl is not None:
                return impl(x, y, dtype)
            if self.name not in _COMPLEX_NATIVE_BINARY:
                raise TypeError(
                    f"binary.{self.name} does not support complex dtype "
                    f"{dtype.name} (supported: "
                    f"{sorted(_COMPLEX_BINARY) + sorted(_COMPLEX_NATIVE_BINARY)})")
        return self._build(x, y, dtype)

    def out_dtype(self, a: GbType, b: GbType) -> GbType:
        if self._out_dtype is None:
            return unify(a, b)
        if callable(self._out_dtype):
            return self._out_dtype(a, b)
        return self._out_dtype


class Monoid(_Op):
    __slots__ = ("binaryop", "identity", "_agg")
    _ns = "monoid"

    def __init__(self, name, binaryop: BinaryOp, identity, agg):
        self.name = name
        self.binaryop = binaryop
        self.identity = identity
        self._agg = agg

    def __call__(self, x, y, dtype=FP64, ctx=None):
        return self.binaryop(x, y, dtype, ctx)

    def agg(self, col: Column, dtype: GbType) -> Column:
        """Spark aggregate expression folding `col` with this monoid."""
        if dtype.is_complex:
            impl = _COMPLEX_MONOID_AGG.get(self.name)
            if impl is None:
                raise TypeError(
                    f"monoid.{self.name} does not support complex dtype "
                    f"{dtype.name} (supported: {sorted(_COMPLEX_MONOID_AGG)})")
            return impl(col, dtype)
        return self._agg(col, dtype)

    def out_dtype(self, a: GbType, b: GbType = None) -> GbType:
        return self.binaryop.out_dtype(a, b if b is not None else a)


class Semiring(_Op):
    __slots__ = ("monoid", "binaryop")
    _ns = "semiring"

    def __init__(self, name, monoid_: Monoid, binaryop: BinaryOp):
        self.name = name
        self.monoid = monoid_
        self.binaryop = binaryop

    def out_dtype(self, a: GbType, b: GbType) -> GbType:
        mult_out = self.binaryop.out_dtype(a, b)
        return self.monoid.out_dtype(mult_out, mult_out)


class Aggregator(_Op):
    """Composite reduction that may need the value AND its index
    (argmin/argmax/first/last) — reference dispatches these separately
    (/root/reference/dask_grblas/expr.py:208-229, 287-291)."""

    __slots__ = ("_agg", "_out_dtype", "needs_index")
    _ns = "agg"

    def __init__(self, name, agg, out_dtype=None, needs_index=False):
        self.name = name
        self._agg = agg
        self._out_dtype = out_dtype
        self.needs_index = needs_index

    def agg(self, vcol: Column, dtype: GbType, icol: Column | None = None) -> Column:
        if self.needs_index:
            return self._agg(vcol, icol, dtype)
        return self._agg(vcol, dtype)

    def out_dtype(self, dtype: GbType) -> GbType:
        if self._out_dtype is None:
            return dtype
        if callable(self._out_dtype):
            return self._out_dtype(dtype)
        return self._out_dtype


# --------------------------------------------------------------------------
# helpers
# --------------------------------------------------------------------------

def _truthy(col: Column, dtype: GbType) -> Column:
    """GraphBLAS logical semantics on non-bool values: nonzero == true."""
    if dtype.is_bool:
        return col
    return col != F.lit(0)


def _cast(col: Column, dtype: GbType) -> Column:
    return col.cast(dtype.spark_type)


def _bool_out(_a, _b=None):
    return BOOL


def _float_out(a, b=None):
    u = unify(a, b) if b is not None else a
    return u if (u.is_float or u.is_complex) else FP64


class _Namespace:
    def __init__(self, name, registry):
        self._name = name
        self._registry = registry

    def __getattr__(self, item):
        try:
            return self._registry[item]
        except KeyError:
            raise AttributeError(f"{self._name} has no operator {item!r}") from None

    def __getitem__(self, item):
        return getattr(self, item)

    def __contains__(self, item):
        return item in self._registry

    def __iter__(self):
        return iter(sorted(self._registry))


# --------------------------------------------------------------------------
# unary ops
# --------------------------------------------------------------------------

_UNARY = {}


def _u(name, fn, out_dtype=None):
    _UNARY[name] = UnaryOp(name, fn, out_dtype)


_u("identity", lambda c, d: c)
_u("ainv", lambda c, d: _cast(-c, d))
_u("minv", lambda c, d: _cast(F.lit(1) / c, d))
_u("abs", lambda c, d: F.abs(c),
   lambda d: _complex_to_float(d))  # complex magnitude -> float partner
_u("one", lambda c, d: F.lit(1).cast(d.spark_type))
_u("lnot", lambda c, d: _cast(~_truthy(c, d), d) if not d.is_bool else ~c)
_u("bnot", lambda c, d: _cast(F.bitwise_not(c), d))
_u("sqrt", lambda c, d: F.sqrt(c), _float_out)
_u("exp", lambda c, d: F.exp(c), _float_out)
_u("exp2", lambda c, d: F.pow(F.lit(2.0), c), _float_out)
_u("expm1", lambda c, d: F.expm1(c), _float_out)
_u("log", lambda c, d: F.log(c), _float_out)
_u("log2", lambda c, d: F.log2(c), _float_out)
_u("log10", lambda c, d: F.log10(c), _float_out)
_u("log1p", lambda c, d: F.log1p(c), _float_out)
for _name, _fn in [("sin", F.sin), ("cos", F.cos), ("tan", F.tan),
                   ("asin", F.asin), ("acos", F.acos), ("atan", F.atan),
                   ("sinh", F.sinh), ("cosh", F.cosh), ("tanh", F.tanh),
                   ("asinh", F.asinh), ("acosh", F.acosh), ("atanh", F.atanh),
                   ("cbrt", F.cbrt)]:
    _u(_name, (lambda f: lambda c, d: f(c))(_fn), _float_out)
_u("ceil", lambda c, d: _cast(F.ceil(c), d))
_u("floor", lambda c, d: _cast(F.floor(c), d))
_u("round", lambda c, d: _cast(F.round(c), d))
_u("trunc", lambda c, d: _cast(c.cast("bigint"), d) if d.is_float else c)
_u("signum", lambda c, d: _cast(F.signum(c), d))
_u("isinf", lambda c, d: (F.abs(c) == F.lit(float("inf"))) if d.is_float
   else F.lit(False), _bool_out)
_u("isnan", lambda c, d: F.isnan(c) if d.is_float else F.lit(False), _bool_out)
_u("isfinite", lambda c, d: (~F.isnan(c) & (F.abs(c) != F.lit(float("inf"))))
   if d.is_float else F.lit(True), _bool_out)

# ---- numpy-spillover unary ops (grblas.unary.numpy parity; the reference
# inherits these from the grblas registry — tests/from_grblas2/
# test_numpyops.py:46-98). Aliases compile to the same Column expression.
for _alias, _base in [("absolute", "abs"), ("negative", "ainv"),
                      ("reciprocal", "minv"), ("invert", "bnot"),
                      ("logical_not", "lnot"), ("sign", "signum"),
                      ("arccos", "acos"), ("arccosh", "acosh"),
                      ("arcsin", "asin"), ("arcsinh", "asinh"),
                      ("arctan", "atan"), ("arctanh", "atanh")]:
    _UNARY[_alias] = UnaryOp(_alias, _UNARY[_base]._build,
                             _UNARY[_base]._out_dtype)
_u("positive", lambda c, d: c)
# conj/creal/cimag/carg: SuiteSparse FC ops (grblas unary registry); on
# real dtypes conj/creal are identity, cimag is 0, carg is atan2(0, x).
# Complex inputs dispatch to _COMPLEX_UNARY (struct<re,im> arithmetic).
_u("conj", lambda c, d: c)
_u("conjugate", lambda c, d: c)
_u("creal", lambda c, d: c, lambda d: _complex_to_float(d))
_u("cimag", lambda c, d: F.lit(0).cast(d.spark_type),
   lambda d: _complex_to_float(d))
_u("carg", lambda c, d: F.atan2(F.lit(0.0), c.cast("double")),
   lambda d: _complex_to_float(d) if d.is_complex else FP64)
_u("fabs", lambda c, d: F.abs(c.cast("double")), _float_out)
_u("square", lambda c, d: _cast(c * c, d))
_u("deg2rad", lambda c, d: F.radians(c), _float_out)
_u("radians", lambda c, d: F.radians(c), _float_out)
_u("rad2deg", lambda c, d: F.degrees(c), _float_out)
_u("degrees", lambda c, d: F.degrees(c), _float_out)
# numpy rint rounds half-to-EVEN — Spark's `rint` (JVM Math.rint), not
# F.round (half-up)
_u("rint", lambda c, d: F.call_function("rint", c.cast("double")), _float_out)
_u("signbit", lambda c, d: c < F.lit(0), _bool_out)
# frexp decomposition: x = frexps(x) * 2**frexpe(x), significand in
# [0.5, 1) — computed with log2/pow, no UDF (SuiteSparse GxB_FREXPE/S)
_frexpe_expr = lambda c: F.when(c == 0, F.lit(0.0)).otherwise(  # noqa: E731
    F.floor(F.log2(F.abs(c.cast("double")))) + 1)
_u("frexpe", lambda c, d: _frexpe_expr(c), _float_out)
_u("frexps", lambda c, d: F.when(c == 0, F.lit(0.0)).otherwise(
    c.cast("double") / F.pow(F.lit(2.0), _frexpe_expr(c))), _float_out)
# grblas exposes the mantissa as `frexpx` (SuiteSparse GxB_FREXPX)
_UNARY["frexpx"] = UnaryOp("frexpx", _UNARY["frexps"]._build, _float_out)


# IEEE-754 neighbor arithmetic (spacing / nextafter) in pure Column
# expressions — the last two pandas-UDF ops, ported in round 7 so the
# registry is 100% JVM-side. The trick: a float's ulp is 2^(e-52) for
# normal values and 2^-1074 in the subnormal range, and BOTH the
# neighbor step and the power of two are exactly representable, so
# plain double arithmetic reproduces the bit-level functions — no raw
# bit access needed. The exponent e comes from floor(log2|x|)
# SELF-CORRECTED by two exact power-of-two comparisons (log2 ulps can
# floor wrong at exact powers of two; the correction makes it exact).
_TINY = 2.0 ** -1074      # smallest subnormal = subnormal spacing
_MINNORM = 2.0 ** -1022   # smallest normal
_MAXD = 1.7976931348623157e308
_NAN = float("nan")
_INF = float("inf")


def _exact_exp2(ax):
    """floor(log2(ax)) as an exact bigint for finite ax > 0."""
    g0 = F.floor(F.log2(ax))
    g1 = F.when(F.pow(F.lit(2.0), g0) > ax, g0 - 1).otherwise(g0)
    return F.when(F.pow(F.lit(2.0), g1 + 1) <= ax, g1 + 1).otherwise(g1)


def _spacing_expr(c, d=None):
    """numpy.spacing: signed gap to the adjacent float away from zero.
    spacing(±0.0) = +2^-1074 (numpy ignores zero's sign bit),
    spacing(±inf/nan) = nan."""
    x = c.cast("double")
    ax = F.abs(x)
    gap = F.when(ax >= F.lit(_MINNORM),
                 F.pow(F.lit(2.0), _exact_exp2(ax) - 52)) \
           .otherwise(F.lit(_TINY))
    neg = x < 0
    # numpy defines spacing(x) = nextafter(x, copysign(inf, x)) - x, so
    # at ±maxdouble the next step overflows and spacing is ±inf
    return (F.when(F.isnan(x) | (ax == F.lit(_INF)), F.lit(_NAN))
             .when(ax == F.lit(_MAXD),
                   F.when(neg, F.lit(-_INF)).otherwise(F.lit(_INF)))
             .otherwise(F.when(neg, -gap).otherwise(gap)))


def _nextafter_expr(xc, yc, d=None):
    """numpy/IEEE nextafter(x, y): the adjacent double from x toward y.
    Exact at power-of-two boundaries (downward gap halves), across the
    subnormal range and zero (step 2^-1074), and at the overflow edge
    (maxdouble + 2^971 rounds to +inf, which IS nextafter's answer)."""
    x = xc.cast("double")
    y = yc.cast("double")
    ax = F.abs(x)
    g = _exact_exp2(ax)
    is_sub = ax < F.lit(_MINNORM)   # includes zero
    gap_away = F.when(is_sub, F.lit(_TINY)) \
                .otherwise(F.pow(F.lit(2.0), g - 52))
    is_pow2 = (~is_sub) & (F.pow(F.lit(2.0), g) == ax)
    # at 2^-1022 the halved downward gap underflows past the subnormal
    # spacing — greatest() floors it there
    gap_toward = F.when(is_sub, F.lit(_TINY)) \
                  .when(is_pow2, F.greatest(F.pow(F.lit(2.0), g - 53),
                                            F.lit(_TINY))) \
                  .otherwise(F.pow(F.lit(2.0), g - 52))
    up = y > x
    away = (up & (x >= 0)) | ((~up) & (x <= 0))
    gap = F.when(away, gap_away).otherwise(gap_toward)
    step = F.when(up, gap).otherwise(-gap)
    raw = x + step
    # -tiny + tiny rounds to +0.0, but IEEE keeps the departing side's
    # sign when the step lands on zero: nextafter(-2^-1074, y>x) = -0.0
    res = F.when((raw == 0) & (x < 0), F.lit(-0.0)).otherwise(raw)
    return (F.when(F.isnan(x) | F.isnan(y), F.lit(_NAN))
             .when(x == y, y)
             .when(x == F.lit(_INF), F.lit(_MAXD))
             .when(x == F.lit(-_INF), F.lit(-_MAXD))
             .otherwise(res))


# erf/erfc: Cody's rational Chebyshev approximations (netlib specfun
# CALERF, Math. Comp. 1969 — public domain), ~1.2e-16 relative: three
# regions of plain Horner arithmetic + the exp(-y^2) accuracy split, so
# both ops stay inside whole-stage codegen instead of a pandas UDF.
_CODY_A = (3.16112374387056560e0, 1.13864154151050156e2,
           3.77485237685302021e2, 3.20937758913846947e3,
           1.85777706184603153e-1)
_CODY_B = (2.36012909523441209e1, 2.44024637934444173e2,
           1.28261652607737228e3, 2.84423683343917062e3)
_CODY_C = (5.64188496988670089e-1, 8.88314979438837594e0,
           6.61191906371416295e1, 2.98635138197400131e2,
           8.81952221241769090e2, 1.71204761263407058e3,
           2.05107837782607147e3, 1.23033935479799725e3,
           2.15311535474403846e-8)
_CODY_D = (1.57449261107098347e1, 1.17693950891312499e2,
           5.37181101862009858e2, 1.62138957456669019e3,
           3.29079923573345963e3, 4.36261909014324716e3,
           3.43936767414372164e3, 1.23033935480374942e3)
_CODY_P = (3.05326634961232344e-1, 3.60344899949804439e-1,
           1.25781726111229246e-1, 1.60837851487422766e-2,
           6.58749161529837803e-4, 1.63153871373020978e-2)
_CODY_Q = (2.56852019228982242e0, 1.87295284992346047e0,
           5.27905102951428412e-1, 6.05183413124413191e-2,
           2.33520497626869185e-3)
_SQRPI = 5.6418958354775628695e-1  # 1/sqrt(pi)


def _erf_central(x):
    """erf(x) for |x| <= 0.46875: x * P1(x^2)/Q1(x^2)."""
    z = x * x
    num = F.lit(_CODY_A[4]) * z
    den = z
    for i in range(3):
        num = (num + F.lit(_CODY_A[i])) * z
        den = (den + F.lit(_CODY_B[i])) * z
    return x * (num + F.lit(_CODY_A[3])) / (den + F.lit(_CODY_B[3]))


def _erfc_pos(y):
    """erfc(y) for y > 0.46875 (y strictly positive). The exp(-y^2)
    factor is split exp(-t^2)*exp(-(y-t)(y+t)) with t = trunc(16y)/16 so
    the argument reduction never loses low bits of y^2."""
    num2 = F.lit(_CODY_C[8]) * y
    den2 = y
    for i in range(7):
        num2 = (num2 + F.lit(_CODY_C[i])) * y
        den2 = (den2 + F.lit(_CODY_D[i])) * y
    r2 = (num2 + F.lit(_CODY_C[7])) / (den2 + F.lit(_CODY_D[7]))
    z = F.lit(1.0) / (y * y)
    num3 = F.lit(_CODY_P[5]) * z
    den3 = z
    for i in range(4):
        num3 = (num3 + F.lit(_CODY_P[i])) * z
        den3 = (den3 + F.lit(_CODY_Q[i])) * z
    r3 = z * (num3 + F.lit(_CODY_P[4])) / (den3 + F.lit(_CODY_Q[4]))
    r3 = (F.lit(_SQRPI) - r3) / y
    rat = F.when(y <= 4.0, r2).otherwise(r3)
    t = F.floor(y * 16.0) / 16.0
    e = F.exp(-t * t) * F.exp(-(y - t) * (y + t))
    return e * rat


def _erf_expr(c, d):
    x = c.cast("double")
    y = F.abs(x)
    tail = F.lit(1.0) - _erfc_pos(y)
    return F.when(y <= 0.46875, _erf_central(x)) \
            .otherwise(F.when(x < 0, -tail).otherwise(tail))


def _erfc_expr(c, d):
    x = c.cast("double")
    y = F.abs(x)
    return (F.when(y <= 0.46875, F.lit(1.0) - _erf_central(x))
             .when(x < 0, F.lit(2.0) - _erfc_pos(y))
             .otherwise(_erfc_pos(y)))


_u("erf", _erf_expr, _float_out)
_u("erfc", _erfc_expr, _float_out)

# lgamma/gamma: Lanczos approximation (g=7, n=9 — Numerical Recipes /
# Boost-documented public constants, ~1e-13 relative) + sin(pi x)
# reflection for the left half-plane. Pure Column arithmetic.
_LANCZOS_G = 7.0
_LANCZOS_C = (0.99999999999980993, 676.5203681218851, -1259.1392167224028,
              771.32342877765313, -176.61502916214059, 12.507343278686905,
              -0.13857109526572012, 9.9843695780195716e-6,
              1.5056327351493116e-7)
_HALF_LOG_2PI = 0.9189385332046727  # log(2*pi)/2


def _lgamma_pos(x):
    """log Gamma(x) for x > 0.5 (Lanczos, shifted w = x - 1)."""
    w = x - F.lit(1.0)
    series = F.lit(_LANCZOS_C[0])
    for i in range(1, 9):
        series = series + F.lit(_LANCZOS_C[i]) / (w + F.lit(float(i)))
    t = w + F.lit(_LANCZOS_G + 0.5)
    return (F.lit(_HALF_LOG_2PI) + (w + F.lit(0.5)) * F.log(t) - t
            + F.log(series))


_PI = 3.141592653589793


def _lgamma_expr(c, d):
    x = c.cast("double")
    # poles first: sin(pi*x) evaluates to ~1e-16 (not 0) at negative
    # integers in float64, so without the explicit branch the reflection
    # returns a finite ~36 instead of the C99/scipy +inf at 0, -1, -2, …
    pole = (x <= 0) & (F.floor(x) == x)
    # reflection: lgamma(x) = log(pi/|sin(pi x)|) - lgamma(1-x), x <= 0.5
    refl = (F.log(F.lit(_PI) / F.abs(F.sin(F.lit(_PI) * x)))
            - _lgamma_pos(F.lit(1.0) - x))
    return (F.when(pole, F.lit(float("inf")))
             .when(x > 0.5, _lgamma_pos(x)).otherwise(refl))


def _gamma_expr(c, d):
    x = c.cast("double")
    # poles: C99 tgamma/scipy.special.gamma give +-inf at 0 (sign of the
    # approach direction; +inf for the +0.0 literal) and nan at negative
    # integers — the float64 reflection would otherwise return a huge
    # finite value there (sin(pi*x) ~ 1e-16, not 0)
    zero_pole = x == 0
    neg_pole = (x < 0) & (F.floor(x) == x)
    # reflection keeps the SIGN: Gamma(x) = pi / (sin(pi x) Gamma(1-x))
    refl = F.lit(_PI) / (F.sin(F.lit(_PI) * x)
                         * F.exp(_lgamma_pos(F.lit(1.0) - x)))
    return (F.when(zero_pole, F.lit(float("inf")))
             .when(neg_pole, F.lit(float("nan")))
             .when(x > 0.5, F.exp(_lgamma_pos(x))).otherwise(refl))


_u("lgamma", _lgamma_expr, _float_out)
_u("spacing", _spacing_expr, _float_out)


# Wichura's AS241 / PPND16 (Algorithm AS 241, Applied Statistics 1988):
# inverse normal CDF as a three-region rational polynomial. Pure
# log/sqrt/Horner arithmetic, so erfinv/erfcinv stay inside whole-stage
# codegen (no Python at all), and it is the SAME algorithm Python's
# statistics.NormalDist.inv_cdf uses — agreement to machine precision.
_PPND16_A = (3.3871328727963666080e0, 1.3314166789178437745e2,
             1.9715909503065514427e3, 1.3731693765509461125e4,
             4.5921953931549871457e4, 6.7265770927008700853e4,
             3.3430575583588128105e4, 2.5090809287301226727e3)
_PPND16_B = (1.0, 4.2313330701600911252e1, 6.8718700749205790830e2,
             5.3941960214247511077e3, 2.1213794301586595867e4,
             3.9307895800092710610e4, 2.8729085735721942674e4,
             5.2264952788528545610e3)
_PPND16_C = (1.42343711074968357734e0, 4.63033784615654529590e0,
             5.76949722146069140550e0, 3.64784832476320460504e0,
             1.27045825245236838258e0, 2.41780725177450611770e-1,
             2.27238449892691845833e-2, 7.74545014278341407640e-4)
_PPND16_D = (1.0, 2.05319162663775882187e0, 1.67638483018380384940e0,
             6.89767334985100004550e-1, 1.48103976427480074590e-1,
             1.51986665636164571966e-2, 5.47593808499534494600e-4,
             1.05075007164441684324e-9)
_PPND16_E = (6.65790464350110377720e0, 5.46378491116411436990e0,
             1.78482653991729133580e0, 2.96560571828504891230e-1,
             2.65321895265761230930e-2, 1.24266094738807843860e-3,
             2.71155556874348757815e-5, 2.01033439929228813265e-7)
_PPND16_F = (1.0, 5.99832206555887937690e-1, 1.36929880922735805310e-1,
             1.48753612908506148525e-2, 7.86869131145613259100e-4,
             1.84631831751005468180e-5, 1.42151175831644588870e-7,
             2.04426310338993978564e-15)


def _horner(s, coeffs):
    expr = F.lit(coeffs[-1])
    for cf in reversed(coeffs[:-1]):
        expr = expr * s + F.lit(cf)
    return expr


def _ppnd16_cols(q, r):
    """Column-expression PPND16: x with Phi(x) = p, given q = p - 0.5
    and r = min(p, 1 - p). The CALLER computes r with exact cancellation
    (e.g. (1 - |y|)/2 via Sterbenz) so the tail keeps full precision."""
    rr = F.sqrt(-F.log(r))
    s_mid = rr - F.lit(1.6)
    s_far = rr - F.lit(5.0)
    tail = F.when(rr <= 5.0,
                  _horner(s_mid, _PPND16_C) / _horner(s_mid, _PPND16_D)) \
            .otherwise(_horner(s_far, _PPND16_E) / _horner(s_far, _PPND16_F))
    tail = F.when(q < 0, -tail).otherwise(tail)
    rc = F.lit(0.180625) - q * q
    central = q * _horner(rc, _PPND16_A) / _horner(rc, _PPND16_B)
    return F.when(F.abs(q) <= 0.425, central).otherwise(tail)


def _erfinv_expr(complement):
    """erfinv(y) = ppnd16((1+y)/2)/sqrt(2); erfcinv via the exact tail
    identities q = (1-y)/2, r = min(y, 2-y)/2. NaN strictly outside the
    domain, +-inf at the closed endpoints (scipy.special contract)."""
    def build(c, d):
        y = c.cast("double")
        if not complement:
            q = y / F.lit(2.0)
            # 1 - |y| is exact for 0.5 <= |y| <= 1 (Sterbenz), the only
            # range where the tail branch reads r
            r = (F.lit(1.0) - F.abs(y)) / F.lit(2.0)
            in_domain = (y > -1.0) & (y < 1.0)
            at_pinf, at_ninf = y == 1.0, y == -1.0
        else:
            q = (F.lit(1.0) - y) / F.lit(2.0)
            r = F.least(y, F.lit(2.0) - y) / F.lit(2.0)
            in_domain = (y > 0.0) & (y < 2.0)
            at_pinf, at_ninf = y == 0.0, y == 2.0
        x = _ppnd16_cols(q, r) / F.lit(1.4142135623730951)
        return (F.when(at_pinf, F.lit(float("inf")))
                 .when(at_ninf, F.lit(float("-inf")))
                 .when(in_domain, x)
                 .otherwise(F.lit(float("nan"))))
    return build


_u("erfinv", _erfinv_expr(False), _float_out)
_u("erfcinv", _erfinv_expr(True), _float_out)
_u("gamma", _gamma_expr, _float_out)
_u("tgamma", _gamma_expr, _float_out)
# positional unary ops read the coordinate columns (grblas positioni/j)
_UNARY["positioni"] = UnaryOp("positioni",
                              lambda c, d, ctx: ctx.ai.cast("bigint"),
                              INT64, positional=True)
_UNARY["positioni1"] = UnaryOp("positioni1",
                               lambda c, d, ctx: ctx.ai.cast("bigint") + 1,
                               INT64, positional=True)
_UNARY["positionj"] = UnaryOp("positionj",
                              lambda c, d, ctx: ctx.aj.cast("bigint"),
                              INT64, positional=True)
_UNARY["positionj1"] = UnaryOp("positionj1",
                               lambda c, d, ctx: ctx.aj.cast("bigint") + 1,
                               INT64, positional=True)

unary = _Namespace("unary", _UNARY)


# --------------------------------------------------------------------------
# binary ops
# --------------------------------------------------------------------------

_BINARY = {}


def _b(name, fn, out_dtype=None, positional=False):
    _BINARY[name] = BinaryOp(name, fn, out_dtype, positional)


def _logical(py_name):
    def build(x, y, d):
        bx, by = _truthy(x, d), _truthy(y, d)
        if py_name == "land":
            r = bx & by
        elif py_name == "lor":
            r = bx | by
        elif py_name == "lxor":
            r = bx != by
        else:  # lxnor
            r = bx == by
        return r if d.is_bool else _cast(r, d)
    return build


_b("first", lambda x, y, d: x, lambda a, b: a)
_b("second", lambda x, y, d: y, lambda a, b: b)
_b("any", lambda x, y, d: x)
_b("pair", lambda x, y, d: F.lit(1).cast(d.spark_type))
_b("plus", lambda x, y, d: _cast(x + y, d))
_b("minus", lambda x, y, d: _cast(x - y, d))
_b("rminus", lambda x, y, d: _cast(y - x, d))
_b("times", lambda x, y, d: _cast(x * y, d))
_b("truediv", lambda x, y, d: x.cast("double") / y.cast("double"), _float_out)
_b("rtruediv", lambda x, y, d: y.cast("double") / x.cast("double"), _float_out)
# cdiv: C integer division (truncate toward zero) on ints, / on floats
_b("div", lambda x, y, d: (x / y) if d.is_float else _cast((x.cast("bigint") -
    (x.cast("bigint") % y.cast("bigint"))) / y.cast("bigint"), d))
_b("rdiv", lambda x, y, d: (y / x) if d.is_float else _cast((y.cast("bigint") -
    (y.cast("bigint") % x.cast("bigint"))) / x.cast("bigint"), d))
# grblas names the C-division pair cdiv/rcdiv (GrB_DIV is C semantics)
_BINARY["cdiv"] = BinaryOp("cdiv", _BINARY["div"]._build,
                           _BINARY["div"]._out_dtype)
_BINARY["rcdiv"] = BinaryOp("rcdiv", _BINARY["rdiv"]._build,
                            _BINARY["rdiv"]._out_dtype)
_b("pow", lambda x, y, d: _cast(F.pow(x, y), d) if not d.is_float else F.pow(x, y))
_b("min", lambda x, y, d: F.least(x, y))
_b("max", lambda x, y, d: F.greatest(x, y))
_b("land", _logical("land"))
_b("lor", _logical("lor"))
_b("lxor", _logical("lxor"))
_b("lxnor", _logical("lxnor"))
_b("eq", lambda x, y, d: x == y, _bool_out)
_b("ne", lambda x, y, d: x != y, _bool_out)
_b("gt", lambda x, y, d: x > y, _bool_out)
_b("lt", lambda x, y, d: x < y, _bool_out)
_b("ge", lambda x, y, d: x >= y, _bool_out)
_b("le", lambda x, y, d: x <= y, _bool_out)
_b("iseq", lambda x, y, d: _cast(x == y, d))
_b("isne", lambda x, y, d: _cast(x != y, d))
_b("isgt", lambda x, y, d: _cast(x > y, d))
_b("islt", lambda x, y, d: _cast(x < y, d))
_b("isge", lambda x, y, d: _cast(x >= y, d))
_b("isle", lambda x, y, d: _cast(x <= y, d))
_b("atan2", lambda x, y, d: F.atan2(x, y), _float_out)
_b("hypot", lambda x, y, d: F.hypot(x, y), _float_out)
_b("fmod", lambda x, y, d: x % y)
_b("remainder", lambda x, y, d: x - F.round(x / y) * y, _float_out)
_b("copysign", lambda x, y, d: F.abs(x) * F.when(y < 0, -1.0).otherwise(1.0), _float_out)
_b("ldexp", lambda x, y, d: x * F.pow(F.lit(2.0), y), _float_out)
_b("band", lambda x, y, d: _cast(x.bitwiseAND(y), d))
_b("bor", lambda x, y, d: _cast(x.bitwiseOR(y), d))
_b("bxor", lambda x, y, d: _cast(x.bitwiseXOR(y), d))
_b("bxnor", lambda x, y, d: _cast(F.bitwise_not(x.bitwiseXOR(y)), d))
# ---- bit-field ops (SuiteSparse GxB_BGET/BSET/BCLR/BSHIFT) ---------------
_b("bget", lambda x, y, d: _cast(
    (x.cast("bigint").bitwiseAND(
        F.call_function("shiftleft", F.lit(1).cast("bigint"), y.cast("int"))) != 0)
    .cast("bigint"), d))
_b("bset", lambda x, y, d: _cast(
    x.cast("bigint").bitwiseOR(
        F.call_function("shiftleft", F.lit(1).cast("bigint"), y.cast("int"))), d))
_b("bclr", lambda x, y, d: _cast(
    x.cast("bigint").bitwiseAND(F.bitwise_not(
        F.call_function("shiftleft", F.lit(1).cast("bigint"), y.cast("int")))), d))
_b("bshift", lambda x, y, d: _cast(
    F.when(y >= 0, F.call_function("shiftleft", x.cast("bigint"), y.cast("int")))
     .otherwise(F.call_function("shiftrightunsigned", x.cast("bigint"), (-y).cast("int"))), d))

# ---- numpy-spillover binary ops (grblas.binary.numpy parity; reference
# tests/from_grblas2/test_numpyops.py:99-171). Aliases share builders.
for _alias, _base in [("add", "plus"), ("subtract", "minus"),
                      ("multiply", "times"), ("divide", "truediv"),
                      ("true_divide", "truediv"), ("power", "pow"),
                      ("maximum", "max"), ("minimum", "min"),
                      ("greater", "gt"), ("greater_equal", "ge"),
                      ("less", "lt"), ("less_equal", "le"),
                      ("equal", "eq"), ("not_equal", "ne"),
                      ("arctan2", "atan2"), ("bitwise_and", "band"),
                      ("bitwise_or", "bor"), ("bitwise_xor", "bxor"),
                      ("logical_and", "land"), ("logical_or", "lor"),
                      ("logical_xor", "lxor")]:
    _BINARY[_alias] = BinaryOp(_alias, _BINARY[_base]._build,
                               _BINARY[_base]._out_dtype)
_b("float_power", lambda x, y, d: F.pow(x.cast("double"), y.cast("double")),
   _float_out)
_b("floor_divide", lambda x, y, d: _cast(F.floor(x / y), d))
_b("floordiv", lambda x, y, d: _cast(F.floor(x / y), d))
_b("rfloordiv", lambda x, y, d: _cast(F.floor(y / x), d))
_b("rpow", lambda x, y, d: _cast(F.pow(y, x), d) if not d.is_float
   else F.pow(y, x))
_b("absfirst", lambda x, y, d: F.abs(x))
_b("abssecond", lambda x, y, d: F.abs(y))
# cmplx(re, im) — SuiteSparse GxB_CMPLX: build a complex value from two
# real operands; FP32 inputs yield FC32, anything else FC64. `_cpx` is
# defined in the complex section below; builders run at call time.
_BINARY["cmplx"] = BinaryOp(
    "cmplx", lambda x, y, d: _cpx(d, x.cast("double"), y.cast("double")),
    lambda a, b: FC32 if (a.name == "FP32" and b.name == "FP32") else FC64,
    real_inputs=True)
# numpy mod: result takes the DIVISOR's sign (Spark % takes the dividend's)
_b("mod", lambda x, y, d: F.pmod(x, y))
_b("left_shift", lambda x, y, d: _cast(
    F.call_function("shiftleft", x.cast("bigint"), y.cast("int")), d))
_b("right_shift", lambda x, y, d: _cast(
    F.call_function("shiftright", x.cast("bigint"), y.cast("int")), d))
# NaN-ignoring extrema: Spark comparisons treat NaN as largest, so
# greatest() would PROPAGATE NaN where numpy fmax ignores it
_b("fmax", lambda x, y, d: F.when(F.isnan(x.cast("double")), y)
   .when(F.isnan(y.cast("double")), x).otherwise(F.greatest(x, y)))
_b("fmin", lambda x, y, d: F.when(F.isnan(x.cast("double")), y)
   .when(F.isnan(y.cast("double")), x).otherwise(F.least(x, y)))
# numerically stable log-sum-exp pair
_b("logaddexp", lambda x, y, d: F.greatest(x, y) + F.log1p(
    F.exp(-F.abs(x.cast("double") - y.cast("double")))), _float_out)
_b("logaddexp2", lambda x, y, d: F.greatest(x, y) + F.log2(
    F.lit(1.0) + F.pow(F.lit(2.0), -F.abs(x.cast("double")
                                          - y.cast("double")))), _float_out)


def _gcd_core(x, y):
    """|gcd| as a runtime FOLD (aggregate over a constant sequence): 92
    modulo steps cover the signed-64 worst case (consecutive Fibonacci
    numbers need ~90 divisions). The struct accumulator keeps the plan
    LINEAR in steps — a naively unrolled when-chain references each
    intermediate twice and doubles the expression tree per step. Stays
    JVM-side (higher-order-function evaluation), replacing the former
    Arrow pandas UDF."""
    a = F.abs(x.cast("bigint"))
    b = F.abs(y.cast("bigint"))
    return F.aggregate(
        F.sequence(F.lit(1), F.lit(92)),
        F.struct(a.alias("a"), b.alias("b")),
        lambda acc, _i: F.when(acc["b"] == 0, acc)
                         .otherwise(F.struct(
                             acc["b"].alias("a"),
                             F.pmod(acc["a"], acc["b"]).alias("b"))),
        lambda acc: acc["a"])


def _gcd_expr(x, y, d):
    return _gcd_core(x, y)


def _lcm_expr(x, y, d):
    # lcm = |a/g * b|, 0 when either input is 0 (numpy semantics). The
    # exact integer quotient uses decimal(38,0) division (g divides a,
    # so the result is integral; float division would round above 2^53).
    a = F.abs(x.cast("bigint"))
    b = F.abs(y.cast("bigint"))
    g = _gcd_core(x, y)
    q = (a.cast("decimal(38,0)") / g.cast("decimal(38,0)")).cast("bigint")
    return F.when(g == 0, F.lit(0).cast("bigint")).otherwise(q * b)


_b("gcd", _gcd_expr)
_b("lcm", _lcm_expr)
_b("nextafter", _nextafter_expr, _float_out)

# positional ops read join-key columns (reference: grblas firsti/firstj/...,
# SURVEY.md section 2.2 "positional ops read the join-key columns")
_b("firsti", lambda x, y, d, ctx: ctx.ai.cast("bigint"), INT64, positional=True)
_b("firsti1", lambda x, y, d, ctx: ctx.ai.cast("bigint") + 1, INT64,
   positional=True)
_b("firstj", lambda x, y, d, ctx: ctx.aj.cast("bigint"), INT64, positional=True)
_b("firstj1", lambda x, y, d, ctx: ctx.aj.cast("bigint") + 1, INT64,
   positional=True)
_b("secondi", lambda x, y, d, ctx: ctx.bi.cast("bigint"), INT64, positional=True)
_b("secondi1", lambda x, y, d, ctx: ctx.bi.cast("bigint") + 1, INT64,
   positional=True)
_b("secondj", lambda x, y, d, ctx: ctx.bj.cast("bigint"), INT64, positional=True)
_b("secondj1", lambda x, y, d, ctx: ctx.bj.cast("bigint") + 1, INT64,
   positional=True)

binary = _Namespace("binary", _BINARY)


# --------------------------------------------------------------------------
# monoids — each with a Spark aggregate expression (map-side combinable)
# --------------------------------------------------------------------------

_MONOID = {}


def _m(name, binop_name, identity, agg):
    _MONOID[name] = Monoid(name, _BINARY[binop_name], identity, agg)


def _prod_agg(col: Column, dtype: GbType) -> Column:
    """Product aggregate. Spark has no product(); for floats use the
    sign/log decomposition (constant state — scales to any group size);
    for ints fold a collected list exactly (group size = stored entries
    contributing to one output cell; switch wide int products to the
    float path at extreme scale)."""
    if dtype.is_float:
        any_zero = F.max(F.when(col == 0, 1).otherwise(0)) == 1
        neg_parity = F.sum(F.when(col < 0, 1).otherwise(0)) % 2
        mag = F.exp(F.sum(F.log(F.abs(F.when(col != 0, col)))))
        signed = F.when(neg_parity == 1, -mag).otherwise(mag)
        return F.when(any_zero, F.lit(0.0)).otherwise(signed).cast(dtype.spark_type)
    one = F.lit(1).cast("bigint")
    folded = F.aggregate(F.collect_list(col.cast("bigint")), one,
                         lambda acc, x: acc * x)
    return folded.cast(dtype.spark_type)


def _parity_sum(col: Column, dtype: GbType) -> Column:
    return F.sum(_truthy(col, dtype).cast("int"))


def _lxor_agg(col, dtype):
    r = (_parity_sum(col, dtype) % 2) == 1
    return r if dtype.is_bool else r.cast(dtype.spark_type)


def _lxnor_agg(col, dtype):
    # n-fold xnor == xor(all) when n odd, ~xor(all) when n even
    xor_all = (_parity_sum(col, dtype) % 2) == 1
    r = F.when(F.count(col) % 2 == 1, xor_all).otherwise(~xor_all)
    return r if dtype.is_bool else r.cast(dtype.spark_type)


def _bool_agg(which):
    def agg(col, dtype):
        c = _truthy(col, dtype)
        r = F.bool_and(c) if which == "and" else F.bool_or(c)
        return r if dtype.is_bool else r.cast(dtype.spark_type)
    return agg


def _bxnor_agg(col, dtype):
    xor_all = F.bit_xor(col)
    r = F.when(F.count(col) % 2 == 0, F.bitwise_not(xor_all)).otherwise(xor_all)
    return r.cast(dtype.spark_type)


_m("plus", "plus", 0, lambda c, d: F.sum(c).cast(d.spark_type))
_m("times", "times", 1, _prod_agg)
_m("min", "min", float("inf"), lambda c, d: F.min(c))
_m("max", "max", float("-inf"), lambda c, d: F.max(c))
_m("any", "any", None, lambda c, d: F.first(c))
_m("land", "land", True, _bool_agg("and"))
_m("lor", "lor", False, _bool_agg("or"))
_m("lxor", "lxor", False, _lxor_agg)
_m("lxnor", "lxnor", True, _lxnor_agg)
_m("band", "band", -1, lambda c, d: F.bit_and(c).cast(d.spark_type))
_m("bor", "bor", 0, lambda c, d: F.bit_or(c).cast(d.spark_type))
_m("bxor", "bxor", 0, lambda c, d: F.bit_xor(c).cast(d.spark_type))
_m("bxnor", "bxnor", -1, _bxnor_agg)

# numpy-named monoids (grblas.monoid.numpy parity, reference
# tests/from_grblas2/test_numpyops.py:219-256) — aliases reuse the native
# aggregate of the core monoid; the NaN-ignoring / log-sum-exp ones get
# their own aggregates.
for _alias, _base in [("add", "plus"), ("multiply", "times"),
                      ("maximum", "max"), ("minimum", "min"),
                      ("logical_and", "land"), ("logical_or", "lor"),
                      ("logical_xor", "lxor"), ("equal", "lxnor"),
                      ("bitwise_and", "band"), ("bitwise_or", "bor"),
                      ("bitwise_xor", "bxor")]:
    _bm = _MONOID[_base]
    _MONOID[_alias] = Monoid(_alias, _BINARY[_alias], _bm.identity, _bm._agg)


def _nan_ignoring_extreme(which):
    def agg(col, dtype):
        clean = F.when(F.isnan(col.cast("double")), None).otherwise(col)
        ext = F.max(clean) if which == "max" else F.min(clean)
        # all-NaN group -> NaN (numpy fmax.reduce semantics)
        return F.coalesce(ext, F.lit(float("nan")).cast(dtype.spark_type))
    return agg


_m("fmax", "fmax", float("nan"), _nan_ignoring_extreme("max"))
_m("fmin", "fmin", float("nan"), _nan_ignoring_extreme("min"))
_m("hypot", "hypot", 0.0,
   lambda c, d: F.sqrt(F.sum(c.cast("double") * c.cast("double"))))
# log-sum-exp monoids: single-pass form (no max-shift — a second agg pass
# can't nest); fine for the value ranges GraphBLAS reductions see
_m("logaddexp", "logaddexp", float("-inf"),
   lambda c, d: F.log(F.sum(F.exp(c.cast("double")))))
_m("logaddexp2", "logaddexp2", float("-inf"),
   lambda c, d: F.log2(F.sum(F.pow(F.lit(2.0), c.cast("double")))))

monoid = _Namespace("monoid", _MONOID)


# --------------------------------------------------------------------------
# complex (FC32/FC64) op implementations — SuiteSparse extension dtypes
# (reference: grblas FC32/FC64 behind dtypes._supports_complex, ops conj/
# creal/cimag/carg exercised by tests/from_grblas2/test_op.py). Stored as
# struct<re,im>; every implementation is a native Column expression, so
# complex arithmetic stays inside whole-stage codegen.
# --------------------------------------------------------------------------

def _cfloat(d: GbType) -> str:
    return "float" if d.name == "FC32" else "double"


def _cpx(d: GbType, re: Column, im: Column) -> Column:
    ft = _cfloat(d)
    return F.struct(re.cast(ft).alias("re"), im.cast(ft).alias("im"))


def _re(c: Column) -> Column:
    return c["re"].cast("double")


def _im(c: Column) -> Column:
    return c["im"].cast("double")


def _cmag(c: Column) -> Column:
    return F.sqrt(_re(c) * _re(c) + _im(c) * _im(c))


def _cplus(x, y, d):
    return _cpx(d, _re(x) + _re(y), _im(x) + _im(y))


def _cminus(x, y, d):
    return _cpx(d, _re(x) - _re(y), _im(x) - _im(y))


def _ctimes(x, y, d):
    return _cpx(d, _re(x) * _re(y) - _im(x) * _im(y),
                _re(x) * _im(y) + _im(x) * _re(y))


def _cdiv(x, y, d):
    den = _re(y) * _re(y) + _im(y) * _im(y)
    return _cpx(d, (_re(x) * _re(y) + _im(x) * _im(y)) / den,
                (_im(x) * _re(y) - _re(x) * _im(y)) / den)


_COMPLEX_BINARY = {
    "plus": _cplus,
    "add": _cplus,
    "minus": _cminus,
    "subtract": _cminus,
    "rminus": lambda x, y, d: _cminus(y, x, d),
    "times": _ctimes,
    "multiply": _ctimes,
    "truediv": _cdiv,
    "divide": _cdiv,
    "rtruediv": lambda x, y, d: _cdiv(y, x, d),
    "pair": lambda x, y, d: _cpx(d, F.lit(1.0), F.lit(0.0)),
    "oneb": lambda x, y, d: _cpx(d, F.lit(1.0), F.lit(0.0)),
    "iseq": lambda x, y, d: _cpx(d, (x == y).cast("double"), F.lit(0.0)),
    "isne": lambda x, y, d: _cpx(d, (x != y).cast("double"), F.lit(0.0)),
    # cmplx takes REAL operands (re, im) and produces the complex value;
    # it lands here because dispatch keys on the complex OUTPUT dtype.
    "cmplx": lambda x, y, d: _cpx(d, x.cast("double"), y.cast("double")),
}
# builders that already work on struct values unchanged (pass-through /
# native struct equality); eq/ne land here implicitly because their output
# dtype is BOOL, so the complex dispatch never triggers for them.
_COMPLEX_NATIVE_BINARY = {"first", "second", "any"}


_COMPLEX_UNARY = {
    "ainv": lambda c, d: _cpx(d, -_re(c), -_im(c)),
    "negative": lambda c, d: _cpx(d, -_re(c), -_im(c)),
    "conj": lambda c, d: _cpx(d, _re(c), -_im(c)),
    "conjugate": lambda c, d: _cpx(d, _re(c), -_im(c)),
    "one": lambda c, d: _cpx(d, F.lit(1.0), F.lit(0.0)),
    "minv": lambda c, d: _cdiv(_cpx(d, F.lit(1.0), F.lit(0.0)), c, d),
    "abs": lambda c, d: _cmag(c).cast(_cfloat(d)),
    "creal": lambda c, d: _re(c).cast(_cfloat(d)),
    "cimag": lambda c, d: _im(c).cast(_cfloat(d)),
    "carg": lambda c, d: F.atan2(_im(c), _re(c)).cast(_cfloat(d)),
    "exp": lambda c, d: _cpx(d, F.exp(_re(c)) * F.cos(_im(c)),
                             F.exp(_re(c)) * F.sin(_im(c))),
    "log": lambda c, d: _cpx(d, F.log(_cmag(c)), F.atan2(_im(c), _re(c))),
    "sqrt": lambda c, d: _cpx(
        d, F.sqrt(_cmag(c)) * F.cos(F.atan2(_im(c), _re(c)) / 2),
        F.sqrt(_cmag(c)) * F.sin(F.atan2(_im(c), _re(c)) / 2)),
}
_COMPLEX_NATIVE_UNARY = {"identity"}


def _complex_to_float(d: GbType) -> GbType:
    if not d.is_complex:
        return d
    return FP32 if d.name == "FC32" else FP64


def _complex_monoid_plus(col, d):
    return _cpx(d, F.sum(_re(col)), F.sum(_im(col)))


def _complex_monoid_times(col, d):
    """Complex product via the polar decomposition — constant aggregation
    state (sum of log-magnitudes + sum of angles), same scale contract as
    the float _prod_agg path."""
    any_zero = F.max(F.when(_cmag(col) == 0, 1).otherwise(0)) == 1
    logmag = F.sum(F.log(_cmag(col)))
    angle = F.sum(F.atan2(_im(col), _re(col)))
    mag = F.exp(logmag)
    out = _cpx(d, mag * F.cos(angle), mag * F.sin(angle))
    zero = _cpx(d, F.lit(0.0), F.lit(0.0))
    return F.when(any_zero, zero).otherwise(out)


_COMPLEX_MONOID_AGG = {
    "plus": _complex_monoid_plus,
    "add": _complex_monoid_plus,
    "times": _complex_monoid_times,
    "multiply": _complex_monoid_times,
    "any": lambda col, d: F.first(col),
}


# --------------------------------------------------------------------------
# semirings — resolved lazily by name: "<monoid>_<binaryop>"
# (mirrors grblas' generated ~1000-name registry, SURVEY.md section 2.2)
# --------------------------------------------------------------------------

class _SemiringNamespace(_Namespace):
    def __getattr__(self, item):
        if item.startswith("_"):
            raise AttributeError(item)
        reg = object.__getattribute__(self, "_registry")
        if item in reg:
            return reg[item]
        if "_" in item:
            mon_name, bin_name = item.split("_", 1)
            if mon_name in _MONOID and bin_name in _BINARY:
                sr = Semiring(item, _MONOID[mon_name], _BINARY[bin_name])
                reg[item] = sr
                return sr
        raise AttributeError(f"semiring has no operator {item!r}")


semiring = _SemiringNamespace("semiring", {})


def get_semiring(monoid_, binaryop) -> Semiring:
    """Compose a semiring from parts (grblas get_semiring analogue;
    reference test: tests/from_grblas2/test_op.py:794-828).

    Forgiving like the reference: a BinaryOp whose name is also a monoid
    is accepted in the monoid slot, and a Monoid in the binaryop slot
    contributes its binaryop — but a plainly switched (BinaryOp, Monoid)
    call is rejected."""
    if isinstance(monoid_, BinaryOp) and isinstance(binaryop, Monoid):
        raise TypeError(
            "expected (Monoid, BinaryOp) — did you mean to switch the "
            "arguments?")
    if isinstance(monoid_, BinaryOp):
        if monoid_.name not in _MONOID:
            raise TypeError(
                f"Monoid expected; binary.{monoid_.name} has no monoid")
        monoid_ = _MONOID[monoid_.name]
    if isinstance(binaryop, Monoid):
        binaryop = binaryop.binaryop
    if not isinstance(monoid_, Monoid):
        raise TypeError(f"Monoid expected, got {monoid_!r}")
    if not isinstance(binaryop, BinaryOp):
        raise TypeError(f"BinaryOp expected, got {binaryop!r}")
    return getattr(semiring, f"{monoid_.name}_{binaryop.name}")


# --------------------------------------------------------------------------
# string forms (grblas from_string; reference test_op.py:905-940) and the
# commutation table (grblas binary.*.commutes_to; test_op.py:845-903)
# --------------------------------------------------------------------------

_SYMBOL_UNARY = {"-": "ainv", "~": "lnot", "!": "lnot"}
_SYMBOL_BINARY = {"+": "plus", "-": "minus", "*": "times", "/": "truediv",
                  "//": "floordiv", "%": "mod", "**": "pow",
                  "<": "lt", ">": "gt", "<=": "le", ">=": "ge",
                  "==": "eq", "!=": "ne", "&": "land", "|": "lor",
                  "^": "lxor"}


def _split_dtype_suffix(string: str, kind: str) -> tuple[str, str | None]:
    """Split 'name[dtype]' -> (name, dtype); grblas error contract."""
    if "[" not in string:
        if "]" in string:
            raise ValueError(f'"]" in {string!r} not matched by "["')
        return string, None
    if string.count("[") > 1:
        raise ValueError(f'too many "[" in {string!r}')
    base, _, rest = string.partition("[")
    if "]" in base:
        raise ValueError(f'"]" in {string!r} not matched by "["')
    if not string.endswith("]") or "]" not in rest:
        raise ValueError(f'{string!r} does not end with "]"')
    return base, rest[:-1]


def _from_string(namespace_name: str, registry, symbols, string: str):
    base, dt = _split_dtype_suffix(string, namespace_name)
    name = symbols.get(base, base)
    if name not in registry:
        raise ValueError(f"Unknown {namespace_name} string: {string!r}")
    if dt is not None:
        lookup_dtype(dt)  # validate; typing happens at call time here
    return registry[name]


def _unary_from_string(string):
    return _from_string("unary", _UNARY, _SYMBOL_UNARY, string)


def _binary_from_string(string):
    return _from_string("binary", _BINARY, _SYMBOL_BINARY, string)


def _monoid_from_string(string):
    return _from_string("monoid", _MONOID, _SYMBOL_BINARY, string)


def _semiring_from_string(string):
    base, dt = _split_dtype_suffix(string, "semiring")
    if dt is not None:
        lookup_dtype(dt)
    parts = base.split(".")
    try:
        if len(parts) == 2:
            mon = _SYMBOL_BINARY.get(parts[0], parts[0])
            bop = _SYMBOL_BINARY.get(parts[1], parts[1])
            return getattr(semiring, f"{mon}_{bop}")
        if len(parts) == 1:
            return getattr(semiring, base)
    except AttributeError:
        pass
    raise ValueError(f"Bad semiring string: {string!r}")


def from_string(string: str):
    """Resolve any op string: unary symbol first, then binary, monoid,
    semiring (grblas op.from_string)."""
    for fn in (_unary_from_string, _binary_from_string,
               _monoid_from_string, _semiring_from_string):
        try:
            return fn(string)
        except ValueError:
            continue
    raise ValueError(f"Unknown op string: {string!r}")


unary.from_string = _unary_from_string
binary.from_string = _binary_from_string
monoid.from_string = _monoid_from_string
semiring.from_string = _semiring_from_string

# commutation table: commutes_to(op)(x, y) == op(y, x). Symmetric ops map
# to themselves; ordered pairs swap; position ops swap first<->second.
_COMMUTES_TO = {
    **{n: n for n in ("plus", "times", "pair", "any", "eq", "ne", "iseq",
                      "isne", "min", "max", "land", "lor", "lxor", "lxnor",
                      "fmax", "fmin", "band", "bor", "bxor", "bxnor",
                      "hypot", "logaddexp", "logaddexp2", "gcd", "lcm")},
    "minus": "rminus", "rminus": "minus",
    "truediv": "rtruediv", "rtruediv": "truediv",
    "div": "rdiv", "rdiv": "div", "cdiv": "rcdiv", "rcdiv": "cdiv",
    "floordiv": "rfloordiv", "rfloordiv": "floordiv",
    "pow": "rpow", "rpow": "pow",
    "lt": "gt", "gt": "lt", "le": "ge", "ge": "le",
    "islt": "isgt", "isgt": "islt", "isle": "isge", "isge": "isle",
    "first": "second", "second": "first",
    "firsti": "secondi", "secondi": "firsti",
    "firsti1": "secondi1", "secondi1": "firsti1",
    "firstj": "secondj", "secondj": "firstj",
    "firstj1": "secondj1", "secondj1": "firstj1",
    "absfirst": "abssecond", "abssecond": "absfirst",
}


def _commutes_to(self):
    name = _COMMUTES_TO.get(self.name)
    return _BINARY.get(name) if name is not None else None


BinaryOp.commutes_to = property(_commutes_to)
BinaryOp.is_commutative = property(
    lambda self: _COMMUTES_TO.get(self.name) == self.name)


# --------------------------------------------------------------------------
# aggregators (reference: grblas agg.*, dispatched at expr.py:242-245)
# --------------------------------------------------------------------------

_AGG = {}


def _a(name, fn, out_dtype=None, needs_index=False):
    _AGG[name] = Aggregator(name, fn, out_dtype, needs_index)


_a("count", lambda c, d: F.count(c), INT64)
_a("count_nonzero", lambda c, d: F.count(F.when(_truthy(c, d), 1)), INT64)
_a("count_zero", lambda c, d: F.count(F.when(~_truthy(c, d), 1)), INT64)
_a("sum", lambda c, d: F.sum(c).cast(d.spark_type))
_a("sum_of_squares", lambda c, d: F.sum(c * c).cast(d.spark_type))
_a("mean", lambda c, d: F.avg(c), FP64)
_a("peak_to_peak", lambda c, d: F.max(c) - F.min(c))
_a("stdp", lambda c, d: F.stddev_pop(c), FP64)
_a("stds", lambda c, d: F.stddev_samp(c), FP64)
_a("varp", lambda c, d: F.var_pop(c), FP64)
_a("vars", lambda c, d: F.var_samp(c), FP64)
_a("logaddexp", lambda c, d: F.log(F.sum(F.exp(c))), FP64)
_a("logaddexp2", lambda c, d: F.log2(F.sum(F.pow(F.lit(2.0), c))), FP64)
_a("hypot", lambda c, d: F.sqrt(F.sum(c * c)), FP64)
_a("L0norm", lambda c, d: F.count(F.when(_truthy(c, d), 1)), INT64)
_a("L1norm", lambda c, d: F.sum(F.abs(c)))
_a("L2norm", lambda c, d: F.sqrt(F.sum(c * c)), FP64)
_a("Linfnorm", lambda c, d: F.max(F.abs(c)))
# deterministic tie-break: smallest index among equal extrema (struct
# ordering is lexicographic, so (value, ±index) pins the winner; plain
# min_by/max_by are nondeterministic under ties — a silent hash-mismatch
# source on larger data)
_a("argmin", lambda c, i, d: F.min_by(i, F.struct(c, i)), INT64,
   needs_index=True)
_a("argmax", lambda c, i, d: F.max_by(i, F.struct(c, -i)), INT64,
   needs_index=True)
_a("first", lambda c, i, d: F.min_by(c, i), needs_index=True)
_a("last", lambda c, i, d: F.max_by(c, i), needs_index=True)
_a("first_index", lambda c, i, d: F.min(i), INT64, needs_index=True)
_a("last_index", lambda c, i, d: F.max(i), INT64, needs_index=True)
_a("any_value", lambda c, d: F.first(c))

agg = _Namespace("agg", _AGG)


# --------------------------------------------------------------------------
# user-defined operators (reference section 2.7: grblas
# UnaryOp.register_new / BinaryOp.register_new / Monoid.register_new,
# exercised at /root/reference/tests/from_grblas2/test_op.py:107-537).
# The numba-JIT path becomes "compose native Column expressions" — the
# JVM fast path; true Python lambdas should be wrapped in pandas_udf by
# the caller before registration.
# --------------------------------------------------------------------------

def _resolve_dtype_arg(out_dtype):
    if out_dtype is None or callable(out_dtype):
        return out_dtype
    return lookup_dtype(out_dtype)


def register_unary(name, func, *, out_dtype=None) -> UnaryOp:
    """Register a user unary op: func(Column) -> Column."""
    op = UnaryOp(name, lambda c, d: func(c), _resolve_dtype_arg(out_dtype))
    _UNARY[name] = op
    return op


def register_binary(name, func, *, out_dtype=None) -> BinaryOp:
    """Register a user binary op: func(Column, Column) -> Column."""
    op = BinaryOp(name, lambda x, y, d: func(x, y),
                  _resolve_dtype_arg(out_dtype))
    _BINARY[name] = op
    return op


def register_monoid(name, binaryop, identity, *, agg_fn=None) -> Monoid:
    """Register a user monoid (binary op + identity). Without a native
    agg_fn(Column, GbType) -> Column aggregate, folding falls back to
    F.aggregate over collect_list — correct for any associative op but a
    slow path (materializes the whole group per output cell); a
    MonoidScaleWarning is emitted so the fallback never ships silently.
    Supply agg_fn for scale."""
    import warnings

    if isinstance(binaryop, str):
        binaryop = _BINARY[binaryop]
    if agg_fn is None:
        warnings.warn(
            f"monoid {name!r} registered without a native agg_fn: "
            "reductions will collect each group into an array and fold it "
            "driver-style on the executor (O(group) memory per output "
            "cell). Pass agg_fn=lambda col, dtype: <Spark aggregate "
            "Column> for a map-side-combinable reduction.",
            MonoidScaleWarning, stacklevel=2)

        def agg_fn(col, dtype, _b=binaryop):
            return F.aggregate(
                F.collect_list(col),
                F.lit(identity).cast(dtype.spark_type),
                lambda acc, x: _b(acc, x, dtype).cast(dtype.spark_type))
        agg_fn._is_fallback = True
    mon = Monoid(name, binaryop, identity, agg_fn)
    _MONOID[name] = mon
    return mon


def register_semiring(name, monoid_, binaryop) -> Semiring:
    """Register a user semiring from a monoid and a multiply op."""
    if isinstance(monoid_, str):
        monoid_ = _MONOID[monoid_]
    if isinstance(binaryop, str):
        binaryop = _BINARY[binaryop]
    sr = Semiring(name, monoid_, binaryop)
    semiring._registry[name] = sr
    return sr


# grblas-style spelling: unary.register_new("name", func)
unary.register_new = register_unary
binary.register_new = register_binary
monoid.register_new = register_monoid
semiring.register_new = register_semiring


def get_typed_op(op, a: GbType, b: GbType | None = None):
    """Resolve an op given operand dtypes -> (op, out_dtype).

    Reference analogue: grblas get_typed_op via base.py:172-176. Accepts an
    op object or a registry name string ('plus', 'binary.plus', ...).
    """
    if isinstance(op, str):
        ns, _, name = op.rpartition(".")
        if ns == "unary":
            op = _UNARY[name]
        elif ns == "binary":
            op = _BINARY[name]
        elif ns == "monoid":
            op = _MONOID[name]
        elif ns == "semiring":
            op = getattr(semiring, name)
        else:
            for reg in (_BINARY, _MONOID, _UNARY):
                if name in reg:
                    op = reg[name]
                    break
            else:
                op = getattr(semiring, name)
    if isinstance(op, UnaryOp):
        return op, op.out_dtype(a)
    if isinstance(op, (Semiring,)):
        return op, op.out_dtype(a, b if b is not None else a)
    return op, op.out_dtype(a, b if b is not None else a)


# frozen snapshots of the BUILT-IN registries (taken at import, before any
# user register_* call) — invariants like "every monoid name is a binary
# name" are properties of the shipped vocabulary, not of whatever a user
# session registers later
BUILTIN_UNARY = frozenset(_UNARY)
BUILTIN_BINARY = frozenset(_BINARY)
BUILTIN_MONOIDS = frozenset(_MONOID)

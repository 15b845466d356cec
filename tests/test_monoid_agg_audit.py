"""Scale audit for the monoid registry (VERDICT r1 item 9).

Every built-in monoid must reduce through a NATIVE Spark aggregate
(map-side combinable, constant state) — never the collect_list fold the
user-registration fallback uses, which materializes the whole group per
output cell. The one documented exception is the exact integer product
path of ``times`` (group = entries contributing to one cell; the float
path uses the sign/log decomposition). Registering a user monoid without
``agg_fn`` must warn loudly.

Reference anchor: grblas monoid registry exercised at
/root/reference/tests/from_grblas2/test_op.py:31-61.
"""

import warnings

import pytest
from pyspark.sql import functions as F

from dask_grblas_spark import operators as ops
from dask_grblas_spark.dtypes import BOOL, FP64, INT64
from dask_grblas_spark.exceptions import MonoidScaleWarning

# monoids whose semantics are float-only (or whose int path is separately
# audited below)
_FLOAT_ONLY = {"fmax", "fmin", "hypot", "logaddexp", "logaddexp2"}
_BOOL_NATURED = {"land", "lor", "lxor", "lxnor",
                 "logical_and", "logical_or", "logical_xor", "equal"}


def _dtype_for(name):
    if name in _FLOAT_ONLY or name in ("times", "multiply"):
        return FP64
    if name in _BOOL_NATURED:
        return BOOL
    return INT64


@pytest.mark.parametrize("name", sorted(ops._MONOID))
def test_builtin_monoid_has_native_aggregate(spark, name):
    mon = ops._MONOID[name]
    assert not getattr(mon._agg, "_is_fallback", False), (
        f"built-in monoid {name} uses the collect_list fallback")
    expr = str(mon.agg(F.col("v"), _dtype_for(name)))
    assert "collect_list" not in expr, (
        f"built-in monoid {name} materializes its group: {expr}")


def test_times_int_path_is_the_only_fallback_shape(spark):
    """Exact integer product folds a collected list by design (documented
    in _prod_agg); the float path must stay native."""
    times = ops._MONOID["times"]
    assert "collect_list" in str(times.agg(F.col("v"), INT64))
    assert "collect_list" not in str(times.agg(F.col("v"), FP64))


def test_register_monoid_without_agg_fn_warns():
    with pytest.warns(MonoidScaleWarning, match="without a native agg_fn"):
        mon = ops.register_monoid("_audit_slow_max", "max", 0)
    assert getattr(mon._agg, "_is_fallback", False)
    ops._MONOID.pop("_audit_slow_max", None)


def test_register_monoid_with_agg_fn_is_silent_and_native(spark):
    with warnings.catch_warnings():
        warnings.simplefilter("error", MonoidScaleWarning)
        mon = ops.register_monoid(
            "_audit_fast_max", "max", 0,
            agg_fn=lambda c, d: F.max(c))
    assert not getattr(mon._agg, "_is_fallback", False)
    assert "collect_list" not in str(mon.agg(F.col("v"), INT64))
    ops._MONOID.pop("_audit_fast_max", None)

"""Reduction plans: monoid folds and composite Aggregators.

Reference: /root/reference/dask_grblas/expr.py:166-229, kernels 1844-1932
(SURVEY.md section 2.4). Catalyst performs partial (map-side) + final
aggregation automatically — the reference's hand-built
partial-per-chunk/ewise-combine tree is exactly what groupBy already does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..dtypes import GbType
from ..operators import Aggregator, Monoid


def _agg_expr(op, vcol, dtype: GbType, icol=None):
    if isinstance(op, Aggregator):
        return op.agg(vcol, dtype, icol)
    if isinstance(op, Monoid):
        return op.agg(vcol, dtype)
    raise TypeError(f"reduce needs a Monoid or Aggregator, got {op!r}")


def out_dtype_of(op, dtype: GbType) -> GbType:
    if isinstance(op, Aggregator):
        return op.out_dtype(dtype)
    return op.out_dtype(dtype, dtype)


def reduce_scalar(df: DataFrame, op, dtype: GbType, keys: list[str]) -> DataFrame:
    """Fold all stored values -> 0-or-1-row scalar DataFrame. An empty
    input must give an EMPTY scalar, not the monoid identity (reference:
    empty ⇒ empty Scalar, SURVEY.md R1) — plain .agg() on an empty frame
    yields one NULL row, so filter it out."""
    out_dt = out_dtype_of(op, dtype)
    icol = F.col(keys[0]) if keys else None
    out = df.agg(_agg_expr(op, F.col("v"), out_dt, icol)
                 .cast(out_dt.spark_type).alias("v"))
    return out.filter(F.col("v").isNotNull())


def reduce_rowwise(df: DataFrame, op, dtype: GbType) -> DataFrame:
    out_dt = out_dtype_of(op, dtype)
    return df.groupBy("i").agg(
        _agg_expr(op, F.col("v"), out_dt, F.col("j"))
        .cast(out_dt.spark_type).alias("v"))


def reduce_columnwise(df: DataFrame, op, dtype: GbType) -> DataFrame:
    out_dt = out_dtype_of(op, dtype)
    return (df.groupBy("j").agg(
                _agg_expr(op, F.col("v"), out_dt, F.col("i"))
                .cast(out_dt.spark_type).alias("v"))
              .withColumnRenamed("j", "i"))

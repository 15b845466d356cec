"""Element-wise plans: ewise_add (union), ewise_mult (intersection), apply.

Reference semantics: /root/reference/dask_grblas/vector.py:360-368,
matrix.py:439-447, exec kernels expr.py:1803-1841 (SURVEY.md section 2.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..dtypes import GbType
from ..operators import BinaryOp, PositionalContext
from .merge import _join_cond, union_merge


def ewise_add(a_df: DataFrame, b_df: DataFrame, keys: list[str],
              op: BinaryOp, out_dtype: GbType,
              a_dtype: GbType | None = None,
              b_dtype: GbType | None = None) -> DataFrame:
    """UNION merge: both present -> op(a,b); single present -> value passes
    through the op UNUSED (must still cast to the unified output dtype).

    Real-input / complex-output ops (binary.cmplx): the single-present
    branch cannot `cast(double as struct)` — lift real pass-throughs to
    complex storage as (v, 0) instead."""
    if op.positional:
        return _ewise_positional(a_df, b_df, keys, op, out_dtype, how="full_outer")

    def combine(lv, rv):
        return op(lv, rv, out_dtype)

    lift_l = lift_r = None
    if out_dtype.is_complex:
        from ..operators import _cpx

        def _lift(c):
            return _cpx(out_dtype, c.cast("double"), F.lit(0.0))

        if a_dtype is not None and not a_dtype.is_complex:
            lift_l = _lift
        if b_dtype is not None and not b_dtype.is_complex:
            lift_r = _lift

    merged = union_merge(a_df, b_df, keys, combine, lift_l=lift_l, lift_r=lift_r)
    return merged.select(*keys, F.col("v").cast(out_dtype.spark_type).alias("v"))


def ewise_mult(a_df: DataFrame, b_df: DataFrame, keys: list[str],
               op: BinaryOp, out_dtype: GbType) -> DataFrame:
    """INTERSECTION merge: inner join on the entry keys."""
    if op.positional:
        return _ewise_positional(a_df, b_df, keys, op, out_dtype, how="inner")
    a = a_df.alias("l")
    b = b_df.alias("r")
    val = op(F.col("l.v"), F.col("r.v"), out_dtype)
    return (a.join(b, _join_cond(keys), "inner")
             .select(*[F.col(f"l.{k}").alias(k) for k in keys],
                     val.cast(out_dtype.spark_type).alias("v")))


def _ewise_positional(a_df, b_df, keys, op, out_dtype, how):
    a = a_df.alias("l")
    b = b_df.alias("r")
    i_col = F.coalesce(F.col("l." + keys[0]), F.col("r." + keys[0]))
    j_col = (F.coalesce(F.col("l." + keys[1]), F.col("r." + keys[1]))
             if len(keys) > 1 else i_col)
    ctx = PositionalContext(ai=i_col, aj=j_col, bi=i_col, bj=j_col)
    val = op(F.col("l.v"), F.col("r.v"), out_dtype, ctx)
    j = a.join(b, _join_cond(keys), how)
    out_keys = [F.coalesce(F.col(f"l.{k}"), F.col(f"r.{k}")).alias(k) for k in keys]
    return j.select(*out_keys, val.cast(out_dtype.spark_type).alias("v"))


def apply_unary(df: DataFrame, keys: list[str], op, out_dtype: GbType,
                in_dtype: GbType) -> DataFrame:
    if getattr(op, "positional", False):
        # positioni/positionj read the coordinate columns; on a vector the
        # single key serves as both axes (grblas semantics)
        from ..operators import PositionalContext

        ctx = PositionalContext(ai=F.col(keys[0]), aj=F.col(keys[-1]))
        val = op(F.col("v"), in_dtype, ctx)
    else:
        val = op(F.col("v"), in_dtype)
    return df.select(*keys, val.cast(out_dtype.spark_type).alias("v"))


def apply_bound(df: DataFrame, keys: list[str], op: BinaryOp, out_dtype: GbType,
                scalar_df: DataFrame | None = None, scalar_lit=None,
                scalar_on_left: bool = False) -> DataFrame:
    """apply(binary_op, left=/right=scalar). A *lazy* scalar operand stays a
    1-row DataFrame: broadcast crossJoin keeps the whole plan lazy
    (reference: bound lazy Scalar, vector.py:430-442)."""
    if scalar_df is not None:
        df = df.crossJoin(F.broadcast(scalar_df.select(F.col("v").alias("_s"))))
        s = F.col("_s")
    elif out_dtype.is_complex and not getattr(op, "real_inputs", False):
        from ..dtypes import lit_storage
        s = lit_storage(scalar_lit, out_dtype)
    else:
        # real_inputs ops (cmplx) take PLAIN real scalars even though the
        # output dtype is complex storage
        s = F.lit(scalar_lit)
    x, y = (s, F.col("v")) if scalar_on_left else (F.col("v"), s)
    if op.positional:
        i = F.col(keys[0])
        j = F.col(keys[1]) if len(keys) > 1 else i
        ctx = PositionalContext(ai=i, aj=j, bi=i, bj=j)
        val = op(x, y, out_dtype, ctx)
    else:
        val = op(x, y, out_dtype)
    return df.select(*keys, val.cast(out_dtype.spark_type).alias("v"))

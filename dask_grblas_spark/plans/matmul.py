"""Semiring matrix-multiply plans: mxm / mxv / vxm (+ kronecker).

Reference semantics: C[i,k] = MONOID_j mult(A[i,j], B[j,k]) over stored
pairs only (/root/reference/dask_grblas/expr.py:86-164, 1961-2008). Spark
plan: equi-join on the contraction key + hash aggregate with the monoid's
aggregate expression — Catalyst gives partial (map-side) aggregation and
AQE picks broadcast vs shuffle join at runtime.

Mask pushdown (SURVEY.md section 4): a mask on the OUTPUT keys is applied
to the multiply pairs *before* the aggregation (semi/anti join on the
group keys). Catalyst will not invent this rewrite — done here by hand.
This both shrinks the shuffle and skips computing masked-out cells,
matching the reference's per-block masked matmul (expr.py:141-160).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..dtypes import GbType
from ..operators import PositionalContext, Semiring


def _maybe_broadcast(df: DataFrame, hint: bool) -> DataFrame:
    return F.broadcast(df) if hint else df


def _pushdown(pairs: DataFrame, keys: list[str], mask) -> DataFrame:
    """Mask pushdown below the aggregation. The broadcast decision is NOT
    made here: resolve_mask() already attached a broadcast hint iff the
    mask is provably small (core._BROADCAST_NVALS_LIMIT); a large/unknown
    mask joins as a plain shuffle semi-join — force-broadcasting a
    billion-key mask would be a 100x-scale driver OOM."""
    if mask is None:
        return pairs
    from .merge import check_mask_keys

    mask_keys, complement = mask
    check_mask_keys(mask_keys, keys)
    how = "left_anti" if complement else "left_semi"
    return pairs.join(mask_keys, on=keys, how=how)


def mxm(a_df: DataFrame, b_df: DataFrame, sr: Semiring,
        a_dtype: GbType, b_dtype: GbType, mask=None,
        broadcast_a: bool = False, broadcast_b: bool = False) -> DataFrame:
    mult_dtype = sr.binaryop.out_dtype(a_dtype, b_dtype)
    out_dtype = sr.monoid.out_dtype(mult_dtype, mult_dtype)
    a = _maybe_broadcast(a_df.alias("A"), broadcast_a)
    b = _maybe_broadcast(b_df.alias("B"), broadcast_b)
    ctx = PositionalContext(ai=F.col("A.i"), aj=F.col("A.j"),
                            bi=F.col("B.i"), bj=F.col("B.j"))
    mult = sr.binaryop(F.col("A.v"), F.col("B.v"), mult_dtype, ctx)
    pairs = (a.join(b, F.col("A.j") == F.col("B.i"))
              .select(F.col("A.i").alias("i"), F.col("B.j").alias("j"),
                      mult.alias("v")))
    pairs = _pushdown(pairs, ["i", "j"], mask)
    return (pairs.groupBy("i", "j")
                 .agg(sr.monoid.agg(F.col("v"), out_dtype).alias("v")))


def mxv(a_df: DataFrame, v_df: DataFrame, sr: Semiring,
        a_dtype: GbType, v_dtype: GbType, mask=None,
        broadcast_v: bool = True) -> DataFrame:
    """w[i] = MONOID_j mult(A[i,j], v[j]). The vector side is broadcast by
    default — in iterative algorithms the frontier is usually far smaller
    than the matrix; pass broadcast_v=False when the vector is huge."""
    mult_dtype = sr.binaryop.out_dtype(a_dtype, v_dtype)
    out_dtype = sr.monoid.out_dtype(mult_dtype, mult_dtype)
    a = a_df.alias("A")
    v = _maybe_broadcast(v_df.alias("B"), broadcast_v)
    ctx = PositionalContext(ai=F.col("A.i"), aj=F.col("A.j"),
                            bi=F.col("B.i"), bj=F.col("B.i"))
    mult = sr.binaryop(F.col("A.v"), F.col("B.v"), mult_dtype, ctx)
    pairs = (a.join(v, F.col("A.j") == F.col("B.i"))
              .select(F.col("A.i").alias("i"), mult.alias("v")))
    pairs = _pushdown(pairs, ["i"], mask)
    return pairs.groupBy("i").agg(sr.monoid.agg(F.col("v"), out_dtype).alias("v"))


def vxm(v_df: DataFrame, a_df: DataFrame, sr: Semiring,
        v_dtype: GbType, a_dtype: GbType, mask=None,
        broadcast_v: bool = True) -> DataFrame:
    """w[j] = MONOID_i mult(v[i], A[i,j]) (row vector times matrix)."""
    mult_dtype = sr.binaryop.out_dtype(v_dtype, a_dtype)
    out_dtype = sr.monoid.out_dtype(mult_dtype, mult_dtype)
    v = _maybe_broadcast(v_df.alias("A"), broadcast_v)
    a = a_df.alias("B")
    ctx = PositionalContext(ai=F.col("A.i"), aj=F.col("A.i"),
                            bi=F.col("B.i"), bj=F.col("B.j"))
    mult = sr.binaryop(F.col("A.v"), F.col("B.v"), mult_dtype, ctx)
    pairs = (v.join(a, F.col("A.i") == F.col("B.i"))
              .select(F.col("B.j").alias("i"), mult.alias("v")))
    pairs = _pushdown(pairs, ["i"], mask)
    return pairs.groupBy("i").agg(sr.monoid.agg(F.col("v"), out_dtype).alias("v"))


def kronecker(a_df: DataFrame, b_df: DataFrame, op, a_dtype: GbType,
              b_dtype: GbType, b_nrows: int, b_ncols: int) -> DataFrame:
    """C[ia*bn + ib, ja*bm + jb] = op(A[ia,ja], B[ib,jb]).

    The reference DECLARES kronecker but cannot execute it (dispatch gap,
    /root/reference/dask_grblas/matrix.py:461-464, expr.py:278-279); we
    implement it for full parity — a crossJoin is natural in Spark."""
    out_dtype = op.out_dtype(a_dtype, b_dtype)
    a = a_df.alias("A")
    b = b_df.alias("B")
    val = op(F.col("A.v"), F.col("B.v"), out_dtype)
    return a.crossJoin(b).select(
        (F.col("A.i") * b_nrows + F.col("B.i")).alias("i"),
        (F.col("A.j") * b_ncols + F.col("B.j")).alias("j"),
        val.cast(out_dtype.spark_type).alias("v"))

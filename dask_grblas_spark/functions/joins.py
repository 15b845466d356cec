"""Join utilities for skewed keys.

AQE's skew-join split handles most hot keys, but only at sort-merge
join time and only when statistics expose the skew; when the skewed
side feeds a window next, or the hot key is created mid-plan, an
explicit SALT is the standard fix. ``salted_join`` packages it: scatter
the big side's rows across ``salt`` sub-keys and replicate the other
side once per sub-key, so a key with 10^9 rows runs as ``salt`` tasks
instead of one. The result is row-identical to the plain join — salt
only routes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join", "range_join"]


def salted_join(left: DataFrame, right: DataFrame, on: str | list[str],
                salt: int = 8, how: str = "inner") -> DataFrame:
    """Equi-join with explicit skew salting: ``left`` (the big/skewed
    side) is scattered across ``salt`` sub-keys round-robin within each
    partition; ``right`` is replicated ``salt`` ways (a sequence
    explode — size the factor so salt x |right| stays shuffle-cheap).
    Row-identical to ``left.join(right, on, how)`` for inner and left
    joins (each left row joins exactly the replica carrying its salt)."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    keys = [on] if isinstance(on, str) else list(on)
    lsalt = F.pmod(F.monotonically_increasing_id(),
                   F.lit(salt)).cast("int")
    ls = left.withColumn("_salt", lsalt)
    rs = (right.withColumn(
              "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
               .withColumn("_salt", F.col("_salt").cast("int")))
    return ls.join(rs, on=keys + ["_salt"], how=how).drop("_salt")


def range_join(points: DataFrame, intervals: DataFrame, point_col: str,
               start_col: str, end_col: str,
               bucket_width: int) -> DataFrame:
    """Interval containment join (``start <= point < end``) without a
    cartesian product.

    Spark turns a pure inequality join into BroadcastNestedLoopJoin (or
    worse, a cartesian) — O(|P|·|I|) at 100 TB. This is the standard
    bucket-decomposition rewrite instead: points land in bucket
    ``floor(point / w)``; each interval is exploded to every bucket it
    overlaps; the join becomes an EQUI-join on the bucket id followed by
    the exact containment filter. A (point, interval) match is found in
    exactly one bucket — the point's — so the result needs no dedup and
    is row-identical to the naive inequality join.

    ``point_col``/``start_col``/``end_col`` must be integral (epoch
    micros for timestamps — ``F.unix_micros``). Choose ``bucket_width``
    at or above the typical interval length so the per-interval fan-out
    stays ~2; correctness does not depend on the choice. Shuffle: one
    exchange per side on the bucket id; AQE's skew split applies to hot
    buckets.
    """
    p = points.withColumn(
        "_rjb", (F.col(point_col) / F.lit(bucket_width)).cast("long"))
    iv = intervals.withColumn(
        "_rjb",
        F.explode(F.sequence(
            (F.col(start_col) / F.lit(bucket_width)).cast("long"),
            (F.col(end_col) / F.lit(bucket_width)).cast("long"))))
    out = p.join(iv, on="_rjb", how="inner").where(
        (F.col(point_col) >= F.col(start_col))
        & (F.col(point_col) < F.col(end_col)))
    return out.drop("_rjb")

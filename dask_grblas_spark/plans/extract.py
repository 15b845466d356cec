"""Extract (gather/slicing) plans + index resolution.

Reference: IndexerResolver /root/reference/dask_grblas/expr.py:422-563 and
the extract pipeline expr.py:1265-1444 (SURVEY.md section 2.5). Index forms:
int (incl. negative), list (duplicates allowed -> fan-out), slice (any
step), numpy array, or a distributed (pos, idx) DataFrame.

Spark mapping: a list/array index becomes a small (pos, idx) DataFrame and
extraction is one equi-join (broadcast — index lists are tiny next to the
data); a slice needs NO join at all: range predicate + reindex arithmetic,
fully pushed down to the scan. The reference's 'reorder fragments to index
order' stage (expr.py:1199-1245) has no physical analogue — the pos column
IS the output coordinate.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from ..exceptions import IndexOutOfBound


def _exact_div(num: Column, den: int) -> Column:
    """Integer-exact division of a LongType column by a literal (the
    callers guarantee num % den == 0). Plain `/` is double division,
    which rounds for |num| > 2^53 and silently corrupts positions at the
    extreme index range; decimal(38,0) arithmetic stays exact over the
    full int64 domain."""
    return (num.cast("decimal(38,0)") / F.lit(den).cast("decimal(38,0)")) \
        .cast("bigint")


class ResolvedIndex:
    """Normalized single-axis index.

    kind: 'int' | 'all' | 'pred' (slice) | 'df' (explicit list)
    """

    __slots__ = ("kind", "out_size", "value", "pred", "pos_of", "tgt_of", "df")

    def __init__(self, kind, out_size=None, value=None, pred=None,
                 pos_of=None, tgt_of=None, df=None):
        self.kind = kind
        self.out_size = out_size    # logical size of the extracted axis
        self.value = value          # for 'int'
        self.pred = pred            # Column -> Column membership predicate
        self.pos_of = pos_of        # Column -> Column: target index -> output pos
        self.tgt_of = tgt_of        # Column -> Column: output pos -> target index
        self.df = df                # (pos, idx) DataFrame for 'df'


def resolve_index(idx, size: int | None, spark: SparkSession) -> ResolvedIndex:
    """size may be None (from_dataframe wrappers carry no logical size):
    bounds checks are skipped and negative/reversed indexing — which needs
    a size to resolve — is rejected."""
    if isinstance(idx, (int, np.integer)):
        i = int(idx)
        if size is None:
            if i < 0:
                raise IndexOutOfBound("negative index requires a known size")
            return ResolvedIndex("int", value=i)
        if i < 0:
            i += size
        if not (0 <= i < size):
            raise IndexOutOfBound(f"index {idx} out of bounds for size {size}")
        return ResolvedIndex("int", value=i)
    if isinstance(idx, slice):
        if size is None:
            start, stop, step = idx.start, idx.stop, idx.step
            step = 1 if step is None else step
            start = 0 if start is None else start
            if step <= 0 or start < 0 or (stop is not None and stop < 0):
                raise IndexOutOfBound(
                    "negative or reversed slice requires a known size")
            if stop is None:
                if start == 0 and step == 1:
                    return ResolvedIndex("all", out_size=None,
                                         pred=lambda c: F.lit(True),
                                         pos_of=lambda c: c,
                                         tgt_of=lambda p: p)
                pred = lambda c: (c >= start) & ((c - start) % step == 0)  # noqa: E731
                pos_of = lambda c: _exact_div(c - start, step)  # noqa: E731
                tgt_of = lambda p: (p * step + start).cast("bigint")  # noqa: E731
                return ResolvedIndex("pred", out_size=None, pred=pred,
                                     pos_of=pos_of, tgt_of=tgt_of)
            length = len(range(start, stop, step))
            pred = lambda c: (c >= start) & (c < stop) & ((c - start) % step == 0)  # noqa: E731
            pos_of = lambda c: _exact_div(c - start, step)  # noqa: E731
            tgt_of = lambda p: (p * step + start).cast("bigint")  # noqa: E731
            return ResolvedIndex("pred", out_size=length, pred=pred,
                                 pos_of=pos_of, tgt_of=tgt_of)
        start, stop, step = idx.indices(size)
        length = len(range(start, stop, step))
        if start == 0 and stop == size and step == 1:
            return ResolvedIndex("all", out_size=size,
                                 pred=lambda c: F.lit(True),
                                 pos_of=lambda c: c, tgt_of=lambda p: p)
        if step > 0:
            pred = lambda c: (c >= start) & (c < stop) & ((c - start) % step == 0)  # noqa: E731
            pos_of = lambda c: _exact_div(c - start, step)  # noqa: E731
        else:
            pred = lambda c: (c <= start) & (c > stop) & ((start - c) % (-step) == 0)  # noqa: E731
            pos_of = lambda c: _exact_div(start - c, -step)  # noqa: E731
        tgt_of = lambda p: (p * step + start).cast("bigint")  # noqa: E731
        return ResolvedIndex("pred", out_size=length, pred=pred,
                             pos_of=pos_of, tgt_of=tgt_of)
    if isinstance(idx, DataFrame):
        cols = idx.columns
        if cols != ["pos", "idx"]:
            idx = idx.select(F.col(cols[0]).alias("pos"), F.col(cols[1]).alias("idx"))
        return ResolvedIndex("df", out_size=None, df=idx)
    arr = np.asarray(idx)
    if arr.ndim != 1 or arr.dtype.kind not in "iu":
        raise TypeError(f"Invalid index: {idx!r}")
    if size is None:
        # unknown logical size (from_dataframe wrapper): no bounds check;
        # negative indices need a known size to resolve
        if arr.size and arr.min() < 0:
            raise IndexOutOfBound("negative index requires a known size")
        arr = arr.astype("int64")
    else:
        arr = np.where(arr < 0, arr + size, arr).astype("int64")
        if arr.size and (arr.min() < 0 or arr.max() >= size):
            raise IndexOutOfBound(f"index out of bounds for size {size}")
    schema = T.StructType([T.StructField("pos", T.LongType(), False),
                           T.StructField("idx", T.LongType(), False)])
    df = spark.createDataFrame(
        [(int(p), int(v)) for p, v in enumerate(arr)], schema)
    return ResolvedIndex("df", out_size=int(arr.size), df=df)


def axis_gather(df: DataFrame, axis_col: str, rx: ResolvedIndex,
                pos_alias: str) -> DataFrame:
    """Apply one axis index for EXTRACT: rows filtered to the selection and
    the axis coordinate rewritten to the output position."""
    others = [c for c in df.columns if c != axis_col]
    if rx.kind == "int":
        return df.filter(F.col(axis_col) == rx.value).select(*others)
    if rx.kind == "all":
        return df.select(F.col(axis_col).alias(pos_alias), *others)
    if rx.kind == "pred":
        return (df.filter(rx.pred(F.col(axis_col)))
                  .select(rx.pos_of(F.col(axis_col)).alias(pos_alias), *others))
    # 'df': equi-join; duplicate indices fan out naturally (spec behavior)
    idx = rx.df.select(F.col("pos").alias("__pos"), F.col("idx").alias("__t"))
    return (df.join(F.broadcast(idx), df[axis_col] == F.col("__t"))
              .select(F.col("__pos").alias(pos_alias),
                      *[df[c] for c in others]))


def dedup_last_wins(idx_df: DataFrame) -> DataFrame:
    """Duplicate target indices in an ASSIGN index list: last occurrence
    wins (SuiteSparse spec; reference `_uniquify`
    /root/reference/dask_grblas/expr.py:1463-1499)."""
    w = Window.partitionBy("idx").orderBy(F.col("pos").desc())
    return (idx_df.withColumn("__rn", F.row_number().over(w))
                  .filter(F.col("__rn") == 1).drop("__rn"))

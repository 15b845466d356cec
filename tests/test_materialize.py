"""Size-gated materialization helper (r12 optimization): the gate must
keep small relations lazy (no plan truncation, no checkpoint job),
truncate big ones, and NEVER change results — the Apriori front end is
exercised under both branches as the integration proof."""

from pyspark.sql import functions as F

from dask_grblas_spark.functions.itemsets import frequent_pairs
from dask_grblas_spark.functions.materialize import (broadcast_if_small,
                                                     estimated_bytes,
                                                     materialize_if_large)


def _is_truncated(df) -> bool:
    """A localCheckpoint-ed DataFrame scans a materialized RDD
    (LogicalRDD / ExistingRDD) instead of its original lineage."""
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    return "LogicalRDD" in plan or "ExistingRDD" in plan


def test_small_relation_stays_lazy(spark):
    df = spark.range(100).select(F.col("id"), (F.col("id") % 7).alias("k"))
    out = materialize_if_large(df)
    assert out is df
    assert not _is_truncated(out)


def test_large_threshold_forces_checkpoint(spark):
    df = spark.range(100).select(F.col("id"), (F.col("id") % 7).alias("k"))
    out = materialize_if_large(df, threshold_bytes=0)
    assert out is not df
    assert _is_truncated(out)
    # identical content either way
    assert sorted(r["id"] for r in out.collect()) == list(range(100))


def test_estimate_is_positive_for_range(spark):
    est = estimated_bytes(spark.range(1000))
    assert est is not None and est > 0


def _has_broadcast_hint(df) -> bool:
    return "ResolvedHint" in df._jdf.queryExecution().analyzed().toString() \
        or "broadcast" in df._jdf.queryExecution().optimizedPlan() \
                            .toString().lower()


def test_broadcast_gate_keeps_hint_below_threshold(spark):
    dim = spark.range(50).select(F.col("id").alias("k"))
    out = broadcast_if_small(dim)
    assert _has_broadcast_hint(out)


def test_broadcast_gate_drops_hint_above_threshold(spark):
    dim = spark.range(50).select(F.col("id").alias("k"))
    out = broadcast_if_small(dim, threshold_bytes=0)
    assert out is dim


def test_broadcast_gate_size_of_proxy(spark):
    """A join-fed lookup whose own estimate is inflated keeps its hint
    when the scan-fed proxy is below the threshold, and drops it when
    the proxy exceeds it."""
    a = spark.range(50).select(F.col("id").alias("k"))
    b = spark.range(50).select(F.col("id").alias("k"),
                               (F.col("id") % 3).alias("g"))
    lookup = a.join(b, on="k")
    kept = broadcast_if_small(lookup, size_of=a)
    assert _has_broadcast_hint(kept)
    dropped = broadcast_if_small(lookup, threshold_bytes=0, size_of=a)
    assert dropped is lookup


def test_broadcast_gate_result_identical_both_branches(spark):
    fact = spark.range(200).select((F.col("id") % 40).alias("k"),
                                   F.col("id").alias("v"))
    dim = spark.range(40).select(F.col("id").alias("k"),
                                 (F.col("id") * 10).alias("w"))
    hinted = fact.join(broadcast_if_small(dim), on="k") \
                 .agg(F.sum(F.col("v") * F.col("w")).alias("s"))
    plain = fact.join(broadcast_if_small(dim, threshold_bytes=0), on="k") \
                .agg(F.sum(F.col("v") * F.col("w")).alias("s"))
    assert hinted.collect() == plain.collect()


def test_itemsets_identical_under_both_branches(spark, monkeypatch):
    rows = [(b, it) for b in range(30) for it in range(b % 5 + 2)]
    df = spark.createDataFrame(rows, "bk long, it long")
    lazy = frequent_pairs(df, "bk", "it", min_support=3)
    lazy_rows = sorted(map(tuple, lazy.collect()))
    monkeypatch.setenv("SPARK_GRAFT_MATERIALIZE_BYTES", "0")
    forced = frequent_pairs(df, "bk", "it", min_support=3)
    assert sorted(map(tuple, forced.collect())) == lazy_rows

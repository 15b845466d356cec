"""Size-gated materialization helper (r12 optimization): the gate must
keep small relations lazy (no plan truncation, no checkpoint job),
truncate big ones, and NEVER change results — the Apriori front end is
exercised under both branches as the integration proof."""

from pyspark.sql import functions as F

from dask_grblas_spark.functions.itemsets import frequent_pairs
from dask_grblas_spark.functions.materialize import (estimated_bytes,
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


def test_itemsets_identical_under_both_branches(spark, monkeypatch):
    rows = [(b, it) for b in range(30) for it in range(b % 5 + 2)]
    df = spark.createDataFrame(rows, "bk long, it long")
    lazy = frequent_pairs(df, "bk", "it", min_support=3)
    lazy_rows = sorted(map(tuple, lazy.collect()))
    monkeypatch.setenv("SPARK_GRAFT_MATERIALIZE_BYTES", "0")
    forced = frequent_pairs(df, "bk", "it", min_support=3)
    assert sorted(map(tuple, forced.collect())) == lazy_rows

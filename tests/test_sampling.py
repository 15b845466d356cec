"""Deterministic sampling/splitting contract (functions/sampling.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dask_grblas_spark.functions import sampling


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.range(20_000).select(F.col("id").alias("doc_id"))


def test_split_partitions_every_row_once(spark, corpus):
    out = sampling.split_column(corpus, splits={"train": 0.8, "val": 0.1,
                                                "test": 0.1})
    counts = {r.split: r.n for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 20_000
    assert abs(counts["train"] / 20_000 - 0.8) < 0.02
    assert abs(counts["val"] / 20_000 - 0.1) < 0.01
    assert abs(counts["test"] / 20_000 - 0.1) < 0.01


def test_split_is_reproducible_and_partitioning_invariant(spark, corpus):
    a = dict(sampling.split_column(corpus).select("doc_id", "split").collect())
    b = dict(sampling.split_column(corpus.repartition(13))
             .select("doc_id", "split").collect())
    assert a == b


def test_sample_fraction_and_stability(spark, corpus):
    s = sampling.deterministic_sample(corpus, 0.25, seed=3)
    n = s.count()
    assert abs(n / 20_000 - 0.25) < 0.02
    # subsample of a subset == intersection (pure function of the key)
    half = corpus.filter(F.col("doc_id") < 10_000)
    s_half = set(r.doc_id for r in
                 sampling.deterministic_sample(half, 0.25, seed=3).collect())
    s_full = set(r.doc_id for r in s.collect())
    assert s_half == {i for i in s_full if i < 10_000}
    # different seed -> different (mostly uncorrelated) selection
    other = set(r.doc_id for r in
                sampling.deterministic_sample(corpus, 0.25, seed=4).collect())
    overlap = len(s_full & other) / max(len(s_full), 1)
    assert 0.15 < overlap < 0.35  # ~fraction^2 expectation = 0.25


def test_split_validation():
    with pytest.raises(ValueError, match="sum to 1"):
        sampling.split_column(None, splits={"a": 0.5, "b": 0.2})
    with pytest.raises(ValueError, match="fraction"):
        sampling.deterministic_sample(None, 1.5)

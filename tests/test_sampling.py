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


def test_group_sample_two_phase_exact_and_invariant(spark):
    """group_sample: the two-phase (shard-then-merge) top-k equals the
    single-window selection, is partition-invariant, and respects k per
    group."""
    import pyspark.sql.functions as F

    from dask_grblas_spark.functions.dedup import cross_hash60
    from dask_grblas_spark.functions.sampling import group_sample

    df = spark.range(300).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 3).cast("string"))
         .alias("source"))
    out = group_sample(df, k=4).collect()
    from collections import Counter
    per_group = Counter(r["grp"] for r in out)
    assert set(per_group.values()) == {4}
    # single-window reference: k smallest md5 ranks per group
    ref = (df.select(F.col("source").alias("grp"), F.col("doc_id").alias("id"),
                     cross_hash60(F.concat(F.lit("42:"),
                                           F.col("doc_id").cast("string")))
                     .alias("hk")).collect())
    by_grp = {}
    for r in ref:
        by_grp.setdefault(r["grp"], []).append((r["hk"], r["id"]))
    want = {(g, i, rk + 1)
            for g, rows in by_grp.items()
            for rk, (_, i) in enumerate(sorted(rows)[:4])}
    assert {(r["grp"], r["id"], r["rank"]) for r in out} == want
    # partition invariance
    out2 = group_sample(df.repartition(11), k=4).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


def test_grouped_topk_ranks_and_ties(spark):
    import datetime

    from dask_grblas_spark.functions.timeseries import grouped_topk

    t0 = datetime.datetime(2024, 1, 1, 10, 5)
    rows = ([(i, t0, "view") for i in range(5)]
            + [(i + 10, t0, "click") for i in range(3)]
            + [(i + 20, t0, "buy") for i in range(3)]       # tie with click
            + [(i + 30, t0, "share") for i in range(1)])
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp, "
                                     "event_type string")
    out = {(r["grp"]): (r["n"], r["rank"])
           for r in grouped_topk(ev, k=3).collect()}
    assert out == {"view": (5, 1), "buy": (3, 2), "click": (3, 3)}


# ---------------------------------------------------------------------------
# reshape: pivot_table / melt (q102/q103)
# ---------------------------------------------------------------------------

def test_cube_agg_full_lattice(spark):
    """2x2 CUBE over a 3-row frame: all 4 grouping sets, gid bitmask
    with the first dim as MSB, rolled-up dims NULL."""
    from dask_grblas_spark.functions.reshape import cube_agg

    df = spark.createDataFrame(
        [("x", "p", 1.0), ("x", "q", 2.0), ("y", "p", 4.0)],
        "a string, b string, v double")
    got = {(r.a, r.b, r.gid): (r.n, r.total)
           for r in cube_agg(df, ["a", "b"], "v").collect()}
    assert got[("x", "p", 0)] == (1, 1.0)
    assert got[("x", None, 1)] == (2, 3.0)   # b aggregated -> LSB
    assert got[(None, "p", 2)] == (2, 5.0)   # a aggregated -> MSB
    assert got[(None, None, 3)] == (3, 7.0)
    assert len(got) == 8


def test_target_encode_shrinks_to_global_mean(spark):
    """m=2 prior: enc = (sum + m*gm)/(n + m); a singleton key shrinks
    hard, a frequent key keeps most of its own mean; NULL targets out."""
    from dask_grblas_spark.functions.profiling import target_encode

    df = spark.createDataFrame(
        [("a", 10.0), ("a", 20.0), ("a", 30.0), ("b", 100.0),
         ("b", None)],
        "k string, y double")
    got = {r.key: (r.n, r.enc) for r in
           target_encode(df, "k", "y", m=2.0).collect()}
    gm = (10 + 20 + 30 + 100) / 4.0  # 40
    assert got["a"] == (3, round((60 + 2 * gm) / 5.0, 6))
    assert got["b"] == (1, round((100 + 2 * gm) / 3.0, 6))


def test_pivot_table_explicit_values_and_zero_fill(spark):
    from dask_grblas_spark.functions.reshape import pivot_table

    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (1, "b"), (2, "b"), (2, "zzz")],
        "k long, t string")
    got = {r.k: (r.a, r.b) for r in
           pivot_table(df, "k", "t", ["a", "b"]).collect()}
    assert got == {1: (2, 1), 2: (0, 1)}  # unlisted 'zzz' is dropped


def test_pivot_table_sum_agg(spark):
    from dask_grblas_spark.functions.reshape import pivot_table

    df = spark.createDataFrame(
        [(1, "a", 10), (1, "a", 5), (1, "b", 1)],
        "k long, t string, v long")
    row = pivot_table(df, "k", "t", ["a", "b"], val_col="v",
                      agg="sum").collect()[0]
    assert (row.a, row.b) == (15, 1)


def test_melt_roundtrips_columns(spark):
    from dask_grblas_spark.functions.reshape import melt

    df = spark.createDataFrame([(1, 2.0, 3.0)], "id long, x double, y double")
    got = {(r.id, r.variable): r.value
           for r in melt(df, ["id"], ["x", "y"]).collect()}
    assert got == {(1, "x"): 2.0, (1, "y"): 3.0}


def test_salted_join_matches_plain_join(spark):
    from dask_grblas_spark.functions.joins import salted_join

    left = spark.createDataFrame(
        [(k, i) for k in (1, 1, 1, 2, 3) for i in range(10)],
        "k long, lval long")
    right = spark.createDataFrame([(1, "a"), (2, "b"), (9, "z")],
                                  "k long, rval string")
    got = sorted(map(tuple, salted_join(left, right, on="k",
                                        salt=4).collect()))
    want = sorted(map(tuple, left.join(right, on="k").collect()))
    assert got == want
    # left join keeps unmatched keys exactly once per left row
    gotl = sorted(map(tuple, salted_join(left, right, on="k", salt=4,
                                         how="left").collect()),
                  key=str)
    wantl = sorted(map(tuple, left.join(right, on="k", how="left")
                       .collect()), key=str)
    assert gotl == wantl


def test_salted_join_spreads_hot_key(spark):
    from pyspark.sql import functions as F

    from dask_grblas_spark.functions.joins import salted_join

    left = spark.createDataFrame([(1, i) for i in range(1000)],
                                 "k long, lval long")
    right = spark.createDataFrame([(1, "x")], "k long, rval string")
    ls = salted_join(left.repartition(4), right, on="k", salt=8)
    # all 1000 rows survive, and the physical join key (k, _salt) had
    # >1 distinct salt on the hot key (the whole point)
    assert ls.count() == 1000
    n_salts = (left.repartition(4)
               .select(F.pmod(F.monotonically_increasing_id(),
                              F.lit(8)).alias("s"))
               .distinct().count())
    assert n_salts > 1


def test_negative_sampling_table_distribution(spark):
    from dask_grblas_spark.functions.sampling import negative_sampling_table

    df = spark.createDataFrame(
        [(0, "a a a a b b c"), (1, "a b c d")],
        "doc_id long, text string")
    rows = {r["token"]: r
            for r in negative_sampling_table(df, top_v=3).collect()}
    # top-3 by (freq desc, token): a=5, b=3, c=2 (d cut)
    assert set(rows) == {"a", "b", "c"}
    tw = 5 ** 0.75 + 3 ** 0.75 + 2 ** 0.75
    assert rows["a"]["freq"] == 5
    assert rows["a"]["p"] == round(5 ** 0.75 / tw, 6)
    assert rows["c"]["p"] == round(2 ** 0.75 / tw, 6)
    # cumulative intervals follow the (freq desc, token) order and end at 1
    assert rows["a"]["cum_hi"] == round(5 ** 0.75 / tw, 6)
    assert rows["b"]["cum_hi"] == round((5 ** 0.75 + 3 ** 0.75) / tw, 6)
    assert rows["c"]["cum_hi"] == 1.0


def test_mixture_token_accounting(spark):
    from dask_grblas_spark.functions.sampling import (
        mixture_token_accounting)

    df = spark.createDataFrame(
        [(0, "a", "x x x x"), (1, "a", "x x"), (2, "b", "y y y"),
         (3, "c", "z")],
        "doc_id long, source string, text string")
    got = {r["source"]: r
           for r in mixture_token_accounting(
               df, {"a": 1.0, "b": 3.0}, 1200).collect()}
    # shares: a=0.25, b=0.75, c absent -> 0
    assert got["a"]["available"] == 6
    assert got["a"]["target_share"] == 0.25
    assert got["a"]["needed"] == 300.0
    assert got["a"]["epochs"] == 50.0
    assert got["b"]["available"] == 3
    assert got["b"]["epochs"] == 300.0
    assert got["c"]["target_share"] == 0.0 and got["c"]["epochs"] == 0.0


def test_neyman_allocation_favors_variance(spark):
    from dask_grblas_spark.functions.sampling import neyman_allocation

    rows = [("lo", 5.0)] * 10 + \
           [("hi", float(v)) for v in range(10)] + \
           [("zero", 1.0)] * 5
    df = spark.createDataFrame(rows, "s string, v double")
    got = {r["stratum"]: r
           for r in neyman_allocation(df, "s", "v", 100).collect()}
    assert got["lo"]["alloc"] == 0        # zero variance
    assert got["zero"]["alloc"] == 0
    assert got["hi"]["alloc"] == 100      # all allocation to the spread


def test_split_leakage_detects_cross_split_dup(spark):
    from dask_grblas_spark.functions.sampling import split_leakage

    # find two ids that land in different splits under seed 0, give
    # them identical text; a third id gets unrelated text
    from dask_grblas_spark.functions.sampling import (hex_threshold,
                                                      split_key)
    import hashlib

    def split_of(i):
        h = hashlib.md5(f"{i}-0".encode()).hexdigest()[:4]
        if h < hex_threshold(0.5):
            return "train"
        return "test"

    a = next(i for i in range(100) if split_of(i) == "train")
    b = next(i for i in range(100) if split_of(i) == "test")
    df = spark.createDataFrame(
        [(a, "x y z w v"), (b, "x y z w v"), (999, "q r s t u")],
        "doc_id long, text string")
    got = split_leakage(df, threshold=0.8,
                        splits={"train": 0.5, "test": 0.5}).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["s_lo"], r["s_hi"], r["n_leaks"]) == ("test", "train", 1)


def test_poisson_bootstrap_matches_python_replay(spark):
    """Replicate weights are a pure function of (seed, rep, id): replay
    the md5 inverse-CDF draw in Python and verify every rep mean."""
    import hashlib
    import math

    from dask_grblas_spark.functions.sampling import (_POISSON1_CUM,
                                                      poisson_bootstrap)

    rows = [(i, float(i % 13) + 1.0) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, v double")
    got = {r.rep: (r.n_eff, r.mean)
           for r in poisson_bootstrap(df, "v", n_reps=8,
                                      seed=7).collect()}
    assert set(got) == set(range(8))
    for rep in range(8):
        sw = swv = 0
        for i, v in rows:
            h = int(hashlib.md5(f"pb7:{rep}:{i}".encode())
                    .hexdigest()[:15], 16)
            u = (h + 1) / float(1 << 60)
            w = sum(1 for c in _POISSON1_CUM if u > c)
            sw += w
            swv += w * v
        assert got[rep] == (sw, round(swv / sw, 6))
    # cumulative ladder really is Poisson(1)'s CDF
    s = 0.0
    for k, c in enumerate(_POISSON1_CUM):
        s += math.exp(-1) / math.factorial(k)
        assert c == s


def test_systematic_sample_matches_python_replay(spark):
    import hashlib

    from dask_grblas_spark.functions.sampling import systematic_sample

    rows = [(i, "x") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted((r.id, r.pos)
                 for r in systematic_sample(df, every_k=7).collect())
    order = sorted(range(100), key=lambda i: (
        int(hashlib.md5(f"sys11:{i}".encode()).hexdigest()[:15], 16), i))
    want = sorted((order[p], p + 1) for p in range(0, 100, 7))
    assert got == want
    assert len(got) == 15  # ceil(100/7)
    import pytest as _pt
    with _pt.raises(ValueError):
        systematic_sample(df, every_k=0)

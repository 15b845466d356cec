"""Frequent-pair mining (Apriori downward closure): hand-computed
example, brute-force differential on random baskets (proving the
item prune is LOSSLESS), and the deterministic basket cap."""

import itertools
from collections import Counter

import pytest
from pyspark.sql import functions as F

from dask_grblas_spark.functions.itemsets import (frequent_pairs,
                                                  frequent_triples)


def _baskets_df(spark, baskets):
    rows = [(b, it) for b, items in baskets.items() for it in items]
    return spark.createDataFrame(rows, "bk long, it long")


def _brute(baskets, min_support):
    """Uncapped, unpruned reference: pair supports over distinct
    basket items, plus marginals and lift."""
    isup = Counter()
    psup = Counter()
    for items in baskets.values():
        s = sorted(set(items))
        isup.update(s)
        psup.update(itertools.combinations(s, 2))
    n = float(len(baskets))
    out = {}
    for (a, b), sp in psup.items():
        if sp >= min_support:
            out[(a, b)] = (sp, isup[a], isup[b],
                           round(sp / isup[a], 6),
                           round(sp / isup[b], 6),
                           round(sp * n / (isup[a] * isup[b]), 6))
    return out


def test_frequent_pairs_hand_computed(spark):
    baskets = {1: [10, 20, 30], 2: [10, 20], 3: [10, 20, 40],
               4: [10, 30], 5: [20, 30, 30]}   # dup item collapses
    got = {(r["item_a"], r["item_b"]):
           (r["support_pair"], r["support_a"], r["support_b"],
            r["confidence_ab"], r["confidence_ba"], r["lift"])
           for r in frequent_pairs(_baskets_df(spark, baskets),
                                   "bk", "it",
                                   min_support=3).collect()}
    # (10,20): 3 baskets; s10=4, s20=4; conf 0.75 both; lift 3*5/16
    assert got == {(10, 20): (3, 4, 4, 0.75, 0.75, 0.9375)}


def test_frequent_pairs_matches_bruteforce(spark):
    """The Apriori prune + cap (not binding) must be LOSSLESS:
    identical result to the unpruned quadratic reference."""
    baskets = {b: [(b * 7 + i * 13) % 40 for i in range(3 + b % 5)]
               for b in range(120)}
    got = {(r["item_a"], r["item_b"]):
           (r["support_pair"], r["support_a"], r["support_b"],
            r["confidence_ab"], r["confidence_ba"], r["lift"])
           for r in frequent_pairs(_baskets_df(spark, baskets),
                                   "bk", "it",
                                   min_support=4).collect()}
    want = _brute(baskets, 4)
    assert got == want and len(want) > 10


def test_frequent_pairs_cap_is_deterministic(spark):
    """When the basket cap binds, the kept items are the
    lexicographically smallest — partition-layout independent."""
    baskets = {1: list(range(10)), 2: list(range(10)),
               3: list(range(10))}
    df = _baskets_df(spark, baskets)
    a = frequent_pairs(df, "bk", "it", min_support=3,
                       max_frequent_per_basket=4).collect()
    b = frequent_pairs(df.repartition(13), "bk", "it", min_support=3,
                       max_frequent_per_basket=4).collect()
    key = lambda r: (r["item_a"], r["item_b"])
    assert sorted(a, key=key) == sorted(b, key=key)
    # cap=4 over items 0..9 keeps {0,1,2,3} -> C(4,2)=6 pairs
    assert {key(r) for r in a} == set(
        itertools.combinations(range(4), 2))
    # marginal supports stay PRE-cap (the standard definition)
    assert all(r["support_a"] == 3 and r["support_b"] == 3
               for r in a)


def test_frequent_pairs_null_items_ignored(spark):
    df = spark.createDataFrame(
        [(1, 10), (1, 20), (1, None), (2, 10), (2, 20), (3, 10),
         (3, 20)], "bk long, it long")
    got = frequent_pairs(df, "bk", "it", min_support=3).collect()
    assert len(got) == 1 and got[0]["support_pair"] == 3


def test_frequent_triples_matches_bruteforce(spark):
    baskets = {b: [(b * 7 + i * 13) % 25 for i in range(4 + b % 4)]
               for b in range(80)}
    got = {(r["item_a"], r["item_b"], r["item_c"]):
           (r["support_triple"], r["support_a"], r["support_b"],
            r["support_c"], r["lift3"])
           for r in frequent_triples(_baskets_df(spark, baskets),
                                     "bk", "it",
                                     min_support=3).collect()}
    isup = Counter()
    tsup = Counter()
    for items in baskets.values():
        s = sorted(set(items))
        isup.update(s)
        tsup.update(itertools.combinations(s, 3))
    n = float(len(baskets))
    want = {t: (sp, isup[t[0]], isup[t[1]], isup[t[2]],
                round(sp * n * n /
                      (isup[t[0]] * isup[t[1]] * isup[t[2]]), 6))
            for t, sp in tsup.items() if sp >= 3}
    assert got == want and len(want) > 5


def test_frequent_triples_cap_and_order(spark):
    baskets = {1: list(range(8)), 2: list(range(8)), 3: list(range(8))}
    got = frequent_triples(_baskets_df(spark, baskets), "bk", "it",
                           min_support=3,
                           max_frequent_per_basket=4).collect()
    assert {(r["item_a"], r["item_b"], r["item_c"]) for r in got} == \
        set(itertools.combinations(range(4), 3))
    assert all(r["item_a"] < r["item_b"] < r["item_c"] for r in got)

"""Frequent-itemset mining (association rules) — the market-basket
screen of retail/clickstream OLAP, Spark-first.

The scale hazard is the pair fan-out: exploding C(n_b, 2) pairs per
basket is quadratic in basket width. The classic fix is Apriori's
downward closure [Agrawal & Srikant, VLDB 1994]: a pair can only reach
``min_support`` if BOTH items do, so items are support-pruned FIRST
and baskets shrink to their frequent items before any pair is
generated. Everything here is exact grouped counting — no sampling,
no RNG — so the whole result (supports, confidences, lifts) replays
in a SQL oracle.

Reference scope: the reference engine (dask-grblas) has no itemset
layer; this extends the LLM/retail-pipeline surface (SURVEY.md
extension operators).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .materialize import materialize_if_large


def _pruned_baskets(df: DataFrame, basket_col: str, item_col: str,
                    min_support: int, cap: int):
    """Shared Apriori front end: basket-level presence (DISTINCT),
    item supports, the downward-closure item prune, and the sorted
    capped basket arrays. Returns (baskets(_b, _t), isup(_i, _si),
    items(_b, _i)) — the three relations every itemset size builds
    from."""
    items = (df.select(F.col(basket_col).alias("_b"),
                       F.col(item_col).alias("_i"))
               .where(F.col("_i").isNotNull())
               .distinct())
    # consumed by item supports, the basket collect AND the
    # basket-universe count (plus the support join-backs a level up) —
    # without materialization each consumer re-runs the full DISTINCT
    # shuffle (the r12-before q328 plan executed it 4x). The
    # materialization is SIZE-GATED (materialize.py): at bench scale
    # the four recomputes are cheaper than one blocking checkpoint
    # job (measured +2.2 s at sf0.1 for the unconditional form), at
    # 100 TB the checkpoint is the difference between 1 and 4 full
    # input shuffles. Result identical either way.
    items = materialize_if_large(items)
    isup = (items.groupBy("_i")
                 .agg(F.count("*").cast("bigint").alias("_si"))
                 .where(F.col("_si") >= min_support))
    # bounded by the frequent-item vocabulary; read three times
    # (prune join + both marginal join-backs) — same size gate
    isup = materialize_if_large(isup)
    baskets = (items.join(isup.select("_i"), on="_i")
                    .groupBy("_b")
                    .agg(F.slice(F.array_sort(F.collect_set("_i")),
                                 1, cap).alias("_t")))
    return baskets, isup, items


def frequent_pairs(df: DataFrame, basket_col: str, item_col: str,
                   min_support: int = 3,
                   max_frequent_per_basket: int = 256) -> DataFrame:
    """Frequent item PAIRS with association-rule stats, Apriori-style.

    Plan shape at 100 TB: (1) basket-level presence = one DISTINCT
    over (basket, item); (2) items below ``min_support`` are pruned
    BEFORE pair generation (downward closure — the prune is what
    bounds the explode: a pair of infrequent items cannot be
    frequent, so dropping them loses nothing); (3) each basket's
    surviving items collect into a SORTED array capped at
    ``max_frequent_per_basket`` (deterministic smallest-first cap, the
    `token_cooccurrence` precedent — C(cap, 2) bounds the per-basket
    fan-out against pathological mega-baskets; the cap binding means
    dropped pairs, so size it to your basket P100); (4) one pair
    explode + grouped count, support-filtered map-side.

    Marginal supports and the basket total are PRE-cap (the standard
    definition — the cap only limits which pairs are generated, not
    what support means). confidence_ab = s_ab/s_a, confidence_ba =
    s_ab/s_b, lift = s_ab*N/(s_a*s_b), each ROUND(.,6) over DOUBLE
    (the PMI-oracle precedent for float ulps).

    Output: (item_a, item_b, support_pair, support_a, support_b,
    confidence_ab, confidence_ba, lift) with item_a < item_b."""
    baskets, isup, items = _pruned_baskets(
        df, basket_col, item_col, min_support,
        max_frequent_per_basket)
    baskets = baskets.where(F.size("_t") >= 2)
    pair_expr = F.expr(
        "flatten(transform(_t, (x, i) -> "
        "transform(slice(_t, i + 2, size(_t)), y -> "
        "struct(x AS a, y AS b))))")
    pairs = (baskets.select(F.explode(pair_expr).alias("_p"))
                    .groupBy(F.col("_p.a").alias("item_a"),
                             F.col("_p.b").alias("item_b"))
                    .agg(F.count("*").cast("bigint")
                          .alias("support_pair"))
                    .where(F.col("support_pair") >= min_support))
    nb = items.select("_b").distinct() \
              .agg(F.count("*").cast("double").alias("_N"))
    sa = isup.select(F.col("_i").alias("item_a"),
                     F.col("_si").alias("support_a"))
    sb = isup.select(F.col("_i").alias("item_b"),
                     F.col("_si").alias("support_b"))
    return (pairs.join(sa, on="item_a")
                 .join(sb, on="item_b")
                 .crossJoin(F.broadcast(nb))
                 .select("item_a", "item_b", "support_pair",
                         "support_a", "support_b",
                         F.round(F.col("support_pair").cast("double")
                                 / F.col("support_a").cast("double"),
                                 6).alias("confidence_ab"),
                         F.round(F.col("support_pair").cast("double")
                                 / F.col("support_b").cast("double"),
                                 6).alias("confidence_ba"),
                         F.round(F.col("support_pair").cast("double")
                                 * F.col("_N")
                                 / (F.col("support_a").cast("double")
                                    * F.col("support_b")
                                       .cast("double")),
                                 6).alias("lift")))


def frequent_triples(df: DataFrame, basket_col: str, item_col: str,
                     min_support: int = 2,
                     max_frequent_per_basket: int = 64) -> DataFrame:
    """Frequent item TRIPLES — the size-3 level of the same Apriori
    plan: item-support prune (downward closure: every item of a
    frequent triple is itself frequent), sorted capped baskets, ONE
    triple explode + grouped count. The default cap is tighter than
    the pair level (C(cap, 3) grows a power faster — 64 keeps the
    per-basket fan-out under ~42k); pipelines that need a stronger
    prune first can pre-filter baskets to items appearing in
    `frequent_pairs` output (pair-level closure) before calling.

    lift3 = s_abc * N^2 / (s_a * s_b * s_c) — the full-independence
    ratio, ROUND(.,6) over DOUBLE; marginals PRE-cap as in
    `frequent_pairs`. Output: (item_a, item_b, item_c,
    support_triple, support_a, support_b, support_c, lift3) with
    item_a < item_b < item_c."""
    baskets, isup, items = _pruned_baskets(
        df, basket_col, item_col, min_support,
        max_frequent_per_basket)
    baskets = baskets.where(F.size("_t") >= 3)
    triple_expr = F.expr(
        "flatten(flatten(transform(_t, (x, i) -> "
        "transform(slice(_t, i + 2, size(_t)), (y, j) -> "
        "transform(slice(_t, i + j + 3, size(_t)), z -> "
        "struct(x AS a, y AS b, z AS c))))))")
    trip = (baskets.select(F.explode(triple_expr).alias("_p"))
                   .groupBy(F.col("_p.a").alias("item_a"),
                            F.col("_p.b").alias("item_b"),
                            F.col("_p.c").alias("item_c"))
                   .agg(F.count("*").cast("bigint")
                         .alias("support_triple"))
                   .where(F.col("support_triple") >= min_support))
    nb = items.select("_b").distinct() \
              .agg(F.count("*").cast("double").alias("_N"))
    sup = [isup.select(F.col("_i").alias(f"item_{x}"),
                       F.col("_si").alias(f"support_{x}"))
           for x in ("a", "b", "c")]
    dbl = lambda c: F.col(c).cast("double")
    return (trip.join(sup[0], on="item_a")
                .join(sup[1], on="item_b")
                .join(sup[2], on="item_c")
                .crossJoin(F.broadcast(nb))
                .select("item_a", "item_b", "item_c",
                        "support_triple", "support_a", "support_b",
                        "support_c",
                        F.round(dbl("support_triple") * F.col("_N")
                                * F.col("_N")
                                / (dbl("support_a") * dbl("support_b")
                                   * dbl("support_c")),
                                6).alias("lift3")))

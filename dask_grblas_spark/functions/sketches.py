"""Distinct-count sketches: HyperLogLog and KMV (k minimum values).

The cardinality primitives of 100 TB pipeline accounting — per-slice
distinct users/tokens/urls where exact COUNT(DISTINCT) would shuffle
the full key set. Both sketches here are DETERMINISTIC (register
contents are pure md5 arithmetic, no RNG, no partition-order
dependence), so the whole estimate — not just its shape — replays
exactly in the DuckDB oracle.

Design notes for cross-engine exactness:

- HLL register sums are kept in SCALED INTEGER form: ``sum(2^-M_j)`` is
  accumulated as ``sum(2^(RHO_CAP - M_j))`` over bigints (every term a
  power of two, far under 2^63), so the only floating-point steps are
  one division and the small-range ``ln`` — a float SUM over doubles
  would be partition-order dependent and drift between engines.
- KMV needs only integer hashes and one division per group.

Reference scope: the reference engine (dask-grblas) has no sketch
layer; these extend the LLM-pipeline surface (SURVEY.md extension
operators) with the standard Flajolet et al. HLL (2007 paper
constants) and the Bar-Yossef et al. KMV estimator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .dedup import cross_hash60
from .text import tokens

#: rho values are capped here so 2^(RHO_CAP - rho) stays a small exact
#: bigint; registers above the cap are astronomically unlikely (p < 2^-39
#: per bucket) and the cap only biases the estimate below 10^-9 relative.
RHO_CAP = 40


def _hash_tokens(df: DataFrame, group_col: str, text_col: str,
                 salt: str, n: int = 1) -> DataFrame:
    """(grp, h) rows: one 60-bit salted hash per counting unit — single
    tokens (n=1) or n-token shingles (the unit real pipelines count;
    also what gives the tiny synthetic vocabulary enough distinct values
    to exercise the estimators instead of the exact-count fallbacks)."""
    toks = F.filter(tokens(F.col(text_col)), lambda x: F.length(x) > 0)
    base = df.select(F.col(group_col).alias("grp"), toks.alias("_t"))
    if n == 1:
        unit = F.explode(F.col("_t"))
    else:
        unit = F.explode(F.expr(
            f"CASE WHEN size(_t) = 0 THEN array() "
            f"WHEN size(_t) <= {n} THEN array(array_join(_t, ' ')) "
            f"ELSE transform(sequence(0, size(_t) - {n}), "
            f"p -> array_join(slice(_t, p + 1, {n}), ' ')) END"))
    return (base.select("grp", unit.alias("tok"))
                .select("grp",
                        cross_hash60(F.concat(F.lit(salt), F.col("tok")))
                        .alias("h")))


def hll_distinct(df: DataFrame, group_col: str = "source",
                 text_col: str = "text", b: int = 8,
                 n: int = 1) -> DataFrame:
    """Per-group HyperLogLog distinct-token estimate next to the exact
    count. m = 2^b registers; bucket = h mod m; rho = position of the
    highest set bit's complement in the remaining hash bits (computed
    with EXACT integer arithmetic — minimal-binary-digit length, the
    same ``conv``/``bin`` primitive both engines share — never float
    log2). Estimate = alpha_m * m^2 / sum(2^-M_j) with the standard
    small-range linear-counting correction.

    Scale shape: one token scan -> map-side-combined max per (grp,
    bucket) — the shuffled relation is at most m rows per group
    regardless of corpus size — then a per-group fold of m rows. The
    exact COUNT(DISTINCT) column is included for gate comparison; real
    100 TB use drops it (that is the point of the sketch).
    Output: (grp, est, exact)."""
    m = 1 << b
    hashed = _hash_tokens(df, group_col, text_col, "hll:", n)
    rem_bits = 60 - b
    # integer division — h is up to 2^60, so float `/` would round
    w = F.expr(f"h DIV {m}")
    # minimal binary digits of w: length(conv(w, 10, 2)); w = 0 would
    # give length("0") = 1, handled by its own branch
    used = F.length(F.conv(w.cast("string"), 10, 2))
    rho = F.when(w == 0, F.lit(rem_bits + 1)) \
           .otherwise(F.lit(rem_bits) - used + 1)
    regs = (hashed.select("grp", F.pmod(F.col("h"), F.lit(m)).alias("bucket"),
                          F.least(rho, F.lit(RHO_CAP)).alias("rho"))
                  .groupBy("grp", "bucket")
                  .agg(F.max("rho").alias("M")))
    # scaled-integer harmonic sum: present buckets contribute
    # 2^(RHO_CAP - M); each of the (m - present) empty buckets would
    # contribute 2^-0 = 1, i.e. 2^RHO_CAP scaled
    term = F.expr(
        f"shiftleft(CAST(1 AS BIGINT), CAST({RHO_CAP} - M AS INT))")
    per = (regs.groupBy("grp")
               .agg(F.sum(term).alias("s_present"),
                    F.count("*").alias("present")))
    alpha = 0.7213 / (1.0 + 1.079 / m)
    s_total = (F.col("s_present")
               + (F.lit(m) - F.col("present")) * F.lit(1 << RHO_CAP))
    raw = (F.lit(alpha * m * m) * F.lit(float(1 << RHO_CAP))
           / s_total.cast("double"))
    zeros = (F.lit(m) - F.col("present")).cast("double")
    est = F.when((raw <= 2.5 * m) & (zeros > 0),
                 F.lit(float(m)) * F.log(F.lit(float(m)) / zeros)) \
           .otherwise(raw)
    exact = (hashed.groupBy("grp")
                   .agg(F.count_distinct("h").alias("exact")))
    return (per.select("grp", F.round(est, 4).alias("est"))
               .join(exact, on="grp")
               .select("grp", "est", F.col("exact").cast("bigint")
                       .alias("exact")))


def kmv_distinct(df: DataFrame, group_col: str = "source",
                 text_col: str = "text", k: int = 256,
                 n_shards: int = 32, n: int = 1) -> DataFrame:
    """Per-group KMV (k minimum values) distinct-token sketch PLUS the
    merged union estimate — the mergeability that matters at 100 TB:
    each slice keeps only its k smallest distinct hashes, and any set
    of slices unions by re-taking the k smallest, with no rescan.
    Estimator: (k-1) * H / h_(k) over hash space H = 2^60 when the
    group holds >= k distinct hashes, else the sketch IS the exact
    distinct set and its size is returned.

    Scale shape: distinct (grp, h) is one shuffle; the k smallest per
    group use the same TWO-PHASE top-k as group_sample (per (grp,
    hash-shard) windows keep k candidates, then a bounded re-rank) —
    no single-task per-group sort; the union row re-ranks the union of
    per-group sketches, a <= k * groups relation.
    Output: (grp, n_kept, est) with grp '__union__' for the merge."""
    hashed = _hash_tokens(df, group_col, text_col, "kmv:", n)
    dist = hashed.distinct()
    shard = F.pmod(F.col("h"), F.lit(n_shards))
    w1 = Window.partitionBy("grp", "_s").orderBy("h")
    pre = (dist.withColumn("_s", shard)
               .withColumn("_r", F.row_number().over(w1))
               .filter(F.col("_r") <= k)
               .select("grp", "h"))
    w2 = Window.partitionBy("grp").orderBy("h")
    sk = (pre.withColumn("rank", F.row_number().over(w2))
             .filter(F.col("rank") <= k))
    merged = (sk.select(F.lit("__union__").alias("grp"), "h").distinct()
                .withColumn("rank", F.row_number().over(w2))
                .filter(F.col("rank") <= k))
    both = sk.select("grp", "h", "rank").unionByName(
        merged.select("grp", "h", "rank"))
    space = float(1 << 60)
    agg = (both.groupBy("grp")
               .agg(F.count("*").alias("n_kept"),
                    F.max(F.when(F.col("rank") == k, F.col("h")))
                     .alias("hk")))
    est = F.when(F.col("n_kept") < k, F.col("n_kept").cast("double")) \
           .otherwise(F.lit(float(k - 1)) * F.lit(space)
                      / F.col("hk").cast("double"))
    return agg.select("grp", F.col("n_kept").cast("bigint").alias("n_kept"),
                      F.round(est, 4).alias("est"))

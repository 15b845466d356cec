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

import math

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
    hashed = _hash_tokens(df, group_col, text_col, "hll:", n)
    regs = _hll_regs_from_hashed(hashed, ["grp"], b)
    per = _hll_estimate_from_regs(regs, ["grp"], b)
    exact = (hashed.groupBy("grp")
                   .agg(F.count_distinct("h").alias("exact")))
    return (per.join(exact, on="grp")
               .select("grp", "est", F.col("exact").cast("bigint")
                       .alias("exact")))


def _hll_regs_from_hashed(hashed: DataFrame, group_cols: list[str],
                          b: int) -> DataFrame:
    """(group_cols..., bucket, M) HLL registers from a (group_cols...,
    h) relation of 60-bit hashes. Map-side-combined max — the shuffled
    relation is at most m rows per group at any input size. Register
    relations MERGE by taking max(M) per (coarser groups, bucket) —
    the property a 100 TB rollup relies on (see hll_user_rollup)."""
    m = 1 << b
    rem_bits = 60 - b
    # integer division — h is up to 2^60, so float `/` would round
    w = F.expr(f"h DIV {m}")
    # minimal binary digits of w: length(conv(w, 10, 2)); w = 0 would
    # give length("0") = 1, handled by its own branch
    used = F.length(F.conv(w.cast("string"), 10, 2))
    rho = F.when(w == 0, F.lit(rem_bits + 1)) \
           .otherwise(F.lit(rem_bits) - used + 1)
    return (hashed.select(*group_cols,
                          F.pmod(F.col("h"), F.lit(m)).alias("bucket"),
                          F.least(rho, F.lit(RHO_CAP)).alias("rho"))
                  .groupBy(*group_cols, "bucket")
                  .agg(F.max("rho").alias("M")))


def _hll_estimate_from_regs(regs: DataFrame, group_cols: list[str],
                            b: int) -> DataFrame:
    """(group_cols..., est) from a register relation: scaled-integer
    harmonic sum (present buckets contribute 2^(RHO_CAP - M); each of
    the (m - present) empty buckets would contribute 2^-0 = 1, i.e.
    2^RHO_CAP scaled) + the standard small-range correction. est is
    ROUND(.., 4)."""
    m = 1 << b
    term = F.expr(
        f"shiftleft(CAST(1 AS BIGINT), CAST({RHO_CAP} - M AS INT))")
    per = (regs.groupBy(*group_cols)
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
    return per.select(*group_cols, F.round(est, 4).alias("est"))


def hll_user_rollup(events_df: DataFrame, ts_col: str = "ts",
                    key_col: str = "user_id", b: int = 8) -> DataFrame:
    """Daily distinct-key estimates computed TWO ways — directly, and by
    MERGING the day's per-hour register sketches (max per bucket) — to
    exercise the property that makes HLL the 100 TB rollup primitive:
    register relations merge WITHOUT rescanning raw data, so hourly
    sketches roll up to days/weeks/totals with a tiny aggregate. The
    two estimates are equal by construction (max of hourly maxes ==
    direct max); emitting both makes the gate verify the merge path,
    not just assert it. An exact per-day COUNT(DISTINCT) rides along
    for error inspection.

    Scale shape: one event scan -> per-(day, hour, bucket) max (map-side
    combined, <= 24 * m rows per day), a (day, bucket) max-merge over
    that bounded relation, and the two bounded estimate folds.
    Output: (day, est_merged, est_direct, exact)."""
    # epoch-of-truncation keys (timezone-neutral: matches DuckDB's
    # epoch(date_trunc(..)) exactly — same idiom as grouped_topk)
    day = F.unix_timestamp(F.date_trunc("day", F.col(ts_col))) \
           .cast("bigint")
    hour = F.unix_timestamp(F.date_trunc("hour", F.col(ts_col))) \
            .cast("bigint")
    hashed = events_df.select(
        day.alias("day"), hour.alias("hr"),
        cross_hash60(F.concat(F.lit("hllu:"),
                              F.col(key_col).cast("string"))).alias("h"))
    hourly = _hll_regs_from_hashed(hashed, ["day", "hr"], b)
    merged_regs = (hourly.groupBy("day", "bucket")
                         .agg(F.max("M").alias("M")))
    est_merged = (_hll_estimate_from_regs(merged_regs, ["day"], b)
                  .withColumnRenamed("est", "est_merged"))
    direct_regs = _hll_regs_from_hashed(hashed.select("day", "h"),
                                        ["day"], b)
    est_direct = (_hll_estimate_from_regs(direct_regs, ["day"], b)
                  .withColumnRenamed("est", "est_direct"))
    exact = (hashed.groupBy("day")
                   .agg(F.count_distinct("h").cast("bigint")
                        .alias("exact")))
    return (est_merged.join(est_direct, on="day").join(exact, on="day")
                      .select("day", "est_merged", "est_direct", "exact"))


def countmin_counts(df: DataFrame, key_col: str, query_keys: list,
                    d: int = 4, w: int = 1024) -> DataFrame:
    """Count-min sketch frequency estimates: d x w counters, counter
    (i, h_i(key) mod w) accumulates every occurrence; the estimate for
    a key is the MIN over its d counters — an overestimate bounded by
    eps = e/w of the total count with probability 1 - (1/2)^d. The
    constant-memory answer to "how often did each of these keys occur"
    when the key universe is unbounded (users, urls, grams).

    All hashing is md5 arithmetic, so counter contents and estimates
    replay exactly in SQL; est >= exact ALWAYS (one-sided error — the
    gate exposes both columns). Scale shape: one pass with map-side
    partial aggregation into the <= d*w-row counter relation; query
    keys probe it through a broadcast join of d rows per key.
    Output: (key, est, exact) for the query keys."""
    spark = df.sparkSession
    key = F.col(key_col).cast("string")
    rows = F.array(*[
        F.struct(F.lit(i).alias("row"),
                 F.pmod(cross_hash60(F.concat(F.lit(f"cm{i}:"), key)),
                        F.lit(w)).alias("bucket"))
        for i in range(d)])
    counters = (df.select(F.explode(rows).alias("rb"))
                  .groupBy("rb.row", "rb.bucket")
                  .agg(F.count("*").alias("cnt")))
    qdf = spark.createDataFrame([(str(k),) for k in query_keys],
                                "key string")
    probes = qdf.select("key", F.explode(F.array(*[
        F.struct(F.lit(i).alias("row"),
                 F.pmod(cross_hash60(F.concat(F.lit(f"cm{i}:"),
                                              F.col("key"))),
                        F.lit(w)).alias("bucket"))
        for i in range(d)])).alias("rb")) \
        .select("key", "rb.row", "rb.bucket")
    est = (probes.join(counters, on=["row", "bucket"], how="left")
                 .groupBy("key")
                 .agg(F.min(F.coalesce("cnt", F.lit(0))).cast("bigint")
                      .alias("est")))
    # exact counts ONLY for the query keys (broadcast semi-filter — the
    # full-universe exact count is precisely what the sketch avoids)
    exact = (df.select(key.alias("key"))
               .join(F.broadcast(qdf), on="key", how="left_semi")
               .groupBy("key").agg(F.count("*").alias("cnt")))
    return (est.join(exact, on="key", how="left")
               .select("key", "est",
                       F.coalesce("cnt", F.lit(0)).cast("bigint")
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
    # r12 optimization (guide §2.4): `sk` feeds both the per-group
    # branch and the merged-union re-rank — unshared, the tokenize +
    # distinct + two-phase top-k pipeline ran twice. Size-gated
    # materialization of the <= groups*k sketch computes it once at
    # scale (the sibling kmv_set_ops already checkpoints its sketch).
    from .materialize import materialize_if_large
    sk = materialize_if_large(
        pre.withColumn("rank", F.row_number().over(w2))
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


def kmv_set_ops(df: DataFrame, group_col: str, grp_a: str, grp_b: str,
                text_col: str = "text", k: int = 256,
                n_shards: int = 32, n: int = 1) -> DataFrame:
    """KMV set-operation estimates between two groups' distinct-token
    sets: union size, Jaccard, and intersection — the sketch-side
    answer to "how much does corpus A overlap corpus B" without a
    distinct-join (completes the family: `kmv_distinct` gives sizes +
    union; this adds the overlap estimators, Beyer et al. 2007).

    The combined sketch K = k smallest hashes of A ∪ B;
    jaccard_est = |{h in K : h in A-sketch AND h in B-sketch}| / |K|;
    inter_est = jaccard_est * union_est. Everything is deterministic
    given the md5-derived hashes (same discipline as kmv_distinct),
    so the SQL oracle replays it bit-for-bit. Exact-set fallback:
    when a side holds < k distinct hashes its sketch IS the set, and
    the estimators degrade gracefully to exact membership.

    Scale shape: distinct (grp, h) one shuffle; per-group k smallest
    via the two-phase sharded top-k (no single-task group sort); all
    later relations are <= 2k rows. Output: one row (n_a, n_b,
    union_est, jaccard_est, inter_est), estimates rounded 4/6."""
    hashed = _hash_tokens(
        df.where(F.col(group_col).isin(grp_a, grp_b)),
        group_col, text_col, "kmv:", n)
    dist = hashed.distinct()
    shard = F.pmod(F.col("h"), F.lit(n_shards))
    w1 = Window.partitionBy("grp", "_s").orderBy("h")
    pre = (dist.withColumn("_s", shard)
               .withColumn("_r", F.row_number().over(w1))
               .filter(F.col("_r") <= k)
               .select("grp", "h"))
    w2 = Window.partitionBy("grp").orderBy("h")
    sk = (pre.withColumn("rank", F.row_number().over(w2))
             .filter(F.col("rank") <= k)
             .localCheckpoint())
    ka = sk.where(F.col("grp") == grp_a).select("h")
    kb = sk.where(F.col("grp") == grp_b).select("h")
    union_sk = (sk.select("h").distinct()
                  .withColumn("rank", F.row_number().over(
                      Window.orderBy("h")))
                  .filter(F.col("rank") <= k))
    space = float(1 << 60)
    # Membership via joins against the (checkpointed, <= k-row)
    # side sketches — NOT driver isin-literal lists, so the plan
    # stays bounded at any k (a k=100k sketch would bloat a literal
    # list into the plan tree; a broadcast join is the same cost at
    # k=256 and unbounded-safe).
    stats = (union_sk
             .join(F.broadcast(ka.withColumn("_in_a", F.lit(True))),
                   on="h", how="left")
             .join(F.broadcast(kb.withColumn("_in_b", F.lit(True))),
                   on="h", how="left")
             .withColumn("_in_a", F.coalesce("_in_a", F.lit(False)))
             .withColumn("_in_b", F.coalesce("_in_b", F.lit(False))))
    row = stats.agg(
        F.count("*").alias("ku"),
        F.sum((F.col("_in_a") & F.col("_in_b")).cast("bigint"))
         .alias("rho"),
        F.max(F.when(F.col("rank") == k, F.col("h"))).alias("hk")
    ).collect()[0]
    na = ka.count()
    nb = kb.count()
    ku, rho = int(row["ku"] or 0), int(row["rho"] or 0)
    spark = df.sparkSession
    if ku == 0:
        return spark.createDataFrame(
            [(0, 0, None, None, None)],
            "n_a long, n_b long, union_est double, "
            "jaccard_est double, inter_est double")
    union_est = (float(ku) if ku < k
                 else (k - 1) * space / float(row["hk"]))
    jac = rho / ku
    u4 = math.floor(union_est * 1e4 + 0.5) / 1e4
    j6 = math.floor(jac * 1e6 + 0.5) / 1e6
    i4 = math.floor(jac * union_est * 1e4 + 0.5) / 1e4
    return spark.createDataFrame(
        [(na, nb, u4, j6, i4)],
        "n_a long, n_b long, union_est double, jaccard_est double, "
        "inter_est double")


def exact_set_overlap(df: DataFrame, group_col: str, grp_a: str,
                      grp_b: str, text_col: str = "text",
                      n: int = 1) -> DataFrame:
    """EXACT distinct n-gram overlap between two groups — the ground
    truth `kmv_set_ops` estimates (pair the two gates and you have
    the sketch-calibration readout): |A|, |B|, |A ∩ B|, and exact
    Jaccard. Same counting unit as the KMV family (`_hash_tokens`'s
    gram construction, strings instead of hashes).

    Plan: one distinct (grp, gram) shuffle; side sizes fold from it;
    the intersection is a semi-join of A's grams against B's —
    gram-partitioned, no driver materialization at any vocabulary
    size. Output: one row (n_a, n_b, n_inter, jaccard round 6)."""
    toks = F.filter(tokens(F.col(text_col)), lambda x: F.length(x) > 0)
    base = (df.where(F.col(group_col).isin(grp_a, grp_b))
              .select(F.col(group_col).alias("grp"), toks.alias("_t")))
    if n == 1:
        unit = F.explode(F.col("_t"))
    else:
        unit = F.explode(F.expr(
            f"CASE WHEN size(_t) = 0 THEN array() "
            f"WHEN size(_t) <= {n} THEN array(array_join(_t, ' ')) "
            f"ELSE transform(sequence(0, size(_t) - {n}), "
            f"p -> array_join(slice(_t, p + 1, {n}), ' ')) END"))
    grams = base.select("grp", unit.alias("g")).distinct() \
                .localCheckpoint()
    ga = grams.where(F.col("grp") == grp_a).select("g")
    gb_ = grams.where(F.col("grp") == grp_b).select("g")
    na = ga.count()
    nb = gb_.count()
    ni = ga.join(gb_, on="g", how="left_semi").count()
    union = na + nb - ni
    jac = (math.floor(ni / union * 1e6 + 0.5) / 1e6 if union
           else None)
    spark = df.sparkSession
    return spark.createDataFrame(
        [(na, nb, ni, jac)],
        "n_a long, n_b long, n_inter long, jaccard double")


def _bloom_positions(col, m_bits: int, k: int):
    """The k deterministic bit positions of a value: independent
    md5-derived 60-bit hashes (value + '#' + probe index) mod m —
    engine-pure (DuckDB replay:
    ``('0x' || substr(md5(v || '#' || i), 1, 15))::BIGINT % m``)."""
    return [F.pmod(F.conv(F.substring(
                F.md5(F.concat(col.cast("string"),
                               F.lit(f"#{i}"))), 1, 15), 16, 10)
             .cast("long"), F.lit(m_bits)) for i in range(k)]


def bloom_build(df: DataFrame, key_col: str,
                m_bits: int = 1 << 20, k: int = 5) -> DataFrame:
    """Build a Bloom filter over a key column as a RELATION of
    (word, bits) int64 rows — the join-pruning workhorse at 100 TB
    (broadcast the <= m/64-row filter to the big side and drop rows
    whose keys definitely aren't in the small side, before any
    shuffle). Wholly deterministic (md5 probe hashes, `bloom_contains`
    replays them), so false positives are reproducible and
    cross-engine testable — unlike hash-seeded native bloom builds.

    Plan: k probe positions per key (constant fan-out), one grouped
    BIT_OR over 32-bit words (word = pos >> 5; 32-bit words keep the
    per-bit shift <= 31 — a 64-bit word needs 1 << 63, which DuckDB
    rejects as signed overflow, so 32-bit is the cross-engine-exact
    choice) — map-side combined, output bounded by m/32 rows
    regardless of input size. Absent words mean all-zero bits
    (`bloom_contains` left-joins). Size m_bits for the target FPP:
    m/n = 10 bits/key + k = 5 gives ~1 % FPP."""
    key = F.col(key_col)
    base = df.select(key.alias("_v")).where(F.col("_v").isNotNull())
    pos = F.explode(F.array(*_bloom_positions(F.col("_v"),
                                              m_bits, k)))
    return (base.select(pos.alias("_p"))
                .select(F.shiftright(F.col("_p"), 5).alias("word"),
                        F.expr("shiftleft(cast(1 as bigint), "
                               "cast(pmod(_p, 32) as int))")
                         .alias("_m"))
                .groupBy("word")
                .agg(F.bit_or("_m").cast("bigint").alias("bits")))


def bloom_contains(bloom_df: DataFrame, test_df: DataFrame,
                   key_col: str, m_bits: int = 1 << 20,
                   k: int = 5) -> DataFrame:
    """Membership test against a `bloom_build` relation: a key is
    'maybe present' iff ALL k probe bits are set (no false negatives;
    deterministic false positives at the design FPP). Plan: k probe
    rows per test key joined to the (broadcastable) filter relation,
    one grouped all-bits-set fold. Output: (key, maybe boolean)."""
    key = F.col(key_col)
    base = (test_df.select(key.alias("key")).distinct()
                   .where(F.col("key").isNotNull()))
    pos = F.explode(F.array(*_bloom_positions(F.col("key"),
                                              m_bits, k)))
    probes = base.select("key", pos.alias("_p")) \
                 .select("key",
                         F.shiftright(F.col("_p"), 5).alias("word"),
                         F.expr("shiftleft(cast(1 as bigint), "
                                "cast(pmod(_p, 32) as int))")
                          .alias("_m"))
    hit = (probes.join(F.broadcast(bloom_df), on="word", how="left")
                 .withColumn("_ok",
                             (F.coalesce(F.col("bits"), F.lit(0))
                              .bitwiseAND(F.col("_m"))
                              != 0).cast("int")))
    return (hit.groupBy("key")
               .agg((F.sum("_ok") == F.lit(k)).alias("maybe")))


def _qsk_level(k: int, cnt_col) -> F.Column:
    """Smallest L with k * 2^L >= n — PURE INTEGER math (an
    IEEE ceil(log2(n/k)) at an exact power-of-two boundary would be
    engine roulette). L <= 50 covers n up to k * 2^50 (~10^18 rows
    at k=1024); shiftleft stays far inside int64."""
    return F.expr(
        f"array_min(filter(sequence(0, 50), "
        f"l -> shiftleft(cast({int(k)} as bigint), l) >= {cnt_col}))") \
        .cast("int")


def quantile_sketch_build(df: DataFrame, val_col: str, uid_col,
                          k: int = 1024, group_cols=None,
                          salt: str = "qsk") -> DataFrame:
    """Mergeable DETERMINISTIC quantile sketch — the one-pass
    bounded-size summary the exact range-partitioned quantiles
    (profiling `_exact_rank`) are too expensive for at 100 TB.

    Construction (hash-level Bernoulli rank sample — the geometric
    level trick of distinct sampling [Flajolet-Martin] applied to
    rank estimation, i.e. a coordinated bottom-k sample in the sense
    of Cohen & Kaplan): every row gets a 60-bit md5 hash of its
    UNIQUE id (``salt || ':' || uid`` — hashing the id, not the
    value, keeps duplicate-heavy columns honestly sampled); the
    per-group level L is the smallest integer with k*2^L >= n, and
    the sketch keeps exactly the rows whose hash ≡ 0 (mod 2^L) — an
    expected k/2..k items, each representing 2^L rows. Everything is
    a pure function of the data (no RNG, no partition-order
    dependence), so the whole sketch — not just its shape — replays
    bit-for-bit in a SQL oracle, and groups with n <= k keep ALL
    rows (the sketch degrades to exact).

    Mergeability: levels NEST (hash ≡ 0 mod 2^L' implies ≡ 0 mod 2^L
    for L <= L'), so re-thresholding a union of sketches at the
    combined level equals the sketch built directly over the
    combined data — EXACT equality, tested, not just same error
    bound. Rank error is the Bernoulli sampling deviation
    O(n/sqrt(k)) — cruder than KLL's O(n/k) for the same k, bought
    deliberately: KLL's streaming compaction is arrival-order
    dependent and cannot be replayed by a declarative oracle.

    Plan: one grouped count + one co-partitioned join back + a
    pushed-down modulo filter — a single shuffle over the slim
    (group, uid-hash, val) relation; output is ~k rows per group
    regardless of input size. Returns (group..., _n, _level, _h,
    _val); feed to `quantile_sketch_merge` / `quantile_sketch_query`.
    """
    base = quantile_sketch_base(df, val_col, uid_col, group_cols,
                                salt)
    return quantile_sketch_from_base(base, k, group_cols)


def quantile_sketch_base(df: DataFrame, val_col: str, uid_col,
                         group_cols=None,
                         salt: str = "qsk") -> DataFrame:
    """The slim hashed base relation `quantile_sketch_build` samples
    from: (group..., _h, _val) with NULL values dropped. Split out
    (r13) so a gate that ALSO needs a full pass over the same values
    (q321's true-rank calibration) can share ONE scan of the slim
    projection between the sketch's count pass, its sample pass, and
    the calibration aggregate — three input scans collapse to one
    when the base is materialized (guide §2.4)."""
    groups = list(group_cols or [])
    return (df.select(*groups,
                      cross_hash60(
                          F.concat(F.lit(f"{salt}:"),
                                   F.col(uid_col).cast("string")
                                   if isinstance(uid_col, str)
                                   else uid_col.cast("string")))
                      .alias("_h"),
                      F.col(val_col).cast("double").alias("_val"))
              .where(F.col("_val").isNotNull()))


def quantile_sketch_from_base(base: DataFrame, k: int = 1024,
                              group_cols=None) -> DataFrame:
    """`quantile_sketch_build`'s tail over a prebuilt base relation
    (see `quantile_sketch_base`)."""
    groups = list(group_cols or [])
    cnt = (base.groupBy(*groups)
               .agg(F.count("*").cast("bigint").alias("_n"))
               .withColumn("_level", _qsk_level(k, "_n")))
    joined = _qsk_join_back(base, cnt, groups)
    return (joined.where(F.pmod(
                F.col("_h"),
                F.expr("shiftleft(cast(1 as bigint), _level)")) == 0)
                  .select(*groups, "_n", "_level", "_h", "_val"))


def _qsk_join_back(big: DataFrame, meta: DataFrame,
                   groups: list) -> DataFrame:
    """NULL-SAFE broadcast join of a one-row-per-group meta relation
    back onto a big relation. Two disciplines live here: (1) the meta
    side BROADCASTS — a plain join on the group key would shuffle the
    FULL input and collapse onto one task for a hot group; (2) the
    join is eqNullSafe per group column — groupBy keeps a NULL group,
    so a null-unsafe equi-join would silently drop every NULL-group
    row from the sketch (the NULL-group AUC failure class; r12 review
    finding)."""
    if not groups:
        return big.crossJoin(F.broadcast(meta))
    ren = meta
    for i, g in enumerate(groups):
        ren = ren.withColumnRenamed(g, f"_qg{i}")
    cond = None
    for i, g in enumerate(groups):
        c = big[g].eqNullSafe(F.col(f"_qg{i}"))
        cond = c if cond is None else cond & c
    return (big.join(F.broadcast(ren), cond)
               .drop(*[f"_qg{i}" for i in range(len(groups))]))


def quantile_sketch_merge(sketches: list, k: int = 1024,
                          group_cols=None) -> DataFrame:
    """Merge `quantile_sketch_build` outputs over DISJOINT row sets
    (shards, days, partitions): total n per group = sum of the
    shards' n, new level from the same integer rule, and the union
    re-thresholded at the new level. Because levels nest, the result
    EQUALS the direct sketch over the concatenated data — the
    mergeability contract a 100 TB rollup (per-day sketches folded
    into a month) depends on. Only sketch-sized relations are
    touched; no re-scan of the base data.

    Caveat (bounded like RHO_CAP): a shard's per-group n rides on its
    kept rows, so a group whose shard kept ZERO rows loses that
    shard's count. P(zero kept) = (1-2^-L)^n <= e^(-k/2) — ~1e-14 at
    k=64, ~1e-111 at k=512 — astronomically below any operational
    risk; a deployment that cannot accept it can carry the (group, n)
    relation alongside.

    ``k`` MUST be the k the inputs were built with: a larger merge k
    could put the merged level BELOW a shard's build level, and the
    re-threshold would keep rows whose stated weight is finer than
    the merged one — silently wrong estimates. That inversion is
    detected in-plan and raises (the loud-contract tripwire)."""
    if not sketches:
        raise ValueError("quantile_sketch_merge: empty sketch list")
    groups = list(group_cols or [])
    tagged = None
    for i, s in enumerate(sketches):
        t = s.withColumn("_src", F.lit(i))
        tagged = t if tagged is None else tagged.unionByName(t)
    per_src = (tagged.groupBy(*groups, "_src")
                     .agg(F.max("_n").alias("_sn")))
    tot = (per_src.groupBy(*groups)
                  .agg(F.sum("_sn").cast("bigint").alias("_tn"))
                  .withColumn("_tl", _qsk_level(k, "_tn")))
    j = _qsk_join_back(tagged, tot, groups)
    # levels must nest upward: merged level >= every input level.
    # assert_true returns NULL when the predicate holds (so isNull()
    # keeps the row) and RAISES when it doesn't — an in-plan tripwire
    # Catalyst cannot prune away.
    lv_ok = F.assert_true(
        F.col("_level") <= F.col("_tl"),
        F.lit("quantile_sketch_merge: input sketch level exceeds the "
              "merged level — were the inputs built with a larger k "
              "than merge's k?"))
    return (j.where(lv_ok.isNull()
                    & (F.pmod(F.col("_h"),
                              F.expr("shiftleft(cast(1 as bigint), "
                                     "_tl)")) == 0))
             .select(*groups,
                     F.col("_tn").alias("_n"),
                     F.col("_tl").alias("_level"), "_h", "_val"))


def quantile_sketch_query(sketch: DataFrame, phis: list,
                          group_cols=None) -> DataFrame:
    """Quantile estimates from a sketch relation: per group the kept
    items are ranked by (val, hash) — a TOTAL order, so ties cannot
    reorder across partitionings — and phi maps to the item at index
    clamp(ceil(p6 * m / 10^6), 1, m) where p6 = round(phi * 10^6),
    evaluated as PURE INTEGERS ((p6*m + 999999) div 10^6) on both
    engines — an IEEE ceil(phi*m) can land an ulp above an exact
    integer (0.07*100) and pick a different item than an exact-
    decimal oracle (r12 review finding; same discipline as
    `_qsk_level`). Each kept item stands for 2^level rows, so index
    i estimates global rank i * 2^level. The window partitions by
    GROUP over ~k rows — never a global single-task sort. Output:
    (group..., phi, est, n, level, m); a group whose sketch kept no
    rows is ABSENT from the output (there is nothing to estimate
    from), not NULL-extended."""
    groups = list(group_cols or [])
    w = Window.partitionBy(*groups).orderBy("_val", "_h") if groups \
        else Window.partitionBy(F.lit(1)).orderBy("_val", "_h")
    ranked = (sketch.withColumn("_rn", F.row_number().over(w))
                    .withColumn("_m", F.count("*").over(
                        Window.partitionBy(*groups) if groups
                        else Window.partitionBy(F.lit(1)))))
    phi_arr = F.array(*[
        F.struct(F.lit(float(p)).alias("phi"),
                 F.lit(int(round(float(p) * 1_000_000)))
                  .cast("bigint").alias("p6"))
        for p in phis])
    # explode the (tiny) phi list onto every kept row and keep the
    # row whose rank IS that phi's index — no re-join, so NULL groups
    # and group-key matching never enter the picture
    return (ranked.select(*groups, "_n", "_level", "_m", "_rn",
                          "_val", F.explode(phi_arr).alias("_s"))
                  .withColumn("_i", F.least(
                      F.greatest(
                          F.expr("cast((_s.p6 * _m + 999999) "
                                 "div 1000000 as bigint)"),
                          F.lit(1)), F.col("_m")))
                  .where(F.col("_rn") == F.col("_i"))
                  .select(*groups, F.col("_s.phi").alias("phi"),
                          F.col("_val").alias("est"),
                          F.col("_n").alias("n"),
                          F.col("_level").cast("int").alias("level"),
                          F.col("_m").cast("bigint").alias("m")))


def bloom_prune(df: DataFrame, key_col: str, bloom_df: DataFrame,
                m_bits: int, k: int = 5) -> DataFrame:
    """PRE-SHUFFLE Bloom pruning of a big relation — the composition
    `bloom_contains` is the wrong shape for: `bloom_contains`
    DISTINCTs the probe keys (a shuffle of the big side's key set)
    and hands back a membership relation that must be joined back
    (another shuffle). This evaluates membership INLINE on every row
    instead: the k probe positions become k columns and each probes
    the (<= m/32-row, BROADCAST) word relation with its own
    BroadcastHashJoin — ZERO shuffles of the big side, exactly the
    row-pruning dataflow a 100 TB join wants upstream of its
    Exchange (the manual form of Spark's runtime bloom-filter
    pushdown, but with the deterministic md5 filter `bloom_build`
    emits and the oracle can replay). Appends a `maybe` boolean
    (no false negatives); follow with `.where("maybe")` BEFORE the
    real join so the shuffle only carries surviving rows."""
    out = df
    key = F.col(key_col)
    acc = None
    for i, pos in enumerate(_bloom_positions(key, m_bits, k)):
        w = bloom_df.select(F.col("word").alias(f"_w{i}"),
                            F.col("bits").alias(f"_b{i}"))
        out = out.withColumn(f"_p{i}", pos) \
                 .join(F.broadcast(w),
                       F.shiftright(F.col(f"_p{i}"), 5)
                       == F.col(f"_w{i}"), "left")
        bit = (F.coalesce(F.col(f"_b{i}"), F.lit(0))
                .bitwiseAND(F.expr(
                    f"shiftleft(cast(1 as bigint), "
                    f"cast(pmod(_p{i}, 32) as int))")) != 0)
        acc = bit if acc is None else (acc & bit)
    drop = [c for i in range(k) for c in (f"_p{i}", f"_w{i}", f"_b{i}")]
    return out.withColumn("maybe", acc).drop(*drop)


# ---------------------------------------------------------------------------
# Mergeable heavy hitters (Misra-Gries summary, canonical order-free form)
# ---------------------------------------------------------------------------

def _hh_kth_largest(counts: DataFrame, groups: list, k: int,
                    out_col: str = "_s") -> DataFrame:
    """The (k+1)-th largest ``_c`` VALUE per group, computed
    scale-safe: per-shuffle-partition top-(k+1) first (any value in
    the global top-(k+1) multiset survives its own partition's cut —
    the standard two-phase top-k argument holds under ties), then
    rank k+1 of the <= (k+1) * numPartitions survivors. Never a full
    per-group sort: a hot group with 10^9 distinct keys would pin a
    single task under a plain ``row_number() OVER (PARTITION BY
    group ORDER BY count DESC)``. The row_number tiebreak among
    equal counts is arbitrary (spark_partition_id is not stable
    across partitionings), but only the count VALUE at rank k+1
    leaves this function, and that value is partition-independent.
    Returns (groups..., out_col) with a row ONLY for groups having
    more than k distinct keys."""
    part = counts.withColumn("_pid", F.spark_partition_id())
    w1 = (Window.partitionBy(*(groups + ["_pid"])) if groups
          else Window.partitionBy("_pid")).orderBy(F.col("_c").desc())
    cand = (part.withColumn("_prk", F.row_number().over(w1))
                .where(F.col("_prk") <= k + 1)
                .drop("_pid", "_prk"))
    w2 = (Window.partitionBy(*groups) if groups
          else Window.partitionBy(F.lit(1))).orderBy(F.col("_c").desc())
    return (cand.withColumn("_rk", F.row_number().over(w2))
                .where(F.col("_rk") == k + 1)
                .select(*groups, F.col("_c").alias(out_col)))


def _hh_err_meta(meta: DataFrame, srel: DataFrame,
                 groups: list) -> DataFrame:
    """LEFT null-safe join of the one-row-per-group (k+1)-th-largest
    relation onto the one-row-per-group meta relation (slim x slim —
    no broadcast hint needed; a NULL group is a real group, the
    `_qsk_join_back` discipline). Groups with <= k distinct keys get
    ``_s = 0``."""
    if not groups:
        # srel has 0 or 1 rows; LEFT join on TRUE attaches it (or NULL)
        return (meta.join(srel, F.lit(True), "left")
                    .withColumn("_s", F.coalesce(
                        F.col("_s"), F.lit(0).cast("bigint"))))
    ren = srel
    for i, g in enumerate(groups):
        ren = ren.withColumnRenamed(g, f"_hg{i}")
    cond = None
    for i, g in enumerate(groups):
        c = meta[g].eqNullSafe(F.col(f"_hg{i}"))
        cond = c if cond is None else cond & c
    return (meta.join(ren, cond, "left")
                .drop(*[f"_hg{i}" for i in range(len(groups))])
                .withColumn("_s", F.coalesce(F.col("_s"),
                                             F.lit(0).cast("bigint"))))


def heavy_hitters_build(df: DataFrame, key_col: str, k: int = 64,
                        group_cols=None,
                        weight_col: str = None) -> DataFrame:
    """Mergeable DETERMINISTIC heavy-hitters summary — the
    Misra-Gries `Frequent` summary [Misra & Gries 1982] in its
    canonical ORDER-FREE form, sized <= k items per group whatever
    the input size. The streaming MG loop is arrival-order dependent
    (unreplayable by a declarative oracle — the KLL-compaction
    failure class the quantile sketch also avoids); this computes
    the same summary as a pure function of the data: EXACT grouped
    counts (a distributed, order-free aggregate), then ONE
    subtract-and-prune by the (k+1)-th largest count — the reduction
    step whose mergeability is proved in Agarwal, Cormode, Huang,
    Phillips, Wei & Yi, "Mergeable Summaries" (PODS 2012).

    Contract (err is CARRIED AS DATA, so the guarantee is always
    checkable, never trusted): for every key x of group g with true
    (weighted) count c(x):  est(x) <= c(x) <= est(x) + err   if x is
    in the summary, and c(x) <= err if it is not — so every key with
    c(x) > err is guaranteed PRESENT. For a direct build err is the
    (k+1)-th largest count, <= n/(k+1); merges add their subtracted
    amounts into err (see `heavy_hitters_merge`).

    Plan shape at 100 TB: one grouped count over the raw data (the
    only full-data shuffle), a TWO-PHASE top-(k+1) for the pruning
    threshold (`_hh_kth_largest` — never a per-group global sort),
    and one broadcast join-back of the one-row-per-group err
    relation (`_qsk_join_back`: eqNullSafe, so a NULL group
    survives). The counts subplan feeds three consumers unchanged,
    so Spark reuses its Exchange rather than rescanning the input.

    ``weight_col`` (optional) makes it a weighted summary (e.g.
    token counts pre-aggregated per doc); weights must be
    NON-NEGATIVE integers — NULL weights contribute nothing. A NULL
    key is a real key (groupBy keeps it; meta rows are told apart by
    ``_meta``, never by key nullness).

    Returns one relation holding BOTH row kinds (the merge-robust
    encoding — a group whose items all pruned to zero, e.g. all
    counts equal, still carries its (n, err) in the meta row):
    (group..., _meta, _key, _c, _n, _err) where ``_meta = true``
    rows have NULL _key/_c and item rows have est = _c. Feed to
    `heavy_hitters_merge` / `heavy_hitters_query`."""
    groups = list(group_cols or [])
    wcol = (F.col(weight_col).cast("bigint") if weight_col
            else F.lit(1).cast("bigint"))
    counts = (df.groupBy(*groups, F.col(key_col).alias("_key"))
                .agg(F.coalesce(F.sum(wcol), F.lit(0))
                      .cast("bigint").alias("_c")))
    # loud contract: MG only works on additive NON-NEGATIVE masses —
    # a negative aggregated weight would silently vanish in the
    # `_c > _err` prune instead of failing. assert_true is NULL when
    # the predicate holds (row kept) and RAISES when it doesn't.
    neg_ok = F.assert_true(
        F.col("_c") >= 0,
        F.lit("heavy_hitters_build: negative aggregated weight — "
              "weights must be non-negative"))
    counts = counts.where(neg_ok.isNull())
    meta = (counts.groupBy(*groups)
                  .agg(F.sum("_c").cast("bigint").alias("_n")))
    srel = _hh_kth_largest(counts, groups, k)
    emeta = (_hh_err_meta(meta, srel, groups)
             .select(*groups, "_n", F.col("_s").alias("_err")))
    key_t = counts.schema["_key"].dataType
    metarows = emeta.select(
        *groups, F.lit(True).alias("_meta"),
        F.lit(None).cast(key_t).alias("_key"),
        F.lit(None).cast("bigint").alias("_c"), "_n", "_err")
    items = (_qsk_join_back(counts, emeta, groups)
             .where(F.col("_c") > F.col("_err"))
             .select(*groups, F.lit(False).alias("_meta"), "_key",
                     (F.col("_c") - F.col("_err")).cast("bigint")
                      .alias("_c"), "_n", "_err"))
    return metarows.unionByName(items)


def heavy_hitters_merge(sketches: list, k: int = 64,
                        group_cols=None) -> DataFrame:
    """Merge `heavy_hitters_build` outputs over DISJOINT row sets
    (shards, days, sources) in ONE order-free step: per-group n and
    accumulated err sum over the shards' META rows (robust even when
    a shard's items all pruned away), item estimates sum per key,
    and one further subtract-and-prune by the (k+1)-th largest
    summed estimate caps the result at k items. This is the
    summary-merge of Agarwal et al. (PODS 2012); unlike the quantile
    sketch the result does NOT equal the direct build — it is a
    coarser summary — but it is a PURE FUNCTION of the input
    summaries (no pairwise order: a multiway merge is one grouped
    sum + one prune), so a SQL oracle replays it exactly, and the
    [est, est + err] containment contract survives: err_out =
    sum(shard errs) + the new subtraction <= 2n/(k+1) for a one-shot
    multiway merge of direct builds.

    ``k`` here only caps the OUTPUT size — the guarantee rides on
    the explicit err column, so merging with a different k than the
    builds used stays correct (no level-inversion tripwire needed,
    unlike `quantile_sketch_merge`). Only sketch-sized relations are
    touched; no re-scan of the base data."""
    if not sketches:
        raise ValueError("heavy_hitters_merge: empty sketch list")
    groups = list(group_cols or [])
    u = sketches[0]
    for s in sketches[1:]:
        u = u.unionByName(s)
    metas = (u.where(F.col("_meta"))
              .groupBy(*groups)
              .agg(F.sum("_n").cast("bigint").alias("_n"),
                   F.sum("_err").cast("bigint").alias("_e0")))
    items = (u.where(~F.col("_meta"))
              .groupBy(*groups, "_key")
              .agg(F.sum("_c").cast("bigint").alias("_c")))
    srel = _hh_kth_largest(items, groups, k)
    emeta = (_hh_err_meta(metas, srel, groups)
             .select(*groups, "_n",
                     (F.col("_e0") + F.col("_s")).cast("bigint")
                      .alias("_err"),
                     F.col("_s").alias("_sc")))
    key_t = items.schema["_key"].dataType
    metarows = emeta.select(
        *groups, F.lit(True).alias("_meta"),
        F.lit(None).cast(key_t).alias("_key"),
        F.lit(None).cast("bigint").alias("_c"), "_n", "_err")
    out_items = (_qsk_join_back(items, emeta, groups)
                 .where(F.col("_c") > F.col("_sc"))
                 .select(*groups, F.lit(False).alias("_meta"), "_key",
                         (F.col("_c") - F.col("_sc")).cast("bigint")
                          .alias("_c"), "_n", "_err"))
    return metarows.unionByName(out_items)


def heavy_hitters_query(sketch: DataFrame, group_cols=None) -> DataFrame:
    """Heavy-hitter estimates from a summary relation: the <= k item
    rows per group with their containment interval. Output
    (group..., key, est_lo, est_hi, n, err): true count is in
    [est_lo, est_hi] = [_c, _c + err]; any key with true count > err
    is guaranteed present; a group whose summary kept zero items
    (all counts equal, below the pruning threshold) contributes no
    rows — its (n, err) lives on the meta row of the summary
    itself."""
    groups = list(group_cols or [])
    return (sketch.where(~F.col("_meta"))
                  .select(*groups, F.col("_key").alias("key"),
                          F.col("_c").alias("est_lo"),
                          (F.col("_c") + F.col("_err"))
                           .cast("bigint").alias("est_hi"),
                          F.col("_n").alias("n"),
                          F.col("_err").alias("err")))

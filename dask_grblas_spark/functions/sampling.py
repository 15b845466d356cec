"""Deterministic corpus sampling / splitting — the data-mixing layer of a
training pipeline (train/val/test splits, per-source sampling rates,
reproducible subsampling).

Everything is keyed on md5 of the stable document key, NOT on RNG state:
the assignment of a document is a pure function of (key, seed), so it is
identical across runs, engines, partitionings and cluster sizes — the
property that matters when a 100 TB corpus is re-materialized
incrementally. Decisions are made by comparing a fixed-length md5-hex
PREFIX against precomputed hex thresholds: hex strings compare
lexicographically exactly like the numbers they encode, and md5 is
bit-identical everywhere (verified against the DuckDB oracle), so every
operator here is exactly SQL-replicable. Granularity: 4 hex chars =
1/65536 resolution per split fraction.

All operators are single-scan map-side Column expressions — no shuffle,
no UDFs, embarrassingly parallel.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["split_key", "split_column", "deterministic_sample",
           "hex_threshold", "mixture_sample", "group_sample",
           "weighted_sample", "negative_sampling_table",
           "mixture_token_accounting", "neyman_allocation",
           "split_leakage", "poisson_bootstrap", "systematic_sample"]

#: Poisson(1) cumulative probabilities P(X <= k) for k = 0..8 — the
#: inverse-CDF ladder poisson_bootstrap draws from (P(X > 8) ~ 1e-6;
#: the truncation is part of the deterministic definition). The SAME
#: literals appear in the SQL oracle, so the per-row weights are
#: bit-identical cross-engine.
_POISSON1_CUM = (0.36787944117144233, 0.7357588823428847,
                 0.9196986029286058, 0.9810118431238463,
                 0.9963401531726563, 0.9994058151824183,
                 0.999916758850712, 0.9999897508033253,
                 0.999998874797402)

_PREFIX_LEN = 4  # 16^4 = 65536 buckets


def hex_threshold(fraction: float, prefix_len: int = _PREFIX_LEN) -> str:
    """The hex string h such that P(md5_prefix < h) == round(fraction *
    16^prefix_len) / 16^prefix_len under a uniform hash."""
    space = 16 ** prefix_len
    cut = min(space, max(0, round(fraction * space)))
    return format(cut, f"0{prefix_len + 1}x")[-prefix_len:] \
        if cut < space else "g" * prefix_len  # 'g' > 'f': always true


def split_key(key_col: Column, seed: int = 0,
              prefix_len: int = _PREFIX_LEN) -> Column:
    """Uniform [0, 16^prefix_len) bucket id as a hex STRING — the
    comparable unit all sampling decisions use."""
    return F.substring(
        F.md5(F.concat_ws("-", key_col.cast("string"),
                          F.lit(str(seed)))), 1, prefix_len)


def split_column(df: DataFrame, id_col: str = "doc_id",
                 splits: dict[str, float] | None = None,
                 seed: int = 0) -> DataFrame:
    """Assign every row to one named split by consecutive hex ranges
    (e.g. {'train': 0.9, 'val': 0.05, 'test': 0.05}). Fractions must sum
    to 1 (+-rounding); resolution 1/65536."""
    splits = splits or {"train": 0.9, "val": 0.05, "test": 0.05}
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    k = split_key(F.col(id_col), seed)
    expr = None
    acc = 0.0
    names = list(splits)
    for name in names[:-1]:
        acc += splits[name]
        cond = k < F.lit(hex_threshold(acc))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = (F.lit(names[-1]) if expr is None
            else expr.otherwise(names[-1]))
    return df.withColumn("split", expr)


def deterministic_sample(df: DataFrame, fraction: float,
                         id_col: str = "doc_id", seed: int = 0) -> DataFrame:
    """Reproducible subsample: keeps exactly the rows whose hash bucket
    falls below the fraction threshold — stable under reruns, unions and
    repartitioning (unlike df.sample, whose output depends on partition
    layout)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    return df.filter(split_key(F.col(id_col), seed)
                     < F.lit(hex_threshold(fraction)))


def mixture_sample(df: DataFrame, source_col: str, alpha: float = 0.5,
                   target_frac: float = 0.25, id_col: str = "doc_id",
                   seed: int = 0) -> DataFrame:
    """Temperature-based mixture sampling: per-source keep rates chosen
    so the SELECTED corpus has source proportions ~ n_s^alpha (alpha=1
    preserves natural proportions, alpha->0 flattens toward uniform —
    the standard multi-source training-mixture reweighting) with an
    overall target of ``target_frac`` of all rows. The per-row decision
    is a pure function of (id, seed) — md5-uniform u < p_s — so the
    sample is identical across runs, engines, and partitionings.

    Adds (p_keep, mix_keep); filter on mix_keep to materialize. Rates
    ride a broadcast k-row relation; the scan stays single-pass.
    p_s = min(1, target_frac * N * n_s^alpha / (sum_s n_s^alpha * n_s)),
    rounded to 9 decimals in both engines (pow/div last-ulp drift)."""
    counts = df.groupBy(source_col).agg(F.count("*").alias("n_s"))
    tot = counts.agg(F.sum(F.pow(F.col("n_s"), alpha)).alias("z"),
                     F.sum("n_s").alias("n"))
    rates = (counts.crossJoin(F.broadcast(tot))
                   .withColumn("p_keep", F.round(
                       F.least(F.lit(1.0),
                               F.lit(target_frac) * F.col("n")
                               * F.pow(F.col("n_s"), alpha)
                               / (F.col("z") * F.col("n_s"))), 9))
                   .select(source_col, "p_keep"))
    u = (F.conv(F.substring(
            F.md5(F.concat_ws("-", F.col(id_col).cast("string"),
                              F.lit(f"mix{seed}"))), 1, 15), 16, 10)
          .cast("double") / float(1 << 60))
    return (df.join(F.broadcast(rates), on=source_col)
              .withColumn("mix_keep", u < F.col("p_keep")))


def group_sample(df: DataFrame, group_col: str = "source",
                 id_col: str = "doc_id", k: int = 5, n_shards: int = 64,
                 seed: int = 42) -> DataFrame:
    """Deterministic per-group uniform sample (reservoir-sampling
    equivalent): rank rows within each group by the cross-engine md5
    hash of (seed, id) and keep the k smallest — partition-invariant,
    re-runnable, and exactly replayable in SQL.

    Scale shape: a single per-group window would sort each group in ONE
    task (a 10^9-row source = one straggler), so selection is the
    standard TWO-PHASE distributed top-k: per (group, hash-shard)
    windows keep k candidates each (parallelism = groups x n_shards),
    then a per-group re-rank over the <= k * n_shards survivors (a
    bounded relation) picks the global k. Output: (grp, id, rank)."""
    from .dedup import cross_hash60

    h = cross_hash60(F.concat(F.lit(f"{seed}:"),
                              F.col(id_col).cast("string")))
    base = df.select(F.col(group_col).alias("grp"),
                     F.col(id_col).alias("id"), h.alias("_h"))
    base = base.withColumn("_s", F.pmod(F.col("_h"), F.lit(n_shards)))
    w1 = Window.partitionBy("grp", "_s").orderBy("_h", "id")
    pre = (base.withColumn("_r", F.row_number().over(w1))
               .filter(F.col("_r") <= k))
    w2 = Window.partitionBy("grp").orderBy("_h", "id")
    return (pre.withColumn("rank", F.row_number().over(w2))
               .filter(F.col("rank") <= k)
               .select("grp", "id", "rank"))


def weighted_sample(df: DataFrame, weight_col: str, k: int = 50,
                    id_col: str = "doc_id", seed: int = 42) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis-
    Spirakis A-ES, exponential-key formulation): each row draws
    key = -ln(u) / w with u a md5-uniform in (0, 1] and w its weight;
    the k SMALLEST keys are the sample. Equivalent to sequential
    weighted draws without replacement, but expressed as one global
    top-k — the shape that distributes (per-partition partial top-k,
    TakeOrderedAndProject; no global sort, no sequential state).

    u is (h + 1) / 2^60 from the cross-engine md5 hash, so selection is
    a pure function of (seed, id, weight): partition-invariant and
    exactly replayable in SQL. Rows with w <= 0 are excluded (zero
    weight = never sampled; A-ES requires w > 0).
    Output: (id, w, key, rank) — key rounded to 9 decimals for display;
    ordering uses the unrounded value with id tie-break."""
    from .dedup import cross_hash60

    h = cross_hash60(F.concat(F.lit(f"ws{seed}:"),
                              F.col(id_col).cast("string")))
    u = (h + F.lit(1)).cast("double") / F.lit(float(1 << 60))
    w = F.col(weight_col).cast("double")
    key = -F.log(u) / w
    base = (df.select(F.col(id_col).alias("id"), w.alias("w"),
                      key.alias("_key"))
              .filter(F.col("w") > 0))
    return (base.orderBy("_key", "id").limit(k)
                .select("id", "w", F.round(F.col("_key"), 9).alias("key"))
                .withColumn("rank", F.row_number().over(
                    Window.orderBy("key", "id")))
                .select("id", "w", "key", "rank"))


def negative_sampling_table(df: DataFrame, text_col: str = "text",
                            power: float = 0.75,
                            top_v: int = 200) -> DataFrame:
    """word2vec-style negative-sampling table: the top_v most frequent
    tokens weighted by freq^power (0.75 flattens the unigram head, the
    published word2vec choice), with each token's cumulative probability
    interval [cum_lo, cum_hi) — the lookup table a trainer samples
    negatives from by inverting a uniform draw.

    Scale shape: one map-side-combined token count over the corpus, a
    distributed top-V (TakeOrdered on (freq desc, token) — no global
    sort), then the weight normalization and running sum fold over the
    <= top_v-row relation in a single task. Deterministic: ties at equal
    frequency break by token. Output: (token, freq, p, cum_hi), p and
    cum_hi rounded 6."""
    from .text import tokens

    toks = F.filter(tokens(F.col(text_col)), lambda x: F.length(x) > 0)
    freq = (df.select(F.explode(toks).alias("token"))
              .groupBy("token").agg(F.count("*").alias("freq"))
              .orderBy(F.col("freq").desc(), "token").limit(top_v))
    w = F.pow(F.col("freq").cast("double"), F.lit(float(power)))
    weighted = freq.withColumn("_w", w)
    tot = weighted.agg(F.sum("_w").alias("_tw"))
    ordw = Window.orderBy(F.col("freq").desc(), "token") \
                 .rowsBetween(Window.unboundedPreceding, 0)
    return (weighted.crossJoin(F.broadcast(tot))
            .withColumn("p", F.round(F.col("_w") / F.col("_tw"), 6))
            .withColumn("cum_hi",
                        F.round(F.sum(F.col("_w")).over(ordw)
                                / F.col("_tw"), 6))
            .select("token", F.col("freq").cast("bigint").alias("freq"),
                    "p", "cum_hi"))


def mixture_token_accounting(df: DataFrame, weights: dict[str, float],
                             budget_tokens: int,
                             source_col: str = "source",
                             text_col: str = "text") -> DataFrame:
    """Training-mixture token accounting: given target mixture weights
    per source and a total token budget, compute each source's
    available tokens, its needed tokens (budget x normalized weight),
    and the implied epoch count (needed / available) — the planning
    table behind any multi-corpus sampling schedule (sources with
    epochs > 1 repeat; >> 1 risks memorization).

    One map-side-combined aggregate over the corpus scan; weights are
    a broadcast literal relation. Sources in the data but absent from
    ``weights`` get weight 0 (reported, never sampled). Output:
    (source, available, target_share, needed, epochs), floats rounded
    6; epochs NULL when a weighted source has no tokens."""
    from .text import tokens

    toks = F.filter(tokens(F.col(text_col)), lambda x: F.length(x) > 0)
    avail = (df.select(F.col(source_col).alias("source"),
                       F.size(toks).alias("_n"))
               .groupBy("source")
               .agg(F.sum("_n").cast("bigint").alias("available")))
    spark = df.sparkSession
    tot_w = sum(weights.values())
    wdf = spark.createDataFrame(
        [(k, float(v) / tot_w) for k, v in sorted(weights.items())],
        "source string, target_share double")
    j = avail.join(F.broadcast(wdf), on="source", how="left")
    share = F.coalesce(F.col("target_share"), F.lit(0.0))
    needed = share * F.lit(float(budget_tokens))
    epochs = F.when(F.col("available") > 0,
                    F.round(needed / F.col("available"), 6))
    return j.select("source", "available",
                    F.round(share, 6).alias("target_share"),
                    F.round(needed, 2).alias("needed"),
                    epochs.alias("epochs"))


def neyman_allocation(df: DataFrame, stratum_col: str, val_col: str,
                      total_n: int) -> DataFrame:
    """Neyman-optimal stratified sample allocation: stratum h gets
    n_h = round(total_n * N_h * S_h / sum(N S)) — proportional to
    stratum size x standard deviation, the minimum-variance allocation
    for estimating the overall mean. One moment aggregate per stratum
    (population stddev, rounded 6 before use), then the allocation
    folds over the bounded stratum relation. HALF_UP rounding both
    engines (floor(x + 0.5)). Strata with zero variance draw 0.
    Output: (stratum, n_rows, std, alloc)."""
    v = F.col(val_col).cast("double")
    per = (df.groupBy(F.col(stratum_col).alias("stratum"))
             .agg(F.count("*").cast("bigint").alias("n_rows"),
                  F.round(F.coalesce(F.stddev_pop(v), F.lit(0.0)), 6)
                   .alias("std")))
    tot = per.agg(F.sum(F.col("n_rows") * F.col("std")).alias("_z"))
    alloc = F.when(F.col("_z") > 0,
                   F.floor(F.lit(float(total_n)) * F.col("n_rows")
                           * F.col("std") / F.col("_z") + F.lit(0.5)))\
             .otherwise(F.lit(0)).cast("bigint")
    return (per.crossJoin(F.broadcast(tot))
               .select("stratum", "n_rows", "std",
                       alloc.alias("alloc")))


def split_leakage(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", threshold: float = 0.8,
                  seed: int = 0,
                  splits: dict[str, float] | None = None) -> DataFrame:
    """Train/val/test LEAKAGE audit: count near-duplicate pairs
    (exact n-gram Jaccard >= threshold, dedup.ngram_jaccard_pairs)
    that straddle split boundaries under split_column's deterministic
    assignment — the eval-hygiene check that catches test answers
    hiding in the training set. Composition gate: splits + exact
    near-dup pairs + one bounded join.

    Output: (s_lo, s_hi, n_leaks) per unordered split pair (within-
    split near-dups are fine and excluded)."""
    from .dedup import ngram_jaccard_pairs

    assigned = split_column(df, id_col, splits, seed) \
        .select(F.col(id_col).alias("_id"), "split")
    pairs = ngram_jaccard_pairs(df, id_col, text_col, n=3,
                                threshold=threshold, max_doc_freq=None)
    j = (pairs
         .join(assigned.withColumnRenamed("_id", "id_a")
                       .withColumnRenamed("split", "split_a"), on="id_a")
         .join(assigned.withColumnRenamed("_id", "id_b")
                       .withColumnRenamed("split", "split_b"), on="id_b")
         .where(F.col("split_a") != F.col("split_b")))
    return (j.groupBy(F.least("split_a", "split_b").alias("s_lo"),
                      F.greatest("split_a", "split_b").alias("s_hi"))
             .agg(F.count("*").cast("bigint").alias("n_leaks")))


def poisson_bootstrap(df: DataFrame, val_col: str, n_reps: int = 32,
                      id_col: str = "doc_id", seed: int = 7) -> DataFrame:
    """Deterministic Poisson bootstrap of the mean: each replicate
    re-weights every row by a Poisson(1) draw (the streaming-friendly
    bootstrap — weights are independent per row, no global resample
    pass), and the spread of the replicate means is the sampling
    distribution. The draw inverts the Poisson CDF on a md5-uniform of
    (seed, rep, id), so every weight is a pure cross-engine-replayable
    function — the same discipline as weighted_sample.

    Plan: ONE corpus scan explodes rep indices (n_reps rows per input
    row, map-side aggregated immediately); no shuffle wider than the
    n_reps-row result. Output: (rep, n_eff, mean) with mean rounded 6 —
    rep means ARE the bootstrap distribution (CIs are percentiles of
    this tiny relation)."""
    from .dedup import cross_hash60

    v = F.col(val_col).cast("double")
    base = (df.select(F.col(id_col).alias("id"), v.alias("v"))
              .where(v.isNotNull())
              .select("id", "v",
                      F.explode(F.sequence(
                          F.lit(0), F.lit(n_reps - 1))).alias("rep")))
    h = cross_hash60(F.concat(F.lit(f"pb{seed}:"),
                              F.col("rep").cast("string"), F.lit(":"),
                              F.col("id").cast("string")))
    u = (h + F.lit(1)).cast("double") / F.lit(float(1 << 60))
    w = sum((u > F.lit(c)).cast("int") for c in _POISSON1_CUM)
    return (base.withColumn("w", w)
                .groupBy("rep")
                .agg(F.sum("w").cast("bigint").alias("n_eff"),
                     F.when(F.sum("w") > 0,
                            F.round(F.sum(F.col("w") * F.col("v"))
                                    / F.sum("w"), 6)).alias("mean")))


def systematic_sample(df: DataFrame, every_k: int,
                      id_col: str = "doc_id",
                      seed: int = 11) -> DataFrame:
    """Deterministic systematic sampling: order the population by the
    cross-engine md5 hash of (seed, id) — a uniform random permutation
    that is a pure function of the keys — and keep every k-th row
    (positions 1, k+1, 2k+1, ...). Equivalent to a 1/k uniform sample
    with EXACT stratification along the permutation (no binomial size
    variance, unlike Bernoulli sampling), the survey-sampling classic.

    The global position comes from profiling._exact_rank
    (repartitionByRange on the tie-free (hash, id) key — balanced by
    sampling, no single-task window). Output: (id, pos) for kept rows,
    pos the 1-based permutation position."""
    from .dedup import cross_hash60
    from .profiling import _exact_rank

    if every_k < 1:
        raise ValueError("every_k must be >= 1")
    h = cross_hash60(F.concat(F.lit(f"sys{seed}:"),
                              F.col(id_col).cast("string")))
    base = df.select(F.col(id_col).alias("id"), h.alias("_h"))
    ranked, _ = _exact_rank(base, [F.col("_h"), F.col("id")], "pos")
    return (ranked.where(F.pmod(F.col("pos") - 1,
                                F.lit(every_k)) == 0)
                  .select("id", F.col("pos").cast("bigint")
                           .alias("pos")))

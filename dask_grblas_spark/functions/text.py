"""Text analysis operators over a documents table.

Everything is built from JVM-side Column expressions (split/regexp/length
aggregations inside whole-stage codegen) — no Python UDFs — so each
operator is a single scan with map-side work, embarrassingly parallel at
100 TB. Formulas are deliberately SQL-replicable so the DuckDB oracle can
verify them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["tokens", "token_count", "char_stats", "quality_score",
           "language_id", "fingerprint", "token_frequencies",
           "repetition_stats", "unigram_logprob", "corpus_profile",
           "vocab_oov_rate", "corpus_composition", "bpe_pair_counts",
           "length_batches", "quality_quantile_filter", "zipf_slope",
           "bpe_train", "bpe_encode", "token_cooccurrence",
           "vocab_coverage_curve", "bigram_logprob", "normalize_text",
           "cluster_terms", "token_js_divergence",
           "naive_bayes_classify", "kneser_ney_bigram",
           "kneser_ney_logprob", "repeated_ngram_loops"]

# tiny marker vocabularies for the n-gram/marker language heuristic
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "a"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "los", "que", "de", "y"],
    "zh": ["de", "shi", "bu", "le", "zai"],
}


def tokens(col: Column) -> Column:
    """Whitespace tokenization (the baseline tokenizer; a BPE-ish regex
    variant is token_count(mode='bpe'))."""
    return F.split(F.trim(col), r"\s+")


def token_count(df: DataFrame, text_col: str = "text",
                mode: str = "whitespace") -> DataFrame:
    """Token counting: whitespace tokens or a BPE-ish regex split that
    separates words, digits and punctuation runs."""
    c = F.col(text_col)
    if mode == "whitespace":
        n = F.size(tokens(c))
    elif mode == "bpe":
        # count maximal runs of word chars, digits, or single punctuation
        n = F.size(F.expr(
            f"regexp_extract_all({text_col}, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\\\s]', 0)"))
    else:
        raise ValueError(f"unknown mode {mode!r}")
    return df.withColumn("n_tokens", n.cast("bigint"))


def char_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / digit / whitespace ratios — the standard
    quality-signal scan. One pass, all codegen'd expressions."""
    c = F.col(text_col)
    length = F.length(c)
    n_space = length - F.length(F.regexp_replace(c, r"\s", ""))
    n_punct = length - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    n_digit = length - F.length(F.regexp_replace(c, r"[0-9]", ""))
    safe_len = F.greatest(length, F.lit(1))
    return (df.withColumn("n_chars_m", length.cast("bigint"))
              .withColumn("space_ratio", F.round(n_space / safe_len, 6))
              .withColumn("punct_ratio", F.round(n_punct / safe_len, 6))
              .withColumn("digit_ratio", F.round(n_digit / safe_len, 6)))


def quality_score(df: DataFrame, text_col: str = "text",
                  stopwords=("the", "a", "of", "and", "to")) -> DataFrame:
    """Composite quality score in [0,1]: length band + stopword presence +
    mean word length band (a Gopher-rules-style filter, simplified to
    exact SQL-replicable arithmetic)."""
    c = F.col(text_col)
    toks = tokens(c)
    n_tok = F.size(toks)
    sw_arr = F.array(*[F.lit(s) for s in stopwords])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(sw_arr, t)))
    mean_wlen = F.length(F.regexp_replace(c, r"\s", "")) / F.greatest(n_tok, F.lit(1))
    len_ok = (n_tok >= 10) & (n_tok <= 100000)
    wlen_ok = (mean_wlen >= 2.0) & (mean_wlen <= 12.0)
    stop_ratio = n_stop / F.greatest(n_tok, F.lit(1))
    score = (F.when(len_ok, 0.4).otherwise(0.0)
             + F.when(wlen_ok, 0.3).otherwise(0.0)
             + F.least(stop_ratio * F.lit(3.0), F.lit(0.3)))
    return (df.withColumn("n_tokens", n_tok.cast("bigint"))
              .withColumn("stopword_ratio", F.round(stop_ratio, 6))
              .withColumn("quality", F.round(score, 6)))


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-token language heuristic: score = marker hits per language,
    argmax wins (ties broken by language code order). At 100 TB this is a
    pure map — no shuffle."""
    toks = tokens(F.col(text_col))
    scores = []
    for lang, markers in sorted(_LANG_MARKERS.items()):
        arr = F.array(*[F.lit(m) for m in markers])
        score = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
        scores.append(F.struct(score.alias("s"),
                               F.lit(-ord(lang[0])).alias("tie"),
                               F.lit(lang).alias("lang")))
    best = F.greatest(*scores)
    return df.withColumn("lang_pred", best["lang"]) \
             .withColumn("lang_score", best["s"].cast("bigint"))


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 over the sorted distinct token set —
    order-insensitive content hash for near-exact dedup (the rolling-hash
    fingerprint variant is in dedup.simhash)."""
    toks = F.array_sort(F.array_distinct(tokens(F.col(text_col))))
    return df.withColumn("fingerprint", F.md5(F.array_join(toks, " ")))


def repetition_stats(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text", n: int = 3) -> DataFrame:
    """Repetition signals (the Gopher/FineWeb-style repetitiveness
    filters): duplicate n-gram fraction (1 - distinct/total n-grams) and
    token Shannon entropy. Both are per-document map-side expressions —
    one scan, no shuffle, exact SQL-replicable arithmetic.

    Entropy is computed by sorting the token array ONCE and reading
    run-length frequencies off the sorted array — O(L log L) per doc,
    replacing the earlier O(distinct * L) filter-count-per-distinct-token
    lambda that made a single 100k-token document a ~3e9-comparison
    single-core straggler at corpus scale."""
    base = df.select(F.col(id_col), F.col(text_col),
                     tokens(F.col(text_col)).alias("_toks"))
    g = F.expr(
        f"transform(sequence(0, greatest(size(_toks) - {n}, -1)), "
        f"p -> array_join(slice(_toks, p + 1, {n}), ' '))")
    base = base.select(id_col, "_toks", F.explode(F.array(g)).alias("_g"))
    n_g = F.size(F.col("_g"))
    dup_frac = F.when(n_g <= 0, F.lit(0.0)).otherwise(
        (n_g - F.size(F.array_distinct(F.col("_g")))) / n_g)
    tot = F.size(F.col("_toks"))
    # run starts: positions p (0-based) where the sorted array changes
    base = base.withColumn("_s", F.array_sort(F.col("_toks")))
    base = base.withColumn("_starts", F.expr(
        "case when size(_s) = 0 then array() "
        "when size(_s) = 1 then array(0) "
        "else concat(array(0), filter(sequence(1, size(_s) - 1), "
        "p -> element_at(_s, p + 1) != element_at(_s, p))) end"))
    # run length = next start (or L) minus this start; p_i = run_i / L
    entropy = F.when(tot <= 0, F.lit(0.0)).otherwise(F.expr(
        "aggregate(transform(_starts, (st, k) -> "
        "(coalesce(try_element_at(_starts, k + 2), size(_s)) - st)"
        " / cast(size(_s) as double)), "
        "cast(0.0 as double), (acc, p) -> acc - p * ln(p))"))
    return base.select(
        id_col,
        F.round(dup_frac, 6).alias("dup_ngram_frac"),
        F.round(entropy, 6).alias("token_entropy"))


def token_frequencies(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus token frequency table (the classic first pass of any corpus
    study): explode + count. Shuffle is on the token key — skewed head
    tokens are handled by AQE skew-join/partial aggregation."""
    return (df.select(F.explode(tokens(F.col(text_col))).alias("token"))
              .filter(F.length("token") > 0)
              .groupBy("token").agg(F.count("*").alias("freq")))


def unigram_logprob(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Per-document mean unigram negative log-likelihood against the
    corpus's own unigram distribution — the classic perplexity-style
    quality signal (a doc of globally-rare tokens scores high, repeated
    boilerplate scores low). avg_nll = mean over the doc's tokens of
    -ln(freq(t) / total_tokens). Output: (doc_id, n_tokens, avg_nll).

    Shuffle shape at scale: the frequency lookup joins DISTINCT
    (doc, token) pairs — per-doc term frequencies are pre-aggregated
    (map-side combined) before the join, so a head token contributes
    one row per document containing it, not one per occurrence, and
    the residual head-token skew is the SMJ case AQE's skew-join
    splitting handles (the dictionary side replicates). The per-doc
    mean is then the tf-weighted average."""
    toks = (df.select(F.col(id_col).alias("doc_id"),
                      F.explode(tokens(F.col(text_col))).alias("t"))
              .filter(F.length("t") > 0))
    tf = toks.groupBy("doc_id", "t").agg(F.count("*").alias("tf"))
    freqs = tf.groupBy("t").agg(F.sum("tf").alias("freq"))
    total = freqs.agg(F.sum("freq").alias("total"))
    scored = (tf.join(freqs, on="t").crossJoin(F.broadcast(total))
                .withColumn("nll", -F.log(F.col("freq")
                                          / F.col("total"))))
    return (scored.groupBy("doc_id")
                  .agg(F.sum("tf").cast("bigint").alias("n_tokens"),
                       F.round(F.sum(F.col("tf") * F.col("nll"))
                               / F.sum("tf"), 6).alias("avg_nll")))


def corpus_profile(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """One-row corpus profile — the pre-flight stats pass before any
    pipeline decision (split sizing, dedup thresholds, packing budget):
    document count, token totals, vocabulary size, and exact
    interpolated doc-length percentiles. Two scans at any scale: the
    per-doc length aggregate and the vocabulary countDistinct (both
    map-side combined); the two 1-row branches cross-join for free."""
    toks = F.filter(tokens(F.col(text_col)), lambda x: F.length(x) > 0)
    base = df.select(F.col(id_col).alias("doc_id"),
                     toks.alias("_toks")) \
             .withColumn("n_tokens", F.size("_toks"))
    stats = base.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.round(F.avg("n_tokens"), 6).alias("avg_tokens"),
        F.round(F.percentile(F.col("n_tokens"), F.lit(0.5)), 6)
         .alias("p50_tokens"),
        F.round(F.percentile(F.col("n_tokens"), F.lit(0.9)), 6)
         .alias("p90_tokens"),
        F.round(F.percentile(F.col("n_tokens"), F.lit(0.99)), 6)
         .alias("p99_tokens"))
    vocab = (base.select(F.explode("_toks").alias("t"))
                 .agg(F.count_distinct("t").cast("bigint")
                      .alias("vocab_size")))
    return stats.crossJoin(F.broadcast(vocab))


def vocab_oov_rate(df: DataFrame, vocab_size: int = 1000,
                   id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Tokenizer-prep pass: build the top-``vocab_size`` corpus
    vocabulary (by frequency, token-string tie-break so the cut is
    deterministic) and score every document's out-of-vocabulary rate —
    the standard signal for tokenizer fit / domain shift in a training
    pipeline.

    Scale shape: the frequency table is a map-side-combined groupBy;
    the top-V cut is orderBy+limit, which Spark executes as distributed
    TakeOrdered (each partition keeps its local top V, the driver merges
    V-sized heaps — never a global sort, and V is bounded: a vocab is
    32k–256k entries, not corpus-sized); the per-doc pass then joins
    tokens against the BROADCAST vocabulary, so the only full-corpus
    shuffle is the doc_id re-aggregation. Output: (id, n_tok, oov_rate)
    for documents with at least one token."""
    tok = (df.select(F.col(id_col).alias("id"),
                     F.explode(tokens(F.col(text_col))).alias("t"))
             .filter(F.length("t") > 0))
    vocab = (tok.groupBy("t").agg(F.count("*").alias("freq"))
                .orderBy(F.col("freq").desc(), F.col("t"))
                .limit(vocab_size)
                .select(F.col("t").alias("_vt")))
    return (tok.join(F.broadcast(vocab), tok["t"] == F.col("_vt"),
                     "left_outer")
               .groupBy("id")
               .agg(F.count("*").alias("n_tok"),
                    F.round(F.sum(F.when(F.col("_vt").isNull(), 1)
                                   .otherwise(0))
                            / F.count("*"), 6).alias("oov_rate")))


def corpus_composition(df: DataFrame, dims: list[str] | None = None,
                       text_col: str = "text") -> DataFrame:
    """Corpus composition report with subtotals: doc counts, characters
    and whitespace tokens per (source, lang) cell PLUS the per-source
    and grand-total rollup rows — the mixture audit a training pipeline
    publishes alongside every corpus release.

    Spark-first shape: ``df.rollup(*dims)`` compiles to ONE aggregation
    pass that emits all grouping-set rows with map-side partial
    aggregation (Spark expands the grouping sets before the shuffle) —
    no self-union of per-level groupBys, no second scan. Null grouping
    markers are folded to '<all>' so the report is join/oracle-friendly."""
    dims = dims or ["source", "lang"]
    n_tok = F.size(tokens(F.col(text_col)))
    agg = (df.rollup(*dims)
             .agg(F.count("*").alias("n_docs"),
                  F.sum(F.length(text_col)).cast("bigint").alias("n_chars"),
                  F.sum(n_tok).cast("bigint").alias("n_tokens")))
    return agg.select(
        *[F.coalesce(F.col(d), F.lit("<all>")).alias(d) for d in dims],
        "n_docs", "n_chars", "n_tokens")


def bpe_pair_counts(df: DataFrame, text_col: str = "text",
                    max_word_len: int = 32) -> DataFrame:
    """The first step of BPE tokenizer TRAINING at corpus scale:
    corpus-weighted adjacent-character-pair counts over the word
    frequency table (the statistic each BPE merge round maximizes).

    Scale shape: the corpus collapses to its word-frequency relation
    first (vocab-sized, map-side-combined groupBy), so the pair explode
    runs over DISTINCT WORDS weighted by freq, not over every token
    occurrence — corpus size only affects the first aggregation. Words
    longer than max_word_len are dropped (URL/hash monsters would emit
    unbounded pairs; real BPE trainers pre-tokenize the same way).
    Pair extraction is sequence+substring arithmetic (codegen, exactly
    SQL-replicable). Output: (pair, cnt)."""
    tok = (df.select(F.explode(tokens(F.col(text_col))).alias("w"))
             .filter(F.length("w") > 0))
    wf = (tok.groupBy("w").agg(F.count("*").alias("freq"))
             .filter(F.length("w") <= max_word_len))
    pairs = F.expr("transform(sequence(1, length(w) - 1), "
                   "i -> substring(w, i, 2))")
    return (wf.filter(F.length("w") >= 2)
              .select(F.explode(pairs).alias("pair"), "freq")
              .groupBy("pair")
              .agg(F.sum("freq").cast("bigint").alias("cnt")))


def length_batches(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text", batch_size: int = 8,
                   n_shards: int = 32) -> DataFrame:
    """Length-bucketed inference batching: group documents of similar
    token length into fixed-size batches so padding waste inside each
    batch is bounded (bucket = floor(log2(n_tokens)) — within a batch
    the longest doc is at most 2x the shortest).

    Scale shape: a global per-bucket ordering would serialize each
    bucket into one window partition (~20 buckets = ~20 tasks at any
    corpus size), so docs are first sharded by a cross-engine md5 hash;
    the row_number window runs per (bucket, shard) — parallelism is
    buckets x n_shards, and batches never mix buckets, preserving the
    padding bound. Deterministic: shard and ordering are pure functions
    of the id. Output: (id, n_tok, bucket, shard, batch_no) — shard is
    load-bearing: batch identity is the triple (bucket, shard,
    batch_no); batch_no is only unique within its (bucket, shard)."""
    from .dedup import cross_hash60

    n_tok = F.size(tokens(F.col(text_col)))
    base = (df.select(F.col(id_col).alias("id"),
                      n_tok.cast("bigint").alias("n_tok"))
              .filter(F.col("n_tok") > 0)
              # floor(log2(n)) as EXACT integer arithmetic (binary digit
              # count), not float log2 — log(x)/log(2) can land a hair
              # under an integer at exact powers of two and floor() would
              # then disagree across engines
              .withColumn("bucket",
                          (F.length(F.conv(F.col("n_tok"), 10, 2)) - 1)
                          .cast("bigint"))
              .withColumn("shard",
                          F.pmod(cross_hash60(
                              F.concat(F.lit("batch:"),
                                       F.col("id").cast("string"))),
                              F.lit(n_shards))))
    w = Window.partitionBy("bucket", "shard").orderBy("id")
    return (base.withColumn(
                "batch_no",
                F.floor((F.row_number().over(w) - 1) / batch_size)
                 .cast("bigint"))
                .select("id", "n_tok", "bucket", "shard", "batch_no"))


def quality_quantile_filter(df: DataFrame, keep_top: float = 0.5,
                            id_col: str = "doc_id",
                            text_col: str = "text") -> DataFrame:
    """Keep the top ``keep_top`` fraction of documents by quality score,
    with an EXACT global cutoff computed scale-safely: a global sort of
    the corpus is never taken. Scores are already 6-decimal-quantized
    (quality_score), so the score HISTOGRAM is a bounded relation
    (<= 10^6 + 1 rows regardless of corpus size); a cumulative count
    over that small relation (descending scores) yields the exact
    cutoff — the highest score whose cumulative count reaches
    ceil(keep_top * n) — and the corpus filters against the broadcast
    1-row threshold. Ties at the cutoff are ALL kept (deterministic;
    the kept fraction can exceed keep_top by the tie mass).

    Plan: ONE scoring scan (the (id, quality) relation is eagerly
    localCheckpointed so the histogram branch and the final filter read
    the materialized relation instead of re-scoring the corpus) +
    bounded groupBy + tiny single-partition window (bounded input — the
    design point) + broadcast filter. The target count ``need`` is
    derived INSIDE the plan from the histogram itself
    (ceil(keep_top * sum(_c)) over the same bounded relation) — no
    driver-side count job, no eager action beyond the checkpoint."""
    scored = (quality_score(df, text_col=text_col)
              .select(F.col(id_col).alias("id"), "quality")
              .localCheckpoint(eager=True))
    hist = scored.groupBy("quality").agg(F.count("*").alias("_c"))
    w = (Window.orderBy(F.col("quality").desc())
               .rowsBetween(Window.unboundedPreceding, 0))
    w_all = (Window.orderBy(F.col("quality").desc())
                   .rowsBetween(Window.unboundedPreceding,
                                Window.unboundedFollowing))
    need = F.ceil(F.lit(float(keep_top)) * F.sum("_c").over(w_all))
    thr = (hist.withColumn("_cum", F.sum("_c").over(w))
               .withColumn("_need", need)
               .filter(F.col("_cum") >= F.col("_need"))
               .agg(F.max("quality").alias("_thr")))
    return (scored.crossJoin(F.broadcast(thr))
                  .filter(F.col("quality") >= F.col("_thr"))
                  .select("id", "quality"))


def zipf_slope(df: DataFrame, group_col: str = "source",
               text_col: str = "text", top_r: int = 1000) -> DataFrame:
    """Per-group Zipf fit: least-squares slope/intercept of
    ln(freq) ~ ln(rank) over the group's top_r most frequent tokens —
    the corpus-health diagnostic (natural language sits near slope -1;
    templated/machine text bends the curve) run per source/shard.

    Scale shape: token frequency is one map-side-combined aggregate;
    the rank window runs over the (group, token) FREQUENCY relation
    (vocabulary-sized, not corpus-sized) and the regression folds a
    <= top_r-row relation per group. Closed-form sums, no iteration.
    Ties at equal frequency rank deterministically by token. Output:
    (grp, n_terms, slope, intercept), 6-decimal rounded."""
    toks = F.filter(tokens(F.col(text_col)), lambda x: F.length(x) > 0)
    freq = (df.select(F.col(group_col).alias("grp"),
                      F.explode(toks).alias("tok"))
              .groupBy("grp", "tok").agg(F.count("*").alias("freq")))
    w = Window.partitionBy("grp").orderBy(F.col("freq").desc(), "tok")
    ranked = (freq.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= top_r))
    x = F.log(F.col("rank").cast("double"))
    y = F.log(F.col("freq").cast("double"))
    agg = (ranked.select("grp", x.alias("_x"), y.alias("_y"))
                 .groupBy("grp")
                 .agg(F.count("*").cast("double").alias("_n"),
                      F.sum("_x").alias("_sx"), F.sum("_y").alias("_sy"),
                      F.sum(F.col("_x") * F.col("_y")).alias("_sxy"),
                      F.sum(F.col("_x") * F.col("_x")).alias("_sxx")))
    slope = ((F.col("_n") * F.col("_sxy") - F.col("_sx") * F.col("_sy"))
             / (F.col("_n") * F.col("_sxx") - F.col("_sx") * F.col("_sx")))
    intercept = (F.col("_sy") - slope * F.col("_sx")) / F.col("_n")
    return agg.select("grp", F.col("_n").cast("bigint").alias("n_terms"),
                      F.round(slope, 6).alias("slope"),
                      F.round(intercept, 6).alias("intercept"))


def bpe_train(df: DataFrame, text_col: str = "text", n_merges: int = 5,
              max_word_len: int = 20) -> DataFrame:
    """Train BPE merges ON Spark: n_merges rounds of (count adjacent
    symbol pairs over the corpus-weighted word-frequency relation ->
    adopt the most frequent pair as a new symbol -> rewrite words),
    returning the learned merge table (step, pair, merged, cnt) — the
    actual tokenizer-training loop, not just the first-round statistic
    (bpe_pair_counts).

    Cross-engine-exact representation: a word is the concatenation of
    sentinel-wrapped symbols ('hello' -> '<h><e><l><l><o>'), so a merge
    of (a, b) is a LITERAL string replace of '<a><b>' with '<ab>' —
    and both Spark's and DuckDB's replace() scan left-to-right
    non-overlapping, which IS greedy BPE merge order ('<l><l><l>'
    merges its first two l's). Ties pick the lexicographically
    smallest pair. Symbols never contain the sentinels, so a pattern
    can only match at unit boundaries. Words containing '<' or '>'
    or longer than max_word_len are excluded (documented trade; the
    cap bounds per-round work like bpe_pair_counts').

    Scale shape: after the one corpus-scale word count, every round
    runs on the VOCABULARY-sized (repr, freq) relation: pair explode
    (<= max_word_len rows per word) + map-side-combined count + a
    1-row TakeOrdered; the winning pair is driver-held (kmeans-style
    k-constants pattern) and rewrites the relation for the next round
    with an eager localCheckpoint bounding lineage. Driver traffic is
    ONE ROW per round."""
    spark = df.sparkSession
    toks = F.filter(tokens(F.col(text_col)), lambda x: F.length(x) > 0)
    word = (df.select(F.explode(toks).alias("w"))
              .filter(~F.col("w").rlike("[<>]")
                      & (F.length("w") <= max_word_len))
              .groupBy("w").agg(F.count("*").alias("freq")))
    repr0 = F.expr(
        "concat_ws('', transform(regexp_extract_all(w, '.', 0), "
        "c -> concat('<', c, '>')))")
    cur = (word.select(repr0.alias("r"), "freq")
               .localCheckpoint(eager=True))
    units = F.expr("regexp_extract_all(r, '<[^<>]+>', 0)")
    merges = []
    for step in range(1, n_merges + 1):
        pairs = (cur.select(units.alias("u"), "freq")
                    .select(F.explode(F.expr(
                        "CASE WHEN size(u) < 2 THEN array() "
                        "ELSE transform(sequence(1, size(u) - 1), "
                        "i -> concat(element_at(u, i), "
                        "element_at(u, i + 1))) END")).alias("pair"),
                        "freq")
                    .groupBy("pair")
                    .agg(F.sum("freq").cast("bigint").alias("cnt")))
        top = pairs.orderBy(F.col("cnt").desc(), "pair").limit(1).collect()
        if not top:
            break
        pair, cnt = top[0]["pair"], top[0]["cnt"]
        merged = pair.replace("><", "")
        merges.append((step, pair, merged, int(cnt)))
        # F.replace with lit() operands: the data-derived winning pair
        # never enters SQL text, so apostrophes/backslashes in corpus
        # tokens can neither break parsing nor inject expressions.
        cur = (cur.select(F.replace(F.col("r"), F.lit(pair),
                                    F.lit(merged)).alias("r"), "freq")
                  .localCheckpoint(eager=True))
    return spark.createDataFrame(
        merges, "step int, pair string, merged string, cnt bigint")


def bpe_encode(df: DataFrame, merges: list[tuple[str, str]],
               text_col: str = "text",
               max_word_len: int = 20) -> DataFrame:
    """Tokenizer APPLY: encode the corpus with a TRAINED BPE merge table
    (the output of ``bpe_train``, or any pretrained tokenizer exported
    as ordered (pair, merged) sentinel literals). Merges are applied
    sequentially in rank order; each one is a literal replace() on the
    sentinel-wrapped word representation, which both Spark and DuckDB
    scan left-to-right non-overlapping — exactly greedy BPE merge
    application (see bpe_train for why a merge can never create a new
    match for ITSELF to the left, making the single pass exact).

    Scale shape: encoding runs on the VOCABULARY relation (distinct
    words + corpus frequency), not per occurrence — at 100 TB the
    corpus is trillions of tokens but the vocabulary is millions, so
    the replace chain rides the bounded relation after the one
    map-side-combined word count; per-document token ids are then a
    broadcast join back on the word. Words with sentinel characters or
    longer than max_word_len are excluded (same contract as bpe_train).

    Output: (w, freq, enc, n_sub) — the word, its corpus frequency, the
    sentinel-form encoding, and its subword count."""
    toks = F.filter(tokens(F.col(text_col)), lambda x: F.length(x) > 0)
    word = (df.select(F.explode(toks).alias("w"))
              .filter(~F.col("w").rlike("[<>]")
                      & (F.length("w") <= max_word_len))
              .groupBy("w").agg(F.count("*").cast("bigint").alias("freq")))
    repr0 = F.expr(
        "concat_ws('', transform(regexp_extract_all(w, '.', 0), "
        "c -> concat('<', c, '>')))")
    cur = word.select("w", "freq", repr0.alias("r"))
    for pair, merged in merges:
        # lit() operands, not f-string SQL: merge literals with quotes
        # or backslashes apply verbatim (no parse error, no injection).
        cur = cur.withColumn(
            "r", F.replace(F.col("r"), F.lit(pair), F.lit(merged)))
    n_sub = F.size(F.expr("regexp_extract_all(r, '<[^<>]+>', 0)"))
    return cur.select("w", "freq", F.col("r").alias("enc"),
                      n_sub.cast("int").alias("n_sub"))


def token_cooccurrence(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", min_count: int = 2,
                       max_tokens_per_doc: int = 64) -> DataFrame:
    """Document-level token co-occurrence with PMI (pointwise mutual
    information) — the corpus word-association screen: for token pairs
    appearing together in >= min_count documents,
    pmi = ln(n_ab * N / (n_a * n_b)) over document frequencies.

    Scale shape: the pair fan-out is the quadratic hazard, so each
    document contributes pairs only from its first
    ``max_tokens_per_doc`` DISTINCT tokens in lexicographic order
    (deterministic cap; C(cap, 2) pairs per doc keeps the explode
    linear in corpus size). Pair and marginal counts are map-side
    combined; the marginal join keys are vocabulary-sized. ln() ulps
    across engines are absorbed by the 6-decimal round (same precedent
    as the entropy/Zipf oracles).

    Output: (tok_a, tok_b, n_ab, pmi) with tok_a < tok_b."""
    toks = F.slice(
        F.array_sort(F.array_distinct(
            F.filter(tokens(F.col(text_col)),
                     lambda x: F.length(x) > 0))),
        1, max_tokens_per_doc)
    base = (df.select(F.col(id_col).alias("id"), toks.alias("_t"))
              .filter(F.size("_t") > 0))
    base = base.localCheckpoint(eager=True)  # pairs + marginals + N
    pair_expr = F.expr(
        "flatten(transform(_t, (x, i) -> "
        "transform(slice(_t, i + 2, size(_t)), y -> "
        "struct(x AS a, y AS b))))")
    pairs = (base.select(F.explode(pair_expr).alias("_p"))
                 .groupBy(F.col("_p.a").alias("tok_a"),
                          F.col("_p.b").alias("tok_b"))
                 .agg(F.count("*").cast("bigint").alias("n_ab"))
                 .filter(F.col("n_ab") >= min_count))
    marg = (base.select(F.explode("_t").alias("tok"))
                .groupBy("tok")
                .agg(F.count("*").cast("double").alias("n_t")))
    ndocs = base.agg(F.count("*").cast("double").alias("_N"))
    ma = marg.select(F.col("tok").alias("tok_a"), F.col("n_t").alias("_na"))
    mb = marg.select(F.col("tok").alias("tok_b"), F.col("n_t").alias("_nb"))
    return (pairs.join(F.broadcast(ma), on="tok_a")
                 .join(F.broadcast(mb), on="tok_b")
                 .crossJoin(F.broadcast(ndocs))
                 .select("tok_a", "tok_b", "n_ab",
                         F.round(F.log(F.col("n_ab") * F.col("_N")
                                       / (F.col("_na") * F.col("_nb"))),
                                 6).alias("pmi")))


def vocab_coverage_curve(df: DataFrame, fracs: list[float] | None = None,
                         text_col: str = "text") -> DataFrame:
    """Vocabulary coverage curve: the smallest top-V vocabulary (tokens
    ranked by corpus frequency desc, token asc — the q73 ordering)
    whose cumulative frequency reaches each requested fraction of all
    token occurrences — the tokenizer-sizing diagnostic ("how big a
    vocab covers 99%?").

    One corpus token count (map-side combined), then every window runs
    over the VOCABULARY-sized frequency relation — the global rank
    window is a single task over that bounded relation (the zipf_slope
    precedent; pre-truncate with a min_df cutoff for corpora whose raw
    vocabulary is unbounded). Output: (frac, vocab_size, coverage) with
    coverage = the achieved cumulative fraction, rounded to 6."""
    fracs = fracs or [0.5, 0.9, 0.95, 0.99]
    freq = (df.select(F.explode(
                F.filter(tokens(F.col(text_col)),
                         lambda x: F.length(x) > 0)).alias("tok"))
              .groupBy("tok")
              .agg(F.count("*").cast("bigint").alias("f")))
    w = Window.orderBy(F.col("f").desc(), F.col("tok"))
    ranked = (freq.withColumn("r", F.row_number().over(w))
                  .withColumn("cum", F.sum("f").over(
                      w.rowsBetween(Window.unboundedPreceding, 0))))
    tot = freq.agg(F.sum("f").cast("bigint").alias("_tot"))
    fr = F.explode(F.array(*[F.lit(float(x)) for x in fracs])).alias("frac")
    targets = tot.select(fr, "_tot")
    hit = (ranked.crossJoin(F.broadcast(targets))
                 .filter(F.col("cum") >= F.col("frac") * F.col("_tot"))
                 .groupBy("frac")
                 .agg(F.min(F.struct("r", "cum")).alias("_m"),
                      F.max("_tot").alias("_t")))
    return hit.select("frac",
                      F.col("_m.r").cast("bigint").alias("vocab_size"),
                      F.round(F.col("_m.cum") / F.col("_t"), 6)
                       .alias("coverage"))


def bigram_logprob(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text", k: float = 0.5) -> DataFrame:
    """Per-document mean log-likelihood under an add-k-smoothed BIGRAM
    model trained on the corpus itself — the stronger sibling of
    ``unigram_logprob`` (a KenLM-style fluency signal without the
    external model): avg_lp = mean over the doc's bigrams of
    ln((c(w1,w2) + k) / (c(w1) + k·V)), where c(w1) counts w1 as a
    CONTEXT (positions 1..n-1) and V is the corpus vocabulary size.
    Docs with fewer than two tokens have no bigrams and drop out.

    Plan shape at scale: bigram extraction is a pure array expression
    (slice + element_at inside codegen — no shuffle, no self-join);
    per-doc bigram term-frequencies are map-side combined BEFORE the
    dictionary joins, so a head bigram contributes one row per
    containing document; the bigram- and context-count dictionaries are
    corpus-bounded relations (≪ corpus size) and AQE picks broadcast
    vs skew-split SMJ by their measured size. One scan of the corpus.

    Output: (doc_id, n_bigrams, avg_lp)."""
    arr = F.filter(tokens(F.col(text_col)), lambda x: F.length(x) > 0)
    base = (df.select(F.col(id_col).alias("doc_id"), arr.alias("_a"))
              .where(F.size("_a") >= 2))
    bg = base.select(
        "doc_id",
        F.explode(F.expr(
            "transform(slice(_a, 1, size(_a) - 1),"
            " (x, i) -> struct(x AS w1, element_at(_a, i + 2) AS w2))"
        )).alias("_b")).select("doc_id", "_b.w1", "_b.w2")
    tf = bg.groupBy("doc_id", "w1", "w2").agg(F.count("*").alias("tf"))
    c12 = tf.groupBy("w1", "w2").agg(F.sum("tf").alias("c12"))
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    vocab = (base.select(F.explode("_a").alias("t"))
                 .agg(F.count_distinct("t").alias("v")))
    lp = F.log((F.col("c12") + F.lit(k)) / (F.col("c1") + F.lit(k) * F.col("v")))
    scored = (tf.join(c12, on=["w1", "w2"]).join(c1, on="w1")
                .crossJoin(F.broadcast(vocab))
                .withColumn("lp", lp))
    return (scored.groupBy("doc_id")
                  .agg(F.sum("tf").cast("bigint").alias("n_bigrams"),
                       F.round(F.sum(F.col("tf") * F.col("lp"))
                               / F.sum("tf"), 6).alias("avg_lp")))


def _kn_p_expr(discount: float):
    """The interpolated Kneser-Ney probability expression over the
    joined component columns (c12, c1, n1p_l, n1p_r, n1p_all) — ONE
    definition shared by the estimator (kneser_ney_bigram) and the
    scorer (kneser_ney_logprob) so the smoothing formula cannot drift
    between them (and the SQL oracles mirror this association order)."""
    d = F.lit(float(discount))
    return (F.greatest(F.col("c12") - d, F.lit(0.0)) / F.col("c1")
            + d * F.col("n1p_l") / F.col("c1")
            * F.col("n1p_r") / F.col("n1p_all"))


def kneser_ney_bigram(df: DataFrame, text_col: str = "text",
                      discount: float = 0.75,
                      min_count: int = 2) -> DataFrame:
    """Interpolated Kneser-Ney smoothed bigram probabilities trained on
    the corpus — the standard n-gram LM estimator (the one KenLM
    implements), built from pure count arithmetic:

        P_KN(w2|w1) = max(c12 - d, 0)/c1  +  d·N1+(w1·)/c1 · P_cont(w2)
        P_cont(w2)  = N1+(·w2) / N1+(··)

    where c12/c1 are bigram/context counts, N1+(w1·) counts distinct
    continuations of w1, N1+(·w2) counts distinct histories of w2 and
    N1+(··) is the total bigram-type count. Every term is an integer
    count (exactly replayable in SQL); the final probability rounds to
    6 decimals.

    Scale shape: one corpus scan explodes bigrams via an array
    expression (no self-join); everything after rides the
    VOCABULARY-sized bigram-type relation — two map-side-combined
    grouped counts plus one 1-row type total (crossJoined broadcast).
    Output: (w1, w2, c12, p_kn) for bigrams with c12 >= min_count
    (the filter bounds output, not training: counts always use the
    full relation)."""
    arr = F.filter(tokens(F.col(text_col)), lambda x: F.length(x) > 0)
    bg = (df.select(arr.alias("_a"))
            .where(F.size("_a") >= 2)
            .select(F.explode(F.expr(
                "transform(slice(_a, 1, size(_a) - 1),"
                " (x, i) -> struct(x AS w1, element_at(_a, i + 2) AS w2))"
            )).alias("_b"))
            .select("_b.w1", "_b.w2"))
    c12 = bg.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    c12 = c12.localCheckpoint(eager=True)  # shared by 3 marginals
    left = c12.groupBy("w1").agg(F.sum("c12").alias("c1"),
                                 F.count("*").alias("n1p_l"))
    right = c12.groupBy("w2").agg(F.count("*").alias("n1p_r"))
    tot = c12.agg(F.count("*").alias("n1p_all"))
    p = _kn_p_expr(discount)
    return (c12.join(left, on="w1").join(right, on="w2")
               .crossJoin(F.broadcast(tot))
               .where(F.col("c12") >= min_count)
               .select("w1", "w2", F.col("c12").cast("bigint").alias("c12"),
                       F.round(p, 6).alias("p_kn")))


def kneser_ney_logprob(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text",
                       discount: float = 0.75) -> DataFrame:
    """Per-document mean log-likelihood under the corpus's OWN
    interpolated Kneser-Ney bigram model (the kneser_ney_bigram
    estimator applied as a scorer) — the fluency signal bigram_logprob
    gives, under the stronger standard smoother. Self-scoring means
    every document bigram exists in the model (no backoff branch), so
    the probability is the full KN form everywhere and every term is
    exact count arithmetic.

    Plan: ONE corpus scan yields both the per-doc bigram tf relation
    and (via the checkpointed bigram-type relation) the c1 / N1+
    marginals; scoring is three vocabulary-sized joins + one per-doc
    aggregate. Output: (doc_id, n_bigrams, avg_lp r6); docs with fewer
    than two tokens drop out."""
    arr = F.filter(tokens(F.col(text_col)), lambda x: F.length(x) > 0)
    base = (df.select(F.col(id_col).alias("doc_id"), arr.alias("_a"))
              .where(F.size("_a") >= 2))
    bg = (base.select("doc_id", F.explode(F.expr(
              "transform(slice(_a, 1, size(_a) - 1),"
              " (x, i) -> struct(x AS w1, element_at(_a, i + 2) AS w2))"
          )).alias("_b"))
          .select("doc_id", "_b.w1", "_b.w2"))
    tf = bg.groupBy("doc_id", "w1", "w2").agg(F.count("*").alias("tf"))
    c12 = tf.groupBy("w1", "w2").agg(F.sum("tf").alias("c12"))
    c12 = c12.localCheckpoint(eager=True)
    left = c12.groupBy("w1").agg(F.sum("c12").alias("c1"),
                                 F.count("*").alias("n1p_l"))
    right = c12.groupBy("w2").agg(F.count("*").alias("n1p_r"))
    tot = c12.agg(F.count("*").alias("n1p_all"))
    p = _kn_p_expr(discount)
    scored = (tf.join(c12, on=["w1", "w2"]).join(left, on="w1")
                .join(right, on="w2").crossJoin(F.broadcast(tot))
                .withColumn("_lp", F.log(p)))
    return (scored.groupBy("doc_id")
                  .agg(F.sum("tf").cast("bigint").alias("n_bigrams"),
                       F.round(F.sum(F.col("tf") * F.col("_lp"))
                               / F.sum("tf"), 6).alias("avg_lp")))


def repeated_ngram_loops(df: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text", n: int = 4) -> DataFrame:
    """Degenerate-text detector: per document, how often its most
    repeated n-gram occurs and what fraction of n-gram positions are
    repeats — the standard screen for looping generations / boilerplate
    (a healthy document's max 4-gram count is 1-2; model loops hit
    dozens).

    ZERO-shuffle plan: n-grams, their sort, and the longest
    equal-adjacent run are all array expressions inside one projection
    (sorting the doc's grams groups duplicates, so the max run length
    IS the max n-gram multiplicity) — no explode, no groupBy, nothing
    leaves the document's row. Output:
    (doc_id, n_grams, distinct_grams, max_repeat, repeat_frac r6);
    docs with fewer than n tokens drop out."""
    arr = F.filter(tokens(F.col(text_col)), lambda x: F.length(x) > 0)
    base = df.select(F.col(id_col).alias("doc_id"), arr.alias("_a")) \
             .where(F.size("_a") >= n)
    grams = F.array_sort(F.expr(
        f"transform(sequence(0, size(_a) - {n}),"
        f" p -> array_join(slice(_a, p + 1, {n}), ' '))"))
    g = base.withColumn("_g", grams)
    sz = F.size("_g")
    run = F.aggregate(
        F.sequence(F.lit(2), sz),
        F.struct(F.lit(1).alias("run"), F.lit(1).alias("best")),
        lambda acc, i: F.struct(
            F.when(F.element_at(F.col("_g"), i)
                   == F.element_at(F.col("_g"), i - 1),
                   acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(acc["best"],
                       F.when(F.element_at(F.col("_g"), i)
                              == F.element_at(F.col("_g"), i - 1),
                              acc["run"] + 1).otherwise(F.lit(1)))
            .alias("best")),
        lambda acc: acc["best"])
    max_rep = F.when(sz <= 1, F.lit(1)).otherwise(run)
    dist = F.size(F.array_distinct("_g"))
    return g.select(
        "doc_id", sz.cast("bigint").alias("n_grams"),
        dist.cast("bigint").alias("distinct_grams"),
        max_rep.cast("bigint").alias("max_repeat"),
        F.round((sz - dist).cast("double") / sz, 6).alias("repeat_frac"))


def normalize_text(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Canonical text normalization (the first pass of every dedup /
    exact-match pipeline): lowercase, non-alphanumerics to spaces,
    whitespace collapsed, trimmed — plus the md5 of the normal form
    (the exact-dedup key that survives case/punctuation variants) and
    a ``changed`` flag. One whole-stage-codegen scan, no shuffle; the
    regexes are RE2-portable so the oracle replays them verbatim."""
    c = F.col(text_col)
    norm = F.trim(F.regexp_replace(
        F.regexp_replace(F.lower(c), r"[^a-z0-9\s]", " "),
        r"\s+", " "))
    return (df.withColumn("norm_text", norm)
              .withColumn("norm_hash", F.md5(norm))
              .withColumn("changed", ~norm.eqNullSafe(c)))


def cluster_terms(df: DataFrame, cluster_col: str, text_col: str = "text",
                  top_n: int = 5) -> DataFrame:
    """Class-based TF-IDF cluster labeling (the BERTopic c-TF-IDF
    formula): score(t, c) = tf(t, c) · ln(1 + A / f(t)), where tf is
    the term count inside cluster c, f(t) the term's total count across
    all clusters, and A the average per-cluster token count; the top-n
    terms per cluster (score desc, term asc) name the cluster.

    One corpus scan into a (cluster, term) count relation (map-side
    combined); f(t) and A are bounded dictionary aggregates; the rank
    window runs over the bounded count relation only. Output:
    (cluster, term, score rounded 6, rank)."""
    toks = (df.select(F.col(cluster_col).alias("c"),
                      F.explode(tokens(F.col(text_col))).alias("t"))
              .filter(F.length("t") > 0))
    tf = toks.groupBy("c", "t").agg(F.count("*").alias("tf"))
    # r12 optimization (guide §2.4): `tf` feeds THREE branches (f(t),
    # the average cluster size A, and the scored join) — unshared,
    # each branch re-tokenized the corpus (the token_js_divergence
    # lesson, size-gated here). Once at scale; lazy below the gate.
    from .materialize import materialize_if_large
    tf = materialize_if_large(tf)
    ft = tf.groupBy("t").agg(F.sum("tf").alias("ft"))
    a = (tf.groupBy("c").agg(F.sum("tf").alias("_ct"))
           .agg(F.avg("_ct").alias("a")))
    scored = (tf.join(ft, on="t").crossJoin(F.broadcast(a))
                .withColumn("score",
                            F.round(F.col("tf")
                                    * F.log(F.lit(1.0)
                                            + F.col("a") / F.col("ft")),
                                    6)))
    w = Window.partitionBy("c").orderBy(F.col("score").desc(), F.col("t"))
    return (scored.withColumn("rank", F.row_number().over(w).cast("int"))
                  .where(F.col("rank") <= top_n)
                  .select(F.col("c").alias("cluster"),
                          F.col("t").alias("term"), "score", "rank"))


def token_js_divergence(df: DataFrame, group_col: str = "source",
                        text_col: str = "text") -> DataFrame:
    """Per-group Jensen-Shannon divergence between each group's unigram
    token distribution P and the whole-corpus distribution Q — the
    corpus-drift / mixture-health monitor (is one source's language
    statistically unlike the blend it feeds?).

    JS(P, Q) = 0.5 * sum_t p ln(p/m) + 0.5 * sum_t q ln(q/m) with
    m = (p + q) / 2, natural log (so JS <= ln 2). Tokens ABSENT from the
    group (p = 0) are not materialized: their q ln(q/(q/2)) terms
    collapse to 0.5 * ln(2) * (1 - sum_{t in group} q_t), folded in as a
    closed form. That keeps the join on the (group, token) FREQUENCY
    relation — vocabulary-sized, never groups x vocabulary and never
    corpus-sized.

    Scale shape: one map-side-combined token count, one vocab-sized
    join against the global counts (derived from the same relation, not
    a rescan), one bounded aggregate per group. No iteration, no
    cartesian. Output: (grp, n_tokens, n_terms, js rounded 6)."""
    toks = F.filter(tokens(F.col(text_col)), lambda x: F.length(x) > 0)
    gc = (df.select(F.col(group_col).alias("grp"),
                    F.explode(toks).alias("tok"))
            .groupBy("grp", "tok").agg(F.count("*").alias("c")))
    gc = gc.localCheckpoint()  # shared by 3 branches below (eager; see
    # the shared-relation lesson: lazy localCheckpoint spams accumulator
    # errors, and without it each branch re-tokenizes the corpus)
    glob = gc.groupBy("tok").agg(F.sum("c").alias("cq"))
    tot_g = gc.groupBy("grp").agg(F.sum("c").alias("tg"))
    tot = gc.agg(F.sum("c").cast("double").alias("tq"))
    p = F.col("c") / F.col("tg")
    q = F.col("cq") / F.col("tq")
    m = (p + q) / F.lit(2.0)
    contrib = (F.lit(0.5) * p * F.log(p / m)
               + F.lit(0.5) * q * F.log(q / m))
    per = (gc.join(glob, on="tok")
             .join(F.broadcast(tot_g), on="grp")
             .crossJoin(F.broadcast(tot))
             .groupBy("grp")
             .agg(F.sum(contrib).alias("_s"),
                  F.sum(q).alias("_qcov"),
                  F.first("tg").alias("tg"),
                  F.count("*").alias("n_terms")))
    import math
    js = F.col("_s") + F.lit(0.5 * math.log(2.0)) * (F.lit(1.0)
                                                     - F.col("_qcov"))
    return per.select("grp", F.col("tg").cast("bigint").alias("n_tokens"),
                      F.col("n_terms").cast("bigint").alias("n_terms"),
                      F.round(js, 6).alias("js"))


def naive_bayes_classify(df: DataFrame, label_col: str = "lang",
                         text_col: str = "text",
                         id_col: str = "doc_id",
                         alpha: float = 1.0) -> DataFrame:
    """Multinomial naive Bayes trained and applied on the same corpus
    (resubstitution): score(d, c) = ln P(c) + sum_t tf(d,t) ln P(t|c)
    with Laplace-``alpha`` smoothing over the corpus vocabulary — the
    classic counts-only text classifier, fully SQL-replicable.

    The smoothing default ln(alpha / (T_c + alpha*V)) for tokens UNSEEN
    in class c is folded in closed form: score(d,c) = prior_c
    + L_d * base_c + sum over (d's tokens SEEN in c) of
    tf * (ln(cnt(c,t) + alpha) - ln alpha). So the only join is
    doc-term-freqs against the (class, token) COUNT relation
    (vocabulary x classes, bounded) — never docs x vocabulary. The
    argmax window partitions per doc over n_classes rows. Scores are
    rounded to 6 before ranking with a label tie-break, so the oracle
    replays the exact argmax. Output: (id, label (true), pred, score)."""
    import math

    toks = F.filter(tokens(F.col(text_col)), lambda x: F.length(x) > 0)
    base = df.select(F.col(id_col).alias("id"),
                     F.col(label_col).alias("label"),
                     toks.alias("_t"))
    dtf = (base.select("id", F.explode("_t").alias("t"))
               .groupBy("id", "t").agg(F.count("*").alias("tf")))
    dtf = dtf.localCheckpoint()  # shared: class counts + doc scoring
    docs = base.select("id", "label", F.size("_t").alias("ld"))
    docs = docs.localCheckpoint()
    lab = docs.select("id", "label")
    # class-conditional token counts (vocab x classes) and class totals
    ct = (dtf.join(lab, on="id")
             .groupBy("label", "t").agg(F.sum("tf").alias("cnt")))
    ct = ct.localCheckpoint()
    tc = ct.groupBy("label").agg(F.sum("cnt").alias("tcnt"))
    vocab = ct.select("t").distinct().agg(F.count("*").alias("v"))
    nc = docs.groupBy("label").agg(F.count("*").alias("ndc"))
    ntot = docs.agg(F.count("*").alias("nd"))
    cls = (nc.join(F.broadcast(tc), on="label")
             .crossJoin(F.broadcast(vocab))
             .crossJoin(F.broadcast(ntot))
             .select(F.col("label").alias("c"),
                     F.log(F.col("ndc") / F.col("nd")).alias("prior"),
                     F.log(F.lit(float(alpha))
                           / (F.col("tcnt")
                              + F.lit(float(alpha)) * F.col("v")))
                      .alias("base")))
    # seen-term bonus per (doc, class)
    seen = (dtf.join(ct.select(F.col("label").alias("c"), "t", "cnt"),
                     on="t")
               .groupBy("id", "c")
               .agg(F.sum(F.col("tf")
                          * (F.log(F.col("cnt") + F.lit(float(alpha)))
                             - F.lit(math.log(alpha))))
                     .alias("bonus")))
    scored = (docs.crossJoin(F.broadcast(cls))
                  .join(seen, on=["id", "c"], how="left")
                  .withColumn("score",
                              F.round(F.col("prior")
                                      + F.col("ld") * F.col("base")
                                      + F.coalesce(F.col("bonus"),
                                                   F.lit(0.0)), 6)))
    w = Window.partitionBy("id").orderBy(F.col("score").desc(),
                                         F.col("c"))
    return (scored.withColumn("_rk", F.row_number().over(w))
                  .where(F.col("_rk") == 1)
                  .select("id", "label", F.col("c").alias("pred"),
                          "score"))


def pmi_bigrams(df: DataFrame, text_col: str = "text",
                min_count: int = 5, k: int = 50) -> DataFrame:
    """Top-k collocations by pointwise mutual information over
    adjacent-token bigrams: PMI = ln(c12·N / (c1·c2)) where c12
    counts the bigram, c1/c2 its left/right marginals and N the total
    bigram events — the classic collocation extractor (Church &
    Hanks 1990) that `bigram_logprob` (fluency) and `kneser_ney`
    (smoothing) don't cover: WHICH pairs cohere.

    Exactness: every count is an integer fold; the PMI term is one
    fixed IEEE expression (two double products, one division, one ln)
    on those integers, rounded 6 — bit-identical cross-engine (the
    q258 theil / q273 nmi ln discipline). min_count filters rare
    bigrams BEFORE the ln (noise floor + output bound).

    Scale shape: bigram extraction is the `bigram_logprob` array
    expression (pure codegen, no self-join); counts are map-side
    combined grouped folds over the bigram-type relation (corpus-
    bounded); the top-k is a distributed TakeOrdered on
    (pmi DESC, w1, w2) — no global sort materialization. Output:
    (w1, w2, c12, pmi) — k rows."""
    arr = F.filter(tokens(F.col(text_col)), lambda x: F.length(x) > 0)
    base = df.select(arr.alias("_a")).where(F.size("_a") >= 2)
    bg = base.select(
        F.explode(F.expr(
            "transform(slice(_a, 1, size(_a) - 1),"
            " (x, i) -> struct(x AS w1, element_at(_a, i + 2) AS w2))"
        )).alias("_b")).select("_b.w1", "_b.w2")
    c12 = bg.groupBy("w1", "w2").agg(F.count("*").alias("c12")) \
            .localCheckpoint()
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    c2 = c12.groupBy("w2").agg(F.sum("c12").alias("c2"))
    tot = c12.agg(F.sum("c12").alias("nb"))
    pmi = F.round(F.log((F.col("c12").cast("double")
                         * F.col("nb").cast("double"))
                        / (F.col("c1").cast("double")
                           * F.col("c2").cast("double"))), 6)
    return (c12.where(F.col("c12") >= min_count)
               .join(c1, on="w1").join(c2, on="w2")
               .crossJoin(F.broadcast(tot))
               .select("w1", "w2",
                       F.col("c12").cast("bigint").alias("c12"),
                       pmi.alias("pmi"))
               .orderBy(F.col("pmi").desc(), "w1", "w2")
               .limit(k))


def readability(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Coleman-Liau readability per document — the grade-level proxy
    built ONLY from letter/word/sentence counts (no syllable
    dictionary, so it replays exactly in SQL):

        CLI = 0.0588*L - 0.296*S - 15.8
        L = letters per 100 words, S = sentences per 100 words

    Pure regexp Column counts (one scan, codegen): letters =
    [A-Za-z] matches, words = whitespace tokens, sentences =
    [.!?]+ runs (min 1 so fragments stay finite). The index is one
    fixed IEEE expression on those integers, rounded 6; docs with no
    words yield NULL. Output: (doc_id, n_letters, n_words,
    n_sentences, cli)."""
    t = F.col(text_col)
    letters = F.regexp_count(t, F.lit(r"[A-Za-z]")).cast("bigint")
    words = F.size(F.filter(tokens(t), lambda x: F.length(x) > 0)) \
        .cast("bigint")
    sents = F.greatest(F.regexp_count(t, F.lit(r"[.!?]+")), F.lit(1)) \
        .cast("bigint")
    cli = F.round(
        F.lit(0.0588) * (F.lit(100.0) * letters / words)
        - F.lit(0.296) * (F.lit(100.0) * sents / words)
        - F.lit(15.8), 6)
    return df.select(
        F.col(id_col).alias("doc_id"),
        letters.alias("n_letters"), words.alias("n_words"),
        sents.alias("n_sentences"),
        F.when(words > 0, cli).alias("cli"))

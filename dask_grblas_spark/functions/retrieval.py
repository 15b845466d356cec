"""Ranked text retrieval over the documents corpus — the
decontamination / eval-leak-scan primitive of a training-data pipeline
(score every training document against a benchmark's queries, drop the
top hits).

Everything is JVM Column arithmetic on one corpus scan:
- doc lengths come from `size(filter(tokens(...)))` map-side (no
  explode, no shuffle),
- the posting list is RESTRICTED to the query vocabulary before the
  term-frequency aggregation (broadcast semi-join on the handful of
  query terms), so the shuffled relation is |matching doc-term pairs|,
  not |corpus tokens|,
- corpus-level scalars (N, avgdl) ride a broadcast 1-row aggregate.

At 100 TB: one full scan + one shuffle keyed on (term, doc) for tf —
bounded by the query-vocabulary postings; a hot query term is still
aggregated map-side (per-partition partial counts) before the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import tokens


def bm25_topk(df: DataFrame, queries: list[tuple[int, str]],
              id_col: str = "doc_id", text_col: str = "text",
              k: int = 5, k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """Okapi BM25 top-k documents per query.

    queries: [(query_id, query_text)]. idf = ln(1 + (N - df + 0.5) /
    (df + 0.5)) (the non-negative BM25+ style idf); score summed over
    DISTINCT query terms; ranking on the 6-decimal-rounded score with
    doc_id as the tie-break so the ordering is reproducible across
    engines. Returns (query_id, doc_id, score, rank), rank <= k.
    """
    spark = df.sparkSession
    toks_arr = F.filter(tokens(F.col(text_col)),
                        lambda x: F.length(x) > 0)
    base = (df.select(F.col(id_col).alias("doc_id"),
                      toks_arr.alias("_toks"))
              .withColumn("dl", F.size("_toks")))
    stats = base.agg(F.count("*").alias("n_docs"),
                     F.avg("dl").alias("avgdl"))
    qdf = spark.createDataFrame(list(queries),
                                "query_id long, qtext string")
    qterms = qdf.select(
        "query_id",
        F.explode(F.array_distinct(
            F.filter(tokens(F.col("qtext")),
                     lambda x: F.length(x) > 0))).alias("term"))
    terms = qterms.select("term").distinct()
    # postings restricted to the query vocabulary BEFORE the tf shuffle
    posting = (base.select("doc_id", "dl", F.explode("_toks").alias("term"))
                   .join(F.broadcast(terms), on="term")
                   .groupBy("term", "doc_id", "dl")
                   .agg(F.count("*").alias("tf")))
    dfreq = posting.groupBy("term").agg(F.count("*").alias("df_t"))
    scored = (posting.join(F.broadcast(dfreq), on="term")
                     .crossJoin(F.broadcast(stats)))
    idf = F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df_t") + 0.5)
                / (F.col("df_t") + 0.5))
    w = idf * (F.col("tf") * (k1 + 1)) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl")))
    perq = (scored.withColumn("w", w)
                  .join(F.broadcast(qterms), on="term")
                  .groupBy("query_id", "doc_id")
                  .agg(F.round(F.sum("w"), 6).alias("score")))
    rk = Window.partitionBy("query_id").orderBy(F.col("score").desc(),
                                                F.col("doc_id"))
    return (perq.withColumn("rank", F.row_number().over(rk))
                .filter(F.col("rank") <= k)
                .select("query_id", "doc_id", "score",
                        F.col("rank").cast("int").alias("rank")))


def dirichlet_ql_topk(df: DataFrame, queries: list[tuple[int, str]],
                      id_col: str = "doc_id", text_col: str = "text",
                      k: int = 5, mu: float = 2000.0) -> DataFrame:
    """Query-likelihood retrieval with Dirichlet smoothing — the
    language-model ranking sibling of ``bm25_topk``:

        score(q, d) = sum over q's DISTINCT terms of
                      ln( (tf_{t,d} + mu * p_c(t)) / (dl_d + mu) )

    with p_c(t) = corpus term frequency / corpus token count. The sum
    DECOMPOSES so absent terms never densify (the q149 naive-Bayes
    closed form): score = sum_t ln(mu * p_c(t)) - n_q * ln(dl + mu)
    + sum over tf>0 of ln(1 + tf / (mu * p_c(t))) — only the sparse
    postings join runs per (term, doc); the per-query constant and the
    per-doc length term are bounded relations. Query terms absent from
    the WHOLE corpus (p_c = 0) are dropped (standard practice — their
    smoothed probability is 0 for every document alike... and ln 0 is
    not a number). Ranking on the 6-decimal-rounded score with doc_id
    tie-break. Returns (query_id, doc_id, score, rank), rank <= k."""
    spark = df.sparkSession
    toks_arr = F.filter(tokens(F.col(text_col)),
                        lambda x: F.length(x) > 0)
    base = (df.select(F.col(id_col).alias("doc_id"),
                      toks_arr.alias("_toks"))
              .withColumn("dl", F.size("_toks")))
    base = base.localCheckpoint()  # shared: totals, cf, postings
    tot = base.agg(F.sum("dl").cast("double").alias("tt"))
    qdf = spark.createDataFrame(list(queries),
                                "query_id long, qtext string")
    qterms = qdf.select(
        "query_id",
        F.explode(F.array_distinct(
            F.filter(tokens(F.col("qtext")),
                     lambda x: F.length(x) > 0))).alias("term"))
    terms = qterms.select("term").distinct()
    # corpus frequency of the query vocabulary only
    cf = (base.select(F.explode("_toks").alias("term"))
              .join(F.broadcast(terms), on="term")
              .groupBy("term")
              .agg(F.count("*").cast("double").alias("cf")))
    qv = (qterms.join(F.broadcast(cf), on="term")  # drops cf=0 terms
                .crossJoin(F.broadcast(tot)))
    # per-query constant and live term count over the bounded relation
    qconst = (qv.groupBy("query_id")
                .agg(F.sum(F.log(F.lit(float(mu)) * F.col("cf")
                                 / F.col("tt"))).alias("qc"),
                     F.count("*").alias("nq")))
    posting = (base.select("doc_id",
                           F.explode("_toks").alias("term"))
                   .join(F.broadcast(terms), on="term")
                   .groupBy("term", "doc_id")
                   .agg(F.count("*").cast("double").alias("tf")))
    adj = (posting.join(F.broadcast(qv.select("query_id", "term", "cf",
                                              "tt")), on="term")
                  .groupBy("query_id", "doc_id")
                  .agg(F.sum(F.log(F.lit(1.0) + F.col("tf")
                                   * F.col("tt")
                                   / (F.lit(float(mu)) * F.col("cf"))))
                        .alias("adj")))
    # every doc scores every query (the decomposed base term), the
    # sparse adjustment joins on top
    scored = (base.select("doc_id", "dl")
                  .crossJoin(F.broadcast(qconst))
                  .join(adj, on=["query_id", "doc_id"], how="left")
                  .select("query_id", "doc_id",
                          F.round(F.col("qc")
                                  - F.col("nq")
                                  * F.log(F.col("dl") + F.lit(float(mu)))
                                  + F.coalesce(F.col("adj"), F.lit(0.0)),
                                  6).alias("score")))
    rk = Window.partitionBy("query_id").orderBy(F.col("score").desc(),
                                                F.col("doc_id"))
    return (scored.withColumn("rank", F.row_number().over(rk))
                  .filter(F.col("rank") <= k)
                  .select("query_id", "doc_id", "score",
                          F.col("rank").cast("int").alias("rank")))


def ngram_decontaminate(df: DataFrame, benchmark: list[str], n: int = 13,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Exact n-gram decontamination (the GPT-3/Llama-style eval-leak
    filter): flag every training document sharing at least one n-token
    gram with any benchmark text. Returns (doc_id, n_hits,
    contaminated) for ALL documents — callers drop or audit the flagged
    rows.

    The benchmark gram set is tiny (eval suites are KBs, the corpus is
    TBs): it becomes a broadcast relation, so the whole scan is one
    pass over the corpus with a map-side semi-join — no corpus-keyed
    shuffle at any scale. Grams shorter than n tokens only arise for
    benchmark texts shorter than n, which then match as their full
    token sequence (standard practice so short eval items still
    screen)."""
    spark = df.sparkSession

    def grams_of(col):
        toks = F.filter(tokens(col), lambda x: F.length(x) > 0)
        # one gram per start when len >= n, else the whole text as one
        return F.expr(
            f"CASE WHEN size(_t) = 0 THEN array() "
            f"WHEN size(_t) <= {n} THEN array(array_join(_t, ' ')) "
            f"ELSE transform(sequence(0, size(_t) - {n}), "
            f"p -> array_join(slice(_t, p + 1, {n}), ' ')) END"
        ), toks

    from .dedup import cross_hash60

    # join on the 60-bit md5 hash of each gram, not the ~100-char gram
    # string: the corpus-side explode is 13x the text volume as strings
    # but only 8 bytes/row as hashes, and a bigint broadcast probe beats
    # string equality. Deterministic in both engines, so the oracle is
    # unaffected (collision odds ~n^2 / 2^60 — irrelevant for a flag
    # whose false-positive cost is one extra audited doc).
    bench = spark.createDataFrame([(t,) for t in benchmark], "btext string")
    bexpr, btoks = grams_of(F.col("btext"))
    bgrams = (bench.select(btoks.alias("_t"))
                   .select(F.explode(bexpr).alias("gram"))
                   .select(cross_hash60(F.col("gram")).alias("gh"))
                   .distinct())
    dexpr, dtoks = grams_of(F.col(text_col))
    dgrams = (df.select(F.col(id_col).alias("doc_id"), dtoks.alias("_t"))
                .select("doc_id", F.explode(dexpr).alias("gram"))
                .select("doc_id", cross_hash60(F.col("gram")).alias("gh")))
    hits = (dgrams.join(F.broadcast(bgrams), on="gh")
                  .groupBy("doc_id")
                  .agg(F.count("*").cast("bigint").alias("n_hits")))
    return (df.select(F.col(id_col).alias("doc_id"))
              .join(hits, on="doc_id", how="left")
              .select("doc_id",
                      F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
                      (F.coalesce("n_hits", F.lit(0)) > 0)
                      .alias("contaminated")))


def tfidf_vectors(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text",
                  min_df: int = 1) -> DataFrame:
    """Per-document TF-IDF term weights: (doc_id, term, tfidf) with
    tf = raw count / doc length and idf = ln((N + 1) / (df + 1)) + 1
    (smoothed, sklearn-style). min_df prunes the hapax tail — at corpus
    scale the vocabulary's long tail dominates the posting list, and a
    df cutoff bounds it the same way max_doc_freq bounds the dedup
    inverted index."""
    toks_arr = F.filter(tokens(F.col(text_col)),
                        lambda x: F.length(x) > 0)
    base = (df.select(F.col(id_col).alias("doc_id"),
                      toks_arr.alias("_toks"))
              .withColumn("dl", F.size("_toks")))
    stats = base.agg(F.count("*").alias("n_docs"))
    posting = (base.select("doc_id", "dl", F.explode("_toks").alias("term"))
                   .groupBy("term", "doc_id", "dl")
                   .agg(F.count("*").alias("tf")))
    dfreq = (posting.groupBy("term").agg(F.count("*").alias("df_t"))
                    .filter(F.col("df_t") >= min_df))
    out = (posting.join(dfreq, on="term").crossJoin(F.broadcast(stats)))
    idf = F.log((F.col("n_docs") + 1.0) / (F.col("df_t") + 1.0)) + 1.0
    return out.select(
        "doc_id", "term",
        F.round((F.col("tf") / F.col("dl")) * idf, 6).alias("tfidf"))


def doc_keywords(df: DataFrame, top_n: int = 3, id_col: str = "doc_id",
                 text_col: str = "text", min_df: int = 2) -> DataFrame:
    """Per-document top-N keyword extraction by TF-IDF — the document
    tagging / index-summary pass (`cluster_terms` names clusters; this
    names every document). One `tfidf_vectors` pass (min_df prunes the
    hapax tail), then a rank window PARTITIONED BY DOCUMENT — each
    window holds only that document's own terms (bounded by doc
    length), never a corpus-wide sort. Ties rank by (tfidf DESC, term)
    over the 6-decimal-ROUNDED score, so the ordering is engine-exact
    and the oracle replays the same ROW_NUMBER.
    Output: (doc_id, term, tfidf, rank), rank 1..top_n."""
    tv = tfidf_vectors(df, id_col=id_col, text_col=text_col,
                       min_df=min_df)
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(),
                                             F.col("term"))
    return (tv.withColumn("rank", F.row_number().over(w).cast("int"))
              .where(F.col("rank") <= top_n))


def tfidf_cosine_pairs(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", min_df: int = 1,
                       max_df: int = 1000,
                       threshold: float = 0.3) -> DataFrame:
    """Document-document cosine similarity >= threshold over TF-IDF
    vectors, via the inverted index (no cross join) — the sparse
    lexical near-duplicate / related-document join that complements the
    set-based family (Jaccard measures overlap; TF-IDF cosine weights
    it by term rarity).

    The vectors themselves drop terms outside [min_df, max_df] — the
    similarity is EXACTLY the cosine of those capped vectors (the
    item_cf_topk contract: the cap is part of the definition, so the
    oracle replays it; an uncapped head term would contribute f^2/2
    join rows AND carry near-zero idf weight anyway).

    Plan: one corpus scan -> per-doc term counts (map-side combined),
    df filter, per-doc norms (one agg), the posting-list self-join on
    term (fan-out bounded by max_df per term), one pair-sum aggregate,
    norm join, threshold on the ROUNDED similarity (boundary-stable
    cross-engine). Output: (id_a, id_b, cosine r6)."""
    toks_arr = F.filter(tokens(F.col(text_col)),
                        lambda x: F.length(x) > 0)
    base = (df.select(F.col(id_col).alias("doc_id"),
                      toks_arr.alias("_toks"))
              .withColumn("dl", F.size("_toks"))
              .filter(F.col("dl") > 0))
    stats = base.agg(F.count("*").alias("n_docs"))
    posting = (base.select("doc_id", "dl",
                           F.explode("_toks").alias("term"))
                   .groupBy("term", "doc_id", "dl")
                   .agg(F.count("*").alias("tf")))
    dfreq = (posting.groupBy("term").agg(F.count("*").alias("df_t"))
                    .filter((F.col("df_t") >= min_df)
                            & (F.col("df_t") <= max_df)))
    idf = F.log((F.col("n_docs") + 1.0) / (F.col("df_t") + 1.0)) + 1.0
    w = (posting.join(dfreq, on="term")
                .crossJoin(F.broadcast(stats))
                .select("doc_id", "term",
                        ((F.col("tf") / F.col("dl")) * idf).alias("w")))
    w = w.localCheckpoint(eager=True)  # shared: norms + both join sides
    norms = w.groupBy("doc_id").agg(F.sqrt(F.sum(F.col("w") * F.col("w")))
                                     .alias("nrm"))
    a = w.select(F.col("doc_id").alias("id_a"), "term",
                 F.col("w").alias("wa"))
    b = w.select(F.col("doc_id").alias("id_b"), "term",
                 F.col("w").alias("wb"))
    dots = (a.join(b, on="term")
             .where(F.col("id_a") < F.col("id_b"))
             .groupBy("id_a", "id_b")
             .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot")))
    na = norms.select(F.col("doc_id").alias("id_a"),
                      F.col("nrm").alias("na"))
    nb = norms.select(F.col("doc_id").alias("id_b"),
                      F.col("nrm").alias("nb"))
    return (dots.join(na, on="id_a").join(nb, on="id_b")
                .select("id_a", "id_b",
                        F.round(F.col("dot")
                                / (F.col("na") * F.col("nb")), 6)
                         .alias("cosine"))
                .where(F.col("cosine") >= threshold))


def bloom_decontaminate(df: DataFrame, benchmark: list[str], n: int = 13,
                        m_bits: int = 1 << 15, k_hashes: int = 4,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Bloom-filter n-gram decontamination — the CONSTANT-MEMORY variant
    of ngram_decontaminate for benchmark suites too large to broadcast
    as an exact hash set: benchmark grams set k_hashes md5-derived bit
    positions in an m_bits filter; a training gram "hits" when ALL its
    positions are set (one-sided error: no false negatives, a bounded
    deterministic false-positive rate that flags at most a few extra
    docs for audit).

    Everything is pure md5 arithmetic (position_i = h_i(gram) mod
    m_bits), so filter contents AND membership tests replay exactly in
    SQL. The filter is built as a one-row collected position set and
    broadcast; the corpus scan is a single pass with map-side
    array_contains probes — no corpus-keyed shuffle, same 100 TB shape
    as ngram_decontaminate. Output: (doc_id, n_grams, n_hits,
    contaminated)."""
    spark = df.sparkSession

    def gram_expr():
        return F.expr(
            f"CASE WHEN size(_t) = 0 THEN array() "
            f"WHEN size(_t) <= {n} THEN array(array_join(_t, ' ')) "
            f"ELSE transform(sequence(0, size(_t) - {n}), "
            f"p -> array_join(slice(_t, p + 1, {n}), ' ')) END")

    from .dedup import cross_hash60

    def positions(gram_col):
        return [F.pmod(cross_hash60(F.concat(F.lit(f"bf{i}:"), gram_col)),
                       F.lit(m_bits))
                for i in range(k_hashes)]

    toks = F.filter(tokens(F.col(text_col)), lambda x: F.length(x) > 0)
    btoks = F.filter(tokens(F.col("btext")), lambda x: F.length(x) > 0)
    bench = spark.createDataFrame([(t,) for t in benchmark], "btext string")
    bloom = (bench.select(btoks.alias("_t"))
                  .select(F.explode(gram_expr()).alias("gram"))
                  .select(F.explode(F.array(*positions(F.col("gram"))))
                          .alias("pos"))
                  .agg(F.sort_array(F.collect_set("pos")).alias("bl")))
    dgrams = (df.select(F.col(id_col).alias("doc_id"), toks.alias("_t"))
                .select("doc_id", F.explode(gram_expr()).alias("gram")))
    probe = dgrams.crossJoin(F.broadcast(bloom))
    hit = positions(F.col("gram"))[0].isNotNull()
    for p in positions(F.col("gram")):
        hit = hit & F.array_contains(F.col("bl"), p)
    counted = (probe.select("doc_id", hit.cast("bigint").alias("_hit"))
                    .groupBy("doc_id")
                    .agg(F.count("*").cast("bigint").alias("n_grams"),
                         F.sum("_hit").cast("bigint").alias("n_hits")))
    return (df.select(F.col(id_col).alias("doc_id"))
              .join(counted, on="doc_id", how="left")
              .select("doc_id",
                      F.coalesce("n_grams", F.lit(0)).cast("bigint")
                       .alias("n_grams"),
                      F.coalesce("n_hits", F.lit(0)).cast("bigint")
                       .alias("n_hits"),
                      (F.coalesce("n_hits", F.lit(0)) > 0)
                      .alias("contaminated")))


def rrf_fuse(rankings: list[DataFrame], id_col: str = "doc_id",
             rank_col: str = "rank", k: int = 60, top_n: int = 10,
             partition_cols: list[str] | None = None) -> DataFrame:
    """Reciprocal-rank fusion (Cormack & Clarke): fuse N ranked lists by
    score(d) = sum over lists of 1 / (k + rank_d), re-rank descending.
    The standard way to blend lexical (BM25) and dense (cosine)
    retrieval without score calibration.

    Scale shape: each input list is already top-bounded by its producer,
    so the union + groupBy runs over (queries x top_m x n_lists) rows —
    never corpus-sized. One bounded shuffle on (partition_cols, id);
    the final rank window partitions per query.
    Output: (*partition_cols, id, n_lists, rrf rounded 9, rank)."""
    pc = list(partition_cols or [])
    cols = pc + [id_col, rank_col]
    u = rankings[0].select(*cols)
    for r in rankings[1:]:
        u = u.unionByName(r.select(*cols))
    scores = (u.groupBy(*pc, id_col)
               .agg(F.count("*").cast("bigint").alias("n_lists"),
                    F.round(F.sum(F.lit(1.0)
                                  / (F.lit(float(k))
                                     + F.col(rank_col).cast("double"))),
                            9).alias("rrf")))
    w = (Window.partitionBy(*pc) if pc else Window.partitionBy()) \
        .orderBy(F.col("rrf").desc(), F.col(id_col))
    return (scores.withColumn("fused_rank",
                              F.row_number().over(w).cast("int"))
                  .where(F.col("fused_rank") <= top_n))


def phrase_search(df: DataFrame, phrases: list[tuple[int, str]],
                  id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Positional-index phrase search: for each (phrase_id, phrase),
    count EXACT consecutive-token occurrences per document — the
    quoted-query primitive BM25's bag-of-words scoring cannot express.

    The positional posting list (doc, pos, term) is built once and
    restricted to the phrase vocabulary BEFORE any shuffle (broadcast
    semi-join), so the join chain — one equi-join per additional
    phrase token on (doc, pos + i) — runs over postings of the query
    terms only, never the corpus. Output:
    (query_id, doc_id, n_matches)."""
    from .text import tokens

    spark = df.sparkSession
    toks = F.filter(tokens(F.col(text_col)), lambda x: F.length(x) > 0)
    vocab = sorted({t for _, p in phrases for t in p.split()})
    posting = (df.select(F.col(id_col).alias("doc_id"),
                         F.posexplode(toks).alias("pos", "term"))
                 .where(F.col("term").isin(vocab)))
    posting = posting.localCheckpoint()  # shared by every join arm
    outs = []
    for qid, phrase in phrases:
        terms = phrase.split()
        base = (posting.where(F.col("term") == terms[0])
                       .select("doc_id", F.col("pos").alias("p0")))
        for i, t in enumerate(terms[1:], start=1):
            nxt = (posting.where(F.col("term") == t)
                          .select(F.col("doc_id"),
                                  (F.col("pos") - i).alias("p0")))
            base = base.join(nxt, on=["doc_id", "p0"])
        outs.append(base.groupBy("doc_id")
                        .agg(F.count("*").cast("bigint")
                              .alias("n_matches"))
                        .select(F.lit(qid).cast("bigint")
                                 .alias("query_id"),
                                "doc_id", "n_matches"))
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


def prf_expansion(df: DataFrame, queries: list[tuple[int, str]],
                  k: int = 5, n_terms: int = 5, k1: float = 1.2,
                  b: float = 0.75, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Pseudo-relevance-feedback query expansion (RM3-lite): the
    BM25 top-k documents of each query vote for expansion terms with
    weight = sum over those docs of (tf_t,d / dl_d) * score_d — the
    relevance-model estimate P(t|R) with the rounded BM25 score as
    the doc weight. Terms already in the query are excluded; top
    ``n_terms`` per query by (weight DESC, term) — fully
    deterministic, so the oracle replays it exactly.

    Plan: the top-k relation is tiny (|queries| * k rows) and
    BROADCASTS into the token explosion of ONLY the winning docs (a
    semi-join first prunes the corpus scan: no full-corpus tf shuffle
    for a handful of feedback docs). Per-addend products quantize
    ROUND(.,9) and accumulate as DECIMAL(38,9) (<= k addends — the
    fold must still be order-invariant), final weight rounds 6.
    Output: (query_id, term, weight, rank <= n_terms)."""
    top = bm25_topk(df, queries, id_col=id_col, text_col=text_col,
                    k=k, k1=k1, b=b)
    # r12 optimization (guide §2.4): `top` feeds TWO consumers (the
    # corpus-pruning semi-join and the scoring join) — unshared, the
    # whole full-corpus BM25 pipeline ran twice. Size-gated
    # materialization (the estimate rides the un-filtered corpus
    # size, so the gate fires at scale) computes it once; the
    # |queries|*k-row checkpoint is trivially small.
    from .materialize import materialize_if_large
    top = materialize_if_large(top)
    toks_arr = F.filter(tokens(F.col(text_col)),
                        lambda x: F.length(x) > 0)
    base = (df.select(F.col(id_col).alias("doc_id"),
                      toks_arr.alias("_toks"))
              .withColumn("dl", F.size("_toks")))
    # prune the corpus to the feedback docs BEFORE exploding tokens
    fb = base.join(F.broadcast(top.select("doc_id").distinct()),
                   on="doc_id")
    tf = (fb.select("doc_id", "dl", F.explode("_toks").alias("term"))
            .groupBy("doc_id", "dl", "term")
            .agg(F.count("*").alias("tf")))
    spark = df.sparkSession
    qdf = spark.createDataFrame(list(queries),
                                "query_id long, qtext string")
    qterms = qdf.select(
        "query_id",
        F.explode(F.array_distinct(
            F.filter(tokens(F.col("qtext")),
                     lambda x: F.length(x) > 0))).alias("term"))
    addend = F.round((F.col("tf") / F.col("dl")) * F.col("score"), 9) \
              .cast("decimal(38,9)")
    w = (top.join(F.broadcast(tf), on="doc_id")
            .groupBy("query_id", "term")
            .agg(F.round(F.sum(addend).cast("double"), 6)
                  .alias("weight")))
    w = w.join(F.broadcast(qterms), on=["query_id", "term"],
               how="left_anti")
    rk = Window.partitionBy("query_id").orderBy(
        F.col("weight").desc(), F.col("term"))
    return (w.withColumn("rank", F.row_number().over(rk))
             .filter(F.col("rank") <= n_terms)
             .select("query_id", "term", "weight",
                     F.col("rank").cast("int").alias("rank")))

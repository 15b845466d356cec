"""BM25 / TF-IDF retrieval and k-means clustering tests."""

import math

import pytest
from pyspark.sql import functions as F

from dask_grblas_spark.functions.retrieval import bm25_topk, tfidf_vectors
from dask_grblas_spark.functions.similarity import kmeans_assign


def _corpus(spark):
    return spark.createDataFrame(
        [(0, "apple banana apple"),
         (1, "banana cherry"),
         (2, "apple apple apple durian"),
         (3, "elderberry fig")],
        "doc_id long, text string")


def _bm25_ref(tf, df_t, dl, avgdl, n_docs, k1=1.2, b=0.75):
    idf = math.log(1 + (n_docs - df_t + 0.5) / (df_t + 0.5))
    return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))


def test_bm25_matches_hand_computation(spark):
    out = {(r["query_id"], r["doc_id"]): r["score"]
           for r in bm25_topk(_corpus(spark), [(1, "apple")], k=4).collect()}
    avgdl = (3 + 2 + 4 + 2) / 4
    # 'apple': df=2 over 4 docs; doc0 tf=2 dl=3, doc2 tf=3 dl=4
    assert out[(1, 0)] == pytest.approx(
        round(_bm25_ref(2, 2, 3, avgdl, 4), 6), abs=1e-6)
    assert out[(1, 2)] == pytest.approx(
        round(_bm25_ref(3, 2, 4, avgdl, 4), 6), abs=1e-6)
    assert set(out) == {(1, 0), (1, 2)}  # docs without the term: no row


def test_bm25_rank_and_multi_term(spark):
    rows = bm25_topk(_corpus(spark), [(7, "apple cherry")], k=10).collect()
    got = sorted((r["rank"], r["doc_id"]) for r in rows)
    # doc1 matches cherry (rare: df=1 -> higher idf); docs 0/2 match apple
    assert [d for _, d in got] == sorted(
        {r["doc_id"] for r in rows} & {0, 1, 2}) or len(got) == 3
    assert {r["doc_id"] for r in rows} == {0, 1, 2}
    ranks = {r["doc_id"]: r["rank"] for r in rows}
    assert sorted(ranks.values()) == [1, 2, 3]


def test_bm25_query_term_not_in_corpus(spark):
    rows = bm25_topk(_corpus(spark), [(1, "zebra")], k=3).collect()
    assert rows == []


def test_tfidf_vectors(spark):
    out = {(r["doc_id"], r["term"]): r["tfidf"]
           for r in tfidf_vectors(_corpus(spark)).collect()}
    # doc0 'apple': tf=2/3, idf=ln(5/3)+1
    assert out[(0, "apple")] == pytest.approx(
        round(2 / 3 * (math.log(5 / 3) + 1), 6), abs=1e-6)
    # min_df prunes: durian appears once
    pruned = {(r["doc_id"], r["term"])
              for r in tfidf_vectors(_corpus(spark), min_df=2).collect()}
    assert (2, "durian") not in pruned and (0, "apple") in pruned


def _blobs(spark, n_per=40, dim=8, centers=((10.0, 0), (-10.0, 1))):
    # two well-separated blobs with deterministic pseudo-noise
    rows = []
    for cval, cid in centers:
        for i in range(n_per):
            base = cid * n_per + i
            vec = [cval + ((base * 37 + d * 11) % 7 - 3) * 0.05
                   for d in range(dim)]
            rows.append((base, vec))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_kmeans_separates_blobs(spark):
    df = _blobs(spark)
    out = kmeans_assign(df, k=2, iters=4).collect()
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r["cluster"], set()).add(r["vec_id"])
    assert len(out) == 80
    assert len(by_cluster) == 2
    blobs = [frozenset(range(40)), frozenset(range(40, 80))]
    assert sorted(frozenset(v) for v in by_cluster.values()) \
        == sorted(blobs)


def test_kmeans_deterministic(spark):
    df = _blobs(spark)
    a = sorted((r["vec_id"], r["cluster"])
               for r in kmeans_assign(df, k=3, iters=2).collect())
    b = sorted((r["vec_id"], r["cluster"])
               for r in kmeans_assign(df, k=3, iters=2).collect())
    assert a == b


def test_kmeans_empty_cluster_keeps_centroid(spark):
    # k = n: every vector is its own centroid candidate, but identical
    # vectors collapse clusters — emptied clusters must not crash and
    # every vector still gets a label
    df = spark.createDataFrame(
        [(i, [1.0, 2.0]) for i in range(4)] + [(9, [50.0, 50.0])],
        "vec_id long, embedding array<double>")
    out = kmeans_assign(df, k=3, iters=2)
    assert out.count() == 5
    assert out.select("cluster").distinct().count() == 2


def test_ngram_decontaminate(spark):
    from dask_grblas_spark.functions.retrieval import ngram_decontaminate

    docs = spark.createDataFrame(
        [(0, "one two three four five six seven"),
         (1, "zero one two three four five six seven eight"),  # contains bench gram
         (2, "totally different words entirely here now"),
         (3, "three four five unrelated tail words")],
        "doc_id long, text string")
    bench = ["one two three four five six seven"]
    out = {r["doc_id"]: r for r in
           ngram_decontaminate(docs, bench, n=7).collect()}
    assert out[0]["contaminated"] and out[0]["n_hits"] == 1
    assert out[1]["contaminated"]  # the 7-gram appears inside doc 1
    assert not out[2]["contaminated"] and out[2]["n_hits"] == 0
    assert not out[3]["contaminated"]  # shares tokens but no full 7-gram
    assert len(out) == 4  # every doc gets a row


def test_ngram_decontaminate_short_benchmark(spark):
    from dask_grblas_spark.functions.retrieval import ngram_decontaminate

    docs = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "beta gamma delta")],
        "doc_id long, text string")
    # benchmark shorter than n screens as its full token sequence
    out = {r["doc_id"]: r["contaminated"] for r in
           ngram_decontaminate(docs, ["alpha beta gamma"], n=13).collect()}
    assert out[0] and not out[1]


def test_kmeans_k_exceeds_corpus(spark):
    df = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [10.0, 10.0]), (2, [20.0, 20.0])],
        "vec_id long, embedding array<double>")
    out = kmeans_assign(df, k=10, iters=2).collect()
    assert len(out) == 3
    # 3 seeds for 3 well-separated points: every point its own cluster
    assert len({r["cluster"] for r in out}) == 3


def test_kmeans_broadcast_path_matches_literal_path(spark):
    """The large-codebook broadcast-join assignment must agree with the
    in-plan-literal assignment (same rounded-distance + cluster-id
    tie-break). Tiling each vector (dim 6 -> 4800, so k*dim crosses the
    16384 literal budget) forces the broadcast path without changing
    which centroid is nearest — distances scale uniformly by the tile
    count."""
    import pyspark.sql.functions as F

    df = _blobs(spark, n_per=25, dim=6,
                centers=((8.0, 0), (-8.0, 1), (0.0, 2)))
    lit = sorted((r["vec_id"], r["cluster"])
                 for r in kmeans_assign(df, k=4, iters=2).collect())
    wide = df.withColumn(
        "embedding", F.flatten(F.array_repeat(F.col("embedding"), 800)))
    big = sorted((r["vec_id"], r["cluster"])
                 for r in kmeans_assign(wide, k=4, iters=2).collect())
    assert lit == big


def test_random_projection_deterministic_and_jl(spark):
    """random_projection: literal-matrix projection is partition-
    invariant and approximately preserves pairwise distance ORDER
    (the JL property at small scale)."""
    import numpy as np
    import pyspark.sql.functions as F

    from dask_grblas_spark.functions.similarity import (_projection_matrix,
                                                        random_projection)

    rng = np.random.RandomState(7)
    vecs = rng.randn(30, 64)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(30)],
        "vec_id long, embedding array<double>")
    out = random_projection(emb, out_dim=8).collect()
    assert len(out) == 30 * 8
    # partition invariance: same literals, same folds, any layout
    out2 = random_projection(emb.repartition(13), out_dim=8).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))
    # matches the numpy projection to rounding tolerance
    R = np.array(_projection_matrix(8, 64, 42))
    P = vecs @ R.T
    got = {(r["id"], r["dim"]): r["value"] for r in out}
    for i in range(30):
        for j in range(8):
            assert abs(got[(i, j)] - P[i, j]) < 1e-6
    # JL sanity: projected pairwise distances correlate with originals
    d_orig, d_proj = [], []
    for a in range(10):
        for b in range(a + 1, 10):
            d_orig.append(np.linalg.norm(vecs[a] - vecs[b]))
            d_proj.append(np.linalg.norm(P[a] - P[b]))
    corr = np.corrcoef(d_orig, d_proj)[0, 1]
    assert corr > 0.3  # 8 dims from 64: order mostly preserved


def test_vocab_oov_rate_cut_and_ties(spark):
    """vocab_oov_rate: the top-V cut is by (freq DESC, token ASC) so a
    tie at the boundary resolves deterministically; OOV rates are exact
    fractions."""
    from dask_grblas_spark.functions.text import vocab_oov_rate

    docs = spark.createDataFrame(
        [(1, "aa aa aa bb bb cc"),      # aa:3 bb:2 cc:1
         (2, "bb cc dd"),               # dd:1 ties with cc -> cc wins cut
         (3, "aa dd dd")],              # dd total 3
        "doc_id long, text string")
    # corpus freq: aa=4, dd=3, bb=3, cc=2 -> vocab_size=3 keeps aa, bb,
    # dd (bb before dd by token tie-break at freq 3) and drops cc
    out = {r["id"]: (r["n_tok"], r["oov_rate"])
           for r in vocab_oov_rate(docs, vocab_size=3).collect()}
    assert out[1] == (6, round(1 / 6, 6))   # cc OOV
    assert out[2] == (3, round(1 / 3, 6))   # cc OOV, bb+dd in vocab
    assert out[3] == (3, 0.0)
    # vocab_size larger than the vocabulary: nothing is OOV
    out_all = {r["id"]: r["oov_rate"]
               for r in vocab_oov_rate(docs, vocab_size=100).collect()}
    assert set(out_all.values()) == {0.0}


def test_corpus_composition_rollup_subtotals(spark):
    from dask_grblas_spark.functions.text import corpus_composition

    docs = spark.createDataFrame(
        [(1, "a b", "en", "s1", 3), (2, "c", "en", "s1", 1),
         (3, "d e f", "de", "s2", 5)],
        "doc_id long, text string, lang string, source string, n_chars long")
    rows = {(r["source"], r["lang"]): (r["n_docs"], r["n_tokens"])
            for r in corpus_composition(docs).collect()}
    assert rows[("s1", "en")] == (2, 3)
    assert rows[("s2", "de")] == (1, 3)
    assert rows[("s1", "<all>")] == (2, 3)     # per-source subtotal
    assert rows[("<all>", "<all>")] == (3, 6)  # grand total
    assert len(rows) == 5


def test_label_centroids_exact_means(spark):
    from dask_grblas_spark.functions.similarity import label_centroids

    emb = spark.createDataFrame(
        [(1, [1.0, 2.0], 0), (2, [3.0, 4.0], 0), (3, [10.0, 20.0], 1)],
        "vec_id long, embedding array<double>, label int")
    got = {(r["label"], r["dim"]): (r["centroid"], r["n"])
           for r in label_centroids(emb).collect()}
    assert got[(0, 0)] == (2.0, 2) and got[(0, 1)] == (3.0, 2)
    assert got[(1, 0)] == (10.0, 1) and got[(1, 1)] == (20.0, 1)


def test_json_field_agg_handles_bad_json(spark):
    """from_json yields null for malformed payloads; the mean divides by
    COUNT(parsed), not COUNT(*), so corrupt rows don't skew it."""
    from dask_grblas_spark.functions.timeseries import json_field_agg

    ev = spark.createDataFrame(
        [(1, "click", '{"k": 10}'), (2, "click", '{"k": 20}'),
         (3, "click", "not json"), (4, "view", '{"k": 7}')],
        "event_id long, event_type string, props string")
    got = {r["grp"]: (r["n_events"], r["sum_field"], r["mean_field"])
           for r in json_field_agg(ev).collect()}
    assert got["click"] == (3, 30, 15.0)  # mean over the 2 parsed rows
    assert got["view"] == (1, 7, 7.0)


def test_bpe_pair_counts_hand_computed(spark):
    from dask_grblas_spark.functions.text import bpe_pair_counts

    docs = spark.createDataFrame(
        [(1, "aba aba x"), (2, "ab")],
        "doc_id long, text string")
    # word freqs: aba:2, x:1 (dropped, len<2), ab:1
    # aba -> pairs ab, ba (x2 weight); ab -> pair ab (x1)
    got = {r["pair"]: r["cnt"] for r in bpe_pair_counts(docs).collect()}
    assert got == {"ab": 3, "ba": 2}
    # monster words are dropped entirely
    long_doc = spark.createDataFrame(
        [(1, "x" * 40 + " ok")], "doc_id long, text string")
    got2 = {r["pair"]: r["cnt"]
            for r in bpe_pair_counts(long_doc, max_word_len=32).collect()}
    assert got2 == {"ok": 1}


def test_length_batches_bounds_and_buckets(spark):
    """length_batches: exact power-of-two buckets (incl. the exact-power
    edge), batches never exceed batch_size and never mix buckets."""
    import pyspark.sql.functions as F

    from dask_grblas_spark.functions.text import length_batches

    rows = [(i, " ".join(["w"] * n)) for i, n in
            enumerate([1, 2, 3, 4, 7, 8, 9, 15, 16, 31, 32] * 5)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = length_batches(docs, batch_size=2, n_shards=4).collect()
    for r in out:
        assert r["bucket"] == r["n_tok"].bit_length() - 1  # floor(log2)
    from collections import Counter
    sizes = Counter((r["bucket"], r["shard"], r["batch_no"]) for r in out)
    assert max(sizes.values()) <= 2
    # determinism under repartitioning
    out2 = length_batches(docs.repartition(7), batch_size=2,
                          n_shards=4).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


def test_quality_quantile_filter_exact_cutoff_and_ties(spark):
    from dask_grblas_spark.functions.text import quality_quantile_filter

    # 10 docs: 4 high-quality (>=10 tokens incl. stopwords), 6 junk
    good = "the cat sat of the mat and then went to sleep again"
    docs = spark.createDataFrame(
        [(i, good) for i in range(4)] + [(i, "x y") for i in range(4, 10)],
        "doc_id long, text string")
    kept = quality_quantile_filter(docs, keep_top=0.4).collect()
    # the 4 good docs tie at the top score; cutoff lands exactly there
    assert sorted(r["id"] for r in kept) == [0, 1, 2, 3]
    # tie mass can exceed keep_top: asking for 10% still keeps all 4 ties
    kept2 = quality_quantile_filter(docs, keep_top=0.1).collect()
    assert sorted(r["id"] for r in kept2) == [0, 1, 2, 3]
    # keep_top=1.0 keeps everything
    assert quality_quantile_filter(docs, keep_top=1.0).count() == 10


def test_bpe_encode_applies_merges_in_rank_order(spark):
    from dask_grblas_spark.functions.text import bpe_encode

    docs = spark.createDataFrame(
        [(1, "lower lower stern in"), (2, "in in")],
        "doc_id long, text string")
    merges = [("<e><r>", "<er>"), ("<o><w>", "<ow>"), ("<i><n>", "<in>")]
    got = {r["w"]: (r["freq"], r["enc"], r["n_sub"])
           for r in bpe_encode(docs, merges).collect()}
    # 'lower': e+r merges first, then o+w -> <l><ow><er>
    assert got["lower"] == (2, "<l><ow><er>", 3)
    assert got["stern"] == (1, "<s><t><er><n>", 4)
    assert got["in"] == (3, "<in>", 1)


def test_bpe_encode_greedy_left_to_right(spark):
    from dask_grblas_spark.functions.text import bpe_encode

    docs = spark.createDataFrame([(1, "aaa")], "doc_id long, text string")
    # greedy non-overlapping: 'aaa' -> <aa><a>, not <a><aa>
    got = bpe_encode(docs, [("<a><a>", "<aa>")]).collect()[0]
    assert (got["enc"], got["n_sub"]) == ("<aa><a>", 2)


def test_token_cooccurrence_pmi_hand_computed(spark):
    import math

    from dask_grblas_spark.functions.text import token_cooccurrence

    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a c"), (4, "d")],
        "doc_id long, text string")
    got = {(r.tok_a, r.tok_b): (r.n_ab, r.pmi)
           for r in token_cooccurrence(docs, min_count=2).collect()}
    # only (a,b) reaches min_count=2; n_a=3, n_b=2, N=4
    assert set(got) == {("a", "b")}
    n_ab, pmi = got[("a", "b")]
    assert n_ab == 2
    assert pmi == round(math.log(2 * 4 / (3 * 2)), 6)


def test_token_cooccurrence_cap_bounds_pairs(spark):
    from dask_grblas_spark.functions.text import token_cooccurrence

    text = " ".join(f"t{i:03d}" for i in range(100))
    docs = spark.createDataFrame([(1, text), (2, text)],
                                 "doc_id long, text string")
    out = token_cooccurrence(docs, min_count=2, max_tokens_per_doc=10)
    # only the 10 lexicographically-first tokens pair: C(10,2) = 45
    assert out.count() == 45


def test_vocab_coverage_curve_hand_computed(spark):
    from dask_grblas_spark.functions.text import vocab_coverage_curve

    # freqs: a=6, b=3, c=1 -> total 10; 50% needs {a}, 90% {a,b},
    # 95%/99% need all three
    docs = spark.createDataFrame(
        [(1, "a a a a a a b b b c")], "doc_id long, text string")
    got = {r.frac: (r.vocab_size, r.coverage)
           for r in vocab_coverage_curve(docs).collect()}
    assert got[0.5] == (1, 0.6)
    assert got[0.9] == (2, 0.9)
    assert got[0.95] == (3, 1.0)
    assert got[0.99] == (3, 1.0)


def test_quantize_int8_hand_check(spark):
    """v = [2.54, -1.27, 0.0]: scale = 2.54/127 = 0.02, codes
    [127, -64, 0] (1.27/0.02 = 63.5 rounds half-AWAY to 64)."""
    from dask_grblas_spark.functions.similarity import quantize_int8

    df = spark.createDataFrame([(1, [2.54, -1.27, 0.0])],
                               "vec_id long, embedding array<float>")
    r = quantize_int8(df, keep_codes=True).collect()[0]
    assert r.q_codes == [127, -64, 0]
    assert abs(r.q_scale - 0.02) < 1e-6
    assert r.q_sum == 63
    # mse recomputed from float32-exact inputs
    import numpy as np
    v = np.array([2.54, -1.27, 0.0], dtype="float32").astype("float64")
    s = v[0] / 127.0
    mse = float(np.mean((v - np.array([127, -64, 0]) * s) ** 2))
    assert abs(r.q_mse - mse) < 1e-9


def test_quantize_int8_zero_vector_scale_one(spark):
    from dask_grblas_spark.functions.similarity import quantize_int8

    df = spark.createDataFrame([(1, [0.0, 0.0])],
                               "vec_id long, embedding array<float>")
    r = quantize_int8(df, keep_codes=True).collect()[0]
    assert r.q_scale == 1.0 and r.q_codes == [0, 0] and r.q_mse == 0.0


def test_ranking_metrics_hand_check(spark):
    from dask_grblas_spark.functions.similarity import ranking_metrics

    retrieved = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3),
         (2, 20, 1), (2, 21, 2)],
        "query_id long, neighbor_id long, rank int")
    truth = spark.createDataFrame(
        [(1, 11), (1, 12), (1, 99),     # 2 of 3 relevant found
         (2, 99),                        # nothing found
         (3, 5)],                        # query absent from retrieval
        "query_id long, neighbor_id long")
    got = {r.query_id: (r.n_rel, r.n_hit, r.recall, r.rr)
           for r in ranking_metrics(retrieved, truth, k=5).collect()}
    assert got[1] == (3, 2, round(2 / 3, 6), 0.5)   # first hit rank 2
    assert got[2] == (1, 0, 0.0, 0.0)
    assert got[3] == (1, 0, 0.0, 0.0)


def test_impute_group_median(spark):
    from pyspark.sql import functions as F

    from dask_grblas_spark.functions.profiling import impute

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("a", None), ("b", 10.0), ("b", None)],
        "g string, v double")
    out = impute(df, "v", group_col="g").collect()
    filled = {(r.g, r.v_filled) for r in out if r.was_null}
    assert filled == {("a", 2.0), ("b", 10.0)}
    # untouched rows keep their value
    assert all(r.v_filled == r.v for r in out if not r.was_null)
    # global (ungrouped) median over [1, 3, 10] = 3
    gout = impute(df, "v").where(F.col("was_null")).collect()
    assert {r.v_filled for r in gout} == {3.0}


def test_knn_classify_majority_and_tie(spark):
    import numpy as np

    from dask_grblas_spark.functions.similarity import knn_classify

    rng = np.random.RandomState(0)
    c0 = rng.randn(64); c1 = -c0
    rows = []
    for i in range(6):    # labels 0: clustered around c0
        rows.append((i, [float(x) for x in c0 + 0.01 * rng.randn(64)], 0))
    for i in range(6, 12):  # labels 1: around c1
        rows.append((i, [float(x) for x in c1 + 0.01 * rng.randn(64)], 1))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
    got = {r.query_id: r.pred_label
           for r in knn_classify(df, k=5).collect()}
    assert all(got[i] == 0 for i in range(6))
    assert all(got[i] == 1 for i in range(6, 12))


def test_rrf_fuse_hand_computed(spark):
    from dask_grblas_spark.functions.retrieval import rrf_fuse

    a = spark.createDataFrame([(10, 1), (20, 2), (30, 3)],
                              "doc_id long, rank int")
    b = spark.createDataFrame([(20, 1), (40, 2)],
                              "doc_id long, rank int")
    got = {r["doc_id"]: r for r in rrf_fuse([a, b], k=60).collect()}
    # doc 20: 1/62 + 1/61; doc 10: 1/61; doc 30: 1/63; doc 40: 1/62
    assert got[20]["n_lists"] == 2
    assert got[20]["rrf"] == round(1 / 62 + 1 / 61, 9)
    assert got[10]["rrf"] == round(1 / 61, 9)
    order = sorted(got.values(), key=lambda r: r["fused_rank"])
    assert [r["doc_id"] for r in order] == [20, 10, 40, 30]


def test_rrf_fuse_tie_breaks_by_id_and_partitions(spark):
    from dask_grblas_spark.functions.retrieval import rrf_fuse

    a = spark.createDataFrame([(1, 5, 1), (1, 7, 2), (2, 7, 1)],
                              "query_id long, doc_id long, rank int")
    b = spark.createDataFrame([(1, 7, 1), (1, 5, 2), (2, 9, 1)],
                              "query_id long, doc_id long, rank int")
    got = rrf_fuse([a, b], k=60, partition_cols=["query_id"]).collect()
    q1 = {r["doc_id"]: r for r in got if r["query_id"] == 1}
    # symmetric ranks -> equal rrf -> doc 5 wins the tie by id
    assert q1[5]["rrf"] == q1[7]["rrf"]
    assert q1[5]["fused_rank"] == 1 and q1[7]["fused_rank"] == 2
    q2 = sorted((r for r in got if r["query_id"] == 2),
                key=lambda r: r["fused_rank"])
    assert [r["doc_id"] for r in q2] == [7, 9]


def test_item_cf_topk_hand_computed(spark):
    import math

    from dask_grblas_spark.functions.similarity import item_cf_topk

    df = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (3, "c")],
        "u long, i string")
    got = {(r["item"], r["neighbor"]): r
           for r in item_cf_topk(df, "u", "i", min_co=2).collect()}
    # co(a,b)=2 passes; co(a,c)=1 cut by min_co
    assert set(got) == {("a", "b"), ("b", "a")}
    assert got[("a", "b")]["co"] == 2
    assert got[("a", "b")]["sim"] == round(2 / math.sqrt(3 * 2), 6)
    assert got[("a", "b")]["rank"] == 1


def test_item_cf_user_cap_bounds_pairs(spark):
    from dask_grblas_spark.functions.similarity import item_cf_topk

    rows = [(1, f"i{k:02d}") for k in range(10)] + \
           [(2, f"i{k:02d}") for k in range(10)]
    df = spark.createDataFrame(rows, "u long, i string")
    # cap keeps only each user's first 3 items -> pairs among i00..i02
    got = item_cf_topk(df, "u", "i", min_co=2, max_user_items=3).collect()
    items = {r["item"] for r in got}
    assert items == {"i00", "i01", "i02"}


def test_phrase_search_counts_consecutive_matches(spark):
    from dask_grblas_spark.functions.retrieval import phrase_search

    df = spark.createDataFrame(
        [(1, "a b a b a"), (2, "a a b"), (3, "b b b")],
        "doc_id long, text string")
    got = {(r["query_id"], r["doc_id"]): r["n_matches"]
           for r in phrase_search(df, [(1, "a b"), (2, "b a b"),
                                       (3, "z q")]).collect()}
    assert got[(1, 1)] == 2     # positions 0 and 2
    assert got[(1, 2)] == 1
    assert got[(2, 1)] == 1     # one 3-token window
    assert (3, 3) not in got and not any(q == 3 for q, _ in got)


def test_tfidf_cosine_pairs_hand_computed(spark):
    """3 docs; docs 1-2 share most terms, doc 3 is disjoint. Replay the
    exact tf-idf weighting and cosine in Python."""
    import math

    from dask_grblas_spark.functions.retrieval import tfidf_cosine_pairs

    texts = {1: "a b c d", 2: "a b c e", 3: "x y z w"}
    df = spark.createDataFrame(list(texts.items()),
                               "doc_id long, text string")
    got = {(r.id_a, r.id_b): r.cosine
           for r in tfidf_cosine_pairs(df, threshold=0.1).collect()}
    n = 3
    dfreq = {}
    for t in texts.values():
        for term in set(t.split()):
            dfreq[term] = dfreq.get(term, 0) + 1
    def vec(t):
        toks = t.split()
        return {term: (toks.count(term) / len(toks))
                * (math.log((n + 1) / (dfreq[term] + 1)) + 1)
                for term in set(toks)}
    v1, v2 = vec(texts[1]), vec(texts[2])
    dot = sum(v1[t] * v2[t] for t in v1 if t in v2)
    n1 = math.sqrt(sum(w * w for w in v1.values()))
    n2 = math.sqrt(sum(w * w for w in v2.values()))
    assert got == {(1, 2): round(dot / (n1 * n2), 6)}


def test_tfidf_cosine_pairs_max_df_caps_vectors(spark):
    """A term over the df cap leaves the VECTORS, not just the join:
    similarity is the exact cosine of the capped vectors."""
    from dask_grblas_spark.functions.retrieval import tfidf_cosine_pairs

    rows = [(i, "common unique%d other%d" % (i, i)) for i in range(5)]
    rows += [(10, "common shared tail"), (11, "common shared tail")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.id_a, r.id_b): r.cosine for r in tfidf_cosine_pairs(
        df, max_df=3, threshold=0.05).collect()}
    # 'common' (df=7) is capped out everywhere: the 5 unique docs share
    # nothing -> only the identical pair (10, 11) remains, cosine 1.0
    assert set(got) == {(10, 11)}
    assert got[(10, 11)] == 1.0


def test_mmr_rerank_hand_computed(spark):
    """2D embeddings, one query: docs a/b nearly parallel (high mutual
    cosine), doc c orthogonal. Rels: a=0.9, b=0.85, c=0.5. Step 1 picks
    a. Step 2 with lam=0.5: b scores 0.5*0.85 - 0.5*sim(b,a) ~ 0.425 -
    0.5 < 0; c scores 0.25 - 0 = 0.25 -> picks c despite lower rel.
    Step 3 picks b (last remaining)."""
    from dask_grblas_spark.functions.similarity import mmr_rerank

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.999, 0.0447103]), (3, [0.0, 1.0])],
        "vec_id long, embedding array<double>")
    cand = spark.createDataFrame(
        [(0, 1, 0.9), (0, 2, 0.85), (0, 3, 0.5)],
        "query_id long, vec_id long, rel double")
    got = {r.rank: (r.id, r.score)
           for r in mmr_rerank(cand, emb, k=3, lam=0.5).collect()}
    assert got[1] == (1, 0.9)
    assert got[2][0] == 3
    assert got[2][1] == round(0.5 * 0.5 - 0.5 * 0.0, 6)
    assert got[3][0] == 2
    sim_ab = round(0.999 / ((0.999**2 + 0.0447103**2) ** 0.5), 6)
    # step 3: b's penalty is max(sim(b,a), sim(b,c))
    sim_bc = round(0.0447103 / ((0.999**2 + 0.0447103**2) ** 0.5), 6)
    want = round(0.5 * 0.85 - 0.5 * max(sim_ab, sim_bc), 6)
    assert got[3][1] == want


def test_mmr_rerank_short_candidate_lists(spark):
    from dask_grblas_spark.functions.similarity import mmr_rerank

    emb = spark.createDataFrame([(1, [1.0, 0.0]), (2, [0.0, 1.0])],
                                "vec_id long, embedding array<double>")
    cand = spark.createDataFrame([(0, 1, 0.9), (0, 2, 0.2), (7, 1, 0.3)],
                                 "query_id long, vec_id long, rel double")
    got = sorted((r.query, r.rank, r.id)
                 for r in mmr_rerank(cand, emb, k=5, lam=0.7).collect())
    # query 0 returns both, query 7 returns its single candidate
    assert got == [(0, 1, 1), (0, 2, 2), (7, 1, 1)]


def test_pq_codes_shape_and_determinism(spark):
    import numpy as np

    from dask_grblas_spark.functions.similarity import pq_codes

    rng = np.random.RandomState(3)
    rows = [(i, rng.randn(16).tolist()) for i in range(60)]
    # duplicate vector 0 as id 60: identical codes expected
    rows.append((60, rows[0][1]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = pq_codes(df, n_sub=4, k=8, iters=2, dim=16).collect()
    by_vec = {}
    for r in got:
        assert 0 <= r.code < 8 and 0 <= r.sub < 4
        by_vec.setdefault(r.vec_id, {})[r.sub] = r.code
    assert all(len(v) == 4 for v in by_vec.values())
    assert len(by_vec) == 61
    assert by_vec[0] == by_vec[60]
    # deterministic across runs
    again = {(r.vec_id, r.sub): r.code
             for r in pq_codes(df, n_sub=4, k=8, iters=2, dim=16)
             .collect()}
    assert all(again[(v, s)] == c for v, subs in by_vec.items()
               for s, c in subs.items())
    import pytest as _pt
    with _pt.raises(ValueError):
        pq_codes(df, n_sub=5, dim=16)


def test_mutual_knn_pairs_hand(spark):
    """4 vectors in 2D: 0/1 nearly parallel (mutual top-1), 2 points at
    1's direction but 1's top-1 is 0 -> (1,2) not mutual; 3 is 2's
    top-1 and vice versa? ids chosen so exactly {0,1} and {2,3} pair."""
    from dask_grblas_spark.functions.similarity import mutual_knn_pairs

    rows = [(0, [1.0, 0.0]), (1, [0.999, 0.01]),
            (2, [0.0, 1.0]), (3, [0.01, 0.999])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = sorted((r.id_a, r.id_b)
                 for r in mutual_knn_pairs(df).collect())
    assert got == [(0, 1), (2, 3)]


def test_mutual_knn_one_directional_excluded(spark):
    """3 vectors on a line of decreasing similarity: 1 is top-1 of both
    0 and 2, but 1's own top-1 is 0 -> only (0,1) survives."""
    from dask_grblas_spark.functions.similarity import mutual_knn_pairs

    rows = [(0, [1.0, 0.0]), (1, [0.99, 0.1]), (2, [0.9, 0.3])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = sorted((r.id_a, r.id_b)
                 for r in mutual_knn_pairs(df).collect())
    assert got == [(0, 1)]


def test_centroid_outliers_flags_far_vector(spark):
    """One label: three tight vectors + one far -> only the far one
    crosses z >= 2? With 4 points the max z is bounded; use thresh 1.4
    and verify dist/z arithmetic + the zero-variance label."""
    from dask_grblas_spark.functions.similarity import centroid_outliers

    rows = [(0, [0.0, 0.0], 1), (1, [0.2, 0.0], 1), (2, [0.0, 0.2], 1),
            (3, [8.0, 8.0], 1),
            (4, [1.0, 1.0], 2), (5, [1.0, 1.0], 2)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label long")
    out = {r.vec_id: r for r in
           centroid_outliers(df, z_thresh=1.4).collect()}
    assert out[3].is_outlier and out[3].z > 1.4
    assert not out[0].is_outlier
    # zero-variance label: identical vectors -> dist 0 for both, z NULL
    assert out[4].z is None and not out[4].is_outlier
    assert out[4].dist == 0.0


def test_doc_keywords_ranks_rare_terms(spark):
    """Terms shared by every doc get low idf; a doc's distinctive term
    ranks first. min_df=1 keeps singletons; rank capped at top_n."""
    from dask_grblas_spark.functions.retrieval import doc_keywords

    docs = [(1, "apple apple shared shared extra"),
            (2, "banana banana shared shared extra"),
            (3, "shared shared shared extra extra")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {}
    for r in doc_keywords(df, top_n=2, min_df=1).collect():
        got.setdefault(r.doc_id, []).append((r.rank, r.term))
    assert sorted(got[1])[0] == (1, "apple")
    assert sorted(got[2])[0] == (1, "banana")
    assert all(len(v) == 2 for v in got.values())


def test_pca_power_recovers_line_direction(spark):
    """Points along (1, 2) with tiny orthogonal jitter: the top
    direction converges to (1, 2)/sqrt(5) with the first loading
    positive (sign convention); eigenvalue tracks the line variance."""
    from dask_grblas_spark.functions.similarity import pca_power

    rows = []
    for i, t in enumerate([-2.0, -1.0, 0.0, 1.0, 2.0]):
        eps = 0.01 * (1 if i % 2 else -1)
        rows.append((i, [t * 1.0 + eps * 2.0, t * 2.0 - eps * 1.0]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r.dim: r for r in pca_power(df, iters=8).collect()}
    import math
    assert abs(got[0].loading - 1 / math.sqrt(5)) < 1e-3
    assert abs(got[1].loading - 2 / math.sqrt(5)) < 1e-3
    assert got[0].eigenvalue > 1.0


def test_pca_power_sign_flip(spark):
    """Points along (-1, 2): the raw iterate may converge to either
    sign; the convention makes the first nonzero loading positive, so
    the result is (1, -2)/sqrt(5)."""
    from dask_grblas_spark.functions.similarity import pca_power

    rows = [(i, [-t, 2.0 * t]) for i, t in
            enumerate([-2.0, -1.0, 0.0, 1.0, 2.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r.dim: r.loading for r in pca_power(df, iters=8).collect()}
    import math
    assert abs(got[0] - 1 / math.sqrt(5)) < 1e-3
    assert abs(got[1] + 2 / math.sqrt(5)) < 1e-3


def test_triplet_mining_hand_case_and_blocks(spark):
    """Two label clusters on the unit circle: the hardest positive is
    the farthest same-label vector, the hardest negative the nearest
    other-label vector; a single-member label gets a NULL positive;
    3x3 tiling reproduces the single-tile answer exactly."""
    from dask_grblas_spark.functions.similarity import triplet_mining

    rows = [(1, 0, [1.0, 0.0]), (2, 0, [0.9, 0.1]), (3, 0, [0.6, 0.4]),
            (4, 1, [0.0, 1.0]), (5, 1, [0.1, 0.9])]
    df = spark.createDataFrame(
        rows, "vec_id long, label long, embedding array<double>")
    out = {r.vec_id: r for r in triplet_mining(df).collect()}
    assert out[1].pos_id == 3 and out[1].neg_id == 5
    assert out[4].pos_id == 5 and out[4].neg_id == 3
    # single-member label 2 sits between the clusters: NULL positive,
    # and it becomes vec 1's hardest negative (cos 0.707 > 0.110)
    df2 = spark.createDataFrame(
        rows + [(6, 2, [0.5, 0.5])],
        "vec_id long, label long, embedding array<double>")
    out2 = {r.vec_id: r for r in triplet_mining(df2).collect()}
    assert out2[6].pos_id is None and out2[6].neg_id is not None
    assert out2[1].neg_id == 6
    one = {(r.vec_id, r.pos_id, r.neg_id, r.pos_sim, r.neg_sim)
           for r in triplet_mining(df2).collect()}
    tiled = {(r.vec_id, r.pos_id, r.neg_id, r.pos_sim, r.neg_sim)
             for r in triplet_mining(df2, query_blocks=3,
                                     cand_blocks=3).collect()}
    assert one == tiled


def test_dirichlet_ql_hand_computed(spark):
    """doc1 'spark join table join', T=9, mu=10: score(q1, d1) =
    2*ln(20/9) - 2*ln(14) + ln(1.45) + ln(1.9); fully-OOV queries
    vanish (their smoothed probability is 0 for every doc alike)."""
    import math

    from dask_grblas_spark.functions.retrieval import dirichlet_ql_topk

    docs = spark.createDataFrame(
        [(1, "spark join table join"), (2, "window agg merge"),
         (3, "spark window")], "doc_id long, text string")
    out = dirichlet_ql_topk(docs, [(1, "spark join"), (2, "zzz_oov")],
                            k=3, mu=10.0).collect()
    s1 = (2 * math.log(20 / 9) - 2 * math.log(14)
          + math.log(1 + 9 / 20) + math.log(1 + 18 / 20))
    got = [r for r in out if r.query_id == 1 and r.doc_id == 1][0]
    assert got.score == round(s1, 6) and got.rank == 1
    assert not [r for r in out if r.query_id == 2]
    # every doc scores every surviving query (dense by decomposition)
    assert len([r for r in out if r.query_id == 1]) == 3


def test_knn_label_disagreement_flags_mislabel(spark):
    """Vector 6 sits in the label-0 cluster wearing label 1: all 3 of
    its nearest neighbors disagree; a core label-0 member does not
    trip the suspect flag."""
    from dask_grblas_spark.functions.similarity import (
        knn_label_disagreement)

    rows = [(1, 0, [1.0, 0.0]), (2, 0, [0.95, 0.05]),
            (3, 0, [0.9, 0.1]), (4, 1, [0.0, 1.0]),
            (5, 1, [0.05, 0.95]), (6, 1, [0.99, 0.01])]
    emb = spark.createDataFrame(
        rows, "vec_id long, label long, embedding array<double>")
    out = {r.vec_id: r
           for r in knn_label_disagreement(emb, k=3).collect()}
    assert out[6].n_diff == 3 and out[6].suspect and out[6].score == 1.0
    assert out[1].n_diff == 1 and not out[1].suspect


def test_prf_expansion_excludes_query_terms_and_ranks(spark):
    from dask_grblas_spark.functions.retrieval import prf_expansion
    docs = spark.createDataFrame(
        [(1, "apple banana apple cherry"),
         (2, "apple banana durian"),
         (3, "elderberry fig grape")],
        "doc_id long, text string")
    out = prf_expansion(docs, [(1, "apple")], k=2, n_terms=3).collect()
    terms = [r["term"] for r in out]
    # 'apple' is the query term -> excluded even though it dominates
    assert "apple" not in terms
    # feedback docs are 1 and 2 (the only apple docs); doc-3-only
    # terms never appear
    assert "elderberry" not in terms
    # banana appears in both feedback docs -> ranked first
    assert terms[0] == "banana"
    ranks = [r["rank"] for r in out if r["query_id"] == 1]
    assert ranks == sorted(ranks) and ranks[0] == 1


def test_pmi_bigrams_hand_computed(spark):
    import math

    from dask_grblas_spark.functions import text as text_fns
    # "x y x y x y": bigrams (x,y)x3, (y,x)x2, N=5
    # c1(x)=3, c2(y)=3 -> PMI(x,y)=ln(3*5/9)=ln(5/3)
    # c1(y)=2, c2(x)=2 -> PMI(y,x)=ln(2*5/4)=ln(5/2)
    df = spark.createDataFrame([(0, "x y x y x y")],
                               "doc_id long, text string")
    out = text_fns.pmi_bigrams(df, min_count=2, k=10).collect()
    byname = {(r["w1"], r["w2"]): (r["c12"], r["pmi"]) for r in out}
    assert byname[("x", "y")] == (3, round(math.log(5 / 3), 6))
    assert byname[("y", "x")] == (2, round(math.log(5 / 2), 6))
    # ranked by pmi desc: (y,x) first
    assert (out[0]["w1"], out[0]["w2"]) == ("y", "x")

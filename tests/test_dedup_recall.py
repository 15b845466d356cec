"""Planted-duplicate recall tests for the probabilistic dedup/ANN
pipelines (q32 minhash, q33 simhash, q36 IVF) — the driver's rows-only
check proves these RUN; these tests prove they FIND what they must find.

All pipelines are deterministic given the cross-engine md5-derived hash
family (dedup.cross_hash60 — no RNG at runtime), so every assertion is
reproducible:
- simhash banding recall is GUARANTEED by pigeonhole (band count derived
  from max_hamming) — the pipeline must return EXACTLY the brute-force
  pair set within the Hamming bound.
- minhash banding on an exact duplicate always collides (identical
  signatures); the planted near-dup (3 of 48 shingles changed, jaccard
  ~0.88) collides under the q32 gate config (bands=16, r=2) with
  probability 1 - (1 - 0.88^2)^16 ~ 1 - 4e-11 under fixed hashes, i.e.
  the test outcome is a fixed function of the implementation.
- IVF: an exact duplicate vector lands in the SAME cell as its twin and
  the query always probes its own cell, so the twin must surface at
  rank 1 with cosine 1.0.

Reference analogue: the differential-oracle discipline of
/root/reference/tests/utils.py:8-59 applied to operators whose output a
row-count check cannot validate.
"""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from dask_grblas_spark.functions import dedup, similarity


def _words(seed: int, n: int) -> list[str]:
    # deterministic pseudo-words, no RNG state shared with the engine
    return [f"w{(seed * 7919 + i * 104729) % 99991}" for i in range(n)]


@pytest.fixture(scope="module")
def corpus(spark):
    """60 distinct docs + planted exact dup + planted near-dups."""
    docs = {i: " ".join(_words(i, 50)) for i in range(60)}
    base = _words(1000, 50)
    docs[100] = " ".join(base)
    docs[101] = " ".join(base)                       # exact dup of 100
    near = list(base)
    near[25] = "CHANGED"                             # 1 token -> J ~ 0.94
    docs[102] = " ".join(near)
    rows = [(i, t) for i, t in sorted(docs.items())]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_lsh_finds_planted_dups(spark, corpus):
    got = dedup.minhash_lsh_pairs(corpus, threshold=0.8, bands=16).collect()
    pairs = {(r.id_a, r.id_b): r.jaccard for r in got}
    assert pairs.get((100, 101)) == 1.0
    assert (100, 102) in pairs and pairs[(100, 102)] >= 0.8
    assert (101, 102) in pairs
    # precision is exact by construction: every reported pair is verified
    assert all(j >= 0.8 for j in pairs.values())
    # none of the unrelated docs should reach the threshold
    assert all(a >= 100 and b >= 100 for (a, b) in pairs)


def test_simhash_banding_is_exhaustive_within_bound(spark, corpus):
    """Deterministic recall guarantee: pipeline output == brute force."""
    max_h = 3

    def ham(x, y):
        # signatures are signed 64-bit longs; mask to two's complement
        return bin((x ^ y) & ((1 << 64) - 1)).count("1")

    sigs = {r.id: r.simhash for r in dedup.simhash(corpus).collect()}
    want = set()
    for a, b in itertools.combinations(sorted(sigs), 2):
        if ham(sigs[a], sigs[b]) <= max_h:
            want.add((a, b))
    got = {(r.id_a, r.id_b): r.hamming
           for r in dedup.simhash_pairs(corpus, max_hamming=max_h).collect()}
    assert set(got) == want
    # the planted exact dup has identical tokens -> identical simhash
    assert got.get((100, 101)) == 0
    for (a, b), h in got.items():
        assert h == ham(sigs[a], sigs[b]) <= max_h


def test_ivf_exact_duplicate_always_recalled(spark):
    """A cloned vector shares its twin's cell; nprobe >= 1 probes the
    query's own cell, so the twin must be the rank-1 neighbor."""
    dim = 16
    rows = []
    for i in range(40):
        rows.append((i, [float((i * 31 + j * 17 + i * j) % 997 - 498)
                         for j in range(dim)]))
    rows.append((900, list(rows[7][1])))  # exact clone of vec 7
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = similarity.ivf_topk(df, k=3, n_cells=8, nprobe=2)
    top = {r.query_id: (r.neighbor_id, r.cosine)
           for r in got.filter(F.col("rank") == 1).collect()}
    assert top[900] == (7, 1.0)
    assert top[7] == (900, 1.0)


def test_hyperplane_lsh_identical_vectors_always_candidates(spark):
    dim = 16
    rows = [(i, [float((i * 13 + j * 7) % 19 - 9) for j in range(dim)])
            for i in range(30)]
    rows.append((500, list(rows[3][1])))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = similarity.hyperplane_lsh_pairs(df, threshold=0.999, dim=dim)
    pairs = {(r.id_a, r.id_b) for r in got.collect()}
    assert (3, 500) in pairs


def test_hyperplane_hot_bucket_star_cap(spark):
    """Skew guard on the sign-LSH (table, bucket) self-join — the exact
    failure mode the minhash/simhash caps close: 30 identical embeddings
    (the near-dup workload) collapse every table's bucket cell to one
    hot key. With max_bucket_size=10 the cell expands as a STAR around
    its min id (29 pairs, transitively connected, all exact-cosine
    verified at 1.0) instead of C(30,2)=435 all-pairs; normal-size cells
    keep all-pairs semantics; uncapped mode still returns the full
    quadratic set."""
    dim = 16
    base = [float((j * 7) % 11 - 5) for j in range(dim)]
    rows = [(i, list(base)) for i in range(30)]
    other = [float((j * 5 + 3) % 13 - 6) for j in range(dim)]
    rows += [(100, list(other)), (101, list(other))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    capped = similarity.hyperplane_lsh_pairs(df, threshold=0.999, dim=dim,
                                             max_bucket_size=10).collect()
    got = {(r.id_a, r.id_b) for r in capped}
    hot = {p for p in got if p[1] < 100}
    assert hot == {(0, i) for i in range(1, 30)}
    assert all(r.cosine == 1.0 for r in capped)
    assert (100, 101) in got
    full = similarity.hyperplane_lsh_pairs(df, threshold=0.999, dim=dim,
                                           max_bucket_size=None).collect()
    assert len({(r.id_a, r.id_b) for r in full if r.id_a < 100}) == 435


def test_minhash_hot_bucket_star_cap(spark):
    """Skew guard: 30 identical docs form one hot band bucket. With
    max_bucket_size=10 the bucket must expand as a STAR (linear rows,
    every member joined to the min id) instead of all-pairs — the pair
    list shrinks from C(30,2)=435 to 29 — while every member stays
    TRANSITIVELY connected for clustering, and normal-size buckets keep
    exact all-pairs semantics."""
    boiler = " ".join(_words(123, 40))
    pair_a = " ".join(_words(55, 40))
    docs = ([(i, boiler) for i in range(30)]
            + [(100, pair_a), (101, pair_a)])
    df = spark.createDataFrame(docs, "doc_id long, text string")

    capped = dedup.minhash_lsh_pairs(df, threshold=0.8,
                                     max_bucket_size=10).collect()
    got = {(r.id_a, r.id_b) for r in capped}
    # hot bucket -> star around min id 0: exactly 29 pairs, all (0, x)
    hot = {p for p in got if p[1] < 100}
    assert hot == {(0, i) for i in range(1, 30)}
    # transitive connectivity: every boilerplate doc reachable from 0
    assert {b for _, b in hot} == set(range(1, 30))
    # the normal-size bucket keeps its all-pairs edge
    assert (100, 101) in got
    # uncapped contrast: full quadratic pair set for the hot bucket
    full = dedup.minhash_lsh_pairs(df, threshold=0.8).collect()
    assert len({(r.id_a, r.id_b) for r in full if r.id_a < 100}) == 435


def test_simhash_hot_bucket_star_cap(spark):
    """Same skew guard on the simhash (band, chunk) join: 25 identical
    docs collapse to a 24-edge star under the cap, stay transitively
    connected, and the exact hamming verification still applies."""
    boiler = " ".join(_words(321, 40))
    docs = [(i, boiler) for i in range(25)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    capped = dedup.simhash_pairs(df, max_hamming=3,
                                 max_bucket_size=8).collect()
    got = {(r.id_a, r.id_b) for r in capped}
    assert got == {(0, i) for i in range(1, 25)}
    assert all(r.hamming == 0 for r in capped)
    full = dedup.simhash_pairs(df, max_hamming=3).collect()
    assert len(full) == 300  # C(25,2)


def test_minhash_between_cross_only_and_cap(spark):
    """minhash_lsh_pairs_between: planted near-dup across the split is
    found; corpus-internal near-dups never pair; a tiny cap restricts
    each band bucket to its smallest corpus ids."""
    from dask_grblas_spark.functions.dedup import minhash_lsh_pairs_between

    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, base + " tail one"),          # new batch
        (100, base + " tail two"),        # corpus near-dup of 1 AND 101
        (101, base + " tail three"),      # corpus near-dup of 100
        (200, "completely different words nothing shared here at all ok"),
    ]
    doc = spark.createDataFrame(rows, "doc_id long, text string")
    newb = doc.filter("doc_id < 100")
    corpus = doc.filter("doc_id >= 100")
    got = minhash_lsh_pairs_between(newb, corpus, n=3, num_hashes=32,
                                    bands=16, threshold=0.5).collect()
    pairs = {(r["id_new"], r["id_corpus"]) for r in got}
    assert (1, 100) in pairs and (1, 101) in pairs
    # corpus-internal pair (100, 101) must NOT appear in any orientation
    assert all(p[0] == 1 for p in pairs)
    # cap=1: each band bucket keeps only its smallest corpus id; the
    # pair set can only shrink and every survivor is still exact-verified
    capped = minhash_lsh_pairs_between(newb, corpus, n=3, num_hashes=32,
                                       bands=16, threshold=0.5,
                                       max_bucket_size=1).collect()
    capped_pairs = {(r["id_new"], r["id_corpus"]) for r in capped}
    assert capped_pairs <= pairs and (1, 100) in capped_pairs


def test_semantic_dedup_pairs_identical_twins(spark):
    """SemDeDup: identical vectors produce identical rounded distances
    and the same argmin tie-break, so they ALWAYS share a cluster and
    the pair must surface with cosine 1.0. Vectors in well-separated
    directions must not pair at a high threshold."""
    dim = 8
    rows = [(i, [float((i * 13 + j * 7) % 19 - 9) for j in range(dim)])
            for i in range(20)]
    rows.append((500, list(rows[3][1])))  # exact twin of vec 3
    rows.append((600, [0.0] * dim))       # norm-zero: must be dropped
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = similarity.semantic_dedup_pairs(df, threshold=0.999, k=4, iters=2)
    rows_out = got.collect()
    pairs = {(r.id_a, r.id_b) for r in rows_out}
    assert (3, 500) in pairs
    assert all(r.cosine >= 0.999 for r in rows_out)
    assert all(600 not in (r.id_a, r.id_b) for r in rows_out)


def test_semantic_dedup_hot_cluster_star_cap(spark):
    """Skew guard on the within-cluster self-join: 30 identical
    embeddings collapse into one cluster; with max_cluster_size=10 the
    cluster expands as a STAR around its min id (29 verified pairs)
    instead of C(30,2)=435; uncapped mode returns the quadratic set."""
    dim = 8
    base = [float((j * 7) % 11 - 5) for j in range(dim)]
    rows = [(i, list(base)) for i in range(30)]
    other = [float(-x) for x in base]
    rows += [(100, list(other)), (101, list(other))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    capped = similarity.semantic_dedup_pairs(
        df, threshold=0.999, k=2, iters=2, max_cluster_size=10).collect()
    hot = {(r.id_a, r.id_b) for r in capped if r.id_b < 100}
    assert hot == {(0, i) for i in range(1, 30)}
    assert all(r.cosine == 1.0 for r in capped)
    assert (100, 101) in {(r.id_a, r.id_b) for r in capped}
    full = similarity.semantic_dedup_pairs(
        df, threshold=0.999, k=2, iters=2, max_cluster_size=None).collect()
    assert len({(r.id_a, r.id_b) for r in full if r.id_b < 100}) == 435


def test_dedup_spans_keep_first_and_reconstruct(spark):
    from dask_grblas_spark.functions.dedup import dedup_spans

    docs = spark.createDataFrame(
        [(1, "a b c d e"),        # holds the FIRST "a b c"
         (2, "x a b c y"),        # duplicate occurrence -> positions 1-3 go
         (3, "p q r p q r"),      # self-repeat: second occurrence deleted
         (4, "u v")],             # shorter than n: intact
        "doc_id long, text string")
    got = {r.doc_id: (r.n_tokens, r.n_dropped, r.cleaned)
           for r in dedup_spans(docs, n=3).collect()}
    assert got[1] == (5, 0, "a b c d e")
    assert got[2] == (5, 3, "x y")
    assert got[3] == (6, 3, "p q r")
    assert got[4] == (2, 0, "u v")


def test_dedup_spans_fully_deleted_doc(spark):
    from dask_grblas_spark.functions.dedup import dedup_spans

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c")], "doc_id long, text string")
    got = {r.doc_id: (r.n_dropped, r.cleaned)
           for r in dedup_spans(docs, n=3).collect()}
    assert got[1] == (0, "a b c")
    assert got[2] == (3, "")


def test_canonicalize_picks_quality_then_min_id(spark):
    from dask_grblas_spark.functions.dedup import canonicalize_clusters

    df = spark.createDataFrame(
        [(1, 10, 0.5), (1, 11, 0.9), (1, 12, 0.9),   # best q ties: min id
         (2, 20, 0.1)],
        "cluster long, doc_id long, quality double")
    got = {r.cluster: (r.rep_id, r.n_members, r.best_quality)
           for r in canonicalize_clusters(df).collect()}
    assert got[1] == (11, 3, 0.9)
    assert got[2] == (20, 1, 0.1)


def test_fuzzy_pairs_length_blocking_complete(spark):
    from dask_grblas_spark.functions.dedup import fuzzy_pairs

    words = ["spark", "spork", "sprk", "join", "joins", "zebra",
             "x" * 65]  # over max_len: excluded
    df = spark.createDataFrame([(w, w) for w in words],
                               "wid string, w string")
    got = {(r.id_a, r.id_b): r.dist
           for r in fuzzy_pairs(df, id_col="wid", text_col="w",
                                max_dist=2).collect()}
    assert got[("spark", "spork")] == 1
    assert got[("spark", "sprk")] == 1     # shorter joins longer's band
    assert got[("spork", "sprk")] == 1
    assert got[("join", "joins")] == 1
    assert all("zebra" not in p for p in got)
    assert all("x" * 65 not in p for p in got)


def test_prefix_jaccard_equals_uncapped_inverted_index(spark):
    """Prefix filtering is EXACT: same result set as the full
    inverted-index join at the same threshold."""
    docs = []
    words = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta"]
    for i in range(30):
        toks = [words[(i * 3 + j * j) % len(words)] for j in range(12)]
        if i % 5 == 0:
            toks = toks[:10] + ["near", "dup"]
        docs.append((i, " ".join(toks)))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    want = sorted(map(tuple, dedup.ngram_jaccard_pairs(
        df, n=3, threshold=0.5, max_doc_freq=None)
        .select("id_a", "id_b", "jaccard").collect()))
    got = sorted(map(tuple, dedup.prefix_jaccard_pairs(
        df, n=3, threshold=0.5)
        .select("id_a", "id_b", "jaccard").collect()))
    assert got == want and len(got) > 0


def test_prefix_jaccard_identical_docs(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e f"), (3, "x y z w q r")],
        "doc_id long, text string")
    got = dedup.prefix_jaccard_pairs(df, n=2, threshold=0.9).collect()
    assert [(r.id_a, r.id_b, r.jaccard) for r in got] == [(1, 2, 1.0)]


def test_prefix_jaccard_identical_cluster_collapse(spark):
    """An identical-doc cluster collapses to one representative before
    the prefix join and re-expands exactly: all within-cluster pairs at
    jaccard 1, every cross pair (cluster member x near-dup) present,
    nothing duplicated (the round-6 verdict guard)."""
    near = "a b c d e f g h i j k X"
    rows = [(i, "a b c d e f g h i j k l") for i in range(6)]
    rows += [(10, near), (20, "p q r s t u v w x y z zz")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted((r.id_a, r.id_b, r.jaccard)
                 for r in dedup.prefix_jaccard_pairs(
                     df, n=2, threshold=0.5).collect())
    want = sorted(map(tuple, dedup.ngram_jaccard_pairs(
        df, n=2, threshold=0.5, max_doc_freq=None)
        .select("id_a", "id_b", "jaccard").collect()))
    assert got == want
    # the 6-clique at jaccard 1 plus each member's pair with the near-dup
    assert sum(1 for a, b, j in got if j == 1.0) == 15
    assert sum(1 for a, b, j in got if b == 10) == 6
    assert len(got) == len(set((a, b) for a, b, _ in got))


def test_hyperplane_between_pairs_cross_side_only(spark):
    """Near-identical planted pairs split across new/corpus sides are
    found; same-side duplicates must NOT pair."""
    import numpy as np

    rng = np.random.RandomState(7)
    base = rng.randn(20, 64).astype("float64")
    rows = []
    for i, v in enumerate(base):
        rows.append((i * 10, [float(x) for x in v]))          # new side
        rows.append((i * 10 + 1, [float(x) for x in v]))      # corpus twin
        rows.append((i * 10 + 3, [float(x) for x in rng.randn(64)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    newb = df.filter(F.col("vec_id") % 10 == 0)
    corpus = df.filter(F.col("vec_id") % 10 != 0)
    got = similarity.hyperplane_lsh_pairs_between(
        newb, corpus, threshold=0.99).collect()
    found = {(r.id_a, r.id_b) for r in got}
    # every planted twin pair is cross-side and must be found
    assert {(i * 10, i * 10 + 1) for i in range(20)} <= found
    # ids on the new side never appear as id_b
    assert all(r.id_b % 10 != 0 for r in got)


def test_hyperplane_between_corpus_cap_star_bound(spark):
    """A template bucket of 50 corpus vectors with cap=5: each new probe
    verifies against at most 5 corpus members per table."""
    import numpy as np

    v = [float(x) for x in np.random.RandomState(3).randn(64)]
    rows = [(0, v)] + [(i * 10 + 1, v) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = similarity.hyperplane_lsh_pairs_between(
        df.filter(F.col("vec_id") == 0),
        df.filter(F.col("vec_id") != 0),
        threshold=0.99, max_bucket_size=5).collect()
    # identical vectors share every bucket; distinct pairs <= cap
    assert 1 <= len(got) <= 5


def test_containment_pairs_substring_doc(spark):
    from dask_grblas_spark.functions.dedup import containment_pairs

    small = "w1 w2 w3 w4"                      # 2 3-gram shingles
    big = small + " w5 w6 w7 w8"               # contains all of small's
    df = spark.createDataFrame([(1, small), (2, big), (3, "x y z q")],
                               "doc_id long, text string")
    got = {(r["id_sub"], r["id_super"]): r["containment"]
           for r in containment_pairs(df, threshold=0.3).collect()}
    assert got[(1, 2)] == 1.0          # small fully contained in big
    assert got[(2, 1)] == round(2 / 6, 6)  # big only 2/6 contained
    assert not any(3 in k for k in got)


def test_golden_record_prefers_longest_then_lowest_id(spark):
    from dask_grblas_spark.functions.dedup import golden_record

    df = spark.createDataFrame(
        [(1, "c1", 10), (2, "c1", 30), (3, "c1", 30), (9, "c2", 5)],
        "doc_id long, cluster string, n_chars long")
    got = {r["cluster"]: r for r in golden_record(df).collect()}
    assert got["c1"]["id"] == 2       # 30 ties -> lowest id wins
    assert got["c1"]["prefer"] == 30.0
    assert got["c1"]["cluster_size"] == 3
    assert got["c2"]["id"] == 9 and got["c2"]["cluster_size"] == 1


def test_threshold_sweep_monotone_counts(spark):
    from dask_grblas_spark.functions.dedup import threshold_sweep

    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d e"),      # jaccard 1.0
         (3, "a b c d zz"), (4, "q w e r t")],    # 3 vs 1/2: partial
        "doc_id long, text string")
    got = {r["thr"]: r["n_pairs"]
           for r in threshold_sweep(df, thresholds=(0.2, 0.6, 0.8),
                                    max_doc_freq=None).collect()}
    assert got[0.8] >= 1                  # the exact pair
    assert got[0.2] >= got[0.6] >= got[0.8]   # cumulative, monotone


def test_dedup_funnel_stage_counts(spark):
    """6 docs: two byte-identical, one case-variant of another, one
    junk (fails quality), plus two distinct good ones -> raw 6,
    exact 5, normalized 4, quality = normalized reps passing 0.5."""
    from dask_grblas_spark.functions.dedup import dedup_funnel

    good = ("the quick brown fox jumps over a lazy dog and runs to "
            "the hills of the north every day")
    docs = [(1, good), (2, good),                  # exact dup
            (3, good.upper()),                     # normalized dup of 1
            (4, "x y"),                            # too short -> low q
            (5, good + " second variant of text"),
            (6, "a completely different story about the sea and the "
                "ships of the old world sailing to the east")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.stage: r.n_docs for r in dedup_funnel(df).collect()}
    assert got["1_raw"] == 6
    assert got["2_exact"] == 5
    assert got["3_normalized"] == 4
    assert got["4_quality"] == 3  # reps 1, 5, 6 pass; 4 fails


def test_dedup_funnel_empty(spark):
    from dask_grblas_spark.functions.dedup import dedup_funnel

    df = spark.createDataFrame([], "doc_id long, text string")
    got = {r.stage: r.n_docs for r in dedup_funnel(df).collect()}
    assert got == {"1_raw": 0, "2_exact": 0, "3_normalized": 0,
                   "4_quality": 0}


def test_minhash_estimate_pairs_calibration(spark):
    """Identical docs estimate exactly 1.0 with error 0; a shared-half
    pair's estimate lands within the 32-hash binomial band of the
    exact jaccard."""
    from dask_grblas_spark.functions.dedup import minhash_estimate_pairs

    base = " ".join(f"tok{i}" for i in range(40))
    half = " ".join(f"tok{i}" for i in range(20)) + " " + \
        " ".join(f"zzz{i}" for i in range(20))
    df = spark.createDataFrame(
        [(1, base), (2, base), (3, half)],
        "doc_id long, text string")
    got = {(r.id_a, r.id_b): r for r in
           minhash_estimate_pairs(df).collect()}
    assert got[(1, 2)].est == 1.0 and got[(1, 2)].jaccard == 1.0
    assert got[(1, 2)].abs_err == 0.0
    for pair in ((1, 3), (2, 3)):
        if pair in got:
            r = got[pair]
            assert abs(r.est - r.jaccard) <= 0.35  # ~4 sd at 32 hashes
            assert r.abs_err == round(abs(r.est - r.jaccard), 6)

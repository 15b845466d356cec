"""Chunking / sequence-packing / perplexity tests."""

import math

import pytest

from dask_grblas_spark.functions.packing import (chunk_documents,
                                                 pack_sequences)
from dask_grblas_spark.functions.text import unigram_logprob


def test_chunking_sliding_windows(spark):
    words = [f"w{i}" for i in range(300)]
    df = spark.createDataFrame([(1, " ".join(words))],
                               "doc_id long, text string")
    rows = sorted(chunk_documents(df, chunk_tokens=128, overlap=16)
                  .collect(), key=lambda r: r["chunk_id"])
    # step=112: starts 0, 112, 224 -> 3 chunks; last is partial (76)
    assert [r["chunk_id"] for r in rows] == [0, 1, 2]
    assert [r["n_tokens"] for r in rows] == [128, 128, 76]
    assert rows[0]["chunk_text"].split() == words[0:128]
    assert rows[1]["chunk_text"].split() == words[112:240]
    assert rows[2]["chunk_text"].split() == words[224:300]
    # overlap: last 16 tokens of chunk 0 == first 16 of chunk 1
    assert rows[0]["chunk_text"].split()[-16:] \
        == rows[1]["chunk_text"].split()[:16]


def test_chunking_short_and_empty_docs(spark):
    df = spark.createDataFrame([(1, "a b c"), (2, " ")],
                               "doc_id long, text string")
    rows = {(r["doc_id"], r["chunk_id"]): r
            for r in chunk_documents(df, 128, 16).collect()}
    assert rows[(1, 0)]["n_tokens"] == 3
    assert rows[(2, 0)]["n_tokens"] == 0
    assert rows[(2, 0)]["chunk_text"] == ""
    assert len(rows) == 2


def test_chunking_rejects_bad_overlap(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=10, overlap=10)


def test_packing_greedy_semantics(spark):
    # single shard so the walk order is just doc_id
    docs = [(i, " ".join(["t"] * n))
            for i, n in enumerate([100, 100, 100, 250, 300, 50])]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = {r["doc_id"]: r
            for r in pack_sequences(df, budget=256, n_shards=1).collect()}
    # walk: 100(+100=200)(+100 would be 300>256 -> new pack)
    assert (rows[0]["pack_id"], rows[0]["pack_pos"]) == (0, 0)
    assert (rows[1]["pack_id"], rows[1]["pack_pos"]) == (0, 1)
    assert (rows[2]["pack_id"], rows[2]["pack_pos"]) == (1, 0)
    # 100+250>256 -> doc3 starts pack 2; doc4 (300>budget) overflows ->
    # its own pack 3; doc5 starts pack 4
    assert (rows[3]["pack_id"], rows[3]["pack_pos"]) == (2, 0)
    assert (rows[4]["pack_id"], rows[4]["pack_pos"]) == (3, 0)
    assert (rows[5]["pack_id"], rows[5]["pack_pos"]) == (4, 0)
    # every pack except oversize ones fits the budget
    assert rows[0]["tok_len"] + rows[1]["tok_len"] <= 256


def test_packing_sharded_and_deterministic(spark):
    docs = [(i, " ".join(["t"] * (10 + i % 40))) for i in range(200)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    a = sorted(map(tuple, pack_sequences(df, budget=128,
                                         n_shards=4).collect()))
    b = sorted(map(tuple, pack_sequences(df, budget=128,
                                         n_shards=4).collect()))
    assert a == b
    assert len(a) == 200
    shards = {t[1] for t in a}
    assert shards <= set(range(4)) and len(shards) > 1
    # budget respected within every (shard, pack) of in-budget docs
    sums = {}
    for doc_id, shard, pack_id, pack_pos, tok_len in a:
        sums.setdefault((shard, pack_id), 0)
        sums[(shard, pack_id)] += tok_len
    assert all(v <= 128 for v in sums.values())


def test_unigram_logprob_hand_check(spark):
    df = spark.createDataFrame([(1, "a a b"), (2, "b c")],
                               "doc_id long, text string")
    out = {r["doc_id"]: r for r in unigram_logprob(df).collect()}
    # corpus: a=2, b=2, c=1, total=5
    nll = lambda f: -math.log(f / 5)
    exp1 = (2 * nll(2) + nll(2)) / 3
    exp2 = (nll(2) + nll(1)) / 2
    assert out[1]["avg_nll"] == pytest.approx(round(exp1, 6), abs=1e-6)
    assert out[2]["avg_nll"] == pytest.approx(round(exp2, 6), abs=1e-6)
    assert out[1]["n_tokens"] == 3 and out[2]["n_tokens"] == 2


def test_corpus_profile(spark):
    from dask_grblas_spark.functions.text import corpus_profile

    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a a"), (3, "x y z w q")],
        "doc_id long, text string")
    r = corpus_profile(df).collect()[0]
    assert r["n_docs"] == 3 and r["total_tokens"] == 10
    assert r["vocab_size"] == 8  # a b c x y z w q
    assert r["p50_tokens"] == pytest.approx(3.0)
    assert r["avg_tokens"] == pytest.approx(round(10 / 3, 6))


def test_bigram_logprob_hand_check(spark):
    """Two tiny docs; model counts computed by hand (k=0.5).

    Corpus: 'a b a b' and 'b a'. Bigrams: (a,b)x2, (b,a)x2. Contexts:
    c(a)=2, c(b)=2. V=2. P(b|a)=(2+.5)/(2+1)=5/6; P(a|b)=5/6 too."""
    import math

    from dask_grblas_spark.functions.text import bigram_logprob

    df = spark.createDataFrame([(1, "a b a b"), (2, "b a")],
                               "doc_id long, text string")
    got = {r.doc_id: (r.n_bigrams, r.avg_lp)
           for r in bigram_logprob(df).collect()}
    lp = round(math.log(5.0 / 6.0), 6)
    assert got == {1: (3, lp), 2: (1, lp)}


def test_bigram_logprob_single_token_doc_drops(spark):
    from dask_grblas_spark.functions.text import bigram_logprob

    df = spark.createDataFrame([(1, "only"), (2, "two words")],
                               "doc_id long, text string")
    assert [r.doc_id for r in bigram_logprob(df).collect()] == [2]


def test_cluster_terms_separates_vocabulary(spark):
    from dask_grblas_spark.functions.text import cluster_terms

    rows = [(0, "apple banana apple"), (0, "apple cherry"),
            (1, "dog cat dog"), (1, "dog bird")]
    df = spark.createDataFrame(rows, "label int, text string")
    got = cluster_terms(df, "label", top_n=2).collect()
    top = {(r.cluster, r.rank): r.term for r in got}
    assert top[(0, 1)] == "apple" and top[(1, 1)] == "dog"
    # terms never leak across clusters (disjoint vocabularies here)
    assert all((r.term in {"apple", "banana", "cherry"}) == (r.cluster == 0)
               for r in got)

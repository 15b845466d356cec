"""Round-6 extension operators: distinct sketches (HLL/KMV), weighted
sampling, sub-document duplicate coverage, bloom decontamination, Zipf
fit. Strategy mirrors the rest of the suite: deterministic md5
arithmetic is replayed in plain Python where exactness is claimed;
statistical properties get tolerance assertions."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from dask_grblas_spark.functions import dedup, retrieval, sampling, sketches
from dask_grblas_spark.functions import text as text_fns


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, "
                                       "source string, n_chars long")


def test_hll_estimate_tracks_exact(spark):
    # ~2000 distinct tokens per source via synthetic vocab
    rows = []
    for s in range(3):
        for d in range(40):
            toks = [f"w{s}_{(d * 53 + i) % 700}" for i in range(120)]
            rows.append((s * 100 + d, " ".join(toks), f"s{s}", 1))
    got = {r.grp: r for r in
           sketches.hll_distinct(_docs(spark, rows)).collect()}
    assert set(got) == {"s0", "s1", "s2"}
    for r in got.values():
        assert r.exact == 700
        # HLL with m=256 registers: standard error ~1.04/sqrt(256) = 6.5%
        assert abs(r.est - r.exact) / r.exact < 0.2


def test_hll_small_range_linear_counting(spark):
    rows = [(i, "alpha beta gamma delta", "s0", 1) for i in range(5)]
    r = sketches.hll_distinct(_docs(spark, rows)).collect()[0]
    assert r.exact == 4
    # linear-counting regime: tiny cardinality estimated near-exactly
    assert abs(r.est - 4.0) < 0.1


def test_kmv_exact_below_k_and_estimates_above(spark):
    rows = []
    for s in range(2):
        for d in range(30):
            toks = [f"v{s}_{(d * 37 + i) % 500}" for i in range(100)]
            rows.append((s * 100 + d, " ".join(toks), f"s{s}", 1))
    got = {r.grp: r for r in
           sketches.kmv_distinct(_docs(spark, rows), k=64).collect()}
    assert set(got) == {"s0", "s1", "__union__"}
    # exact replay: the sketch is a pure function of the md5 hashes, so
    # the estimate must EQUAL (k-1) * 2^60 / (k-th smallest hash)
    per = {g: sorted(_h60(f"kmv:v{s}_{v}") for v in range(500))
           for g, s in (("s0", 0), ("s1", 1))}
    union = sorted(per["s0"] + per["s1"])
    for g in ("s0", "s1"):
        assert got[g].n_kept == 64
        want = 63 * float(1 << 60) / per[g][63]
        assert got[g].est == pytest.approx(round(want, 4), abs=1e-4)
    want_u = 63 * float(1 << 60) / union[63]
    assert got["__union__"].est == pytest.approx(round(want_u, 4), abs=1e-4)
    # the estimator is unbiased around the true union (loose sanity:
    # this fixed draw happens to sit ~3 se high at k=64; at k=256 the
    # same hashes estimate 996.4 of 1000)
    assert 500 < got["__union__"].est < 2000
    # below-k group returns the exact distinct count
    small = [(0, "a b c d e", "tiny", 1)]
    r = sketches.kmv_distinct(_docs(spark, small), k=64).collect()
    assert all(x.n_kept == 5 and x.est == 5.0 for x in r)


def test_weighted_sample_matches_python_replay(spark):
    rows = [(i, "x", "s", (i % 7) * 100 + 10) for i in range(200)]
    got = sampling.weighted_sample(_docs(spark, rows), "n_chars",
                                   k=10).collect()
    keys = {}
    for i in range(200):
        w = (i % 7) * 100 + 10
        u = (_h60(f"ws42:{i}") + 1) / float(1 << 60)
        keys[i] = -math.log(u) / w
    want = sorted(keys, key=lambda i: (keys[i], i))[:10]
    assert [r.id for r in got] == want
    assert [r.rank for r in got] == list(range(1, 11))
    for r in got:
        assert r.key == pytest.approx(round(keys[r.id], 9), abs=1e-9)


def test_weighted_sample_zero_weight_excluded(spark):
    rows = [(1, "x", "s", 0), (2, "x", "s", 5), (3, "x", "s", 7)]
    got = sampling.weighted_sample(_docs(spark, rows), "n_chars",
                                   k=10).collect()
    assert {r.id for r in got} == {2, 3}


def test_dup_ngram_coverage(spark):
    boiler = " ".join(f"b{i}" for i in range(12))
    uniq = " ".join(f"u{i}" for i in range(12))
    rows = [(1, boiler, "s", 1), (2, boiler, "s", 1),
            (3, uniq, "s", 1), (4, "short text", "s", 1),
            (5, "short text", "s", 1)]
    got = {r.id: r for r in dedup.dup_ngram_coverage(
        _docs(spark, rows), n=8).collect()}
    # identical 12-token docs: every 8-gram shared
    assert got[1].n_grams == 5 and got[1].dup_frac == 1.0
    assert got[2].dup_frac == 1.0
    assert got[3].n_grams == 5 and got[3].n_dup == 0 \
        and got[3].dup_frac == 0.0
    # sub-n docs hash their whole text as one gram; 4 and 5 share it
    assert got[4].n_grams == 1 and got[4].dup_frac == 1.0


def test_bloom_decontaminate_no_false_negatives(spark):
    base = " ".join(f"t{i}" for i in range(30))
    rows = [(1, base, "s", 1),
            (2, base + " trailing extra tokens here", "s", 1),
            (3, " ".join(f"z{i}" for i in range(30)), "s", 1)]
    got = {r.doc_id: r for r in retrieval.bloom_decontaminate(
        _docs(spark, rows), [base], n=13).collect()}
    # the benchmark doc and its superset MUST flag (no false negatives)
    assert got[1].contaminated and got[2].contaminated
    assert got[1].n_hits == got[1].n_grams
    assert got[3].n_grams > 0


def test_bloom_subset_of_exact_plus_fp(spark):
    """Bloom hits are a superset of exact-gram hits (one-sided error)."""
    rows = [(i, " ".join(f"w{(i * 13 + j) % 40}" for j in range(25)),
             "s", 1) for i in range(40)]
    docs = _docs(spark, rows)
    bench = [r.text for r in docs.filter("doc_id = 5").collect()]
    exact = {r.doc_id for r in retrieval.ngram_decontaminate(
        docs, bench, n=13).collect() if r.contaminated}
    bloom = {r.doc_id for r in retrieval.bloom_decontaminate(
        docs, bench, n=13).collect() if r.contaminated}
    assert exact <= bloom


def test_zipf_slope_exact_fit(spark):
    # construct a corpus whose token frequencies are exactly freq(r) =
    # 2^(10-r): ln freq = 10 ln 2 - r-th... use rank-determined freqs and
    # verify against a NumPy-free closed-form replay
    toks = []
    freqs = {}
    for r in range(1, 9):
        f_r = 2 ** (9 - r)
        freqs[f"tok{r:02d}"] = f_r
        toks += [f"tok{r:02d}"] * f_r
    rows = [(1, " ".join(toks), "s0", 1)]
    got = text_fns.zipf_slope(_docs(spark, rows), top_r=100).collect()[0]
    xs = [math.log(r) for r in range(1, 9)]
    ys = [math.log(freqs[t]) for t in sorted(freqs)]
    n = float(len(xs))
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    assert got.n_terms == 8
    assert got.slope == pytest.approx(round(slope, 6), abs=2e-6)
    assert got.intercept == pytest.approx(round(intercept, 6), abs=2e-6)


def test_countmin_overestimates_and_hits_exact(spark):
    rows = [(i, "x", "s", 1) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, text string, "
                                     "source string, n_chars long")
    ev = df.select((F.col("doc_id") % 10).alias("uid"))
    got = {r.key: r for r in sketches.countmin_counts(
        ev, "uid", [str(k) for k in range(12)]).collect()}
    assert set(got) == {str(k) for k in range(12)}
    for k in range(10):
        r = got[str(k)]
        assert r.exact == 100
        assert r.est >= r.exact  # CMS one-sided error
    # absent keys: exact 0, est = collision mass only (>= 0)
    assert got["10"].exact == 0 and got["10"].est >= 0
    # w=1024 with 10 distinct keys: collisions are essentially
    # impossible, so the estimates are exact here
    assert all(got[str(k)].est == 100 for k in range(10))


def test_hll_rollup_merge_equals_direct(spark):
    import datetime

    base = datetime.datetime(2024, 1, 1)
    rows = []
    for d in range(3):
        for h in range(6):
            for u in range(40):
                rows.append((len(rows),
                             base + datetime.timedelta(days=d, hours=h,
                                                       minutes=u),
                             (d * 1000 + h * 40 + u) % 97))
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp, "
                                     "user_id long")
    got = sketches.hll_user_rollup(ev).collect()
    assert len(got) == 3
    for r in got:
        # the merge property: max-merged hourly registers == direct
        # registers, so the estimates are IDENTICAL (not just close)
        assert r.est_merged == r.est_direct
        assert r.exact > 0
        assert abs(r.est_direct - r.exact) / r.exact < 0.25


def test_profile_numeric_with_planted_nulls(spark):
    from dask_grblas_spark.functions import profiling

    rows = [(i, float(i) if i % 5 else None, float(i % 3)) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, a double, b double")
    got = {r.col: r for r in profiling.profile_numeric(
        df, ["a", "b"]).collect()}
    assert got["a"].n_rows == 100 and got["a"].n_null == 20
    assert got["a"].n_distinct == 80
    assert got["a"].min_v == 1.0 and got["a"].max_v == 99.0
    assert got["b"].n_null == 0 and got["b"].n_distinct == 3
    assert got["b"].min_v == 0.0 and got["b"].max_v == 2.0
    # mean over the non-null values
    vals = [float(i) for i in range(100) if i % 5]
    assert got["a"].mean_v == round(sum(vals) / len(vals), 6)


def test_fk_integrity_planted_orphans(spark):
    from dask_grblas_spark.functions import profiling

    child = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 11), (4, 99)], "id long, fk long")
    parent = spark.createDataFrame(
        [(10,), (11,), (12,)], "pk long")
    got = profiling.fk_integrity(
        [("c->p", child, "fk", parent, "pk")]).collect()
    assert len(got) == 1
    r = got[0]
    assert r["check"] == "c->p"
    assert r.n_child == 4
    assert r.n_null_fk == 0
    assert r.n_orphan == 1          # fk=99 has no parent
    assert r.n_childless_parent == 1  # pk=12 has no child


def test_fk_integrity_string_keys_and_null_fks(spark):
    """String keys join natively (the old bigint cast NULLed them all
    out), and NULL FKs count separately — never as orphans."""
    from dask_grblas_spark.functions import profiling

    child = spark.createDataFrame(
        [(1, "US"), (2, "US"), (3, "FR"), (4, "XX"), (5, None)],
        "id long, fk string")
    parent = spark.createDataFrame(
        [("US",), ("FR",), ("DE",), (None,)], "pk string")
    r = profiling.fk_integrity(
        [("c->p", child, "fk", parent, "pk")]).collect()[0]
    assert r.n_child == 5
    assert r.n_null_fk == 1           # the None fk, NOT an orphan
    assert r.n_orphan == 1            # only XX
    assert r.n_childless_parent == 1  # DE (NULL pk excluded)


def test_bpe_train_classic_corpus(spark):
    """The Sennrich toy corpus: low(5) lower(2) newest(6) widest(3) —
    the learned merges must be es, est, lo, low, ew, ewest (greedy,
    corpus-weighted, smallest-pair ties)."""
    words = [w for w, n in (("low", 5), ("lower", 2), ("newest", 6),
                            ("widest", 3)) for _ in range(n)]
    df = spark.createDataFrame(
        [(i, w, "s", 1) for i, w in enumerate(words)],
        "doc_id long, text string, source string, n_chars long")
    got = [(r.step, r.merged, r.cnt)
           for r in text_fns.bpe_train(df, n_merges=6)
           .orderBy("step").collect()]
    assert got == [(1, "<es>", 9), (2, "<est>", 9), (3, "<lo>", 7),
                   (4, "<low>", 7), (5, "<ew>", 6), (6, "<ewest>", 6)]


def test_bpe_train_greedy_overlap_and_guards(spark):
    """'lll' counts the overlapping (l,l) pair twice but merges
    left-to-right non-overlapping (replace semantics); words with
    sentinels or over the length cap are excluded."""
    rows = [(1, "lll", "s", 1), (2, "x<y>", "s", 1),
            (3, "a" * 30, "s", 1)]
    df = spark.createDataFrame(rows, "doc_id long, text string, "
                                     "source string, n_chars long")
    got = text_fns.bpe_train(df, n_merges=2).orderBy("step").collect()
    assert got[0].pair == "<l><l>" and got[0].cnt == 2
    # after merging: '<ll><l>' -> round 2 merges (ll, l)
    assert got[1].pair == "<ll><l>" and got[1].cnt == 1


def test_bpe_train_and_encode_survive_sql_metachars(spark):
    """A corpus token containing an apostrophe (or backslash) can win a
    merge round; the rewrite must apply it literally, not interpolate
    it into SQL text (the round-6 injection finding)."""
    rows = [(i, "don't", "s", 1) for i in range(5)]
    rows += [(99, "a\\'b a\\'b", "s", 1)]
    df = spark.createDataFrame(rows, "doc_id long, text string, "
                                     "source string, n_chars long")
    got = text_fns.bpe_train(df, n_merges=3).orderBy("step").collect()
    # dominant word don't (5x): first merges are within it
    assert got[0].pair in ("<d><o>", "<n><'>", "<o><n>", "<'><t>")
    assert all("'" in r.pair or "\\" in r.pair or r.cnt >= 2
               for r in got)
    # encode with a quoted merge literal applies verbatim
    enc = text_fns.bpe_encode(df, [("<'><t>", "<'t>")]).collect()
    by_w = {r.w: r.enc for r in enc}
    assert by_w["don't"].endswith("<'t>")


# ---------------------------------------------------------------------------
# profiling: correlation / linreg / histogram (q104-q106)
# ---------------------------------------------------------------------------

def test_correlation_matrix_hand_computed(spark):
    from dask_grblas_spark.functions.profiling import correlation_matrix

    # y = 2x (corr 1), z = -x (corr -1 with both), c constant (NULL)
    df = spark.createDataFrame(
        [(1.0, 2.0, -1.0, 5.0), (2.0, 4.0, -2.0, 5.0),
         (3.0, 6.0, -3.0, 5.0)],
        "x double, y double, z double, c double")
    got = {(r.col_a, r.col_b): r["corr"]
           for r in correlation_matrix(df, ["x", "y", "z", "c"]).collect()}
    assert got[("x", "y")] == 1.0
    assert got[("x", "z")] == -1.0
    assert got[("y", "z")] == -1.0
    assert got[("x", "c")] is None and got[("z", "c")] is None


def test_groupwise_linreg_exact_fit(spark):
    from dask_grblas_spark.functions.profiling import groupwise_linreg

    df = spark.createDataFrame(
        [("a", 1.0, 3.0), ("a", 2.0, 5.0), ("a", 3.0, 7.0),  # y = 2x+1
         ("b", 4.0, 9.0), ("b", 4.0, 1.0)],                  # zero x-var
        "k string, x double, y double")
    got = {r.key: (r.n, r.slope, r.intercept)
           for r in groupwise_linreg(df, "k", "x", "y").collect()}
    assert got["a"] == (3, 2.0, 1.0)
    assert got["b"] == (2, None, None)


def test_histogram_edges_and_clamp(spark):
    from dask_grblas_spark.functions.profiling import histogram

    df = spark.createDataFrame(
        [(v,) for v in [-5.0, 0.0, 2.4, 9.9, 10.0, 25.0]],
        "v double")
    got = {r.bin: (r.lo_edge, r.n)
           for r in histogram(df, "v", lo=0.0, hi=10.0, nbins=4).collect()}
    # -5 clamps into bin 0; 10.0 and 25.0 clamp into the last bin
    assert got[0] == (0.0, 3)   # -5, 0, 2.4
    assert got[3] == (7.5, 3)   # 9.9, 10.0, 25.0
    assert 1 not in got and 2 not in got  # empty bins absent


def test_exact_quantiles_order_statistics(spark):
    from dask_grblas_spark.functions.profiling import exact_quantiles

    # 1..100: ceil(p*100)-th smallest = p*100 for exact p
    df = spark.createDataFrame([(float(i),) for i in range(1, 101)],
                               "v double")
    got = {r.p: r.value for r in
           exact_quantiles(df, "v", [0.25, 0.5, 0.99, 1.0],
                           nbins=8).collect()}
    assert got == {0.25: 25.0, 0.5: 50.0, 0.99: 99.0, 1.0: 100.0}


def test_exact_quantiles_constant_and_tiny_p(spark):
    from dask_grblas_spark.functions.profiling import exact_quantiles

    const = spark.createDataFrame([(7.0,)] * 5, "v double")
    got = {r.p: r.value for r in
           exact_quantiles(const, "v", [0.5]).collect()}
    assert got == {0.5: 7.0}
    df = spark.createDataFrame([(float(i),) for i in range(1, 11)],
                               "v double")
    # rank clamps to 1 for p ~ 0
    got = {r.p: r.value for r in
           exact_quantiles(df, "v", [0.001], nbins=4).collect()}
    assert got == {0.001: 1.0}


def test_zscore_outliers_hand_computed(spark):
    from dask_grblas_spark.functions.profiling import zscore_outliers

    # group a: values 0,0,0,0,10 -> mean 2, var_pop 16, sd 4; z(10)=2
    df = spark.createDataFrame(
        [("a", i, v) for i, v in enumerate([0.0, 0.0, 0.0, 0.0, 10.0])]
        + [("b", 9, 5.0), ("b", 10, 5.0)],  # zero variance: no output
        "k string, eid long, v double")
    got = zscore_outliers(df, "k", "v", "eid", threshold=1.5).collect()
    assert {(r.key, r.id, r.z) for r in got} == {("a", 4, 2.0)}


def test_token_js_divergence_identical_and_disjoint(spark):
    from dask_grblas_spark.functions import text as text_fns

    # two groups with IDENTICAL distributions -> js of each vs the
    # corpus blend is 0; a third, fully disjoint group -> large js
    df = spark.createDataFrame(
        [("s1", "x y"), ("s2", "x y"), ("s3", "z w")],
        "source string, text string")
    got = {r["grp"]: r
           for r in text_fns.token_js_divergence(df).collect()}
    import math
    # s1/s2: p = (.5,.5) over {x,y}; q = (1/3,1/3) over {x,y} (+1/6 z,w)
    # -> identical per-token shares, divergence only from the uncovered
    # q mass: contributions where p=1/2, q=1/3
    def js(pq_pairs, qcov):
        s = sum(0.5 * p * math.log(p / ((p + q) / 2))
                + 0.5 * q * math.log(q / ((p + q) / 2))
                for p, q in pq_pairs)
        return round(s + 0.5 * math.log(2) * (1 - qcov), 6)

    assert got["s1"]["js"] == js([(0.5, 1 / 3)] * 2, 2 / 3)
    assert got["s1"]["js"] == got["s2"]["js"]
    assert got["s3"]["js"] == js([(0.5, 1 / 6)] * 2, 1 / 3)
    assert got["s3"]["js"] > got["s1"]["js"]
    assert got["s1"]["n_tokens"] == 2 and got["s1"]["n_terms"] == 2


def test_benford_digit_extraction_and_chi2(spark):
    from dask_grblas_spark.functions.profiling import benford_digits

    df = spark.createDataFrame(
        [(1.00,), (19.99,), (250.0,), (3.5,), (0.0,), (999.99,), (1.01,)],
        "v double")
    rows = {r["digit"]: r for r in benford_digits(df, "v").collect()}
    # cents: 100, 1999, 25000, 350, (0 dropped), 99999, 101
    assert set(rows) == {1, 2, 3, 9}
    assert rows[1]["n"] == 3 and rows[2]["n"] == 1 and rows[9]["n"] == 1
    import math
    t = 6.0
    exp1 = math.log10(2.0)
    assert rows[1]["obs_p"] == round(3 / t, 6)
    assert rows[1]["exp_p"] == round(exp1, 6)
    e = t * exp1
    assert rows[1]["chi2_part"] == round((3 - e) ** 2 / e, 6)


def test_exact_ntile_matches_spark_ntile(spark):
    from pyspark.sql.window import Window as W

    from dask_grblas_spark.functions.profiling import _exact_ntile

    # 23 rows, duplicate metrics, both directions, n not divisible by t
    data = [(i, float((i * 7) % 5)) for i in range(23)]
    df = spark.createDataFrame(data, "key long, v double")
    for asc in (True, False):
        got = _exact_ntile(df, "v", asc, 4, "tile")
        order = F.col("v").asc() if asc else F.col("v").desc()
        ref = df.withColumn(
            "ref", F.ntile(4).over(W.orderBy(order, F.col("key"))))
        joined = got.join(ref, on=["key", "v"]).collect()
        assert len(joined) == 23
        assert all(r["tile"] == r["ref"] for r in joined)


def test_rfm_segments_shape(spark):
    import datetime

    from dask_grblas_spark.functions.profiling import rfm_segments

    rows = [(k, datetime.datetime(2024, 1, 1 + (k * 3) % 20),
             100.0 * (k + 1)) for k in range(8) for _ in range(k % 3 + 1)]
    df = spark.createDataFrame(
        rows, "o_custkey long, o_orderdate timestamp, o_totalprice double")
    out = {r["key"]: r for r in rfm_segments(df).collect()}
    assert len(out) == 8
    # every tile in 1..4, segment is the concatenation
    for r in out.values():
        assert 1 <= r["r"] <= 4 and 1 <= r["f"] <= 4 and 1 <= r["m"] <= 4
        assert r["segment"] == f"{r['r']}{r['f']}{r['m']}"
    # highest spender (key 7 bought 2 orders of 800) is m-tile 1
    assert out[7]["m"] == 1


def test_majority_label_tie_break_and_agreement(spark):
    from dask_grblas_spark.functions.profiling import majority_label

    ann = spark.createDataFrame(
        [(1, 0, "en"), (1, 1, "en"), (1, 2, "de"),
         (2, 0, "fr"), (2, 1, "de"), (2, 2, "es"), (2, 3, "de"),
         (3, 0, "zh"), (3, 1, "en")],  # tie -> 'en' wins lexicographically
        "item long, annotator int, label string")
    got = {r["item"]: r for r in majority_label(ann).collect()}
    assert got[1]["label"] == "en" and got[1]["votes"] == 2
    assert got[1]["n_ann"] == 3 and got[1]["agreement"] == round(2 / 3, 6)
    assert got[2]["label"] == "de" and got[2]["votes"] == 2
    assert got[3]["label"] == "en" and got[3]["votes"] == 1


def test_naive_bayes_separates_vocabularies(spark):
    import math

    from dask_grblas_spark.functions.text import naive_bayes_classify

    df = spark.createDataFrame(
        [(0, "en", "cat cat dog"), (1, "en", "cat dog dog"),
         (2, "de", "katze katze hund"), (3, "de", "hund hund katze")],
        "doc_id long, lang string, text string")
    got = {r["id"]: r for r in naive_bayes_classify(df).collect()}
    assert all(got[i]["pred"] == got[i]["label"] for i in got)
    # hand-check doc 0's winning score: priors ln(1/2); V=4; T_en=6
    # P(cat|en)=(3+1)/(6+4), P(dog|en)=(3+1)/(6+4)
    s = math.log(0.5) + 2 * math.log(4 / 10) + 1 * math.log(4 / 10)
    assert abs(got[0]["score"] - round(s, 6)) < 1e-9


def test_grid_cluster_two_blobs_and_noise(spark):
    from dask_grblas_spark.functions.similarity import grid_cluster

    rows = []
    vid = 0
    for _ in range(15):   # blob A -> cell (0,0)
        rows.append((vid, [0.01, 0.01] + [0.0] * 62)); vid += 1
    for _ in range(12):   # blob B -> cell (10,10), not adjacent to A
        rows.append((vid, [0.52, 0.52] + [0.0] * 62)); vid += 1
    for k in range(3):    # scattered noise, cells below min_pts
        rows.append((vid, [-0.3 - k * 0.1, 0.3] + [0.0] * 62)); vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r["cluster"]: r for r in grid_cluster(df).collect()}
    noise = got.pop(-1)
    assert noise["n_points"] == 3 and noise["n_cells"] == 0
    sizes = sorted(r["n_points"] for r in got.values())
    assert sizes == [12, 15]          # two separate clusters
    assert all(r["n_cells"] == 1 for r in got.values())


def test_classification_report_hand_confusion(spark):
    from dask_grblas_spark.functions.profiling import classification_report

    df = spark.createDataFrame(
        [("a", "a")] * 3 + [("a", "b")] * 1 + [("b", "b")] * 2
        + [("c", "a")] * 1,
        "truth string, pred string")
    got = {r["label"]: r
           for r in classification_report(df, "truth", "pred").collect()}
    a = got["a"]
    assert (a["tp"], a["fp"], a["fn"]) == (3, 1, 1)
    assert a["precision"] == 0.75 and a["recall"] == 0.75
    assert a["f1"] == 0.75
    c = got["c"]   # never predicted -> precision NULL, recall 0
    assert (c["tp"], c["fp"], c["fn"]) == (0, 0, 1)
    assert c["precision"] is None and c["recall"] == 0.0
    assert c["f1"] is None


def test_calibration_and_gain(spark):
    from pyspark.sql import functions as SF

    from dask_grblas_spark.functions.profiling import (calibration_bins,
                                                       cumulative_gain)

    rows = [(i, i / 10.0, i >= 7) for i in range(10)]  # score, label
    df = spark.createDataFrame(rows, "doc_id long, s double, l boolean")
    bins = {r["bin"]: r for r in calibration_bins(df, "s", "l").collect()}
    assert bins[9]["n"] == 1 and bins[9]["pos_rate"] == 1.0
    assert bins[0]["pos_rate"] == 0.0
    gain = {r["tile"]: r
            for r in cumulative_gain(df, "s", SF.col("l"),
                                     id_col="doc_id").collect()}
    # 10 rows into 10 tiles, positives are the 3 highest scores
    assert gain[1]["n_pos"] == 1 and gain[1]["capture"] == round(1 / 3, 6)
    assert gain[3]["capture"] == 1.0
    assert gain[10]["capture"] == 1.0


def test_moments_profile_known_distribution(spark):
    from dask_grblas_spark.functions.profiling import moments_profile

    # symmetric two-point {0, 10}: skew 0, excess kurt -2
    df = spark.createDataFrame([(0.0,), (10.0,), (0.0,), (10.0,)],
                               "v double")
    r = moments_profile(df, ["v"]).collect()[0]
    assert r["mean_v"] == 5.0 and r["std_v"] == 5.0
    assert r["skew"] == 0.0 and r["kurt"] == -2.0
    # constant column -> NULL skew/kurt
    c = moments_profile(spark.createDataFrame([(3.0,)] * 4, "v double"),
                        ["v"]).collect()[0]
    assert c["skew"] is None and c["kurt"] is None


def test_ab_test_hand_computed(spark):
    import math

    from dask_grblas_spark.functions.profiling import ab_test

    rows = [("a", v) for v in (1.0, 2.0, 3.0, 4.0)] + \
           [("b", v) for v in (2.0, 4.0, 6.0, 8.0)]
    df = spark.createDataFrame(rows, "grp string, v double")
    r = ab_test(df, "grp", "v", "a", "b").collect()[0]
    va = 5.0 / 3          # sample variance of 1..4
    vb = 20.0 / 3
    z = (2.5 - 5.0) / math.sqrt(va / 4 + vb / 4)
    assert r["n_a"] == 4 and r["mean_a"] == 2.5 and r["mean_b"] == 5.0
    assert r["z"] == round(z, 6)
    assert r["significant"] == (abs(round(z, 6)) > 1.96)


def test_exact_weighted_quantiles_hand(spark):
    from dask_grblas_spark.functions.profiling import (
        exact_weighted_quantiles)

    # values 1..4 with weights 1,1,6,2 (W=10):
    # p=.5 -> target 5 -> cum 1,2,8 -> v=3; p=.9 -> target 9 -> v=4
    df = spark.createDataFrame(
        [(1.0, 1), (2.0, 1), (3.0, 6), (4.0, 2)], "v double, w long")
    got = {r["p"]: r["value"]
           for r in exact_weighted_quantiles(
               df, "v", "w", [0.1, 0.5, 0.9]).collect()}
    assert got == {0.1: 1.0, 0.5: 3.0, 0.9: 4.0}


def test_group_quantiles_exact(spark):
    from dask_grblas_spark.functions.profiling import group_quantiles

    df = spark.createDataFrame(
        [("a", float(v)) for v in range(1, 5)] + [("b", 10.0)],
        "g string, v double")
    got = {(r["grp"], r["p"]): r["value"]
           for r in group_quantiles(df, "g", "v", [0.5, 1.0]).collect()}
    assert got[("a", 0.5)] == 2.5   # linear interpolation
    assert got[("a", 1.0)] == 4.0
    assert got[("b", 0.5)] == 10.0


def test_user_growth_new_vs_returning(spark):
    import datetime

    from dask_grblas_spark.functions.profiling import user_growth

    def ev(eid, day, uid):
        return (eid, datetime.datetime(2024, 9, day), uid, "v", 0.0, "{}")

    df = spark.createDataFrame(
        [ev(1, 1, 10), ev(2, 1, 11),           # day 1: 2 new
         ev(3, 2, 10),                          # day 2: returning only
         ev(4, 3, 12), ev(5, 3, 10)],           # day 3: 1 new + 1 ret
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string")
    got = {r["day"]: r for r in user_growth(df).collect()}
    assert (got["2024-09-01"]["dau"], got["2024-09-01"]["new_users"],
            got["2024-09-01"]["cum_users"]) == (2, 2, 2)
    assert (got["2024-09-02"]["dau"], got["2024-09-02"]["new_users"],
            got["2024-09-02"]["cum_users"]) == (1, 0, 2)
    assert (got["2024-09-03"]["dau"], got["2024-09-03"]["new_users"],
            got["2024-09-03"]["cum_users"]) == (2, 1, 3)


def test_chi2_independence_independent_and_dependent(spark):
    from dask_grblas_spark.functions.profiling import chi2_independence

    # perfectly independent 2x2 with equal cells -> chi2 = 0
    rows = [(a, b) for a in "xy" for b in "uv" for _ in range(5)]
    df = spark.createDataFrame(rows, "a string, b string")
    r = chi2_independence(df, "a", "b").collect()[0]
    assert r["chi2"] == 0.0 and r["dof"] == 1 and r["n"] == 20
    # perfectly dependent: a == b -> chi2 = n
    rows2 = [("x", "x")] * 5 + [("y", "y")] * 5
    r2 = chi2_independence(spark.createDataFrame(rows2,
                                                 "a string, b string"),
                           "a", "b").collect()[0]
    assert r2["chi2"] == 10.0


def test_chi2_weight_col_matches_row_counting(spark):
    """r12: cramers_v feeds chi2_independence a pre-aggregated joint
    contingency via weight_col — summing integer pre-counts must be
    bit-identical to counting raw rows, including NULL categories."""
    from dask_grblas_spark.functions.profiling import (chi2_independence,
                                                       cramers_v)

    rows = ([("x", "u", "p")] * 4 + [("x", "v", "q")] * 3
            + [("y", "u", "q")] * 2 + [("y", "v", "p")] * 6
            + [(None, "u", "p")] * 2 + [("y", None, "q")])
    df = spark.createDataFrame(rows, "a string, b string, c string")
    direct = chi2_independence(df, "a", "b").collect()[0]
    joint = (df.groupBy("a", "b", "c")
               .agg(F.count("*").cast("bigint").alias("_w")))
    weighted = chi2_independence(joint, "a", "b",
                                 weight_col="_w").collect()[0]
    assert direct.asDict() == weighted.asDict()
    # cramers_v end to end: lazy gate vs forced materialization agree
    lazy = {(r["col_a"], r["col_b"]): r.asDict()
            for r in cramers_v(df, ["a", "b", "c"]).collect()}
    import os
    os.environ["SPARK_GRAFT_MATERIALIZE_BYTES"] = "0"
    try:
        forced = {(r["col_a"], r["col_b"]): r.asDict()
                  for r in cramers_v(df, ["a", "b", "c"]).collect()}
    finally:
        del os.environ["SPARK_GRAFT_MATERIALIZE_BYTES"]
    assert lazy == forced


def test_gini_extremes(spark):
    from dask_grblas_spark.functions.profiling import gini_coefficient

    # perfect equality -> 0
    eq = spark.createDataFrame([(5.0,)] * 8, "v double")
    assert gini_coefficient(eq, "v").collect()[0]["gini"] == 0.0
    # one holder of everything -> (n-1)/n
    one = spark.createDataFrame([(0.0,)] * 7 + [(100.0,)], "v double")
    r = gini_coefficient(one, "v").collect()[0]
    assert r["gini"] == round(7 / 8, 6)
    # hand case: [1,2,3,4] -> 2*(1+4+9+16)/(4*10) - 5/4 = 0.25
    h = spark.createDataFrame([(1.0,), (2.0,), (3.0,), (4.0,)],
                              "v double")
    assert gini_coefficient(h, "v").collect()[0]["gini"] == 0.25


def test_mad_outliers_robust_to_one_extreme(spark):
    from dask_grblas_spark.functions.profiling import mad_outliers

    rows = [("a", float(v)) for v in (10, 11, 12, 13, 14, 1000)] + \
           [("b", 5.0)] * 4   # constant group: MAD 0 -> no outliers
    df = spark.createDataFrame(rows, "g string, v double")
    got = {r["grp"]: r for r in mad_outliers(df, "g", "v").collect()}
    assert got["a"]["n_outliers"] == 1   # only the 1000
    assert got["a"]["med"] == 12.5
    assert got["b"]["mad"] == 0.0 and got["b"]["n_outliers"] == 0


def test_key_skew_report(spark):
    from dask_grblas_spark.functions.profiling import key_skew

    rows = [("hot",)] * 8 + [("a",), ("b",), ("c",), ("d",)]
    df = spark.createDataFrame(rows, "k string")
    got = {r["rank"]: r for r in key_skew(df, "k", top_n=2).collect()}
    assert got[1]["key"] == "hot" and got[1]["n"] == 8
    assert got[1]["share"] == round(8 / 12, 6)
    # mean count = 12/5 -> skew = 8 / 2.4
    assert got[1]["skew"] == round(8 / 2.4, 6)
    assert got[2]["key"] == "a"   # ties rank lexicographically


def test_dictionary_encode_dense_lexicographic(spark):
    from dask_grblas_spark.functions.reshape import dictionary_encode

    df = spark.createDataFrame(
        [("banana",), ("apple",), ("banana",), ("cherry",), (None,)],
        "v string")
    got = {r["value"]: r["id"]
           for r in dictionary_encode(df, "v").collect()}
    assert got == {"apple": 0, "banana": 1, "cherry": 2}


def test_date_dim_attributes(spark):
    from dask_grblas_spark.functions.timeseries import date_dim

    got = {r["day"]: r
           for r in date_dim(spark, "2024-01-01", "2024-01-07").collect()}
    assert len(got) == 7
    # 2024-01-01 was a Monday -> dow 1 (0 = Sunday), ISO week 1
    assert got["2024-01-01"]["dow"] == 1
    assert got["2024-01-01"]["week"] == 1
    assert not got["2024-01-01"]["is_weekend"]
    assert got["2024-01-06"]["dow"] == 6 and got["2024-01-06"]["is_weekend"]
    assert got["2024-01-07"]["dow"] == 0 and got["2024-01-07"]["is_weekend"]
    assert all(r["month"] == 1 and r["quarter"] == 1
               for r in got.values())


def test_winsorize_clips_at_group_bounds(spark):
    from dask_grblas_spark.functions.profiling import winsorize

    rows = [("a", float(v)) for v in range(1, 100)] + [("a", 1000.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = winsorize(df, "g", "v", lo=0.05, hi=0.95).collect()
    clipped = [r for r in out if r["clipped"]]
    # the 1000 extreme and the low tail below p05 are clipped
    assert any(r["v"] == 1000.0 for r in clipped)
    assert all(r["v_clip"] <= max(x["v_clip"] for x in out)
               for r in out)
    top = max(r["v_clip"] for r in out)
    assert top < 1000.0      # extreme got cut to p95
    assert len(out) == 100   # row count preserved


# ---------------------------------------------------------------------------
# round 7: Kneser-Ney, repeated-ngram loops, column entropy, robust scale
# ---------------------------------------------------------------------------

def test_kneser_ney_bigram_hand_computed(spark):
    """Corpus: 'a b' x3, 'a c', 'c b'. Bigram types: (a,b)=3, (a,c)=1,
    (c,b)=1 -> N1+(..)=3. c1(a)=4, N1+(a.)=2; c1(c)=1, N1+(c.)=1.
    P_cont(b)=2/3, P_cont(c)=1/3. d=0.75:
    p(b|a) = (3-.75)/4 + .75*2/4*2/3 = 0.5625 + 0.25 = 0.8125
    p(c|a) = (1-.75)/4 + .75*2/4*1/3 = 0.0625 + 0.125 = 0.1875
    p(b|c) = (1-.75)/1 + .75*1/1*2/3 = 0.25 + 0.5 = 0.75"""
    rows = [(1, "a b"), (2, "a b"), (3, "a b"), (4, "a c"), (5, "c b")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.w1, r.w2): (r.c12, r.p_kn)
           for r in text_fns.kneser_ney_bigram(df, min_count=1).collect()}
    assert got[("a", "b")] == (3, 0.8125)
    assert got[("a", "c")] == (1, 0.1875)
    assert got[("c", "b")] == (1, 0.75)
    # min_count filters OUTPUT only (counts keep the full relation)
    got2 = text_fns.kneser_ney_bigram(df, min_count=2).collect()
    assert [(r.w1, r.w2) for r in got2] == [("a", "b")]
    assert got2[0].p_kn == 0.8125


def test_repeated_ngram_loops(spark):
    rows = [
        (1, "the cat sat on the mat today ok"),          # no repeats
        (2, "go to go to go to go to go mad"),           # looping bigram
        (3, "a b c"),                                    # < n tokens
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in
           text_fns.repeated_ngram_loops(df, n=2).collect()}
    assert got[1].max_repeat == 1 and got[1].repeat_frac == 0.0
    # doc 2 bigrams: 'go to'x4, 'to go'x4, 'go mad' -> 9 grams,
    # 3 distinct, max repeat 4
    assert got[2].n_grams == 9 and got[2].distinct_grams == 3
    assert got[2].max_repeat == 4
    assert got[2].repeat_frac == round(6 / 9, 6)
    got4 = {r.doc_id for r in
            text_fns.repeated_ngram_loops(df, n=4).collect()}
    assert 3 not in got4


def test_column_entropy_known_distribution(spark):
    import math
    rows = [(i, "x", ["a", "a", "b", "c"][i % 4],
             None if i % 2 else "z") for i in range(8)]
    from dask_grblas_spark.functions import profiling

    df = spark.createDataFrame(rows, "id long, const string, "
                                     "cat string, half string")
    got = {r.col: r for r in profiling.column_entropy(
        df, ["const", "cat", "half"]).collect()}
    assert got["const"].entropy == 0.0
    assert got["const"].norm_entropy is None
    # cat: p = (1/2, 1/4, 1/4) -> H = 1.5 ln 2
    want = round(1.5 * math.log(2), 6)
    assert got["cat"].entropy == want
    assert got["cat"].n_distinct == 3
    assert got["cat"].norm_entropy == round(1.5 * math.log(2)
                                            / math.log(3), 6)
    assert got["half"].n_null == 4 and got["half"].n == 4
    assert got["half"].entropy == 0.0


def test_robust_scale_hand_computed(spark):
    rows = [("g", float(v)) for v in [1, 2, 3, 4, 5]]
    from dask_grblas_spark.functions import profiling

    rows += [("z", 7.0), ("z", 7.0)]  # zero IQR
    df = spark.createDataFrame(rows, "grp string, v double")
    got = profiling.robust_scale(df, "grp", "v").collect()
    g = sorted((r.v, r.scaled) for r in got if r.grp == "g")
    # med 3, p25 2, p75 4 -> iqr 2
    assert g == [(1.0, -1.0), (2.0, -0.5), (3.0, 0.0),
                 (4.0, 0.5), (5.0, 1.0)]
    z = [r.scaled for r in got if r.grp == "z"]
    assert z == [None, None]


def test_psi_hand_computed(spark):
    import math

    from dask_grblas_spark.functions import profiling

    ref = spark.createDataFrame([(float(x),) for x in
                                 [1] * 50 + [5] * 30 + [9] * 20], "v double")
    cur = spark.createDataFrame([(float(x),) for x in
                                 [1] * 20 + [5] * 30 + [9] * 50], "v double")
    got = {r.bin: r for r in profiling.psi(ref, cur, "v", 0.0, 10.0,
                                           n_bins=5).collect()}
    assert set(got) == {0, 2, 4}
    assert (got[0].n_ref, got[0].n_cur) == (50, 20)
    want0 = round((0.2 - 0.5) * math.log(0.2 / 0.5), 6)
    want4 = round((0.5 - 0.2) * math.log(0.5 / 0.2), 6)
    assert got[0].contrib == want0
    assert got[2].contrib == 0.0
    assert got[4].contrib == want4


def test_psi_one_sided_bins_yield_null(spark):
    from dask_grblas_spark.functions import profiling

    ref = spark.createDataFrame([(1.0,), (1.0,)], "v double")
    cur = spark.createDataFrame([(9.0,), (9.0,)], "v double")
    got = {r.bin: r for r in profiling.psi(ref, cur, "v", 0.0, 10.0,
                                           n_bins=5).collect()}
    assert got[0].contrib is None and got[4].contrib is None
    assert got[0].n_cur == 0 and got[4].n_ref == 0


def test_ks_test_hand_computed(spark):
    """A = {1,2,3,4}, B = {3,4,5,6}: F_a - F_b peaks at x=2 (0.5 - 0)
    and stays 0.5 through x=4... at x=3: 0.75-0.25=0.5; x=4: 1-0.5=0.5.
    D = 0.5. Identical samples give D = 0."""
    from dask_grblas_spark.functions import profiling

    a = spark.createDataFrame([(float(x),) for x in [1, 2, 3, 4]],
                              "v double")
    b = spark.createDataFrame([(float(x),) for x in [3, 4, 5, 6]],
                              "v double")
    r = profiling.ks_test(a, b, "v").collect()[0]
    assert (r.n_a, r.n_b, r.d_stat) == (4, 4, 0.5)
    r2 = profiling.ks_test(a, a, "v").collect()[0]
    assert r2.d_stat == 0.0
    # scipy-free independent check vs the brute-force definition
    import itertools
    xa = [1.0, 1.0, 2.0, 7.0, 9.0]
    xb = [0.5, 2.0, 2.0, 3.0]
    da = spark.createDataFrame([(x,) for x in xa], "v double")
    db = spark.createDataFrame([(x,) for x in xb], "v double")
    want = max(abs(sum(1 for y in xa if y <= x) / len(xa)
                   - sum(1 for y in xb if y <= x) / len(xb))
               for x in itertools.chain(xa, xb))
    r3 = profiling.ks_test(da, db, "v").collect()[0]
    assert r3.d_stat == round(want, 6)


def test_ks_test_empty_side(spark):
    from dask_grblas_spark.functions import profiling

    a = spark.createDataFrame([(1.0,)], "v double")
    b = spark.createDataFrame([(None,)], "v double")
    r = profiling.ks_test(a, b, "v").collect()[0]
    assert r.n_b == 0 and r.d_stat is None


def test_kneser_ney_logprob_consistent_with_table(spark):
    """Per-doc KN scores must equal the tf-weighted ln of the q187
    table's probabilities (python replay on a toy corpus)."""
    import math

    rows = [(1, "a b"), (2, "a b"), (3, "a b"), (4, "a c"), (5, "c b")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    table = {(r.w1, r.w2): r.p_kn
             for r in text_fns.kneser_ney_bigram(df, min_count=1)
             .collect()}
    got = {r.doc_id: (r.n_bigrams, r.avg_lp)
           for r in text_fns.kneser_ney_logprob(df).collect()}
    assert got[1] == (1, round(math.log(table[("a", "b")]), 6))
    assert got[4] == (1, round(math.log(table[("a", "c")]), 6))
    assert got[5] == (1, round(math.log(table[("c", "b")]), 6))


def test_mutual_information_hand_computed(spark):
    """Perfectly dependent columns: MI = H = ln 2 at a 50/50 split,
    NMI = 1. Independent uniform columns: MI = 0."""
    import math

    from dask_grblas_spark.functions import profiling

    dep = spark.createDataFrame(
        [(i, "x" if i % 2 else "y", "p" if i % 2 else "q")
         for i in range(100)], "id long, a string, b string")
    r = profiling.mutual_information(dep, "a", "b").collect()[0]
    assert (r.n, r.card_a, r.card_b) == (100, 2, 2)
    assert r.mi == round(math.log(2), 6) and r.nmi == 1.0
    ind = spark.createDataFrame(
        [(i, str(i % 2), str((i // 2) % 2)) for i in range(100)],
        "id long, a string, b string")
    r2 = profiling.mutual_information(ind, "a", "b").collect()[0]
    assert r2.mi == 0.0 and r2.nmi == 0.0
    # constant column: zero entropy -> NMI NULL, MI 0
    const = spark.createDataFrame(
        [(i, "c", str(i % 3)) for i in range(30)],
        "id long, a string, b string")
    r3 = profiling.mutual_information(const, "a", "b").collect()[0]
    assert r3.mi == 0.0 and r3.nmi is None


def test_anova_hand_computed(spark):
    """Three groups straight out of a textbook: g1=(1,2,3), g2=(4,5,6),
    g3=(7,8,9). Grand mean 5; SSB = 3*(16+0+16) = 96... wait: group
    means 2,5,8 -> SSB = 3*((2-5)^2 + 0 + (8-5)^2) = 54; SSW = 3*2 = 6;
    F = (54/2)/(6/6) = 27."""
    from dask_grblas_spark.functions import profiling

    rows = [(g, float(v)) for g, vals in
            (("g1", [1, 2, 3]), ("g2", [4, 5, 6]), ("g3", [7, 8, 9]))
            for v in vals]
    df = spark.createDataFrame(rows, "grp string, v double")
    r = profiling.anova(df, "grp", "v").collect()[0]
    assert (r.n, r.k) == (9, 3)
    assert r.ss_between == 54.0 and r.ss_within == 6.0
    assert r.f_stat == 27.0
    # single group / zero within-variance -> NULL F
    one = spark.createDataFrame([("g", 1.0), ("g", 2.0)],
                                "grp string, v double")
    assert profiling.anova(one, "grp", "v").collect()[0].f_stat is None
    flat = spark.createDataFrame([("a", 1.0), ("b", 1.0)],
                                 "grp string, v double")
    assert profiling.anova(flat, "grp", "v").collect()[0].f_stat is None


def test_review_fix_regressions(spark):
    """Round-7 review fixes: empty docs can't crash the bigram family;
    all-NULL columns surface in column_entropy; NULL groups survive
    robust_scale; MI on empty input returns 0 rows."""
    import math

    from dask_grblas_spark.functions import profiling

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, ""), (3, "   "), (4, "solo")],
        "doc_id long, text string")
    kb = text_fns.kneser_ney_bigram(docs, min_count=1).collect()
    assert {(r.w1, r.w2) for r in kb} == {("a", "b"), ("b", "a")}
    kl = text_fns.kneser_ney_logprob(docs).collect()
    assert {r.doc_id for r in kl} == {1}
    bl = text_fns.bigram_logprob(docs).collect()
    assert {r.doc_id for r in bl} == {1}

    ent = spark.createDataFrame(
        [(i, None, "x") for i in range(5)],
        "id long, dead string, live string")
    got = {r.col: r for r in profiling.column_entropy(
        ent, ["dead", "live"]).collect()}
    assert got["dead"].n is None and got["dead"].n_null == 5
    assert got["dead"].n_distinct == 0 and got["dead"].entropy is None
    assert got["live"].entropy == 0.0

    rs = spark.createDataFrame(
        [(None, 1.0), (None, 2.0), (None, 3.0), ("g", 5.0), ("g", 6.0),
         ("g", 7.0)], "grp string, v double")
    out = profiling.robust_scale(rs, "grp", "v").collect()
    assert len(out) == 6  # NULL-group rows survive (null-safe join)
    null_grp = [r for r in out if r.grp is None]
    assert sorted(r.scaled for r in null_grp) == [-1.0, 0.0, 1.0]

    empty = spark.createDataFrame([], "a string, b string")
    assert profiling.mutual_information(empty, "a", "b").count() == 0


def test_exact_quantiles_duplicate_probs(spark):
    """r8 review find: a duplicated probability doubled its target
    partition's rows inside the rank window and corrupted the rank —
    probs now dedupe (one row per distinct p, value unchanged)."""
    from dask_grblas_spark.functions.profiling import exact_quantiles

    df = spark.range(100).selectExpr("cast(id as double) as v")
    dup = exact_quantiles(df, "v", [0.5, 0.5]).collect()
    assert [(r.p, r.value) for r in dup] == [(0.5, 49.0)]
    single = exact_quantiles(df, "v", [0.5]).collect()[0]
    assert (single.p, single.value) == (0.5, 49.0)


def test_exact_weighted_quantiles_duplicate_probs(spark):
    from dask_grblas_spark.functions.profiling import \
        exact_weighted_quantiles

    df = spark.range(10).selectExpr("cast(id as double) as v",
                                    "cast(1 as long) as w")
    dup = exact_weighted_quantiles(df, "v", "w", [0.5, 0.5]).collect()
    assert [(r.p, r.value) for r in dup] == [(0.5, 4.0)]


def test_expectations_mixed_contract(spark):
    """One frame violating each check class; NULLs only hit not_null."""
    from dask_grblas_spark.functions.profiling import expectations

    df = spark.createDataFrame(
        [(1, 5.0, "a"), (1, 50.0, "b"), (2, None, None),
         (3, -1.0, "zzz")],
        "k long, v double, s string")
    got = {r.check: (r.n_violations, r.passed) for r in
           expectations(df, [
               ("not_null", "v"),
               ("unique", "k"),
               ("range", "v", 0.0, 10.0),
               ("accepted_values", "s", ["a", "b"]),
           ]).collect()}
    assert got["0_not_null"] == (1, False)
    assert got["1_unique"] == (1, False)       # k=1 twice
    assert got["2_range"] == (2, False)        # 50.0 and -1.0; NULL skipped
    assert got["3_accepted_values"] == (1, False)  # 'zzz'; NULL skipped
    import pytest as _pt
    with _pt.raises(ValueError):
        expectations(df, [("bogus", "k")])


def test_expectations_clean_frame(spark):
    from dask_grblas_spark.functions.profiling import expectations

    df = spark.createDataFrame([(1, 1.0), (2, 2.0)], "k long, v double")
    got = expectations(df, [("unique", "k"), ("not_null", "v")]).collect()
    assert all(r.passed and r.n_violations == 0 for r in got)


def test_feature_cross_deterministic_and_null_safe(spark):
    """Same inputs -> same bucket; NULL component != empty string."""
    from dask_grblas_spark.functions.profiling import feature_cross

    df = spark.createDataFrame(
        [("x", 1), ("x", 1), ("", 1), (None, 1)],
        "a string, b int")
    got = [r.cross_bucket for r in
           feature_cross(df, ["a", "b"], n_buckets=1 << 16).collect()]
    assert got[0] == got[1]
    assert len({got[1], got[2], got[3]}) == 3
    assert all(0 <= b < (1 << 16) for b in got)


def test_cramers_v_dependence_extremes(spark):
    """Identical columns -> V=1; a constant column -> NULL (dof 0)."""
    from dask_grblas_spark.functions.profiling import cramers_v

    rows = [(str(i % 2), str(i % 2), "const") for i in range(40)]
    df = spark.createDataFrame(rows, "a string, b string, c string")
    out = {(r.col_a, r.col_b): r
           for r in cramers_v(df, ["a", "b", "c"]).collect()}
    assert out[("a", "b")].v == 1.0
    assert out[("a", "c")].v is None  # constant c: min card = 1
    import pytest
    with pytest.raises(ValueError):
        cramers_v(df, ["a"])


def test_benjamini_hochberg_stepup(spark):
    """Classic step-up: with alpha=.05 over these 10 p-values the
    largest k with p_(k) <= k/10*alpha is 2 -> exactly h1, h2 reject
    (h3 fails its own threshold but would drag along if any later k
    passed — the step-up, not step-down, semantics)."""
    from dask_grblas_spark.functions.profiling import benjamini_hochberg

    ps = [("h1", 0.001), ("h2", 0.008), ("h3", 0.039), ("h4", 0.041),
          ("h5", 0.042), ("h6", 0.06), ("h7", 0.074), ("h8", 0.205),
          ("h9", 0.212), ("h10", 0.216)]
    df = spark.createDataFrame(ps, "k string, p double")
    out = {r.key: r for r in
           benjamini_hochberg(df, "k", "p", alpha=0.05).collect()}
    assert sorted(k for k, r in out.items() if r.reject) == ["h1", "h2"]
    assert out["h1"].rank == 1 and out["h10"].rank == 10
    # step-up rescue: a late passing rank rejects everything before it
    out2 = {r.key: r.reject for r in benjamini_hochberg(
        df, "k", "p", alpha=0.25).collect()}
    assert all(out2.values())  # p_(10)=0.216 <= 0.25 -> all reject
    # empty input
    assert benjamini_hochberg(df.limit(0), "k", "p").count() == 0


def test_reconcile_full_outer_report(spark):
    from dask_grblas_spark.functions.profiling import reconcile

    L = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", None), (3, "c", 30.0), (4, "d", 40.0)],
        "k long, s string, v double")
    R = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", None), (3, "X", 30.0), (5, "e", 50.0)],
        "k long, s string, v double")
    out = {(r.kind, r.item): r.n
           for r in reconcile(L, R, ["k"], ["s", "v"]).collect()}
    # NULL == NULL matches (row 2); row 3 differs only in s
    assert out[("status", "only_left")] == 1
    assert out[("status", "only_right")] == 1
    assert out[("status", "match")] == 2
    assert out[("status", "diff")] == 1
    assert out[("col_diff", "s")] == 1 and out[("col_diff", "v")] == 0


def test_woe_iv_hand_computed(spark):
    import math

    from dask_grblas_spark.functions.profiling import woe_iv

    df = spark.createDataFrame(
        [("A", 1), ("A", 1), ("A", 0), ("B", 0), ("B", 0), ("B", 1)],
        "c string, y int")
    w = {r.category: r for r in woe_iv(df, "c", "y", alpha=0.5).collect()}
    woe_a = math.log(((2 + 0.5) / 4) / ((1 + 0.5) / 4))
    assert w["A"].woe == round(woe_a, 6)
    assert w["A"].n_pos == 2 and w["A"].n_neg == 1
    # symmetric classes -> mirrored WOE, equal IV contributions
    assert w["B"].woe == -w["A"].woe
    assert w["A"].iv_term == w["B"].iv_term


def test_pareto_frontier_vs_bruteforce(spark):
    """Distributed prefix-min sweep == the quadratic definition, across
    partitionings; duplicates keep their multiplicity."""
    import pyspark.sql.functions as F

    from dask_grblas_spark.functions.reshape import pareto_frontier

    pts = [(1.0, 5.0), (2.0, 3.0), (3.0, 4.0), (3.0, 1.0),
           (5.0, 1.0), (5.0, 0.5), (2.0, 3.0), (1.0, 5.0)]
    df = spark.createDataFrame(pts, "x double, y double")
    out = {(r.x, r.y): r.n for r in pareto_frontier(df, "x", "y")
           .collect()}
    assert out == {(1.0, 5.0): 2, (2.0, 3.0): 2, (3.0, 1.0): 1,
                   (5.0, 0.5): 1}
    rnd = spark.range(300).select(
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(50)).cast("double")
         .alias("x"),
        F.pmod(F.xxhash64("id", F.lit(2)), F.lit(50)).cast("double")
         .alias("y"))
    rows = [(r.x, r.y) for r in rnd.collect()]
    s = set(rows)
    exp = {p for p in s
           if not any(q != p and q[0] <= p[0] and q[1] <= p[1]
                      for q in s)}
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for parts in ("1", "3", "7"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            got = {(r.x, r.y)
                   for r in pareto_frontier(rnd, "x", "y").collect()}
            assert got == exp, parts
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def test_kfold_target_encode_out_of_fold(spark):
    """enc(key, fold) excludes the fold's own targets; a key entirely
    in one fold degrades to the prior (the global mean)."""
    from dask_grblas_spark.functions.profiling import kfold_target_encode

    rows = [("A", 1.0, 0), ("A", 0.0, 0), ("A", 1.0, 1), ("B", 1.0, 0)]
    df = spark.createDataFrame(rows, "k string, y double, f int")
    out = {(r.key, r.fold): r
           for r in kfold_target_encode(df, "k", "y", "f",
                                        m=2.0).collect()}
    gm = 3.0 / 4
    assert out[("A", 0)].enc == round((2 - 1 + 2 * gm) / (3 - 2 + 2), 6)
    assert out[("A", 0)].n_oof == 1
    assert out[("B", 0)].enc == round(gm, 6) and out[("B", 0)].n_oof == 0


def test_quantile_normalize_maps_onto_global(spark):
    """Group scales map onto the global distribution via exact integer
    rank arithmetic; duplicates are tie-invariant (SQL RANK
    semantics)."""
    from dask_grblas_spark.functions.profiling import quantile_normalize

    rows = ([("a", v) for v in [1.0, 2.0, 3.0, 4.0]]
            + [("b", v) for v in [10.0, 20.0]])
    df = spark.createDataFrame(rows, "g string, v double")
    out = sorted((r.grp, r.value, r.n, r.qnorm)
                 for r in quantile_normalize(df, "g", "v").collect())
    assert out == [("a", 1.0, 1, 2.0), ("a", 2.0, 1, 3.0),
                   ("a", 3.0, 1, 10.0), ("a", 4.0, 1, 20.0),
                   ("b", 10.0, 1, 3.0), ("b", 20.0, 1, 20.0)]
    dup = spark.createDataFrame(
        [("a", 5.0), ("a", 5.0), ("a", 7.0), ("b", 1.0)],
        "g string, v double")
    o2 = sorted((r.grp, r.value, r.n, r.qnorm)
                for r in quantile_normalize(dup, "g", "v").collect())
    assert o2 == [("a", 5.0, 2, 5.0), ("a", 7.0, 1, 7.0),
                  ("b", 1.0, 1, 7.0)]


def test_kmv_set_ops_exact_small_sets(spark):
    """Below-k groups degrade to exact sets: identical corpora give
    jaccard 1.0; disjoint corpora give 0.0 and union = |A|+|B|."""
    from dask_grblas_spark.functions.sketches import kmv_set_ops
    same = spark.createDataFrame(
        [(1, "g", "alpha beta gamma delta"),
         (2, "h", "alpha beta gamma delta")],
        "doc_id long, source string, text string")
    r = kmv_set_ops(same, "source", "g", "h", k=64, n=1).collect()[0]
    assert r["jaccard_est"] == 1.0
    assert r["n_a"] == r["n_b"] == 4
    assert r["union_est"] == 4.0 and r["inter_est"] == 4.0
    disj = spark.createDataFrame(
        [(1, "g", "alpha beta"), (2, "h", "gamma delta")],
        "doc_id long, source string, text string")
    r2 = kmv_set_ops(disj, "source", "g", "h", k=64, n=1).collect()[0]
    assert r2["jaccard_est"] == 0.0 and r2["union_est"] == 4.0
    assert r2["inter_est"] == 0.0


# ---------------------------------------------------------------------------
# bloom_build / bloom_contains (r11)
# ---------------------------------------------------------------------------

def test_bloom_no_false_negatives_and_low_fpp(spark):
    from dask_grblas_spark.functions.sketches import (bloom_build,
                                                      bloom_contains)
    present = spark.range(0, 500).selectExpr("id as k")
    bloom = bloom_build(present, "k", m_bits=1 << 13, k=5)
    # every inserted key must test positive (no false negatives)
    got = {r["key"]: r["maybe"] for r in
           bloom_contains(bloom, present, "k",
                          m_bits=1 << 13, k=5).collect()}
    assert all(got[i] for i in range(500))
    # absent keys: ~1% FPP at 16.4 bits/key; allow generous slack
    absent = spark.range(10_000, 12_000).selectExpr("id as k")
    fp = sum(1 for r in bloom_contains(bloom, absent, "k",
                                       m_bits=1 << 13, k=5).collect()
             if r["maybe"])
    assert fp < 100  # ~5% ceiling vs ~1% design point
    # determinism: same build twice -> identical words/bits
    again = bloom_build(present, "k", m_bits=1 << 13, k=5)
    assert sorted(map(tuple, bloom.collect())) \
        == sorted(map(tuple, again.collect()))


def test_bloom_relation_is_bounded(spark):
    from dask_grblas_spark.functions.sketches import bloom_build
    big = spark.range(0, 50_000).selectExpr("id as k")
    bloom = bloom_build(big, "k", m_bits=1 << 10, k=3)
    assert bloom.count() <= (1 << 10) // 32   # <= m/32 words, any n


# ---------------------------------------------------------------------------
# mergeable deterministic quantile sketch (round 12)


def _qs_vals(spark, n, seed="v"):
    rows = [(i, float(_h60(f"{seed}:{i}") % 100000) / 10.0,
             "g%d" % (i % 3)) for i in range(n)]
    return spark.createDataFrame(rows, "uid long, x double, g string")


def test_quantile_sketch_exact_when_small(spark):
    """n <= k -> level 0, every row kept, query returns the exact
    ceil-rank quantile."""
    df = _qs_vals(spark, 200)
    sk = sketches.quantile_sketch_build(df, "x", "uid", k=256)
    assert sk.count() == 200
    assert sk.agg(F.max("_level")).collect()[0][0] == 0
    got = {r["phi"]: r["est"] for r in
           sketches.quantile_sketch_query(sk, [0.5, 0.9]).collect()}
    xs = sorted(r["x"] for r in df.collect())
    assert got[0.5] == xs[math.ceil(0.5 * 200) - 1]
    assert got[0.9] == xs[math.ceil(0.9 * 200) - 1]


def test_quantile_sketch_replayable_and_partition_stable(spark):
    """The kept set is a pure function of the data: plain-Python md5
    replay predicts EXACT membership, and a repartitioned input
    builds the identical sketch."""
    df = _qs_vals(spark, 3000)
    sk = sketches.quantile_sketch_build(df, "x", "uid", k=64)
    rows = sk.collect()
    lev = rows[0]["_level"]
    # smallest L with 64 << L >= 3000 -> 64*64=4096 >= 3000 -> L=6
    assert lev == 6
    kept = {(r["_h"], r["_val"]) for r in rows}
    expect = {(_h60(f"qsk:{i}"),
               float(_h60(f"v:{i}") % 100000) / 10.0)
              for i in range(3000)
              if _h60(f"qsk:{i}") % (1 << 6) == 0}
    assert kept == expect
    again = {(r["_h"], r["_val"]) for r in
             sketches.quantile_sketch_build(
                 df.repartition(13), "x", "uid", k=64).collect()}
    assert again == kept


def test_quantile_sketch_merge_equals_direct(spark):
    """The mergeability CONTRACT: per-shard sketches merged equal the
    direct sketch over the union — exact row-set equality, grouped
    and ungrouped."""
    df = _qs_vals(spark, 4000)
    shards = [df.where(F.pmod("uid", F.lit(3)) == i) for i in range(3)]
    for groups in (None, ["g"]):
        direct = sketches.quantile_sketch_build(
            df, "x", "uid", k=128, group_cols=groups)
        merged = sketches.quantile_sketch_merge(
            [sketches.quantile_sketch_build(s, "x", "uid", k=128,
                                            group_cols=groups)
             for s in shards], k=128, group_cols=groups)
        key = (lambda r: (r["g"] if groups else "", r["_h"]))
        d = sorted(map(tuple, direct.collect()))
        m = sorted(map(tuple, merged.collect()))
        assert d == m


def test_quantile_sketch_calibration(spark):
    """Bernoulli rank-error bound: the estimated quantile's TRUE rank
    sits within a few sampling deviations of phi*n (sigma ~
    sqrt(n * 2^level); 5 sigma + one item weight gives a deterministic
    test far above noise yet far below a broken estimator)."""
    n, k = 20000, 256
    df = _qs_vals(spark, n)
    sk = sketches.quantile_sketch_build(df, "x", "uid", k=k)
    q = {r["phi"]: r for r in
         sketches.quantile_sketch_query(
             sk, [0.1, 0.5, 0.9, 0.99]).collect()}
    xs = sorted(r["x"] for r in df.collect())
    for phi, r in q.items():
        true_rank = sum(1 for x in xs if x <= r["est"])
        sigma = math.sqrt(n * (1 << r["level"]))
        assert abs(true_rank - phi * n) <= 5 * sigma + (1 << r["level"]), \
            (phi, true_rank, phi * n, sigma)


def test_quantile_sketch_grouped_levels(spark):
    """Per-group levels: a small group stays exact (level 0) while a
    big one samples — in ONE build."""
    rows = [(i, float(i), "big") for i in range(5000)] + \
           [(10_000 + i, float(i), "small") for i in range(50)]
    df = spark.createDataFrame(rows, "uid long, x double, g string")
    sk = sketches.quantile_sketch_build(df, "x", "uid", k=100,
                                        group_cols=["g"])
    levels = {r["g"]: r["_level"] for r in
              sk.select("g", "_level").distinct().collect()}
    assert levels["small"] == 0
    assert levels["big"] == 6   # 100*2^6=6400 >= 5000
    small = sketches.quantile_sketch_query(
        sk.where(F.col("g") == "small"), [0.5], group_cols=["g"])
    assert small.collect()[0]["est"] == 24.0  # ceil(.5*50)=25th of 0..49


def test_bloom_prune_inline_no_shuffle_and_agrees(spark):
    """`bloom_prune` (r12): membership must agree with
    `bloom_contains` on every key (same md5 bit math), give no false
    negatives, and — the point of its existence — add ZERO Exchanges
    on the probe side: every word probe is a BroadcastHashJoin, so
    the only shuffle in a downstream join is the one carrying the
    SURVIVING rows."""
    M, K = 4096, 5
    keys = spark.createDataFrame([(i * 7,) for i in range(300)],
                                 "k long")
    big = spark.createDataFrame([(i, i % 2100) for i in range(5000)],
                                "rid long, k long")
    bloom = sketches.bloom_build(keys, "k", m_bits=M, k=K)
    pruned = sketches.bloom_prune(big, "k", bloom, m_bits=M, k=K)
    via_contains = {r["key"]: r["maybe"] for r in
                    sketches.bloom_contains(bloom, big, "k",
                                            m_bits=M, k=K).collect()}
    rows = pruned.collect()
    assert all(r["maybe"] == via_contains[r["k"]] for r in rows)
    present = {i * 7 for i in range(300)}
    assert all(r["maybe"] for r in rows if r["k"] in present)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # every hash Exchange in the plan belongs to the (m/32-row) bloom
    # BUILD side's word fold — the PROBE side rows never shuffle
    import re as _re
    for ln in plan.splitlines():
        if "Exchange hashpartitioning" in ln:
            assert _re.search(r"hashpartitioning\(word#", ln), ln


def test_stream_quantile_profile_equals_direct(spark, tmp_path):
    """The streaming fold (r12): incremental per-micro-batch sketch
    merge across FORCED multi-batch execution must equal the direct
    batch build+query EXACTLY — batch boundaries are invisible
    because md5 levels nest."""
    from datetime import datetime, timedelta

    from dask_grblas_spark.streaming.windows import (
        stream_quantile_profile)

    t0 = datetime(2024, 5, 1, 0, 0, 0)
    rows = [(i, t0 + timedelta(seconds=i), i % 7,
             "click" if i % 3 else "view",
             float((i * 37) % 1000), "{}") for i in range(3000)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    df.coalesce(1).write.mode("overwrite") \
      .parquet(str(tmp_path / "events.parquet"))
    got = sorted(map(tuple, stream_quantile_profile(
        spark, str(tmp_path), k=64, phis=(0.5, 0.9)).collect()))
    direct = sketches.quantile_sketch_build(
        df.select("event_type", F.col("event_id").alias("_uid"),
                  F.col("value").alias("x")),
        "x", "_uid", k=64, group_cols=["event_type"])
    want = sorted(map(tuple, sketches.quantile_sketch_query(
        direct, [0.5, 0.9], group_cols=["event_type"]).collect()))
    assert got == want


def test_quantile_sketch_null_group_kept(spark):
    """A NULL group key must survive the build/merge joins (r12
    review: null-unsafe equi-join silently dropped it — the
    NULL-group AUC failure class) and come back out of query."""
    rows = [(i, float(i), None if i % 2 else "g") for i in range(200)]
    df = spark.createDataFrame(rows, "uid long, x double, g string")
    sk = sketches.quantile_sketch_build(df, "x", "uid", k=256,
                                        group_cols=["g"])
    per = {r["g"]: r["_n"] for r in
           sk.select("g", "_n").distinct().collect()}
    assert per == {"g": 100, None: 100}
    merged = sketches.quantile_sketch_merge(
        [sketches.quantile_sketch_build(
             df.where(F.col("uid") < 100), "x", "uid", k=256,
             group_cols=["g"]),
         sketches.quantile_sketch_build(
             df.where(F.col("uid") >= 100), "x", "uid", k=256,
             group_cols=["g"])],
        k=256, group_cols=["g"])
    q = {(r["g"], r["phi"]): r["est"] for r in
         sketches.quantile_sketch_query(merged, [0.5],
                                        group_cols=["g"]).collect()}
    assert ("g", 0.5) in q and (None, 0.5) in q


def test_quantile_sketch_merge_loud_contracts(spark):
    """Empty input list raises; a merge k larger than the build k
    (merged level BELOW an input level) trips the in-plan assert
    instead of silently mis-weighting rows (r12 review)."""
    import pytest

    with pytest.raises(ValueError, match="empty"):
        sketches.quantile_sketch_merge([], k=64)
    df = _qs_vals(spark, 3000)
    sk = sketches.quantile_sketch_build(df, "x", "uid", k=64)  # L=6
    bad = sketches.quantile_sketch_merge([sk], k=100000)       # L=0
    with pytest.raises(Exception, match="larger k"):
        bad.collect()


def test_quantile_sketch_exact_integer_index_rule(spark):
    """phi=0.07, m=100: IEEE ceil(0.07*100)=ceil(7.000...01)=8, the
    exact integer rule gives 7 — the engine must follow the exact
    rule (r12 review: the oracle's DECIMAL arithmetic is exact)."""
    df = _qs_vals(spark, 100)
    sk = sketches.quantile_sketch_build(df, "x", "uid", k=128)
    r = sketches.quantile_sketch_query(sk, [0.07]).collect()[0]
    xs = sorted(x for _, x, _ in df.collect())
    assert r["m"] == 100
    assert r["est"] == xs[6]        # index 7, 1-based


def test_tar_shards_null_ids_distinct_error(spark):
    """NULL ids raise their own message, not 'duplicate ids' (r12
    review: countDistinct skips NULLs and misdiagnosed)."""
    import pytest

    from dask_grblas_spark.sources.io import write_tar_shards
    rows = [(0, "a"), (None, "b"), (2, "c")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    with pytest.raises(ValueError, match="non-NULL"):
        write_tar_shards(df, target_bytes=1 << 20)


def test_stream_quantile_profile_cleans_tmp(spark, tmp_path):
    """The re-landed events copy is removed after the fold (r12
    review: unbounded /tmp growth across sweeps)."""
    import glob
    from datetime import datetime, timedelta

    from dask_grblas_spark.streaming.windows import (
        stream_quantile_profile)

    t0 = datetime(2024, 5, 1)
    rows = [(i, t0 + timedelta(seconds=i), 1, "click", float(i), "{}")
            for i in range(50)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    df.coalesce(1).write.mode("overwrite") \
      .parquet(str(tmp_path / "events.parquet"))
    before = set(glob.glob("/tmp/dgs_squant_*"))
    out = stream_quantile_profile(spark, str(tmp_path), k=32,
                                  phis=(0.5,))
    assert out.count() == 1
    assert set(glob.glob("/tmp/dgs_squant_*")) == before


# ---------------------------------------------------------------------------
# heavy hitters (canonical Misra-Gries, mergeable)
# ---------------------------------------------------------------------------

def _zipf_rows(spark, scale=1000, keys=200, shards=3):
    rows = [(f"k{i}", j, i % shards)
            for i in range(1, keys) for j in range(scale // i)]
    return spark.createDataFrame(rows, "key string, j int, shard int")


def _mg_replay(exact: dict, k: int):
    """Plain-Python canonical MG: subtract the (k+1)-th largest count,
    prune non-positive. Returns (items dict, err)."""
    if len(exact) <= k:
        return dict(exact), 0
    s = sorted(exact.values(), reverse=True)[k]
    return {key: c - s for key, c in exact.items() if c > s}, s


def test_heavy_hitters_bounds_presence_and_replay(spark):
    df = _zipf_rows(spark)
    exact = {r["key"]: r["c"] for r in
             df.groupBy("key").agg(F.count("*").alias("c")).collect()}
    n = sum(exact.values())
    out = sketches.heavy_hitters_query(
        sketches.heavy_hitters_build(df, "key", k=10)).collect()
    assert 0 < len(out) <= 10
    err = out[0]["err"]
    assert out[0]["n"] == n and err <= n // 11
    for r in out:   # containment: true count inside [est_lo, est_hi]
        assert r["est_lo"] <= exact[r["key"]] <= r["est_hi"]
    present = {r["key"] for r in out}
    for key, c in exact.items():   # presence: c > err guaranteed kept
        if c > err:
            assert key in present
    # the summary IS the canonical MG reduction, bit for bit
    items, s = _mg_replay(exact, 10)
    assert err == s
    assert {r["key"]: r["est_lo"] for r in out} == items


def test_heavy_hitters_partition_stable(spark):
    df = _zipf_rows(spark)
    a = sketches.heavy_hitters_build(df, "key", k=7).collect()
    b = sketches.heavy_hitters_build(df.repartition(13), "key",
                                     k=7).collect()
    key = lambda r: (r["_meta"], r["_key"] or "", r["_c"] or 0)
    assert len(a) > 0
    assert sorted(a, key=key) == sorted(b, key=key)


def test_heavy_hitters_exact_when_small(spark):
    df = spark.createDataFrame(
        [(f"k{i}", j) for i in range(5) for j in range(i + 1)],
        "key string, j int")
    out = sketches.heavy_hitters_query(
        sketches.heavy_hitters_build(df, "key", k=10)).collect()
    assert {r["key"]: r["est_lo"] for r in out} == \
        {f"k{i}": i + 1 for i in range(5)}
    assert all(r["err"] == 0 and r["est_hi"] == r["est_lo"]
               for r in out)


def test_heavy_hitters_equal_counts_keeps_meta(spark):
    """All counts equal and d > k: every item prunes away, but the
    meta row still carries (n, err) so downstream merges stay
    correct — the merge-robust encoding."""
    eq = spark.createDataFrame(
        [(f"e{i}", j) for i in range(30) for j in range(4)],
        "key string, j int")
    sk = sketches.heavy_hitters_build(eq, "key", k=5)
    assert sk.where("not _meta").count() == 0
    meta = sk.where("_meta").collect()
    assert len(meta) == 1 and meta[0]["_n"] == 120 \
        and meta[0]["_err"] == 4
    merged = sketches.heavy_hitters_merge([sk, sk], k=5)
    mm = merged.where("_meta").collect()[0]
    assert mm["_n"] == 240 and mm["_err"] == 8


def test_heavy_hitters_merge_bounds_and_order_free(spark):
    df = _zipf_rows(spark)
    exact = {r["key"]: r["c"] for r in
             df.groupBy("key").agg(F.count("*").alias("c")).collect()}
    n = sum(exact.values())
    shards = [sketches.heavy_hitters_build(
        df.where(F.col("shard") == i), "key", k=10) for i in range(3)]
    m = sketches.heavy_hitters_merge(shards, k=10)
    out = sketches.heavy_hitters_query(m).collect()
    assert 0 < len(out) <= 10
    err = out[0]["err"]
    assert out[0]["n"] == n
    assert err <= 2 * n // 11   # one-shot multiway merge bound
    for r in out:
        assert r["est_lo"] <= exact[r["key"]] <= r["est_hi"]
    present = {r["key"] for r in out}
    for key, c in exact.items():
        if c > err:
            assert key in present
    # multiway merge is one order-free reduction: shard order is moot
    rev = sketches.heavy_hitters_merge(shards[::-1], k=10).collect()
    key = lambda r: (r["_meta"], r["_key"] or "", r["_c"] or 0)
    assert sorted(m.collect(), key=key) == sorted(rev, key=key)


def test_heavy_hitters_weighted_groups_null_key(spark):
    g = spark.createDataFrame(
        [("a", "x", 5), ("a", "x", 7), ("a", None, 100), ("b", "y", 2),
         ("a", "z", 1), ("b", None, None)],
        "grp string, key string, w int")
    sk = sketches.heavy_hitters_build(g, "key", k=2,
                                      group_cols=["grp"],
                                      weight_col="w")
    rows = sorted(((r["grp"], r["key"] or "", r["est_lo"], r["err"])
                   for r in sketches.heavy_hitters_query(
                       sk, group_cols=["grp"]).collect()))
    # grp a: NULL=100, x=12, z=1; k=2 -> err = 3rd largest = 1
    # grp b: y=2, NULL weight is NULL -> c=0 -> d=2 <= k -> err=0 and
    # the zero-count key prunes (0 > 0 is false)
    assert rows == [("a", "", 99, 1), ("a", "x", 11, 1),
                    ("b", "y", 2, 0)]


def test_heavy_hitters_merge_empty_list_raises(spark):
    with pytest.raises(ValueError):
        sketches.heavy_hitters_merge([])


def test_stream_heavy_hitters_equals_batch_replay(spark, tmp_path):
    """The streaming MG fold (r12 session 2): per-micro-batch
    summaries (batch sets pinned to event_id % 4) merged order-free
    must equal the batch-mode replay — build per slice, one multiway
    merge — exactly. Also pins that the re-landed scratch dir is
    removed."""
    import glob as _glob
    from datetime import datetime, timedelta

    from dask_grblas_spark.streaming.windows import stream_heavy_hitters

    t0 = datetime(2024, 5, 1, 0, 0, 0)
    # user u appears ~ 40 - u times per type: a real head to find
    rows = []
    eid = 0
    for u in range(30):
        for rep in range(40 - u):
            rows.append((eid, t0 + timedelta(seconds=eid), u,
                         "click" if eid % 3 else "view",
                         1.0, "{}"))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    df.coalesce(1).write.mode("overwrite") \
      .parquet(str(tmp_path / "events.parquet"))
    got = sorted(map(tuple, stream_heavy_hitters(
        spark, str(tmp_path), k=5).collect()))
    shards = [sketches.heavy_hitters_build(
        df.where(F.pmod(F.col("event_id"), F.lit(4)) == b)
          .select("event_type", "user_id"),
        "user_id", k=5, group_cols=["event_type"]) for b in range(4)]
    merged = sketches.heavy_hitters_merge(shards, k=5,
                                          group_cols=["event_type"])
    want = sorted(map(tuple, sketches.heavy_hitters_query(
        merged, group_cols=["event_type"]).collect()))
    assert got == want and len(got) > 0
    assert _glob.glob("/tmp/dgs_shh_*") == []


def test_heavy_hitters_negative_weight_raises(spark):
    """MG needs additive non-negative masses; a negative aggregated
    weight raises in-plan instead of silently vanishing in the
    prune (r12 session-2 review finding)."""
    g = spark.createDataFrame([("x", 5), ("y", -2)],
                              "key string, w int")
    with pytest.raises(Exception, match="non-negative"):
        sketches.heavy_hitters_build(g, "key", k=4,
                                     weight_col="w").collect()


def test_heavy_hitters_weighted_equals_row_counted(spark):
    """The q326 gate equivalence (optimization r12): building the MG
    summary from per-key PRE-COUNTS via weight_col must equal the
    build over the raw rows bit for bit — summing integer pre-counts
    is the same aggregate as counting rows, and everything downstream
    (threshold, err, prune) sees identical counts. This is what lets
    the gate switch between the direct build (below the size gate)
    and the shared pre-aggregated build (above it) without changing
    the result."""
    from pyspark.sql import functions as F

    raw = spark.createDataFrame(
        [(i % 4, f"k{i % 7}") for i in range(200)]
        + [(0, "hot")] * 40 + [(1, "hot")] * 3 + [(2, None)] * 9,
        "sh int, key string")
    pre = raw.groupBy("sh", "key").agg(
        F.count("*").cast("bigint").alias("w"))
    key = lambda r: (r["_meta"], r["_key"] or "", r["_c"] or 0,
                     r["_n"], r["_err"])
    for sh in range(4):
        direct = sketches.heavy_hitters_build(
            raw.where(F.col("sh") == sh), "key", k=3)
        weighted = sketches.heavy_hitters_build(
            pre.where(F.col("sh") == sh), "key", k=3, weight_col="w")
        assert sorted(direct.collect(), key=key) \
            == sorted(weighted.collect(), key=key)

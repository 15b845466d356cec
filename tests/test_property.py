"""Property-based differential tests (hypothesis): random sparse data and
random descriptors, engine vs the pure-Python model.

Extends the reference's differential-oracle methodology (SURVEY.md
section 5.1) from fixed fixtures to generated ones. Each property drives
the FULL pipeline: plan construction, merge/mask/accum descriptor
handling, and Spark execution, then compares against tests/model.py.

Spark actions are slow (~100ms each), so examples are capped low but
cover the space far better than hand-picked fixtures; deadline disabled
(Spark's first action JIT-compiles).
"""

from __future__ import annotations

import operator

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import dask_grblas_spark as gb
from dask_grblas_spark import binary, monoid, semiring

from tests import model

SETTINGS = dict(max_examples=12, deadline=None,
                suppress_health_check=[HealthCheck.too_slow])

# values: small ints keep every monoid exact in FP64 and INT64 alike
values = st.integers(min_value=-8, max_value=8)
vec = st.dictionaries(st.integers(0, 9), values, max_size=8)
mat = st.dictionaries(st.tuples(st.integers(0, 5), st.integers(0, 5)),
                      values, max_size=12)

BINOPS = {"plus": operator.add, "times": operator.mul,
          "min": min, "max": max, "first": lambda a, b: a,
          "second": lambda a, b: b}
MONOIDS = {"plus": operator.add, "min": min, "max": max}


def _v(d, size=10):
    ks = sorted(d)
    return gb.Vector.from_values(ks, [d[k] for k in ks], size=size,
                                 dtype="INT64")


def _m(d, n=6):
    ks = sorted(d)
    return gb.Matrix.from_values([k[0] for k in ks], [k[1] for k in ks],
                                 [d[k] for k in ks], n, n, dtype="INT64")


@pytest.mark.usefixtures("spark")
class TestEwiseProperties:
    @given(a=vec, b=vec, op=st.sampled_from(sorted(BINOPS)))
    @settings(**SETTINGS)
    def test_ewise_add(self, a, b, op):
        got = _v(a).ewise_add(_v(b), binary[op], require_monoid=False) \
            .new().to_dict()
        assert got == model.ewise_add(a, b, BINOPS[op])

    @given(a=vec, b=vec, op=st.sampled_from(sorted(BINOPS)))
    @settings(**SETTINGS)
    def test_ewise_mult(self, a, b, op):
        got = _v(a).ewise_mult(_v(b), binary[op]).new().to_dict()
        assert got == model.ewise_mult(a, b, BINOPS[op])


@pytest.mark.usefixtures("spark")
class TestMatmulProperties:
    @given(A=mat, d=vec, mon=st.sampled_from(sorted(MONOIDS)),
           mul=st.sampled_from(sorted(BINOPS)))
    @settings(**SETTINGS)
    def test_mxv(self, A, d, mon, mul):
        v = {k: x for k, x in d.items() if k < 6}
        sr = getattr(semiring, f"{mon}_{mul}")
        got = _m(A).mxv(_v(v, 6), sr).new().to_dict()
        assert got == model.mxv(A, v, MONOIDS[mon], BINOPS[mul])

    @given(A=mat, B=mat, mon=st.sampled_from(sorted(MONOIDS)))
    @settings(**SETTINGS)
    def test_mxm_plus_and_monoids(self, A, B, mon):
        sr = getattr(semiring, f"{mon}_times")
        got = _m(A).mxm(_m(B), sr).new()
        want = model.mxm(A, B, MONOIDS[mon], operator.mul)
        assert {(i, j): v for (i, j), v in got.to_dict().items()} == want


@pytest.mark.usefixtures("spark")
class TestMergeProperties:
    @given(old=vec, new=vec, mask=vec,
           complement=st.booleans(), replace=st.booleans(),
           use_accum=st.booleans(), value_mask=st.booleans())
    @settings(**SETTINGS)
    def test_masked_update_full_descriptor_space(self, old, new, mask,
                                                 complement, replace,
                                                 use_accum, value_mask):
        w = _v(old)
        m = _v(mask)
        mk = gb.mask.ValueMask(m) if value_mask else gb.mask.StructuralMask(m)
        if complement:
            mk = ~mk
        accum = binary.plus if use_accum else None
        w(mask=mk, accum=accum, replace=replace) << _v(new)
        want = model.merge(
            old, new, accum=operator.add if use_accum else None,
            mask_keys=model.mask_keys_of(mask, value_mask),
            complement=complement, replace=replace)
        assert w.to_dict() == want

    @given(a=vec, mon=st.sampled_from(sorted(MONOIDS)))
    @settings(**SETTINGS)
    def test_reduce(self, a, mon):
        s = _v(a).reduce(monoid[mon]).new()
        if not a:
            assert s.is_empty
        else:
            acc = None
            for x in a.values():
                acc = x if acc is None else MONOIDS[mon](acc, x)
            assert s.value == acc


@pytest.mark.usefixtures("spark")
class TestExtractAssignProperties:
    @given(a=vec, idx=st.lists(st.integers(0, 9), min_size=1, max_size=6))
    @settings(**SETTINGS)
    def test_extract_list(self, a, idx):
        got = _v(a)[idx].new().to_dict()
        want = {p: a[t] for p, t in enumerate(idx) if t in a}
        assert got == want

    @given(a=vec, obj=vec,
           idx=st.lists(st.integers(0, 9), min_size=1, max_size=6,
                        unique=True))
    @settings(**SETTINGS)
    def test_assign_region_semantics(self, a, obj, idx):
        # w[idx] << obj(extracted shape): region gets exactly obj's
        # entries mapped through idx; entries OUTSIDE idx untouched
        w = _v(a)
        o = {p: v for p, v in obj.items() if p < len(idx)}
        w[idx] << _v(o, size=len(idx))
        want = {k: v for k, v in a.items() if k not in idx}
        for p, t in enumerate(idx):
            if p in o:
                want[t] = o[p]
        assert w.to_dict() == want


@pytest.mark.usefixtures("spark")
class TestAlgorithmProperties:
    @given(edges=st.sets(st.tuples(st.integers(0, 11), st.integers(0, 11)),
                         max_size=16))
    @settings(**SETTINGS)
    def test_connected_components_vs_union_find(self, edges):
        """FastSV hybrid CC (frontier rounds + periodic pointer jumps)
        vs a driver-side union-find on random edge sets — including
        self-loops, singletons, and multi-component topologies."""
        from dask_grblas_spark import algorithms as alg

        n = 12
        es = [(i, j) for i, j in edges if i != j]
        if es:
            rows = [e[0] for e in es] + [e[1] for e in es]
            cols = [e[1] for e in es] + [e[0] for e in es]
            A = gb.Matrix.from_values(rows, cols, [1] * len(rows),
                                      nrows=n, ncols=n)
        else:
            A = gb.Matrix.new("INT64", n, n)
        got = alg.connected_components(A).to_dict()

        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for i, j in es:
            parent[find(i)] = find(j)
        # expected label = component MINIMUM
        comp_min = {}
        for v in range(n):
            r = find(v)
            comp_min[r] = min(comp_min.get(r, v), v)
        expect = {v: comp_min[find(v)] for v in range(n)}
        assert got == expect


# ---- pipeline-layer properties (round 4 ops) ----------------------------

_doc_text = st.lists(st.sampled_from(["a", "bb", "ccc", "dd", "e"]),
                     min_size=0, max_size=40).map(" ".join)
_corpus = st.dictionaries(st.integers(0, 30), _doc_text,
                          min_size=1, max_size=12)


@given(docs=_corpus, chunk=st.integers(2, 12), overlap=st.integers(0, 4))
@settings(**SETTINGS)
def test_chunking_covers_every_token_exactly(spark, docs, chunk, overlap):
    """Dropping each chunk's leading `overlap` tokens (except chunk 0)
    and concatenating reconstructs the original token stream — i.e.
    windows tile the document exactly, no token lost or duplicated
    beyond the declared overlap."""
    from dask_grblas_spark.functions.packing import chunk_documents

    if overlap >= chunk:
        overlap = chunk - 1
    df = spark.createDataFrame(list(docs.items()),
                               "doc_id long, text string")
    rows = chunk_documents(df, chunk, overlap).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], {})[r["chunk_id"]] = \
            r["chunk_text"].split()
    for doc_id, text in docs.items():
        want = text.split()
        got = by_doc[doc_id]
        assert sorted(got) == list(range(len(got)))
        rebuilt = []
        for cid in sorted(got):
            toks = got[cid]
            rebuilt.extend(toks if cid == 0 else toks[overlap:])
        assert rebuilt == want, (doc_id, chunk, overlap)


@given(docs=_corpus, budget=st.integers(1, 30),
       shards=st.integers(1, 4))
@settings(**SETTINGS)
def test_packing_respects_budget_and_partitions_rows(spark, docs, budget,
                                                     shards):
    from dask_grblas_spark.functions.packing import pack_sequences

    df = spark.createDataFrame(list(docs.items()),
                               "doc_id long, text string")
    rows = pack_sequences(df, budget=budget, n_shards=shards).collect()
    assert len(rows) == len(docs)  # every doc assigned exactly once
    sums = {}
    singles = {}
    for r in rows:
        key = (r["shard"], r["pack_id"])
        sums[key] = sums.get(key, 0) + r["tok_len"]
        singles.setdefault(key, []).append(r["tok_len"])
    for key, s in sums.items():
        # a pack either fits the budget or is a single oversize doc
        assert s <= budget or len(singles[key]) == 1, (key, s)


@given(docs=_corpus)
@settings(**SETTINGS)
def test_unigram_logprob_bounds(spark, docs):
    """avg_nll is within [ -ln(max_p), -ln(min_p) ] of the corpus
    distribution and n_tokens matches the tokenization."""
    import math

    from dask_grblas_spark.functions.text import unigram_logprob

    df = spark.createDataFrame(list(docs.items()),
                               "doc_id long, text string")
    all_toks = [t for text in docs.values() for t in text.split()]
    if not all_toks:
        return
    from collections import Counter
    cnt = Counter(all_toks)
    total = len(all_toks)
    lo = -math.log(max(cnt.values()) / total)
    hi = -math.log(min(cnt.values()) / total)
    for r in unigram_logprob(df).collect():
        assert lo - 1e-6 <= r["avg_nll"] <= hi + 1e-6
        assert r["n_tokens"] == len(docs[r["doc_id"]].split())

"""Physical/optimized plan assertions — the scale contract.

Correctness tests prove WHAT is computed; these prove the plan is the one
we would want on a 1000-executor cluster: broadcast joins for small
operands, parquet filter pushdown + column pruning at the scan, the
masked-matmul semi-join BELOW the aggregation (shuffle shrinks before it
happens), and transpose as a zero-shuffle projection.
"""

import dask_grblas_spark as gb
from dask_grblas_spark import semiring
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_mxv_broadcasts_small_vector(spark, A, v):
    out = A.mxv(v.apply("abs").new(), semiring.plus_times).new()
    plan = _physical(out.df)
    assert "BroadcastHashJoin" in plan, plan


def test_masked_mxv_semi_join_below_aggregate(spark, A, v, sm):
    w = gb.Vector.new("INT64", 7)
    w(mask=sm.S) << A.mxv(v, semiring.plus_times)
    plan = _optimized(w.df)
    # tree prints parents first: a semi join printing AFTER the aggregate
    # sits BELOW it (applied before aggregation). The merge pipeline has
    # its own mask semi-join ABOVE the agg, so check the deepest one.
    agg_pos = plan.index("Aggregate")
    semi_pos = plan.rindex("LeftSemi")
    assert semi_pos > agg_pos, plan


def test_mask_broadcast_gated_by_size(spark, sm):
    """resolve_mask attaches the broadcast hint ONLY when the mask parent
    is provably small; a mask of unknown cardinality (matrix wrapped from
    an arbitrary DataFrame) must join as a plain shuffle semi-join — at
    100 TB a force-broadcast mask is a driver OOM."""
    from dask_grblas_spark.mask import resolve_mask

    hinted = resolve_mask(sm.S)[0]
    assert "ResolvedHint" in hinted._jdf.queryExecution().analyzed().toString()

    big = gb.Matrix.from_dataframe(
        spark.range(0, 100).select(F.col("id").alias("i"),
                                   (F.col("id") % 7).alias("j"),
                                   F.lit(1).alias("v")),
        nrows=1 << 40, ncols=1 << 40, dtype="INT64")
    unhinted = resolve_mask(big.S)[0]
    plan = unhinted._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in plan, plan


def test_parquet_filter_pushdown_and_column_pruning(spark):
    cust = spark.read.parquet(f"{SF}/customer.parquet")
    v = gb.Vector.from_dataframe(
        cust.select(F.col("c_custkey").alias("i"),
                    F.col("c_acctbal").alias("v")), dtype="FP64")
    v.size = 10_000
    out = v[0:50].new()
    plan = _physical(out.df)
    assert "PushedFilters: [" in plan
    # the range-extract predicate must reach the parquet scan
    assert "LessThan(c_custkey" in plan or "IsNotNull(c_custkey" in plan, plan
    # scan must read only the two projected columns, not the whole table
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "c_custkey" in read_schema and "c_acctbal" in read_schema
    assert "c_name" not in read_schema and "c_address" not in read_schema


def test_transpose_adds_no_shuffle(spark, A):
    plain = _physical(A.df)
    t = _physical(A.T.new().df)
    assert t.count("Exchange") == plain.count("Exchange")


def test_ewise_mult_single_shuffle_pair(spark, v, w):
    out = v.ewise_mult(w, "times").new()
    plan = _physical(out.df)
    # one equi-join: at most one exchange per side, no extra repartitions
    assert plan.count("Exchange") <= 2, plan


def test_reduce_rowwise_partial_aggregation(spark, A):
    out = A.reduce_rowwise("plus").new()
    plan = _physical(out.df)
    # Catalyst splits the agg into partial (map-side) + final: two
    # HashAggregate nodes around one exchange — map-side combine at scale
    assert plan.count("HashAggregate") >= 2, plan


def test_cosine_topk_executor_side_no_driver_collect(spark):
    """cosine_topk must build a lazy, fully distributed plan: block-
    replicated cogroup GEMM tiles, window re-rank — NO eager driver
    materialization of the candidate matrix (the 100 TB contract)."""
    from dask_grblas_spark.functions import similarity

    calls = spark.sparkContext.accumulator(0)

    @F.udf("array<double>")
    def vec_of(i):
        calls.add(1)
        return [float(i), 1.0, float(i % 3)]

    df = (spark.range(12)
          .select(F.col("id").alias("vec_id"), vec_of("id").alias("embedding")))
    out = similarity.cosine_topk(df, k=2, query_blocks=2, cand_blocks=3)
    # constructing the result ran NO job (the old design did toPandas here)
    assert calls.value == 0
    assert "FlatMapCoGroupsInPandas" in _physical(out)
    rows = out.collect()
    assert calls.value > 0
    per_query = {}
    for r in rows:
        per_query.setdefault(r.query_id, []).append(r)
    assert set(per_query) == set(range(12))
    for q, rs in per_query.items():
        assert sorted(r.rank for r in rs) == [1, 2]
        assert all(r.neighbor_id != q for r in rs)


def test_asof_join_single_exchange_no_range_join(spark):
    """The as-of join must be the union + window formulation: exactly
    one hash exchange on the key, a window scan, and NO join operator at
    all — a BroadcastNestedLoopJoin / range join here would be the
    quadratic-per-key plan that dies on a skewed 100 TB event log."""
    from dask_grblas_spark.functions import timeseries

    left = spark.createDataFrame(
        [(1, 10, 1)], "k long, ts long, lid long")
    right = spark.createDataFrame(
        [(1, 5, 2)], "k long, ts long, rid long")
    out = timeseries.asof_join(left, right, on="k",
                               left_ts="ts", right_ts="ts")
    plan = _physical(out.df if hasattr(out, "df") else out)
    assert "Join" not in plan, plan
    assert "Window" in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_rolling_agg_no_sliding_frame(spark):
    """r10: rolling_agg must NEVER plan a bounded sliding frame —
    Spark re-evaluates those per row (O(history x window): 399 s vs
    1.2 s on the 2M-row microbench). The probe-row rewrite uses only
    incremental unbounded-preceding frames; the window relation
    shuffles ONCE on the key (plus the rid groupBy/join, which is
    width-independent)."""
    from dask_grblas_spark.functions import timeseries

    ev = spark.createDataFrame(
        [(1, 10, 1.0, 1)],
        "user_id long, ts long, value double, event_id long")
    out = timeseries.rolling_agg(ev.withColumn(
        "ts", F.col("ts").cast("timestamp")))
    plan = _physical(out)
    # the window spec must be the incremental unbounded-preceding
    # frame, never a bounded sliding range
    assert "unboundedpreceding" in plan.lower(), plan
    import re
    assert not re.search(r"specifiedwindowframe\(rangeframe,"
                         r" -\d+", plan.lower()), plan
    # correctness of the rewrite on the 1-row frame
    r = out.collect()[0]
    assert r["roll_n"] == 1 and r["roll_sum"] == 1.0


def test_minhash_band_join_uses_hash_join_on_exact_keys(spark):
    """Band buckets join by EXACT key equality (band + array of min
    values) — a hash/sort-merge join, never a nested-loop: band-key
    equality is what keeps LSH candidate generation an equi-join at
    corpus scale."""
    from dask_grblas_spark.functions import dedup

    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d f")], "doc_id long, text string")
    out = dedup.minhash_lsh_pairs(docs, num_hashes=8, bands=4,
                                  threshold=0.1)
    plan = _physical(out)
    assert "NestedLoop" not in plan, plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) \
        or ("BroadcastHashJoin" in plan), plan


def test_bucketed_tables_join_without_exchange(spark):
    """Two tables bucketed+sorted on the join key with the same bucket
    count must join with ZERO Exchange (and no per-query Sort for the
    merge) — the write-once-shuffle-never co-location contract that
    makes repeated fact-to-fact joins affordable at 100 TB. The same
    join on plain parquet relations is the shuffle-both-sides contrast."""
    from dask_grblas_spark.sources.io import (table_from_catalog,
                                              table_to_bucketed)

    a = spark.range(10_000).select(F.col("id").alias("k"),
                                   (F.col("id") * 2).alias("x"))
    b = spark.range(10_000).select(F.col("id").alias("k"),
                                   (F.col("id") * 3).alias("y"))
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        table_to_bucketed(a, "t_bkt_a", "k", n_buckets=8)
        table_to_bucketed(b, "t_bkt_b", "k", n_buckets=8)
        joined = table_from_catalog("t_bkt_a").join(
            table_from_catalog("t_bkt_b"), on="k")
        plan = _physical(joined)
        assert "Exchange" not in plan, plan
        assert joined.count() == 10_000
        # contrast: the un-bucketed join shuffles both sides
        plain = _physical(a.join(b, on="k"))
        assert plain.count("Exchange") == 2, plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.sql("DROP TABLE IF EXISTS t_bkt_a")
        spark.sql("DROP TABLE IF EXISTS t_bkt_b")


def test_partitioned_write_prunes_directories(spark):
    """A filter on the partition column must prune at PLANNING time: the
    scan's file list only contains the matching partition directory —
    the 100 TB contract that a one-day query over a year of events reads
    1/365th of the files, not all footers."""
    import tempfile

    from dask_grblas_spark.sources.io import table_to_partitioned

    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/events_by_day"
        ev = spark.range(1000).select(
            F.col("id").alias("event_id"),
            (F.col("id") % 10).alias("day"),
            (F.col("id") * 1.5).alias("value"))
        table_to_partitioned(ev, path, "day")
        back = spark.read.parquet(path)
        one_day = back.filter(F.col("day") == 3)
        plan = _physical(one_day)
        import re
        pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
        assert pf and "day" in pf.group(1) and "= 3" in pf.group(1), plan
        # PushedFilters must NOT carry the partition predicate - it is
        # resolved at planning time, not at the footer
        assert one_day.count() == 100


def test_chunking_is_pure_map(spark):
    """chunk_documents must be a single scan — no Exchange anywhere."""
    from dask_grblas_spark.functions.packing import chunk_documents

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _physical(chunk_documents(docs, 128, 16))
    assert "Exchange" not in plan, plan


def test_packing_single_shard_exchange(spark):
    """pack_sequences pays exactly one exchange (the shard groupBy)
    feeding the per-shard Arrow scan."""
    from dask_grblas_spark.functions.packing import pack_sequences

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _physical(pack_sequences(docs, budget=256, n_shards=4))
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "FlatMapGroupsInPandas" in plan, plan


def test_decontaminate_broadcasts_benchmark(spark):
    """The benchmark gram set must broadcast — the corpus gram relation
    is never shuffled on the gram key."""
    from dask_grblas_spark.functions.retrieval import ngram_decontaminate

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _physical(ngram_decontaminate(docs, ["some benchmark text"]))
    # the gram-hash join itself must be a broadcast join (corpus grams
    # are never sort-merged); the single gram-keyed exchange allowed is
    # the benchmark set's own distinct INSIDE the broadcast build side
    assert "BroadcastHashJoin [gh" in plan, plan
    gram_exchanges = [line for line in plan.splitlines()
                      if "Exchange hashpartitioning(gh" in line]
    assert len(gram_exchanges) <= 1, plan


def test_mixture_sample_broadcasts_rates(spark):
    from dask_grblas_spark.functions.sampling import mixture_sample
    from pyspark.sql import functions as F

    docs = (spark.read.parquet(f"{SF}/documents.parquet")
            .withColumn("source", F.pmod(F.col("doc_id"), F.lit(4))))
    plan = _physical(mixture_sample(docs, "source"))
    assert "BroadcastHashJoin" in plan, plan


def test_bm25_broadcasts_query_vocabulary(spark):
    """Postings must be restricted via broadcast of the tiny query-term
    set — the corpus token explosion is never shuffled to meet it."""
    from dask_grblas_spark.functions.retrieval import bm25_topk

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _physical(bm25_topk(docs, [(1, "spark join")], k=5))
    assert "BroadcastHashJoin" in plan, plan


def test_tpch_volume_broadcasts_nation_lookups(spark):
    """q251 (Q7 shape): both nation lookups must broadcast; the only
    shuffle-exchanges are the fact joins + the final aggregate."""
    import __spark_entry__ as em
    plan = _physical(em.q251_tpch_volume(spark, SF))
    assert plan.count("BroadcastHashJoin") >= 2, plan


def test_array_hof_is_jvm_side_zero_shuffle(spark):
    """q261: the higher-order-function projection must stay JVM-side
    (Catalyst lambda expressions — interpreted, HOFs are outside
    codegen by design, but NEVER Python) with zero exchanges; the
    scan itself stays codegen'd (the `*(n)` marker)."""
    import __spark_entry__ as em
    plan = _physical(em.q261_array_hof(spark, SF))
    assert "Python" not in plan, plan
    assert "Exchange" not in plan, plan
    assert "*(1)" in plan, plan


def test_part_value_share_single_row_broadcast(spark):
    """q267 (Q11 shape): the global-threshold side is a 1-row
    aggregate joined via broadcast nested loop — the per-part rollup
    must NOT be re-shuffled to meet it."""
    import __spark_entry__ as em
    plan = _physical(em.q267_part_value_share(spark, SF))
    assert "BroadcastNestedLoopJoin" in plan, plan


def test_tpch_promo_broadcasts_part(spark):
    """q253 (Q14): the part dimension broadcasts; the month filter is
    pushed to the lineitem parquet scan."""
    import __spark_entry__ as em
    plan = _physical(em.q253_tpch_promo(spark, SF))
    assert "BroadcastHashJoin" in plan, plan
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan \
        or "GreaterThanOrEqual(l_shipdate" in plan, plan


def test_merge_into_rewrites_only_touched_partitions(spark, tmp_path):
    """merge_into_partitioned must leave untouched partitions'
    FILES physically intact (same paths + mtimes) — proof the write
    was partition-scoped, not a full-table rewrite."""
    import os

    from dask_grblas_spark.sources.io import merge_into_partitioned

    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, "a" if i % 2 else "b", float(i)) for i in range(20)],
        "id long, g string, v double")
    df.write.mode("overwrite").partitionBy("g").parquet(path)

    def files(part):
        d = os.path.join(path, f"g={part}")
        return sorted((f, os.path.getmtime(os.path.join(d, f)))
                      for f in os.listdir(d) if f.endswith(".parquet"))

    before_b = files("b")
    upd = spark.createDataFrame(
        [(1, "a", 100.0), (99, "a", 7.0)], "id long, g string, v double")
    back = merge_into_partitioned(spark, path, upd, "id", "g")
    got = {r["id"]: r["v"] for r in back.where("g = 'a'").collect()}
    assert got[1] == 100.0 and got[99] == 7.0 and got[3] == 3.0
    assert files("b") == before_b          # physically untouched
    assert back.where("g = 'b'").count() == 10


def test_write_version_manifest_via_hadoop_fs(spark, tmp_path):
    """write_version/read_version route the manifest through the
    Hadoop FileSystem API (r9 verdict item 3): an explicit file://
    URI — the scheme-resolved FS path, not driver os.* — must work
    end-to-end, and the manifest the Java FS wrote must be the
    commit point readers see."""
    import json
    import os

    from dask_grblas_spark.sources.io import (read_version,
                                              write_version)

    local = str(tmp_path / "vtab")
    uri = "file://" + local
    df1 = spark.createDataFrame([(1, 10.0)], "id long, v double")
    df2 = spark.createDataFrame([(1, 20.0)], "id long, v double")
    assert write_version(df1, uri) == 1
    assert write_version(df2, uri) == 2
    # the manifest exists on the local disk the URI points at and
    # carries both committed versions in order
    with open(os.path.join(local, "_versions.json")) as fh:
        assert json.load(fh) == [1, 2]
    assert not os.path.exists(
        os.path.join(local, "_versions.json.tmp"))
    assert [r["v"] for r in read_version(spark, uri, 1).collect()] \
        == [10.0]
    assert [r["v"] for r in read_version(spark, uri).collect()] \
        == [20.0]


def test_tpch_min_cost_supplier_plan(spark):
    """q315 (Q2 shape): the part slice and the nation⋈region lookup
    broadcast into the lineitem scan; the type/size predicates push
    to the part parquet scan; the top-100 is a TakeOrdered, never a
    global sort."""
    import __spark_entry__ as em
    plan = _physical(em.q315_tpch_min_cost_supplier(spark, SF))
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert "EqualTo(p_type,STANDARD)" in plan \
        or "PushedFilters: [IsNotNull(p_type)" in plan, plan


def test_tpch_important_stock_single_row_broadcast(spark):
    """q316 (Q11 fraction shape): the global total is a 1-row
    broadcast nested loop against the per-part rollup — no second
    shuffle of the rollup."""
    import __spark_entry__ as em
    plan = _physical(em.q316_tpch_important_stock(spark, SF))
    assert "BroadcastNestedLoopJoin" in plan, plan


def test_tpch_part_promotion_broadcasts_slices(spark):
    """q318 (Q20 shape): the red-part slice broadcasts into the
    date-pruned lineitem scan (filter pushed), and the dominance
    semi-join reaches supplier as LeftSemi."""
    import __spark_entry__ as em
    plan = _physical(em.q318_tpch_part_promotion(spark, SF))
    assert "BroadcastHashJoin" in plan, plan
    assert "LeftSemi" in plan, plan
    assert "GreaterThanOrEqual(l_shipdate" in plan, plan


def test_quantile_sketch_build_broadcasts_counts(spark):
    """The sketch build's count relation must come back as a
    BROADCAST join (a hash join on the group key would shuffle the
    full input and collapse onto one task for a hot group)."""
    from dask_grblas_spark.functions.sketches import (
        quantile_sketch_build)
    df = spark.range(10000).selectExpr(
        "pmod(id, 3) as g", "id as uid",
        "cast(id % 97 as double) as x")
    sk = quantile_sketch_build(df, "x", "uid", k=64, group_cols=["g"])
    plan = _physical(sk)
    assert "BroadcastHashJoin" in plan, plan
    # exactly one hash exchange total — the grouped COUNT's partial-
    # agg fold (tiny); the base itself is never repartitioned on g
    assert plan.count("Exchange hashpartitioning") <= 1, plan

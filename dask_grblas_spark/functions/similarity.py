"""Similarity search over an embedding column (array<float>).

- cosine_topk: brute-force exact top-k (the correctness baseline; O(n*m)
  pairs — use for moderate corpus sizes or as the verification oracle).
- hyperplane_lsh_*: random-hyperplane (sign) LSH bucketing — the scale
  path: candidates only form within matching buckets, turning the cross
  join into an equi-join. Recall is probabilistic; precision exact (every
  candidate is cosine-verified).
- ivf_topk: IVF-style coarse quantization — k-means-lite centroids chosen
  deterministically from the data, vectors assigned to nearest centroid,
  queries probe nprobe cells. All DataFrame ops; centroid assignment is a
  broadcast join.

All dot products are JVM-side higher-order functions (zip_with +
aggregate) — no Python UDFs.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["dot_expr", "norm_expr", "cosine_expr", "cosine_topk",
           "hyperplane_lsh_buckets", "hyperplane_lsh_pairs", "ivf_topk",
           "kmeans_assign", "random_projection", "label_centroids",
           "semantic_dedup_pairs", "quantize_int8",
           "hyperplane_lsh_pairs_between", "ranking_metrics",
           "knn_classify", "item_cf_topk", "grid_cluster",
           "mmr_rerank", "pq_codes", "mutual_knn_pairs",
           "centroid_outliers", "pca_power", "triplet_mining",
           "knn_label_disagreement"]


def dot_expr(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def norm_expr(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


# per-side tile height for the blocked GEMM: 4096x4096 tiles bound the
# per-tile score matrix to ~16.7M float64 entries (~134 MB), the real
# memory constraint (inputs are only rows x dim)
_TILE_ROWS = 4096


def cosine_topk(emb_df: DataFrame, query_df: DataFrame | None = None,
                k: int = 5, id_col: str = "vec_id",
                vec_col: str = "embedding",
                query_blocks: int | None = None,
                cand_blocks: int | None = None,
                quantize: int | None = None) -> DataFrame:
    """Exact top-k cosine neighbors for every query vector (defaults to
    self-query, excluding self matches). Output: (query_id, neighbor_id,
    cosine, rank); rank orders by (cosine DESC, neighbor_id).

    Physical plan: distributed BLOCKED GEMM — queries and candidates are
    hash-assigned to query_blocks x cand_blocks tiles, each side is
    replicated across the other's block axis (explode over a literal
    sequence), and every (qb, cb) tile is one cogrouped applyInPandas
    call computing a BLAS GEMM (Qn @ Mn.T) that emits only k partial
    rows per query; a window re-rank of the k * cand_blocks partials
    yields the exact global top-k. NOTHING touches the driver — both
    sides stay executor-resident Arrow batches, so the corpus can exceed
    any single machine (replication factor = the other side's block
    count, the standard block-matmul tradeoff). For sublinear search
    switch to ivf_topk / hyperplane_lsh_pairs.

    Block counts default to AUTO: ceil(rows / 4096) per side, sizing each
    tile's score matrix to ~16.7M entries — a 500-vector corpus runs one
    tile (no replication, no fan-out overhead) while a 10M-row corpus
    fans out proportionally. Pass explicit counts to override (e.g. to
    fit smaller executors).

    ``quantize``: round scores HALF-AWAY to this many decimals BEFORE
    ranking (the repo's round-before-rank discipline) so structurally
    tied cosines rank by the deterministic id tie-break instead of by
    GEMM-fold ulps — required when the rank itself is the exported
    contract (mutual_knn_pairs); None preserves raw-score ranking."""
    import pandas as pd

    if query_df is None:
        query_df = emb_df
    if cand_blocks is None:
        cand_blocks = max(1, -(-emb_df.count() // _TILE_ROWS))
    if query_blocks is None:
        query_blocks = (cand_blocks if query_df is emb_df
                        else max(1, -(-query_df.count() // _TILE_ROWS)))
    kk = k
    qz = quantize

    q = (query_df.select(F.col(id_col).alias("qid"),
                         F.col(vec_col).alias("qv"))
         .withColumn("qb", F.pmod(F.hash(F.col("qid")),
                                  F.lit(query_blocks)))
         .withColumn("cb", F.explode(F.sequence(
             F.lit(0), F.lit(cand_blocks - 1)))))
    c = (emb_df.select(F.col(id_col).alias("cid"),
                       F.col(vec_col).alias("cv"))
         .withColumn("cb", F.pmod(F.hash(F.col("cid")),
                                  F.lit(cand_blocks)))
         .withColumn("qb", F.explode(F.sequence(
             F.lit(0), F.lit(query_blocks - 1)))))

    def tile_topk(qpdf: "pd.DataFrame", cpdf: "pd.DataFrame") -> "pd.DataFrame":
        if qpdf.empty or cpdf.empty:
            return pd.DataFrame({"query_id": pd.Series(dtype="int64"),
                                 "neighbor_id": pd.Series(dtype="int64"),
                                 "cosine": pd.Series(dtype="float64")})
        qids = qpdf["qid"].to_numpy().astype("int64")
        Q = np.vstack(qpdf["qv"].to_numpy()).astype("float64")
        Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-300)
        cids = cpdf["cid"].to_numpy().astype("int64")
        M = np.vstack(cpdf["cv"].to_numpy()).astype("float64")
        Mn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-300)
        S = Qn @ Mn.T
        if qz is not None:
            # HALF-AWAY like SQL ROUND (np.round is half-to-even)
            S = np.floor(np.abs(S) * 10.0 ** qz + 0.5) \
                / 10.0 ** qz * np.sign(S)
        out_q, out_n, out_c = [], [], []
        for r in range(len(qids)):
            row = np.where(cids == qids[r], -np.inf, S[r])
            # partial top-k by (cosine desc, neighbor_id asc); keep every
            # candidate >= the kth-largest value so ties resolve by id
            if len(row) > kk:
                thresh = np.partition(row, len(row) - kk)[len(row) - kk]
                cand_idx = np.nonzero(row >= thresh)[0]
            else:
                cand_idx = np.arange(len(row))
            order = cand_idx[np.lexsort(
                (cids[cand_idx], -row[cand_idx]))][:kk]
            order = order[np.isfinite(row[order])]
            out_q.append(np.full(len(order), qids[r]))
            out_n.append(cids[order])
            out_c.append(row[order])
        return pd.DataFrame({"query_id": np.concatenate(out_q),
                             "neighbor_id": np.concatenate(out_n),
                             "cosine": np.concatenate(out_c)})

    partial = (q.groupBy("qb", "cb")
                .cogroup(c.groupBy("qb", "cb"))
                .applyInPandas(
                    tile_topk,
                    schema="query_id bigint, neighbor_id bigint, "
                           "cosine double"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(),
                                               F.col("neighbor_id"))
    return (partial.withColumn("rank", F.row_number().over(w))
                   .filter(F.col("rank") <= kk)
                   .select("query_id", "neighbor_id",
                           F.round(F.col("cosine"), 6).alias("cosine"),
                           "rank"))


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim).astype("float64").tolist()


def hyperplane_lsh_buckets(emb_df: DataFrame, id_col: str = "vec_id",
                           vec_col: str = "embedding", n_planes: int = 8,
                           n_tables: int = 4, dim: int = 64,
                           seed: int = 42) -> DataFrame:
    """Sign-LSH bucket assignment: bucket = bit pattern of sign(v . h) for
    n_planes random hyperplanes, repeated for n_tables independent tables.
    Output: (id, table, bucket). The hyperplanes are deterministic
    literals broadcast in the plan — no driver state at runtime."""
    out = []
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed + t)
        bucket = F.lit(0).cast("bigint")
        for p_i, plane in enumerate(planes):
            h = F.array(*[F.lit(float(x)) for x in plane])
            bit = (dot_expr(F.col(vec_col), h) > 0).cast("bigint")
            bucket = bucket + F.shiftleft(bit, p_i)
        out.append(emb_df.select(F.col(id_col).alias("id"),
                                 F.lit(t).alias("table"),
                                 bucket.alias("bucket")))
    res = out[0]
    for p in out[1:]:
        res = res.unionByName(p)
    return res


def hyperplane_lsh_pairs(emb_df: DataFrame, id_col: str = "vec_id",
                         vec_col: str = "embedding",
                         threshold: float = 0.95, n_planes: int = 8,
                         n_tables: int = 4, dim: int = 64,
                         seed: int = 42,
                         max_bucket_size: int | None = 1000) -> DataFrame:
    """Near-dup pairs via sign-LSH candidates + exact cosine verification.

    ``max_bucket_size`` is the skew guard (default ON, mirroring
    ``minhash_lsh_pairs``/``simhash_pairs``): a hot (table, bucket) cell
    holding f near-identical embeddings — precisely the near-dup
    workload, or degenerate vectors collapsing to one sign pattern —
    would otherwise put f^2/2 candidate rows in ONE join task. Cells
    over the cap switch from all-pairs to STAR expansion (every member
    vs the cell's min id): linear rows. Star candidates still pass the
    exact-cosine verification, so within an over-cap cell a member
    survives only if it verifies against the representative — the same
    documented connectivity trade as the MinHash cap (see
    minhash_lsh_pairs). Pass None for exact all-pairs candidates.
    Implemented as window aggregates over the bucket relation, not
    groupBy+join-back: the (table, bucket) shuffle the window pays is
    the one the self-join below needs anyway.

    r12 optimization (guide §2.4): the bucket assignment computes
    n_tables x n_planes array-dot products per row, and the relation
    feeds THREE plan branches (both self-join sides + the star
    branch) — unshared, the whole assignment pipeline re-ran per
    branch (the r12 before-plan: 28 scans, 0 reused exchanges).
    Size-gated materialization computes the tagged relation once at
    scale; below the gate the lazy plan stays."""
    from .materialize import materialize_if_large

    buckets = hyperplane_lsh_buckets(emb_df, id_col, vec_col, n_planes,
                                     n_tables, dim, seed)
    star = None
    if max_bucket_size is not None:
        wb = Window.partitionBy("table", "bucket")
        tagged = materialize_if_large(
            buckets.withColumn("_f", F.count("*").over(wb))
                   .withColumn("_rep", F.min("id").over(wb)))
        buckets = (tagged.filter(F.col("_f") <= max_bucket_size)
                         .select("id", "table", "bucket"))
        star = (tagged.filter((F.col("_f") > max_bucket_size)
                              & (F.col("id") != F.col("_rep")))
                      .select(F.col("_rep").alias("id_a"),
                              F.col("id").alias("id_b")))
    else:
        buckets = materialize_if_large(buckets)
    a = buckets.alias("a")
    b = buckets.alias("b")
    cand = (a.join(b, (F.col("a.table") == F.col("b.table"))
                   & (F.col("a.bucket") == F.col("b.bucket"))
                   & (F.col("a.id") < F.col("b.id")))
             .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b")))
    if star is not None:
        cand = cand.unionByName(star)
    cand = cand.distinct()
    vecs = emb_df.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("vec"))
    joined = (cand.join(vecs.withColumnRenamed("vid", "id_a")
                            .withColumnRenamed("vec", "va"), on="id_a")
                  .join(vecs.withColumnRenamed("vid", "id_b")
                            .withColumnRenamed("vec", "vb"), on="id_b"))
    cos = cosine_expr(F.col("va"), F.col("vb"))
    return (joined.withColumn("cosine", F.round(cos, 6))
                  .filter(F.col("cosine") >= threshold)
                  .select("id_a", "id_b", "cosine"))


def ivf_topk(emb_df: DataFrame, k: int = 5, n_cells: int | None = None,
             nprobe: int = 4, id_col: str = "vec_id",
             vec_col: str = "embedding", seed: int = 42) -> DataFrame:
    """IVF-flat ANN: centroids = deterministic sample of the corpus
    (cross-engine md5-hash pick, no RNG at runtime); each vector assigned
    to its nearest centroid cell (broadcast join over centroids); each
    query probes its nprobe nearest cells and ranks only those
    candidates. Every choice point (centroid pick, cell numbering, probe
    ranking) is deterministic with explicit tie-breaks, so the whole
    pipeline is reproducible in plain SQL and hard-oracled by the driver.

    At 100 TB: the cell assignment is one broadcast join + argmin over
    n_cells dot products; the search join hits ~nprobe/n_cells of the
    corpus instead of all of it. n_cells=None auto-sizes to ~sqrt(n)
    (power of two, clamped to [16, 65536]) — the standard IVF balance
    point where assignment work (n*cells) and probe work
    (n*nprobe*n/cells) meet; a FIXED cell count degrades toward
    brute-force as the corpus grows."""
    from .dedup import cross_hash60

    # the assignment crossJoin multiplies work by n_cells but PRESERVES
    # the input partitioning — a small-file corpus (one parquet file =
    # one partition) would score n_rows*n_cells cosines on one core.
    # Fan the corpus out to the session's parallelism first; a real
    # many-partition corpus skips this (no extra shuffle).
    par = emb_df.sparkSession.sparkContext.defaultParallelism
    if emb_df.rdd.getNumPartitions() < par:
        emb_df = emb_df.repartition(par)

    # Normalize each vector ONCE so every pairwise similarity is a plain
    # dot product — cosine_expr per pair would re-reduce both operands'
    # norms, tripling the per-candidate array work. Share one computed
    # copy across the THREE consuming plan branches (centroid pick,
    # assignment, probing) via an EAGER localCheckpoint rather than
    # persist(): a persist here would be a session-lifetime CacheManager
    # entry the operator can never unpersist (the returned plan reads it
    # lazily), leaking one entry per distinct input; checkpoint blocks
    # are instead released by the ContextCleaner as soon as the caller
    # drops the result plan. Eager, not lazy — a lazy checkpoint's
    # deferred materialization can outlive the triggering SQL execution
    # and spam benign "Failed to update accumulator" DAGScheduler ERRORs
    # (see dedup._doc_shingle_sets for the measured reproduction).
    nrm = norm_expr(F.col(vec_col))
    emb_df = (emb_df.select(id_col, vec_col)
                    .withColumn("_nrm", nrm)
                    .withColumn(vec_col,
                                F.transform(vec_col,
                                            lambda x: x / F.col("_nrm")))
                    .drop("_nrm")
                    .localCheckpoint(eager=True))

    if n_cells is None:
        # auto-size AFTER checkpointing: the count reads the
        # just-materialized blocks, not the raw input
        n = emb_df.count()
        n_cells = 16
        while n_cells * n_cells < n and n_cells < 65536:
            n_cells *= 2

    # deterministic "training": the n_cells vectors with the smallest
    # cross-engine hash of (seed, id); cell number = rank in that order
    # (NOT monotonically_increasing_id, which depends on partitioning)
    hk = cross_hash60(F.concat(F.lit(f"{seed}:"),
                               F.col("cid").cast("string")))
    w0 = Window.orderBy("hk", "cid")
    cents = (emb_df.select(F.col(id_col).alias("cid"),
                           F.col(vec_col).alias("cv"))
                   .withColumn("hk", hk)
                   .orderBy("hk", "cid").limit(n_cells)
                   .withColumn("cell", F.row_number().over(w0) - 1)
                   .select("cell", "cv"))
    cents = F.broadcast(cents)

    def scored_cells(df, vcol):
        # score on ROUNDED similarity with the cell id as tie-break: the
        # raw double is engine-arithmetic-sensitive at the last ulp,
        # which would make probe choice (and thus the result set)
        # unreproducible outside Spark
        return (df.crossJoin(cents)
                  .withColumn("sim",
                              F.round(dot_expr(F.col(vcol),
                                               F.col("cv")), 6))
                  .drop("cv"))

    def nearest_cells(df, vcol, n):
        scored = scored_cells(df, vcol)
        w = Window.partitionBy(df.columns[0]).orderBy(F.col("sim").desc(),
                                                      F.col("cell"))
        return (scored.withColumn("crank", F.row_number().over(w))
                      .filter(F.col("crank") <= n))

    base = emb_df.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("nv"))
    # n=1 assignment is an ARGMIN, not a ranking: max_by over
    # (sim, -cell) picks the best cell with the same deterministic
    # tie-break but as a hash aggregate — map-side partial combine means
    # only n rows shuffle (vs the window's n*n_cells row sort-shuffle).
    # The window path below stays for the top-nprobe probe ranking,
    # which genuinely needs n rows per key.
    assigned = (scored_cells(base, "nv")
                .groupBy("nid")
                .agg(F.max_by(
                    F.struct("cell", "nv"),
                    F.struct(F.col("sim"),
                             (-F.col("cell")).alias("_nc"))).alias("_a"))
                .select("nid", F.col("_a.nv").alias("nv"),
                        F.col("_a.cell").alias("cell")))
    queries = emb_df.select(F.col(id_col).alias("query_id"),
                            F.col(vec_col).alias("qv"))
    probes = nearest_cells(queries, "qv", nprobe).select("query_id", "qv", "cell")
    cand = (probes.join(assigned, on="cell")
                  .filter(F.col("query_id") != F.col("nid")))
    scored = cand.withColumn("cosine",
                             F.round(dot_expr(F.col("qv"), F.col("nv")), 6))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(),
                                               F.col("nid"))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k)
                  .select("query_id", F.col("nid").alias("neighbor_id"),
                          "cosine", "rank"))


def kmeans_assign(emb_df: DataFrame, k: int = 8, iters: int = 3,
                  id_col: str = "vec_id", vec_col: str = "embedding",
                  seed: int = 42) -> DataFrame:
    """Lloyd k-means over the embedding column, returning the final
    (vec_id, cluster) assignment — the corpus-curation clustering
    primitive (topic bucketing, diversity sampling, per-cluster quota
    mixing).

    Deterministic and cross-engine reproducible by construction (so the
    whole iterative pipeline hard-oracles in SQL):
    - init: the k vectors with the smallest cross-engine md5 hash of
      f"{seed}:{id}" (same idiom as ivf_topk's centroid pick), cluster
      number = rank in that order;
    - assignment: argmin squared-L2 on the 6-decimal-ROUNDED distance
      with cluster id as tie-break (raw doubles differ at the last ulp
      between engines);
    - update: per-dimension mean, each component ROUNDED to 6 decimals
      (quantizes away sum-order drift); an emptied cluster keeps its
      previous centroid.

    ``iters`` counts ASSIGNMENT passes: the loop runs iters-1 centroid
    updates and the final pass's assignment IS the output (r8: the old
    update-then-REassign tail re-scanned the corpus once more to apply
    a centroid update nothing else consumed — folding the final
    assignment into the last Lloyd pass saves one full scan per call;
    the SQL oracle generator emits the same recursion depth).

    Scale shape (MLlib-style): centroids are DRIVER-held between
    iterations — k*dim doubles, constant in corpus size — while every
    data pass is one executor-side scan. Assignment picks its physical
    form by k*dim: small codebooks become k in-plan literal-array
    distance expressions per row (no join, no shuffle, whole-stage
    codegen), large ones a BROADCAST-joined centroid relation with a
    max_by argmin (a 65k x 64 literal plan would blow up analysis);
    the update is one posexplode + (cluster, dim) groupBy whose partial
    aggregation reduces map-side to k*dim rows per partition."""
    from .dedup import cross_hash60

    emb = emb_df.select(F.col(id_col).alias("vid"),
                        F.col(vec_col).cast("array<double>").alias("v"))
    if emb.rdd.getNumPartitions() < (par := emb_df.sparkSession
                                     .sparkContext.defaultParallelism):
        emb = emb.repartition(par)
    emb = emb.localCheckpoint(eager=True)  # consumed 2*iters - 1 times

    hk = cross_hash60(F.concat(F.lit(f"{seed}:"),
                               F.col("vid").cast("string")))
    init = (emb.withColumn("hk", hk).orderBy("hk", "vid").limit(k)
               .select("v").collect())
    cents = [list(r["v"]) for r in init]
    # a corpus smaller than k seeds fewer centroids; the loop and the
    # SQL oracle both operate on the actual count
    k = len(cents)
    if k == 0:
        return emb.select(F.col("vid").alias(id_col),
                          F.lit(None).cast("bigint").alias("cluster"))

    # in-plan literals up to ~16k scalar constants; beyond that the
    # expression tree itself becomes the bottleneck (analyzer/codegen
    # cost per query), so large codebooks ride a broadcast join instead
    literal_ok = k * len(cents[0]) <= 16384 if cents[0] else True
    spark = emb.sparkSession

    def assign(cents):
        if literal_ok:
            dists = []
            for c, cv in enumerate(cents):
                clit = F.array(*[F.lit(float(x)) for x in cv])
                d = F.aggregate(F.zip_with(F.col("v"), clit,
                                           lambda a, b: (a - b) * (a - b)),
                                F.lit(0.0), lambda acc, x: acc + x)
                dists.append(F.struct(F.round(d, 6).alias("d"),
                                      F.lit(c).cast("bigint").alias("c")))
            return emb.withColumn("cluster",
                                  F.array_min(F.array(*dists)).getField("c"))
        cdf = spark.createDataFrame(
            [(c, cv) for c, cv in enumerate(cents)],
            "_c bigint, _cv array<double>")
        d = F.aggregate(F.zip_with(F.col("v"), F.col("_cv"),
                                   lambda a, b: (a - b) * (a - b)),
                        F.lit(0.0), lambda acc, x: acc + x)
        scored = (emb.crossJoin(F.broadcast(cdf))
                     .withColumn("_d", F.round(d, 6)))
        # argmin with the same (rounded dist, cluster) tie-break as the
        # literal path: max_by over the NEGATED struct ordering
        return (scored.groupBy("vid")
                      .agg(F.min_by(F.struct(F.col("_c").alias("cluster"),
                                             F.col("v").alias("v")),
                                    F.struct(F.col("_d"), F.col("_c")))
                           .alias("_a"))
                      .select("vid", F.col("_a.v").alias("v"),
                              F.col("_a.cluster").alias("cluster")))

    assigned = assign(cents)
    for _ in range(max(0, iters - 1)):
        # the 6-decimal quantization rides INSIDE the agg (F.round is
        # HALF_UP, same as the DuckDB oracle's ROUND) — a driver-side
        # Python round() would be half-to-even and could diverge on an
        # exact .5 tie at the 6th decimal
        means = (assigned.select("cluster",
                                 F.posexplode("v").alias("d", "val"))
                         .groupBy("cluster", "d")
                         .agg(F.round(F.avg("val"), 6).alias("m"))
                         .collect())
        upd = {}
        for r in means:
            upd.setdefault(r["cluster"], {})[r["d"]] = r["m"]
        cents = [
            [upd[c][d] for d in range(len(cents[c]))] if c in upd
            else cents[c]
            for c in range(k)]
        assigned = assign(cents)

    return assigned.select(F.col("vid").alias(id_col), "cluster")


def mutual_knn_pairs(emb_df: DataFrame, id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """Reciprocal nearest-neighbor matching: pairs (id_a, id_b) where
    each vector is the OTHER's single nearest neighbor by cosine — the
    bitext-mining / cross-corpus alignment filter (mutual top-1 matches
    are the high-precision correspondences; one-directional matches are
    mostly hubness noise).

    Built on the blocked-GEMM ``cosine_topk`` (k=1, executor-resident
    Arrow tiles — nothing touches the driver), then one grouped count
    over the n top-1 rows: a canonical (min, max) pair appears twice
    exactly when the match is mutual. Top-1 ties resolve by
    (ROUND(cosine, 6) DESC, neighbor_id) — the cosine is QUANTIZED
    before the rank (round-before-rank discipline) so structural ties
    rank by id in both engines instead of by GEMM-fold ulps, and the
    oracle replays the same ROW_NUMBER over ROUND(c, 6).
    Output: (id_a, id_b) with id_a < id_b."""
    top1 = cosine_topk(emb_df, k=1, id_col=id_col, vec_col=vec_col,
                       quantize=6)
    return (top1.select(F.least("query_id", "neighbor_id").alias("id_a"),
                        F.greatest("query_id", "neighbor_id")
                         .alias("id_b"))
                .groupBy("id_a", "id_b")
                .agg(F.count("*").alias("_n"))
                .where(F.col("_n") == 2)
                .select("id_a", "id_b"))


def triplet_mining(emb_df: DataFrame, label_col: str = "label",
                   id_col: str = "vec_id",
                   vec_col: str = "embedding",
                   query_blocks: int | None = None,
                   cand_blocks: int | None = None) -> DataFrame:
    """Hard-example mining for contrastive/triplet training: for every
    anchor vector, the HARDEST POSITIVE (least-similar vector of the
    SAME label, self excluded) and the HARDEST NEGATIVE (most-similar
    vector of a DIFFERENT label) by cosine — the pair selection that
    makes a metric-learning batch informative instead of trivial.

    Physical plan: the blocked-GEMM tile scheme of ``cosine_topk``
    (hash-assigned query x candidate tiles, each a cogrouped
    applyInPandas BLAS GEMM, executor-resident Arrow batches). Each
    tile emits ONE partial (pos, neg) candidate pair per anchor, so
    the re-rank relation is anchors x cand_blocks rows; two max_by/
    min_by aggregates pick the global extremes. Similarities QUANTIZE
    to 6 decimals half-away INSIDE the tile (round-before-rank) and
    ties break by neighbor id ascending, so the selection replays
    exactly in SQL. Anchors whose label has no other member emit a
    NULL positive (kept — the caller decides). Output: (vec_id, label,
    pos_id, pos_sim, neg_id, neg_sim)."""
    import pandas as pd

    if cand_blocks is None:
        cand_blocks = max(1, -(-emb_df.count() // _TILE_ROWS))
    if query_blocks is None:
        query_blocks = cand_blocks

    q = (emb_df.select(F.col(id_col).alias("qid"),
                       F.col(label_col).cast("bigint").alias("qlab"),
                       F.col(vec_col).alias("qv"))
         .withColumn("qb", F.pmod(F.hash(F.col("qid")),
                                  F.lit(query_blocks)))
         .withColumn("cb", F.explode(F.sequence(
             F.lit(0), F.lit(cand_blocks - 1)))))
    c = (emb_df.select(F.col(id_col).alias("cid"),
                       F.col(label_col).cast("bigint").alias("clab"),
                       F.col(vec_col).alias("cv"))
         .withColumn("cb", F.pmod(F.hash(F.col("cid")),
                                  F.lit(cand_blocks)))
         .withColumn("qb", F.explode(F.sequence(
             F.lit(0), F.lit(query_blocks - 1)))))

    def tile_extremes(qpdf: "pd.DataFrame",
                      cpdf: "pd.DataFrame") -> "pd.DataFrame":
        cols = {"qid": "int64", "qlab": "int64", "pos_id": "float64",
                "pos_sim": "float64", "neg_id": "float64",
                "neg_sim": "float64"}
        if qpdf.empty or cpdf.empty:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        qids = qpdf["qid"].to_numpy().astype("int64")
        qlabs = qpdf["qlab"].to_numpy().astype("int64")
        Q = np.vstack(qpdf["qv"].to_numpy()).astype("float64")
        Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True),
                            1e-300)
        cids = cpdf["cid"].to_numpy().astype("int64")
        clabs = cpdf["clab"].to_numpy().astype("int64")
        M = np.vstack(cpdf["cv"].to_numpy()).astype("float64")
        Mn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True),
                            1e-300)
        S = Qn @ Mn.T
        S = np.floor(np.abs(S) * 1e6 + 0.5) / 1e6 * np.sign(S)
        rows = {k: [] for k in cols}
        # candidate order by id so argmax/argmin on ties picks the
        # smallest neighbor id (np.argmax returns the FIRST max)
        order = np.argsort(cids, kind="stable")
        cids_o, clabs_o = cids[order], clabs[order]
        for r in range(len(qids)):
            srow = S[r][order]
            same = (clabs_o == qlabs[r]) & (cids_o != qids[r])
            diff = clabs_o != qlabs[r]
            rows["qid"].append(qids[r])
            rows["qlab"].append(qlabs[r])
            if same.any():
                i = np.flatnonzero(same)[np.argmin(srow[same])]
                rows["pos_id"].append(float(cids_o[i]))
                rows["pos_sim"].append(srow[i])
            else:
                rows["pos_id"].append(np.nan)
                rows["pos_sim"].append(np.nan)
            if diff.any():
                i = np.flatnonzero(diff)[np.argmax(srow[diff])]
                rows["neg_id"].append(float(cids_o[i]))
                rows["neg_sim"].append(srow[i])
            else:
                rows["neg_id"].append(np.nan)
                rows["neg_sim"].append(np.nan)
        return pd.DataFrame(rows)

    partial = (q.groupBy("qb", "cb")
                .cogroup(c.groupBy("qb", "cb"))
                .applyInPandas(
                    tile_extremes,
                    schema="qid bigint, qlab bigint, pos_id double, "
                           "pos_sim double, neg_id double, "
                           "neg_sim double"))
    # global extremes over the cand_blocks partials per anchor:
    # hardest positive = MIN sim (tie -> smaller id), hardest negative
    # = MAX sim (tie -> smaller id); NULL partials drop out of min_by/
    # max_by via the where-notnull pre-aggregates
    pos = (partial.where(F.col("pos_id").isNotNull())
                  .groupBy("qid")
                  .agg(F.min_by(
                      F.struct(F.col("pos_id"), F.col("pos_sim")),
                      F.struct(F.col("pos_sim"), F.col("pos_id")))
                      .alias("_p")))
    neg = (partial.where(F.col("neg_id").isNotNull())
                  .groupBy("qid")
                  .agg(F.max_by(
                      F.struct(F.col("neg_id"), F.col("neg_sim")),
                      F.struct(F.col("neg_sim"), -F.col("neg_id")))
                      .alias("_n")))
    anchors = partial.select("qid", "qlab").distinct()
    return (anchors.join(pos, on="qid", how="left")
                   .join(neg, on="qid", how="left")
                   .select(F.col("qid").alias("vec_id"),
                           F.col("qlab").alias("label"),
                           F.col("_p.pos_id").cast("bigint")
                            .alias("pos_id"),
                           F.col("_p.pos_sim").alias("pos_sim"),
                           F.col("_n.neg_id").cast("bigint")
                            .alias("neg_id"),
                           F.col("_n.neg_sim").alias("neg_sim")))


def knn_label_disagreement(emb_df: DataFrame, k: int = 5,
                           label_col: str = "label",
                           id_col: str = "vec_id",
                           vec_col: str = "embedding") -> DataFrame:
    """Label-noise screen by k-NN disagreement (confident-learning
    lite): for each vector, the fraction of its k cosine-nearest
    neighbors carrying a DIFFERENT label — a high score marks a likely
    mislabel or an off-distribution example, the first thing a
    labelled-corpus QA pass removes. Built on the blocked-GEMM
    ``cosine_topk`` with quantize=6 (round-before-rank: the exported
    counts depend on WHICH neighbors make the top-k, so the rank must
    be engine-invariant under ties). suspect flags score >= 0.5.
    Output: (vec_id, label, n_neighbors, n_diff, score, suspect)."""
    nn = cosine_topk(emb_df, k=k, id_col=id_col, vec_col=vec_col,
                     quantize=6)
    lab = emb_df.select(F.col(id_col).alias("neighbor_id"),
                        F.col(label_col).cast("bigint").alias("_nl"))
    own = emb_df.select(F.col(id_col).alias("query_id"),
                        F.col(label_col).cast("bigint").alias("label"))
    return (nn.join(lab, on="neighbor_id").join(own, on="query_id")
              .groupBy(F.col("query_id").alias("vec_id"), "label")
              .agg(F.count("*").cast("bigint").alias("n_neighbors"),
                   F.sum(F.when(F.col("_nl") != F.col("label"), 1)
                          .otherwise(0)).cast("bigint").alias("n_diff"))
              .select("vec_id", "label", "n_neighbors", "n_diff",
                      F.round(F.col("n_diff") / F.col("n_neighbors"), 6)
                       .alias("score"),
                      (F.col("n_diff") * 2 >= F.col("n_neighbors"))
                       .alias("suspect")))


def centroid_outliers(emb_df: DataFrame, label_col: str = "label",
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      z_thresh: float = 2.0) -> DataFrame:
    """Per-label centroid-distance outlier screen — the embedding-space
    mislabel / noise detector of a labelled-corpus QA pass: each
    vector's L2 distance to its OWN label's mean embedding
    (`label_centroids`, 6-decimal-rounded means), then the per-label
    population z-score of that distance from one power-sum aggregate
    (`zscore_outliers`' closed form). Flag z >= ``z_thresh``.

    Plan: one posexplode scan joined to the BROADCAST (label x dim)
    centroid relation, one (vid, label) distance agg, one bounded
    label-moment agg joined back broadcast — no window over raw rows.
    Zero-variance labels yield NULL z (engines disagree on x/0) and
    are never flagged. Output: (vec_id, label, dist, z, is_outlier),
    floats rounded 6."""
    cents = label_centroids(emb_df, label_col, vec_col) \
        .select("label", "dim", "centroid")
    ex = emb_df.select(
        F.col(id_col).alias("vid"),
        F.col(label_col).cast("bigint").alias("label"),
        F.posexplode(F.col(vec_col).cast("array<double>"))
         .alias("dim", "x"))
    dist = (ex.join(F.broadcast(cents), on=["label", "dim"])
              .groupBy("vid", "label")
              .agg(F.round(F.sqrt(F.sum(
                  (F.col("x") - F.col("centroid"))
                  * (F.col("x") - F.col("centroid")))), 6).alias("dist")))
    mom = (dist.groupBy("label")
               .agg(F.count("*").cast("double").alias("_n"),
                    F.sum("dist").alias("_s"),
                    F.sum(F.col("dist") * F.col("dist")).alias("_s2")))
    j = dist.join(F.broadcast(mom), on="label")
    var = (F.col("_n") * F.col("_s2") - F.col("_s") * F.col("_s")) \
        / (F.col("_n") * F.col("_n"))
    z = (F.col("dist") - F.col("_s") / F.col("_n")) / F.sqrt(var)
    return (j.withColumn("z", F.when(var > 0, F.round(z, 6)))
             .select(F.col("vid").alias(id_col), "label", "dist", "z",
                     F.coalesce(F.col("z") >= z_thresh,
                                F.lit(False)).alias("is_outlier")))


def pca_power(emb_df: DataFrame, iters: int = 8,
              id_col: str = "vec_id", vec_col: str = "embedding",
              ) -> DataFrame:
    """Top principal direction of the embedding cloud via MATRIX-FREE
    power iteration — the embedding-drift / dominant-axis diagnostic at
    corpus scale. Never materializes the covariance: each iteration is
    two passes with only dim-sized driver state (the kmeans-centroid
    shape): s_i = <x_i - mu, v> per row (pure column dot), then
    w = avg_i s_i (x_i - mu) via one posexplode aggregate, normalize on
    the driver. Deterministic and SQL-replayable by construction:
    mu and every aggregate component round to 6 IN THE AGG (F.round,
    HALF_UP — matches SQL ROUND); driver-side normalization quantizes
    with q6 = floor(x·1e6 + 0.5)/1e6 (the same expression the oracle's
    unrolled CTEs apply — NOT Python round(), which is half-to-even);
    v_0 = 1/sqrt(dim) uniform; the final sign is flipped so the
    lowest-index nonzero loading is positive.

    Output: (dim, loading, eigenvalue) — loading the unit top
    eigenvector component, eigenvalue its Rayleigh estimate ||C v||
    (both rounded 6)."""
    import math

    def q6(x: float) -> float:
        return math.floor(x * 1e6 + 0.5) / 1e6

    emb = emb_df.select(F.col(id_col).alias("vid"),
                        F.col(vec_col).cast("array<double>").alias("v"))
    emb = emb.localCheckpoint(eager=True)  # consumed iters + 1 times
    mu_rows = (emb.select(F.posexplode("v").alias("d", "x"))
                  .groupBy("d").agg(F.round(F.avg("x"), 6).alias("m"))
                  .collect())
    mu = {r["d"]: r["m"] for r in mu_rows}
    dim = len(mu)
    if dim == 0:
        spark = emb_df.sparkSession
        return spark.createDataFrame(
            [], "dim int, loading double, eigenvalue double")
    v = [q6(1.0 / math.sqrt(dim))] * dim
    lam = 0.0
    for _ in range(max(1, iters)):
        mu_arr = F.array(*[F.lit(float(mu[d])) for d in range(dim)])
        v_arr = F.array(*[F.lit(float(x)) for x in v])
        cent = F.zip_with(F.col("v"), mu_arr, lambda a, b: a - b)
        # s quantized round-6 before it feeds the w aggregate: the
        # oracle computes s as an UNORDERED SQL SUM (the engine fold is
        # ordered), so the quantization pins both to the same value
        # (round-before-rank discipline; ADVICE r8)
        s = F.round(
            F.aggregate(F.zip_with(cent, v_arr, lambda a, b: a * b),
                        F.lit(0.0), lambda acc, x: acc + x), 6)
        w_rows = (emb.withColumn("_s", s)
                     .select(F.posexplode(cent).alias("d", "x"), "_s")
                     .groupBy("d")
                     .agg(F.round(F.avg(F.col("x") * F.col("_s")), 6)
                           .alias("w"))
                     .collect())
        w = [0.0] * dim
        for r in w_rows:
            w[r["d"]] = r["w"]
        lam = q6(math.sqrt(sum(x * x for x in w)))
        if lam == 0.0:
            break
        v = [q6(x / lam) for x in w]
    flip = next((x for x in v if x != 0.0), 1.0) < 0
    if flip:
        v = [q6(-x) for x in v]
    spark = emb_df.sparkSession
    return spark.createDataFrame(
        [(d, float(v[d]), float(lam)) for d in range(dim)],
        "dim int, loading double, eigenvalue double")


def _projection_matrix(out_dim: int, dim: int,
                       seed: int = 42) -> list[list[float]]:
    """Seeded JL projection matrix (shared with the SQL oracle so both
    engines inline the IDENTICAL literals)."""
    rng = np.random.RandomState(seed)
    return (rng.randn(out_dim, dim) / np.sqrt(out_dim)).tolist()


def random_projection(emb_df: DataFrame, out_dim: int = 16,
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      dim: int = 64, seed: int = 42) -> DataFrame:
    """Johnson–Lindenstrauss random projection of the embedding column:
    proj_j = v . R_j / sqrt(out_dim) with R an out_dim x dim seeded
    Gaussian matrix — the standard dimensionality-reduction front end
    for ANN at 100 TB (project 768-dim model embeddings to 32–64 dims
    BEFORE the LSH/IVF stage; pairwise distances are preserved within
    (1 +- eps) for eps ~ sqrt(log n / out_dim)).

    The matrix rides in the PLAN as literals (same pattern as the LSH
    hyperplanes) so the op is one whole-stage-codegen'd projection: no
    shuffle, no UDF, no driver state at runtime, and the seeded
    literals make it replayable in any engine. Output is long-form
    (id, dim, value) with value rounded to 6 decimals — the exact
    cross-engine comparison shape."""
    R = _projection_matrix(out_dim, dim, seed)
    comps = []
    for row in R:
        h = F.array(*[F.lit(float(x)) for x in row])
        comps.append(F.round(dot_expr(F.col(vec_col), h), 6))
    return emb_df.select(F.col(id_col).alias("id"),
                         F.posexplode(F.array(*comps)).alias("dim", "value"))


def semantic_dedup_pairs(emb_df: DataFrame, threshold: float = 0.2,
                         k: int = 8, iters: int = 3,
                         id_col: str = "vec_id", vec_col: str = "embedding",
                         max_cluster_size: int | None = 1000,
                         seed: int = 42) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): k-means-cluster the embeddings, then form
    near-duplicate candidates only WITHIN a cluster and keep pairs whose
    exact cosine similarity reaches ``threshold``. Clustering turns the
    quadratic all-pairs comparison into k independent per-cluster
    comparisons — the standard way semantic dedup scales to web corpora
    (prune one member of each pair; the smaller id is the conventional
    keeper).

    Output: (cluster, id_a, id_b, cosine) with id_a < id_b and
    cosine = ROUND(dot / (|a| * |b|), 6) >= threshold.

    Scale shape: ``kmeans_assign`` is the driver-held-centroid Lloyd
    loop (one scan per pass); the pair stage is a self-equi-join on the
    cluster id, so candidate volume is sum_c(f_c^2)/2 — bounded when k
    tracks corpus size (clusters of ~constant size), NOT bounded when
    one cluster goes hot (an embedding-collapse or boilerplate mode).
    ``max_cluster_size`` is the same default-ON skew guard as the LSH
    paths (`dedup.py` minhash/simhash): clusters over the cap switch
    from all-pairs to STAR expansion against the cluster's min-id
    representative (linear rows, verified cosine, documented recall
    trade inside over-cap clusters; pass None for exact all-pairs).
    Norm-zero vectors are dropped up front: their cosine is undefined,
    and the engines disagree on x/0 (Spark gives NaN — which compares
    GREATER than any threshold — DuckDB gives NULL).

    Reference has no analogue; extension operator for LLM-corpus
    curation."""
    asg = kmeans_assign(emb_df, k=k, iters=iters, id_col=id_col,
                        vec_col=vec_col, seed=seed) \
        .select(F.col(id_col).alias("vid"), "cluster")
    emb = emb_df.select(F.col(id_col).alias("vid"),
                        F.col(vec_col).cast("array<double>").alias("v"))
    nrm = (emb.withColumn("n", norm_expr(F.col("v")))
              .filter(F.col("n") > 0))
    members = asg.join(nrm, on="vid")
    # consumed by both sides of the self-join (and the kmeans plan above
    # it is several iterations deep) — materialize once
    members = members.localCheckpoint(eager=True)
    if max_cluster_size is not None:
        wc = Window.partitionBy("cluster")
        tagged = (members.withColumn("_f", F.count("*").over(wc))
                         .withColumn("_rep", F.min("vid").over(wc)))
        members_j = (tagged.filter(F.col("_f") <= max_cluster_size)
                           .select("vid", "cluster"))
        star = (tagged.filter((F.col("_f") > max_cluster_size)
                              & (F.col("vid") != F.col("_rep")))
                      .select("cluster",
                              F.col("_rep").alias("id_a"),
                              F.col("vid").alias("id_b")))
    else:
        members_j, star = members.select("vid", "cluster"), None
    a, b = members_j.alias("a"), members_j.alias("b")
    cand = (a.join(b, (F.col("a.cluster") == F.col("b.cluster"))
                   & (F.col("a.vid") < F.col("b.vid")))
             .select(F.col("a.cluster").alias("cluster"),
                     F.col("a.vid").alias("id_a"),
                     F.col("b.vid").alias("id_b")))
    if star is not None:
        cand = cand.unionByName(star).distinct()
    # verification vectors come from the CHECKPOINTED members relation,
    # not from nrm: members = asg ⋈ nrm carries the same (vid, v, n)
    # rows (kmeans assigns every vid), and reading the materialized
    # blocks avoids two further parquet scans + norm recomputations
    # that the nrm lineage would re-run per join side (guide §2.4)
    va = members.select(F.col("vid").alias("id_a"),
                        F.col("v").alias("_va"), F.col("n").alias("_na"))
    vb = members.select(F.col("vid").alias("id_b"),
                        F.col("v").alias("_vb"), F.col("n").alias("_nb"))
    cos = F.round(dot_expr(F.col("_va"), F.col("_vb"))
                  / (F.col("_na") * F.col("_nb")), 6)
    return (cand.join(va, on="id_a").join(vb, on="id_b")
                .withColumn("cosine", cos)
                .filter(F.col("cosine") >= threshold)
                .select("cluster", "id_a", "id_b", "cosine"))


def label_centroids(emb_df: DataFrame, label_col: str = "label",
                    vec_col: str = "embedding") -> DataFrame:
    """Per-class prototype vectors: mean embedding per label (the
    nearest-centroid classifier / class-balance diagnostic over a
    labelled corpus). posexplode + (label, dim) groupBy — map-side
    partial aggregation reduces every partition to n_labels x dim rows
    before the shuffle, so the pass is one scan at any corpus size.
    Output long-form (label, dim, centroid, n) with the mean rounded to
    6 decimals (absorbs sum-order ulps across engines)."""
    return (emb_df.select(F.col(label_col).cast("bigint").alias("label"),
                          F.posexplode(F.col(vec_col).cast("array<double>"))
                           .alias("dim", "x"))
                  .groupBy("label", "dim")
                  .agg(F.round(F.avg("x"), 6).alias("centroid"),
                       F.count("*").cast("bigint").alias("n")))


def quantize_int8(df: DataFrame, vec_col: str = "embedding",
                  keep_codes: bool = False) -> DataFrame:
    """Symmetric per-vector int8 quantization of an embedding column —
    the standard 4x storage/bandwidth reduction before ANN indexing at
    100 TB embedding scale: scale = max|v_i| / 127 (1.0 for the zero
    vector), code_i = clamp(round_half_away(v_i / scale), -127, 127).

    Everything is a per-row array expression inside codegen — no
    shuffle, no UDF, a pure map over the corpus. The rounding is
    FLOOR(|x| + 0.5) * sign — double-bit-identical across engines,
    unlike decimal ROUND (see ewma's note on half-boundary divergence).

    Output adds: ``q_scale`` (rounded 6), ``q_mse`` (mean squared
    reconstruction error, rounded to 9 — element errors are O(scale)
    small), ``q_sum`` (sum of the int8 codes — a checksum that pins
    every code exactly), and the ``q_codes`` array itself when
    ``keep_codes``."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    amax = F.aggregate(v, F.lit(0.0),
                       lambda acc, x: F.greatest(acc, F.abs(x)))
    scale = F.when(amax == 0.0, F.lit(1.0)).otherwise(amax / F.lit(127.0))
    out = df.withColumn("_v", v).withColumn("_s", scale)
    code = F.transform(
        F.col("_v"),
        lambda x: F.greatest(
            F.lit(-127.0),
            F.least(
                F.lit(127.0),
                F.floor(F.abs(x / F.col("_s")) + F.lit(0.5))
                 .cast("double")
                * F.when(x < 0, F.lit(-1.0)).otherwise(F.lit(1.0))))
        .cast("int"))
    out = out.withColumn("q_codes", code)
    err2 = F.aggregate(
        F.zip_with(F.col("_v"), F.col("q_codes"),
                   lambda x, q: (x - q.cast("double") * F.col("_s"))
                   * (x - q.cast("double") * F.col("_s"))),
        F.lit(0.0), lambda acc, x: acc + x)
    out = (out.withColumn("q_scale", F.round(F.col("_s"), 6))
              .withColumn("q_mse",
                          F.round(err2 / F.greatest(F.size("_v"), F.lit(1)), 9))
              .withColumn("q_sum",
                          F.aggregate(F.col("q_codes"), F.lit(0).cast("bigint"),
                                      lambda acc, x: acc + x.cast("bigint"))))
    drop = ["_v", "_s"] + ([] if keep_codes else ["q_codes"])
    return out.drop(*drop)


def hyperplane_lsh_pairs_between(new_df: DataFrame, corpus_df: DataFrame,
                                 id_col: str = "vec_id",
                                 vec_col: str = "embedding",
                                 threshold: float = 0.95,
                                 n_planes: int = 8, n_tables: int = 4,
                                 dim: int = 64, seed: int = 42,
                                 max_bucket_size: int | None = 1000
                                 ) -> DataFrame:
    """Incremental embedding ingestion dedup: near-dups of NEW vectors
    against an EXISTING corpus — candidates form only ACROSS the split
    (the embedding sibling of ``dedup.minhash_lsh_pairs_between``).
    Both sides bucket with the SAME seeded hyperplanes, the join is an
    equi-join on (table, bucket), and every candidate is exact-cosine
    verified. Ids must be disjoint across the two sides.

    ``max_bucket_size`` caps the CORPUS side per (table, bucket) cell
    (first N ids — deterministic): a template bucket holding f corpus
    members would otherwise cost every colliding new vector f rows.
    New-side vectors are never dropped — each probes at most
    cap × n_tables corpus members. Output: (id_a=new, id_b=corpus,
    cosine)."""
    nb = hyperplane_lsh_buckets(new_df, id_col, vec_col, n_planes,
                                n_tables, dim, seed) \
        .withColumnRenamed("id", "id_a")
    cb = hyperplane_lsh_buckets(corpus_df, id_col, vec_col, n_planes,
                                n_tables, dim, seed) \
        .withColumnRenamed("id", "id_b")
    if max_bucket_size is not None:
        wb = Window.partitionBy("table", "bucket").orderBy("id_b")
        cb = (cb.withColumn("_rn", F.row_number().over(wb))
                .where(F.col("_rn") <= max_bucket_size)
                .drop("_rn"))
    cand = (nb.join(cb, on=["table", "bucket"])
              .select("id_a", "id_b").distinct())
    va = new_df.select(F.col(id_col).alias("id_a"),
                       F.col(vec_col).alias("va"))
    vb = corpus_df.select(F.col(id_col).alias("id_b"),
                          F.col(vec_col).alias("vb"))
    cos = cosine_expr(F.col("va"), F.col("vb"))
    return (cand.join(va, on="id_a").join(vb, on="id_b")
                .withColumn("cosine", F.round(cos, 6))
                .filter(F.col("cosine") >= threshold)
                .select("id_a", "id_b", "cosine"))


def pq_codes(emb_df: DataFrame, n_sub: int = 8, k: int = 16,
             iters: int = 2, dim: int = 64, id_col: str = "vec_id",
             vec_col: str = "embedding", seed: int = 42) -> DataFrame:
    """Product-quantization code assignment (Jégou et al.): split each
    d-dim vector into ``n_sub`` contiguous subvectors and run the
    deterministic Lloyd k-means (kmeans_assign — hash init, rounded
    distances/centroids, tie-broken argmin) INDEPENDENTLY per
    subspace; a vector's code word is its per-subspace cluster id.
    The compressed representation behind large-scale ANN re-ranking:
    n_sub bytes per vector at k <= 256 instead of d floats.

    Each subspace is its own small clustering job over one slice
    projection of the corpus (no cross-subspace shuffle); the per-
    subspace init/update discipline is exactly kmeans_assign's, so the
    whole pipeline replays in SQL. Output: (vec_id, sub, code) —
    exploded long form (n_sub rows per vector)."""
    if dim % n_sub != 0:
        raise ValueError("dim must divide evenly into n_sub subspaces")
    d_sub = dim // n_sub
    # materialize the cast base ONCE: every subspace slices from the
    # checkpointed relation instead of re-scanning the source 8x
    base = (emb_df.select(F.col(id_col),
                          F.col(vec_col).cast("array<double>")
                           .alias("_v"))
                  .localCheckpoint(eager=True))
    def _train(s: int) -> DataFrame:
        sl = base.select(
            F.col(id_col),
            F.slice(F.col("_v"), s * d_sub + 1, d_sub)
             .alias("embedding"))
        asg = kmeans_assign(sl, k=k, iters=iters, id_col=id_col,
                            vec_col="embedding", seed=seed)
        return asg.select(F.col(id_col), F.lit(s).alias("sub"),
                          F.col("cluster").cast("int").alias("code"))

    # guide §2.6 (overlap independent jobs): the n_sub trainings are
    # fully independent — each clusters its own slice of the ONE
    # checkpointed base — but each training is a chain of small
    # BLOCKING driver-sync jobs (init collect + per-iteration centroid
    # collect), so running them sequentially leaves the cluster idle
    # during every sync. A small thread pool overlaps the chains (one
    # subspace's collect overlaps another's scan; FIFO scheduling
    # back-fills the tail). Per-subspace lineage, seeds, and the
    # subspace-ordered union are byte-identical to the sequential
    # form — only job submission overlaps.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=min(4, n_sub)) as pool:
        outs = list(pool.map(_train, range(n_sub)))
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


def mmr_rerank(cand_df: DataFrame, emb_df: DataFrame, k: int = 5,
               lam: float = 0.7, query_col: str = "query_id",
               id_col: str = "vec_id", rel_col: str = "rel",
               vec_col: str = "embedding") -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    1998): greedily select k of each query's candidates maximizing
    lam·rel - (1-lam)·max cosine to the already-selected — the standard
    diversity re-rank between retrieval and the context window (RAG
    dedup-at-selection).

    The greedy is inherently sequential in k, but each step is ONE
    distributed job over ALL queries simultaneously: anti-join the
    selected set, join the precomputed pairwise-cosine relation
    (bounded: per-query candidates², computed once), a max-penalty
    aggregate, a per-query row_number argmax, eager checkpoint. Every
    compared quantity is rounded to 6 decimals with an id tie-break,
    so the greedy trajectory is engine-invariant and the oracle
    replays it as k unrolled CTE rounds.

    Output: (query, rank, id, score) — rank 1..k in selection order;
    step-1 score is the relevance itself, later steps the MMR
    objective. Queries with fewer than k candidates return them all."""
    if k < 1:
        raise ValueError("mmr_rerank requires k >= 1")
    cand = cand_df.select(
        F.col(query_col).alias("query"), F.col(id_col).alias("id"),
        F.round(F.col(rel_col).cast("double"), 6).alias("rel"))
    emb = emb_df.select(F.col(id_col).alias("id"),
                        F.col(vec_col).alias("v"))
    ce = (cand.join(emb, on="id")
              .select("query", "id", "rel", "v")
              .localCheckpoint(eager=True))
    a = ce.select("query", F.col("id").alias("id_a"),
                  F.col("v").alias("va"))
    b = ce.select("query", F.col("id").alias("id_b"),
                  F.col("v").alias("vb"))
    sims = (a.join(b, on="query")
             .where(F.col("id_a") != F.col("id_b"))
             .select("query", "id_a", "id_b",
                     F.round(cosine_expr(F.col("va"), F.col("vb")), 6)
                      .alias("sim"))
             .localCheckpoint(eager=True))
    w = Window.partitionBy("query").orderBy(F.col("score").desc(), "id")
    sel = (ce.select("query", "id", F.col("rel").alias("score"))
             .withColumn("_rn", F.row_number().over(w))
             .where(F.col("_rn") == 1)
             .select("query", "id", F.col("score"),
                     F.lit(1).alias("rank"))
             .localCheckpoint(eager=True))
    for step in range(2, k + 1):
        rem = ce.select("query", "id", "rel") \
                .join(sel.select("query", "id"),
                      on=["query", "id"], how="left_anti")
        # sim rows whose id_b is currently selected, keyed for the
        # candidate side (id_a)
        sel_sims = (sims.join(sel.select("query",
                                         F.col("id").alias("id_b")),
                              on=["query", "id_b"])
                        .select("query", F.col("id_a").alias("id"),
                                "sim"))
        pen = (rem.join(sel_sims, on=["query", "id"])
                  .groupBy("query", "id", "rel")
                  .agg(F.max("sim").alias("pen")))
        score = F.round(F.lit(float(lam)) * F.col("rel")
                        - F.lit(1.0 - float(lam)) * F.col("pen"), 6)
        pick = (pen.withColumn("score", score)
                   .withColumn("_rn", F.row_number().over(w))
                   .where(F.col("_rn") == 1)
                   .select("query", "id", "score",
                           F.lit(step).alias("rank")))
        sel = sel.unionByName(pick).localCheckpoint(eager=True)
    return sel.select("query", "rank", "id", "score")


def ranking_metrics(retrieved: DataFrame, truth: DataFrame, k: int = 5,
                    query_col: str = "query_id",
                    item_col: str = "neighbor_id",
                    rank_col: str = "rank") -> DataFrame:
    """Retrieval evaluation (the feedback loop of every ANN/BM25
    pipeline): per-query recall@k and reciprocal rank@k of ``retrieved``
    (query, item, rank) against the relevant ``truth`` (query, item)
    pairs. Queries with no truth rows are omitted; queries whose truth
    found nothing retrieved score 0.

    Two bounded joins (truth × retrieved-top-k on (query, item)), one
    per-query aggregate — no window over raw retrievals. Output:
    (query_id, n_rel, n_hit, recall, rr), floats rounded to 6."""
    r = (retrieved.where(F.col(rank_col) <= k)
         .select(F.col(query_col).alias("q"),
                 F.col(item_col).alias("it"),
                 F.col(rank_col).alias("rk")))
    t = truth.select(F.col(query_col).alias("q"),
                     F.col(item_col).alias("it")).distinct()
    hits = t.join(r, on=["q", "it"], how="left")
    return (hits.groupBy("q")
                .agg(F.count("*").cast("bigint").alias("n_rel"),
                     F.count("rk").cast("bigint").alias("n_hit"),
                     F.round(F.count("rk") / F.count("*"), 6)
                      .alias("recall"),
                     F.round(F.coalesce(
                         F.lit(1.0) / F.min("rk"), F.lit(0.0)), 6)
                      .alias("rr"))
                .select(F.col("q").alias("query_id"), "n_rel", "n_hit",
                        "recall", "rr"))


def knn_classify(emb_df: DataFrame, k: int = 5, id_col: str = "vec_id",
                 vec_col: str = "embedding",
                 label_col: str = "label") -> DataFrame:
    """k-NN label prediction by cosine majority vote (leave-one-out
    over the corpus itself): each vector's k nearest neighbors vote
    with their labels; ties break toward the smaller label. Built on
    the blocked-GEMM ``cosine_topk`` (executor-resident tiles), so the
    distance pass scales like q35; the vote is one bounded aggregate
    over k rows per query.

    Output: (query_id, pred_label, votes)."""
    nn = cosine_topk(emb_df, k=k, id_col=id_col, vec_col=vec_col)
    lab = emb_df.select(F.col(id_col).alias("neighbor_id"),
                        F.col(label_col).alias("_nl"))
    votes = (nn.join(lab, on="neighbor_id")
               .groupBy(F.col("query_id"), F.col("_nl"))
               .agg(F.count("*").alias("votes")))
    best = (votes.groupBy("query_id")
                 .agg(F.max_by(
                     F.struct(F.col("_nl").alias("l"),
                              F.col("votes").alias("n")),
                     F.struct(F.col("votes"), -F.col("_nl"))).alias("_b")))
    return best.select("query_id",
                       F.col("_b.l").cast("int").alias("pred_label"),
                       F.col("_b.n").cast("bigint").alias("votes"))


def item_cf_topk(df: DataFrame, user_col: str, item_col: str,
                 min_co: int = 2, top_k: int = 5,
                 max_user_items: int = 100) -> DataFrame:
    """Item-item collaborative filtering: cosine similarity over the
    binary user-item co-occurrence matrix, top-k neighbors per item —
    the classic 'customers who bought X also bought' recommender.
    sim(i, j) = co(i, j) / sqrt(n_i * n_j) with n_i = distinct users
    of item i and co = users holding both.

    Scale shape: the pair generation self-joins the (user, item)
    relation on user — a power user with u items fans out u^2/2 pair
    rows, so ``max_user_items`` caps each user's contribution
    (deterministic (user, item-order) truncation; the standard CF
    hub-user guard — a user holding everything carries no signal).
    Item counts come from the same capped relation (so sim stays an
    exact cosine OF THE CAPPED matrix); ranking windows run per item
    over the bounded co-pair relation. Output:
    (item, neighbor, co, sim rounded 6, rank <= top_k)."""
    ui = (df.select(F.col(user_col).alias("u"),
                    F.col(item_col).alias("i"))
            .distinct())
    if max_user_items is not None:
        wu = Window.partitionBy("u").orderBy("i")
        ui = (ui.withColumn("_r", F.row_number().over(wu))
                .where(F.col("_r") <= max_user_items).drop("_r"))
    ui = ui.localCheckpoint()  # shared: counts + pair self-join
    ni = ui.groupBy("i").agg(F.count("*").cast("bigint").alias("n"))
    a, b = ui.alias("a"), ui.alias("b")
    co = (a.join(b, (F.col("a.u") == F.col("b.u"))
                 & (F.col("a.i") < F.col("b.i")))
           .groupBy(F.col("a.i").alias("ia"), F.col("b.i").alias("ib"))
           .agg(F.count("*").cast("bigint").alias("co"))
           .where(F.col("co") >= min_co))
    sim = (co.join(ni.select(F.col("i").alias("ia"),
                             F.col("n").alias("na")), on="ia")
             .join(ni.select(F.col("i").alias("ib"),
                             F.col("n").alias("nb")), on="ib")
             .withColumn("sim", F.round(
                 F.col("co") / F.sqrt(F.col("na") * F.col("nb")), 6)))
    # r12 optimization (guide §2.4): both direction branches of the
    # union below consume `sim` — unshared, the u^2/2-fan-out co-pair
    # self-join + aggregation re-ran per branch (r12 before-plan: 15
    # Exchanges, 12 SortMergeJoins, 0 reused). Size-gated
    # materialization of the slim (>= min_co) pair relation computes
    # the heavy stage once at scale; lazy below the gate.
    from .materialize import materialize_if_large
    sim = materialize_if_large(
        sim.select("ia", "ib", "co", "sim"))
    both = (sim.select(F.col("ia").alias("item"),
                       F.col("ib").alias("neighbor"), "co", "sim")
               .unionByName(
                   sim.select(F.col("ib").alias("item"),
                              F.col("ia").alias("neighbor"),
                              "co", "sim")))
    w = Window.partitionBy("item").orderBy(F.col("sim").desc(),
                                           F.col("neighbor"))
    return (both.withColumn("rank", F.row_number().over(w).cast("int"))
                .where(F.col("rank") <= top_k))


def grid_cluster(emb_df: DataFrame, id_col: str = "vec_id",
                 vec_col: str = "embedding", eps: float = 0.05,
                 min_pts: int = 10) -> DataFrame:
    """Grid-density clustering (DBSCAN-lite) over the first two
    embedding dimensions: points land in eps-sided grid cells, cells
    holding >= min_pts points are CORE, core cells merge across the
    8-neighborhood via the engine's connected-components loop, points
    in non-core cells are noise — the density-based alternative to
    k-means that needs no k and marks outliers.

    This is the cell-graph trick that makes DBSCAN scale: all pairwise
    work collapses to one groupBy onto the OCCUPIED-CELL relation
    (bounded by data extent / eps^2, not by points), a 9-way literal
    offset explode for adjacency, and CC on the core-cell graph
    (FastSV, log-diameter rounds). No point-to-point distance joins.
    Cluster label = min cell key in the component. Output:
    (cluster, n_cells, n_points) plus a cluster = -1 noise row."""
    from dask_grblas_spark import Matrix
    from dask_grblas_spark import algorithms as _alg

    x = F.element_at(F.col(vec_col), 1).cast("double")
    y = F.element_at(F.col(vec_col), 2).cast("double")
    pts = emb_df.select(
        F.col(id_col).alias("id"),
        F.floor(x / F.lit(float(eps))).cast("bigint").alias("cx"),
        F.floor(y / F.lit(float(eps))).cast("bigint").alias("cy"))
    pts = pts.localCheckpoint()  # shared: core cells + point labeling
    key = ((F.col("cx") + 100_000) * 1_000_000
           + (F.col("cy") + 100_000)).alias("k")
    core = (pts.groupBy("cx", "cy")
               .agg(F.count("*").cast("bigint").alias("n"))
               .where(F.col("n") >= min_pts)
               .select("cx", "cy", key))
    core = core.localCheckpoint()
    offs = F.expr("explode(transform(sequence(0, 8), "
                  "o -> struct(o div 3 - 1 as dx, o % 3 - 1 as dy)))")
    nb = (core.select("k", "cx", "cy", offs.alias("_o"))
              .select("k",
                      (F.col("cx") + F.col("_o.dx")).alias("ncx"),
                      (F.col("cy") + F.col("_o.dy")).alias("ncy")))
    other = core.select(F.col("cx").alias("ncx"),
                        F.col("cy").alias("ncy"),
                        F.col("k").alias("nk"))
    edges = (nb.join(other, on=["ncx", "ncy"])
               .select(F.col("k").alias("i"), F.col("nk").alias("j"),
                       F.lit(1).cast("bigint").alias("v")))
    A = Matrix.from_dataframe(edges, dtype="INT64")
    comp = _alg.connected_components(A, vertices="edges")
    cells = core.join(comp.df.select(F.col("i").alias("k"),
                                     F.col("v").alias("cluster")),
                      on="k")
    labeled = pts.join(F.broadcast(cells.select("cx", "cy", "k",
                                                "cluster")),
                       on=["cx", "cy"], how="left")
    clusters = (labeled.where(F.col("cluster").isNotNull())
                       .groupBy("cluster")
                       .agg(F.count_distinct("k").cast("bigint")
                             .alias("n_cells"),
                            F.count("*").cast("bigint")
                             .alias("n_points")))
    noise = (labeled.where(F.col("cluster").isNull())
                    .agg(F.lit(-1).cast("bigint").alias("cluster"),
                         F.lit(0).cast("bigint").alias("n_cells"),
                         F.count("*").cast("bigint").alias("n_points")))
    return clusters.unionByName(noise)

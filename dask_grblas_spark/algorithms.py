"""Graph algorithms as Pregel-style DataFrame iteration over the engine's
semiring primitives.

The reference expresses these as mxv loops in notebooks (FastSV connected
components in notebooks/'Connected Components -- FastSV.ipynb', SSSP
min_plus in notebooks/Examples.ipynb). BASELINE.json suggests GraphX
Pregel; GraphX has NO Python API in Apache Spark, so the idiomatic PySpark
equivalent is what GraphFrames does under the hood: DataFrame
message-aggregation loops. Each iteration is

    candidates = frontier (vxm) A          -- broadcast join when frontier
                                              is small, shuffle join + AQE
                                              otherwise
    improved   = candidates better-than current  -- left join + filter
    state      = merge improved                  -- union merge
    frontier   = improved

with persist + localCheckpoint per iteration to cut lineage growth
(mandatory for loops — SURVEY.md section 4 'Checkpointing iterative
algorithms'). The adjacency matrix is repartitioned ONCE on the join key
and cached, so per-iteration work reuses the same partitioning.

Scale design (100 TB): frontier-based algorithms ship only the CHANGED
entries each round; the adjacency stays partitioned in place. Dense-state
algorithms (PageRank, CC labels) keep state as a hash-partitioned
DataFrame co-partitioned with the adjacency — each step is one co-located
join + one aggregation.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .core import GrMatrix, GrVector, get_session
from .dtypes import FP64, INT64
from .operators import semiring

__all__ = ["bfs_level", "sssp", "connected_components", "pagerank",
           "triangle_count", "symmetrize", "with_singletons", "k_core",
           "hits", "adamic_adar", "clustering_coefficient",
           "label_propagation", "neighborhood_jaccard",
           "personalized_pagerank", "degree_assortativity",
           "reciprocity", "katz_centrality", "k_truss",
           "capped_hub_count", "eccentricity", "harmonic_centrality",
           "modularity", "rich_club", "degree_histogram"]

# Lineage growth between checkpoints is GEOMETRIC for min-merge loops:
# each iteration's state plan nests the previous state ~3x (improved
# references labels, merge references labels + improved), so the plan
# tree between checkpoints grows ~3^k nodes and the DRIVER starts
# spending its time in generateTreeString (every job start stringifies
# the executed plan for the SQL listener — InMemoryRelation innerChildren
# included, so persist() does NOT cap it). Measured on a 100k-vertex /
# 1M-edge graph: checkpoint-every-5 left the driver single-threaded in
# TreeNode.generateTreeString for minutes; every-2 (GraphFrames' default
# checkpointInterval) bounds the tree at ~9x base and removed the stall.
_CHECKPOINT_EVERY = 2
# connected_components runs a FastSV pointer-jump round every _JUMP_EVERY
# iterations (see the loop body for the cost/convergence trade)
_JUMP_EVERY = 4

# Loop-shuffle sizing: NO session-conf mutation. The adjacency is
# repartitioned ONCE with a partition count derived from its measured
# edge count (_prep_adjacency), the frontier side of each step broadcasts,
# and AQE's runtime coalescing sizes the remaining state shuffles —
# measured equal-or-faster than a scoped `spark.sql.shuffle.partitions`
# override, without mutating state another concurrent query on the same
# session would silently inherit.


def symmetrize(A: GrMatrix) -> GrMatrix:
    """A | A.T with max combine (undirected view of a directed graph)."""
    return A.ewise_add(A.T, "max").new()


def _improved(cand_df: DataFrame, cur_df: DataFrame) -> DataFrame:
    """Entries of cand that are new or strictly smaller than current —
    the GraphBLAS `w(accum=min)` frontier trick as one left join."""
    c = cand_df.alias("c")
    o = cur_df.alias("o")
    return (c.join(o, F.col("c.i") == F.col("o.i"), "left_outer")
             .filter(F.col("o.v").isNull() | (F.col("c.v") < F.col("o.v")))
             .select(F.col("c.i").alias("i"), F.col("c.v").alias("v")))


def _merge_min(cur_df: DataFrame, imp_df: DataFrame) -> DataFrame:
    """Overwrite current entries with improved ones (imp wins)."""
    o = cur_df.alias("o")
    keep = o.join(imp_df.select("i"), on="i", how="left_anti")
    return keep.unionByName(imp_df)


_EDGE_ROWS_PER_PARTITION = 1_000_000
_MIN_EDGE_ROWS_PER_PARTITION = 65_536


def _vertex_range(spark, n: int) -> DataFrame:
    """``spark.range(n)`` with a ROW-COUNT-SIZED split count instead of
    the default ``defaultParallelism`` splits (r13, guide §2 scale-
    adaptive partitioning): a 25-vertex frame on local[32] otherwise
    carries 32 near-empty splits through EVERY loop round (AQE cannot
    coalesce a leaf Range, and the per-round persists pin whatever
    partitioning they inherit), while a 10^9-vertex frame still fans
    out by the same ~rows-per-partition rule as `_prep_adjacency`."""
    return spark.range(0, n, 1,
                       numPartitions=_adjacency_partitions(int(n)))


def _adjacency_partitions(nvals: int) -> int:
    """Partition count for a measured edge count.

    Three regimes: tiny graphs collapse to 1 partition (a fixpoint loop
    runs dozens of stages, and 32 near-empty task launches per stage
    would dominate); mid-size graphs fan out to every core as soon as
    each task still gets >=64k edges (a 2M-edge graph on 32 cores must
    NOT run as 2 tasks — measured 16x under-parallelized); huge graphs
    are sized by ~1M edges/partition so per-task state stays bounded on
    a 1000-executor cluster regardless of its core count."""
    spark = get_session()
    par = spark.sparkContext.defaultParallelism
    by_rows = -(-nvals // _EDGE_ROWS_PER_PARTITION)
    fill_cores = min(-(-nvals // _MIN_EDGE_ROWS_PER_PARTITION), par)
    return max(1, fill_cores, by_rows)


class _PersistPool:
    """Tracks every DataFrame an iterative loop persists so the
    algorithm can release ALL of them on exit. Spark's CacheManager
    keeps cache entries until explicitly unpersisted — per-iteration
    frontier/state persists that merely fall out of Python scope
    accumulate across runs and degrade the whole session. Release only
    after the RESULT has been eagerly checkpointed: until then its plan
    may still read these caches."""

    def __init__(self):
        self._dfs = []

    def persist(self, obj):
        obj.persist()
        self._dfs.append(obj.df)
        return obj

    def release(self):
        for df in self._dfs:
            try:
                df.unpersist()
            except Exception:
                pass
        self._dfs.clear()


def _ensure_cached(df: DataFrame) -> tuple[DataFrame, bool]:
    """Materialize a DataFrame once at the session's FULL shuffle
    parallelism if it is not already cached. Iterative algorithms consume
    their input adjacency from multiple plan branches (A and A.T inside
    symmetrize, P and outdeg in pagerank) and across dozens of loop
    stages — an uncached heavy fact join (e.g. orders⋈lineitem in
    sources/tpch.py) would otherwise be recomputed per branch on every
    iteration."""
    if df.is_cached:
        return df, False
    df = df.persist()
    df.count()
    return df, True


def _prep_adjacency(A: GrMatrix) -> tuple[DataFrame, bool]:
    """Hash-partition the adjacency by source vertex ONCE, with the
    partition count sized by the measured edge count (~1M edges/partition)
    rather than the session's `shuffle.partitions`: a 625-edge graph gets
    1 partition (32 near-empty task launches per stage would dominate a
    fixpoint loop that runs dozens of stages), a 10^9-edge graph gets
    1000. Every iteration's join then reuses this exchange.

    Returns (adjacency, owned): when the input is ALREADY a cached small
    relation, it is reused as-is (owned=False — the caller must not
    unpersist a cache it shares with others): frontier sides broadcast,
    so source-vertex partitioning is only a locality optimization for the
    huge-frontier shuffle-join path, worthless below one partition's
    worth of edges."""
    base, own_base = _ensure_cached(A.df)
    nvals = base.count()
    k = _adjacency_partitions(nvals)
    try:
        base_parts = base.rdd.getNumPartitions()
    except Exception:
        base_parts = None
    if k == 1 and base_parts is not None and base_parts <= 4:
        return base, own_base
    adj = base.repartition(k, "i").persist()
    adj.count()
    if own_base:
        base.unpersist()
    return adj, True


def _loop_parts(adj: DataFrame) -> int:
    """Partition count for PER-ROUND loop state (frontier / labels /
    changed-set persists). A `persist()` pins whatever pre-AQE
    partitioning the plan has — on local[32] a 25-row frontier cached
    at 32 near-empty partitions costs 32 task launches per read, per
    round (r13; the same pathology `_cached_build` fixes for the
    derived inputs). Loop state is bounded by the vertex set, which is
    bounded by ~2x the measured edge count, so the adjacency's own
    row-sized partition count (already computed by `_prep_adjacency`)
    is the right order for every per-round relation: tiny graphs
    coalesce to 1, huge graphs keep their fan-out (`coalesce` only
    ever narrows)."""
    try:
        return max(1, adj.rdd.getNumPartitions())
    except Exception:
        return 1


def bfs_level(A: GrMatrix, source: int) -> GrVector:
    """Level-synchronous BFS: frontier vxm with the any_pair semiring,
    complement-mask pushdown keeps visited vertices out of the join."""
    n = A.nrows
    adj, own_adj = _prep_adjacency(A)
    kparts = _loop_parts(adj)
    Aprep = GrMatrix(adj, A.dtype, A.nrows, A.ncols)
    levels = GrVector.from_values([source], [0], size=n, dtype=INT64)
    frontier = levels.dup()
    level = 0
    pool = _PersistPool()
    while frontier.nvals > 0:
        level += 1
        cand = frontier.vxm(Aprep, semiring.any_pair)
        # mask pushdown: unvisited only (anti join BEFORE the agg)
        new_frontier = cand.new(mask=~levels.S)
        new_df = new_frontier.df.select(
            "i", F.lit(level).cast("bigint").alias("v"))
        levels = GrVector(levels.df.unionByName(new_df), INT64, n)
        frontier = pool.persist(GrVector(new_df.coalesce(kparts),
                                         INT64, n))
        if level % _CHECKPOINT_EVERY == 0:
            # cut BOTH lineages: levels grows by union, and the
            # frontier plan nests every previous level's plan —
            # without this the driver spends minutes in
            # generateTreeString on deep trees
            levels.checkpoint(compact=True)
            frontier.checkpoint()
    levels.checkpoint(compact=True)
    pool.release()
    if own_adj:
        adj.unpersist()
    return levels


def sssp(A: GrMatrix, source: int) -> GrVector:
    """Single-source shortest paths, min_plus to fixpoint (reference SSSP
    loop in notebooks/Examples.ipynb). Frontier = vertices whose distance
    improved last round (delta-relaxation)."""
    n = A.nrows
    adj, own_adj = _prep_adjacency(A)
    kparts = _loop_parts(adj)
    Aprep = GrMatrix(adj, A.dtype, A.nrows, A.ncols)
    dist = GrVector.from_values([source], [0.0], size=n, dtype=FP64)
    frontier = dist.dup()
    it = 0
    pool = _PersistPool()
    while frontier.nvals > 0:
        it += 1
        cand = frontier.vxm(Aprep, semiring.min_plus).new()
        imp_df = _improved(cand.df, dist.df)
        frontier = pool.persist(GrVector(imp_df.coalesce(kparts),
                                         FP64, n))
        if frontier.nvals == 0:
            break
        dist = GrVector(_merge_min(dist.df, frontier.df), FP64, n)
        if it % _CHECKPOINT_EVERY == 0:
            dist.checkpoint(compact=True)
            frontier.checkpoint()
    dist.checkpoint(compact=True)
    pool.release()
    if own_adj:
        adj.unpersist()
    return dist


def connected_components(A: GrMatrix, vertices: str = "all") -> GrVector:
    """Min-label propagation (FastSV-style semantics: reference notebook
    'Connected Components -- FastSV.ipynb' converges on min labels via
    min_second mxv; here labels flow with the min_first semiring since the
    moving value rides on the LEFT/vector side of vxm).

    vertices="all" (GraphBLAS semantics): labels start as vertex ids for
    ALL n vertices via ``spark.range(n)`` — isolated vertices are their
    own component. vertices="edges" (the SPARSE-ID scale mode): the label
    frame is the DISTINCT EDGE ENDPOINTS, so vertex ids may be arbitrary
    64-bit values (hashed doc ids) where range(n) with n = max_id + 1
    is impossible; vertices with no incident edge simply don't appear
    (callers union them back as singletons if needed). Only changed
    labels are re-propagated in either mode."""
    if vertices not in ("all", "edges"):
        raise ValueError("vertices must be 'all' or 'edges'")
    spark = get_session()
    n = A.nrows
    # cache the raw adjacency BEFORE symmetrize: A | A.T reads A from two
    # plan branches, and Spark does not dedupe the underlying fact join
    raw, own_raw = _ensure_cached(A.df)
    Asym = symmetrize(GrMatrix(raw, A.dtype, A.nrows, A.ncols))
    adj, own_adj = _prep_adjacency(Asym)
    if own_raw:
        raw.unpersist()
    kparts = _loop_parts(adj)
    Aprep = GrMatrix(adj, Asym.dtype, n, n)
    if vertices == "edges":
        # symmetrized adjacency: every endpoint appears as a row id, so
        # the distinct i column IS the vertex set — no densification
        labels_df = adj.select("i").distinct().select(
            "i", F.col("i").cast("bigint").alias("v"))
    else:
        labels_df = _vertex_range(spark, n).select(
            F.col("id").alias("i"),
            F.col("id").cast("bigint").alias("v"))
    labels = GrVector(labels_df.coalesce(kparts), INT64, n)
    pool = _PersistPool()
    pool.persist(labels)
    changed = labels
    it = 0
    while changed.nvals > 0:
        it += 1
        # candidate label for j = min over in-neighbors i of label[i]
        cand = changed.vxm(Aprep, semiring.min_first).new()
        imp_df = _improved(cand.df, labels.df)
        if it % _JUMP_EVERY:
            # cheap frontier round: only the improved entries move
            changed = pool.persist(GrVector(imp_df.coalesce(kparts),
                                            INT64, n))
            if changed.nvals == 0:
                break
            old = labels
            labels = pool.persist(
                GrVector(_merge_min(labels.df, changed.df)
                         .coalesce(kparts), INT64, n))
            if it % _CHECKPOINT_EVERY == 0:
                labels.checkpoint(compact=True)
                changed.checkpoint()
            old.unpersist()
            continue
        # FastSV shortcut round (pointer jumping): l[i] <- l[l[i]].
        # Labels are vertex ids with the invariant l[v] <= v, so l is
        # defined at every label value and jumping only decreases. Run
        # every _JUMP_EVERY-th round: neighbor propagation alone is
        # O(diameter) rounds — O(n) on a path-like graph (road networks,
        # near-dup chains) — while a periodic shortcut halves pointer
        # depth per jump, bounding the loop at O(log n) jump phases.
        # Small-diameter graphs finish before paying for many jumps.
        # Cost: two n-row self-joins, so not done every round.
        merged = pool.persist(
            GrVector(_merge_min(labels.df, imp_df).coalesce(kparts),
                     INT64, n))
        m = merged.df.alias("m")
        p = merged.df.alias("p")
        jumped_df = (m.join(p, F.col("m.v") == F.col("p.i"), "left_outer")
                      .select(F.col("m.i").alias("i"),
                              F.least(F.col("m.v"),
                                      F.coalesce(F.col("p.v"),
                                                 F.col("m.v"))).alias("v")))
        old = labels
        labels = pool.persist(GrVector(jumped_df.coalesce(kparts),
                                       INT64, n))
        # re-propagate every vertex whose label moved this round (by
        # neighbor min OR by shortcut — a shortcut move must still be
        # announced to neighbors)
        chg_df = (labels.df.alias("nw")
                  .join(old.df.alias("od"), F.col("nw.i") == F.col("od.i"))
                  .filter(F.col("nw.v") < F.col("od.v"))
                  .select(F.col("nw.i").alias("i"),
                          F.col("nw.v").alias("v")))
        changed = pool.persist(GrVector(chg_df.coalesce(kparts),
                                        INT64, n))
        changed.nvals  # materialize labels+changed BEFORE the unpersists
        if it % _CHECKPOINT_EVERY == 0:
            labels.checkpoint(compact=True)
            changed.checkpoint()
        old.unpersist()
        merged.unpersist()
    labels.checkpoint(compact=True)
    pool.release()
    if own_adj:
        adj.unpersist()
    return labels


def with_singletons(labels: GrVector, vertices: DataFrame,
                    id_col: str = "i") -> GrVector:
    """Union isolated vertices back into a ``connected_components(...,
    vertices="edges")`` label vector as their own singleton components.

    edges-mode CC labels only the DISTINCT EDGE ENDPOINTS (the point of
    the sparse-id scale mode — no ``range(max_id)`` densification), so a
    vertex with no incident edge silently disappears from the result.
    This helper closes that gap for the general caller: every id in
    ``vertices`` that is absent from ``labels`` comes back labelled with
    itself. One anti-join + union — no shuffle beyond the join's, and
    the anti-join broadcasts when the label side is small.

    ``vertices`` is any DataFrame with the full vertex universe in
    ``id_col`` (duplicates fine — deduped here)."""
    verts = (vertices.select(F.col(id_col).cast("bigint").alias("i"))
                     .distinct())
    lonely = (verts.join(labels.df.select("i"), on="i", how="left_anti")
                   .select("i", F.col("i").cast("bigint").alias("v")))
    return GrVector(labels.df.unionByName(lonely), labels.dtype,
                    labels.size)


def k_core(A: GrMatrix, k: int) -> GrVector:
    """k-core decomposition by iterative peeling: repeatedly delete
    vertices whose degree in the surviving subgraph is < k, until
    fixpoint; returns (i, v = degree WITHIN the core) for the vertices
    of the k-core. Sparse-id semantics (like ``connected_components(
    vertices="edges")``): ids may be arbitrary 64-bit values, vertices
    with no incident edge never appear.

    Scale shape: each round is ONE degree aggregation (map-side
    combined) plus two joins against whichever of {dropped, surviving}
    vertex set is SMALLER — anti-join on the dropped fringe in the
    common late-round case, semi-join on the survivors when round 1 of
    a sparse graph with high k drops the majority (the build side would
    otherwise be the huge one); either side broadcasts when under 1M
    rows, so the edge relation never reshuffles; an eager
    localCheckpoint per round caps lineage (the same discipline as the
    CC/SSSP loops). Rounds are bounded by the graph's degeneracy
    ordering depth — single digits on real graphs."""
    if k < 1:
        raise ValueError("k must be >= 1")
    raw, own_raw = _ensure_cached(A.df)
    Asym = symmetrize(GrMatrix(raw, A.dtype, A.nrows, A.ncols))
    edges = (Asym.df.select("i", "j").distinct()
             .localCheckpoint(eager=True))
    if own_raw:
        raw.unpersist()
    while True:
        deg = (edges.groupBy("i").agg(F.count("*").alias("v"))
               .localCheckpoint(eager=True))
        counts = deg.agg(
            F.sum((F.col("v") < k).cast("bigint")).alias("n_drop"),
            F.count("*").alias("n_total")).collect()[0]
        n_drop = counts["n_drop"] or 0
        n_keep = counts["n_total"] - n_drop
        if n_drop == 0:
            break
        if n_drop <= n_keep:
            side = deg.filter(F.col("v") < k).select("i")
            how, n_side = "left_anti", n_drop
        else:
            side = deg.filter(F.col("v") >= k).select("i")
            how, n_side = "left_semi", n_keep
        b = F.broadcast(side) if n_side <= 1_000_000 else side
        bj = (F.broadcast(side.withColumnRenamed("i", "j"))
              if n_side <= 1_000_000 else side.withColumnRenamed("i", "j"))
        edges = (edges.join(b, on="i", how=how)
                      .join(bj, on="j", how=how)
                      .select("i", "j")
                      .localCheckpoint(eager=True))
    return GrVector(edges.groupBy("i").agg(F.count("*").cast("bigint")
                                           .alias("v")),
                    INT64, A.nrows)


def label_propagation(A: GrMatrix, max_iters: int = 5) -> GrVector:
    """Synchronous label-propagation community detection: labels start
    as vertex ids; each round every vertex adopts the most frequent
    label among its neighbors, ties broken by the SMALLEST label —
    fully deterministic (the async/random-order variants of LPA are
    not), so the whole fixed-round run replays exactly in SQL. Runs a
    FIXED number of synchronous rounds (the standard way to bound LPA,
    which has no convergence guarantee — two-colorable subgraphs can
    oscillate forever).

    Scale shape: each round is one edge⋈labels join (shuffle on the
    label key the next round's aggregate needs anyway) + one
    (vertex, label) count + an argmax via a single max(struct) aggregate
    (no window, no sort); eager localCheckpoint per round caps lineage
    exactly like the CC/SSSP/k-core loops. Sparse-id semantics:
    vertices with no incident edge never appear."""
    if max_iters < 1:
        raise ValueError("max_iters must be >= 1")
    raw, own_raw = _ensure_cached(A.df)
    Asym = symmetrize(GrMatrix(raw, A.dtype, A.nrows, A.ncols))
    edges = (Asym.df.select("i", "j").distinct()
             .localCheckpoint(eager=True))
    if own_raw:
        raw.unpersist()
    labels = (edges.select("i").distinct()
                   .select("i", F.col("i").cast("bigint").alias("v")))
    for _ in range(max_iters):
        nb = (edges.join(labels.withColumnRenamed("i", "j"), on="j")
                   .select("i", "v"))
        freq = nb.groupBy("i", "v").agg(F.count("*").alias("_c"))
        # argmax by (count desc, label asc) as ONE max(struct) aggregate
        labels = (freq.groupBy("i")
                      .agg(F.max(F.struct(F.col("_c").alias("c"),
                                          (-F.col("v")).alias("nv")))
                           .alias("m"))
                      .select("i", (-F.col("m.nv")).cast("bigint")
                              .alias("v"))
                      .localCheckpoint(eager=True))
    return GrVector(labels, INT64, A.nrows)


def pagerank(A: GrMatrix, damping: float = 0.85, max_iters: int = 20,
             tol: float = 1e-6) -> GrVector:
    """Power-iteration PageRank with dangling-mass redistribution.

    State is a dense rank DataFrame (n rows); each step is one join+agg
    against the degree-normalized adjacency — the same plan shape Spark
    runs for any scale-out PageRank. The dangling-mass scalar stays
    INSIDE the plan (1-row aggregate crossJoined in, broadcast by Spark)
    so each iteration runs exactly one job; the only driver action is the
    1-row L1-delta convergence check."""
    spark = get_session()
    n = A.nrows
    adj, own_adj = _ensure_cached(A.df)
    nvals = adj.count()
    k = _adjacency_partitions(nvals)
    outdeg = adj.groupBy("i").agg(F.count("*").alias("d"))
    # P[i,j] = 1/outdeg(i) — degree-normalized transition matrix,
    # partitioned by source with data-sized partition count (see
    # _prep_adjacency) so every iteration reuses one small exchange
    P = (adj.join(outdeg, on="i")
            .select("i", "j", (F.lit(1.0) / F.col("d")).alias("v")))
    P = P.repartition(k, "i").persist()
    P.count()
    nodes = _vertex_range(spark, n).select(F.col("id").alias("i"))
    has_out = outdeg.select("i").persist()
    has_out.count()
    base = (1.0 - damping) / n
    r = nodes.select("i", F.lit(1.0 / n).alias("v")).persist()
    for it in range(max_iters):
        dangling_df = (r.join(has_out, on="i", how="left_anti")
                        .agg((F.coalesce(F.sum("v"), F.lit(0.0)) / n)
                             .alias("_dang")))
        contrib = (P.alias("P")
                    .join(r.alias("r"), F.col("P.i") == F.col("r.i"))
                    .select(F.col("P.j").alias("i"),
                            (F.col("P.v") * F.col("r.v")).alias("c"))
                    .groupBy("i").agg(F.sum("c").alias("s")))
        r_new = (nodes.join(contrib, on="i", how="left_outer")
                      .crossJoin(dangling_df)
                      .select("i",
                              (F.lit(base)
                               + F.lit(damping)
                               * (F.coalesce(F.col("s"), F.lit(0.0))
                                  + F.col("_dang"))).alias("v")))
        r_new = r_new.localCheckpoint(eager=True)
        if tol > 0:
            # convergence check = the ONLY per-iteration driver action;
            # skipped entirely for fixed-iteration runs (tol=0)
            delta = (r_new.alias("a").join(r.alias("b"), on="i")
                          .agg(F.sum(F.abs(F.col("a.v") - F.col("b.v"))))
                          .collect()[0][0])
        else:
            delta = None
        r.unpersist()
        r = r_new
        if tol > 0 and delta is not None and delta < tol:
            break
    has_out.unpersist()
    P.unpersist()
    if own_adj:
        adj.unpersist()
    return GrVector(r, FP64, n)


def triangle_count(A: GrMatrix) -> int:
    """Triangle counting via the classic GraphBLAS masked-matmul
    formulation, collapsed to its minimal plan: L = strict lower triangle
    of the symmetrized adjacency; ntri = reduce(C) where C<L.S> =
    L * L.T over plus_pair. Because the final reduction is a GLOBAL sum
    of pair counts, the per-(i,j) aggregation is algebraically redundant:
    sum over C = |{(i,j,k): L[i,k] & L[j,k] & L[i,j]}|, i.e. a COUNT of
    the mask-semi-joined wedge relation. Executing it that way removes
    one full shuffle (the groupBy(i,j) + scalar reduce) versus the
    two-stage form — the mask semi-join still happens BELOW any
    aggregation, so the wedge relation never materializes more than the
    masked rows."""
    raw, own_raw = _ensure_cached(A.df)
    Asym = symmetrize(GrMatrix(raw, A.dtype, A.nrows, A.ncols))
    L_df = Asym.df.filter(F.col("i") > F.col("j")).select("i", "j")
    L_df = L_df.persist()
    wedges = (L_df.select(F.col("i"), F.col("j").alias("k"))
              .join(L_df.select(F.col("i").alias("j"), F.col("j").alias("k")),
                    on="k")
              .select("i", "j"))
    t = wedges.join(L_df, on=["i", "j"], how="left_semi").count()
    L_df.unpersist()
    if own_raw:
        raw.unpersist()
    return int(t)


def katz_centrality(A: GrMatrix, alpha: float = 0.1, beta: float = 1.0,
                    iters: int = 5) -> DataFrame:
    """Katz centrality by the fixed-iteration recurrence

        x_{t+1}(j) = beta + alpha * sum_{i->j} x_t(i),  x_0 = beta·1

    — after K steps x(j) counts every walk into j of length <= K,
    attenuated alpha^len (converges to the closed form for
    alpha < 1/rho(A); callers pick alpha accordingly). Fixed
    iterations and no normalization keep the trajectory deterministic
    and replayable as unrolled SQL CTEs (same discipline as pagerank /
    hits). Plan: one join + map-side aggregate per step against the
    cached source-partitioned edge relation; localCheckpoint bounds
    the plan tree. Output: (i, katz rounded 6) over all n vertices
    (isolated vertices carry beta)."""
    if iters < 1:
        raise ValueError("katz_centrality requires iters >= 1")
    spark = get_session()
    n = A.nrows
    adj, own_adj = _ensure_cached(A.df)
    edges = adj.select("i", "j").distinct()
    k = _adjacency_partitions(edges.count())
    edges_i = edges.repartition(k, "i").persist()
    edges_i.count()
    nodes = _vertex_range(spark, n).select(F.col("id").alias("i"))
    x = nodes.select("i", F.lit(float(beta)).alias("x"))
    for step in range(iters):
        contrib = (edges_i.join(x, on="i")
                          .groupBy("j")
                          .agg(F.sum("x").alias("s")))
        x = (nodes.join(contrib.select(F.col("j").alias("i"), "s"),
                        on="i", how="left")
                  .select("i", (F.lit(float(beta))
                                + F.lit(float(alpha))
                                * F.coalesce(F.col("s"), F.lit(0.0)))
                          .alias("x")))
        x = x.localCheckpoint(eager=True)
    out = x.select("i", F.round("x", 6).alias("katz"))
    edges_i.unpersist()
    if own_adj:
        adj.unpersist()
    return out


def hits(A: GrMatrix, iters: int = 5) -> DataFrame:
    """HITS hubs & authorities (Kleinberg) by fixed-iteration power
    method with L1 normalization:

        a_j <- sum_{i->j} h_i ;  a <- a / sum(a)
        h_i <- sum_{i->j} a_j ;  h <- h / sum(h)

    Same plan shape as pagerank: each half-step is one join + map-side
    aggregate against the cached adjacency, the normalizer is an
    in-plan 1-row aggregate (crossJoined, broadcast by Spark) so every
    iteration is exactly one job per half-step, and localCheckpoint
    bounds the plan tree. Fixed iterations, no driver convergence
    reads — fully replayable as unrolled SQL CTEs (final values rounded
    to 6 decimals absorb distributed-sum drift, the q37 precedent).

    Returns a DataFrame (i, hub, authority) over all n vertices
    (isolated vertices carry 0.0)."""
    if iters < 1:
        raise ValueError("hits requires iters >= 1")
    spark = get_session()
    n = A.nrows
    adj, own_adj = _ensure_cached(A.df)
    edges = adj.select("i", "j").distinct()
    k = _adjacency_partitions(edges.count())
    # TWO cached copies, partitioned by each half-step's join key:
    # the a-step joins h on i, the h-step joins a on j — with one copy
    # the other half-step reshuffles the whole edge relation every
    # iteration (measured 87.6 s -> 41.2 s at 20M edges on local[32],
    # together with the a-checkpoint below)
    edges_i = edges.repartition(k, "i").persist()
    edges_j = edges.repartition(k, "j").persist()
    edges_i.count()
    edges_j.count()
    nodes = _vertex_range(spark, n).select(F.col("id").alias("i"))
    h = nodes.select("i", F.lit(1.0 / n).alias("h"))

    def _norm(df, col):
        tot = df.agg(F.sum(col).alias("_t"))
        return (df.crossJoin(tot)
                  .select("i", F.when(F.col("_t") != 0,
                                      F.col(col) / F.col("_t"))
                           .otherwise(0.0).alias(col)))

    for _ in range(iters):
        a_raw = (edges_i.join(h, on="i")
                        .groupBy(F.col("j").alias("i"))
                        .agg(F.sum("h").alias("a")))
        a = _norm(nodes.join(a_raw, on="i", how="left")
                       .select("i", F.coalesce("a", F.lit(0.0)).alias("a")),
                  "a")
        # checkpoint a BEFORE h consumes it — otherwise h's checkpoint
        # re-executes a's whole plan a second time
        a = a.localCheckpoint(eager=True)
        h_raw = (edges_j.join(a.select(F.col("i").alias("j"), "a"),
                              on="j")
                        .groupBy("i")
                        .agg(F.sum("a").alias("h")))
        h = _norm(nodes.join(h_raw, on="i", how="left")
                       .select("i", F.coalesce("h", F.lit(0.0)).alias("h")),
                  "h")
        h = h.localCheckpoint(eager=True)
    out = (h.join(a, on="i")
            .select("i", F.round("h", 6).alias("hub"),
                    F.round("a", 6).alias("authority")))
    edges_i.unpersist()
    edges_j.unpersist()
    if own_adj:
        adj.unpersist()
    return out


def eccentricity(A: GrMatrix, max_iters: int = 32) -> DataFrame:
    """Per-vertex eccentricity (longest shortest path to any REACHABLE
    vertex) via the min-plus ALL-PAIRS closure, composed entirely from
    the core GraphBLAS surface: D_{k+1} = D_k (+) D_k minplus.mxm A
    with the ewise_add(min) union merge, iterated to the fixpoint
    (``isequal``), exactly the D = D min.+ A recurrence the GraphBLAS
    APSP literature writes. d(i, i) = 0 by definition (closure
    round-trips are discarded); unreachable pairs simply never appear
    (sparse semantics — no +inf sentinels).

    APSP is inherently O(V^2) OUTPUT — this is the bounded-graph /
    landmark-set diagnostic (diameter, radius, center), not a
    100 TB-edge op; at scale run it on a sampled landmark subgraph.
    Checkpoints every ``_CHECKPOINT_EVERY`` rounds like every other
    iterative loop here. Raises if the closure has not converged
    within ``max_iters`` (negative cycles are impossible with weight-1
    edges, so non-convergence means max_iters is too small).
    Output: (i, ecc, n_reachable) — ecc BIGINT, excluding i itself.

    Reference scope: dask-grblas ships the semiring ops (matrix.py
    mxm/ewise_add) but no algorithm layer; this composes them the way
    its GraphBLAS upstream intends.
    """
    D = _minplus_closure(A, max_iters, "eccentricity")
    return (D.df.where(F.col("i") != F.col("j"))
              .groupBy("i")
              .agg(F.max("v").cast("bigint").alias("ecc"),
                   F.count("*").cast("bigint").alias("n_reachable")))


def _minplus_closure(A: GrMatrix, max_iters: int,
                     caller: str) -> GrMatrix:
    """Hop-count ALL-PAIRS shortest-path closure over the core
    semiring surface: D_{k+1} = D_k ewise_add(min) (D_k min.+ W) with
    W the weight-1 pattern of A, iterated to the ``isequal`` fixpoint
    with per-round checkpoints. Raises on non-convergence (weight-1
    edges cannot cycle negatively, so that only means max_iters is
    below the graph diameter)."""
    from .operators import binary as _binary

    ones = A.df.select("i", "j", F.lit(1).cast("bigint").alias("v"))
    W = GrMatrix.from_dataframe(ones, nrows=A.nrows, ncols=A.ncols,
                                dtype="INT64")
    D = W.dup()
    for it in range(max_iters):
        step = D.mxm(W, semiring.min_plus).new()
        merged = D.ewise_add(step, _binary.min).new()
        if (it + 1) % _CHECKPOINT_EVERY == 0:
            merged._set_df(merged.df.localCheckpoint())
        if bool(merged.isequal(D).value):
            return merged
        D = merged
    raise RuntimeError(
        f"{caller}: min-plus closure not converged within "
        f"{max_iters} iterations — raise max_iters")


def harmonic_centrality(A: GrMatrix, max_iters: int = 32) -> DataFrame:
    """Harmonic centrality H(i) = sum over reachable j != i of
    1 / d(i, j) — the disconnected-graph-safe closeness variant
    (unreachable pairs contribute 0 instead of poisoning an average),
    from the same min-plus closure as ``eccentricity`` (bounded-graph
    / landmark diagnostic by design; see eccentricity's scale note).
    Output: (i, harmonic rounded 6, n_reachable)."""
    D = _minplus_closure(A, max_iters, "harmonic_centrality")
    return (D.df.where(F.col("i") != F.col("j"))
              .groupBy("i")
              .agg(F.round(F.sum(F.lit(1.0) / F.col("v")), 6)
                    .alias("harmonic"),
                   F.count("*").cast("bigint").alias("n_reachable")))


def capped_hub_count(A: GrMatrix,
                     max_degree: int = 4096) -> tuple[int, int]:
    """Observability hook for the degree-capped approximations
    (``adamic_adar`` / ``neighborhood_jaccard``, whose ``max_degree``
    caps are ON by default): returns (n_hubs_over_cap, max_degree_seen)
    for the symmetric adjacency. A nonzero first element means the
    capped call silently pruned witnesses on this graph — run this
    once per new graph before trusting capped scores as exact, or pass
    ``max_degree=None`` for the exact quadratic computation."""
    deg = (A.df.select(F.col("i").cast("bigint").alias("z"),
                       F.col("j").cast("bigint").alias("nbr"))
               .where(F.col("z") != F.col("nbr"))
               .distinct()
               .groupBy("z").agg(F.count("*").alias("deg")))
    row = deg.agg(
        F.coalesce(F.sum(F.when(F.col("deg") > max_degree, 1)
                          .otherwise(0)), F.lit(0)).alias("n_over"),
        F.coalesce(F.max("deg"), F.lit(0)).alias("dmax")).collect()[0]
    return int(row["n_over"]), int(row["dmax"])


def adamic_adar(A: GrMatrix, max_degree: int | None = 4096) -> DataFrame:
    """Adamic–Adar link prediction over a symmetric adjacency: for every
    NON-adjacent pair (u, v) with at least one common neighbor,
    score(u, v) = sum over common neighbors z of 1 / ln(deg(z)).

    Plan: one self-join of the edge list on the shared endpoint z
    (neighbor-pair generation), a (u, v) aggregation, and an anti-join
    against the edge set to drop already-connected pairs — three
    exchanges total, no cartesian. Every pair-producing z has deg >= 2,
    so ln(deg) is never 0.

    The z-self-join fans out deg(z)^2 rows — the classic hub blowup.
    ``max_degree`` excludes hubs above the cap from pair GENERATION
    (the standard approximation: a z with deg > cap contributes
    1/ln(deg) ~ 0 per pair anyway and its pair fan-out is quadratic);
    the cap is ON BY DEFAULT (4096 — a 1M-degree hub would otherwise
    emit 5·10^11 pairs; the codebase-wide caps-default-ON convention,
    same as the dedup/LSH bucket caps). Pass ``max_degree=None`` for
    the exact quadratic computation on graphs known to be hub-free.
    Scores of surviving pairs use TRUE degrees (the cap only prunes
    which z generate pairs), so capped output is a subset-consistent
    approximation an oracle can replay exactly.
    The cap prunes SILENTLY — use ``capped_hub_count(A, max_degree)``
    to check whether a given graph actually has over-cap hubs before
    treating capped scores as exact.

    Output: (u, v, n_common, score) with u < v, score rounded to 6.
    """
    # r12 optimization (guide §2.4): `edges` (a full distinct) feeds
    # THREE consumers (degrees, pair generation, the closing
    # anti-join) and `gen` feeds BOTH self-join sides — unshared, the
    # distinct + degree join re-ran per branch. Size-gated
    # materialization computes each once at scale; lazy below.
    from .functions.materialize import materialize_if_large

    edges = materialize_if_large(
        A.df.select(F.col("i").cast("bigint").alias("z"),
                    F.col("j").cast("bigint").alias("nbr"))
            .where(F.col("z") != F.col("nbr"))
            .distinct())
    deg = edges.groupBy("z").agg(F.count("*").alias("deg"))
    gen = edges.join(deg, on="z")
    if max_degree is not None:
        gen = gen.where(F.col("deg") <= max_degree)
    gen = materialize_if_large(gen)
    e1 = gen.select("z", F.col("nbr").alias("u"), "deg")
    e2 = gen.select("z", F.col("nbr").alias("v"))
    pairs = (e1.join(e2, on="z")
               .where(F.col("u") < F.col("v"))
               .groupBy("u", "v")
               .agg(F.count("*").cast("bigint").alias("n_common"),
                    F.sum(F.lit(1.0) / F.log(F.col("deg")))
                     .alias("_s")))
    adj = edges.select(F.col("z").alias("u"), F.col("nbr").alias("v"))
    return (pairs.join(adj, on=["u", "v"], how="left_anti")
                 .select("u", "v", "n_common",
                         F.round("_s", 6).alias("score")))


def clustering_coefficient(A: GrMatrix) -> DataFrame:
    """Per-vertex local clustering coefficient over a symmetric
    adjacency: coeff(v) = 2·tri(v) / (deg(v)·(deg(v)−1)), 0 when
    deg < 2, where tri(v) counts triangles through v.

    Triangles are ENUMERATED with the degree-ordered orientation trick
    behind every production triangle counter: each undirected edge is
    directed from its lower (deg, id) endpoint, wedges join two
    oriented out-edges at their source, and the closing edge check is
    an equi-join against the oriented edge set. A vertex's wedge
    fan-out is bounded by its ORIENTED out-degree — O(sqrt(2m)) on any
    graph (arboricity bound) — so a degree-10^6 hub never produces
    deg² wedge rows. Three exchanges; each triangle found exactly once
    and exploded to its three corners for the per-vertex count.

    Output: (v, deg, tri, coeff) for every vertex with deg >= 1,
    coeff rounded to 6.
    """
    # r12 optimization (guide §2.4): `und` (a full distinct) feeds the
    # degree aggregate + two degree joins, and the oriented relation
    # `o` feeds THREE branches (both wedge sides + the closing edge
    # set) — unshared, each branch re-ran the distinct + degree-join
    # pipeline. Size-gated materialization; lazy below the gate.
    from .functions.materialize import materialize_if_large

    und = materialize_if_large(
        A.df.select(F.col("i").cast("bigint").alias("i"),
                    F.col("j").cast("bigint").alias("j"))
            .where(F.col("i") != F.col("j"))
            .distinct())
    deg = und.groupBy(F.col("i").alias("v")) \
             .agg(F.count("*").alias("deg"))
    ed = (und.join(deg.select(F.col("v").alias("i"),
                              F.col("deg").alias("di")), on="i")
             .join(deg.select(F.col("v").alias("j"),
                              F.col("deg").alias("dj")), on="j"))
    o = materialize_if_large(
        ed.where(F.struct("di", "i") < F.struct("dj", "j"))
          .select(F.col("i").alias("a"), F.col("j").alias("b"),
                  F.col("dj").alias("db")))
    w1 = o.select(F.col("a"), F.col("b"), F.col("db"))
    w2 = o.select(F.col("a"), F.col("b").alias("c"),
                  F.col("db").alias("dc"))
    wedges = (w1.join(w2, on="a")
                .where(F.struct("db", "b") < F.struct("dc", "c")))
    closing = o.select(F.col("a").alias("b"), F.col("b").alias("c"))
    tris = wedges.join(closing, on=["b", "c"]).select("a", "b", "c")
    per_v = (tris.select(F.explode(F.array("a", "b", "c")).alias("v"))
                 .groupBy("v").agg(F.count("*").alias("tri")))
    out = deg.join(per_v, on="v", how="left") \
             .withColumn("tri", F.coalesce("tri", F.lit(0)).cast("bigint"))
    coeff = F.when(F.col("deg") < 2, F.lit(0.0)).otherwise(
        F.lit(2.0) * F.col("tri") / (F.col("deg") * (F.col("deg") - 1)))
    return out.select("v", F.col("deg").cast("bigint").alias("deg"),
                      "tri", F.round(coeff, 6).alias("coeff"))


def _edge_support(und: DataFrame) -> DataFrame:
    """Per-edge triangle support of a canonical undirected edge set
    (a < b, distinct): the degree-ordered wedge enumeration behind
    `clustering_coefficient` (each wedge fan-out bounded by ORIENTED
    out-degree — O(sqrt(2m)) by the arboricity bound, so hubs never
    emit deg² wedge rows), each triangle exploded to its three
    canonical edges and counted. Returns (a, b, support) for edges in
    >= 1 triangle; edges in none are absent (callers coalesce)."""
    ends = und.select(F.col("a").alias("v")).unionAll(
        und.select(F.col("b").alias("v")))
    deg = ends.groupBy("v").agg(F.count("*").alias("deg"))
    ed = (und.join(deg.select(F.col("v").alias("a"),
                              F.col("deg").alias("da")), on="a")
             .join(deg.select(F.col("v").alias("b"),
                              F.col("deg").alias("db")), on="b"))
    # orient each edge from its lower (deg, id) endpoint.
    # r12 optimization (guide §2.4): `o` feeds THREE branches (both
    # wedge sides + the closing edge set) — size-gated
    # materialization shares the orientation join at scale.
    from .functions.materialize import materialize_if_large
    fwd = F.struct("da", "a") < F.struct("db", "b")
    o = materialize_if_large(
        ed.select(F.when(fwd, F.col("a")).otherwise(F.col("b"))
                   .alias("s"),
                  F.when(fwd, F.col("b")).otherwise(F.col("a"))
                   .alias("t"),
                  F.when(fwd, F.col("db")).otherwise(F.col("da"))
                   .alias("dt")))
    w1 = o.select(F.col("s"), F.col("t").alias("x"),
                  F.col("dt").alias("dx"))
    w2 = o.select(F.col("s"), F.col("t").alias("y"),
                  F.col("dt").alias("dy"))
    wedges = (w1.join(w2, on="s")
                .where(F.struct("dx", "x") < F.struct("dy", "y")))
    closing = o.select(F.col("s").alias("x"), F.col("t").alias("y"))
    tris = wedges.join(closing, on=["x", "y"]).select("s", "x", "y")
    tri_edges = tris.select(F.explode(F.array(
        F.struct(F.least("s", "x").alias("a"),
                 F.greatest("s", "x").alias("b")),
        F.struct(F.least("s", "y").alias("a"),
                 F.greatest("s", "y").alias("b")),
        F.struct(F.least("x", "y").alias("a"),
                 F.greatest("x", "y").alias("b")))).alias("_e")) \
        .select("_e.a", "_e.b")
    return tri_edges.groupBy("a", "b") \
                    .agg(F.count("*").cast("bigint").alias("support"))


def k_truss(A: GrMatrix, k: int = 4, max_iters: int = 30) -> DataFrame:
    """k-truss decomposition membership: the maximal subgraph in which
    EVERY edge participates in >= k-2 triangles (the cohesive-subgraph
    standard one notch stronger than k-core — a k-truss is always
    inside a (k-1)-core). Iterative support peeling: compute per-edge
    triangle support on the surviving subgraph, drop under-supported
    edges, repeat to the fixpoint (peeling is monotone decreasing, so
    extra rounds past the fixpoint are no-ops — which is what makes a
    fixed-depth unrolled SQL oracle exact).

    Plan per round: one degree agg + one wedge self-join bounded by
    oriented out-degree (arboricity bound — no deg² hub blowup) + one
    closing equi-join + an edge-count agg; the surviving edge set is
    eagerly checkpointed each round (lineage cut, the iterative-loop
    house rule) and the convergence check rides the same count.

    Output: (a, b, support) for the surviving canonical edges, with
    their fixpoint support."""
    if k < 3:
        raise ValueError("k_truss requires k >= 3")
    und = (A.df.select(F.least("i", "j").alias("a"),
                       F.greatest("i", "j").alias("b"))
              .where(F.col("i") != F.col("j"))
              .distinct()
              .localCheckpoint(eager=True))
    n_prev = und.count()
    if n_prev == 0:
        return und.withColumn("support", F.lit(None).cast("bigint"))
    for _ in range(max_iters):
        # prior rounds carry a support column — re-derive it fresh
        sup = _edge_support(und.select("a", "b"))
        kept = (und.select("a", "b").join(sup, on=["a", "b"])
                   .where(F.col("support") >= k - 2)
                   .localCheckpoint(eager=True))
        n = kept.count()
        und = kept
        if n == n_prev or n == 0:
            break
        n_prev = n
    else:
        # an exhausted loop would return edges filtered by supports of
        # the PREVIOUS round's larger graph — not a k-truss; refuse
        # rather than silently ship an inconsistent result
        raise RuntimeError(
            f"k_truss did not reach its peeling fixpoint within "
            f"max_iters={max_iters} rounds; raise max_iters")
    return und


def neighborhood_jaccard(A: GrMatrix,
                         max_degree: int | None = 4096) -> DataFrame:
    """Neighborhood-Jaccard link prediction over a symmetric adjacency:
    for every NON-adjacent pair (u, v) with at least one common
    neighbor, J(u, v) = |N(u) n N(v)| / |N(u) u N(v)| — the set-overlap
    companion to adamic_adar (same plan skeleton; the degree join
    replaces the 1/ln(deg) weights).

    Plan: one self-join of the edge list on the shared endpoint z,
    a (u, v) aggregation, two broadcast-able degree joins, and an
    anti-join against the edge set. |union| = deg(u) + deg(v) - common,
    so no second pair generation. ``max_degree`` caps hub fan-out in
    pair GENERATION exactly as in adamic_adar — ON BY DEFAULT (4096,
    the caps-default-ON convention); ``None`` = exact. Degrees in the
    Jaccard denominator stay TRUE degrees, so capped output is a
    subset-consistent approximation (n_common may undercount pairs
    whose only witnesses are capped hubs — those pairs vanish rather
    than mis-score when ALL their witnesses are hubs). The cap prunes
    SILENTLY — ``capped_hub_count(A, max_degree)`` reports whether the
    graph has over-cap hubs at all.
    Output: (u, v, n_common, jacc) with u < v, jacc rounded to 6."""
    edges = (A.df.select(F.col("i").cast("bigint").alias("z"),
                         F.col("j").cast("bigint").alias("nbr"))
                 .where(F.col("z") != F.col("nbr"))
                 .distinct())
    edges = edges.localCheckpoint()  # shared: gen, degrees, anti-join
    deg = edges.groupBy("nbr").agg(F.count("*").alias("deg")) \
               .withColumnRenamed("nbr", "_n")
    gen = edges
    if max_degree is not None:
        from .functions.materialize import materialize_if_large

        zdeg = edges.groupBy("z").agg(F.count("*").alias("zd"))
        # r12 (guide §2.4): both self-join sides consume `gen` —
        # size-gate the cap join so it runs once at scale.
        gen = materialize_if_large(
            edges.join(zdeg, on="z")
                 .where(F.col("zd") <= max_degree).drop("zd"))
    e1 = gen.select("z", F.col("nbr").alias("u"))
    e2 = gen.select("z", F.col("nbr").alias("v"))
    pairs = (e1.join(e2, on="z")
               .where(F.col("u") < F.col("v"))
               .groupBy("u", "v")
               .agg(F.count("*").cast("bigint").alias("n_common")))
    adj = edges.select(F.col("z").alias("u"), F.col("nbr").alias("v"))
    scored = (pairs.join(adj, on=["u", "v"], how="left_anti")
                   .join(deg.withColumnRenamed("_n", "u")
                            .withColumnRenamed("deg", "du"), on="u")
                   .join(deg.withColumnRenamed("_n", "v")
                            .withColumnRenamed("deg", "dv"), on="v"))
    union = F.col("du") + F.col("dv") - F.col("n_common")
    return scored.select("u", "v", "n_common",
                         F.round(F.col("n_common") / union, 6)
                          .alias("jacc"))


def personalized_pagerank(A: GrMatrix, seeds: list[int],
                          damping: float = 0.85,
                          max_iters: int = 10) -> DataFrame:
    """Personalized PageRank: power iteration whose restart AND
    dangling mass both return to the seed set — the random walker
    teleports to a uniform distribution over ``seeds`` instead of over
    all nodes. r_{t+1} = (1-d) s + d (P^T r_t + dang_t s) with
    s = e_S / |S|; r_0 = s. Fixed iterations, no early exit, so the
    trajectory is deterministic and an unrolled-CTE oracle replays it.

    Plan shape: identical to pagerank (one join+agg per step against
    the degree-normalized transition relation, partitioned ONCE by
    source; the dangling scalar stays a 1-row broadcast inside the
    plan; checkpoint per step). The seed vector is a literal isin over
    the node relation — no extra join. Output: (i, ppr) rounded 6,
    seeds-reachable nodes only may be nonzero."""
    spark = get_session()
    n = A.nrows
    adj, own_adj = _ensure_cached(A.df)
    nvals = adj.count()
    k = _adjacency_partitions(nvals)
    outdeg = adj.groupBy("i").agg(F.count("*").alias("d"))
    P = (adj.join(outdeg, on="i")
            .select("i", "j", (F.lit(1.0) / F.col("d")).alias("v")))
    P = P.repartition(k, "i").persist()
    P.count()
    nodes = _vertex_range(spark, n).select(F.col("id").alias("i"))
    has_out = outdeg.select("i").persist()
    has_out.count()
    s_val = 1.0 / len(seeds)
    s_col = F.when(F.col("i").isin([int(x) for x in seeds]),
                   F.lit(s_val)).otherwise(F.lit(0.0))
    r = nodes.select("i", s_col.alias("v")).localCheckpoint(eager=True)
    for _ in range(max_iters):
        dangling_df = (r.join(has_out, on="i", how="left_anti")
                        .agg(F.coalesce(F.sum("v"), F.lit(0.0))
                              .alias("_dang")))
        contrib = (P.alias("P")
                    .join(r.alias("r"), F.col("P.i") == F.col("r.i"))
                    .select(F.col("P.j").alias("i"),
                            (F.col("P.v") * F.col("r.v")).alias("c"))
                    .groupBy("i").agg(F.sum("c").alias("s")))
        r = (nodes.join(contrib, on="i", how="left_outer")
                  .crossJoin(dangling_df)
                  .select("i",
                          (F.lit(1.0 - damping) * s_col
                           + F.lit(damping)
                           * (F.coalesce(F.col("s"), F.lit(0.0))
                              + F.col("_dang") * s_col)).alias("v")))
        r = r.localCheckpoint(eager=True)
    has_out.unpersist()
    P.unpersist()
    if own_adj:
        adj.unpersist()
    return r.select("i", F.round(F.col("v"), 6).alias("ppr"))


def degree_assortativity(A: GrMatrix) -> DataFrame:
    """Degree assortativity of a symmetric graph: the Pearson
    correlation of endpoint degrees over all (directed) edges — do
    hubs link to hubs (r > 0, social nets) or to leaves (r < 0,
    tech/biology)? One degree aggregate, one edge-degree join, one
    closed-form moment fold (the same rounded expression tree the SQL
    oracle uses). Degenerate (regular) graphs yield NULL. Output:
    one row (n_edges, r rounded 6)."""
    edges = (A.df.select(F.col("i").alias("u"), F.col("j").alias("v"))
                 .where(F.col("u") != F.col("v"))
                 .distinct())
    edges = edges.localCheckpoint()  # shared: degrees + moment fold
    deg = edges.groupBy("u").agg(F.count("*").alias("d")) \
               .withColumnRenamed("u", "_n")
    j = (edges.join(deg.withColumnRenamed("_n", "u")
                       .withColumnRenamed("d", "du"), on="u")
              .join(deg.withColumnRenamed("_n", "v")
                       .withColumnRenamed("d", "dv"), on="v"))
    x = F.col("du").cast("double")
    y = F.col("dv").cast("double")
    m = j.agg(F.count("*").cast("double").alias("m"),
              F.sum(x).alias("sx"), F.sum(y).alias("sy"),
              F.sum(x * x).alias("sxx"), F.sum(y * y).alias("syy"),
              F.sum(x * y).alias("sxy"))
    vx = F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("m") * F.col("syy") - F.col("sy") * F.col("sy")
    r = F.when((vx > 0) & (vy > 0),
               F.round((F.col("m") * F.col("sxy")
                        - F.col("sx") * F.col("sy"))
                       / F.sqrt(vx * vy), 6))
    return m.select(F.col("m").cast("bigint").alias("n_edges"),
                    r.alias("r"))


def reciprocity(A: GrMatrix) -> DataFrame:
    """Reciprocity of a DIRECTED graph: the fraction of edges whose
    reverse edge also exists — one self-join of the (deduplicated,
    loop-free) edge list against its transpose. Output: one row
    (n_edges, n_reciprocal, reciprocity rounded 6)."""
    edges = (A.df.select(F.col("i").alias("u"), F.col("j").alias("v"))
                 .where(F.col("u") != F.col("v"))
                 .distinct())
    edges = edges.localCheckpoint()
    rev = edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    rec = edges.join(rev, on=["u", "v"], how="left_semi")
    n = edges.count()
    k = rec.count()
    spark = get_session()
    return spark.createDataFrame(
        [(int(n), int(k), round(k / n, 6) if n else None)],
        "n_edges long, n_reciprocal long, reciprocity double")


def modularity(A: GrMatrix, labels: DataFrame,
               node_col: str = "node",
               label_col: str = "label") -> DataFrame:
    """Newman modularity Q of a given node partition over the
    UNDIRECTED simple graph of A (edges canonicalized to
    (min, max), loops dropped): Q = sum_c [ m_c/m - (d_c/(2m))^2 ]
    — the community-quality scalar to evaluate LPA/CC output or any
    exogenous partition (reference exposes the building blocks, not
    the metric; this engine ships it as a first-class aggregate).

    Plan: ONE canonicalize+distinct shuffle builds the edge set
    (localCheckpoint shared by all three aggregates); degrees fold
    from the edge list; two BROADCASTable label joins (labels is a
    node-sized dimension — broadcast when small, shuffle-hash
    otherwise, Catalyst/AQE picks) classify intra-community edges.
    The fold Q = sum_c(4*m*m_c - d_c^2) / (4*m^2) is PURE INTEGER
    arithmetic in DECIMAL(38,0) — fold-order invariant — with one
    double division at the end, round 6. Nodes missing a label form
    their own null community (excluded, matching the SQL inner-join
    oracle). Output: one row (n_edges, n_communities, q)."""
    lab = labels.select(F.col(node_col).cast("bigint").alias("_n"),
                        F.col(label_col).alias("_l"))
    und = (A.df.select(F.least("i", "j").alias("u"),
                       F.greatest("i", "j").alias("v"))
              .where(F.col("u") != F.col("v"))
              .distinct()
              .localCheckpoint())
    m = und.count()
    spark = get_session()
    if m == 0:
        return spark.createDataFrame(
            [(0, 0, None)],
            "n_edges long, n_communities long, q double")
    deg = (und.select(F.col("u").alias("_n"))
              .unionAll(und.select(F.col("v").alias("_n")))
              .groupBy("_n").agg(F.count("*").alias("_d")))
    # d_c = sum of degrees per community; m_c = within-community edges
    dc = (deg.join(lab, on="_n")
             .groupBy("_l").agg(F.sum("_d").cast("bigint").alias("_dc")))
    lu = lab.select(F.col("_n").alias("u"), F.col("_l").alias("_lu"))
    lv = lab.select(F.col("_n").alias("v"), F.col("_l").alias("_lv"))
    mc = (und.join(lu, on="u").join(lv, on="v")
             .where(F.col("_lu") == F.col("_lv"))
             .groupBy(F.col("_lu").alias("_l"))
             .agg(F.count("*").cast("bigint").alias("_mc")))
    per = (dc.join(mc, on="_l", how="left")
             .select(F.col("_dc"),
                     F.coalesce(F.col("_mc"), F.lit(0)).alias("_mc")))
    row = per.agg(
        F.count("*").alias("_k"),
        # Cast to DECIMAL(38,0) BEFORE multiplying (spearman_rho's
        # pattern, and what the oracle SQL does): d_c can reach 2m,
        # so d_c^2 overflows int64 once a community's degree sum
        # passes ~3e9 — exactly the 100TB-scale domain.
        F.sum(F.col("_mc").cast("decimal(38,0)") * F.lit(4 * int(m))
              - F.col("_dc").cast("decimal(38,0)") * F.col("_dc"))
         .alias("_num")).collect()[0]
    q = int(row["_num"] or 0) / (4.0 * m * m)
    q6 = (math.floor(q * 1e6 + 0.5) / 1e6 if q >= 0
          else -(math.floor(-q * 1e6 + 0.5) / 1e6))
    return spark.createDataFrame(
        [(int(m), int(row["_k"] or 0), q6)],
        "n_edges long, n_communities long, q double")


def rich_club(A: GrMatrix, k: int) -> DataFrame:
    """Rich-club coefficient phi(k) = 2*E_k / (N_k*(N_k-1)) of the
    UNDIRECTED simple graph of A: the edge density among nodes of
    degree > k — do the hubs form their own dense core? (Colizza et
    al. 2006 definition, unnormalized.)

    Plan: canonical edge set (one distinct shuffle, checkpointed),
    degree fold, then the degree>k node set SEMI-joins the edge list
    on both endpoints — the rich set is orders of magnitude smaller
    than the graph, so both probes broadcast at scale; nothing ever
    re-shuffles the full edge list. All-integer output plus one
    double division, round 6; phi NULL when fewer than 2 rich
    nodes. Output: one row (k, n_rich, e_rich, phi)."""
    und = (A.df.select(F.least("i", "j").alias("u"),
                       F.greatest("i", "j").alias("v"))
              .where(F.col("u") != F.col("v"))
              .distinct()
              .localCheckpoint())
    deg = (und.select(F.col("u").alias("_n"))
              .unionAll(und.select(F.col("v").alias("_n")))
              .groupBy("_n").agg(F.count("*").alias("_d")))
    rich = deg.where(F.col("_d") > k).select("_n")
    n_rich = rich.count()
    e_rich = (und.join(rich.withColumnRenamed("_n", "u"),
                       on="u", how="left_semi")
                 .join(rich.withColumnRenamed("_n", "v"),
                       on="v", how="left_semi")
                 .count())
    spark = get_session()
    if n_rich < 2:
        return spark.createDataFrame(
            [(k, int(n_rich), int(e_rich), None)],
            "k long, n_rich long, e_rich long, phi double")
    phi = 2.0 * e_rich / (n_rich * (n_rich - 1))
    return spark.createDataFrame(
        [(k, int(n_rich), int(e_rich),
          math.floor(phi * 1e6 + 0.5) / 1e6)],
        "k long, n_rich long, e_rich long, phi double")


def degree_histogram(A: GrMatrix) -> DataFrame:
    """Degree distribution of the UNDIRECTED simple graph of A:
    (degree, n_nodes, share) — the first profiling pass over any new
    edge dump (power-law check, hub audit, cap tuning for the
    max_degree-capped operators). Two map-side-combined aggregates
    (node degree, then nodes per degree) over the canonical edge set;
    the output is bounded by the max degree, never by n. share
    rounds 6."""
    und = (A.df.select(F.least("i", "j").alias("u"),
                       F.greatest("i", "j").alias("v"))
              .where(F.col("u") != F.col("v"))
              .distinct())
    deg = (und.select(F.col("u").alias("_n"))
              .unionAll(und.select(F.col("v").alias("_n")))
              .groupBy("_n").agg(F.count("*").alias("_d")))
    hist = deg.groupBy(F.col("_d").cast("bigint").alias("degree")) \
              .agg(F.count("*").cast("bigint").alias("n_nodes"))
    total = hist.agg(F.sum("n_nodes").alias("_t"))
    return (hist.crossJoin(F.broadcast(total))
                .select("degree", "n_nodes",
                        F.round(F.col("n_nodes") / F.col("_t"), 6)
                         .alias("share")))

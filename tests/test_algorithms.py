"""Algorithm-level end-to-end tests (reference analogue: notebook
validation of FastSV CC and SSSP, SURVEY section 5.7)."""

import pytest

import dask_grblas_spark as gb
from dask_grblas_spark import algorithms as alg

# the 12-vertex FastSV notebook graph (FIXTURES.md): 3 components
FASTSV_EDGES = [(0, 1), (0, 2), (0, 3), (1, 2), (2, 4), (2, 5), (3, 4),
                (6, 7), (6, 8), (9, 10), (9, 11)]


def fastsv_matrix(spark):
    rows = [e[0] for e in FASTSV_EDGES] + [e[1] for e in FASTSV_EDGES]
    cols = [e[1] for e in FASTSV_EDGES] + [e[0] for e in FASTSV_EDGES]
    return gb.Matrix.from_values(rows, cols, [1] * len(rows), nrows=12, ncols=12)


def test_connected_components(spark):
    A = fastsv_matrix(spark)
    comp = alg.connected_components(A).to_dict()
    assert comp == {**{i: 0 for i in range(6)},
                    **{i: 6 for i in (6, 7, 8)},
                    **{i: 9 for i in (9, 10, 11)}}


def test_connected_components_high_diameter(spark):
    # a 64-vertex PATH (diameter 63): pure min-label propagation needs
    # ~63 rounds; the FastSV pointer-jumping shortcut converges in
    # O(log n). Correctness gate for the shortcut step — labels must
    # still collapse to the component minimum, plus one isolated vertex.
    n = 65
    rows = list(range(63)) + list(range(1, 64))
    cols = list(range(1, 64)) + list(range(63))
    A = gb.Matrix.from_values(rows, cols, [1] * len(rows),
                              nrows=n, ncols=n)
    comp = alg.connected_components(A).to_dict()
    assert comp == {**{i: 0 for i in range(64)}, 64: 64}


def test_bfs_level(spark):
    A = fastsv_matrix(spark)
    levels = alg.bfs_level(A, 0).to_dict()
    assert levels == {0: 0, 1: 1, 2: 1, 3: 1, 4: 2, 5: 2}


def test_sssp(spark):
    # weighted digraph: 0->1 (1), 0->2 (4), 1->2 (2), 2->3 (1), 1->3 (7)
    A = gb.Matrix.from_values([0, 0, 1, 2, 1], [1, 2, 2, 3, 3],
                              [1.0, 4.0, 2.0, 1.0, 7.0], nrows=4, ncols=4)
    dist = alg.sssp(A, 0).to_dict()
    assert dist == {0: 0.0, 1: 1.0, 2: 3.0, 3: 4.0}


def test_triangle_count(spark):
    # K4 has 4 triangles
    rows, cols = [], []
    for i in range(4):
        for j in range(4):
            if i != j:
                rows.append(i)
                cols.append(j)
    K4 = gb.Matrix.from_values(rows, cols, [1] * len(rows), nrows=4, ncols=4)
    assert alg.triangle_count(K4) == 4
    # FastSV graph: triangles {0,1,2}, {2?}: (0,2),(2,4),(3,4),(0,3) square;
    # triangles: (0,1,2) via 0-1,1-2,0-2; (0,3,4)? 0-3,3-4,0-4? no 0-4 edge.
    # (2,4,?) 2-4,3-4,2-3? no 2-3. So exactly 1 triangle.
    A = fastsv_matrix(spark)
    assert alg.triangle_count(A) == 1


def test_pagerank(spark):
    # simple 3-cycle: uniform ranks
    A = gb.Matrix.from_values([0, 1, 2], [1, 2, 0], [1, 1, 1], nrows=3, ncols=3)
    pr = alg.pagerank(A, max_iters=50, tol=1e-10).to_dict()
    for v in pr.values():
        assert v == pytest.approx(1 / 3, rel=1e-6)
    # star: center receives more rank; dangling center redistributes
    B = gb.Matrix.from_values([1, 2, 3], [0, 0, 0], [1, 1, 1], nrows=4, ncols=4)
    pr = alg.pagerank(B, max_iters=60, tol=1e-12).to_dict()
    assert pr[0] > pr[1]
    assert pr[1] == pytest.approx(pr[2], rel=1e-9)
    assert sum(pr.values()) == pytest.approx(1.0, rel=1e-6)


def test_symmetrize(spark):
    A = gb.Matrix.from_values([0], [1], [5], nrows=2, ncols=2)
    S = alg.symmetrize(A)
    assert S.to_dict() == {(0, 1): 5, (1, 0): 5}


def test_iterative_loops_release_their_caches(spark):
    """Regression: each CC/SSSP/BFS run used to leave its per-iteration
    frontier/state persists in Spark's SQL CacheManager (which never
    evicts on its own), so repeated runs degraded the whole session.
    Every persist made inside a loop must be released by the time it
    returns. Checked via CacheManager emptiness (localCheckpoint blocks
    are RDD-level, cleaned asynchronously, and NOT part of this leak)."""
    cm = spark._jsparkSession.sharedState().cacheManager()
    if not cm.isEmpty():
        pytest.skip("another test left session-level caches; emptiness "
                    "delta would be meaningless")
    A = fastsv_matrix(spark)
    for _ in range(2):
        alg.connected_components(A).to_dict()
        alg.bfs_level(A, 0).to_dict()
        alg.sssp(A, 0).to_dict()
    assert cm.isEmpty(), "iterative algorithms leaked cache entries"

"""Quickstart: the two faces of dask_grblas_spark in one script.

1. The GraphBLAS surface a dask-grblas user already knows (Vector /
   Matrix / semirings / masks / accumulators), running on Spark.
2. The training-data-pipeline layer (dedup, quality, retrieval,
   profiling) over the same SparkSession.

Run:  python examples/quickstart.py [sf_dir]   (default sf0.001)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (SparkSession.builder.master("local[4]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    import dask_grblas_spark as gb
    from dask_grblas_spark import algorithms as alg
    from dask_grblas_spark import semiring

    # ---- 1. GraphBLAS surface ------------------------------------
    # A sparse matrix from values (reference: Matrix.from_values)
    A = gb.Matrix.from_values([0, 0, 1, 2], [1, 2, 2, 0],
                              [1, 1, 1, 1], nrows=3, ncols=3)
    v = gb.Vector.from_values([0], [0], size=3)  # BFS seed at node 0

    # one masked min_plus step: A.mxv(frontier) follows edges INTO
    # node 0 (A[2,0] -> node 2); the structural mask drops the seed
    w = gb.Vector.new("INT64", 3)
    w(mask=~v.S) << A.mxv(v.apply("plus", right=1).new(),
                          semiring.min_plus)
    print("one masked min_plus step:", sorted(w.to_values()[0]))

    # a real algorithm on TPC-H derived data
    from dask_grblas_spark.sources import tpch
    nn = tpch.nation_matrix(spark, SF)
    comp = alg.connected_components(nn)
    n_comp = comp.df.select("v").distinct().count()
    print("nation trade graph components:", n_comp)

    # ---- 2. Pipeline layer ---------------------------------------
    from dask_grblas_spark.functions import dedup, profiling, text

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    dups = dedup.exact_dup_groups(docs)
    print("exact-dup groups:", dups.count())

    q = text.quality_score(docs)
    print("mean quality:",
          round(q.agg(F.avg("quality")).collect()[0][0], 4))

    auc = profiling.roc_auc(
        spark.read.parquet(f"{SF}/customer.parquet"),
        "c_acctbal", F.col("c_mktsegment") == "BUILDING")
    print("balance-vs-segment AUC:", auc.collect()[0]["auc"])

    # round 12: mergeable quantile sketch — per-day shards fold into
    # the exact same sketch the whole table builds (levels nest)
    from dask_grblas_spark.functions import sketches

    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        F.concat_ws(":", "l_orderkey", "l_linenumber").alias("uid"),
        F.col("l_extendedprice").alias("x"))
    sk = sketches.quantile_sketch_build(li, "x", "uid", k=128)
    med = sketches.quantile_sketch_query(sk, [0.5]).collect()[0]
    print(f"price p50 ~ {med['est']} from a {med['m']}-row sketch "
          f"of {med['n']} rows (level {med['level']})")

    # round 12: mergeable heavy hitters — top parts by shipped
    # quantity with a guaranteed containment interval (true total is
    # always inside [est_lo, est_hi]; any part above err is present)
    li2 = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        F.col("l_partkey").alias("pk"),
        F.col("l_quantity").cast("bigint").alias("qty"))
    hh = sketches.heavy_hitters_query(
        sketches.heavy_hitters_build(li2, "pk", k=5,
                                     weight_col="qty"))
    top = hh.orderBy(F.desc("est_lo")).limit(3).collect()
    print("top parts by qty:",
          [(r["key"], f"{r['est_lo']}..{r['est_hi']}") for r in top],
          "err", top[0]["err"] if top else None)

    spark.stop()


if __name__ == "__main__":
    main()

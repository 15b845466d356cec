"""One-off plan capture for the r12 batch-4 queries: before
(materialize gate forced off via a huge threshold — identical to the
pre-change lazy plans, the only code delta being the no-op gate call),
after (default gate), and after_materialized (forced gate).

Usage: python tools/capture_plans_b4.py [sf_dir]
Writes plans/r12/<query>_{before,after,after_materialized}.txt
"""
import os
import sys

QUERIES = [
    "q71_hyperplane_neardup", "q88_kmv_union", "q124_adamic_adar",
    "q128_basket", "q130_clustering_coef", "q140_cluster_terms",
    "q150_graph_jaccard", "q159_item_cf", "q269_prf_expansion",
    "q99_gapfill", "q114_retention",
]

VARIANTS = [
    ("before", "999999999999999"),
    ("after", None),
    ("after_materialized", "0"),
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else \
        os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .config("spark.sql.shuffle.partitions", cpus)
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.adaptive."
                     "maxShuffledHashJoinLocalMapThreshold", "64m")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.driver.memory", "48g")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import importlib

    for name, thr in VARIANTS:
        if thr is None:
            os.environ.pop("SPARK_GRAFT_MATERIALIZE_BYTES", None)
        else:
            os.environ["SPARK_GRAFT_MATERIALIZE_BYTES"] = thr
        import __spark_entry__ as e
        importlib.reload(e)
        qs = e.queries()
        for q in QUERIES:
            df = qs[q](spark, sf_dir)
            p = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            out = f"plans/r12/{q}_{name}.txt"
            with open(out, "w") as f:
                f.write(p)
            import re
            ex = len(re.findall(r"\(\d+\) Exchange", p))
            sc = len(re.findall(r"\(\d+\) Scan parquet", p))
            print(f"{q} {name}: exchanges={ex} scans={sc}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

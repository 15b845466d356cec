"""Flakiness harness for the float-heaviest gate queries: run each one
under several ``spark.sql.shuffle.partitions`` settings (which reorders
every shuffle fold and moves every range-partition boundary) and assert
the DRIVER-PARITY value hash (fixed-point 6-decimal + dtype-kind, the
check_oracle.py one) is IDENTICAL across all runs — catching the r8
q174 class (reorder-unstable rounded sums) before the driver does.

The probed set is the rounded-sum audit's highest-magnitude gates plus
the iterative-float families (kmeans/pca/Holt), where reduction order
feeds back through every iteration.

Usage: python tools/stability_probe.py [sf_dir] [query ...]
Exit non-zero if any gate's hash varies across partition settings.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from check_oracle import dtype_kinds, norm, value_hash  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = sys.argv[2:]

# the 10 float-heaviest gates: rounded-sum audit top magnitudes +
# iterative-float algorithms (every iteration re-folds doubles)
DEFAULT = ["q174_gini", "q203_cube", "q216_tpch_pricing",
           "q111_salted_join", "q228_mom_change", "q199_anova",
           "q146_rfm", "q97_semantic_dedup", "q215_pca",
           "q194_ks_test",
           # r9 additions: decimal top-k tie-breaks + the two-rank
           # quantile-normalize machinery + the QL score ranking
           "q224_tpch_returns", "q231_big_orders",
           "q248_quantile_normalize", "q243_dirichlet_ql",
           # r9 session 2: per-row ln quantization (theil), the
           # decimal-sum attribution rollup, the biggest new TPC-H
           # money sums, and the prefix-sum AP fold
           "q258_theil", "q262_attribution", "q251_tpch_volume",
           "q263_pr_auc",
           # r9 session 2b: the double-mean folds (lorenz buckets,
           # lttb neighbor averages) + the ln-term folds (nmi) + the
           # composed rank pipelines (prf, ann-recall)
           "q270_lorenz", "q275_lttb", "q273_nmi",
           "q269_prf_expansion", "q278_ann_recall",
           # r10 (r9 verdict item 6): FastSV label convergence under
           # partition variance, and partition-rewrite determinism
           "q266_near_dup_clusters", "q272_merge_upsert",
           # r10 session 2: the new float/rank-sensitive families —
           # tau-b sqrt fold, PMI ln ranking, per-group decimal 2U,
           # binned ECE decimal folds, and the bucketized two-pass
           # prefix-MIN (struct-min determinism under partitioning)
           "q287_kendall_binned", "q288_pmi_bigrams",
           "q290_group_auc", "q294_ece_calibration",
           "q297_first_touch_window",
           # r11 (r10 verdict item 7): the remaining r10 gates that
           # were only ad-hoc probed — decimal TPC-H money sorts,
           # grouped-count folds, readability ratios, the one-pass
           # quarantine split, tar-shard determinism, and the
           # capstone funnel's composed stages
           "q283_tpch_ship_priority", "q285_tpch_returned_items",
           "q286_tpch_waiting_supplier", "q292_k_anonymity",
           "q293_l_diversity", "q295_readability",
           "q298_csv_quarantine", "q299_tar_shards",
           "q300_pipeline_funnel",
           # r11 new gates: two-bucket rolling extremes under
           # partition variance, split-on-write quarantine, and the
           # prefix-sum bytes-targeted shard bucketing
           "q301_rolling_minmax", "q302_csv_quarantine_split",
           "q303_tar_shards_bytes",
           # r11 session 2: multi-annotator agreement decimal folds +
           # the PassJoin candidate set under partition variance
           "q304_fleiss_kappa", "q305_krippendorff",
           "q306_edit_distance_join", "q307_decayed_trending",
           "q308_fd_check", "q309_image_dhash",
           "q310_entity_resolution", "q311_image_hamming_dedup",
           "q312_join_cardinality", "q313_stream_outer_join",
           "q314_bloom_prune",
           # r12: decimal-compare TPC-H bank, the hash-level quantile
           # sketch (range window + ceil-index rule), the bloom
           # pre-join capstone (md5 bit math + decimal revenue)
           "q315_tpch_min_cost_supplier", "q316_tpch_important_stock",
           "q317_tpch_parts_supplier_cnt", "q318_tpch_part_promotion",
           "q319_tpch_above_region_avg", "q320_tpch_never_brand",
           "q321_quantile_sketch", "q322_bloom_prejoin",
           "q323_quantile_sketch_merge", "q324_stream_quantiles",
           # r12 session 2: canonical Misra-Gries — the two-phase
           # top-(k+1) threshold under partition variance (the
           # spark_partition_id tiebreak must never leak a value)
           "q325_token_heavy_hitters", "q326_heavy_hitters_merge",
           "q327_stream_heavy_hitters",
           # r12 session 2: the Apriori explodes (collect_set cap
           # determinism + float confidence/lift rounds)
           "q328_frequent_pairs", "q329_frequent_triples",
           "q330_weighted_heavy_hitters"]

PARTITION_GRID = (5, 32, 77, 200)


def main() -> int:
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.driver.memory", "8g")
             .config("spark.ui.enabled", "false")
             .config("spark.sql.session.timeZone", "UTC")
             .appName("stability-probe").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    names = ONLY or [n for n in DEFAULT if n in qs]
    unstable = []
    for name in names:
        hashes = []
        for parts in PARTITION_GRID:
            spark.conf.set("spark.sql.shuffle.partitions", str(parts))
            try:
                pdf = qs[name](spark, SF_DIR).toPandas()
            except Exception as e:  # noqa: BLE001
                hashes.append(f"ERROR:{type(e).__name__}")
                continue
            hashes.append(value_hash(norm(pdf))
                          + "/" + ",".join(dtype_kinds(pdf)))
        ok = len(set(hashes)) == 1 and not hashes[0].startswith("ERROR")
        if not ok:
            unstable.append(name)
        tag = "STABLE  " if ok else "UNSTABLE"
        print(f"{tag} {name}  parts={PARTITION_GRID} "
              f"hashes={[h[:10] for h in hashes]}")
    print(f"\n{len(unstable)} unstable: {unstable}")
    return 1 if unstable else 0


if __name__ == "__main__":
    raise SystemExit(main())

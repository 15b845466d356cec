"""Data-quality profiling: column statistics and referential-integrity
audits — the validation pass a 100 TB lake table gets on every publish
(null-rate drift, cardinality drift, orphaned foreign keys).

Everything is a single aggregation pass per table (all per-column
statistics ride in ONE agg — map-side combined, no per-column jobs) or
two marker joins + one union aggregate per FK check, expressed in plain Column arithmetic so the
DuckDB oracle replays values exactly.

Reference scope: the reference engine has no profiling layer; this
extends the pipeline surface (SURVEY.md "beyond the reference").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["profile_numeric", "fk_integrity"]


def profile_numeric(df: DataFrame, columns: list[str]) -> DataFrame:
    """Per-column numeric profile in long form: (col, n_rows, n_null,
    n_distinct, min_v, max_v, mean_v) with values cast to double and
    6-decimal rounded. ONE aggregation pass computes every column's
    statistics (count/min/max/mean are map-side combined;
    count_distinct adds the standard expand — still one job); the long
    format comes from exploding a literal array of result structs, not
    from per-column scans.

    For drift monitoring at 100 TB swap count_distinct for the HLL
    register sketch (sketches.hll_distinct) — exactness here keeps the
    gate hard-oracled."""
    aggs = []
    for c in columns:
        v = F.col(c).cast("double")
        aggs += [
            F.count("*").alias(f"{c}__rows"),
            F.sum(v.isNull().cast("bigint")).alias(f"{c}__nulls"),
            F.count_distinct(v).alias(f"{c}__dist"),
            F.min(v).alias(f"{c}__min"),
            F.max(v).alias(f"{c}__max"),
            F.avg(v).alias(f"{c}__mean"),
        ]
    one = df.agg(*aggs)
    structs = F.array(*[
        F.struct(F.lit(c).alias("col"),
                 F.col(f"{c}__rows").cast("bigint").alias("n_rows"),
                 F.col(f"{c}__nulls").cast("bigint").alias("n_null"),
                 F.col(f"{c}__dist").cast("bigint").alias("n_distinct"),
                 F.round(F.col(f"{c}__min"), 6).alias("min_v"),
                 F.round(F.col(f"{c}__max"), 6).alias("max_v"),
                 F.round(F.col(f"{c}__mean"), 6).alias("mean_v"))
        for c in columns])
    return (one.select(F.explode(structs).alias("s"))
               .select("s.col", "s.n_rows", "s.n_null", "s.n_distinct",
                       "s.min_v", "s.max_v", "s.mean_v"))


def fk_integrity(checks: list[tuple[str, DataFrame, str, DataFrame, str]]
                 ) -> DataFrame:
    """Referential-integrity audit: for each (name, child_df, fk_col,
    parent_df, pk_col) check, count child rows whose fk has no matching
    parent key (orphans) and parent keys with no child (childless —
    coverage, not a violation). Each check is two marker LEFT joins
    (child keys against the DISTINCT parent keys and the reverse —
    dimension-sized parent relations broadcast, Spark picks) whose
    UNION feeds one aggregate: no per-count jobs and no 1-row
    crossJoins in the plan. Output: (check, n_child, n_orphan,
    n_childless_parent)."""
    outs = []
    for name, child, fk, parent, pk in checks:
        ckeys = child.select(F.col(fk).cast("bigint").alias("k"))
        pkeys = parent.select(F.col(pk).cast("bigint").alias("k")).distinct()
        cside = (ckeys.join(pkeys.withColumn("_p", F.lit(1)),
                            on="k", how="left")
                      .select(F.lit(True).alias("is_child"),
                              F.col("_p").isNull().alias("bad")))
        pside = (pkeys.join(ckeys.distinct().withColumn("_c", F.lit(1)),
                            on="k", how="left")
                      .select(F.lit(False).alias("is_child"),
                              F.col("_c").isNull().alias("bad")))
        row = (cside.unionByName(pside).agg(
            F.sum(F.col("is_child").cast("bigint")).alias("n_child"),
            F.sum((F.col("is_child") & F.col("bad")).cast("bigint"))
             .alias("n_orphan"),
            F.sum(((~F.col("is_child")) & F.col("bad")).cast("bigint"))
             .alias("n_childless"))
            .select(F.lit(name).alias("check"),
                    F.col("n_child").cast("bigint").alias("n_child"),
                    F.col("n_orphan").cast("bigint").alias("n_orphan"),
                    F.col("n_childless").cast("bigint")
                     .alias("n_childless_parent")))
        outs.append(row)
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res

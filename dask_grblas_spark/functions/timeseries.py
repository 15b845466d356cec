"""Timeseries operators Spark lacks natively: as-of join and rolling
range-window aggregation over the events table.

Both are implemented as single-shuffle window formulations — NOT as
inequality joins. A naive as-of (`l JOIN r ON r.ts <= l.ts` + argmax)
is a per-key range join whose cost is quadratic in the hottest key; the
union + last_value(ignorenulls) formulation below is one hash exchange
on the key, one in-partition sort, then a linear scan — the plan shape
that survives a 100 TB event log with skewed users.

Differential-testable: DuckDB's native ASOF JOIN independently verifies
asof_join (same semantics, different algorithm), and SQL range-frame
windows verify rolling_agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["asof_join", "rolling_agg", "json_field_agg", "grouped_topk"]


def asof_join(left: DataFrame, right: DataFrame, on: str | list[str],
              left_ts: str = "ts", right_ts: str = "ts",
              tolerance_seconds: int | None = None,
              prefix: str = "asof_") -> DataFrame:
    """For each left row, attach the LATEST right row with
    ``right.ts <= left.ts`` on the same key(s) (backward as-of; the
    standard event-log enrichment join). Right columns come back
    ``prefix``-renamed; unmatched left rows keep them null.
    ``tolerance_seconds`` voids matches older than the bound.

    Tie semantics: right rows at exactly ``left.ts`` DO match; among
    right rows sharing (key, ts) the greatest row (struct-lexicographic
    over the right columns) wins — deterministic by construction. Feed a
    per-(key, ts) deduplicated right side to choose a different rule.

    Plan: union both sides tagged (right sorts before left at equal ts),
    one window partitioned by key ordered by (ts, side, payload), and a
    running last_value over the right payload. One shuffle; no range
    join, no per-row scan."""
    keys = [on] if isinstance(on, str) else list(on)
    lcols = [c for c in left.columns if c not in keys]
    rcols = [c for c in right.columns if c not in keys]

    l2 = left.select(
        *keys, F.col(left_ts).alias("_ts"), F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in lcols]).alias("_l"),
        F.lit(None).cast(
            right.select(F.struct(*[F.col(c) for c in rcols])
                         .alias("_r")).schema["_r"].dataType).alias("_r"))
    r2 = right.select(
        *keys, F.col(right_ts).alias("_ts"), F.lit(0).alias("_side"),
        F.lit(None).cast(
            left.select(F.struct(*[F.col(c) for c in lcols])
                        .alias("_l")).schema["_l"].dataType).alias("_l"),
        F.struct(*[F.col(c) for c in rcols]).alias("_r"))
    merged = l2.unionByName(r2)

    w = (Window.partitionBy(*keys).orderBy("_ts", "_side", "_r")
               .rowsBetween(Window.unboundedPreceding, 0))
    matched = (merged.withColumn("_m", F.last("_r", ignorenulls=True).over(w))
                     .filter(F.col("_side") == 1))
    if tolerance_seconds is not None:
        age = (F.col("_ts").cast("double")
               - F.col(f"_m.{right_ts}").cast("double"))
        matched = matched.withColumn(
            "_m", F.when(age <= tolerance_seconds, F.col("_m")))
    out_cols = ([F.col(k) for k in keys]
                + [F.col(f"_l.{c}").alias(c) for c in lcols]
                + [F.col(f"_m.{c}").alias(f"{prefix}{c}") for c in rcols])
    return matched.select(*out_cols)


def rolling_agg(df: DataFrame, key: str = "user_id", ts_col: str = "ts",
                value_col: str = "value",
                window_seconds: int = 3600) -> DataFrame:
    """Per-row trailing-window aggregate: count and sum of the same
    key's rows in the preceding ``window_seconds`` (inclusive of the
    current row's second). One shuffle on the key; the range frame is a
    streaming in-partition scan — Spark never materializes the window.

    The frame is defined on WHOLE SECONDS (``ts`` cast to epoch
    seconds): rows within the same second are frame peers, which keeps
    the semantics engine-independent (sub-second ordering is where
    engines disagree)."""
    sec = F.col(ts_col).cast("long")
    w = (Window.partitionBy(key).orderBy(sec)
               .rangeBetween(-window_seconds, 0))
    return (df.withColumn("roll_n", F.count("*").over(w))
              .withColumn("roll_sum",
                          F.round(F.sum(value_col).over(w), 2)))


def json_field_agg(events_df: DataFrame, field: str = "k",
                   props_col: str = "props",
                   group_col: str = "event_type") -> DataFrame:
    """Semi-structured extraction + rollup: parse the JSON ``props``
    column with ``from_json`` (a typed struct, not string plucking — the
    parse happens once per row inside codegen and prunes to the one
    field) and aggregate the extracted value per group. The data-lake
    pattern for event streams that carry a JSON payload column.

    Output: (group, n_events, sum_field, mean_field)."""
    schema = f"{field} BIGINT"
    parsed = events_df.withColumn(
        "_p", F.from_json(F.col(props_col), schema))
    val = F.col("_p").getField(field)
    return (parsed.groupBy(F.col(group_col).alias("grp"))
                  .agg(F.count("*").alias("n_events"),
                       F.sum(val).cast("bigint").alias("sum_field"),
                       F.round(F.sum(val) / F.count(val), 6)
                        .alias("mean_field")))


def grouped_topk(events_df: DataFrame, ts_col: str = "ts",
                 group_col: str = "event_type", k: int = 3,
                 bucket: str = "hour") -> DataFrame:
    """Per-time-bucket top-k groups by event count (the classic
    heavy-hitters analytic): one map-side-combined (bucket, group)
    aggregation, then rank windows PARTITIONED BY BUCKET over the
    bounded (bucket x distinct-groups) count relation — never over raw
    events, so the window input stays tiny at any event volume.
    Ties rank by group name. Output: (ws, grp, n, rank)."""
    ws = F.unix_timestamp(F.date_trunc(bucket, F.col(ts_col))) \
          .cast("bigint").alias("ws")
    counts = (events_df.select(ws, F.col(group_col).alias("grp"))
              .groupBy("ws", "grp")
              .agg(F.count("*").alias("n")))
    w = Window.partitionBy("ws").orderBy(F.col("n").desc(), F.col("grp"))
    return (counts.withColumn("rank",
                              F.row_number().over(w).cast("int"))
                  .filter(F.col("rank") <= k))

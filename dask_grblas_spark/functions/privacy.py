"""PII scrubbing over a documents table — the privacy pass of a
training-data pipeline (strip emails / IPs / long digit runs before
anything is tokenized or packed).

Pure regexp Column expressions (one scan, no shuffle, whole-stage
codegen). Patterns are deliberately restricted to syntax with identical
semantics in Java regex (Spark) and RE2 (DuckDB) — character classes,
bounded repetition, and word boundaries — so the oracle replays the
scrub bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# portable across Java regex and RE2 (no lookaround, no backrefs)
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
LONGNUM_RE = r"\b\d{7,}\b"


def redact_pii(df: DataFrame, text_col: str = "text",
               out_col: str = "clean_text") -> DataFrame:
    """Replace emails -> <EMAIL>, IPv4s -> <IP>, 7+-digit runs -> <NUM>,
    in that order (emails are scrubbed first so their digits never count
    as bare numbers; each count is taken on the text as it stands when
    its pattern runs, exactly like the replacement). Adds
    (out_col, n_emails, n_ips, n_longnums)."""
    t0 = F.col(text_col)
    n_email = F.regexp_count(t0, F.lit(EMAIL_RE))
    t1 = F.regexp_replace(t0, EMAIL_RE, "<EMAIL>")
    n_ip = F.regexp_count(t1, F.lit(IPV4_RE))
    t2 = F.regexp_replace(t1, IPV4_RE, "<IP>")
    n_num = F.regexp_count(t2, F.lit(LONGNUM_RE))
    t3 = F.regexp_replace(t2, LONGNUM_RE, "<NUM>")
    return (df.withColumn(out_col, t3)
              .withColumn("n_emails", n_email.cast("bigint"))
              .withColumn("n_ips", n_ip.cast("bigint"))
              .withColumn("n_longnums", n_num.cast("bigint")))


def k_anonymity(df: DataFrame, quasi_cols: list[str],
                k: int = 5) -> DataFrame:
    """k-anonymity audit over a set of quasi-identifier columns: every
    row must share its quasi-identifier combination with at least k-1
    others, or the release re-identifies (Sweeney 2002) — the
    governance gate a training-data release runs BEFORE export.

    ONE grouped count over the quasi columns (map-side combined),
    then a constant-size fold: group count, violating-group count,
    rows at risk, the minimum group size, and the anonymous-row
    fraction (round 6). NULLs in quasi columns group as their own
    value (NULL is an identifier too). Output: one row
    (k, n_rows, n_groups, n_violating_groups, n_rows_at_risk,
    min_group_size, anon_fraction)."""
    g = (df.groupBy(*[F.col(c) for c in quasi_cols])
           .agg(F.count("*").cast("bigint").alias("_c")))
    return (g.agg(
        F.lit(int(k)).cast("bigint").alias("k"),
        F.sum("_c").cast("bigint").alias("n_rows"),
        F.count("*").cast("bigint").alias("n_groups"),
        F.sum(F.when(F.col("_c") < k, 1).otherwise(0))
         .cast("bigint").alias("n_violating_groups"),
        F.sum(F.when(F.col("_c") < k, F.col("_c")).otherwise(0))
         .cast("bigint").alias("n_rows_at_risk"),
        F.min("_c").cast("bigint").alias("min_group_size"))
        .withColumn(
            "anon_fraction",
            F.round((F.col("n_rows") - F.col("n_rows_at_risk"))
                    / F.col("n_rows").cast("double"), 6)))


def l_diversity(df: DataFrame, quasi_cols: list[str],
                sensitive_col: str, l: int = 2) -> DataFrame:
    """Distinct l-diversity audit: each quasi-identifier group must
    contain at least l DISTINCT values of the sensitive attribute
    (Machanavajjhala 2007) — k-anonymity's complement (a large group
    that is all one diagnosis still leaks). One grouped
    count_distinct over the quasi columns + a constant fold. Output:
    one row (l, n_groups, n_violating_groups, min_distinct,
    diverse_fraction round 6)."""
    g = (df.groupBy(*[F.col(c) for c in quasi_cols])
           .agg(F.count_distinct(F.col(sensitive_col))
                 .cast("bigint").alias("_d")))
    return (g.agg(
        F.lit(int(l)).cast("bigint").alias("l"),
        F.count("*").cast("bigint").alias("n_groups"),
        F.sum(F.when(F.col("_d") < l, 1).otherwise(0))
         .cast("bigint").alias("n_violating_groups"),
        F.min("_d").cast("bigint").alias("min_distinct"))
        .withColumn(
            "diverse_fraction",
            F.round((F.col("n_groups") - F.col("n_violating_groups"))
                    / F.col("n_groups").cast("double"), 6)))

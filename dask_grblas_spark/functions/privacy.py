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

"""Context-window preparation: token-window chunking and greedy
sequence packing — the last mile of a training-data pipeline (turn
cleaned documents into fixed-budget training sequences).

- chunk_documents: sliding token windows with overlap, pure Column
  expressions (posexplode over a computed chunk count + slice) — one
  scan, no shuffle, no Python.
- pack_sequences: greedy first-fit-in-order packing of documents into
  token-budget bins. Greedy packing is a RESET-CUMSUM scan — inherently
  sequential per stream — so the corpus is split into deterministic
  hash shards and each shard is packed independently by an
  applyInPandas scan (the sanctioned per-partition-imperative case:
  no Column algebra expresses "reset the accumulator when it would
  overflow"). Shards are the parallelism unit: at 100 TB pick
  n_shards ~ cluster cores; each task is one linear pass over its
  shard's (doc_id-ordered) lengths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens


def chunk_documents(df: DataFrame, chunk_tokens: int = 128,
                    overlap: int = 16, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Split each document into sliding token windows of
    ``chunk_tokens`` tokens advancing by ``chunk_tokens - overlap``.
    The final partial window is kept (training pipelines pad it); an
    empty document yields one empty chunk. Output: (doc_id, chunk_id,
    n_tokens, chunk_text)."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    step = chunk_tokens - overlap
    toks = F.filter(tokens(F.col(text_col)), lambda x: F.length(x) > 0)
    base = df.select(F.col(id_col).alias("doc_id"), toks.alias("_toks"))
    # chunks cover [i*step, i*step + chunk_tokens); last start is the
    # largest i*step < n (so every token is covered, nothing dangling
    # beyond one window): n_chunks = 1 + floor((n - overlap - 1)/step)
    # for n > chunk_tokens, else 1
    n = F.size("_toks")
    n_chunks = F.when(
        n <= chunk_tokens, F.lit(1)
    ).otherwise(F.floor((n - overlap - 1) / step) + 1).cast("bigint")
    out = base.select(
        "doc_id", "_toks",
        F.posexplode(F.sequence(F.lit(0), n_chunks - 1))
         .alias("chunk_id", "_c"))
    sl = F.slice(F.col("_toks"), F.col("chunk_id").cast("int") * step + 1,
                 chunk_tokens)
    return out.select(
        "doc_id", F.col("chunk_id").cast("bigint").alias("chunk_id"),
        F.size(sl).cast("bigint").alias("n_tokens"),
        F.array_join(sl, " ").alias("chunk_text"))


def pack_sequences(df: DataFrame, budget: int = 1024,
                   n_shards: int = 8, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Greedy first-fit-in-order packing: within each deterministic
    hash shard, walk documents in doc_id order accumulating token
    lengths; when the next document would overflow ``budget``, start a
    new pack. A document longer than the budget gets a pack of its own
    (it overflows immediately — truncation is the caller's policy).

    Deterministic and cross-engine reproducible: shard = md5-derived
    hash of the id (cross_hash60 % n_shards), order = doc_id, so a SQL
    recursive CTE replays the exact scan. Output: (doc_id, shard,
    pack_id, pack_pos, tok_len) where pack_id numbers packs within the
    shard and pack_pos the document's position inside its pack."""
    import pandas as pd

    from .dedup import cross_hash60

    toks = F.filter(tokens(F.col(text_col)), lambda x: F.length(x) > 0)
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).cast("bigint").alias("tok_len"),
        F.pmod(cross_hash60(F.col(id_col).cast("string")),
               F.lit(n_shards)).alias("shard"))

    def pack(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("doc_id", ignore_index=True)
        lens = pdf["tok_len"].to_numpy()
        pack_id = [0] * len(lens)
        pack_pos = [0] * len(lens)
        cur, acc, pos = 0, 0, 0
        for i, ln in enumerate(lens):
            # the current pack is nonempty for every doc after the
            # first (it holds at least the previous doc) — membership,
            # not token count, guards the overflow check, so an
            # oversize doc never shares a pack even behind zero-length
            # members
            if i > 0 and acc + ln > budget:
                cur += 1
                acc, pos = 0, 0
            pack_id[i] = cur
            pack_pos[i] = pos
            acc += ln
            pos += 1
        pdf["pack_id"] = pd.Series(pack_id, dtype="int64")
        pdf["pack_pos"] = pd.Series(pack_pos, dtype="int64")
        return pdf[["doc_id", "shard", "pack_id", "pack_pos", "tok_len"]]

    return (base.groupBy("shard")
                .applyInPandas(pack,
                               schema="doc_id bigint, shard bigint, "
                                      "pack_id bigint, pack_pos bigint, "
                                      "tok_len bigint"))

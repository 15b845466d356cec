"""Synthesize a larger SF directory by deterministically row-multiplying
an existing one (r12 verdict item 2: the sf0.1 bench cannot execute the
size-gated at-scale branches; one sf1-class run converts the committed
forced-gate plans from a structural argument into a measured one).

Key spaces are offset per replica so join semantics are preserved
(orders->customer, lineitem->orders/part/supplier, events/documents/
embeddings ids stay unique); nation/region stay fixed (the TPC-H
constants). Text is word-shuffled per (doc_id, replica) — token
statistics preserved, shingle sets destroyed — so the dedup family sees
a corpus that GROWS instead of one giant 10x-duplicate cluster; one
embedding component is perturbed per replica for the same reason.
Everything is a pure function of (row, replica): the output is
deterministic, but it is a SCALE PROBE, not an oracle fixture.

Usage: python tools/make_sf.py <src_sf_dir> <dst_sf_dir> <multiplier>
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SRC = sys.argv[1]
DST = sys.argv[2]
M = int(sys.argv[3])

os.makedirs(DST, exist_ok=True)


def load(name: str) -> tuple[pd.DataFrame, pa.Schema]:
    t = pq.read_table(f"{SRC}/{name}.parquet")
    return t.to_pandas(), t.schema


def save(name: str, frames: list[pd.DataFrame], schema: pa.Schema):
    df = pd.concat(frames, ignore_index=True)
    pq.write_table(pa.Table.from_pandas(df, schema=schema,
                                        preserve_index=False),
                   f"{DST}/{name}.parquet")
    print(f"{name}: {len(df)} rows")


def offset(df: pd.DataFrame, col: str, k: int, r: int) -> pd.DataFrame:
    df = df.copy()
    df[col] = df[col] + r * k
    return df


def main() -> int:
    cust, s_cust = load("customer")
    supp, s_supp = load("supplier")
    part, s_part = load("part")
    orders, s_ord = load("orders")
    li, s_li = load("lineitem")
    ev, s_ev = load("events")
    docs, s_docs = load("documents")
    emb, s_emb = load("embeddings")

    kc = int(cust.c_custkey.max()) + 1
    ks = int(supp.s_suppkey.max()) + 1
    kp = int(part.p_partkey.max()) + 1
    ko = int(orders.o_orderkey.max()) + 1
    ke = int(ev.event_id.max()) + 1
    ku = int(ev.user_id.max()) + 1
    kd = int(docs.doc_id.max()) + 1
    kv = int(emb.vec_id.max()) + 1

    for name in ("nation", "region"):
        t = pq.read_table(f"{SRC}/{name}.parquet")
        pq.write_table(t, f"{DST}/{name}.parquet")
        print(f"{name}: copied")

    save("customer", [offset(cust, "c_custkey", kc, r) for r in range(M)],
         s_cust)
    save("supplier", [offset(supp, "s_suppkey", ks, r) for r in range(M)],
         s_supp)
    save("part", [offset(part, "p_partkey", kp, r) for r in range(M)],
         s_part)

    frames = []
    for r in range(M):
        d = orders.copy()
        d["o_orderkey"] += r * ko
        d["o_custkey"] += r * kc
        frames.append(d)
    save("orders", frames, s_ord)

    frames = []
    for r in range(M):
        d = li.copy()
        d["l_orderkey"] += r * ko
        d["l_partkey"] += r * kp
        d["l_suppkey"] += r * ks
        frames.append(d)
    save("lineitem", frames, s_li)

    frames = []
    for r in range(M):
        d = ev.copy()
        d["event_id"] += r * ke
        d["user_id"] += r * ku
        frames.append(d)
    save("events", frames, s_ev)

    frames = []
    for r in range(M):
        d = docs.copy()
        d["doc_id"] += r * kd
        if r:
            def shuf(row):
                words = row["text"].split()
                rng = np.random.default_rng(int(row["doc_id"]) * 31 + r)
                rng.shuffle(words)
                return " ".join(words)
            d["text"] = d.apply(shuf, axis=1)
        frames.append(d)
    save("documents", frames, s_docs)

    frames = []
    dim = len(emb.embedding.iloc[0])
    for r in range(M):
        d = emb.copy()
        d["vec_id"] += r * kv
        if r:
            def perturb(row):
                v = np.array(row["embedding"], dtype=np.float32)
                v[(int(row["vec_id"]) + r) % dim] += 0.05 * r
                return v.tolist()
            d["embedding"] = d.apply(perturb, axis=1)
        frames.append(d)
    save("embeddings", frames, s_emb)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

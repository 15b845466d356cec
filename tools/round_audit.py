"""Audit gate oracles for hash-unstable rounded sums (the r8 q174
class): a ``ROUND(SUM(<double>), d)`` is only driver-hash-stable when
the reduction-order noise of the double sum (~ |sum| * n_terms * eps)
stays below the 6-decimal fixed-point quantum the driver prints, i.e.
below both 0.5e-6 (print stability) and 0.5 * 10**-d (round
stability).

This runs every oracle in DuckDB at the gate SF and reports, for each
float column, the max |value| and the implied significant digits a
6-decimal fixed-point print demands (log10|v| + 6).  Columns above
``--threshold`` digits (default 13) are flagged for manual review:
either the value is a bounded-cardinality sum (fine), an exact decimal
(fine), or it needs the q174 treatment (DECIMAL sums / coarser
rounding).

Usage: python tools/round_audit.py [sf_dir] [--threshold 13]
"""

from __future__ import annotations

import math
import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
THRESH = 13.0
if "--threshold" in sys.argv:
    THRESH = float(sys.argv[sys.argv.index("--threshold") + 1])

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def main() -> int:
    import __spark_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_DIR}/{t}.parquet')")
    rows = []
    for name, sql in entrymod.oracle_sql().items():
        try:
            df = con.execute(sql).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"SKIP  {name}: {type(e).__name__}: {e}")
            continue
        for c in df.columns:
            if not pd.api.types.is_float_dtype(df[c]):
                continue
            v = df[c].abs().max()
            if pd.isna(v) or v == 0:
                continue
            digits = math.log10(float(v)) + 6.0
            rows.append((digits, float(v), name, c))
    rows.sort(reverse=True)
    flagged = 0
    for digits, v, name, c in rows:
        mark = "FLAG" if digits >= THRESH else "ok  "
        if digits >= THRESH:
            flagged += 1
        if digits >= THRESH - 2:  # print the interesting tail too
            print(f"{mark} {digits:5.1f} digits  max|v|={v:.6g}"
                  f"  {name}.{c}")
    print(f"\n{flagged} columns at >= {THRESH} significant digits "
          f"(of {len(rows)} float columns)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

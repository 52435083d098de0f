#!/usr/bin/env python
"""Build the 10x-scaled corpus used by scripts/sweep_cores.py.

Rounds 6/8 built equivalent corpora ad-hoc and lost the builders with
the session; this one is committed so the scale studies reproduce.

Scheme (PERFORMANCE.md round 10):
- documents: 10 copies; copy k shifts doc_id by k*100000 and rotates
  [a-z], [A-Z], [0-9] each by k via translate() — length-preserving,
  identical chars map identically WITHIN a copy (so each copy
  reproduces the 1x dedup/near-dup pair structure), while copies are
  char-5-gram-disjoint for k > 0 (no artificial cross-copy cliques).
- lineitem/orders: 10 copies with orderkeys shifted by k*10_000_000 —
  the l_orderkey -> o_orderkey FK is preserved; part/supp/cust keys
  stay within the UNSCALED dims (facts grow, dims fixed — the realistic
  scale-up shape).
- embeddings: 10 copies with shifted vec_ids, vectors unchanged
  (brute-force/index work is |corpus|-proportional regardless of
  values; near-dup structure replicates per copy).
- region/nation/customer/supplier/part/events copied 1x. events is
  copied byte-for-byte on purpose: rewriting it through DuckDB would
  change its TIMESTAMP(NANOS) physical type and break load_table's
  nanosAsLong contract.

Usage: python scripts/build_scale_corpus.py [src_sf_dir] [out_dir]
Defaults: /root/testdata/sf0.1 -> /tmp/scale_cores
"""

from __future__ import annotations

import shutil
import string
import sys
from pathlib import Path

import duckdb

COPIES = 10
DOC_ID_STRIDE = 100_000
ORDERKEY_STRIDE = 10_000_000
VEC_ID_STRIDE = 100_000


def rot_expr(col: str, k: int) -> str:
    if k == 0:
        return col
    src = string.ascii_lowercase + string.ascii_uppercase + string.digits
    dst = (
        string.ascii_lowercase[k:] + string.ascii_lowercase[:k]
        + string.ascii_uppercase[k:] + string.ascii_uppercase[:k]
        + string.digits[k:] + string.digits[:k]
    )
    return f"translate({col}, '{src}', '{dst}')"


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale_cores")
    out.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()

    docs = [
        f"SELECT doc_id + {k * DOC_ID_STRIDE} AS doc_id,"
        f" {rot_expr('text', k)} AS text, {rot_expr('lang', k)} AS lang,"
        f" {rot_expr('source', k)} AS source, n_chars"
        f" FROM read_parquet('{sf}/documents.parquet')"
        for k in range(COPIES)
    ]
    con.execute(
        f"COPY ({' UNION ALL '.join(docs)}) TO '{out}/documents.parquet'"
        " (FORMAT PARQUET)"
    )

    for t, key in (("lineitem", "l_orderkey"), ("orders", "o_orderkey")):
        parts = [
            f"SELECT * REPLACE ({key} + {k * ORDERKEY_STRIDE} AS {key})"
            f" FROM read_parquet('{sf}/{t}.parquet')"
            for k in range(COPIES)
        ]
        con.execute(
            f"COPY ({' UNION ALL '.join(parts)}) TO '{out}/{t}.parquet'"
            " (FORMAT PARQUET)"
        )

    embs = [
        f"SELECT vec_id + {k * VEC_ID_STRIDE} AS vec_id, embedding, label"
        f" FROM read_parquet('{sf}/embeddings.parquet')"
        for k in range(COPIES)
    ]
    con.execute(
        f"COPY ({' UNION ALL '.join(embs)}) TO '{out}/embeddings.parquet'"
        " (FORMAT PARQUET)"
    )

    for t in ("region", "nation", "customer", "supplier", "part", "events"):
        shutil.copy(f"{sf}/{t}.parquet", out / f"{t}.parquet")

    for t in ("documents", "lineitem", "orders", "embeddings"):
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()

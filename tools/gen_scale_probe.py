"""Generate a scale-probe dataset by key-shifted replication of sf0.1.

The driver ships sf0.001/0.01/0.1 only; the 100 TB posture claims ("this
plan survives 100x") deserve at least one measured order of magnitude.
This tool writes an sfN-equivalent dataset (default 10x sf0.1 ~= sf1)
under ``.scale_probe/`` by unioning N copies of each sf0.1 table with
per-copy key shifts that PRESERVE every join relationship:

- each key domain (orderkey, custkey, suppkey, partkey, user, event,
  doc, vec) gets one power-of-ten stride > its max, applied identically
  wherever the domain appears (PK and FK side), so referential integrity
  and join fan-outs match the original distribution;
- ``nation``/``region`` are fixed domains (25/5 rows at every TPC-H SF)
  and are copied as-is; nationkey FKs are left unshifted;
- ``documents.text`` gets a per-copy suffix token so cross-copy rows are
  near-dups rather than byte-dups (10 identical copies of every doc
  would make every LSH bucket artificially hot); intra-copy dup
  structure is exactly sf0.1's, scaled 10x;
- timestamps are left unshifted: 10x rows in the same window = a 10x
  busier system, which is the realistic densification for window/
  streaming operators.

Output is NOT driver testdata — it exists for ``bench.py`` runs with
``SPARK_GRAFT_SF_DIR=.scale_probe/sf1`` (see SCALE_PROBE.md).

Usage: python tools/gen_scale_probe.py [copies] [out_dir]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"

#: column -> key domain; every appearance of a domain shifts by the same
#: stride so joins keep working
DOMAIN_COLS = {
    "c_custkey": "cust",
    "o_custkey": "cust",
    "o_orderkey": "order",
    "l_orderkey": "order",
    "l_partkey": "part",
    "p_partkey": "part",
    "l_suppkey": "supp",
    "s_suppkey": "supp",
    "event_id": "event",
    "user_id": "user",
    "doc_id": "doc",
    "vec_id": "vec",
}

#: domain -> (table, col) to measure the stride from
DOMAIN_MAX_SRC = {
    "cust": ("customer", "c_custkey"),
    "order": ("orders", "o_orderkey"),
    "part": ("part", "p_partkey"),
    "supp": ("supplier", "s_suppkey"),
    "event": ("events", "event_id"),
    "user": ("events", "user_id"),
    "doc": ("documents", "doc_id"),
    "vec": ("embeddings", "vec_id"),
}

REPLICATED = [
    "customer",
    "orders",
    "lineitem",
    "supplier",
    "part",
    "events",
    "documents",
    "embeddings",
]
FIXED = ["nation", "region"]


def main() -> None:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".scale_probe",
            f"sf{copies / 10:g}",
        )
    )
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    strides: dict[str, int] = {}
    for dom, (tbl, col) in DOMAIN_MAX_SRC.items():
        mx = con.sql(
            f"SELECT max({col}) FROM '{SRC}/{tbl}.parquet'"
        ).fetchone()[0]
        strides[dom] = 10 ** math.ceil(math.log10(int(mx) + 2))

    for tbl in FIXED:
        con.sql(
            f"COPY (SELECT * FROM '{SRC}/{tbl}.parquet') TO "
            f"'{out}/{tbl}.parquet' (FORMAT PARQUET)"
        )
        print(f"{tbl}: copied as-is")

    for tbl in REPLICATED:
        cols = [
            r[0]
            for r in con.sql(
                f"DESCRIBE SELECT * FROM '{SRC}/{tbl}.parquet'"
            ).fetchall()
        ]
        sel = []
        for c in cols:
            if c in DOMAIN_COLS:
                sel.append(f"{c} + c * {strides[DOMAIN_COLS[c]]} AS {c}")
            elif tbl == "documents" and c == "text":
                # near-dup (not byte-dup) across copies; same tail-token
                # shape for every copy so shingle counts stay comparable
                sel.append("concat(text, ' xcopy', CAST(c AS VARCHAR)) AS text")
            elif tbl == "documents" and c == "n_chars":
                sel.append(
                    "n_chars + 7 + CASE WHEN c >= 10 THEN 2 ELSE 1 END AS n_chars"
                )
            else:
                sel.append(c)
        q = (
            f"SELECT {', '.join(sel)} FROM '{SRC}/{tbl}.parquet', "
            f"range({copies}) r(c)"
        )
        con.sql(
            f"COPY ({q}) TO '{out}/{tbl}.parquet' "
            f"(FORMAT PARQUET, ROW_GROUP_SIZE 262144)"
        )
        n = con.sql(f"SELECT count(*) FROM '{out}/{tbl}.parquet'").fetchone()[0]
        print(f"{tbl}: {n} rows x{copies}")

    print(f"wrote {out}")


if __name__ == "__main__":
    main()

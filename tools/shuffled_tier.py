"""Synthesize a row-order/partitioning-SHUFFLED copy of a testdata tier.

Every table keeps exactly the same ROWS but loses every accident of
physical layout the source tier has:

- row ORDER is permuted deterministically (sorted by md5 of the row's
  unique key), so nothing about "the first row" or "file order" of the
  source survives;
- each table is split across ``n_files`` part files by an md5 bucket of
  the key (``{name}.parquet`` becomes a DIRECTORY of part files, which
  ``spark.read.parquet`` consumes identically to a single file), so
  Spark's partition composition and scan order differ completely from
  the source tier.

A query whose RESULT is a pure function of the input relation — which
is what every oracled query claims, and what a 1000-executor cluster
requires, since partition order there is an arbitrary scheduling
accident — returns identical output on the shuffled tier.  A query that
leans on incidental row order (``F.first`` without ordering, a
``collect_list`` consumed order-sensitively, a window missing a
deterministic tiebreaker) flips here and nowhere else.

Used by tests/test_shuffled_oracle.py, which re-runs the full DuckDB
oracle comparison on the shuffled tier.
"""

from __future__ import annotations

import os

import duckdb

SRC = "/root/testdata/sf0.001"

# unique row key per table (composite where needed) — the permutation
# and the file split are both deterministic functions of this key
ROW_KEY = {
    "region": ("r_regionkey",),
    "nation": ("n_nationkey",),
    "customer": ("c_custkey",),
    "supplier": ("s_suppkey",),
    "part": ("p_partkey",),
    "orders": ("o_orderkey",),
    "lineitem": ("l_orderkey", "l_linenumber"),
    "events": ("event_id",),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}


def synthesize(dst_root: str, src: str = SRC, n_files: int = 3) -> str:
    """Write the shuffled tier under ``dst_root``; returns the tier dir."""
    con = duckdb.connect()
    os.makedirs(dst_root, exist_ok=True)
    for name, key in ROW_KEY.items():
        d = os.path.join(dst_root, f"{name}.parquet")
        os.makedirs(d, exist_ok=True)
        keystr = " || ':' || ".join(f"CAST({k} AS VARCHAR)" for k in key)
        for i in range(n_files):
            # bucket by one md5 hex digit, permute within the bucket by
            # the full digest — both stable across runs and engines
            con.execute(
                f"COPY (SELECT * FROM '{src}/{name}.parquet' "
                f"      WHERE (ascii(substr(md5({keystr}), 1, 1)) % {n_files}) = {i} "
                f"      ORDER BY md5({keystr})) "
                f"TO '{d}/part-{i}.parquet' (FORMAT PARQUET)"
            )
    con.close()
    return dst_root


if __name__ == "__main__":
    import sys

    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/shuffled_tier"
    print(synthesize(out))

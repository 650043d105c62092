"""Synthesize degenerate test tiers from the sf0.001 testdata.

Three tiers, each with the full 10-table catalog schema:

- ``empty``    — 0 rows per table.
- ``one_row``  — exactly 1 row per table (smallest key, deterministic).
- ``null_opt`` — all sf0.001 rows, but every non-key column NULL (typed).
  Key columns (primary/foreign keys and line numbers) are preserved so
  joins still have join keys; everything else — timestamps, texts,
  prices, embeddings — is NULL, stressing every null-guard in the
  engine at once.

Used by tests/test_degenerate.py to assert the whole query registry is
crash-free, schema-stable, and NaN/Inf-free on inputs real pipelines
WILL eventually see (an empty partition after a filter, a single
surviving row, a sparse extract where optional fields are null).
"""

from __future__ import annotations

import os

import duckdb

SRC = "/root/testdata/sf0.001"

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# columns preserved in the null_opt tier (join keys / row identity);
# every other column becomes a typed NULL
KEEP = {
    "region": {"r_regionkey"},
    "nation": {"n_nationkey", "n_regionkey"},
    "customer": {"c_custkey", "c_nationkey"},
    "supplier": {"s_suppkey", "s_nationkey"},
    "part": {"p_partkey"},
    "orders": {"o_orderkey", "o_custkey"},
    "lineitem": {"l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"},
    "events": {"event_id", "user_id"},
    "documents": {"doc_id"},
    "embeddings": {"vec_id"},
}


def synthesize(dst_root: str, src: str = SRC) -> dict[str, str]:
    """Write the three tiers under ``dst_root/{empty,one_row,null_opt}``;
    returns tier-name -> directory."""
    con = duckdb.connect()
    tiers = {}
    for tier in ("empty", "one_row", "null_opt"):
        d = os.path.join(dst_root, tier)
        os.makedirs(d, exist_ok=True)
        tiers[tier] = d
    for name in TABLES:
        path = f"{src}/{name}.parquet"
        cols = con.sql(f"DESCRIBE SELECT * FROM '{path}'").fetchall()
        first_key = sorted(KEEP[name])[0]
        con.execute(
            f"COPY (SELECT * FROM '{path}' LIMIT 0) TO "
            f"'{tiers['empty']}/{name}.parquet' (FORMAT PARQUET)"
        )
        con.execute(
            f"COPY (SELECT * FROM '{path}' ORDER BY {first_key} LIMIT 1) TO "
            f"'{tiers['one_row']}/{name}.parquet' (FORMAT PARQUET)"
        )
        proj = ", ".join(
            col if col in KEEP[name] else f"CAST(NULL AS {typ}) AS {col}"
            for col, typ, *_ in cols
        )
        con.execute(
            f"COPY (SELECT {proj} FROM '{path}') TO "
            f"'{tiers['null_opt']}/{name}.parquet' (FORMAT PARQUET)"
        )
    con.close()
    return tiers


if __name__ == "__main__":
    import sys

    out = synthesize(sys.argv[1] if len(sys.argv) > 1 else "/tmp/degen_tiers")
    for k, v in out.items():
        print(k, v)

"""Synthesize a magnitude-STRESSED copy of a testdata tier.

Identical rows to the source tier except the two money columns are
scaled by 1000 at synthesis time (``orders.o_totalprice`` and
``events.value``; the product is computed once by DuckDB and written
into the parquet, so both engines read byte-identical doubles and no
multiplication seam exists between them).

Why: the engine runs non-ANSI, where BIGINT overflow WRAPS silently.
At the test tiers every integer aggregate sits orders of magnitude
below the 9.2e18 ceiling, so a sum-of-squared-cents that would wrap at
100 TB row counts looks perfectly healthy in every other layer.  On
this tier, per-row cents reach ~5e10 and squared-cents sums reach
1e19-1e21 — PAST the BIGINT ceiling — while DuckDB's HUGEINT
accumulator stays exact.  Any remaining unguarded n^2-scale integer
product therefore wraps in Spark, diverges from the oracle, and fails
the sweep; the DECIMAL-promoted spellings (SCALE.md round-6 audit)
agree exactly.

Used by tests/test_stress_oracle.py, which re-runs the full DuckDB
oracle comparison on the stressed tier.
"""

from __future__ import annotations

import os

import duckdb

SRC = "/root/testdata/sf0.001"

SCALE = 1000  # money multiplier: pushes squared-cents sums past BIGINT

# column rewrites per table; every other table copies through unchanged
REWRITE = {
    "orders": "o_orderkey, o_custkey, o_orderstatus, "
    "o_totalprice * 1000 AS o_totalprice, o_orderdate, o_orderpriority",
    "events": "event_id, ts, user_id, event_type, value * 1000 AS value, props",
}

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def synthesize(dst_root: str, src: str = SRC) -> str:
    """Write the stressed tier under ``dst_root``; returns the tier dir."""
    con = duckdb.connect()
    os.makedirs(dst_root, exist_ok=True)
    for name in TABLES:
        cols = REWRITE.get(name, "*")
        con.execute(
            f"COPY (SELECT {cols} FROM '{src}/{name}.parquet') "
            f"TO '{dst_root}/{name}.parquet' (FORMAT PARQUET)"
        )
    con.close()
    return dst_root


if __name__ == "__main__":
    import sys

    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/stress_tier"
    print(synthesize(out))

"""Synthesize a numerically ILL-CONDITIONED copy of a testdata tier.

Identical rows, orders, categories, and spreads to the source tier,
but the continuous measures gain a HUGE ADDITIVE OFFSET:

  events.value       -> value + 1e9
  customer.c_acctbal -> c_acctbal + 1e9
  orders.o_totalprice -> o_totalprice + 1e8

Why this is a distinct pocket from the magnitude-STRESS tier (which
multiplies by 1000): a multiplicative scale leaves the RELATIVE
conditioning of every second-moment statistic unchanged — variance,
correlation, covariance, and regression sums scale cleanly. An
additive offset is the cancellation killer: the data's spread stays
~1e2 while its mean moves to 1e9, so the textbook one-pass spellings
(sum(x²) − sum(x)²/n, sum(xy) − sum(x)·sum(y)/n) subtract ~1e21-scale
terms to recover a ~1e6-scale answer — 15 of 16 significant digits
cancel, and what remains is summation-order noise. Spark's partial
aggregation (32 partitions, tree merge) and DuckDB's accumulation
order differ, so an unstably-spelled statistic diverges between the
engines HERE and nowhere else; a stably-spelled one (Welford-merge
built-ins like var_samp/corr/regr_*, or sums of exact integer cents,
or explicitly centered two-pass algebra) stays in lockstep.

This is a 100 TB concern, not a synthetic curiosity: accumulated
floating sums at cluster scale routinely carry 1e18+ magnitudes
(epoch-nanosecond timestamps, lifetime revenue counters, global
byte counts), and a statistic that silently loses 15 digits on them
is wrong in production while green on every small uniform tier.

Rank/order machinery is immune by construction (the offset is
monotone), money paths that follow the integer-cents doctrine are
exact (1e11 cents squared-sums stay inside DECIMAL(38,0)), and both
engines read byte-identical parquet doubles — so any divergence this
tier surfaces is a real algorithm-stability finding, never noise.

Used by tests/test_conditioning_oracle.py (full oracle parity sweep).
"""

from __future__ import annotations

import os
import shutil

import duckdb

SRC = "/root/testdata/sf0.001"

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

OFFSET_VALUE = 1.0e9
OFFSET_BAL = 1.0e9
OFFSET_PRICE = 1.0e8

REWRITE = {
    "events": (
        f"* REPLACE (CAST(value + {OFFSET_VALUE} AS DOUBLE) AS value)"
    ),
    "customer": (
        f"* REPLACE (CAST(c_acctbal + {OFFSET_BAL} AS DOUBLE) AS c_acctbal)"
    ),
    "orders": (
        f"* REPLACE (CAST(o_totalprice + {OFFSET_PRICE} AS DOUBLE) AS o_totalprice)"
    ),
}


def synthesize(dst_root: str, src: str = SRC) -> str:
    """Write the ill-conditioned tier under ``dst_root``; returns the dir."""
    os.makedirs(dst_root, exist_ok=True)
    con = duckdb.connect()
    for name in TABLES:
        s = os.path.join(src, f"{name}.parquet")
        d = os.path.join(dst_root, f"{name}.parquet")
        if name in REWRITE:
            con.execute(
                f"COPY (SELECT {REWRITE[name]} FROM read_parquet('{s}')) "
                f"TO '{d}' (FORMAT PARQUET)"
            )
        elif os.path.isfile(s):
            shutil.copy2(s, d)
        else:
            shutil.copytree(s, d)
    con.close()
    return dst_root


if __name__ == "__main__":
    import sys

    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/conditioning_tier"
    print(synthesize(out))

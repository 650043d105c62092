"""Synthesize a boundary/tie-poked copy of a testdata tier.

Identical row counts and key distributions to the source tier, but
values and timestamps are snapped onto the exact boundaries every
cut-based operator depends on — the places where "which side of the
edge?" and "who wins the tie?" are semantic decisions, not arithmetic:

* events.ts   -> 12.5 % snapped to a 6-HOUR grid (heavy exact-equal
  collisions, including within one user), 12.5 % to the 15-minute
  grid (exact tumbling-window starts), ~6 % to midnight: duplicate
  event times (ORDER BY ts alone no longer defines an order), session
  gaps landing EXACTLY on the timeout, day-boundary events for cohort
  / retention day cutoffs, as-of join ties at exactly-equal
  timestamps.
* events.value -> three cliff classes: round(v)+0.5 (the half-integer
  rounding cliff and the percentile-interpolation midpoint),
  floor(v/25)*25 (a coarse grid -> massive ties at every quantile
  cut, equi-depth bucket edge, and top-k threshold), round(v,1)+0.05
  (the two-decimal cents cliff under IEEE doubles).
* orders.o_totalprice -> thousand/five-hundred grids (+0.5 on one
  class) so revenue rankings tie exactly AT top-k cuts; o_orderdate
  -> first-of-month for date_trunc / BETWEEN edge hits.
* lineitem -> l_discount pinned to exactly 0.05 / 0.07 (the TPC-H q6
  BETWEEN edges), l_quantity to exactly 24 (the q6 `< 24` edge),
  l_shipdate to month starts (>= '1995-03-01'-style edges),
  l_extendedprice to half-integers.
* documents -> every doc_id % 13 == 1 gets the TEXT of doc_id-1
  (n_chars recomputed): exact-duplicate pairs that cross source/lang,
  so dedup keep-best reps TIE on every text-derived metric and
  leakage/containment hit the jaccard == 1.0 boundary exactly.
* embeddings -> every vec_id % 4 == 1 gets the VECTOR of vec_id-1:
  cosine exactly 1.0 pairs scattered through an otherwise-varied
  corpus — similarity top-k ties at the cut, near-dup thresholds hit
  with equality, identical LSH band hashes.

Why: the organic tiers are continuous-uniform, so no two rows ever
tie and no value ever lands ON a boundary — every `>` vs `>=`, every
[start, end) window edge, every rank tiebreak, and every half-up vs
half-even rounding choice is invisible. The shuffled tier only
catches nondeterminism that organic ties realize (there are none);
this tier FORCES the tie at every cut. A query that top-k's through a
tie without a deterministic tiebreak, or an oracle whose window edge
is inclusive where the engine's is exclusive, mismatches here and
nowhere else.

Deterministic modular rules, so both engines read byte-identical
parquet. Used by tests/test_boundary_oracle.py (full oracle parity
sweep).
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

# Tables rewritable with a scalar projection.
REWRITE = {
    "events": """
        * REPLACE (
          CASE WHEN event_id % 8 = 0
                 THEN time_bucket(INTERVAL 6 HOUR, ts)
               WHEN event_id % 8 = 4
                 THEN time_bucket(INTERVAL 15 MINUTE, ts)
               WHEN event_id % 16 = 1
                 THEN date_trunc('day', ts)
               ELSE ts END AS ts,
          CAST(CASE WHEN event_id % 7 = 0 THEN round(value, 0) + 0.5
                    WHEN event_id % 7 = 1 THEN floor(value / 25) * 25
                    WHEN event_id % 17 = 2 THEN round(value, 1) + 0.05
                    ELSE value END AS DOUBLE) AS value
        )
    """,
    "orders": """
        * REPLACE (
          CAST(CASE WHEN o_orderkey % 3 = 0
                      THEN floor(o_totalprice / 1000) * 1000 + 0.5
                    WHEN o_orderkey % 3 = 1
                      THEN floor(o_totalprice / 500) * 500
                    ELSE o_totalprice END AS DOUBLE) AS o_totalprice,
          CASE WHEN o_orderkey % 5 = 0
                 THEN date_trunc('month', o_orderdate)
               ELSE o_orderdate END AS o_orderdate
        )
    """,
    "lineitem": """
        * REPLACE (
          CAST(CASE WHEN l_orderkey % 4 = 0 THEN 0.05
                    WHEN l_orderkey % 4 = 1 THEN 0.07
                    ELSE l_discount END AS DOUBLE) AS l_discount,
          CAST(CASE WHEN l_orderkey % 3 = 0 THEN 24.0
                    ELSE l_quantity END AS DOUBLE) AS l_quantity,
          CASE WHEN l_orderkey % 6 = 0
                 THEN date_trunc('month', l_shipdate)
               ELSE l_shipdate END AS l_shipdate,
          CAST(CASE WHEN l_orderkey % 8 = 2
                      THEN round(l_extendedprice, 0) + 0.5
                    ELSE l_extendedprice END AS DOUBLE) AS l_extendedprice
        )
    """,
}

# Tables that need a self-join to duplicate a neighbour's payload.
JOINED = {
    "documents": """
        SELECT a.doc_id,
               CASE WHEN a.doc_id % 13 = 1 AND b.text IS NOT NULL
                    THEN b.text ELSE a.text END AS text,
               a.lang, a.source,
               length(CASE WHEN a.doc_id % 13 = 1 AND b.text IS NOT NULL
                           THEN b.text ELSE a.text END) AS n_chars
        FROM read_parquet('{s}') a
        LEFT JOIN read_parquet('{s}') b ON b.doc_id = a.doc_id - 1
    """,
    "embeddings": """
        SELECT a.vec_id,
               CASE WHEN a.vec_id % 4 = 1 AND b.embedding IS NOT NULL
                    THEN b.embedding ELSE a.embedding END AS embedding,
               a.label
        FROM read_parquet('{s}') a
        LEFT JOIN read_parquet('{s}') b ON b.vec_id = a.vec_id - 1
    """,
}


def synthesize(dst_root: str, src: str = SRC) -> str:
    """Write the boundary-poked tier under ``dst_root``; returns the dir."""
    os.makedirs(dst_root, exist_ok=True)
    con = duckdb.connect()
    for name in TABLES:
        s = os.path.join(src, f"{name}.parquet")
        d = os.path.join(dst_root, f"{name}.parquet")
        if name in REWRITE:
            con.execute(
                f"COPY (SELECT {REWRITE[name]} FROM read_parquet('{s}') "
                f"ORDER BY 1) TO '{d}' (FORMAT PARQUET)"
            )
        elif name in JOINED:
            con.execute(
                f"COPY ({JOINED[name].format(s=s)} ORDER BY 1) "
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

    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/boundary_tier"
    print(synthesize(out))

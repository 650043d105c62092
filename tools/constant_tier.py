"""Synthesize a constant/zero-variance copy of a testdata tier.

Identical rows, keys, and timestamps to the source tier, but every
MEASURE column is a single constant, the high-cardinality categorical
drivers collapse to one level, every document is the SAME text, and
every embedding is the SAME vector (with a deterministic zero-vector
class poked in).

Why: the organic tiers always have healthy variance, so the ~150
statistics queries only ever exercise the sd > 0 / multi-category /
distinct-text happy path. Real pipelines hit zero variance routinely —
a feed stuck on one price, a single-tenant slice, a template page
crawled a million times, an embedding model emitting a collapsed
representation. The divergence classes this tier hunts:

* sd = 0 denominators: z-scores, correlations, effect sizes, CUPED,
  variance ratios, silhouette (a = b = 0), calibration slopes —
  0/0 is NaN-vs-NULL-vs-Infinity territory where Spark (non-ANSI),
  DuckDB (ieee_floating_point_ops), and numpy all have OPINIONS.
* single-category margins: chi-square/G-test with one column level,
  Markov chains with one state, funnels with no conversion step,
  crosstabs of width 1 — the data-dependent-df gates must fold.
* total ties: every rank/percentile/midrank over identical values,
  top-k with all scores equal (tie-break determinism).
* total duplication: all documents in ONE dedup group — the pair
  expansion caps and keep-best tie-breaks carry the whole tier.
* zero-norm vectors (vec_id % 53 = 0): cosine 0/0 — the vector
  hygiene predicate must treat "no direction" like "no value".
* degenerate fits: Zipf/Heaps log-log with a constant x, IRLS with
  constant features and one label, PCA of an all-zeros covariance.

Used by tests/test_constant_tier.py, which re-runs the full DuckDB
oracle comparison on the poked tier.
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

#: every document becomes this exact text (9 distinct tokens, so
#: vocabulary statistics are tiny-but-nonzero rather than empty)
CONST_TEXT = "the quick brown fox jumps over the lazy dog near the quiet river bank"

#: the one embedding every row carries (64-dim, deterministic,
#: non-trivial direction so cosine against itself is exactly 1.0)
CONST_VEC_SQL = "[CAST((i % 7) - 3 AS FLOAT) / 10.0 FOR i IN range(64)]"

#: vec_id % ZERO_VEC_MOD = 0 rows carry the all-zeros vector instead
ZERO_VEC_MOD = 53

REWRITE = {
    "documents": (
        "* REPLACE ("
        f"'{CONST_TEXT}' AS text, "
        f"CAST(length('{CONST_TEXT}') AS BIGINT) AS n_chars, "
        "'en' AS lang, 'src0' AS source)"
    ),
    "embeddings": (
        "* REPLACE ("
        f"CASE WHEN vec_id % {ZERO_VEC_MOD} = 0 "
        "THEN [CAST(0.0 AS FLOAT) FOR i IN range(64)] "
        f"ELSE {CONST_VEC_SQL} END AS embedding, "
        "1 AS label)"
    ),
    # CAST every numeric literal: a bare 1234.56 is DECIMAL in DuckDB
    # and would silently change the parquet column type away from the
    # organic DOUBLE (Spark then reads DecimalType and every consumer's
    # schema shifts — the tier must poke VALUES, never types)
    "events": "* REPLACE (CAST(42.0 AS DOUBLE) AS value, 'view' AS event_type)",
    "orders": (
        "* REPLACE (CAST(1234.56 AS DOUBLE) AS o_totalprice, "
        "'3-MEDIUM' AS o_orderpriority)"
    ),
    "lineitem": (
        "* REPLACE (CAST(25.0 AS DOUBLE) AS l_quantity, "
        "CAST(2000.0 AS DOUBLE) AS l_extendedprice, "
        "CAST(0.05 AS DOUBLE) AS l_discount, CAST(0.04 AS DOUBLE) AS l_tax)"
    ),
    "customer": "* REPLACE (CAST(500.0 AS DOUBLE) AS c_acctbal)",
    "supplier": "* REPLACE (CAST(500.0 AS DOUBLE) AS s_acctbal)",
    "part": "* REPLACE (CAST(1000.0 AS DOUBLE) AS p_retailprice)",
}


def synthesize(dst_root: str, src: str = SRC) -> str:
    """Write the poked tier under ``dst_root``; returns the tier dir."""
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

    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/constant_tier"
    print(synthesize(out))

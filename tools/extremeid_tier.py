"""Synthesize an EXTREME-ID copy of a testdata tier.

Identical rows, measures, categories, and timestamps to the source
tier, but every entity-id space is remapped through one injective
function that leaves referential integrity intact while covering the
full BIGINT range:

  f(id) = -(id + 1)          when id % 5 = 0   (negative ids)
        = 2^62 + id          when id % 5 = 1   (huge ids)
        = id                 otherwise          (organic ids)

applied consistently to join-key pairs so every FK still matches:
events.event_id/user_id, embeddings.vec_id, documents.doc_id,
orders.o_orderkey == lineitem.l_orderkey, and
orders.o_custkey == customer.c_custkey.

Why: every organic tier draws ids from a small dense non-negative
range, so three ID assumptions are never exercised:

* SIGN — Spark's F.pmod(id, k) is always non-negative while SQL `%`
  takes the dividend's sign in BOTH engines; an engine spelled pmod
  against an oracle spelled `%` silently diverges on the first
  negative id (hash-derived int64 ids — common at cluster scale — are
  negative half the time);
* SENTINEL ENCODING — the streaming replay harness marks its flush
  sentinels with user_id < 0 and callers filter `user_id >= 0`; a
  corpus with real negative user ids would have those users silently
  dropped from results (engine) but kept by the oracle;
* MAGNITUDE — id arithmetic (planted offsets, id+1 neighbors, id*k
  bucketing) near ±2^63 wraps silently under non-ANSI Spark while
  DuckDB errors; the 2^62 branch keeps existing +1e5/+1e8 offsets
  representable so the tier isolates convention divergence from
  universal overflow (overflow of id arithmetic itself is covered by
  the admission doctrine: ids entering arithmetic must be range-
  checked or the arithmetic spelled in DECIMAL).

Deterministic and injective (the three branch ranges are disjoint for
the tiers' id domains), so both engines read byte-identical parquet.
Used by tests/test_extremeid_oracle.py.
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

HUGE = 4611686018427387904  # 2^62


def _f(col: str) -> str:
    return (
        f"CASE WHEN {col} % 5 = 0 THEN -({col} + 1) "
        f"WHEN {col} % 5 = 1 THEN {HUGE} + {col} "
        f"ELSE {col} END"
    )


REWRITE = {
    "events": (
        f"* REPLACE ({_f('event_id')} AS event_id, {_f('user_id')} AS user_id)"
    ),
    "embeddings": f"* REPLACE ({_f('vec_id')} AS vec_id)",
    "documents": f"* REPLACE ({_f('doc_id')} AS doc_id)",
    "orders": (
        f"* REPLACE ({_f('o_orderkey')} AS o_orderkey, "
        f"{_f('o_custkey')} AS o_custkey)"
    ),
    "lineitem": f"* REPLACE ({_f('l_orderkey')} AS l_orderkey)",
    "customer": f"* REPLACE ({_f('c_custkey')} AS c_custkey)",
}


def synthesize(dst_root: str, src: str = SRC) -> str:
    """Write the extreme-id tier under ``dst_root``; returns the dir."""
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

    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/extremeid_tier"
    print(synthesize(out))

"""Synthesize a hot-key-skewed copy of a testdata tier.

Identical rows and measures to the source tier, but the JOIN/GROUP
keys are redistributed Zipf-style: 80 % of events collapse onto ONE
user, half the orders onto ONE customer, 30 % of lineitems onto ONE
part, and 60 % of documents onto ONE source. Values, timestamps, and
text are untouched — the tier isolates KEY DISTRIBUTION as the only
variable.

Why: the organic tiers are uniform, so every groupBy/join/window runs
with balanced partitions and every per-entity aggregate (session
lists, funnel sequences, per-user distinct counts, per-source caps)
stays small. Production corpora are Zipfian — one bot account, one
template domain, one SKU — and 100 TB turns a hot key into either a
straggler task (shuffle skew) or an unbounded per-entity state blowup
(collect_list/string_agg per user). The divergence classes hunted:

* parity: per-entity sequence machinery (funnels, Markov chains,
  sessionization, streaks) on an entity with 80 % of all rows — both
  engines must still agree element-for-element on the giant group;
* well-definedness: distinct-count / rank machinery where one group
  dwarfs the rest (stickiness ratios, retention denominators,
  domain-cap sampling where one domain exceeds the cap many times
  over);
* scale posture (tools/skew_growth.py): operators whose wall-clock
  grows superlinearly under skew at fixed row count are the ones a
  hot key will straggle at 100 TB.

Deterministic rekey rules (modular classes, so both engines read
byte-identical parquet):
  events.user_id   -> HOT_USER  where event_id  % 5 != 0   (~80 %)
  orders.o_custkey -> HOT_CUST  where o_orderkey % 2 = 0   (~50 %)
  lineitem.l_partkey -> HOT_PART where l_orderkey % 10 < 3 (~30 %)
  documents.source -> 'src0'    where doc_id % 5 != 2      (~80 %)

Used by tests/test_skew_oracle.py (full oracle parity sweep).
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

HOT_USER = 7       # an organically-existing user id
HOT_CUST = 1       # c_custkey 1 exists at every SF
HOT_PART = 1       # p_partkey 1 exists at every SF

REWRITE = {
    "events": (
        "* REPLACE (CASE WHEN event_id % 5 != 0 "
        f"THEN CAST({HOT_USER} AS BIGINT) ELSE user_id END AS user_id)"
    ),
    "orders": (
        "* REPLACE (CASE WHEN o_orderkey % 2 = 0 "
        f"THEN CAST({HOT_CUST} AS BIGINT) ELSE o_custkey END AS o_custkey)"
    ),
    "lineitem": (
        "* REPLACE (CASE WHEN l_orderkey % 10 < 3 "
        f"THEN CAST({HOT_PART} AS BIGINT) ELSE l_partkey END AS l_partkey)"
    ),
    "documents": (
        "* REPLACE (CASE WHEN doc_id % 5 != 2 "
        "THEN 'src0' ELSE source END AS source)"
    ),
}


def synthesize(dst_root: str, src: str = SRC) -> str:
    """Write the skewed tier under ``dst_root``; returns the tier dir."""
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

    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/skew_tier"
    print(synthesize(out))

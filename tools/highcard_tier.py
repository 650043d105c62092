"""Synthesize a HIGH-CARDINALITY-CATEGORIES copy of a testdata tier.

Identical rows, timestamps, and measures to the source tier, but the
low-cardinality categorical columns explode:

  events.event_type -> ~1/3 of rows get a per-row suffixed type
                       ('view#137', 'click#41', ...): the observed
                       type alphabet grows from 5 to ~400+ while the
                       5 organic types still dominate;
  documents.lang    -> ~1/4 of docs get a suffixed lang ('en#7', ...);
  documents.source  -> ~1/4 of docs get a suffixed source.

Why: every organic tier carries tiny categorical alphabets (5 event
types, 4 langs, 5 sources), so any spelling that is only correct —
or only BOUNDED — when the alphabet is a small closed enum looks
healthy everywhere else. Production corpora break that assumption
routinely (an event name with an embedded ID, a user-agent string in
a type field, auto-generated source tags): cardinality explosion is
one of the classic silent analytics incidents. The divergence and
hazard classes hunted:

* parity: group-by/pivot/argmax machinery whose ORACLE hard-codes the
  organic alphabet (a CASE or IN-list that silently buckets novel
  types) while the engine computes over whatever it observes;
* well-definedness: funnels/attribution/language-ID must treat novel
  categories by CONTRACT (ignored by IN-list, classified 'und', ...)
  identically in both engines;
* scale posture: driver-side pulls documented as "enum-bounded"
  (Markov transition kernels are k² cells for k observed types) must
  stay bounded by an explicit ADMISSION rule, not by trusting the
  producer's alphabet — the companion growth check times those
  operators as the alphabet grows.

Deterministic modular rules, so both engines read byte-identical
parquet. Used by tests/test_highcard_oracle.py.
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

REWRITE = {
    "events": (
        "* REPLACE (CASE WHEN event_id % 3 = 0 "
        "THEN event_type || '#' || CAST(event_id % 137 AS VARCHAR) "
        "ELSE event_type END AS event_type)"
    ),
    "documents": (
        "* REPLACE ("
        "CASE WHEN doc_id % 4 = 1 "
        "THEN lang || '#' || CAST(doc_id % 53 AS VARCHAR) "
        "ELSE lang END AS lang, "
        "CASE WHEN doc_id % 4 = 2 "
        "THEN source || '#' || CAST(doc_id % 53 AS VARCHAR) "
        "ELSE source END AS source)"
    ),
}


def synthesize(dst_root: str, src: str = SRC) -> str:
    """Write the high-cardinality tier under ``dst_root``; returns the dir."""
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

    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/highcard_tier"
    print(synthesize(out))

"""Synthesize a monster-document-poked copy of a testdata tier.

Identical rows to the source tier except two documents become tail
monsters: one text repeated ~400x (a ~20k-token document — the
long-tail web page every real corpus carries) and one single
60,000-character token (minified JS / base64 blob — no whitespace at
all).

Why: the organic documents average ~50 tokens, so every per-document
array expression (token stats, shingles, n-grams, BPE pretokenizer,
entropy, fingerprints) only ever sees tiny rows. Tail documents are
where per-row quadratic spellings, array-size limits, and
regex-engine backtracking hide: a 100 TB web corpus has million-token
documents in every shard. Both engines read identical bytes, so the
sweep checks BOTH that results stay byte-parity AND that nothing
blows up at the row grain (the sweep's wall-clock IS the robustness
signal; a quadratic per-doc spelling turns a 400x longer doc into a
160,000x slower row).

Used by tests/test_monsterdoc.py, which re-runs the full DuckDB oracle
comparison on the poked tier.
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

# ~7.5k tokens for the repeated-text monster: large enough that any
# O(len^2) ENGINE spelling shows a ~150x-per-doc blowup (the shingle
# family's in-lambda re-split was caught at 27 s/doc), small enough
# that the ORACLES' own O(len^2) list-slice spellings (UNNEST(range) x
# w[i:i+k] — test infrastructure, not the engine) keep the slow sweep
# in minutes, not the 40+ it took at 400 repeats
REPEATS = 150
BLOB_LEN = 60_000   # single-token monster length


def synthesize(dst_root: str, src: str = SRC) -> str:
    """Write the poked tier under ``dst_root``; returns the tier dir."""
    os.makedirs(dst_root, exist_ok=True)
    con = duckdb.connect()
    for name in TABLES:
        s = os.path.join(src, f"{name}.parquet")
        d = os.path.join(dst_root, f"{name}.parquet")
        if name == "documents":
            con.execute(
                f"""
                COPY (SELECT * REPLACE (
                  CASE
                    WHEN doc_id % 499 = 3
                      THEN trim(repeat(text || ' ', {REPEATS}), ' ')
                    WHEN doc_id % 499 = 7
                      THEN repeat('z', {BLOB_LEN})
                    ELSE text
                  END AS text)
                 FROM read_parquet('{s}'))
                TO '{d}' (FORMAT PARQUET)
                """
            )
        elif os.path.isfile(s):
            shutil.copy2(s, d)
        else:
            shutil.copytree(s, d)
    con.close()
    return dst_root


if __name__ == "__main__":
    import sys

    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/monsterdoc_tier"
    print(synthesize(out))

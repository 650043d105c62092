"""Synthesize a malformed/heterogeneous-JSON-poked copy of a testdata tier.

Identical rows to the source tier except deterministic classes of
``events.props`` are replaced with adversarial JSON: syntactically
broken payloads (truncated object, bare words, empty string), valid
JSON of the WRONG shape (array, scalar, JSON null), wrong value types
at the extracted path (string number '12.7', boolean, JSON null,
nested object, 20-digit overflow integer), duplicate keys, unicode
escapes / surrogate pairs, deep nesting, and a BOM-prefixed object.

Why: the organic props column is uniformly tidy '{"k": <int>, ...}'
payloads, so the JSON surface (get_json_object / parse_json VARIANT /
json_extract oracles) is only exercised on the happy path. Real event
streams carry truncated writes, schema drift, and producer bugs. Both
engines read byte-identical parquet, so any divergence is a genuine
JSON-semantics difference: error-vs-NULL on malformed input, duplicate
-key resolution, string->int cast coercion ('12.7': non-ANSI Spark
casts to NULL, DuckDB CAST errors or rounds), and VARIANT vs JSON-text
typing.

Used by tests/test_json_props.py, which re-runs the full DuckDB oracle
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

# event_id % 229 -> replacement props payload
PROPS_POKES: dict[int, str | None] = {
    3: "not json",                        # bare words
    7: "",                                # empty string
    11: '{"k": 1',                        # truncated object
    13: "[1, 2, 3]",                      # valid JSON, wrong shape (array)
    17: "null",                           # JSON null literal
    19: '{"k": "12.7"}',                  # string number at the int path
    23: '{"k": true}',                    # boolean at the int path
    29: '{"k": null}',                    # JSON null at the path
    31: '{"k": {"nested": 5}}',           # object at the scalar path
    37: '{"k": 99999999999999999999}',    # 20-digit overflow integer
    # NO duplicate-key class ('{"k":1,"k":2}'): the parsers genuinely
    # disagree at a level no SQL convention can mirror — Spark's variant
    # builder REJECTS duplicate-key objects (try_parse_json -> NULL row)
    # while DuckDB's parser dedups last-wins (json_extract -> 2) and
    # Jackson's get_json_object streams first-wins (-> 1). Three engines,
    # three answers; the no-crash guarantee is covered by the malformed
    # classes, and duplicate-key producers are a DLQ concern upstream.
    43: '{"k": "\\ud83d\\ude00"}',        # escaped surrogate pair (emoji)
    47: '{"a": {"b": {"c": {"d": {"e": {"k": 7}}}}}}',  # deep nesting, no $.k
    53: '﻿{"k": 9}',                 # BOM-prefixed object
    59: None,                             # NULL props
    61: "42",                             # valid JSON scalar
    67: '{"k": 1e3}',                     # scientific-notation JSON number
    71: '{"k": 12.0}',                    # decimal-point JSON number
    # round-7 pokes: the zones where the engines' NATIVE casts diverge
    # (caught by r6 ADVICE) — the shared grammar convention
    # (functions/numcast.py) must keep all of these in lockstep
    73: '{"k": "1e3"}',                   # QUOTED scientific string (Spark native cast NULLs, DuckDB 1000)
    79: '{"k": "12.99999999999999999"}',  # near-integer decimal string (lexical 12 vs double 13)
    83: '{"k": 12345678.0}',              # Jackson renders "1.2345678E7", VARIANT "12345678", DuckDB "12345678.0"
    89: '{"k": 0.0009}',                  # Jackson renders "9.0E-4", VARIANT/DuckDB "0.0009"
    97: '{"k": "1d"}',                    # Java double-suffix (Spark native parses 1.0, DuckDB NULL)
    101: '{"k": "1_000"}',                # underscore separator (DuckDB native parses 1000, Spark NULL)
    103: '{"k": 1e400}',                  # double overflow -> Infinity rendering in both engines
    107: '{"k": "  +12.9  "}',            # padded signed decimal string
    109: '{"k": "\\u000b12"}',            # control-char padding (trim class [\\x01-\\x20])
}


def synthesize(dst_root: str, src: str = SRC) -> str:
    """Write the poked tier under ``dst_root``; returns the tier dir."""
    os.makedirs(dst_root, exist_ok=True)
    con = duckdb.connect()
    for name in TABLES:
        s = os.path.join(src, f"{name}.parquet")
        d = os.path.join(dst_root, f"{name}.parquet")
        if name == "events":
            whens = " ".join(
                f"WHEN event_id % 229 = {k} THEN "
                + ("NULL" if v is None else "?")
                for k, v in PROPS_POKES.items()
            )
            params = [v for v in PROPS_POKES.values() if v is not None]
            con.execute(
                f"COPY (SELECT * REPLACE (CASE {whens} ELSE props END AS props) "
                f"FROM read_parquet('{s}')) TO '{d}' (FORMAT PARQUET)",
                params,
            )
        elif os.path.isfile(s):
            shutil.copy2(s, d)
        else:
            shutil.copytree(s, d)
    con.close()
    return dst_root


if __name__ == "__main__":
    import sys

    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/json_tier"
    print(synthesize(out))

"""Synthesize a time-edge-poked copy of a testdata tier.

Identical rows to the source tier except deterministic classes of
``events.ts``, ``orders.o_orderdate`` and ``lineitem.l_shipdate`` are
replaced with calendar edge values: the exact epoch, pre-epoch
(negative microseconds), a leap day, the 2038 32-bit rollover second,
a non-leap century year (2100-03-01), pre-1900 dates, and far-future
timestamps near (but safely inside) the pandas datetime64[ns] ceiling
that the comparison harness converts through.

Why: the organic tiers span one tidy month of events (2024-01) and six
tidy TPC-H years of orders (1995-2001), so every date_trunc / datediff /
day-of-week / daily-spine construction is only exercised on friendly
positive-epoch dates.  A 100 TB ingest WILL carry rows with a zeroed
timestamp (the epoch is the classic default-initialized value), clock
skew before the epoch, and far-future garbage.  Both engines read
byte-identical parquet, so any oracle divergence on this tier is a
genuine calendar-semantics difference (hybrid-vs-proleptic calendars,
negative-epoch modular day-of-week arithmetic, week truncation before
1970) or a daily-spine recursion that assumed a bounded span.

Poked values stay inside [1677-09-21, 2262-04-11] (the pandas ns
envelope) so the HARNESS comparison path (toPandas / .df()) is never
the thing that breaks; the engines see the full edge semantics.

Used by tests/test_timeedge.py, which re-runs the full DuckDB oracle
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

# event_id % 211 -> replacement timestamp literal
EVENT_TS_POKES: dict[int, str] = {
    3: "1970-01-01 00:00:00",           # exact epoch (default-initialized ts)
    7: "1969-12-31 23:59:59.999999",    # negative microseconds
    11: "2000-02-29 12:34:56.789012",   # leap day (century leap year)
    13: "2038-01-19 03:14:08",          # past the 32-bit rollover
    17: "2262-01-01 00:00:00",          # near the pandas ns ceiling
    23: "2024-01-15 00:00:00",          # exact midnight (day-boundary tie)
    29: "1900-01-06 06:06:06.000001",   # pre-epoch, pre-1970 century
}

# o_orderkey % 223 -> replacement date literal
ORDER_DATE_POKES: dict[int, str] = {
    # NOT 1582 (Julian-gap dates overflow the HARNESS's pandas ns
    # conversion at -12.2e15 us); 1700-03-01 still crosses a century
    # where proleptic-Gregorian (both engines) and Julian calendars
    # disagree on the leap day
    3: "1700-03-01",
    7: "1899-12-31",
    11: "1970-01-01",
    13: "2100-03-01",  # day after the NON-leap century February
    17: "2262-01-01",
}

# l_orderkey % 227 -> replacement ship timestamp literal
SHIP_TS_POKES: dict[int, str] = {
    3: "1970-01-01 00:00:00",
    7: "1969-07-20 20:17:40",
    11: "2200-06-15 12:00:00",
}


def _case(col: str, mod: int, pokes: dict[int, str], cast: str, keycol: str) -> str:
    whens = " ".join(
        f"WHEN {keycol} % {mod} = {k} THEN {cast} '{v}'" for k, v in pokes.items()
    )
    return f"CASE {whens} ELSE {col} END AS {col}"


REWRITE = {
    "events": "* REPLACE ("
    + _case("ts", 211, EVENT_TS_POKES, "TIMESTAMP", "event_id")
    + ")",
    "orders": "* REPLACE ("
    + _case("o_orderdate", 223, ORDER_DATE_POKES, "DATE", "o_orderkey")
    + ")",
    "lineitem": "* REPLACE ("
    + _case("l_shipdate", 227, SHIP_TS_POKES, "TIMESTAMP", "l_orderkey")
    + ")",
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

    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/timeedge_tier"
    print(synthesize(out))

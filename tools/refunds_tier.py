"""Synthesize a negative/zero/sub-cent-money-poked copy of a testdata tier.

Identical rows to the source tier except deterministic classes of
``orders.o_totalprice`` and ``events.value`` are replaced with refund
(negated), zero, and sub-cent magnitudes.

Why: the organic money columns are strictly positive and cent-aligned,
so every sign-sensitive spelling is only exercised on the happy half of
the number line. Refunds/chargebacks make negative money ROUTINE in
production revenue streams. The divergence classes this tier hunts:
floor-vs-truncate integer division (DuckDB ``//`` and F.floor agree at
floor; any CAST(x/y AS INT) truncates toward zero — identical on
positives, off-by-one on negatives), ln/sqrt of aggregates that can now
go negative (Spark returns NULL where DuckDB ERRORS), rounding of
negative halves, and rank/percentile machinery over signed values.

Used by tests/test_refunds.py, which re-runs the full DuckDB oracle
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

# o_orderkey % 241 -> o_totalprice transform (SQL expression over the
# original value, written into the parquet once so both engines read
# byte-identical doubles)
ORDER_PRICE_POKES: dict[int, str] = {
    3: "-o_totalprice",          # full refund
    7: "0.0",                    # zero-value order
    11: "0.004",                 # sub-cent: rounds to 0 cents
    13: "-0.004",                # negative sub-cent
    17: "-(o_totalprice / 2)",   # partial refund
}

# event_id % 239 -> value transform
EVENT_VALUE_POKES: dict[int, str] = {
    3: "-value",
    7: "0.0",
    11: "-0.004",
}

# l_orderkey % 233 -> lineitem money transforms (returned lines with
# negated price, 100% discounts zeroing revenue, zero-priced lines)
LINEITEM_POKES: dict[int, tuple[str, str, str]] = {
    3: ("-l_extendedprice", "l_discount", "l_tax"),
    7: ("l_extendedprice", "1.0", "0.0"),
    11: ("0.0", "l_discount", "l_tax"),
}


def _case(col: str, mod: int, pokes: dict[int, str], keycol: str) -> str:
    whens = " ".join(f"WHEN {keycol} % {mod} = {k} THEN {v}" for k, v in pokes.items())
    return f"CASE {whens} ELSE {col} END AS {col}"


REWRITE = {
    "orders": "* REPLACE ("
    + _case("o_totalprice", 241, ORDER_PRICE_POKES, "o_orderkey")
    + ")",
    "events": "* REPLACE ("
    + _case("value", 239, EVENT_VALUE_POKES, "event_id")
    + ")",
    "lineitem": "* REPLACE ("
    + ", ".join(
        _case(col, 233, {k: v[i] for k, v in LINEITEM_POKES.items()}, "l_orderkey")
        for i, col in enumerate(["l_extendedprice", "l_discount", "l_tax"])
    )
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

    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/refunds_tier"
    print(synthesize(out))

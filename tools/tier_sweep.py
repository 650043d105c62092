"""Run every oracled registry query on an arbitrary tier directory and
compare engine vs DuckDB oracle — the triage loop for new poked tiers
(unicode text, time edges, skew) before they graduate to a pytest sweep.

Usage: python tools/tier_sweep.py TIER_DIR [name-substring ...]
Exit 0 = all green. Prints one line per query, failures summarized.
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402
import pytest  # noqa: E402

from etl_file_sync_spark.catalog import TABLES  # noqa: E402
from etl_file_sync_spark.queries import REGISTRY  # noqa: E402
from tests.conftest import canon, _kind  # noqa: E402


def compare(sp: pd.DataFrame, dk: pd.DataFrame) -> str | None:
    if list(sp.columns) != list(dk.columns):
        return f"columns {list(sp.columns)} != {list(dk.columns)}"
    if len(sp) != len(dk):
        return f"rows {len(sp)} != {len(dk)}"
    for c in sp.columns:
        a, b = sp[c], dk[c]
        if bool(a.isna().all()) and bool(b.isna().all()):
            continue
        ka, kb = _kind(a), _kind(b)
        if "empty" not in (ka, kb) and ka != kb:
            return f"dtype {c}: {ka} vs {kb}"
        if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
            for i, (x, y) in enumerate(zip(a, b)):
                xn = x is None or (isinstance(x, float) and math.isnan(x))
                yn = y is None or (isinstance(y, float) and math.isnan(y))
                if xn and yn:
                    continue
                if xn or yn or x != pytest.approx(y, abs=1e-9, rel=1e-9):
                    return f"{c}[{i}]: {x!r} != {y!r}"
        else:
            al = a.where(pd.notna(a), None).tolist()
            bl = b.where(pd.notna(b), None).tolist()
            if al != bl:
                bad = next(i for i, (x, y) in enumerate(zip(al, bl)) if x != y)
                return f"{c}[{bad}]: {al[bad]!r} != {bl[bad]!r}"
    return None


def main() -> int:
    from etl_file_sync_spark.session import get_spark

    tier = sys.argv[1]
    filters = sys.argv[2:]
    spark = get_spark("tier-sweep", cpus=8)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{tier}/{t}.parquet'")

    names = sorted(
        k
        for k, q in REGISTRY.items()
        if q.oracle is not None and (not filters or any(f in k for f in filters))
    )
    fails: list[tuple[str, str]] = []
    for name in names:
        t0 = time.time()
        q = REGISTRY[name]
        try:
            sdf = canon(q.build(spark, tier).toPandas())
            odf = canon(con.sql(q.oracle).df())
            err = compare(sdf, odf)
        except Exception as exc:  # noqa: BLE001
            err = f"{type(exc).__name__}: {exc}"
        spark.catalog.clearCache()
        if err:
            fails.append((name, err))
        print(
            f"{'FAIL' if err else 'ok  '} {name:42s} {time.time() - t0:6.2f}s"
            f"  {(err or '')[:140]}",
            flush=True,
        )

    print(f"\n{len(names) - len(fails)}/{len(names)} green")
    for name, err in fails:
        print(f"FAIL {name}: {err[:200]}")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Malformed/heterogeneous-JSON tier: schema-on-read under producer bugs.

The organic events.props column is uniformly tidy '{"k": <int>, ...}'
objects, so the JSON surface (get_json_object, parse_json VARIANT,
json_extract oracles) only ever ran the happy path. This sweep re-runs
every oracled query on a tier where props carries truncated objects,
bare words, empty strings, arrays/scalars/JSON nulls at the object
position, wrong-typed values at the extracted path (string numbers,
booleans, nested objects, 20-digit overflow integers), escaped
surrogate pairs, deep nesting, BOM prefixes and NULLs
(tools/json_tier.py).

The first run CRASHED both engines — plain parse_json aborts the whole
job on the first malformed payload and DuckDB's json_extract errors
the oracle — which is exactly the class this tier exists to catch.
Fixed by TRY semantics as the contract (try_parse_json /
try_variant_get engine-side; json_valid guards oracle-side) plus the
shared numeric-string truncation convention for path casts
('12.7' -> 12 like Spark's non-ANSI string->int; boolean and overflow
-> NULL; a bare DuckDB CAST would round to 13 and error on 20-digit
values).

There is deliberately NO duplicate-key poke: Spark's variant builder
REJECTS duplicate-key objects, DuckDB's parser dedups last-wins, and
Jackson streams first-wins — three engines, three answers, no
SQL-expressible mirror. Duplicate-key producers are a DLQ concern
upstream of the analytics surface.
"""

from __future__ import annotations

import duckdb
import pytest

from etl_file_sync_spark.catalog import TABLES
from etl_file_sync_spark.queries import REGISTRY
from tests.conftest import assert_frames_match
from tools.json_tier import PROPS_POKES, synthesize

pytestmark = pytest.mark.slow

ORACLE_QUERIES = sorted(name for name, q in REGISTRY.items() if q.oracle is not None)


@pytest.fixture(scope="module")
def tier(tmp_path_factory):
    d = synthesize(str(tmp_path_factory.mktemp("json_tier")))
    con = duckdb.connect()
    n_null, n_bad = con.execute(
        f"""
        SELECT count(*) FILTER (props IS NULL),
               count(*) FILTER (props IS NOT NULL AND NOT json_valid(props))
        FROM read_parquet('{d}/events.parquet')
        """
    ).fetchone()
    con.close()
    assert n_null > 0 and n_bad > 0, "tier synthesis poked no bad JSON"
    return d


@pytest.fixture(scope="module")
def duck(tier):
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{tier}/{name}.parquet')"
        )
    yield con
    con.close()


def test_try_parse_never_aborts(spark, tier):
    """The don't-kill-the-job contract: the VARIANT query completes over
    every poke class and yields one row per input id — malformed
    payloads become NULL extractions, not exceptions."""
    out = REGISTRY["scalar_variant_ops"].build(spark, tier).toPandas()
    assert len(out) == 500
    poked_bad = [i for i in range(500) if i % 229 in (3, 7, 11)]
    assert out.set_index("event_id").loc[poked_bad, "k_val"].isna().all()


def test_truncation_convention(spark, tier):
    """'12.7' at the path casts to 12 in BOTH engines (the shared
    grammar convention's double-parse + trunc spelling)."""
    out = REGISTRY["scalar_variant_ops"].build(spark, tier).toPandas()
    string_num = [i for i in range(500) if i % 229 == 19]
    got = out.set_index("event_id").loc[string_num, "k_val"]
    assert (got == 12).all()


def test_grammar_convention_divergence_zones(spark, tier):
    """The round-7 pokes sit exactly where the NATIVE casts disagree
    (quoted '1e3', near-integer decimal strings, Java E-notation
    rendering, '1d'/'1_000' single-engine parses): the shared grammar
    convention must give the same defined answer through the VARIANT
    route — the tier-wide oracle sweep pins the other two routes."""
    out = REGISTRY["scalar_variant_ops"].build(spark, tier).toPandas()
    idx = out.set_index("event_id")["k_val"]
    expect = {73: 1000, 79: 13, 83: 12345678, 89: 0, 97: None,
              101: None, 103: None, 107: 12, 109: 12}
    for cls, want in expect.items():
        ids = [i for i in range(500) if i % 229 == cls]
        got = idx.loc[ids]
        if want is None:
            assert got.isna().all(), f"class {cls}: {got.tolist()}"
        else:
            assert (got == want).all(), f"class {cls}: {got.tolist()}"


def test_num_str_int_engine_matches_model(spark):
    """Spark side of the grammar convention == the Python model on the
    probe battery (native-cast skew cases included); the DuckDB side
    is pinned by tests/test_convention_properties.py on random text."""
    from etl_file_sync_spark.functions.numcast import num_str_int, py_num_str_int

    cases = [
        "12.7", "-12.7", "12.99999999999999999", "1e3", "1E+3",
        "+5", "-0.5", ".5", "12.", "  12  ", "　12　", "12.7.3",
        "0.004", "99999999999999999999", "2147483648", "-2147483648",
        "2147483647", "-2147483649", "2147483647.999", "-2147483648.9",
        "true", "", "abc", "nan", "inf", "NaN", "Infinity", "-Infinity",
        "9e999", "-9e999", "007", "+.5", "-.", ".", "+.", "..", "+", "-",
        "--5", "1_000", "0x10", "0x1p3", "1d", "1f", "1D",
        "12abc", "12.abc", " +12.9\t\n", "12,7", "\x0b12", "\x1f12",
        "00.5", "12e", "e3", ". 5", "5 .",
    ]
    cases = sorted(set(cases))
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(c,) for c in cases], "s string")
    got = {r.s: r.k for r in df.select("s", num_str_int(F.col("s")).alias("k")).collect()}
    for c in cases:
        assert got[c] == py_num_str_int(c), f"{c!r}: {got[c]} != {py_num_str_int(c)}"


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle_on_json_tier(spark, tier, duck, name):
    q = REGISTRY[name]
    assert_frames_match(q.build(spark, tier), duck.sql(q.oracle))
    spark.catalog.clearCache()

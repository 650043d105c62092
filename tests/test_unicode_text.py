"""Unicode/empty-string-poked tier: string semantics under real-world text.

The organic corpus is pure ASCII, so every string function the engine
leans on is only exercised where JVM and utf8proc semantics coincide.
This sweep re-runs every oracled query on a tier where documents.text
and customer.c_name carry adversarial-but-legal UTF-8 (empty strings,
NBSP/ideographic-space separators, NFC-vs-NFD spellings, sharp-s /
Turkish-İ / final-sigma special casing, unspaced CJK, RTL marks, ZWJ
emoji, combining stacks — tools/unicode_tier.py). Both engines read
byte-identical parquet, so any divergence is a genuine cross-runtime
string-semantics difference.

The first run of this sweep found 6 divergences, fixed by two mirrored
conventions:
- the ASCII case-fold contract (operators/text.py ascii_lower/
  ascii_upper + trim(x, ' ') oracle spelling): JVM lower/upper apply
  SpecialCasing (upper('ß')='SS', context-sensitive final sigma,
  'İ'->'i'+U+0307) while utf8proc applies simple one-to-one maps
  (upper('ß')='ẞ', every Σ->'σ', 'İ'->'i'), and DuckDB's trim() strips
  Unicode whitespace where Spark's strips ASCII space — so fingerprints,
  PII synthesis, token counts, and the scalar demo fold/trim ASCII only;
- zero-token documents leave the collection: BM25's n_docs/avgdl count
  token-BEARING docs, and the bigram LM filters empty split segments
  like its oracle always did.
"""

from __future__ import annotations

import duckdb
import pytest

from etl_file_sync_spark.catalog import TABLES
from etl_file_sync_spark.queries import REGISTRY
from tests.conftest import assert_frames_match
from tools.unicode_tier import DOC_POKES, synthesize

pytestmark = pytest.mark.slow

ORACLE_QUERIES = sorted(name for name, q in REGISTRY.items() if q.oracle is not None)


@pytest.fixture(scope="module")
def tier(tmp_path_factory):
    d = synthesize(str(tmp_path_factory.mktemp("unicode_tier")))
    con = duckdb.connect()
    # the synthesis landed the intended codepoints: NFD differs from NFC,
    # invisible separators survived, empties are '' not NULL
    assert DOC_POKES[17][1] != DOC_POKES[13][1]
    n_poked, n_empty = con.execute(
        f"""
        SELECT count(*) FILTER (octet_length(encode(text)) > length(text)),
               count(*) FILTER (text = '')
        FROM read_parquet('{d}/documents.parquet')
        """
    ).fetchone()
    con.close()
    assert n_poked > 40, "tier synthesis poked no non-ASCII text"
    assert n_empty > 0, "tier synthesis produced no empty-string docs"
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


def test_ascii_fold_contract(spark):
    """The fold maps exactly A-Z and leaves every special-casing
    codepoint alone — the property both runtimes agree on."""
    from pyspark.sql import functions as F

    from etl_file_sync_spark.operators.text import ascii_lower, ascii_upper

    row = (
        spark.range(1)
        .select(
            ascii_lower(F.lit("Straße İ ΟΔΥΣΣΕΥΣ ŉ ABCz")).alias("lo"),
            ascii_upper(F.lit("straße ı ςσ ŉ abcZ")).alias("up"),
        )
        .collect()[0]
    )
    assert row["lo"] == "straße İ ΟΔΥΣΣΕΥΣ ŉ abcz"
    assert row["up"] == "STRAßE ı ςσ ŉ ABCZ"


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle_on_unicode_tier(spark, tier, duck, name):
    q = REGISTRY[name]
    assert_frames_match(q.build(spark, tier), duck.sql(q.oracle))
    spark.catalog.clearCache()

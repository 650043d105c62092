"""Monster-document tier: tail-document robustness.

The organic documents average ~50 tokens, so every per-document array
expression (token stats, shingles, n-grams, the BPE pretokenizer,
entropy, fingerprints, segment dedup) only ever sees tiny rows. Real
web corpora carry million-token documents in every shard — the rows
where per-doc quadratic spellings, array-size limits, and regex
backtracking hide. This sweep re-runs every oracled query on a tier
where one document is its organic text repeated 400x (~20k tokens /
112 KB) and another is a single 60,000-character token (the minified-
JS / base64-blob shape with no whitespace at all)
(tools/monsterdoc_tier.py).

Both engines read identical bytes, so the assertions are byte-parity;
the sweep's wall-clock is the robustness signal — a per-doc quadratic
spelling turns a 400x longer document into a 160,000x slower row and
times the suite out long before any assertion fires.
"""

from __future__ import annotations

import duckdb
import pytest

from etl_file_sync_spark.catalog import TABLES
from etl_file_sync_spark.queries import REGISTRY
from tests.conftest import assert_frames_match
from tools.monsterdoc_tier import BLOB_LEN, REPEATS, synthesize

pytestmark = pytest.mark.slow

ORACLE_QUERIES = sorted(name for name, q in REGISTRY.items() if q.oracle is not None)


@pytest.fixture(scope="module")
def tier(tmp_path_factory):
    d = synthesize(str(tmp_path_factory.mktemp("monsterdoc_tier")))
    con = duckdb.connect()
    max_chars, max_token = con.execute(
        f"""
        SELECT max(length(text)),
               max(len(string_split(text, ' ')) = 1 AND length(text) >= {BLOB_LEN})
        FROM read_parquet('{d}/documents.parquet')
        """
    ).fetchone()
    con.close()
    assert max_chars > 50_000 and max_token, "tier synthesis planted no monsters"
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


def test_monster_rows_flow_through_token_stats(spark, tier):
    """The repeated-text monster reports ~REPEATS x its source's token
    count and the blob reports exactly one token — per-row array ops
    hold at tail grain."""
    out = (
        REGISTRY["text_token_stats"].build(spark, tier).toPandas().set_index("doc_id")
    )
    assert out.loc[3, "n_tokens"] >= REPEATS * 40
    assert out.loc[7, "n_tokens"] == 1


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle_on_monsterdoc_tier(spark, tier, duck, name):
    q = REGISTRY[name]
    assert_frames_match(q.build(spark, tier), duck.sql(q.oracle))
    spark.catalog.clearCache()

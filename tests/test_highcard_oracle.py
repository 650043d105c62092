"""High-cardinality-categories tier: the alphabet is not an enum.

Every organic tier carries tiny categorical alphabets (5 event types,
4 langs, 5 sources), so any spelling that is only correct — or only
BOUNDED — when the alphabet is a small closed enum looks healthy
everywhere else. This sweep re-runs every oracled query on a tier
(tools/highcard_tier.py) where ~1/3 of events carry per-row suffixed
types ('view#41', ...; alphabet ~290), and ~1/2 of documents carry
suffixed lang/source values (~100/~140 distinct) — the classic
cardinality-explosion incident (an ID embedded in a category field).

First contact caught three real defects:
* behavior_markov_absorption CRASHED: a target-only sink type (common
  once the alphabet is open) made the Jacobi update's empty sum()
  return int 0, which createDataFrame rejects for DoubleType — fixed
  with a float-typed empty sum, plus an explicit admission cap
  (_collect_kernel, fail-fast over 10k kernel cells) replacing the
  "enum-bounded" trust in the producer's alphabet for BOTH Markov
  driver pulls;
* scalar_url_extract's oracle regexes were fragment-blind twice over:
  lang='zh#1' embeds '#' so the query must STOP at the fragment, and
  source='web#7' puts the fragment in the HOST position so there is
  NO query at all (parse_url: NULL) while '\\?(.*)$' happily
  extracted from inside the fragment — respelled with the ^[^#]*
  fragment-ordering anchor and nullif('') to mirror parse_url's NULL.
"""

from __future__ import annotations

import duckdb
import pytest

from etl_file_sync_spark.catalog import TABLES
from etl_file_sync_spark.queries import REGISTRY
from tests.conftest import assert_frames_match
from tools.highcard_tier import synthesize

pytestmark = pytest.mark.slow

ORACLE_QUERIES = sorted(name for name, q in REGISTRY.items() if q.oracle is not None)


@pytest.fixture(scope="module")
def tier(tmp_path_factory):
    d = synthesize(str(tmp_path_factory.mktemp("highcard_tier")))
    con = duckdb.connect()
    k_types, = con.execute(
        f"SELECT count(DISTINCT event_type) FROM read_parquet('{d}/events.parquet')"
    ).fetchone()
    k_lang, k_src = con.execute(
        f"""SELECT count(DISTINCT lang), count(DISTINCT source)
            FROM read_parquet('{d}/documents.parquet')"""
    ).fetchone()
    con.close()
    assert k_types > 100, f"event alphabet not exploded ({k_types})"
    assert k_lang > 50 and k_src > 50, f"doc alphabets not exploded ({k_lang}, {k_src})"
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


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle_on_highcard_tier(spark, tier, duck, name):
    q = REGISTRY[name]
    assert_frames_match(q.build(spark, tier), duck.sql(q.oracle))
    spark.catalog.clearCache()


def test_markov_admission_cap_fails_fast(spark):
    """The Markov kernel pull must REFUSE an exploded alphabet with a
    clear admission error, never OOM the driver: _collect_kernel caps
    at 10k cells riding the same job as the collect."""
    from etl_file_sync_spark.queries.behavior import (
        _MAX_MARKOV_CELLS,
        _collect_kernel,
    )

    big = spark.range(_MAX_MARKOV_CELLS + 5).selectExpr(
        "CAST(id AS STRING) AS f", "CAST(id + 1 AS STRING) AS t",
        "CAST(1.0 AS DOUBLE) AS p"
    )
    with pytest.raises(ValueError, match="admission|alphabet|cells"):
        _collect_kernel(big, "test")
    small = spark.range(7).selectExpr(
        "CAST(id AS STRING) AS f", "CAST(id + 1 AS STRING) AS t",
        "CAST(1.0 AS DOUBLE) AS p"
    )
    assert len(_collect_kernel(small, "test")) == 7


def test_markov_sink_transient_stays_zero_float(spark, tmp_path):
    """A target-only sink type (reachable, no outgoing transitions)
    must hold h = 0.0 — float-typed, so createDataFrame accepts it —
    matching the oracle's self-loop augmentation. Pins the empty-sum
    int-0 crash the highcard tier caught."""
    import pandas as pd

    d = tmp_path / "toy"
    d.mkdir()
    rows = []
    # user 1: view -> error (absorbing), user 2: view -> dead_end (sink)
    for i, (uid, et, off) in enumerate([
        (1, "view", 0), (1, "error", 60), (2, "view", 0), (2, "dead_end", 60),
        (3, "view", 0), (3, "purchase", 60),
    ]):
        rows.append((i, pd.Timestamp("2024-01-05") + pd.Timedelta(seconds=off + i),
                     uid, et, 1.0, "{}"))
    pd.DataFrame(rows, columns=[
        "event_id", "ts", "user_id", "event_type", "value", "props"
    ]).to_parquet(d / "events.parquet")
    out = {
        r["state"]: r["p_error_before_purchase"]
        for r in REGISTRY["behavior_markov_absorption"].build(spark, str(d)).collect()
    }
    assert out["dead_end"] == 0.0
    assert isinstance(out["dead_end"], float)
    assert out["error"] == 1.0
    assert out["purchase"] == 0.0
    # view splits 1/3 error, 1/3 purchase, 1/3 sink -> h = 1/3
    assert out["view"] == pytest.approx(1 / 3, abs=1e-6)

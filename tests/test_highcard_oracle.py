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
  (_collect_kernel, fail-fast past a 300-state alphabet) replacing the
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
    """The Markov kernel pull must REFUSE an exploded ALPHABET with a
    clear admission error, never OOM the driver — but must ADMIT a
    dense kernel over a legitimate taxonomy: the cap is on distinct
    observed states k (<= 300), not on kernel cells, which grow with
    corpus density at a fixed alphabet (round-7 ADVICE). The pull
    stays bounded either way (limit(k_max^2+1) rides the collect)."""
    from etl_file_sync_spark.queries.behavior import (
        _MAX_MARKOV_STATES,
        _collect_kernel,
    )

    # exploded alphabet: a chain over k_max+5 states -> admission error
    big = spark.range(_MAX_MARKOV_STATES + 5).selectExpr(
        "CAST(id AS STRING) AS f", "CAST(id + 1 AS STRING) AS t",
        "CAST(1.0 AS DOUBLE) AS p"
    )
    with pytest.raises(ValueError, match="admission|alphabet|cells"):
        _collect_kernel(big, "test")
    # DENSE kernel on a sane alphabet: 250 states, all 62,500 cells
    # observed — a legitimate taxonomy on a dense corpus must pass
    dense = spark.range(250 * 250).selectExpr(
        "CAST(id % 250 AS STRING) AS f",
        "CAST(CAST(id / 250 AS BIGINT) AS STRING) AS t",
        "CAST(1.0 AS DOUBLE) AS p",
    )
    assert len(_collect_kernel(dense, "test")) == 250 * 250
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


def test_markov_on_sf001_highcard_alphabet_within_cap(spark, tier, duck):
    """The sf0.001 highcard tier's OBSERVED event alphabet sits inside
    the 300-state admission cap, so the Markov queries must take the
    PARITY branch there (the module sweep above covers them); this
    test pins that the sweep's green Markov rows are parity evidence,
    not vacuous skips."""
    k, = duck.execute(
        "SELECT count(DISTINCT event_type) FROM events"
    ).fetchone()
    from etl_file_sync_spark.queries.behavior import _MAX_MARKOV_STATES

    assert k <= _MAX_MARKOV_STATES, (
        f"sf0.001 highcard alphabet grew past the cap ({k}) — the module "
        "sweep's Markov rows are now admission errors, update this pin"
    )


def test_markov_admission_on_sf01_highcard(spark, tmp_path_factory):
    """Highcard x scale interaction (round-7 ADVICE): the highcard
    REWRITE suffixes ~1/3 of events with event_id % 137, so the
    observed alphabet GROWS with row count toward 5 + 5*137 = 690
    types — past the 300-state admission cap at sf0.01. The Markov
    queries must behave by CONTRACT at every scale: full oracle parity
    while the observed alphabet is admissible, a clean fail-fast
    admission error (never an OOM or a silent wrong answer) once it is
    not. This exercises the cap against the scaled tier the sf0.001
    sweep cannot reach."""
    import duckdb as _duckdb

    d = synthesize(
        str(tmp_path_factory.mktemp("highcard_sf01")),
        src="/root/testdata/sf0.01",
    )
    con = _duckdb.connect()
    k, = con.execute(
        "SELECT count(DISTINCT event_type) FROM "
        f"read_parquet('{d}/events.parquet')"
    ).fetchone()
    from etl_file_sync_spark.queries.behavior import _MAX_MARKOV_STATES

    for name in ("behavior_markov_absorption", "behavior_markov_attribution"):
        q = REGISTRY[name]
        if k <= _MAX_MARKOV_STATES:
            for t_name in TABLES:
                con.execute(
                    f"CREATE OR REPLACE VIEW {t_name} AS SELECT * FROM "
                    f"read_parquet('{d}/{t_name}.parquet')"
                )
            assert_frames_match(q.build(spark, d), con.sql(q.oracle))
        else:
            with pytest.raises(ValueError, match="admission|alphabet"):
                q.build(spark, d).collect()
    con.close()
    spark.catalog.clearCache()

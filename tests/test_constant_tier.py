"""Constant/zero-variance tier: the sd = 0 / single-category pocket.

The organic tiers always carry healthy variance, so every statistic
only ever ran with sd > 0, every contingency table with full margins,
every dedup with mostly-distinct text, and every vector with a
direction. This sweep re-runs every oracled query on a tier where all
measures are constants, event_type/lang/source/label collapse to one
level, every document is the same text, and every embedding is the
same vector (with a zero-vector class poked at vec_id % 53 = 0) —
tools/constant_tier.py.

Divergence classes hunted: 0/0 and sd = 0 denominators (NaN vs NULL
vs Infinity across Spark non-ANSI, DuckDB IEEE ops, and numpy),
single-category margins folding the data-dependent-df gates, total
ties in rank/percentile/top-k machinery, total duplication through
the dedup pair caps, zero-norm cosines, and degenerate fits
(log-log slopes over constant x, IRLS on one label, PCA of a zero
covariance matrix).
"""

from __future__ import annotations

import duckdb
import pytest

from etl_file_sync_spark.catalog import TABLES
from etl_file_sync_spark.queries import REGISTRY
from tests.conftest import assert_frames_match
from tools.constant_tier import ZERO_VEC_MOD, synthesize

pytestmark = pytest.mark.slow

ORACLE_QUERIES = sorted(name for name, q in REGISTRY.items() if q.oracle is not None)


@pytest.fixture(scope="module")
def tier(tmp_path_factory):
    d = synthesize(str(tmp_path_factory.mktemp("constant_tier")))
    con = duckdb.connect()
    n_text, n_val, n_type = con.execute(
        f"""
        SELECT (SELECT count(DISTINCT text) FROM read_parquet('{d}/documents.parquet')),
               (SELECT count(DISTINCT value) FROM read_parquet('{d}/events.parquet')),
               (SELECT count(DISTINCT event_type) FROM read_parquet('{d}/events.parquet'))
        """
    ).fetchone()
    n_zero_vec = con.execute(
        f"""
        SELECT count(*) FROM read_parquet('{d}/embeddings.parquet')
        WHERE vec_id % {ZERO_VEC_MOD} = 0
        """
    ).fetchone()[0]
    con.close()
    assert n_text == 1 and n_val == 1 and n_type == 1, "tier is not constant"
    assert n_zero_vec > 0, "tier poked no zero vectors"
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


# dedup_embedding_srp's oracle was ASSUMPTION-based until round 7 (it
# restated the planted pairs, a data property); the boundary tier's
# duplicate-vector twins broke it a second way and forced the semantic
# respell — the oracle now brute-forces every (organic ∪ planted) pair
# at the 0.9 threshold, so it states the exact-verify semantics and
# parity holds on EVERY tier (here: the full C(2(n-z), 2) clique).
# The closed-form truth test below stays as an engine-only invariant.


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle_on_constant_tier(spark, tier, duck, name):
    q = REGISTRY[name]
    assert_frames_match(q.build(spark, tier), duck.sql(q.oracle))
    spark.catalog.clearCache()


def test_srp_constant_tier_closed_form(spark, tier):
    """On the constant tier the SRP pipeline's exact answer is known in
    closed form: originals ∪ planted = 2n vectors, z of each zeroed
    (no direction ⇒ never pair), every remaining pair has cosine
    exactly 1.0 ⇒ output must be ALL C(2(n-z), 2) pairs at cosine 1.0.
    This pins that the LSH banding loses nothing when every vector
    collides in every band AND that the exact-collapse + expand path
    (identical vectors collapse to one representative each) reproduces
    the full pair set."""
    import duckdb as _dd

    out = REGISTRY["dedup_embedding_srp"].build(spark, tier).toPandas()
    con = _dd.connect()
    n, z = con.execute(
        f"""
        SELECT count(*),
               count(*) FILTER (len(list_filter(embedding, x -> x <> 0)) = 0)
        FROM read_parquet('{tier}/embeddings.parquet')
        """
    ).fetchone()
    con.close()
    m = 2 * (n - z)
    assert len(out) == m * (m - 1) // 2
    assert (out["cosine"] == 1.0).all()
    assert (out["id_a"] < out["id_b"]).all()
    spark.catalog.clearCache()

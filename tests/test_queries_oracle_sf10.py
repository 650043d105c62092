"""Sampled oracle parity at sf0.1 — BENCH scale (round-7 verdict #7).

Parity is proven exhaustively at sf0.001 and sf0.01, but the bench
runs at sf0.1, where AQE can flip plans (broadcast vs shuffle joins,
coalesced partitions) and accumulation magnitudes are 10-100x larger —
and until this module no parity evidence existed at that scale. The
sweep covers the 20 most expensive bench queries (the top-20 of the
round-7 per-query map — exactly the set whose plans are most likely to
flip under AQE and whose accumulations are largest), read dynamically
from the newest BENCH_DETAIL_r*.json when present so the set tracks
the bench, with the r7 tail as the static fallback. Rows-only bench
entries (the engine-seeded xxh spellings) have no oracle and are
excluded by construction.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

import duckdb
import pytest

from etl_file_sync_spark.catalog import TABLES
from etl_file_sync_spark.queries import REGISTRY
from tests.conftest import assert_frames_match

SF10_DIR = "/root/testdata/sf0.1"
REPO = Path(__file__).resolve().parent.parent
TOP_N = 20

# static fallback: the slowest-20 of the round-7 bench (its stdout
# tail), padded with the next-heaviest ORACLED families because four
# of the tail's entries are rows-only/engine-seeded (xxh spellings,
# IRLS, PQ) and filtering must still yield a full top-20
_R7_SLOWEST = [
    "dedup_embedding_srp", "stat_propensity_stratified_att",
    "dedup_fuzzy_blocked", "stat_winsorized_mean", "stat_nelson_aalen",
    "agg_rfm_segments", "layout_zorder_buckets", "stat_spearman_rank_corr",
    "dedup_simhash_pairs_xxh", "stat_dunn_posthoc", "text_quality_train_irls",
    "sim_topk_ivfpq", "stat_brown_forsythe", "dedup_fuzzy_jw_blocked",
    "stat_kaplan_meier", "stat_mannwhitney_u", "dedup_minhash_pairs",
    "agg_percentiles_exact", "sim_topk_pq", "eval_conformal_interval",
    "dedup_jaccard_pairs", "sim_topk_int8", "multimodal_jpeg_decode",
    "text_bigram_lm_kn",
]


def _top_bench_queries() -> list[str]:
    details = sorted(
        REPO.glob("BENCH_DETAIL_r*.json"),
        key=lambda p: int(re.search(r"r(\d+)", p.name).group(1)),
    )
    names: list[str]
    if details:
        data = json.loads(details[-1].read_text())
        ranked = sorted(
            data["queries"].items(), key=lambda kv: -kv[1]["min"]
        )
        names = [n for n, _ in ranked]
    else:
        names = list(_R7_SLOWEST)
    oracled = [
        n for n in names if n in REGISTRY and REGISTRY[n].oracle is not None
    ]
    return oracled[:TOP_N]


TOP_QUERIES = _top_bench_queries()

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def duck10():
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{SF10_DIR}/{name}.parquet'"
        )
    yield con
    con.close()


def test_top_query_set_is_full_sized():
    assert len(TOP_QUERIES) == TOP_N, TOP_QUERIES


@pytest.mark.parametrize("name", TOP_QUERIES)
def test_top_bench_query_matches_oracle_sf10(spark, duck10, name):
    q = REGISTRY[name]
    assert_frames_match(q.build(spark, SF10_DIR), duck10.sql(q.oracle))
    spark.catalog.clearCache()

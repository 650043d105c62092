"""Element-NULL vector tier: oracle PARITY for the embedding family.

The all-NULL degenerate tier (tools/degenerate_tiers.py null_opt) nulls
WHOLE columns; a vector column can also carry arrays with NULL
*elements* — the layout a sparse upstream featurizer or a bad join
produces. Those vectors are as uncomparable as NULL vectors (their
dot/norm is NULL; DuckDB's list_cosine_similarity ABORTS on them), so
the engine-wide posture is: `similarity.vec_ok` drops both up front,
and every embedding oracle carries the matching
`embedding IS NOT NULL AND len(list_filter(embedding, x -> x IS NULL)) = 0`
guard. The first run of this sweep found 7 divergences (DuckDB aborts /
row-count drift from Spark's incidental NULL-band drops).

Tier: sf0.001 with every vec_id % 97 == 3 embedding's third coordinate
replaced by NULL (6 poked vectors) — everything else byte-identical.
"""

from __future__ import annotations

import math
import os
import shutil

import duckdb
import pandas as pd
import pytest

from etl_file_sync_spark.catalog import TABLES
from etl_file_sync_spark.queries import REGISTRY
from tests.conftest import canon, _kind

pytestmark = pytest.mark.slow

SRC = "/root/testdata/sf0.001"

ORACLE_EMBEDDING_QUERIES = [
    "dedup_embedding_pairs",
    "dedup_embedding_srp",
    "dedup_semantic_keep",
    "sim_topk_bruteforce",
    "sim_topk_int8",
    "embed_int8_quant",
    "cluster_kmeans_assign",
    "cluster_silhouette",
    "agg_embedding_centroids",
    "embed_covariance_entries",
    "sim_mmr_rerank",
    "text_hashed_embedding_topk",
]
ROWS_ONLY_EMBEDDING_QUERIES = ["sim_topk_ivf", "sim_topk_pq", "sim_topk_ivfpq"]


@pytest.fixture(scope="module")
def elem_null_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("elem_null_tier"))
    for name in TABLES:
        src = os.path.join(SRC, f"{name}.parquet")
        if name != "embeddings" and os.path.exists(src):
            dst = os.path.join(d, f"{name}.parquet")
            shutil.copy2(src, dst) if os.path.isfile(src) else shutil.copytree(src, dst)
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (SELECT * REPLACE (
              CASE WHEN vec_id % 97 = 3
                   THEN list_transform(range(len(embedding)),
                        i -> CASE WHEN i = 2 THEN NULL
                                  ELSE embedding[i + 1] END)::FLOAT[]
                   ELSE embedding END AS embedding)
              FROM read_parquet('{SRC}/embeddings.parquet'))
        TO '{d}/embeddings.parquet' (FORMAT PARQUET)
        """
    )
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{d}/embeddings.parquet') "
        "WHERE len(list_filter(embedding, x -> x IS NULL)) > 0"
    ).fetchone()[0]
    assert n > 0, "tier synthesis produced no element-NULL vectors"
    con.close()
    return d


@pytest.fixture(scope="module")
def duck(elem_null_dir):
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"'{elem_null_dir}/{name}.parquet'"
        )
    yield con
    con.close()


def _match(spark_df, duck_rel):
    sp = canon(spark_df.toPandas())
    dk = canon(duck_rel.df())
    assert list(sp.columns) == list(dk.columns)
    assert len(sp) == len(dk), f"rows {len(sp)} vs {len(dk)}"
    for c in sp.columns:
        a, b = sp[c], dk[c]
        if bool(a.isna().all()) and bool(b.isna().all()):
            continue
        ka, kb = _kind(a), _kind(b)
        if "empty" not in (ka, kb):
            assert ka == kb, f"dtype {c}: {ka} vs {kb}"
        if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
            for i, (x, y) in enumerate(zip(a, b)):
                xn = x is None or (isinstance(x, float) and math.isnan(x))
                yn = y is None or (isinstance(y, float) and math.isnan(y))
                if xn and yn:
                    continue
                assert not (xn or yn), f"{c}[{i}]: {x!r} != {y!r}"
                assert x == pytest.approx(y, abs=1e-9, rel=1e-9), f"{c}[{i}]"
        else:
            assert a.where(pd.notna(a), None).tolist() == b.where(
                pd.notna(b), None
            ).tolist(), f"col {c} differs"


@pytest.mark.parametrize("name", ORACLE_EMBEDDING_QUERIES)
def test_embedding_query_parity_on_element_null_tier(
    spark, elem_null_dir, duck, name
):
    q = REGISTRY[name]
    _match(q.build(spark, elem_null_dir), duck.sql(q.oracle))
    spark.catalog.clearCache()


@pytest.mark.parametrize("name", ROWS_ONLY_EMBEDDING_QUERIES)
def test_rows_only_ann_survives_element_null_tier(spark, elem_null_dir, name):
    # approximate ANN paths have no SQL oracle; the contract here is
    # no-crash + the poked vectors excluded (no NULL ids/scores leak)
    out = REGISTRY[name].build(spark, elem_null_dir).toPandas()
    assert not out.isna().any().any(), f"{name} leaked NULLs: {out.head()}"
    spark.catalog.clearCache()

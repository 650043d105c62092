"""Accuracy bounds for the engine-specific sketch queries
(queries/advanced.py): HLL union estimates vs exact distinct counts,
approx_top_k vs the exact frequency top-k."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_file_sync_spark.catalog import load_table
from etl_file_sync_spark.queries.registry import REGISTRY


def test_hll_union_estimate_within_5pct(spark, sf_dir):
    rows = REGISTRY["agg_hll_lifecycle"].build(spark, sf_dir).collect()
    assert rows, "no event types"
    for r in rows:
        err = abs(r.est_users_union - r.exact_users) / max(r.exact_users, 1)
        assert err <= 0.05, f"{r.event_type}: est {r.est_users_union} vs {r.exact_users}"
        assert r.n_weeks >= 2  # the union actually merged sketches


def test_hll_union_equals_direct_sketch(spark, sf_dir):
    # mergeability: union of weekly sketches ≈ one global sketch
    ev = load_table(spark, sf_dir, "events")
    direct = (
        ev.agg(F.expr("hll_sketch_estimate(hll_sketch_agg(user_id))").cast("long").alias("e"))
        .first()["e"]
    )
    via_union = (
        ev.groupBy(F.weekofyear("ts"))
        .agg(F.expr("hll_sketch_agg(user_id)").alias("sk"))
        .agg(F.expr("hll_sketch_estimate(hll_union_agg(sk))").cast("long").alias("e"))
        .first()["e"]
    )
    assert abs(direct - via_union) / max(direct, 1) <= 0.02


def test_approx_top_k_matches_exact_head(spark, sf_dir):
    approx = [r.term for r in REGISTRY["agg_approx_top_k"].build(spark, sf_dir).collect()]
    docs = load_table(spark, sf_dir, "documents")
    exact = [
        r.term
        for r in (
            docs.select(F.explode(F.split("text", " ")).alias("term"))
            .where(F.length("term") > 0)
            .groupBy("term")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("term"))
            .limit(10)
            .collect()
        )
    ]
    # the sketch keeps exact counts at this cardinality; sets must agree
    assert set(approx) == set(exact)

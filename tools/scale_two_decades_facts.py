"""Two-decade growth for the FACT-grain bench machinery — 100x evidence.

tools/scale_two_decades.py covers the candidate-generating operators
(documents/embeddings grain). The round-7 verdict asked for the same
two-decade evidence for the machinery behind the most expensive bench
entries: the rankstats-backed statistics (Spearman, winsorized mean,
Dunn, Brown-Forsythe, propensity strata), the RFM/z-order layout ops,
the survival curves, and the behavior-sequence face (funnel / Markov /
streaks / entity cap) — all of which scan the FACT tables (events /
orders / lineitem) that the documents-grain transform leaves flat.

This tool replicates ALL of documents/embeddings/orders (via
scale_smoke.synthesize_10x) AND events/lineitem (FK-consistent:
l_orderkey tracks the replicated o_orderkey; user_id/event_id shift
per replica so the tier has 10x users with organic-shaped sequences,
the realistic horizontal growth) — applied twice for two decades.
Base tier is sf0.01, not sf0.1: the fact tables are 100-600k rows at
sf0.1 and the growth RATIO, not the absolute scale, is the signal —
starting lower keeps the x100 tier (1M events / 6M lineitem / 1.5M
orders / 500k documents) benchable in minutes while still separating
O(n) from O(n^1.5) across two decades.

Run on an idle box: `python tools/scale_two_decades_facts.py`.
Timing is min-of-3 per (op, tier); prints a markdown table for
SCALE.md.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from scale_smoke import synthesize_10x  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

from etl_file_sync_spark.catalog import load_table  # noqa: E402
from etl_file_sync_spark.queries import REGISTRY  # noqa: E402
from etl_file_sync_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.01"

# the round-7 bench top-10's machinery + the behavior-sequence face
OPS = [
    # rankstats-backed statistics
    "stat_spearman_rank_corr",     # lineitem grain
    "stat_winsorized_mean",        # orders grain
    "stat_dunn_posthoc",
    "stat_brown_forsythe",
    "stat_propensity_stratified_att",  # events grain
    # survival / layout / segmentation
    "stat_nelson_aalen",
    "stat_kaplan_meier",
    "agg_rfm_segments",
    "layout_zorder_buckets",
    "eval_conformal_interval",
    # documents-grain heavy dedup not in the sibling table
    "dedup_fuzzy_blocked",
    # behavior-sequence face under the entity machinery
    "funnel_user_conversion",
    "behavior_markov_absorption",
    "behavior_streak_islands",
    "sample_user_event_cap",
]


def synthesize_facts_10x(spark, src_dir: str, out_dir: str, factor: int = 10) -> None:
    """documents/embeddings/orders via synthesize_10x, then replace the
    flat-copied events/lineitem with FK-consistent replicas."""
    synthesize_10x(spark, src_dir, out_dir, factor=factor)
    reps = spark.range(factor).withColumnRenamed("id", "rep")

    ev = load_table(spark, src_dir, "events")
    (
        ev.crossJoin(F.broadcast(reps))
        .select(
            (F.col("event_id") * factor + F.col("rep")).alias("event_id"),
            "ts",
            (F.col("user_id") * factor + F.col("rep")).alias("user_id"),
            "event_type",
            # shift values by rep-scaled cents so distinct-value rank
            # frames genuinely grow with the tier
            (F.col("value") + F.col("rep") * 0.01).alias("value"),
            "props",
        )
        .repartitionByRange(32, "user_id")
        .sortWithinPartitions("user_id", "ts")
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "events.parquet"))
    )

    li = load_table(spark, src_dir, "lineitem")
    (
        li.crossJoin(F.broadcast(reps))
        .select(
            # tracks synthesize_10x's o_orderkey*factor+rep, so the
            # orders <-> lineitem FK survives both decades
            (F.col("l_orderkey") * factor + F.col("rep")).alias("l_orderkey"),
            "l_partkey",
            "l_suppkey",
            "l_linenumber",
            "l_quantity",
            (F.col("l_extendedprice") + F.col("rep") * 0.01).alias("l_extendedprice"),
            "l_discount",
            "l_tax",
            "l_returnflag",
            "l_linestatus",
            "l_shipdate",
        )
        .repartitionByRange(32, "l_orderkey")
        .sortWithinPartitions("l_orderkey")
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "lineitem.parquet"))
    )


def bench(spark, sf_dir: str) -> dict[str, tuple[float, int]]:
    out: dict[str, tuple[float, int]] = {}
    for name in OPS:
        spark.catalog.clearCache()
        best, rows = float("inf"), 0
        for _ in range(3):
            t0 = time.perf_counter()
            rows = REGISTRY[name].build(spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        out[name] = (best, rows)
    return out


def main() -> None:
    spark = get_spark(cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    d10 = tempfile.mkdtemp(prefix="facts_x10_")
    d100 = tempfile.mkdtemp(prefix="facts_x100_")
    try:
        synthesize_facts_10x(spark, SRC, d10)
        synthesize_facts_10x(spark, d10, d100)  # second decade
        tiers = {
            "sf0.01": bench(spark, SRC),
            "x10": bench(spark, d10),
            "x100": bench(spark, d100),
        }
    finally:
        shutil.rmtree(d10, ignore_errors=True)
        shutil.rmtree(d100, ignore_errors=True)

    print("| operator | sf0.01 | x10 | x100 | decade1 | decade2 |")
    print("|---|---|---|---|---|---|")
    for name in OPS:
        cells = []
        for t in ("sf0.01", "x10", "x100"):
            sec, rows = tiers[t][name]
            cells.append(f"{round(sec, 2)}s / {rows}r")
        g1 = tiers["x10"][name][0] / max(tiers["sf0.01"][name][0], 1e-9)
        g2 = tiers["x100"][name][0] / max(tiers["x10"][name][0], 1e-9)
        print(
            f"| {name} | " + " | ".join(cells)
            + f" | {round(g1, 1)}x | {round(g2, 1)}x |"
        )


if __name__ == "__main__":
    main()

"""Layout lever demo for the ANN family (round-8 verdict #6, guide §6).

operators/pq.py and operators/similarity.py promise that at 100 TB the
corpus is WRITTEN partitioned by centroid_id so IVF probes prune at
scan time. This micro-bench turns that docstring into plan + timing
evidence: it materializes a deterministic synthetic corpus, runs the
real ivf_assign over it, writes the assigned corpus twice — flat
parquet vs partitioned by centroid_id — and runs the probed-cells
equi-join (the ivf_topk/ivfpq_topk candidate scan shape) against both
copies. The partitioned copy must show a partition filter in the scan
(static IN-list and runtime dynamicpruning for the broadcast-join
spelling) and read a nprobe/k fraction of the bytes.

The bench path is UNCHANGED: this writes its copies under a temp dir,
reads nothing from /root/testdata layouts, and is a tools/ experiment
only (the no-precomputation rule).

Usage: python tools/layout_bench.py [--rows 400000] [--cents 128]
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=400_000)
    ap.add_argument("--dim", type=int, default=16)
    ap.add_argument("--cents", type=int, default=128)
    ap.add_argument("--nprobe-cells", type=int, default=15)
    ap.add_argument("--runs", type=int, default=4)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from bench import force
    from etl_file_sync_spark.localrel import local_rows_df
    from etl_file_sync_spark.operators.similarity import ivf_assign, make_centroids
    from etl_file_sync_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("layout-bench", cpus=cpus)
    force(spark.range(1000).repartition(cpus).mapInPandas(lambda it: it, "id long"))

    # deterministic synthetic corpus: id-derived vectors, no RNG
    dim = args.dim
    vec = F.expr(
        f"transform(sequence(0, {dim - 1}),"
        " j -> cos(CAST(id AS DOUBLE) * (j + 1) / 97.0)"
        " + 0.01 * CAST(j AS DOUBLE))"
    )
    corpus = spark.range(args.rows).select(
        F.col("id").alias("vec_id"), vec.alias("embedding")
    )
    every = max(1, args.rows // args.cents)
    cents = make_centroids(corpus, every=every)
    assigned = ivf_assign(corpus, cents)  # (vec_id, v, centroid_id)

    root = tempfile.mkdtemp(prefix="layout_bench_")
    flat_dir, part_dir = os.path.join(root, "flat"), os.path.join(root, "part")
    t0 = time.perf_counter()
    assigned.write.mode("overwrite").parquet(flat_dir)
    t_flat_write = time.perf_counter() - t0
    t0 = time.perf_counter()
    # REBALANCE-style single write; at real scale add a repartition by
    # centroid_id (or Iceberg write.distribution-mode=hash) so each cell
    # lands in few, large files (guide §6)
    assigned.repartition("centroid_id").write.mode("overwrite").partitionBy(
        "centroid_id"
    ).parquet(part_dir)
    t_part_write = time.perf_counter() - t0
    print(f"write: flat={t_flat_write:.2f}s partitioned={t_part_write:.2f}s")

    # probed cells: the ivfpq probe frame shape (query_id x centroid_id)
    cells = sorted({(7 * i) % args.cents for i in range(args.nprobe_cells)})
    probes = local_rows_df(
        spark,
        [(i, int(c)) for i, c in enumerate(cells)],
        "query_id long, centroid_id long",
    )

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    plan_dir = os.path.join(repo, "plans", "r09")
    os.makedirs(plan_dir, exist_ok=True)

    def candidate_scan(src_dir: str, static: bool):
        corpus_r = spark.read.parquet(src_dir)
        if static:
            # the nprobe cells are known after the centroid collect —
            # the static spelling a probing scan can always use
            corpus_r = corpus_r.where(F.col("centroid_id").isin([int(c) for c in cells]))
        # the ivf_topk candidate join; the aggregate touches the vector
        # payload so the scan must actually read it (as the exact-verify
        # cosine does) — otherwise column pruning hides the bytes delta.
        # probes carries a selective predicate so runtime DPP is eligible
        # on the dynamic arm.
        j = corpus_r.join(F.broadcast(probes.where(F.col("query_id") >= 0)), "centroid_id")
        return j.groupBy("query_id").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.element_at("v", 1)).alias("s"),
        )

    results = {}
    for tag, src, static in [
        ("flat", flat_dir, False),
        ("flat_static", flat_dir, True),
        ("partitioned", part_dir, False),
        ("partitioned_static", part_dir, True),
    ]:
        df = candidate_scan(src, static)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        with open(os.path.join(plan_dir, f"layout_demo_{tag}.txt"), "w") as fh:
            fh.write(plan)
        pruned = "dynamicpruning" in plan
        walls = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            force(df)
            walls.append(round(time.perf_counter() - t0, 3))
        results[tag] = walls
        print(f"{tag}: walls={walls} min={min(walls)} dpp_or_pf={pruned}")
        for line in plan.splitlines():
            if "PartitionFilters" in line or "ReadSchema" in line:
                print("   ", line.strip()[:160])

    speedup = min(results["flat"]) / min(results["partitioned"])
    speedup_s = min(results["flat_static"]) / min(results["partitioned_static"])
    print(f"scan speedup partitioned vs flat: join {speedup:.2f}x, "
          f"static IN {speedup_s:.2f}x (cells {len(cells)}/{args.cents})")
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()

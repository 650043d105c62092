"""Plan/job-count probe for headline queries.

For each named query: capture `.explain("formatted")` to
plans/<tag>/<query>_<suffix>.txt, then execute it via the noop sink
inside a dedicated job group and report wall-clock, the number of Spark
JOBS the query launched (driver-side actions — collect/approxQuantile/
first — each add one; the scheduler's view via StatusTracker), and the
Exchange / BatchEvalPython / ArrowEvalPython counts in the captured
plan. Job count and plan shape are deterministic signals that survive
this box's ~2x wall-clock noise — they are what §1/§2 of the
optimization guide say to look at before touching anything.

Usage:
    python tools/plan_probe.py QUERY [QUERY...] [--suffix before] [--tag r08]
    python tools/plan_probe.py --top N [--suffix before]   # N slowest from BENCH_DETAIL
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--top", type=int, default=0)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--tag", default="r08")
    ap.add_argument("--detail", default="BENCH_DETAIL_r08_baseline.json")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    names = list(args.queries)
    if args.top:
        with open(os.path.join(repo, args.detail)) as fh:
            detail = json.load(fh)["queries"]
        ranked = sorted(detail, key=lambda k: -detail[k]["min"])
        names += [n for n in ranked[: args.top] if n not in names]

    from bench import _extras, force
    from etl_file_sync_spark.queries import REGISTRY
    from etl_file_sync_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("plan-probe", cpus=cpus)
    sc = spark.sparkContext
    force(REGISTRY["q06_forecast_revenue"].build(spark, args.sf))
    force(spark.range(1000).repartition(cpus).mapInPandas(lambda it: it, "id long"))

    plan_dir = os.path.join(repo, "plans", args.tag)
    os.makedirs(plan_dir, exist_ok=True)
    extras = _extras()
    tracker = sc.statusTracker()

    for name in names:
        build = extras[name] if name in extras else REGISTRY[name].build
        spark.catalog.clearCache()
        # --- capture the plan (note: builders with driver-side actions
        # run jobs during build; the plan is the FINAL dataframe's) ---
        df = build(spark, args.sf)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        with open(os.path.join(plan_dir, f"{name}_{args.suffix}.txt"), "w") as fh:
            fh.write(plan)
        n_ex = len(re.findall(r"\bExchange\b", plan))
        n_bev = len(re.findall(r"BatchEvalPython", plan))
        n_aev = len(re.findall(r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas", plan))
        n_smj = len(re.findall(r"SortMergeJoin", plan))
        n_bhj = len(re.findall(r"BroadcastHashJoin", plan))
        # --- timed runs inside a job group; count jobs incl. build-time ones ---
        spark.catalog.clearCache()
        walls = []
        n_jobs = 0
        for i in range(args.runs):
            group = f"probe:{name}:{i}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            force(build(spark, args.sf))
            walls.append(round(time.perf_counter() - t0, 3))
            sc.setJobGroup(None, None)
            n_jobs = len(tracker.getJobIdsForGroup(group))
        print(
            json.dumps(
                {
                    "query": name,
                    "wall": walls,
                    "jobs_per_run": n_jobs,
                    "exchanges": n_ex,
                    "smj": n_smj,
                    "bhj": n_bhj,
                    "batch_eval_py": n_bev,
                    "arrow_py": n_aev,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()

"""Two-decade growth for the pair-producing operators — 100x evidence.

The per-round SCALE.md table measures one decade (sf0.1 -> sf0.1x10).
One decade cannot separate O(n) from O(n^1.5); two can. This tool
applies the SAME planting transformation twice (synthesize_10x of the
10x tier), so each decade adds an identical per-row dup load, and
measures the candidate-generating operators at sf0.1 / 10x / 100x
(500k documents, 200k embeddings). A pair-enumerating op whose
RUNTIME ratio stays near the ROW ratio across both decades is linear
in candidates; an all-pairs defect would show a 100x step.

Output pair counts DO grow superlinearly by construction — replicating
a dup group replicates its pair closure; that is inherent to pair
enumeration, and the printed rows column keeps that denominator
honest.

Run on an idle box: `python tools/scale_two_decades.py`. Timing is
min-of-3 per (op, tier); results are printed as a markdown table to
paste into SCALE.md's two-decade section.
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

from etl_file_sync_spark.queries import REGISTRY  # noqa: E402
from etl_file_sync_spark.session import get_spark  # noqa: E402

# Candidate-generation ops: banded/blocked/bucketed paths whose scale
# story the 100x step tests. (Bounded-output ops like top-k searches
# are included as controls — their cost is scan-dominated.)
OPS = [
    "dedup_exact_groups",
    "dedup_minhash_pairs",
    "dedup_simhash_pairs",
    "dedup_embedding_srp",
    "dedup_paragraph_segments",
    "sim_topk_ivf",
    "sim_topk_pq",
    "search_bm25_topk",
    "corpus_curation_gate",
]


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
    base = "/root/testdata/sf0.1"
    d10 = tempfile.mkdtemp(prefix="sf01x10_")
    d100 = tempfile.mkdtemp(prefix="sf01x100_")
    try:
        synthesize_10x(spark, base, d10)
        synthesize_10x(spark, d10, d100)  # same transform, second decade
        tiers = {
            "sf0.1": bench(spark, base),
            "x10": bench(spark, d10),
            "x100": bench(spark, d100),
        }
    finally:
        shutil.rmtree(d10, ignore_errors=True)
        shutil.rmtree(d100, ignore_errors=True)

    print("| operator | sf0.1 | x10 | x100 | decade1 | decade2 |")
    print("|---|---|---|---|---|---|")
    for name in OPS:
        cells = []
        for t in ("sf0.1", "x10", "x100"):
            sec, rows = tiers[t][name]
            cells.append(f"{round(sec, 2)}s / {rows}r")
        g1 = tiers["x10"][name][0] / max(tiers["sf0.1"][name][0], 1e-9)
        g2 = tiers["x100"][name][0] / max(tiers["x10"][name][0], 1e-9)
        print(
            f"| {name} | " + " | ".join(cells)
            + f" | {round(g1, 1)}x | {round(g2, 1)}x |"
        )


if __name__ == "__main__":
    main()

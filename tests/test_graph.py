"""PageRank ground truth: numpy power iteration on planted graphs."""

from __future__ import annotations

import numpy as np
import pytest

from etl_file_sync_spark.operators.graph import pagerank


def _numpy_pagerank(n, edge_list, damping=0.85, iters=15):
    A = np.zeros((n, n))
    for a, b in edge_list:
        A[a, b] = A[b, a] = 1.0
    deg = A.sum(1)
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        inflow = (A / deg[:, None]).T @ r
        r = (1 - damping) / n + damping * inflow
    return r


@pytest.mark.parametrize(
    "edges", [[(0, 1), (1, 2), (2, 3)], [(0, 1), (0, 2), (0, 3), (0, 4)], [(0, 1), (1, 2), (2, 0), (3, 4)]]
)
def test_pagerank_matches_power_iteration(spark, edges):
    n = max(max(e) for e in edges) + 1
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r.node: r.rank for r in pagerank(df, iters=15).collect()}
    exp = _numpy_pagerank(n, edges)
    for node, rank in got.items():
        assert rank == pytest.approx(exp[node], abs=1e-9)
    # hub of the star graph must dominate
    if edges == [(0, 1), (0, 2), (0, 3), (0, 4)]:
        assert got[0] == max(got.values())


def test_pagerank_mass_conserved(spark):
    df = spark.createDataFrame([(0, 1), (1, 2), (5, 6)], "id_a long, id_b long")
    ranks = pagerank(df, iters=10).collect()
    assert sum(r.rank for r in ranks) == pytest.approx(1.0, abs=1e-9)


def test_triangle_counts_on_known_graph(spark):
    """K4 has 4 triangles: every vertex sits in C(3,2)=3 of them; a
    pendant vertex sits in none and must be absent."""
    from etl_file_sync_spark.operators.graph import triangle_counts

    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    edges = spark.createDataFrame(k4 + [(3, 9)], "id_a long, id_b long")
    got = {r.node: r.n_triangles for r in triangle_counts(edges).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_triangle_counts_ignore_duplicates_direction_and_self_loops(spark):
    from etl_file_sync_spark.operators.graph import triangle_counts

    edges = spark.createDataFrame(
        [(0, 1), (1, 0), (1, 2), (2, 0), (0, 2), (2, 2)], "id_a long, id_b long"
    )
    got = {r.node: r.n_triangles for r in triangle_counts(edges).collect()}
    assert got == {0: 1, 1: 1, 2: 1}

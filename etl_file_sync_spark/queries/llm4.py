"""Value-exact (md5-seeded) spellings of engine-seeded operators.

Rounds 2-3 verdicts asked for the rows-only set to shrink: the
xxhash/float spellings of hash-split sampling, hashed-embedding top-k,
and PageRank are engine-internal, so the driver could only check row
counts. Each query here re-expresses the operator with standardized
hashing (md5) or integer-scaled output so the SAME result is computable
by DuckDB and the driver's value-hash comparison applies. Per the
round-3 verdict these value-exact spellings now OWN the primary registry
names; the xxhash fast paths remain operator options (hash_fn="xxhash")
benched as *_xxh entries in bench.py.

Reference parity: the reference repo has no analytics surface
(README.md:1-60 — it is a Kafka→FTP file-sync pipeline); these queries
belong to the LLM-pipeline extension face.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_file_sync_spark.queries.registry import register, t


@register(
    "text_hashed_embedding_topk",
    """
    WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
    tk AS (SELECT doc_id, tok FROM toks WHERE len(tok) > 0),
    sw AS (
      SELECT doc_id,
             ('0x' || substr(md5(tok), 1, 8))::UBIGINT::BIGINT % 64 AS bucket,
             CASE WHEN ('0x' || substr(md5(tok || ':s'), 1, 8))::UBIGINT::BIGINT % 2 = 0
                  THEN 1 ELSE -1 END AS sg
      FROM tk),
    w AS (SELECT doc_id, bucket, CAST(sum(sg) AS BIGINT) AS w FROM sw GROUP BY 1, 2),
    ss AS (SELECT doc_id, CAST(sum(w * w) AS BIGINT) AS ss FROM w GROUP BY 1),
    dots AS (
      SELECT q.doc_id AS query_id, b.doc_id AS vec_id, CAST(sum(q.w * b.w) AS BIGINT) AS dot
      FROM w q JOIN w b ON q.bucket = b.bucket
      WHERE q.doc_id < 10 GROUP BY 1, 2),
    sims AS (
      SELECT d.query_id, d.vec_id,
             CAST(d.dot AS DOUBLE) / sqrt(CAST(sq.ss * sb.ss AS DOUBLE)) AS sim
      FROM dots d
        JOIN ss sq ON sq.doc_id = d.query_id
        JOIN ss sb ON sb.doc_id = d.vec_id),
    ranked AS (
      SELECT query_id, vec_id, sim,
             CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id)
                  AS INTEGER) AS nn_rank
      FROM sims)
    SELECT query_id, vec_id, nn_rank, round(sim, 6) AS sim
    FROM ranked WHERE nn_rank <= 3 ORDER BY query_id, nn_rank
    """,
    "text",
    "embedding",
    "hashing-trick",
)
def text_hashed_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-hashed (md5) sparse embeddings → cosine top-3 neighbors
    for 10 query docs, value-exact across engines: bucket weights are
    integer sign-sums, so dot products and squared norms are exact
    BIGINTs and `dot / sqrt(qq*bb)` is a single correctly-rounded IEEE
    op both engines compute identically. The sparse bucket-join spelling
    also shows the scale shape: the query side is tiny (broadcast), the
    base side shuffles once on (doc, bucket) then joins per-bucket —
    never a dense all-pairs GEMM."""
    docs = t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).where(F.length("tok") > 0)
    h1 = F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("bigint")
    h2 = F.conv(
        F.substring(F.md5(F.concat(F.col("tok"), F.lit(":s"))), 1, 8), 16, 10
    ).cast("bigint")
    sw = toks.select(
        "doc_id",
        F.pmod(h1, F.lit(64)).alias("bucket"),
        F.when(F.pmod(h2, F.lit(2)) == 0, F.lit(1)).otherwise(F.lit(-1)).alias("sg"),
    )
    # consumed by three branches (norms, query side, candidate side):
    # cache so the shingle-hash explode + groupBy runs once, not 3x
    w = sw.groupBy("doc_id", "bucket").agg(F.sum("sg").cast("bigint").alias("w")).cache()
    ss = w.groupBy("doc_id").agg(F.sum(F.col("w") * F.col("w")).cast("bigint").alias("ss"))
    q = w.filter(F.col("doc_id") < 10).select(
        F.col("doc_id").alias("query_id"), "bucket", F.col("w").alias("wq")
    )
    dots = (
        F.broadcast(q)
        .join(w.select(F.col("doc_id").alias("vec_id"), "bucket", F.col("w").alias("wb")), "bucket")
        .groupBy("query_id", "vec_id")
        .agg(F.sum(F.col("wq") * F.col("wb")).cast("bigint").alias("dot"))
    )
    sims = (
        dots.join(F.broadcast(ss.select(F.col("doc_id").alias("query_id"), F.col("ss").alias("qq"))), "query_id")
        .join(ss.select(F.col("doc_id").alias("vec_id"), F.col("ss").alias("bb")), "vec_id")
        .select(
            "query_id",
            "vec_id",
            (F.col("dot").cast("double") / F.sqrt((F.col("qq") * F.col("bb")).cast("double"))).alias("sim"),
        )
    )
    from pyspark.sql import Window

    rk = F.row_number().over(
        Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("vec_id"))
    )
    return (
        sims.withColumn("nn_rank", rk)
        .filter(F.col("nn_rank") <= 3)
        .select("query_id", "vec_id", "nn_rank", F.round("sim", 6).alias("sim"))
        .orderBy("query_id", "nn_rank")
    )


_NATION_EDGES_SQL = """
      SELECT CAST(n_nationkey AS BIGINT) AS src,
             CAST((n_nationkey + 1) % 25 AS BIGINT) AS dst FROM nation
      UNION ALL
      SELECT CAST(n_nationkey AS BIGINT), CAST(100 + n_regionkey AS BIGINT) FROM nation
"""


def _pagerank_oracle_sql(iters: int, edges_sql: str = _NATION_EDGES_SQL) -> str:
    """Unrolled power iteration as chained CTEs — one (inflow, rank)
    pair per iteration, so plain ANSI SQL (no aggregation inside a
    recursive CTE, which engines restrict). Damping constants are
    spelled as the same IEEE ops the Spark side computes. `edges_sql`
    is a SELECT producing the directed edge list (src, dst); it is
    symmetrized here exactly as operators/graph.py::pagerank does."""
    # MATERIALIZED: the base CTEs are referenced by every unrolled
    # iteration — without it DuckDB inlines (recomputes) the edge
    # derivation 15+ times (measured 293s vs ~3s on the near-dup graph).
    parts = [
        f"""
    WITH e0 AS MATERIALIZED (
{edges_sql}
    ),
    edges AS MATERIALIZED (SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0),
    deg AS MATERIALIZED (SELECT src, count(*) AS deg FROM edges GROUP BY src),
    nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM edges),
    nn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
    r0 AS (SELECT node, CAST(1.0 AS DOUBLE) / (SELECT n FROM nn) AS pr FROM nodes)"""
    ]
    for k in range(1, iters + 1):
        parts.append(
            f""",
    i{k} AS (
      SELECT e.dst AS node, sum(r.pr / d.deg) AS inflow
      FROM edges e JOIN r{k - 1} r ON e.src = r.node JOIN deg d ON d.src = e.src
      GROUP BY e.dst),
    r{k} AS (
      SELECT n.node,
             (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / (SELECT n FROM nn)
             + CAST(0.85 AS DOUBLE) * coalesce(i.inflow, CAST(0 AS DOUBLE)) AS pr
      FROM nodes n LEFT JOIN i{k} i ON n.node = i.node)"""
        )
    parts.append(
        f"""
    SELECT node, CAST(round(pr * 1000000) AS BIGINT) AS rank_micro
    FROM r{iters} ORDER BY node"""
    )
    return "".join(parts)


@register("graph_pagerank_exact", _pagerank_oracle_sql(10), "graph", "pagerank", "iterative")
def graph_pagerank_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (10 iterations, d=0.85) on a deterministic 30-node graph
    built from the nation table — a 25-node ring plus bipartite links to
    the 5 regions — with ranks integer-scaled to micros so the driver's
    value hash applies. Exercises the same operators/graph.py iterative
    dataflow as graph_pagerank_neardup (one node-keyed shuffle per
    round, checkpointed lineage); the fp contribution sums agree across
    engines to ~1e-15, far inside the 1e-6 rounding grain."""
    from etl_file_sync_spark.operators.graph import pagerank

    nation = t(spark, sf_dir, "nation")
    ring = nation.select(
        F.col("n_nationkey").cast("bigint").alias("id_a"),
        ((F.col("n_nationkey") + 1) % 25).cast("bigint").alias("id_b"),
    )
    reg = nation.select(
        F.col("n_nationkey").cast("bigint").alias("id_a"),
        (F.lit(100) + F.col("n_regionkey")).cast("bigint").alias("id_b"),
    )
    edges = ring.unionByName(reg)
    return (
        pagerank(edges, damping=0.85, iters=10)
        .select("node", F.round(F.col("rank") * 1000000).cast("bigint").alias("rank_micro"))
        .orderBy("node")
    )

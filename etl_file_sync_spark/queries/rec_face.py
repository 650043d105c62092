"""Recommender face: item-item cosine kNN and user-user Jaccard
neighbors over the implicit-feedback (user, item) matrix, where items
are the `k` payload of view events — the collaborative-filtering
candidate-generation primitives a feature pipeline feeds to a ranker.

Scale posture: the item vocabulary is bounded (the `k` space), so
item-item co-occurrence is bounded per user by C(items,2); for an
unbounded catalog the standard per-user item cap applies (documented
on the query). User-user similarity is generated through the inverted
item index with a minimum-overlap threshold — the join never
materializes user pairs that share nothing.

The reference (`/root/reference/`) has no analytics surface (SURVEY.md
§2.2); this face is engine-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from etl_file_sync_spark.functions.numcast import num_int_sql, num_str_int
from etl_file_sync_spark.queries.registry import register, t

_MIN_SHARED = 2  # user-user: minimum shared items to score a pair


def _user_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (user_id, item) pairs from view events."""
    return (
        t(spark, sf_dir, "events")
        .where(F.col("event_type") == "view")
        .select(
            "user_id",
            num_str_int(F.get_json_object("props", "$.k")).alias("item"),
        )
        .where(F.col("item").isNotNull())
        .distinct()
    )


# json_valid guard + the shared numeric-string grammar convention
# (functions/numcast.py): mirrors the engine's lenient JSON int
# extraction on malformed and wrong-typed props (see
# scalar_json_extract; DuckDB json functions ERROR on malformed input
# and neither engine's native cast matches the other at the edges)
_USER_ITEMS_SQL = f"""
    raw AS (
      SELECT user_id,
             CASE WHEN json_valid(props)
                  THEN json_extract_string(props, '$.k') END AS ks
      FROM events WHERE event_type = 'view'
    ),
    ui AS (
      SELECT DISTINCT user_id,
             {num_int_sql('ks')} AS item
      FROM raw
      WHERE {num_int_sql('ks')} IS NOT NULL
    )
"""


@register(
    "rec_item_cosine",
    f"""
    WITH {_USER_ITEMS_SQL},
    freq AS (SELECT item, CAST(count(*) AS BIGINT) AS n FROM ui GROUP BY item),
    cooc AS (
      SELECT a.item AS item_a, b.item AS item_b,
             CAST(count(*) AS BIGINT) AS cooc
      FROM ui a JOIN ui b ON a.user_id = b.user_id AND a.item < b.item
      GROUP BY a.item, b.item
    )
    SELECT c.item_a, c.item_b, c.cooc,
           round(c.cooc / sqrt(fa.n * 1.0 * fb.n), 6) AS cosine
    FROM cooc c
    JOIN freq fa ON c.item_a = fa.item
    JOIN freq fb ON c.item_b = fb.item
    ORDER BY cosine DESC, item_a, item_b LIMIT 20
    """,
    "recommender",
    "similarity",
    "topk",
)
def rec_item_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item cosine similarity on the binary user-item matrix
    (views of item `k`): cos(i,j) = cooc(i,j) / sqrt(n_i n_j), global
    top-20 pairs — the classic item-kNN candidate generator (distinct
    from mba_pair_lift's within-basket lift: this co-occurs across a
    user's whole history and normalizes by popularity, the signal that
    resists the big-seller bias). Co-occurrence fans out per user as
    C(items,2), bounded here by the item vocabulary; an unbounded
    catalog takes the standard most-recent-N per-user cap before the
    self-join. The frequency joins are item-keyed (vocabulary-sized,
    broadcastable); output is one TakeOrdered top-20."""
    ui = _user_items(spark, sf_dir)
    freq = ui.groupBy("item").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    a = ui.select("user_id", F.col("item").alias("item_a"))
    b = ui.select("user_id", F.col("item").alias("item_b"))
    cooc = (
        a.join(b, "user_id")
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cooc"))
    )
    fa = freq.select(F.col("item").alias("item_a"), F.col("n").alias("na"))
    fb = freq.select(F.col("item").alias("item_b"), F.col("n").alias("nb"))
    return (
        cooc.join(F.broadcast(fa), "item_a")
        .join(F.broadcast(fb), "item_b")
        .select(
            "item_a",
            "item_b",
            "cooc",
            F.round(
                F.col("cooc") / F.sqrt(F.col("na") * 1.0 * F.col("nb")), 6
            ).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), "item_a", "item_b")
        .limit(20)
    )


@register(
    "rec_user_jaccard_topk",
    f"""
    WITH {_USER_ITEMS_SQL},
    sizes AS (SELECT user_id, CAST(count(*) AS BIGINT) AS sz FROM ui
              GROUP BY user_id),
    inter AS (
      SELECT a.user_id AS target_user, b.user_id AS neighbor_user,
             CAST(count(*) AS BIGINT) AS shared_items
      FROM ui a JOIN ui b ON a.item = b.item AND a.user_id <> b.user_id
      WHERE a.user_id % 37 = 0
      GROUP BY a.user_id, b.user_id
      HAVING count(*) >= {_MIN_SHARED}
    ),
    scored AS (
      SELECT i.target_user, i.neighbor_user, i.shared_items,
             round(i.shared_items * 1.0
                   / (sa.sz + sb.sz - i.shared_items), 6) AS jaccard
      FROM inter i
      JOIN sizes sa ON i.target_user = sa.user_id
      JOIN sizes sb ON i.neighbor_user = sb.user_id
    ),
    ranked AS (
      SELECT *, CAST(row_number() OVER (PARTITION BY target_user
               ORDER BY jaccard DESC, neighbor_user) AS BIGINT) AS rk
      FROM scored
    )
    SELECT target_user, neighbor_user, shared_items, jaccard, rk
    FROM ranked WHERE rk <= 3
    ORDER BY target_user, rk
    """,
    "recommender",
    "similarity",
    "jaccard",
)
def rec_user_jaccard_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 most similar users (Jaccard over viewed-item sets) for
    each target in a deterministic 1/37 user slice — user-based CF
    neighbor selection. Candidates are generated through the inverted
    item index (the join only ever sees user pairs that actually share
    an item) and pruned by a minimum-overlap threshold before any
    similarity math; the per-target ranking window partitions by
    target user. For web-scale catalogs the hot-item rows of the
    inverted index get the standard posting-cap treatment first —
    the shape stays identical."""
    ui = _user_items(spark, sf_dir)
    sizes = ui.groupBy("user_id").agg(F.count(F.lit(1)).cast("bigint").alias("sz"))
    a = ui.where(F.col("user_id") % 37 == 0).select(
        F.col("user_id").alias("target_user"), "item"
    )
    b = ui.select(F.col("user_id").alias("neighbor_user"), "item")
    inter = (
        a.join(b, "item")
        .where(F.col("target_user") != F.col("neighbor_user"))
        .groupBy("target_user", "neighbor_user")
        .agg(F.count(F.lit(1)).cast("bigint").alias("shared_items"))
        .where(F.col("shared_items") >= _MIN_SHARED)
    )
    sa = sizes.select(F.col("user_id").alias("target_user"), F.col("sz").alias("sza"))
    sb = sizes.select(
        F.col("user_id").alias("neighbor_user"), F.col("sz").alias("szb")
    )
    scored = (
        inter.join(sa, "target_user")
        .join(sb, "neighbor_user")
        .select(
            "target_user",
            "neighbor_user",
            "shared_items",
            F.round(
                F.col("shared_items")
                * 1.0
                / (F.col("sza") + F.col("szb") - F.col("shared_items")),
                6,
            ).alias("jaccard"),
        )
    )
    w = W.partitionBy("target_user").orderBy(F.desc("jaccard"), "neighbor_user")
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rk") <= 3)
        .orderBy("target_user", "rk")
    )

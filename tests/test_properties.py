"""Property-based tests (hypothesis) — a tier the reference lacks
entirely (SURVEY.md §5: example-based only). Each property batches all
generated examples into ONE Spark job so the suite stays fast."""

from __future__ import annotations

import json

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from etl_file_sync_spark.pipeline.config import ServerConfig, servers_dataframe
from etl_file_sync_spark.pipeline.transform import split_valid_dlq

SERVERS = [ServerConfig(hostname="KNOWN", type="local")]

endpoint = st.fixed_dictionaries(
    {},
    optional={
        "hostname": st.sampled_from(["KNOWN", "known", "NOPE", ""]),
        "path": st.text(alphabet="abc/._-", min_size=0, max_size=12),
    },
)
job = st.fixed_dictionaries(
    {},
    optional={
        "job_id": st.text(alphabet="abc123-", max_size=10),
        "source": endpoint,
        "destination": endpoint,
        "extra": st.integers(),
    },
)
raw_msg = st.one_of(
    job.map(json.dumps),
    st.text(max_size=20),  # arbitrary garbage
)


def reference_model(msg: str) -> str:
    """The reference's classification semantics, restated in plain Python
    (parse → required fields → server lookup) — the model the Spark
    transform must agree with on EVERY input."""
    try:
        d = json.loads(msg)
    except ValueError:
        return "parse_error"
    if not isinstance(d, dict):
        return "missing_field"
    for side in ("source", "destination"):
        ep = d.get(side)
        # reference semantics: missing KEY is a field error (KeyError via
        # direct indexing, message.py:21-22); an empty-string hostname is
        # PRESENT and fails later at server lookup instead
        if not isinstance(ep, dict) or ep.get("hostname") is None or ep.get("path") is None:
            return "missing_field"
    for side in ("source", "destination"):
        if d[side]["hostname"].upper() != "KNOWN":
            return "unknown_server"
    return "valid"


@settings(max_examples=15, deadline=None)
@given(st.lists(raw_msg, min_size=1, max_size=30))
def test_classification_matches_reference_model(spark, msgs):
    raw = spark.createDataFrame([(m,) for m in msgs], "value string")
    res = split_valid_dlq(raw, servers_dataframe(spark, SERVERS))
    n_valid = res.valid.count()
    dlq_errors = [r.error.split(":")[0] for r in res.dlq.collect()]
    expected = [reference_model(m) for m in msgs]
    assert n_valid == sum(1 for e in expected if e == "valid")
    assert sorted(dlq_errors) == sorted(e for e in expected if e != "valid")


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.floats(0, 100, allow_nan=False)),
        min_size=1,
        max_size=40,
    ),
    st.lists(
        st.tuples(st.integers(0, 5), st.floats(0, 100, allow_nan=False), st.integers(0, 999)),
        min_size=0,
        max_size=40,
    ),
)
def test_asof_join_property_vs_pandas(spark, left_rows, right_rows):
    import pandas as pd

    from etl_file_sync_spark.operators.asof import asof_join

    left = pd.DataFrame(left_rows, columns=["k", "t"]).drop_duplicates(["k", "t"])
    right = pd.DataFrame(right_rows, columns=["k", "rt", "rv"]).drop_duplicates(["k", "rt"])
    if len(right):
        expected = pd.merge_asof(
            left.sort_values("t"), right.sort_values("rt"), by="k", left_on="t", right_on="rt"
        )
    else:
        expected = left.assign(rv=None)
    got = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right) if len(right) else spark.createDataFrame([], "k bigint, rt double, rv bigint"),
            on="k",
            left_time="t",
            right_time="rt",
            right_vals=["rv"],
        )
        .toPandas()
        .sort_values(["k", "t"])
        .reset_index(drop=True)
    )
    exp = expected.sort_values(["k", "t"]).reset_index(drop=True)
    got_rv = got["rv"].astype(object).where(pd.notna(got["rv"]), None).tolist()
    exp_rv = exp["rv"].astype(object).where(pd.notna(exp["rv"]), None).tolist()
    assert got_rv == exp_rv


@settings(max_examples=10, deadline=None)
@given(st.lists(st.text(alphabet="ab ", min_size=1, max_size=30), min_size=2, max_size=20))
def test_jaccard_pairs_bounded_and_symmetric(spark, texts):
    from etl_file_sync_spark.operators.dedup import jaccard_pairs

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    pairs = jaccard_pairs(df, threshold=0.0).collect()
    for r in pairs:
        assert r.id_a < r.id_b
        assert 0.0 <= r.jaccard <= 1.0


# --- round-4 property tests -------------------------------------------


@given(
    w=st.integers(min_value=1, max_value=23),
    h=st.integers(min_value=1, max_value=9),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=40, deadline=None)
def test_bmp_ppm_roundtrip_any_shape(w, h, seed):
    """encode→decode is the identity for every image shape, including
    widths whose 3·w is not a 4-multiple (BMP row padding)."""
    import numpy as np

    from etl_file_sync_spark.operators import multimodal as M

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert np.array_equal(M.decode_bmp(M.encode_bmp(img)), img)
    assert np.array_equal(M.decode_ppm(M.encode_ppm(img)), img)


@given(
    old_rows=st.dictionaries(
        st.integers(min_value=0, max_value=30),
        st.one_of(st.none(), st.text(alphabet="abc", max_size=3)),
        max_size=12,
    ),
    new_rows=st.dictionaries(
        st.integers(min_value=0, max_value=30),
        st.one_of(st.none(), st.text(alphabet="abc", max_size=3)),
        max_size=12,
    ),
)
@settings(max_examples=15, deadline=None)
def test_snapshot_diff_matches_dict_semantics(spark, old_rows, new_rows):
    """snapshot_diff statuses must equal plain dict-comparison truth for
    arbitrary keyed states (None values included)."""
    from etl_file_sync_spark.operators.reconcile import snapshot_diff

    old = spark.createDataFrame([(k, v) for k, v in old_rows.items()] or [(None, None)], "k int, s string").filter("k IS NOT NULL")
    new = spark.createDataFrame([(k, v) for k, v in new_rows.items()] or [(None, None)], "k int, s string").filter("k IS NOT NULL")
    got = {r.k: r.status for r in snapshot_diff(old, new, ["k"], ["s"]).collect()}
    want = {}
    for k in set(old_rows) | set(new_rows):
        if k not in old_rows:
            want[k] = "added"
        elif k not in new_rows:
            want[k] = "removed"
        elif old_rows[k] != new_rows[k]:
            want[k] = "changed"
        else:
            want[k] = "unchanged"
    assert got == want


@given(
    st.lists(
        st.text(alphabet="ab#01 é", min_size=0, max_size=20), min_size=2, max_size=2
    )
)
@settings(max_examples=300, deadline=None)
def test_jaro_winkler_properties(pair):
    """JW is symmetric, bounded in [0,1], 1.0 iff equal non-empty, and
    0.0 whenever a side is empty (the pinned DuckDB quirk) — over
    arbitrary unicode-ish strings, no Spark needed."""
    from etl_file_sync_spark.operators.dedup import jaro_winkler_py

    s1, s2 = pair
    v = jaro_winkler_py(s1, s2)
    assert 0.0 <= v <= 1.0
    assert v == jaro_winkler_py(s2, s1)
    if not s1 or not s2:
        assert v == 0.0
    elif s1 == s2:
        assert v == 1.0

"""Truth tests for the distributed PCA (operators/pca.py): the one-pass
moment plan and the sign-fixed fit/projection are compared against
direct numpy covariance/eigendecomposition over the same sf0.001
parquet — the independent definition the rows-only
embed_pca_label_profile leans on."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from etl_file_sync_spark.operators.pca import covariance_moments, pca_fit, pca_project
from etl_file_sync_spark.queries import REGISTRY
from etl_file_sync_spark.queries.registry import t
from etl_file_sync_spark.session import prep


def _X(sf_dir: str) -> np.ndarray:
    df = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    return np.array(df.embedding.tolist(), dtype=np.float64)


def test_covariance_moments_match_numpy(spark, sf_dir):
    prep(spark)
    n, m, cov = covariance_moments(t(spark, sf_dir, "embeddings"))
    X = _X(sf_dir)
    assert n == len(X)
    np.testing.assert_allclose(m, X.mean(axis=0), atol=1e-10)
    np.testing.assert_allclose(cov, np.cov(X.T, ddof=1), atol=1e-9)


def test_pca_fit_matches_numpy_eigh(spark, sf_dir):
    prep(spark)
    mean, comps, evals, total_var = pca_fit(t(spark, sf_dir, "embeddings"), k=4)
    X = _X(sf_dir)
    C = np.cov(X.T, ddof=1)
    w, v = np.linalg.eigh(C)
    order = np.argsort(w)[::-1][:4]
    np.testing.assert_allclose(evals, w[order], rtol=1e-8)
    assert total_var == pytest.approx(float(w.sum()), rel=1e-10)
    # eigenvectors match up to the documented sign convention
    for i, oi in enumerate(order):
        ref = v[:, oi]
        j = int(np.argmax(np.abs(ref)))
        if ref[j] < 0:
            ref = -ref
        np.testing.assert_allclose(comps[i], ref, atol=1e-8)
    # components are an orthonormal set
    np.testing.assert_allclose(comps @ comps.T, np.eye(4), atol=1e-10)


def test_pca_projection_and_label_profile_match_numpy(spark, sf_dir):
    rows = REGISTRY["embed_pca_label_profile"].build(spark, sf_dir).collect()
    X = _X(sf_dir)
    labels = pd.read_parquet(f"{sf_dir}/embeddings.parquet").label.to_numpy()
    C = np.cov(X.T, ddof=1)
    w, v = np.linalg.eigh(C)
    order = np.argsort(w)[::-1][:4]
    comps = v[:, order].T
    for i in range(4):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    P = (X - X.mean(axis=0)) @ comps.T
    evr = w[order] / w.sum()
    assert [r["label"] for r in rows] == sorted(set(labels.tolist()))
    for r in rows:
        mask = labels == r["label"]
        assert r["n_vecs"] == int(mask.sum())
        for i in range(3):
            assert r[f"mean_pc{i + 1}"] == pytest.approx(
                float(P[mask, i].mean()), abs=2e-4
            )
        for i in range(4):
            assert r[f"evr_{i + 1}"] == pytest.approx(float(evr[i]), abs=2e-6)
    # top-PC variance ordering is strictly decreasing for this data
    assert rows[0]["evr_1"] > rows[0]["evr_2"] > rows[0]["evr_3"] > rows[0]["evr_4"]


def test_pca_project_preserves_other_columns(spark, sf_dir):
    prep(spark)
    emb = t(spark, sf_dir, "embeddings")
    mean, comps, _e, _t = pca_fit(emb, k=2)
    out = pca_project(emb, mean, comps)
    assert set(out.columns) == {"vec_id", "label", "pcs"}
    row = out.orderBy("vec_id").first()
    assert len(row["pcs"]) == 2

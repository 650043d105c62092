"""Independent-definition truth tests for text_readability_profile and
text_char_entropy: recompute Flesch / TTR / character entropy with
plain Python (re + collections.Counter) over the same sf0.001 parquet
— catches a heuristic mistranslated identically into both engines."""

from __future__ import annotations

import math
import re
from collections import Counter

import pandas as pd
import pytest

from etl_file_sync_spark.queries import REGISTRY


def _docs(sf_dir: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/documents.parquet")


def test_readability_matches_python_recount(spark, sf_dir):
    rows = {r["source"]: r for r in REGISTRY["text_readability_profile"].build(spark, sf_dir).collect()}
    d = _docs(sf_dir)
    for src, g in d.groupby("source"):
        fleschs, total_w, total_syl = [], 0, 0
        vocab = set()
        for text in g.text:
            words = text.split(" ")
            w = len(words)
            syl = len(re.findall(r"[aeiouy]+", text.lower()))
            sents = max(1, len(re.findall(r"[.!?]+", text)))
            fleschs.append(206.835 - 1.015 * (w / sents) - 84.6 * (syl / w))
            total_w += w
            total_syl += syl
            vocab.update(words)
        got = rows[src]
        assert got["n_docs"] == len(g)
        assert got["avg_flesch"] == pytest.approx(sum(fleschs) / len(fleschs), abs=1e-3)
        assert got["total_words"] == total_w
        assert got["syllables_per_word"] == pytest.approx(total_syl / total_w, abs=1e-5)
        assert got["distinct_words"] == len(vocab)
        assert got["corpus_ttr"] == pytest.approx(len(vocab) / total_w, abs=1e-5)


def test_char_entropy_matches_counter_definition(spark, sf_dir):
    rows = {r["source"]: r for r in REGISTRY["text_char_entropy"].build(spark, sf_dir).collect()}
    d = _docs(sf_dir)

    def h(s: str) -> float:
        n = len(s)
        return math.log2(n) - sum(k * math.log2(k) for k in Counter(s).values()) / n

    for src, g in d.groupby("source"):
        ents = [h(text) for text in g.text]
        got = rows[src]
        assert got["n_docs"] == len(g)
        assert got["avg_entropy"] == pytest.approx(sum(ents) / len(ents), abs=1e-5)
        assert got["min_entropy"] == pytest.approx(min(ents), abs=1e-5)
        assert got["max_entropy"] == pytest.approx(max(ents), abs=1e-5)
        # natural-ish text must sit strictly below the uniform bound
        assert got["max_entropy"] < math.log2(64)


def test_heaps_law_fit_matches_python_ols(spark, sf_dir):
    got = REGISTRY["text_heaps_law_fit"].build(spark, sf_dir).collect()[0]
    d = _docs(sf_dir)
    xs, ys = [], []
    for _src, g in d.groupby("source"):
        n_tokens = sum(len(t.split(" ")) for t in g.text)
        v_types = len({w for t in g.text for w in t.split(" ")})
        xs.append(math.log(n_tokens))
        ys.append(math.log(v_types))
    mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
    sxy = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    sxx = sum((x - mx) ** 2 for x in xs)
    syy = sum((y - my) ** 2 for y in ys)
    beta = sxy / sxx
    assert got["n_points"] == len(xs)
    assert got["beta"] == pytest.approx(beta, abs=1e-5)
    assert got["k"] == pytest.approx(math.exp(my - beta * mx), abs=1e-3)
    assert got["r2"] == pytest.approx(sxy * sxy / (sxx * syy), abs=1e-5)
    # sublinear vocabulary growth is the whole point of Heaps' law
    assert 0 < got["beta"] < 1 or got["r2"] < 0.5

"""Sequential single-process oracles for the deterministic heuristic
queries the DuckDB gate can only rows-check (VERDICT r1 item 10, the
kg_oracle.py pattern): each distributed result must equal a plain-python
restatement over the same parquet."""

import pandas as pd
import pyarrow.parquet as pq
import pytest

from sifr_project_java_ontology_processing_ray.functions.hashing import rolling_fingerprints
from sifr_project_java_ontology_processing_ray.functions.quality import detect_lang, quality_score
from sifr_project_java_ontology_processing_ray.functions.text import count_tokens_bpeish
from sifr_project_java_ontology_processing_ray.pipelines import textops


@pytest.fixture(scope="module")
def docs(sf_small):
    return pq.read_table(sf_small + "/documents.parquet").to_pandas()


def _to_df(obj):
    return obj if isinstance(obj, pd.DataFrame) else obj.to_pandas()


def test_langid_matches_sequential(ray_session, sf_small, docs):
    got = (
        _to_df(textops.q_langid(sf_small))
        .sort_values("detected")
        .reset_index(drop=True)
    )
    det = docs["text"].map(detect_lang)
    agree = (det == docs["lang"]).astype("int64")
    want = (
        pd.DataFrame({"detected": det, "agree": agree})
        .groupby("detected", as_index=False)
        .agg(n_agree=("agree", "sum"), n_docs=("agree", "size"))
        .sort_values("detected")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["detected", "n_agree", "n_docs"]], want)


def test_quality_scores_match_sequential(ray_session, sf_small, docs):
    got = (
        _to_df(textops.q_quality_scores(sf_small))
        .sort_values("source")
        .reset_index(drop=True)
    )
    q = docs["text"].map(quality_score)
    want = (
        pd.DataFrame({"source": docs["source"], "q": q})
        .groupby("source", as_index=False)
        .agg(n_docs=("q", "size"), sum_q=("q", "sum"))
        .sort_values("source")
        .reset_index(drop=True)
    )
    want["mean_quality"] = (want["sum_q"] / want["n_docs"]).round(4)
    pd.testing.assert_frame_equal(
        got[["source", "n_docs", "mean_quality"]],
        want[["source", "n_docs", "mean_quality"]],
    )


def test_bpeish_tokens_match_sequential(ray_session, sf_small, docs):
    got = (
        _to_df(textops.q_bpeish_tokens(sf_small))
        .sort_values("lang")
        .reset_index(drop=True)
    )
    tok = docs["text"].map(count_tokens_bpeish)
    want = (
        pd.DataFrame({"lang": docs["lang"], "tok": tok})
        .groupby("lang", as_index=False)
        .agg(total_bpeish_tokens=("tok", "sum"))
        .sort_values("lang")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["lang", "total_bpeish_tokens"]], want)


def test_fingerprints_match_sequential(ray_session, sf_small, docs):
    got = _to_df(textops.q_fingerprints(sf_small))
    from collections import Counter

    counts: Counter = Counter()
    for text in docs["text"]:
        for h in set(rolling_fingerprints(text)):
            counts[h] += 1
    assert int(got["distinct_fingerprints"].iloc[0]) == len(counts)
    assert int(got["shared_fingerprints"].iloc[0]) == sum(
        1 for v in counts.values() if v > 1
    )

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


def test_chunking_reconstructs_documents(ray_session, sf_small, docs):
    """Chunk explode round-trip: stripping the 16-token overlap from every
    chunk after the first reproduces each document's token stream."""
    import ray.data as rd

    chunks = (
        rd.read_parquet(sf_small + "/documents.parquet", columns=["doc_id", "text"])
        .map_batches(textops.chunk_documents, batch_format="pyarrow")
        .to_pandas()
    )
    stride = textops.CHUNK_TOKENS - textops.CHUNK_OVERLAP
    rebuilt = {}
    for did, g in chunks.sort_values(["doc_id", "chunk_idx"]).groupby("doc_id"):
        toks = []
        for ci, ctext in zip(g["chunk_idx"], g["chunk_text"]):
            ctoks = ctext.split()
            toks.extend(ctoks if ci == 0 else ctoks[len(toks) - ci * stride:])
        rebuilt[did] = toks
    for _, row in docs.iterrows():
        expect = row["text"].split()
        if expect:
            assert rebuilt[row["doc_id"]] == expect
        else:
            assert row["doc_id"] not in rebuilt


def test_sequence_pack_matches_sequential(ray_session, sf_small, docs):
    got = textops.q_sequence_pack(sf_small)

    buckets: dict = {}
    for _, row in docs.sort_values("doc_id").iterrows():
        b = int(row["doc_id"]) % textops.PACK_BUCKETS
        buckets.setdefault(b, []).append(min(len(row["text"].split()), textops.PACK_BUDGET))
    import pandas as pd

    rows = []
    for b in sorted(buckets):
        n_packs, fill, waste = 0, 0, 0
        for t in buckets[b]:
            if n_packs == 0 or fill + t > textops.PACK_BUDGET:
                if n_packs:
                    waste += textops.PACK_BUDGET - fill
                n_packs += 1
                fill = t
            else:
                fill += t
        waste += textops.PACK_BUDGET - fill
        rows.append((b, len(buckets[b]), n_packs, waste))
    want = pd.DataFrame(rows, columns=["pack_bucket", "n_docs", "n_packs", "wasted_tokens"])
    pd.testing.assert_frame_equal(
        got.astype("int64"), want.astype("int64"), check_names=False
    )


def test_unigram_lm_score_matches_sequential(ray_session, sf_small, docs):
    """Full-vocab case AND the top-V/OOV-floor case (vocab_k=1: only the
    single most frequent token keeps its own logprob; everything else
    scores the ln(1/total) floor)."""
    import math
    from collections import Counter

    counts: Counter = Counter()
    for t in docs["text"]:
        counts.update(t.lower().split())
    total = sum(counts.values())

    for vocab_k in (10**9, 1):
        got = _to_df(textops.q_unigram_lm_score(sf_small, vocab_k=vocab_k))
        kept = dict(
            sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_k]
        )
        floor = math.log(1.0 / total)
        rows = []
        for _, row in docs.iterrows():
            toks = row["text"].lower().split()
            if not toks:
                continue
            s = sum(
                math.log(kept[w] / total) if w in kept else floor for w in toks
            ) / len(toks)
            rows.append((row["doc_id"], s))
        want = pd.DataFrame(rows, columns=["doc_id", "lm_score"])
        merged = got.merge(want, on="doc_id", suffixes=("_got", "_want"))
        assert len(merged) == len(want) == len(got)
        assert (merged["lm_score_got"] - merged["lm_score_want"]).abs().max() < 1e-9


def test_bpe_merges_match_sequential(ray_session, sf_small, docs):
    """Pure-python BPE (Sennrich get_stats/merge semantics) over the same
    corpus: word counts via Counter, overlapping pair counts, left-to-right
    non-overlapping merge application, (count desc, pair asc) selection."""
    import collections

    wc: collections.Counter = collections.Counter()
    for t in docs["text"]:
        wc.update((t or "").lower().split())
    words = [(tuple(w), n) for w, n in wc.items() if len(w) >= 2]
    want_rows = []
    for rk in range(1, textops.BPE_ROUNDS + 1):
        pair_n: collections.Counter = collections.Counter()
        for sym, n in words:
            for i in range(len(sym) - 1):
                pair_n[(sym[i], sym[i + 1])] += n
        if not pair_n:
            break
        (left, right), n_best = min(pair_n.items(), key=lambda kv: (-kv[1], kv[0]))
        want_rows.append((rk, left, right, left + right, n_best))
        nw = []
        for sym, n in words:
            res, i = [], 0
            while i < len(sym):
                if i < len(sym) - 1 and sym[i] == left and sym[i + 1] == right:
                    res.append(left + right)
                    i += 2
                else:
                    res.append(sym[i])
                    i += 1
            nw.append((tuple(res), n))
        words = nw
    want = pd.DataFrame(
        want_rows, columns=["rk", "left", "right", "merged", "n"]
    ).astype({"rk": "int64", "n": "int64"})
    got = _to_df(textops.q_bpe_merges(sf_small)).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_heavy_tokens_guarantees(ray_session, sf_small, docs):
    """Sketch guarantees vs exact counts: (a) bracketing — count_lo ≤ true
    ≤ count_hi for every reported token; (b) no false negatives — every
    token with true count ≥ φ·N + Σerr is reported; (c) on this fixture
    the per-block vocabulary fits the sketch capacity, so the output
    equals the exact φ-heavy set."""
    import collections

    true: collections.Counter = collections.Counter()
    for t in docs["text"]:
        if t:
            true.update(t.lower().split())
    n = sum(true.values())
    got = _to_df(textops.q_heavy_tokens(sf_small))
    for _, r in got.iterrows():
        assert r["count_lo"] <= true[r["token"]] <= r["count_hi"], r["token"]
    thresh = textops.HH_PHI * n
    exact_set = {t for t, c in true.items() if c >= thresh}
    # (c): capacity not exceeded on the fixture → sketch is exact
    assert set(got["token"]) == exact_set
    assert (got["count_lo"] == got["count_hi"]).all()
    got_counts = dict(zip(got["token"], got["count_lo"]))
    assert all(got_counts[t] == true[t] for t in exact_set)


def test_heavy_tokens_nonzero_error_bounds(ray_session, sf_small, docs):
    """Capacity m=3 forces per-block drops (err_p > 0): bracketing and the
    no-false-negative guarantee must hold with REAL error mass, and the
    fold must be immune to batch re-chunking (err rides the rows)."""
    import collections

    true: collections.Counter = collections.Counter()
    for t in docs["text"]:
        if t:
            true.update(t.lower().split())
    got = _to_df(textops.q_heavy_tokens(sf_small, m=3, phi=0.01))
    assert len(got) > 0
    for _, r in got.iterrows():
        assert r["count_lo"] <= true[r["token"]] <= r["count_hi"], (
            r["token"], r["count_lo"], true[r["token"]], r["count_hi"])

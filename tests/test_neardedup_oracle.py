"""Sequential oracles for the near-dedup queries: the banded LSH criterion
is deterministic, so at fixture scale (buckets far below the hot-bucket
cap) the distributed result must EQUAL a pure-python restatement —
precision and banded recall both exact."""

import itertools

import pyarrow.parquet as pq
import pytest

from sifr_project_java_ontology_processing_ray.functions.hashing import (
    MinHasher,
    hamming64,
    shingles,
    simhash,
)
from sifr_project_java_ontology_processing_ray.functions.similarity import jaccard_tokens
from sifr_project_java_ontology_processing_ray.pipelines import textops


@pytest.fixture(scope="module")
def docs(sf_small):
    t = pq.read_table(sf_small + "/documents.parquet", columns=["doc_id", "text"])
    return list(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))


def test_simhash_matches_sequential(ray_session, sf_small, docs):
    got = textops.q_simhash_dedup(sf_small)
    got_set = {(int(a), int(b), int(h)) for a, b, h in
               zip(got.get("a", []), got.get("b", []), got.get("hamming", []))}
    sims = {did: simhash(text.split()) for did, text in docs}

    # restate the engine's banding INCLUDING the 50-doc hot-bucket cap
    # (doc_id-ascending, matching bucket_pairs' sort+head) — simhash band 0
    # is a genuinely hot bucket on this corpus (common words dominate the
    # low bits), so the cap binds even at fixture scale
    buckets: dict = {}
    for did in sorted(sims):
        for b in range(4):
            buckets.setdefault((b, (sims[did] >> (16 * b)) & 0xFFFF), []).append(did)
    cand = set()
    for members in buckets.values():
        for a, b in itertools.combinations(members[:50], 2):
            cand.add((a, b))
    want = set()
    for a, b in cand:
        d = hamming64(sims[a], sims[b])
        if d <= 6:
            want.add((a, b, d))
    assert got_set == want
    assert len(want) > 0  # fixture plants near-dups


def test_minhash_matches_sequential(ray_session, sf_small, docs):
    got = textops.q_minhash_dedup(sf_small)
    got_pairs = {(int(a), int(b)) for a, b in zip(got.get("a", []), got.get("b", []))}
    mh = MinHasher(num_perm=textops.NUM_PERM)
    sigs = {did: mh.bands(mh.signature(shingles(text.split(), k=3)), textops.NUM_BANDS)
            for did, text in docs}
    texts = dict(docs)
    buckets: dict = {}
    for did in sorted(sigs):
        for b_id, b_hash in enumerate(sigs[did]):
            buckets.setdefault((b_id, b_hash), []).append(did)
    cand = set()
    for members in buckets.values():
        for a, b in itertools.combinations(members[:50], 2):  # engine's cap
            cand.add((a, b))
    want = {
        (a, b)
        for a, b in cand
        if jaccard_tokens(set(texts[a].split()), set(texts[b].split()))
        >= textops.JACCARD_THRESHOLD
    }
    assert got_pairs == want
    assert len(want) > 0


def test_neardup_clusters_match_union_find(ray_session, sf_small):
    """Distributed min-label propagation must equal a sequential
    union-find over the same verified pair set."""
    got = textops.q_neardup_clusters(sf_small)
    pairs = textops.q_minhash_dedup(sf_small)
    from sifr_project_java_ontology_processing_ray.state.unionfind import UnionFind

    uf = UnionFind()
    for a, b in zip(pairs["a"], pairs["b"]):
        uf.union(int(a), int(b))
    comp = uf.components()
    want = {}
    mins: dict = {}
    for node, root in comp.items():
        mins[root] = min(mins.get(root, node), node)
    for node, root in comp.items():
        want[int(node)] = int(mins[root])
    got_map = dict(zip(got["doc_id"], got["cluster_id"]))
    assert got_map == want
    assert len(want) > 0

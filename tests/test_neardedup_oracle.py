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


def test_minhash_verify_paths_identical(ray_session, sf_small, monkeypatch):
    """The size-gated verify must emit identical pairs on the broadcast
    path (small candidate side) and the distributed-join path (forced by
    zeroing the gate)."""
    bcast = textops.q_minhash_dedup(sf_small)
    monkeypatch.setattr(textops, "BROADCAST_MAX_BYTES", 0)
    joined = textops.q_minhash_dedup(sf_small)
    key = lambda df: sorted(zip(df["a"], df["b"], df["jaccard"]))  # noqa: E731
    assert key(bcast) == key(joined)
    assert len(bcast) > 0


def test_ngram_jaccard_matches_sequential(ray_session, sf_small, docs):
    """The EXACT dedup family member has no banding criterion — the
    distributed inverted-index count must equal the textbook all-pairs
    shingle Jaccard at every threshold crossing."""
    got = textops.q_ngram_jaccard(sf_small)
    got_set = {(int(a), int(b), float(j)) for a, b, j in
               zip(got.get("a", []), got.get("b", []), got.get("jaccard", []))}
    sh = {did: shingles(text.split(), k=3) for did, text in docs}
    want = set()
    for (a, sa), (b, sb) in itertools.combinations(sorted(sh.items()), 2):
        if not sa or not sb:
            continue
        u = len(sa | sb)
        j = len(sa & sb) / u if u else 0.0
        if j >= textops.NGRAM_JACCARD_THRESHOLD:
            want.add((a, b, j))
    assert got_set == want
    assert len(want) > 0  # fixture plants near-dups

    # empty-result path: no pair reaches an impossible threshold
    assert len(textops.q_ngram_jaccard(sf_small, threshold=1.1)) == 0


def test_cosine_neardup_exact_matches_numpy(ray_session, sf_small):
    """Brute-force cosine pair query equals a driver-side numpy all-pairs
    restatement (same rounding, same threshold-on-rounded rule)."""
    import numpy as np

    from sifr_project_java_ontology_processing_ray.pipelines import ann

    t = pq.read_table(sf_small + "/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(t["vec_id"].to_numpy(), dtype=np.int64)
    M = np.vstack([np.asarray(v.as_py(), dtype=np.float64) for v in t["embedding"]])
    n = np.linalg.norm(M, axis=1, keepdims=True)
    M = M / np.where(n == 0, 1.0, n)
    cos = np.round(M @ M.T, 3)
    want = set()
    for i in range(len(ids)):
        for j in range(len(ids)):
            if ids[i] < ids[j] and cos[i, j] >= ann.COSINE_NEARDUP_THRESHOLD:
                want.add((int(ids[i]), int(ids[j]), float(cos[i, j])))
    assert len(want) > 0  # fixture plants embedding near-dups
    got = ann.q_cosine_neardup_exact(sf_small)
    got_set = {(int(a), int(b), float(c)) for a, b, c in
               zip(got.get("a", []), got.get("b", []), got.get("cos", []))}
    assert got_set == want

    # empty-result path
    assert len(ann.q_cosine_neardup_exact(sf_small, threshold=1.01)) == 0


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


def test_decontaminate_paths_identical(ray_session, sf_small, monkeypatch):
    """Size-gated decontamination must emit identical (doc_id, count)
    rows on the val-gram broadcast path and the distributed gram-join
    path (forced by zeroing the gate)."""
    bcast = textops.q_decontaminate(sf_small)
    monkeypatch.setattr(textops, "BROADCAST_MAX_BYTES", 0)
    joined = textops.q_decontaminate(sf_small)
    key = lambda df: sorted(zip(df["doc_id"], df["n_contaminated_grams"]))  # noqa: E731
    assert key(bcast) == key(joined)
    assert len(bcast) > 0  # word-salad corpus guarantees 8-gram overlap


def test_pii_redact_counts(ray_session, sf_small):
    """Every doc gets exactly the injected PII: 1 email, 1 IP, 1 phone —
    and the redacted text contains the placeholders, never the spans."""
    from sifr_project_java_ontology_processing_ray.pipelines.textops import redact_pii_batch
    import pyarrow as pa

    df = textops.q_pii_redact(sf_small)
    assert (df["n_emails"] == 1).all()
    assert (df["n_ips"] == 1).all()
    assert (df["n_phones"] == 1).all()

    t = pa.table({"text": pa.array(
        ["mail a.b@x.io and 1.2.3.4 ring +1-234-5678", "clean"], pa.string())})
    out = redact_pii_batch(t)
    assert out["redacted"].to_pylist() == [
        "mail <EMAIL> and <IP> ring <PHONE>", "clean"]
    assert out["n_emails"].to_pylist() == [1, 0]


def test_minhash_bloom_routes_identical(ray_session, sf_small, monkeypatch):
    """VERDICT r3 #6: the size-gated candidate ROUTING must emit identical
    pairs on the task-pool route (blob rides each task, default at KB
    size) and the actor-pool BloomRoute (forced by zeroing the gate —
    also exercises the elastic pool's small-cluster min-actor clamp)."""
    task_route = textops.q_minhash_dedup(sf_small)
    monkeypatch.setattr(textops, "TASK_BLOOM_MAX_BYTES", 0)
    actor_route = textops.q_minhash_dedup(sf_small)
    key = lambda df: sorted(zip(df["a"], df["b"], df["jaccard"]))  # noqa: E731
    assert key(task_route) == key(actor_route)
    assert len(task_route) > 0

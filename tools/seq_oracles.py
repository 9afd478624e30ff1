"""Sequential pure-Python restatements of the deterministic heuristic
operators the DuckDB gate can only rows-check (MinHash-LSH, SimHash,
near-dup clustering, greedy sequence packing, composed curation) — the
kg_oracle.py pattern, factored out of the test suite so the driver sees
the comparison too (``__ray_entry__`` query ``seq_oracle_pr``).

Shares only pure kernels (functions/hashing, functions/quality,
functions/similarity) and the banding/packing CONSTANTS with the engine;
all distributed machinery (bucketed groupbys, Bloom routing, hash joins,
min-label propagation) is restated as plain loops and dicts.
"""

from __future__ import annotations

import itertools
import os
import sys

import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sifr_project_java_ontology_processing_ray.functions.hashing import (  # noqa: E402
    MinHasher,
    hamming64,
    shingles,
    simhash,
)
from sifr_project_java_ontology_processing_ray.functions.quality import (  # noqa: E402
    detect_lang,
    quality_score,
)
from sifr_project_java_ontology_processing_ray.functions.similarity import (  # noqa: E402
    jaccard_tokens,
)
from sifr_project_java_ontology_processing_ray.pipelines import textops  # noqa: E402

HOT_BUCKET_CAP = 50  # ≙ the per-bucket candidate cap at textops.py (head(50))


def _docs(sf_dir: str) -> list[tuple[int, str]]:
    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    return list(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))


def minhash_pairs_seq(docs: list[tuple[int, str]]) -> set[tuple[int, int]]:
    """Banded-criterion MinHash-LSH verified pairs, restated sequentially
    (incl. the engine's doc_id-ascending hot-bucket cap)."""
    mh = MinHasher(num_perm=textops.NUM_PERM)
    sigs = {
        did: mh.bands(mh.signature(shingles(text.split(), k=3)), textops.NUM_BANDS)
        for did, text in docs
    }
    texts = dict(docs)
    buckets: dict = {}
    for did in sorted(sigs):
        for b_id, b_hash in enumerate(sigs[did]):
            buckets.setdefault((b_id, b_hash), []).append(did)
    cand = set()
    for members in buckets.values():
        for a, b in itertools.combinations(members[:HOT_BUCKET_CAP], 2):
            cand.add((a, b))
    return {
        (a, b)
        for a, b in cand
        if jaccard_tokens(set(texts[a].split()), set(texts[b].split()))
        >= textops.JACCARD_THRESHOLD
    }


def simhash_pairs_seq(docs: list[tuple[int, str]]) -> set[tuple[int, int, int]]:
    """SimHash 4×16-bit banding + Hamming ≤ 6, restated sequentially."""
    sims = {did: simhash(text.split()) for did, text in docs}
    buckets: dict = {}
    for did in sorted(sims):
        for b in range(4):
            buckets.setdefault((b, (sims[did] >> (16 * b)) & 0xFFFF), []).append(did)
    out = set()
    for members in buckets.values():
        for a, b in itertools.combinations(members[:HOT_BUCKET_CAP], 2):
            d = hamming64(sims[a], sims[b])
            if d <= 6:
                out.add((a, b, d))
    return out


def clusters_seq(pairs: set[tuple[int, int]]) -> dict[int, int]:
    """Min-label connected components over the verified pair set via a
    sequential union-find."""
    from sifr_project_java_ontology_processing_ray.state.unionfind import UnionFind

    uf = UnionFind()
    for a, b in pairs:
        uf.union(a, b)
    comp = uf.components()
    mins: dict = {}
    for node, root in comp.items():
        mins[root] = min(mins.get(root, node), node)
    return {int(node): int(mins[root]) for node, root in comp.items()}


def sequence_pack_seq(docs: list[tuple[int, str]]) -> set[tuple[int, int, int, int]]:
    """Greedy first-fit packing per hash bucket, restated sequentially.
    Returns (pack_bucket, n_docs, n_packs, wasted_tokens) rows."""
    buckets: dict = {}
    for did, text in sorted(docs):
        b = int(did) % textops.PACK_BUCKETS
        buckets.setdefault(b, []).append(min(len(text.split()), textops.PACK_BUDGET))
    rows = set()
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
        rows.add((b, len(buckets[b]), n_packs, waste))
    return rows


def curated_keep_seq(
    docs: list[tuple[int, str]],
    keep_langs: tuple[str, ...] = ("en",),
    min_quality: float = 0.3,
    pairs: "set[tuple[int, int]] | None" = None,
) -> set[int]:
    """Composed-curation survivor set: min doc_id per exact content hash,
    minus near-dup victims (the b side of every verified pair), lang and
    quality gated — all derived sequentially. ``pairs`` reuses an
    already-computed minhash pair set."""
    import hashlib

    first_per_hash: dict[str, int] = {}
    for did, text in sorted(docs):
        h = hashlib.md5(text.encode()).hexdigest()
        if h not in first_per_hash:
            first_per_hash[h] = did
    keep = set(first_per_hash.values())
    near_drop = {b for _a, b in (pairs if pairs is not None else minhash_pairs_seq(docs))}
    return {
        did
        for did, text in docs
        if did in keep
        and did not in near_drop
        and detect_lang(text) in keep_langs
        and quality_score(text) >= min_quality
    }


def pr(got: set, want: set) -> tuple[float, float]:
    tp = len(got & want)
    p = tp / len(got) if got else 1.0
    r = tp / len(want) if want else 1.0
    return p, r

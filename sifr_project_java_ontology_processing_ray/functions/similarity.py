"""Similarity kernels.

Tverski set-overlap similarity with the reference's parameters (α=1,
β=γ=0.5, normalized — TverskiTermSimilarityRanker.java:39-41) is the
deterministic stand-in for the bi-encoder entity-link scorer; cosine kernels
back the ANN operators.
"""

from __future__ import annotations

import numpy as np

TVERSKI_ALPHA = 1.0
TVERSKI_BETA = 0.5
TVERSKI_GAMMA = 0.5


def _ngrams(s: str, n: int = 3) -> set[str]:
    s = f"  {s.lower()} "
    if len(s) < n:
        return {s}
    return {s[i : i + n] for i in range(len(s) - n + 1)}


def tverski(a: str, b: str, n: int = 3) -> float:
    """Normalized fuzzy Tverski similarity over character n-gram sets.

    score = α·|A∩B| / (α·|A∩B| + β·|A−B| + γ·|B−A|), with α=1, β=γ=0.5 —
    which makes this exactly the Dice coefficient; kept in Tverski form to
    mirror the reference's configuration."""
    A, B = _ngrams(a, n), _ngrams(b, n)
    inter = len(A & B)
    if inter == 0:
        return 0.0
    num = TVERSKI_ALPHA * inter
    return num / (num + TVERSKI_BETA * len(A - B) + TVERSKI_GAMMA * len(B - A))


def tverski_best(surface: str, terms: list[str]) -> tuple[int, float]:
    """Index + score of the best-scoring term (top-1, K1 ≙
    TverskiTermSimilarityRanker.java:70). Ties break to the lexicographically
    smallest term for determinism (TreeSet precedent, K4)."""
    best_i, best = -1, -1.0
    for i, t in enumerate(terms):
        s = tverski(surface, t)
        if s > best or (s == best and best_i >= 0 and t < terms[best_i]):
            best_i, best = i, s
    return best_i, best


def jaccard_tokens(a: set[str], b: set[str]) -> float:
    if not a and not b:
        return 1.0
    u = len(a | b)
    return len(a & b) / u if u else 0.0


def cosine_topk(
    query: np.ndarray, matrix: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Brute-force cosine top-k of ``query`` (d,) against ``matrix`` (n, d).

    Returns (indices, scores) sorted by score desc, index asc on ties.
    float64 throughout for cross-engine reproducibility."""
    q = query.astype(np.float64)
    m = matrix.astype(np.float64)
    qn = np.linalg.norm(q)
    mn = np.linalg.norm(m, axis=1)
    denom = np.where(mn * qn == 0, 1.0, mn * qn)
    scores = (m @ q) / denom
    k = min(k, len(scores))
    # stable top-k: sort by (-score, index)
    order = np.lexsort((np.arange(len(scores)), -scores))[:k]
    return order, scores[order]

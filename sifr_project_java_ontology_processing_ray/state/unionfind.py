"""Union-find for URI canonicalization.

Distributed usage (north rule): per-salt-group *local* edge dedup happens
inside the shuffle (salted groupby on surface form kills hot-key skew); the
deduped edge set is dimension-sized (≤ |surface forms| × |senses|), so the
final merge runs in one place. Canonical representative = lexicographically
smallest member (deterministic, K4/K5 TreeSet precedent).
"""

from __future__ import annotations


class UnionFind:
    def __init__(self):
        self.parent: dict[str, str] = {}

    def find(self, x: str) -> str:
        p = self.parent.setdefault(x, x)
        if p != x:
            root = self.find(p)
            self.parent[x] = root
            return root
        return x

    def union(self, a: str, b: str) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        # deterministic: smaller string wins as root
        if rb < ra:
            ra, rb = rb, ra
        self.parent[rb] = ra

    def components(self) -> dict[str, str]:
        """member → canonical (lexicographic min of its component)."""
        # canonical root is already the component min because union() always
        # roots at the smaller string and find() path-compresses to the root
        return {x: self.find(x) for x in list(self.parent)}

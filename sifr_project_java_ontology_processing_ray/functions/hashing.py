"""Deterministic hashing kernels: stable 64-bit hashes, MinHash, SimHash,
rolling-hash fingerprints, shingling.

Python's builtin ``hash`` is salted per process, so every hash that crosses a
task boundary (partition keys, dedup keys, LSH bands) uses these explicit
kernels instead. All are seedable and process-stable.
"""

from __future__ import annotations

import hashlib

import numpy as np

_MASK64 = (1 << 64) - 1
_MERSENNE = (1 << 61) - 1


def hash64(s: str | bytes, seed: int = 0) -> int:
    """Stable 64-bit hash (blake2b with seed-derived key)."""
    if isinstance(s, str):
        s = s.encode("utf-8")
    h = hashlib.blake2b(s, digest_size=8, key=seed.to_bytes(8, "little"))
    return int.from_bytes(h.digest(), "little")


def hash64_np(values, seed: int = 0) -> np.ndarray:
    """Vector of stable 64-bit hashes for an iterable of strings."""
    return np.fromiter(
        (hash64(v, seed) for v in values), dtype=np.uint64, count=len(values)
    )


def content_hash(s: str) -> str:
    """Hex content hash used for exact dedup keys and manifests."""
    return hashlib.blake2b(s.encode("utf-8"), digest_size=16).hexdigest()


def shingles(tokens: list[str], k: int = 3) -> set[str]:
    """k-token shingles of a token list (short docs → one shingle of all)."""
    if len(tokens) <= k:
        return {" ".join(tokens)} if tokens else set()
    return {" ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)}


class MinHasher:
    """num_perm-permutation MinHash via the standard (a·x + b) mod p family,
    seeded — identical signatures across processes."""

    def __init__(self, num_perm: int = 128, seed: int = 42):
        rng = np.random.RandomState(seed)
        self.num_perm = num_perm
        self.a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)

    def signature(self, shingle_set: set[str]) -> np.ndarray:
        """(num_perm,) uint64 signature; empty set → all-max sentinel."""
        if not shingle_set:
            return np.full(self.num_perm, _MASK64, dtype=np.uint64)
        base = np.fromiter(
            (hash64(s) for s in shingle_set), dtype=np.uint64, count=len(shingle_set)
        ) % _MERSENNE
        # (n_shingles, num_perm) — fine for document-sized sets
        vals = (base[:, None] * self.a[None, :] + self.b[None, :]) % _MERSENNE
        return vals.min(axis=0)

    def bands(self, sig: np.ndarray, num_bands: int = 16) -> list[int]:
        """Hash each band of the signature → LSH bucket keys."""
        rows = self.num_perm // num_bands
        out = []
        for b in range(num_bands):
            band = sig[b * rows : (b + 1) * rows]
            out.append(hash64(band.tobytes(), seed=b))
        return out


def simhash(tokens: list[str], bits: int = 64) -> int:
    """Classic SimHash over token hashes (unweighted); bit accumulation
    vectorized (the per-bit python loop was the hot path)."""
    if not tokens:
        return 0
    hs = np.fromiter((hash64(t) for t in tokens), dtype=np.uint64, count=len(tokens))
    shifts = np.arange(bits, dtype=np.uint64)
    ones = ((hs[:, None] >> shifts[None, :]) & np.uint64(1)).sum(axis=0)
    majority = ones * 2 > len(hs)
    out = 0
    for i in np.flatnonzero(majority):
        out |= 1 << int(i)
    return out


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & _MASK64).count("1")


def rolling_fingerprints(text: str, window: int = 16, mod_bits: int = 6) -> list[int]:
    """Winnowing-style document fingerprint: Rabin-Karp rolling hashes of
    byte windows, keeping hashes ≡ 0 mod 2**mod_bits (deterministic sparse
    selection). Returns sorted distinct selected hashes.

    Short docs (< window bytes) hash ALL their bytes with the same
    polynomial, kept unconditionally — same hash family as the windows so
    the whole function is SQL-restatable (textops.SQL_FINGERPRINTS)."""
    data = text.encode("utf-8")
    if len(data) < window:
        if not data:
            return []
        h = 0
        for c in data:
            h = (h * 257 + c) % _MERSENNE
        return [h]
    B, M = 257, _MERSENNE
    power = pow(B, window - 1, M)
    h = 0
    for c in data[:window]:
        h = (h * B + c) % M
    keep_mask = (1 << mod_bits) - 1
    out = set()
    if h & keep_mask == 0:
        out.add(h)
    for i in range(window, len(data)):
        h = ((h - data[i - window] * power) * B + data[i]) % M
        if h & keep_mask == 0:
            out.add(h)
    return sorted(out)


def window_hashes(data: np.ndarray, window: int = 16) -> np.ndarray:
    """VECTORIZED Rabin-Karp: hashes of every ``window``-byte window of a
    uint8 array, h_i = Σ_k data[i+k]·257^(window-1-k) mod 2^61-1 — the
    same polynomial as ``rolling_fingerprints`` (property-tested equal),
    but as ``window`` strided numpy passes instead of a per-byte Python
    loop, so whole-batch buffers hash at memory bandwidth.

    uint64 modular arithmetic: each term byte·p (< 2^69) is computed from
    p's 32-bit halves — the high half's ·2^32 is reduced via
    2^61 ≡ 1 (mod M), so x·2^32 ≡ (x >> 29) + ((x & (2^29-1)) << 32) —
    and the accumulator is folded (s & M) + (s >> 61) each round to stay
    below 2^62. Returns values already reduced to [0, M)."""
    n = int(data.size)
    if n < window:
        return np.empty(0, np.uint64)
    M = np.uint64(_MERSENNE)
    m = n - window + 1
    s = np.zeros(m, np.uint64)
    for k in range(window):
        p = pow(257, window - 1 - k, _MERSENNE)
        b = data[k : k + m].astype(np.uint64)
        t = b * np.uint64(p & 0xFFFFFFFF)  # < 2^40
        hi = b * np.uint64(p >> 32)  # < 2^37
        t += (hi & np.uint64(0x1FFFFFFF)) << np.uint64(32)  # ·2^32 mod M
        t += hi >> np.uint64(29)
        s += (t & M) + (t >> np.uint64(61))
        s = (s & M) + (s >> np.uint64(61))
    s = (s & M) + (s >> np.uint64(61))
    return np.where(s >= M, s - M, s)


class HyperLogLog:
    """Minimal mergeable HLL (2^p registers, classic bias constant).

    Serialized per batch and merged in a small groupby — the mergeable-
    sketch pattern for distributed approximate distinct counts."""

    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add(self, value: str) -> None:
        h = hash64(value)
        idx = h >> (64 - self.p)
        rest = h << self.p & _MASK64
        # rank = leading zeros of the remaining bits + 1
        rank = 1
        probe = 1 << 63
        while rank <= 64 - self.p and not (rest & probe):
            rank += 1
            probe >>= 1
        if rank > self.registers[idx]:
            self.registers[idx] = rank

    def merge(self, other: "HyperLogLog") -> None:
        assert self.p == other.p
        np.maximum(self.registers, other.registers, out=self.registers)

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1.0 + 1.079 / m)
        est = alpha * m * m / np.sum(np.exp2(-self.registers.astype(np.float64)))
        zeros = int(np.count_nonzero(self.registers == 0))
        if est <= 2.5 * m and zeros:
            est = m * np.log(m / zeros)  # linear counting for small n
        return float(est)

    def dumps(self) -> bytes:
        return bytes([self.p]) + self.registers.tobytes()

    @classmethod
    def loads(cls, blob: bytes) -> "HyperLogLog":
        hll = cls(p=blob[0])
        hll.registers = np.frombuffer(blob[1:], dtype=np.uint8).copy()
        return hll


class BloomFilter:
    """Broadcastable Bloom filter for semi/anti joins whose key set is too
    large to ship verbatim (SCALE.md): ~10 bits/key ⇒ ~1% false positives.
    Deterministic (keyed blake2b probes); mergeable via OR."""

    def __init__(self, capacity: int, bits_per_key: int = 10, num_hashes: int = 7):
        self.m = max(64, capacity * bits_per_key)
        self.k = num_hashes
        self.bits = np.zeros((self.m + 63) // 64, dtype=np.uint64)

    def _positions(self, value: str) -> np.ndarray:
        h1 = hash64(value, seed=1)
        h2 = hash64(value, seed=2) | 1
        return (h1 + np.arange(self.k, dtype=np.uint64) * h2) % np.uint64(self.m)

    def add(self, value: str) -> None:
        for p in self._positions(value):
            self.bits[int(p) >> 6] |= np.uint64(1) << np.uint64(int(p) & 63)

    def __contains__(self, value: str) -> bool:
        for p in self._positions(value):
            if not (self.bits[int(p) >> 6] >> np.uint64(int(p) & 63)) & np.uint64(1):
                return False
        return True

    def add_many(self, values) -> None:
        """Vectorized batch insert — same probe positions as ``add``; all
        k bit-sets collapse to one ``np.bitwise_or.at`` scatter (handles
        repeated words correctly)."""
        n = len(values)
        if n == 0:
            return
        h1 = np.fromiter((hash64(v, seed=1) for v in values), dtype=np.uint64, count=n)
        h2 = np.fromiter((hash64(v, seed=2) for v in values), dtype=np.uint64, count=n)
        h2 |= np.uint64(1)
        pos = (
            h1[:, None] + np.arange(self.k, dtype=np.uint64)[None, :] * h2[:, None]
        ) % np.uint64(self.m)
        words = (pos >> np.uint64(6)).astype(np.int64).ravel()
        masks = (np.uint64(1) << (pos & np.uint64(63))).ravel()
        np.bitwise_or.at(self.bits, words, masks)

    def contains_many(self, values) -> np.ndarray:
        """Vectorized batch membership (VERDICT r4 #6): the per-value
        blake2b is irreducible for strings, but all k probe positions and
        bit tests collapse into one numpy gather — replaces the per-row
        ``in`` loop in the route stages."""
        n = len(values)
        if n == 0:
            return np.zeros(0, dtype=bool)
        h1 = np.fromiter((hash64(v, seed=1) for v in values), dtype=np.uint64, count=n)
        h2 = np.fromiter((hash64(v, seed=2) for v in values), dtype=np.uint64, count=n)
        h2 |= np.uint64(1)
        pos = (
            h1[:, None] + np.arange(self.k, dtype=np.uint64)[None, :] * h2[:, None]
        ) % np.uint64(self.m)
        words = self.bits[(pos >> np.uint64(6)).astype(np.int64)]
        hit = (words >> (pos & np.uint64(63))) & np.uint64(1)
        return hit.all(axis=1)

    def merge(self, other: "BloomFilter") -> None:
        assert self.m == other.m and self.k == other.k
        np.bitwise_or(self.bits, other.bits, out=self.bits)

    def dumps(self) -> bytes:
        import struct

        return struct.pack("<QI", self.m, self.k) + self.bits.tobytes()

    @classmethod
    def loads(cls, blob: bytes) -> "BloomFilter":
        import struct

        m, k = struct.unpack("<QI", blob[:12])
        bf = cls.__new__(cls)
        bf.m, bf.k = m, k
        bf.bits = np.frombuffer(blob[12:], dtype=np.uint64).copy()
        return bf

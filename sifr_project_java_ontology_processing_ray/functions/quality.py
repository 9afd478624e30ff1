"""Text-analysis kernels: n-gram language ID, quality scoring, stopword
ratio. All deterministic, vocabulary baked in (no model downloads)."""

from __future__ import annotations

import re

import numpy as np

# Tiny per-language profiles: characteristic high-frequency words. A doc is
# scored by hit-counts per profile, ties broken by fixed language order.
_LANG_PROFILES: dict[str, frozenset[str]] = {
    "en": frozenset(
        "the of and to in a is that it for on with as are was be this have from".split()
    ),
    "fr": frozenset(
        "le la les de des et un une est dans que pour sur avec ne pas au du".split()
    ),
    "de": frozenset(
        "der die das und ist von zu mit den im für auf nicht ein eine sich".split()
    ),
    "es": frozenset(
        "el la los las de y que en un una es por con para no se del al".split()
    ),
}
_LANG_ORDER = ("en", "fr", "de", "es")

_RE_WORD = re.compile(r"[a-zA-ZÀ-ÿ]+")
_RE_PUNCT = re.compile(r"[^\w\s]")

STOPWORDS_EN = _LANG_PROFILES["en"]


def detect_lang(text: str) -> str:
    """Heuristic n-gram/stopword language ID; returns a 2-letter code or
    ``"und"`` when no profile matches."""
    words = [w.lower() for w in _RE_WORD.findall(text)]
    if not words:
        return "und"
    best_lang, best_hits = "und", 0
    for lang in _LANG_ORDER:
        hits = sum(1 for w in words if w in _LANG_PROFILES[lang])
        if hits > best_hits:
            best_lang, best_hits = lang, hits
    return best_lang


def quality_features(text: str) -> dict[str, float]:
    """Deterministic quality features in the C4/Gopher style: length, mean
    word length, punctuation ratio, stopword ratio, alpha ratio."""
    n = len(text)
    words = text.split()
    n_words = len(words)
    alpha = sum(1 for c in text if c.isalpha())
    punct = len(_RE_PUNCT.findall(text))
    lower_words = [w.lower().strip(".,;:!?") for w in words]
    stop = sum(1 for w in lower_words if w in STOPWORDS_EN)
    return {
        "n_chars": float(n),
        "n_words": float(n_words),
        "mean_word_len": (sum(len(w) for w in words) / n_words) if n_words else 0.0,
        "punct_ratio": punct / n if n else 0.0,
        "stopword_ratio": stop / n_words if n_words else 0.0,
        "alpha_ratio": alpha / n if n else 0.0,
    }


def quality_score(text: str) -> float:
    """Scalar quality score in [0, 1]: product of soft gates on the
    features (doc long enough, words not degenerate, not punctuation soup)."""
    f = quality_features(text)
    gates = [
        min(1.0, f["n_words"] / 20.0),                 # enough words
        1.0 if 2.0 <= f["mean_word_len"] <= 12.0 else 0.5,
        max(0.0, 1.0 - 4.0 * f["punct_ratio"]),        # punctuation soup
        min(1.0, 0.25 + f["alpha_ratio"]),
    ]
    return float(np.prod(gates))

"""Deterministic text kernels: HTML→text extraction, tokenization, label
normalization.

The extractor is the trafilatura-style stage of the north rule: given the
``html`` bytes of a page it must produce byte-identical ``text`` for a given
``url`` on every run at any parallelism. It is a small, fully specified
grammar (regex-based, tolerant of malformed markup), NOT a best-effort
heuristic — determinism is the contract.

Label normalization kernels re-express the reference's string pipeline:
- strip ``^^xsd:type`` suffixes (CUIOntologyDelegateImpl.java:31-39)
- parse ``literal@lang`` (CUIOntologyDelegateImpl.java:23)
- camelCase split + French-elision repair (OWLOntologyCleaner.java:95-167)
- uppercase-ratio prefLabel selection (EHealth2017DictionaryToSkos.java:404-425)
"""

from __future__ import annotations

import html as _htmllib
import re

# --- HTML → text -----------------------------------------------------------

_RE_SCRIPT = re.compile(rb"(?is)<(script|style|noscript)\b.*?</\1\s*>")
_RE_COMMENT = re.compile(rb"(?s)<!--.*?-->")
_RE_P_BLOCK = re.compile(rb"(?is)<p\b[^>]*>(.*?)</p\s*>")
_RE_TAG = re.compile(rb"(?s)<[^>]*>")
_RE_BODY = re.compile(rb"(?is)<body\b[^>]*>(.*?)(?:</body\s*>|\Z)")
_RE_WS = re.compile(r"\s+")


def extract_text(html: bytes | None) -> str:
    """Deterministic HTML→text extraction.

    Grammar (in order):
      1. Remove ``<script>/<style>/<noscript>`` elements (with content) and
         HTML comments.
      2. If ``<p>`` blocks exist: take each block's inner text (tags stripped,
         entities unescaped, whitespace collapsed) and join the non-empty
         blocks with a single space.
      3. Else: take the ``<body>`` (or, lacking one, the whole document),
         strip tags, unescape entities, collapse whitespace.

    Total function: any bytes in, a (possibly empty) str out. Invalid UTF-8
    decodes with ``errors="replace"`` so output is still deterministic.
    """
    if html is None or len(html) == 0:
        return ""
    raw = _RE_COMMENT.sub(b"", _RE_SCRIPT.sub(b"", html))
    blocks = _RE_P_BLOCK.findall(raw)
    if blocks:
        parts = []
        for b in blocks:
            t = _clean_fragment(b)
            if t:
                parts.append(t)
        return " ".join(parts)
    m = _RE_BODY.search(raw)
    return _clean_fragment(m.group(1) if m else raw)


def _clean_fragment(frag: bytes) -> str:
    no_tags = _RE_TAG.sub(b" ", frag)
    text = no_tags.decode("utf-8", errors="replace")
    text = _htmllib.unescape(text)
    return _RE_WS.sub(" ", text).strip()


def text_to_html(text: str, title: str = "", words_per_para: int = 20) -> bytes:
    """Deterministic inverse used by the synthetic pages generator: wrap
    ``text`` into an HTML page such that ``extract_text`` recovers ``text``
    byte-identically (the per-url invariant of BASELINE.json input_hint).

    Paragraph chunking splits at single spaces only; texts containing runs of
    whitespace are emitted as one paragraph so the round-trip stays exact.
    """
    esc = _htmllib.escape(text)
    if text != _RE_WS.sub(" ", text).strip() or not text:
        # always at least one <p> block (possibly empty) so extraction never
        # falls back to body text and picks up the title/h1
        paras = [esc]
    else:
        words = esc.split(" ")
        paras = [
            " ".join(words[i : i + words_per_para])
            for i in range(0, len(words), words_per_para)
        ]
    body = "".join(f"<p>{p}</p>" for p in paras)
    page = (
        f"<html><head><title>{_htmllib.escape(title)}</title>"
        f"<style>body{{margin:0}}</style></head>"
        f"<body><h1>{_htmllib.escape(title)}</h1><div>{body}</div>"
        f"<script>var tracked = 1;</script></body></html>"
    )
    return page.encode("utf-8")


# --- tokenization ----------------------------------------------------------

_RE_TOKEN = re.compile(r"\w+", re.UNICODE)
# A BPE-ish word/punct splitter in the GPT-2 style (public pattern shape).
# RE2-compatible on purpose (no lookahead) so the DuckDB oracle can restate
# it verbatim via regexp_extract_all; vs the lookahead form, counts differ
# only on runs of ≥2 interior spaces (trailing-space attachment).
_RE_BPEISH = re.compile(r"'[a-z]+| ?\w+| ?[^\s\w]+|\s+")
BPEISH_PATTERN_SQL = r"'[a-z]+| ?\w+| ?[^\s\w]+|\s+"


def tokenize(text: str) -> list[str]:
    """Lowercased word tokens."""
    return _RE_TOKEN.findall(text.lower())


def count_tokens_ws(text: str) -> int:
    """Whitespace token count (empty string → 0)."""
    return len(text.split())


def count_tokens_bpeish(text: str) -> int:
    """Token count under a BPE-ish regex pre-tokenizer."""
    return len(_RE_BPEISH.findall(text))


# --- lang-tagged literals (M18) -------------------------------------------

# ≙ Pattern "([^\"]*)@([a-z][a-z])" at CUIOntologyDelegateImpl.java:23.
_RE_LANG_LITERAL = re.compile(r'^([^"]*)@([a-z][a-z])$')


def parse_lang_literal(value: str) -> tuple[str, str | None]:
    """``"label@fr"`` → ``("label", "fr")``; untagged → ``(value, None)``."""
    m = _RE_LANG_LITERAL.match(value)
    if m:
        return m.group(1), m.group(2)
    return value, None


# --- label repair (M17 ≙ OWLOntologyCleaner.java:95-167) -------------------

_RE_CAMEL = re.compile(r"(?<=[a-z0-9])(?=[A-Z])|(?<=[A-Z])(?=[A-Z][a-z])")
# Chained replacements ≙ OWLOntologyCleaner.java:147-149 (French elisions and
# abbreviation spacing); applied in order.
_LABEL_FIXES = (
    (re.compile(r"\bl '"), "l'"),
    (re.compile(r"\bd '"), "d'"),
    (re.compile(r"\bdlco\b"), "DLCO"),
    (re.compile(r"\bco2\b"), "CO2"),
    (re.compile(r"\b(i{1,3}|iv|v|vi{1,3}|ix|x)\b"), lambda m: m.group(0).upper()),
)


def split_camel_case(label: str) -> str:
    """``"hiddenLabelText"`` → ``"hidden Label Text"``."""
    return _RE_CAMEL.sub(" ", label)


def repair_label(hidden_label: str) -> str:
    """Synthesize a prefLabel from a camelCase hiddenLabel: split, lowercase,
    then apply the fixed elision/abbreviation replacement chain."""
    text = split_camel_case(hidden_label).lower()
    for pattern, repl in _LABEL_FIXES:
        text = pattern.sub(repl, text)
    return _RE_WS.sub(" ", text).strip()


# --- prefLabel selection (M11 ≙ EHealth2017DictionaryToSkos.java:404-425) --

MAX_UPPERCASE_RATIO = 0.25  # ≙ const at EHealth2017DictionaryToSkos.java:38


def uppercase_ratio(label: str) -> float:
    if not label:
        return 0.0
    return sum(1 for c in label if c.isupper()) / len(label)


def select_pref_label(labels: list[str]) -> str:
    """Choose the preferred label: among labels whose uppercase ratio is
    below the threshold, the SHORTEST qualifying one (the reference sorts by
    length descending onto a stack and pops — shortest wins,
    EHealth2017DictionaryToSkos.java:406-418); if none qualifies, the first
    label in input order."""
    if not labels:
        return ""
    qualifying = [l for l in labels if uppercase_ratio(l) < MAX_UPPERCASE_RATIO]
    if not qualifying:
        return labels[0]
    # Stable: shortest; ties broken lexicographically for determinism (K4).
    return min(qualifying, key=lambda l: (len(l), l))

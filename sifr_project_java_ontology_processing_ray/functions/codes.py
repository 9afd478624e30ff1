"""Code/CUI kernels — the reference's code-finder cascade and CUI mining.

≙ /root/reference/src/main/java/org/sifrproject/ontology/code/*.java and
ontology/cuis/CUIOntologyDelegateImpl.java.
"""

from __future__ import annotations

import re

# ≙ CUI pattern "C[0-9]{7}" at CUIOntologyDelegateImpl.java:132 (full match).
RE_CUI = re.compile(r"^C[0-9]{7}$")
RE_TUI = re.compile(r"^T[0-9]{3}$")

# ≙ "\^\^" strip at CUIOntologyDelegateImpl.java:24 / CompositeCodeFinder.java:10.
_RE_XSD_SUFFIX = re.compile(r"\^\^.*$")

# ≙ ICD normalize pattern "([A-Z][0-9][0-9])([0-9][0-9]?)" at
# EHealth2017DictionaryToSkos.java:36, applied at :264-271.
_RE_ICD = re.compile(r"^([A-Z][0-9][0-9])([0-9][0-9]?)$")


def clean_xsd_type(value: str) -> str:
    """Strip a trailing ``^^xsd:type`` suffix (M4)."""
    return _RE_XSD_SUFFIX.sub("", value)


def mine_cuis(alt_labels: list[str]) -> list[str]:
    """altLabel values that fully match the CUI pattern, sorted ascending
    (M6; TreeSet semantics per OntologyCUIProcessor.java:123)."""
    return sorted({clean_xsd_type(l) for l in alt_labels if RE_CUI.match(clean_xsd_type(l))})


def normalize_code(code: str) -> str:
    """``A0012`` → ``A00.12`` (M10). Codes not matching the pattern pass
    through unchanged."""
    m = _RE_ICD.match(code)
    if m:
        return f"{m.group(1)}.{m.group(2)}"
    return code


# --- UMLS language codes ---------------------------------------------------

# ≙ ontology/umls/UMLSLanguageCode.java:6-26 — the reference's exact pairs,
# including its idiosyncratic short codes (cz/jp/kr/sw/no/hr, not ISO-639).
UMLS_LANGUAGE_CODES = {
    "ENG": "en", "FRE": "fr", "CZE": "cz", "FIN": "fi", "GER": "de",
    "ITA": "it", "JPN": "jp", "POL": "pl", "POR": "pt", "RUS": "ru",
    "SPA": "es", "SWE": "sw", "SCR": "hr", "DUT": "nl", "LAV": "lv",
    "HUN": "hu", "KOR": "kr", "DAN": "da", "NOR": "no", "HEB": "he",
    "BAQ": "eu",
}
_SHORT_TO_UMLS = {v: k for k, v in UMLS_LANGUAGE_CODES.items()}


def umls_language_code(code: str | None) -> str | None:
    """Either form → UMLS 3-letter code (``fr``/``FRE`` → ``FRE``);
    unknown → None (≙ UMLSLanguageCode.getLanguageCode)."""
    if not code:
        return None
    c = code.strip()
    if c.upper() in UMLS_LANGUAGE_CODES:
        return c.upper()
    return _SHORT_TO_UMLS.get(c.lower())


def short_language_code(code: str | None) -> str | None:
    """Either form → the reference's 2-letter short code (``FRE`` → ``fr``);
    unknown → None (≙ UMLSLanguageCode.getShortCode)."""
    if not code:
        return None
    c = code.strip()
    if c.lower() in _SHORT_TO_UMLS:
        return c.lower()
    return UMLS_LANGUAGE_CODES.get(c.upper())


# --- code finders (M13-M15) ------------------------------------------------

def code_from_uri(uri: str) -> str | None:
    """URI-fragment code: text after the last ``#`` or ``/``, truncated at the
    first ``_`` (M13 ≙ URICodeFinder.java:15-28)."""
    frag = uri.rsplit("#", 1)[-1].rsplit("/", 1)[-1]
    if not frag:
        return None
    frag = frag.split("_", 1)[0]
    return frag or None


def first_sorted(values: list[str] | None) -> str | None:
    """First element of the sorted deduped set — the TreeSet-iterator
    semantics of the notation/ICD/ICPC2P finders (M14, K4)."""
    if not values:
        return None
    return sorted(set(values))[0]


def composite_code(
    notation: list[str] | None,
    icd: list[str] | None,
    icpc2p: list[str] | None,
    uri: str,
) -> str | None:
    """Coalesce(SKOS notation, ICD code, ICPC2P code, URI fragment), then
    strip any ``^^type`` suffix (M15 ≙ CompositeCodeFinder.java:23-40).

    The reference NPEs when every finder returns null; we spec that away and
    return None (documented divergence, SURVEY §7.4)."""
    for cand in (first_sorted(notation), first_sorted(icd), first_sorted(icpc2p), code_from_uri(uri)):
        if cand:
            return clean_xsd_type(cand)
    return None

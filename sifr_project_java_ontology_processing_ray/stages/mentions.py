"""Mention / raw-triple extraction stage (north rule stage 2).

Dictionary-driven longest-match mention extraction over the extracted text —
the web analog of the reference's per-class attribute extraction (M1-M6): the
alias table plays the role of the UMLS term dictionary, and each matched
span becomes a mention row to be linked.

Stateful actor: the alias index (term-token trie-ish dict) is built ONCE per
actor from a broadcast table (ST1 pattern, SURVEY §2.3).
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.text import tokenize
from ..state.broadcast import Broadcast

CONTEXT_WINDOW = 3  # tokens of context kept on each side of a mention


# trie terminal sentinel: tokens are non-empty strings, so "" never collides
_TERM = ""


def build_alias_index(terms: list[str]) -> dict:
    """{token_tuple: canonical term} + max length + a token-level TRIE.

    The trie is the scan's hot structure (the Aho-Corasick automaton minus
    failure links — unnecessary here because greedy longest-match consumes
    the matched span and restarts AFTER it, so no overlapping-pattern
    recovery is needed): a non-matching token costs ONE dict probe instead
    of max_len tuple constructions. The flat tuple index is kept for the
    independent sequential oracle (tools/kg_oracle.py) so engine and oracle
    do not share the scan data structure."""
    index: dict[tuple[str, ...], str] = {}
    trie: dict = {}
    max_len = 1
    for term in terms:
        toks = tuple(tokenize(term))
        if not toks:
            continue
        index[toks] = term
        max_len = max(max_len, len(toks))
        node = trie
        for t in toks:
            node = node.setdefault(t, {})
        node[_TERM] = term
    return {"index": index, "max_len": max_len, "trie": trie}


def trie_longest_match(trie: dict, toks: list[str], i: int) -> tuple[str, int] | None:
    """Longest dictionary term starting at position i → (term, length)."""
    node = trie
    j = i
    n = len(toks)
    last = None
    while j < n:
        node = node.get(toks[j])
        if node is None:
            break
        j += 1
        term = node.get(_TERM)
        if term is not None:
            last = (term, j - i)
    return last


def find_mentions(text: str, index: dict[tuple[str, ...], str], max_len: int):
    """Greedy longest-match scan; yields (surface, position, context)."""
    toks = tokenize(text)
    n = len(toks)
    i = 0
    out = []
    while i < n:
        matched = None
        for L in range(min(max_len, n - i), 0, -1):
            cand = tuple(toks[i : i + L])
            term = index.get(cand)
            if term is not None:
                matched = (term, L)
                break
        if matched:
            term, L = matched
            ctx = " ".join(toks[max(0, i - CONTEXT_WINDOW) : i] + toks[i + L : i + L + CONTEXT_WINDOW])
            out.append((term, i, ctx))
            i += L
        else:
            i += 1
    return out


class MentionExtractor:
    """map_batches actor: pages(url, warc_ts, text, lang) → mentions."""

    def __init__(self, alias_bc: Broadcast):
        state = build_alias_index(alias_bc.value)
        self.index = state["index"]
        self.max_len = state["max_len"]

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        tss = batch["warc_ts"].to_pylist()
        texts = batch["text"].to_pylist()
        m_id, m_url, m_ts, m_surface, m_pos, m_ctx, m_next = [], [], [], [], [], [], []
        for url, ts, text in zip(urls, tss, texts):
            found = find_mentions(text, self.index, self.max_len)
            for i, (surface, pos, ctx) in enumerate(found):
                m_id.append(f"{url}#{pos}")
                m_url.append(url)
                m_ts.append(ts)
                m_surface.append(surface)
                m_pos.append(pos)
                m_ctx.append(ctx)
                # successor pointer: page-local adjacency captured HERE,
                # where the page is atomic — downstream co-occurrence needs
                # no shuffle and no block-boundary reasoning (SURVEY §7.3)
                m_next.append(found[i + 1][0] if i + 1 < len(found) else None)
        return pa.table(
            {
                "mention_id": pa.array(m_id, pa.string()),
                "url": pa.array(m_url, pa.string()),
                "warc_ts": pa.array(m_ts, pa.timestamp("us")),
                "surface": pa.array(m_surface, pa.string()),
                "position": pa.array(m_pos, pa.int32()),
                "context": pa.array(m_ctx, pa.string()),
                "next_surface": pa.array(m_next, pa.string()),
            }
        )

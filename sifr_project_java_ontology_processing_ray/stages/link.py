"""Candidate generation + entity-link scoring (north rule stages 3-4).

Candidate cascade preserves the reference's lookup ORDER — the order is
semantics (OntologyCUIProcessor.java:141-156):
  1. own-id: the surface itself is a CUI (≙ altLabel regex mining, M6)
  2. exact alias lookup term→CUIs (≙ UMLS term join, J6)
  3. code-pattern lookup code→CUIs (≙ UMLS-by-code, J4)
Later rungs run only when earlier rungs produced nothing.

Scoring: Tverski top-1 per mention on an actor pool (≙ ST2
TverskiTermSimilarityRanker + K1 top-1), with the CUI's merged semantic
signature (≙ appendToSignature, SQLUMLSDelegate.java:225-228) scored against
the mention context as a tie-breaking secondary component.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.codes import RE_CUI
from ..functions.similarity import tverski
from ..state.broadcast import Broadcast

import re

_RE_CODEISH = re.compile(r"^[A-Z][0-9]{2}(\.[0-9]{1,2}|[0-9]{1,2})?$")

SURFACE_WEIGHT = 0.8
CONTEXT_WEIGHT = 0.2


def build_link_tables(mrconso: pa.Table, lang: str = "ENG") -> dict:
    """Driver-side build of the broadcast lookup tables from the dictionary.

    Returns term→[cui], code→[cui], cui→canonical term, cui→signature.
    Lists are sorted (TreeSet determinism, K4/K5)."""
    cuis = mrconso["cui"].to_pylist()
    lats = mrconso["lat"].to_pylist()
    strs = mrconso["str"].to_pylist()
    codes = mrconso["code"].to_pylist()
    term_to_cuis: dict[str, set[str]] = {}
    code_to_cuis: dict[str, set[str]] = {}
    cui_term: dict[str, str] = {}
    cui_sig: dict[str, list[str]] = {}
    for cui, lat, s, code in zip(cuis, lats, strs, codes):
        if lat == lang:
            term_to_cuis.setdefault(s.lower(), set()).add(cui)
            # canonical term per CUI: lexicographically smallest (K4)
            if cui not in cui_term or s < cui_term[cui]:
                cui_term[cui] = s
        if code:
            code_to_cuis.setdefault(code, set()).add(cui)
        cui_sig.setdefault(cui, []).append(s)
    return {
        "term": {k: sorted(v) for k, v in term_to_cuis.items()},
        "code": {k: sorted(v) for k, v in code_to_cuis.items()},
        "cui_term": cui_term,
        "cui_sig": {k: " ".join(sorted(set(v))) for k, v in cui_sig.items()},
    }


class CandidateGenerator:
    """map_batches actor: mentions → candidate rows (one per mention×CUI)."""

    def __init__(self, tables_bc: Broadcast):
        t = tables_bc.value
        self.term = t["term"]
        self.code = t["code"]
        self.cui_term = t["cui_term"]

    def candidates_for(self, surface: str) -> list[str]:
        s = surface.strip()
        if RE_CUI.match(s):
            return [s]  # rung 1: own-id
        hit = self.term.get(s.lower())
        if hit:
            return hit  # rung 2: exact alias
        if _RE_CODEISH.match(s):
            hit = self.code.get(s)
            if hit:
                return hit  # rung 3: code join
        return []

    def __call__(self, batch: pa.Table) -> pa.Table:
        mention_ids = batch["mention_id"].to_pylist()
        surfaces = batch["surface"].to_pylist()
        contexts = batch["context"].to_pylist()
        o_mid, o_surface, o_ctx, o_cui, o_term = [], [], [], [], []
        for mid, surface, ctx in zip(mention_ids, surfaces, contexts):
            for cui in self.candidates_for(surface):
                o_mid.append(mid)
                o_surface.append(surface)
                o_ctx.append(ctx)
                o_cui.append(cui)
                o_term.append(self.cui_term.get(cui, surface))
        return pa.table(
            {
                "mention_id": pa.array(o_mid, pa.string()),
                "surface": pa.array(o_surface, pa.string()),
                "context": pa.array(o_ctx, pa.string()),
                "cui": pa.array(o_cui, pa.string()),
                "term": pa.array(o_term, pa.string()),
            }
        )


class LinkScorer:
    """Actor-pool scorer: per-mention Tverski top-1 (K1).

    Candidates for one mention always live in one batch because the
    candidate generator emits them contiguously and blocks split on row
    boundaries between input rows — we nevertheless score per candidate and
    reduce per mention WITHIN the batch, then a groupby-max upstream is
    unnecessary: mention_ids never straddle batches only if the candidate
    stage and scorer are fused. To stay partition-safe the pipeline instead
    does: score every candidate here, then ``groupby(mention_id)`` argmax in
    a map_groups — correctness does not depend on block boundaries.
    """

    def __init__(self, tables_bc: Broadcast):
        t = tables_bc.value
        self.cui_sig = t["cui_sig"]

    def __call__(self, batch: pa.Table) -> pa.Table:
        surfaces = batch["surface"].to_pylist()
        contexts = batch["context"].to_pylist()
        cuis = batch["cui"].to_pylist()
        terms = batch["term"].to_pylist()
        scores = []
        for surface, ctx, cui, term in zip(surfaces, contexts, cuis, terms):
            s = SURFACE_WEIGHT * tverski(surface, term)
            if CONTEXT_WEIGHT:
                s += CONTEXT_WEIGHT * tverski(ctx, self.cui_sig.get(cui, term))
            scores.append(s)
        return batch.append_column("score", pa.array(scores, pa.float64()))


class CandidateScorer:
    """Fused candidate-generation + scoring + per-mention top-1.

    The per-mention argmax is per-RECORD local work, so fusing the three
    steps into one actor stage removes the ``groupby(mention_id)`` shuffle
    entirely (the dominant all-to-all at scale). The unfused stages above
    remain for unit tests and for pipelines that need the full candidate
    table. Emits one row per mention; unmatched mentions keep ``cui=None``
    (→ unmatched side output, S10)."""

    def __init__(self, tables_bc: Broadcast):
        self.gen = CandidateGenerator(tables_bc)
        t = tables_bc.value
        self.cui_term = t["cui_term"]
        self.cui_sig = t["cui_sig"]
        # ≙ the reference's Redis score memo (rscore_ keys,
        # TverskiTermSimilarityRanker.java:47-56), here actor-local:
        # surface → [(cui, term, surface_score)], (cui, ctx) → ctx_score
        self._surface_memo: dict[str, list[tuple[str, str, float]]] = {}
        self._ctx_memo: dict[tuple[str, str], float] = {}

    def _scored_candidates(self, surface: str) -> list[tuple[str, str, float]]:
        hit = self._surface_memo.get(surface)
        if hit is None:
            hit = [
                (cui, self.cui_term.get(cui, surface),
                 SURFACE_WEIGHT * tverski(surface, self.cui_term.get(cui, surface)))
                for cui in sorted(self.gen.candidates_for(surface))
            ]
            if len(self._surface_memo) > 500_000:  # bound actor memory
                self._surface_memo.clear()
            self._surface_memo[surface] = hit
        return hit

    def _ctx_score(self, cui: str, term: str, ctx: str) -> float:
        key = (cui, ctx)
        s = self._ctx_memo.get(key)
        if s is None:
            s = CONTEXT_WEIGHT * tverski(ctx, self.cui_sig.get(cui, term))
            if len(self._ctx_memo) > 500_000:
                self._ctx_memo.clear()
            self._ctx_memo[key] = s
        return s

    def __call__(self, batch: pa.Table) -> pa.Table:
        surfaces = batch["surface"].to_pylist()
        contexts = batch["context"].to_pylist()
        cuis, terms, scores = [], [], []
        for surface, ctx in zip(surfaces, contexts):
            cands = self._scored_candidates(surface)
            if not cands:
                cuis.append(None)
                terms.append(None)
                scores.append(None)
                continue
            if len(cands) == 1:
                # single candidate: context cannot change the argmax
                cui, term, s = cands[0]
                cuis.append(cui); terms.append(term)
                scores.append(s + (self._ctx_score(cui, term, ctx) if CONTEXT_WEIGHT else 0.0))
                continue
            best_cui, best_term, best = None, None, -1.0
            for cui, term, s in cands:  # CUI-sorted → ties break smallest
                total = s + (self._ctx_score(cui, term, ctx) if CONTEXT_WEIGHT else 0.0)
                if total > best:
                    best_cui, best_term, best = cui, term, total
            cuis.append(best_cui)
            terms.append(best_term)
            scores.append(best)
        out = batch.drop_columns(["context"])
        out = out.append_column("cui", pa.array(cuis, pa.string()))
        out = out.append_column("term", pa.array(terms, pa.string()))
        out = out.append_column("score", pa.array(scores, pa.float64()))
        return out


def top1_per_mention(batch: pa.Table) -> pa.Table:
    """Partial per-batch argmax by mention_id (combiner before the final
    groupby — the pre-aggregation pattern). Ties → smallest CUI."""
    import pandas as pd

    df = batch.to_pandas()
    if df.empty:
        return batch
    df = df.sort_values(["mention_id", "score", "cui"], ascending=[True, False, True])
    out = df.groupby("mention_id", as_index=False, sort=False).first()
    return pa.Table.from_pandas(
        out[batch.column_names], preserve_index=False
    ).replace_schema_metadata(None)


class MentionLinker:
    """FUSED pages → linked mentions: HTML→text extraction + dictionary
    longest-match scan + candidate cascade + top-1 scoring in ONE actor
    stage.

    Why fused: mention rows never cross an operator boundary (no 50×-row
    inter-stage transfer), and the context window — needed only to break
    ties between multiple candidates — is built lazily, so unambiguous
    surfaces (the vast majority) skip it entirely. Single-candidate scores
    are surface-only (context cannot change a 1-way argmax).

    HTML extraction is fused IN (not a separate task-pool stage): the
    linker pool reserves most of the node, so an upstream extract stage
    would be squeezed into the leftover cores and starve the actors — the
    observed 8→32-cpu scaling ceiling of round 2. Batches that arrive
    without an ``html`` column (pre-extracted pipelines, unit tests) skip
    the extraction step; pages whose extracted text is empty emit no rows.

    Emits one row per mention: (url, warc_ts, surface, position, cui, term,
    score, next_surface); cui is null for unmatched surfaces (S10).

    With ``emit_edge_partials``, each output block additionally carries its
    per-block DISTINCT (surface, cui) pairs as rows with ``position = -1``:
    the canonicalization edge combiner then runs INSIDE the pool, in
    parallel with linking, instead of as a separate post-barrier hash pass
    over the whole mention stream (a named strong-scaling cost in
    BASELINE.md — that pass was DRAM-bound on one node). Consumers filter
    real mentions with ``position >= 0``.
    """

    def __init__(
        self,
        tables_bc: Broadcast,
        emit_diagnostics: bool = True,
        emit_edge_partials: bool = False,
    ):
        from .mentions import CONTEXT_WINDOW, build_alias_index, trie_longest_match

        t = tables_bc.value
        state = build_alias_index(sorted(t["term"].keys()))
        # token-trie scan (see build_alias_index): one dict probe per
        # non-matching token instead of max_len tuple probes — the scan is
        # the dominant per-page cost (VERDICT r1 item 9)
        self.trie = state["trie"]
        self.match = trie_longest_match
        self.ctx_window = CONTEXT_WINDOW
        self.scorer = CandidateScorer(tables_bc)
        # term/score are diagnostic-only; the KG pipeline drops them in its
        # first consumer, so skipping them saves two 40M-row columns of
        # object-store traffic through the materialized linked stream
        self.emit_diagnostics = emit_diagnostics
        self.emit_edge_partials = emit_edge_partials

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.text import extract_text, tokenize

        texts = batch["text"].to_pylist()
        if "html" in batch.column_names:
            texts = [
                t if t else extract_text(h)
                for t, h in zip(texts, batch["html"].to_pylist())
            ]
        sc = self.scorer
        trie, match = self.trie, self.match
        diag = self.emit_diagnostics
        # the emission loop appends ONLY the per-mention essentials
        # (surface, position, cui [, diagnostics]); url/warc_ts repeat
        # per page and come from one vectorized arrow take afterwards,
        # and the page-local successor/predecessor pointers are plain
        # list shifts with page-boundary fixups — this halved the loop's
        # python-append volume (profiled: ~0.9M list appends per
        # 2000-page batch were ~40% of __call__ self-time)
        o_surface, o_pos, o_cui = [], [], []
        o_term, o_score = [], []
        page_rows: list[int] = []  # batch row index of each emitting page
        page_cnts: list[int] = []  # its mention count
        for row_i, text in enumerate(texts):
            if not text:
                continue
            toks = tokenize(text)
            n = len(toks)
            i = 0
            start = len(o_surface)
            while i < n:
                matched = match(trie, toks, i)
                if not matched:
                    i += 1
                    continue
                surface, L = matched
                cands = sc._scored_candidates(surface)
                if not cands:
                    cui, term, score = None, None, None
                elif len(cands) == 1:
                    cui, term, score = cands[0]
                else:
                    ctx = " ".join(
                        toks[max(0, i - self.ctx_window) : i]
                        + toks[i + L : i + L + self.ctx_window]
                    )
                    cui, term, score = None, None, -1.0
                    for c, t_, s in cands:
                        total = s + sc._ctx_score(c, t_, ctx)
                        if total > score:
                            cui, term, score = c, t_, total
                o_surface.append(surface)
                o_pos.append(i)
                o_cui.append(cui)
                if diag:
                    o_term.append(term)
                    o_score.append(score)
                i += L
            cnt = len(o_surface) - start
            if cnt:
                page_rows.append(row_i)
                page_cnts.append(cnt)
        reps = np.asarray(page_cnts, np.int64)
        take_idx = pa.array(np.repeat(np.asarray(page_rows, np.int64), reps))
        o_next = o_surface[1:] + [None] if o_surface else []
        o_prev = [None] + o_surface[:-1] if o_surface else []
        if len(reps):
            ends = np.cumsum(reps)
            for e in ends:
                o_next[e - 1] = None
            for s_ in (ends - reps):
                o_prev[s_] = None
        cols = {
            "url": pc.take(batch["url"], take_idx),
            "warc_ts": pc.take(batch["warc_ts"], take_idx),
            "surface": pa.array(o_surface, pa.string()),
            "position": pa.array(o_pos, pa.int32()),
            "cui": pa.array(o_cui, pa.string()),
        }
        if diag:
            cols["term"] = pa.array(o_term, pa.string())
            cols["score"] = pa.array(o_score, pa.float64())
        cols["next_surface"] = pa.array(o_next, pa.string())
        cols["prev_surface"] = pa.array(o_prev, pa.string())
        t = pa.table(cols)
        if not self.emit_edge_partials:
            return t
        linked = t.filter(pc.is_valid(t["cui"]))
        edges = (
            linked.select(["surface", "cui"]).group_by(["surface", "cui"]).aggregate([])
        )
        m = edges.num_rows
        if m == 0:
            return t
        ecols = {
            "url": pa.array([""] * m, pa.string()),
            "warc_ts": pa.array([None] * m, pa.timestamp("us")),
            "surface": edges["surface"],
            "position": pa.array([-1] * m, pa.int32()),
            "cui": edges["cui"],
        }
        if self.emit_diagnostics:
            ecols["term"] = pa.array([None] * m, pa.string())
            ecols["score"] = pa.array([None] * m, pa.float64())
        ecols["next_surface"] = pa.array([None] * m, pa.string())
        ecols["prev_surface"] = pa.array([None] * m, pa.string())
        return pa.concat_tables([t, pa.table(ecols)])

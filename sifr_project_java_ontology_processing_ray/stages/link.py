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
        # full-resolution memo for AMBIGUOUS mentions: (surface, ctx) →
        # (cui, term, score). A mention's outcome is a pure function of
        # that pair, and web contexts repeat heavily (boilerplate,
        # recrawls), so this collapses the per-candidate ctx-score loop
        # to one dict probe on the hot path
        self._res_memo: dict[tuple[str, str], tuple] = {}

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
        # fully vectorized scan+resolve path for max-phrase-length ≤ 2
        # dictionaries (byte-equal to the trie loop, pinned by test);
        # the python loop below stays as the general-max_len fallback
        self._vec = (
            self._build_vec_tables(state["index"])
            if state["max_len"] <= 2
            else None
        )

    def _build_vec_tables(self, index: dict) -> dict | None:
        """Dictionary-sized lookup arrays for the vectorized scan:
        token-id vocabulary, single-token surface ids, packed bigram keys,
        and the per-surface resolution of the scorer cascade (kind 0 = no
        candidate, 1 = unambiguous — cui/term/score precomputed, 2 =
        ambiguous — context path). All state is O(|dictionary|)."""
        singles: dict[str, str] = {}
        pairs: dict[tuple, str] = {}
        for toks, term in index.items():
            if len(toks) == 1:
                singles[toks[0]] = term
            else:
                pairs[toks] = term
        vocab = sorted(
            set(singles) | {tok for p in pairs for tok in p}
        )
        if len(vocab) >= (1 << 20):  # packed-bigram key space bound
            return None
        vid = {tok: i for i, tok in enumerate(vocab)}
        surfaces = sorted(set(singles.values()) | set(pairs.values()))
        sidx = {s: i for i, s in enumerate(surfaces)}
        single_sid = np.full(max(len(vocab), 1), -1, np.int64)
        for tok, term in singles.items():
            single_sid[vid[tok]] = sidx[term]
        bk = sorted(
            ((vid[a] << 20) | vid[b], sidx[term])
            for (a, b), term in pairs.items()
        )
        res_kind = np.zeros(len(surfaces), np.int8)
        res_cui = np.empty(len(surfaces), object)
        res_term = np.empty(len(surfaces), object)
        res_score = np.empty(len(surfaces), object)
        for i, s in enumerate(surfaces):
            cands = self.scorer._scored_candidates(s)
            if not cands:
                res_kind[i] = 0
                res_cui[i] = res_term[i] = res_score[i] = None
            elif len(cands) == 1:
                res_kind[i] = 1
                res_cui[i], res_term[i], res_score[i] = cands[0]
            else:
                res_kind[i] = 2
                res_cui[i] = res_term[i] = res_score[i] = None
        return {
            "vocab_arr": pa.array(vocab, pa.string()),
            "single_sid": single_sid,
            "bigram_keys": np.array([k for k, _ in bk], np.int64),
            "bigram_sid": np.array([s for _, s in bk], np.int64),
            "surface_np": np.array(surfaces, object),
            "res_kind": res_kind,
            "res_cui": res_cui,
            "res_term": res_term,
            "res_score": res_score,
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.text import extract_text, tokenize

        texts = batch["text"].to_pylist()
        if "html" in batch.column_names:
            texts = [
                t if t else extract_text(h)
                for t, h in zip(texts, batch["html"].to_pylist())
            ]
        if self._vec is not None:
            return self._with_edge_partials(self._call_vec(batch, texts))
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
        return self._with_edge_partials(pa.table(cols))

    def _call_vec(self, batch: pa.Table, texts: list) -> pa.Table:
        """Vectorized greedy longest-match scan + resolution for
        max-phrase-length ≤ 2 dictionaries. Exact semantics of the trie
        loop (byte-equal output, pinned by test):

        - pair candidates: positions i where (tok_i, tok_{i+1}) is a
          2-token term and i is not the last token of its page — a packed
          (id<<20|id) searchsorted probe.
        - greedy non-overlap (the loop's ``i += 2``): pair_take[i] =
          is_pair[i] & ~pair_take[i-1], i.e. even offsets within each
          maximal run of consecutive pair candidates — run starts are
          never preceded by a taken pair, so the run-offset parity rule
          is the closed form of the recurrence.
        - singles fire at unconsumed non-pair positions (longest wins).
        - resolution is a dictionary-sized gather; only AMBIGUOUS
          surfaces (>1 candidate — context breaks the tie) loop in
          python, reusing the scorer's (cui, ctx) memo.
        """
        from ..functions.text import tokenize

        v = self._vec
        toks_per_page = [tokenize(t) if t else [] for t in texts]
        lens = np.array([len(tk) for tk in toks_per_page], np.int64)
        n = int(lens.sum())
        W = self.ctx_window
        diag = self.emit_diagnostics
        if n == 0:
            m_idx = np.empty(0, np.int64)
            m_page = np.empty(0, np.int64)
            m_pos = np.empty(0, np.int64)
            m_sid = np.empty(0, np.int64)
            pair_take = np.empty(0, bool)
            kind = np.empty(0, np.int8)
        else:
            flat = [tok for tk in toks_per_page for tok in tk]
            ids = (
                pc.index_in(pa.array(flat, pa.string()), value_set=v["vocab_arr"])
                .fill_null(-1)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            page_of = np.repeat(np.arange(len(lens)), lens)
            starts = np.cumsum(lens) - lens
            idxs = np.arange(n)
            pos_in_page = idxs - starts[page_of]
            last_of_page = pos_in_page == (lens[page_of] - 1)
            nxt = np.r_[ids[1:], np.int64(-1)]
            both = (ids >= 0) & (nxt >= 0) & ~last_of_page
            bkeys = v["bigram_keys"]
            if len(bkeys):
                keys = (ids << 20) | np.where(nxt >= 0, nxt, 0)
                posb = np.clip(np.searchsorted(bkeys, keys), 0, len(bkeys) - 1)
                is_pair = both & (bkeys[posb] == keys)
            else:
                posb = np.zeros(n, np.int64)
                is_pair = np.zeros(n, bool)
            run_start = is_pair & ~np.r_[False, is_pair[:-1]]
            last_start = np.maximum.accumulate(np.where(run_start, idxs, -1))
            pair_take = is_pair & (((idxs - last_start) & 1) == 0)
            consumed = np.r_[False, pair_take[:-1]]
            sid_single = np.where(
                ids >= 0, v["single_sid"][np.clip(ids, 0, None)], -1
            )
            single_take = (~pair_take) & (~consumed) & (sid_single >= 0)
            take = pair_take | single_take
            m_idx = np.flatnonzero(take)
            sid = np.where(pair_take, v["bigram_sid"][posb] if len(bkeys) else 0,
                           sid_single)
            m_sid = sid[m_idx]
            m_page = page_of[m_idx]
            m_pos = pos_in_page[m_idx]
            kind = v["res_kind"][m_sid]

        m = len(m_idx)
        cui = v["res_cui"][m_sid] if m else np.empty(0, object)
        term = v["res_term"][m_sid] if m else np.empty(0, object)
        score = v["res_score"][m_sid] if m else np.empty(0, object)
        surf = v["surface_np"][m_sid] if m else np.empty(0, object)
        sc = self.scorer
        memo = sc._res_memo
        for j in np.flatnonzero(kind == 2):  # ambiguous: context tiebreak
            surface = surf[j]
            toks = toks_per_page[m_page[j]]
            ip = int(m_pos[j])
            L = 2 if pair_take[m_idx[j]] else 1
            ctx = " ".join(
                toks[max(0, ip - W) : ip] + toks[ip + L : ip + L + W]
            )
            hit = memo.get((surface, ctx))
            if hit is None:
                best_c, best_t, best_s = None, None, -1.0
                for c, t_, s in sc._scored_candidates(surface):
                    total = s + sc._ctx_score(c, t_, ctx)
                    if total > best_s:
                        best_c, best_t, best_s = c, t_, total
                hit = (best_c, best_t, best_s)
                if len(memo) > 500_000:  # bound actor memory
                    memo.clear()
                memo[(surface, ctx)] = hit
            cui[j], term[j], score[j] = hit

        counts = np.bincount(m_page, minlength=len(lens)) if m else np.zeros(
            len(lens), np.int64
        )
        emitting = np.flatnonzero(counts)
        reps = counts[emitting]
        take_idx = pa.array(np.repeat(emitting, reps))
        surf_list = surf.tolist()
        o_next = surf_list[1:] + [None] if m else []
        o_prev = [None] + surf_list[:-1] if m else []
        if len(reps):
            ends = np.cumsum(reps)
            for e in ends:
                o_next[e - 1] = None
            for s_ in (ends - reps):
                o_prev[s_] = None
        cols = {
            "url": pc.take(batch["url"], take_idx),
            "warc_ts": pc.take(batch["warc_ts"], take_idx),
            "surface": pa.array(surf_list, pa.string()),
            "position": pa.array(m_pos.astype(np.int32), pa.int32()),
            "cui": pa.array(cui.tolist(), pa.string()),
        }
        if diag:
            cols["term"] = pa.array(term.tolist(), pa.string())
            cols["score"] = pa.array(
                [float(x) if x is not None else None for x in score.tolist()],
                pa.float64(),
            )
        cols["next_surface"] = pa.array(o_next, pa.string())
        cols["prev_surface"] = pa.array(o_prev, pa.string())
        return pa.table(cols)

    def _with_edge_partials(self, t: pa.Table) -> pa.Table:
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

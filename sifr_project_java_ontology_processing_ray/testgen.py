"""Deterministic synthetic-fixture generation (FIXTURES.md F1-F8).

Everything here is seeded and pure — same inputs → byte-identical Parquet.
The ``pages`` table is derived from the driver's ``documents`` table so the
flagship pipeline runs over driver-provided data at every scale factor: the
document text IS the golden extracted text (per-url byte-identical invariant,
BASELINE.json input_hint).
"""

from __future__ import annotations

import datetime as dt
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from . import schema
from .functions.text import text_to_html

SEED = 42
_EPOCH = dt.datetime(2024, 1, 1)


# --------------------------------------------------------------------------
# F1: pages — derived deterministically from the documents table
# --------------------------------------------------------------------------

def pages_table_from_documents(documents: pa.Table, replicate: int = 1) -> pa.Table:
    """Build the Common-Crawl-style ``pages`` table from ``documents``.

    - url: ``https://{source}.example/doc/{doc_id}`` (sources repeat → hot
      hosts exercise skew handling)
    - html: deterministic wrap of ``text`` such that the extractor recovers
      it byte-identically; every 97th row is truncated (malformed-HTML path)
    - text: pre-populated for odd doc_ids and malformed rows (extractor must
      pass through), empty for even doc_ids (extractor must fill)
    - replicate>1 (bench scale): replica r rotates the word sequence by r
      (same mentions, different adjacency) under url suffix ``?r={r}``;
      every 10th replica keeps the text verbatim (exact-dup pages for the
      dedup operators). Replica 0 is always the pristine corpus.
    """
    doc_ids = documents["doc_id"].to_pylist()
    texts = documents["text"].to_pylist()
    langs = documents["lang"].to_pylist()
    sources = documents["source"].to_pylist()
    n = len(doc_ids)

    urls, tss, htmls, out_texts, out_langs = [], [], [], [], []
    for r in range(replicate):
        for did, text, src, lang in zip(doc_ids, texts, sources, langs):
            if r == 0:
                url = f"https://{src}.example/doc/{did}"
            else:
                url = f"https://{src}.example/doc/{did}?r={r}"
                if r % 10 != 3:  # rotate words; r%10==3 keeps exact dup text
                    words = text.split(" ")
                    k = r % max(1, len(words))
                    text = " ".join(words[k:] + words[:k])
            urls.append(url)
            tss.append(_EPOCH + dt.timedelta(seconds=int(did) + r * n))
            html = text_to_html(text, title=f"doc {did}")
            malformed = did % 97 == 0 and r == 0
            if malformed:
                html = html[: max(20, len(html) // 2)]
            htmls.append(html)
            out_texts.append(text if (did % 2 == 1 or malformed) else "")
            out_langs.append(lang)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(out_texts, pa.string()),
            "lang": pa.array(out_langs, pa.string()),
        },
        schema=schema.PAGES,
    )


def write_pages_for_sf(sf_dir: str, out_path: str, replicate: int = 1) -> str:
    """Materialize the pages parquet for a testdata scale dir (idempotent)."""
    if os.path.exists(out_path):
        return out_path
    docs = pq.read_table(os.path.join(sf_dir, "documents.parquet"))
    tmp = out_path + ".tmp"
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    # small row groups → parallel read: a single-row-group file makes the
    # read (and everything fused into it) serial no matter the CPU count
    pq.write_table(
        pages_table_from_documents(docs, replicate=replicate), tmp, row_group_size=4096
    )
    os.replace(tmp, out_path)
    return out_path


# --------------------------------------------------------------------------
# F2/F3: UMLS-style dictionaries over the document vocabulary
# --------------------------------------------------------------------------

# The driver's synthetic documents are word soup over this fixed vocabulary.
_VOCAB = (
    "spark group query row data slow small filter customer line the batch "
    "value merge table join sort agg part column big key a fast order scan "
    "window dup stream hash vector"
).split()

# Multi-word domain terms (exercise longest-match mention extraction).
_MULTI_TERMS = (
    "hash join", "merge join", "sort merge", "window agg", "batch stream",
    "fast scan", "table scan", "key order", "row group", "column filter",
)


def umls_tables(seed: int = SEED) -> tuple[pa.Table, pa.Table]:
    """(mrconso, mrsty): term dictionary + CUI→TUI map.

    - every single-word vocab term (minus stopword-ish 'the'/'a') and every
      multi-word term gets a CUI; 'scan' and 'stream' are ambiguous (two CUIs
      → disambiguation path, OntologyCUIProcessor.java:154-156)
    - each CUI gets an ENG row and most get a FRE variant ("<term> fr")
    - codes: ICD-10-like, some denormalized (A0012 form), some CUIs codeless
    """
    rng = np.random.RandomState(seed)
    terms = [w for w in _VOCAB if w not in ("the", "a")] + list(_MULTI_TERMS)
    rows = []  # (cui, lat, str, code)
    sty = []   # (cui, tui)
    cui_n = 1
    for i, term in enumerate(sorted(terms)):
        cui = f"C{cui_n:07d}"
        cui_n += 1
        letter = chr(ord("A") + (i % 20))
        num = rng.randint(0, 100)
        if i % 5 == 0:
            code = f"{letter}{num:02d}{rng.randint(1, 99):02d}"  # denormalized A0012 form
        elif i % 7 == 0:
            code = ""  # codeless CUI
        else:
            code = f"{letter}{num:02d}"
        rows.append((cui, "ENG", term, code))
        if i % 3 != 0:
            rows.append((cui, "FRE", term + " fr", code))
        for t in range(1 + i % 2):
            sty.append((cui, f"T{(17 + 3 * i + t) % 200:03d}"))
        if term in ("scan", "stream"):  # ambiguous second sense
            cui2 = f"C{cui_n:07d}"
            cui_n += 1
            rows.append((cui2, "ENG", term, f"Z{90 + i % 10:02d}"))
            sty.append((cui2, f"T{(101 + i) % 200:03d}"))
    mrconso = pa.table(
        {
            "cui": [r[0] for r in rows],
            "lat": [r[1] for r in rows],
            "str": [r[2] for r in rows],
            "code": [r[3] for r in rows],
        },
        schema=schema.MRCONSO,
    )
    mrsty = pa.table(
        {"cui": [s[0] for s in sty], "tui": [s[1] for s in sty]},
        schema=schema.MRSTY,
    )
    return mrconso, mrsty


# --------------------------------------------------------------------------
# F4/F5/F6: ontology-style fixtures for the enrichment cascade
# --------------------------------------------------------------------------

def ontology_fixture(seed: int = SEED) -> dict[str, pa.Table]:
    """Source triples + mappings + target triples covering every branch of
    the reference cascade (FIXTURES.md F4-F6 coverage list)."""
    S = "http://fixture.example/onto#"
    T = "http://fixture.example/target#"
    src: list[tuple[str, str, str, str | None]] = []
    tgt: list[tuple[str, str, str, str | None]] = []
    maps: list[tuple[str, str, str]] = []

    def ent(n, code):
        return f"{S}{code}_{n}"

    # e1: entity with existing CUI (skip-enrich path :164-171)
    e1 = ent(1, "A01")
    src += [
        (e1, "rdf:type", "skos:Concept", None),
        (e1, "skos:prefLabel", "hash join", "en"),
        (e1, "umls:cui", "C0000001^^xsd:string", None),  # strip-^^ path M4
    ]
    # e2: CUI hidden in altLabel (mine+purge path :195,226,351-360)
    e2 = ent(2, "B02")
    src += [
        (e2, "rdf:type", "skos:Concept", None),
        (e2, "skos:prefLabel", "merge join", "en"),
        (e2, "skos:altLabel", "C0000002", None),
        (e2, "skos:altLabel", "merge-join", "en"),
    ]
    # e3: CUIs via mapping 2-hop (J2)
    e3 = ent(3, "C03")
    t3 = f"{T}target3"
    src += [
        (e3, "rdf:type", "skos:Concept", None),
        (e3, "skos:prefLabel", "sort merge", "en"),
    ]
    maps += [(e3, "skos:exactMatch", t3)]
    tgt += [
        (t3, "rdf:type", "skos:Concept", None),
        (t3, "umls:cui", "C0000003", None),
        (t3, "umls:tui", "T042", None),
    ]
    # e4: CUI via code join (J4) — notation present
    e4 = ent(4, "D04")
    src += [
        (e4, "rdf:type", "skos:Concept", None),
        (e4, "skos:prefLabel", "window agg", "en"),
        (e4, "skos:notation", "D0412", None),  # normalizable code
    ]
    # e5: altLabel equal to prefLabel modulo case/trim (clean path M7)
    e5 = ent(5, "E05")
    src += [
        (e5, "rdf:type", "skos:Concept", None),
        (e5, "skos:prefLabel", "Table Scan", "en"),
        (e5, "skos:altLabel", " table scan ", "en"),
        (e5, "skos:altLabel", "full scan", "en"),
        (e5, "umls:cui", "C0000004", None),
    ]
    # e6: ambiguous — multiple CUIs from code (disambiguation path)
    e6 = ent(6, "F06")
    src += [
        (e6, "rdf:type", "skos:Concept", None),
        (e6, "skos:prefLabel", "scan", "en"),
        (e6, "icd:cdCode", "SCAN1", None),
    ]
    # e7: no code anywhere except URI fragment; no match at all → unmatched
    e7 = f"{S}ZZZ99_7"
    src += [
        (e7, "rdf:type", "skos:Concept", None),
        (e7, "skos:prefLabel", "mystery concept", "en"),
    ]
    # e8: TUI via mapping (J3); ICPC2P code position in coalesce
    e8 = ent(8, "H08")
    t8 = f"{T}target8"
    src += [
        (e8, "rdf:type", "skos:Concept", None),
        (e8, "skos:prefLabel", "stream", "en"),
        (e8, "icpc2p:ICPCCODE", "H81", None),
    ]
    maps += [(e8, "skos:closeMatch", t8)]
    tgt += [
        (t8, "rdf:type", "skos:Concept", None),
        (t8, "umls:cui", "C0000005", None),
        (t8, "umls:tui", "T099", None),
    ]
    # e9: TWO CUIs via the mapping 2-hop → Tverski disambiguation actually
    # discriminates (label 'vector' vs candidate terms 'vector'/'merge');
    # the kept CUI's TUIs then arrive via the UMLS cui→tui path. Terms are
    # resolved to their generated CUIs so the fixture tracks umls_tables().
    mrconso_fx, _ = umls_tables(seed)
    _term_cui = {
        (s, c) for s, c, lat in zip(
            mrconso_fx["str"].to_pylist(), mrconso_fx["cui"].to_pylist(),
            mrconso_fx["lat"].to_pylist(),
        ) if lat == "ENG"
    }

    def cui_of(term: str) -> str:
        return sorted(c for s, c in _term_cui if s == term)[0]

    e9 = ent(9, "I09")
    t9 = f"{T}target9"
    src += [
        (e9, "rdf:type", "skos:Concept", None),
        (e9, "skos:prefLabel", "vector", "en"),
    ]
    maps += [(e9, "skos:relatedMatch", t9)]
    tgt += [
        (t9, "rdf:type", "skos:Concept", None),
        (t9, "umls:cui", cui_of("vector"), None),
        (t9, "umls:cui", cui_of("merge"), None),
    ]

    def table(rows):
        return pa.table(
            {
                "subj": [r[0] for r in rows],
                "pred": [r[1] for r in rows],
                "obj": [r[2] for r in rows],
                "obj_lang": pa.array([r[3] for r in rows], pa.string()),
            },
            schema=schema.ONTO_TRIPLES,
        )

    return {
        "source_triples": table(src),
        "target_triples": table(tgt),
        "mappings": pa.table(
            {
                "source_class": [m[0] for m in maps],
                "property": [m[1] for m in maps],
                "target_class": [m[2] for m in maps],
            },
            schema=schema.MAPPINGS,
        ),
    }


def reconciler_extra_entities() -> pa.Table:
    """Extra source entities ONLY for the reconciliation query + its SQL
    oracle: their codes EXIST in mrconso, so the UMLS cardinality
    comparison half of the counters is exercised non-vacuously (each of
    less/more/same fires at least once), and one entity carries an empty
    skos:notation to pin the falsy-skip rule of the M15 cascade in the
    oracle. Kept out of ontology_fixture so the enrichment-cascade tests'
    e1-e8 coverage story is untouched."""
    S = "http://fixture.example/recon#"
    rows = [
        # rA: code in mrconso (A3276 → 1 CUI), NO cuis → less_cuis_than_umls
        (f"{S}rA", "rdf:type", "skos:Concept", None),
        (f"{S}rA", "skos:prefLabel", "reconcile less", "en"),
        (f"{S}rA", "skos:notation", "A3276", None),
        # rB: code B14 (1 CUI), TWO own cuis → more_cuis_than_umls
        (f"{S}rB", "rdf:type", "skos:Concept", None),
        (f"{S}rB", "skos:prefLabel", "reconcile more", "en"),
        (f"{S}rB", "skos:notation", "B14", None),
        (f"{S}rB", "umls:cui", "C0000010^^xsd:string", None),
        (f"{S}rB", "umls:cui", "C0000011", None),
        # rC: code C21 (1 CUI), ONE own cui → same_cuis_as_umls
        (f"{S}rC", "rdf:type", "skos:Concept", None),
        (f"{S}rC", "skos:prefLabel", "reconcile same", "en"),
        (f"{S}rC", "skos:notation", "C21", None),
        (f"{S}rC", "umls:cui", "C0000012", None),
        # rD: EMPTY notation must be skipped (falsy-skip in composite_code)
        # and the icd code D60 (1 CUI) used instead; one own cui → same
        (f"{S}rD", "rdf:type", "skos:Concept", None),
        (f"{S}rD", "skos:prefLabel", "reconcile falsy", "en"),
        (f"{S}rD", "skos:notation", "", None),
        (f"{S}rD", "icd:cdCode", "D60", None),
        (f"{S}rD", "umls:cui", "C0000013", None),
    ]
    return pa.table(
        {
            "subj": [r[0] for r in rows],
            "pred": [r[1] for r in rows],
            "obj": [r[2] for r in rows],
            "obj_lang": pa.array([r[3] for r in rows], pa.string()),
        },
        schema=schema.ONTO_TRIPLES,
    )


# relation-term vocabulary mirrored from pipelines.kg.REL_TERMS (kept as a
# literal to avoid a testgen→pipelines import cycle; test asserts equality)
_REL_TERMS = ("filter", "join", "merge", "scan", "sort")


def adversarial_pages_tables(
    n: int = 4600, seed: int = SEED
) -> tuple[pa.Table, pa.Table]:
    """Adversarial pages fixture (~10× the sf0.001 pages corpus), returned
    as TWO tables to be written as separate input files. Cases (VERDICT r3
    #5): hot repeated surfaces, relation-term-only pages, empty and
    whitespace-only pages, html-derived text, malformed html, unicode /
    punctuation noise around mentions, and duplicate urls — both recrawls
    of the same url at later warc_ts with rotated text (across BOTH files)
    and exact (url, warc_ts) repeats with identical content."""
    rng = np.random.RandomState(seed)
    vocab = [w for w in _VOCAB if w not in ("the", "a")]
    hot = ["hash join", "merge join", "table scan"]

    rows_a: list[tuple] = []
    rows_b: list[tuple] = []

    def emit(i, url, ts_off, text, lang, html=None, to_b=False):
        html_bytes = text_to_html(text, title=f"adv {i}") if html is None else html
        row = (url, _EPOCH + dt.timedelta(seconds=ts_off), html_bytes, text, lang)
        (rows_b if to_b else rows_a).append(row)

    for i in range(n):
        url = f"https://adv{i % 7}.example/page/{i}"
        lang = ("en", "fr", "")[i % 3]
        case = i % 10
        if case == 0:  # hot surface: one multi-word term repeated many times
            text = (" ".join([hot[i % len(hot)]] * 30)
                    + " " + " ".join(rng.choice(vocab, 5)))
        elif case == 1:  # relation terms ONLY (pattern-extraction edge)
            text = " ".join(rng.choice(_REL_TERMS, 12))
        elif case == 2:  # empty text AND empty html
            emit(i, url, i, "", lang, html=b"", to_b=bool((i // 10) % 2))
            continue
        elif case == 3:  # whitespace-only text
            text = "   \n\t  "
        elif case == 4:  # unicode/punctuation noise around mentions
            text = ("héllo — hash join, ünïcode! "
                    + " ".join(rng.choice(vocab, 6)) + " …end")
        elif case == 5:  # html-derived (empty text column)
            body = " ".join(rng.choice(vocab, 20))
            emit(i, url, i, "", lang,
                 html=text_to_html(body, title=f"adv {i}"), to_b=bool((i // 10) % 2))
            continue
        elif case == 6:  # malformed/truncated html, text pre-populated
            body = " ".join(rng.choice(vocab, 20))
            h = text_to_html(body, title=f"adv {i}")
            emit(i, url, i, body, lang, html=h[: len(h) // 2], to_b=bool((i // 10) % 2))
            continue
        else:  # plain word soup
            text = " ".join(rng.choice(vocab, 25))
        emit(i, url, i, text, lang, to_b=bool((i // 10) % 2))

        if i % 9 == 0:  # recrawl in the OTHER file: later ts, rotated text
            words = text.split()
            emit(i, url, n + i, " ".join(words[3:] + words[:3]), lang,
                 to_b=not bool((i // 10) % 2))
        if i % 13 == 0:  # exact (url, ts) repeat with identical content
            emit(i, url, i, text, lang, to_b=not bool((i // 10) % 2))

    def tbl(rows):
        return pa.table(
            {
                "url": pa.array([r[0] for r in rows], pa.string()),
                "warc_ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "html": pa.array([r[2] for r in rows], pa.binary()),
                "text": pa.array([r[3] for r in rows], pa.string()),
                "lang": pa.array([r[4] for r in rows], pa.string()),
            },
            schema=schema.PAGES,
        )

    return tbl(rows_a), tbl(rows_b)


def cleaner_fixture() -> pa.Table:
    """Extra triples exercising every cleaner branch (M16 keep-lang-or-all,
    M17 repair via altLabel and via camelCase hiddenLabel) so the
    ``multilingual_clean`` driver query has a DuckDB-restatable oracle.
    Static — no RNG."""
    C = "http://fixture.example/clean#"
    rows: list[tuple[str, str, str, str | None]] = [
        # c1: target-lang literal present → drop other langs, keep untagged
        (C + "c1", "skos:prefLabel", "colour", "en"),
        (C + "c1", "skos:prefLabel", "couleur", "fr"),
        (C + "c1", "skos:prefLabel", "color-plain", None),
        (C + "c1", "skos:altLabel", "tint", "en"),
        (C + "c1", "skos:altLabel", "teinte", "fr"),
        (C + "c1", "skos:altLabel", "shade", None),
        # c2: no prefLabel, fr-only altLabels (kept — target absent);
        # repair synthesizes prefLabel from the min altLabel
        (C + "c2", "skos:altLabel", "zeta label", "fr"),
        (C + "c2", "skos:altLabel", "alpha label", "fr"),
        (C + "c2", "rdfs:comment", "une note", "fr"),
        # c3: no prefLabel/altLabel → repair from camelCase hiddenLabel
        # through the elision/abbreviation chain (dlco→DLCO, co2→CO2)
        (C + "c3", "skos:hiddenLabel", "capaciteDlcoMesureeCo2", None),
        # c4: foreign-only literal on a predicate → kept as-is
        (C + "c4", "skos:prefLabel", "niveau", "fr"),
    ]
    return pa.table(
        {
            "subj": pa.array([r[0] for r in rows], pa.string()),
            "pred": pa.array([r[1] for r in rows], pa.string()),
            "obj": pa.array([r[2] for r in rows], pa.string()),
            "obj_lang": pa.array([r[3] for r in rows], pa.string()),
        },
        schema=schema.ONTO_TRIPLES,
    )


# --------------------------------------------------------------------------
# F7: eHealth-style generator inputs
# --------------------------------------------------------------------------

def ehealth_fixture(seed: int = SEED) -> dict[str, str]:
    """Dictionary/corpus CSV text + chapter ranges (F7). Returns raw file
    contents keyed by name; callers write them where needed."""
    rng = np.random.RandomState(seed)
    labels = [
        "fievre aigue", "Fievre", "GRIPPE SAISONNIERE", "grippe", "toux",
        "toux chronique", "cephalee", "migraine", "asthme", "bronchite",
    ]
    codes = ["A01", "A0112", "B20", "B20", "C33", "C33", "D01", "D0105", "E44", "E44"]
    dict_rows = ["label;code;extra;secondCode"]
    for l, c in zip(labels, codes):
        second = c if rng.rand() < 0.3 else ("NULL" if rng.rand() < 0.5 else "")
        dict_rows.append(f"{l};{c};x;{second}")
    # accent-flip prefLabel pin (appended AFTER the rng loop so the drawn
    # rows above are unchanged): "ÉB cd" has UNICODE-uppercase ratio 0.4
    # (disqualified, ≥0.25) but ASCII-only ratio 0.2 (would qualify and
    # win on length) — any oracle that counts only [A-Z] picks the wrong
    # prefLabel for E55 and the gate catches it.
    dict_rows.append("ÉB cd;E55;x;")
    dict_rows.append("eb cd etendu;E55;x;")
    corpus_rows = ["DocID;f1;f2;f3;f4;f5;RawText;f7;f8;f9;StdText;Code"]
    for i in range(60):
        j = rng.randint(0, len(labels))
        raw = labels[j].lower()
        std = labels[j]
        code = codes[(j + (1 if rng.rand() < 0.2 else 0)) % len(codes)]
        corpus_rows.append(f"doc{i};a;b;c;d;e;{raw};g;h;i;{std};{code}")
    chapters = "\n".join(
        [
            "http://chapter.example/I;A00-B99",
            "http://chapter.example/II;C00-D48",
            "http://chapter.example/III;D50-D89",
            "http://chapter.example/IV;E00-E90",
        ]
    )
    return {
        "ehealth_dictionary.csv": "\n".join(dict_rows) + "\n",
        "ehealth_corpus.csv": "\n".join(corpus_rows) + "\n",
        "chapter_ranges.csv": chapters + "\n",
    }


# --------------------------------------------------------------------------
# Materialization helpers
# --------------------------------------------------------------------------

def make_jsonl_corpus(n: int = 400, shards: int = 4) -> list[list[str]]:
    """Deterministic newline-delimited-JSON corpus (doc_id, lang, text) —
    the web-corpus interchange format; written as SEVERAL shard files so
    the JSONL read path is exercised with multi-file parallelism, the way
    a real jsonl.gz corpus ships. Returns one list of JSON lines per
    shard."""
    import json

    rng = np.random.RandomState(77)
    langs = ["en", "fr", "de"]
    out: list[list[str]] = [[] for _ in range(shards)]
    for i in range(n):
        n_words = int(rng.randint(0, 40))  # 0 → empty-text edge case
        text = " ".join(rng.choice(_VOCAB, size=n_words))
        row = {"doc_id": i, "lang": langs[int(rng.randint(len(langs)))], "text": text}
        out[i % shards].append(json.dumps(row, sort_keys=True))
    return out


def _fixture_fingerprint() -> str:
    """Content fingerprint of the fixture GENERATORS: any edit to this
    module or the multimodal table makers auto-invalidates the on-disk
    fixtures. (A hand-bumped version marker silently served STALE parquet
    to the SQL oracles — which read the dir — while engine queries used
    the edited in-memory tables, making the gate compare different data.)"""
    import hashlib

    from . import schema as schema_mod
    from .functions import text as text_mod
    from .stages import multimodal

    h = hashlib.md5()
    # the written bytes depend on this module AND on what it calls into:
    # the table schemas, text_to_html (pages content), and the multimodal
    # table makers — hash the whole closure
    for mod_file in (__file__, multimodal.__file__, schema_mod.__file__, text_mod.__file__):
        with open(mod_file, "rb") as f:
            h.update(f.read())
    return h.hexdigest()[:12]


def fixture_dir(root: str = "/tmp/sifr_fixtures") -> str:
    """Write all static (scale-independent) fixtures once; return the dir."""
    os.makedirs(root, exist_ok=True)
    marker = os.path.join(root, f".complete_{_fixture_fingerprint()}")
    if os.path.exists(marker):
        return root
    mrconso, mrsty = umls_tables()
    pq.write_table(mrconso, os.path.join(root, "mrconso.parquet"))
    pq.write_table(mrsty, os.path.join(root, "mrsty.parquet"))
    for name, tbl in ontology_fixture().items():
        pq.write_table(tbl, os.path.join(root, f"{name}.parquet"))
    pq.write_table(cleaner_fixture(), os.path.join(root, "cleaner_extra_triples.parquet"))
    pq.write_table(
        reconciler_extra_entities(), os.path.join(root, "recon_extra_source.parquet")
    )
    from .stages.multimodal import make_audio_table, make_media_table, make_video_table

    pq.write_table(make_media_table(500), os.path.join(root, "media.parquet"))
    pq.write_table(make_video_table(200), os.path.join(root, "videos.parquet"))
    pq.write_table(make_audio_table(200), os.path.join(root, "audio.parquet"))
    for name, content in ehealth_fixture().items():
        with open(os.path.join(root, name), "w") as f:
            f.write(content)
    jsonl_dir = os.path.join(root, "docs_jsonl")
    os.makedirs(jsonl_dir, exist_ok=True)
    for i, lines in enumerate(make_jsonl_corpus()):
        with open(os.path.join(jsonl_dir, f"docs_{i}.jsonl"), "w") as f:
            f.write("\n".join(lines) + "\n")
    with open(marker, "w") as f:
        f.write("ok\n")
    return root


def pages_path_for(
    sf_dir: str, root: str = "/tmp/sifr_pages", replicate: int = 1
) -> str:
    """Pages parquet for a given testdata dir, materialized on first use.

    The cache key embeds the generator fingerprint: an edit to
    ``pages_table_from_documents`` (or anything it calls) must invalidate
    the cached corpus, or the engine would read stale pages while
    documents-derived SQL oracles (domain_stats / latest_snapshot / kg_pr)
    restate expectations with the NEW formula — the exact staleness class
    the ``fixture_dir`` marker exists to prevent."""
    key = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    if replicate > 1:
        key = f"{key}_x{replicate}"
    key = f"{key}_{_fixture_fingerprint()}"
    return write_pages_for_sf(
        sf_dir, os.path.join(root, key, "pages.parquet"), replicate=replicate
    )


def pages_snapshot_halves(sf_dir: str) -> tuple[str, str]:
    """Two disjoint 'crawl snapshot' page files — a deterministic
    url-hash-parity split of the pages fixture — for the incremental-KG
    delta surface (``kg.kg_snapshot_delta``). Cached inside the same
    fingerprinted directory as the source corpus, so a generator edit
    invalidates the halves together with the whole."""
    src = pages_path_for(sf_dir)
    d = os.path.dirname(src)
    pa_path = os.path.join(d, "pages_snap_a.parquet")
    pb_path = os.path.join(d, "pages_snap_b.parquet")
    if os.path.exists(pa_path) and os.path.exists(pb_path):
        return pa_path, pb_path
    from .functions.hashing import hash64_np

    t = pq.read_table(src)
    h = hash64_np(t["url"].to_pylist())
    mask = (h & np.uint64(1)).astype(bool)
    for path, m in ((pa_path, ~mask), (pb_path, mask)):
        tmp = path + ".tmp"
        pq.write_table(t.filter(pa.array(m)), tmp, row_group_size=4096)
        os.replace(tmp, path)
    return pa_path, pb_path


def large_ontology(n_entities: int = 20000, seed: int = SEED) -> dict[str, pa.Table]:
    """Scaled synthetic ontology for benchmarking the enrichment cascade:
    n_entities spread across the cascade branches in fixed proportions
    (40% own-CUI, 15% altLabel-mined, 15% mapping 2-hop, 20% code join,
    10% unmatched). Deterministic."""
    rng = np.random.RandomState(seed)
    terms = [w for w in _VOCAB if w not in ("the", "a")]
    S = "http://large.example/onto#"
    T = "http://large.example/target#"
    src_s, src_p, src_o, src_l = [], [], [], []
    tgt_s, tgt_p, tgt_o, tgt_l = [], [], [], []
    map_s, map_p, map_t = [], [], []

    def add(lst_s, lst_p, lst_o, lst_l, s, p, o, l=None):
        lst_s.append(s); lst_p.append(p); lst_o.append(o); lst_l.append(l)

    for i in range(n_entities):
        code = f"{chr(ord('A') + i % 20)}{i % 100:02d}"
        uri = f"{S}{code}_{i}"
        label = f"{terms[i % len(terms)]} {terms[(i * 7) % len(terms)]}"
        add(src_s, src_p, src_o, src_l, uri, "rdf:type", "skos:Concept")
        add(src_s, src_p, src_o, src_l, uri, "skos:prefLabel", label, "en")
        branch = i % 100
        if branch < 40:
            add(src_s, src_p, src_o, src_l, uri, "umls:cui", f"C{1 + i % 50:07d}")
        elif branch < 55:
            add(src_s, src_p, src_o, src_l, uri, "skos:altLabel", f"C{1 + i % 50:07d}")
            add(src_s, src_p, src_o, src_l, uri, "skos:altLabel", label + " syn", "en")
        elif branch < 70:
            tgt = f"{T}t{i}"
            map_s.append(uri); map_p.append("skos:exactMatch"); map_t.append(tgt)
            add(tgt_s, tgt_p, tgt_o, tgt_l, tgt, "rdf:type", "skos:Concept")
            add(tgt_s, tgt_p, tgt_o, tgt_l, tgt, "umls:cui", f"C{1 + i % 50:07d}")
            add(tgt_s, tgt_p, tgt_o, tgt_l, tgt, "umls:tui", f"T{i % 200:03d}")
        elif branch < 90:
            add(src_s, src_p, src_o, src_l, uri, "skos:notation", code)
        # else: unmatched (URI fragment code only)
        if rng.rand() < 0.3:
            add(src_s, src_p, src_o, src_l, uri, "skos:altLabel", label.upper(), "en")

    def tbl(s, p, o, l):
        return pa.table(
            {"subj": pa.array(s, pa.string()), "pred": pa.array(p, pa.string()),
             "obj": pa.array(o, pa.string()), "obj_lang": pa.array(l, pa.string())},
            schema=schema.ONTO_TRIPLES,
        )

    return {
        "source_triples": tbl(src_s, src_p, src_o, src_l),
        "target_triples": tbl(tgt_s, tgt_p, tgt_o, tgt_l),
        "mappings": pa.table(
            {"source_class": pa.array(map_s, pa.string()),
             "property": pa.array(map_p, pa.string()),
             "target_class": pa.array(map_t, pa.string())},
            schema=schema.MAPPINGS,
        ),
    }

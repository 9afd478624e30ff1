"""Sequential pure-Python oracle for the flagship KG pipeline (FIXTURES.md
F8 / north-rule acceptance: distributed output matches the single-process
reference semantics at P/R ≥ 0.95 — target exact).

No Ray: one process, plain loops and dicts over the pages parquet. Shares
only the pure kernels (functions/*) with the engine; all distributed
machinery (blocks, shuffles, dedup, broadcast, union-find-over-groupby) is
exercised independently on the Ray side and must reproduce this triple set
exactly.
"""

from __future__ import annotations

import os
import sys

import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sifr_project_java_ontology_processing_ray.functions.text import extract_text  # noqa: E402
from sifr_project_java_ontology_processing_ray.functions.similarity import tverski  # noqa: E402
from sifr_project_java_ontology_processing_ray.stages.link import (  # noqa: E402
    CONTEXT_WEIGHT,
    SURFACE_WEIGHT,
    build_link_tables,
)
from sifr_project_java_ontology_processing_ray.stages.mentions import (  # noqa: E402
    CONTEXT_WINDOW,
    build_alias_index,
)
from sifr_project_java_ontology_processing_ray.functions.text import tokenize  # noqa: E402
from sifr_project_java_ontology_processing_ray.state.unionfind import UnionFind  # noqa: E402
from sifr_project_java_ontology_processing_ray.pipelines.kg import (  # noqa: E402
    PRED_REL_BASE,
    REL_TERMS,
)

UMLS_BASE = "http://bioportal.bioontology.org/ontologies/umls/"


def entity_uri_for_surface(surface: str) -> str:
    return f"http://sifr-ray.example/entity/{surface.lower().replace(' ', '_')}"


def kg_oracle_triples(
    pages_path: str, mrconso, mrsty, dedup_pages: bool = False
) -> set[tuple[str, str, str]]:
    tables = build_link_tables(mrconso)
    idx = build_alias_index(sorted(tables["term"].keys()))
    index, max_len = idx["index"], idx["max_len"]
    term_map, cui_term, cui_sig = tables["term"], tables["cui_term"], tables["cui_sig"]

    pages = pq.read_table(pages_path).to_pylist()
    if dedup_pages:
        # same recrawl semantics as build_kg(dedup_pages=True): latest
        # warc_ts wins per url ((url, warc_ts) identifies a crawl record)
        latest: dict = {}
        for row in pages:
            prev = latest.get(row["url"])
            if prev is None or row["warc_ts"] > prev["warc_ts"]:
                latest[row["url"]] = row
        pages = list(latest.values())
    triples: set[tuple[str, str, str]] = set()
    edges: set[tuple[str, str]] = set()
    page_mentions: list[tuple[str, list[tuple[str, str | None]]]] = []

    for row in pages:
        url, html, text, lang = row["url"], row["html"], row["text"], row["lang"]
        if not text:
            text = extract_text(html)
        # page triples are METADATA-derived and emitted for every page —
        # matching the engine's pruned (url, warc_ts, lang) page_meta read;
        # only the content-derived mention scan requires non-empty text
        triples.add((url, "rdf:type", "web:Page"))
        if lang:
            triples.add((url, "dc:language", lang))
        if not text:
            continue

        # greedy longest-match mention scan + cascade + top-1 (sequential
        # re-statement of MentionLinker)
        toks = tokenize(text)
        n = len(toks)
        i = 0
        mentions: list[tuple[str, str | None]] = []  # (surface, chosen cui)
        while i < n:
            matched = None
            for L in range(min(max_len, n - i), 0, -1):
                term = index.get(tuple(toks[i : i + L]))
                if term is not None:
                    matched = (term, L)
                    break
            if not matched:
                i += 1
                continue
            surface, L = matched
            cands = sorted(term_map.get(surface.lower(), []))
            if not cands:
                mentions.append((surface, None))
                i += L
                continue
            if len(cands) == 1:
                chosen = cands[0]
            else:
                ctx = " ".join(
                    toks[max(0, i - CONTEXT_WINDOW) : i] + toks[i + L : i + L + CONTEXT_WINDOW]
                )
                chosen, best = None, -1.0
                for cui in cands:
                    term = cui_term.get(cui, surface)
                    s = SURFACE_WEIGHT * tverski(surface, term) + CONTEXT_WEIGHT * tverski(
                        ctx, cui_sig.get(cui, term)
                    )
                    if s > best:
                        chosen, best = cui, s
            mentions.append((surface, chosen))
            edges.add((surface, chosen))
            i += L
        page_mentions.append((url, mentions))

    # canonicalization: union-find over distinct surface↔CUI edges
    uf = UnionFind()
    for surface, cui in edges:
        uf.union("s\x00" + surface, "c\x00" + cui)
    members: dict[str, list[str]] = {}
    for node, root in uf.components().items():
        members.setdefault(root, []).append(node)
    surface_map: dict[str, str] = {}
    cui_map: dict[str, str] = {}
    for nodes in members.values():
        cuis = sorted(x[2:] for x in nodes if x.startswith("c\x00"))
        surfaces = sorted(x[2:] for x in nodes if x.startswith("s\x00"))
        uri = UMLS_BASE + cuis[0] if cuis else entity_uri_for_surface(surfaces[0])
        for c in cuis:
            cui_map[c] = uri
        for sfc in surfaces:
            surface_map[sfc] = uri

    # mention/label/cooccur triples
    for url, mentions in page_mentions:
        linked = [(sfc, cui) for sfc, cui in mentions if cui is not None]
        for sfc, cui in linked:
            uri = cui_map.get(cui) or surface_map[sfc]
            triples.add((url, "sifr:mentions", uri))
            triples.add((uri, "skos:prefLabel", sfc))
        for i in range(len(mentions) - 1):
            sfc, cui = mentions[i]
            if cui is None:
                continue
            a = cui_map.get(cui) or surface_map[sfc]
            b = surface_map.get(mentions[i + 1][0])
            if b is None or a == b:
                continue
            lo, hi = (a, b) if a < b else (b, a)
            triples.add((lo, "sifr:cooccursWith", hi))
        # OpenIE-style pattern triples: linked relation-term mention between
        # two mentions whose surfaces canonicalize
        for i in range(1, len(mentions) - 1):
            sfc, cui = mentions[i]
            if cui is None or sfc not in REL_TERMS:
                continue
            a = surface_map.get(mentions[i - 1][0])
            c = surface_map.get(mentions[i + 1][0])
            if a is None or c is None or a == c:
                continue
            triples.add((a, PRED_REL_BASE + sfc, c))

    # umls triples
    for cui, uri in cui_map.items():
        triples.add((uri, "umls:cui", cui))
    for cui, tui in zip(mrsty["cui"].to_pylist(), mrsty["tui"].to_pylist()):
        uri = cui_map.get(cui)
        if uri is not None:
            triples.add((uri, "umls:tui", tui))
    return triples


def precision_recall(
    got: set[tuple[str, str, str]], want: set[tuple[str, str, str]]
) -> tuple[float, float]:
    tp = len(got & want)
    p = tp / len(got) if got else 1.0
    r = tp / len(want) if want else 1.0
    return p, r


if __name__ == "__main__":
    import ray

    from sifr_project_java_ontology_processing_ray import testgen
    from sifr_project_java_ontology_processing_ray.pipelines import kg

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    mrconso, mrsty = testgen.umls_tables()
    pages = testgen.pages_path_for(sf_dir)
    want = kg_oracle_triples(pages, mrconso, mrsty)

    ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    df = kg.build_kg(pages, mrconso, mrsty, pack_struct=False).to_pandas()
    got = set(zip(df["subj"], df["pred"], df["obj"]))
    p, r = precision_recall(got, want)
    print(f"ray triples={len(got)} oracle triples={len(want)} precision={p:.4f} recall={r:.4f}")
    missing = sorted(want - got)[:5]
    extra = sorted(got - want)[:5]
    if missing:
        print("missing sample:", missing)
    if extra:
        print("extra sample:", extra)
    ray.shutdown()
    sys.exit(0 if p >= 0.95 and r >= 0.95 else 1)

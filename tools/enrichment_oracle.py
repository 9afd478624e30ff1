"""Sequential pure-Python oracle for the enrichment cascade (the
reference's OntologyCUIProcessor.java read→postProcess flow restated as one
plain loop over subjects).

Like tools/kg_oracle.py: no Ray, no pipeline modules — only the pure
kernels from ``functions/*`` are shared (regexes, Tverski, code finders).
The distributed machinery (bucketed subject pivot, broadcast tables, actor
pool, finalize emission, mapping re-add) must reproduce this triple set
exactly; ``__ray_entry__._q_enrichment_pr`` surfaces the P/R to the driver.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sifr_project_java_ontology_processing_ray.functions.codes import (  # noqa: E402
    clean_xsd_type,
    composite_code,
    mine_cuis,
    normalize_code,
)
from sifr_project_java_ontology_processing_ray.functions.similarity import (  # noqa: E402
    tverski_best,
)
from sifr_project_java_ontology_processing_ray.functions.text import (  # noqa: E402
    parse_lang_literal,
)

CHANGE_NOTE = (
    "Le CUI de ce concept a été ajouté automatiquement par le système "
    "d'enrichissement."
)  # ≙ OntologyCUIProcessor.java:45

MAPPING_PREDICATES = {
    "skos:exactMatch", "skos:closeMatch", "skos:relatedMatch",
    "skos:broadMatch", "gold:freeTranslation", "gold:translation",
}

Triple = tuple[str, str, str, str | None]


def enrichment_oracle_triples(
    source_triples,
    mrconso,
    mrsty,
    mappings,
    target_triples,
    *,
    language: str = "ENG",
    disambiguate: bool = True,
    match_missing: bool = False,
    code_to_pref_label: bool = False,
    add_change_note: bool = True,
) -> set[Triple]:
    """(subj, pred, obj, obj_lang) set the enrichment pipeline must emit."""
    # --- dictionaries, plain dict-of-lists --------------------------------
    code_to_cuis: dict[str, set[str]] = {}
    cui_terms: dict[str, set[str]] = {}
    all_terms: set[tuple[str, str]] = set()
    for cui, lat, s, code in zip(
        mrconso["cui"].to_pylist(), mrconso["lat"].to_pylist(),
        mrconso["str"].to_pylist(), mrconso["code"].to_pylist(),
    ):
        if code:
            code_to_cuis.setdefault(code, set()).add(cui)
        if lat == language:
            cui_terms.setdefault(cui, set()).add(s)
            all_terms.add((s, cui))
    cui_to_tuis: dict[str, set[str]] = {}
    for cui, tui in zip(mrsty["cui"].to_pylist(), mrsty["tui"].to_pylist()):
        cui_to_tuis.setdefault(cui, set()).add(tui)
    src_to_targets: dict[str, list[str]] = {}
    for s, p, t in zip(
        mappings["source_class"].to_pylist(), mappings["property"].to_pylist(),
        mappings["target_class"].to_pylist(),
    ):
        if p in MAPPING_PREDICATES:
            src_to_targets.setdefault(s, []).append(t)
    tgt_cuis: dict[str, set[str]] = {}
    tgt_tuis: dict[str, set[str]] = {}
    for s, p, o in zip(
        target_triples["subj"].to_pylist(), target_triples["pred"].to_pylist(),
        target_triples["obj"].to_pylist(),
    ):
        if p == "umls:cui":
            tgt_cuis.setdefault(s, set()).add(clean_xsd_type(o))
        elif p == "umls:tui":
            tgt_tuis.setdefault(s, set()).add(clean_xsd_type(o))
    sorted_all_terms = sorted(all_terms)

    # --- per-subject property collection (the Jena model view) ------------
    by_subj: dict[str, list[tuple[str, str, str | None]]] = {}
    for s, p, o, l in zip(
        source_triples["subj"].to_pylist(), source_triples["pred"].to_pylist(),
        source_triples["obj"].to_pylist(), source_triples["obj_lang"].to_pylist(),
    ):
        by_subj.setdefault(s, []).append((p, o, l))

    out: set[Triple] = set()
    for subj in by_subj:
        props = by_subj[subj]

        def objs(pred: str) -> list[str]:
            return sorted({o for p, o, _ in props if p == pred})

        prefs = sorted((o, l) for p, o, l in props if p == "skos:prefLabel")
        pref_label, pref_lang = prefs[0] if prefs else ("", None)
        alts = sorted({
            (o, l if l is not None else "")
            for p, o, l in props if p == "skos:altLabel"
        })
        own_cuis = sorted({clean_xsd_type(c) for c in objs("umls:cui")})
        own_tuis = sorted({clean_xsd_type(t) for t in objs("umls:tui")})
        notations = objs("skos:notation")

        # --- the cascade: own → altLabel-mined → mapping → code → match ---
        cuis, purge = list(own_cuis), []
        if not cuis:
            mined = mine_cuis([a for a, _ in alts])
            if mined:
                cuis, purge = mined, mined
        if not cuis:
            hop = set()
            for tgt in src_to_targets.get(subj, []):
                hop |= tgt_cuis.get(tgt, set())
            cuis = sorted(hop)
        code = composite_code(
            notations or None, objs("icd:cdCode") or None,
            objs("icpc2p:ICPCCODE") or None, subj,
        )
        if not cuis and code:
            hit = code_to_cuis.get(code) or code_to_cuis.get(normalize_code(code))
            if hit:
                cuis = sorted(hit)
        if not cuis and match_missing and pref_label and sorted_all_terms:
            i, score = tverski_best(pref_label, [t for t, _ in sorted_all_terms])
            if score > 0.0:
                cuis = [sorted_all_terms[i][1]]
        if len(cuis) > 1 and disambiguate:
            cand = sorted(
                (term, cui) for cui in cuis for term in cui_terms.get(cui, ())
            )
            if cand:
                i, _ = tverski_best(pref_label, [t for t, _ in cand])
                cuis = [cand[i][1]]
            else:
                cuis = sorted(cuis)[:1]
        cuis = sorted(set(cuis))

        tuis = list(own_tuis)
        if not tuis:
            hop = set()
            for tgt in src_to_targets.get(subj, []):
                hop |= tgt_tuis.get(tgt, set())
            tuis = sorted(hop)
        if not tuis and cuis:
            hop = set()
            for cui in cuis:
                hop |= cui_to_tuis.get(cui, set())
            tuis = sorted(hop)

        # --- postProcess emission, reference order ------------------------
        if pref_lang is None and pref_label:
            pref_label, pref_lang = parse_lang_literal(pref_label)
        for cui in cuis:
            out.add((subj, "umls:cui", cui, None))
        if add_change_note and [c for c in cuis if c not in set(own_cuis)]:
            out.add((subj, "skos:changeNote", CHANGE_NOTE, "fr"))
        alive = [(a, l or None) for a, l in alts if clean_xsd_type(a) not in set(purge)]
        for tui in tuis:
            out.add((subj, "umls:tui", tui, None))
            out.add((subj, "umls:hasSTY",
                     f"http://purl.bioontology.org/ontology/STY/{tui}", None))
        if pref_label:
            pl = pref_label.strip().lower()
            alive = [
                (a, l) for a, l in alive
                if parse_lang_literal(a)[0].strip().lower() != pl
            ]
        if code:
            alive = [(a, l) for a, l in alive
                     if parse_lang_literal(a)[0].strip() != code]
            if not notations:
                out.add((subj, "skos:notation", code, None))
            if code_to_pref_label and pref_label and not pref_label.startswith(f"{code} - "):
                alive.append((pref_label, pref_lang))
                pref_label = f"{code} - {pref_label}"
        if pref_label:
            out.add((subj, "skos:prefLabel", pref_label, pref_lang))
        for a, l in alive:
            out.add((subj, "skos:altLabel", a, l))

    # step 4: mapping triples re-added verbatim (updateMappings :319-324)
    for s, p, t in zip(
        mappings["source_class"].to_pylist(), mappings["property"].to_pylist(),
        mappings["target_class"].to_pylist(),
    ):
        out.add((s, p, t, None))
    return out

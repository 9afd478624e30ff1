"""Ontology CUI/TUI enrichment — the reference's flagship cascade
(cli/enrichment/OntologyCUIProcessor.java) re-expressed as dataflow.

Read phase (≙ processSourceClass :376-384):
  triples → per-entity pivot (groupby subj) → enrichment map_batches with
  broadcast dimension tables. Cascade ORDER is semantics
  (OntologyCUIProcessor.java:141-156) and is preserved:
    1. own ``umls:cui`` values (M5, ^^-cleaned M4)          — skip-enrich
    2. altLabel regex mining ``C[0-9]{7}`` (M6 :195)        — marks purge set
    3. mapping 2-hop: class → mapped targets → their CUIs (J2 :198-203)
    4. UMLS by composite code (M15 + J4 :208)
    5. ``match_missing``: global similarity top-1 (:149-152 → :249-263)
  Ambiguity (>1 CUI) with ``disambiguate``: Tverski top-1 among candidate
  terms vs the concept label (:154-156, K1).
  TUIs (≙ processTUIs :273-297): own → via mappings → via UMLS CUI→TUI (J5).
  NOTE the reference's J3 asymmetry (source vs target class at :280 vs :201)
  is treated as a bug; we use target-class semantics for both (documented
  divergence, SURVEY §2.4 J3).

Mutation phase (≙ postProcess :395-417) becomes pure dataflow — delta
datasets unioned/anti-joined with the base triples in the reference's
strict order:
  updateCUIs → purge mined CUIs from altLabels → updateTUIs (+hasSTY) →
  re-add mappings → clean altLabels == prefLabel (M7) → code notes
  (notation-if-absent, optional code→prefLabel rewrite M8) → write.

The shared mutable OntModel + synchronized accumulator maps (:49-57,77-82)
do not exist here: every "update" is a new triple row with a provenance
rule, every "purge" an anti-join filter.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyarrow as pa
import ray.data as rd

from ..functions.codes import clean_xsd_type, composite_code, mine_cuis, normalize_code
from ..functions.similarity import tverski_best
from ..functions.text import parse_lang_literal
from ..schema import MAPPING_PREDICATES
from ..state.broadcast import Broadcast

CHANGE_NOTE = (
    "Le CUI de ce concept a été ajouté automatiquement par le système "
    "d'enrichissement."
)  # ≙ fixed French skos:changeNote, OntologyCUIProcessor.java:45,312-315 (M19)


@dataclass
class EnrichConfig:
    """CLI-flag surface of the reference (CUIProcessorCommandlineHandler
    .java:109-147): -dc, -mc, -cpl, -l."""

    disambiguate: bool = True        # -dc
    match_missing: bool = False      # -mc
    code_to_pref_label: bool = False  # -cpl
    language: str = "ENG"            # -l (UMLS 3-letter OR 2-letter code)
    add_change_note: bool = True     # -hn history note

    def __post_init__(self):
        # ≙ umls/UMLSLanguageCode.java: page-level 2-letter tags map to
        # UMLS 3-letter codes ('fr' → 'FRE'); unknown codes are an error
        # rather than a silent zero-match run
        from ..functions.codes import umls_language_code

        norm = umls_language_code(self.language)
        if norm is None:
            raise ValueError(f"unknown language code: {self.language!r}")
        self.language = norm


# --------------------------------------------------------------------------
# entity pivot (M1/M2/M3: triples → one row per entity)
# --------------------------------------------------------------------------

_LIST_STR = pa.list_(pa.string())

_PIVOT_SCHEMA = pa.schema(
    [
        ("entity_uri", pa.string()),
        ("pref_label", pa.string()),
        ("pref_lang", pa.string()),
        ("alt_labels", _LIST_STR),
        ("alt_langs", _LIST_STR),
        ("notations", _LIST_STR),
        ("icd_codes", _LIST_STR),
        ("icpc_codes", _LIST_STR),
        ("own_cuis", _LIST_STR),
        ("own_tuis", _LIST_STR),
        ("is_concept", pa.bool_()),
    ]
)


def pivot_entities_bucket(df) -> pa.Table:
    """Bucketed pivot: one python invocation per hash-bucket of subjects
    (state/grouped.py), semi-vectorized pandas aggregation inside — NOT one
    call per entity. Produces exactly the pivot_entities schema."""
    import pandas as pd

    df = df.sort_values(["subj", "pred", "obj"])
    subjs = df["subj"].drop_duplicates().tolist()
    base = pd.DataFrame(index=subjs)

    def lists_for(pred: str, clean: bool = False):
        sub = df[df["pred"] == pred]
        if sub.empty:
            return pd.Series([[]] * len(subjs), index=subjs)
        agg = sub.groupby("subj")["obj"].agg(
            (lambda v: sorted({clean_xsd_type(x) for x in v})) if clean
            else (lambda v: sorted(set(v)))
        )
        return agg.reindex(subjs).apply(lambda v: v if isinstance(v, list) else [])

    pref = df[df["pred"] == "skos:prefLabel"]
    if pref.empty:
        pref_label = pd.Series([""] * len(subjs), index=subjs)
        pref_lang = pd.Series([None] * len(subjs), index=subjs, dtype=object)
    else:
        first = pref.groupby("subj").first()  # sorted above → lexicographic min obj
        pref_label = first["obj"].reindex(subjs).fillna("")
        pref_lang = first["obj_lang"].reindex(subjs)
        pref_lang = pref_lang.where(pref_lang.notna(), None)

    alt = df[df["pred"] == "skos:altLabel"].copy()
    if alt.empty:
        alt_pairs = pd.Series([[]] * len(subjs), index=subjs)
    else:
        alt["lang_norm"] = alt["obj_lang"].fillna("")
        alt_pairs = alt.groupby("subj").apply(
            lambda g: sorted(set(zip(g["obj"], g["lang_norm"])))
        ).reindex(subjs).apply(lambda v: v if isinstance(v, list) else [])

    types = lists_for("rdf:type")
    return pa.table(
        {
            "entity_uri": subjs,
            "pref_label": pref_label.tolist(),
            "pref_lang": pref_lang.tolist(),
            "alt_labels": [[a for a, _ in pairs] for pairs in alt_pairs],
            "alt_langs": [[l for _, l in pairs] for pairs in alt_pairs],
            "notations": lists_for("skos:notation").tolist(),
            "icd_codes": lists_for("icd:cdCode").tolist(),
            "icpc_codes": lists_for("icpc2p:ICPCCODE").tolist(),
            "own_cuis": lists_for("umls:cui", clean=True).tolist(),
            "own_tuis": lists_for("umls:tui", clean=True).tolist(),
            "is_concept": [("skos:Concept" in t) or bool(pl) for t, pl in zip(types, pref_label)],
        },
        schema=_PIVOT_SCHEMA,
    )


def pivot_entities(group: pa.Table) -> pa.Table:
    """groupby(subj) pivot: collect the property lists the cascade needs.
    Sorted lists throughout (TreeSet determinism K4/K5). Explicit schema so
    empty lists never degrade to list<null> across blocks."""
    subj = group["subj"][0].as_py()
    by_pred: dict[str, list[tuple[str, str | None]]] = {}
    for pred, obj, lang in zip(
        group["pred"].to_pylist(), group["obj"].to_pylist(), group["obj_lang"].to_pylist()
    ):
        by_pred.setdefault(pred, []).append((obj, lang))

    def objs(pred: str) -> list[str]:
        return sorted({o for o, _ in by_pred.get(pred, [])})

    pref = by_pred.get("skos:prefLabel", [])
    pref_label = sorted(pref)[0][0] if pref else ""
    pref_lang = sorted(pref)[0][1] if pref else None
    alt = sorted({(o, l if l is not None else "") for o, l in by_pred.get("skos:altLabel", [])})
    return pa.table(
        {
            "entity_uri": [subj],
            "pref_label": [pref_label],
            "pref_lang": [pref_lang],
            "alt_labels": [[a[0] for a in alt]],
            "alt_langs": [[a[1] for a in alt]],
            "notations": [objs("skos:notation")],
            "icd_codes": [objs("icd:cdCode")],
            "icpc_codes": [objs("icpc2p:ICPCCODE")],
            "own_cuis": [sorted({clean_xsd_type(c) for c in objs("umls:cui")})],
            "own_tuis": [sorted({clean_xsd_type(t) for t in objs("umls:tui")})],
            "is_concept": [("skos:Concept" in objs("rdf:type")) or bool(pref)],
        },
        schema=_PIVOT_SCHEMA,
    )


# --------------------------------------------------------------------------
# broadcast dimension tables
# --------------------------------------------------------------------------

def build_enrich_tables(
    mrconso: pa.Table,
    mrsty: pa.Table,
    mappings: pa.Table,
    target_triples: pa.Table,
    language: str = "ENG",
) -> dict:
    """All lookups the cascade needs, precomputed driver-side (replaces the
    MySQL/Redis service layer ST1/ST5 with plain data)."""
    code_to_cuis: dict[str, set[str]] = {}
    cui_terms: dict[str, list[str]] = {}
    all_terms: list[tuple[str, str]] = []  # (term, cui) for match_missing
    for cui, lat, s, code in zip(
        mrconso["cui"].to_pylist(), mrconso["lat"].to_pylist(),
        mrconso["str"].to_pylist(), mrconso["code"].to_pylist(),
    ):
        if code:
            code_to_cuis.setdefault(code, set()).add(cui)
        if lat == language:
            cui_terms.setdefault(cui, []).append(s)
            all_terms.append((s, cui))
    cui_to_tuis: dict[str, set[str]] = {}
    for cui, tui in zip(mrsty["cui"].to_pylist(), mrsty["tui"].to_pylist()):
        cui_to_tuis.setdefault(cui, set()).add(tui)

    src_to_targets: dict[str, list[tuple[str, str]]] = {}
    for s, p, t in zip(
        mappings["source_class"].to_pylist(), mappings["property"].to_pylist(),
        mappings["target_class"].to_pylist(),
    ):
        if p in MAPPING_PREDICATES:
            src_to_targets.setdefault(s, []).append((p, t))

    tgt_cuis: dict[str, set[str]] = {}
    tgt_tuis: dict[str, set[str]] = {}
    for subj, pred, obj in zip(
        target_triples["subj"].to_pylist(), target_triples["pred"].to_pylist(),
        target_triples["obj"].to_pylist(),
    ):
        if pred == "umls:cui":
            tgt_cuis.setdefault(subj, set()).add(clean_xsd_type(obj))
        elif pred == "umls:tui":
            tgt_tuis.setdefault(subj, set()).add(clean_xsd_type(obj))

    return {
        "code_to_cuis": {k: sorted(v) for k, v in code_to_cuis.items()},
        "cui_terms": {k: sorted(set(v)) for k, v in cui_terms.items()},
        "all_terms": sorted(set(all_terms)),
        "cui_to_tuis": {k: sorted(v) for k, v in cui_to_tuis.items()},
        "src_to_targets": src_to_targets,
        "tgt_cuis": {k: sorted(v) for k, v in tgt_cuis.items()},
        "tgt_tuis": {k: sorted(v) for k, v in tgt_tuis.items()},
    }


# --------------------------------------------------------------------------
# the cascade itself (stateful actor: tables loaded once per actor)
# --------------------------------------------------------------------------

class Enricher:
    """map_batches actor over pivoted entities → enrichment decisions."""

    def __init__(self, tables_bc: Broadcast, config: EnrichConfig):
        t = tables_bc.value
        self.t = t
        self.cfg = config

    def _disambiguate(self, label: str, cuis: list[str]) -> list[str]:
        """Tverski top-1 among the candidate CUIs' terms (≙ :249-263)."""
        cand: list[tuple[str, str]] = []
        for cui in cuis:
            for term in self.t["cui_terms"].get(cui, []):
                cand.append((term, cui))
        if not cand:
            return sorted(cuis)[:1]
        terms = [c[0] for c in cand]
        i, _score = tverski_best(label, terms)
        return [cand[i][1]]

    def _match_missing(self, label: str) -> list[str]:
        """Global similarity match against every term (≙ :149-152)."""
        allt = self.t["all_terms"]
        if not allt or not label:
            return []
        terms = [a[0] for a in allt]
        i, score = tverski_best(label, terms)
        if score <= 0.0:
            return []
        return [allt[i][1]]

    def enrich_row(self, row: dict) -> dict:
        t, cfg = self.t, self.cfg
        label = row["pref_label"]
        rule = "own"
        cuis = list(row["own_cuis"])
        purge: list[str] = []
        if not cuis:
            mined = mine_cuis(list(row["alt_labels"]))
            if mined:
                cuis, rule, purge = mined, "altlabel", mined
        if not cuis:
            hop = []
            for _prop, tgt in t["src_to_targets"].get(row["entity_uri"], []):
                hop.extend(t["tgt_cuis"].get(tgt, []))
            if hop:
                cuis, rule = sorted(set(hop)), "mapping"
        code = composite_code(
            list(row["notations"]) or None,
            list(row["icd_codes"]) or None,
            list(row["icpc_codes"]) or None,
            row["entity_uri"],
        )
        if not cuis and code:
            hit = t["code_to_cuis"].get(code) or t["code_to_cuis"].get(normalize_code(code))
            if hit:
                cuis, rule = list(hit), "code"
        if not cuis and cfg.match_missing:
            m = self._match_missing(label)
            if m:
                cuis, rule = m, "match"
        if len(cuis) > 1 and cfg.disambiguate:
            cuis = self._disambiguate(label, cuis)
            rule += "+disambiguated"

        tuis = list(row["own_tuis"])
        tui_rule = "own"
        if not tuis:
            hop = []
            # target-class semantics on BOTH paths (J3 asymmetry spec'd away)
            for _prop, tgt in t["src_to_targets"].get(row["entity_uri"], []):
                hop.extend(t["tgt_tuis"].get(tgt, []))
            if hop:
                tuis, tui_rule = sorted(set(hop)), "mapping"
        if not tuis and cuis:
            hop = []
            for cui in cuis:
                hop.extend(t["cui_to_tuis"].get(cui, []))
            if hop:
                tuis, tui_rule = sorted(set(hop)), "umls"

        return {
            "cuis": sorted(set(cuis)),
            "cui_rule": rule if cuis else "",
            "tuis": sorted(set(tuis)),
            "tui_rule": tui_rule if tuis else "",
            "purge_cuis": purge,
            "code": code or "",
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = batch.to_pylist()
        decisions = [self.enrich_row(r) for r in rows]
        out = batch
        for col, typ in (
            ("cuis", pa.list_(pa.string())),
            ("tuis", pa.list_(pa.string())),
            ("purge_cuis", pa.list_(pa.string())),
        ):
            out = out.append_column(col, pa.array([d[col] for d in decisions], typ))
        for col in ("cui_rule", "tui_rule", "code"):
            out = out.append_column(col, pa.array([d[col] for d in decisions], pa.string()))
        return out


# --------------------------------------------------------------------------
# mutation phase as dataflow (postProcess order :395-417)
# --------------------------------------------------------------------------

def finalize_entity(row: dict, cfg: EnrichConfig) -> list[tuple[str, str, str, str | None]]:
    """Emit the final triples for one enriched entity, applying the
    postProcess steps in the reference's strict order."""
    subj = row["entity_uri"]
    out: list[tuple[str, str, str, str | None]] = []
    pref_label, pref_lang = row["pref_label"], row["pref_lang"]
    # lang may be embedded "label@fr" style (M18)
    if pref_lang is None and pref_label:
        pref_label, pref_lang = parse_lang_literal(pref_label)

    # 1. updateCUIs (+ changeNote M19)
    newly_added = [c for c in row["cuis"] if c not in set(row["own_cuis"])]
    for cui in row["cuis"]:
        out.append((subj, "umls:cui", cui, None))
    if newly_added and cfg.add_change_note:
        out.append((subj, "skos:changeNote", CHANGE_NOTE, "fr"))

    # 2. cleanCUIsAltLabelsAndSynonyms: purge mined CUI literals (M9)
    purge = set(row["purge_cuis"])
    alts = [
        (a, l if l else None)
        for a, l in zip(row["alt_labels"], row["alt_langs"])
        if clean_xsd_type(a) not in purge
    ]

    # 3. updateTUIs + hasSTY URI (CUIOntologyDelegateImpl.java:62-69)
    for tui in row["tuis"]:
        out.append((subj, "umls:tui", tui, None))
        out.append((subj, "umls:hasSTY", f"http://purl.bioontology.org/ontology/STY/{tui}", None))

    # 4. (updateMappings re-adds the mapping triples — done at pipeline level)

    # 5. cleanAltLabelsSameAsPrefLabels (M7: case-insensitive, trimmed)
    if pref_label:
        pl = pref_label.strip().lower()
        alts = [(a, l) for a, l in alts if parse_lang_literal(a)[0].strip().lower() != pl]

    # 6. updateCodeNotes: notation if absent; optional -cpl prefLabel rewrite (M8)
    code = row["code"]
    if code:
        alts = [(a, l) for a, l in alts if parse_lang_literal(a)[0].strip() != code]
        if not row["notations"]:
            out.append((subj, "skos:notation", code, None))
        if cfg.code_to_pref_label and pref_label and not pref_label.startswith(f"{code} - "):
            alts.append((pref_label, pref_lang))
            pref_label = f"{code} - {pref_label}"

    if pref_label:
        out.append((subj, "skos:prefLabel", pref_label, pref_lang))
    for a, l in sorted(set(alts)):
        out.append((subj, "skos:altLabel", a, l))
    return out


def enrich_ontology(
    source_triples: pa.Table,
    mrconso: pa.Table,
    mrsty: pa.Table,
    mappings: pa.Table,
    target_triples: pa.Table,
    config: EnrichConfig | None = None,
    concurrency: int = 2,
    stats_csv: str | None = None,
):
    """Full enrichment pipeline. Returns (enriched_triples_ds, unmatched_ds).

    enriched triples: (subj, pred, obj, obj_lang) incl. re-added mapping
    triples (step 4); unmatched: entities with no CUI after the cascade
    (≙ "<ont>_concepts_without_cui.txt" S10). When ``stats_csv`` is given,
    the A6/A7 counters are aggregated and written as the reference's 2-line
    stats CSV (S9)."""
    cfg = config or EnrichConfig()
    enrich_tables = build_enrich_tables(mrconso, mrsty, mappings, target_triples, cfg.language)
    tables_bc = Broadcast.put(enrich_tables)

    from ..state.grouped import bucketed_map_groups, dataset_from_table

    entities = bucketed_map_groups(
        dataset_from_table(source_triples), ["subj"], pivot_entities_bucket
    )
    # same starvation fix as build_kg's linker stage: the per-operator
    # resource reservation holds back the Enricher pool behind the light
    # pivot shuffle; the pool is the stage's whole cost, so drop the
    # reservation for this execution only
    import ray.data as _rd

    _rctx = _rd.DataContext.get_current()
    _prev_reservation = _rctx.op_resource_reservation_enabled
    _rctx.op_resource_reservation_enabled = False
    try:
        enriched = entities.map_batches(
            Enricher,
            fn_constructor_args=(tables_bc, cfg),
            batch_format="pyarrow",
            concurrency=concurrency,
            num_cpus=0.5,
        ).materialize()
    finally:
        _rctx.op_resource_reservation_enabled = _prev_reservation

    def emit(batch: pa.Table) -> pa.Table:
        rows = batch.to_pylist()
        s, p, o, l = [], [], [], []
        for r in rows:
            for subj, pred, obj, lang in finalize_entity(r, cfg):
                s.append(subj); p.append(pred); o.append(obj); l.append(lang)
        return pa.table(
            {
                "subj": pa.array(s, pa.string()),
                "pred": pa.array(p, pa.string()),
                "obj": pa.array(o, pa.string()),
                "obj_lang": pa.array(l, pa.string()),
            }
        )

    triples = enriched.map_batches(emit, batch_format="pyarrow")

    # step 4: re-add mapping triples (updateMappings :319-324)
    map_rows = pa.table(
        {
            "subj": mappings["source_class"],
            "pred": mappings["property"],
            "obj": mappings["target_class"],
            "obj_lang": pa.array([None] * mappings.num_rows, pa.string()),
        }
    )
    if map_rows.num_rows:
        triples = triples.union(dataset_from_table(map_rows))

    unmatched = enriched.map_batches(
        lambda b: b.filter(
            pa.compute.equal(pa.compute.list_value_length(b["cuis"]), 0)
        ).select(["entity_uri", "pref_label"]),
        batch_format="pyarrow",
    )
    if stats_csv:
        write_stats_csv(compute_stats(enriched, enrich_tables["code_to_cuis"]), stats_csv)
    return triples, unmatched


# --------------------------------------------------------------------------
# statistics counters (A6/A7 ≙ stats/CUIOntologyStats.java:7-33 + S9 sink)
# --------------------------------------------------------------------------

STAT_NAMES = (
    "classes",                 # ≙ totalClassCount
    "with_own_cui",            # ≙ classesWithCUI (pre-existing)
    "cui_from_altlabel",       # ≙ CUIs mined from altLabels
    "cui_from_mapping",        # ≙ CUIs via cross-ontology mappings
    "cui_from_code",           # ≙ CUIs via UMLS code lookup
    "cui_from_match",          # ≙ CUIs via similarity match (-mc)
    "ambiguous_disambiguated", # ≙ disambiguation invocations (-dc)
    "without_cui",             # ≙ concepts_without_cui side output
    "with_tui",
    "tui_from_mapping",
    "tui_from_umls",
    "without_tui",             # ≙ "remaining without TUI" counter
    "cui_counts_match_umls",   # ≙ compareCUIsToUMLS equal-cardinality (A7)
    "cui_counts_differ_umls",  # ≙ compareCUIsToUMLS differing-cardinality
)


def compute_stats(enriched_ds, umls_code_to_cuis: dict[str, list[str]]) -> dict[str, int]:
    """Per-batch partial counters summed in a tiny groupby (the reference's
    synchronized OntologyStats counters as dataflow)."""
    import pyarrow as pa

    code_ref = None
    try:
        import ray

        code_ref = ray.put(umls_code_to_cuis)
    except Exception:
        pass

    # bind the fallback OUTSIDE the closure: referencing umls_code_to_cuis
    # inside would make the whole dict a free variable of the UDF, so
    # cloudpickle ships it with every task even when the broadcast exists
    fallback = None if code_ref is not None else umls_code_to_cuis

    def partial(batch: pa.Table) -> pa.Table:
        from ..state.broadcast import cached_get

        # per-worker memo: the dict is not zero-copy, don't re-deserialize
        # it once per batch
        code_map = cached_get(code_ref) if fallback is None else fallback
        rows = batch.to_pylist()
        c = dict.fromkeys(STAT_NAMES, 0)
        for r in rows:
            c["classes"] += 1
            rule = r["cui_rule"]
            if rule.startswith("own"):
                c["with_own_cui"] += 1
            elif rule.startswith("altlabel"):
                c["cui_from_altlabel"] += 1
            elif rule.startswith("mapping"):
                c["cui_from_mapping"] += 1
            elif rule.startswith("code"):
                c["cui_from_code"] += 1
            elif rule.startswith("match"):
                c["cui_from_match"] += 1
            if rule.endswith("+disambiguated"):
                c["ambiguous_disambiguated"] += 1
            if not r["cuis"]:
                c["without_cui"] += 1
            if r["tuis"]:
                c["with_tui"] += 1
                if r["tui_rule"] == "mapping":
                    c["tui_from_mapping"] += 1
                elif r["tui_rule"] == "umls":
                    c["tui_from_umls"] += 1
            else:
                c["without_tui"] += 1
            # A7: cardinality of found CUIs vs UMLS CUIs for the code
            if r["cuis"] and r["code"]:
                umls_cuis = code_map.get(r["code"], [])
                if umls_cuis:
                    key = (
                        "cui_counts_match_umls"
                        if len(umls_cuis) == len(r["cuis"])
                        else "cui_counts_differ_umls"
                    )
                    c[key] += 1
        return pa.table({k: pa.array([v], pa.int64()) for k, v in c.items()})

    from ray.data.aggregate import Sum

    agg = enriched_ds.map_batches(partial, batch_format="pyarrow").aggregate(
        *[Sum(k, alias_name=k) for k in STAT_NAMES]
    )
    return {k: int(agg.get(k, 0) or 0) for k in STAT_NAMES}


def sql_enrichment_cascade(fixture_root: str) -> str:
    """DuckDB restatement of the WHOLE enrichment cascade over the fixture
    parquets — the third independent derivation of the flagship semantics
    (Ray pipeline, tools/enrichment_oracle.py sequential python, and this
    SQL). Covers the full read phase (pivot, own→mined→mapping→code CUI
    cascade, Tverski/Dice 3-gram disambiguation as a window top-1, the
    own→mapping→UMLS TUI cascade) and the postProcess emission (changeNote,
    hasSTY, notation-if-absent, M7 altLabel==prefLabel drop, M9 mined-CUI
    purge, M18 embedded-@lang parse, mapping re-add).

    Caveats pinned to the fixture: label ties on (obj) between two
    prefLabel rows of one subject would be input-order-dependent in the
    engine (none exist), and TRIM here strips spaces where python strip()
    strips all whitespace (fixture labels use spaces only)."""
    preds = ", ".join(f"'{p}'" for p in MAPPING_PREDICATES)
    clean = r"regexp_replace({}, '\^\^.*$', '')"
    # parse_lang_literal: "label@fr" → (label, fr) (functions/text.py:127)
    lang_lit = "^[^\"]*@[a-z][a-z]$"
    parse_label = (
        "CASE WHEN regexp_matches({0}, '" + lang_lit + "') "
        "THEN regexp_replace({0}, '@[a-z][a-z]$', '') ELSE {0} END"
    )
    note = CHANGE_NOTE.replace("'", "''")
    return f"""
WITH src AS (SELECT subj, pred, obj, obj_lang FROM '{fixture_root}/source_triples.parquet'),
tgt AS (SELECT subj, pred, obj FROM '{fixture_root}/target_triples.parquet'),
maps AS (SELECT source_class, property, target_class FROM '{fixture_root}/mappings.parquet'),
conso AS (SELECT cui, lat, str, code FROM '{fixture_root}/mrconso.parquet'),
sty AS (SELECT cui, tui FROM '{fixture_root}/mrsty.parquet'),
ents AS (SELECT DISTINCT subj FROM src),
-- pivot: first prefLabel by obj (engine sorts subj,pred,obj; no obj ties in fixture)
pref AS (
  SELECT subj, obj, obj_lang FROM (
    SELECT subj, obj, obj_lang,
           row_number() OVER (PARTITION BY subj ORDER BY obj, obj_lang NULLS FIRST) AS rn
    FROM src WHERE pred = 'skos:prefLabel') WHERE rn = 1),
pref2 AS (  -- M18: parse an embedded "label@fr" when no lang tag
  SELECT subj,
         CASE WHEN obj_lang IS NULL THEN {parse_label.format('obj')} ELSE obj END AS label,
         CASE WHEN obj_lang IS NULL AND regexp_matches(obj, '{lang_lit}')
              THEN regexp_extract(obj, '@([a-z][a-z])$', 1) ELSE obj_lang END AS lang,
         obj AS raw_label
  FROM pref),
own_cuis AS (
  SELECT subj, list_sort(list(DISTINCT {clean.format('obj')})) AS cuis
  FROM src WHERE pred = 'umls:cui' GROUP BY subj),
mined AS (  -- M6: altLabel values full-matching the CUI pattern
  SELECT subj, list_sort(list(DISTINCT {clean.format('obj')})) AS cuis
  FROM src WHERE pred = 'skos:altLabel'
    AND regexp_matches({clean.format('obj')}, '^C[0-9]{{7}}$')
  GROUP BY subj),
mapped_cuis AS (  -- J2: class → mapped targets → their CUIs
  SELECT m.source_class AS subj,
         list_sort(list(DISTINCT {clean.format('t.obj')})) AS cuis
  FROM maps m JOIN tgt t ON t.subj = m.target_class AND t.pred = 'umls:cui'
  WHERE m.property IN ({preds}) GROUP BY m.source_class),
-- M13-M15 composite code: coalesce(min notation, min icd, min icpc, uri fragment)
codes AS (
  SELECT e.subj, {clean.format("COALESCE(n.v, i.v, p.v, NULLIF(split_part(regexp_replace(e.subj, '^.*[#/]', ''), '_', 1), ''))")} AS code
  FROM ents e
  LEFT JOIN (SELECT subj, min(obj) AS v FROM src WHERE pred = 'skos:notation' GROUP BY subj) n ON n.subj = e.subj
  LEFT JOIN (SELECT subj, min(obj) AS v FROM src WHERE pred = 'icd:cdCode' GROUP BY subj) i ON i.subj = e.subj
  LEFT JOIN (SELECT subj, min(obj) AS v FROM src WHERE pred = 'icpc2p:ICPCCODE' GROUP BY subj) p ON p.subj = e.subj),
code_cuis AS (SELECT code, list_sort(list(DISTINCT cui)) AS cuis FROM conso WHERE code <> '' GROUP BY code),
code_hit AS (  -- exact code first, then M10-normalized (A0012 → A00.12)
  SELECT c.subj, COALESCE(x.cuis, y.cuis) AS cuis
  FROM codes c
  LEFT JOIN code_cuis x ON x.code = c.code
  LEFT JOIN code_cuis y ON y.code =
    CASE WHEN regexp_matches(c.code, '^[A-Z][0-9][0-9][0-9][0-9]?$')
         THEN regexp_replace(c.code, '^([A-Z][0-9][0-9])', '\\1.') ELSE NULL END),
cascade AS (  -- cascade ORDER is semantics: own > mined > mapping > code
  SELECT e.subj,
         COALESCE(o.cuis, mi.cuis, ma.cuis, ch.cuis, []) AS cuis0,
         CASE WHEN o.cuis IS NULL AND mi.cuis IS NOT NULL THEN mi.cuis ELSE [] END AS purge,
         COALESCE(o.cuis, []) AS own
  FROM ents e
  LEFT JOIN own_cuis o ON o.subj = e.subj
  LEFT JOIN mined mi ON mi.subj = e.subj
  LEFT JOIN mapped_cuis ma ON ma.subj = e.subj
  LEFT JOIN code_hit ch ON ch.subj = e.subj),
-- K1 disambiguation: Dice over char-3-grams of '  '||lower(s)||' ' (= the
-- engine's Tverski α=1 β=γ=0.5), top-1 by (score DESC, term ASC, cui ASC)
cand AS (
  SELECT c.subj, u.cui, t.str AS term,
         '  ' || lower(COALESCE(p.raw_label, '')) || ' ' AS pl,
         '  ' || lower(t.str) || ' ' AS pt
  FROM cascade c
  JOIN (SELECT subj, unnest(cuis0) AS cui FROM cascade WHERE len(cuis0) > 1) u ON u.subj = c.subj
  JOIN (SELECT DISTINCT cui, str FROM conso WHERE lat = 'ENG') t ON t.cui = u.cui
  LEFT JOIN pref2 p ON p.subj = c.subj
  WHERE len(c.cuis0) > 1),
scored AS (
  SELECT subj, cui, term,
         list_distinct([substr(pl, CAST(i AS INT), 3) FOR i IN range(1, len(pl) - 1)]) AS ga,
         list_distinct([substr(pt, CAST(i AS INT), 3) FOR i IN range(1, len(pt) - 1)]) AS gb
  FROM cand),
dis_pick AS (
  SELECT subj, cui FROM (
    SELECT subj, cui, row_number() OVER (PARTITION BY subj
      ORDER BY 2.0 * len(list_intersect(ga, gb)) / (len(ga) + len(gb)) DESC,
               term ASC, cui ASC) AS rn
    FROM scored) WHERE rn = 1),
final_cuis AS (
  SELECT c.subj,
         CASE WHEN len(c.cuis0) <= 1 THEN c.cuis0
              WHEN dp.cui IS NOT NULL THEN [dp.cui]
              ELSE [c.cuis0[1]] END AS cuis,  -- no candidate terms → min(cui)
         c.purge, c.own
  FROM cascade c LEFT JOIN dis_pick dp ON dp.subj = c.subj),
own_tuis AS (
  SELECT subj, list_sort(list(DISTINCT {clean.format('obj')})) AS tuis
  FROM src WHERE pred = 'umls:tui' GROUP BY subj),
mapped_tuis AS (  -- J3 under target-class semantics (documented divergence)
  SELECT m.source_class AS subj,
         list_sort(list(DISTINCT {clean.format('t.obj')})) AS tuis
  FROM maps m JOIN tgt t ON t.subj = m.target_class AND t.pred = 'umls:tui'
  WHERE m.property IN ({preds}) GROUP BY m.source_class),
cui_tuis AS (  -- J5: via the FINAL (post-disambiguation) CUIs
  SELECT f.subj, list_sort(list(DISTINCT s.tui)) AS tuis
  FROM (SELECT subj, unnest(cuis) AS cui FROM final_cuis) f
  JOIN sty s ON s.cui = f.cui GROUP BY f.subj),
final_tuis AS (
  SELECT f.subj, COALESCE(ot.tuis, mt.tuis, ct.tuis, []) AS tuis
  FROM final_cuis f
  LEFT JOIN own_tuis ot ON ot.subj = f.subj
  LEFT JOIN mapped_tuis mt ON mt.subj = f.subj
  LEFT JOIN cui_tuis ct ON ct.subj = f.subj),
alts AS (  -- distinct (label, lang-or-'') pairs, as the pivot dedups them
  SELECT DISTINCT subj, obj AS a, COALESCE(obj_lang, '') AS l
  FROM src WHERE pred = 'skos:altLabel')
-- 1. updateCUIs
SELECT subj, 'umls:cui' AS pred, unnest(cuis) AS obj, CAST(NULL AS VARCHAR) AS obj_lang
FROM final_cuis
UNION ALL  -- M19 changeNote when any CUI is newly added
SELECT subj, 'skos:changeNote', '{note}', 'fr'
FROM final_cuis WHERE len(list_filter(cuis, c -> NOT list_contains(own, c))) > 0
UNION ALL  -- 3. updateTUIs + hasSTY
SELECT subj, 'umls:tui', unnest(tuis), NULL FROM final_tuis
UNION ALL
SELECT subj, 'umls:hasSTY', 'http://purl.bioontology.org/ontology/STY/' || unnest(tuis), NULL
FROM final_tuis
UNION ALL  -- 6. notation if absent
SELECT subj, 'skos:notation', code, NULL FROM codes
WHERE code IS NOT NULL
  AND subj NOT IN (SELECT subj FROM src WHERE pred = 'skos:notation')
UNION ALL  -- prefLabel (parsed)
SELECT subj, 'skos:prefLabel', label, lang FROM pref2 WHERE label <> ''
UNION ALL  -- altLabels surviving M9 purge, M7 ==prefLabel drop, ==code drop
SELECT al.subj, 'skos:altLabel', al.a, NULLIF(al.l, '')
FROM alts al
JOIN final_cuis f ON f.subj = al.subj
LEFT JOIN pref2 p ON p.subj = al.subj
LEFT JOIN codes c ON c.subj = al.subj
WHERE NOT list_contains(f.purge, {clean.format('al.a')})
  AND (p.label IS NULL OR p.label = ''
       OR lower(trim({parse_label.format('al.a')})) <> lower(trim(p.label)))
  AND (c.code IS NULL OR trim({parse_label.format('al.a')}) <> c.code)
UNION ALL  -- 4. updateMappings re-add
SELECT source_class, property, target_class, NULL FROM maps
"""


def write_stats_csv(stats: dict[str, int], path: str) -> None:
    """2-line CSV, headers then counts (≙ OntologyStats.writeStatistics,
    stats/OntologyStats.java:62-84)."""
    import os

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.write(",".join(stats.keys()) + "\n")
        f.write(",".join(str(v) for v in stats.values()) + "\n")

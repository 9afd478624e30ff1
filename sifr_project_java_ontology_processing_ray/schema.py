"""Explicit Arrow schemas for every logical table.

Mirrors SURVEY.md §1.2: the reference's implicit RDF / relational shapes
(BaseOntologyDelegate.java:41-45, SQLUMLSDelegate.java:54,100,177,204,
DefaultMapping.java:4-72) become explicit ``pyarrow.Schema`` objects.
"""

from __future__ import annotations

import pyarrow as pa

# Primary input (authoritative shape: BASELINE.json input_hint).
PAGES = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

# Provenance carried on every emitted triple (north rule: lineage).
PROVENANCE = pa.struct(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("rule", pa.string()),
    ]
)

# RDF statement store equivalent (SURVEY §1.2 "Triples table").
TRIPLES = pa.schema(
    [
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("obj_lang", pa.string()),  # nullable language tag
        ("obj_is_literal", pa.bool_()),
        ("provenance", PROVENANCE),
    ]
)

# Ontology-fixture triples (enrichment-cascade input; FIXTURES.md F4/F6).
ONTO_TRIPLES = pa.schema(
    [
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("obj_lang", pa.string()),
    ]
)

# Per-entity pivot of the triples table (SURVEY §1.2 "Entities table").
ENTITIES = pa.schema(
    [
        ("entity_uri", pa.string()),
        ("pref_label", pa.string()),
        ("alt_labels", pa.list_(pa.string())),
        ("notation", pa.string()),
        ("cuis", pa.list_(pa.string())),
        ("tuis", pa.list_(pa.string())),
        ("lang", pa.string()),
    ]
)

# UMLS-style dictionary tables (≙ MRCONSO / MRSTY, FIXTURES.md F2/F3).
MRCONSO = pa.schema(
    [
        ("cui", pa.string()),
        ("lat", pa.string()),  # 3-letter UMLS language code (ENG/FRE)
        ("str", pa.string()),
        ("code", pa.string()),
    ]
)

MRSTY = pa.schema([("cui", pa.string()), ("tui", pa.string())])

# Cross-ontology mapping table (≙ DefaultMapping src|prop|tgt).
MAPPINGS = pa.schema(
    [
        ("source_class", pa.string()),
        ("property", pa.string()),
        ("target_class", pa.string()),
    ]
)

# Mention rows produced by the extractor stage.
MENTIONS = pa.schema(
    [
        ("mention_id", pa.string()),
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("surface", pa.string()),
        ("position", pa.int32()),
        ("context", pa.string()),
    ]
)

# Scored entity-link candidates (≙ CUITermImpl (cui, term, lang, sig, score)).
CANDIDATES = pa.schema(
    [
        ("mention_id", pa.string()),
        ("surface", pa.string()),
        ("cui", pa.string()),
        ("term", pa.string()),
        ("score", pa.float64()),
    ]
)

# The six mapping predicates recognised by the reference
# (DefaultOntologyMappingDelegate.java:27-32).
MAPPING_PREDICATES = (
    "skos:exactMatch",
    "skos:closeMatch",
    "skos:relatedMatch",
    "skos:broadMatch",
    "gold:freeTranslation",
    "gold:translation",
)

# CURIE prefix table (≙ src/main/resources/prefixes.ttl:1-9).
PREFIXES = {
    "skos": "http://www.w3.org/2004/02/skos/core#",
    "owl": "http://www.w3.org/2002/07/owl#",
    "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
    "xsd": "http://www.w3.org/2001/XMLSchema#",
    "umls": "http://bioportal.bioontology.org/ontologies/umls/",
    "icpc2p": "http://purl.bioontology.org/ontology/ICPC2P/",
    "icd": "http://purl.bioontology.org/ontology/ICD10/",
    "gold": "http://purl.org/linguistics/gold/",
}


def expand_curie(curie: str) -> str:
    """Expand ``skos:prefLabel`` → full URI (≙ OntologyPrefix.getURI,
    ontology/prefix/OntologyPrefix.java:24-62). Unknown prefixes pass through."""
    if ":" in curie and not curie.startswith("http"):
        prefix, local = curie.split(":", 1)
        base = PREFIXES.get(prefix)
        if base:
            return base + local
    return curie


def contract_uri(uri: str) -> str:
    """Full URI → CURIE where a known prefix matches (longest prefix wins)."""
    best = None
    for prefix, base in PREFIXES.items():
        if uri.startswith(base) and (best is None or len(base) > len(PREFIXES[best])):
            best = prefix
    if best is None:
        return uri
    return best + ":" + uri[len(PREFIXES[best]):]

"""NCBO SPARQL XML → triple rows (≙ S7, utils/NcboSparqlOutputToTTL.java).

The reference streams SAX events from SPARQL result XML and prints TTL
lines ``<uri> umls:cui|umls:tui "literal"^^xsd:string.`` (:62-81,110-137).
Here: a format-conversion source — file paths fan out through map_batches,
each file parsed with iterparse (streaming, constant memory), rows out.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

import pyarrow as pa
import ray.data as rd

_SPARQL_NS = "{http://www.w3.org/2005/sparql-results#}"


def parse_sparql_results(path: str, predicate: str) -> list[tuple[str, str, str]]:
    """One result file → (subj, predicate, literal) rows. Expects bindings
    with a URI variable and a literal variable per result element."""
    rows = []
    subj = lit = None
    for event, elem in ET.iterparse(path, events=("end",)):
        if elem.tag == f"{_SPARQL_NS}uri":
            subj = elem.text
        elif elem.tag == f"{_SPARQL_NS}literal":
            lit = elem.text
        elif elem.tag == f"{_SPARQL_NS}result":
            if subj and lit:
                rows.append((subj, predicate, lit))
            subj = lit = None
            elem.clear()
    return rows


def read_ncbo_sparql(paths_with_preds: list[tuple[str, str]]) -> "rd.Dataset":
    """(path, predicate) pairs → triples Dataset. Each file is one task;
    at scale pass thousands of paths and let Ray fan out."""
    items = [{"path": p, "predicate": pred} for p, pred in paths_with_preds]

    def parse_batch(batch: pa.Table) -> pa.Table:
        s, p, o = [], [], []
        for path, pred in zip(batch["path"].to_pylist(), batch["predicate"].to_pylist()):
            for subj, pr, lit in parse_sparql_results(path, pred):
                s.append(subj); p.append(pr); o.append(lit)
        return pa.table(
            {
                "subj": pa.array(s, pa.string()),
                "pred": pa.array(p, pa.string()),
                "obj": pa.array(o, pa.string()),
                "obj_lang": pa.array([None] * len(s), pa.string()),
            }
        )

    return rd.from_items(items).map_batches(parse_batch, batch_format="pyarrow", batch_size=4)

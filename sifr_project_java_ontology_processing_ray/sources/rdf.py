"""RDF text ingestion/export (≙ S1 OntologyLoader.loadModel / S2
writeModel).

The reference loads Turtle / RDF/XML via Jena with transparent bz2/gzip
(utils/OntologyLoader.java:41-92). rdflib is not in this container, so this
module implements a line-oriented **N-Triples(-ish) subset** parser —
enough to ingest ontology fixtures and to round-trip this engine's own
exports — plus CURIE expansion/contraction against the reference's prefix
table (prefixes.ttl). Unparseable lines are surfaced in a side count, not
silently dropped. Gzip is handled transparently by extension.
"""

from __future__ import annotations

import gzip
import re

import pyarrow as pa
import ray.data as rd

from ..schema import contract_uri, expand_curie

# <s> <p> <o> .   |   <s> <p> "literal"(@lang|^^<type>)? .
_RE_NT = re.compile(
    r'^\s*<([^>]*)>\s+<([^>]*)>\s+'
    r'(?:<([^>]*)>|"((?:[^"\\]|\\.)*)"(?:@([a-zA-Z-]+)|\^\^<[^>]*>)?)'
    r'\s*\.\s*$'
)


def parse_ntriples_line(line: str) -> tuple[str, str, str, str | None, bool] | None:
    """One N-Triples line → (subj, pred, obj, obj_lang, obj_is_literal)."""
    m = _RE_NT.match(line)
    if not m:
        return None
    subj, pred, obj_uri, obj_lit, lang = m.groups()
    if obj_uri is not None:
        return subj, pred, obj_uri, None, False
    # latin-1 round-trip keeps raw UTF-8 intact while resolving \uXXXX
    lit = obj_lit.encode("latin-1", "backslashreplace").decode("unicode_escape") \
        if "\\" in obj_lit else obj_lit
    return subj, pred, lit, (lang.lower() if lang else None), True


def _open(path: str):
    if path.endswith(".gz"):
        return gzip.open(path, "rt", encoding="utf-8")
    return open(path, encoding="utf-8")


def read_ntriples(paths: str | list[str], contract: bool = True) -> "rd.Dataset":
    """Paths (plain or .gz) → triples Dataset (subj, pred, obj, obj_lang,
    obj_is_literal). One task per file; at scale pass many files."""
    if isinstance(paths, str):
        paths = [paths]

    def parse_files(batch: pa.Table) -> pa.Table:
        s, p, o, l, lit = [], [], [], [], []
        skipped = 0
        for path in batch["path"].to_pylist():
            with _open(path) as f:
                for line in f:
                    if not line.strip() or line.lstrip().startswith("#"):
                        continue
                    row = parse_ntriples_line(line)
                    if row is None:
                        skipped += 1
                        continue
                    subj, pred, obj, lang, is_lit = row
                    if contract:
                        subj, pred = contract_uri(subj), contract_uri(pred)
                        if not is_lit:
                            obj = contract_uri(obj)
                    s.append(subj); p.append(pred); o.append(obj)
                    l.append(lang); lit.append(is_lit)
        if skipped:
            import logging

            logging.getLogger(__name__).warning("skipped %d unparseable lines", skipped)
        return pa.table(
            {
                "subj": pa.array(s, pa.string()),
                "pred": pa.array(p, pa.string()),
                "obj": pa.array(o, pa.string()),
                "obj_lang": pa.array(l, pa.string()),
                "obj_is_literal": pa.array(lit, pa.bool_()),
            }
        )

    return rd.from_items([{"path": p} for p in paths]).map_batches(
        parse_files, batch_format="pyarrow", batch_size=1
    )


def _escape(s: str) -> str:
    return s.replace("\\", "\\\\").replace('"', '\\"').replace("\n", "\\n")


def triples_to_ntriples(batch: pa.Table) -> pa.Table:
    """Triples batch → one N-Triples text line per row (≙ writeModel S2;
    the reference forces RDF/XML, we emit the line-oriented format that
    parallel writers can concatenate). Consume with ``write_csv`` or
    driver-side for small models."""
    lines = []
    has_lit = "obj_is_literal" in batch.column_names
    for i in range(batch.num_rows):
        subj = expand_curie(batch["subj"][i].as_py())
        pred = expand_curie(batch["pred"][i].as_py())
        obj = batch["obj"][i].as_py()
        lang = batch["obj_lang"][i].as_py() if "obj_lang" in batch.column_names else None
        is_lit = batch["obj_is_literal"][i].as_py() if has_lit else not obj.startswith("http")
        if is_lit:
            o = f'"{_escape(obj)}"' + (f"@{lang}" if lang else "")
        else:
            o = f"<{expand_curie(obj)}>"
        lines.append(f"<{subj}> <{pred}> {o} .")
    return pa.table({"line": pa.array(lines, pa.string())})


def write_ntriples(ds: "rd.Dataset", out_dir: str) -> None:
    """Export a triples Dataset as partitioned .nt shard files."""
    import os

    os.makedirs(out_dir, exist_ok=True)

    def write_shard(batch: pa.Table) -> pa.Table:
        import uuid

        text = "\n".join(batch["line"].to_pylist()) + "\n"
        name = f"part-{uuid.uuid4().hex[:12]}.nt"
        tmp = os.path.join(out_dir, "." + name)
        with open(tmp, "w", encoding="utf-8") as f:
            f.write(text)
        os.replace(tmp, os.path.join(out_dir, name))
        return pa.table({"written": pa.array([batch.num_rows], pa.int64())})

    ds.map_batches(triples_to_ntriples, batch_format="pyarrow").map_batches(
        write_shard, batch_format="pyarrow", batch_size=65536
    ).count()

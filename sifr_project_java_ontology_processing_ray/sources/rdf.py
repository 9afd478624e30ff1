"""RDF text ingestion/export (≙ S1 OntologyLoader.loadModel / S2
writeModel).

The reference loads Turtle / RDF/XML via Jena, sniffed by extension, with
transparent bz2/gzip (utils/OntologyLoader.java:41-92: ``.ttl`` anywhere in
the name → TURTLE, else RDF/XML; ``.bz2``/``.gz`` suffix → decompress).
rdflib is not in this container, so this module implements subset parsers:

- line-oriented **N-Triples(-ish)** (also this engine's export round-trip)
- a **Turtle subset**: @prefix/PREFIX, @base, ``a``, prefixed names,
  ``;``/``,`` continuations, @lang + ^^datatype literals (datatype
  stripped, matching M4 cleanXSDTypes), numbers/booleans, bnode labels,
  balanced-skip of anonymous ``[...]``/collections — enough for
  prefixes.ttl and SKOS/ontology fixtures
- an **RDF/XML subset** via xml.etree: rdf:Description/typed nodes,
  rdf:about/resource/nodeID, nested nodes, xml:lang inheritance

``read_rdf`` dispatches per file like the reference (extension first,
content sniff fallback); gzip AND bz2 are transparent. Export:
N-Triples shards or RDF/XML shard documents (writeModel forces RDF/XML,
BaseOntologyDelegate.java:207-220 — one valid rdf:RDF document per shard
so parallel writers never contend on one file). Unparseable lines are
surfaced in a side count, not silently dropped.
"""

from __future__ import annotations

import bz2
import gzip
import re

import pyarrow as pa
import ray.data as rd

from ..schema import PREFIXES, contract_uri, expand_curie

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
XML_LANG = "{http://www.w3.org/XML/1998/namespace}lang"

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
    if path.endswith(".bz2"):
        return bz2.open(path, "rt", encoding="utf-8")
    return open(path, encoding="utf-8")


def _strip_compression(path: str) -> str:
    for suf in (".gz", ".bz2"):
        if path.endswith(suf):
            return path[: -len(suf)]
    return path


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


# --------------------------------------------------------------------------
# Turtle subset parser (≙ OntologyLoader: '.ttl' anywhere in name → TURTLE)
# --------------------------------------------------------------------------

_SCHEME_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*:")


def _ttl_tokens(text: str):
    """Tokenizer: IRIs, (long) string literals, punctuation, '^^', words.
    A '.' inside a word (icd:A01.12, 1.5) does NOT terminate it — only a
    '.' followed by whitespace / comment / '<' / EOF does."""
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if c.isspace():
            i += 1
            continue
        if c == "#":
            j = text.find("\n", i)
            i = n if j < 0 else j
            continue
        if c == "<":
            j = text.index(">", i)
            yield text[i : j + 1]
            i = j + 1
            continue
        if c == '"':
            if text.startswith('"""', i):
                j = text.index('"""', i + 3)
                yield text[i : j + 3]
                i = j + 3
            else:
                j = i + 1
                while text[j] != '"':
                    if text[j] == "\\":
                        j += 1
                    j += 1
                yield text[i : j + 1]
                i = j + 1
            continue
        if text.startswith("^^", i):
            yield "^^"
            i += 2
            continue
        if c in ".;,[]()":
            yield c
            i += 1
            continue
        j = i
        while j < n and not text[j].isspace() and text[j] not in ';,[]()"<':
            if text[j] == ".":
                nxt = text[j + 1] if j + 1 < n else " "
                if nxt.isspace() or nxt in "#<":
                    break
            j += 1
        yield text[i:j]
        i = j


def _unescape_lit(raw: str) -> str:
    return (
        raw.encode("latin-1", "backslashreplace").decode("unicode_escape")
        if "\\" in raw
        else raw
    )


def parse_turtle(text: str) -> list[tuple[str, str, str, str | None, bool]]:
    """Turtle subset → list of (subj, pred, obj, obj_lang, obj_is_literal).
    Typed literals drop their datatype (M4 cleanXSDTypes semantics);
    anonymous bnodes/collections become synthetic ``_:anonN`` labels with
    their inner content skipped (subset boundary, surfaced by count)."""
    pf: dict[str, str] = dict(PREFIXES)
    base = ""
    toks = list(_ttl_tokens(text))
    out: list[tuple[str, str, str, str | None, bool]] = []
    anon = 0

    def resolve(tok: str) -> str:
        if tok.startswith("<"):
            iri = tok[1:-1]
            if base and not _SCHEME_RE.match(iri):
                return base + iri
            return iri
        if tok.startswith("_:"):
            return tok
        if ":" in tok:
            p, local = tok.split(":", 1)
            if p in pf:
                return pf[p] + local
        return tok

    def skip_balanced(i: int, open_c: str, close_c: str) -> tuple[int, str]:
        nonlocal anon
        depth = 1
        i += 1
        while i < len(toks) and depth:
            if toks[i] == open_c:
                depth += 1
            elif toks[i] == close_c:
                depth -= 1
            i += 1
        anon += 1
        return i, f"_:anon{anon}"

    i = 0
    while i < len(toks):
        t = toks[i]
        if t in ("@prefix", "PREFIX"):
            pf[toks[i + 1].rstrip(":")] = toks[i + 2][1:-1]
            i += 3
            if i < len(toks) and toks[i] == ".":
                i += 1
            continue
        if t in ("@base", "BASE"):
            base = toks[i + 1][1:-1]
            i += 2
            if i < len(toks) and toks[i] == ".":
                i += 1
            continue
        if t == "[":
            i, subj = skip_balanced(i, "[", "]")
        else:
            subj = resolve(t)
            i += 1
        done = False
        while i < len(toks) and not done:
            pred_tok = toks[i]
            i += 1
            pred = RDF_NS + "type" if pred_tok == "a" else resolve(pred_tok)
            while i < len(toks):
                ot = toks[i]
                i += 1
                if ot == "[":
                    i, obj = skip_balanced(i - 1, "[", "]")
                    out.append((subj, pred, obj, None, False))
                elif ot == "(":
                    i, obj = skip_balanced(i - 1, "(", ")")
                    out.append((subj, pred, obj, None, False))
                elif ot.startswith('"'):
                    raw = ot[3:-3] if ot.startswith('"""') else ot[1:-1]
                    lang = None
                    if i < len(toks) and toks[i].startswith("@") and len(toks[i]) > 1:
                        lang = toks[i][1:].lower()
                        i += 1
                    elif i < len(toks) and toks[i] == "^^":
                        i += 2  # consume '^^' + datatype IRI/pname (stripped, M4)
                    out.append((subj, pred, _unescape_lit(raw), lang, True))
                elif ot.startswith("<") or ot.startswith("_:") or ":" in ot:
                    out.append((subj, pred, resolve(ot), None, False))
                else:
                    # bare number / boolean → plain literal
                    out.append((subj, pred, ot, None, True))
                if i < len(toks) and toks[i] == ",":
                    i += 1
                    continue
                break
            if i < len(toks) and toks[i] == ";":
                i += 1
                if i < len(toks) and toks[i] == ".":  # trailing ';' before '.'
                    i += 1
                    done = True
            elif i < len(toks) and toks[i] == ".":
                i += 1
                done = True
            else:
                done = True
    return out


# --------------------------------------------------------------------------
# RDF/XML subset parser (the reference's default format)
# --------------------------------------------------------------------------

def _expand_tag(tag: str) -> str:
    return tag[1:].replace("}", "", 1) if tag.startswith("{") else tag


def parse_rdfxml(fileobj) -> list[tuple[str, str, str, str | None, bool]]:
    """RDF/XML subset → (subj, pred, obj, obj_lang, obj_is_literal) rows:
    rdf:Description + typed node elements, rdf:about/ID/nodeID subjects,
    rdf:resource objects, nested node elements, xml:lang inheritance.
    rdf:datatype is stripped (M4 semantics)."""
    import xml.etree.ElementTree as ET

    root = ET.parse(fileobj).getroot()
    out: list[tuple[str, str, str, str | None, bool]] = []
    counter = 0

    def node_subject(el) -> str:
        nonlocal counter
        about = (
            el.get(f"{{{RDF_NS}}}about")
            or el.get(f"{{{RDF_NS}}}ID")
            or el.get(f"{{{RDF_NS}}}nodeID")
        )
        if about is None:
            counter += 1
            return f"_:b{counter}"
        return about

    def walk(el, lang_inherit: str | None) -> str:
        subj = node_subject(el)
        tag = _expand_tag(el.tag)
        if tag != RDF_NS + "Description":
            out.append((subj, RDF_NS + "type", tag, None, False))
        lang = el.get(XML_LANG, lang_inherit)
        for prop in el:
            pred = _expand_tag(prop.tag)
            plang = prop.get(XML_LANG, lang)
            res = prop.get(f"{{{RDF_NS}}}resource") or prop.get(f"{{{RDF_NS}}}nodeID")
            if res is not None:
                out.append((subj, pred, res, None, False))
                continue
            children = list(prop)
            if children:
                out.append((subj, pred, walk(children[0], plang), None, False))
                continue
            out.append((subj, pred, prop.text or "", plang, True))
        return subj

    for el in root:
        walk(el, None)
    return out


# --------------------------------------------------------------------------
# sniffing multi-format reader (≙ OntologyLoader.loadModel dispatch)
# --------------------------------------------------------------------------

def read_rdf(paths: str | list[str], contract: bool = True) -> "rd.Dataset":
    """Paths in any supported format/compression → triples Dataset.
    Per-file dispatch like the reference: '.ttl' in the name → Turtle,
    '.nt' → N-Triples, '.rdf'/'.owl'/'.xml' → RDF/XML; otherwise a
    content sniff ('<?xml'/'<rdf' → RDF/XML, '@prefix'/'PREFIX' → Turtle,
    else N-Triples). One task per file (S8 fan-out)."""
    if isinstance(paths, str):
        paths = [paths]

    def parse_file(path: str) -> list[tuple[str, str, str, str | None, bool]]:
        plain = _strip_compression(path)
        if ".ttl" in plain:
            with _open(path) as f:
                return parse_turtle(f.read())
        if plain.endswith((".rdf", ".owl", ".xml")):
            with _open(path) as f:
                return parse_rdfxml(f)
        if plain.endswith(".nt"):
            return _parse_nt_file(path)
        with _open(path) as f:
            head = f.read(4096).lstrip()
        if head.startswith(("<?xml", "<rdf")):
            with _open(path) as f:
                return parse_rdfxml(f)
        if head.startswith(("@prefix", "PREFIX", "@base", "BASE")):
            with _open(path) as f:
                return parse_turtle(f.read())
        return _parse_nt_file(path)

    def _parse_nt_file(path: str) -> list[tuple[str, str, str, str | None, bool]]:
        rows = []
        with _open(path) as f:
            for line in f:
                if not line.strip() or line.lstrip().startswith("#"):
                    continue
                row = parse_ntriples_line(line)
                if row is not None:
                    rows.append(row)
        return rows

    def parse_files(batch: pa.Table) -> pa.Table:
        s, p, o, l, lit = [], [], [], [], []
        for path in batch["path"].to_pylist():
            for subj, pred, obj, lang, is_lit in parse_file(path):
                if contract:
                    subj, pred = contract_uri(subj), contract_uri(pred)
                    if not is_lit:
                        obj = contract_uri(obj)
                s.append(subj); p.append(pred); o.append(obj)
                l.append(lang); lit.append(is_lit)
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


# --------------------------------------------------------------------------
# RDF/XML export (≙ writeModel forcing RDF/XML,
# BaseOntologyDelegate.java:207-220) — one complete rdf:RDF document per
# shard so parallel writers never contend on a single file; the shard set
# is the model.
# --------------------------------------------------------------------------

def _split_ns(uri: str) -> tuple[str, str]:
    """namespace/local split at the last '#' or '/' (Jena's rule)."""
    for sep in ("#", "/"):
        idx = uri.rfind(sep)
        if idx > len("http://") and idx < len(uri) - 1:
            return uri[: idx + 1], uri[idx + 1 :]
    return uri, ""


def triples_to_rdfxml(batch: pa.Table) -> str:
    """One triples batch → a complete RDF/XML document string (rows grouped
    by subject; known prefixes reused for namespace declarations)."""
    from xml.sax.saxutils import escape, quoteattr

    has_lit = "obj_is_literal" in batch.column_names
    by_subj: dict[str, list[tuple[str, str, str | None, bool]]] = {}
    ns_map: dict[str, str] = {RDF_NS: "rdf"}  # declared on the root tag
    rev_known = {v: k for k, v in PREFIXES.items()}

    def ns_prefix(ns: str) -> str:
        if ns not in ns_map:
            ns_map[ns] = rev_known.get(ns, f"n{len(ns_map)}")
        return ns_map[ns]

    for i in range(batch.num_rows):
        subj = expand_curie(batch["subj"][i].as_py())
        pred = expand_curie(batch["pred"][i].as_py())
        obj = batch["obj"][i].as_py()
        lang = batch["obj_lang"][i].as_py() if "obj_lang" in batch.column_names else None
        is_lit = batch["obj_is_literal"][i].as_py() if has_lit else not obj.startswith("http")
        by_subj.setdefault(subj, []).append((pred, obj, lang, is_lit))

    body: list[str] = []
    for subj in sorted(by_subj):
        body.append(f"  <rdf:Description rdf:about={quoteattr(subj)}>")
        for pred, obj, lang, is_lit in sorted(by_subj[subj], key=lambda r: (r[0], r[1])):
            ns, local = _split_ns(pred)
            tag = f"{ns_prefix(ns)}:{local}" if local else pred
            if is_lit:
                attr = f" xml:lang={quoteattr(lang)}" if lang else ""
                body.append(f"    <{tag}{attr}>{escape(obj)}</{tag}>")
            else:
                body.append(f"    <{tag} rdf:resource={quoteattr(expand_curie(obj))}/>")
        body.append("  </rdf:Description>")

    decls = "".join(
        f'\n  xmlns:{p}="{ns}"'
        for ns, p in sorted(ns_map.items(), key=lambda kv: kv[1])
        if ns != RDF_NS
    )
    return (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        f'<rdf:RDF xmlns:rdf="{RDF_NS}"{decls}>\n' + "\n".join(body) + "\n</rdf:RDF>\n"
    )


def write_rdfxml(ds: "rd.Dataset", out_dir: str) -> None:
    """Export a triples Dataset as RDF/XML shard documents (part-*.rdf)."""
    import os

    os.makedirs(out_dir, exist_ok=True)

    def write_shard(batch: pa.Table) -> pa.Table:
        import uuid

        name = f"part-{uuid.uuid4().hex[:12]}.rdf"
        tmp = os.path.join(out_dir, "." + name)
        with open(tmp, "w", encoding="utf-8") as f:
            f.write(triples_to_rdfxml(batch))
        os.replace(tmp, os.path.join(out_dir, name))
        return pa.table({"written": pa.array([batch.num_rows], pa.int64())})

    ds.map_batches(write_shard, batch_format="pyarrow", batch_size=65536).count()

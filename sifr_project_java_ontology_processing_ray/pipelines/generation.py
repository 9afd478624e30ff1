"""SKOS ontology generation — the reference's second pipeline
(cli/generation/EHealth2017DictionaryToSkos.java) as dataflow.

Three modes (≙ generate() :275-379, flag surface
SKOSGeneratorCommandlineHandler.java:104-159 with -a ⊥ -mfc and -a ⇒
-cr ∧ -cs validation):
  - plain: every (code → sorted labels) from dictionary (+corpus when
    enabled); prefLabel chosen by the uppercase-ratio rule (M11)
  - mfc:   per label keep only the argmax-frequency code (A4, :318-343)
  - adapted: std labels with exactly ONE code + union of raw labels per
    code (A5, :345-367)

Each final (code, labels) row gets a chapter by lexicographic range join
(J7, :394-402) and emits the concept triples of addConcept
(SKOSOntologyDelegateImpl.java:39-54): rdf:type, skos:broader (chapter),
skos:inScheme, skos:prefLabel, skos:altLabel.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..functions.codes import normalize_code
from ..functions.text import select_pref_label
from ..sources.csv_sources import read_chapter_ranges, read_corpus, read_dictionary

SCHEME_URI = "http://sifr-ray.example/skos/scheme"
CONCEPT_BASE = "http://sifr-ray.example/skos/concept/"


@dataclass
class GenerationConfig:
    """≙ -d/-cr/-cs/-a/-mfc flags (SKOSGeneratorCommandlineHandler.java)."""

    use_dictionary: bool = True      # -d
    use_corpus_raw: bool = False     # -cr
    use_corpus_std: bool = False     # -cs
    adapted: bool = False            # -a
    most_frequent_code: bool = False  # -mfc

    def validate(self) -> None:
        # ≙ validation at SKOSGeneratorCommandlineHandler.java:142-155
        if self.adapted and self.most_frequent_code:
            raise ValueError("-a and -mfc are mutually exclusive")
        if self.adapted and not (self.use_corpus_raw and self.use_corpus_std):
            raise ValueError("-a requires both -cr and -cs")


def _label_code_rows(
    dictionary_path: str | None,
    corpus_path: str | None,
    cfg: GenerationConfig,
) -> "rd.Dataset":
    """Unified (label, code, kind) rows from the enabled inputs; codes
    normalized (M10)."""
    parts = []
    if cfg.use_dictionary and dictionary_path:
        d = read_dictionary(dictionary_path)

        def from_dict(batch: pa.Table) -> pa.Table:
            labels, codes, kinds = [], [], []
            for label, code, second in zip(
                batch["label"].to_pylist(), batch["code"].to_pylist(),
                batch["second_code"].to_pylist(),
            ):
                if not label:
                    continue  # a dictionary row without a label is
                    # meaningless; dropped on BOTH sides (oracle parity —
                    # csv readers disagree on ''-vs-null for empty fields)
                labels.append(label); codes.append(normalize_code(code)); kinds.append("dict")
                if second:
                    labels.append(label); codes.append(normalize_code(second)); kinds.append("dict")
            return pa.table(
                {"label": pa.array(labels, pa.string()),
                 "code": pa.array(codes, pa.string()),
                 "kind": pa.array(kinds, pa.string())}
            )

        parts.append(d.map_batches(from_dict, batch_format="pyarrow"))
    if corpus_path and (cfg.use_corpus_raw or cfg.use_corpus_std):
        c = read_corpus(corpus_path)

        def from_corpus(batch: pa.Table) -> pa.Table:
            labels, codes, kinds = [], [], []
            for raw, std, code in zip(
                batch["raw_label"].to_pylist(), batch["std_label"].to_pylist(),
                batch["code"].to_pylist(),
            ):
                ncode = normalize_code(code)
                if cfg.use_corpus_raw and raw:
                    labels.append(raw); codes.append(ncode); kinds.append("raw")
                if cfg.use_corpus_std and std:
                    labels.append(std); codes.append(ncode); kinds.append("std")
            return pa.table(
                {"label": pa.array(labels, pa.string()),
                 "code": pa.array(codes, pa.string()),
                 "kind": pa.array(kinds, pa.string())}
            )

        parts.append(c.map_batches(from_corpus, batch_format="pyarrow"))
    if not parts:
        raise ValueError("no input enabled")
    ds = parts[0]
    for p in parts[1:]:
        ds = ds.union(p)
    return ds


def chapter_lookup(ranges: list[tuple[str, str, str]]):
    """J7 range join: first chapter whose upper bound ≥ code
    (lexicographic; ranges pre-sorted by upper bound)."""
    uppers = [r[2] for r in ranges]

    def lookup(code: str) -> str | None:
        # reference semantics: FIRST chapter whose upper bound ≥ code
        # (lexicographic; lower bound not checked — :394-402)
        i = int(np.searchsorted(uppers, code[:3], side="left"))
        if i < len(uppers):
            return ranges[i][0]
        return None

    return lookup


def generate_skos(
    dictionary_path: str | None,
    corpus_path: str | None,
    chapter_ranges_path: str | None,
    cfg: GenerationConfig | None = None,
) -> "rd.Dataset":
    """Run the generator; returns a triples Dataset (subj, pred, obj,
    obj_lang)."""
    cfg = cfg or GenerationConfig()
    cfg.validate()
    rows = _label_code_rows(dictionary_path, corpus_path, cfg)
    ranges = read_chapter_ranges(chapter_ranges_path) if chapter_ranges_path else []
    lookup = chapter_lookup(ranges)

    # label/code cardinality is dictionary-scale and unbounded, so every
    # grouped step runs BUCKETED (hash(key)%B python invocations, vectorized
    # pandas inside — state/grouped.py), not one python call per key
    from ..state.grouped import bucketed_map_groups

    if cfg.most_frequent_code:
        # A4: per label, keep the argmax-frequency code (ties → smallest)
        def mfc_bucket(df: pd.DataFrame) -> pd.DataFrame:
            counts = df.groupby(["label", "code"]).size().reset_index(name="cnt")
            counts = counts.sort_values(
                ["label", "cnt", "code"], ascending=[True, False, True]
            )
            best = counts.groupby("label", as_index=False, sort=False).first()
            return best[["label", "code"]]

        rows = bucketed_map_groups(rows, ["label"], mfc_bucket)
    elif cfg.adapted:
        # A5: std labels with exactly one code, plus all raw labels per code
        def adapted_bucket(df: pd.DataFrame) -> pd.DataFrame:
            std_nuniq = df[df["kind"] == "std"].groupby("label")["code"].nunique()
            single = set(std_nuniq[std_nuniq == 1].index)
            is_single = df["label"].isin(single)
            all_part = df[is_single][["label", "code"]]
            raw_part = df[~is_single & (df["kind"] == "raw")][["label", "code"]]
            return pd.concat([all_part, raw_part]).drop_duplicates()

        rows = bucketed_map_groups(rows, ["label"], adapted_bucket)
    else:
        rows = rows.map_batches(
            lambda b: b.select(["label", "code"]), batch_format="pyarrow"
        )

    # A2: group sorted distinct labels per code; M11 prefLabel; J7 chapter
    def per_code(code: str, labels: list[str]) -> list[tuple]:
        pref = select_pref_label(labels)
        uri = CONCEPT_BASE + code
        chapter = lookup(code)
        out = [
            (uri, "rdf:type", "skos:Concept", None),
            (uri, "skos:inScheme", SCHEME_URI, None),
            (uri, "skos:notation", code, None),
            (uri, "skos:prefLabel", pref, "fr"),
        ]
        if chapter:
            out.append((uri, "skos:broader", chapter, None))
        for l in labels:
            if l != pref:
                out.append((uri, "skos:altLabel", l, "fr"))
        return out

    def per_code_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out: list[tuple] = []
        for code, g in df.groupby("code", sort=False):
            out.extend(per_code(code, sorted(set(g["label"]))))
        return pd.DataFrame(out, columns=["subj", "pred", "obj", "obj_lang"]) if out else pd.DataFrame(
            {"subj": pd.Series([], dtype="object"), "pred": pd.Series([], dtype="object"),
             "obj": pd.Series([], dtype="object"), "obj_lang": pd.Series([], dtype="object")}
        )

    triples = bucketed_map_groups(rows, ["code"], per_code_bucket)

    # scheme + chapter skeleton triples (≙ :282-298 header + appendModel)
    header = [(SCHEME_URI, "rdf:type", "skos:ConceptScheme", None)]
    for uri, lo, hi in ranges:
        header.append((uri, "rdf:type", "skos:Concept", None))
        header.append((uri, "skos:inScheme", SCHEME_URI, None))
        header.append((uri, "skos:notation", f"{lo}-{hi}", None))
    header_tbl = pa.table(
        {
            "subj": pa.array([h[0] for h in header], pa.string()),
            "pred": pa.array([h[1] for h in header], pa.string()),
            "obj": pa.array([h[2] for h in header], pa.string()),
            "obj_lang": pa.array([h[3] for h in header], pa.string()),
        }
    )
    return triples.union(rd.from_arrow(header_tbl))


def sql_skos_generation(fixture_root: str) -> str:
    """DuckDB restatement of the plain-mode generator (the driver-contract
    ``skos_generation`` config: -d -cr -cs) over the fixture CSVs — an
    independent SQL derivation of M10 normalize, M11 prefLabel, J7 range
    join, A2 label grouping and the addConcept triple emission
    (EHealth2017DictionaryToSkos.java:275-379, 394-425)."""
    scheme = SCHEME_URI
    base = CONCEPT_BASE
    return f"""
WITH dict_raw AS (
  SELECT label, code, "secondCode" AS second_code
  FROM read_csv('{fixture_root}/ehealth_dictionary.csv',
                delim=';', header=true, all_varchar=true)
),
dict_rows AS (
  -- label filter mirrors the engine's falsy-label drop (oracle parity)
  SELECT label, code FROM dict_raw
  WHERE coalesce(code, '') NOT IN ('', 'NULL')
    AND coalesce(label, '') <> ''
  UNION ALL
  SELECT label, second_code AS code FROM dict_raw
  WHERE coalesce(code, '') NOT IN ('', 'NULL')
    AND coalesce(second_code, '') NOT IN ('', 'NULL')
    AND coalesce(label, '') <> ''
),
corpus_raw AS (
  SELECT * FROM read_csv('{fixture_root}/ehealth_corpus.csv',
      delim=';', header=false, all_varchar=true,
      names=['f0','f1','f2','f3','f4','f5','f6','f7','f8','f9','f10','f11'])
  WHERE f0 <> 'DocID'
),
corpus_rows AS (
  SELECT f6 AS label, f11 AS code FROM corpus_raw WHERE coalesce(f6, '') <> ''
  UNION ALL
  SELECT f10 AS label, f11 AS code FROM corpus_raw WHERE coalesce(f10, '') <> ''
),
lc AS (
  SELECT DISTINCT label,
         regexp_replace(code, '^([A-Z][0-9][0-9])([0-9][0-9]?)$', '\\1.\\2') AS code
  FROM (SELECT * FROM dict_rows UNION ALL SELECT * FROM corpus_rows)
),
ranges AS (
  SELECT column0 AS uri,
         split_part(column1, '-', 2) AS hi,
         column1 AS rng
  FROM read_csv('{fixture_root}/chapter_ranges.csv',
                delim=';', header=false, all_varchar=true)
),
prefs AS (
  SELECT code, label AS pref FROM (
    SELECT code, label, q,
      row_number() OVER (
        PARTITION BY code
        ORDER BY q DESC,
                 CASE WHEN q THEN length(label) END ASC,
                 CASE WHEN q THEN label END ASC,
                 label ASC
      ) AS rn
    FROM (
      SELECT code, label,
        -- unicode-uppercase class (not [^A-Z]) so accented French capitals
        -- count uppercase exactly like python str.isupper(); empty labels
        -- ratio 0.0 (qualifying), matching uppercase_ratio('') == 0.0
        coalesce(length(regexp_replace(label, '\\P{{Lu}}', '', 'g')) * 1.0
          / nullif(length(label), 0), 0.0) < 0.25 AS q
      FROM lc
    )
  ) WHERE rn = 1
),
chap AS (
  SELECT p.code,
         (SELECT r.uri FROM ranges r WHERE r.hi >= substr(p.code, 1, 3)
          ORDER BY r.hi LIMIT 1) AS chapter
  FROM prefs p
),
concept AS (SELECT code, '{base}' || code AS uri FROM prefs)
SELECT c.uri AS subj, 'rdf:type' AS pred, 'skos:Concept' AS obj,
       CAST(NULL AS VARCHAR) AS obj_lang FROM concept c
UNION ALL SELECT c.uri, 'skos:inScheme', '{scheme}', NULL FROM concept c
UNION ALL SELECT c.uri, 'skos:notation', c.code, NULL FROM concept c
UNION ALL SELECT c.uri, 'skos:prefLabel', p.pref, 'fr'
          FROM concept c JOIN prefs p USING (code)
UNION ALL SELECT c.uri, 'skos:broader', ch.chapter, NULL
          FROM concept c JOIN chap ch USING (code) WHERE ch.chapter IS NOT NULL
UNION ALL SELECT c.uri, 'skos:altLabel', l.label, 'fr'
          FROM concept c JOIN lc l USING (code) JOIN prefs p USING (code)
          WHERE l.label <> p.pref
UNION ALL SELECT '{scheme}', 'rdf:type', 'skos:ConceptScheme', NULL
UNION ALL SELECT r.uri, 'rdf:type', 'skos:Concept', NULL FROM ranges r
UNION ALL SELECT r.uri, 'skos:inScheme', '{scheme}', NULL FROM ranges r
UNION ALL SELECT r.uri, 'skos:notation', r.rng, NULL FROM ranges r
"""

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

"""Multilingual-ontology cleaning — the reference's third pipeline
(cli/OWLOntologyCleaner.java) as dataflow over a triples Dataset.

- ``clean_multilingual``: per (entity, property): if a literal exists in the
  target language, drop that property's literals in other languages (keep
  untagged; keep foreign when the target is absent) — M16 (:169-247).
  Applies to ALL properties (datatype AND object, matching the reference's
  full-property iteration): resource objects never carry language tags, so
  the rule is a no-op for them and no predicate allowlist is needed.
- ``repair_labels``: ONTOPNEUMO-style prefLabel synthesis: use altLabel if
  present, else camelCase-split + lowercase + elision-fix the hiddenLabel —
  M17 (:95-167).

Both group on unbounded-cardinality keys ((subj, pred) / subj), so they run
BUCKETED (hash(key)%B python invocations, vectorized pandas inside —
state/grouped.py), never one python call per key.
"""

from __future__ import annotations

import pandas as pd

from ..functions.text import repair_label
from ..state.grouped import bucketed_map_groups


def clean_multilingual(triples, target_lang: str = "en"):
    """M16: keep target-language literals per (subj, pred) when present."""

    def clean_bucket(df: pd.DataFrame) -> pd.DataFrame:
        lang = df["obj_lang"].fillna("")
        is_target = lang == target_lang
        has_target = is_target.groupby([df["subj"], df["pred"]]).transform("any")
        keep = (~has_target) | is_target | (lang == "")
        return df[keep]

    return bucketed_map_groups(triples, ["subj", "pred"], clean_bucket)


def repair_missing_pref_labels(triples):
    """M17: per entity — if no prefLabel, synthesize one from the first
    altLabel, else from the camelCase hiddenLabel via the repair chain."""

    def repair_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df[["subj", "pred", "obj", "obj_lang"]]
        have = set(df.loc[df["pred"] == "skos:prefLabel", "subj"])
        cand = df[~df["subj"].isin(have)]
        alts = (
            cand[cand["pred"] == "skos:altLabel"]
            .sort_values(["subj", "obj"])
            .groupby("subj", sort=False)["obj"]
            .first()
        )
        hidden = (
            cand[cand["pred"] == "skos:hiddenLabel"]
            .sort_values(["subj", "obj"])
            .groupby("subj", sort=False)["obj"]
            .first()
        )
        new: dict[str, str] = {s: repair_label(o) for s, o in hidden.items()}
        new.update(alts.items())  # altLabel wins over hiddenLabel
        if not new:
            return df
        add = pd.DataFrame(
            {
                "subj": list(new.keys()),
                "pred": "skos:prefLabel",
                "obj": list(new.values()),
                "obj_lang": pd.Series([None] * len(new), dtype="object"),
            }
        )
        return pd.concat([df, add], ignore_index=True)

    return bucketed_map_groups(triples, ["subj"], repair_bucket)

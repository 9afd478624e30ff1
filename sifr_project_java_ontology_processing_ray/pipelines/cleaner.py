"""Multilingual-ontology cleaning — the reference's third pipeline
(cli/OWLOntologyCleaner.java) as dataflow over a triples Dataset.

- ``clean_multilingual``: per (entity, property) group: if a literal exists
  in the target language, drop that property's literals in other languages
  (keep untagged; keep foreign when the target is absent) — M16
  (:169-247).
- ``repair_labels``: ONTOPNEUMO-style prefLabel synthesis: use altLabel if
  present, else camelCase-split + lowercase + elision-fix the hiddenLabel —
  M17 (:95-167).

Both are groupby(subj,pred)/map_groups or per-entity map_batches — there is
no shared OWLAPI ontology object to mutate.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..functions.text import repair_label

LABEL_PREDS = ("skos:prefLabel", "skos:altLabel", "rdfs:label", "rdfs:comment")


def clean_multilingual(triples: "rd.Dataset", target_lang: str = "en") -> "rd.Dataset":
    """M16: keep target-language literals per (subj, pred) when present."""

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        langs = g["obj_lang"]
        has_target = (langs == target_lang).any()
        if not has_target:
            return g  # target absent → keep everything (incl. foreign)
        keep = langs.isna() | (langs == "") | (langs == target_lang)
        return g[keep]

    def is_literal_pred(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pc.is_in(batch["pred"], value_set=pa.array(LABEL_PREDS))
        return batch.filter(mask)

    def not_literal_pred(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pc.invert(pc.is_in(batch["pred"], value_set=pa.array(LABEL_PREDS)))
        return batch.filter(mask)

    lang_triples = triples.map_batches(is_literal_pred, batch_format="pyarrow")
    other_triples = triples.map_batches(not_literal_pred, batch_format="pyarrow")
    cleaned = lang_triples.groupby(["subj", "pred"]).map_groups(
        per_group, batch_format="pandas"
    )
    return cleaned.union(other_triples)


def repair_missing_pref_labels(triples: "rd.Dataset") -> "rd.Dataset":
    """M17: per entity — if no prefLabel, synthesize one from the first
    altLabel, else from the camelCase hiddenLabel via the repair chain."""

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        if (g["pred"] == "skos:prefLabel").any():
            return g
        alts = sorted(g[g["pred"] == "skos:altLabel"]["obj"])
        hidden = sorted(g[g["pred"] == "skos:hiddenLabel"]["obj"])
        label = None
        if alts:
            label = alts[0]
        elif hidden:
            label = repair_label(hidden[0])
        if label is None:
            return g
        new = pd.DataFrame(
            [[g["subj"].iloc[0], "skos:prefLabel", label, None]],
            columns=["subj", "pred", "obj", "obj_lang"],
        )
        return pd.concat([g[["subj", "pred", "obj", "obj_lang"]], new], ignore_index=True)

    return triples.groupby("subj").map_groups(per_group, batch_format="pandas")

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

import pyarrow as pa
import ray.data as rd

from ..functions.text import repair_label

LABEL_PREDS = ("skos:prefLabel", "skos:altLabel", "rdfs:label", "rdfs:comment")


def clean_multilingual(triples: "rd.Dataset", target_lang: str = "en") -> "rd.Dataset":
    """M16: keep target-language literals per (subj, pred) when present."""

    def per_group(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        langs = g["obj_lang"]
        is_target = pc.equal(pc.coalesce(langs, pa.scalar("")), target_lang)
        if not pc.any(is_target).as_py():
            return g  # target absent → keep everything (incl. foreign)
        untagged = pc.equal(pc.coalesce(langs, pa.scalar("")), "")
        return g.filter(pc.or_(is_target, untagged))

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
        per_group, batch_format="pyarrow"
    )
    return cleaned.union(other_triples)


def repair_missing_pref_labels(triples: "rd.Dataset") -> "rd.Dataset":
    """M17: per entity — if no prefLabel, synthesize one from the first
    altLabel, else from the camelCase hiddenLabel via the repair chain."""

    def per_group(g: pa.Table) -> pa.Table:
        preds = g["pred"].to_pylist()
        if "skos:prefLabel" in preds:
            return g
        objs = g["obj"].to_pylist()
        alts = sorted(o for p, o in zip(preds, objs) if p == "skos:altLabel")
        hidden = sorted(o for p, o in zip(preds, objs) if p == "skos:hiddenLabel")
        label = alts[0] if alts else (repair_label(hidden[0]) if hidden else None)
        if label is None:
            return g
        g = g.select(["subj", "pred", "obj", "obj_lang"])
        new = pa.table(
            {
                "subj": pa.array([g["subj"][0].as_py()], pa.string()),
                "pred": pa.array(["skos:prefLabel"], pa.string()),
                "obj": pa.array([label], pa.string()),
                "obj_lang": pa.array([None], pa.string()),
            }
        )
        return pa.concat_tables([g, new])

    return triples.map_batches(
        lambda b: b.select(["subj", "pred", "obj", "obj_lang"]), batch_format="pyarrow"
    ).groupby("subj").map_groups(per_group, batch_format="pyarrow")

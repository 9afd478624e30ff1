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


def sql_multilingual_clean(fixture_root: str) -> str:
    """DuckDB restatement of the driver-contract ``multilingual_clean``
    query (clean_multilingual(target='en') → repair_missing_pref_labels)
    over the fixture triples parquet — independent SQL derivations of the
    M16 keep-lang-or-all window rule (OWLOntologyCleaner.java:169-247) and
    the M17 repair chain (:95-167): camelCase split, lowercase, elision /
    abbreviation fixes, whitespace collapse."""
    # the repair chain on min(hiddenLabel), built inside-out
    expr = "min(obj)"
    # split_camel_case: both lookaround alternatives as capture-group forms
    expr = f"regexp_replace({expr}, '([a-z0-9])([A-Z])', '\\1 \\2', 'g')"
    expr = f"regexp_replace({expr}, '([A-Z])([A-Z][a-z])', '\\1 \\2', 'g')"
    expr = f"lower({expr})"
    fixes = [(r"\bl ''", "l''"), (r"\bd ''", "d''"),
             (r"\bdlco\b", "DLCO"), (r"\bco2\b", "CO2")]
    fixes += [(rf"\b{r}\b", r.upper())
              for r in ("i", "ii", "iii", "iv", "v", "vi", "vii", "viii", "ix", "x")]
    for pat, repl in fixes:
        expr = f"regexp_replace({expr}, '{pat}', '{repl}', 'g')"
    expr = f"trim(regexp_replace({expr}, '\\s+', ' ', 'g'))"
    return f"""
WITH t AS (
  SELECT subj, pred, obj, obj_lang
  FROM read_parquet(['{fixture_root}/source_triples.parquet',
                     '{fixture_root}/cleaner_extra_triples.parquet'])
),
cleaned AS (
  SELECT subj, pred, obj, obj_lang FROM (
    SELECT *, coalesce(obj_lang, '') AS lang,
      bool_or(coalesce(obj_lang, '') = 'en')
        OVER (PARTITION BY subj, pred) AS has_target
    FROM t
  )
  WHERE (NOT has_target) OR lang = 'en' OR lang = ''
),
have AS (SELECT DISTINCT subj FROM cleaned WHERE pred = 'skos:prefLabel'),
alt_new AS (
  SELECT subj, min(obj) AS obj FROM cleaned
  WHERE pred = 'skos:altLabel' AND subj NOT IN (SELECT subj FROM have)
  GROUP BY subj
),
hid_new AS (
  SELECT subj, {expr} AS obj FROM cleaned
  WHERE pred = 'skos:hiddenLabel' AND subj NOT IN (SELECT subj FROM have)
  GROUP BY subj
)
SELECT subj, pred, obj, obj_lang FROM cleaned
UNION ALL
SELECT subj, 'skos:prefLabel' AS pred, obj, CAST(NULL AS VARCHAR) AS obj_lang
FROM alt_new
UNION ALL
SELECT subj, 'skos:prefLabel', obj, NULL FROM hid_new
WHERE subj NOT IN (SELECT subj FROM alt_new)
"""

"""Ontology reconciliation — the reference's fourth CLI
(cli/OntologyReconciler.java).

The reference ships it as a SKELETON: ``processSourceClass`` /
``processTargetClass`` only count classes, ``findSourceCodes`` returns
``Collections.emptyList()`` (OntologyReconciler.java:120-124), and the
per-class UMLS comparison survives only as the commented-out
``matchUMLSCodes`` (:230-288). This module implements the evident intent as
dataflow, reusing the enrichment machinery:

per class in BOTH models → discover CUIs through the own → altLabel-mined →
mapping cascade (the cascade ``findSourceCodes``'s javadoc describes) →
find the class code (M15 composite finder, ``codeFinder.getCode`` in the
comments) → compare the class's CUI set against the dictionary's CUIs for
that code — emitting the CUIOntologyStats-style counters the skeleton
increments plus the cardinality comparison the comments describe
(CLASSES_WITH_LESS/MORE_CUIS_THAN_UMLS, A7 analog).

Shape: bucketed subject pivot per model → one stateful actor pass (lookup
tables broadcast once) → per-batch counter partials → tiny Sum aggregate.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd

from ..functions.codes import composite_code, mine_cuis, normalize_code
from ..state.broadcast import Broadcast
from ..state.grouped import bucketed_map_groups, dataset_from_table
from .enrichment import build_enrich_tables, pivot_entities_bucket

COUNTERS = (
    "total_source_classes",
    "total_target_classes",
    "classes_with_cuis",
    "classes_without_cuis",
    "umls_codes_found",
    "classes_with_less_cuis_than_umls",
    "classes_with_more_cuis_than_umls",
    "classes_with_same_cuis_as_umls",
)


class Reconciler:
    """map_batches actor over pivoted entities (+ ``side`` column):
    per-class CUI discovery + UMLS cardinality comparison → counter
    partials (one row per batch)."""

    def __init__(self, tables_bc: Broadcast):
        self.t = tables_bc.value

    def __call__(self, batch: pa.Table) -> pa.Table:
        t = self.t
        counts = dict.fromkeys(COUNTERS, 0)
        for row in batch.to_pylist():
            side = row["side"]
            counts["total_source_classes" if side == "source" else "total_target_classes"] += 1
            cuis = set(row["own_cuis"])
            if not cuis:
                cuis = set(mine_cuis(list(row["alt_labels"])))
            if not cuis and side == "source":
                for _prop, tgt in t["src_to_targets"].get(row["entity_uri"], []):
                    cuis.update(t["tgt_cuis"].get(tgt, []))
            counts["classes_with_cuis" if cuis else "classes_without_cuis"] += 1
            code = composite_code(
                list(row["notations"]) or None,
                list(row["icd_codes"]) or None,
                list(row["icpc_codes"]) or None,
                row["entity_uri"],
            )
            if not code:
                continue
            umls_cuis = t["code_to_cuis"].get(code) or t["code_to_cuis"].get(
                normalize_code(code)
            )
            if not umls_cuis:
                continue
            counts["umls_codes_found"] += 1
            if len(umls_cuis) > len(cuis):
                counts["classes_with_less_cuis_than_umls"] += 1
            elif len(umls_cuis) < len(cuis):
                counts["classes_with_more_cuis_than_umls"] += 1
            else:
                counts["classes_with_same_cuis_as_umls"] += 1
        return pa.table({k: pa.array([v], pa.int64()) for k, v in counts.items()})


def reconcile(
    source_triples: pa.Table,
    target_triples: pa.Table,
    mrconso: pa.Table,
    mrsty: pa.Table,
    mappings: pa.Table,
    *,
    concurrency: int = 2,
) -> dict[str, int]:
    """Run the reconciliation; returns the counter dict (≙ CUIOntologyStats
    for '<source>_<target>')."""
    tables = build_enrich_tables(mrconso, mrsty, mappings, target_triples, "ENG")
    tables_bc = Broadcast.put(tables)

    def tag(side: str):
        def _tag(b: pa.Table) -> pa.Table:
            return b.append_column("side", pa.array([side] * b.num_rows, pa.string()))

        return _tag

    src = bucketed_map_groups(
        dataset_from_table(source_triples), ["subj"], pivot_entities_bucket
    ).map_batches(tag("source"), batch_format="pyarrow")
    tgt = bucketed_map_groups(
        dataset_from_table(target_triples), ["subj"], pivot_entities_bucket
    ).map_batches(tag("target"), batch_format="pyarrow")

    from ray.data.aggregate import Sum

    agg = (
        src.union(tgt)
        .map_batches(
            Reconciler,
            fn_constructor_args=(tables_bc,),
            batch_format="pyarrow",
            concurrency=concurrency,
            num_cpus=0.5,
        )
        .aggregate(*[Sum(c, alias_name=c) for c in COUNTERS])
    )
    return {c: int(agg[c] or 0) for c in COUNTERS}


def q_reconciliation(sf_dir: str):
    """Driver-contract wrapper over the ontology fixture (rows-only):
    one row per counter, deterministic order."""
    import pandas as pd

    from .. import testgen

    fx = testgen.ontology_fixture()
    mrconso, mrsty = testgen.umls_tables()
    # + reconciliation-only entities whose codes EXIST in mrconso, so the
    # UMLS comparison counters are non-vacuous (less/more/same all fire)
    src = pa.concat_tables(
        [fx["source_triples"], testgen.reconciler_extra_entities()]
    )
    counts = reconcile(
        src, fx["target_triples"], mrconso, mrsty, fx["mappings"]
    )
    return pd.DataFrame({"counter": list(COUNTERS), "value": [counts[c] for c in COUNTERS]})


def sql_reconciliation(fixture_root: str) -> str:
    """DuckDB restatement of the reconciliation counters over the fixture
    parquets — an independent SQL derivation of the per-class cascade
    (own CUIs → altLabel-mined → mapping 2-hop), the M15 composite code
    finder, M10 normalization, and the UMLS cardinality comparison."""
    preds = ", ".join(f"'{p}'" for p in (
        "skos:exactMatch", "skos:closeMatch", "skos:relatedMatch",
        "skos:broadMatch", "gold:freeTranslation", "gold:translation"))
    return f"""
WITH trip AS (
  SELECT 'source' AS side, subj, pred, obj
  FROM '{fixture_root}/source_triples.parquet'
  UNION ALL
  SELECT 'source', subj, pred, obj
  FROM '{fixture_root}/recon_extra_source.parquet'
  UNION ALL
  SELECT 'target', subj, pred, obj
  FROM '{fixture_root}/target_triples.parquet'
),
ents AS (SELECT DISTINCT side, subj FROM trip),
own AS (
  SELECT side, subj,
         count(DISTINCT regexp_replace(obj, '\\^\\^.*$', '')) AS n
  FROM trip WHERE pred = 'umls:cui' GROUP BY side, subj
),
mined AS (
  SELECT side, subj,
         count(DISTINCT regexp_replace(obj, '\\^\\^.*$', '')) AS n
  FROM trip
  WHERE pred = 'skos:altLabel'
    AND regexp_matches(regexp_replace(obj, '\\^\\^.*$', ''), '^C[0-9]{{7}}$')
  GROUP BY side, subj
),
mapped AS (
  SELECT m.source_class AS subj,
         count(DISTINCT regexp_replace(t.obj, '\\^\\^.*$', '')) AS n
  FROM '{fixture_root}/mappings.parquet' m
  JOIN trip t ON t.side = 'target' AND t.subj = m.target_class
             AND t.pred = 'umls:cui'
  WHERE m.property IN ({preds})
  GROUP BY m.source_class
),
ncuis AS (
  SELECT e.side, e.subj,
         coalesce(o.n, mi.n,
                  CASE WHEN e.side = 'source' THEN ma.n END, 0) AS n_cuis
  FROM ents e
  LEFT JOIN own o USING (side, subj)
  LEFT JOIN mined mi USING (side, subj)
  LEFT JOIN mapped ma ON e.side = 'source' AND ma.subj = e.subj
),
codes AS (
  SELECT side, subj,
    regexp_replace(
      coalesce(
        -- nullif('', ...): composite_code SKIPS falsy candidates, so an
        -- empty notation must fall through to the ICD/ICPC/URI finders
        nullif(min(CASE WHEN pred = 'skos:notation' THEN obj END), ''),
        nullif(min(CASE WHEN pred = 'icd:cdCode' THEN obj END), ''),
        nullif(min(CASE WHEN pred = 'icpc2p:ICPCCODE' THEN obj END), ''),
        nullif(split_part(regexp_extract(any_value(subj), '([^#/]*)$', 1),
                          '_', 1), '')
      ), '\\^\\^.*$', '') AS code
  FROM trip GROUP BY side, subj
),
c2c AS (
  SELECT code, count(DISTINCT cui) AS n
  FROM '{fixture_root}/mrconso.parquet'
  WHERE coalesce(code, '') <> '' GROUP BY code
),
umls AS (
  SELECT c.side, c.subj,
         coalesce(x.n, y.n) AS n_umls
  FROM codes c
  LEFT JOIN c2c x ON x.code = c.code
  LEFT JOIN c2c y ON y.code =
    regexp_replace(c.code, '^([A-Z][0-9][0-9])([0-9][0-9]?)$', '\\1.\\2')
  WHERE c.code IS NOT NULL
),
joined AS (
  SELECT n.side, n.subj, n.n_cuis, u.n_umls
  FROM ncuis n LEFT JOIN umls u USING (side, subj)
)
SELECT 'total_source_classes' AS counter,
       count(*) FILTER (side = 'source') AS value FROM joined
UNION ALL SELECT 'total_target_classes', count(*) FILTER (side = 'target') FROM joined
UNION ALL SELECT 'classes_with_cuis', count(*) FILTER (n_cuis > 0) FROM joined
UNION ALL SELECT 'classes_without_cuis', count(*) FILTER (n_cuis = 0) FROM joined
UNION ALL SELECT 'umls_codes_found', count(*) FILTER (n_umls IS NOT NULL) FROM joined
UNION ALL SELECT 'classes_with_less_cuis_than_umls',
       count(*) FILTER (n_umls > n_cuis) FROM joined
UNION ALL SELECT 'classes_with_more_cuis_than_umls',
       count(*) FILTER (n_umls IS NOT NULL AND n_umls < n_cuis) FROM joined
UNION ALL SELECT 'classes_with_same_cuis_as_umls',
       count(*) FILTER (n_umls = n_cuis) FROM joined
"""

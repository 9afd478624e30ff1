"""Corpus curation: the canonical training-data preparation chain composed
from this repo's operators —

    documents → language-ID → quality gate → exact dedup → MinHash near-dedup
              → token accounting → curated corpus + report

Every stage is a vectorized map_batches or a pre-aggregated groupby; the
whole chain streams (no full materialization of the corpus). This is the
"user switches their pipeline to this repo" composition surface.
"""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa
import ray.data as rd

from ..functions.quality import detect_lang, quality_score


def curate(
    sf_dir: str,
    *,
    keep_langs: tuple[str, ...] = ("en",),
    min_quality: float = 0.3,
    jaccard_threshold: float = 0.6,
):
    """Returns (curated_ds, report_dict). Stages annotate rather than drop
    until the final filter, so the report can count every rejection
    reason from one pass."""

    def annotate(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        det = [detect_lang(t) for t in texts]
        q = [quality_score(t) for t in texts]
        h = [hashlib.md5(t.encode()).hexdigest() for t in texts]
        toks = [len(t.split()) for t in texts]
        out = batch.append_column("detected_lang", pa.array(det, pa.string()))
        out = out.append_column("quality", pa.array(q, pa.float64()))
        out = out.append_column("content_hash", pa.array(h, pa.string()))
        return out.append_column("n_tokens", pa.array(toks, pa.int64()))

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text", "lang", "source"]
    ).map_batches(annotate, batch_format="pyarrow")

    # exact dedup: keep min doc_id per content hash
    from ray.data.aggregate import Count, Min

    keep_ids = (
        docs.groupby("content_hash")
        .aggregate(Min("doc_id", alias_name="keep_id"), Count(alias_name="copies"))
    )
    keep_df = keep_ids.to_pandas()  # dictionary-of-corpus-sized (distinct texts)
    keep_set = set(keep_df["keep_id"])
    n_exact_dups = int((keep_df["copies"] - 1).sum())

    # near-dedup victims from MinHash-LSH (pairs verified by true Jaccard)
    from .textops import q_minhash_dedup

    near = q_minhash_dedup(sf_dir)
    near_drop = {int(b) for b in near["b"]} if len(near) else set()

    import ray

    keep_ref = ray.put(keep_set - near_drop)

    def final_filter(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = ray.get(keep_ref)
        mask_keep = pa.array([d in keep for d in batch["doc_id"].to_pylist()])
        lang_ok = pc.is_in(batch["detected_lang"], value_set=pa.array(list(keep_langs)))
        q_ok = pc.greater_equal(batch["quality"], min_quality)
        return batch.filter(pc.and_(pc.and_(mask_keep, lang_ok), q_ok))

    curated = docs.map_batches(final_filter, batch_format="pyarrow")

    # report from one aggregate over the annotated stream
    from ray.data.aggregate import Sum

    def partials(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        lang_ok = pc.is_in(batch["detected_lang"], value_set=pa.array(list(keep_langs)))
        q_ok = pc.greater_equal(batch["quality"], min_quality)
        return pa.table(
            {
                "n_docs": pa.array([batch.num_rows], pa.int64()),
                "n_lang_rejected": pa.array([int(pc.sum(pc.invert(lang_ok)).as_py() or 0)], pa.int64()),
                "n_quality_rejected": pa.array(
                    [int(pc.sum(pc.and_(lang_ok, pc.invert(q_ok))).as_py() or 0)], pa.int64()
                ),
                "total_tokens": pa.array([int(pc.sum(batch["n_tokens"]).as_py() or 0)], pa.int64()),
            }
        )

    agg = docs.map_batches(partials, batch_format="pyarrow").aggregate(
        Sum("n_docs", alias_name="n_docs"),
        Sum("n_lang_rejected", alias_name="n_lang_rejected"),
        Sum("n_quality_rejected", alias_name="n_quality_rejected"),
        Sum("total_tokens", alias_name="total_tokens"),
    )
    report = {
        "n_docs": int(agg["n_docs"]),
        "n_exact_dups_removed": n_exact_dups,
        "n_near_dups_removed": len(near_drop),
        "n_lang_rejected": int(agg["n_lang_rejected"]),
        "n_quality_rejected": int(agg["n_quality_rejected"]),
        "total_tokens": int(agg["total_tokens"]),
        "n_curated": curated.count(),
    }
    return curated, report


def q_corpus_curation(sf_dir: str):
    """Driver-contract wrapper: one row per report counter (rows-only)."""
    import pandas as pd

    _, report = curate(sf_dir)
    return pd.DataFrame(
        {"counter": list(report.keys()), "value": [int(v) for v in report.values()]}
    )

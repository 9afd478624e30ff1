"""Corpus curation: the canonical training-data preparation chain composed
from this repo's operators —

    documents → language-ID → quality gate → exact dedup → MinHash near-dedup
              → token accounting → curated corpus + report

Every stage is a vectorized map_batches or a pre-aggregated groupby; the
whole chain streams (no full materialization of the corpus ON THE DRIVER —
recompute-per-consumer is chosen over object-store copies of the corpus).

Exact dedup at scale (VERDICT r1: no driver-side keep-set): a Bloom filter
over the DUPLICATED content hashes (built from mergeable per-batch partial
filters) routes each doc:

- hash ∉ bloom  → provably unique → kept without any join
- hash ∈ bloom  → real dup or ~1% false positive → resolved EXACTLY by a
  distributed left join against the (content_hash, keep_id) table; a row
  survives iff it found no keep row (FP) or it IS the keep row

so false positives only cost join work, never correctness, and driver
state is the fixed-size bloom blob (~10 bits per duplicated group).
"""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..sources import parquet_io as pio
from ..functions.hashing import BloomFilter
from ..functions.quality import detect_lang, quality_score
from ..state.broadcast import BloomRoute, merged_bloom
from ..state.partitions import join_partitions


def _docs_path(sf_dir: str) -> str:
    return os.path.join(sf_dir, "documents.parquet")


def _annotate(batch: pa.Table) -> pa.Table:
    texts = batch["text"].to_pylist()
    det = [detect_lang(t) for t in texts]
    q = [quality_score(t) for t in texts]
    h = [hashlib.md5(t.encode()).hexdigest() for t in texts]
    toks = [len(t.split()) for t in texts]
    out = batch.append_column("detected_lang", pa.array(det, pa.string()))
    out = out.append_column("quality", pa.array(q, pa.float64()))
    out = out.append_column("content_hash", pa.array(h, pa.string()))
    return out.append_column("n_tokens", pa.array(toks, pa.int64()))


def curate(
    sf_dir: str,
    *,
    keep_langs: tuple[str, ...] = ("en",),
    min_quality: float = 0.3,
    jaccard_threshold: float = 0.6,
    out_dir: str | None = None,
    num_parts: int = 16,
):
    """Returns (curated_ds, report_dict). Stages annotate rather than drop
    until the final filter, so the report can count every rejection
    reason from one pass. With ``out_dir``, the curated corpus is written
    hash-partitioned on content_hash with per-partition manifests — a
    restarted run skips completed partitions (same resume contract as the
    KG output, state/manifest.py)."""
    from ray.data.aggregate import Count, Min, Sum

    docs = pio.read_parquet(
        _docs_path(sf_dir), columns=["doc_id", "text", "lang", "source"]
    ).map_batches(_annotate, batch_format="pyarrow")

    # ---- exact-dedup keep table on a LIGHT lineage (read + md5 only) ----
    def hash_only(batch: pa.Table) -> pa.Table:
        h = [hashlib.md5(t.encode()).hexdigest() for t in batch["text"].to_pylist()]
        return pa.table({"content_hash": pa.array(h, pa.string()), "doc_id": batch["doc_id"]})

    keep_ids = (
        pio.read_parquet(_docs_path(sf_dir), columns=["doc_id", "text"])
        .map_batches(hash_only, batch_format="pyarrow")
        .groupby("content_hash")
        .aggregate(Min("doc_id", alias_name="keep_id"), Count(alias_name="copies"))
        .materialize()  # distinct-text-sized agg output, consumed 3×
    )
    n_exact_dups = int(
        keep_ids.map_batches(
            lambda b: pa.table({"d": pc.cast(pc.subtract(b["copies"], 1), pa.int64())}),
            batch_format="pyarrow",
        ).sum("d")
        or 0
    )
    dup_keep = keep_ids.map_batches(
        lambda b: b.filter(pc.greater(b["copies"], 1)).select(["content_hash", "keep_id"]),
        batch_format="pyarrow",
    )
    n_dup_groups = dup_keep.count()
    n_docs = keep_ids.count() + n_exact_dups
    # the Bloom-routed 'maybe' join side is true dups PLUS ~1% false
    # positives OF THE WHOLE CORPUS (10-bit/key filter), so the partition
    # hint must carry the corpus-proportional FP term — without it a
    # 100M-doc corpus with few dup groups gets 2 reduce tasks for a
    # ~1M-row join side
    bloom_fp_rows = n_docs // 100

    # ---- near-dedup victims from MinHash-LSH (verified true Jaccard),
    # consumed as a distributed Dataset (VERDICT r2 #3: no ray.put victim
    # set) — the 'b' side of each verified pair is dropped, resolved by the
    # same bloom-route + left-join machinery as the exact dups below ----
    from ray.data.aggregate import Count as _Count

    from .textops import minhash_verified_pairs

    victims = (
        minhash_verified_pairs(sf_dir, threshold=jaccard_threshold)
        .map_batches(lambda b: pa.table({"doc_id": b["b"]}), batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(_Count(alias_name="__vn"))  # distinct victim ids
        .map_batches(
            lambda b: pa.table(
                {"doc_id": b["doc_id"],
                 "__victim": pa.array([1] * b.num_rows, pa.int8())}
            ),
            batch_format="pyarrow",
        )
        .materialize()  # verified-victim-sized; consumed by bloom + join
    )
    n_near_dups = victims.count()

    def lang_quality(batch: pa.Table) -> pa.Table:
        lang_ok = pc.is_in(batch["detected_lang"], value_set=pa.array(list(keep_langs)))
        q_ok = pc.greater_equal(batch["quality"], min_quality)
        return batch.filter(pc.and_(lang_ok, q_ok))

    if n_dup_groups == 0:
        kept = docs
    else:
        # mergeable per-batch partial blooms over the duplicated hashes;
        # only fixed-size bitset blobs reach the driver
        cap = max(64, n_dup_groups)

        def partial_bloom(batch: pa.Table) -> pa.Table:
            bf = BloomFilter(cap)
            bf.add_many(batch["content_hash"].to_pylist())
            return pa.table({"blob": pa.array([bf.dumps()], pa.binary())})

        bloom = BloomFilter(cap)
        for row in dup_keep.map_batches(partial_bloom, batch_format="pyarrow").take_all():
            bloom.merge(BloomFilter.loads(row["blob"]))
        blob_ref = ray.put(bloom.dumps())

        clean = docs.map_batches(
            BloomRoute, fn_constructor_args=(blob_ref, "content_hash", False),
            batch_format="pyarrow", concurrency=2, num_cpus=0.5,
        )
        maybe = docs.map_batches(
            BloomRoute, fn_constructor_args=(blob_ref, "content_hash", True),
            batch_format="pyarrow", concurrency=2, num_cpus=0.5,
        )
        resolved = maybe.join(
            dup_keep, join_type="left_outer",
            num_partitions=join_partitions(rows=4 * n_dup_groups + bloom_fp_rows),
            on=("content_hash",),
        ).map_batches(
            # FP rows find no keep row (null keep_id) → unique → kept;
            # true dups survive iff they ARE the group representative
            lambda b: b.filter(
                pc.or_kleene(pc.is_null(b["keep_id"]), pc.equal(b["doc_id"], b["keep_id"]))
            ).drop_columns(["keep_id"]),
            batch_format="pyarrow",
        )
        kept = clean.union(resolved)

    if n_near_dups == 0:
        near_kept = kept
    else:
        v_blob_ref = ray.put(merged_bloom(victims, "doc_id", max(64, 2 * n_near_dups)))
        v_clean = kept.map_batches(
            BloomRoute, fn_constructor_args=(v_blob_ref, "doc_id", False),
            batch_format="pyarrow", concurrency=2, num_cpus=0.5,
        )
        v_maybe = kept.map_batches(
            BloomRoute, fn_constructor_args=(v_blob_ref, "doc_id", True),
            batch_format="pyarrow", concurrency=2, num_cpus=0.5,
        )
        v_resolved = v_maybe.join(
            victims, join_type="left_outer",
            num_partitions=join_partitions(rows=4 * n_near_dups + bloom_fp_rows),
            on=("doc_id",),
        ).map_batches(
            # FP rows find no victim row (null __victim) → kept
            lambda b: b.filter(pc.is_null(b["__victim"])).drop_columns(["__victim"]),
            batch_format="pyarrow",
        )
        near_kept = v_clean.union(v_resolved)

    curated = near_kept.map_batches(lang_quality, batch_format="pyarrow")

    # report from one aggregate over the annotated stream
    def partials(batch: pa.Table) -> pa.Table:
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
        "n_near_dups_removed": n_near_dups,
        "n_lang_rejected": int(agg["n_lang_rejected"]),
        "n_quality_rejected": int(agg["n_quality_rejected"]),
        "total_tokens": int(agg["total_tokens"]),
        "n_curated": curated.count(),
    }
    if out_dir is not None:
        from ..state import manifest as mf

        mf.write_partitioned(curated, out_dir, key_col="content_hash", num_parts=num_parts)
        mf.write_metrics(out_dir, report)
        curated = mf.read_output(out_dir)
    return curated, report


def q_corpus_curation(sf_dir: str):
    """Driver-contract wrapper: one row per report counter (rows-only)."""
    import pandas as pd

    _, report = curate(sf_dir)
    return pd.DataFrame(
        {"counter": list(report.keys()), "value": [int(v) for v in report.values()]}
    )


def q_llm_dataprep(sf_dir: str):
    """End-to-end LLM training-data preparation as ONE composed streaming
    DAG — the second flagship composition next to the KG build:

        curate (lang/quality gate + exact & near dedup)
          → context-window chunking (64-token windows, 16 overlap)
          → whitespace token counting
          → bucket-local greedy packing into 512-token sequences

    Every stage is the same operator the standalone queries verify
    (`corpus_curation`, `doc_chunks`★, `token_counts`★,
    `sequence_pack`★); this entry checks the COMPOSITION end-to-end and
    returns one row per counter. Streaming throughout: the curated
    corpus never materializes on the driver — only counters and the
    packs-sized stats frame do."""
    import pandas as pd
    import pyarrow.compute as pc

    from ..state.grouped import bucketed_map_groups
    from .textops import (
        PACK_BUCKETS,
        PACK_BUDGET,
        chunk_documents,
    )

    ds, report = curate(sf_dir)

    chunks = ds.map_batches(chunk_documents, batch_format="pyarrow")

    def with_tokens(b: pa.Table) -> pa.Table:
        trimmed = pc.utf8_trim_whitespace(b["chunk_text"])
        toks = pc.list_value_length(pc.split_pattern_regex(trimmed, r"\s+"))
        toks = pc.cast(
            pc.if_else(pc.equal(trimmed, ""), pa.scalar(0, pa.int32()), toks),
            pa.int64(),
        )
        # chunk identity: doc_id interleaved with chunk_idx keeps the
        # modulo bucketing content-independent and collision-free
        cid = pc.add(
            pc.multiply(b["doc_id"], pa.scalar(1 << 20, pa.int64())),
            pc.cast(b["chunk_idx"], pa.int64()),
        )
        bucket = pc.bit_wise_and(cid, PACK_BUCKETS - 1)
        return pa.table({"pack_bucket": bucket, "cid": cid, "n_tok": toks})

    def pack_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("cid")
        n_packs, fill = 0, 0
        n_chunks, n_tokens = len(df), int(df["n_tok"].sum())
        for t in df["n_tok"]:
            t = min(int(t), PACK_BUDGET)
            if n_packs == 0 or fill + t > PACK_BUDGET:
                n_packs += 1
                fill = t
            else:
                fill += t
        return pd.DataFrame(
            {
                "pack_bucket": [int(df["pack_bucket"].iloc[0])] if n_chunks else [],
                "n_chunks": [n_chunks] if n_chunks else [],
                "n_tokens": [n_tokens] if n_chunks else [],
                "n_packs": [n_packs] if n_chunks else [],
            }
        )

    def pack_all_keys(df: pd.DataFrame) -> pd.DataFrame:
        # a physical bucket may hold several pack_bucket keys (ADVICE r4:
        # 16 keys hashed into 64 buckets collide) — pack each key
        # independently so results are partitioning-invariant, mirroring
        # the oracled q_sequence_pack
        if df.empty:
            return pack_bucket(df)
        return pd.concat(
            [pack_bucket(g) for _, g in df.groupby("pack_bucket", sort=False)],
            ignore_index=True,
        )

    stats = bucketed_map_groups(
        chunks.map_batches(with_tokens, batch_format="pyarrow"),
        ["pack_bucket"],
        pack_all_keys,
    ).to_pandas()

    n_chunks = int(stats["n_chunks"].sum())
    n_tokens = int(stats["n_tokens"].sum())
    n_packs = int(stats["n_packs"].sum())
    fill_rate = round(n_tokens / (n_packs * PACK_BUDGET), 6) if n_packs else 0.0
    counters = dict(report)
    counters.update(
        {"n_chunks": n_chunks, "n_pack_tokens": n_tokens,
         "n_sequences": n_packs, "fill_rate_ppm": int(fill_rate * 1e6)}
    )
    return pd.DataFrame(
        {"counter": list(counters.keys()),
         "value": [int(v) for v in counters.values()]}
    )

"""Bucketed grouped execution: the scalable replacement for per-key
``groupby().map_groups`` when the key cardinality is high.

``groupby(key).map_groups(fn)`` invokes Python once per KEY — at millions of
keys that is the hot-loop-over-rows anti-pattern in disguise. The bucketed
form groups by ``hash(key) % B`` (B python invocations total) and the
callback processes a whole bucket VECTORIZED (pandas groupby inside). All
rows of a key land in one bucket, so per-key semantics are preserved
exactly; hot keys are still bounded by their own row count (salt the key
upstream if a single key exceeds a worker's memory).
"""

from __future__ import annotations

from typing import Callable

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

DEFAULT_BUCKETS = 64


def bucket_ids(batch: pa.Table, key_cols: list[str], num_buckets: int) -> pa.Array:
    """Vectorized, cross-process-stable bucket assignment: Arrow-kernel key
    assembly (cast→binary_join) + polars' seeded vectorized 64-bit hash.

    Process-stability contract (the memory-documented ``hash_pandas_object``
    trap): polars ``Series.hash`` with a fixed seed is deterministic across
    processes for a given polars build — every node in this container image
    runs the same build, so all rows of a key land in one bucket regardless
    of which task hashed them. Key columns must be string/integer typed
    (float repr drift under cast is not defended — no caller uses floats).
    """
    import polars as pl

    parts = [pc.cast(batch[c], pa.string()) for c in key_cols]
    if len(parts) == 1:
        keys = parts[0]
    else:
        keys = pc.binary_join_element_wise(
            *parts, "\x00", null_handling="replace", null_replacement="\x01null\x01"
        )
    h = pl.from_arrow(
        keys.combine_chunks() if isinstance(keys, pa.ChunkedArray) else keys
    ).hash(seed=0)
    return pa.array((h % num_buckets).cast(pl.Int32).to_numpy(), pa.int32())


def bucketed_map_groups(
    ds,
    key_cols: list[str],
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    num_buckets: int | None = None,
):
    """Apply ``fn`` (vectorized over a bucket's DataFrame; must itself
    respect per-key grouping, e.g. via ``df.groupby(key_cols)``) with only
    ``num_buckets`` python invocations (default ``DEFAULT_BUCKETS``,
    resolved at CALL time so tests can patch it)."""
    if num_buckets is None:
        num_buckets = DEFAULT_BUCKETS

    def add_bucket(batch: pa.Table) -> pa.Table:
        # strip any upstream b'pandas' metadata BEFORE the sort shuffle:
        # the reduce tasks hash block schemas for dedup, and a schema
        # carrying the pandas dict is unhashable (every reduce then
        # re-unifies schemas per block instead of early-exiting)
        batch = batch.replace_schema_metadata(None)
        if batch.num_rows == 0:
            return batch.append_column("__gbucket", pa.array([], pa.int32()))
        return batch.append_column(
            "__gbucket", bucket_ids(batch, key_cols, num_buckets)
        )

    def run_bucket(g: pa.Table) -> pa.Table:
        out = fn(g.to_pandas().drop(columns=["__gbucket"]))
        # convert back to arrow HERE and strip the b'pandas' schema
        # metadata — letting Ray convert the returned DataFrame attaches
        # it, making every downstream shuffle block ship a distinct
        # unhashable schema (defeats Ray's schema dedup; SCALE.md r4)
        if isinstance(out, pa.Table):
            return out.replace_schema_metadata(None)
        return pa.Table.from_pandas(
            out, preserve_index=False
        ).replace_schema_metadata(None)

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__gbucket")
        .map_groups(run_bucket, batch_format="pyarrow")
    )


def dataset_from_table(table: pa.Table, target_rows: int = 8192, max_blocks: int | None = None):
    """``ray.data.from_arrow`` with the table pre-sliced into blocks.

    A single arrow table becomes ONE block, which serializes every fused
    downstream map stage (the bucket-assign pass above ran 2.1× slower on
    one block than on 32 at 160k rows). Zero-copy slices sized to
    ``target_rows`` (capped at the cluster CPU count by default) restore
    read-side parallelism without a repartition shuffle."""
    import ray
    import ray.data as rd

    if max_blocks is None:
        try:
            max_blocks = int(ray.cluster_resources().get("CPU", 8))
        except Exception:
            max_blocks = 8
    n = max(1, min(max_blocks, (table.num_rows + target_rows - 1) // target_rows))
    if n == 1:
        return rd.from_arrow(table)
    step = (table.num_rows + n - 1) // n
    return rd.from_arrow(
        [table.slice(i * step, step) for i in range(n) if i * step < table.num_rows]
    )

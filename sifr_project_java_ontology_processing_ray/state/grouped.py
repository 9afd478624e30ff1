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

from ..functions.hashing import hash64

DEFAULT_BUCKETS = 64


def bucketed_map_groups(
    ds,
    key_cols: list[str],
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    num_buckets: int = DEFAULT_BUCKETS,
):
    """Apply ``fn`` (vectorized over a bucket's DataFrame; must itself
    respect per-key grouping, e.g. via ``df.groupby(key_cols)``) with only
    ``num_buckets`` python invocations."""

    def add_bucket(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("__gbucket", pa.array([], pa.int32()))
        parts = [batch[c].to_pylist() for c in key_cols]
        keys = ["\x00".join(str(v) for v in row) for row in zip(*parts)]
        buckets = pa.array([hash64(k) % num_buckets for k in keys], pa.int32())
        return batch.append_column("__gbucket", buckets)

    def run_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return fn(g.drop(columns=["__gbucket"]))

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__gbucket")
        .map_groups(run_bucket, batch_format="pandas")
    )

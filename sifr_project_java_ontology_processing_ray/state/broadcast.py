"""Broadcast small dimension tables: ``ray.put`` once on the driver, read
once per actor/task via the object store (zero re-shipping per batch).

≙ the reference's SQLUMLSDelegate + Redis cache (SQLUMLSDelegate.java:32-40):
lookup tables are data, not services.
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa
import ray


class Broadcast:
    """Wrapper around an ObjectRef that materializes lazily inside workers.

    Usage::

        bc = Broadcast.put(big_dict)            # driver, once
        ds.map_batches(Stage, fn_constructor_args=(bc,), ...)
        # in Stage.__init__(self, bc): self.table = bc.value
    """

    def __init__(self, ref: "ray.ObjectRef"):
        self._ref = ref

    @classmethod
    def put(cls, obj: Any) -> "Broadcast":
        return cls(ray.put(obj))

    @property
    def value(self) -> Any:
        # ray.get on an already-local object is a cheap shared-memory read;
        # workers on the same node share one copy in the object store.
        return ray.get(self._ref)


def merged_bloom(ds, col: str, capacity: int) -> bytes:
    """Bloom blob over ``ds[col]`` built from mergeable per-batch partial
    filters — only fixed-size bitset blobs ever reach the driver, so driver
    state is O(1) regardless of the key-set size (the curation exact-dup
    pattern, generalized)."""
    from ..functions.hashing import BloomFilter

    def partial(batch: pa.Table) -> pa.Table:
        bf = BloomFilter(capacity)
        for v in batch[col].to_pylist():
            bf.add(str(v))
        return pa.table({"blob": pa.array([bf.dumps()], pa.binary())})

    bloom = BloomFilter(capacity)
    for row in ds.map_batches(partial, batch_format="pyarrow").take_all():
        bloom.merge(BloomFilter.loads(row["blob"]))
    return bloom.dumps()


class BloomRoute:
    """Actor-pool routing stage: bloom deserialized once per actor in
    ``__init__`` (not per batch); ``__call__`` keeps the rows on one side
    of the maybe-member split of ``col``. False positives land on the
    maybe side, where an exact distributed join resolves them — FPs cost
    join work, never rows."""

    def __init__(self, blob_ref, col: str, keep_maybe: bool):
        from ..functions.hashing import BloomFilter

        self.bf = BloomFilter.loads(ray.get(blob_ref))
        self.col = col
        self.keep_maybe = keep_maybe

    def __call__(self, batch: pa.Table) -> pa.Table:
        maybe = [str(v) in self.bf for v in batch[self.col].to_pylist()]
        mask = maybe if self.keep_maybe else [not m for m in maybe]
        return batch.filter(pa.array(mask, pa.bool_()))

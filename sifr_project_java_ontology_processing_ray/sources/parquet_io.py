"""Metadata-stripped parquet reads.

pandas-written parquet embeds a ``b'pandas'`` schema-metadata blob whose
presence makes ``pyarrow.Schema`` UNHASHABLE (``hash(schema)`` raises
``unhashable type: 'dict'``). Ray Data's block unification tries
``set(schemas)`` as an early exit and falls back to a full
``unify_schemas`` per call when that raises — logging "Failed to hash the
schemas (for deduplication)" once per block set, on every stage, for the
whole pipeline. Passing an explicit metadata-less schema to
``read_parquet`` restores the O(1) dedup path end-to-end (the blocks a
read produces inherit the given schema, so nothing downstream ever sees
the pandas blob)."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import ray.data as rd


def _probe_files(paths) -> tuple[str | None, str | None]:
    """(first, last) shard paths to schema-probe. Probing BOTH ends guards
    against schema evolution across shards (a column widened or added in
    newer files): if the two footers disagree the caller must not pin a
    single schema, or every newer shard would be read with the stale one."""
    if isinstance(paths, (list, tuple)):
        first, last = paths[0], paths[-1]
    else:
        first = last = paths
    if not isinstance(first, str) or not isinstance(last, str):
        return None, None
    same = first == last
    if os.path.isdir(first):
        shards = sorted(glob.glob(os.path.join(first, "**", "*.parquet"), recursive=True))
        if not shards:
            return None, None
        first = shards[0]
        if same:  # single path (or one-element list): reuse this glob
            return first, shards[-1]
    if os.path.isdir(last):
        shards = sorted(glob.glob(os.path.join(last, "**", "*.parquet"), recursive=True))
        last = shards[-1] if shards else None
    return first, last


def _under_hive_dir(path: str) -> bool:
    # hive-partitioned layout (key=value directory components): the
    # partition column exists only in directory names, so a file-footer
    # schema would omit it while Ray still injects it into every block —
    # declared schema and actual blocks would disagree. Skip the probe.
    return any("=" in part for part in os.path.normpath(path).split(os.sep)[:-1])


def read_parquet(paths, **kwargs) -> "rd.Dataset":
    """``ray.data.read_parquet`` with the file schema pre-read (cheap
    footer-only driver-side reads of the FIRST and LAST shard) and its
    metadata stripped. Any caller-supplied ``schema`` wins;
    hive-partitioned inputs, first/last footer disagreement (schema
    evolution across shards — Ray's own per-block unification must handle
    those), and any schema-probe failure degrade to the plain read."""
    if "schema" not in kwargs:
        try:
            first, last = _probe_files(paths)
            if first is not None and not _under_hive_dir(first):
                schema = pq.read_schema(first)
                if last is not None and last != first:
                    # metadata-insensitive compare: a pandas-version blob
                    # difference is not schema evolution
                    if pq.read_schema(last).remove_metadata() != schema.remove_metadata():
                        return rd.read_parquet(paths, **kwargs)
                if schema.metadata:
                    schema = schema.remove_metadata()
                cols = kwargs.get("columns")
                if cols:
                    # the datasource applies the given schema to the
                    # column-pruned batches — it must be the pruned schema
                    import pyarrow as pa

                    schema = pa.schema([schema.field(c) for c in cols])
                kwargs["schema"] = schema
        except Exception:
            pass  # unreadable/odd input: let read_parquet surface it
    return rd.read_parquet(paths, **kwargs)

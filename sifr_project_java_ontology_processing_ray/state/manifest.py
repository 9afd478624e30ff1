"""Resumable partitioned Parquet output with per-partition lineage manifests
(north rule: exact resume from checkpoint; ≙ the reference's cache-as-
checkpoint Redis memoization, SURVEY §4 'Checkpoint / resume').

Layout::

    out_dir/
      part=0/ *.parquet
      part=1/ ...
      _manifests/part-0.json     # rows, files, content fingerprint
      _metrics.json              # run-level counters (≙ stats CSV S9)

A partition is *complete* iff its manifest exists; ``write_partitioned``
filters completed partitions out of the stream so a restarted run never
double-writes (idempotent by partition).
"""

from __future__ import annotations

import glob
import json
import os

import pyarrow.parquet as pq

from ..functions.hashing import hash64

PART_COL = "__part"


def partition_of(values, num_parts: int):
    """Stable partition ids for a list of key strings."""
    return [int(hash64(v) % num_parts) for v in values]


def completed_partitions(out_dir: str) -> set[int]:
    done = set()
    for p in glob.glob(os.path.join(out_dir, "_manifests", "part-*.json")):
        try:
            with open(p) as f:
                m = json.load(f)
            done.add(int(m["part"]))
        except (ValueError, KeyError, json.JSONDecodeError):
            continue
    return done


def write_partitioned(
    ds,
    out_dir: str,
    key_col: str,
    num_parts: int = 16,
):
    """Write ``ds`` hash-partitioned on ``key_col`` with manifests.

    Returns the set of partitions written in THIS run (completed partitions
    from a previous run are skipped)."""
    import pyarrow as pa

    os.makedirs(os.path.join(out_dir, "_manifests"), exist_ok=True)
    done = completed_partitions(out_dir)

    # A crash mid-write leaves orphan parquet files in manifest-less part
    # dirs; the retry would write NEW uuid-named files alongside them and
    # the manifest would then count both (duplicate rows on read). Purge
    # incomplete part dirs before re-writing so resume stays exactly-once.
    for part_dir in glob.glob(os.path.join(out_dir, f"{PART_COL}=*")):
        try:
            part = int(part_dir.rsplit("=", 1)[1])
        except ValueError:
            continue
        if part not in done:
            for f in glob.glob(os.path.join(part_dir, "*.parquet")):
                os.remove(f)

    def add_part(batch: pa.Table) -> pa.Table:
        parts = partition_of(batch[key_col].to_pylist(), num_parts)
        return batch.append_column(PART_COL, pa.array(parts, pa.int32()))

    ds = ds.map_batches(add_part, batch_format="pyarrow")
    if done:
        done_list = sorted(done)

        def drop_done(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            mask = pc.invert(pc.is_in(batch[PART_COL], value_set=pa.array(done_list, pa.int32())))
            return batch.filter(mask)

        ds = ds.map_batches(drop_done, batch_format="pyarrow")

    ds.write_parquet(out_dir, partition_cols=[PART_COL])

    written = set()
    for part_dir in glob.glob(os.path.join(out_dir, f"{PART_COL}=*")):
        part = int(part_dir.rsplit("=", 1)[1])
        if part in done:
            continue
        files = sorted(glob.glob(os.path.join(part_dir, "*.parquet")))
        rows = sum(pq.read_metadata(f).num_rows for f in files)
        manifest = {
            "part": part,
            "num_rows": rows,
            "files": [os.path.basename(f) for f in files],
            "key_col": key_col,
            "num_parts": num_parts,
        }
        tmp = os.path.join(out_dir, "_manifests", f"part-{part}.json.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f, sort_keys=True)
        os.replace(tmp, os.path.join(out_dir, "_manifests", f"part-{part}.json"))
        written.add(part)
    return written


def write_metrics(out_dir: str, metrics: dict) -> None:
    """Run-level counters (≙ OntologyStats CSV sink S9)."""
    os.makedirs(out_dir, exist_ok=True)
    tmp = os.path.join(out_dir, "_metrics.json.tmp")
    with open(tmp, "w") as f:
        json.dump(metrics, f, sort_keys=True, indent=1)
    os.replace(tmp, os.path.join(out_dir, "_metrics.json"))


def read_output(out_dir: str):
    """Read a partitioned output back as a Ray Dataset."""
    import ray.data as rd

    files = sorted(glob.glob(os.path.join(out_dir, f"{PART_COL}=*", "*.parquet")))
    from ..sources import parquet_io as pio

    return pio.read_parquet(files)

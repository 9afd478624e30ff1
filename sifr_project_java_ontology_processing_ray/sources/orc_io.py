"""ORC source / sink (Apache ORC via ``pyarrow.orc``).

The reference engine's loadModel/writeModel family reads and writes
whatever container its store dictates (OntologyLoader.java:41-79 /
writeModel); this engine's canonical store is parquet, and ORC is the
interchange companion for warehouse-side consumers. Design mirrors the
parquet/WARC sources:

- **Stripe-level read fan-out**: an ORC file's unit of independent IO is
  the stripe (≙ a parquet row group). The driver lists (file, stripe)
  pairs from footers only — an O(files) metadata pass, no data read —
  and each Ray task reads ONE stripe with column pruning, so a single
  large file parallelizes across the cluster instead of serializing into
  one read task (the same single-file-read trap SCALE.md documents for
  the flagship pages read).
- **Sharded idempotent write**: each write task turns one incoming batch
  into one ORC shard named by content hash — a retried task rewrites the
  SAME bytes to the SAME name, so task retries never duplicate rows. A
  ``_manifest.json`` (shard names + row counts) is written last,
  following the write-is-complete-iff-manifest-exists rule of
  ``state/manifest``.
"""

from __future__ import annotations

import glob
import hashlib
import json
import os

import pyarrow as pa
import ray.data as rd


def _orc_paths(path: str) -> list[str]:
    if os.path.isdir(path):
        out = sorted(glob.glob(os.path.join(path, "*.orc")))
        if not out:
            raise FileNotFoundError(f"no .orc files under {path}")
        return out
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    return [path]


def read_orc(path: str, columns: list[str] | None = None) -> "rd.Dataset":
    """Read an ORC file or directory of ``*.orc`` shards as a Dataset with
    one task per (file, stripe) and column pruning pushed into the ORC
    reader."""
    from pyarrow import orc

    units: list[dict] = []
    for p in _orc_paths(path):
        f = orc.ORCFile(p)  # footer/metadata only
        for s in range(f.nstripes):
            units.append({"path": p, "stripe": s})

    def read_stripe(batch: dict) -> "pa.Table":
        tables = []
        for p, s in zip(batch["path"], batch["stripe"]):
            t = orc.ORCFile(p).read_stripe(int(s), columns=columns)
            # read_stripe returns a RecordBatch on some pyarrow versions
            if isinstance(t, pa.RecordBatch):
                t = pa.Table.from_batches([t])
            tables.append(t)
        return pa.concat_tables(tables)

    # batch_size=1: one stripe per task — a stripe is already the right
    # block granularity (64MB+ by ORC default writer config)
    return rd.from_items(units).map_batches(
        read_stripe, batch_format="numpy", batch_size=1
    )


def write_orc(ds: "rd.Dataset", out_dir: str, batch_rows: int = 65536) -> dict:
    """Write ``ds`` as ORC shards under ``out_dir``; returns the manifest
    dict. Runs the write INSIDE map_batches tasks (the driver only folds
    shard names), content-hash shard names keep retries exactly-once."""
    from pyarrow import orc

    os.makedirs(out_dir, exist_ok=True)

    def write_shard(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"shard": pa.array([], pa.string()),
                             "rows": pa.array([], pa.int64())})
        sink = pa.BufferOutputStream()
        orc.write_table(batch.replace_schema_metadata(None), sink)
        buf = sink.getvalue().to_pybytes()
        name = f"part-{hashlib.blake2b(buf, digest_size=12).hexdigest()}.orc"
        tmp = os.path.join(out_dir, f".{name}.tmp")
        with open(tmp, "wb") as f:
            f.write(buf)
        os.replace(tmp, os.path.join(out_dir, name))  # atomic publish
        return pa.table({"shard": [name], "rows": [batch.num_rows]})

    shards = ds.map_batches(
        write_shard, batch_format="pyarrow", batch_size=batch_rows
    ).to_pandas()
    manifest = {
        "shards": sorted(shards["shard"].tolist()),
        "rows": int(shards["rows"].sum()),
    }
    tmp = os.path.join(out_dir, "._manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(out_dir, "_manifest.json"))
    return manifest

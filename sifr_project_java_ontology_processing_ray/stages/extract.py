"""HTML→text extraction stage (north rule stage 1).

Stateless ``map_batches`` function over zero-copy Arrow batches. Per-row
invariant (BASELINE.json input_hint): the extracted ``text`` is byte-identical
per ``url`` across runs/parallelism; rows whose ``text`` is already populated
pass through untouched (≙ skip-if-present semantics).

≙ reference ingestion: OntologyLoader.loadModel (utils/OntologyLoader.java:41-79)
reads the raw model; here the "raw model" is the HTML payload.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..functions.text import extract_text


def extract_text_batch(batch: pa.Table) -> pa.Table:
    """Fill empty ``text`` from ``html``; drop the ``html`` column (wide
    binary payloads leave the pipeline as early as possible, SURVEY §7.4)."""
    texts = batch["text"].to_pylist()
    htmls = batch["html"].to_pylist()
    out = [t if t else extract_text(h) for t, h in zip(texts, htmls)]
    result = batch.set_column(
        batch.schema.get_field_index("text"), "text", pa.array(out, pa.string())
    )
    return result.drop_columns(["html"])


def non_empty_text(batch: pa.Table) -> pa.Table:
    """Filter: keep pages with non-empty extracted text."""
    return batch.filter(pc.greater(pc.utf8_length(batch["text"]), 0))

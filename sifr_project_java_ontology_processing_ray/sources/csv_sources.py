"""CSV sources for the generator pipeline (≙ S4/S5/S6).

The reference parses ``;``-separated files with positional fields
(EHealth2017DictionaryToSkos.java:207-232, :129-147, :112-127); here each
becomes a Ray Dataset via read_csv / read_text + a vectorized projection.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.csv as pacsv
import ray.data as rd


def read_dictionary(path: str) -> "rd.Dataset":
    """S4: dictionary CSV → (label, code, second_code); skips rows with
    empty or ``NULL`` codes (EHealth2017DictionaryToSkos.java:214-216)."""

    def parse(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        cols = batch.column_names
        label, code = batch[cols[0]], batch[cols[1]]
        second = batch[cols[3]] if len(cols) > 3 else pa.nulls(batch.num_rows, pa.string())
        keep = pc.and_(
            pc.invert(pc.equal(pc.coalesce(code, pa.scalar("")), "")),
            pc.invert(pc.equal(pc.coalesce(code, pa.scalar("")), "NULL")),
        )
        t = pa.table({"label": label, "code": code, "second_code": second})
        t = t.filter(keep)
        # NULL/empty second codes → null
        sc = t["second_code"]
        sc = pc.if_else(
            pc.or_(pc.equal(pc.coalesce(sc, pa.scalar("")), ""), pc.equal(pc.coalesce(sc, pa.scalar("")), "NULL")),
            pa.nulls(t.num_rows, pa.string()),
            sc,
        )
        return t.set_column(2, "second_code", sc)

    ds = rd.read_csv(
        path,
        read_options=pacsv.ReadOptions(column_names=None),
        parse_options=pacsv.ParseOptions(delimiter=";"),
    )
    return ds.map_batches(parse, batch_format="pyarrow")


def read_corpus(path: str) -> "rd.Dataset":
    """S5: 12-field corpus CSV → (raw_label, std_label, code); header row
    (``DocID``) and short rows skipped (:129-147, consts :69-72)."""

    def parse(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        cols = batch.column_names
        if len(cols) < 12:
            return pa.table(
                {"raw_label": pa.array([], pa.string()),
                 "std_label": pa.array([], pa.string()),
                 "code": pa.array([], pa.string())}
            )
        t = pa.table(
            {"doc_id": batch[cols[0]], "raw_label": batch[cols[6]],
             "std_label": batch[cols[10]], "code": batch[cols[11]]}
        )
        t = t.filter(pc.invert(pc.equal(t["doc_id"], "DocID")))
        return t.drop_columns(["doc_id"])

    ds = rd.read_csv(
        path,
        read_options=pacsv.ReadOptions(column_names=[f"f{i}" for i in range(12)]),
        parse_options=pacsv.ParseOptions(delimiter=";"),
    )
    return ds.map_batches(parse, batch_format="pyarrow")


def read_chapter_ranges(path: str) -> list[tuple[str, str, str]]:
    """S6: tiny broadcast table (chapter_uri, lo, hi), read driver-side and
    sorted by upper bound — the reference's resource is MISSING from its
    repo (would NPE, EHealth2017DictionaryToSkos.java:112-127); the fixture
    supplies it (FIXTURES.md F7)."""
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            uri, rng = line.split(";", 1)
            lo, hi = rng.split("-", 1)
            out.append((uri, lo, hi))
    out.sort(key=lambda r: r[2])  # by upper bound (lexicographic, :394-402)
    return out

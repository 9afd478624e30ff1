"""WARC source: Common-Crawl's container format → the ``pages`` table.

Pure-python streaming parser for WARC/1.0 ``response`` records (no warcio in
this container). Each file is one read task (`rd.from_items(paths)` fan-out,
like the XML/RDF sources); at crawl scale pass the full segment listing and
let Ray schedule. Gzip handled by extension: BOTH whole-file gzip and real
Common Crawl's one-gzip-member-per-record layout decode through the same
reader (python's gzip streams concatenated members transparently);
``write_warc_cc`` produces the per-record-member layout for fixtures.
"""

from __future__ import annotations

import datetime as dt
import gzip
import io

import pyarrow as pa
import ray.data as rd

from .. import schema

_CRLF = b"\r\n"


def _open(path: str):
    if path.endswith(".gz"):
        return gzip.open(path, "rb")
    return open(path, "rb")


def parse_warc(stream: io.BufferedIOBase):
    """Yield (url, timestamp, payload_bytes) for each response record."""
    while True:
        # skip blank lines between records
        line = stream.readline()
        if not line:
            return
        if not line.strip():
            continue
        if not line.startswith(b"WARC/"):
            # not a record boundary — skip garbage until next record
            continue
        headers: dict[str, str] = {}
        while True:
            h = stream.readline()
            if not h or h == _CRLF or h == b"\n":
                break
            if b":" in h:
                k, v = h.split(b":", 1)
                headers[k.strip().decode("latin-1").lower()] = v.strip().decode("latin-1")
        length = int(headers.get("content-length", "0"))
        payload = stream.read(length)
        if headers.get("warc-type") == "response":
            url = headers.get("warc-target-uri", "")
            ts_raw = headers.get("warc-date", "")
            try:
                ts = dt.datetime.fromisoformat(ts_raw.replace("Z", "+00:00")).replace(tzinfo=None)
            except ValueError:
                ts = None
            # strip the HTTP response header block if present
            if payload.startswith(b"HTTP/"):
                sep = payload.find(b"\r\n\r\n")
                if sep != -1:
                    payload = payload[sep + 4 :]
            yield url, ts, payload


def read_warc(paths: str | list[str]) -> "rd.Dataset":
    """WARC file paths → pages Dataset (url, warc_ts, html, text='', lang='').
    The extractor stage fills ``text`` downstream."""
    if isinstance(paths, str):
        paths = [paths]

    def parse_files(batch: pa.Table) -> pa.Table:
        urls, tss, payloads = [], [], []
        for path in batch["path"].to_pylist():
            with _open(path) as f:
                for url, ts, payload in parse_warc(f):
                    urls.append(url)
                    tss.append(ts)
                    payloads.append(payload)
        n = len(urls)
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(tss, pa.timestamp("us")),
                "html": pa.array(payloads, pa.binary()),
                "text": pa.array([""] * n, pa.string()),
                "lang": pa.array([""] * n, pa.string()),
            },
            schema=schema.PAGES,
        )

    return rd.from_items([{"path": p} for p in paths]).map_batches(
        parse_files, batch_format="pyarrow", batch_size=1
    )


def _record_bytes(url: str, ts: "dt.datetime | None", payload: bytes) -> bytes:
    ts_s = (ts or dt.datetime(2024, 1, 1)).strftime("%Y-%m-%dT%H:%M:%SZ")
    http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + payload
    head = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        + f"WARC-Target-URI: {url}\r\n".encode()
        + f"WARC-Date: {ts_s}\r\n".encode()
        + f"Content-Length: {len(http)}\r\n".encode()
        + _CRLF
    )
    return head + http + _CRLF + _CRLF


def write_warc(rows: list[tuple[str, "dt.datetime", bytes]], path: str) -> None:
    """Minimal WARC writer for fixtures/round-trip tests (whole-file gzip
    when the path ends in .gz)."""
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "wb") as f:
        for url, ts, payload in rows:
            f.write(_record_bytes(url, ts, payload))


def write_warc_cc(rows: list[tuple[str, "dt.datetime", bytes]], path: str) -> None:
    """Real Common-Crawl layout: ONE GZIP MEMBER PER RECORD, concatenated.
    ``read_warc`` decodes it through the same gzip stream (multi-member)."""
    with open(path, "wb") as f:
        for url, ts, payload in rows:
            f.write(gzip.compress(_record_bytes(url, ts, payload)))

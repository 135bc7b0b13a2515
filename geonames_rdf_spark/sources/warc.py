"""WARC source/sink for Common-Crawl-style page archives.

The north-star corpus is Common-Crawl-shaped, and Common Crawl's native
container is WARC: thousands of ~1 GB ``*.warc.gz`` members, each a
sequence of records (``WARC/1.0`` header block, CRLF-separated headers,
``Content-Length``-delimited body).  Spark has no WARC reader;
``read_warc`` implements one the same way as the zip TSV source:
``binaryFile`` scan + stdlib parsing inside ``mapInPandas``.

Scale shape: gzip'd WARC is non-splittable, so one archive == one task —
which matches the format's OWN design (Common Crawl shards a crawl into
~64k archives precisely so consumers parallelize by file).  Records of
``WARC-Type: response`` yield (url, warc_ts, html) — the page-table
schema the pipeline ingests (``lang`` is not in WARC; run
``textstats.lang_id`` downstream or join crawl metadata).

``write_warc`` emits standards-shaped records (response type, target
URI, date, an HTTP/1.1 200 preamble) so fixtures round-trip and a KG run
can archive its input slice in the format crawlers exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_CRLF = b"\r\n"


def _parse_records(data: bytes):
    """Yield (headers: dict, body: bytes) per WARC record."""
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record blank lines
        while data.startswith(_CRLF, pos):
            pos += 2
        if pos >= n:
            return
        head_end = data.find(_CRLF + _CRLF, pos)
        if head_end < 0:
            return
        head = data[pos:head_end].decode("utf-8", "replace")
        lines = head.split("\r\n")
        if not lines or not lines[0].startswith("WARC/"):
            raise ValueError(
                f"read_warc: expected a WARC/x.y version line at byte"
                f" {pos}, got {lines[0][:60]!r} — not a WARC file?")
        headers = {}
        for ln in lines[1:]:
            k, _, v = ln.partition(":")
            headers[k.strip().lower()] = v.strip()
        length = int(headers.get("content-length", "0"))
        body_start = head_end + 4
        body = data[body_start:body_start + length]
        yield headers, body
        pos = body_start + length


def _http_body(payload: bytes) -> bytes:
    """Strip the HTTP response preamble from a response record payload."""
    if payload.startswith(b"HTTP/"):
        sep = payload.find(_CRLF + _CRLF)
        if sep >= 0:
            return payload[sep + 4:]
    return payload


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """(url, warc_ts timestamp, html binary) from the ``response``
    records of WARC archives at ``path`` (glob ok; ``.gz`` handled)."""
    import gzip

    import pandas as pd

    bins = spark.read.format("binaryFile").load(path).select(
        "path", "content")

    def parse(batches):
        for pdf in batches:
            for p, content in zip(pdf["path"], pdf["content"]):
                raw = bytes(content)
                if p.endswith(".gz"):
                    raw = gzip.decompress(raw)
                urls, tss, bodies = [], [], []
                for headers, body in _parse_records(raw):
                    if headers.get("warc-type") != "response":
                        continue
                    urls.append(headers.get("warc-target-uri"))
                    tss.append(pd.Timestamp(headers.get("warc-date")))
                    bodies.append(_http_body(body))
                yield pd.DataFrame(
                    {"url": urls, "warc_ts": tss, "html": bodies})

    return bins.mapInPandas(
        parse, schema="url string, warc_ts timestamp, html binary")


def write_warc(pages: DataFrame, path: str, gz: bool = True,
               url_col: str = "url", ts_col: str = "warc_ts",
               html_col: str = "html") -> None:
    """Write pages as one WARC archive per input partition under
    ``path`` (``part-N.warc[.gz]``) — the sink side of the format, used
    for fixtures and for archiving a processed slice."""
    import gzip
    import os

    os.makedirs(path, exist_ok=True)

    def writer(batches):
        import uuid

        import pandas as pd
        from pyspark import TaskContext

        chunks = []
        for pdf in batches:
            for url, ts, html in zip(pdf[url_col], pdf[ts_col],
                                     pdf[html_col]):
                body = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                        b"\r\n" + bytes(html))
                ts = pd.Timestamp(ts)
                head = (
                    "WARC/1.0\r\n"
                    "WARC-Type: response\r\n"
                    f"WARC-Target-URI: {url}\r\n"
                    f"WARC-Date: {ts.strftime('%Y-%m-%dT%H:%M:%SZ')}\r\n"
                    f"WARC-Record-ID: <urn:uuid:"
                    f"{uuid.uuid5(uuid.NAMESPACE_URL, str(url))}>\r\n"
                    f"Content-Length: {len(body)}\r\n\r\n"
                ).encode()
                chunks.append(head + body + b"\r\n\r\n")
        if chunks:
            data = b"".join(chunks)
            if gz:
                data = gzip.compress(data)
            pid = TaskContext.get().partitionId()
            name = f"part-{pid:05d}.warc" + (".gz" if gz else "")
            with open(os.path.join(path, name), "wb") as f:
                f.write(data)
        yield pd.DataFrame({"_": pd.Series([], dtype="int64")})

    pages.select(url_col, ts_col, html_col).mapInPandas(
        writer, schema="_ bigint").count()

"""Measure read_warc's per-task memory bound: streaming vs whole-decompress.

Builds a synthetic multi-hundred-MB (decompressed) ``.warc.gz``, then
parses it twice in SEPARATE child processes (so ru_maxrss high-water
marks don't contaminate each other):

  * ``whole``  — the pre-r05 shape: gzip.decompress the entire archive,
    accumulate every body, build one DataFrame.
  * ``stream`` — the shipped shape: gzip.GzipFile incremental parse,
    batches flushed every 64 MB of body payload.

Prints one JSON line with decompressed size and peak RSS per mode.
Usage: python3 scripts/warc_mem.py [n_records] [body_kb]
"""
from __future__ import annotations

import gzip
import io
import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build_archive(path: str, n: int, body_kb: int) -> int:
    """Deterministic synthetic archive; returns decompressed bytes."""
    total = 0
    with gzip.open(path, "wb", compresslevel=1) as f:
        for i in range(n):
            # low-compressibility body so the gz file is also sizeable
            body = (b"HTTP/1.1 200 OK\r\n\r\n<html>" +
                    os.urandom(body_kb * 1024) + b"</html>")
            head = (f"WARC/1.0\r\nWARC-Type: response\r\n"
                    f"WARC-Target-URI: http://ex.org/{i}\r\n"
                    f"WARC-Date: 2026-01-01T00:00:00Z\r\n"
                    f"Content-Length: {len(body)}\r\n\r\n").encode()
            rec = head + body + b"\r\n\r\n"
            f.write(rec)
            total += len(rec)
    return total


def _child(mode: str, path: str) -> None:
    import resource

    import pandas as pd

    from geonames_rdf_spark.sources.warc import _http_body, _parse_records

    raw = open(path, "rb").read()  # binaryFile hands us compressed bytes
    rows = 0
    if mode == "whole":
        data = gzip.decompress(raw)
        urls, bodies = [], []
        for headers, body in _parse_records(io.BytesIO(data)):
            urls.append(headers.get("warc-target-uri"))
            bodies.append(_http_body(body))
        rows = len(pd.DataFrame({"url": urls, "html": bodies}))
    else:
        stream = gzip.GzipFile(fileobj=io.BytesIO(raw))
        urls, bodies, pending = [], [], 0
        for headers, body in _parse_records(stream):
            urls.append(headers.get("warc-target-uri"))
            bodies.append(_http_body(body))
            pending += len(bodies[-1])
            if pending >= 64 << 20:
                rows += len(pd.DataFrame({"url": urls, "html": bodies}))
                urls, bodies, pending = [], [], 0
        rows += len(pd.DataFrame({"url": urls, "html": bodies}))
    peak_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
    print(json.dumps({"mode": mode, "rows": rows,
                      "peak_rss_mb": round(peak_mb, 1)}))


def main() -> None:
    if len(sys.argv) >= 2 and sys.argv[1] in ("whole", "stream"):
        _child(sys.argv[1], sys.argv[2])
        return
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    kb = int(sys.argv[2]) if len(sys.argv) > 2 else 96
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "synth.warc.gz")
        decompressed = build_archive(path, n, kb)
        out = {"decompressed_mb": round(decompressed / 2**20, 1),
               "compressed_mb": round(os.path.getsize(path) / 2**20, 1)}
        for mode in ("whole", "stream"):
            r = subprocess.run(
                [sys.executable, __file__, mode, path],
                capture_output=True, text=True, check=True)
            out[mode] = json.loads(r.stdout.strip().splitlines()[-1])
        print(json.dumps(out))


if __name__ == "__main__":
    main()

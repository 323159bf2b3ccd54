"""WARC source (ISO 28500 — the Common Crawl container format).

A web-scale extraction engine ingests crawls, and crawls ship as WARC:
a sequence of records, each a header block (``WARC/1.0`` version line
+ ``Name: value`` headers, CRLF-terminated, blank-line-ended) followed
by exactly ``Content-Length`` payload bytes and a ``\\r\\n\\r\\n``
trailer.  ``response`` records carry an HTTP response as payload
(status line + headers + blank line + body).

From-scratch implementation of the PUBLIC spec (no code copied, no
external library):

* :func:`parse_warc_records` — length-driven record walk: the payload
  is sliced by ``Content-Length``, NEVER scanned for delimiters, so
  bodies containing ``WARC/1.0`` cannot desynchronize the stream (the
  same honesty rule as the PDF reader's /Length slicing).  Records
  with malformed headers or truncated payloads are surfaced through a
  ``malformed`` count, not silently skipped.  Handles plain bytes and
  gzip (both whole-file and the per-record-member concatenation
  Common Crawl uses — ``zlib`` multi-member loop).
* :func:`warc_bytes` — a deterministic minimal writer (datagen/tests):
  emits warcinfo + response records in the exact subset the reader
  handles, giving a byte-exact round-trip contract.
* :func:`read_warc` — the Spark operator: ``binaryFile`` scan →
  Arrow-batched ``mapInPandas`` record split →
  ``(warc_file, url, content_type, html, file_malformed)`` rows.  One
  narrow stage; at corpus scale parallelism comes from the file count
  (crawls ship as many ~1 GB segments), the same unit real WARC
  pipelines parallelize on.
"""

from __future__ import annotations

import gzip
import io
import zlib

import pandas as pd  # module-level: pandas_udf/mapInPandas type hints

from pyspark.sql import DataFrame, SparkSession

_CRLF = b"\r\n"


_GZ_CHUNK = 1 << 20


def _decompress_if_gzip(data: bytes) -> tuple[bytes, int]:
    """Whole-file or concatenated-member gzip → ``(plain bytes,
    bad_members)``.  A corrupt OR truncated member is COUNTED and the
    members already decoded are kept — damage must surface through
    the malformed count, never kill the Spark task.  Truncation does
    NOT raise from zlib (it just stops short), so member completeness
    is checked via ``d.eof``.  Each member is fed bounded chunks of a
    memoryview: a whole-tail feed leaves ``unused_data`` as a copy of
    the entire remainder per member — quadratic over a Common Crawl
    segment's ~10⁵ members — whereas chunked feeding bounds every
    copy at the chunk size (linear)."""
    if not data.startswith(b"\x1f\x8b"):
        return data, 0
    out = []
    bad = 0
    view = memoryview(data)
    n = len(data)
    pos = 0
    in_failure = False  # one damage REGION counts once, not per resync try
    while pos < n and data.startswith(b"\x1f\x8b", pos):
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        mpos = pos
        out_mark = len(out)
        ok = True
        try:
            while not d.eof and mpos < n:
                chunk = view[mpos : mpos + _GZ_CHUNK]
                out.append(d.decompress(chunk))
                mpos += len(chunk)
        except zlib.error:
            ok = False
        if ok and not d.eof:
            ok = False  # truncated member: ran out of bytes mid-stream
        if not ok:
            # DROP the failed member's partial output: bytes decoded
            # before the corruption point can contain a plausible
            # record header whose Content-Length would swallow the
            # next good member's records in the length-driven walk
            del out[out_mark:]
            if not in_failure:
                bad += 1  # count the damage event; false gzip magics
                in_failure = True  # inside it must not inflate the metric
            # RESYNC: one corrupt member must not drop the rest of a
            # 10⁵-member segment — scan for the next gzip magic and
            # continue (pos strictly advances, so the walk terminates)
            nxt = data.find(b"\x1f\x8b", pos + 2)
            if nxt == -1:
                return b"".join(out), bad
            pos = nxt
            continue
        in_failure = False
        pos = mpos - len(d.unused_data)
    if 0 < pos < n and not data.startswith(b"\x1f\x8b", pos):
        bad += 1  # trailing non-gzip garbage after the last member
    return b"".join(out), bad


def parse_warc_records(data: bytes):
    """``(records, malformed)`` — records as ``(headers: dict,
    payload: bytes)`` per well-formed record; use :func:`parse_warc`
    for the response-rows wrapper."""
    data, malformed = _decompress_if_gzip(data)
    pos, n = 0, len(data)
    records = []
    while pos < n:
        # skip inter-record blank lines
        while data.startswith(_CRLF, pos):
            pos += 2
        if pos >= n:
            break
        if not data.startswith(b"WARC/", pos):
            malformed += 1
            nxt = data.find(_CRLF + _CRLF + b"WARC/", pos)
            if nxt == -1:
                break
            pos = nxt + 4
            continue
        hdr_end = data.find(_CRLF + _CRLF, pos)
        if hdr_end == -1:
            malformed += 1
            break
        headers: dict[str, str] = {}
        lines = data[pos:hdr_end].split(_CRLF)
        for line in lines[1:]:  # lines[0] = version
            name, _, value = line.partition(b":")
            if value:
                headers[name.strip().decode("latin-1").lower()] = (
                    value.strip().decode("latin-1")
                )
        try:
            length = int(headers.get("content-length", ""))
            if length < 0:
                raise ValueError("negative Content-Length")
        except ValueError:
            malformed += 1
            nxt = data.find(_CRLF + _CRLF + b"WARC/", hdr_end + 4)
            if nxt == -1:
                break
            pos = nxt + 4
            continue
        body_start = hdr_end + 4
        body_end = body_start + length
        if body_end > n:
            malformed += 1
            break
        records.append((headers, data[body_start:body_end]))
        pos = body_end
    return records, malformed


def _split_http_payload(payload: bytes) -> tuple[str, bytes]:
    """(content_type, body) from an HTTP response payload; a payload
    without an HTTP header block is treated as a bare body."""
    if not payload.startswith(b"HTTP/"):
        return "", payload
    sep = payload.find(_CRLF + _CRLF)
    if sep == -1:
        return "", payload
    ctype = ""
    for line in payload[:sep].split(_CRLF)[1:]:
        name, _, value = line.partition(b":")
        if name.strip().lower() == b"content-type" and value:
            ctype = value.strip().decode("latin-1")
    return ctype, payload[sep + 4 :]


def parse_warc(data: bytes):
    """``(rows, malformed)`` where rows are
    ``(url, content_type, body_text)`` for each ``response`` record
    (non-response records — warcinfo, request, metadata — are
    skipped by design, as every public WARC consumer does)."""
    records, malformed = parse_warc_records(data)
    rows = []
    for headers, payload in records:
        if headers.get("warc-type") != "response":
            continue
        url = headers.get("warc-target-uri", "")
        ctype, body = _split_http_payload(payload)
        rows.append((url, ctype, body.decode("utf-8", errors="replace")))
    return rows, malformed


def warc_bytes(
    pages: list[tuple[str, str]],
    compress: bool = False,
    per_record_gzip: bool = False,
) -> bytes:
    """Deterministic minimal WARC: one warcinfo record + one
    ``response`` record per ``(url, html)`` page.  ``per_record_gzip``
    emits each record as its own gzip member (the Common Crawl
    layout); ``compress`` gzips the whole file."""

    def record(rtype: str, extra: list[tuple[str, str]], payload: bytes) -> bytes:
        head = [b"WARC/1.0"]
        head.append(b"WARC-Type: " + rtype.encode())
        for k, v in extra:
            head.append(f"{k}: {v}".encode())
        head.append(b"Content-Length: %d" % len(payload))
        return _CRLF.join(head) + _CRLF + _CRLF + payload + _CRLF + _CRLF

    def gz(b: bytes) -> bytes:
        buf = io.BytesIO()
        with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as f:
            f.write(b)
        return buf.getvalue()

    out = []
    info = b"software: mini-html-parser-spark\r\n"
    out.append(record("warcinfo", [("WARC-Record-ID", "<urn:rec:0>")], info))
    for i, (url, html) in enumerate(pages, start=1):
        body = html.encode("utf-8")
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n"
            b"Content-Length: %d\r\n\r\n" % len(body)
        ) + body
        out.append(
            record(
                "response",
                [
                    ("WARC-Record-ID", f"<urn:rec:{i}>"),
                    ("WARC-Target-URI", url),
                ],
                http,
            )
        )
    if per_record_gzip:
        return b"".join(gz(r) for r in out)
    blob = b"".join(out)
    return gz(blob) if compress else blob


WARC_ROW_SCHEMA = (
    "warc_file string, url string, content_type string, "
    "html string, file_malformed int"
)


def read_warc(
    spark: SparkSession, path: str, repartition_files: int | None = None
) -> DataFrame:
    """WARC segments → ``(warc_file, url, content_type, html,
    file_malformed)`` rows.  ``binaryFile`` scan (one row per segment —
    crawls ship as many ~1 GB files, the natural parallel unit) then
    one Arrow-batched record split.  ``file_malformed`` is PER-FILE
    semantics made explicit at the schema level (ADVICE r4): it
    replicates the file's bad-record count onto every row of that
    file — aggregate it with ``groupBy(warc_file).agg(max(...))``,
    never ``sum`` over rows.  Files with zero parsed pages but damage
    still surface as a single null-url row carrying the count."""

    def split(batches):
        for pdf in batches:
            rows = []
            for fname, blob in zip(pdf["path"], pdf["content"]):
                pages, malformed = parse_warc(bytes(blob))
                for url, ctype, html in pages:
                    rows.append(
                        {
                            "warc_file": fname,
                            "url": url,
                            "content_type": ctype,
                            "html": html,
                            "file_malformed": malformed,
                        }
                    )
                if not pages and malformed:
                    rows.append(
                        {
                            "warc_file": fname,
                            "url": None,
                            "content_type": "",
                            "html": "",
                            "file_malformed": malformed,
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "warc_file", "url", "content_type", "html", "file_malformed",
                ],
            )

    files = spark.read.format("binaryFile").load(path).select("path", "content")
    if repartition_files:
        # many-SMALL-segments layouts only: the binaryFile index packs
        # files up to maxPartitionBytes per split, so a dir of 8 MB
        # segments parses on ~2 cores.  One round-robin shuffle of the
        # raw bytes rebalances the CPU-heavy parse (cheap relative to
        # parse+extract).  Production crawls ship ~1 GB segments,
        # where one file = one split already — leave this unset there.
        files = files.repartition(repartition_files)
    return files.mapInPandas(split, WARC_ROW_SCHEMA)

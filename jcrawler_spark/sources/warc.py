"""WARC ingest source: distributed Common-Crawl-style WARC → pages rows.

The reference acquires pages by live HTTP fetch (JCrawler.java:1271-1340)
and persists them to its slug-path disk cache; the batch-analytics analogue
at 10^10-URL scale is ingesting pre-crawled web archives — Common Crawl
ships them as WARC/1.0 files (ISO 28500): concatenated records, each
usually an independent gzip member, ~1 GB per file. This module parses
that format into the authoritative input table shape
``pages(url, warc_ts, html, text, lang, ...)`` (schemas.PAGES), so a crawl
can be seeded/resumed from an archive instead of the network
(CachedFetcher over the result gives replay crawls, operators/fetch.py).

Scale shape: the unit of parallelism is the WARC *file* —
``spark.read.format("binaryFile")`` gives one task per file, the standard
Common-Crawl processing layout (gzip members are not splittable without an
index; 100 TB ≈ 100k files ≫ cores, so file-granularity keeps every
executor busy). Each task holds ONE decompressed file at a time and emits
records via Arrow-batched ``mapInPandas`` — bytes never visit the driver.
Derived columns (host, url_hash, fetch_ts) are added JVM-side with the
urlops Column helpers; text/lang stay NULL for the extraction operators.

The parser is record-exact: WARC header block, ``Content-Length``-bounded
content block, the mandatory CRLF CRLF record separator, multi-member gzip,
and the embedded HTTP response (status line, headers, optional chunked
transfer-encoding). Malformed input raises loudly with the byte offset —
a truncated archive must never silently drop tail records.
"""

from __future__ import annotations

import base64
import datetime as _dt
import gzip
import hashlib
import io
import uuid
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from jcrawler_spark.functions import urlops

_CRLF = b"\r\n"
_WARC_DATE_FMT = "%Y-%m-%dT%H:%M:%SZ"

# urn:uuid namespace for deterministic record ids (uuid5 of url|date) —
# deterministic so the writer is reproducible for goldens/oracles.
_RECORD_NS = uuid.UUID("6ba7b811-9dad-11d1-80b4-00c04fd430c8")  # uuid URL ns


# ---------------------------------------------------------------------------
# writer (test/fixture synthesis — also what the contract oracle pins)
# ---------------------------------------------------------------------------

def _format_warc_date(date: _dt.datetime) -> str:
    """UTC 'Z' form; naive input is taken AS UTC (callers that hold a
    session-local wall time must convert first — write_warc_files does,
    JVM-side). Microseconds are kept when present (WARC/1.1 allows
    fractional seconds; whole-second dates stay in the 1.0 form)."""
    if date.tzinfo is not None:
        date = date.astimezone(_dt.timezone.utc).replace(tzinfo=None)
    if date.microsecond:
        return date.strftime("%Y-%m-%dT%H:%M:%S.%fZ")
    return date.strftime(_WARC_DATE_FMT)


def _parse_warc_date(s: str) -> _dt.datetime:
    """Tolerant WARC-Date parse (1.0 whole-second, 1.1 fractional, any
    ISO-8601 offset) → tz-AWARE UTC datetime, so the instant survives any
    reader session timezone."""
    d = _dt.datetime.fromisoformat(s.replace("Z", "+00:00"))
    if d.tzinfo is None:
        d = d.replace(tzinfo=_dt.timezone.utc)
    return d.astimezone(_dt.timezone.utc)


def build_record(
    record_type: str,
    content_type: str,
    block: bytes,
    *,
    target_uri: str | None = None,
    date: _dt.datetime | None = None,
) -> bytes:
    """Serialize one WARC/1.0 record (headers + block + separator)."""
    date = date or _dt.datetime(2000, 1, 1)
    rid = uuid.uuid5(_RECORD_NS, f"{record_type}|{target_uri}|{date.isoformat()}")
    headers = [
        b"WARC/1.0",
        b"WARC-Type: " + record_type.encode("ascii"),
        b"WARC-Record-ID: <urn:uuid:" + str(rid).encode("ascii") + b">",
        b"WARC-Date: " + _format_warc_date(date).encode("ascii"),
    ]
    if target_uri is not None:
        headers.append(b"WARC-Target-URI: " + target_uri.encode("utf-8"))
    headers.append(b"Content-Type: " + content_type.encode("ascii"))
    headers.append(b"Content-Length: " + str(len(block)).encode("ascii"))
    return _CRLF.join(headers) + _CRLF + _CRLF + block + _CRLF + _CRLF


def build_http_response(
    body: bytes,
    status: int = 200,
    content_type: str = "text/html; charset=utf-8",
    location: str | None = None,
) -> bytes:
    """Serialize the HTTP response block a 'response' record wraps."""
    reason = {200: "OK", 301: "Moved Permanently", 404: "Not Found"}.get(
        status, "Status"
    )
    lines = [
        f"HTTP/1.1 {status} {reason}".encode("ascii"),
        b"Content-Type: " + content_type.encode("ascii"),
        b"Content-Length: " + str(len(body)).encode("ascii"),
    ]
    if location is not None:
        lines.append(b"Location: " + location.encode("utf-8"))
    return _CRLF.join(lines) + _CRLF + _CRLF + body


def build_warc(
    pages: list[dict],
    *,
    gzip_per_record: bool = True,
    warcinfo: bool = True,
    with_requests: bool = False,
) -> bytes:
    """Build a deterministic WARC file (bytes) from page dicts with keys
    ``url``, ``body`` (bytes), optional ``date``/``status``/``content_type``/
    ``location``. Per-record gzip members by default (the Common Crawl
    layout); ``warcinfo``/``with_requests`` interleave the non-response
    record types a real archive carries (the reader must skip them)."""
    records: list[bytes] = []
    if warcinfo:
        info = b"software: jcrawler-spark-synthetic\r\n"
        records.append(
            build_record("warcinfo", "application/warc-fields", info)
        )
    for p in pages:
        date = p.get("date") or _dt.datetime(2000, 1, 1)
        if with_requests:
            req = (
                b"GET / HTTP/1.1\r\nHost: x\r\n\r\n"
            )
            records.append(
                build_record(
                    "request",
                    "application/http; msgtype=request",
                    req,
                    target_uri=p["url"],
                    date=date,
                )
            )
        http = build_http_response(
            p["body"],
            status=p.get("status", 200),
            content_type=p.get("content_type", "text/html; charset=utf-8"),
            location=p.get("location"),
        )
        records.append(
            build_record(
                "response",
                "application/http; msgtype=response",
                http,
                target_uri=p["url"],
                date=date,
            )
        )
    if not gzip_per_record:
        return b"".join(records)
    out = io.BytesIO()
    for rec in records:
        # mtime=0 keeps the member bytes deterministic
        out.write(gzip.compress(rec, compresslevel=6, mtime=0))
    return out.getvalue()


# ---------------------------------------------------------------------------
# parser
# ---------------------------------------------------------------------------

def _gunzip_members(data: bytes) -> bytes:
    """Decompress ALL concatenated gzip members (zlib stops at member
    boundaries; Common Crawl writes one member per record)."""
    out = io.BytesIO()
    rest = data
    while rest:
        d = zlib.decompressobj(wbits=31)
        out.write(d.decompress(rest))
        out.write(d.flush())
        if not d.eof:
            raise ValueError(
                "truncated gzip member in WARC stream "
                f"({len(rest)} bytes remaining)"
            )
        rest = d.unused_data
    return out.getvalue()


def _parse_headers(head: bytes) -> dict[str, str]:
    """Parse WARC or HTTP header lines (after the version/status line) into
    a lower-cased dict. Values decode as UTF-8 (WARC header values —
    WARC-Target-URI in particular — are UTF-8 per ISO 28500, and this
    module writes them that way, so the round trip is an identity for
    IRIs) with latin-1 fallback for raw captured HTTP headers. No
    continuation-line support — neither WARC writers in the wild nor this
    module emit them; loud if seen."""
    headers: dict[str, str] = {}
    for line in head.split(_CRLF):
        if not line:
            continue
        if line[0:1] in (b" ", b"\t"):
            raise ValueError(f"unsupported header continuation line: {line!r}")
        k, _, v = line.partition(b":")
        try:
            value = v.decode("utf-8")
        except UnicodeDecodeError:
            value = v.decode("latin-1")
        headers[k.decode("latin-1").strip().lower()] = value.strip()
    return headers


def _dechunk(body: bytes) -> bytes:
    """Decode an HTTP/1.1 chunked transfer-encoding body."""
    out = io.BytesIO()
    pos = 0
    while True:
        nl = body.find(_CRLF, pos)
        if nl < 0:
            raise ValueError(f"chunked body: missing size line at {pos}")
        size_tok = body[pos:nl].split(b";", 1)[0].strip()
        try:
            size = int(size_tok, 16)
        except ValueError as e:
            raise ValueError(f"chunked body: bad chunk size {size_tok!r}") from e
        pos = nl + 2
        if size == 0:
            return out.getvalue()
        if pos + size > len(body):
            raise ValueError("chunked body: truncated chunk data")
        out.write(body[pos : pos + size])
        pos += size + 2  # skip trailing CRLF


def parse_http_response(block: bytes) -> tuple[int, dict[str, str], bytes]:
    """Split an application/http;msgtype=response block into
    (status, headers, body). Honors Content-Length when shorter than the
    captured tail and decodes chunked transfer-encoding."""
    sep = block.find(_CRLF + _CRLF)
    if sep < 0:
        raise ValueError("HTTP block: missing header/body separator")
    head, body = block[:sep], block[sep + 4 :]
    status_line, _, header_lines = head.partition(_CRLF)
    parts = status_line.split(None, 2)
    if len(parts) < 2 or not parts[0].startswith(b"HTTP/"):
        raise ValueError(f"HTTP block: bad status line {status_line!r}")
    status = int(parts[1])
    headers = _parse_headers(header_lines)
    if headers.get("transfer-encoding", "").lower() == "chunked":
        body = _dechunk(body)
    elif "content-length" in headers:
        n = int(headers["content-length"])
        if n > len(body):
            raise ValueError(
                f"HTTP block: Content-Length {n} exceeds captured body "
                f"{len(body)}"
            )
        body = body[:n]
    return status, headers, body


def iter_warc_records(data: bytes) -> Iterator[dict]:
    """Yield every record of a WARC file (plain or multi-member gzip) as
    ``{type, uri, date, content_type, block}``. Record framing per
    ISO 28500: header block, CRLF CRLF, Content-Length content bytes,
    CRLF CRLF. Loud on truncation — an archive that ends mid-record is
    corrupt, not short."""
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    pos = 0
    n = len(data)
    while pos < n:
        # tolerate extra blank separators between records
        while data[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            return
        if not data[pos : pos + 5] == b"WARC/":
            raise ValueError(
                f"expected WARC version line at offset {pos}: "
                f"{data[pos:pos + 16]!r}"
            )
        hdr_end = data.find(_CRLF + _CRLF, pos)
        if hdr_end < 0:
            raise ValueError(f"truncated WARC header at offset {pos}")
        version_line, _, header_lines = data[pos:hdr_end].partition(_CRLF)
        headers = _parse_headers(header_lines)
        try:
            length = int(headers["content-length"])
        except KeyError as e:
            raise ValueError(
                f"WARC record at offset {pos} has no Content-Length"
            ) from e
        block_start = hdr_end + 4
        block_end = block_start + length
        if block_end + 4 > n:
            raise ValueError(
                f"truncated WARC record at offset {pos}: need "
                f"{block_end + 4 - n} more bytes"
            )
        if data[block_end : block_end + 4] != _CRLF + _CRLF:
            raise ValueError(
                f"WARC record at offset {pos}: missing CRLFCRLF separator "
                f"after content block"
            )
        date_s = headers.get("warc-date")
        yield {
            "type": headers.get("warc-type", ""),
            "uri": headers.get("warc-target-uri"),
            "date": _parse_warc_date(date_s) if date_s else None,
            "content_type": headers.get("content-type", ""),
            "block": data[block_start:block_end],
        }
        pos = block_end + 4


def iter_response_rows(path: str, data: bytes) -> Iterator[dict]:
    """Response records of one WARC file as pages-shaped row dicts
    (non-response record types — warcinfo, request, metadata — skipped)."""
    for i, rec in enumerate(iter_warc_records(data)):
        if rec["type"] != "response":
            continue
        # msgtype is a RECOMMENDED parameter, not required (ISO 28500):
        # accept application/http with no msgtype; skip only an explicit
        # non-response msgtype (e.g. a mislabeled request block)
        ct = rec["content_type"].replace(" ", "").lower()
        if "msgtype=" in ct and "msgtype=response" not in ct:
            continue
        status, headers, body = parse_http_response(rec["block"])
        yield {
            "url": rec["uri"],
            "warc_ts": rec["date"],
            "html": bytearray(body),
            "status": status,
            "content_type": headers.get("content-type"),
            "location": headers.get("location"),
            "warc_file": path,
            "warc_record": i,
        }


# ---------------------------------------------------------------------------
# Spark source
# ---------------------------------------------------------------------------

WARC_ROWS = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("status", T.IntegerType(), True),
        T.StructField("content_type", T.StringType(), True),
        T.StructField("location", T.StringType(), True),
        T.StructField("warc_file", T.StringType(), True),
        T.StructField("warc_record", T.IntegerType(), True),
    ]
)


def _parse_gen(batch_rows: int):
    """The shared file-bytes → WARC_ROWS Arrow generator (batch and
    streaming reads run the identical parse)."""
    from jcrawler_spark.arrowio import emit_batches

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def rows():
            for pdf in it:
                for fpath, content in zip(pdf["path"], pdf["content"]):
                    yield from iter_response_rows(fpath, bytes(content))

        return emit_batches(
            rows(), [f.name for f in WARC_ROWS.fields], batch_rows
        )

    return gen


def read_warc(
    spark: SparkSession, path: str, *, batch_rows: int = 2048
) -> DataFrame:
    """Read a directory/glob of .warc / .warc.gz files into WARC_ROWS.

    One task per file (binaryFile is non-splittable — correct for gzip
    WARCs); the parse runs as an Arrow-batched mapInPandas generator that
    yields ``batch_rows``-row frames, so one task holds one decompressed
    file + one Arrow batch, never the whole archive."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc*")
        .load(path)
        .select("path", "content")
    )
    return files.mapInPandas(_parse_gen(batch_rows), schema=WARC_ROWS)


# binaryFile's fixed schema, spelled out because a streaming source
# requires it explicitly
_BINARY_FILE_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType(), False),
        T.StructField("modificationTime", T.TimestampType(), False),
        T.StructField("length", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
    ]
)


def read_warc_stream(
    spark: SparkSession,
    path: str,
    *,
    batch_rows: int = 2048,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming form of read_warc: archives landing in ``path`` (a fetch
    fleet dropping .warc.gz files) become a continuous pages stream — the
    same parse generator, exactly-once per file via the file-source's
    checkpointed listing (streaming/ingest.start_to_parquet composes as
    the sink). Each micro-batch holds whole files, so parallelism and
    memory behave exactly like the batch read."""
    reader = (
        spark.readStream.format("binaryFile")
        .option("pathGlobFilter", "*.warc*")
        .schema(_BINARY_FILE_SCHEMA)
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    files = reader.load(path).select("path", "content")
    return files.mapInPandas(_parse_gen(batch_rows), schema=WARC_ROWS)


# sorted-run size for the sink's CDX spill (module-level so tests can
# shrink it to exercise the merge path)
CDX_RUN_LINES = 250_000

WARC_SINK_STATS = T.StructType(
    [
        T.StructField("path", T.StringType(), False),
        T.StructField("n_records", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("n_skipped", T.LongType(), False),
    ]
)


def write_warc_files(
    df: DataFrame, path: str, *, gzip_per_record: bool = True,
    cdx: bool = True,
) -> DataFrame:
    """WARC sink: archive a pages-shaped table (url, html, status,
    location, content_type, warc_ts) as one .warc.gz per partition —
    the export mirror of read_warc, so a crawl interchanges with any
    Common-Crawl-consuming tool. The caller sizes files via
    ``df.repartition(n)`` (CC convention ~1 GB/file). Records stream to
    disk one gzip member at a time — an executor holds one record, not
    the partition. Returns one stats row per written file (the action
    that runs the job). Rows with NULL html but a real status archive as
    empty-body responses (status is still the crawl's observation); rows
    with NULL status (failed fetches — no HTTP transaction was observed)
    are NOT fabricated into responses: they are skipped and counted in
    the per-file ``n_skipped`` stat, keeping a replay crawl's view of
    "fetched OK" identical to the original's. WARC-Date is the true UTC
    instant regardless of the session timezone (converted JVM-side
    before the Arrow handoff).

    ``cdx=True`` (default) additionally writes one ``part-XXXXX.cdxj``
    companion per archive file in the same pass — the Common-Crawl
    cc-index / pywb interchange format: one line per record,
    ``<surt-key> <ts14> <json>`` with the json carrying url, mime,
    status, sha-1 payload digest, and the (offset, length) of the
    record's own gzip member, so any CDX consumer (or fetch_records
    here) range-reads a single record without scanning the archive.
    Lines are sorted by key within the file (CDX files are
    binary-searchable by contract); read_warc's ``*.warc*`` glob ignores
    the companions, so replay is unaffected. Index entries cost no
    second scan — offsets are observed as the archive streams out.

    ``path`` must be executor-visible (shared/POSIX filesystem — true in
    local and local-cluster modes and on NFS/fuse mounts; an
    object-store deployment would swap the ``open()`` for an fsspec/
    Hadoop-FS handle, same streaming shape). Task retries are idempotent:
    a retry truncates and rewrites its own part file(s)."""
    import heapq
    import json as _json
    import os
    import tempfile

    from pyspark import TaskContext

    from jcrawler_spark.functions.urlops import surt as _surt

    cols = ["url", "html", "status", "location", "content_type", "warc_ts"]

    # index lines per in-memory sorted run before spilling (~250k lines ≈
    # 60-90 MB): the sink's memory stays bounded no matter how many
    # records a partition holds — the WARC bytes already stream, and the
    # companion must not be the thing that OOMs a mega-partition.
    run_lines = CDX_RUN_LINES

    class _CdxRuns:
        """Sorted-run spill + k-way merge for one partition's index lines."""

        def __init__(self) -> None:
            self.buf: list[str] = []
            self.spills: list = []

        def add(self, line: str) -> None:
            self.buf.append(line)
            if len(self.buf) >= run_lines:
                self.buf.sort()
                sp = tempfile.TemporaryFile("w+", encoding="utf-8")
                sp.write("\n".join(self.buf) + "\n")
                sp.seek(0)
                self.spills.append(sp)
                self.buf = []

        def write_sorted(self, ix) -> None:
            self.buf.sort()
            if not self.spills:  # common case: one in-memory run
                if self.buf:
                    ix.write("\n".join(self.buf) + "\n")
                return
            streams = [iter(sp) for sp in self.spills]
            if self.buf:
                streams.append(iter(ln + "\n" for ln in self.buf))
            for line in heapq.merge(*streams):
                ix.write(line)
            for sp in self.spills:
                sp.close()

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pid = TaskContext.get().partitionId()
        fname = os.path.join(
            path, f"part-{pid:05d}.warc" + (".gz" if gzip_per_record else "")
        )
        n = 0
        n_skipped = 0
        cdx_lines = _CdxRuns()
        with open(fname, "wb") as f:
            for pdf in it:
                for url, html, status, ctype, loc, ts in zip(
                    pdf["url"], pdf["html"], pdf["status"],
                    pdf["content_type"], pdf["location"], pdf["warc_ts"],
                ):
                    if pd.isna(status):
                        n_skipped += 1  # no HTTP transaction to archive
                        continue
                    body = bytes(html) if html is not None else b""
                    mime = (
                        ctype
                        if isinstance(ctype, str) and ctype
                        else "text/html; charset=utf-8"
                    )
                    http = build_http_response(
                        body,
                        status=int(status),
                        content_type=mime,
                        location=None if not isinstance(loc, str) else loc,
                    )
                    date = None if pd.isna(ts) else ts.to_pydatetime()
                    rec = build_record(
                        "response",
                        "application/http; msgtype=response",
                        http,
                        target_uri=url,
                        date=date,
                    )
                    offset = f.tell()
                    f.write(
                        gzip.compress(rec, compresslevel=6, mtime=0)
                        if gzip_per_record
                        else rec
                    )
                    if cdx:
                        ts14 = (
                            date.strftime("%Y%m%d%H%M%S")
                            if date is not None
                            else "00000000000000"
                        )
                        meta = {
                            "url": url,
                            "mime": mime.split(";", 1)[0].strip(),
                            # bare base32 sha-1: the cc-index/pywb CDXJ
                            # field convention ('sha1:' prefixes belong to
                            # WARC-Payload-Digest headers, not CDX json)
                            "digest": base64.b32encode(
                                hashlib.sha1(body).digest()
                            ).decode("ascii"),
                            "status": int(status),
                            "length": f.tell() - offset,
                            "offset": offset,
                            "filename": os.path.basename(fname),
                        }
                        cdx_lines.add(
                            f"{_surt(url)} {ts14} "
                            + _json.dumps(meta, sort_keys=True)
                        )
                    n += 1
            size = f.tell()
        if n == 0:
            os.remove(fname)  # nothing archivable → no file
            if n_skipped == 0:
                return
            size = 0
        elif cdx:
            ixname = os.path.join(path, f"part-{pid:05d}.cdxj")
            with open(ixname, "w", encoding="utf-8") as ix:
                cdx_lines.write_sorted(ix)
        yield pd.DataFrame(
            [(fname, n, size, n_skipped)],
            columns=[x.name for x in WARC_SINK_STATS.fields],
        )

    os.makedirs(path, exist_ok=True)
    # hand the UDF the UTC wall time of each instant: Arrow gives pandas
    # tz-NAIVE values rendered in the session timezone, which would stamp
    # a wrong 'Z' date under any non-UTC session
    session_tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
    src = df.select(
        *[c for c in cols if c != "warc_ts"],
        F.to_utc_timestamp(F.col("warc_ts"), session_tz).alias("warc_ts"),
    )
    return src.mapInPandas(gen, schema=WARC_SINK_STATS)


# ---------------------------------------------------------------------------
# WET (extracted-text 'conversion' records) — the Common Crawl
# *.warc.wet.gz interchange
# ---------------------------------------------------------------------------

WET_ROWS = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("wet_file", T.StringType(), True),
        T.StructField("wet_record", T.IntegerType(), True),
    ]
)


def write_wet_files(
    df: DataFrame, path: str, *, gzip_per_record: bool = True
) -> DataFrame:
    """WET sink: the text-only companion of write_warc_files — one
    ``part-XXXXX.warc.wet.gz`` per partition of WARC/1.0 ``conversion``
    records (Content-Type text/plain, UTF-8 payload), the format every
    Common-Crawl text consumer reads. Takes (url, warc_ts) plus ``text``
    and/or ``html``: a present non-null ``text`` is written as-is;
    otherwise ``html`` is converted with ``textops.extract_text`` — the
    SAME deterministic routine the engine's extract UDF runs, so WET
    payloads carry the input-contract's byte-identical extracted text.
    Rows with neither (nothing to convert — failed fetches) are skipped
    and counted, mirroring the WARC sink's no-fabrication rule. Records
    stream to disk one gzip member at a time; stats row per file returned
    (the action that runs the job)."""
    import os

    from pyspark import TaskContext

    from jcrawler_spark.functions.textops import extract_text

    has_text = "text" in df.columns
    has_html = "html" in df.columns
    if not (has_text or has_html):
        raise ValueError("write_wet_files needs a 'text' or 'html' column")

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pid = TaskContext.get().partitionId()
        fname = os.path.join(
            path,
            f"part-{pid:05d}.warc.wet" + (".gz" if gzip_per_record else ""),
        )
        n = 0
        n_skipped = 0
        with open(fname, "wb") as f:
            for pdf in it:
                texts = pdf["text"] if has_text else None
                htmls = pdf["html"] if has_html else None
                for i in range(len(pdf)):
                    url = pdf["url"].iloc[i]
                    ts = pdf["warc_ts"].iloc[i]
                    text = texts.iloc[i] if texts is not None else None
                    if not isinstance(text, str):
                        raw = htmls.iloc[i] if htmls is not None else None
                        if raw is None:
                            n_skipped += 1
                            continue
                        text = extract_text(
                            bytes(raw).decode("utf-8", errors="replace")
                        )
                    date = None if pd.isna(ts) else ts.to_pydatetime()
                    rec = build_record(
                        "conversion",
                        "text/plain",
                        text.encode("utf-8"),
                        target_uri=url,
                        date=date,
                    )
                    f.write(
                        gzip.compress(rec, compresslevel=6, mtime=0)
                        if gzip_per_record
                        else rec
                    )
                    n += 1
            size = f.tell()
        if n == 0:
            os.remove(fname)
            if n_skipped == 0:
                return
            size = 0
        yield pd.DataFrame(
            [(fname, n, size, n_skipped)],
            columns=[x.name for x in WARC_SINK_STATS.fields],
        )

    os.makedirs(path, exist_ok=True)
    session_tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
    cols = ["url", F.to_utc_timestamp(F.col("warc_ts"), session_tz).alias("warc_ts")]
    if has_text:
        cols.append(F.col("text"))
    if has_html:
        cols.append(F.col("html"))
    return df.select(*cols).mapInPandas(gen, schema=WARC_SINK_STATS)


def iter_conversion_rows(path: str, data: bytes) -> Iterator[dict]:
    """Conversion records of one WET file as (url, warc_ts, text) row
    dicts; other record types (warcinfo, metadata) skipped."""
    for i, rec in enumerate(iter_warc_records(data)):
        if rec["type"] != "conversion":
            continue
        yield {
            "url": rec["uri"],
            "warc_ts": rec["date"],
            "text": rec["block"].decode("utf-8", errors="replace"),
            "wet_file": path,
            "wet_record": i,
        }


def read_wet(
    spark: SparkSession, path: str, *, batch_rows: int = 2048
) -> DataFrame:
    """Read a directory/glob of .warc.wet / .warc.wet.gz files into
    WET_ROWS — same one-task-per-file, Arrow-batched shape as read_warc
    (gzip WARCs are non-splittable; a task holds one decompressed file +
    one batch)."""
    from jcrawler_spark.arrowio import emit_batches

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def rows():
            for pdf in it:
                for fpath, content in zip(pdf["path"], pdf["content"]):
                    yield from iter_conversion_rows(fpath, bytes(content))

        return emit_batches(
            rows(), [f.name for f in WET_ROWS.fields], batch_rows
        )

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.wet*")
        .load(path)
        .select("path", "content")
    )
    return files.mapInPandas(gen, schema=WET_ROWS)


# ---------------------------------------------------------------------------
# CDX index (cc-index / CDXJ interchange)
# ---------------------------------------------------------------------------

CDX_ROWS = T.StructType(
    [
        T.StructField("surt", T.StringType(), False),
        T.StructField("ts14", T.StringType(), True),
        T.StructField("url", T.StringType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("status", T.IntegerType(), True),
        T.StructField("digest", T.StringType(), True),
        T.StructField("length", T.LongType(), True),
        T.StructField("offset", T.LongType(), True),
        T.StructField("filename", T.StringType(), True),
    ]
)

_CDX_JSON = (
    "url string, mime string, status int, digest string, "
    "length long, offset long, filename string"
)


def read_cdx(spark: SparkSession, path: str) -> DataFrame:
    """Read .cdxj companion files into CDX_ROWS — entirely JVM-side
    (text source → split → from_json, no Python in the plan). The result
    is the archive's lookup table: join/filter on ``surt`` (or url), then
    fetch_records range-reads exactly the matching records. At cc-index
    scale a global ``sortWithinPartitions(surt)`` after a range
    repartition reproduces the sharded ZipNum layout."""
    lines = (
        spark.read.option("pathGlobFilter", "*.cdxj")
        .text(path)
        .where(F.length("value") > 0)
    )
    parts = F.split(F.col("value"), " ", 3)
    meta = F.from_json(parts[2], _CDX_JSON)
    return lines.select(
        parts[0].alias("surt"),
        parts[1].alias("ts14"),
        meta["url"].alias("url"),
        meta["mime"].alias("mime"),
        meta["status"].alias("status"),
        meta["digest"].alias("digest"),
        meta["length"].alias("length"),
        meta["offset"].alias("offset"),
        meta["filename"].alias("filename"),
    )


def fetch_record(warc_dir: str, filename: str, offset: int, length: int) -> dict:
    """Driver-side single-record random access: read exactly ``length``
    bytes at ``offset`` (one gzip member, per the sink's CDX contract) and
    parse it — the wayback-style replay primitive. Never reads the rest
    of the archive."""
    import os

    with open(os.path.join(warc_dir, filename), "rb") as f:
        f.seek(offset)
        data = f.read(length)
    rows = list(iter_response_rows(filename, data))
    if len(rows) != 1:
        raise ValueError(
            f"expected 1 response record in {filename}@{offset}+{length}, "
            f"got {len(rows)}"
        )
    return rows[0]


def fetch_records(
    cdx_df: DataFrame, warc_dir: str, *, batch_rows: int = 2048
) -> DataFrame:
    """Distributed random access: given CDX rows (filename, offset,
    length — e.g. read_cdx filtered to the URLs of interest), seek-read
    each record's own gzip member and emit WARC_ROWS. I/O is
    O(selected records), not O(archive) — the point of the index; rows
    are sorted by (filename, offset) within each partition so per-file
    reads are sequential. Repartition by ``filename`` first when
    selectivity is low and archives are hot."""
    import os

    from jcrawler_spark.arrowio import emit_batches

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def rows():
            f = None
            cur = None
            try:
                for pdf in it:
                    for fname, off, ln in zip(
                        pdf["filename"], pdf["offset"], pdf["length"]
                    ):
                        if fname != cur:
                            if f is not None:
                                f.close()
                            f = open(os.path.join(warc_dir, fname), "rb")
                            cur = fname
                        f.seek(int(off))
                        data = f.read(int(ln))
                        yield from iter_response_rows(str(fname), data)
            finally:
                if f is not None:
                    f.close()

        return emit_batches(
            rows(), [x.name for x in WARC_ROWS.fields], batch_rows
        )

    src = cdx_df.select("filename", "offset", "length").sortWithinPartitions(
        "filename", "offset"
    )
    return src.mapInPandas(gen, schema=WARC_ROWS)


def to_pages(df: DataFrame) -> DataFrame:
    """Project WARC_ROWS onto the authoritative pages schema
    (schemas.PAGES): derived columns JVM-side via the urlops Column
    helpers; text/lang NULL — extraction is the extract operator's job."""
    url: Column = F.col("url")
    return df.select(
        url,
        "warc_ts",
        "html",
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("lang"),
        "status",
        "location",
        "content_type",
        urlops.host_col(url).alias("host"),
        urlops.url_hash_col(url).alias("url_hash"),
        F.col("warc_ts").alias("fetch_ts"),
        F.lit(None).cast("string").alias("error"),
    )

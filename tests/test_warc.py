"""WARC ingest source tests (sources/warc.py): record framing, gzip
multi-member streams, non-response skipping, HTTP parsing (content-length,
chunked), loud truncation, the distributed read path, and the pages
projection (byte-identical body round trip — the input_hint invariant
surface a Common-Crawl ingest must preserve)."""

from __future__ import annotations

import datetime as dt
import gzip

import pytest
from pyspark.sql import functions as F

from jcrawler_spark.functions import urlops
from jcrawler_spark.sources import warc

EPOCH = dt.datetime(2023, 11, 14, 22, 13, 20)


def _pages(n: int) -> list[dict]:
    return [
        {
            "url": f"https://h{i % 3}.example/p/{i}",
            "body": f"<html><body>page {i} é</body></html>".encode(),
            "date": EPOCH + dt.timedelta(seconds=i),
            "status": 301 if i % 5 == 4 else 200,
            "location": f"https://h0.example/r/{i}" if i % 5 == 4 else None,
        }
        for i in range(n)
    ]


def test_roundtrip_plain_and_gzip():
    pages = _pages(7)
    for gz in (False, True):
        blob = warc.build_warc(pages, gzip_per_record=gz, with_requests=True)
        rows = list(warc.iter_response_rows("f", blob))
        assert [r["url"] for r in rows] == [p["url"] for p in pages]
        assert [bytes(r["html"]) for r in rows] == [p["body"] for p in pages]
        # the parser returns aware-UTC instants; naive writer dates are UTC
        assert [r["warc_ts"] for r in rows] == [
            p["date"].replace(tzinfo=dt.timezone.utc) for p in pages
        ]
        assert rows[4]["status"] == 301
        assert rows[4]["location"] == "https://h0.example/r/4"


def test_writer_is_deterministic():
    pages = _pages(3)
    assert warc.build_warc(pages) == warc.build_warc(pages)


def test_non_response_records_are_skipped_but_parsed():
    blob = warc.build_warc(_pages(2), warcinfo=True, with_requests=True)
    recs = list(warc.iter_warc_records(blob))
    # warcinfo + (request + response) * 2
    assert [r["type"] for r in recs] == [
        "warcinfo", "request", "response", "request", "response",
    ]
    assert len(list(warc.iter_response_rows("f", blob))) == 2


def test_gzip_multi_member_boundaries():
    # one member per record (the Common Crawl layout): zlib must continue
    # past each member boundary
    blob = warc.build_warc(_pages(5), gzip_per_record=True)
    assert blob[:2] == b"\x1f\x8b"
    # more than one gzip member present
    assert blob.count(b"\x1f\x8b\x08") >= 5
    assert len(list(warc.iter_response_rows("f", blob))) == 5


def test_truncation_is_loud():
    plain = warc.build_warc(_pages(3), gzip_per_record=False)
    with pytest.raises(ValueError, match="truncated WARC record"):
        list(warc.iter_warc_records(plain[:-10]))
    gz = warc.build_warc(_pages(3), gzip_per_record=True)
    with pytest.raises(ValueError, match="truncated gzip member"):
        list(warc.iter_warc_records(gz[:-10]))


def test_bad_version_line_is_loud():
    with pytest.raises(ValueError, match="expected WARC version line"):
        list(warc.iter_warc_records(b"NOPE/1.0\r\n\r\n\r\n\r\n"))


def test_http_content_length_bounds_body():
    # captured tail beyond Content-Length (e.g. keepalive residue) is cut
    block = b"HTTP/1.1 200 OK\r\nContent-Length: 4\r\n\r\nabcdEXTRA"
    status, headers, body = warc.parse_http_response(block)
    assert (status, body) == (200, b"abcd")


def test_http_chunked_decode():
    block = (
        b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
        b"4\r\nWiki\r\n5\r\npedia\r\n0\r\n\r\n"
    )
    assert warc.parse_http_response(block)[2] == b"Wikipedia"


def test_http_chunked_truncation_is_loud():
    block = (
        b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
        b"ff\r\nshort"
    )
    with pytest.raises(ValueError, match="chunked body"):
        warc.parse_http_response(block)


def test_read_warc_distributed(spark, tmp_path):
    pages = _pages(10)
    for fi in range(2):
        blob = warc.build_warc(
            pages[fi * 5 : (fi + 1) * 5], with_requests=True
        )
        (tmp_path / f"part-{fi}.warc.gz").write_bytes(blob)
    # a non-WARC file in the directory is ignored by the glob
    (tmp_path / "_SUCCESS").write_bytes(b"")

    tz = spark.conf.get("spark.sql.session.timeZone")
    got = (
        warc.read_warc(spark, str(tmp_path))
        # render the stored instant as its UTC wall time so the assertion
        # holds under any session timezone
        .withColumn("warc_ts", F.to_utc_timestamp("warc_ts", tz))
        .orderBy("url")
        .collect()
    )
    assert [r["url"] for r in got] == sorted(p["url"] for p in pages)
    by_url = {r["url"]: r for r in got}
    for p in pages:
        r = by_url[p["url"]]
        assert bytes(r["html"]) == p["body"]  # byte-identical round trip
        assert r["warc_ts"] == p["date"]
        assert r["status"] == p["status"]
    # lineage columns point back into the archive
    assert all(r["warc_file"].endswith(".warc.gz") for r in got)


def test_crawl_replay_from_warc_archive(spark, tmp_path):
    """End-to-end: archive the synthetic corpus as WARC files, ingest it
    back distributed, and crawl the ingested table — the emission
    (url, superstep, order_key) must be identical to crawling the original
    corpus. This is the replay path a Common-Crawl-backed run uses: the
    archive IS the web."""
    from jcrawler_spark import corpus
    from jcrawler_spark.config import CrawlConfig
    from jcrawler_spark.engine import CrawlEngine, SyntheticFetcher

    pages = corpus.build_pages_df(spark, 120, 4, partitions=4)
    rows = pages.select(
        "url", "html", "status", "location", "content_type", "warc_ts"
    ).collect()
    recs = [
        {
            "url": r["url"],
            "body": bytes(r["html"]) if r["html"] is not None else b"",
            "date": r["warc_ts"] or EPOCH,
            "status": r["status"],
            "location": r["location"],
            "content_type": r["content_type"] or "text/html; charset=utf-8",
        }
        for r in rows
    ]
    per = (len(recs) + 2) // 3
    for fi in range(3):
        (tmp_path / f"crawl-{fi}.warc.gz").write_bytes(
            warc.build_warc(recs[fi * per : (fi + 1) * per], with_requests=True)
        )
    ingested = warc.to_pages(warc.read_warc(spark, str(tmp_path)))

    def emission(src_pages, root):
        cfg = CrawlConfig(
            accept=[f"host{i}.example" for i in range(4)],
            max_docs=40,
            wave_budget=10,
        )
        eng = CrawlEngine(spark, cfg, SyntheticFetcher(src_pages), root)
        eng.run(seeds=[corpus.url_of(0, 4)], max_supersteps=20)
        return sorted(
            (r["url"], r["superstep"], r["order_key"])
            for r in eng.emitted().collect()
        )

    base = emission(pages, str(tmp_path / "state-base"))
    replay = emission(ingested, str(tmp_path / "state-replay"))
    assert base == replay
    assert len(base) == 40


def test_write_warc_files_sink_roundtrip(spark, tmp_path):
    """The sink is the export mirror of the source: corpus pages →
    write_warc_files (one .warc.gz per partition, executor-side) →
    read_warc gives back every row byte-identically."""
    from jcrawler_spark import corpus

    pages = corpus.build_pages_df(spark, 60, 4, partitions=4)
    out = str(tmp_path / "archive")
    stats = warc.write_warc_files(pages.repartition(3), out).collect()
    assert len(stats) == 3  # one file per non-empty partition
    assert sum(r["n_records"] for r in stats) == 60
    assert all(r["n_bytes"] > 0 for r in stats)

    back = warc.read_warc(spark, out)
    orig = {
        r["url"]: r
        for r in pages.select("url", "html", "status", "location").collect()
    }
    got = back.collect()
    assert len(got) == 60
    for r in got:
        o = orig[r["url"]]
        assert bytes(r["html"]) == (
            bytes(o["html"]) if o["html"] is not None else b""
        )
        assert r["status"] == o["status"]
        assert r["location"] == o["location"]


def test_write_warc_files_empty_partitions(spark, tmp_path):
    rows = [("https://a.example/x", b"<html/>", 200, None,
             "text/html", None)]
    df = spark.createDataFrame(
        rows,
        "url string, html binary, status int, location string, "
        "content_type string, warc_ts timestamp",
    ).repartition(4)
    out = str(tmp_path / "arch2")
    stats = warc.write_warc_files(df, out).collect()
    assert sum(r["n_records"] for r in stats) == 1
    import os

    files = [f for f in os.listdir(out) if f.endswith(".warc.gz")]
    assert len(files) == len(stats)  # empty partitions left no file
    assert len(list(warc.read_warc(spark, out).collect())) == 1


def test_non_ascii_uri_roundtrip():
    """WARC-Target-URI is UTF-8 (ISO 28500): IRIs survive write → parse."""
    url = "https://ex.ample/café/π?q=день"
    blob = warc.build_warc([{"url": url, "body": b"x"}])
    rows = list(warc.iter_response_rows("f", blob))
    assert rows[0]["url"] == url


def test_tolerant_warc_date_forms():
    """WARC/1.1 fractional seconds and explicit offsets parse (warcio,
    wget, IA tooling emit them); all normalize to aware UTC."""
    import datetime as dt

    d1 = warc._parse_warc_date("2023-01-01T00:00:00.123456Z")
    assert d1.microsecond == 123456 and d1.tzinfo is not None
    d2 = warc._parse_warc_date("2023-01-01T02:00:00+02:00")
    assert d2 == dt.datetime(2023, 1, 1, 0, 0, 0, tzinfo=dt.timezone.utc)
    # microseconds survive a write → parse round trip
    orig = dt.datetime(2024, 5, 1, 1, 2, 3, 456789)
    blob = warc.build_warc([{"url": "https://a/x", "body": b"b", "date": orig}])
    got = list(warc.iter_response_rows("f", blob))[0]["warc_ts"]
    assert got == orig.replace(tzinfo=dt.timezone.utc)


def test_msgtype_parameter_is_optional():
    """'Content-Type: application/http' without msgtype is legal — the
    record must still ingest; an explicit non-response msgtype skips."""
    http = warc.build_http_response(b"hello")
    rec_plain = warc.build_record(
        "response", "application/http", http,
        target_uri="https://a.example/p",
    )
    rec_req = warc.build_record(
        "response", "application/http; msgtype=request", http,
        target_uri="https://a.example/q",
    )
    rows = list(warc.iter_response_rows("f", rec_plain + rec_req))
    assert [r["url"] for r in rows] == ["https://a.example/p"]


def test_sink_skips_null_status_rows(spark, tmp_path):
    """A failed fetch (status NULL) observed no HTTP transaction: it must
    not be fabricated into a 200 response — skipped and counted."""
    rows = [
        ("https://a.example/ok", b"<html/>", 200, None, "text/html", None),
        ("https://a.example/err", None, None, None, None, None),
    ]
    df = spark.createDataFrame(
        rows,
        "url string, html binary, status int, location string, "
        "content_type string, warc_ts timestamp",
    ).coalesce(1)
    out = str(tmp_path / "arch3")
    stats = warc.write_warc_files(df, out).collect()
    assert len(stats) == 1
    assert stats[0]["n_records"] == 1 and stats[0]["n_skipped"] == 1
    got = warc.read_warc(spark, out).collect()
    assert [r["url"] for r in got] == ["https://a.example/ok"]


def test_sink_warc_date_is_utc_instant(spark, tmp_path):
    """The archived WARC-Date is the true UTC instant even under a
    non-UTC session timezone, and read_warc restores the same instant."""
    import datetime as dt

    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        # epoch 1700000000 = 2023-11-14 22:13:20 UTC
        df = spark.sql(
            "SELECT 'https://a.example/t' AS url, "
            "CAST(X'3C68746D6C2F3E' AS BINARY) AS html, 200 AS status, "
            "CAST(NULL AS STRING) AS location, 'text/html' AS content_type, "
            "to_timestamp(from_unixtime(1700000000)) AS warc_ts"
        ).coalesce(1)
        out = str(tmp_path / "arch-tz")
        warc.write_warc_files(df, out).collect()
        import glob
        import gzip as _gz

        raw = _gz.decompress(
            open(glob.glob(out + "/*.warc.gz")[0], "rb").read()
        )
        assert b"WARC-Date: 2023-11-14T22:13:20Z" in raw
        back = warc.read_warc(spark, out).select(
            F.unix_timestamp("warc_ts").alias("epoch")
        ).collect()
        assert back[0]["epoch"] == 1700000000
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_read_warc_stream_exactly_once(spark, tmp_path):
    """Streaming ingestion: archives landing in a directory become a pages
    stream, each file consumed exactly once across checkpointed drains."""
    from jcrawler_spark.streaming import ingest

    src = tmp_path / "landing"
    src.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    pages = _pages(9)

    (src / "a.warc.gz").write_bytes(warc.build_warc(pages[:3]))
    (src / "b.warc.gz").write_bytes(warc.build_warc(pages[3:6]))
    stream = warc.read_warc_stream(spark, str(src))
    assert stream.isStreaming
    ingest.start_to_parquet(stream, out, ckpt).awaitTermination(120)
    assert spark.read.parquet(out).count() == 6

    # a third archive lands; a new drain from the same checkpoint picks up
    # ONLY the new file — no re-ingestion of a/b
    (src / "c.warc.gz").write_bytes(warc.build_warc(pages[6:]))
    ingest.start_to_parquet(
        warc.read_warc_stream(spark, str(src)), out, ckpt
    ).awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() == 9
    assert got.select("url").distinct().count() == 9
    by_url = {r["url"]: bytes(r["html"]) for r in got.collect()}
    assert by_url == {p["url"]: p["body"] for p in pages}


def test_to_pages_projection(spark, tmp_path):
    (tmp_path / "a.warc.gz").write_bytes(warc.build_warc(_pages(3)))
    out = warc.to_pages(warc.read_warc(spark, str(tmp_path)))
    rows = {r["url"]: r for r in out.collect()}
    u = "https://h1.example/p/1"
    assert rows[u]["host"] == "h1.example"
    assert rows[u]["url_hash"] == urlops.url_hash(u)
    assert rows[u]["text"] is None and rows[u]["lang"] is None
    names = [f.name for f in out.schema.fields]
    from jcrawler_spark import schemas

    assert names == [f.name for f in schemas.PAGES.fields]


# ---------------------------------------------------------------------------
# CDX index (cc-index / CDXJ companions)
# ---------------------------------------------------------------------------


def test_cdx_companions_roundtrip_and_random_access(spark, tmp_path):
    """write_warc_files emits one sorted .cdxj per archive file in the same
    pass; read_cdx parses them JVM-side; fetch_records range-reads exactly
    the selected records byte-identically (the wayback-replay primitive)."""
    import json
    import os

    from jcrawler_spark import corpus
    from jcrawler_spark.functions.urlops import surt

    pages = corpus.build_pages_df(spark, 60, 4, partitions=4)
    out = str(tmp_path / "archive")
    stats = warc.write_warc_files(pages.repartition(3), out).collect()
    cdxj = sorted(f for f in os.listdir(out) if f.endswith(".cdxj"))
    assert len(cdxj) == len(stats) == 3  # one companion per archive file

    # lines are sorted within each file (CDX binary-search contract), keys
    # are the shared surt() of the json url, offsets tile the archive
    for fn in cdxj:
        lines = (tmp_path / "archive" / fn).read_text().splitlines()
        assert lines and lines == sorted(lines)
        seen = []
        for ln in lines:
            key, ts14, meta = ln.split(" ", 2)
            meta = json.loads(meta)
            assert key == surt(meta["url"])
            assert len(ts14) == 14 and ts14.isdigit()
            assert meta["filename"] == fn.replace(".cdxj", ".warc.gz")
            seen.append((meta["offset"], meta["length"]))
        seen.sort()
        assert seen[0][0] == 0  # first record starts at byte 0
        for (o1, l1), (o2, _) in zip(seen, seen[1:]):
            assert o1 + l1 == o2  # members tile with no gaps
        size = os.path.getsize(tmp_path / "archive" / meta["filename"])
        assert seen[-1][0] + seen[-1][1] == size

    cdx = warc.read_cdx(spark, out)
    assert cdx.count() == 60
    # every archived URL indexed exactly once, digest/mime/status populated
    row = cdx.where(F.col("status") == 200).first()
    # bare base32 sha-1 (32 chars), the cc-index CDXJ field convention
    import re as _re

    assert _re.fullmatch(r"[A-Z2-7]{32}", row["digest"])
    assert row["mime"] == "text/html"

    # random access: fetch 5 urls through the index, bodies byte-identical
    want = {
        r["url"]: bytes(r["html"])
        for r in pages.limit(5).select("url", "html").collect()
    }
    sel = cdx.where(F.col("url").isin(*want))
    got = {
        r["url"]: bytes(r["html"])
        for r in warc.fetch_records(sel, out).collect()
    }
    assert got == want

    # driver-side single-record fetch agrees
    one = sel.first()
    rec = warc.fetch_record(out, one["filename"], one["offset"], one["length"])
    assert bytes(rec["html"]) == want[rec["url"]]

    # the companions don't leak into replay: read_warc sees archives only
    assert warc.read_warc(spark, out).count() == 60


def test_cdx_opt_out(spark, tmp_path):
    import os

    rows = [("https://a.example/x", b"<html/>", 200, None,
             "text/html", None)]
    df = spark.createDataFrame(
        rows,
        "url string, html binary, status int, location string, "
        "content_type string, warc_ts timestamp",
    )
    out = str(tmp_path / "arch3")
    warc.write_warc_files(df, out, cdx=False).collect()
    assert not [f for f in os.listdir(out) if f.endswith(".cdxj")]


def test_cdx_spill_runs_merge_sorted(spark, tmp_path, monkeypatch):
    """With a tiny run size the CDX lines spill into many sorted runs per
    partition; the k-way merge must still produce one complete, sorted
    companion (the bounded-memory path a mega-partition takes)."""
    from jcrawler_spark import corpus

    monkeypatch.setattr(warc, "CDX_RUN_LINES", 7)
    pages = corpus.build_pages_df(spark, 60, 4, partitions=4)
    out = str(tmp_path / "archive")
    warc.write_warc_files(pages.repartition(1), out).collect()

    lines = (tmp_path / "archive" / "part-00000.cdxj").read_text().splitlines()
    assert len(lines) == 60  # every record indexed, none lost in spills
    assert lines == sorted(lines)


def test_zipnum_empty_archive_index(spark, tmp_path):
    """An archive where nothing was archivable yields an empty (but valid)
    ZipNum index: build succeeds, lookups return [] instead of crashing."""
    from jcrawler_spark.sources import cdx as cdxmod

    rows = [("https://a.example/x", None, None, None, None, None)]
    df = spark.createDataFrame(
        rows,
        "url string, html binary, status int, location string, "
        "content_type string, warc_ts timestamp",
    )
    arch = str(tmp_path / "arch")
    stats = warc.write_warc_files(df, arch).collect()
    assert sum(r["n_records"] for r in stats) == 0

    idx = str(tmp_path / "idx")
    assert cdxmod.build_zipnum(spark, arch, idx) == 0
    zn = cdxmod.ZipNumIndex(idx)
    assert zn.lookup("example,a)/x") == []


# ---------------------------------------------------------------------------
# round 5: WET (extracted-text conversion records) sink + source
# ---------------------------------------------------------------------------


def test_wet_sink_roundtrip_from_html(spark, tmp_path):
    """pages(html) → write_wet_files → read_wet: every record carries the
    input-contract text — byte-identical to textops.extract_text(html)."""
    from jcrawler_spark import corpus
    from jcrawler_spark.functions.textops import extract_text

    pages = corpus.build_pages_df(spark, 40, 4, partitions=4)
    out = str(tmp_path / "wet")
    stats = warc.write_wet_files(pages.repartition(2), out).collect()
    assert sum(r["n_records"] for r in stats) == 40
    import os

    assert all(
        f.endswith(".warc.wet.gz") for f in os.listdir(out)
    )

    back = {r["url"]: r["text"] for r in warc.read_wet(spark, out).collect()}
    orig = {r["url"]: r for r in pages.select("url", "html").collect()}
    assert len(back) == 40
    for url, text in back.items():
        want = extract_text(bytes(orig[url]["html"]).decode("utf-8"))
        assert text == want  # byte-identical extracted text per url


def test_wet_sink_prefers_text_column_and_skips_empty(spark, tmp_path):
    rows = [
        ("https://a.example/1", "already extracted\ntext", b"<p>ignored</p>"),
        ("https://a.example/2", None, b"<p>from html</p>"),
        ("https://a.example/3", None, None),  # nothing to convert
    ]
    df = spark.createDataFrame(
        [(u, t, h, None) for u, t, h in rows],
        "url string, text string, html binary, warc_ts timestamp",
    ).coalesce(1)
    out = str(tmp_path / "wet2")
    stats = warc.write_wet_files(df, out).collect()
    assert sum(r["n_records"] for r in stats) == 2
    assert sum(r["n_skipped"] for r in stats) == 1
    back = {r["url"]: r["text"] for r in warc.read_wet(spark, out).collect()}
    assert back["https://a.example/1"] == "already extracted\ntext"
    assert back["https://a.example/2"] == "from html"


def test_wet_and_warc_coexist(spark, tmp_path):
    """read_warc over a dir that also holds WET companions ignores the
    conversion records (and vice versa): the two exports can share a dir."""
    from jcrawler_spark import corpus

    pages = corpus.build_pages_df(spark, 10, 2, partitions=2).coalesce(1)
    out = str(tmp_path / "mixed")
    warc.write_warc_files(pages, out).collect()
    warc.write_wet_files(pages, out).collect()
    assert warc.read_warc(spark, out).count() == 10
    assert warc.read_wet(spark, out).count() == 10


def test_wet_date_is_utc_instant(spark, tmp_path):
    """The WARC-Date written must be the INSTANT, independent of the
    session timezone active during the write. The instant is pinned with
    a tz-aware input (naive datetimes in createDataFrame are interpreted
    in the driver-local tz, not the session tz — empirically verified):
    noon America/New_York == 16:00Z."""
    import datetime as _dt
    from zoneinfo import ZoneInfo

    noon_ny = _dt.datetime(
        2024, 6, 1, 12, 0, 0, tzinfo=ZoneInfo("America/New_York")
    )
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        df = spark.createDataFrame(
            [("https://a.example/t", "txt", noon_ny)],
            "url string, text string, warc_ts timestamp",
        ).coalesce(1)
        out = str(tmp_path / "wet3")
        warc.write_wet_files(df, out).collect()
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    import glob
    import gzip as _gz

    raw = _gz.decompress(open(glob.glob(out + "/*")[0], "rb").read())
    assert b"WARC-Date: 2024-06-01T16:00:00Z" in raw
    r = warc.read_wet(spark, out).collect()[0]
    assert r["warc_ts"] == _dt.datetime(2024, 6, 1, 16, 0, 0)

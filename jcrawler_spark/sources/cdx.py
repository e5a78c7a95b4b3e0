"""ZipNum-sharded global CDX index — the cc-index layout at archive scale.

The per-file ``.cdxj`` companions ``write_warc_files`` emits
(sources/warc.py) are locally sorted; a 100 TB archive has ~100k of them,
so a URL lookup would still touch every file. Common Crawl's answer (and
OpenWayback/pywb's) is the ZipNum cluster: ONE globally key-sorted index,
stored as gzip-compressed blocks of N lines across a few hundred shard
files, plus a tiny plain-text summary (``cluster.idx``) holding the first
key of every block with its (shard, offset, length). A lookup
seek-bisects the summary ON DISK (never loaded whole — O(1) driver
memory even at a ~3M-line summary), then range-reads exactly one ~N-line
gzip block — O(log idx) + 2 seeks for any URL in the archive, no Spark
job.

Spark-first build shape: ``read_cdx`` scan → ONE range-partitioning
Exchange on the SURT key (Spark samples the key distribution, so shards
come out balanced even though SURT keys are massively skewed toward big
hosts) → in-partition sort → a map-only writer task per shard streaming
gzip members to disk. The Exchange moves index LINES (~150 bytes each),
never archive bytes: for a 10^10-record crawl that is ~1.5 TB through the
shuffle — a routine sort — while the cluster.idx stays
``records / block_lines`` lines (3.3M at the default 3000), a single
executor-buildable text file.

No reference analogue (the reference keeps its disk cache keyed by slug
paths, Slug.java:198-233, and never needs cross-file lookup);
DIVERGENCES.md #26 scopes the SURT key itself.
"""

from __future__ import annotations

import gzip
import json
import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from jcrawler_spark.sources import warc as warcmod

CLUSTER_IDX = "cluster.idx"

_BLOCK_ROWS = T.StructType(
    [
        T.StructField("first_key", T.StringType(), False),
        T.StructField("filename", T.StringType(), False),
        T.StructField("offset", T.LongType(), False),
        T.StructField("length", T.LongType(), False),
        T.StructField("n_lines", T.LongType(), False),
    ]
)


def zipnum_plan(
    spark: SparkSession,
    warc_dir: str,
    out_dir: str,
    *,
    shards: int | None = None,
    block_lines: int = 3000,
) -> DataFrame:
    """The build as a lazy DataFrame (one summary row per written gzip
    block) — split out so tools/explain_audit.py can assert the plan:
    exactly ONE range-partitioning Exchange (index lines, never archive
    bytes) and ONE MapInPandas (the shard writer)."""
    os.makedirs(out_dir, exist_ok=True)
    cdx = warcmod.read_cdx(spark, warc_dir)
    if shards is None:
        # size shards from the record count (~2M records ≈ a few tens of
        # MB gzipped per shard); never fall through to
        # spark.sql.shuffle.partitions — a small archive must not explode
        # into hundreds of near-empty shard files
        n_est = cdx.count()
        shards = max(1, -(-n_est // 2_000_000))
    # explicit concat, NOT concat_ws: a null ts14 (malformed line in a
    # foreign .cdxj) must not silently produce a space-less key that
    # lookup() can never match — coalesce to the sink's null-date ts14
    keyed = cdx.select(
        F.concat(
            "surt", F.lit(" "),
            F.coalesce("ts14", F.lit("00000000000000")),
        ).alias("key"),
        F.to_json(
            F.struct(
                "url", "mime", "status", "digest",
                "length", "offset", "filename",
            )
        ).alias("meta"),
    )
    keyed = keyed.repartitionByRange(shards, "key").sortWithinPartitions(
        "key"
    )

    def write_shard(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        fname = f"shard-{pid:05d}.cdx.gz"
        blocks: list[tuple[str, str, int, int, int]] = []
        buf: list[str] = []

        with open(os.path.join(out_dir, fname), "wb") as f:

            def flush() -> None:
                if not buf:
                    return
                off = f.tell()
                f.write(
                    gzip.compress(
                        ("\n".join(buf) + "\n").encode("utf-8"),
                        compresslevel=6, mtime=0,
                    )
                )
                blocks.append(
                    (buf[0].split("\t", 1)[0], fname, off,
                     f.tell() - off, len(buf))
                )
                buf.clear()

            for pdf in it:
                for key, meta in zip(pdf["key"], pdf["meta"]):
                    buf.append(f"{key}\t{meta}")
                    if len(buf) >= block_lines:
                        flush()
            flush()
        if not blocks:
            os.remove(os.path.join(out_dir, fname))
            return
        yield pd.DataFrame(
            blocks, columns=[x.name for x in _BLOCK_ROWS.fields]
        )

    return keyed.mapInPandas(write_shard, schema=_BLOCK_ROWS)


def build_zipnum(
    spark: SparkSession,
    warc_dir: str,
    out_dir: str,
    *,
    shards: int | None = None,
    block_lines: int = 3000,
) -> int:
    """Build the ZipNum index for an archive directory carrying ``.cdxj``
    companions. Writes ``shard-XXXXX.cdx.gz`` files (gzip members of
    ``block_lines`` sorted index lines each) plus ``cluster.idx`` into
    ``out_dir``; returns the total indexed record count.

    The only wide operation is the range repartition on the index key;
    everything after is partition-local. The summary rows returned by the
    shard writers are one per BLOCK (not per record) — bounded driver
    traffic by construction."""
    os.makedirs(out_dir, exist_ok=True)
    summary = zipnum_plan(
        spark, warc_dir, out_dir, shards=shards, block_lines=block_lines
    ).collect()
    summary.sort(key=lambda r: r["first_key"])
    with open(os.path.join(out_dir, CLUSTER_IDX), "w", encoding="utf-8") as f:
        for r in summary:
            f.write(
                f"{r['first_key']}\t{r['filename']}\t{r['offset']}"
                f"\t{r['length']}\n"
            )
    return sum(r["n_lines"] for r in summary)


def archive_gap(
    candidates: DataFrame,
    spark: SparkSession,
    warc_dir: str,
    *,
    url_col: str = "url",
) -> DataFrame:
    """Gap-crawl seeding: the rows of ``candidates`` whose URL is NOT in
    the archive's CDX — i.e. exactly what a crawl topping up an existing
    archive should fetch. Keyed on the SURT transform (both sides
    JVM-side via urlops.surt_col), so URLs that differ only in query-param
    order / case / 'www.' match their archived capture. One anti-join:
    the index side is ~150-byte lines, prunable to its surt column at the
    scan, and broadcast-able whenever the archive index fits — Catalyst/
    AQE pick; at cc-index scale both sides shuffle once on the key."""
    from jcrawler_spark.functions import urlops

    have = (
        warcmod.read_cdx(spark, warc_dir)
        .select(F.col("surt").alias("_have_surt"))
        .distinct()
    )
    key = urlops.surt_col(F.col(url_col))
    return (
        candidates.withColumn("_cand_surt", key)
        .join(have, F.col("_cand_surt") == F.col("_have_surt"), "left_anti")
        .drop("_cand_surt")
    )


class ZipNumIndex:
    """Driver-side reader over a built ZipNum directory: SEEK-based binary
    search over the ON-DISK cluster.idx (round-5, VERDICT r4 #7 — the
    summary is never loaded whole: at 10^10 records it is ~3M lines /
    hundreds of MB, and a frontier driver may hold many epochs' indexes),
    then range-read candidate gzip blocks and scan ≤ block_lines lines.
    Per lookup: O(log idx_bytes) seeks in cluster.idx + 2-3 block reads,
    regardless of archive size — the wayback/cc-index access path
    (pywb binsearch), no Spark session needed. Driver memory: O(1)."""

    def __init__(self, index_dir: str):
        self.dir = index_dir
        self._idx_path = os.path.join(index_dir, CLUSTER_IDX)
        # an empty cluster.idx is a valid index of an empty archive
        # (e.g. every crawl row had null status): lookups return []
        self._idx_size = os.path.getsize(self._idx_path)

    @staticmethod
    def _parse(line: str) -> tuple[str, str, int, int]:
        key, fname, off, ln = line.rstrip("\n").split("\t")
        return key, fname, int(off), int(ln)

    def _floor_offset(self, f, target: str) -> int:
        """Byte offset of the LAST cluster.idx line whose first_key <=
        target — or of line 0 when every key exceeds it (the forward scan
        then stops on its first key). Textbook seek-bisect over a sorted
        line file: cond(pos) tests the first complete line strictly after
        pos. UTF-8 byte order == code-point order, matching both the
        Python sort in build_zipnum and Spark's string sort."""
        lo, hi = 0, self._idx_size
        while hi - lo > 1:
            mid = (lo + hi) // 2
            f.seek(mid)
            f.readline()  # finish the line mid landed inside
            line = f.readline()
            if line and line.split(b"\t", 1)[0].decode("utf-8") <= target:
                lo = mid
            else:
                hi = mid
        if lo == 0:
            return 0
        f.seek(lo)
        f.readline()
        return f.tell()

    def _read_gzip_block(self, fname: str, off: int, ln: int) -> list[str]:
        with open(os.path.join(self.dir, fname), "rb") as f:
            f.seek(off)
            data = f.read(ln)
        return gzip.decompress(data).decode("utf-8").splitlines()

    def _read_block(self, i: int) -> list[str]:
        """Test/debug helper: the i-th block by cluster.idx line number.
        O(i) line scan — the production path (lookup) never uses this."""
        with open(self._idx_path, encoding="utf-8") as f:
            for n, line in enumerate(f):
                if n == i:
                    _, fname, off, ln = self._parse(line)
                    return self._read_gzip_block(fname, off, ln)
        raise IndexError(i)

    def lookup(self, surt_key: str) -> list[dict]:
        """All index entries whose SURT key equals ``surt_key`` (every
        capture timestamp), as parsed dicts sorted by ts14. Keys sort as
        '<surt> <ts14>' so a key's captures may straddle a block
        boundary; scan forward from the floor block until keys pass the
        target."""
        if self._idx_size == 0:
            return []
        out: list[dict] = []
        target = surt_key + " "
        with open(self._idx_path, "rb") as f:
            f.seek(self._floor_offset(f, surt_key))
            while True:
                line = f.readline()
                if not line:
                    break
                _, fname, off, ln = self._parse(line.decode("utf-8"))
                done = False
                for rec in self._read_gzip_block(fname, off, ln):
                    key, meta = rec.split("\t", 1)
                    if key.startswith(target):
                        entry = json.loads(meta)
                        entry["surt"], entry["ts14"] = key.split(" ", 1)
                        out.append(entry)
                    elif key > target:
                        done = True
                        break
                if done:
                    break
        out.sort(key=lambda e: e["ts14"])
        return out

    def fetch(self, warc_dir: str, surt_key: str) -> list[dict]:
        """lookup + range-read each capture's WARC record — the full
        replay primitive (index seek → block read → record read)."""
        return [
            warcmod.fetch_record(
                warc_dir, e["filename"], e["offset"], e["length"]
            )
            for e in self.lookup(surt_key)
        ]

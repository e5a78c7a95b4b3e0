"""Snapshot-committed table state — the Iceberg-shaped checkpoint layer.

The reference's resumability contract is its disk cache: "visited can be
always detected from stored content (cache); horizon can be always recomputed
from stored content" (/root/reference/README.md:199-201). The north rule maps
this to Iceberg snapshots: every superstep commits pages+frontier+seen+lineage
atomically, and a crawl resumes exactly from any committed superstep.

No Iceberg runtime jar exists in this sandbox (SURVEY.md §7.1), so this module
implements the same contract on plain parquet with an explicit commit log —
structurally what Iceberg does (data files + manifest + atomic snapshot
pointer):

    root/
      checkpoints/ckpt-00000003.json   # atomic commit marker (tmp+rename);
                                       # lists every data file of superstep 3
      frontier/delta-00000003-<uuid>.parquet/   # appended per superstep
      seen/delta-.../  pages/delta-.../  emitted/delta-.../  lineage/delta-...
      host_state/snap-00000003.parquet/         # small table, full rewrite
      bloom/shard-00000003.npz                  # Bloom bitmap sidecar

Crash safety: data written first, marker renamed last; readers only see files
listed in committed markers, so a crash mid-superstep leaves orphan files that
are ignored (and reclaimed by `vacuum`). On a real cluster swap this class for
Iceberg: `append` → table append, `commit` → one multi-table transaction,
`read` → snapshot-as-of read (MERGE key url_hash; cf. the `.index/<sha256>`
symlink uniqueness in the reference, JCrawler.java:1005-1010).
"""

from __future__ import annotations

import json
import os
import shutil
import threading
import uuid
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import DataFrame, SparkSession

APPEND_TABLES = (
    "pages", "lineage", "ignored_domains", "frontier_add", "frontier_consumed",
)
SNAP_TABLES = ("host_state", "frontier")


class SnapshotStore:
    def __init__(self, root: str, spark: SparkSession):
        self.root = root
        self.spark = spark
        os.makedirs(os.path.join(root, "checkpoints"), exist_ok=True)
        self._staged: dict[str, list[str]] = {}
        self._staged_replace: set[str] = set()
        self._lock = threading.Lock()

    # ---- commit log ----

    def _ckpt_path(self, superstep: int) -> str:
        return os.path.join(self.root, "checkpoints", f"ckpt-{superstep:08d}.json")

    def committed_supersteps(self) -> list[int]:
        d = os.path.join(self.root, "checkpoints")
        out = []
        for f in os.listdir(d):
            if f.startswith("ckpt-") and f.endswith(".json"):
                out.append(int(f[len("ckpt-") : -len(".json")]))
        return sorted(out)

    def last_superstep(self) -> int | None:
        ss = self.committed_supersteps()
        return ss[-1] if ss else None

    def _manifest(self, superstep: int) -> dict:
        with open(self._ckpt_path(superstep)) as f:
            return json.load(f)

    # ---- writes (staged until commit) ----

    def stage_append(
        self, table: str, df: DataFrame, superstep: int, replace: bool = False
    ) -> None:
        """Write a delta file set for `table`; visible only after commit.
        `replace=True` makes this superstep's files REPLACE the table's
        whole accumulated file list at commit (delta compaction — Iceberg's
        rewrite-data-files): prior files become vacuum-able orphans."""
        rel = os.path.join(table, f"delta-{superstep:08d}-{uuid.uuid4().hex[:8]}.parquet")
        df.write.mode("overwrite").parquet(os.path.join(self.root, rel))
        with self._lock:
            self._staged.setdefault(table, []).append(rel)
            if replace:
                self._staged_replace.add(table)

    def stage_snapshot(self, table: str, df: DataFrame, superstep: int) -> None:
        """Full-rewrite table (small dimension state, e.g. host_state)."""
        rel = os.path.join(table, f"snap-{superstep:08d}.parquet")
        df.write.mode("overwrite").parquet(os.path.join(self.root, rel))
        with self._lock:
            self._staged.setdefault(table, []).append(rel)

    def stage_blob(self, name: str, payload: bytes, superstep: int) -> str:
        """Binary sidecar (Bloom shards). Returns the relative path."""
        rel = os.path.join("bloom", f"{name}-{superstep:08d}.bin")
        path = os.path.join(self.root, rel)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(payload)
        os.replace(tmp, path)
        with self._lock:
            self._staged.setdefault("__blobs__", []).append(rel)
        return rel

    def stage_all(self, superstep: int, appends: dict[str, DataFrame],
                  snapshots: dict[str, DataFrame],
                  replaces: dict[str, DataFrame] | None = None) -> None:
        """Stage several table writes CONCURRENTLY (independent Spark jobs
        share the cluster; serial staging leaves executors idle between
        small writes). Visibility still gated by the single commit().
        `replaces` entries compact: their files replace the table's list."""
        replaces = replaces or {}
        n = len(appends) + len(snapshots) + len(replaces)
        with ThreadPoolExecutor(max_workers=max(1, n)) as ex:
            futs = [
                ex.submit(self.stage_append, t, df, superstep)
                for t, df in appends.items()
            ] + [
                ex.submit(self.stage_snapshot, t, df, superstep)
                for t, df in snapshots.items()
            ] + [
                ex.submit(self.stage_append, t, df, superstep, True)
                for t, df in replaces.items()
            ]
            for f in futs:
                f.result()

    def commit(self, superstep: int, counters: dict | None = None) -> None:
        """Atomic superstep commit: carry forward the previous manifest's
        file lists, add this superstep's staged files, rename marker last."""
        prev = self.last_superstep()
        base: dict[str, list[str]] = {}
        snaps: dict[str, str] = {}
        blobs: list[str] = []
        if prev is not None:
            m = self._manifest(prev)
            base = {t: list(fs) for t, fs in m["appends"].items()}
            snaps = dict(m["snapshots"])
            blobs = list(m.get("blobs", []))
        for t, rels in self._staged.items():
            if t == "__blobs__":
                blobs = rels  # latest blob set replaces (bloom is cumulative bits)
            elif t in SNAP_TABLES:
                snaps[t] = rels[-1]
            elif t in self._staged_replace:
                base[t] = list(rels)  # compaction: replace the file list
            else:
                base.setdefault(t, []).extend(rels)
        manifest = {
            "superstep": superstep,
            "appends": base,
            "snapshots": snaps,
            "blobs": blobs,
            "counters": counters or {},
        }
        tmp = self._ckpt_path(superstep) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, self._ckpt_path(superstep))
        self._staged = {}
        self._staged_replace = set()

    # ---- reads (snapshot-as-of) ----

    def read(
        self,
        table: str,
        as_of: int | None = None,
        min_superstep: int | None = None,
    ) -> DataFrame | None:
        """Read a table at a committed superstep (default: latest).
        `min_superstep` skips delta file sets written before that superstep
        (the superstep is part of the delta file name) — Iceberg
        incremental-read: callers that only need recent deltas never touch
        the old files' metadata or data."""
        s = as_of if as_of is not None else self.last_superstep()
        if s is None:
            return None
        m = self._manifest(s)
        if table in SNAP_TABLES:
            rel = m["snapshots"].get(table)
            if rel is None:
                return None
            return self.spark.read.parquet(os.path.join(self.root, rel))
        rels = m["appends"].get(table, [])
        if min_superstep is not None:
            rels = [
                r for r in rels
                if int(os.path.basename(r).split("-")[1]) >= min_superstep
            ]
        if not rels:
            return None
        return self.spark.read.parquet(*[os.path.join(self.root, r) for r in rels])

    def read_blob(self, as_of: int | None = None) -> bytes | None:
        s = as_of if as_of is not None else self.last_superstep()
        if s is None:
            return None
        m = self._manifest(s)
        blobs = m.get("blobs", [])
        if not blobs:
            return None
        with open(os.path.join(self.root, blobs[-1]), "rb") as f:
            return f.read()

    def counters(self, as_of: int | None = None) -> dict:
        s = as_of if as_of is not None else self.last_superstep()
        if s is None:
            return {}
        return self._manifest(s).get("counters", {})

    def rollback_to(self, superstep: int) -> None:
        """Drop commit markers newer than `superstep` (data files become
        orphans, reclaimed by vacuum) — Iceberg rollback-to-snapshot."""
        for s in self.committed_supersteps():
            if s > superstep:
                os.remove(self._ckpt_path(s))

    def vacuum(self) -> int:
        """Delete data files not referenced by any committed manifest."""
        referenced: set[str] = set()
        for s in self.committed_supersteps():
            m = self._manifest(s)
            for fs in m["appends"].values():
                referenced.update(fs)
            referenced.update(m["snapshots"].values())
            referenced.update(m.get("blobs", []))
        removed = 0
        for table in (*APPEND_TABLES, *SNAP_TABLES, "bloom"):
            d = os.path.join(self.root, table)
            if not os.path.isdir(d):
                continue
            for f in os.listdir(d):
                rel = os.path.join(table, f)
                if rel not in referenced and not f.endswith(".tmp"):
                    full = os.path.join(self.root, rel)
                    if os.path.isdir(full):
                        shutil.rmtree(full)
                    else:
                        os.remove(full)
                    removed += 1
        return removed

"""Write-audit-publish snapshot tables: atomic commits on plain parquet.

The merge/upsert/SCD2 family rewrites whole snapshots (correct
single-writer semantics — the reference's full-refresh load,
/root/reference/etl.py:22-29). But a directory-rename swap has a window
where the target path does not exist, and a reader listing files mid-swap
sees a torn table. This module closes that seam with the standard
write-audit-publish protocol, the same commit model Delta Lake and
Iceberg implement with transaction logs:

- every snapshot is an immutable, write-once directory ``v=<n>/``;
- a tiny ``_CURRENT`` manifest names the published version; it is
  replaced by write-temp → fsync → ``os.replace`` — atomic on POSIX, so
  a reader sees either the old pointer or the new one, never a partial
  file and never a missing table;
- the audit hook runs BETWEEN staging and publishing: it sees the fully
  written candidate snapshot and can veto the commit (the "audit" in
  write-audit-publish — e.g. row-count sanity, PII scan, leakage gate);
- a crash anywhere before the pointer swap leaves ``_CURRENT`` on the
  old version and only an unpublished ``v=<n>`` directory to garbage-
  collect; a crash after the swap leaves the new version fully
  published. There is no in-between state.

Readers pin a version at open (``read`` resolves ``_CURRENT`` once);
because snapshot directories are immutable and retired only after
``keep_versions`` newer commits, a long-running reader keeps a
consistent view across concurrent commits — snapshot isolation by
construction.

Upgrade path: on a real lakehouse this entire module is replaced by the
table format's commit protocol — ``df.write.format("delta")`` +
``MERGE INTO`` (Delta's _delta_log is exactly this pointer, with
optimistic concurrency on top) or Iceberg's snapshot commit. The
operators that produce the snapshot DataFrames (operators/merge.py) are
unchanged either way; only the sink swaps.

Local-filesystem scope: ``os.replace`` atomicity holds for POSIX
filesystems and HDFS rename; on S3 the pointer becomes a small object
PUT (single-object PUT is atomic) and directory listing is replaced by
manifest-listed files, which is precisely why Delta/Iceberg exist —
use them there.
"""

from __future__ import annotations

import os
import re
import shutil
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_MANIFEST = "_CURRENT"
_VDIR = re.compile(r"^v=(\d+)$")


class AuditRejected(RuntimeError):
    """Raised by commit() when the audit hook vetoes the candidate."""


class SnapshotTable:
    """A versioned parquet table with atomic write-audit-publish commits."""

    def __init__(self, path: str, keep_versions: int = 2):
        self.path = path
        self.keep_versions = max(1, keep_versions)
        os.makedirs(path, exist_ok=True)

    # -- pointer ----------------------------------------------------------

    def current_version(self) -> int | None:
        try:
            with open(os.path.join(self.path, _MANIFEST)) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return None

    def version_path(self, version: int) -> str:
        return os.path.join(self.path, f"v={version}")

    def _staged_versions(self) -> list[int]:
        out = []
        for name in os.listdir(self.path):
            m = _VDIR.match(name)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    # -- read -------------------------------------------------------------

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """Read the published snapshot (or a pinned historical version).
        Resolves the pointer ONCE — the returned frame keeps reading the
        same immutable directory across later commits."""
        v = self.current_version() if version is None else version
        if v is None:
            raise FileNotFoundError(f"no published snapshot at {self.path}")
        return spark.read.parquet(self.version_path(v))

    def exists(self) -> bool:
        return self.current_version() is not None

    # -- commit -----------------------------------------------------------

    def commit(
        self,
        df: DataFrame,
        audit: Callable[[DataFrame], None] | None = None,
    ) -> int:
        """Write-audit-publish one snapshot; returns the new version.

        1. WRITE ``df`` to the next ``v=<n>`` directory (unpublished —
           invisible to readers, who only follow ``_CURRENT``).
        2. AUDIT the fully written files; an exception (or
           ``AuditRejected``) aborts, removing the staged directory and
           leaving the published version untouched.
        3. PUBLISH by atomically replacing the pointer, then retire
           versions older than ``keep_versions``.
        """
        current = self.current_version()
        staged = self._staged_versions()
        version = max([current if current is not None else -1, *staged, -1]) + 1
        vpath = self.version_path(version)
        df.write.mode("overwrite").parquet(vpath)
        if audit is not None:
            try:
                audit(df.sparkSession.read.parquet(vpath))
            except Exception:
                shutil.rmtree(vpath, ignore_errors=True)
                raise
        self._publish(version)
        self._retire(version)
        return version

    def _publish(self, version: int) -> None:
        tmp = os.path.join(self.path, _MANIFEST + ".tmp")
        with open(tmp, "w") as f:
            f.write(str(version))
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, os.path.join(self.path, _MANIFEST))

    def _retire(self, newest: int) -> None:
        keep_floor = newest - self.keep_versions + 1
        for v in self._staged_versions():
            if v < keep_floor:
                shutil.rmtree(self.version_path(v), ignore_errors=True)


class SnapshotIndex:
    """Atomic write-audit-publish for MULTI-DATASET index directories —
    the staged BM25 index (postings/df/stats) and the saved IVF index
    (cells/centroids). ``SnapshotTable`` commits one DataFrame;
    a retrieval index is several datasets whose writes must become
    visible TOGETHER: ``stage_bm25``'s three writes and
    ``IvfIndex.append_to_saved``'s layout append were the last
    non-atomic publishes in the engine (VERDICT r9 #5 — a crash
    mid-append left scores computed against stale df/N until re-run).

    Protocol (same pointer discipline as ``SnapshotTable``): every
    version is an immutable directory ``v=<n>/`` holding ALL the
    index's datasets; writers stage into the next unpublished version,
    then one write-temp → fsync → ``os.replace`` swap of ``_CURRENT``
    publishes every dataset at once. A crash between any two dataset
    writes leaves the previous version published and fully readable —
    there is no torn state a reader can observe.

    Appends publish a NEW version whose unchanged data files are
    HARDLINKED from the previous version (``link_from_current``):
    O(#files) metadata operations, zero data copy — the local-
    filesystem analogue of a manifest re-reference (a Delta/Iceberg
    append likewise publishes a new snapshot that points at the old
    data files). Hardlinks require staging dir and old version on one
    filesystem, true by construction (same parent directory); on an
    object store this module is replaced by a real table format, as
    the module docstring says.
    """

    def __init__(self, path: str, keep_versions: int = 2):
        self.path = path
        self.keep_versions = max(1, keep_versions)
        os.makedirs(path, exist_ok=True)

    # -- pointer (same protocol as SnapshotTable) --------------------------

    def current_version(self) -> int | None:
        try:
            with open(os.path.join(self.path, _MANIFEST)) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return None

    def exists(self) -> bool:
        return self.current_version() is not None

    def version_path(self, version: int) -> str:
        return os.path.join(self.path, f"v={version}")

    def current_path(self) -> str:
        """Published version directory (the root the index's datasets
        live under). Raises if nothing has been published."""
        v = self.current_version()
        if v is None:
            raise FileNotFoundError(f"no published index at {self.path}")
        return self.version_path(v)

    def _staged_versions(self) -> list[int]:
        out = []
        for name in os.listdir(self.path):
            m = _VDIR.match(name)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    # -- write-audit-publish ----------------------------------------------

    def begin(self) -> str:
        """Create and return the next unpublished ``v=<n>`` staging
        directory. Invisible to readers until ``publish``."""
        current = self.current_version()
        staged = self._staged_versions()
        version = max([current if current is not None else -1, *staged, -1]) + 1
        vpath = self.version_path(version)
        os.makedirs(vpath, exist_ok=True)
        return vpath

    def link_from_current(self, staging: str, dataset: str) -> None:
        """Hardlink ``dataset``'s data files from the published version
        into ``staging`` (append path: old files carried by reference).
        Hidden files (``_SUCCESS``, ``.crc``) are skipped — Spark's
        committer will write fresh ones, and truncating a hardlinked
        marker would reach back into the published version's inode."""
        src_root = os.path.join(self.current_path(), dataset)
        dst_root = os.path.join(staging, dataset)
        for dirpath, _dirs, files in os.walk(src_root):
            rel = os.path.relpath(dirpath, src_root)
            tgt = dst_root if rel == "." else os.path.join(dst_root, rel)
            os.makedirs(tgt, exist_ok=True)
            for f in files:
                if f.startswith(("_", ".")):
                    continue
                os.link(os.path.join(dirpath, f), os.path.join(tgt, f))

    def publish(self, staging: str) -> int:
        """Atomically publish a staged version directory; returns the
        version number. Retires versions older than ``keep_versions``
        (pinned readers keep their already-resolved directory)."""
        name = os.path.basename(staging.rstrip("/"))
        m = _VDIR.match(name)
        if not m or os.path.dirname(staging.rstrip("/")) != self.path.rstrip("/"):
            raise ValueError(f"{staging!r} is not a staging dir of {self.path!r}")
        version = int(m.group(1))
        tmp = os.path.join(self.path, _MANIFEST + ".tmp")
        with open(tmp, "w") as f:
            f.write(str(version))
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, os.path.join(self.path, _MANIFEST))
        keep_floor = version - self.keep_versions + 1
        for v in self._staged_versions():
            if v < keep_floor:
                shutil.rmtree(self.version_path(v), ignore_errors=True)
        return version

    def abort(self, staging: str) -> None:
        """Discard a staged version; the published version is untouched."""
        shutil.rmtree(staging, ignore_errors=True)


def resolve_index_root(path: str) -> str:
    """Root directory a reader should scan for an index at ``path``:
    the published ``v=<n>`` directory when ``path`` is a
    ``SnapshotIndex``, else ``path`` itself (pre-r10 unversioned
    layouts stay readable)."""
    try:
        with open(os.path.join(path, _MANIFEST)) as f:
            return os.path.join(path, f"v={int(f.read().strip())}")
    except (FileNotFoundError, ValueError):
        return path


def compact_snapshot(
    spark: SparkSession,
    table: SnapshotTable,
    target_bytes: int = 128 << 20,
    shuffle: bool = False,
) -> int:
    """Small-file compaction as just another WAP commit: rewrite the
    published snapshot into ``ceil(size / target_bytes)`` files and
    publish atomically — readers mid-compaction keep the fragmented old
    version, and a crash changes nothing. This is the maintenance job
    every streaming upsert sink needs (each micro-batch commit writes
    batch-sized files; compaction folds them back to scan-efficient
    sizes), and on Delta/Iceberg it is OPTIMIZE / rewrite_data_files.

    ``shuffle=False`` uses coalesce — no exchange, each output file
    concatenates input partitions (the cheap path for merging small
    files). ``shuffle=True`` repartitions for even output sizes when the
    inputs are skewed. File sizes come from the snapshot directory
    listing here; a manifest-based table reads them from its metadata.

    Returns the newly published version.
    """
    import math

    v = table.current_version()
    if v is None:
        raise FileNotFoundError(f"no published snapshot at {table.path}")
    vpath = table.version_path(v)
    total = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _dirs, files in os.walk(vpath)
        for f in files
        if f.endswith(".parquet")
    )
    n_files = max(1, math.ceil(total / target_bytes))
    df = spark.read.parquet(vpath)
    df = df.repartition(n_files) if shuffle else df.coalesce(n_files)
    return table.commit(df)

"""Iceberg-shaped snapshot table standin over plain parquet.

The north rule wants crawl state in "Iceberg web-page tables"; this
environment ships no Iceberg runtime jar, so the engine keeps state in a
standin that reproduces the three Iceberg properties the crawl actually
depends on — with the SAME commit protocol, so swapping in a real
catalog when a jar exists changes only the I/O calls, not the logic:

1. **Snapshot isolation + atomic commit.** Every write creates a new
   immutable ``data/snap-<id>`` directory plus a new ``metadata/v<N>.json``;
   the table "is" whatever the single pointer file ``metadata/VERSION``
   names, and the pointer is swapped with ``os.replace`` (POSIX-atomic) —
   the filesystem analogue of Iceberg's catalog compare-and-swap. A crash
   at ANY earlier point (mid data write, mid metadata write) leaves the
   pointer — and therefore the table — at the previous snapshot, with
   only orphan files to garbage-collect, never a torn table.

2. **Idempotent MERGE-shaped commits.** ``merge``/``overwrite`` take an
   ``op_id`` (the crawl passes ``wave=<N>``); a commit whose ``op_id``
   equals the current snapshot's is detected as already-applied and
   SKIPPED, so a driver that dies after commit and replays its wave
   cannot double-apply a delta — Iceberg's snapshot-property dedupe, as
   used by exactly-once writers.

3. **Bucketed layout.** Data files are written through
   ``sinks.write_bucketed`` (bucketBy + sortBy the merge key), so the
   per-wave frontier ⋈ seen anti-join stays exchange-free on both sides
   (tests/test_bucketed_join.py) — the standin's analogue of an Iceberg
   ``bucket(N, key)`` partition transform.

Reference behavior this maps: the reference persists its request cache /
crawl state on disk between runs (markdown_lab/core/cache.py:44-58);
at 10^10 URLs that state is an Iceberg table and the per-wave update is
a MERGE of the wave's delta, not a rewrite. The standin rewrites all
buckets per merge (documented scale gap: a real Iceberg MERGE-on-read
touches only data files containing matched keys).
"""

from __future__ import annotations

import json
import os
import uuid
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

_POINTER = "VERSION"


class SnapshotTable:
    """One Iceberg-standin table rooted at ``root`` (see module docs)."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        name: str,
        key: str = "canon_url",
        buckets: int = 16,
    ) -> None:
        self.spark = spark
        self.root = root
        self.name = name  # catalog name prefix for bucketed registration
        self.key = key
        self.buckets = buckets
        os.makedirs(os.path.join(root, "metadata"), exist_ok=True)
        os.makedirs(os.path.join(root, "data"), exist_ok=True)

    # -- metadata / pointer -------------------------------------------------
    def _meta_path(self, version: int) -> str:
        return os.path.join(self.root, "metadata", f"v{version}.json")

    def _pointer_path(self) -> str:
        return os.path.join(self.root, "metadata", _POINTER)

    def current_meta(self) -> Optional[dict]:
        """The committed metadata, or None for an empty table. Partial
        ``v<N>.json`` files not named by the pointer are invisible."""
        ptr = self._pointer_path()
        if not os.path.exists(ptr):
            return None
        with open(ptr) as f:
            version = int(f.read().strip())
        with open(self._meta_path(version)) as f:
            return json.load(f)

    def current_snapshot_id(self) -> Optional[int]:
        meta = self.current_meta()
        return None if meta is None else meta["snapshot_id"]

    def last_op_id(self) -> Optional[str]:
        meta = self.current_meta()
        return None if meta is None else meta.get("op_id")

    # -- reads --------------------------------------------------------------
    def read(self) -> Optional[DataFrame]:
        """Current snapshot as a DataFrame — via the bucketed catalog
        table when registered (exchange-free joins), else the parquet
        files. None for an empty table."""
        meta = self.current_meta()
        if meta is None:
            return None
        tbl = meta["catalog_table"]
        try:
            if self.spark.catalog.tableExists(tbl):
                return self.spark.table(tbl)
        except Exception:
            pass
        return self.spark.read.parquet(meta["data_path"])

    def read_snapshot(self, snapshot_id: int) -> DataFrame:
        """Time travel: any still-on-disk snapshot by id."""
        return self.spark.read.parquet(
            os.path.join(self.root, "data", f"snap-{snapshot_id}")
        )

    def history(self) -> list:
        meta = self.current_meta()
        return [] if meta is None else meta["history"]

    # -- commits ------------------------------------------------------------
    def _commit(self, df: DataFrame, op: str, op_id: Optional[str]) -> int:
        """Write df as a new snapshot, then atomically swap the pointer.

        Ordering is the Iceberg commit protocol: (1) data files, (2) the
        new metadata json (to a temp name, fsynced, renamed into place),
        (3) the pointer swap — the ONLY step that changes what readers
        see. fsync before each rename so the rename cannot outlive its
        content on a crashed disk."""
        meta = self.current_meta()
        snap_id = (meta["snapshot_id"] + 1) if meta else 1
        version = (meta["version"] + 1) if meta else 1
        data_path = os.path.join(self.root, "data", f"snap-{snap_id}")
        tbl = f"{self.name}_snap{snap_id}"
        from ..sinks import write_bucketed  # noqa: PLC0415

        write_bucketed(df, tbl, data_path, key=self.key, buckets=self.buckets)

        new_meta = {
            "version": version,
            "snapshot_id": snap_id,
            "op": op,
            "op_id": op_id,
            "key": self.key,
            "buckets": self.buckets,
            "data_path": data_path,
            "catalog_table": tbl,
            "history": (meta["history"] if meta else [])
            + [{"snapshot_id": snap_id, "op": op, "op_id": op_id}],
        }
        meta_tmp = self._meta_path(version) + f".tmp-{uuid.uuid4().hex}"
        with open(meta_tmp, "w") as f:
            json.dump(new_meta, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(meta_tmp, self._meta_path(version))

        ptr_tmp = self._pointer_path() + f".tmp-{uuid.uuid4().hex}"
        with open(ptr_tmp, "w") as f:
            f.write(str(version))
            f.flush()
            os.fsync(f.fileno())
        # the atomic commit point: everything before this is invisible
        os.replace(ptr_tmp, self._pointer_path())

        # drop the superseded snapshot's catalog entry (its files remain
        # for time travel; expire_snapshots handles file GC)
        if meta is not None:
            self.spark.sql(
                f"DROP TABLE IF EXISTS {meta['catalog_table']}"
            )
        return snap_id

    def overwrite(self, df: DataFrame, op_id: Optional[str] = None) -> int:
        """Replace the table contents (the frontier's per-wave shape).
        Idempotent per ``op_id``: an already-applied op is skipped."""
        if op_id is not None and op_id == self.last_op_id():
            return self.current_snapshot_id()
        return self._commit(df, "overwrite", op_id)

    def merge_upsert(
        self,
        delta: DataFrame,
        combine,
        op_id: Optional[str] = None,
    ) -> int:
        """MERGE ... WHEN MATCHED THEN UPDATE / WHEN NOT MATCHED THEN
        INSERT, with the row-level resolution expressed as ``combine``
        (a DataFrame -> DataFrame key-grouping aggregation, e.g. the
        crawler's ``_compact_seen``: latest status_wave wins, min depth).
        The new snapshot is ``combine(current ∪ delta)`` — equal to the
        flat compaction of all deltas whenever ``combine`` is an
        associative-commutative per-key aggregate, which keeps the
        standin bit-compatible with the flat checkpoint rebuild.
        Idempotent per ``op_id`` AND by construction (re-merging the same
        delta changes nothing). The table side scans bucket-local when
        the catalog table is registered."""
        if op_id is not None and op_id == self.last_op_id():
            return self.current_snapshot_id()
        cur = self.read()
        merged = delta if cur is None else combine(cur.unionByName(delta))
        return self._commit(merged, "merge_upsert", op_id)

    # -- maintenance --------------------------------------------------------
    def expire_snapshots(self, keep_last: int = 2) -> list:
        """Delete data dirs of all but the newest ``keep_last`` snapshots
        (Iceberg's expire_snapshots). Never touches the current one."""
        import shutil  # noqa: PLC0415

        meta = self.current_meta()
        if meta is None:
            return []
        ids = [h["snapshot_id"] for h in meta["history"]]
        drop = [s for s in ids[:-keep_last] if s != meta["snapshot_id"]]
        dropped = []
        for s in drop:
            p = os.path.join(self.root, "data", f"snap-{s}")
            if os.path.isdir(p):
                shutil.rmtree(p)
                dropped.append(s)
        return dropped

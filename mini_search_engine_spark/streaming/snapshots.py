"""Snapshot-file commit protocol for the segmented index.

Round-3 shipped a directory rename-swap for compaction (the Spark analog
of the reference's segment swap, ``InvertedIndexManager.java:413-431``).
That protocol has two scale problems a 100 TB deployment hits
immediately:

* **Object stores have no atomic directory rename.** On S3A a directory
  "rename" is an O(files) copy+delete — the swap window is minutes, not
  microseconds, and a crash mid-copy strands data.
* Even on HDFS/POSIX, TWO renames (live→trash, tmp→live) leave a window
  with no live directory at all.

The fix is the one every table format (Iceberg, Delta, Hudi) converged
on: segment data directories are IMMUTABLE and never renamed; the unit
of commit is a single small metadata file, ``segments_meta/snap-<id>.json``,
written complete to a temp name and then renamed into place — an atomic
single-file rename everywhere, and a compare-and-swap (Hadoop
``rename`` fails if the destination exists, so two racing committers
cannot both win the same snapshot id; the loser re-reads and retries on
the next id — exactly Iceberg's optimistic-concurrency commit, with the
filesystem standing in for the catalog CAS. On S3, where even file
rename is copy-based, swap `commit_snapshot` for a real catalog /
DynamoDB conditional put — the protocol boundary is this one function).

A snapshot records the complete live state:

* ``segments`` — the segment dir names that ARE the index,
* ``folded`` — every micro-batch segment id ever merged into a compact
  segment (replay-safety: a checkpointed stream that replays a batch
  whose segment was already compacted must not resurrect it),
* ``parent`` — the previous snapshot id (lineage/time travel).

Crash semantics: a crash ANYWHERE leaves the previous snapshot current —
readers never see a partial state. Data dirs written but not referenced
by a committed snapshot are invisible garbage, collected by ``gc()``.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from mini_search_engine_spark.index.build import _hadoop_fs, _read_sidecar

SNAP_DIR = "segments_meta"
_SNAP_RE = re.compile(r"^snap-(\d+)\.json$")
_MAX_COMMIT_RETRIES = 20


@dataclass
class Snapshot:
    snapshot_id: int
    segments: list[str]
    folded: list[str] = field(default_factory=list)
    parent: int | None = None
    # doc-tombstone file names under <index>/deletes/, applied merge-on-read
    # by read_segmented_index and physically purged at compaction — the
    # Iceberg equality-delete-file analog (see index/deletes.py)
    deletes: list[str] = field(default_factory=list)

    def to_json(self) -> str:
        return json.dumps(
            {
                "snapshot_id": self.snapshot_id,
                # the segment list is the read path's source of truth — a
                # duplicate name would double-count its documents
                "segments": sorted(set(self.segments)),
                "folded": sorted(set(self.folded)),
                "deletes": sorted(set(self.deletes)),
                "parent": self.parent,
                # terminator: a truncated partial write parses as invalid
                # JSON or lacks this field and is skipped by readers
                "committed": True,
            }
        )


def _meta_path(index_path: str) -> str:
    return f"{index_path}/{SNAP_DIR}"


def list_snapshot_ids(spark: SparkSession, index_path: str) -> list[int]:
    fs, meta = _hadoop_fs(spark, _meta_path(index_path))
    if not fs.exists(meta):
        return []
    out = []
    for st in fs.listStatus(meta):
        m = _SNAP_RE.match(st.getPath().getName())
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def read_snapshot(spark: SparkSession, index_path: str, snapshot_id: int) -> Snapshot | None:
    text = _read_sidecar(
        spark, f"{_meta_path(index_path)}/snap-{snapshot_id}.json"
    )
    if not text:
        return None
    try:
        d = json.loads(text)
    except ValueError:
        return None  # torn write — never committed
    if not d.get("committed"):
        return None
    return Snapshot(
        snapshot_id=int(d["snapshot_id"]),
        segments=list(d["segments"]),
        folded=list(d.get("folded", [])),
        parent=d.get("parent"),
        deletes=list(d.get("deletes", [])),
    )


def current_snapshot(spark: SparkSession, index_path: str) -> Snapshot | None:
    """Newest committed snapshot (highest id whose file parses complete)."""
    for sid in reversed(list_snapshot_ids(spark, index_path)):
        snap = read_snapshot(spark, index_path, sid)
        if snap is not None:
            return snap
    return None


def commit_snapshot(
    spark: SparkSession,
    index_path: str,
    segments: list[str],
    folded: list[str] | set[str] = (),
    deletes: list[str] | set[str] = (),
) -> Snapshot:
    """Atomically commit the next snapshot; returns the committed Snapshot.

    Optimistic concurrency: the file is staged under a temp name and
    renamed to ``snap-<id>.json``; Hadoop rename fails when the
    destination exists, so a racing committer loses cleanly and retries
    with the next id (re-reading is the CALLER's job if it must rebase
    its segment list — the single-writer streams here never race)."""
    fs, meta = _hadoop_fs(spark, _meta_path(index_path))
    fs.mkdirs(meta)
    parent = current_snapshot(spark, index_path)
    next_id = (parent.snapshot_id + 1) if parent else 0
    for attempt in range(_MAX_COMMIT_RETRIES):
        snap = Snapshot(
            snapshot_id=next_id + attempt,
            segments=list(segments),
            folded=sorted(set(folded)),
            parent=parent.snapshot_id if parent else None,
            deletes=sorted(set(deletes)),
        )
        tmp_name = f"{_meta_path(index_path)}/.snap-{snap.snapshot_id}.json.tmp"
        _, tmp = _hadoop_fs(spark, tmp_name)
        out = fs.create(tmp, True)
        try:
            out.write(bytearray(snap.to_json().encode("utf-8")))
        finally:
            out.close()
        _, dst = _hadoop_fs(
            spark, f"{_meta_path(index_path)}/snap-{snap.snapshot_id}.json"
        )
        if fs.rename(tmp, dst):  # the CAS: fails iff someone else committed this id
            return snap
        fs.delete(tmp, False)
    raise IOError(
        f"snapshot commit lost {_MAX_COMMIT_RETRIES} races at {index_path}"
    )


def gc(
    spark: SparkSession,
    index_path: str,
    retain_snapshots: int = 2,
) -> list[str]:
    """Delete segment dirs unreferenced by the newest ``retain_snapshots``
    committed snapshots, plus snapshot files older than those. Default
    retains the current AND previous snapshot so an in-flight reader that
    planned against the previous one still finds its files (the same
    grace Iceberg's ``expire_snapshots`` gives). Returns deleted names."""
    ids = list_snapshot_ids(spark, index_path)
    if not ids:
        return []
    keep_ids = ids[-max(1, retain_snapshots):]
    referenced: set[str] = set()
    live_deletes: set[str] = set()
    for sid in keep_ids:
        snap = read_snapshot(spark, index_path, sid)
        if snap:
            referenced.update(snap.segments)
            live_deletes.update(snap.deletes)
    deleted: list[str] = []
    fs, segroot = _hadoop_fs(spark, f"{index_path}/segments")
    if fs.exists(segroot):
        for st in fs.listStatus(segroot):
            name = st.getPath().getName()
            if st.isDirectory() and name.startswith("seg=") and name[len("seg="):] not in referenced:
                fs.delete(st.getPath(), True)
                deleted.append(name)
    # tombstone files no retained snapshot references (compaction physically
    # purged them, or their snapshot expired) are garbage like segment dirs
    _, delroot = _hadoop_fs(spark, f"{index_path}/deletes")
    if fs.exists(delroot):
        for st in fs.listStatus(delroot):
            name = st.getPath().getName()
            if name not in live_deletes:
                fs.delete(st.getPath(), True)
                deleted.append(f"deletes/{name}")
    for sid in ids[: -max(1, retain_snapshots)]:
        _, p = _hadoop_fs(spark, f"{_meta_path(index_path)}/snap-{sid}.json")
        fs.delete(p, False)
    return deleted

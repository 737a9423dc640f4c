"""Snapshot-manifest table store: Iceberg-style commit/resume over Parquet.

No Iceberg runtime jar exists in this environment (verified — SURVEY.md §7.6),
so this emulates the subset of Iceberg semantics the north rule needs, with
the same atomicity shape Iceberg uses (write data files → atomically publish
a manifest that makes them visible):

- data lives under ``root/data/group=<gid>/`` — one directory per committed
  bucket-group (the commit unit);
- a commit writes ``root/_snapshots/manifest-<N>.json`` via fsync'd temp
  file + ``os.link`` (the POSIX compare-and-swap: publish fails loudly if a
  concurrent committer already claimed the snapshot id, where rename would
  silently overwrite) + directory fsync, recording: snapshot id, parent id,
  the bucket ids covered, data paths, and counter metrics;
- readers see exactly the union of data paths listed in manifests — an
  uncommitted/partially-written group directory is invisible;
- resume = recompute the input's bucket-group partition, anti-filter the
  groups already present in manifests, process only the rest. Re-running a
  failed group overwrites its directory before the manifest publish, so the
  pipeline is idempotent (exactly-once per group).

On a real cluster the same class works unchanged on any shared filesystem
with atomic link/rename (HDFS, NFS); for S3-class stores swap the link for
a conditional PUT (If-None-Match).
"""

from __future__ import annotations

import json
import os
import tempfile
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Set


@dataclass
class Snapshot:
    snapshot_id: int
    parent_id: Optional[int]
    group_ids: List[int]
    data_paths: List[str]
    counters: Dict[str, int] = field(default_factory=dict)


class SnapshotStore:
    def __init__(self, root: str):
        self.root = root
        self.snap_dir = os.path.join(root, "_snapshots")
        os.makedirs(self.snap_dir, exist_ok=True)
        os.makedirs(os.path.join(root, "data"), exist_ok=True)

    # -- reading ----------------------------------------------------------
    def snapshots(self) -> List[Snapshot]:
        out = []
        for name in sorted(os.listdir(self.snap_dir)):
            if not (name.startswith("manifest-") and name.endswith(".json")):
                continue
            with open(os.path.join(self.snap_dir, name)) as f:
                d = json.load(f)
            out.append(Snapshot(**d))
        out.sort(key=lambda s: s.snapshot_id)
        return out

    def committed_groups(self) -> Set[int]:
        return {g for s in self.snapshots() for g in s.group_ids}

    def data_paths(self) -> List[str]:
        return [p for s in self.snapshots() for p in s.data_paths]

    def counters(self) -> Dict[str, int]:
        total: Dict[str, int] = {}
        for s in self.snapshots():
            for k, v in s.counters.items():
                total[k] = total.get(k, 0) + v
        return total

    def group_path(self, gid: int) -> str:
        return os.path.join(self.root, "data", f"group={gid}")

    # -- committing -------------------------------------------------------
    def commit(
        self, group_ids: List[int], data_paths: List[str], counters: Dict[str, int]
    ) -> Snapshot:
        snaps = self.snapshots()
        sid = (snaps[-1].snapshot_id + 1) if snaps else 1
        snap = Snapshot(
            snapshot_id=sid,
            parent_id=snaps[-1].snapshot_id if snaps else None,
            group_ids=sorted(group_ids),
            data_paths=sorted(data_paths),
            counters=dict(counters),
        )
        fd, tmp = tempfile.mkstemp(dir=self.snap_dir, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(snap.__dict__, f, indent=1)
            # durability before visibility: without the fsync a crash can
            # make the publish durable while the contents are not, leaving a
            # truncated manifest that poisons every later read/resume
            f.flush()
            os.fsync(f.fileno())
        final = os.path.join(self.snap_dir, f"manifest-{sid:06d}.json")
        try:
            # conditional publish (the POSIX compare-and-swap): link() fails
            # with EEXIST if another committer already published this
            # snapshot id — rename() would silently overwrite their commit
            os.link(tmp, final)
        except FileExistsError:
            os.unlink(tmp)
            raise RuntimeError(
                f"snapshot {sid} already committed by a concurrent writer"
            )
        os.unlink(tmp)
        # make the directory entry itself durable
        dfd = os.open(self.snap_dir, os.O_RDONLY)
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)
        return snap

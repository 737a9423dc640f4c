#!/usr/bin/env python
"""Snapshot-store maintenance (Iceberg table-maintenance analog): compact
manifests into one checkpoint, expire superseded manifests, GC orphaned
group directories, or print the commit-log history (time-travel audit).
Pure metadata/filesystem work — no Spark session.

    python jobs/run_maintain.py --store _data/out/scrub \
        [--no-expire] [--remove-orphans-older-than 3600] [--history]

Retention contract (README "Snapshot retention"): compaction publishes a
checkpoint manifest via the same crash-safe CAS as a commit; expiry deletes
only manifests the checkpoint supersedes; orphan GC deletes only data dirs
no live manifest references AND whose newest file is older than the window
(in-flight writers are never collected). Resume/read semantics are
unchanged at every step — pinned by tests/test_spark_pipeline.py's
lifecycle tests.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--store", required=True,
                   help="snapshot root (the dir holding _snapshots/ + data/)")
    p.add_argument("--no-expire", action="store_true",
                   help="compact only; keep superseded manifests as history")
    p.add_argument("--remove-orphans-older-than", type=float, default=None,
                   metavar="SECONDS",
                   help="also GC unreferenced data/group dirs older than this")
    p.add_argument("--history", action="store_true",
                   help="print the commit log (snapshot id, parent,"
                        " checkpoint flag, groups, counters) and exit —"
                        " no compaction/expiry")
    args = p.parse_args()

    from pii_detection_redaction_spark.sources.snapshots import SnapshotStore

    store = SnapshotStore(args.store)
    if args.history:
        print(json.dumps(store.history()))
        return
    n_before = len(store.snapshots())
    cp = store.compact_manifests()
    out = {
        "manifests_before": n_before,
        "checkpoint_id": cp.snapshot_id,
        "groups": len(cp.group_ids),
        "expired": 0 if args.no_expire else store.expire_snapshots(),
    }
    if args.remove_orphans_older_than is not None:
        out["orphans_removed"] = len(
            store.remove_orphans(min_age_s=args.remove_orphans_older_than)
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()

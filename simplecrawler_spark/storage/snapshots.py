"""S4/S5 — snapshot-versioned storage with atomic manifest commits.

Plays the role of the reference's ``queue.freeze()``/``queue.defrost()``
(``lib/queue.js:≈L330–425``) — but as Iceberg-style table snapshots: every
BSP round appends immutable parquet deltas and then atomically commits a
tiny JSON manifest (write-tmp + ``os.replace``). A crash between commits
leaves orphan round directories that resume deletes; task retries are
idempotent because deltas for a round are only referenced once the manifest
lands.

No Iceberg jar ships in this sandbox (SURVEY.md §7.0); this layer exposes
the same semantics (atomic commit, time travel by round, lineage via parent
pointers) behind a path-based API that swaps for a real Iceberg catalog via
``--packages org.apache.iceberg:iceberg-spark-runtime-*`` on a cluster.

Layout under ``warehouse/``::

    queued/round=R/     append-only frontier admissions (delta per round)
    fetched/round=R/    fetch outcomes (delta per round; crawl-order record)
    seen/round=R/bucket=B/   url_seen delta, hash-bucketed
    metrics/round=R/    per-partition event counters
    sidecars/bucket=B/  bloom.npy + cuckoo.npy membership tiers (rebuilt on resume)
    manifests/manifest-R.json   atomic commit point, parent pointer = lineage
"""

from __future__ import annotations

import json
import os
import re
import shutil
import time


class Warehouse:
    # "seen" holds the unified frontier/url_seen delta (one write serves
    # both roles — see operators/dedupe.register_new); "robots" is the
    # lazily-upserted per-host rules table (S3, lazy mode only)
    TABLES = ("fetched", "seen", "metrics", "robots")

    def __init__(self, root: str):
        self.root = root
        for t in self.TABLES:
            os.makedirs(os.path.join(root, t), exist_ok=True)
        os.makedirs(os.path.join(root, "manifests"), exist_ok=True)
        os.makedirs(os.path.join(root, "sidecars"), exist_ok=True)

    # --- paths ---
    def table_dir(self, table: str) -> str:
        return os.path.join(self.root, table)

    def round_dir(self, table: str, rnd: int) -> str:
        return os.path.join(self.root, table, f"round={rnd}")

    def round_paths(self, table: str, upto_round: int) -> list[str]:
        """Existing committed delta dirs for ``table`` with round ≤ R."""
        out = []
        for r in range(upto_round + 1):
            p = self.round_dir(table, r)
            if os.path.isdir(p):
                out.append(p)
        return out

    def sidecar_path(self, bucket: int, kind: str) -> str:
        return os.path.join(self.root, "sidecars", f"bucket={bucket}", f"{kind}.npy")

    # --- manifests ---
    def _manifest_path(self, rnd: int) -> str:
        return os.path.join(self.root, "manifests", f"manifest-{rnd}.json")

    def commit(self, rnd: int, state: dict) -> None:
        """Atomic snapshot commit: the manifest IS the transaction."""
        state = dict(state)
        state.update(
            round=rnd,
            parent=rnd - 1 if rnd > 0 else None,
            committed_at=time.time(),
        )
        tmp = self._manifest_path(rnd) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f, sort_keys=True)
        os.replace(tmp, self._manifest_path(rnd))

    def latest_round(self) -> int | None:
        best = None
        for name in os.listdir(os.path.join(self.root, "manifests")):
            m = re.fullmatch(r"manifest-(\d+)\.json", name)
            if m:
                r = int(m.group(1))
                best = r if best is None else max(best, r)
        return best

    def load_manifest(self, rnd: int) -> dict:
        with open(self._manifest_path(rnd)) as f:
            return json.load(f)

    def lineage(self, rnd: int) -> list[dict]:
        """Snapshot chain root→R via parent pointers."""
        chain = []
        cur: int | None = rnd
        while cur is not None:
            m = self.load_manifest(cur)
            chain.append(m)
            cur = m.get("parent")
        return list(reversed(chain))

    def drop_orphans(self, committed_round: int) -> list[str]:
        """Delete round dirs newer than the last committed manifest (partial
        writes from a crashed round) — called on resume before any read."""
        dropped = []
        for t in self.TABLES:
            base = self.table_dir(t)
            for name in os.listdir(base):
                m = re.fullmatch(r"round=(\d+)", name)
                if m and int(m.group(1)) > committed_round:
                    shutil.rmtree(os.path.join(base, name))
                    dropped.append(os.path.join(base, name))
        return dropped

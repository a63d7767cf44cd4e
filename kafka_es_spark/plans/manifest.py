"""C1/W2 — checkpoint manifest: per-shard lineage + counters, atomic commit.

Mirrors the reference's flush-before-offset-commit contract
(ElasticsearchSinkTask.kt:312-332): a shard's manifest entry is written
only AFTER its segment files are durably on disk, via write-to-temp +
atomic rename. Resume scans the manifest and skips complete shards, so an
interrupted build recomputes only missing shards (partition-granular
resume per the north rule). Counter set mirrors the reference's Prometheus
metrics (Metrics.kt:24-59): docs, terms, postings, bytes, elapsed.

On a real cluster the manifest lives on the object store / HDFS; rename
atomicity per entry-file is the same primitive Spark's own commit
protocols use.
"""

from __future__ import annotations

import json
import os
import tempfile
import time


class Manifest:
    def __init__(self, index_dir: str):
        self.dir = os.path.join(index_dir, "_manifest")
        os.makedirs(self.dir, exist_ok=True)

    def _path(self, name: str) -> str:
        return os.path.join(self.dir, f"{name}.json")

    def is_complete(self, name: str) -> bool:
        p = self._path(name)
        if not os.path.exists(p):
            return False
        with open(p) as f:
            return json.load(f).get("status") == "complete"

    def commit(self, name: str, counters: dict) -> None:
        """Atomic write-then-rename; entry exists ⟺ the stage is durable."""
        entry = {"name": name, "status": "complete", "committed_at": time.time(), **counters}
        fd, tmp = tempfile.mkstemp(dir=self.dir, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(entry, f)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, self._path(name))

    def read(self, name: str) -> dict | None:
        p = self._path(name)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def entries(self) -> list[dict]:
        out = []
        for fn in sorted(os.listdir(self.dir)):
            if fn.endswith(".json"):
                with open(os.path.join(self.dir, fn)) as f:
                    out.append(json.load(f))
        return out

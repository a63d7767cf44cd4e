"""X9 — delete/update semantics (ES bulk Delete/Update ops, BulkAction.kt:55-85).

The reference routes Delete tombstones to ES; ES hides deleted docs from
search until segment merge. Spark-first equivalent (SURVEY.md §2.8 X9):
deletes are a tombstone set anti-joined against candidates before scoring —
a broadcast anti-join when the tombstone set is small (the common case),
falling back to a shuffle anti-join (AQE decides via size stats).

v1 update semantics = rebuild-on-change (documented); painless-script
updates (BulkActionTests.kt:193-201) are out of scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def apply_tombstones(df: DataFrame, tombstones: DataFrame, key: str = "doc_id") -> DataFrame:
    """Remove rows whose ``key`` appears in the tombstone set (left_anti)."""
    return df.join(tombstones.select(key).distinct(), key, "left_anti")

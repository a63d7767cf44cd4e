"""X9 — delete/update semantics (ES bulk Delete/Update/Index ops,
BulkAction.kt:55-102).

The reference routes actions to ES; ES applies last-write-wins per _id and
hides deleted docs from search until segment merge. Spark-first equivalents
(SURVEY.md §2.8 X9):

* ``latest_versions`` — upsert resolution at build time: the newest version
  per document key wins (index/create/update all collapse to this in a
  batch rebuild; real ingest is dominated by updates).
* ``apply_tombstones`` — deletes as an anti-join before scoring — a
  broadcast anti-join when the tombstone set is small (the common case),
  falling back to a shuffle anti-join (AQE decides via size stats).
* in-query exclusion lives in ``wand.Searcher.topk(exclude_doc_ids=…)`` —
  the live-docs-bitset analogue: tombstoned docs are skipped inside the
  scorer, corpus stats stay those of the built index (exactly ES's
  behavior between delete and segment merge).

Painless-script updates (BulkActionTests.kt:193-201) are out of scope
(documented).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def apply_tombstones(df: DataFrame, tombstones: DataFrame, key: str = "doc_id") -> DataFrame:
    """Remove rows whose ``key`` appears in the tombstone set (left_anti)."""
    return df.join(tombstones.select(key).distinct(), key, "left_anti")


def latest_versions(
    df: DataFrame, key: str = "url", version: str = "warc_ts"
) -> DataFrame:
    """Upsert resolution: keep the newest ``version`` row per ``key``
    (last-write-wins, the batch collapse of ES index/update semantics).
    One shuffle (window over key); deterministic under version ties via a
    content-hash tiebreak, so the survivor set is a pure function of the
    data, independent of partitioning."""
    tiebreak = F.xxhash64(F.struct(*[F.col(c) for c in df.columns]))
    w = Window.partitionBy(key).orderBy(F.col(version).desc(), tiebreak.asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )

"""Synthetic `actions` fixture (FIXTURES.md §3) — the reference's record shape.

Mirrors header-borne action meta + JSON body (JsonConverter.kt:42-64) incl.
the proto-int64-as-string quirk ({"counter":"0"},
ElasticsearchBulkSenderTests.kt:217). Deterministic (seeded numpy).
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

ACTIONS_SCHEMA = T.StructType(
    [
        T.StructField("topic", T.StringType(), False),
        T.StructField("op", T.StringType(), True),
        T.StructField("id", T.StringType(), True),
        T.StructField("index", T.StringType(), True),
        T.StructField("routing", T.StringType(), True),
        T.StructField("tag", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
    ]
)

TOPICS = ["orders-topic", "users-topic", "untracked-topic"]
OPS = ["index", "index", "index", "create", "update", "delete"]


def gen_actions_pdf(n_rows: int, seed: int = 42) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n_rows):
        topic = TOPICS[int(rng.integers(0, len(TOPICS)))]
        op = OPS[int(rng.integers(0, len(OPS)))] if rng.random() > 0.02 else None
        rid = str(i) if (op in ("delete", "update") or rng.random() > 0.1) else None
        index = "explicit-index" if rng.random() < 0.2 else None
        routing = str(int(rng.integers(0, 50))) if rng.random() < 0.3 else None
        tag = None if rng.random() < 0.7 else ("blue" if rng.random() < 0.5 else "green")
        if op == "delete":
            source = None
        else:
            body = {"id": i, "name": f"doc {i}", "counter": str(int(rng.integers(0, 5)))}
            source = json.dumps(body, separators=(",", ":"))
        rows.append((topic, op, rid, index, routing, tag, source))
    return pd.DataFrame(
        rows, columns=["topic", "op", "id", "index", "routing", "tag", "source"]
    )


def gen_actions(spark: SparkSession, n_rows: int, seed: int = 42) -> DataFrame:
    return spark.createDataFrame(gen_actions_pdf(n_rows, seed), schema=ACTIONS_SCHEMA)

"""Ingestion-edge operators vs the reference's observable semantics,
incl. golden NDJSON strings from BulkActionTests.kt and the router's
Int.MIN_VALUE hash edge from ActorsTests.kt:35-43."""

import pytest

from pyspark.sql import functions as F, types as T

from kafka_es_spark.operators.ingest import (
    assert_index_resolved,
    bulk_ndjson,
    drop_null_actions,
    explode_actions,
    java_string_hashcode,
    resolve_index,
    route,
    split_retriable,
    tag_filter,
)
from kafka_es_spark.sources.actions import gen_actions


@pytest.fixture(scope="module")
def actions(spark):
    return gen_actions(spark, 300).cache()


def _java_hash_py(s: str) -> int:
    h = 0
    for c in s:
        h = (h * 31 + ord(c)) & 0xFFFFFFFF
    return h - 2**32 if h >= 2**31 else h


def test_java_hashcode_parity(spark):
    keys = ["", "a", "some key", "another-key-42", "polygenelubricants", "ффф", "0", "テスト"]
    df = spark.createDataFrame([(k,) for k in keys], ["k"])
    got = {r["k"]: r["h"] for r in df.select("k", java_string_hashcode("k").alias("h")).collect()}
    for k in keys:
        assert got[k] == _java_hash_py(k), k
    # the reference's mask edge: hashCode == Int.MIN_VALUE (Actors.kt:66)
    assert got["polygenelubricants"] == -(2**31)


def test_route_groups(spark):
    # (h & 0x7FFFFFFF) % n, routing ?? id, null keys spread randomly
    df = spark.createDataFrame(
        [("r1", "i1"), (None, "i2"), (None, None), ("polygenelubricants", "x")],
        ["routing", "id"],
    )
    out = {(r["routing"], r["id"]): r["route_group"] for r in route(df, 4).collect()}
    assert out[("r1", "i1")] == (_java_hash_py("r1") & 0x7FFFFFFF) % 4
    assert out[(None, "i2")] == (_java_hash_py("i2") & 0x7FFFFFFF) % 4
    # Int.MIN_VALUE & 0x7FFFFFFF == 0
    assert out[("polygenelubricants", "x")] == 0
    assert 0 <= out[(None, None)] < 4


def test_tag_filter(spark, actions):
    n_all = actions.count()
    assert tag_filter(actions, None).count() == n_all
    kept = tag_filter(actions, "blue")
    assert kept.filter(F.col("tag") == "green").count() == 0
    assert kept.count() == actions.filter(F.col("tag").isNull() | (F.col("tag") == "blue")).count()


def test_drop_null_and_explode(spark, actions):
    assert drop_null_actions(actions).filter(F.col("op").isNull()).count() == 0
    nested = actions.limit(10).agg(F.collect_list(F.struct("op", "id")).alias("actions"))
    assert explode_actions(nested).count() == 10


def test_resolve_index(spark, actions):
    m = {"orders-topic": "orders-v1", "users-topic": "users-v1"}
    r = resolve_index(actions, m, default_index=None)
    # explicit index wins; mapped topics resolve; untracked topic w/o explicit stays null
    assert r.filter((F.col("topic") == "orders-topic") & (F.col("index") == "orders-v1")).count() > 0
    assert r.filter(F.col("index") == "explicit-index").count() == \
        actions.filter(F.col("index") == "explicit-index").count()
    unresolved = r.filter(F.col("index").isNull()).count()
    assert unresolved == actions.filter(
        (F.col("topic") == "untracked-topic") & (F.col("index").isNull())
    ).count()
    with pytest.raises(ValueError):
        assert_index_resolved(r)
    assert_index_resolved(resolve_index(actions, m, default_index="fallback"))


def test_bulk_ndjson_goldens(spark):
    """Exact strings from BulkActionTests.kt:27-78 (meta) and :158-224 (with source)."""
    rows = [
        # op, id, type, index, routing, source, retry
        ("index", "111", None, None, None, None, None),
        ("index", "111", "_doc", None, None, None, None),
        ("index", "111", "_doc", "test", "222", None, None),
        ("delete", "321", None, None, None, None, None),
        ("delete", "321", "product", "catalog", "564", None, None),
        ("update", "123", None, None, "456", None, None),
        ("update", "123", "order", "test", "456", None, 5),
        ("create", "987", "company", "test", "654", None, None),
        ("index", "123", None, "test", None, '{"name":"Teo"}', None),
    ]
    schema = "op string, id string, type string, index string, routing string, source string, retry int"
    df = spark.createDataFrame(rows, schema)
    got = {
        (r["op"], r["id"], r["type"], r["routing"], r["retry"]): r["ndjson"]
        for r in bulk_ndjson(df, retry_col="retry").collect()
    }
    assert got[("index", "111", None, None, None)] == '{"index":{"_id":"111"}}'
    assert got[("index", "111", "_doc", None, None)] == '{"index":{"_id":"111","_type":"_doc"}}'
    assert got[("index", "111", "_doc", "222", None)] == \
        '{"index":{"_id":"111","_type":"_doc","_index":"test","routing":"222"}}'
    assert got[("delete", "321", None, None, None)] == '{"delete":{"_id":"321"}}'
    assert got[("delete", "321", "product", "564", None)] == \
        '{"delete":{"_id":"321","_type":"product","_index":"catalog","routing":"564"}}'
    assert got[("update", "123", None, "456", None)] == \
        '{"update":{"_id":"123","routing":"456"}}'
    assert got[("update", "123", "order", "456", 5)] == \
        '{"update":{"_id":"123","_type":"order","_index":"test","routing":"456","retry_on_conflict":5}}'
    assert got[("create", "987", "company", "654", None)] == \
        '{"create":{"_id":"987","_type":"company","_index":"test","routing":"654"}}'
    assert got[("index", "123", None, None, None)] == \
        '{"index":{"_id":"123","_index":"test"}}\n{"name":"Teo"}'


def test_split_retriable(spark):
    df = spark.createDataFrame(
        [("a", "parsing_exception"), ("b", "version_conflict_engine_exception"),
         ("c", None), ("d", "routing_missing_exception")],
        ["id", "error_type"],
    )
    fatal, retriable = split_retriable(df)
    assert {r["id"] for r in fatal.collect()} == {"a", "d"}
    assert {r["id"] for r in retriable.collect()} == {"b"}


def test_group_into_bulks(spark, actions):
    from kafka_es_spark.operators.ingest import group_into_bulks

    acts = actions.filter(F.col("op").isNotNull() & F.col("id").isNotNull())
    n = acts.count()
    bulks = group_into_bulks(acts, bulk_size=25, concurrency=4).collect()
    assert sum(r["n_actions"] for r in bulks) == n
    assert all(r["n_actions"] <= 25 for r in bulks)
    # groups are packed greedily: at most one partial bulk per route group
    from collections import defaultdict

    per_group = defaultdict(list)
    for r in bulks:
        per_group[r["route_group"]].append(r["n_actions"])
    for g, sizes in per_group.items():
        assert sum(1 for s in sizes if s < 25) <= 1, (g, sizes)
    # payload is NDJSON: one meta line per action (+ source lines)
    r0 = max(bulks, key=lambda r: r["n_actions"])
    metas = [l for l in r0["payload"].split("\n") if l.startswith('{"')]
    assert len(metas) >= r0["n_actions"]


def test_write_bulk_ndjson(spark, actions, tmp_path):
    from kafka_es_spark.operators.ingest import group_into_bulks, write_bulk_ndjson

    acts = actions.filter(F.col("op").isNotNull() & F.col("id").isNotNull()).limit(40)
    out = str(tmp_path / "bulks")
    write_bulk_ndjson(group_into_bulks(acts, bulk_size=10), out)
    txt = spark.read.text(out)
    assert txt.count() > 0


def test_protobuf_gate(spark, actions):
    from kafka_es_spark.operators.ingest import decode_protobuf_actions

    try:
        from pyspark.sql.protobuf.functions import from_protobuf  # noqa: F401
        pytest.skip("spark-protobuf available; gate not exercised")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="spark-protobuf"):
        decode_protobuf_actions(actions, "source", "kafka_es.BulkAction", "/tmp/x.desc")

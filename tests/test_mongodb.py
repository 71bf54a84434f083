"""mongodb receiver semantics (receiver/mongodbreceiver/metrics.go)."""
from __future__ import annotations

import json

import pytest

from opentelemetry_collector_contrib_spark.operators.receivers import (
    mongodb_stats,
)


@pytest.fixture(scope="module")
def spark():
    from opentelemetry_collector_contrib_spark.session import get_spark

    return get_spark()


def test_mongodb_kinds(spark):
    dbstats = json.dumps({"collections": 4, "dataSize": 100,
                          "storageSize": 50, "objects": 10,
                          "indexSize": 7, "numExtents": 3})
    ss = json.dumps({"connections": {"active": 2, "available": 98,
                                     "current": 5},
                     "mem": {"resident": 3, "virtual": 7},
                     "metrics": {"document": {"inserted": 11,
                                              "updated": 12,
                                              "deleted": 13}}})
    admin = json.dumps({
        "storageEngine": {"name": "wiredTiger"},
        "wiredTiger": {
            "session": {"open session count": 9},
            "cache": {"bytes read into cache": 77,
                      "pages read into cache": 30,
                      "pages requested from the cache": 100}},
        "globalLock": {"totalTime": 123456,
                       "activeClients": {"readers": 1, "writers": 2}},
        "ok": 1,
    })
    rows = mongodb_stats(spark.createDataFrame(
        [(1, "dbstats", dbstats, "db0"),
         (2, "serverstatus", ss, "db0"),
         (3, "admin", admin, "admin")],
        ["id", "kind", "body", "database"],
    )).collect()
    db = {(r.mb_metric, r.mb_attr): r for r in rows if r.id == 1}
    assert db[("mongodb.collection.count", None)].mb_value == 4
    # 5.0 server: numExtents is the MMAPv1 relic, not emitted
    assert ("mongodb.extent.count", None) not in db
    # missing indexes -> AddPartial row
    assert db[("mongodb.index.count", None)].mb_ok is False
    sv = {(r.mb_metric, r.mb_attr): r for r in rows if r.id == 2}
    # mem: Mi -> bytes
    assert sv[("mongodb.memory.usage", "resident")].mb_value == \
        3 * 1048576
    assert sv[("mongodb.document.operation.count",
               "insert")].mb_value == 11
    ad = {(r.mb_metric, r.mb_attr): r for r in rows if r.id == 3}
    assert ad[("mongodb.session.count", None)].mb_value == 9
    # cache hit = requested - read
    assert ad[("mongodb.cache.operations", "miss")].mb_value == 30
    assert ad[("mongodb.cache.operations", "hit")].mb_value == 70
    # totalTime µs -> ms integer division
    assert ad[("mongodb.global_lock.time", None)].mb_value == 123
    assert ad[("mongodb.health", None)].mb_value == 1


def test_mongodb_non_wiredtiger(spark):
    admin = json.dumps({
        "storageEngine": {"name": "inMemory"},
        "wiredTiger": {"session": {"open session count": 9}},
        "ok": 1,
    })
    rows = mongodb_stats(spark.createDataFrame(
        [(1, "admin", admin, "admin")],
        ["id", "kind", "body", "database"],
    )).collect()
    by = {(r.mb_metric, r.mb_attr) for r in rows}
    # session + cache metrics silently skipped on other engines
    assert ("mongodb.session.count", None) not in by
    assert ("mongodb.cache.operations", "miss") not in by
    assert ("mongodb.health", None) in by


def test_mongodb_extents_pre44(spark):
    dbstats = json.dumps({"collections": 1, "numExtents": 3})
    rows = mongodb_stats(
        spark.createDataFrame([(1, "dbstats", dbstats, "db0")],
                              ["id", "kind", "body", "database"]),
        mongo_version="4.2",
    ).collect()
    by = {r.mb_metric: r for r in rows}
    assert by["mongodb.extent.count"].mb_value == 3

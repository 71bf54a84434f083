"""elasticsearch receiver node-stats semantics."""
from __future__ import annotations

import json

import pytest

from opentelemetry_collector_contrib_spark.operators.elasticsearch import (
    elasticsearch_node_stats,
)

BODY = {
    "indices": {
        "query_cache": {"memory_size_in_bytes": 20, "hit_count": 30},
        "get": {"exists_total": 14, "missing_total": 16},
        "store": {"size_in_bytes": 1000,
                  "total_data_set_size_in_bytes": 1100},
    },
    "fs": {"total": {"available_in_bytes": 36},
           "io_stats": {"total": {"read_kilobytes": 39,
                                  "write_kilobytes": 40}}},
    "process": {"cpu": {"percent": 50, "total_in_millis": -1}},
    "jvm": {"mem": {"heap_used_percent": 75}},
    "os": {"cpu": {"load_average": {"5m": 2.5}}},
    "discovery": {
        "cluster_state_queue": {"committed": 77, "pending": 999},
        "cluster_state_update": {
            "unchanged": {"count": 82, "commit_time_millis": 12345},
            "success": {"count": 85, "commit_time_millis": 89},
        },
    },
    "thread_pool": {"search": {"threads": 10, "active": 3, "queue": 2,
                               "completed": 500, "rejected": 1}},
    "breakers": {"fielddata": {"estimated_size_in_bytes": 103,
                               "limit_size_in_bytes": 104,
                               "tripped": 105}},
    "ingest": {"pipelines": {"p1": {"count": 96, "failed": 97,
                                    "current": 98}}},
}


@pytest.fixture(scope="module")
def spark():
    from opentelemetry_collector_contrib_spark.session import get_spark

    return get_spark()


def test_es_node_stats(spark):
    df = spark.createDataFrame([(1, json.dumps(BODY))], ["id", "body"])
    rows = elasticsearch_node_stats(df).collect()
    by = {(r.es_metric, r.es_attr, r.es_name): (r.es_value, r.es_value_d)
          for r in rows}
    # the read_kilobytes tag feeds disk.io.read (model quirk)
    assert by[("elasticsearch.node.disk.io.read", None, None)][0] == 39
    # -1 sentinel: cpu.time skipped, cpu.usage /100
    assert not any(r.es_metric == "elasticsearch.process.cpu.time"
                   for r in rows)
    assert by[("elasticsearch.process.cpu.usage", None, None)][1] == 0.5
    assert by[("jvm.memory.heap.utilization", None, None)][1] == 0.75
    # state_queue "pending" re-reads Committed (reference behaviour)
    assert by[("elasticsearch.cluster.state_queue", "pending",
               None)][0] == 77
    # idle threads = threads - active; unchanged state skips commit row
    assert by[("elasticsearch.node.thread_pool.threads", "idle",
               "search")][0] == 7
    assert ("elasticsearch.cluster.state_update.time", "commit",
            "unchanged") not in by
    assert by[("elasticsearch.cluster.state_update.time", "commit",
               "success")][0] == 89
    # absent scalar fields read as Go zero values
    assert by[("elasticsearch.node.open_files", None, None)][0] == 0
    # 7.17 default: both version-gated metrics emit
    assert by[("elasticsearch.node.shards.data_set.size", None,
               None)][0] == 1100


def test_es_version_gates_and_io_pointer(spark):
    body = dict(BODY)
    body = {k: v for k, v in body.items() if k != "fs"}
    df = spark.createDataFrame([(1, json.dumps(body))], ["id", "body"])
    rows = elasticsearch_node_stats(df, es_version="7.9").collect()
    metrics = {r.es_metric for r in rows}
    assert "elasticsearch.node.disk.io.read" not in metrics
    assert "elasticsearch.node.shards.data_set.size" not in metrics
    assert "elasticsearch.indexing_pressure.memory.limit" not in metrics


def test_es_cluster_health(spark):
    from opentelemetry_collector_contrib_spark.operators.elasticsearch \
        import elasticsearch_cluster_health

    health = json.dumps({"status": "yellow", "active_shards": 5,
                         "number_of_nodes": 3})
    bad = json.dumps({"status": "purple", "number_of_nodes": 3})
    stats = json.dumps({"indices": {"fielddata": {"evictions": 7}},
                        "nodes": {"jvm": {"mem":
                                          {"heap_used_in_bytes": 99}}}})
    rows = elasticsearch_cluster_health(spark.createDataFrame(
        [(1, "health", health), (2, "health", bad), (3, "stats", stats)],
        ["id", "kind", "body"],
    )).collect()
    h = {(r.es_metric, r.es_attr): r for r in rows if r.id == 1}
    # one-hot health triple
    assert h[("elasticsearch.cluster.health", "green")].es_value == 0
    assert h[("elasticsearch.cluster.health", "yellow")].es_value == 1
    assert h[("elasticsearch.cluster.shards", "active")].es_value == 5
    # unknown status: dead-letter row, no health rows
    badh = [r for r in rows
            if r.id == 2 and r.es_metric == "elasticsearch.cluster.health"]
    assert len(badh) == 1 and badh[0].es_ok is False
    st = {(r.es_metric, r.es_attr): r for r in rows if r.id == 3}
    assert st[("jvm.memory.heap.used", None)].es_value == 99
    assert st[("elasticsearch.cluster.indices.cache.evictions",
               "fielddata")].es_value == 7

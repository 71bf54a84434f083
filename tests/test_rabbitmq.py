"""rabbitmq receiver semantics (receiver/rabbitmqreceiver/scraper.go)."""
from __future__ import annotations

import json

import pytest

from opentelemetry_collector_contrib_spark.operators.receivers import (
    rabbitmq_api,
)


@pytest.fixture(scope="module")
def spark():
    from opentelemetry_collector_contrib_spark.session import get_spark

    return get_spark()


def test_rabbitmq_queue_and_node(spark):
    qbody = json.dumps({
        "name": "q1", "node": "rabbit@n1", "vhost": "/", "consumers": 5,
        "messages_unacknowledged": 2, "messages_ready": 7,
        "message_stats": {"deliver": 100, "publish": 200.7,
                          "ack": "nope", "other": 3},
    })
    nbody = json.dumps({
        "name": "rabbit@n1", "disk_free": 1000, "mem_alarm": True,
        "fd_used_details.rate": 2.5,
        "mem_used_details": {"rate": 9.9},  # nested: Go never reads it
        "io_read_avg_time": 1.25,
    })
    df = spark.createDataFrame(
        [(1, "queue", qbody), (2, "node", nbody), (3, "queue", "junk")],
        ["id", "kind", "body"],
    )
    out = rabbitmq_api(df, enable_node_metrics=True).collect()
    q = {(r.rq_metric, r.rq_state): r for r in out if r.id == 1}
    assert q[("rabbitmq.consumer.count", None)].rq_value == 5
    assert q[("rabbitmq.message.current", "ready")].rq_value == 7
    assert q[("rabbitmq.message.delivered", None)].rq_value == 100
    # float64 -> int64 double cast truncates (convertValToInt64)
    assert q[("rabbitmq.message.published", None)].rq_value == 200
    # non-number stat skipped; absent stat skipped
    assert ("rabbitmq.message.acknowledged", None) not in q
    assert ("rabbitmq.message.dropped", None) not in q
    n = {r.rq_metric: r for r in out if r.id == 2}
    # all 74 node metrics emit; absent fields are Go zero values
    assert len(n) == 74
    assert n["rabbitmq.node.disk_free"].rq_value == 1000
    assert n["rabbitmq.node.mem_alarm"].rq_value == 1
    assert n["rabbitmq.node.fd_used"].rq_value == 0
    # the dotted json tag is literal: flat key parses...
    assert n["rabbitmq.node.fd_used_details.rate"].rq_value_d == 2.5
    # ...the real API's nested object never populates the field
    assert n["rabbitmq.node.mem_used_details.rate"].rq_value_d == 0.0
    dead = [r for r in out if r.id == 3]
    assert len(dead) == 1 and dead[0].rq_ok is False

"""kafkametrics receiver semantics (receiver/kafkametricsreceiver)."""
from __future__ import annotations

from opentelemetry_collector_contrib_spark.operators.kafkametrics import (
    kafka_metrics,
)


def _frames(spark, offsets_rows):
    parts = spark.createDataFrame(
        [("c", 1, "t0", 0, 100, 0, 3, 2),
         ("c", 1, "t0", 1, None, 0, 3, 2),
         ("c", 1, "_internal", 0, 7, 0, 3, 2)],
        "cluster string, ts long, topic string, partition int, "
        "current_offset long, oldest_offset long, replicas int, "
        "in_sync int")
    cfg = spark.createDataFrame(
        [("c", 1, "t0", 3, "2", "7500", "junk")],
        "cluster string, ts long, topic string, "
        "replication_factor int, min_insync_replicas string, "
        "retention_ms string, retention_bytes string")
    brokers = spark.createDataFrame(
        [("c", 1, "0", "24"), ("c", 1, "1", "oops"), ("c", 1, "2", None)],
        "cluster string, ts long, broker_id string, "
        "log_retention_hours string")
    members = spark.createDataFrame(
        [("c", 1, "g0", 4), ("c", 1, "skipme", 9)],
        "cluster string, ts long, group string, members int")
    offs = spark.createDataFrame(
        offsets_rows,
        "cluster string, ts long, group string, topic string, "
        "partition int, consumer_offset long")
    return kafka_metrics(parts, cfg, brokers, members, offs,
                         group_match="^g.*")


def test_kafka_lag_sentinels_and_filters(spark):
    out = _frames(spark, [
        ("c", 1, "g0", "t0", 0, 90),       # lag 10
        ("c", 1, "g0", "t0", 1, 95),       # dropped: cur unknown
        ("c", 1, "g1", "t0", 0, -1),       # not consumed -> gone
        ("c", 1, "skipme", "t0", 0, 5),    # group filter
    ]).collect()
    by = {}
    for r in out:
        by.setdefault(r.km_metric, []).append(r)
    # internal topic filtered from partition rows and counts
    assert all(r.km_topic != "_internal"
               for r in by["kafka.topic.partitions"])
    assert [r.km_value for r in by["kafka.topic.partitions"]] == [2]
    # null current_offset partition has no offset row
    assert len(by["kafka.partition.current_offset"]) == 1
    # g1's topic had only -1 offsets -> no offset/lag family at all
    lags = {(r.km_group, r.km_partition): r.km_value
            for r in by["kafka.consumer_group.lag"]}
    assert lags == {("g0", 0): 10}
    assert ("kafka.consumer_group.offset_sum" in by
            and by["kafka.consumer_group.offset_sum"][0].km_value == 90)
    # members row only for regex-matched group
    assert [(r.km_group, r.km_value)
            for r in by["kafka.consumer_group.members"]] == [("g0", 4)]
    # retention: 7500ms -> 7s; junk bytes dropped; broker 'oops' -> 0
    vals = {(r.km_metric, r.km_broker): r.km_value for r in out}
    assert vals[("kafka.topic.log_retention_period", None)] == 7
    assert "kafka.topic.log_retention_size" not in by
    assert vals[("kafka.broker.log_retention_period", "0")] == 86400
    assert vals[("kafka.broker.log_retention_period", "1")] == 0
    assert by["kafka.brokers"][0].km_value == 3


def test_kafka_lag_minus_one_for_unset_offset(spark):
    out = _frames(spark, [
        ("c", 1, "g0", "t0", 0, -1),
        ("c", 1, "g0", "t0", 0, 60),
    ]).collect()
    lags = sorted(r.km_value for r in out
                  if r.km_metric == "kafka.consumer_group.lag")
    assert lags == [-1, 40]
    sums = {r.km_metric: r.km_value for r in out if "sum" in r.km_metric}
    # offset_sum includes the -1; lag_sum only the measured lag
    assert sums["kafka.consumer_group.offset_sum"] == 59
    assert sums["kafka.consumer_group.lag_sum"] == 40

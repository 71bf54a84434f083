"""flinkmetrics receiver semantics (receiver/flinkmetricsreceiver)."""
from __future__ import annotations

import json

import pytest

from opentelemetry_collector_contrib_spark.operators.receivers import (
    flink_metrics,
)


@pytest.fixture(scope="module")
def spark():
    from opentelemetry_collector_contrib_spark.session import get_spark

    return get_spark()


def test_flink_scope_tables(spark):
    rows = [
        ("jobmanager", "h1", None, None, None, None, json.dumps([
            {"id": "Status.JVM.CPU.Load", "value": "0.25"},
            {"id": "Status.JVM.GarbageCollector.PS_MarkSweep.Time",
             "value": "10"},
            # G1 collectors belong to the taskmanager switch only
            {"id": "Status.JVM.GarbageCollector.G1_Old_Generation.Time",
             "value": "99"},
            {"id": "Status.JVM.Memory.Heap.Used", "value": "bad"},
            {"id": "unknownMetric", "value": "5"}])),
        ("subtask", "h2", "tm1", "jobA", "taskX", "0", json.dumps([
            {"id": "numRecordsIn", "value": "100"},
            {"id": "MyOp.numRecordsOut", "value": "50"},
            {"id": "MyOp2.currentOutputWatermark", "value": "12345"},
            {"id": "Other.numLateRecordsDropped", "value": "4"}])),
    ]
    df = spark.createDataFrame(
        rows, ["scope", "host", "taskmanager_id", "job_name",
               "task_name", "subtask_index", "metrics"],
    )
    out = flink_metrics(df).collect()
    jm = {r.fl_metric: r for r in out if r.scope == "jobmanager"}
    assert jm["flink.jvm.cpu.load"].fl_value_d == 0.25
    assert jm["flink.jvm.gc.collections.time"].fl_gc_name == \
        "PS_MarkSweep"
    # G1 id not in the jobmanager switch, unknown id skipped
    assert len(jm) == 3
    # generated-parse failure records the zero value with a false ok
    heap = jm["flink.jvm.memory.heap.used"]
    assert heap.fl_value == 0 and heap.fl_ok is False
    sub = {(r.fl_metric, r.fl_record, r.fl_operator): r
           for r in out if r.scope == "subtask"}
    assert sub[("flink.task.record.count", "in", None)].fl_value == 100
    assert sub[("flink.operator.record.count", "out",
                "MyOp")].fl_value == 50
    assert sub[("flink.operator.watermark.output", None,
                "MyOp2")].fl_value == 12345
    assert sub[("flink.operator.record.count", "dropped",
                "Other")].fl_value == 4

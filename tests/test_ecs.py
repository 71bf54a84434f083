"""awsecscontainermetrics receiver semantics."""
from __future__ import annotations

import json

import pytest

from opentelemetry_collector_contrib_spark.operators.ecs import (
    ecs_task_metrics,
)

META = {
    "Cluster": "arn:aws:ecs:us-west-2:123:cluster/my-cluster",
    "TaskARN": "arn:aws:ecs:us-west-2:123:task/my-cluster/abc123",
    "Family": "fam", "Limits": {"CPU": 0.5},
    "Containers": [
        {"DockerId": "d1", "Name": "app",
         "Limits": {"CPU": 256, "Memory": 512}},
        {"DockerId": "d2", "Name": "done",
         "StartedAt": "2024-01-01T00:00:00Z",
         "FinishedAt": "2024-01-01T00:02:30Z"},
        {"DockerId": "d3", "Name": "nostats"},
    ],
}
STATS = {
    "d1": {
        "id": "d1", "read": "2024-01-01T10:00:10.000000Z",
        "preread": "2024-01-01T10:00:00.000000Z",
        "memory_stats": {"usage": 104857600, "max_usage": 209715200,
                         "limit": 536870912,
                         "stats": {"cache": 4194304}},
        "cpu_stats": {"cpu_usage": {"total_usage": 5000000000,
                                    "usage_in_kernelmode": 1,
                                    "usage_in_usermode": 2,
                                    "percpu_usage": [1, 2]},
                      "online_cpus": 2, "system_cpu_usage": 99},
        "precpu_stats": {"cpu_usage": {"total_usage": 2500000000}},
        "networks": {"eth0": {"rx_bytes": 10, "tx_bytes": 20,
                              "rx_packets": 1, "tx_packets": 2},
                     "eth1": {"rx_bytes": 5, "tx_bytes": 5}},
        "network_rate_stats": {"rx_bytes_per_sec": 12.5,
                               "tx_bytes_per_sec": 25.0},
        "blkio_stats": {"io_service_bytes_recursive": [
            {"op": "Read", "value": 100}, {"op": "Write", "value": 200},
            {"op": "Total", "value": 300}, {"op": "Read", "value": 50}]},
    },
    "d3": {"id": ""},  # isEmptyStats
}


@pytest.fixture(scope="module")
def spark():
    from opentelemetry_collector_contrib_spark.session import get_spark

    return get_spark()


def test_ecs_task_metrics(spark):
    df = spark.createDataFrame(
        [(1, json.dumps(META), json.dumps(STATS))],
        ["id", "metadata", "stats"],
    )
    rows = ecs_task_metrics(df).collect()
    cont = {r.ec_metric: r for r in rows
            if r.ec_scope == "container" and r.ec_container == "app"}
    task = {r.ec_metric: r for r in rows if r.ec_scope == "task"}
    assert rows[0].ec_cluster == "my-cluster"
    assert rows[0].ec_task_id == "abc123"
    # (usage - cache)/MiB = (100MiB - 4MiB)/MiB
    assert cont["container.memory.utilized"].ec_value == 96
    # vcpu = 2.5e9 / 10s(ns); utilized = vcpu*100 / cpu limit
    assert cont["container.cpu.usage.vcpu"].ec_value_d == 0.25
    assert cont["container.cpu.utilized"].ec_value_d == 25.0 / 256
    # interface sums; storage only Read/Write ops
    assert cont["container.network.io.usage.rx_bytes"].ec_value == 15
    assert cont["container.storage.read_bytes"].ec_value == 150
    assert cont["container.storage.write_bytes"].ec_value == 200
    # stopped container -> duration only; empty-id stats -> nothing
    dur = [r for r in rows if r.ec_metric == "container.duration"]
    assert len(dur) == 1 and dur[0].ec_value_d == 150.0
    assert not any(r.ec_container == "nostats" for r in rows)
    # task: limit overrides (0.5 vCPU * 1024) and vcpu*1024 utilized
    assert task["ecs.task.cpu.reserved"].ec_value_d == 512.0
    assert task["ecs.task.cpu.utilized"].ec_value_d == 256.0
    assert task["ecs.task.memory.usage"].ec_value == 104857600

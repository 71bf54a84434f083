"""dockerstats receiver semantics (receiver/dockerstatsreceiver)."""
from __future__ import annotations

import json

import pytest

from opentelemetry_collector_contrib_spark.operators.dockerstats import (
    docker_container_stats,
)

STATS = {
    "cpu_stats": {
        "cpu_usage": {"total_usage": 2000, "usage_in_kernelmode": 500,
                      "usage_in_usermode": 1200,
                      "percpu_usage": [800, 1200]},
        "system_cpu_usage": 10000, "online_cpus": 0,
        "throttling_data": {"periods": 5, "throttled_periods": 2,
                            "throttled_time": 100},
    },
    "precpu_stats": {"cpu_usage": {"total_usage": 1000},
                     "system_cpu_usage": 8000},
    "memory_stats": {"usage": 1000, "max_usage": 1500, "limit": 4000,
                     "failcnt": 1,
                     "stats": {"cache": 50, "total_inactive_file": 200,
                               "rss": 700, "bogus": 9}},
    "blkio_stats": {"io_service_bytes_recursive": [
        {"major": 8, "minor": 0, "op": "Read", "value": 1111},
        {"major": 8, "minor": 0, "op": "Write", "value": 2222}]},
    "networks": {"eth0": {"rx_bytes": 10, "tx_bytes": 20,
                          "rx_dropped": 0, "tx_dropped": 1,
                          "rx_packets": 2, "tx_packets": 3,
                          "rx_errors": 4, "tx_errors": 5}},
    "pids_stats": {"current": 7},
}
CONTAINER = {
    "Id": "abc123", "Name": "/mycontainer", "Image": "sha256:deadbeef",
    "RestartCount": 3,
    "Config": {"Hostname": "h1", "Image": "nginx:latest",
               "Cmd": ["nginx", "-g", "daemon off;"]},
    "State": {"StartedAt": "2024-01-01T00:00:00Z"},
    "HostConfig": {"CpuShares": 512, "NanoCpus": 0,
                   "CpusetCpus": "0,2-4", "CpuQuota": 0, "CpuPeriod": 0},
}
NOW = 1704067300 * 10**9  # 100 s after StartedAt


@pytest.fixture(scope="module")
def spark():
    from opentelemetry_collector_contrib_spark.session import get_spark

    return get_spark()


@pytest.fixture(scope="module")
def rows(spark):
    df = spark.createDataFrame(
        [(1, json.dumps(STATS), json.dumps(CONTAINER))],
        ["id", "stats", "container"],
    )
    return docker_container_stats(df, now_ns=NOW).collect()


def test_docker_derived_metrics(rows):
    by = {(r.dk_metric, r.dk_operation, r.dk_core): r for r in rows}
    # calculateCPUPercent: (1000/2000) * 2 cores (percpu fallback) * 100
    assert by[("container.cpu.utilization", None, None)].dk_value_d == \
        100.0
    # calculateMemUsageNoCache cgroup v1: 1000 - 200
    assert by[("container.memory.usage.total", None,
               None)].dk_value == 800
    assert by[("container.memory.percent", None, None)].dk_value_d == \
        20.0
    # cpuset "0,2-4" -> 4 cpus
    assert by[("container.cpu.limit", None, None)].dk_value_d == 4.0
    assert by[("container.uptime", None, None)].dk_value_d == 100.0
    # blkio op lowercased, per-core fan, unknown mem stat skipped
    assert by[("container.blockio.io_service_bytes_recursive", "read",
               None)].dk_value == 1111
    assert by[("container.cpu.usage.percpu", None, "cpu1")].dk_value == \
        1200
    assert ("container.memory.bogus", None, None) not in by
    # pids.limit absent (Limit == 0); count present (Current != 0)
    assert by[("container.pids.count", None, None)].dk_value == 7
    assert ("container.pids.limit", None, None) not in by


def test_docker_resource_attrs(rows):
    r = rows[0]
    assert r.dk_container_name == "mycontainer"  # leading "/" trimmed
    assert r.dk_command_line == "nginx -g daemon off;"
    assert r.dk_image_name == "nginx:latest"
    assert r.dk_image_id == "sha256:deadbeef"


def test_docker_uptime_parse_error(spark):
    c = dict(CONTAINER, State={"StartedAt": "invalid"})
    df = spark.createDataFrame(
        [(1, json.dumps(STATS), json.dumps(c))],
        ["id", "stats", "container"],
    )
    rows = docker_container_stats(df, now_ns=NOW).collect()
    up = [r for r in rows if r.dk_metric == "container.uptime"]
    assert len(up) == 1 and up[0].dk_ok is False

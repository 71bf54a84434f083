"""podman receiver semantics (receiver/podmanreceiver/receiver.go)."""
from __future__ import annotations

import json

import pytest

from opentelemetry_collector_contrib_spark.operators.receivers import (
    podman_stats,
)


@pytest.fixture(scope="module")
def spark():
    from opentelemetry_collector_contrib_spark.session import get_spark

    return get_spark()


def test_podman_stats(spark):
    body = json.dumps({
        "ContainerID": "abc", "Name": "web", "CPU": 12.5,
        "CPUNano": 2500000000, "CPUSystemNano": 1999999999,
        "MemUsage": 100, "MemLimit": 400, "MemPerc": 25.0,
        "NetInput": 11, "NetOutput": 22,
        "BlockInput": 33, "BlockOutput": 44,
        "PerCPU": [1500000000, 500000000],
    })
    rows = podman_stats(spark.createDataFrame(
        [(1, body, "img")], ["id", "body", "image"],
    )).collect()
    by = {(r.pm_metric, r.pm_core): r for r in rows}
    # ns -> s truncates (1999999999 -> 1)
    assert by[("container.cpu.usage.system", None)].pm_value == 1
    assert by[("container.cpu.usage.total", None)].pm_value == 2
    assert by[("container.cpu.usage.percpu", "cpu0")].pm_value == 1
    assert by[("container.cpu.usage.percpu", "cpu1")].pm_value == 0
    # the reference's swapped network mapping
    assert by[("container.network.io.usage.rx_bytes", None)].pm_value \
        == 22
    assert by[("container.network.io.usage.tx_bytes", None)].pm_value \
        == 11
    assert by[("container.memory.percent", None)].pm_value_d == 25.0
    assert rows[0].pm_runtime == "podman" and rows[0].pm_name == "web"

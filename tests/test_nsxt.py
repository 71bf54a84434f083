"""nsxt receiver semantics (receiver/nsxtreceiver/scraper.go)."""
from __future__ import annotations

import json

import pytest

from opentelemetry_collector_contrib_spark.operators.receivers import (
    nsxt_stats,
)


@pytest.fixture(scope="module")
def spark():
    from opentelemetry_collector_contrib_spark.session import get_spark

    return get_spark()


def test_nsxt_stats(spark):
    iface = json.dumps({
        "interface_id": "eth0", "node_name": "n1",
        "node_type": "TransportNode", "node_id": "id1",
        "rx_bytes": 100, "rx_packets": 50, "rx_dropped": 3,
        "rx_errors": 2, "tx_bytes": 200, "tx_packets": 40,
        "tx_dropped": 1, "tx_errors": 4})
    node = json.dumps({
        "node_name": "n1", "node_type": "manager", "node_id": "id1",
        "system_status": {
            "cpu_usage": {"avg_cpu_core_usage_dpdk": 12.5,
                          "avg_cpu_core_usage_non_dpdk": 25.0},
            "mem_used": 7, "mem_cache": 8,
            "disk_space_used": 30, "disk_space_total": 0}})
    rows = nsxt_stats(spark.createDataFrame(
        [(1, "interface", iface), (2, "node", node)],
        ["id", "kind", "body"],
    )).collect()
    i = {(r.nx_metric, r.nx_direction, r.nx_packet_type): r
         for r in rows if r.id == 1}
    # derived success = packets - dropped - errors
    assert i[("nsxt.node.network.packet.count", "received",
              "success")].nx_value == 45
    assert i[("nsxt.node.network.packet.count", "transmitted",
              "success")].nx_value == 35
    assert i[("nsxt.node.network.io", "received", None)].nx_value == 100
    n = {(r.nx_metric, r.nx_disk_state, r.nx_class): r
         for r in rows if r.id == 2}
    assert n[("nsxt.node.cpu.utilization", None,
              "datapath")].nx_value_d == 12.5
    # available = total - used (negative when total is 0)
    assert n[("nsxt.node.filesystem.usage", "available",
              None)].nx_value == -30
    # utilization division-by-zero guard: used / max(total, 1)
    assert n[("nsxt.node.filesystem.utilization", None,
              None)].nx_value_d == 30.0

"""vcenter receiver semantics (receiver/vcenterreceiver/metrics.go)."""
from __future__ import annotations

import json

import pytest

from opentelemetry_collector_contrib_spark.operators.vcenter import (
    vcenter_stats,
)


@pytest.fixture(scope="module")
def spark():
    from opentelemetry_collector_contrib_spark.session import get_spark

    return get_spark()


def test_vcenter_stats(spark):
    rows_in = [
        (1, "datastore", json.dumps({"capacity": 1000,
                                     "free_space": 250})),
        (2, "host", json.dumps({
            "quick_stats": {"overall_memory_usage": 512,
                            "overall_cpu_usage": 1000},
            "memory_size": 2048 * 1048576, "num_cpu_cores": 4,
            "cpu_mhz": 2500})),
        (3, "vm", json.dumps({  # template: only the 2 disk rows
            "quick_stats": {"guest_memory_usage": 100},
            "committed": 10, "uncommitted": 30, "template": True})),
        (4, "vm", json.dumps({  # zero cpu usage: stops before cpu rows
            "quick_stats": {"guest_memory_usage": 100,
                            "overall_cpu_usage": 0},
            "committed": 10, "uncommitted": 30, "template": False,
            "memory_size_mb": 400})),
        (5, "vm", json.dumps({  # MaxCpuUsage=0 -> NumCPU*host MHz
            "quick_stats": {"guest_memory_usage": 100,
                            "overall_cpu_usage": 500,
                            "overall_cpu_readiness": 7},
            "committed": 10, "uncommitted": 30, "template": False,
            "memory_size_mb": 400, "num_cpu": 2, "max_cpu_usage": 0,
            "host_cpu_mhz": 1000})),
        (6, "resource_pool", json.dumps({  # no QuickStats: shares only
            "cpu_shares": 4000, "memory_shares": 9000})),
    ]
    out = vcenter_stats(spark.createDataFrame(
        rows_in, ["id", "kind", "body"],
    )).collect()
    by = {(r.id, r.vc_metric, r.vc_attr): r for r in out}
    # datastore: used = capacity - free; utilization = used/capacity
    assert by[(1, "vcenter.datastore.disk.usage", "used")].vc_value == \
        750
    assert by[(1, "vcenter.datastore.disk.utilization",
               None)].vc_value_d == 75.0
    # host: utilization over MemorySize>>20 / cores*MHz
    assert by[(2, "vcenter.host.memory.utilization",
               None)].vc_value_d == 25.0
    assert by[(2, "vcenter.host.cpu.capacity", None)].vc_value == 10000
    assert by[(2, "vcenter.host.cpu.utilization",
               None)].vc_value_d == 10.0
    # template VM: disk rows only
    vm3 = [r for r in out if r.id == 3]
    assert {r.vc_metric for r in vm3} == {"vcenter.vm.disk.usage"}
    # zero cpu: memory rows emitted, no cpu rows
    vm4 = {r.vc_metric for r in out if r.id == 4}
    assert "vcenter.vm.memory.usage" in vm4
    assert "vcenter.vm.cpu.usage" not in vm4
    # disk utilization = 10/(30+10)*100
    assert by[(4, "vcenter.vm.disk.utilization",
               None)].vc_value_d == 25.0
    # limit fallback: 2 * 1000 MHz -> 500/2000*100
    assert by[(5, "vcenter.vm.cpu.utilization", None)].vc_value_d == \
        25.0
    assert by[(5, "vcenter.vm.cpu.readiness", None)].vc_value == 7
    # resource pool without QuickStats: only the two share rows
    rp = {r.vc_metric for r in out if r.id == 6}
    assert rp == {"vcenter.resource_pool.cpu.shares",
                  "vcenter.resource_pool.memory.shares"}

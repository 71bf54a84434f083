"""kubeletstats receiver semantics (internal/kubelet)."""
from __future__ import annotations

import json

import pytest

from opentelemetry_collector_contrib_spark.operators.kubeletstats import (
    kubelet_stats_summary,
)

BODY = {
    "node": {
        "nodeName": "n1",
        "cpu": {"usageNanoCores": 1500000000,
                "usageCoreNanoSeconds": 2000000000},
        "memory": {"availableBytes": 100, "usageBytes": 200,
                   "workingSetBytes": 300, "pageFaults": 4},
        "fs": {"availableBytes": 1000, "capacityBytes": 2000,
               "usedBytes": 500},
        "network": {"name": "eth0", "rxBytes": 10, "txBytes": 20,
                    "rxErrors": 1,
                    "interfaces": [
                        {"name": "eth0", "rxBytes": 10, "txBytes": 20,
                         "rxErrors": 1, "txErrors": 2},
                        {"name": "lo", "rxBytes": 5, "txBytes": 5}]},
    },
    "pods": [{
        "podRef": {"name": "pod1", "namespace": "default", "uid": "u1"},
        "cpu": {"usageNanoCores": 250000000},
        "memory": {"usageBytes": 50},
        "ephemeral-storage": {"usedBytes": 3},
        "network": {"name": "eth0", "rxBytes": 7},
        "containers": [{"name": "app",
                        "cpu": {"usageCoreNanoSeconds": 500000000},
                        "memory": {"workingSetBytes": 77},
                        "rootfs": {"usedBytes": 9}}],
        "volume": [{"name": "cfg", "availableBytes": 1, "inodes": 3}],
    }],
}


@pytest.fixture(scope="module")
def spark():
    from opentelemetry_collector_contrib_spark.session import get_spark

    return get_spark()


def test_kubelet_summary_defaults(spark):
    df = spark.createDataFrame([(1, json.dumps(BODY))], ["id", "body"])
    rows = kubelet_stats_summary(df).collect()
    by = {(r.ks_scope, r.ks_metric, r.ks_direction): r for r in rows}
    # nanocores/1e9 -> cores
    assert by[("node", "k8s.node.cpu.usage", None)].ks_value_d == 1.5
    assert by[("pod", "k8s.pod.cpu.usage", None)].ks_value_d == 0.25
    assert by[("container", "container.cpu.time", None)].ks_value_d == \
        0.5
    # pointer-nil skips: node rss, pod cpu.time, tx error side
    assert ("node", "k8s.node.memory.rss", None) not in by
    assert ("pod", "k8s.pod.cpu.time", None) not in by
    assert ("node", "k8s.node.network.errors", "transmit") not in by
    assert by[("node", "k8s.node.network.io", "transmit")].ks_value == 20
    # scope-specific filesystem sources
    assert by[("pod", "k8s.pod.filesystem.usage", None)].ks_value == 3
    assert by[("container", "container.filesystem.usage",
               None)].ks_value == 9
    # volume group off by default
    assert not any(r.ks_scope == "volume" for r in rows)
    pod = by[("pod", "k8s.pod.memory.usage", None)]
    assert (pod.ks_pod, pod.ks_namespace, pod.ks_pod_uid) == \
        ("pod1", "default", "u1")


def test_kubelet_all_interfaces_and_volumes(spark):
    df = spark.createDataFrame([(1, json.dumps(BODY))], ["id", "body"])
    rows = kubelet_stats_summary(
        df, all_interfaces=True, include_volumes=True,
    ).collect()
    node_io = [(r.ks_interface, r.ks_direction, r.ks_value)
               for r in rows
               if r.ks_metric == "k8s.node.network.io"]
    # per-interface fan replaces the default-interface rows
    assert ("lo", "receive", 5) in node_io
    assert len([x for x in node_io if x[0] == "eth0"]) == 2
    vols = {r.ks_metric: r for r in rows if r.ks_scope == "volume"}
    assert vols["k8s.volume.available"].ks_value == 1
    assert vols["k8s.volume.inodes"].ks_value == 3
    assert "k8s.volume.capacity" not in vols  # nil pointer skip
    assert vols["k8s.volume.available"].ks_volume == "cfg"

"""k8scluster receiver semantics (internal/pod,container,deployment)."""
from __future__ import annotations

import json

import pytest

from opentelemetry_collector_contrib_spark.operators.k8scluster import (
    k8s_cluster_metrics,
)

POD = {
    "metadata": {"name": "p1", "namespace": "default", "uid": "u1"},
    "spec": {"nodeName": "n1", "containers": [
        {"name": "app", "resources": {
            "requests": {"cpu": "250m", "memory": "128Mi"},
            "limits": {"cpu": "1.5", "memory": "1Gi",
                       "ephemeral-storage": "2G"}}},
        {"name": "nostatus", "resources": {"requests": {},
                                           "limits": {}}}]},
    "status": {"phase": "Running", "reason": "Evicted",
               "containerStatuses": [{
                   "name": "app", "image": "nginx:1.25",
                   "containerID": "containerd://abcd", "restartCount": 3,
                   "ready": True,
                   "state": {"running": {"startedAt": "x"}}}]},
}
DEP = {"metadata": {"name": "d1", "namespace": "ns2", "uid": "du1"},
       "spec": {"replicas": 5}, "status": {"availableReplicas": 4}}


@pytest.fixture(scope="module")
def spark():
    from opentelemetry_collector_contrib_spark.session import get_spark

    return get_spark()


def test_k8s_cluster_metrics(spark):
    df = spark.createDataFrame(
        [(1, "pod", json.dumps(POD)), (2, "deployment", json.dumps(DEP))],
        ["id", "kind", "body"],
    )
    rows = k8s_cluster_metrics(df).collect()
    by = {(r.kc_metric, r.kc_state, r.kc_container): r for r in rows}
    # phase/reason int ladders
    assert by[("k8s.pod.phase", None, None)].kc_value == 2
    assert by[("k8s.pod.status_reason", None, None)].kc_value == 1
    # quantity parsing: 250m cores, Mi/Gi/G suffixes
    assert by[("k8s.container.cpu_request", None,
               "app")].kc_value_d == 0.25
    assert by[("k8s.container.cpu_limit", None, "app")].kc_value_d == 1.5
    assert by[("k8s.container.memory_request", None,
               "app")].kc_value == 134217728
    assert by[("k8s.container.ephemeralstorage_limit", None,
               "app")].kc_value == 2_000_000_000
    # status join: one-hot state, stripped id, split image
    st = by[("k8s.container.status.state", "running", "app")]
    assert st.kc_value == 1 and st.kc_container_id == "abcd"
    assert (st.kc_image, st.kc_image_tag) == ("nginx", "1.25")
    assert by[("k8s.container.status.state", "waiting",
               "app")].kc_value == 0
    # container without a status: no restart/ready/state rows
    assert ("k8s.container.restarts", None, "nostatus") not in by
    # deployment rows
    assert by[("k8s.deployment.desired", None, None)].kc_value == 5
    assert by[("k8s.deployment.available", None, None)].kc_value == 4


def test_k8s_workloads(spark):
    from opentelemetry_collector_contrib_spark.operators.k8scluster \
        import k8s_cluster_workloads

    rows = [
        (1, "node", json.dumps({
            "metadata": {"name": "n1", "uid": "nu1"},
            "status": {"conditions": [
                {"type": "Ready", "status": "True"},
                {"type": "PIDPressure", "status": "Unknown"}]}})),
        (2, "replicaset", json.dumps({
            "metadata": {"name": "rs1", "uid": "r1"}, "spec": {},
            "status": {"availableReplicas": 4}})),
        (3, "job", json.dumps({
            "metadata": {"name": "j1", "uid": "j"},
            "spec": {"completions": 5},
            "status": {"active": 2, "failed": 1, "succeeded": 3}})),
        (4, "cronjob", json.dumps({
            "metadata": {"name": "cj", "uid": "c"},
            "status": {"active": [{"name": "a"}, {"name": "b"}]}})),
        (5, "namespace", json.dumps({
            "metadata": {"name": "nsx", "uid": "x"},
            "status": {"phase": ""}})),
    ]
    out = k8s_cluster_workloads(
        spark.createDataFrame(rows, ["id", "kind", "body"])
    ).collect()
    by = {(r.id, r.kc_metric, r.kc_condition): r.kc_value for r in out}
    assert by[(1, "k8s.node.condition", "Ready")] == 1
    assert by[(1, "k8s.node.condition", "PIDPressure")] == -1
    # nil Spec.Replicas -> no replicaset rows (replicasets.go:30-33)
    assert not any(r.id == 2 for r in out)
    assert by[(3, "k8s.job.desired_successful_pods", None)] == 5
    assert (3, "k8s.job.max_parallel_pods", None) not in by
    assert by[(4, "k8s.cronjob.active_jobs", None)] == 2
    assert by[(5, "k8s.namespace.phase", None)] == -1

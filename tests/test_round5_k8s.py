"""Round-5: k8sevents / k8sobjects receiver translations, pinning
k8s_event_to_logdata.go and unstructured_to_logdata.go."""
from __future__ import annotations

import json

from opentelemetry_collector_contrib_spark.operators.k8sevents import (
    k8s_events_to_logs,
)
from opentelemetry_collector_contrib_spark.operators.k8sobjects import (
    k8s_objects_to_logs,
)


def _df(spark, bodies):
    return spark.createDataFrame(
        [(i, json.dumps(b)) for i, b in enumerate(bodies)],
        "row_id int, body string",
    )


EVENT = {
    "metadata": {
        "name": "nginx.17f1a", "uid": "u-123",
        "creationTimestamp": "2025-04-01T17:59:00Z",
    },
    "involvedObject": {
        "kind": "Pod", "name": "nginx", "uid": "obj-9",
        "fieldPath": "spec.containers{nginx}", "apiVersion": "v1",
        "resourceVersion": "42", "namespace": "prod",
    },
    "source": {"host": "node-1"},
    "type": "Warning", "reason": "BackOff", "action": "Pulling",
    "message": "Back-off restarting failed container",
    "count": 3,
    "eventTime": "2025-04-01T18:00:00.123456Z",
    "lastTimestamp": "2025-04-01T18:01:00Z",
    "firstTimestamp": "2025-04-01T17:59:30Z",
}


def test_k8s_event_full(spark):
    (r,) = k8s_events_to_logs(_df(spark, [EVENT])).collect()
    # eventTime wins the priority ladder (receiver.go:148-160)
    assert r.ke_ts_ns == 1743530400123456000
    assert r.ke_body == "Back-off restarting failed container"
    assert (r.ke_sev_num, r.ke_sev_text) == (13, "Warning")
    assert r.ke_node == "node-1"
    assert r.ke_object_kind == "Pod" and r.ke_object_uid == "obj-9"
    assert r.ke_object_fieldpath == "spec.containers{nginx}"
    assert r.ke_object_resource_version == "42"
    assert r.ke_reason == "BackOff" and r.ke_action == "Pulling"
    assert r.ke_start_time == "2025-04-01 17:59:00 +0000 UTC"
    assert r.ke_name == "nginx.17f1a" and r.ke_uid == "u-123"
    assert r.ke_namespace == "prod" and r.ke_count == 3


def test_k8s_event_fallbacks(spark):
    ev = {
        "involvedObject": {"kind": "Node"},
        "type": "Normal", "message": "ok",
        "lastTimestamp": "2025-04-01T18:01:00Z",
    }
    unknown = {"type": "Error", "message": "?",
               "firstTimestamp": "2025-04-01T18:02:00Z"}
    zero = {"message": "no time", "count": 0}
    rows = {r.row_id: r for r in k8s_events_to_logs(
        _df(spark, [ev, unknown, zero])).collect()}
    r = rows[0]
    assert r.ke_ts_ns == 1743530460 * 10**9
    assert (r.ke_sev_num, r.ke_sev_text) == (9, "Normal")
    assert r.ke_node == "" and r.ke_namespace == ""  # Go zero strings
    assert r.ke_start_time == "0001-01-01 00:00:00 +0000 UTC"
    assert r.ke_count is None  # count==0 omitted (:78-81)
    # unknown type leaves severity unset (:58-64)
    assert (rows[1].ke_sev_num, rows[1].ke_sev_text) == (0, None)
    assert rows[2].ke_ts_ns is None


def test_k8s_event_allow_filter(spark):
    old = dict(EVENT, eventTime="2025-04-01T17:00:00Z",
               lastTimestamp=None, firstTimestamp=None)
    rows = k8s_events_to_logs(
        _df(spark, [EVENT, old, {"message": "zero-time"}]),
        start_ts=1743530400,  # 2025-04-01T18:00:00Z
    ).collect()
    assert [r.row_id for r in rows] == [0]  # allowEvent (receiver.go:138)


POD = {
    "apiVersion": "v1",
    "kind": "Pod",
    "metadata": {"name": "web-0", "namespace": "apps"},
    "spec": {"nodeName": "node-2", "priority": 10},
}


def test_k8s_objects_pull(spark):
    (r,) = k8s_objects_to_logs(
        _df(spark, [POD]), mode="pull", resource="pods",
        observed_ts=1743530400,
    ).collect()
    assert r.ko_namespace == "apps"
    assert r.ko_observed_ns == 1743530400 * 10**9
    assert r.ko_resource == "pods"
    assert r.ko_event_domain is None and r.ko_event_name is None
    # pcommon map rendering sorts keys; variant to_json matches
    assert r.ko_body == json.dumps(POD, sort_keys=True,
                                   separators=(",", ":"))


def test_k8s_objects_watch(spark):
    ev = {"type": "MODIFIED", "object": POD}
    anon = {"type": "DELETED",
            "object": {"metadata": {"name": ""}, "kind": "Pod"}}
    rows = {r.row_id: r for r in k8s_objects_to_logs(
        _df(spark, [ev, anon]), mode="watch", resource="events",
    ).collect()}
    r = rows[0]
    assert r.ko_namespace == "apps"
    assert r.ko_event_domain == "k8s" and r.ko_event_name == "web-0"
    assert r.ko_body == json.dumps(ev, sort_keys=True,
                                   separators=(",", ":"))
    # empty metadata.name -> no event attrs (:36-40)
    assert rows[1].ko_event_domain is None
    assert rows[1].ko_namespace == ""

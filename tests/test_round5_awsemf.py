"""Round-5: metrics → CloudWatch EMF events, pinning
exporter/awsemfexporter translator edge semantics.
"""
from __future__ import annotations

import json

from opentelemetry_collector_contrib_spark.operators.awsemf_export import (
    awsemf_events,
)

_SCHEMA = (
    "name string, unit string, mtype string, scope_name string, "
    "attrs map<string,string>, res_attrs map<string,string>, "
    "is_int boolean, vint bigint, vdouble double, count bigint, "
    "sum double, min double, max double"
)


def _events(spark, rows, **opts):
    full = [dict(name="m", unit="", mtype="gauge", scope_name="",
                 attrs={}, res_attrs={}, is_int=True, vint=4,
                 vdouble=None, count=None, sum=None, min=None,
                 max=None) | r for r in rows]
    df = spark.createDataFrame(full, _SCHEMA)
    opts.setdefault("timestamp_ms", 1700000000000)
    return awsemf_events(df, **opts).orderBy("namespace", "body")\
        .collect()


def test_grouping_rollup_and_v1_shape(spark):
    out = _events(spark, [
        {"name": "a", "scope_name": "lib",
         "attrs": {"d1": "x", "d2": "y"},
         "res_attrs": {"service.name": "svc",
                       "service.namespace": "ns"}},
        {"name": "b", "unit": "ms", "scope_name": "lib", "is_int": False,
         "vdouble": 2.5, "attrs": {"d1": "x", "d2": "y"},
         "res_attrs": {"service.name": "svc",
                       "service.namespace": "ns"}},
        {"name": "nan", "is_int": False, "vdouble": float("nan")},
        {"name": "ok"},
    ])
    assert len(out) == 2
    grp = json.loads(out[1]["body"])
    assert out[1]["namespace"] == "ns/svc"
    assert out[1]["log_group"] == "/metrics/ns/svc"
    assert grp["a"] == 4 and grp["b"] == 2.5
    aws = grp["_aws"]
    assert aws["Timestamp"] == 1700000000000
    m = aws["CloudWatchMetrics"][0]
    assert m["Dimensions"] == [
        ["OTelLib", "d1", "d2"], ["OTelLib"],
        ["OTelLib", "d1"], ["OTelLib", "d2"]]
    assert m["Metrics"] == [
        {"Name": "a", "Unit": "", "StorageResolution": 60},
        {"Name": "b", "Unit": "ms", "StorageResolution": 60}]
    # NaN gauge dropped; only the valid sibling remains in its group
    solo = json.loads(out[0]["body"])
    assert "nan" not in solo and solo["ok"] == 4


def test_single_label_rollup_drops_full_set(spark):
    out = _events(spark, [
        {"attrs": {"d1": "x"}, "scope_name": "lib"},
    ])
    m = json.loads(out[0]["body"])["_aws"]["CloudWatchMetrics"][0]
    # 2 labels incl OTelLib -> full set duplicated by the single
    # rollup and removed
    assert m["Dimensions"] == [["OTelLib"], ["OTelLib", "d1"]]


def test_storage_resolution_prom_and_v0(spark):
    out = _events(spark, [
        {"mtype": "histogram", "count": 3, "sum": 4.5, "min": 1.0,
         "max": 2.0,
         "attrs": {"d1": "x", "aws.emf.storage_resolution": "30"},
         "res_attrs": {"receiver": "prometheus"}},
    ], version="0")
    b = json.loads(out[0]["body"])
    assert b["Version"] == "0"
    assert b["Timestamp"] == "1700000000000"
    assert b["prom_metric_type"] == "histogram"
    assert "aws.emf.storage_resolution" not in b
    m = b["CloudWatchMetrics"][0]
    assert m["Metrics"][0]["StorageResolution"] == 30
    # zero-rollup contributes the EMPTY dimension set (no OTelLib)
    assert m["Dimensions"] == [[], ["d1"]]
    assert b["m"] == {"Max": 2, "Min": 1, "Count": 3, "Sum": 4.5}

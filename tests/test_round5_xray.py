"""Round-5: AWS X-Ray segment → OTLP span translation, pinning
receiver/awsxrayreceiver/internal/translator semantics.
"""
from __future__ import annotations

import json

from opentelemetry_collector_contrib_spark.operators.xray import (
    xray_segments_to_spans,
)

TRACE = "1-5f84c7a1-e7d1852db8c4fd35d88bf49a"
TRACE_HEX = "5f84c7a1e7d1852db8c4fd35d88bf49a"


def _parse(spark, docs, **kw):
    df = spark.createDataFrame(
        [(json.dumps(d) if not isinstance(d, str) else d,) for d in docs],
        "body string",
    )
    return sorted(
        xray_segments_to_spans(df, **kw).collect(),
        key=lambda r: (r["xr_depth"], r["xr_span_id"] or ""),
    )


def _doc(**kw):
    base = {"name": "api", "id": "5f84c7a1e7d1852d",
            "start_time": 1600000000.5, "trace_id": TRACE}
    base.update(kw)
    return base


def test_ids_times_and_kind_root(spark):
    (r,) = _parse(spark, [_doc(end_time=1600000001.75)])
    assert r["xr_trace_id"] == TRACE_HEX
    assert r["xr_span_id"] == "5f84c7a1e7d1852d"
    assert r["xr_parent_id"] is None
    assert r["xr_kind"] == "server"      # no parent → server
    assert r["xr_start_ns"] == 1600000000500000000
    assert r["xr_end_ns"] == 1600000001750000128  # float64 replay
    assert r["xr_status_code"] is None
    assert r["xr_resource_attrs"] == "cloud.provider=unknown,service.name=api"
    assert r["xr_ok"] is True


def test_subsegments_flatten_with_inherited_trace(spark):
    doc = _doc(subsegments=[
        {"name": "aws-call", "id": "aaaaaaaaaaaaaaaa",
         "start_time": 1600000000.6, "namespace": "aws",
         "subsegments": [
             {"name": "inner", "id": "bbbbbbbbbbbbbbbb",
              "start_time": 1600000000.7, "namespace": "remote",
              "trace_id": "1-00000000-000000000000000000000abc"}]},
        {"name": "local", "id": "cccccccccccccccc",
         "start_time": 1600000000.65,
         "http": {"request": {"client_ip": "9.9.9.9"}}},
    ])
    root, sub_a, sub_c, inner = _parse(spark, [doc])
    assert sub_a["xr_parent_id"] == "5f84c7a1e7d1852d"
    assert sub_a["xr_kind"] == "client"          # namespace aws
    assert sub_a["xr_attrs"] == "aws.service=aws-call"
    assert sub_a["xr_trace_id"] == TRACE_HEX     # inherited
    assert sub_c["xr_kind"] == "server"          # client_ip, local ns
    assert inner["xr_parent_id"] == "aaaaaaaaaaaaaaaa"
    assert inner["xr_trace_id"] == "0" * 29 + "abc"  # own trace id wins
    assert inner["xr_kind"] == "client"


def test_status_ladder_and_causes(spark):
    # 404 → error; 200 → unset; cause forces error when unset
    (r,) = _parse(spark, [_doc(http={"response": {"status": 404}})])
    assert r["xr_status_code"] == 2
    (r,) = _parse(spark, [_doc(http={"response": {"status": 200}})])
    assert r["xr_status_code"] is None
    (r,) = _parse(
        spark,
        [_doc(http={"response": {"status": 200}}, cause="exc0123456789abc")],
    )
    assert (r["xr_status_code"], r["xr_status_msg"]) == (2, "exc0123456789abc")
    # object cause → error, empty message, exception event with stack
    (r,) = _parse(spark, [_doc(cause={"exceptions": [
        {"id": "e1", "message": "boom", "type": "VE",
         "stack": [{"label": "fn", "path": "f.go", "line": 10},
                   {"label": "g"}]}]})])
    assert (r["xr_status_code"], r["xr_status_msg"]) == (2, "")
    assert r["xr_events"] == (
        "exception|aws.xray.exception.id=e1,exception.message=boom,"
        "exception.stacktrace=VE: boom\n\tat fn(f.go: 10)\n"
        "\tat g(: <unknown>)\n,exception.type=VE"
    )


def test_http_and_content_length_typing(spark):
    http = {"request": {"method": "GET", "url": "u", "client_ip": "1.1.1.1",
                        "x_forwarded_for": True},
            "response": {"status": 503, "content_length": 124.9}}
    (r,) = _parse(spark, [_doc(http=http)])
    assert "http.response_content_length=124" in r["xr_attrs"]  # truncated
    assert "http.status_code=503" in r["xr_attrs"]
    assert "aws.xray.x_forwarded_for=true" in r["xr_attrs"]
    http["response"]["content_length"] = "1k"
    (r,) = _parse(spark, [_doc(http=http)])
    assert "http.response_content_length=1k" in r["xr_attrs"]


def test_sql_annotations_metadata(spark):
    doc = _doc(
        sql={"url": "pg://h:5/db?x=1", "database_type": "pg",
             "sanitized_query": "SELECT 1", "user": "u"},
        annotations={"s": "x", "n": 3, "f": 2.5, "b": True, "arr": [1]},
        metadata={"m1": {"b": 1, "a": "z"}},
    )
    (r,) = _parse(spark, [doc])
    at = r["xr_attrs"]
    assert "db.connection_string=pg://h:5" in at
    assert "db.name=db" in at
    assert "s=x" in at and "n=3" in at and "f=2.5" in at and "b=true" in at
    assert "arr=" not in at      # non-scalar annotation value dropped
    assert 'aws.xray.annotations=["arr","b","f","n","s"]' in at
    assert 'aws.xray.metadata.m1={"a":"z","b":1}' in at


def test_resource_overrides_and_sdk_language(spark):
    aws = {"account_id": "1",
           "ec2": {"instance_id": "i", "availability_zone": "az1"},
           "ecs": {"container": "c", "availability_zone": "az2",
                   "container_id": "ecsid"},
           "eks": {"container_id": "eksid"},
           "xray": {"sdk": "X-Ray for Go", "sdk_version": "1"}}
    (r,) = _parse(spark, [_doc(aws=aws)])
    ra = r["xr_resource_attrs"]
    assert "cloud.availability_zone=az2" in ra   # ecs overrides ec2
    assert "container.id=eksid" in ra            # eks overrides ecs
    assert "telemetry.sdk.language=Go" in ra
    # cause+exceptions on the root forces language=java
    (r,) = _parse(spark, [_doc(aws=aws, cause={"exceptions": [{"id": "x"}]})])
    assert "telemetry.sdk.language=java" in r["xr_resource_attrs"]


def test_document_rejection(spark):
    # bad span id rejects the whole document (all rows xr_ok false)
    doc = _doc(subsegments=[{"name": "s", "id": "zz",
                             "start_time": 1.0}])
    rows = _parse(spark, [doc])
    assert len(rows) == 2 and all(not r["xr_ok"] for r in rows)
    # bad namespace and bad sql.url also reject
    (r, _) = _parse(spark, [_doc(subsegments=[
        {"name": "s", "id": "aaaaaaaaaaaaaaaa", "start_time": 1.0,
         "namespace": "weird"}])])
    assert r["xr_ok"] is False
    (r,) = _parse(spark, [_doc(sql={"url": "no-slashes"})])
    assert r["xr_ok"] is False
    # missing root trace_id fails Validate()
    d = _doc(); del d["trace_id"]
    (r,) = _parse(spark, [d])
    assert r["xr_ok"] is False

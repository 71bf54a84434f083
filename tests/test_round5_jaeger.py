"""Round-5: jaeger batch JSON → OTLP span translation, pinning
pkg/translator/jaeger/jaegerproto_to_traces.go semantics.
"""
from __future__ import annotations

import json

from opentelemetry_collector_contrib_spark.operators.jaeger import (
    jaeger_batches_to_spans,
)


def _parse(spark, batches):
    df = spark.createDataFrame(
        [(json.dumps(b) if not isinstance(b, str) else b,) for b in batches],
        "body string",
    )
    return sorted(
        jaeger_batches_to_spans(df).collect(), key=lambda r: r["jg_span_id"]
    )


def _span(**kw):
    base = {
        "traceIdHigh": 1, "traceIdLow": 2, "spanId": 3,
        "operationName": "op", "startTime": 1000, "duration": 5,
    }
    base.update(kw)
    return base


def _batch(spans, process=None):
    b = {"spans": spans}
    if process is not None:
        b["process"] = process
    return b


def test_ids_and_times(spark):
    (r,) = _parse(spark, [_batch([_span(traceIdHigh=0, traceIdLow=-1)])])
    # negative long = two's-complement uint64 (UInt64ToTraceID)
    assert r["jg_trace_id"] == "0" * 16 + "f" * 16
    assert r["jg_span_id"] == "0" * 15 + "3"
    assert r["jg_start_ns"] == 1000_000
    assert r["jg_end_ns"] == 1005_000
    assert r["jg_parent_id"] is None
    assert r["jg_status_code"] is None  # no status tags → status unset


def test_parent_child_of_wins_over_follows_from(spark):
    refs = [
        {"traceIdHigh": 1, "traceIdLow": 2, "spanId": 7,
         "refType": "FOLLOWS_FROM"},
        {"traceIdHigh": 9, "traceIdLow": 2, "spanId": 8,
         "refType": "CHILD_OF"},  # other trace → not a parent candidate
        {"traceIdHigh": 1, "traceIdLow": 2, "spanId": 9,
         "refType": "CHILD_OF"},
    ]
    (r,) = _parse(spark, [_batch([_span(references=refs)])])
    assert r["jg_parent_id"] == "0" * 15 + "9"
    # links: every ref except the parent CHILD_OF (list is not the
    # single-parent shortcut)
    toks = r["jg_links"].split(";")
    assert len(toks) == 2
    assert toks[0].endswith("opentracing.ref_type=follows_from")
    assert toks[1].startswith("0" * 15 + "9" + "0" * 15 + "2|" + "0" * 15 + "8")


def test_single_parent_ref_produces_no_links(spark):
    refs = [{"traceIdHigh": 1, "traceIdLow": 2, "spanId": 7,
             "refType": "CHILD_OF"}]
    (r,) = _parse(spark, [_batch([_span(references=refs)])])
    assert r["jg_parent_id"] == "0" * 15 + "7"
    assert r["jg_links"] == ""


def test_status_error_tag_ladder(spark):
    # BOOL error=true wins over otel.status_code and is consumed;
    # description consumed; http.* stay
    tags = [
        {"key": "error", "vType": "BOOL", "vBool": True},
        {"key": "otel.status_code", "vStr": "OK"},
        {"key": "otel.status_description", "vStr": "boom"},
        {"key": "http.status_message", "vStr": "m"},
    ]
    (r,) = _parse(spark, [_batch([_span(tags=tags)])])
    assert (r["jg_status_code"], r["jg_status_msg"]) == (2, "boom")
    assert r["jg_attrs"] == "http.status_message=m"

    # STRING "true" error tag does NOT set status and stays an attr
    tags = [{"key": "error", "vStr": "true"}]
    (r,) = _parse(spark, [_batch([_span(tags=tags)])])
    assert r["jg_status_code"] is None
    assert r["jg_attrs"] == "error=true"

    # BOOL error=false: no status, stays an attr
    tags = [{"key": "error", "vType": "BOOL", "vBool": False}]
    (r,) = _parse(spark, [_batch([_span(tags=tags)])])
    assert r["jg_status_code"] is None
    assert r["jg_attrs"] == "error=false"


def test_status_code_tag_case_insensitive_and_unknown(spark):
    (r,) = _parse(
        spark, [_batch([_span(tags=[{"key": "otel.status_code",
                                     "vStr": "ok"}])])]
    )
    assert r["jg_status_code"] == 1
    # unknown spelling → status still set, code Unset(0)
    (r,) = _parse(
        spark, [_batch([_span(tags=[{"key": "otel.status_code",
                                     "vStr": "wat"}])])]
    )
    assert r["jg_status_code"] == 0


def test_http_fallback_matrix(spark):
    def code(http, kind=None, vtype="INT64"):
        tags = []
        if kind:
            tags.append({"key": "span.kind", "vStr": kind})
        if vtype == "INT64":
            tags.append({"key": "http.status_code", "vType": "INT64",
                         "vInt64": http})
        else:
            tags.append({"key": "http.status_code", "vStr": str(http)})
        (r,) = _parse(spark, [_batch([_span(tags=tags)])])
        return r["jg_status_code"]

    assert code(200) is None            # 100-398 → no status
    assert code(399) == 2               # StatusCodeFromHTTP boundary
    assert code(404, "client") == 2
    assert code(404, "server") is None  # 4xx server → unset
    assert code(404, "producer") == 2   # other kinds fall through
    assert code(503, vtype="STRING") == 2
    # non-numeric string → parse error → no status
    tags = [{"key": "http.status_code", "vStr": "abc"}]
    (r,) = _parse(spark, [_batch([_span(tags=tags)])])
    assert r["jg_status_code"] is None


def test_scope_orphan_version_stays_attr(spark):
    tags = [{"key": "otel.scope.version", "vStr": "9"}]
    (r,) = _parse(spark, [_batch([_span(tags=tags)])])
    assert (r["jg_scope_name"], r["jg_scope_version"]) == ("", "")
    assert r["jg_attrs"] == "otel.scope.version=9"

    tags = [{"key": "otel.scope.name", "vStr": "lib"},
            {"key": "otel.scope.version", "vStr": "9"}]
    (r,) = _parse(spark, [_batch([_span(tags=tags)])])
    assert (r["jg_scope_name"], r["jg_scope_version"]) == ("lib", "9")
    assert r["jg_attrs"] == ""


def test_resource_renames_and_sentinel(spark):
    proc = {"serviceName": "svc", "tags": [
        {"key": "hostname", "vStr": "h1"},
        {"key": "jaeger.version", "vStr": "1.2"},
    ]}
    (r,) = _parse(spark, [_batch([_span()], process=proc)])
    assert r["jg_resource_attrs"] == (
        "host.name=h1,opencensus.exporterversion=Jaeger-1.2,service.name=svc"
    )
    # host.name already present → hostname NOT renamed
    proc["tags"].append({"key": "host.name", "vStr": "real"})
    (r,) = _parse(spark, [_batch([_span()], process=proc)])
    assert "hostname=h1" in r["jg_resource_attrs"]
    assert "host.name=real" in r["jg_resource_attrs"]
    # the no-service sentinel contributes nothing
    (r,) = _parse(
        spark,
        [_batch([_span()],
                process={"serviceName": "OTLPResourceNoServiceName"})],
    )
    assert r["jg_service"] is None
    assert r["jg_resource_attrs"] == ""


def test_span_process_overrides_batch(spark):
    b = _batch(
        [_span(), _span(spanId=4, process={"serviceName": "mine"})],
        process={"serviceName": "batchsvc", "tags": []},
    )
    r3, r4 = _parse(spark, [b])
    assert r3["jg_service"] == "batchsvc"
    assert r4["jg_service"] == "mine"
    assert r4["jg_resource_attrs"] == "service.name=mine"


def test_typed_tags_events_and_kind(spark):
    tags = [
        {"key": "span.kind", "vStr": "consumer"},
        {"key": "n", "vType": "INT64", "vInt64": -7},
        {"key": "f", "vType": "FLOAT64", "vFloat64": 2.0},
        {"key": "g", "vType": "FLOAT64", "vFloat64": 2.25},
        {"key": "b", "vType": "BINARY", "vBinary": "Qk4="},
        {"key": "w", "vType": "NOPE", "vStr": "x"},
        {"key": "w3c.tracestate", "vStr": "a=b"},
    ]
    logs = [{"timestamp": 77, "fields": [
        {"key": "event", "vStr": "boot"}, {"key": "lvl", "vStr": "i"}]}]
    (r,) = _parse(spark, [_batch([_span(tags=tags, logs=logs)])])
    assert r["jg_kind"] == "consumer"
    assert r["jg_trace_state"] == "a=b"
    assert r["jg_attrs"] == (
        'b=Qk4=,f=2,g=2.25,n=-7,w=<Unknown Jaeger TagType "NOPE">'
    )
    assert r["jg_events"] == "77000|boot|lvl=i"
    # unknown kind string → unspecified, tag still consumed
    (r,) = _parse(
        spark, [_batch([_span(tags=[{"key": "span.kind", "vStr": "WAT"}])])]
    )
    assert r["jg_kind"] == "unspecified"
    assert r["jg_attrs"] == ""


def test_blank_and_unparseable_dropped(spark):
    rows = _parse(spark, ["{nope", json.dumps(_batch([None, _span()]))])
    assert len(rows) == 1

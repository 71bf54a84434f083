"""Round-5: OTLP spans → Jaeger proto span models, pinning
pkg/translator/jaeger/traces_to_jaegerproto.go semantics.
"""
from __future__ import annotations

from opentelemetry_collector_contrib_spark.operators.jaeger_export import (
    jaeger_export_spans,
)

_TAG = ("struct<key:string,vtype:string,vstr:string,vint:bigint,"
        "vbool:boolean,vdouble:double,vbinary:binary>")
_SCHEMA = (
    "i int, trace_id string, span_id string, parent_span_id string, "
    "name string, kind int, start_ns bigint, end_ns bigint, "
    "status_code int, status_message string, trace_state string, "
    f"attrs array<{_TAG}>, res_attrs array<{_TAG}>, "
    "scope_name string, scope_version string, "
    f"events array<struct<ts_ns:bigint,name:string,attrs:array<{_TAG}>>>, "
    f"links array<struct<trace_id:string,span_id:string,"
    f"attrs:array<{_TAG}>>>"
)


def _t(key, vtype, vstr=None, vint=None, vbool=None, vdouble=None,
       vbinary=None):
    return dict(key=key, vtype=vtype, vstr=vstr, vint=vint, vbool=vbool,
                vdouble=vdouble, vbinary=vbinary)


def _row(i, **kw):
    base = dict(
        i=i, trace_id="0" * 31 + "1", span_id="0" * 15 + "2",
        parent_span_id="", name="op", kind=0,
        start_ns=100, end_ns=350,
        status_code=0, status_message="", trace_state="",
        attrs=[], res_attrs=[_t("service.name", "string", vstr="svc")],
        scope_name="", scope_version="", events=None, links=None,
    )
    base.update(kw)
    return base


def _export(spark, rows):
    df = spark.createDataFrame([_row(i, **r) for i, r in enumerate(rows)],
                               _SCHEMA)
    return jaeger_export_spans(df, id_cols=["i"]).orderBy("i").collect()


def test_process_service_name_rules(spark):
    out = _export(spark, [
        {},                                           # plain string svc
        {"res_attrs": []},                            # EMPTY resource
        # key present with non-string type -> Str() == "" (:84-89)
        {"res_attrs": [_t("service.name", "int", vint=7),
                       _t("host.name", "string", vstr="h1")]},
        # key absent but resource non-empty -> "" (not the marker)
        {"res_attrs": [_t("host.name", "string", vstr="h1")]},
    ])
    assert [r["service_name"] for r in out] == [
        "svc", "OTLPResourceNoServiceName", "", ""]
    assert out[2]["process_tags"] == "host.name=STRING:h1"
    assert out[1]["process_tags"] == ""


def test_idutils_two_complement_folds(spark):
    out = _export(spark, [
        {"trace_id": "ffffffffffffffff" + "0" * 15 + "1",
         "span_id": "8000000000000000"},
        {"trace_id": "", "span_id": "0" * 15 + "f"},
    ])
    assert (out[0]["trace_id_high"], out[0]["trace_id_low"]) == (-1, 1)
    assert out[0]["span_id_u64"] == -(2 ** 63)
    assert (out[1]["trace_id_high"], out[1]["trace_id_low"]) == (0, 0)
    assert out[1]["span_id_u64"] == 15


def test_reference_override_and_append(spark):
    tid = "0" * 31 + "1"
    parent = "0" * 15 + "9"
    out = _export(spark, [
        # parent only -> single CHILD_OF ref
        {"parent_span_id": parent},
        # matching link WITHOUT ref_type attr -> ref0 FOLLOWS_FROM,
        # link consumed (:262-270)
        {"parent_span_id": parent,
         "links": [dict(trace_id=tid, span_id=parent, attrs=[])]},
        # matching link WITH child_of attr -> stays CHILD_OF, consumed
        {"parent_span_id": parent,
         "links": [dict(trace_id=tid, span_id=parent,
                        attrs=[_t("opentracing.ref_type", "string",
                                  vstr="child_of")])]},
        # non-matching link -> appended after ref0, attr-less ->
        # FOLLOWS_FROM (:406-419)
        {"parent_span_id": parent,
         "links": [dict(trace_id="0" * 31 + "3", span_id="0" * 15 + "4",
                        attrs=[])]},
        # no parent: link list passes through as-is
        {"links": [dict(trace_id=tid, span_id=parent, attrs=[])]},
    ])
    assert out[0]["refs"] == "0|1|9|CHILD_OF"
    assert out[1]["refs"] == "0|1|9|FOLLOWS_FROM"
    assert out[2]["refs"] == "0|1|9|CHILD_OF"
    assert out[3]["refs"] == "0|1|9|CHILD_OF;0|3|4|FOLLOWS_FROM"
    assert out[4]["refs"] == "0|1|9|FOLLOWS_FROM"


def test_tag_assembly_order_and_types(spark):
    out = _export(spark, [
        {"kind": 3, "status_code": 2, "status_message": "boom",
         "trace_state": "a=b", "scope_name": "lib", "scope_version": "1.2",
         "attrs": [_t("n", "int", vint=-3),
                   _t("f", "double", vdouble=0.5),
                   _t("b", "bool", vbool=False),
                   _t("raw", "binary", vbinary=bytearray(b"\x01\xab")),
                   _t("m", "map", vstr='{"a":1}')]},
        {"kind": 6, "status_code": 1},   # out-of-range kind -> no tag
    ])
    assert out[0]["tags"] == (
        "otel.scope.name=STRING:lib,otel.scope.version=STRING:1.2,"
        "n=INT64:-3,f=FLOAT64:0.5,b=BOOL:false,raw=BINARY:01ab,"
        'm=STRING:{"a":1},span.kind=STRING:client,'
        "otel.status_code=STRING:ERROR,error=BOOL:true,"
        "otel.status_description=STRING:boom,w3c.tracestate=STRING:a=b")
    assert out[1]["tags"] == "otel.status_code=STRING:OK"
    assert out[0]["duration_ns"] == 250


def test_event_name_injection(spark):
    out = _export(spark, [
        {"events": [
            dict(ts_ns=7, name="wake", attrs=[]),
            # pre-existing `event` attr -> name NOT injected (:288-293)
            dict(ts_ns=8, name="ev",
                 attrs=[_t("event", "string", vstr="x"),
                        _t("n", "int", vint=2)]),
            dict(ts_ns=9, name="", attrs=[_t("z", "string", vstr="y")]),
        ]},
        {"events": None},
    ])
    assert out[0]["logs"] == (
        "7~event=STRING:wake;8~event=STRING:x,n=INT64:2;9~z=STRING:y")
    assert out[1]["logs"] == ""

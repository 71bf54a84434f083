"""Round-5: OTLP spans → Zipkin v2 span models, pinning
pkg/translator/zipkin/zipkinv2/from_translator.go semantics.
"""
from __future__ import annotations

from opentelemetry_collector_contrib_spark.operators.zipkin_export import (
    zipkin_export_spans,
)

_SCHEMA = (
    "i int, trace_id string, span_id string, parent_span_id string, "
    "name string, kind int, start_ns bigint, end_ns bigint, "
    "status_code int, status_message string, trace_state string, "
    "attrs map<string,string>, res_attrs map<string,string>, "
    "scope_name string, scope_version string, "
    "events array<struct<ts_ns:bigint,name:string,"
    "attrs:map<string,string>,dropped:int>>, "
    "links array<struct<trace_id:string,span_id:string,"
    "trace_state:string,attrs:map<string,string>,dropped:int>>"
)


def _row(i, **kw):
    base = dict(
        i=i, trace_id="0" * 31 + "1", span_id="0" * 15 + "2",
        parent_span_id="", name="op", kind=2,
        start_ns=1700000000000000000, end_ns=1700000000001000000,
        status_code=0, status_message="", trace_state="",
        attrs={}, res_attrs={"service.name": "svc"},
        scope_name="", scope_version="", events=None, links=None,
    )
    base.update(kw)
    return base


def _export(spark, rows):
    df = spark.createDataFrame([_row(i, **r) for i, r in enumerate(rows)],
                               _SCHEMA)
    out = zipkin_export_spans(df, id_cols=["i"]).orderBy("i").collect()
    return out


def test_service_extraction_priority_and_marker(spark):
    rows = _export(spark, [
        # service.name wins, is deleted, NO source marker (:278-283)
        {"res_attrs": {"service.name": "a", "faas.name": "f",
                       "host.name": "h"}},
        # faas.name fallback leaves a source marker and keeps the
        # lower-priority keys as tags (:283-293)
        {"res_attrs": {"faas.name": "f", "k8s.deployment.name": "d"}},
        # empty resource map -> fixed fallback name (:265-267)
        {"res_attrs": {}},
    ])
    assert rows[0]["local_service_name"] == "a"
    assert rows[0]["tags"] == {"faas.name": "f", "host.name": "h"}
    assert rows[1]["local_service_name"] == "f"
    assert rows[1]["tags"] == {
        "k8s.deployment.name": "d",
        "otlp.service.name.source": "faas.name"}
    assert rows[2]["local_service_name"] == "OTLPResourceNoServiceName"


def test_tag_merge_order_and_singles(spark):
    rows = _export(spark, [
        # span attrs override resource attrs; scope name/version become
        # otel.library.* ; tracestate + internal-kind singles win last
        {"res_attrs": {"service.name": "s", "k": "res"},
         "attrs": {"k": "span", "w3c.tracestate": "stale",
                   "span.kind": "stale"},
         "scope_name": "lib", "scope_version": "1.2",
         "trace_state": "a=b", "kind": 1},
    ])
    assert rows[0]["tags"] == {
        "k": "span", "otel.library.name": "lib",
        "otel.library.version": "1.2",
        "w3c.tracestate": "a=b", "span.kind": "internal"}
    assert rows[0]["zkind"] == ""  # internal -> Undetermined (:305-313)


def test_endpoints_and_redundant_tag_removal(spark):
    rows = _export(spark, [
        {"attrs": {"net.host.ip": "10.0.0.1", "net.host.port": "8080",
                   "net.peer.ip": "2001:db8::1", "net.peer.port": "99999",
                   "peer.service": "p", "keep": "1"}},
        # remote endpoint with NO peer.service: serviceName stays ""
        # (the caller passes "" for remote, :152) -> endpoint only if ip ok
        {"attrs": {"net.peer.ip": "bogus", "net.peer.port": "53"}},
    ])
    r = rows[0]
    assert r["local_ipv4"] == "10.0.0.1" and r["local_ipv6"] is None
    assert r["local_port"] == 8080
    assert r["remote_service_name"] == "p"
    assert r["remote_ipv6"] == "2001:db8::1" and r["remote_ipv4"] is None
    assert r["remote_port"] == 0          # ParseUint(.., 16) error -> 0
    assert r["tags"] == {"keep": "1"}     # consulted keys removed (:344)
    r = rows[1]
    # serviceName=="" and unparsable ip -> nil endpoint (:348-350);
    # consulted keys are still removed from the tags
    assert r["remote_service_name"] is None and r["remote_port"] is None
    assert r["tags"] == {}


def test_status_and_error_tag(spark):
    rows = _export(spark, [
        # pre-existing error tag DELETED when status not error (:172-177)
        {"attrs": {"error": "false"}, "status_code": 1},
        {"status_code": 2, "status_message": "boom"},
        {"status_code": 0, "status_message": "ignored"},
    ])
    assert rows[0]["tags"] == {"otel.status_code": "STATUS_CODE_OK"}
    assert rows[0]["zerr_message"] is None
    assert rows[1]["tags"] == {
        "error": "true", "otel.status_code": "STATUS_CODE_ERROR",
        "otel.status_description": "boom"}
    assert rows[1]["is_error_tagged"] is True
    assert rows[1]["zerr_message"] == "boom"
    # unset status: no tags at all (:184-186)
    assert rows[2]["tags"] == {}


def test_time_rules(spark):
    rows = _export(spark, [
        # startTime Unix()==0 -> timestamp omitted (:135-140)
        {"start_ns": 999999999, "end_ns": 5000},
        # end==0 -> no duration (:142-144)
        {"start_ns": 1700000000000000000, "end_ns": 0},
    ])
    assert rows[0]["ts_ns"] is None
    assert rows[0]["duration_ns"] == 5000 - 999999999
    assert rows[1]["ts_ns"] == 1700000000000000000
    assert rows[1]["duration_ns"] is None


def test_events_links_and_invalid_ids(spark):
    rows = _export(spark, [
        {"events": [
            {"ts_ns": 5, "name": "plain", "attrs": {}, "dropped": 0},
            {"ts_ns": 6, "name": "rich", "attrs": {"b": "2", "a": "1"},
             "dropped": 3},
            {"ts_ns": 7, "name": "dropped-only", "attrs": {},
             "dropped": 1},
         ],
         "links": [
            {"trace_id": "t1", "span_id": "s1", "trace_state": "x=y",
             "attrs": {"k": "v"}, "dropped": 0},
            {"trace_id": "", "span_id": "", "trace_state": "",
             "attrs": {}, "dropped": 2},
         ]},
        {"trace_id": ""},
        {"span_id": ""},
    ])
    r = rows[0]
    assert [a["value"] for a in r["annotations"]] == [
        "plain",                              # attr-less, undropped (:209)
        'rich|{"a":"1","b":"2"}|3',           # name|sortedjson|dropped
        "dropped-only|{}|1",
    ]
    assert r["tags"]["otlp.link.0"] == 't1|s1|x=y|{"k":"v"}|0'
    assert r["tags"]["otlp.link.1"] == "|||{}|2"
    assert rows[0]["err"] is False
    assert rows[1]["err"] is True and rows[2]["err"] is True


def test_kind_words(spark):
    rows = _export(spark, [{"kind": k} for k in [0, 1, 2, 3, 4, 5, 9]])
    assert [r["zkind"] for r in rows] == \
        ["", "", "SERVER", "CLIENT", "PRODUCER", "CONSUMER", ""]

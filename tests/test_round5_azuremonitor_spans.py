"""Round-5: spans → Application Insights envelopes, pinning
exporter/azuremonitorexporter/trace_to_envelope.go edge semantics.
"""
from __future__ import annotations

from opentelemetry_collector_contrib_spark.operators.azuremonitor_trace_export import (
    azuremonitor_span_envelopes,
)

_SCHEMA = (
    "i int, trace_id string, span_id string, parent_span_id string, "
    "name string, kind int, start_ns bigint, end_ns bigint, "
    "status_code int, status_message string, "
    "attrs map<string,string>, res_attrs map<string,string>, "
    "scope_name string, scope_version string, "
    "events array<struct<ts_ns:bigint,name:string,"
    "attrs:map<string,string>>>, "
    "links array<struct<trace_id:string,span_id:string>>"
)


def _env(spark, rows, **opts):
    full = [dict(i=i, trace_id="t" * 32, span_id="s" * 16,
                 parent_span_id="", name="op", kind=2,
                 start_ns=1700000000000000000,
                 end_ns=1700000000000000000 + 90_061_000_123_000,
                 status_code=0, status_message="", attrs={},
                 res_attrs={}, scope_name="", scope_version="",
                 events=None, links=None) | r
            for i, r in enumerate(rows)]
    df = spark.createDataFrame(full, _SCHEMA)
    return azuremonitor_span_envelopes(df, id_cols=["i"], **opts)\
        .orderBy("i", "kind").collect()


def test_kind_dispatch_faas_drop_and_duration(spark):
    out = _env(spark, [
        {"kind": 2},                                   # server
        {"kind": 0, "attrs": {"http.method": "GET"}},  # unspec->InProc
        {"kind": 3, "attrs": {"faas.trigger": "http"}},   # dropped
        {"kind": 4, "attrs": {"db.system": "pg",
                              "db.operation": "sel"}},
    ])
    assert [(r["i"], r["kind"]) for r in out] == [
        (0, "Request"), (1, "RemoteDependency"),
        (3, "RemoteDependency")]
    # 90061.000123 s = 1 day 1h 1m 1s 123 us
    assert out[0]["duration"] == "01.01:01:01.000123"
    assert out[1]["dep_type"] == "InProc"        # overrides HTTP
    assert out[2]["dep_type"] == "pg"
    assert out[2]["dep_data"] == "sel"           # operation fallback


def test_db_request_skips_attr_copy_and_links(spark):
    out = _env(spark, [
        {"kind": 2, "attrs": {"db.system": "pg", "x": "1"},
         "links": [dict(trace_id="lt", span_id="ls")]},
        {"kind": 3, "attrs": {"db.system": "pg", "x": "1"}},
    ])
    # request switch has no database arm -> span attrs NOT copied
    assert out[0]["properties"] == (
        '_MS.links=[{"operation_Id":"lt","id":"ls"}],'
        "otel.status_code=STATUS_CODE_UNSET")
    assert out[1]["properties"] == (
        "db.system=pg,otel.status_code=STATUS_CODE_UNSET,x=1")


def test_http_ladders_and_status(spark):
    out = _env(spark, [
        {"kind": 2, "status_code": 2, "status_message": "bad",
         "attrs": {"http.method": "GET", "http.route": "r1",
                   "http.status_code": "500",
                   "http.scheme": "https", "http.host": "h.io",
                   "http.target": "p?q=1", "enduser.id": "u7"}},
        {"kind": 3,
         "attrs": {"http.method": "GET",
                   "http.url": "https://x.io:81/z"}},
    ])
    r = out[0]
    assert (r["name"], r["operation_name"]) == ("GET /r1", "GET /r1")
    assert (r["response_code"], r["success"]) == ("500", False)
    assert r["url"] == "https://h.io/p?q=1"
    assert r["user_id"] == "u7"
    assert "otel.status_description=bad" in r["properties"]
    d = out[1]
    assert (d["name"], d["dep_type"]) == ("GET", "HTTP")
    assert (d["dep_data"], d["dep_target"]) == ("https://x.io:81/z",
                                                "x.io:81")


def test_span_event_envelopes(spark):
    out = _env(spark, [
        {"events": [
            dict(ts_ns=1700000000000000005, name="exception",
                 attrs={"exception.type": "T",
                        "exception.stacktrace": "st"}),
            dict(ts_ns=1700000000000000006, name="note", attrs={}),
        ]},
    ])
    kinds = [r["kind"] for r in out]
    assert kinds == ["Exception", "Request"]   # note dropped
    exc = out[0]
    assert exc["op_parent_id"] == "s" * 16     # the span's OWN id
    assert (exc["exc_type"], exc["exc_stack"],
            exc["exc_has_full_stack"]) == ("T", "st", True)
    assert exc["severity_level"] == "Error"
    # span_events_enabled exports the message event too
    out = _env(spark, [
        {"events": [dict(ts_ns=5, name="note", attrs={})]},
    ], span_events_enabled=True)
    assert sorted(r["kind"] for r in out) == ["Message", "Request"]
    assert [r["message"] for r in out if r["kind"] == "Message"] == \
        ["note"]

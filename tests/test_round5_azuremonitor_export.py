"""Round-5: OTLP → Application Insights envelopes, pinning
exporter/azuremonitorexporter/{log_to_envelope,metric_to_envelopes}.go
semantics.
"""
from __future__ import annotations

from opentelemetry_collector_contrib_spark.operators.azuremonitor_export import (
    azuremonitor_log_envelopes,
    azuremonitor_metric_envelopes,
)

_LOG_SCHEMA = (
    "i int, body string, ts_ns bigint, observed_ts_ns bigint, "
    "trace_id string, span_id string, severity_number int, "
    "severity_text string, attrs map<string,string>, "
    "res_attrs map<string,string>, scope_name string, "
    "scope_version string"
)


def _logs(spark, rows, **opts):
    full = [dict(i=i, body="b", ts_ns=1700000000000000000,
                 observed_ts_ns=0, trace_id="t1", span_id="s1",
                 severity_number=0, severity_text="", attrs={},
                 res_attrs={}, scope_name="", scope_version="") | r
            for i, r in enumerate(rows)]
    df = spark.createDataFrame(full, _LOG_SCHEMA)
    return azuremonitor_log_envelopes(df, id_cols=["i"], **opts)\
        .orderBy("i").collect()


def test_dispatch_precedence_and_gating(spark):
    rows = [
        {"attrs": {"microsoft.custom_event.name": "ce",
                   "exception.type": "T"}},
        {"attrs": {"exception.message": "em"}, "severity_number": 14,
         "severity_text": "WARN"},
        {"attrs": {"APPLICATION_INSIGHTS_EVENT_MARKER_ATTRIBUTE": "mk"}},
    ]
    out = _logs(spark, rows, custom_events_enabled=True,
                exception_events_enabled=True)
    assert [r["kind"] for r in out] == ["Event", "Exception", "Event"]
    assert out[0]["event_name"] == "ce"      # name attr wins
    assert out[0]["op_id"] is None           # no operation tags
    assert out[1]["problem_id"] == "WARN"
    assert out[1]["severity_level"] == "Warning"
    assert out[1]["exc_message"] == "em" and out[1]["exc_type"] == ""
    assert out[1]["exc_has_full_stack"] is False
    # with both features off, everything is a Message
    out = _logs(spark, rows)
    assert [r["kind"] for r in out] == ["Message"] * 3


def test_message_fields_cloud_role_and_time(spark):
    out = _logs(spark, [
        {"res_attrs": {"service.name": "svc",
                       "service.namespace": "ns",
                       "service.instance.id": "inst", "rk": "rv"},
         "scope_name": "lib", "scope_version": "2",
         "attrs": {"rk": "override"}, "severity_number": 25},
        {"ts_ns": 0, "observed_ts_ns": 0},   # Now() -> NULL here
    ])
    r = out[0]
    assert r["cloud_role"] == "ns.svc"
    assert r["cloud_role_instance"] == "inst"
    assert r["severity_level"] == "Information"   # out of band
    assert r["message"] == "b"
    # attr overrides the resource value; scope props included
    assert r["properties"] == (
        "instrumentationlibrary.name=lib,"
        "instrumentationlibrary.version=2,rk=override,"
        "service.instance.id=inst,service.name=svc,"
        "service.namespace=ns")
    assert r["time"] == "2023-11-14T22:13:20Z"
    assert out[1]["time"] is None


_MET_SCHEMA = (
    "i int, name string, mtype string, ts_ns bigint, "
    "attrs map<string,string>, res_attrs map<string,string>, "
    "scope_name string, scope_version string, is_int boolean, "
    "vint bigint, vdouble double, count bigint, sum double, "
    "min double, max double"
)


def test_metric_envelopes(spark):
    full = [
        dict(i=0, name="m", mtype="gauge", ts_ns=1700000000000000000,
             attrs={}, res_attrs={}, scope_name="", scope_version="",
             is_int=None, vint=0, vdouble=None, count=None, sum=None,
             min=None, max=None),
        dict(i=1, name="m", mtype="histogram",
             ts_ns=1700000000000000000, attrs={}, res_attrs={},
             scope_name="", scope_version="", is_int=None, vint=0,
             vdouble=None, count=7, sum=None, min=None, max=2.0),
        dict(i=2, name="m", mtype="summary",
             ts_ns=1700000000000000000, attrs={}, res_attrs={},
             scope_name="", scope_version="", is_int=None, vint=0,
             vdouble=None, count=3, sum=1.5, min=9.0, max=9.0),
        dict(i=3, name="m", mtype="empty",
             ts_ns=1700000000000000000, attrs={}, res_attrs={},
             scope_name="", scope_version="", is_int=None, vint=0,
             vdouble=None, count=None, sum=None, min=None, max=None),
    ]
    df = spark.createDataFrame(full, _MET_SCHEMA)
    out = azuremonitor_metric_envelopes(df, id_cols=["i"])\
        .orderBy("i").collect()
    assert len(out) == 3                       # 'empty' dropped
    assert (out[0]["value"], out[0]["dp_count"],
            out[0]["dp_kind"]) == (0.0, 1, "Measurement")
    # ungated pdata getters: unset sum/min -> 0
    assert (out[1]["value"], out[1]["dp_min"], out[1]["dp_max"],
            out[1]["dp_count"]) == (0.0, 0.0, 2.0, 7)
    # summary never sets min/max
    assert (out[2]["value"], out[2]["dp_min"], out[2]["dp_max"]) == \
        (1.5, None, None)

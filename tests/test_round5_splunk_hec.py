"""Round-5: OTLP → Splunk HEC events, pinning
exporter/splunkhecexporter/{logdata,metricdata,tracedata}_to_splunk.go
semantics.
"""
from __future__ import annotations

import json

from opentelemetry_collector_contrib_spark.operators.splunk_hec import (
    splunk_hec_logs,
    splunk_hec_metrics,
    splunk_hec_spans,
)

_LOG_SCHEMA = (
    "i int, body string, ts_ns bigint, observed_ts_ns bigint, "
    "trace_id string, span_id string, severity_text string, "
    "severity_number int, attrs map<string,string>, "
    "res_attrs map<string,string>"
)


def _log_row(i, **kw):
    base = dict(i=i, body="hello", ts_ns=1700000000123456789,
                observed_ts_ns=1690000000000000000, trace_id="",
                span_id="", severity_text="", severity_number=0,
                attrs={}, res_attrs={})
    base.update(kw)
    return base


def _logs(spark, rows, **opts):
    df = spark.createDataFrame(
        [_log_row(i, **r) for i, r in enumerate(rows)], _LOG_SCHEMA)
    return splunk_hec_logs(df, id_cols=["i"], **opts)\
        .orderBy("i").collect()


def test_log_body_rejection_and_time(spark):
    out = _logs(spark, [
        {},                      # .1234567 s -> rounds to .123
        {"body": ""},            # rejected (:57-60)
        {"ts_ns": 1700000000123500000},  # half -> away from zero
        {"ts_ns": 0},            # falls back to observed (:121-124)
    ])
    assert [r["hec_ok"] for r in out] == [True, False, True, True]
    assert out[0]["time"] == 1700000000.123
    assert out[2]["time"] == 1700000000.124
    assert out[3]["time"] == 1690000000.0
    assert out[0]["event"] == "hello"


def test_log_fields_last_wins_and_routing(spark):
    out = _logs(spark, [
        {"trace_id": "ab" * 16, "span_id": "cd" * 8,
         "severity_text": "INFO", "severity_number": 9,
         "res_attrs": {"env": "prod", "host.name": "rh",
                       "com.splunk.hec.access_token": "shh"},
         "attrs": {"env": "dev", "k": "1"}},
        # log attr overrides resource for routing; present-but-empty
        # source wins over the config default (v.Str() assignment)
        {"res_attrs": {"host.name": "rh", "com.splunk.source": ""},
         "attrs": {"host.name": "lh"}},
        {},   # no host anywhere -> "unknown"
    ], source="defsrc")
    assert out[0]["fields"] == (
        "env=dev,k=1,otel.log.severity.number=9,"
        "otel.log.severity.text=INFO,"
        f"span_id={'cd' * 8},trace_id={'ab' * 16}")
    assert out[0]["host"] == "rh"
    assert (out[1]["host"], out[1]["source"]) == ("lh", "")
    assert (out[2]["host"], out[2]["source"]) == ("unknown", "defsrc")


_MET_SCHEMA = (
    "i int, name string, mtype string, ts_ns bigint, "
    "attrs map<string,string>, res_attrs map<string,string>, "
    "is_int boolean, vint bigint, vdouble double, count bigint, "
    "sum double, bounds array<double>, bucket_counts array<bigint>, "
    "quantiles array<struct<q:double,v:double>>"
)


def _met_row(i, **kw):
    base = dict(i=i, name="m", mtype="gauge", ts_ns=1700000000000000000,
                attrs={}, res_attrs={}, is_int=True, vint=4,
                vdouble=None, count=None, sum=None, bounds=None,
                bucket_counts=None, quantiles=None)
    base.update(kw)
    return base


def _mets(spark, rows, **opts):
    df = spark.createDataFrame(
        [_met_row(i, **r) for i, r in enumerate(rows)], _MET_SCHEMA)
    return splunk_hec_metrics(df, id_cols=["i"], **opts)\
        .orderBy("i", "fields").collect()


def test_metric_sanitize_and_empty_value(spark):
    out = _mets(spark, [
        {"is_int": False, "vdouble": float("nan")},
        {"is_int": False, "vdouble": float("inf")},
        {"is_int": None},                      # EMPTY value type
        {"mtype": "sum", "is_int": True, "vint": -7},
        {"mtype": "exphist"},                  # dropped (:208-212)
    ])
    assert [r["fields"] for r in out] == [
        "metric_name:m=NaN,metric_type=Gauge",
        "metric_name:m=+Inf,metric_type=Gauge",
        "metric_type=Gauge",                   # value field absent
        "metric_name:m=-7,metric_type=Sum",
    ]
    assert all(r["event"] == "metric" for r in out)


def test_metric_histogram_and_summary_fan(spark):
    out = _mets(spark, [
        {"mtype": "histogram", "count": 6, "sum": 2.5,
         "bounds": [1.0], "bucket_counts": [2, 4]},
        {"mtype": "histogram", "count": 3, "sum": float("nan"),
         "bounds": [1.0], "bucket_counts": [9]},  # bad len + NaN sum
        {"mtype": "summary", "count": 5, "sum": 1.5,
         "quantiles": [dict(q=0.5, v=2.0)]},
    ])
    assert [r["fields"] for r in out if r["i"] == 0] == [
        "le=+Inf,metric_name:m_bucket=6,metric_type=Histogram",
        "le=1,metric_name:m_bucket=2,metric_type=Histogram",
        "metric_name:m_count=6,metric_type=Histogram",
        "metric_name:m_sum=2.5,metric_type=Histogram",
    ]
    assert [r["fields"] for r in out if r["i"] == 1] == [
        "metric_name:m_count=3,metric_type=Histogram",
    ]
    assert [r["fields"] for r in out if r["i"] == 2] == [
        "metric_name:m_0.5=2.0,metric_type=Summary,qt=0.5",
        "metric_name:m_count=5,metric_type=Summary",
        "metric_name:m_sum=1.5,metric_type=Summary",
    ]


_SPAN_SCHEMA = (
    "i int, trace_id string, span_id string, parent_span_id string, "
    "name string, kind int, start_ns bigint, end_ns bigint, "
    "status_code int, status_message string, "
    "attrs map<string,string>, res_attrs map<string,string>, "
    "events array<struct<ts_ns:bigint,name:string,"
    "attrs:map<string,string>>>, "
    "links array<struct<trace_id:string,span_id:string,"
    "trace_state:string,attrs:map<string,string>>>"
)


def _span_row(i, **kw):
    base = dict(i=i, trace_id="0" * 31 + "1", span_id="0" * 15 + "2",
                parent_span_id="", name="op", kind=2,
                start_ns=1700000000000000000,
                end_ns=1700000000005000000, status_code=0,
                status_message="", attrs={}, res_attrs={},
                events=None, links=None)
    base.update(kw)
    return base


def _spans(spark, rows, **opts):
    df = spark.createDataFrame(
        [_span_row(i, **r) for i, r in enumerate(rows)], _SPAN_SCHEMA)
    return splunk_hec_spans(df, id_cols=["i"], **opts)\
        .orderBy("i").collect()


def test_span_json_shape_and_escaping(spark):
    out = _spans(spark, [
        {"name": 'say "hi"\n', "kind": 9, "status_code": 2,
         "status_message": "boom", "attrs": {"b": "2", "a": "1"}},
        {"events": [dict(ts_ns=7, name="ev", attrs={"m": "1"})],
         "links": [dict(trace_id="lt", span_id="ls", trace_state="",
                        attrs={})]},
    ])
    ev = json.loads(out[0]["event"])
    assert ev["name"] == 'say "hi"\n'           # escaped JSON
    assert ev["kind"] == ""                      # out-of-range -> ""
    assert ev["status"] == {"message": "boom", "code":
                            "STATUS_CODE_ERROR"}
    assert ev["attributes"] == {"a": "1", "b": "2"}
    assert "events" not in ev and "links" not in ev   # omitempty
    # field order pins the Go struct declaration order
    assert out[0]["event"].startswith('{"trace_id":"')
    ev2 = json.loads(out[1]["event"])
    assert "attributes" not in ev2               # empty map omitted
    assert ev2["events"] == [
        {"attributes": {"m": "1"}, "name": "ev", "timestamp": 7}]
    assert ev2["links"] == [
        {"trace_id": "lt", "span_id": "ls", "trace_state": ""}]
    assert out[0]["time"] == 1700000000.0

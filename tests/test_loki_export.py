"""Loki export translator — golden cases pinned from the reference's
pkg/translator/loki/logs_to_loki_test.go (label sets, json/logfmt
lines, tenant precedence, level injection, default-label disabling,
invalid-format drop)."""
from __future__ import annotations

import pyspark.sql.functions as F

from opentelemetry_collector_contrib_spark.operators.loki_export import (
    logs_to_loki_entries,
    loki_push_report,
    loki_streams,
)

SCHEMA = ("event_id int, body string, severity_number int, "
          "severity_text string, trace_id string, span_id string, "
          "flags int, ts_ns long, attrs map<string,string>, "
          "res_attrs map<string,string>, scope_name string, "
          "scope_version string")


def _row(eid=1, body=None, sev=0, sev_text="", trace="", span="", flags=0,
         ts=1677592916000000000, attrs=None, res=None, scope="", ver=""):
    return (eid, body, sev, sev_text, trace, span, flags, ts,
            attrs or {}, res or {}, scope, ver)


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, SCHEMA)
    out = logs_to_loki_entries(df, id_cols=["event_id"], **kw)
    return {r["event_id"]: r.asDict() for r in out.collect()}


def test_attribute_to_label_and_regular_attribute(spark):
    # logs_to_loki_test.go "with attribute to label and regular attribute"
    out = _run(spark, [_row(
        trace="01000000000000000000000000000000",
        attrs={"host.name": "guarana", "http.status": "200",
               "loki.attribute.labels": "host.name"})])[1]
    assert out["labels"] == '{exporter="OTLP", host_name="guarana"}'
    assert out["line"] == ('{"traceid":"01000000000000000000000000000000",'
                           '"attributes":{"http.status":"200"}}')


def test_resource_to_label_and_regular_resource(spark):
    out = _run(spark, [_row(
        trace="02000000000000000000000000000000",
        res={"host.name": "guarana", "region.az": "eu-west-1a",
             "loki.resource.labels": "host.name"})])[1]
    assert out["labels"] == '{exporter="OTLP", host_name="guarana"}'
    assert out["line"] == ('{"traceid":"02000000000000000000000000000000",'
                           '"resources":{"region.az":"eu-west-1a"}}')


def test_logfmt_format(spark):
    out = _run(spark, [_row(
        trace="03000000000000000000000000000000",
        attrs={"host.name": "guarana", "http.status": "200",
               "loki.attribute.labels": "host.name",
               "loki.format": "logfmt"})])[1]
    assert out["labels"] == '{exporter="OTLP", host_name="guarana"}'
    assert out["line"] == ("traceID=03000000000000000000000000000000 "
                           "attribute_http.status=200")


def test_severity_to_level_label(spark):
    # SeverityNumberDebug4 == 8 -> DEBUG4; json line is "{}"
    out = _run(spark, [_row(sev=8)])[1]
    assert out["labels"] == '{exporter="OTLP", level="DEBUG4"}'
    assert out["line"] == "{}"


def test_level_label_disabled(spark):
    out = _run(spark, [_row(sev=8)],
               default_labels_enabled={"level": False})[1]
    assert out["labels"] == '{exporter="OTLP"}'


def test_existing_level_attribute_wins(spark):
    out = _run(spark, [_row(sev=8, attrs={"level": "dummy"})])[1]
    assert out["labels"] == '{exporter="OTLP", level="dummy"}'
    assert out["line"] == "{}"


def test_instrumentation_scope_json(spark):
    out = _run(spark, [_row(scope="otlp", ver="v1")])[1]
    assert out["line"] == ('{"instrumentation_scope":'
                           '{"name":"otlp","version":"v1"}}')


def test_unknown_format_drops(spark):
    out = _run(spark, [_row(attrs={"loki.format": "my-format"})])[1]
    assert out["dropped"] is True and out["line"] is None


def test_tenant_precedence(spark):
    # logs_to_loki_test.go: resource hint + resource value win over log
    rows = [
        _row(eid=1, attrs={"loki.tenant": "tenant.name",
                           "tenant.name": "1"}),
        _row(eid=2, res={"loki.tenant": "tenant.name",
                         "tenant.name": "2"}),
        _row(eid=3, attrs={"loki.tenant": "tenant.name", "tenant.name": "1"},
             res={"loki.tenant": "tenant.name", "tenant.name": "2"}),
        _row(eid=4, attrs={"loki.tenant": "tenant.name"}),
    ]
    out = _run(spark, rows)
    assert out[1]["tenant"] == "1"
    assert out[2]["tenant"] == "2"
    assert out[3]["tenant"] == "2"
    assert out[4]["tenant"] == ""


def test_default_labels_job_instance(spark):
    out = _run(spark, [_row(res={"service.name": "api",
                                 "service.namespace": "prod",
                                 "service.instance.id": "i-1"})])[1]
    assert out["labels"] == ('{exporter="OTLP", instance="i-1", '
                             'job="prod/api"}')
    out2 = _run(spark, [_row(res={"service.name": "api"})],
                default_labels_enabled={"exporter": False, "job": False})[1]
    assert out2["labels"] == "{}"


def test_logfmt_replace_or_append_and_quoting(spark):
    # body keyval 'traceID' is REPLACED, not duplicated (encode.go:203)
    out = _run(spark, [_row(
        body="traceID=old msg=hi", trace="ff00", sev_text="INFO", flags=1,
        attrs={"loki.format": "logfmt"})])[1]
    assert out["line"] == "traceID=ff00 msg=hi severity=INFO flags=1"
    # values with spaces get strconv.Quote treatment
    out2 = _run(spark, [_row(
        body="msg=ok", attrs={"loki.format": "logfmt", "k": "a b"})])[1]
    assert 'attribute_k="a b"' in out2["line"]


def test_raw_format_and_streams_report(spark):
    rows = [
        _row(eid=1, body="line-1", attrs={"loki.format": "raw"}),
        _row(eid=2, body="line-2", attrs={"loki.format": "raw"}),
        _row(eid=3, attrs={"loki.format": "nope"}),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    entries = logs_to_loki_entries(df, id_cols=["event_id"])
    got = {r["event_id"]: r for r in entries.collect()}
    assert got[1]["line"] == "line-1" and got[2]["line"] == "line-2"
    streams = loki_streams(entries).collect()
    assert len(streams) == 1 and streams[0]["n_entries"] == 2
    report = loki_push_report(entries).collect()[0]
    assert report["num_submitted"] == 2 and report["num_dropped"] == 1


def test_promoted_attrs_removed_from_both_sides(spark):
    # convert.go:141-149 — promoted raw keys pruned from attrs AND res
    out = _run(spark, [_row(
        attrs={"pod": "p-log", "loki.attribute.labels": "pod"},
        res={"pod": "p-res", "other": "x"})])[1]
    assert 'pod="p-log"' in out["labels"]
    assert '"attributes"' not in out["line"]
    assert out["line"].count('"resources":{"other":"x"}') == 1

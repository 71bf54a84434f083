"""Sentry export translator pins against
``exporter/sentryexporter/sentry_exporter.go`` (expectations mirror
``sentry_exporter_test.go`` shapes)."""
from __future__ import annotations

from opentelemetry_collector_contrib_spark.operators.sentry_export import (
    sentry_export_events)

SCHEMA = (
    "i int, trace_id string, span_id string, parent_span_id string,"
    "name string, kind int, start_ns bigint, end_ns bigint,"
    "status_code int, status_message string,"
    "attrs map<string,string>, res_attrs map<string,string>,"
    "scope_name string, scope_version string,"
    "events array<struct<ts_ns:bigint,name:string,"
    "attrs:map<string,string>>>")


def _row(i=1, **kw):
    base = dict(i=i, trace_id="t1", span_id=f"s{i}", parent_span_id="",
                name="op", kind=1, start_ns=10, end_ns=20,
                status_code=0, status_message="", attrs={},
                res_attrs={}, scope_name="lib", scope_version="1",
                events=None)
    base.update(kw)
    return base


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, SCHEMA)
    return sentry_export_events(df, id_cols=["i"], **kw).collect()


def test_transaction_grouping_and_orphans(spark):
    # s1 root; s2,s3 under s1; s4 (server) interior root; s5 under s4;
    # s6's chain dead-ends -> orphan; s7 under s6 -> orphan too
    rows = [
        _row(i=1),
        _row(i=2, parent_span_id="s1"),
        _row(i=3, parent_span_id="s2"),
        _row(i=4, parent_span_id="s3", kind=2),
        _row(i=5, parent_span_id="s4"),
        _row(i=6, parent_span_id="missing"),
        _row(i=7, parent_span_id="s6"),
    ]
    out = _run(spark, rows)
    tx = {r["span_id"]: r for r in out
          if r["event_kind"] == "transaction"}
    assert set(tx) == {"s1", "s4", "s6", "s7"}
    assert tx["s1"]["child_span_ids"] == ["s2", "s3"]
    assert tx["s4"]["child_span_ids"] == ["s5"]
    assert tx["s6"]["child_span_ids"] is None
    assert tx["s7"]["child_span_ids"] is None


def test_no_root_drops_everything(spark):
    # sentry_exporter.go:128-130 — no transactions => nothing sent,
    # exceptions included
    rows = [_row(i=1, parent_span_id="missing",
                 events=[dict(ts_ns=1, name="exception",
                              attrs={"exception.type": "T"})])]
    assert _run(spark, rows) == []


def test_op_description_ladder_and_status(spark):
    rows = [
        _row(i=1, kind=3, attrs={"http.method": "GET"}),
        _row(i=2, attrs={"db.system": "postgresql",
                         "db.statement": "SELECT 1"}),
        _row(i=3, attrs={"rpc.service": "X"}),
        _row(i=4, attrs={"messaging.system": "kafka"}),
        _row(i=5, attrs={"faas.trigger": "pubsub"}),
        _row(i=6, status_code=2, attrs={"http.status_code": "404"}),
        _row(i=7, status_code=2, attrs={"rpc.grpc.status_code": "14"}),
        _row(i=8, status_code=2),
        _row(i=9, status_code=5),
        _row(i=10, status_code=2, attrs={"http.status_code": "418"}),
    ]
    out = {r["i"]: r for r in _run(spark, rows)}
    assert (out[1]["op"], out[1]["description"]) == ("http.client",
                                                     "GET op")
    assert (out[2]["op"], out[2]["description"]) == ("db", "SELECT 1")
    assert out[3]["op"] == "rpc"
    assert out[4]["op"] == "message"
    assert out[5]["op"] == "pubsub"
    assert out[6]["status"] == "not_found"
    assert out[7]["status"] == "unavailable"
    assert out[8]["status"] == "unknown"
    # out-of-range code: unknown + synthetic status_message tag
    assert out[9]["status"] == "unknown"
    assert out[9]["tags"]["status_message"] == "error code 5"
    # unmapped http code falls to unknown
    assert out[10]["status"] == "unknown"


def test_tags_resource_wins_and_library(spark):
    rows = [_row(i=1, kind=2, status_code=2, status_message="bad",
                 attrs={"k": "span", "a": "1"},
                 res_attrs={"k": "res"},
                 scope_name="libx", scope_version="")]
    out = _run(spark, rows)[0]
    tags = out["tags"]
    assert tags["k"] == "res"
    assert tags["a"] == "1"
    assert tags["status_message"] == "bad"
    assert tags["span_kind"] == "SPAN_KIND_SERVER"
    assert tags["library_name"] == "libx"
    assert tags["library_version"] == ""


def test_exception_events(spark):
    rows = [
        _row(i=1, kind=2, attrs={"http.method": "GET"},
             events=[
                 dict(ts_ns=1, name="exception",
                      attrs={"exception.type": "T1",
                             "exception.message": "m1"}),
                 dict(ts_ns=2, name="exception", attrs={}),
                 dict(ts_ns=3, name="other",
                      attrs={"exception.type": "T2"}),
                 dict(ts_ns=4, name="exception",
                      attrs={"exception.type": "T3"}),
             ]),
    ]
    out = _run(spark, rows, environment="prod")
    errs = [r for r in out if r["event_kind"] == "error"]
    assert [(r["exc_type"], r["exc_message"]) for r in errs] == [
        ("T1", "m1"), ("T3", "")]
    # error events inherit the span's trace context + transaction
    assert errs[0]["description"] == "GET op"
    assert errs[0]["transaction"] == "GET op"
    assert errs[0]["environment"] is None
    tx = [r for r in out if r["event_kind"] == "transaction"][0]
    assert tx["environment"] == "prod"
    # uuid4-shaped deterministic ids
    assert tx["event_id"][12] == "4"
    assert tx["event_id"][16] in "89ab"
    assert len(tx["event_id"]) == 32

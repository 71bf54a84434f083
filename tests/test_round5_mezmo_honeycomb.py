"""Round-5: mezmo log lines + honeycomb markers, pinning
exporter/mezmoexporter/exporter.go and
exporter/honeycombmarkerexporter/logs_exporter.go semantics.
"""
from __future__ import annotations

from opentelemetry_collector_contrib_spark.operators.mezmo_honeycomb_export import (
    Marker,
    honeycomb_markers,
    mezmo_log_lines,
)

_LOG_SCHEMA = (
    "i int, body string, ts_ns bigint, trace_id string, "
    "span_id string, severity_text string, "
    "attrs map<string,string>, res_attrs map<string,string>"
)


def _mezmo(spark, rows):
    full = [dict(i=i, body="b", ts_ns=1700000000123456789,
                 trace_id="", span_id="", severity_text="",
                 attrs={}, res_attrs={}) | r
            for i, r in enumerate(rows)]
    df = spark.createDataFrame(full, _LOG_SCHEMA)
    return mezmo_log_lines(df, id_cols=["i"]).orderBy("i").collect()


def test_mezmo_meta_levels_and_zero_ts(spark):
    out = _mezmo(spark, [
        {"trace_id": "ab" * 16, "span_id": "cd" * 8,
         "severity_text": "x" * 100,
         "attrs": {"appname": "ap", "hostname": "la"},
         "res_attrs": {"host.name": "rh"}},
        {"ts_ns": 0},    # reference uses time.Now(); NULL here
    ])
    assert out[0]["ts_ms"] == 1700000000123
    assert out[0]["level"] == "x" * 80          # truncated to 80
    assert out[0]["app"] == "ap"
    # log-attr hostname overrides the resource host.name (Go map
    # last-write); appname also lands in meta
    assert out[0]["meta"] == (
        f"appname=ap,hostname=la,span.id={'cd' * 8},"
        f"trace.id={'ab' * 16}")
    assert out[1]["ts_ms"] is None
    assert out[1]["level"] == "info"
    assert out[1]["meta"] == ""


def test_honeycomb_marker_rules_and_payload(spark):
    df = spark.createDataFrame(
        [(0, 17, {"msg": "hi", "link": "u"}),
         (1, 5, {"kind": "deploy"}),
         (2, 17, {})],
        "i int, severity_number bigint, "
        "attributes map<string,string>")
    out = honeycomb_markers(df, id_cols=["i"], markers=[
        Marker(type="err",
               log_conditions=["severity_number >= "
                               "SEVERITY_NUMBER_WARN"],
               message_key="msg", url_key="link"),
        Marker(type="dep",
               log_conditions=['attributes["kind"] == "deploy"']),
    ]).orderBy("i", "marker_type").collect()
    assert [(r["i"], r["marker_type"], r["payload"],
             r["dataset_slug"]) for r in out] == [
        (0, "err", '{"message":"hi","type":"err","url":"u"}',
         "__all__"),
        (1, "dep", '{"type":"dep"}', "__all__"),
        (2, "err", '{"type":"err"}', "__all__"),
    ]

"""Round-5: objmodel document encoding, pinning
exporter/opensearchexporter/{encoder.go,internal/objmodel} semantics.
"""
from __future__ import annotations

import json

from opentelemetry_collector_contrib_spark.operators.opensearch_export import (
    opensearch_log_documents,
)

_SCHEMA = (
    "i int, body string, ts_ns bigint, trace_id string, "
    "span_id string, severity_number int, severity_text string, "
    "flags bigint, attrs map<string,string>, "
    "res_attrs map<string,string>"
)


def _docs(spark, rows, **opts):
    full = [dict(i=i, body="b", ts_ns=1700000000123456789,
                 trace_id="", span_id="", severity_number=5,
                 severity_text="", flags=0, attrs={}, res_attrs={})
            | r for i, r in enumerate(rows)]
    df = spark.createDataFrame(full, _SCHEMA)
    return [r["document"] for r in
            opensearch_log_documents(df, id_cols=["i"], **opts)
            .orderBy("i").collect()]


def test_dedot_nesting_and_value_rename(spark):
    got = _docs(spark, [
        {"attrs": {"a.b.c": "1", "a.b.d": "2", "a.x": "3",
                   "top": "4", "a.b": "prim"}},
    ])
    doc = json.loads(got[0])
    # a.b primitive conflicts with a.b.* -> renamed a.b.value
    assert doc["Attributes"]["a"]["b"] == {
        "c": "1", "d": "2", "value": "prim"}
    assert doc["Attributes"]["a"]["x"] == "3"
    assert doc["Attributes"]["top"] == "4"
    assert doc["@timestamp"] == "2023-11-14T22:13:20.123456789Z"
    assert doc["SeverityNumber"] == 5 and doc["TraceFlags"] == 0
    assert "SeverityText" not in doc and "TraceId" not in doc
    # documents keys are sorted (Dedup ensures sort)
    keys = list(doc.keys())
    assert keys == sorted(keys)


def test_last_wins_dedup_and_empty_skips(spark):
    got = _docs(spark, [
        {"attrs": {"k": "record"}, "res_attrs": {"k": "resource"},
         "body": None, "trace_id": "ab" * 16,
         "severity_text": "INFO"},
    ])
    doc = json.loads(got[0])
    assert doc["Attributes"]["k"] == "record"   # later write wins
    assert "Body" not in doc                    # EMPTY body skipped
    assert doc["TraceId"] == "ab" * 16
    assert doc["SeverityText"] == "INFO"


def test_flat_unix_mode_preserves_insertion_order(spark):
    got = _docs(spark, [
        {"attrs": {"z.y": "1"}, "res_attrs": {"r": "2"}},
    ], flatten_attributes=True, dedup=False, dedot=False,
        unix_time=True, timestamp_field="ts")
    doc = got[0]
    # insertion order: resource attrs, ts, ..., Body, record attrs
    assert doc == ('{"r":"2","ts":1700000000123,"TraceFlags":0,'
                   '"SeverityNumber":5,"Body":"b","z.y":"1"}')

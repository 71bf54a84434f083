"""Round-5: span events → Alertmanager alerts, pinning
exporter/alertmanagerexporter/alertmanager_exporter.go semantics.
"""
from __future__ import annotations

from opentelemetry_collector_contrib_spark.operators.alertmanager_export import (
    alertmanager_alerts,
)

_SCHEMA = (
    "i int, trace_id string, span_id string, "
    "events array<struct<ts_ns:bigint,name:string,"
    "attrs:map<string,string>>>"
)


def _alerts(spark, rows, **opts):
    full = [dict(i=i, trace_id="ab" * 16, span_id="cd" * 8,
                 events=None) | r for i, r in enumerate(rows)]
    df = spark.createDataFrame(full, _SCHEMA)
    opts.setdefault("event_labels", ["attr1"])
    return alertmanager_alerts(df, id_cols=["i"], **opts)\
        .orderBy("i", "starts_at_ns").collect()


def test_severity_whitelist_annotations(spark):
    out = _alerts(spark, [
        {"events": [
            dict(ts_ns=5, name="boom",
                 attrs={"severity": "page", "attr1": "x", "o": "1"}),
            dict(ts_ns=6, name="calm", attrs={}),
        ]},
        {"events": None},     # no events -> no alerts (:46-68)
    ])
    assert len(out) == 2
    assert out[0]["labels"] == "attr1=x,event_name=boom,severity=page"
    assert out[0]["annotations"] == (
        f"SpanID={'cd' * 8},TraceID={'ab' * 16},"
        "attr1=x,o=1,severity=page")
    assert out[1]["labels"] == "event_name=calm,severity=info"
    assert out[1]["annotations"] == \
        f"SpanID={'cd' * 8},TraceID={'ab' * 16}"
    assert out[0]["generator_url"] == "opentelemetry-collector"


def test_empty_whitelist_and_custom_severity(spark):
    out = _alerts(spark, [
        {"events": [dict(ts_ns=5, name="n",
                         attrs={"sev": "warn", "attr1": "x"})]},
    ], event_labels=[], severity_attribute="sev",
        default_severity="low", generator_url="gen")
    assert out[0]["labels"] == "event_name=n,severity=warn"
    assert out[0]["generator_url"] == "gen"

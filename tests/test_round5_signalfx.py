"""Round-5: SignalFx v2 datapoint/event translation, pinning
pkg/translator/signalfx/to_metrics.go and
receiver/signalfxreceiver/signalfxv2_event_to_logdata.go semantics.
"""
from __future__ import annotations

import json

from opentelemetry_collector_contrib_spark.operators.signalfx import (
    signalfx_datapoints_parse,
    signalfx_events_parse,
)


def _dp(spark, msg):
    df = spark.createDataFrame([(json.dumps(msg),)], "body string")
    return sorted(
        signalfx_datapoints_parse(df).collect(), key=lambda r: r["sfx_metric"]
    )


def test_datapoint_types_and_values(spark):
    rows = _dp(spark, {"datapoints": [
        {"metric": "a_ctr", "timestamp": 123, "value": {"intValue": 5},
         "metricType": "COUNTER",
         "dimensions": [{"key": "host", "value": "h1"}, None]},
        {"metric": "b_gauge", "value": {"doubleValue": 1.5}},
        {"metric": "c_cum", "value": {"intValue": 2, "doubleValue": 9.9},
         "metricType": "CUMULATIVE_COUNTER"},
        {"metric": "d_nil", "value": {}},
        {"metric": "e_enum", "value": {"intValue": 1}, "metricType": "ENUM"},
        None,
    ]})
    a, b, c, d, e = rows
    assert (a["sfx_kind"], a["sfx_int_value"], a["sfx_ts_ns"]) == (
        "sum_delta", 5, 123000000)
    assert a["sfx_attrs"] == "host=h1"  # nil dimension skipped
    assert (b["sfx_kind"], b["sfx_double_value"]) == ("gauge", 1.5)
    # intValue wins when both set
    assert (c["sfx_kind"], c["sfx_int_value"], c["sfx_double_value"]) == (
        "sum_cumulative", 2, None)
    assert d["sfx_ok"] is False          # nil datum value → error
    assert (e["sfx_kind"], e["sfx_ok"]) == ("error", False)  # ENUM


def test_event_translation(spark):
    msg = {"events": [
        {"eventType": "deploy", "timestamp": 200, "category": 1000000,
         "dimensions": [{"key": "env", "value": "prod"}],
         "properties": [
             {"key": "s", "value": {"strValue": 'x"y'}},
             {"key": "i", "value": {"intValue": -3}},
             {"key": "d", "value": {"doubleValue": 2.5}},
             {"key": "b", "value": {"boolValue": False}},
             {"key": "n", "value": {}},
         ]},
        {"dimensions": [{"key": "a", "value": "1"}]},
    ]}
    df = spark.createDataFrame([(json.dumps(msg),)], "body string")
    r1, r2 = sorted(
        signalfx_events_parse(df).collect(), key=lambda r: -r["sfe_ts_ns"]
    )
    assert r1["sfe_ts_ns"] == 200000000
    assert r1["sfe_attrs"] == (
        "com.splunk.signalfx.event_category=1000000,"
        'com.splunk.signalfx.event_properties={"b":false,"d":2.5,"i":-3,'
        '"n":null,"s":"x\\"y"},'
        "com.splunk.signalfx.event_type=deploy,env=prod"
    )
    # missing eventType → "unknown"; missing category → empty marker
    assert r2["sfe_attrs"] == (
        "a=1,com.splunk.signalfx.event_category=,"
        "com.splunk.signalfx.event_type=unknown"
    )
    assert r2["sfe_category"] is None

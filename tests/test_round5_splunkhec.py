"""Round-5: splunk_hec receiver — event-JSON → log records and metric
datapoints. Semantics from receiver/splunkhecreceiver/
splunk_to_logdata.go, splunkhec_to_metricdata.go, internal/splunk/
common.go, pinned here with cases from their test files.
"""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.operators.receivers import (
    splunkhec_metrics,
    splunkhec_parse,
)


def _logs(spark, lines):
    df = spark.createDataFrame([(ln,) for ln in lines], "body string")
    return [
        (
            r["sh_ok"], r["sh_resource_attrs"], r["sh_ts_ns"], r["sh_body"],
            r["sh_attrs"], r["sh_is_metric"],
        )
        for r in splunkhec_parse(df).collect()
    ]


def test_hec_log_events(spark):
    got = _logs(
        spark,
        [
            # splunk_to_logdata_test.go "happy path"
            '{"time":1610760752.606,"host":"localhost","source":"mysource",'
            '"sourcetype":"mysourcetype","index":"myindex",'
            '"event":"value","fields":{"foo":"bar"}}',
            # object body -> sorted-key compact JSON (pcommon sorts)
            '{"time":5,"event":{"no":"number","float":0.675},'
            '"fields":{"foo":"bar"}}',
            # missing event -> rejected (receiver.go eventRequired)
            '{"time":5,"fields":{"foo":"bar"}}',
            # null event -> rejected
            '{"event":null}',
            # non-flat field -> rejected (receiver.go:542-555)
            '{"event":"e","fields":{"nested":{"a":1}}}',
            # array-of-scalars field is flat; array with object is not
            '{"event":"e","fields":{"arr":[1,"q"]}}',
            '{"event":"e","fields":{"arr":[1,{"z":1}]}}',
            # bad string time -> unmarshal error (common.go ParseFloat)
            '{"time":"badtime","event":"e"}',
            # numeric-string time is legal
            '{"time":"1610760752.606","event":"e"}',
            # non-string host -> json.Unmarshal type error
            '{"host":5,"event":"e"}',
            # not json at all
            'garbage',
        ],
    )
    ns = int(1610760752.606 * 1e9)
    assert got[0][0] is True
    assert got[0][1] == (
        "host.name=localhost,com.splunk.source=mysource,"
        "com.splunk.sourcetype=mysourcetype,com.splunk.index=myindex"
    )
    assert abs(got[0][2] - ns) <= 256  # float64 epoch precision
    assert got[0][3] == "value" and got[0][4] == "foo=bar"
    assert got[1][0] is True
    assert got[1][3] == '{"float":0.675,"no":"number"}'
    assert got[2][0] is False
    assert got[3][0] is False
    assert got[4][0] is False
    assert got[5][0] is True and got[5][4] == 'arr=[1,"q"]'
    assert got[6][0] is False
    assert got[7][0] is False
    assert got[8][0] is True and abs(got[8][2] - ns) <= 256
    assert got[9][0] is False
    assert got[10][0] is False


def test_hec_timestamp_units(spark):
    # splunkhec_to_metricdata.go:137-152 magnitude heuristic
    got = _logs(
        spark,
        [
            '{"time":1614470905,"event":"e"}',
            '{"time":1614470905123,"event":"e"}',
            '{"time":1614470905123456,"event":"e"}',
            '{"time":1614470905123456789,"event":"e"}',
        ],
    )
    # the reference computes Timestamp(t * 1eN) in float64 — replay
    # the same IEEE arithmetic, not idealized integer math
    assert got[0][2] == int(1614470905 * 1e9)
    assert got[1][2] == int(1614470905123 * 1e6)
    assert got[2][2] == int(1614470905123456 * 1e3)
    assert got[3][2] == int(float(1614470905123456789))


def test_hec_metric_detection_and_values(spark):
    lines = [
        # explicit metric_name/_value pair (common.go:87-89)
        '{"event":"metric","fields":{"metric_name":"mem","_value":3.5,'
        '"dim":"d1"}}',
        # metric_name:<name> fields (common.go:91-97)
        '{"event":"anything","fields":{"metric_name:cpu.idle":42,'
        '"metric_name:cpu.user":"7.5","k0":"v0"}}',
        # string value that does not parse -> dropped datapoint
        '{"event":"metric","fields":{"metric_name":"bad","_value":"xyz"}}',
    ]
    df = spark.createDataFrame([(ln,) for ln in lines], "body string")
    parsed = splunkhec_parse(df)
    flags = [r["sh_is_metric"] for r in parsed.collect()]
    assert flags == [True, True, True]

    rows = splunkhec_metrics(df).orderBy("shm_name").collect()
    got = [
        (r["shm_name"], r["shm_value"], r["shm_dropped"], r["shm_attrs"])
        for r in rows
    ]
    assert got == [
        ("bad", None, True, ""),
        ("cpu.idle", 42.0, False, "k0=v0"),
        ("cpu.user", 7.5, False, "k0=v0"),
        ("mem", 3.5, False, "dim=d1"),
    ]

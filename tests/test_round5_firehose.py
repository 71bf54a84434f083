"""Round-5: awsfirehose record formats — cwlogs subscription records
and CloudWatch metric-stream JSON
(receiver/awsfirehosereceiver/internal/unmarshaler/).
"""
from __future__ import annotations

import pytest

from opentelemetry_collector_contrib_spark.operators.receivers import (
    cwlogs_parse,
    cwmetrics_parse,
)


def test_cwlogs_data_message(spark):
    df = spark.createDataFrame(
        [(
            '{"messageType":"DATA_MESSAGE","owner":"111122223333",'
            '"logGroup":"g1","logStream":"s1","subscriptionFilters":["f"],'
            '"logEvents":[{"id":"1","timestamp":1677821345001,'
            '"message":"hello"},{"id":"2","timestamp":1677821345002,'
            '"message":"world"}]}',
        )],
        "body string",
    )
    rows = cwlogs_parse(df).collect()
    assert len(rows) == 2
    assert rows[0]["cl_ok"] is True
    assert rows[0]["cl_ts_ns"] == 1677821345001 * 10**6
    assert [r["cl_body"] for r in rows] == ["hello", "world"]
    assert rows[0]["cl_resource_attrs"] == (
        "cloud.provider=aws,cloud.account.id=111122223333,"
        'aws.log.group.names=["g1"],aws.log.stream.names=["s1"],'
        "aws.cloudwatch.log_group_name=g1,aws.cloudwatch.log_stream_name=s1"
    )


def test_cwlogs_control_and_invalid(spark):
    df = spark.createDataFrame(
        [
            # control messages produce no rows (unmarshaler.go:87-96)
            ('{"messageType":"CONTROL_MESSAGE","logEvents":'
             '[{"id":"1","timestamp":1,"message":"CWL CONTROL MESSAGE"}]}',),
            # missing owner -> invalid (no rows, the record errors)
            ('{"messageType":"DATA_MESSAGE","logGroup":"g","logStream":"s",'
             '"logEvents":[{"id":"1","timestamp":1,"message":"m"}]}',),
            ('{"messageType":"OTHER"}',),
        ],
        "body string",
    )
    assert cwlogs_parse(df).collect() == []


def test_cwmetrics_basic(spark):
    df = spark.createDataFrame(
        [(
            '{"metric_stream_name":"ms1","account_id":"1234",'
            '"region":"us-east-1","namespace":"AWS/EC2",'
            '"metric_name":"CPUUtilization",'
            '"dimensions":{"InstanceId":"i-01","k":"v"},'
            '"timestamp":1611929698000,'
            '"value":{"max":5.0,"min":1.0,"sum":12.5,"count":4.0,'
            '"p95":4.5,"p99.9":4.9,"note":"x"},"unit":"Percent"}',
        )],
        "body string",
    )
    r = cwmetrics_parse(df).collect()[0]
    assert r["cm_ok"] is True
    assert r["cm_name"] == "CPUUtilization" and r["cm_unit"] == "Percent"
    assert r["cm_ts_ns"] == 1611929698000 * 10**6
    assert (r["cm_count"], r["cm_sum"]) == (4, 12.5)
    # 99.9/100 is not exact in float64 (same in the reference's
    # quantile field): the canonical text shows the true double
    assert r["cm_quantiles"] == f"0.0:1.0,0.95:4.5,{99.9/100}:4.9,1.0:5.0"
    assert r["cm_attrs"] == "k=v,service.instance.id=i-01"
    assert r["cm_resource_attrs"] == (
        "cloud.provider=aws,cloud.account.id=1234,cloud.region=us-east-1,"
        "service.namespace=AWS,service.name=EC2,"
        "aws.cloudwatch.metric_stream_name=ms1"
    )


def test_cwmetrics_validity_and_namespace(spark):
    df = spark.createDataFrame(
        [
            # custom namespace (no AWS/ prefix): name only
            ('{"metric_stream_name":"m","account_id":"1","region":"r",'
             '"namespace":"Custom","metric_name":"n","timestamp":1,'
             '"value":{},"unit":"u"}',),
            # missing unit -> invalid (isValid :167-170)
            ('{"metric_stream_name":"m","account_id":"1","region":"r",'
             '"namespace":"ns","metric_name":"n","timestamp":1,'
             '"value":{"sum":1}}',),
            # value not an object -> isSet false -> invalid
            ('{"metric_stream_name":"m","account_id":"1","region":"r",'
             '"namespace":"ns","metric_name":"n","timestamp":1,'
             '"value":5,"unit":"u"}',),
        ],
        "body string",
    )
    rows = cwmetrics_parse(df).collect()
    # empty value object is valid with zeroed stats (cwmetric.go:58-90)
    assert rows[0]["cm_ok"] is True
    assert rows[0]["cm_quantiles"] == "0.0:0.0,1.0:0.0"
    assert "service.namespace" not in rows[0]["cm_resource_attrs"]
    assert rows[1]["cm_ok"] is False
    assert rows[2]["cm_ok"] is False

"""Round-5: azure resource-logs common schema
(pkg/translator/azure/resourcelogs_to_logs.go).
"""
from __future__ import annotations

import pytest

from opentelemetry_collector_contrib_spark.operators.receivers import (
    azure_resource_logs_parse,
)


def _parse(spark, lines):
    df = spark.createDataFrame([(ln,) for ln in lines], "body string")
    return azure_resource_logs_parse(df).collect()


def test_azure_basic(spark):
    rows = _parse(
        spark,
        ['{"records":[{"time":"2022-11-11T04:48:27.6767145Z",'
         '"resourceId":"/SUB/1/RG/r",'
         '"operationName":"SecretGet","category":"AuditEvent",'
         '"resultType":"Success","durationMs":"12",'
         '"callerIpAddress":"10.0.0.1","correlationId":"c-1",'
         '"identity":{"claim":{"appid":"x"}},'
         '"properties":{"id":"https://k.io","b":2},'
         '"Level":"Informational","location":"eastus"}]}'],
    )
    r = rows[0]
    assert r["az_ok"] is True and r["az_ts_ok"] is True
    assert r["az_resource_id"] == "/SUB/1/RG/r"
    # 2022-11-11T04:48:27.6767145Z -> micros precision (Spark keeps µs)
    assert r["az_ts_ns"] == 1668142107676714 * 1000
    assert (r["az_sev_num"], r["az_sev_text"]) == (9, "Informational")
    assert r["az_attrs"] == (
        "azure.category=AuditEvent,azure.correlation.id=c-1,"
        "azure.duration=12,"
        'azure.identity={"claim":{"appid":"x"}},'
        "azure.operation.name=SecretGet,"
        'azure.properties={"b":2,"id":"https://k.io"},'
        "azure.result.type=Success,cloud.provider=azure,"
        "cloud.region=eastus,net.sock.peer.addr=10.0.0.1"
    )


def test_azure_level_and_ts_variants(spark):
    rows = _parse(
        spark,
        [
            # numeric Level passes through; timeStamp fallback field
            '{"records":[{"timeStamp":"2022-11-11T04:48:27Z","resourceId":"r",'
            '"operationName":"op","category":"c","Level":4},'
            # bad timestamp -> record dropped (continue, :111-115)
            '{"time":"garbage","resourceId":"r","operationName":"op",'
            '"category":"c"},'
            # duration that does not ParseInt is skipped ("12.5")
            '{"time":"2022-11-11T04:48:27Z","resourceId":"r2",'
            '"operationName":"op","category":"c","durationMs":"12.5"}]}',
        ],
    )
    assert len(rows) == 3
    assert (rows[0]["az_sev_num"], rows[0]["az_sev_text"]) == (4, "4")
    assert rows[1]["az_ts_ok"] is False and rows[1]["az_attrs"] == ""
    assert rows[2]["az_ts_ok"] is True
    assert "azure.duration" not in rows[2]["az_attrs"]

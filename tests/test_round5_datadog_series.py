"""Round-5: datadog /api/v1/series JSON
(receiver/datadogreceiver/internal/translator/series.go + tags.go).
"""
from __future__ import annotations

import pytest

from opentelemetry_collector_contrib_spark.operators.receivers import (
    datadog_series_v1_parse,
)


def _parse(spark, lines):
    df = spark.createDataFrame([(ln,) for ln in lines], "body string")
    return datadog_series_v1_parse(df).collect()


def test_dd_series_basic(spark):
    rows = _parse(
        spark,
        ['{"series":[{"metric":"sys.cpu","type":"gauge","host":"h1",'
         '"tags":["env:prod","service:api","os:linux","bare",'
         '"image_tag:v1","HTTP.Request.Headers.Accept:json"],'
         '"points":[[1700000000,0.5],[1700000001,0.75]]}]}'],
    )
    assert len(rows) == 2
    r = rows[0]
    assert (r["dd_name"], r["dd_kind"]) == ("sys.cpu", "gauge")
    assert r["dd_ts_ns"] == 1700000000 * 10**9
    assert r["dd_value"] == 0.5
    # env/service/image_tag route to the resource; header tags become
    # resource slices via the lowercased translation; os/bare stay on
    # the datapoint
    assert r["dd_resource_attrs"] == (
        'container.image.tags=["v1"],deployment.environment.name=prod,'
        'host.name=h1,http.request.header.accept=["json"],'
        "service.name=api"
    )
    assert r["dd_dp_attrs"] == "os=linux,unnamed_bare=bare"
    assert rows[1]["dd_value"] == 0.75


def test_dd_series_rate_and_count(spark):
    rows = _parse(
        spark,
        [
            '{"series":[{"metric":"m","type":"rate","interval":10,'
            '"points":[[1,2.0]]}]}',
            '{"series":[{"metric":"m","type":"rate",'
            '"points":[[1,2.0]]}]}',
            '{"series":[{"metric":"m","type":"count",'
            '"points":[[1,7.0]]}]}',
            # unknown type -> series skipped (:76-78)
            '{"series":[{"metric":"m","type":"distribution",'
            '"points":[[1,7.0]]}]}',
            # malformed point (1 element) -> point skipped (:95-97)
            '{"series":[{"metric":"m","type":"gauge",'
            '"points":[[1],[2,3.0]]}]}',
        ],
    )
    assert (rows[0]["dd_kind"], rows[0]["dd_value"]) == ("sum_delta", 20.0)
    assert rows[1]["dd_value"] == 2.0
    assert (rows[2]["dd_kind"], rows[2]["dd_value"]) == ("sum_delta", 7.0)
    # distribution skipped; only the well-formed gauge point survives
    assert len(rows) == 4
    assert rows[3]["dd_value"] == 3.0

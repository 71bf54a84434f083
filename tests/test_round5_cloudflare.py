"""Round-5: cloudflare Logpush receiver — NDJSON records → log rows
(receiver/cloudflarereceiver/logs.go:210-419).
"""
from __future__ import annotations

import pytest

from opentelemetry_collector_contrib_spark.operators.receivers import (
    cloudflare_logs_parse,
)


def _parse(spark, lines, **kw):
    df = spark.createDataFrame([(ln,) for ln in lines], "body string")
    return cloudflare_logs_parse(df, **kw).collect()


def test_cloudflare_basic(spark):
    rows = _parse(
        spark,
        ['{"ClientIP":"89.163.253.200","EdgeResponseStatus":200,'
         '"EdgeStartTimestamp":"2023-03-03T05:29:05Z",'
         '"ZoneName":"example.com","EdgeResponseBytes":69045}'],
    )
    r = rows[0]
    assert r["cf_ok"] is True and r["cf_emptied"] is False
    assert r["cf_zone"] == "example.com"
    assert r["cf_ts_ns"] == 1677821345 * 10**9
    assert (r["cf_sev_num"], r["cf_sev_text"]) == (9, "Info")
    # every field (incl. ZoneName and the ts field) becomes an attr
    assert r["cf_attrs"] == (
        "ClientIP=89.163.253.200,EdgeResponseBytes=69045,"
        "EdgeResponseStatus=200,"
        "EdgeStartTimestamp=2023-03-03T05:29:05Z,ZoneName=example.com"
    )


def test_cloudflare_severity_bands(spark):
    rows = _parse(
        spark,
        [
            '{"EdgeResponseStatus":301,"EdgeStartTimestamp":"2023-03-03T05:29:05Z"}',
            '{"EdgeResponseStatus":404,"EdgeStartTimestamp":"2023-03-03T05:29:05Z"}',
            '{"EdgeResponseStatus":"503","EdgeStartTimestamp":"2023-03-03T05:29:05Z"}',
            '{"EdgeResponseStatus":700,"EdgeStartTimestamp":"2023-03-03T05:29:05Z"}',
            '{"EdgeStartTimestamp":"2023-03-03T05:29:05Z"}',
        ],
    )
    got = [(r["cf_sev_num"], r["cf_sev_text"]) for r in rows]
    assert got == [
        (10, "Info2"), (13, "Warn"), (17, "Error"), (None, None),
        (None, None),
    ]


def test_cloudflare_timestamp_formats(spark):
    unix = _parse(
        spark,
        ['{"ts":1677821345,"x":"y"}', '{"ts":"1677821345","x":"y"}',
         '{"ts":"12.5","x":"y"}'],
        timestamp_field="ts", timestamp_format="unix",
    )
    assert unix[0]["cf_ts_ns"] == unix[1]["cf_ts_ns"] == 1677821345 * 10**9
    # bad string: the reference `continue`s AFTER appending — the
    # record survives with nothing set (logs.go:271-276)
    assert unix[2]["cf_emptied"] is True and unix[2]["cf_attrs"] == ""

    nano = _parse(
        spark, ['{"ts":1677821345000000001,"x":"y"}',
                '{"ts":"1677821345000000001","x":"y"}'],
        timestamp_field="ts", timestamp_format="unixnano",
    )
    # a JSON number decodes via float64 in the reference too (the
    # int cases in the Go switch are unreachable) — same rounding
    assert nano[0]["cf_ts_ns"] == int(float(1677821345000000001))
    # a STRING goes through ParseInt and keeps full precision
    assert nano[1]["cf_ts_ns"] == 1677821345 * 10**9 + 1

    # absent ts field only warns; the rest still processes (:306-308)
    absent = _parse(spark, ['{"x":"y"}'])
    assert absent[0]["cf_ts_ns"] is None
    assert absent[0]["cf_emptied"] is False
    assert absent[0]["cf_attrs"] == "x=y"


def test_cloudflare_flatten_and_mapping(spark):
    rows = _parse(
        spark,
        ['{"EdgeStartTimestamp":"2023-03-03T05:29:05Z",'
         '"RequestHeaders":{"host":"a.com","meta":{"x":1}},'
         '"arr":[1,2],"ok":true,"ratio":0.5}'],
    )
    # arrays unsupported -> skipped; objects flatten with '.'
    assert rows[0]["cf_attrs"] == (
        "EdgeStartTimestamp=2023-03-03T05:29:05Z,"
        "RequestHeaders.host=a.com,RequestHeaders.meta.x=1,"
        "ok=true,ratio=0.5"
    )

    mapped = _parse(
        spark,
        ['{"EdgeStartTimestamp":"2023-03-03T05:29:05Z",'
         '"ClientIP":"1.2.3.4","Other":"skip"}'],
        attributes={"ClientIP": "http_request.client_ip"},
    )
    # with a mapping, only mapped fields survive, renamed (:342-351)
    assert mapped[0]["cf_attrs"] == "http_request.client_ip=1.2.3.4"

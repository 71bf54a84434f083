"""failover sink, geoip IP-block enrich, UserAgent converter."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.functions.ottl import UserAgent
from opentelemetry_collector_contrib_spark.operators.enrich import (
    geoip_enrich,
    ip_to_long,
)
from opentelemetry_collector_contrib_spark.runtime.sinks import failover_write


def test_failover_write_falls_through(spark, tmp_path):
    df = spark.createDataFrame([(1, "a")], "id long, v string")
    bad = "/proc/definitely/not/writable/x"
    good = str(tmp_path / "ok")
    assert failover_write(df, [bad, good]) == good
    assert spark.read.parquet(good).count() == 1
    with pytest.raises(RuntimeError, match="failover sinks failed"):
        failover_write(df, [bad, bad + "2"])


def test_ip_to_long_and_geoip(spark):
    df = spark.createDataFrame(
        [(1, "10.0.0.1"), (2, "192.168.1.300"), (3, "not-an-ip"), (4, "8.8.8.8")],
        "id long, client_ip string",
    )
    longs = {r["id"]: r["v"] for r in df.select("id", ip_to_long(F.col("client_ip")).alias("v")).collect()}
    assert longs[1] == 10 * 16777216 + 1
    assert longs[2] is None and longs[3] is None
    assert longs[4] == 8 * 16777216 + 8 * 65536 + 8 * 256 + 8

    blocks = spark.createDataFrame(
        [(10 * 16777216, 11 * 16777216 - 1, "private-10"),
         (8 * 16777216, 9 * 16777216 - 1, "google-ish")],
        "ip_lo long, ip_hi long, block string",
    )
    out = {r["id"]: r["block"] for r in geoip_enrich(df, blocks).collect()}
    assert out[1] == "private-10" and out[4] == "google-ish"
    assert out[3] is None


def test_user_agent_families(spark):
    uas = [
        (1, "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36"),
        (2, "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/17.1 Safari/605.1.15"),
        (3, "Mozilla/5.0 (X11; Linux x86_64; rv:109.0) Gecko/20100101 Firefox/115.0"),
        (4, "curl/8.4.0"),
        (5, "weird-bot"),
    ]
    df = spark.createDataFrame(uas, "id long, ua string")
    got = {r["id"]: r["m"] for r in df.select("id", UserAgent(F.col("ua")).alias("m")).collect()}
    assert got[1]["user_agent.name"] == "Chrome" and got[1]["user_agent.version"].startswith("120")
    assert got[1]["os.name"] == "Windows"
    assert got[2]["user_agent.name"] == "Safari" and got[2]["os.name"] == "macOS"
    assert got[3]["user_agent.name"] == "Firefox" and got[3]["os.name"] == "Linux"
    assert got[4]["user_agent.name"] == "curl" and got[4]["user_agent.version"] == "8.4.0"
    assert got[5]["user_agent.name"] == "Other"

"""apache + nginx status-page receivers pinned against reference semantics."""
from __future__ import annotations

import pytest

from opentelemetry_collector_contrib_spark.operators.receivers import (
    apache_status,
    nginx_stub_status,
)

APACHE_PAGE = """localhost
ServerVersion: Apache/2.4.56
ServerUptimeSeconds: 410
Total Accesses: 14169
Total kBytes: 20910
Total Duration: 1006
CPUUser: 0.5
CPUSystem: 0.25
CPUChildrenUser: 0
CPUChildrenSystem: 0
CPULoad: .183
Load1: 0.11
Load5: 0.12
Load15: 0.15
BusyWorkers: 13
IdleWorkers: 237
ConnsTotal: 110
Scoreboard: S_RRW..KKZ
line without separator
"""

NGINX_PAGE = (
    "Active connections: 291 \n"
    "server accepts handled requests\n"
    " 16630948 16630947 31070465 \n"
    "Reading: 6 Writing: 179 Waiting: 106 \n"
)


@pytest.fixture(scope="module")
def spark():
    from opentelemetry_collector_contrib_spark.session import get_spark

    return get_spark()


def test_apache_status(spark):
    df = spark.createDataFrame([(1, APACHE_PAGE)], ["id", "body"])
    rows = apache_status(df, server_name="web", port="8080").collect()
    by = {(r.ap_metric, r.ap_state, r.ap_level, r.ap_mode): r for r in rows}
    # kbytesToBytes: Total kBytes * 1024 (scraper.go:223-225)
    assert by[("apache.traffic", None, None, None)].ap_value == 20910 * 1024
    assert by[("apache.requests", None, None, None)].ap_value == 14169
    assert by[("apache.workers", "busy", None, None)].ap_value == 13
    assert by[("apache.workers", "idle", None, None)].ap_value == 237
    cpu = by[("apache.cpu.time", None, "self", "user")]
    assert cpu.ap_value_d == 0.5 and cpu.ap_kind == "sum"
    assert by[("apache.cpu.load", None, None, None)].ap_value_d == 0.183
    # scoreboard: 11 states always present (zero-filled) + unknown for Z
    sb = {k[1]: v.ap_value for k, v in by.items()
          if k[0] == "apache.scoreboard"}
    assert sb == {
        "waiting": 1, "starting": 1, "reading": 2, "sending": 1,
        "keepalive": 2, "dnslookup": 0, "closing": 0, "logging": 0,
        "finishing": 0, "idle_cleanup": 0, "open": 2, "unknown": 1,
    }


def test_apache_partial_error(spark):
    page = "Total Accesses: notanint\nBusyWorkers: 3\n"
    rows = apache_status(
        spark.createDataFrame([(1, page)], ["id", "body"])
    ).collect()
    by = {r.ap_metric: r for r in rows}
    # a present-but-unparseable value is the reference's AddPartial
    assert by["apache.requests"].ap_ok is False
    assert by["apache.requests"].ap_value is None
    assert by["apache.workers"].ap_value == 3
    # absent keys emit nothing
    assert "apache.uptime" not in by


def test_nginx_stub_status(spark):
    df = spark.createDataFrame(
        [(1, NGINX_PAGE), (2, "<html>busted</html>")], ["id", "body"]
    )
    rows = nginx_stub_status(df).collect()
    good = {(r.ng_metric, r.ng_state): r.ng_value
            for r in rows if r.id == 1}
    assert good == {
        ("nginx.requests", None): 31070465,
        ("nginx.connections_accepted", None): 16630948,
        ("nginx.connections_handled", None): 16630947,
        ("nginx.connections_current", "active"): 291,
        ("nginx.connections_current", "reading"): 6,
        ("nginx.connections_current", "writing"): 179,
        ("nginx.connections_current", "waiting"): 106,
    }
    bad = [r for r in rows if r.id == 2]
    assert len(bad) == 1 and bad[0].ng_ok is False

"""redis receiver semantics (receiver/redisreceiver)."""
from __future__ import annotations

import pytest

from opentelemetry_collector_contrib_spark.operators.receivers import (
    redis_info,
)

PAGE = """# Server
redis_version:7.0.5
uptime_in_seconds:12345
connected_clients:10
blocked_clients:oops
used_memory:100
mem_fragmentation_ratio:1.25
maxmemory:0
role:master
master_repl_offset:999
used_cpu_sys:4.5
cmdstat_get:calls=100,usec=2000,usec_per_call=3.58,rejected_calls=0
cmdstat_bad:calls=xx,usec=70
latency_percentiles_usec_get:p50=1.5,p95=7.5,p99=2.5,p99.9=4.5
latency_percentiles_usec_set:p50=1.5,p99=oops
db0:keys=10,expires=2,avg_ttl=500
db1:keys=bad,expires=2,avg_ttl=3
db2:keys=5,expires
master_host:10.0.0.1:6379
"""

ALL_ON = frozenset({
    "redis.clients.connected", "redis.clients.blocked",
    "redis.memory.used", "redis.memory.fragmentation_ratio",
    "redis.maxmemory", "redis.role", "redis.replication.offset",
    "redis.cpu.time", "redis.uptime", "redis.cmd.calls", "redis.cmd.usec",
    "redis.cmd.latency", "redis.db.keys", "redis.db.expires",
    "redis.db.avg_ttl",
})


@pytest.fixture(scope="module")
def spark():
    from opentelemetry_collector_contrib_spark.session import get_spark

    return get_spark()


@pytest.fixture(scope="module")
def rows(spark):
    df = spark.createDataFrame(
        [(1, PAGE), (2, "redis_version:7.0.5\nconnected_clients:3\n")],
        ["id", "body"],
    )
    return redis_info(df, enabled=ALL_ON).collect()


def test_common_and_zero_value_record(rows):
    by = {(r.rd_metric, r.rd_state): r for r in rows if r.id == 1}
    assert by[("redis.uptime", None)].rd_value == 12345
    assert by[("redis.clients.connected", None)].rd_value == 10
    # ParseInt failure WARNS but records the Go zero value
    bad = by[("redis.clients.blocked", None)]
    assert bad.rd_value == 0 and bad.rd_ok is False
    assert by[("redis.cpu.time", "sys")].rd_value_d == 4.5
    frag = by[("redis.memory.fragmentation_ratio", None)]
    assert frag.rd_value_d == 1.25 and frag.rd_kind == "gauge"
    # role:master -> primary, value 1
    role = by[("redis.role", None)]
    assert role.rd_role == "primary" and role.rd_value == 1
    # a value containing ':' is dropped by the len==2 info-line rule
    assert all(r.rd_version == "7.0.5" for r in rows)


def test_cmdstats_and_latency(rows):
    cmd = {(r.rd_metric, r.rd_cmd, r.rd_percentile): r
           for r in rows if r.id == 1 and r.rd_cmd is not None}
    assert cmd[("redis.cmd.calls", "get", None)].rd_value == 100
    assert cmd[("redis.cmd.usec", "get", None)].rd_value == 2000
    # bad calls item skipped item-wise, usec still emitted
    assert ("redis.cmd.calls", "bad", None) not in cmd
    assert cmd[("redis.cmd.usec", "bad", None)].rd_value == 70
    # latency in seconds; p95 not in the percentile enum; the 'set'
    # entry has a malformed pair so the WHOLE entry is skipped
    assert cmd[("redis.cmd.latency", "get", "p50")].rd_value_d == 1.5e-06
    assert ("redis.cmd.latency", "get", "p95") not in cmd
    assert not any(k[1] == "set" for k in cmd)


def test_keyspace_and_dead_page(rows):
    db = {(r.rd_metric, r.rd_db): r.rd_value
          for r in rows if r.id == 1 and r.rd_db is not None}
    assert db == {
        ("redis.db.keys", "0"): 10,
        ("redis.db.expires", "0"): 2,
        ("redis.db.avg_ttl", "0"): 500,
    }  # db1 (bad int) and db2 (pair without '=') skipped entirely
    # page without uptime_in_seconds -> whole-scrape error
    dead = [r for r in rows if r.id == 2]
    assert len(dead) == 1 and dead[0].rd_ok is False

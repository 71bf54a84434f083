"""bigip receiver semantics (receiver/bigipreceiver/scraper.go)."""
from __future__ import annotations

import json

import pytest

from opentelemetry_collector_contrib_spark.operators.receivers import (
    bigip_stats,
)


@pytest.fixture(scope="module")
def spark():
    from opentelemetry_collector_contrib_spark.session import get_spark

    return get_spark()


def test_bigip_stats(spark):
    pool = json.dumps({
        "tmName": {"description": "/Common/p1"},
        "serverside.bitsIn": {"value": 100},
        "serverside.bitsOut": {"value": 200},
        "serverside.curConns": {"value": 5},
        "serverside.pktsIn": {"value": 10},
        "serverside.pktsOut": {"value": 20},
        "totRequests": {"value": 30},
        "memberCnt": {"value": 7}, "activeMemberCnt": {"value": 3},
        "status.availabilityState": {"description": "offline (x)"},
        "status.enabledState": {"description": "enabled-y"},
    })
    member = json.dumps({
        "nodeName": {"description": "/Common/n1"},
        "port": {"value": 443},
        "addr": {"description": "10.0.0.5"},
        "poolName": {"description": "/Common/p1"},
        "curSessions": {"value": 9},
        "status.availabilityState": {"description": "available"},
        "status.enabledState": {"description": "disabled"},
    })
    rows = bigip_stats(spark.createDataFrame(
        [(1, "pool", pool), (2, "pool_member", member)],
        ["id", "kind", "body"],
    )).collect()
    p = {(r.bp_metric, r.bp_attr): r for r in rows if r.id == 1}
    assert p[("bigip.pool.data.transmitted", "received")].bp_value == 100
    # derived inactive = memberCnt - activeMemberCnt
    assert p[("bigip.pool.member.count", "active")].bp_value == 3
    assert p[("bigip.pool.member.count", "inactive")].bp_value == 4
    # HasPrefix("offline") one-hot; HasPrefix("enabled") fold
    assert p[("bigip.pool.availability", "offline")].bp_value == 1
    assert p[("bigip.pool.availability", "available")].bp_value == 0
    assert p[("bigip.pool.enabled", "enabled")].bp_value == 1
    m = {(r.bp_metric, r.bp_attr): r for r in rows if r.id == 2}
    assert m[("bigip.pool_member.session.count", None)].bp_value == 9
    assert m[("bigip.pool_member.enabled", "disabled")].bp_value == 1
    row = [r for r in rows if r.id == 2][0]
    # member name = nodeName:port
    assert row.bp_name == "/Common/n1:443"
    assert row.bp_ip == "10.0.0.5" and row.bp_pool == "/Common/p1"

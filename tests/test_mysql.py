"""mysql receiver global-status semantics (receiver/mysqlreceiver)."""
from __future__ import annotations

import json

import pytest

from opentelemetry_collector_contrib_spark.operators.receivers import (
    _MYSQL_GLOBAL_STATS,
    mysql_global_status,
)


@pytest.fixture(scope="module")
def spark():
    from opentelemetry_collector_contrib_spark.session import get_spark

    return get_spark()


def test_mysql_global_status(spark):
    body = json.dumps({
        "Bytes_received": "100", "Com_select": "7",
        "Handler_read_key": "9", "Connections": "notanint",
        "Innodb_buffer_pool_pages_misc": "alsobad",
        "Innodb_buffer_pool_pages_dirty": "30",
        "Innodb_buffer_pool_pages_data": "100",
        "Innodb_buffer_pool_bytes_dirty": "4096",
        "Innodb_buffer_pool_bytes_data": "16384",
        "Unknown_status_var": "1",
    })
    rows = mysql_global_status(
        spark.createDataFrame([(1, body)], ["id", "body"])
    ).collect()
    by = {(r.my_metric, r.my_attr): r for r in rows}
    assert by[("mysql.client.network.io", "received")].my_value == 100
    assert by[("mysql.commands", "select")].my_value == 7
    assert by[("mysql.handlers", "read_key")].my_value == 9
    # present-but-unparseable -> AddPartial row
    conn = by[("mysql.connection.count", None)]
    assert conn.my_ok is False and conn.my_value is None
    # pages_misc bad value is silently ignored (mysql bug 59550)
    assert ("mysql.buffer_pool.pages", "misc") not in by
    # derived clean/dirty splits
    assert by[("mysql.buffer_pool.data_pages", "dirty")].my_value == 30
    assert by[("mysql.buffer_pool.data_pages", "clean")].my_value == 70
    assert by[("mysql.buffer_pool.usage", "clean")].my_value == 12288
    # absent variables emit nothing; unknown variables ignored
    assert ("mysql.uptime", None) not in by


def test_mysql_dirty_failure_loses_both_points(spark):
    body = json.dumps({"Innodb_buffer_pool_pages_dirty": "x",
                       "Innodb_buffer_pool_pages_data": "100"})
    rows = mysql_global_status(
        spark.createDataFrame([(1, body)], ["id", "body"])
    ).collect()
    dp = [r for r in rows
          if r.my_metric == "mysql.buffer_pool.data_pages"]
    # dirty fails -> clean not attempted (scraper.go:673-687)
    assert len(dp) == 1
    assert dp[0].my_attr == "dirty" and dp[0].my_ok is False

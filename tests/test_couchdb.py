"""couchdb receiver semantics (receiver/couchdbreceiver/metrics.go)."""
from __future__ import annotations

import json

import pytest

from opentelemetry_collector_contrib_spark.operators.receivers import (
    couchdb_stats,
)


@pytest.fixture(scope="module")
def spark():
    from opentelemetry_collector_contrib_spark.session import get_spark

    return get_spark()


def test_couchdb_stats(spark):
    body = json.dumps({
        "request_time": {"value": {"arithmetic_mean": 4.75}},
        "httpd": {"bulk_requests": {"value": 10},
                  "view_reads": {"value": 3}},
        "httpd_request_methods": {"GET": {"value": 100},
                                  "POST": {"value": "notnum"}},
        "httpd_status_codes": {"200": {"value": 500},
                               "404": {"value": 7}},
        "open_databases": {"value": 12},
        "database_writes": {"value": 41.9},
    })
    rows = couchdb_stats(
        spark.createDataFrame([(1, body)], ["id", "body"]),
        node_name="http://localhost:5984",
    ).collect()
    ok = {(r.cd_metric, r.cd_method, r.cd_code, r.cd_view,
           r.cd_operation): r for r in rows if r.cd_ok}
    assert ok[("couchdb.average_request_time", None, None, None,
               None)].cd_value_d == 4.75
    assert ok[("couchdb.httpd.requests", "GET", None, None,
               None)].cd_value == 100
    assert ok[("couchdb.httpd.responses", None, "200", None,
               None)].cd_value == 500
    # parseInt truncates float64
    assert ok[("couchdb.database.operations", None, None, None,
               "writes")].cd_value == 41
    # string value / missing path -> the reference's AddPartial
    bad = {(r.cd_metric, r.cd_method) for r in rows if not r.cd_ok}
    assert ("couchdb.httpd.requests", "POST") in bad
    assert ("couchdb.file_descriptor.open", None) in bad
    # every entry row appears exactly once (2 views, 7 methods, 24
    # codes, 2 ops, 5 singles)
    assert len(rows) == 2 + 7 + 24 + 2 + 4

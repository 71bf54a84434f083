"""aerospike receiver semantics (receiver/aerospikereceiver)."""
from __future__ import annotations

import json

import pytest

from opentelemetry_collector_contrib_spark.operators.receivers import (
    aerospike_info,
)


@pytest.fixture(scope="module")
def spark():
    from opentelemetry_collector_contrib_spark.session import get_spark

    return get_spark()


def test_aerospike_info(spark):
    node = json.dumps({"node": "BB9", "client_connections": "5",
                       "client_connections_opened": "100",
                       "system_free_mem_pct": "42",
                       "query_tracked": "oops",
                       "unknown_stat": "1"})
    ns = json.dumps({"node": "BB9", "name": "test",
                     "memory_used_sindex_bytes": "777",
                     "pi_query_short_basic_timeout": "3",
                     "client_write_success": "9"})
    rows = aerospike_info(spark.createDataFrame(
        [(1, "node", node), (2, "namespace", ns)],
        ["id", "kind", "body"],
    )).collect()
    n = {(r.as_metric, r.as_a1, r.as_a2): r for r in rows if r.id == 1}
    assert n[("aerospike.node.connection.open", "client",
              None)].as_value == 5
    assert n[("aerospike.node.connection.count", "client",
              "open")].as_value == 100
    assert n[("aerospike.node.memory.free", None, None)].as_value == 42
    # ParseInt failure -> AddPartial row
    qt = n[("aerospike.node.query.tracked", None, None)]
    assert qt.as_ok is False and qt.as_value is None
    m = {(r.as_metric, r.as_a1, r.as_a2, r.as_a3): r
         for r in rows if r.id == 2}
    assert m[("aerospike.namespace.memory.usage", "secondary_index",
              None, None)].as_value == 777
    assert m[("aerospike.namespace.query.count", "short_basic",
              "primary", "timeout")].as_value == 3
    assert m[("aerospike.namespace.transaction.count", "write",
              "success", None)].as_value == 9
    assert rows[0].as_node == "BB9"
    assert [r.as_namespace for r in rows if r.id == 2][0] == "test"

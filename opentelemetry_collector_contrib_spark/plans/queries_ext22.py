"""Round-5 queries (cont. 6): consistent-hash ring routing (the
loadbalancing exporter's data-transform half).

The fixture derives a small closed set of routing identifiers from
``events`` (md5-hex trace ids, service names); Spark routes every row
through the vectorized ring lookup (F.crc32 + literal ring). The
oracle inlines the expected identifier -> endpoint table computed at
import time by the driver-side Python port (``endpoint_for_py``,
byte-identical zlib.crc32 arithmetic to Go's crc32.NewIEEE) — the
same golden-table pattern as the statsd fuzz port, with the port
itself pinned against consistent_hashing_test.go expectations in
tests/test_loadbalancing.py.
"""
from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.loadbalancing import build_hash_ring, endpoint_for_py
from .base import QueryFn, load

EXT22_QUERIES: dict[str, QueryFn] = {}
EXT22_ORACLES: dict[str, str] = {}

_ENDPOINTS = [f"backend-{i}" for i in range(1, 6)]
_RING = build_hash_ring(_ENDPOINTS)

# closed identifier sets (64 trace ids, 23 services)
_TRACE_HEX = [hashlib.md5(f"t{i}".encode()).hexdigest() for i in range(64)]
_TRACE_EP = [endpoint_for_py(_RING, bytes.fromhex(h)) for h in _TRACE_HEX]
_SVC = [f"svc{i}" for i in range(23)]
_SVC_EP = [endpoint_for_py(_RING, s.encode()) for s in _SVC]


def q_lb_trace_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.loadbalancing import route_by_trace_id
    ev = load(spark, sf_dir, "events")
    e = F.col("event_id")
    fx = ev.select(
        e.alias("event_id"),
        F.md5(F.concat(F.lit("t"), (e % 64).cast("string")))
        .alias("trace_id"))
    return route_by_trace_id(fx, _RING).select(
        "event_id", "trace_id", "endpoint")


def q_lb_svc_route_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.loadbalancing import (
        endpoint_counts,
        route_by_attr_key,
    )
    ev = load(spark, sf_dir, "events")
    u = F.col("user_id")
    fx = ev.select(
        F.concat(F.lit("svc"), (u % 23).cast("string")).alias("svc"))
    return endpoint_counts(route_by_attr_key(fx, _RING, ["svc"]))


_TRACE_CASE = " ".join(
    f"WHEN {i} THEN '{_TRACE_EP[i]}'" for i in range(64))
_SVC_CASE = " ".join(
    f"WHEN {i} THEN '{_SVC_EP[i]}'" for i in range(23))

O_LB_TRACE_ROUTE = f"""
SELECT event_id,
  md5('t' || CAST(event_id % 64 AS VARCHAR)) AS trace_id,
  CASE CAST(event_id % 64 AS INT) {_TRACE_CASE} END AS endpoint
FROM events
"""

O_LB_SVC_ROUTE_COUNTS = f"""
SELECT CASE CAST(user_id % 23 AS INT) {_SVC_CASE} END AS endpoint,
       COUNT(*) AS n_rows
FROM events
GROUP BY 1
"""

EXT22_QUERIES["lb_trace_route"] = q_lb_trace_route
EXT22_ORACLES["lb_trace_route"] = O_LB_TRACE_ROUTE
EXT22_QUERIES["lb_svc_route_counts"] = q_lb_svc_route_counts
EXT22_ORACLES["lb_svc_route_counts"] = O_LB_SVC_ROUTE_COUNTS

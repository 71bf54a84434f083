"""Round-5 queries (cont. 19): OTLP -> Tinybird NDJSON signal rows
(``exporter/tinybirdexporter``): flat rows with RFC3339Nano
timestamps, the ts->observed fallback, kind/status words, both
end_time and ns duration, and the sum-signal temporality/monotonic
columns."""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import QueryFn, load

EXT35_QUERIES: dict[str, QueryFn] = {}
EXT35_ORACLES: dict[str, str] = {}

_FLAT = ("array_join(array_sort(transform(map_entries({m}), "
         "kv -> concat(kv.key, '=', kv.value))), ',')")

_RFC = ("strftime((TIMESTAMP '1970-01-01 00:00:00' + "
        "to_microseconds(({ns}) // 1000)), '%Y-%m-%dT%H:%M:%S') || "
        "CASE WHEN ({ns}) % 1000000000 > 0 THEN '.' || "
        "rtrim(lpad(CAST(({ns}) % 1000000000 AS VARCHAR), 9, '0'), "
        "'0') ELSE '' END || 'Z'")


def q_tinybird_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.tinybird_export import (tinybird_log_rows,
                                             tinybird_sum_rows,
                                             tinybird_trace_rows)

    ev = load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    s = lambda c: c.cast("string")  # noqa: E731
    res = F.create_map(F.lit("service.name"),
                       F.concat(F.lit("svc"), s(u % 3)))
    logs = ev.filter(e % 3 == 0).select(
        e.alias("i"),
        F.when(e % 6 == 0, F.lit(0)).otherwise(
            F.lit(1700000000_000000000) + e * 1000).cast("bigint")
        .alias("ts_ns"),
        (F.lit(1700000009_000000000) + e * 1000).cast("bigint")
        .alias("observed_ns"),
        F.lit("r-url").alias("res_url"), res.alias("res_attrs"),
        F.lit("s-url").alias("scope_url"),
        F.create_map(F.lit("sk"), s(u % 4)).alias("scope_attrs"),
        F.concat(F.lit("lib"), s(u % 2)).alias("scope_name"),
        F.lit("1.0").alias("scope_version"),
        F.concat(F.lit("t"), s(u)).alias("trace_id"),
        F.concat(F.lit("sp"), s(e)).alias("span_id"),
        (e % 4).cast("int").alias("flags"),
        F.lit("WARN").alias("severity_text"),
        (e % 25).cast("int").alias("severity_number"),
        F.create_map(F.lit("ak"), s(e % 5)).alias("attrs"),
        F.concat(F.lit("b "), F.col("event_type")).alias("body"),
    )
    spans = ev.filter(e % 3 == 1).select(
        e.alias("i"), res.alias("res_attrs"),
        F.concat(F.lit("lib"), s(u % 2)).alias("scope_name"),
        F.concat(F.lit("t"), s(u)).alias("trace_id"),
        F.concat(F.lit("sp"), s(e)).alias("span_id"),
        F.when(e % 5 == 1, F.lit("")).otherwise(
            F.concat(F.lit("p"), s(e))).alias("parent_span_id"),
        F.when(e % 4 == 1, F.lit("w3c=1")).otherwise(F.lit(""))
        .alias("trace_state"),
        (e % 2).cast("int").alias("flags"),
        F.concat(F.lit("op-"), F.col("event_type")).alias("name"),
        (e % 7).cast("int").alias("kind"),
        (F.lit(1700000000_000000000) + e * 1000).cast("bigint")
        .alias("start_ns"),
        (F.lit(1700000000_000000000) + e * 1000 + e % 97 + 1)
        .cast("bigint").alias("end_ns"),
        (e % 4).cast("int").alias("status_code"),
        F.when(e % 4 == 2, F.lit("bad")).otherwise(F.lit(""))
        .alias("status_message"),
        F.create_map(F.lit("ak"), s(e % 5)).alias("attrs"),
        F.when(e % 9 == 1, F.array(F.struct(
            (F.lit(1700000000_000000000) + e * 1000 + 3)
            .cast("bigint").alias("ts_ns"),
            F.lit("ev1").alias("name"),
            F.create_map(F.lit("x"), s(e % 2)).alias("attrs"),
        ))).alias("events"),
        F.when(e % 8 == 1, F.array(F.struct(
            F.concat(F.lit("lt"), s(u % 3)).alias("trace_id"),
            F.concat(F.lit("ls"), s(e % 3)).alias("span_id"),
            F.lit("st=1").alias("trace_state"),
            F.create_map(F.lit("lk"), F.lit("lv")).alias("attrs"),
        ))).alias("links"),
    )
    sums = ev.filter(e % 3 == 2).select(
        e.alias("i"), res.alias("res_attrs"),
        F.concat(F.lit("mx."), F.col("event_type"))
        .alias("metric_name"),
        F.lit("ms").alias("metric_unit"),
        F.create_map(F.lit("dim"), s(e % 9)).alias("attrs"),
        (F.lit(1700000000_000000000) + e * 1000).cast("bigint")
        .alias("start_ns"),
        (F.lit(1700000001_000000000) + e * 1000).cast("bigint")
        .alias("ts_ns"),
        (e % 2).cast("int").alias("flags"),
        (e % 3).cast("int").alias("value_type"),
        (e % 100).cast("bigint").alias("value_int"),
        F.col("value").alias("value_double"),
        (e % 3).cast("int").alias("temporality"),
        (e % 5 == 0).alias("is_monotonic"),
        F.when(e % 10 == 2, F.array(F.struct(
            (F.lit(1700000000_500000000) + e * 1000).cast("bigint")
            .alias("ts_ns"),
            (e % 50).cast("bigint").alias("value_int"),
            F.lit(0.25).alias("value_double"),
            F.when(e % 2 == 0, 1).otherwise(2).cast("int")
            .alias("value_type"),
            F.concat(F.lit("xt"), s(u % 2)).alias("trace_id"),
            F.concat(F.lit("xs"), s(e % 2)).alias("span_id"),
            F.create_map(F.lit("ek"), F.lit("ev")).alias("attrs"),
        ))).alias("exemplars"),
    )
    lr = tinybird_log_rows(logs, id_cols=["i"]).select(
        "i", F.lit("log").alias("signal"), "service_name",
        "timestamp",
        F.concat_ws("|", "resource_schema_url", "scope_schema_url",
                    "scope_name", "scope_version", "trace_id",
                    "span_id", "severity_text", "body").alias("s1"),
        F.col("flags").alias("n1"),
        F.col("severity_number").alias("n2"),
        F.expr(_FLAT.format(m="log_attributes")).alias("attr_csv"),
        F.lit("").alias("extra"),
    )
    tr = tinybird_trace_rows(spans, id_cols=["i"]).select(
        "i", F.lit("span").alias("signal"), "service_name",
        F.col("start_time").alias("timestamp"),
        F.concat_ws("|", "scope_name", "trace_id", "span_id",
                    "parent_span_id", "trace_state", "span_name",
                    "span_kind", "end_time", "status_code",
                    "status_message").alias("s1"),
        F.col("trace_flags").alias("n1"),
        F.col("duration").cast("int").alias("n2"),
        F.expr(_FLAT.format(m="span_attributes")).alias("attr_csv"),
        F.concat(
            F.array_join(F.col("events_timestamp"), ";"), F.lit("/"),
            F.array_join(F.col("events_name"), ";"), F.lit("/"),
            F.array_join(F.col("links_trace_id"), ";"), F.lit("/"),
            F.array_join(F.col("links_span_id"), ";")).alias("extra"),
    )
    sm = tinybird_sum_rows(sums, id_cols=["i"]).select(
        "i", F.lit("sum").alias("signal"), "service_name",
        "timestamp",
        F.concat_ws("|", "metric_name", "metric_unit",
                    "start_timestamp",
                    F.col("value").cast("string"),
                    F.col("aggregation_temporality").cast("string"),
                    F.col("is_monotonic").cast("string")).alias("s1"),
        F.col("flags").alias("n1"),
        F.lit(None).cast("int").alias("n2"),
        F.expr(_FLAT.format(m="metric_attributes")).alias("attr_csv"),
        F.concat(
            F.array_join(F.col("exemplars_timestamp"), ";"),
            F.lit("/"),
            F.array_join(F.transform(F.col("exemplars_value"),
                                     lambda v: v.cast("string")), ";"),
            F.lit("/"),
            F.array_join(F.col("exemplars_trace_id"), ";"))
        .alias("extra"),
    )
    return lr.unionByName(tr).unionByName(sm)


_L_TS = "1700000000000000000 + e * 1000"
_L_OBS = "1700000009000000000 + e * 1000"
_S_END = "1700000000000000000 + e * 1000 + e % 97 + 1"
_S_EV = "1700000000000000000 + e * 1000 + 3"
_M_TS = "1700000001000000000 + e * 1000"
_M_ST = "1700000000000000000 + e * 1000"
_M_EX = "1700000000500000000 + e * 1000"

O_TINYBIRD = f"""
WITH b AS (
  SELECT event_id AS i, user_id AS u, event_id AS e, event_type,
         value, 'svc' || CAST(user_id % 3 AS VARCHAR) AS svc
  FROM events
)
SELECT i, 'log' AS signal, svc AS service_name,
  CASE WHEN e % 6 = 0 THEN {_RFC.format(ns=_L_OBS)}
       ELSE {_RFC.format(ns=_L_TS)} END AS timestamp,
  'r-url|s-url|lib' || CAST(u % 2 AS VARCHAR) || '|1.0|t'
    || CAST(u AS VARCHAR) || '|sp' || CAST(e AS VARCHAR)
    || '|WARN|b ' || event_type AS s1,
  CAST(e % 4 AS INT) AS n1,
  CAST(e % 25 AS INT) AS n2,
  'ak=' || CAST(e % 5 AS VARCHAR) AS attr_csv,
  '' AS extra
FROM b WHERE e % 3 = 0
UNION ALL
SELECT i, 'span', svc,
  {_RFC.format(ns=_L_TS)},
  'lib' || CAST(u % 2 AS VARCHAR) || '|t' || CAST(u AS VARCHAR)
    || '|sp' || CAST(e AS VARCHAR) || '|'
    || CASE WHEN e % 5 = 1 THEN ''
       ELSE 'p' || CAST(e AS VARCHAR) END || '|'
    || CASE WHEN e % 4 = 1 THEN 'w3c=1' ELSE '' END
    || '|op-' || event_type || '|'
    || CASE e % 7 WHEN 1 THEN 'Internal' WHEN 2 THEN 'Server'
       WHEN 3 THEN 'Client' WHEN 4 THEN 'Producer'
       WHEN 5 THEN 'Consumer' ELSE 'Unspecified' END
    || '|' || {_RFC.format(ns=_S_END)} || '|'
    || CASE e % 4 WHEN 1 THEN 'Ok' WHEN 2 THEN 'Error'
       ELSE 'Unset' END
    || '|' || CASE WHEN e % 4 = 2 THEN 'bad' ELSE '' END,
  CAST(e % 2 AS INT),
  CAST(e % 97 + 1 AS INT),
  'ak=' || CAST(e % 5 AS VARCHAR),
  CASE WHEN e % 9 = 1 THEN {_RFC.format(ns=_S_EV)} ELSE '' END
    || '/' || CASE WHEN e % 9 = 1 THEN 'ev1' ELSE '' END
    || '/' || CASE WHEN e % 8 = 1
         THEN 'lt' || CAST(u % 3 AS VARCHAR) ELSE '' END
    || '/' || CASE WHEN e % 8 = 1
         THEN 'ls' || CAST(e % 3 AS VARCHAR) ELSE '' END
FROM b WHERE e % 3 = 1
UNION ALL
SELECT i, 'sum', svc,
  {_RFC.format(ns=_M_TS)},
  'mx.' || event_type || '|ms|' || {_RFC.format(ns=_M_ST)} || '|'
    || CAST(CASE e % 3 WHEN 1 THEN CAST(e % 100 AS DOUBLE)
            WHEN 2 THEN value ELSE 0.0 END AS VARCHAR)
    || '|' || CAST(e % 3 AS VARCHAR) || '|'
    || CASE WHEN e % 5 = 0 THEN 'true' ELSE 'false' END,
  CAST(e % 2 AS INT),
  NULL,
  'dim=' || CAST(e % 9 AS VARCHAR),
  CASE WHEN e % 10 = 2 THEN {_RFC.format(ns=_M_EX)} ELSE '' END
    || '/' || CASE WHEN e % 10 = 2 THEN
         CASE WHEN e % 2 = 0
           THEN CAST(CAST(e % 50 AS DOUBLE) AS VARCHAR)
           ELSE '0.25' END ELSE '' END
    || '/' || CASE WHEN e % 10 = 2
         THEN 'xt' || CAST(u % 2 AS VARCHAR) ELSE '' END
FROM b WHERE e % 3 = 2
"""

EXT35_QUERIES["tinybird_rows"] = q_tinybird_rows
EXT35_ORACLES["tinybird_rows"] = O_TINYBIRD

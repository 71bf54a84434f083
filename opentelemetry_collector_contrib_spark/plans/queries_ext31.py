"""Round-5 queries (cont. 15): OTLP -> Azure Data Explorer table rows
(``exporter/azuredataexplorerexporter``).

``adx_logs`` / ``adx_traces`` drive the flat row models (RFC3339Nano
rendering, proto status/kind words, scope-wins attr merge, event/link
fans); ``adx_metrics`` drives the metric fan incl. the cumulative
histogram buckets with the +Inf overflow row and the per-quantile
summary rows.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import QueryFn, load

EXT31_QUERIES: dict[str, QueryFn] = {}
EXT31_ORACLES: dict[str, str] = {}

_FLAT = ("array_join(array_sort(transform(map_entries({m}), "
         "kv -> concat(kv.key, '=', kv.value))), ',')")


def q_adx_logs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.adx_export import adx_log_rows

    ev = load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    s = lambda c: c.cast("string")  # noqa: E731
    fx = ev.select(
        e.alias("i"),
        (F.lit(1700000000_000000000) + e * 1_000_000 + e % 7)
        .cast("bigint").alias("ts_ns"),
        (F.lit(1700000001_000000000) + e * 1_000_000).cast("bigint")
        .alias("observed_ns"),
        F.concat(F.lit("t"), s(u)).alias("trace_id"),
        F.concat(F.lit("s"), s(e)).alias("span_id"),
        F.when(e % 2 == 0, F.lit("INFO")).otherwise(F.lit("WARN"))
        .alias("severity_text"),
        (e % 25).cast("int").alias("severity_number"),
        F.concat(F.lit("b "), F.col("event_type")).alias("body"),
        F.create_map(F.lit("rk"), s(u % 3)).alias("res_attrs"),
        F.when(u % 5 == 0, F.lit("")).otherwise(
            F.concat(F.lit("sc"), s(u % 2))).alias("scope_name"),
        F.when(u % 3 == 0, F.lit("")).otherwise(F.lit("1.2"))
        .alias("scope_version"),
        F.map_from_entries(F.filter(F.array(
            F.struct(F.lit("ak").alias("key"), s(e % 5)
                     .alias("value")),
            F.when(e % 4 == 0,
                   F.struct(F.lit("scope.name").alias("key"),
                            F.lit("clobbered").alias("value"))),
        ), lambda x: x.isNotNull())).alias("attrs"),
    )
    out = adx_log_rows(fx, id_cols=["i"])
    return out.select(
        "i", "timestamp", "observed_timestamp", "trace_id", "span_id",
        "severity_text", "severity_number", "body",
        F.expr(_FLAT.format(m="resource_attributes")).alias("res_csv"),
        F.expr(_FLAT.format(m="logs_attributes")).alias("attr_csv"),
    )


O_ADX_LOGS = """
WITH b AS (
  SELECT event_id AS i, user_id AS u, event_id AS e, event_type
  FROM events
)
SELECT i,
  strftime((TIMESTAMP '1970-01-01 00:00:00'
            + to_microseconds((1700000000000000000
                               + e * 1000000) // 1000)),
           '%Y-%m-%dT%H:%M:%S')
  || CASE WHEN e * 1000000 % 1000000000 + e % 7 > 0 THEN
       '.' || rtrim(lpad(CAST(1700000000000000000 + e * 1000000
                              + e % 7 AS VARCHAR)[-9:], 9, '0'), '0')
     ELSE '' END || 'Z' AS timestamp,
  strftime((TIMESTAMP '1970-01-01 00:00:00'
            + to_microseconds((1700000001000000000
                               + e * 1000000) // 1000)),
           '%Y-%m-%dT%H:%M:%S')
  || CASE WHEN e * 1000000 % 1000000000 > 0 THEN
       '.' || rtrim(lpad(CAST(e * 1000000 % 1000000000
                              AS VARCHAR), 9, '0'), '0')
     ELSE '' END || 'Z' AS observed_timestamp,
  't' || CAST(u AS VARCHAR) AS trace_id,
  's' || CAST(e AS VARCHAR) AS span_id,
  CASE WHEN e % 2 = 0 THEN 'INFO' ELSE 'WARN' END AS severity_text,
  CAST(e % 25 AS INT) AS severity_number,
  'b ' || event_type AS body,
  'rk=' || CAST(u % 3 AS VARCHAR) AS res_csv,
  array_to_string(list_sort(list_filter([
    'ak=' || CAST(e % 5 AS VARCHAR),
    CASE WHEN u % 5 <> 0 THEN 'scope.name=sc' || CAST(u % 2 AS VARCHAR)
         WHEN e % 4 = 0 THEN 'scope.name=clobbered' END,
    CASE WHEN u % 3 <> 0 THEN 'scope.version=1.2' END
  ], x -> x IS NOT NULL)), ',') AS attr_csv
FROM b
"""


def q_adx_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.adx_export import adx_metric_rows

    ev = load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    s = lambda c: c.cast("string")  # noqa: E731
    base = ev.select(
        e.alias("i"), e.alias("e"),
        (F.lit(1700000000_000000000) + e * 1_000_000).cast("bigint")
        .alias("ts_ns"),
        F.concat(F.lit("mx."), F.col("event_type"))
        .alias("metric_name"),
        F.when(e % 5 == 0, F.lit("")).otherwise(F.lit("d "))
        .alias("metric_description"),
        F.lit("ms").alias("metric_unit"),
        F.when(u % 4 == 0,
               F.create_map(F.lit("host.name"),
                            F.concat(F.lit("h"), s(u % 3)),
                            F.lit("rk"), s(u % 2)))
        .otherwise(F.create_map(F.lit("rk"), s(u % 2)))
        .alias("res_attrs"),
        F.concat(F.lit("sc"), s(u % 2)).alias("scope_name"),
        F.lit("2.0").alias("scope_version"),
        F.create_map(F.lit("dim"), s(e % 9)).alias("attrs"),
        (e % 3).cast("int").alias("value_type"),
        (e % 100).cast("bigint").alias("value_int"),
        F.col("value").alias("value_double"),
        (e % 1000).cast("bigint").alias("count"),
        (F.col("value") * 2).alias("sum"),
        F.when(e % 6 == 0, F.array(
            (e % 5).cast("bigint"), (e % 7).cast("bigint"),
            (e % 11).cast("bigint")))
        .otherwise(F.array((e % 5).cast("bigint")))
        .alias("bucket_counts"),
        F.array(F.lit(0.5), F.lit(2.5)).alias("explicit_bounds"),
        F.array(F.struct(F.lit(0.5).alias("q"),
                         (e % 13).cast("double").alias("v")),
                F.struct(F.lit(0.99).alias("q"),
                         (e % 17).cast("double").alias("v")))
        .alias("quantiles"),
    )
    ga = adx_metric_rows(base.filter(F.col("e") % 4 == 0),
                         id_cols=["i"], metric_type="gauge",
                         default_host="col-host")
    su = adx_metric_rows(base.filter(F.col("e") % 4 == 1),
                         id_cols=["i"], metric_type="sum",
                         default_host="col-host")
    hi = adx_metric_rows(base.filter(F.col("e") % 4 == 2),
                         id_cols=["i"], metric_type="histogram",
                         default_host="col-host")
    sm = adx_metric_rows(base.filter(F.col("e") % 4 == 3),
                         id_cols=["i"], metric_type="summary",
                         default_host="col-host")
    out = ga.unionByName(su).unionByName(hi).unionByName(sm)
    return out.select(
        "i", "metric_name", "metric_type", "metric_unit",
        "metric_description", "metric_value", "host",
        F.expr(_FLAT.format(m="metric_attributes")).alias("attr_csv"),
        F.expr(_FLAT.format(m="resource_attributes")).alias("res_csv"),
    )


O_ADX_METRICS = """
WITH b AS (
  SELECT event_id AS i, user_id AS u, event_id AS e, event_type,
         value,
         'mx.' || event_type AS mname,
         CASE WHEN event_id % 5 = 0 THEN '' ELSE 'd ' END AS mdesc,
         CASE WHEN user_id % 4 = 0 THEN 'h'
           || CAST(user_id % 3 AS VARCHAR) ELSE 'col-host'
           END AS host,
         CASE WHEN user_id % 4 = 0 THEN
           'host.name=h' || CAST(user_id % 3 AS VARCHAR)
           || ',rk=' || CAST(user_id % 2 AS VARCHAR)
         ELSE 'rk=' || CAST(user_id % 2 AS VARCHAR) END AS res_csv,
         'dim=' || CAST(event_id % 9 AS VARCHAR)
           || ',scope.name=sc' || CAST(user_id % 2 AS VARCHAR)
           || ',scope.version=2.0' AS base_attr_csv
  FROM events
), num AS (
  SELECT *,
    CASE e % 3 WHEN 1 THEN CAST(e % 100 AS DOUBLE)
      WHEN 2 THEN value ELSE 0.0 END AS numval
  FROM b
)
SELECT i, mname AS metric_name, 'Gauge' AS metric_type,
  'ms' AS metric_unit, mdesc AS metric_description,
  numval AS metric_value, host, base_attr_csv AS attr_csv, res_csv
FROM num WHERE e % 4 = 0
UNION ALL
SELECT i, mname, 'Sum', 'ms', mdesc, numval, host, base_attr_csv,
  res_csv
FROM num WHERE e % 4 = 1
UNION ALL
SELECT i, mname || '_sum', 'Histogram', 'ms',
  mdesc || '(Sum total of samples)', value * 2, host, base_attr_csv,
  res_csv
FROM b WHERE e % 4 = 2
UNION ALL
SELECT i, mname || '_count', 'Histogram', 'ms',
  mdesc || '(Count of samples)', CAST(e % 1000 AS DOUBLE), host,
  base_attr_csv, res_csv
FROM b WHERE e % 4 = 2
UNION ALL
SELECT i, mname || '_bucket', 'Histogram', 'ms', mdesc,
  CAST(e % 5 AS DOUBLE), host,
  'dim=' || CAST(e % 9 AS VARCHAR) || ',le=0.5,scope.name=sc'
    || CAST(u % 2 AS VARCHAR) || ',scope.version=2.0',
  res_csv
FROM b WHERE e % 4 = 2 AND e % 6 = 0
UNION ALL
SELECT i, mname || '_bucket', 'Histogram', 'ms', mdesc,
  CAST(e % 5 + e % 7 AS DOUBLE), host,
  'dim=' || CAST(e % 9 AS VARCHAR) || ',le=2.5,scope.name=sc'
    || CAST(u % 2 AS VARCHAR) || ',scope.version=2.0',
  res_csv
FROM b WHERE e % 4 = 2 AND e % 6 = 0
UNION ALL
SELECT i, mname || '_bucket', 'Histogram', 'ms', mdesc,
  CAST(e % 5 + e % 7 + e % 11 AS DOUBLE), host,
  'dim=' || CAST(e % 9 AS VARCHAR) || ',le=+Inf,scope.name=sc'
    || CAST(u % 2 AS VARCHAR) || ',scope.version=2.0',
  res_csv
FROM b WHERE e % 4 = 2 AND e % 6 = 0
UNION ALL
SELECT i, mname || '_sum', 'Summary', 'ms',
  mdesc || '(Sum total of samples)', value * 2, host, base_attr_csv,
  res_csv
FROM b WHERE e % 4 = 3
UNION ALL
SELECT i, mname || '_count', 'Summary', 'ms',
  mdesc || '(Count of samples)', CAST(e % 1000 AS DOUBLE), host,
  base_attr_csv, res_csv
FROM b WHERE e % 4 = 3
UNION ALL
SELECT i, mname || '_0.5', 'Summary', 'ms',
  mdesc || '(Count of samples)', CAST(e % 13 AS DOUBLE), host,
  'dim=' || CAST(e % 9 AS VARCHAR)
    || ',' || mname || '_0.5='
    || CAST(e % 13 AS VARCHAR)
    || ',qt=0.5,scope.name=sc' || CAST(u % 2 AS VARCHAR)
    || ',scope.version=2.0',
  res_csv
FROM b WHERE e % 4 = 3
UNION ALL
SELECT i, mname || '_0.99', 'Summary', 'ms',
  mdesc || '(Count of samples)', CAST(e % 17 AS DOUBLE), host,
  'dim=' || CAST(e % 9 AS VARCHAR)
    || ',' || mname || '_0.99='
    || CAST(e % 17 AS VARCHAR)
    || ',qt=0.99,scope.name=sc' || CAST(u % 2 AS VARCHAR)
    || ',scope.version=2.0',
  res_csv
FROM b WHERE e % 4 = 3
"""

def q_adx_traces(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.adx_export import adx_trace_rows

    ev = load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    s = lambda c: c.cast("string")  # noqa: E731
    fx = ev.select(
        e.alias("i"),
        F.concat(F.lit("t"), s(u)).alias("trace_id"),
        F.concat(F.lit("s"), s(e)).alias("span_id"),
        F.when(e % 3 == 0, F.lit("")).otherwise(
            F.concat(F.lit("p"), s(e))).alias("parent_span_id"),
        F.concat(F.lit("op-"), F.col("event_type")).alias("name"),
        (e % 7).cast("int").alias("kind"),
        (e % 4).cast("int").alias("status_code"),
        F.when(e % 4 == 2, F.lit("bad")).otherwise(F.lit(""))
        .alias("status_message"),
        (F.lit(1700000000_000000000) + e * 1_000_000).cast("bigint")
        .alias("start_ns"),
        (F.lit(1700000001_000000000) + e * 1_000_000).cast("bigint")
        .alias("end_ns"),
        F.create_map(F.lit("rk"), s(u % 3)).alias("res_attrs"),
        F.concat(F.lit("sc"), s(u % 2)).alias("scope_name"),
        F.lit("3.0").alias("scope_version"),
        F.create_map(F.lit("ak"), s(e % 5)).alias("attrs"),
        F.when(e % 6 == 0, F.array(F.struct(
            (F.lit(1700000000_500000000) + e * 1_000_000)
            .cast("bigint").alias("ts_ns"),
            F.lit("ev1").alias("name"),
            F.create_map(F.lit("x"), s(e % 2)).alias("attrs"),
        ))).alias("events"),
        F.when(e % 8 == 0, F.array(F.struct(
            F.concat(F.lit("lt"), s(u % 3)).alias("trace_id"),
            F.concat(F.lit("ls"), s(e % 3)).alias("span_id"),
            F.lit("st=1").alias("trace_state"),
            F.create_map(F.lit("lk"), F.lit("lv")).alias("attrs"),
        ))).alias("links"),
    )
    out = adx_trace_rows(fx, id_cols=["i"])
    return out.select(
        "i", "trace_id", "span_id", "parent_id", "span_name",
        "span_status", "span_status_message", "span_kind",
        "start_time", "end_time",
        F.expr(_FLAT.format(m="trace_attributes")).alias("attr_csv"),
        F.coalesce(F.array_join(F.transform(
            F.col("events"),
            lambda ev2: F.concat(ev2["event_name"], F.lit("|"),
                                 ev2["timestamp"])), ";"), F.lit(""))
        .alias("ev_csv"),
        F.coalesce(F.array_join(F.transform(
            F.col("links"),
            lambda ln: F.concat(ln["trace_id"], F.lit("|"),
                                ln["span_id"], F.lit("|"),
                                ln["trace_state"])), ";"), F.lit(""))
        .alias("lk_csv"),
    )


O_ADX_TRACES = """
WITH b AS (
  SELECT event_id AS i, user_id AS u, event_id AS e, event_type
  FROM events
), t AS (
  SELECT *,
    strftime((TIMESTAMP '1970-01-01 00:00:00'
              + to_microseconds((1700000000000000000
                                 + e * 1000000) // 1000)),
             '%Y-%m-%dT%H:%M:%S')
    || CASE WHEN e * 1000000 % 1000000000 > 0 THEN
         '.' || rtrim(lpad(CAST(e * 1000000 % 1000000000
                                AS VARCHAR), 9, '0'), '0')
       ELSE '' END || 'Z' AS start_time,
    strftime((TIMESTAMP '1970-01-01 00:00:00'
              + to_microseconds((1700000001000000000
                                 + e * 1000000) // 1000)),
             '%Y-%m-%dT%H:%M:%S')
    || CASE WHEN e * 1000000 % 1000000000 > 0 THEN
         '.' || rtrim(lpad(CAST(e * 1000000 % 1000000000
                                AS VARCHAR), 9, '0'), '0')
       ELSE '' END || 'Z' AS end_time,
    strftime((TIMESTAMP '1970-01-01 00:00:00'
              + to_microseconds((1700000000500000000
                                 + e * 1000000) // 1000)),
             '%Y-%m-%dT%H:%M:%S')
    || CASE WHEN (500000000 + e * 1000000) % 1000000000 > 0 THEN
         '.' || rtrim(lpad(CAST((500000000 + e * 1000000)
                                % 1000000000 AS VARCHAR), 9, '0'), '0')
       ELSE '' END || 'Z' AS ev_time
  FROM b
)
SELECT i,
  't' || CAST(u AS VARCHAR) AS trace_id,
  's' || CAST(e AS VARCHAR) AS span_id,
  CASE WHEN e % 3 = 0 THEN '' ELSE 'p' || CAST(e AS VARCHAR)
    END AS parent_id,
  'op-' || event_type AS span_name,
  CASE e % 4 WHEN 1 THEN 'STATUS_CODE_OK' WHEN 2 THEN
    'STATUS_CODE_ERROR' ELSE 'STATUS_CODE_UNSET' END AS span_status,
  CASE WHEN e % 4 = 2 THEN 'bad' ELSE '' END AS span_status_message,
  CASE e % 7 WHEN 1 THEN 'SPAN_KIND_INTERNAL'
    WHEN 2 THEN 'SPAN_KIND_SERVER' WHEN 3 THEN 'SPAN_KIND_CLIENT'
    WHEN 4 THEN 'SPAN_KIND_PRODUCER' WHEN 5 THEN 'SPAN_KIND_CONSUMER'
    ELSE 'SPAN_KIND_UNSPECIFIED' END AS span_kind,
  start_time, end_time,
  'ak=' || CAST(e % 5 AS VARCHAR) || ',scope.name=sc'
    || CAST(u % 2 AS VARCHAR) || ',scope.version=3.0' AS attr_csv,
  CASE WHEN e % 6 = 0 THEN 'ev1|' || ev_time ELSE '' END AS ev_csv,
  CASE WHEN e % 8 = 0 THEN 'lt' || CAST(u % 3 AS VARCHAR) || '|ls'
    || CAST(e % 3 AS VARCHAR) || '|st=1' ELSE '' END AS lk_csv
FROM t
"""

EXT31_QUERIES["adx_logs"] = q_adx_logs
EXT31_ORACLES["adx_logs"] = O_ADX_LOGS
EXT31_QUERIES["adx_metrics"] = q_adx_metrics
EXT31_ORACLES["adx_metrics"] = O_ADX_METRICS
EXT31_QUERIES["adx_traces"] = q_adx_traces
EXT31_ORACLES["adx_traces"] = O_ADX_TRACES

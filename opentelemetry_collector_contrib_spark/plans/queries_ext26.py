"""Round-5 queries (cont. 10): OTLP → Azure Monitor (Application
Insights) envelopes
(``exporter/azuremonitorexporter/{log_to_envelope,
metric_to_envelopes}.go``).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import QueryFn, load
from .queries_ext25 import _omap

EXT26_QUERIES: dict[str, QueryFn] = {}
EXT26_ORACLES: dict[str, str] = {}

# RFC3339Nano of (secs, ns-part) in DuckDB
_RFC3339 = ("strftime(make_timestamp(({s}) * 1000000), "
            "'%Y-%m-%dT%H:%M:%S') || CASE WHEN ({n}) > 0 THEN '.' || "
            "rtrim(lpad(CAST({n} AS VARCHAR), 9, '0'), '0') "
            "ELSE '' END || 'Z'")


def q_azuremonitor_logs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.azuremonitor_export import azuremonitor_log_envelopes

    ev = load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    s = lambda c: c.cast("string")  # noqa: E731

    fx = ev.select(
        e.alias("i"),
        F.concat(F.lit("b-"), F.col("event_type")).alias("body"),
        F.when(e % 6 == 0, F.lit(0)).otherwise(
            F.lit(1700000000000000000) + e * 1234567).cast("bigint")
        .alias("ts_ns"),
        F.when(e % 30 == 0, F.lit(0)).otherwise(
            F.lit(1690000000000000000) + e * 1000000).cast("bigint")
        .alias("observed_ts_ns"),
        F.when(e % 13 == 0, F.lit("")).otherwise(
            F.lpad(F.lower(F.hex(F.lit(1000) + u)), 32, "0"))
        .alias("trace_id"),
        F.when(e % 11 == 0, F.lit("")).otherwise(
            F.lpad(F.lower(F.hex(e + 1)), 16, "0")).alias("span_id"),
        (e % 26).cast("int").alias("severity_number"),
        F.concat(F.lit("sev"), s(e % 5)).alias("severity_text"),
        _omap(
            (F.lit(True), "k", F.concat(F.lit("v"), s(e % 3))),
            (e % 10 == 0, "microsoft.custom_event.name",
             F.concat(F.lit("ce"), s(e % 3))),
            (e % 20 == 5, "APPLICATION_INSIGHTS_EVENT_MARKER_ATTRIBUTE",
             F.concat(F.lit("mk"), s(u % 2))),
            (e % 7 == 0, "exception.type",
             F.concat(F.lit("T"), s(e % 4))),
            (e % 7 == 0, "exception.message", F.lit("em")),
            (e % 14 == 0, "exception.stacktrace", F.lit("st")),
        ).alias("attrs"),
        _omap(
            (F.lit(True), "rk", F.concat(F.lit("rv"), s(u % 2))),
            (u % 5 != 0, "service.name",
             F.concat(F.lit("svc"), s(u % 3))),
            (u % 4 == 0, "service.namespace",
             F.concat(F.lit("ns"), s(u % 2))),
            (u % 3 == 0, "service.instance.id",
             F.concat(F.lit("inst"), s(u % 7))),
        ).alias("res_attrs"),
        F.when(u % 9 == 0, F.lit("")).otherwise(
            F.concat(F.lit("lib"), s(u % 2))).alias("scope_name"),
        F.when(u % 6 == 0, F.lit("")).otherwise(
            F.concat(F.lit("1."), s(u % 3))).alias("scope_version"),
    )

    return azuremonitor_log_envelopes(
        fx, id_cols=["i"], custom_events_enabled=True,
        exception_events_enabled=True)


_TS = ("CASE WHEN e % 6 <> 0 THEN 1700000000000000000 + e * 1234567 "
       "WHEN e % 30 <> 0 THEN 1690000000000000000 + e * 1000000 END")

O_AZUREMONITOR_LOGS = """
WITH a AS (
  SELECT event_id AS i, user_id AS u, event_id AS e, event_type,
         {ts} AS ts
  FROM events
), b AS (
  SELECT *,
    CASE WHEN e % 10 = 0 OR e % 20 = 5 THEN 'Event'
         WHEN e % 7 = 0 THEN 'Exception'
         ELSE 'Message' END AS kind,
    CASE WHEN e % 26 BETWEEN 1 AND 8 THEN 'Verbose'
         WHEN e % 26 BETWEEN 13 AND 16 THEN 'Warning'
         WHEN e % 26 BETWEEN 17 AND 20 THEN 'Error'
         WHEN e % 26 BETWEEN 21 AND 24 THEN 'Critical'
         ELSE 'Information' END AS sev,
    list_filter([
      CASE WHEN e % 20 = 5
           THEN 'APPLICATION_INSIGHTS_EVENT_MARKER_ATTRIBUTE=mk' ||
                CAST(u % 2 AS VARCHAR) END,
      CASE WHEN e % 7 = 0 THEN 'exception.message=em' END,
      CASE WHEN e % 14 = 0 THEN 'exception.stacktrace=st' END,
      CASE WHEN e % 7 = 0
           THEN 'exception.type=T' || CAST(e % 4 AS VARCHAR) END,
      'k=v' || CAST(e % 3 AS VARCHAR),
      CASE WHEN e % 10 = 0
           THEN 'microsoft.custom_event.name=ce' ||
                CAST(e % 3 AS VARCHAR) END
    ], x -> x IS NOT NULL) AS log_props,
    list_filter([
      CASE WHEN u % 9 <> 0 THEN 'instrumentationlibrary.name=lib' ||
           CAST(u % 2 AS VARCHAR) END,
      CASE WHEN u % 6 <> 0
           THEN 'instrumentationlibrary.version=1.' ||
                CAST(u % 3 AS VARCHAR) END,
      'rk=rv' || CAST(u % 2 AS VARCHAR),
      CASE WHEN u % 3 = 0 THEN 'service.instance.id=inst' ||
           CAST(u % 7 AS VARCHAR) END,
      CASE WHEN u % 5 <> 0
           THEN 'service.name=svc' || CAST(u % 3 AS VARCHAR) END,
      CASE WHEN u % 4 = 0
           THEN 'service.namespace=ns' || CAST(u % 2 AS VARCHAR) END
    ], x -> x IS NOT NULL) AS res_props
  FROM a
)
SELECT i, kind,
  'Microsoft.ApplicationInsights.' || kind AS envelope_name,
  CASE WHEN ts IS NOT NULL THEN {rfc} END AS time,
  CASE WHEN kind <> 'Event' THEN
    CASE WHEN e % 13 = 0 THEN ''
         ELSE lpad(lower(to_hex(1000 + u)), 32, '0') END END AS op_id,
  CASE WHEN kind <> 'Event' THEN
    CASE WHEN e % 11 = 0 THEN ''
         ELSE lpad(lower(to_hex(e + 1)), 16, '0') END END
    AS op_parent_id,
  CASE WHEN kind <> 'Event' AND u % 5 <> 0 THEN
    CASE WHEN u % 4 = 0
         THEN 'ns' || CAST(u % 2 AS VARCHAR) || '.svc' ||
              CAST(u % 3 AS VARCHAR)
         ELSE 'svc' || CAST(u % 3 AS VARCHAR) END END AS cloud_role,
  CASE WHEN kind <> 'Event' AND u % 3 = 0
       THEN 'inst' || CAST(u % 7 AS VARCHAR) END
    AS cloud_role_instance,
  CASE WHEN kind <> 'Event' THEN sev END AS severity_level,
  CASE WHEN kind = 'Event' THEN
    CASE WHEN e % 10 = 0 THEN 'ce' || CAST(e % 3 AS VARCHAR)
         ELSE 'mk' || CAST(u % 2 AS VARCHAR) END END AS event_name,
  CASE WHEN kind = 'Message' THEN 'b-' || event_type END AS message,
  CASE WHEN kind = 'Exception'
       THEN 'sev' || CAST(e % 5 AS VARCHAR) END AS problem_id,
  CASE WHEN kind = 'Exception' THEN 'em' END AS exc_message,
  CASE WHEN kind = 'Exception'
       THEN 'T' || CAST(e % 4 AS VARCHAR) END AS exc_type,
  CASE WHEN kind = 'Exception' THEN e % 14 = 0 END
    AS exc_has_full_stack,
  CASE WHEN kind = 'Exception' THEN
    CASE WHEN e % 14 = 0 THEN 'st' ELSE '' END END AS exc_stack,
  CASE WHEN kind = 'Event'
       THEN array_to_string(list_sort(log_props), ',')
       ELSE array_to_string(list_sort(res_props || log_props), ',')
       END AS properties
FROM b
""".format(ts=_TS,
           rfc=_RFC3339.format(s="ts // 1000000000",
                               n="ts % 1000000000"))


def q_azuremonitor_metrics(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    from ..operators.azuremonitor_export import (
        azuremonitor_metric_envelopes,
    )

    ev = load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    s = lambda c: c.cast("string")  # noqa: E731
    d = lambda c: c.cast("double")  # noqa: E731

    fx = ev.select(
        e.alias("i"),
        F.concat(F.lit("met"), s(e % 6)).alias("name"),
        F.when(e % 5 == 0, F.lit("gauge"))
        .when(e % 5 == 1, F.lit("sum"))
        .when(e % 5 == 2, F.lit("histogram"))
        .when(e % 5 == 3, F.lit("summary"))
        .when(e % 2 == 0, F.lit("exphist")).otherwise(F.lit("empty"))
        .alias("mtype"),
        (F.lit(1700000000000000000) + e * 1000000).cast("bigint")
        .alias("ts_ns"),
        _omap(
            (e % 7 != 0, "k", F.concat(F.lit("v"), s(e % 3))),
        ).alias("attrs"),
        _omap(
            (F.lit(True), "rk", F.concat(F.lit("rv"), s(u % 2))),
            (u % 5 != 0, "service.name",
             F.concat(F.lit("svc"), s(u % 3))),
            (u % 4 == 0, "service.namespace",
             F.concat(F.lit("ns"), s(u % 2))),
            (u % 3 == 0, "service.instance.id",
             F.concat(F.lit("inst"), s(u % 7))),
        ).alias("res_attrs"),
        F.when(u % 9 == 0, F.lit("")).otherwise(
            F.concat(F.lit("lib"), s(u % 2))).alias("scope_name"),
        F.when(u % 6 == 0, F.lit("")).otherwise(
            F.concat(F.lit("1."), s(u % 3))).alias("scope_version"),
        F.when(e % 35 == 0, F.lit(None).cast("boolean"))
        .otherwise(e % 2 == 0).alias("is_int"),
        (e % 100).cast("bigint").alias("vint"),
        d((u % 4) * 0.25).alias("vdouble"),
        (e % 50 + 2).cast("bigint").alias("count"),
        F.when(u % 4 != 0, d((u % 10) * 1.5)).alias("sum"),
        F.when(u % 5 != 0, F.lit(0.25)).cast("double").alias("min"),
        F.when(u % 6 != 0, d((u % 7) * 2.0)).alias("max"),
    )

    return azuremonitor_metric_envelopes(fx, id_cols=["i"])


O_AZUREMONITOR_METRICS = """
WITH a AS (
  SELECT event_id AS i, user_id AS u, event_id AS e,
         'met' || CAST(event_id % 6 AS VARCHAR) AS name,
         CASE WHEN event_id % 5 = 0 THEN 'gauge'
              WHEN event_id % 5 = 1 THEN 'sum'
              WHEN event_id % 5 = 2 THEN 'histogram'
              WHEN event_id % 5 = 3 THEN 'summary'
              WHEN event_id % 2 = 0 THEN 'exphist'
              ELSE 'empty' END AS mtype
  FROM events
)
SELECT i, name,
  {rfc} AS time,
  CASE WHEN mtype IN ('gauge', 'sum') THEN
    CASE WHEN e % 35 = 0 THEN 0.0
         WHEN e % 2 = 0 THEN CAST(e % 100 AS DOUBLE)
         ELSE CAST((u % 4) * 0.25 AS DOUBLE) END
  ELSE CASE WHEN u % 4 <> 0 THEN CAST((u % 10) * 1.5 AS DOUBLE)
       ELSE 0.0 END END AS value,
  CASE WHEN mtype IN ('gauge', 'sum') THEN 1
       ELSE e % 50 + 2 END AS dp_count,
  CASE WHEN mtype IN ('gauge', 'sum') THEN 'Measurement'
       ELSE 'Aggregation' END AS dp_kind,
  CASE WHEN mtype IN ('histogram', 'exphist') THEN
    CAST(CASE WHEN u % 5 <> 0 THEN 0.25 ELSE 0.0 END AS DOUBLE) END
    AS dp_min,
  CASE WHEN mtype IN ('histogram', 'exphist') THEN
    CASE WHEN u % 6 <> 0 THEN CAST((u % 7) * 2.0 AS DOUBLE)
         ELSE 0.0 END END AS dp_max,
  CASE WHEN u % 5 <> 0 THEN
    CASE WHEN u % 4 = 0
         THEN 'ns' || CAST(u % 2 AS VARCHAR) || '.svc' ||
              CAST(u % 3 AS VARCHAR)
         ELSE 'svc' || CAST(u % 3 AS VARCHAR) END END AS cloud_role,
  CASE WHEN u % 3 = 0 THEN 'inst' || CAST(u % 7 AS VARCHAR) END
    AS cloud_role_instance,
  array_to_string(list_sort(list_filter([
    CASE WHEN u % 9 <> 0 THEN 'instrumentationlibrary.name=lib' ||
         CAST(u % 2 AS VARCHAR) END,
    CASE WHEN u % 6 <> 0 THEN 'instrumentationlibrary.version=1.' ||
         CAST(u % 3 AS VARCHAR) END,
    CASE WHEN e % 7 <> 0 THEN 'k=v' || CAST(e % 3 AS VARCHAR) END,
    'rk=rv' || CAST(u % 2 AS VARCHAR),
    CASE WHEN u % 3 = 0 THEN 'service.instance.id=inst' ||
         CAST(u % 7 AS VARCHAR) END,
    CASE WHEN u % 5 <> 0
         THEN 'service.name=svc' || CAST(u % 3 AS VARCHAR) END,
    CASE WHEN u % 4 = 0
         THEN 'service.namespace=ns' || CAST(u % 2 AS VARCHAR) END
  ], x -> x IS NOT NULL)), ',') AS properties
FROM a WHERE mtype NOT IN ('empty')
""".format(rfc=_RFC3339.format(
    s="(1700000000000000000 + e * 1000000) // 1000000000",
    n="(1700000000000000000 + e * 1000000) % 1000000000"))


EXT26_QUERIES["azuremonitor_logs"] = q_azuremonitor_logs
EXT26_ORACLES["azuremonitor_logs"] = O_AZUREMONITOR_LOGS
EXT26_QUERIES["azuremonitor_metrics"] = q_azuremonitor_metrics
EXT26_ORACLES["azuremonitor_metrics"] = O_AZUREMONITOR_METRICS

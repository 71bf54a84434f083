"""Round-5 queries (cont. 13): OTLP -> ClickHouse insert-row models
(``exporter/clickhouseexporter``).

Three queries drive the three row families: logs (timestamp
fallback + severity + service name), traces (kind/status words,
duration, events/links parallel-array fan) and metrics (gauge/sum/
histogram/summary datapoint rows with getValue typing, exemplar fan,
temporality/monotonic markers). Oracles rebuild each column in SQL;
maps and arrays compare as sorted/joined CSV strings.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import QueryFn, load

EXT29_QUERIES: dict[str, QueryFn] = {}
EXT29_ORACLES: dict[str, str] = {}

_FLAT = ("array_join(array_sort(transform(map_entries({m}), "
         "kv -> concat(kv.key, '=', kv.value))), ',')")


def q_clickhouse_logs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.clickhouse_export import clickhouse_log_rows

    ev = load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    s = lambda c: c.cast("string")  # noqa: E731
    fx = ev.select(
        e.alias("i"),
        F.when(e % 5 == 0, F.lit(0)).otherwise(
            F.lit(1700000000_000000000) + e).cast("bigint")
        .alias("ts_ns"),
        (F.lit(1700000009_000000000) + e).cast("bigint")
        .alias("observed_ns"),
        F.when(e % 3 == 0, F.concat(F.lit("tid"), s(u)))
        .otherwise(F.lit("")).alias("trace_id"),
        F.when(e % 3 == 0, F.concat(F.lit("sid"), s(e)))
        .otherwise(F.lit("")).alias("span_id"),
        (e % 4).cast("int").alias("flags"),
        F.when(e % 2 == 0, F.lit("INFO")).otherwise(F.lit("ERROR"))
        .alias("severity_text"),
        F.when(e % 2 == 0, 9).otherwise(17).cast("int")
        .alias("severity_number"),
        F.concat(F.lit("body "), F.col("event_type")).alias("body"),
        F.lit("https://schema/1").alias("res_url"),
        F.when(u % 4 != 0,
               F.create_map(F.lit("service.name"),
                            F.concat(F.lit("svc"), s(u % 3)),
                            F.lit("host"), F.concat(F.lit("h"),
                                                    s(u % 2))))
        .otherwise(F.create_map(F.lit("host"), F.lit("h9")))
        .alias("res_attrs"),
        F.lit("").alias("scope_url"),
        F.concat(F.lit("lib"), s(u % 2)).alias("scope_name"),
        F.lit("1.0").alias("scope_version"),
        F.create_map(F.lit("sk"), s(u % 5)).alias("scope_attrs"),
        F.create_map(F.lit("k1"), s(e % 7)).alias("attrs"),
    )
    out = clickhouse_log_rows(fx, id_cols=["i"])
    return out.select(
        "i", "timestamp_ns", "trace_id", "span_id", "trace_flags",
        "severity_text", "severity_number", "service_name", "body",
        "resource_url",
        F.expr(_FLAT.format(m="resource_attributes")).alias("res_csv"),
        "scope_url", "scope_name", "scope_version",
        F.expr(_FLAT.format(m="scope_attributes")).alias("scope_csv"),
        F.expr(_FLAT.format(m="log_attributes")).alias("attr_csv"),
    )


O_CH_LOGS = """
SELECT event_id AS i,
  CASE WHEN event_id % 5 = 0 THEN 1700000009000000000 + event_id
       ELSE 1700000000000000000 + event_id END AS timestamp_ns,
  CASE WHEN event_id % 3 = 0 THEN 'tid' || CAST(user_id AS VARCHAR)
       ELSE '' END AS trace_id,
  CASE WHEN event_id % 3 = 0 THEN 'sid' || CAST(event_id AS VARCHAR)
       ELSE '' END AS span_id,
  CAST(event_id % 4 AS INT) AS trace_flags,
  CASE WHEN event_id % 2 = 0 THEN 'INFO' ELSE 'ERROR'
    END AS severity_text,
  CASE WHEN event_id % 2 = 0 THEN 9 ELSE 17 END AS severity_number,
  CASE WHEN user_id % 4 <> 0 THEN 'svc' || CAST(user_id % 3 AS VARCHAR)
       ELSE '' END AS service_name,
  'body ' || event_type AS body,
  'https://schema/1' AS resource_url,
  CASE WHEN user_id % 4 <> 0 THEN
    'host=h' || CAST(user_id % 2 AS VARCHAR)
    || ',service.name=svc' || CAST(user_id % 3 AS VARCHAR)
  ELSE 'host=h9' END AS res_csv,
  '' AS scope_url,
  'lib' || CAST(user_id % 2 AS VARCHAR) AS scope_name,
  '1.0' AS scope_version,
  'sk=' || CAST(user_id % 5 AS VARCHAR) AS scope_csv,
  'k1=' || CAST(event_id % 7 AS VARCHAR) AS attr_csv
FROM events
"""


def q_clickhouse_traces(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.clickhouse_export import clickhouse_trace_rows

    ev = load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    s = lambda c: c.cast("string")  # noqa: E731
    fx = ev.select(
        e.alias("i"),
        (F.lit(1700000000_000000000) + e).cast("bigint")
        .alias("start_ns"),
        (F.lit(1700000000_000000000) + e + e % 997 + 1).cast("bigint")
        .alias("end_ns"),
        F.concat(F.lit("t"), s(u)).alias("trace_id"),
        F.concat(F.lit("s"), s(e)).alias("span_id"),
        F.when(e % 3 == 0, F.lit("")).otherwise(
            F.concat(F.lit("p"), s(e))).alias("parent_span_id"),
        F.when(e % 4 == 0, F.lit("a=b")).otherwise(F.lit(""))
        .alias("trace_state"),
        F.concat(F.lit("op-"), F.col("event_type")).alias("name"),
        (e % 7).cast("int").alias("kind"),
        (e % 4).cast("int").alias("status_code"),
        F.when(e % 4 == 2, F.lit("bad")).otherwise(F.lit(""))
        .alias("status_message"),
        F.when(u % 5 != 0,
               F.create_map(F.lit("service.name"),
                            F.concat(F.lit("svc"), s(u % 3))))
        .otherwise(F.create_map(F.lit("r"), F.lit("x")))
        .alias("res_attrs"),
        F.concat(F.lit("lib"), s(u % 2)).alias("scope_name"),
        F.lit("2.0").alias("scope_version"),
        F.create_map(F.lit("ak"), s(e % 5)).alias("attrs"),
        F.when(e % 6 == 0, F.array(
            F.struct((F.lit(1700000000_000000000) + e + 1)
                     .cast("bigint").alias("ts_ns"),
                     F.lit("ev1").alias("name"),
                     F.create_map(F.lit("x"), s(e % 2)).alias("attrs")),
            F.struct((F.lit(1700000000_000000000) + e + 2)
                     .cast("bigint").alias("ts_ns"),
                     F.lit("ev2").alias("name"),
                     F.create_map().cast("map<string,string>")
                     .alias("attrs")),
        )).alias("events"),
        F.when(e % 8 == 0, F.array(
            F.struct(F.concat(F.lit("lt"), s(u % 3)).alias("trace_id"),
                     F.concat(F.lit("ls"), s(e % 3)).alias("span_id"),
                     F.lit("st=1").alias("trace_state"),
                     F.create_map(F.lit("lk"), F.lit("lv"))
                     .alias("attrs")),
        )).alias("links"),
    )
    out = clickhouse_trace_rows(fx, id_cols=["i"])
    return out.select(
        "i", "timestamp_ns", "trace_id", "span_id", "parent_span_id",
        "trace_state", "span_name", "span_kind", "service_name",
        "scope_name", "scope_version", "duration_ns", "status_code",
        "status_message",
        F.array_join(F.transform(F.col("events_timestamp"),
                                 lambda t: t.cast("string")), ";")
        .alias("ev_ts_csv"),
        F.array_join(F.col("events_name"), ";").alias("ev_name_csv"),
        F.array_join(F.transform(
            F.col("events_attributes"),
            lambda m: F.coalesce(
                F.array_join(F.array_sort(F.transform(
                    F.map_entries(m),
                    lambda kv: F.concat(kv["key"], F.lit("="),
                                        kv["value"]))), ","),
                F.lit(""))), ";").alias("ev_attr_csv"),
        F.array_join(F.col("links_trace_id"), ";").alias("lk_tid_csv"),
        F.array_join(F.col("links_span_id"), ";").alias("lk_sid_csv"),
        F.array_join(F.col("links_trace_state"), ";")
        .alias("lk_state_csv"),
    )


O_CH_TRACES = """
SELECT event_id AS i,
  1700000000000000000 + event_id AS timestamp_ns,
  't' || CAST(user_id AS VARCHAR) AS trace_id,
  's' || CAST(event_id AS VARCHAR) AS span_id,
  CASE WHEN event_id % 3 = 0 THEN ''
       ELSE 'p' || CAST(event_id AS VARCHAR) END AS parent_span_id,
  CASE WHEN event_id % 4 = 0 THEN 'a=b' ELSE '' END AS trace_state,
  'op-' || event_type AS span_name,
  CASE event_id % 7 WHEN 1 THEN 'Internal' WHEN 2 THEN 'Server'
    WHEN 3 THEN 'Client' WHEN 4 THEN 'Producer' WHEN 5 THEN 'Consumer'
    ELSE 'Unspecified' END AS span_kind,
  CASE WHEN user_id % 5 <> 0 THEN 'svc' || CAST(user_id % 3 AS VARCHAR)
       ELSE '' END AS service_name,
  'lib' || CAST(user_id % 2 AS VARCHAR) AS scope_name,
  '2.0' AS scope_version,
  event_id % 997 + 1 AS duration_ns,
  CASE event_id % 4 WHEN 1 THEN 'Ok' WHEN 2 THEN 'Error'
    ELSE 'Unset' END AS status_code,
  CASE WHEN event_id % 4 = 2 THEN 'bad' ELSE '' END AS status_message,
  CASE WHEN event_id % 6 = 0 THEN
    CAST(1700000000000000000 + event_id + 1 AS VARCHAR) || ';' ||
    CAST(1700000000000000000 + event_id + 2 AS VARCHAR)
  ELSE '' END AS ev_ts_csv,
  CASE WHEN event_id % 6 = 0 THEN 'ev1;ev2' ELSE '' END AS ev_name_csv,
  CASE WHEN event_id % 6 = 0
    THEN 'x=' || CAST(event_id % 2 AS VARCHAR) || ';'
  ELSE '' END AS ev_attr_csv,
  CASE WHEN event_id % 8 = 0 THEN 'lt' || CAST(user_id % 3 AS VARCHAR)
       ELSE '' END AS lk_tid_csv,
  CASE WHEN event_id % 8 = 0 THEN 'ls' || CAST(event_id % 3 AS VARCHAR)
       ELSE '' END AS lk_sid_csv,
  CASE WHEN event_id % 8 = 0 THEN 'st=1' ELSE '' END AS lk_state_csv
FROM events
"""


def q_clickhouse_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.clickhouse_export import (
        clickhouse_gauge_rows, clickhouse_histogram_rows,
        clickhouse_sum_rows, clickhouse_summary_rows)

    ev = load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    s = lambda c: c.cast("string")  # noqa: E731
    base = ev.select(
        e.alias("i"), u.alias("u"), e.alias("e"),
        F.create_map(F.lit("service.name"),
                     F.concat(F.lit("m"), s(u % 3))).alias("res_attrs"),
        F.lit("resurl").alias("res_url"),
        F.concat(F.lit("sc"), s(u % 2)).alias("scope_name"),
        F.lit("3.1").alias("scope_version"),
        F.create_map(F.lit("sa"), s(u % 4)).alias("scope_attrs"),
        (u % 3).cast("int").alias("scope_dropped"),
        F.lit("scurl").alias("scope_url"),
        F.concat(F.lit("metric."), F.col("event_type"))
        .alias("metric_name"),
        F.lit("desc").alias("metric_description"),
        F.lit("1").alias("metric_unit"),
        F.create_map(F.lit("dim"), s(e % 9)).alias("attrs"),
        (F.lit(1700000000_000000000) + e).cast("bigint")
        .alias("start_ns"),
        (F.lit(1700000001_000000000) + e).cast("bigint")
        .alias("ts_ns"),
        (e % 3).cast("int").alias("value_type"),
        (e % 100).cast("bigint").alias("value_int"),
        (F.col("value")).alias("value_double"),
        (e % 2).cast("int").alias("flags"),
        F.when(e % 10 == 0, F.array(F.struct(
            (F.lit(1700000000_500000000) + e).cast("bigint")
            .alias("ts_ns"),
            (e % 50).cast("bigint").alias("value_int"),
            F.lit(0.5).alias("value_double"),
            F.when(e % 2 == 0, 1).otherwise(2).cast("int")
            .alias("value_type"),
            F.concat(F.lit("xt"), s(u % 2)).alias("trace_id"),
            F.concat(F.lit("xs"), s(e % 2)).alias("span_id"),
            F.create_map(F.lit("ek"), F.lit("ev")).alias("attrs"),
        ))).alias("exemplars"),
        (e % 2 + 1).cast("int").alias("temporality"),
        (e % 3 == 0).alias("is_monotonic"),
        (e % 1000).cast("bigint").alias("count"),
        (F.col("value") * 2).alias("sum"),
        F.array((e % 5).cast("bigint"), (e % 7).cast("bigint"))
        .alias("bucket_counts"),
        F.array(F.lit(0.5), F.lit(2.5)).alias("explicit_bounds"),
        (F.col("value") / 10).alias("min"),
        (F.col("value") * 10).alias("max"),
        F.array(F.struct(F.lit(0.5).alias("q"),
                         (F.col("value") / 2).alias("v")),
                F.struct(F.lit(0.99).alias("q"),
                         F.col("value").alias("v")))
        .alias("quantiles"),
    )

    def flat(df: DataFrame, sig: str, extra: list) -> DataFrame:
        return df.select(
            "i", F.lit(sig).alias("signal"), "service_name",
            "metric_name", "time_ns", "start_time_ns",
            F.expr(_FLAT.format(m="attributes")).alias("attr_csv"),
            F.col("scope_dropped_attr_count"),
            *extra)

    null_d = F.lit(None).cast("double")
    null_l = F.lit(None).cast("bigint")
    null_s = F.lit(None).cast("string")
    gauge = flat(
        clickhouse_gauge_rows(base.filter(F.col("e") % 4 == 0),
                              id_cols=["i"]), "gauge",
        [F.col("value"), null_l.alias("count"),
         null_d.alias("sum_v"),
         F.coalesce(F.array_join(F.transform(
             F.col("exemplars_value"),
             lambda v: v.cast("string")), ";"), F.lit(""))
         .alias("ex_csv"),
         null_s.alias("extra_csv")])
    sum_ = flat(
        clickhouse_sum_rows(base.filter(F.col("e") % 4 == 1),
                            id_cols=["i"]), "sum",
        [F.col("value"), null_l.alias("count"), null_d.alias("sum_v"),
         F.coalesce(F.array_join(F.transform(
             F.col("exemplars_trace_id"), lambda v: v), ";"),
             F.lit("")).alias("ex_csv"),
         F.concat(F.col("aggregation_temporality").cast("string"),
                  F.lit("|"), F.col("is_monotonic").cast("string"))
         .alias("extra_csv")])
    hist = flat(
        clickhouse_histogram_rows(base.filter(F.col("e") % 4 == 2),
                                  id_cols=["i"]), "histogram",
        [null_d.alias("value"), F.col("count"),
         F.col("sum").alias("sum_v"),
         F.array_join(F.transform(F.col("bucket_counts"),
                                  lambda v: v.cast("string")), ";")
         .alias("ex_csv"),
         F.concat(F.col("min").cast("string"), F.lit("|"),
                  F.col("max").cast("string"), F.lit("|"),
                  F.col("aggregation_temporality").cast("string"))
         .alias("extra_csv")])
    summ = flat(
        clickhouse_summary_rows(base.filter(F.col("e") % 4 == 3),
                                id_cols=["i"]), "summary",
        [null_d.alias("value"), F.col("count"),
         F.col("sum").alias("sum_v"),
         F.array_join(F.transform(F.col("value_at_quantiles_q"),
                                  lambda v: v.cast("string")), ";")
         .alias("ex_csv"),
         F.array_join(F.transform(F.col("value_at_quantiles_value"),
                                  lambda v: v.cast("string")), ";")
         .alias("extra_csv")])
    return gauge.unionByName(sum_).unionByName(hist).unionByName(summ)


O_CH_METRICS = """
WITH b AS (
  SELECT event_id AS i, user_id AS u, event_id AS e, event_type,
         value FROM events
)
SELECT i,
  CASE e % 4 WHEN 0 THEN 'gauge' WHEN 1 THEN 'sum'
    WHEN 2 THEN 'histogram' ELSE 'summary' END AS signal,
  'm' || CAST(u % 3 AS VARCHAR) AS service_name,
  'metric.' || event_type AS metric_name,
  1700000001000000000 + e AS time_ns,
  1700000000000000000 + e AS start_time_ns,
  'dim=' || CAST(e % 9 AS VARCHAR) AS attr_csv,
  CAST(u % 3 AS INT) AS scope_dropped_attr_count,
  CASE WHEN e % 4 <= 1 THEN
    CASE e % 3 WHEN 1 THEN CAST(e % 100 AS DOUBLE)
      WHEN 2 THEN value ELSE 0.0 END
  END AS value,
  CASE WHEN e % 4 >= 2 THEN e % 1000 END AS count,
  CASE WHEN e % 4 >= 2 THEN value * 2 END AS sum_v,
  CASE
    WHEN e % 4 = 0 THEN
      CASE WHEN e % 10 = 0 THEN
        CASE WHEN e % 2 = 0 THEN CAST(CAST(e % 50 AS DOUBLE) AS VARCHAR)
             ELSE '0.5' END
      ELSE '' END
    WHEN e % 4 = 1 THEN
      CASE WHEN e % 10 = 0 THEN 'xt' || CAST(u % 2 AS VARCHAR)
        ELSE '' END
    WHEN e % 4 = 2 THEN
      CAST(e % 5 AS VARCHAR) || ';' || CAST(e % 7 AS VARCHAR)
    ELSE '0.5;0.99' END AS ex_csv,
  CASE
    WHEN e % 4 = 0 THEN NULL
    WHEN e % 4 = 1 THEN CAST(e % 2 + 1 AS VARCHAR) || '|' ||
      CASE WHEN e % 3 = 0 THEN 'true' ELSE 'false' END
    WHEN e % 4 = 2 THEN CAST(value / 10 AS VARCHAR) || '|' ||
      CAST(value * 10 AS VARCHAR) || '|' || CAST(e % 2 + 1 AS VARCHAR)
    ELSE CAST(value / 2 AS VARCHAR) || ';' || CAST(value AS VARCHAR)
  END AS extra_csv
FROM b
"""

EXT29_QUERIES["clickhouse_logs"] = q_clickhouse_logs
EXT29_ORACLES["clickhouse_logs"] = O_CH_LOGS
EXT29_QUERIES["clickhouse_traces"] = q_clickhouse_traces
EXT29_ORACLES["clickhouse_traces"] = O_CH_TRACES
EXT29_QUERIES["clickhouse_metrics"] = q_clickhouse_metrics
EXT29_ORACLES["clickhouse_metrics"] = O_CH_METRICS

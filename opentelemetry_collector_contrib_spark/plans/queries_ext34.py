"""Round-5 queries (cont. 18): OTLP -> Apache Doris stream-load rows
(``exporter/dorisexporter``).

``doris_rows`` drives the log + trace row models (the trimmed-µs
"2006-01-02 15:04:05.999999" rendering, proto kind/status words, µs
duration, event/link fans); ``doris_metrics`` the four metric-type
models (number getValue, exemplar fan, temporality words,
histogram/summary columns).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import QueryFn, load

EXT34_QUERIES: dict[str, QueryFn] = {}
EXT34_ORACLES: dict[str, str] = {}

_FLAT = ("array_join(array_sort(transform(map_entries({m}), "
         "kv -> concat(kv.key, '=', kv.value))), ',')")

# DuckDB twin of the trimmed-µs doris time rendering
_DTIME = ("strftime((TIMESTAMP '1970-01-01 00:00:00' + "
          "to_microseconds(({ns}) // 1000)), '%Y-%m-%d %H:%M:%S') || "
          "CASE WHEN ({ns}) % 1000000000 // 1000 > 0 THEN '.' || "
          "rtrim(lpad(CAST(({ns}) % 1000000000 // 1000 AS VARCHAR), "
          "6, '0'), '0') ELSE '' END")


def q_doris_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.doris_export import (doris_log_rows,
                                          doris_trace_rows)

    ev = load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    s = lambda c: c.cast("string")  # noqa: E731
    res = (F.when(u % 4 != 0,
                  F.create_map(F.lit("service.name"),
                               F.concat(F.lit("svc"), s(u % 3)),
                               F.lit("service.instance.id"),
                               F.concat(F.lit("inst"), s(u % 2))))
           .otherwise(F.create_map(F.lit("rk"), F.lit("x"))))
    logs = ev.filter(e % 2 == 0).select(
        e.alias("i"),
        (F.lit(1700000000_000000000) + e * 1_000 + e % 7 * 1000)
        .cast("bigint").alias("ts_ns"),
        F.concat(F.lit("t"), s(u)).alias("trace_id"),
        F.concat(F.lit("s"), s(e)).alias("span_id"),
        (e % 25).cast("int").alias("severity_number"),
        F.lit("INFO").alias("severity_text"),
        F.concat(F.lit("b "), F.col("event_type")).alias("body"),
        res.alias("res_attrs"),
        F.create_map(F.lit("ak"), s(e % 5)).alias("attrs"),
        F.concat(F.lit("lib"), s(u % 2)).alias("scope_name"),
        F.lit("1.0").alias("scope_version"),
    )
    spans = ev.filter(e % 2 == 1).select(
        e.alias("i"),
        (F.lit(1700000000_000000000) + e * 1_000).cast("bigint")
        .alias("start_ns"),
        (F.lit(1700000000_000000000) + e * 1_000 + e % 97 * 1_000_000)
        .cast("bigint").alias("end_ns"),
        F.concat(F.lit("t"), s(u)).alias("trace_id"),
        F.concat(F.lit("s"), s(e)).alias("span_id"),
        F.when(e % 5 == 0, F.lit("w3c=1")).otherwise(F.lit(""))
        .alias("trace_state"),
        F.when(e % 3 == 0, F.lit("")).otherwise(
            F.concat(F.lit("p"), s(e))).alias("parent_span_id"),
        F.concat(F.lit("op-"), F.col("event_type")).alias("name"),
        (e % 7).cast("int").alias("kind"),
        (e % 4).cast("int").alias("status_code"),
        F.when(e % 4 == 2, F.lit("bad")).otherwise(F.lit(""))
        .alias("status_message"),
        res.alias("res_attrs"),
        F.create_map(F.lit("ak"), s(e % 5)).alias("attrs"),
        F.concat(F.lit("lib"), s(u % 2)).alias("scope_name"),
        F.lit("1.0").alias("scope_version"),
        F.when(e % 9 == 0, F.array(F.struct(
            (F.lit(1700000000_000000000) + e * 1_000 + 500)
            .cast("bigint").alias("ts_ns"),
            F.lit("ev1").alias("name"),
            F.create_map(F.lit("x"), s(e % 2)).alias("attrs"),
        ))).alias("events"),
        F.when(e % 11 == 0, F.array(F.struct(
            F.concat(F.lit("lt"), s(u % 3)).alias("trace_id"),
            F.concat(F.lit("ls"), s(e % 3)).alias("span_id"),
            F.lit("st=1").alias("trace_state"),
            F.create_map(F.lit("lk"), F.lit("lv")).alias("attrs"),
        ))).alias("links"),
    )
    lr = doris_log_rows(logs, id_cols=["i"]).select(
        "i", F.lit("log").alias("row_kind"), "service_name",
        "service_instance_id", "timestamp",
        F.col("severity_number").alias("n1"),
        F.lit(None).cast("bigint").alias("duration"),
        F.concat_ws("|", "trace_id", "span_id", "severity_text",
                    "body", "scope_name", "scope_version").alias("s1"),
        F.expr(_FLAT.format(m="resource_attributes")).alias("res_csv"),
        F.expr(_FLAT.format(m="log_attributes")).alias("attr_csv"),
        F.lit("").alias("extra_csv"),
    )
    tr = doris_trace_rows(spans, id_cols=["i"]).select(
        "i", F.lit("span").alias("row_kind"), "service_name",
        "service_instance_id", "timestamp",
        F.lit(None).cast("int").alias("n1"),
        F.col("duration"),
        F.concat_ws("|", "trace_id", "span_id", "trace_state",
                    "parent_span_id", "span_name", "span_kind",
                    "end_time", "status_message", "status_code",
                    "scope_name", "scope_version").alias("s1"),
        F.expr(_FLAT.format(m="resource_attributes")).alias("res_csv"),
        F.expr(_FLAT.format(m="span_attributes")).alias("attr_csv"),
        F.concat(
            F.coalesce(F.array_join(F.transform(
                F.col("events"),
                lambda x: F.concat(x["timestamp"], F.lit("~"),
                                   x["name"])), ";"), F.lit("")),
            F.lit("/"),
            F.coalesce(F.array_join(F.transform(
                F.col("links"),
                lambda x: F.concat(x["trace_id"], F.lit("~"),
                                   x["span_id"], F.lit("~"),
                                   x["trace_state"])), ";"),
                F.lit(""))).alias("extra_csv"),
    )
    return lr.unionByName(tr)


_LOG_TS = "1700000000000000000 + e * 1000 + e % 7 * 1000"
_SPAN_TS = "1700000000000000000 + e * 1000"
_SPAN_END = "1700000000000000000 + e * 1000 + e % 97 * 1000000"
_EV_TS = "1700000000000000000 + e * 1000 + 500"

O_DORIS_ROWS = f"""
WITH b AS (
  SELECT event_id AS i, user_id AS u, event_id AS e, event_type
  FROM events
), c AS (
  SELECT *,
    CASE WHEN u % 4 <> 0 THEN 'svc' || CAST(u % 3 AS VARCHAR)
         ELSE '' END AS svc,
    CASE WHEN u % 4 <> 0 THEN 'inst' || CAST(u % 2 AS VARCHAR)
         ELSE '' END AS inst,
    CASE WHEN u % 4 <> 0 THEN
      'service.instance.id=inst' || CAST(u % 2 AS VARCHAR)
      || ',service.name=svc' || CAST(u % 3 AS VARCHAR)
    ELSE 'rk=x' END AS res_csv
  FROM b
)
SELECT i, 'log' AS row_kind, svc AS service_name,
  inst AS service_instance_id,
  {_DTIME.format(ns=_LOG_TS)} AS timestamp,
  CAST(e % 25 AS INT) AS n1,
  CAST(NULL AS BIGINT) AS duration,
  't' || CAST(u AS VARCHAR) || '|s' || CAST(e AS VARCHAR)
    || '|INFO|b ' || event_type || '|lib' || CAST(u % 2 AS VARCHAR)
    || '|1.0' AS s1,
  res_csv,
  'ak=' || CAST(e % 5 AS VARCHAR) AS attr_csv,
  '' AS extra_csv
FROM c WHERE e % 2 = 0
UNION ALL
SELECT i, 'span', svc, inst,
  {_DTIME.format(ns=_SPAN_TS)},
  NULL,
  (e % 97 * 1000000) // 1000,
  't' || CAST(u AS VARCHAR) || '|s' || CAST(e AS VARCHAR) || '|'
    || CASE WHEN e % 5 = 0 THEN 'w3c=1' ELSE '' END || '|'
    || CASE WHEN e % 3 = 0 THEN ''
       ELSE 'p' || CAST(e AS VARCHAR) END
    || '|op-' || event_type || '|'
    || CASE e % 7 WHEN 1 THEN 'SPAN_KIND_INTERNAL'
       WHEN 2 THEN 'SPAN_KIND_SERVER' WHEN 3 THEN 'SPAN_KIND_CLIENT'
       WHEN 4 THEN 'SPAN_KIND_PRODUCER'
       WHEN 5 THEN 'SPAN_KIND_CONSUMER'
       ELSE 'SPAN_KIND_UNSPECIFIED' END
    || '|' || {_DTIME.format(ns=_SPAN_END)} || '|'
    || CASE WHEN e % 4 = 2 THEN 'bad' ELSE '' END || '|'
    || CASE e % 4 WHEN 1 THEN 'STATUS_CODE_OK'
       WHEN 2 THEN 'STATUS_CODE_ERROR' ELSE 'STATUS_CODE_UNSET' END
    || '|lib' || CAST(u % 2 AS VARCHAR) || '|1.0',
  res_csv,
  'ak=' || CAST(e % 5 AS VARCHAR),
  CASE WHEN e % 9 = 0 THEN {_DTIME.format(ns=_EV_TS)} || '~ev1'
    ELSE '' END || '/' ||
  CASE WHEN e % 11 = 0 THEN 'lt' || CAST(u % 3 AS VARCHAR)
    || '~ls' || CAST(e % 3 AS VARCHAR) || '~st=1' ELSE '' END
FROM c WHERE e % 2 = 1
"""


def q_doris_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.doris_export import (doris_gauge_rows,
                                          doris_histogram_rows,
                                          doris_sum_rows,
                                          doris_summary_rows)

    ev = load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    s = lambda c: c.cast("string")  # noqa: E731
    base = ev.select(
        e.alias("i"), e.alias("e"),
        F.create_map(F.lit("service.name"),
                     F.concat(F.lit("m"), s(u % 3))).alias("res_attrs"),
        F.concat(F.lit("mx."), F.col("event_type"))
        .alias("metric_name"),
        F.lit("d").alias("metric_description"),
        F.lit("ms").alias("metric_unit"),
        F.concat(F.lit("sc"), s(u % 2)).alias("scope_name"),
        F.lit("2.0").alias("scope_version"),
        F.create_map(F.lit("dim"), s(e % 9)).alias("attrs"),
        (F.lit(1700000000_000000000) + e * 1_000).cast("bigint")
        .alias("start_ns"),
        (F.lit(1700000001_000000000) + e * 1_000).cast("bigint")
        .alias("ts_ns"),
        (e % 3).cast("int").alias("value_type"),
        (e % 100).cast("bigint").alias("value_int"),
        F.col("value").alias("value_double"),
        F.when(e % 10 == 0, F.array(F.struct(
            (F.lit(1700000000_500000000) + e * 1_000).cast("bigint")
            .alias("ts_ns"),
            (e % 50).cast("bigint").alias("value_int"),
            F.lit(0.25).alias("value_double"),
            F.when(e % 2 == 0, 1).otherwise(2).cast("int")
            .alias("value_type"),
            F.concat(F.lit("xt"), s(u % 2)).alias("trace_id"),
            F.concat(F.lit("xs"), s(e % 2)).alias("span_id"),
            F.create_map(F.lit("ek"), F.lit("ev")).alias("attrs"),
        ))).alias("exemplars"),
        (e % 3).cast("int").alias("temporality"),
        (e % 5 == 0).alias("is_monotonic"),
        (e % 1000).cast("bigint").alias("count"),
        (F.col("value") * 2).alias("sum"),
        F.array((e % 5).cast("bigint"), (e % 7).cast("bigint"))
        .alias("bucket_counts"),
        F.array(F.lit(0.5), F.lit(2.5)).alias("explicit_bounds"),
        (F.col("value") / 10).alias("min"),
        (F.col("value") * 10).alias("max"),
        F.array(F.struct(F.lit(0.5).alias("q"),
                         (e % 13).cast("double").alias("v")))
        .alias("quantiles"),
    )

    def flat(df: DataFrame, sig: str, extra: list) -> DataFrame:
        return df.select(
            "i", F.lit(sig).alias("signal"), "service_name",
            "metric_name", "timestamp", "start_time",
            F.expr(_FLAT.format(m="attributes")).alias("attr_csv"),
            *extra)

    null_d = F.lit(None).cast("double")
    ex_csv = F.coalesce(F.array_join(F.transform(
        F.col("exemplars"),
        lambda x: F.concat(x["timestamp"], F.lit("~"),
                           x["value"].cast("string"), F.lit("~"),
                           x["trace_id"], F.lit("~"), x["span_id"])),
        ";"), F.lit(""))
    gauge = flat(doris_gauge_rows(base.filter(F.col("e") % 4 == 0),
                                  id_cols=["i"]), "gauge",
                 [F.col("value"), ex_csv.alias("ex_csv"),
                  F.lit("").alias("extra")])
    sum_ = flat(doris_sum_rows(base.filter(F.col("e") % 4 == 1),
                               id_cols=["i"]), "sum",
                [F.col("value"), ex_csv.alias("ex_csv"),
                 F.concat(F.col("aggregation_temporality"),
                          F.lit("|"),
                          F.col("is_monotonic").cast("string"))
                 .alias("extra")])
    hist = flat(doris_histogram_rows(base.filter(F.col("e") % 4 == 2),
                                     id_cols=["i"]), "histogram",
                [null_d.alias("value"), ex_csv.alias("ex_csv"),
                 F.concat(F.col("count").cast("string"), F.lit("|"),
                          F.col("sum").cast("string"), F.lit("|"),
                          F.array_join(F.transform(
                              F.col("bucket_counts"),
                              lambda v: v.cast("string")), ";"),
                          F.lit("|"),
                          F.col("min").cast("string"), F.lit("|"),
                          F.col("max").cast("string"), F.lit("|"),
                          F.col("aggregation_temporality"))
                 .alias("extra")])
    summ = flat(doris_summary_rows(base.filter(F.col("e") % 4 == 3),
                                   id_cols=["i"]), "summary",
                [null_d.alias("value"), F.lit("").alias("ex_csv"),
                 F.concat(F.col("count").cast("string"), F.lit("|"),
                          F.col("sum").cast("string"), F.lit("|"),
                          F.array_join(F.transform(
                              F.col("quantile_values"),
                              lambda x: F.concat(
                                  x["quantile"].cast("string"),
                                  F.lit("~"),
                                  x["value"].cast("string"))), ";"))
                 .alias("extra")])
    return gauge.unionByName(sum_).unionByName(hist).unionByName(summ)


_M_TS = "1700000001000000000 + e * 1000"
_M_START = "1700000000000000000 + e * 1000"
_EX_TS = "1700000000500000000 + e * 1000"

O_DORIS_METRICS = f"""
WITH b AS (
  SELECT event_id AS i, user_id AS u, event_id AS e, event_type,
         value,
         CASE e % 3 WHEN 1 THEN CAST(e % 100 AS DOUBLE)
           WHEN 2 THEN value ELSE 0.0 END AS numval,
         CASE WHEN e % 10 = 0 THEN
           {_DTIME.format(ns=_EX_TS)} || '~' ||
           CASE WHEN e % 2 = 0
             THEN CAST(CAST(e % 50 AS DOUBLE) AS VARCHAR)
             ELSE '0.25' END
           || '~xt' || CAST(u % 2 AS VARCHAR)
           || '~xs' || CAST(e % 2 AS VARCHAR)
         ELSE '' END AS ex_csv,
         CASE e % 3 WHEN 1 THEN 'Delta' WHEN 2 THEN 'Cumulative'
           ELSE 'Unspecified' END AS tempo
  FROM events
)
SELECT i,
  CASE e % 4 WHEN 0 THEN 'gauge' WHEN 1 THEN 'sum'
    WHEN 2 THEN 'histogram' ELSE 'summary' END AS signal,
  'm' || CAST(u % 3 AS VARCHAR) AS service_name,
  'mx.' || event_type AS metric_name,
  {_DTIME.format(ns=_M_TS)} AS timestamp,
  {_DTIME.format(ns=_M_START)} AS start_time,
  'dim=' || CAST(e % 9 AS VARCHAR) AS attr_csv,
  CASE WHEN e % 4 <= 1 THEN numval END AS value,
  CASE WHEN e % 4 <= 2 THEN ex_csv ELSE '' END AS ex_csv,
  CASE e % 4
    WHEN 0 THEN ''
    WHEN 1 THEN tempo || '|' ||
      CASE WHEN e % 5 = 0 THEN 'true' ELSE 'false' END
    WHEN 2 THEN CAST(e % 1000 AS VARCHAR) || '|'
      || CAST(value * 2 AS VARCHAR) || '|'
      || CAST(e % 5 AS VARCHAR) || ';' || CAST(e % 7 AS VARCHAR)
      || '|' || CAST(value / 10 AS VARCHAR) || '|'
      || CAST(value * 10 AS VARCHAR) || '|' || tempo
    ELSE CAST(e % 1000 AS VARCHAR) || '|'
      || CAST(value * 2 AS VARCHAR) || '|0.5~'
      || CAST(CAST(e % 13 AS DOUBLE) AS VARCHAR)
  END AS extra
FROM b
"""

EXT34_QUERIES["doris_rows"] = q_doris_rows
EXT34_ORACLES["doris_rows"] = O_DORIS_ROWS
EXT34_QUERIES["doris_metrics"] = q_doris_metrics
EXT34_ORACLES["doris_metrics"] = O_DORIS_METRICS

"""Apache Doris EXPORT translator: OTLP logs/traces/metrics -> the
Doris exporter's stream-load row models
(``exporter/dorisexporter/exporter_{logs,traces}.go`` +
``metrics_{model,gauge,sum,histogram,summary}.go``).

- time rendering — exporter_common.go:21,44-46: "2006-01-02
  15:04:05.999999" in the configured zone (UTC here) — µs precision
  with TRAILING ZEROS TRIMMED (Go's .999999 directive), and no dot
  when the fraction is zero
- log rows      — exporter_logs.go:96-142: service.name /
  service.instance.id resource extraction, hex ids, severity, Body
  AsString, res/log attr maps, scope name/version
- trace rows    — exporter_traces.go:140-225: trace state, SPAN_KIND_*
  / STATUS_CODE_* proto words, end_time + µs duration, event
  (formatted ts/name/attrs) and link fans
- metric rows   — metrics_model.go:35-44 + per-type models: shared
  service/metric/scope columns, number value int-else-double-else-0
  (exporter_metrics.go:291-304), exemplar fan with formatted
  timestamps, sum temporality word (.String(): Unspecified/Delta/
  Cumulative) + is_monotonic, histogram count/sum/buckets/bounds/
  min/max/temporality, summary quantile structs

All zero-shuffle projections; stream-load transport, DDL and the
materialized trace-graph job are not data semantics.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_KIND_WORDS = ["SPAN_KIND_UNSPECIFIED", "SPAN_KIND_INTERNAL",
               "SPAN_KIND_SERVER", "SPAN_KIND_CLIENT",
               "SPAN_KIND_PRODUCER", "SPAN_KIND_CONSUMER"]
_STATUS_WORDS = ["STATUS_CODE_UNSET", "STATUS_CODE_OK",
                 "STATUS_CODE_ERROR"]
_TEMPO_WORDS = ["Unspecified", "Delta", "Cumulative"]


def _doris_time(ts_ns: Column) -> Column:
    """Go Format("2006-01-02 15:04:05.999999") in UTC."""
    ts_ns = F.coalesce(ts_ns, F.lit(0))
    secs = ((ts_ns - F.pmod(ts_ns, F.lit(1_000_000_000)))
            .cast("decimal(38,0)") / 1_000_000_000).cast("bigint")
    base = F.date_format(F.timestamp_seconds(secs),
                         "yyyy-MM-dd HH:mm:ss")
    us = F.floor(F.pmod(ts_ns, F.lit(1_000_000_000)) / 1000) \
        .cast("bigint")
    frac = F.when(us > 0, F.concat(
        F.lit("."),
        F.regexp_replace(F.lpad(us.cast("string"), 6, "0"),
                         r"0+$", ""))).otherwise(F.lit(""))
    return F.concat(base, frac)


def _svc_cols(res: Column) -> list:
    return [
        F.coalesce(F.element_at(res, F.lit("service.name")),
                   F.lit("")).alias("service_name"),
        F.coalesce(F.element_at(res, F.lit("service.instance.id")),
                   F.lit("")).alias("service_instance_id"),
    ]


def doris_log_rows(df: DataFrame, *, id_cols: list[str]) -> DataFrame:
    res = F.col("res_attrs")
    return df.select(
        *id_cols, *_svc_cols(res),
        _doris_time(F.col("ts_ns")).alias("timestamp"),
        F.coalesce(F.col("trace_id"), F.lit("")).alias("trace_id"),
        F.coalesce(F.col("span_id"), F.lit("")).alias("span_id"),
        F.coalesce(F.col("severity_number"), F.lit(0)).cast("int")
        .alias("severity_number"),
        F.coalesce(F.col("severity_text"), F.lit(""))
        .alias("severity_text"),
        F.coalesce(F.col("body"), F.lit("")).alias("body"),
        res.alias("resource_attributes"),
        F.col("attrs").alias("log_attributes"),
        F.coalesce(F.col("scope_name"), F.lit("")).alias("scope_name"),
        F.coalesce(F.col("scope_version"), F.lit(""))
        .alias("scope_version"),
    )


def doris_trace_rows(df: DataFrame, *, id_cols: list[str]) -> DataFrame:
    res = F.col("res_attrs")
    kind = F.coalesce(F.col("kind"), F.lit(0)).cast("int")
    code = F.coalesce(F.col("status_code"), F.lit(0)).cast("int")
    ev = F.coalesce(F.col("events"), F.expr("array()").cast(
        "array<struct<ts_ns:bigint,name:string,"
        "attrs:map<string,string>>>"))
    ln = F.coalesce(F.col("links"), F.expr("array()").cast(
        "array<struct<trace_id:string,span_id:string,"
        "trace_state:string,attrs:map<string,string>>>"))
    return df.select(
        *id_cols, *_svc_cols(res),
        _doris_time(F.col("start_ns")).alias("timestamp"),
        F.coalesce(F.col("trace_id"), F.lit("")).alias("trace_id"),
        F.coalesce(F.col("span_id"), F.lit("")).alias("span_id"),
        F.coalesce(F.col("trace_state"), F.lit(""))
        .alias("trace_state"),
        F.coalesce(F.col("parent_span_id"), F.lit(""))
        .alias("parent_span_id"),
        F.coalesce(F.col("name"), F.lit("")).alias("span_name"),
        F.element_at(F.array(*[F.lit(w) for w in _KIND_WORDS]),
                     F.when((kind >= 0) & (kind <= 5), kind)
                     .otherwise(F.lit(0)) + 1).alias("span_kind"),
        _doris_time(F.col("end_ns")).alias("end_time"),
        F.floor((F.col("end_ns") - F.col("start_ns")) / 1000)
        .cast("bigint").alias("duration"),
        F.col("attrs").alias("span_attributes"),
        F.transform(ev, lambda e: F.struct(
            _doris_time(e["ts_ns"]).alias("timestamp"),
            e["name"].alias("name"),
            e["attrs"].alias("attributes"))).alias("events"),
        F.transform(ln, lambda x: F.struct(
            x["trace_id"].alias("trace_id"),
            x["span_id"].alias("span_id"),
            x["trace_state"].alias("trace_state"),
            x["attrs"].alias("attributes"))).alias("links"),
        F.coalesce(F.col("status_message"), F.lit(""))
        .alias("status_message"),
        F.element_at(F.array(*[F.lit(w) for w in _STATUS_WORDS]),
                     F.when((code >= 0) & (code <= 2), code)
                     .otherwise(F.lit(0)) + 1).alias("status_code"),
        res.alias("resource_attributes"),
        F.coalesce(F.col("scope_name"), F.lit("")).alias("scope_name"),
        F.coalesce(F.col("scope_version"), F.lit(""))
        .alias("scope_version"),
    )


def _metric_common(res: Column) -> list:
    return [
        *_svc_cols(res),
        F.coalesce(F.col("metric_name"), F.lit(""))
        .alias("metric_name"),
        F.coalesce(F.col("metric_description"), F.lit(""))
        .alias("metric_description"),
        F.coalesce(F.col("metric_unit"), F.lit(""))
        .alias("metric_unit"),
        res.alias("resource_attributes"),
        F.coalesce(F.col("scope_name"), F.lit("")).alias("scope_name"),
        F.coalesce(F.col("scope_version"), F.lit(""))
        .alias("scope_version"),
        _doris_time(F.col("ts_ns")).alias("timestamp"),
        F.col("attrs").alias("attributes"),
        _doris_time(F.col("start_ns")).alias("start_time"),
    ]


def _number_value() -> Column:
    vt = F.coalesce(F.col("value_type"), F.lit(0)).cast("int")
    return (F.when(vt == 1, F.col("value_int").cast("double"))
            .when(vt == 2, F.col("value_double"))
            .otherwise(F.lit(0.0))).alias("value")


def _exemplars() -> Column:
    ex = F.coalesce(F.col("exemplars"), F.expr("array()").cast(
        "array<struct<ts_ns:bigint,value_int:bigint,"
        "value_double:double,value_type:int,trace_id:string,"
        "span_id:string,attrs:map<string,string>>>"))
    return F.transform(ex, lambda e: F.struct(
        e["attrs"].alias("filtered_attributes"),
        _doris_time(e["ts_ns"]).alias("timestamp"),
        (F.when(e["value_type"] == 1, e["value_int"].cast("double"))
         .when(e["value_type"] == 2, e["value_double"])
         .otherwise(F.lit(0.0))).alias("value"),
        e["span_id"].alias("span_id"),
        e["trace_id"].alias("trace_id"))).alias("exemplars")


def doris_gauge_rows(df: DataFrame, *, id_cols: list[str]) -> DataFrame:
    return df.select(*id_cols, *_metric_common(F.col("res_attrs")),
                     _number_value(), _exemplars())


def doris_sum_rows(df: DataFrame, *, id_cols: list[str]) -> DataFrame:
    tempo = F.coalesce(F.col("temporality"), F.lit(0)).cast("int")
    return df.select(
        *id_cols, *_metric_common(F.col("res_attrs")),
        _number_value(), _exemplars(),
        F.element_at(F.array(*[F.lit(w) for w in _TEMPO_WORDS]),
                     F.when((tempo >= 0) & (tempo <= 2), tempo)
                     .otherwise(F.lit(0)) + 1)
        .alias("aggregation_temporality"),
        F.coalesce(F.col("is_monotonic"), F.lit(False))
        .alias("is_monotonic"),
    )


def doris_histogram_rows(df: DataFrame, *, id_cols: list[str],
                         ) -> DataFrame:
    tempo = F.coalesce(F.col("temporality"), F.lit(0)).cast("int")
    return df.select(
        *id_cols, *_metric_common(F.col("res_attrs")),
        F.coalesce(F.col("count"), F.lit(0)).cast("bigint")
        .alias("count"),
        F.coalesce(F.col("sum"), F.lit(0.0)).alias("sum"),
        F.coalesce(F.col("bucket_counts"), F.expr("array()")
                   .cast("array<bigint>")).alias("bucket_counts"),
        F.coalesce(F.col("explicit_bounds"), F.expr("array()")
                   .cast("array<double>")).alias("explicit_bounds"),
        _exemplars(),
        F.coalesce(F.col("min"), F.lit(0.0)).alias("min"),
        F.coalesce(F.col("max"), F.lit(0.0)).alias("max"),
        F.element_at(F.array(*[F.lit(w) for w in _TEMPO_WORDS]),
                     F.when((tempo >= 0) & (tempo <= 2), tempo)
                     .otherwise(F.lit(0)) + 1)
        .alias("aggregation_temporality"),
    )


def doris_summary_rows(df: DataFrame, *, id_cols: list[str],
                       ) -> DataFrame:
    q = F.coalesce(F.col("quantiles"), F.expr("array()").cast(
        "array<struct<q:double,v:double>>"))
    return df.select(
        *id_cols, *_metric_common(F.col("res_attrs")),
        F.coalesce(F.col("count"), F.lit(0)).cast("bigint")
        .alias("count"),
        F.coalesce(F.col("sum"), F.lit(0.0)).alias("sum"),
        F.transform(q, lambda x: F.struct(
            x["q"].alias("quantile"), x["v"].alias("value")))
        .alias("quantile_values"),
    )

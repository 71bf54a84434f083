"""Tinybird EXPORT translator: OTLP logs/traces/metrics -> Tinybird
NDJSON signal rows (``exporter/tinybirdexporter/internal/{logs,
traces,metrics}.go``).

Flat rows with RFC3339Nano timestamps, hex ids, AsString attribute
maps (utils.go:19-26), service.name extraction (utils.go:11-17):

- logs   — logs.go:32-81: Timestamp-else-Observed fallback,
  severity text/number, flags, schema URLs, body AsString
- traces — traces.go:74-128: Kind()/StatusCode().String() words
  (Unspecified/Internal/... and Unset/Ok/Error), BOTH end_time and
  ns duration, events/links parallel arrays with RFC3339Nano event
  times
- sum    — metrics.go sumSignal: number value, temporality int,
  is_monotonic, exemplar parallel arrays (filtered attrs/ts/value/
  span ids/trace ids); gauge is the same minus the sum fields

All zero-shuffle codegen projections.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .syslog_export import _rfc3339nano

_KIND_WORDS = ["Unspecified", "Internal", "Server", "Client",
               "Producer", "Consumer"]
_STATUS_WORDS = ["Unset", "Ok", "Error"]


def _svc(res):
    return F.coalesce(F.element_at(res, F.lit("service.name")),
                      F.lit("")).alias("service_name")


def tinybird_log_rows(df: DataFrame, *, id_cols: list[str],
                      ) -> DataFrame:
    ts = F.when(F.coalesce(F.col("ts_ns"), F.lit(0)) != 0,
                F.col("ts_ns")).otherwise(F.col("observed_ns"))
    return df.select(
        *id_cols,
        F.coalesce(F.col("res_url"), F.lit(""))
        .alias("resource_schema_url"),
        F.col("res_attrs").alias("resource_attributes"),
        _svc(F.col("res_attrs")),
        F.coalesce(F.col("scope_url"), F.lit(""))
        .alias("scope_schema_url"),
        F.col("scope_attrs").alias("scope_attributes"),
        F.coalesce(F.col("scope_name"), F.lit("")).alias("scope_name"),
        F.coalesce(F.col("scope_version"), F.lit(""))
        .alias("scope_version"),
        _rfc3339nano(ts).alias("timestamp"),
        F.coalesce(F.col("trace_id"), F.lit("")).alias("trace_id"),
        F.coalesce(F.col("span_id"), F.lit("")).alias("span_id"),
        F.coalesce(F.col("flags"), F.lit(0)).cast("int").alias("flags"),
        F.coalesce(F.col("severity_text"), F.lit(""))
        .alias("severity_text"),
        F.coalesce(F.col("severity_number"), F.lit(0)).cast("int")
        .alias("severity_number"),
        F.col("attrs").alias("log_attributes"),
        F.coalesce(F.col("body"), F.lit("")).alias("body"),
    )


def tinybird_trace_rows(df: DataFrame, *, id_cols: list[str],
                        ) -> DataFrame:
    kind = F.coalesce(F.col("kind"), F.lit(0)).cast("int")
    code = F.coalesce(F.col("status_code"), F.lit(0)).cast("int")
    ev = F.coalesce(F.col("events"), F.expr("array()").cast(
        "array<struct<ts_ns:bigint,name:string,"
        "attrs:map<string,string>>>"))
    ln = F.coalesce(F.col("links"), F.expr("array()").cast(
        "array<struct<trace_id:string,span_id:string,"
        "trace_state:string,attrs:map<string,string>>>"))
    return df.select(
        *id_cols,
        _svc(F.col("res_attrs")),
        F.col("res_attrs").alias("resource_attributes"),
        F.coalesce(F.col("scope_name"), F.lit("")).alias("scope_name"),
        F.coalesce(F.col("trace_id"), F.lit("")).alias("trace_id"),
        F.coalesce(F.col("span_id"), F.lit("")).alias("span_id"),
        F.coalesce(F.col("parent_span_id"), F.lit(""))
        .alias("parent_span_id"),
        F.coalesce(F.col("trace_state"), F.lit(""))
        .alias("trace_state"),
        F.coalesce(F.col("flags"), F.lit(0)).cast("int")
        .alias("trace_flags"),
        F.coalesce(F.col("name"), F.lit("")).alias("span_name"),
        F.element_at(F.array(*[F.lit(w) for w in _KIND_WORDS]),
                     F.when((kind >= 0) & (kind <= 5), kind)
                     .otherwise(F.lit(0)) + 1).alias("span_kind"),
        F.col("attrs").alias("span_attributes"),
        _rfc3339nano(F.col("start_ns")).alias("start_time"),
        _rfc3339nano(F.col("end_ns")).alias("end_time"),
        (F.col("end_ns") - F.col("start_ns")).cast("bigint")
        .alias("duration"),
        F.element_at(F.array(*[F.lit(w) for w in _STATUS_WORDS]),
                     F.when((code >= 0) & (code <= 2), code)
                     .otherwise(F.lit(0)) + 1).alias("status_code"),
        F.coalesce(F.col("status_message"), F.lit(""))
        .alias("status_message"),
        F.transform(ev, lambda e: _rfc3339nano(e["ts_ns"]))
        .alias("events_timestamp"),
        F.transform(ev, lambda e: e["name"]).alias("events_name"),
        F.transform(ev, lambda e: e["attrs"])
        .alias("events_attributes"),
        F.transform(ln, lambda x: x["trace_id"])
        .alias("links_trace_id"),
        F.transform(ln, lambda x: x["span_id"]).alias("links_span_id"),
        F.transform(ln, lambda x: x["trace_state"])
        .alias("links_trace_state"),
        F.transform(ln, lambda x: x["attrs"]).alias("links_attributes"),
    )


def tinybird_sum_rows(df: DataFrame, *, id_cols: list[str],
                      ) -> DataFrame:
    vt = F.coalesce(F.col("value_type"), F.lit(0)).cast("int")
    value = (F.when(vt == 1, F.col("value_int").cast("double"))
             .when(vt == 2, F.col("value_double"))
             .otherwise(F.lit(0.0)))
    ex = F.coalesce(F.col("exemplars"), F.expr("array()").cast(
        "array<struct<ts_ns:bigint,value_int:bigint,"
        "value_double:double,value_type:int,trace_id:string,"
        "span_id:string,attrs:map<string,string>>>"))
    exval = lambda e: (  # noqa: E731
        F.when(e["value_type"] == 1, e["value_int"].cast("double"))
        .when(e["value_type"] == 2, e["value_double"])
        .otherwise(F.lit(0.0)))
    return df.select(
        *id_cols,
        _svc(F.col("res_attrs")),
        F.col("res_attrs").alias("resource_attributes"),
        F.coalesce(F.col("metric_name"), F.lit(""))
        .alias("metric_name"),
        F.coalesce(F.col("metric_unit"), F.lit(""))
        .alias("metric_unit"),
        F.col("attrs").alias("metric_attributes"),
        _rfc3339nano(F.col("start_ns")).alias("start_timestamp"),
        _rfc3339nano(F.col("ts_ns")).alias("timestamp"),
        F.coalesce(F.col("flags"), F.lit(0)).cast("int").alias("flags"),
        value.alias("value"),
        F.coalesce(F.col("temporality"), F.lit(0)).cast("int")
        .alias("aggregation_temporality"),
        F.coalesce(F.col("is_monotonic"), F.lit(False))
        .alias("is_monotonic"),
        F.transform(ex, lambda e: _rfc3339nano(e["ts_ns"]))
        .alias("exemplars_timestamp"),
        F.transform(ex, exval).alias("exemplars_value"),
        F.transform(ex, lambda e: e["span_id"])
        .alias("exemplars_span_id"),
        F.transform(ex, lambda e: e["trace_id"])
        .alias("exemplars_trace_id"),
    )

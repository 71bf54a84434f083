"""ClickHouse EXPORT translator: OTLP logs/traces/metrics -> the
ClickHouse exporter's insert-row models
(``exporter/clickhouseexporter/exporter_{logs,traces}.go`` +
``internal/metrics/*_metrics.go``).

Row shapes, replayed column for column from the batch.Append calls:

- logs   — exporter_logs.go:104-129: Timestamp-else-Observed
  fallback, hex trace/span ids, flags/severity, GetServiceName
  (util.go:13-19: service.name else ""), Body().AsString(), res/
  scope/log attr maps (AttributesToMap keeps AsString values)
- traces — exporter_traces.go:102-141: duration = end - start (ns),
  Kind().String() / StatusCode().String() words, events fanned to
  parallel times/names/attrs arrays and links to traceIDs/spanIDs/
  states/attrs arrays (:161-182)
- metrics — internal/metrics/{gauge,sum,histogram,summary}_metrics
  .go: shared resource/scope metadata columns, per-point value via
  getValue (int-else-double -> float64, empty -> 0.0,
  metrics_model.go:139-164), exemplar fan (attrs/times/values/
  span ids/trace ids, :116-135), sum adds temporality +
  is_monotonic, histogram adds count/sum/bucket_counts/
  explicit_bounds/min/max/temporality, summary adds quantile/value
  arrays

All three are zero-shuffle codegen projections — at 10^12 rows the
"exporter" is just a partitioned write of these frames. Schema DDL /
TTL-expression rendering and the ClickHouse wire client are
transport, not data semantics, and are not mirrored.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_KIND_WORDS = ["Unspecified", "Internal", "Server", "Client",
               "Producer", "Consumer"]
_STATUS_WORDS = ["Unset", "Ok", "Error"]


def _service_name(res: F.Column) -> F.Column:
    return F.coalesce(F.element_at(res, F.lit("service.name")),
                      F.lit(""))


def clickhouse_log_rows(df: DataFrame, *, id_cols: list[str],
                        ) -> DataFrame:
    """exporter_logs.go:104-129 — one insert row per log record."""
    ts = F.when(F.coalesce(F.col("ts_ns"), F.lit(0)) != 0,
                F.col("ts_ns")).otherwise(F.col("observed_ns"))
    return df.select(
        *id_cols,
        ts.cast("bigint").alias("timestamp_ns"),
        F.coalesce(F.col("trace_id"), F.lit("")).alias("trace_id"),
        F.coalesce(F.col("span_id"), F.lit("")).alias("span_id"),
        F.coalesce(F.col("flags"), F.lit(0)).cast("int")
        .alias("trace_flags"),
        F.coalesce(F.col("severity_text"), F.lit(""))
        .alias("severity_text"),
        F.coalesce(F.col("severity_number"), F.lit(0)).cast("int")
        .alias("severity_number"),
        _service_name(F.col("res_attrs")).alias("service_name"),
        F.coalesce(F.col("body"), F.lit("")).alias("body"),
        F.coalesce(F.col("res_url"), F.lit("")).alias("resource_url"),
        F.col("res_attrs").alias("resource_attributes"),
        F.coalesce(F.col("scope_url"), F.lit("")).alias("scope_url"),
        F.coalesce(F.col("scope_name"), F.lit("")).alias("scope_name"),
        F.coalesce(F.col("scope_version"), F.lit(""))
        .alias("scope_version"),
        F.col("scope_attrs").alias("scope_attributes"),
        F.col("attrs").alias("log_attributes"),
    )


def clickhouse_trace_rows(df: DataFrame, *, id_cols: list[str],
                          ) -> DataFrame:
    """exporter_traces.go:102-141 — one insert row per span."""
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
        F.col("start_ns").cast("bigint").alias("timestamp_ns"),
        F.coalesce(F.col("trace_id"), F.lit("")).alias("trace_id"),
        F.coalesce(F.col("span_id"), F.lit("")).alias("span_id"),
        F.coalesce(F.col("parent_span_id"), F.lit(""))
        .alias("parent_span_id"),
        F.coalesce(F.col("trace_state"), F.lit(""))
        .alias("trace_state"),
        F.coalesce(F.col("name"), F.lit("")).alias("span_name"),
        F.element_at(F.array(*[F.lit(w) for w in _KIND_WORDS]),
                     F.when((kind >= 0) & (kind <= 5), kind)
                     .otherwise(F.lit(0)) + 1).alias("span_kind"),
        _service_name(F.col("res_attrs")).alias("service_name"),
        F.col("res_attrs").alias("resource_attributes"),
        F.coalesce(F.col("scope_name"), F.lit("")).alias("scope_name"),
        F.coalesce(F.col("scope_version"), F.lit(""))
        .alias("scope_version"),
        F.col("attrs").alias("span_attributes"),
        (F.col("end_ns") - F.col("start_ns")).cast("bigint")
        .alias("duration_ns"),
        F.element_at(F.array(*[F.lit(w) for w in _STATUS_WORDS]),
                     F.when((code >= 0) & (code <= 2), code)
                     .otherwise(F.lit(0)) + 1).alias("status_code"),
        F.coalesce(F.col("status_message"), F.lit(""))
        .alias("status_message"),
        F.transform(ev, lambda e: e["ts_ns"]).alias("events_timestamp"),
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


def _meta_cols(df_cols: list) -> list:
    res = F.col("res_attrs")
    return [
        res.alias("resource_attributes"),
        F.coalesce(F.col("res_url"), F.lit("")).alias("resource_url"),
        F.coalesce(F.col("scope_name"), F.lit("")).alias("scope_name"),
        F.coalesce(F.col("scope_version"), F.lit(""))
        .alias("scope_version"),
        F.col("scope_attrs").alias("scope_attributes"),
        F.coalesce(F.col("scope_dropped"), F.lit(0)).cast("int")
        .alias("scope_dropped_attr_count"),
        F.coalesce(F.col("scope_url"), F.lit("")).alias("scope_url"),
        _service_name(res).alias("service_name"),
        F.coalesce(F.col("metric_name"), F.lit(""))
        .alias("metric_name"),
        F.coalesce(F.col("metric_description"), F.lit(""))
        .alias("metric_description"),
        F.coalesce(F.col("metric_unit"), F.lit(""))
        .alias("metric_unit"),
        F.col("attrs").alias("attributes"),
        F.col("start_ns").cast("bigint").alias("start_time_ns"),
        F.col("ts_ns").cast("bigint").alias("time_ns"),
    ]


def _number_value() -> F.Column:
    """getValue (metrics_model.go:139-164): int-else-double, empty=0."""
    vt = F.coalesce(F.col("value_type"), F.lit(0)).cast("int")
    return (F.when(vt == 1, F.col("value_int").cast("double"))
            .when(vt == 2, F.col("value_double"))
            .otherwise(F.lit(0.0))).alias("value")


def _exemplar_cols() -> list:
    ex = F.coalesce(F.col("exemplars"), F.expr("array()").cast(
        "array<struct<ts_ns:bigint,value_int:bigint,"
        "value_double:double,value_type:int,trace_id:string,"
        "span_id:string,attrs:map<string,string>>>"))
    val = lambda e: (  # noqa: E731
        F.when(e["value_type"] == 1, e["value_int"].cast("double"))
        .when(e["value_type"] == 2, e["value_double"])
        .otherwise(F.lit(0.0)))
    return [
        F.transform(ex, lambda e: e["attrs"])
        .alias("exemplars_attributes"),
        F.transform(ex, lambda e: e["ts_ns"])
        .alias("exemplars_timestamp"),
        F.transform(ex, val).alias("exemplars_value"),
        F.transform(ex, lambda e: e["span_id"])
        .alias("exemplars_span_id"),
        F.transform(ex, lambda e: e["trace_id"])
        .alias("exemplars_trace_id"),
    ]


def clickhouse_gauge_rows(df: DataFrame, *, id_cols: list[str],
                          ) -> DataFrame:
    """gauge_metrics.go:53-85 — one row per gauge datapoint."""
    return df.select(
        *id_cols, *_meta_cols(df.columns), _number_value(),
        F.coalesce(F.col("flags"), F.lit(0)).cast("int").alias("flags"),
        *_exemplar_cols(),
    )


def clickhouse_sum_rows(df: DataFrame, *, id_cols: list[str],
                        ) -> DataFrame:
    """sum_metrics.go — gauge shape + temporality + is_monotonic."""
    return df.select(
        *id_cols, *_meta_cols(df.columns), _number_value(),
        F.coalesce(F.col("flags"), F.lit(0)).cast("int").alias("flags"),
        *_exemplar_cols(),
        F.coalesce(F.col("temporality"), F.lit(0)).cast("int")
        .alias("aggregation_temporality"),
        F.coalesce(F.col("is_monotonic"), F.lit(False))
        .alias("is_monotonic"),
    )


def clickhouse_histogram_rows(df: DataFrame, *, id_cols: list[str],
                              ) -> DataFrame:
    """histogram_metrics.go:57-85 — count/sum/buckets/bounds/min/max."""
    return df.select(
        *id_cols, *_meta_cols(df.columns),
        F.coalesce(F.col("count"), F.lit(0)).cast("bigint")
        .alias("count"),
        F.coalesce(F.col("sum"), F.lit(0.0)).alias("sum"),
        F.coalesce(F.col("bucket_counts"), F.expr("array()")
                   .cast("array<bigint>")).alias("bucket_counts"),
        F.coalesce(F.col("explicit_bounds"), F.expr("array()")
                   .cast("array<double>")).alias("explicit_bounds"),
        *_exemplar_cols(),
        F.coalesce(F.col("flags"), F.lit(0)).cast("int").alias("flags"),
        F.coalesce(F.col("min"), F.lit(0.0)).alias("min"),
        F.coalesce(F.col("max"), F.lit(0.0)).alias("max"),
        F.coalesce(F.col("temporality"), F.lit(0)).cast("int")
        .alias("aggregation_temporality"),
    )


def clickhouse_summary_rows(df: DataFrame, *, id_cols: list[str],
                            ) -> DataFrame:
    """summary_metrics.go — count/sum + quantile/value arrays."""
    q = F.coalesce(F.col("quantiles"), F.expr("array()").cast(
        "array<struct<q:double,v:double>>"))
    return df.select(
        *id_cols, *_meta_cols(df.columns),
        F.coalesce(F.col("count"), F.lit(0)).cast("bigint")
        .alias("count"),
        F.coalesce(F.col("sum"), F.lit(0.0)).alias("sum"),
        F.transform(q, lambda x: x["q"]).alias("value_at_quantiles_q"),
        F.transform(q, lambda x: x["v"])
        .alias("value_at_quantiles_value"),
        F.coalesce(F.col("flags"), F.lit(0)).cast("int").alias("flags"),
    )

"""Cassandra EXPORT translator: OTLP logs/spans -> the Cassandra
exporter's insert rows (``exporter/cassandraexporter/exporter_{logs,
traces}.go``).

- log rows  — exporter_logs.go:110-145: timestamp, hex ids, flags,
  severity text/number, the body JSON-marshaled (a string body
  renders as a JSON string), resource/log attr maps
- span rows — exporter_traces.go:109-140: start timestamp, hex ids,
  trace state, name, SPAN_KIND_* / STATUS_CODE_* proto words
  (traceutil), resource/span attr maps, end-start duration ns,
  status message

Both zero-shuffle codegen projections; DDL/keyspace bootstrap is
transport and not mirrored.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_KIND_WORDS = ["SPAN_KIND_UNSPECIFIED", "SPAN_KIND_INTERNAL",
               "SPAN_KIND_SERVER", "SPAN_KIND_CLIENT",
               "SPAN_KIND_PRODUCER", "SPAN_KIND_CONSUMER"]
_STATUS_WORDS = ["STATUS_CODE_UNSET", "STATUS_CODE_OK",
                 "STATUS_CODE_ERROR"]


def _json_body(body: F.Column) -> F.Column:
    js = F.to_json(F.array(F.coalesce(body, F.lit(""))))
    return F.substring(js, F.lit(2), F.length(js) - 2)


def cassandra_log_rows(df: DataFrame, *, id_cols: list[str],
                       ) -> DataFrame:
    return df.select(
        *id_cols,
        F.col("ts_ns").cast("bigint").alias("timestamp_ns"),
        F.coalesce(F.col("trace_id"), F.lit("")).alias("trace_id"),
        F.coalesce(F.col("span_id"), F.lit("")).alias("span_id"),
        F.coalesce(F.col("flags"), F.lit(0)).cast("int")
        .alias("trace_flags"),
        F.coalesce(F.col("severity_text"), F.lit(""))
        .alias("severity_text"),
        F.coalesce(F.col("severity_number"), F.lit(0)).cast("int")
        .alias("severity_number"),
        _json_body(F.col("body")).alias("body"),
        F.col("res_attrs").alias("resource_attributes"),
        F.col("attrs").alias("log_attributes"),
    )


def cassandra_trace_rows(df: DataFrame, *, id_cols: list[str],
                         ) -> DataFrame:
    kind = F.coalesce(F.col("kind"), F.lit(0)).cast("int")
    code = F.coalesce(F.col("status_code"), F.lit(0)).cast("int")
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
        F.col("res_attrs").alias("resource_attributes"),
        F.col("attrs").alias("span_attributes"),
        (F.col("end_ns") - F.col("start_ns")).cast("bigint")
        .alias("duration_ns"),
        F.element_at(F.array(*[F.lit(w) for w in _STATUS_WORDS]),
                     F.when((code >= 0) & (code <= 2), code)
                     .otherwise(F.lit(0)) + 1).alias("status_code"),
        F.coalesce(F.col("status_message"), F.lit(""))
        .alias("status_message"),
    )

"""Alertmanager EXPORT translator: span events → Alertmanager alerts
(``exporter/alertmanagerexporter/alertmanager_exporter.go``).

One output row per span EVENT (:45-97):

- severity label = the event attr named by ``severity_attribute``
  when present (AsString), else the configured default
  (config defaults: severity "info", generator_url
  "opentelemetry-collector" — factory.go:35-38)
- annotations = ALL event attrs plus ``TraceID``/``SpanID`` hex
  strings (:99-108; pcommon .String() of an all-zero id is "")
- labels = the event attrs whitelisted by ``event_labels`` plus
  ``severity`` and ``event_name`` (:110-120)
- ``StartsAt = time.Now()`` is wall-clock in the reference — here
  the event timestamp column passes through for determinism
- label sets are unordered maps; rendered as sorted ``k=v`` CSV
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SEVERITY = "info"                      # factory.go:36
DEFAULT_GENERATOR_URL = "opentelemetry-collector"  # factory.go:35


def _csv(ents: Column) -> Column:
    return F.array_join(F.array_sort(F.transform(
        ents, lambda e: F.concat(e["key"], F.lit("="), e["value"]))),
        ",")


def alertmanager_alerts(
    df: DataFrame,
    *,
    id_cols: list[str],
    event_labels: list[str],
    severity_attribute: str = "severity",
    default_severity: str = DEFAULT_SEVERITY,
    generator_url: str = DEFAULT_GENERATOR_URL,
    trace_id_col: str = "trace_id",
    span_id_col: str = "span_id",
    events_col: str = "events",
) -> DataFrame:
    events = F.coalesce(
        F.col(events_col),
        F.expr("array()").cast(
            "array<struct<ts_ns:bigint,name:string,"
            "attrs:map<string,string>>>"))

    out = df.select(
        *id_cols,
        F.col(trace_id_col).alias("_tid"),
        F.col(span_id_col).alias("_sid"),
        F.explode(events).alias("_ev"),
    )
    ev = F.col("_ev")
    attrs = F.map_entries(F.coalesce(
        ev["attrs"], F.expr("map()").cast("map<string,string>")))
    severity = F.coalesce(ev["attrs"][severity_attribute],
                          F.lit(default_severity))

    annotations = F.concat(attrs, F.array(
        F.struct(F.lit("TraceID").alias("key"),
                 F.col("_tid").alias("value")),
        F.struct(F.lit("SpanID").alias("key"),
                 F.col("_sid").alias("value"))))
    labels = F.concat(
        F.filter(attrs, lambda e: e["key"].isin(*event_labels)
                 if event_labels else F.lit(False)),
        F.array(
            F.struct(F.lit("severity").alias("key"),
                     severity.alias("value")),
            F.struct(F.lit("event_name").alias("key"),
                     ev["name"].alias("value"))))

    return out.select(
        *id_cols,
        ev["ts_ns"].alias("starts_at_ns"),
        _csv(labels).alias("labels"),
        _csv(annotations).alias("annotations"),
        F.lit(generator_url).alias("generator_url"),
    )

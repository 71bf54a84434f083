"""Log-Service EXPORT translator shared by the Alibaba SLS and
Tencent CLS exporters
(``exporter/alibabacloudlogserviceexporter/logsdata_to_logservice.go``
and ``exporter/tencentcloudlogserviceexporter/logsdata_to_logservice
.go`` — the two are field-for-field identical; they differ only in
the order the KV contents are appended, which a columnar output
makes moot).

One output row per log record, one column per SLS/CLS content key:

- records whose body is EMPTY-typed are dropped (:118-120); a
  present-but-empty string body is a valid Str and kept
- ``host`` / ``service`` = resource host.name / service.name
  AsString, "" when absent (:60-86); ``resource`` = the remaining
  resource attrs as a sorted-key JSON object (Go json.Marshal of a
  map, :88-99)
- ``otlp.name`` / ``otlp.version`` = scope name/version (:103-114)
- ``timeUnixNano`` (uint decimal), ``severityNumber`` (int decimal),
  ``severityText``, ``attribute`` (attr map JSON), ``content``
  (body AsString), ``flags`` (HEX), ``trace_id``/``span_id`` hex or
  "" (:131-172)
- Log.Time = ts seconds when ts > 0, else wall-clock Now() —
  NULL here for determinism (:176-181)
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _sorted_json(m: Column, drop: list[str]) -> Column:
    ents = F.filter(
        F.map_entries(F.coalesce(
            m, F.expr("map()").cast("map<string,string>"))),
        lambda e: ~e["key"].isin(*drop) if drop else F.lit(True))
    return F.coalesce(
        F.when(F.size(ents) > 0,
               F.to_json(F.map_from_entries(F.array_sort(ents)))),
        F.lit("{}"))


def logservice_logs(
    df: DataFrame,
    *,
    id_cols: list[str],
    body_col: str = "body",
    ts_ns_col: str = "ts_ns",
    trace_id_col: str = "trace_id",
    span_id_col: str = "span_id",
    severity_number_col: str = "severity_number",
    severity_text_col: str = "severity_text",
    flags_col: str = "flags",
    attrs_col: str = "attrs",
    res_attrs_col: str = "res_attrs",
    scope_name_col: str = "scope_name",
    scope_version_col: str = "scope_version",
) -> DataFrame:
    res = F.col(res_attrs_col)
    ts = F.coalesce(F.col(ts_ns_col), F.lit(0))

    return df.where(F.col(body_col).isNotNull()).select(
        *id_cols,
        F.when(ts > 0, F.expr(
            f"CAST(COALESCE({ts_ns_col}, 0) AS BIGINT)"
            " div 1000000000")).alias("time_s"),
        F.coalesce(res["host.name"], F.lit("")).alias("host"),
        F.coalesce(res["service.name"], F.lit("")).alias("service"),
        _sorted_json(res, ["host.name", "service.name"])
        .alias("resource"),
        F.coalesce(F.col(scope_name_col), F.lit(""))
        .alias("otlp_name"),
        F.coalesce(F.col(scope_version_col), F.lit(""))
        .alias("otlp_version"),
        ts.cast("string").alias("time_unix_nano"),
        F.coalesce(F.col(severity_number_col), F.lit(0)).cast("string")
        .alias("severity_number"),
        F.coalesce(F.col(severity_text_col), F.lit(""))
        .alias("severity_text"),
        _sorted_json(F.col(attrs_col), []).alias("attribute"),
        F.col(body_col).alias("content"),
        F.lower(F.hex(F.coalesce(F.col(flags_col), F.lit(0))))
        .alias("flags"),
        F.coalesce(F.col(trace_id_col), F.lit("")).alias("trace_id"),
        F.coalesce(F.col(span_id_col), F.lit("")).alias("span_id"),
    )


def logservice_spans(
    df: DataFrame,
    *,
    id_cols: list[str],
    trace_id_col: str = "trace_id",
    span_id_col: str = "span_id",
    parent_span_id_col: str = "parent_span_id",
    name_col: str = "name",
    kind_col: str = "kind",
    start_ns_col: str = "start_ns",
    end_ns_col: str = "end_ns",
    status_code_col: str = "status_code",
    status_message_col: str = "status_message",
    trace_state_col: str = "trace_state",
    attrs_col: str = "attrs",
    res_attrs_col: str = "res_attrs",
    scope_name_col: str = "scope_name",
    scope_version_col: str = "scope_version",
    events_col: str | None = "events",
    links_col: str | None = "links",
) -> DataFrame:
    """Spans → SLS KV logs
    (``alibabacloudlogserviceexporter/tracedata_to_logservice.go``
    :66-145): OpenTracing short kind words with default
    "unspecified", µs start/end/duration, UNSET/OK/ERROR status
    words, links/events as sorted-key JSON arrays, Log.Time from the
    END timestamp (zero → Now(), NULL here).

    Known divergence: Go computes duration as
    ``uint64(end-start)/1000`` — a zero end timestamp UNDERFLOWS to
    ~2^64; this engine renders the signed value instead."""
    res = F.col(res_attrs_col)
    kind = F.coalesce(F.col(kind_col), F.lit(0)).cast("int")
    start = F.coalesce(F.col(start_ns_col), F.lit(0))
    end = F.coalesce(F.col(end_ns_col), F.lit(0))

    kind_word = (F.when(kind == 1, F.lit("internal"))
                 .when(kind == 2, F.lit("server"))
                 .when(kind == 3, F.lit("client"))
                 .when(kind == 4, F.lit("producer"))
                 .when(kind == 5, F.lit("consumer"))
                 .otherwise(F.lit("unspecified")))
    code_word = (F.when(F.col(status_code_col) == 1, F.lit("OK"))
                 .when(F.col(status_code_col) == 2, F.lit("ERROR"))
                 .otherwise(F.lit("UNSET")))

    def jmap(m: Column) -> Column:
        return F.coalesce(
            F.when(F.size(F.map_entries(F.coalesce(
                m, F.expr("map()").cast("map<string,string>")))) > 0,
                F.to_json(F.map_from_entries(F.array_sort(
                    F.map_entries(m))))),
            F.lit("{}"))

    links = F.coalesce(
        F.col(links_col) if links_col else F.lit(None),
        F.expr("array()").cast(
            "array<struct<trace_id:string,span_id:string,"
            "attrs:map<string,string>>>"))
    # ids are hex strings — no escaping needed; render directly
    links_json = F.concat(
        F.lit("["),
        F.array_join(F.transform(links, lambda ln: F.concat(
            F.lit('{"attribute":'), jmap(ln["attrs"]),
            F.lit(',"spanID":"'),
            F.coalesce(ln["span_id"], F.lit("")),
            F.lit('","traceID":"'),
            F.coalesce(ln["trace_id"], F.lit("")), F.lit('"}'))), ","),
        F.lit("]"))

    events = F.coalesce(
        F.col(events_col) if events_col else F.lit(None),
        F.expr("array()").cast(
            "array<struct<ts_ns:bigint,name:string,"
            "attrs:map<string,string>>>"))
    _js = lambda c: F.substring(  # noqa: E731
        F.to_json(F.array(F.coalesce(c, F.lit("")))), 2,
        F.length(F.to_json(F.array(F.coalesce(c, F.lit(""))))) - 2)
    events_json = F.concat(
        F.lit("["),
        F.array_join(F.transform(events, lambda ev: F.concat(
            F.lit('{"attribute":'), jmap(ev["attrs"]),
            F.lit(',"name":'), _js(ev["name"]),
            F.lit(',"time":'), ev["ts_ns"].cast("string"),
            F.lit("}"))), ","),
        F.lit("]"))

    return df.select(
        *id_cols,
        F.when(end > 0, F.expr(
            f"CAST(COALESCE({end_ns_col}, 0) AS BIGINT)"
            " div 1000000000")).alias("time_s"),
        F.coalesce(res["host.name"], F.lit("")).alias("host"),
        F.coalesce(res["service.name"], F.lit("")).alias("service"),
        _sorted_json(res, ["host.name", "service.name"])
        .alias("resource"),
        F.coalesce(F.col(scope_name_col), F.lit(""))
        .alias("otlp_name"),
        F.coalesce(F.col(scope_version_col), F.lit(""))
        .alias("otlp_version"),
        F.coalesce(F.col(trace_id_col), F.lit("")).alias("trace_id"),
        F.coalesce(F.col(span_id_col), F.lit("")).alias("span_id"),
        F.coalesce(F.col(parent_span_id_col), F.lit(""))
        .alias("parent_span_id"),
        kind_word.alias("kind"),
        F.coalesce(F.col(name_col), F.lit("")).alias("name"),
        links_json.alias("links"),
        events_json.alias("logs"),
        F.coalesce(F.col(trace_state_col), F.lit(""))
        .alias("trace_state"),
        F.expr(f"CAST(COALESCE({start_ns_col}, 0) AS BIGINT)"
               " div 1000").cast("string").alias("start"),
        F.expr(f"CAST(COALESCE({end_ns_col}, 0) AS BIGINT)"
               " div 1000").cast("string").alias("end"),
        F.expr(f"CAST(COALESCE({end_ns_col}, 0)"
               f" - COALESCE({start_ns_col}, 0) AS BIGINT) div 1000")
        .cast("string").alias("duration"),
        jmap(F.col(attrs_col)).alias("attribute"),
        code_word.alias("status_code"),
        F.coalesce(F.col(status_message_col), F.lit(""))
        .alias("status_message"),
    )

"""Splunk HEC EXPORT translators: OTLP logs / metrics / spans →
Splunk HEC events (``exporter/splunkhecexporter/{logdata,metricdata,
tracedata}_to_splunk.go``; the receive side of the HEC wire shape is
the splunkenterprise receiver in ``operators/splunk.py``).

One row per HEC event; ``fields`` render as a SORTED ``k=v`` CSV
(the HEC fields object is an unordered JSON map). Vectorized Column
algebra, per rule:

logs (``splunk_hec_logs``) — logdata_to_splunk.go:55-137:
- empty/absent body → event rejected (``hec_ok`` false dead-letter,
  the reference returns nil :57-60)
- fields: span_id/trace_id hex when non-empty (:77-82), severity
  text when non-empty / number when != UNSPECIFIED under the
  configurable keys (:83-88), then resource attrs, then log attrs —
  same-key later writes WIN (Go map assignment :90-119); the routing
  keys (host/source/sourcetype/index) and the HEC token label are
  consumed, not copied
- host defaults to "unknown" (metricdata_to_splunk.go:22); source /
  sourcetype / index default to the config strings; log attrs
  override resource attrs for routing too (second loop wins)
- time: ns → seconds with ms precision, Round-half-away-from-zero
  (nanoTimestampToEpochMilliseconds :139-141); ts==0 falls back to
  the observed timestamp (:121-124)
- value flattening (mergeValue :143-186) happens at parse time in
  this engine — attr maps arrive as string maps (AsString), so the
  nested-map/array flatten rule has no per-row counterpart here

metrics (``splunk_hec_metrics``) — metricdata_to_splunk.go:55-216:
- every event carries ``metric_type`` = pmetric String() (Gauge /
  Sum / Histogram / Summary) and Event = "metric" (:218-228)
- gauge/sum: one event per point, ``metric_name:<name>`` = int value
  or sanitized double (NaN/+Inf/-Inf become STRINGS, :41-52); EMPTY
  value type → event WITHOUT a value field
- histogram: ``_sum`` event only when HasSum && !NaN, ``_count``
  always; buckets only when len(counts)==len(bounds)+1 — running
  total with ``le``-field bound (FormatFloat 'g'), +Inf last (:103-155)
- summary: ``_sum`` (gated on !NaN), ``_count``, and per quantile a
  ``qt=<'g' fmt>`` field + ``metric_name:<name>_<'f' fmt>`` value
  (:173-207)
- exponential histogram / empty → dropped (:208-216)

spans (``splunk_hec_spans``) — tracedata_to_splunk.go:51-132: one
event per span, Event = the hecSpan JSON object (struct field order,
attribute maps sorted, omitempty for attrs/events/links), time from
the START timestamp, routing + common fields from resource attrs
only.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

UNKNOWN_HOST = "unknown"                      # metricdata:22
HEC_TOKEN_LABEL = "com.splunk.hec.access_token"  # common.go:30
METRIC_EVENT = "metric"                       # common.go:32

DEFAULT_SOURCE_KEY = "com.splunk.source"
DEFAULT_SOURCETYPE_KEY = "com.splunk.sourcetype"
DEFAULT_INDEX_KEY = "com.splunk.index"
DEFAULT_HOST_KEY = "host.name"
DEFAULT_SEVERITY_TEXT_KEY = "otel.log.severity.text"
DEFAULT_SEVERITY_NUMBER_KEY = "otel.log.severity.number"

_ENT_T = "struct<key:string,value:string>"
_EMPTY_ENTS = f"array<{_ENT_T}>"


def _ent(key, value: Column) -> Column:
    k = F.lit(key) if isinstance(key, str) else key
    return F.struct(k.alias("key"), value.cast("string").alias("value"))


def _maybe_ent(cond: Column, key, value: Column) -> Column:
    return F.when(cond, F.array(_ent(key, value))).otherwise(
        F.expr("array()").cast(_EMPTY_ENTS))


def _map_ents(m: Column, drop_keys: list[str]) -> Column:
    ents = F.map_entries(F.coalesce(
        m, F.expr("map()").cast("map<string,string>")))
    return F.filter(
        ents, lambda e: ~e["key"].isin(*drop_keys) if drop_keys
        else F.lit(True))


def _fields_csv(ents: Column) -> Column:
    """Last write wins (Go map assignment), then sorted k=v CSV."""
    dedup = F.filter(
        ents,
        lambda x, i: ~F.exists(
            F.slice(ents, i + 2,
                    F.greatest(F.size(ents) - i - 1, F.lit(0))),
            lambda y: y["key"] == x["key"]))
    return F.array_join(F.array_sort(F.transform(
        dedup, lambda e: F.concat(e["key"], F.lit("="),
                                  F.coalesce(e["value"], F.lit(""))))),
        ",")


def _hec_time(ts_ns: Column) -> Column:
    """ns → seconds at ms precision (Round half away from zero,
    nanoTimestampToEpochMilliseconds). Integral arithmetic — double
    division loses ULPs at ~1.7e18 ns; the decimal division is exact
    because the numerator is already a multiple of 1e6."""
    adj = (F.when(ts_ns >= 0, ts_ns + 500_000)
           .otherwise(ts_ns - 500_000)).cast("bigint")
    ms = ((adj - adj % 1_000_000).cast("decimal(38,0)")
          / 1_000_000).cast("bigint")
    return ms.cast("double") / 1000.0


def _routing(res: Column, attrs: Column | None, *, host_key: str,
             source_key: str, sourcetype_key: str, index_key: str,
             source: str, sourcetype: str, index: str):
    def pick(key: str, default: Column) -> Column:
        later = attrs[key] if attrs is not None else F.lit(None)
        return F.coalesce(later, res[key], default)

    return (pick(host_key, F.lit(UNKNOWN_HOST)),
            pick(source_key, F.lit(source)),
            pick(sourcetype_key, F.lit(sourcetype)),
            pick(index_key, F.lit(index)))


def splunk_hec_logs(
    df: DataFrame,
    *,
    id_cols: list[str],
    body_col: str = "body",
    ts_ns_col: str = "ts_ns",
    observed_ts_ns_col: str = "observed_ts_ns",
    trace_id_col: str = "trace_id",
    span_id_col: str = "span_id",
    severity_text_col: str = "severity_text",
    severity_number_col: str = "severity_number",
    attrs_col: str = "attrs",
    res_attrs_col: str = "res_attrs",
    source: str = "",
    sourcetype: str = "",
    index: str = "",
    host_key: str = DEFAULT_HOST_KEY,
    source_key: str = DEFAULT_SOURCE_KEY,
    sourcetype_key: str = DEFAULT_SOURCETYPE_KEY,
    index_key: str = DEFAULT_INDEX_KEY,
    severity_text_key: str = DEFAULT_SEVERITY_TEXT_KEY,
    severity_number_key: str = DEFAULT_SEVERITY_NUMBER_KEY,
) -> DataFrame:
    body = F.col(body_col)
    res = F.col(res_attrs_col)
    attrs = F.col(attrs_col)
    sev_n = F.coalesce(F.col(severity_number_col), F.lit(0))
    drop = [host_key, source_key, sourcetype_key, index_key,
            HEC_TOKEN_LABEL]

    ents = F.concat(
        _maybe_ent(F.coalesce(F.col(span_id_col), F.lit("")) != "",
                   "span_id", F.col(span_id_col)),
        _maybe_ent(F.coalesce(F.col(trace_id_col), F.lit("")) != "",
                   "trace_id", F.col(trace_id_col)),
        _maybe_ent(F.coalesce(F.col(severity_text_col), F.lit("")) != "",
                   severity_text_key, F.col(severity_text_col)),
        _maybe_ent(sev_n != 0, severity_number_key, sev_n),
        _map_ents(res, drop),
        _map_ents(attrs, drop),
    )

    host, src, st, idx = _routing(
        res, attrs, host_key=host_key, source_key=source_key,
        sourcetype_key=sourcetype_key, index_key=index_key,
        source=source, sourcetype=sourcetype, index=index)
    ts = F.when(F.coalesce(F.col(ts_ns_col), F.lit(0)) != 0,
                F.col(ts_ns_col)).otherwise(
        F.coalesce(F.col(observed_ts_ns_col), F.lit(0)))

    return df.select(
        *id_cols,
        (body.isNotNull() & (body != "")).alias("hec_ok"),
        _hec_time(ts).alias("time"),
        host.alias("host"), src.alias("source"),
        st.alias("sourcetype"), idx.alias("index"),
        F.coalesce(body, F.lit("")).alias("event"),
        _fields_csv(ents).alias("fields"),
    )


_EV_T = f"struct<suffix:string,value:string,extra:array<{_ENT_T}>>"
_EMPTY_EVS = f"array<{_EV_T}>"


def _fmt_g(c: Column) -> Column:
    """FormatFloat 'g' for the tested range (metricdata:271-273)."""
    return (F.when(c == float("inf"), F.lit("+Inf"))
            .when(c == float("-inf"), F.lit("-Inf"))
            .otherwise(F.regexp_replace(c.cast("string"), r"\.0$", "")))


def _sanitize(c: Column) -> Column:
    return (F.when(F.isnan(c), F.lit("NaN"))
            .when(c == float("inf"), F.lit("+Inf"))
            .when(c == float("-inf"), F.lit("-Inf"))
            .otherwise(c.cast("string")))


def splunk_hec_metrics(
    df: DataFrame,
    *,
    id_cols: list[str],
    name_col: str = "name",
    mtype_col: str = "mtype",
    ts_ns_col: str = "ts_ns",
    attrs_col: str = "attrs",
    res_attrs_col: str = "res_attrs",
    is_int_col: str = "is_int",
    vint_col: str = "vint",
    vdouble_col: str = "vdouble",
    count_col: str = "count",
    sum_col: str = "sum",
    bounds_col: str = "bounds",
    bucket_counts_col: str = "bucket_counts",
    quantiles_col: str = "quantiles",
    source: str = "",
    sourcetype: str = "",
    index: str = "",
    host_key: str = DEFAULT_HOST_KEY,
    source_key: str = DEFAULT_SOURCE_KEY,
    sourcetype_key: str = DEFAULT_SOURCETYPE_KEY,
    index_key: str = DEFAULT_INDEX_KEY,
) -> DataFrame:
    name, mtype = F.col(name_col), F.col(mtype_col)
    res, attrs = F.col(res_attrs_col), F.col(attrs_col)
    nil_s = F.lit(None).cast("string")
    no_extra = F.expr("array()").cast(f"array<{_ENT_T}>")

    def ev(suffix: Column, value: Column, extra: Column) -> Column:
        return F.struct(suffix.alias("suffix"),
                        value.cast("string").alias("value"),
                        extra.alias("extra"))

    def one(cond: Column, e: Column) -> Column:
        return F.when(cond, F.array(e)).otherwise(
            F.expr("array()").cast(_EMPTY_EVS))

    is_int = F.col(is_int_col)
    number_evs = one(
        mtype.isin("gauge", "sum"),
        ev(F.lit(""),
           F.when(is_int, F.col(vint_col).cast("string"))
           .when(~is_int, _sanitize(F.col(vdouble_col))),
           no_extra))

    counts = F.coalesce(F.col(bucket_counts_col),
                        F.expr("array()").cast("array<bigint>"))
    bounds = F.coalesce(F.col(bounds_col),
                        F.expr("array()").cast("array<double>"))
    buckets_ok = ((F.size(counts) > 0)
                  & (F.size(counts) == F.size(bounds) + 1))
    hist = mtype == "histogram"
    sum_c = F.col(sum_col)
    hist_evs = F.concat(
        one(hist & sum_c.isNotNull() & ~F.isnan(sum_c),
            ev(F.lit("_sum"), sum_c.cast("string"), no_extra)),
        one(hist, ev(F.lit("_count"), F.col(count_col).cast("string"),
                     no_extra)),
        F.when(hist & buckets_ok, F.transform(
            counts,
            lambda c, j: ev(
                F.lit("_bucket"),
                F.aggregate(F.slice(counts, F.lit(1), j + 1),
                            F.lit(0).cast("bigint"),
                            lambda a, x: a + x).cast("string"),
                F.array(_ent(
                    "le",
                    F.when(j < F.size(bounds),
                           _fmt_g(F.element_at(bounds, j + 1)))
                    .otherwise(F.lit("+Inf")))))))
        .otherwise(F.expr("array()").cast(_EMPTY_EVS)),
    )

    summ = mtype == "summary"
    summary_evs = F.concat(
        one(summ & ~F.isnan(F.coalesce(sum_c, F.lit(0.0))),
            ev(F.lit("_sum"), F.coalesce(sum_c, F.lit(0.0))
               .cast("string"), no_extra)),
        one(summ, ev(F.lit("_count"), F.col(count_col).cast("string"),
                     no_extra)),
        F.when(summ, F.transform(
            F.coalesce(F.col(quantiles_col), F.expr("array()").cast(
                "array<struct<q:double,v:double>>")),
            lambda qv: ev(F.concat(F.lit("_"), _fmt_g(qv["q"])),
                          _sanitize(qv["v"]),
                          F.array(_ent("qt", _fmt_g(qv["q"]))))))
        .otherwise(F.expr("array()").cast(_EMPTY_EVS)),
    )

    drop = [host_key, source_key, sourcetype_key, index_key,
            HEC_TOKEN_LABEL]
    host, src, st, idx = _routing(
        res, None, host_key=host_key, source_key=source_key,
        sourcetype_key=sourcetype_key, index_key=index_key,
        source=source, sourcetype=sourcetype, index=index)

    out = df.select(
        *id_cols,
        name.alias("_name"),
        _hec_time(F.col(ts_ns_col)).alias("time"),
        host.alias("host"), src.alias("source"),
        st.alias("sourcetype"), idx.alias("index"),
        F.concat(_map_ents(res, drop), _map_ents(attrs, []))
        .alias("_base"),
        F.when(mtype == "gauge", F.lit("Gauge"))
        .when(mtype == "sum", F.lit("Sum"))
        .when(mtype == "histogram", F.lit("Histogram"))
        .when(mtype == "summary", F.lit("Summary")).alias("_mt"),
        F.explode(F.concat(number_evs, hist_evs, summary_evs))
        .alias("_ev"),
    )
    e = F.col("_ev")
    ents = F.concat(
        F.col("_base"),
        e["extra"],
        F.array(_ent("metric_type", F.col("_mt"))),
        F.when(e["value"].isNotNull(),
               F.array(_ent(F.concat(F.lit("metric_name:"),
                                     F.col("_name"), e["suffix"]),
                            e["value"])))
        .otherwise(F.expr("array()").cast(_EMPTY_ENTS)),
    )
    return out.select(
        *id_cols, F.col("time"), F.col("host"), F.col("source"),
        F.col("sourcetype"), F.col("index"),
        F.lit(METRIC_EVENT).alias("event"),
        _fields_csv(ents).alias("fields"),
    )


def splunk_hec_spans(
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
    attrs_col: str = "attrs",
    res_attrs_col: str = "res_attrs",
    events_col: str | None = "events",
    links_col: str | None = "links",
    source: str = "",
    sourcetype: str = "",
    index: str = "",
    host_key: str = DEFAULT_HOST_KEY,
    source_key: str = DEFAULT_SOURCE_KEY,
    sourcetype_key: str = DEFAULT_SOURCETYPE_KEY,
    index_key: str = DEFAULT_INDEX_KEY,
) -> DataFrame:
    res = F.col(res_attrs_col)
    drop = [host_key, source_key, sourcetype_key, index_key,
            HEC_TOKEN_LABEL]
    host, src, st, idx = _routing(
        res, None, host_key=host_key, source_key=source_key,
        sourcetype_key=sourcetype_key, index_key=index_key,
        source=source, sourcetype=sourcetype, index=index)

    def jmap(m: Column) -> Column:
        """Sorted compact JSON object of a string map; NULL when
        empty (json omitempty)."""
        ents = F.array_sort(F.map_entries(F.coalesce(
            m, F.expr("map()").cast("map<string,string>"))))
        return F.when(F.size(ents) > 0,
                      F.to_json(F.map_from_entries(ents)))

    def jstr(c: Column) -> Column:
        # JSON string escape via to_json of a 1-element array
        js = F.to_json(F.array(F.coalesce(c, F.lit(""))))
        return F.substring(js, F.lit(2), F.length(js) - 2)

    # traceutil.SpanKindStr / StatusCodeStr (traceutil.go:16-47);
    # out-of-range kinds render as ""
    kind_word = F.element_at(
        F.array(*[F.lit(w) for w in
                  ["SPAN_KIND_UNSPECIFIED", "SPAN_KIND_INTERNAL",
                   "SPAN_KIND_SERVER", "SPAN_KIND_CLIENT",
                   "SPAN_KIND_PRODUCER", "SPAN_KIND_CONSUMER", ""]]),
        F.when((F.col(kind_col) >= 0) & (F.col(kind_col) <= 5),
               F.col(kind_col)).otherwise(F.lit(6)).cast("int") + 1)
    code_word = (F.when(F.col(status_code_col) == 1,
                        F.lit("STATUS_CODE_OK"))
                 .when(F.col(status_code_col) == 2,
                       F.lit("STATUS_CODE_ERROR"))
                 .otherwise(F.lit("STATUS_CODE_UNSET")))

    events = F.coalesce(
        F.col(events_col) if events_col else F.lit(None),
        F.expr("array()").cast(
            "array<struct<ts_ns:bigint,name:string,"
            "attrs:map<string,string>>>"))
    links = F.coalesce(
        F.col(links_col) if links_col else F.lit(None),
        F.expr("array()").cast(
            "array<struct<trace_id:string,span_id:string,"
            "trace_state:string,attrs:map<string,string>>>"))

    def jfield(key: str, val: Column) -> Column:
        return F.when(val.isNotNull(),
                      F.concat(F.lit(f'"{key}":'), val))

    def jobj(*fields: Column) -> Column:
        return F.concat(
            F.lit("{"),
            F.array_join(F.filter(F.array(*fields),
                                  lambda x: x.isNotNull()), ","),
            F.lit("}"))

    ev_json = F.when(F.size(events) > 0, F.concat(
        F.lit("["),
        F.array_join(F.transform(events, lambda ev: jobj(
            jfield("attributes", jmap(ev["attrs"])),
            jfield("name", jstr(ev["name"])),
            jfield("timestamp", ev["ts_ns"].cast("string")),
        )), ","), F.lit("]")))
    ln_json = F.when(F.size(links) > 0, F.concat(
        F.lit("["),
        F.array_join(F.transform(links, lambda ln: jobj(
            jfield("attributes", jmap(ln["attrs"])),
            jfield("trace_id", jstr(ln["trace_id"])),
            jfield("span_id", jstr(ln["span_id"])),
            jfield("trace_state", jstr(ln["trace_state"])),
        )), ","), F.lit("]")))

    span_json = jobj(
        jfield("trace_id", jstr(F.col(trace_id_col))),
        jfield("span_id", jstr(F.col(span_id_col))),
        jfield("parent_span_id", jstr(F.col(parent_span_id_col))),
        jfield("name", jstr(F.col(name_col))),
        jfield("attributes", jmap(F.col(attrs_col))),
        jfield("end_time", F.col(end_ns_col).cast("string")),
        jfield("kind", jstr(kind_word)),
        jfield("status", jobj(
            jfield("message", jstr(F.col(status_message_col))),
            jfield("code", jstr(code_word)))),
        jfield("start_time", F.col(start_ns_col).cast("string")),
        jfield("events", ev_json),
        jfield("links", ln_json),
    )

    return df.select(
        *id_cols,
        _hec_time(F.col(start_ns_col)).alias("time"),
        host.alias("host"), src.alias("source"),
        st.alias("sourcetype"), idx.alias("index"),
        span_json.alias("event"),
        _fields_csv(_map_ents(res, drop)).alias("fields"),
    )

"""Loki EXPORT translator: OTLP logs -> Loki push streams.

Re-expresses ``pkg/translator/loki`` (the export half; the receive half
is ``receivers.py::loki_push_parse``) as pure Spark Column algebra —
zero Python in the hot path, zero shuffles until the final stream
grouping:

- tenant hint resolution          — logs_to_loki.go:176-196
  (GetTenantFromTenantHint: the ``loki.tenant`` hint is looked up in
  resource attrs first, then log attrs; its value names the attribute
  whose value is the tenant, again resource-first)
- level attribute + hint          — logs_to_loki.go:199-223
  (addLogLevelAttributeAndHint: severity != UNSPECIFIED appends
  ``level`` to the attribute-label hint and injects the severity word
  if no ``level`` attribute exists)
- label selection + merge         — convert.go:37-99
  (convertAttributesAndMerge: defaults [exporter=OTLP, job from
  service.namespace "/" service.name, instance from
  service.instance.id] <- resource hint from resource attrs <- resource
  hint from log attrs <- attribute hint from log attrs; later wins)
- label-name normalization        — logs_to_loki.go:150-157
  (otlptranslator LabelNamer == prometheus NormalizeLabel; reuses
  ``prw.prom_normalize_label``); the stream key is the sorted
  ``{k="v", ...}`` rendering of model.LabelSet.String()
- promoted-attribute removal      — convert.go:141-149
  (removeAttributes: the four hints plus every promoted RAW attr name,
  from both log and resource attrs — note the defaults remove ``job``/
  ``instance``/``exporter`` raw keys, NOT their source attrs)
- entry encoding                  — convert.go:151-199 + encode.go
  (format hint resource-first, default json; json = the lokiEntry
  struct in declaration order with omitempty; logfmt = body keyvals +
  traceID/spanID/severity/flags replace-or-append + attribute_*/
  resource_*/instrumentation_scope_*; raw = body; invalid format =
  record dropped, counted in the PushReport)
- stream grouping + report        — logs_to_loki.go:50-115
  (streams keyed by (tenant, labels-string); PushReport counts
  submitted/dropped per tenant)

Model restrictions (documented divergences from the Go):
- attribute maps are flat ``map<string,string>`` — the nested-map
  segment walk of convert.go:102-120 has no arrow-native counterpart
  here, and label VALUES are the raw strings (no %q escaping; fixtures
  avoid quotes/newlines in label values);
- json encoding uses Spark ``to_json`` which does NOT HTML-escape
  ``<``/``>``/``&`` the way Go's json.Marshal does;
- logfmt body parsing assumes space-separated tokens with at most one
  ``=`` split point per token (the go-logfmt grammar minus quoted
  values), matching the reference for well-formed logfmt bodies; a
  bare word ``w`` becomes ``w=`` exactly like the Go round-trip;
- the ``time.Now()`` fallback of convert.go:193-199 is unsupported —
  a deterministic engine has no ambient clock; rows must carry a
  timestamp or observed timestamp.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .prw import prom_normalize_label

# logs_to_loki.go:232-259 — SeverityNumber -> level word (index = number;
# 0/UNSPECIFIED is unreachable: the Go returns before the lookup)
SEVERITY_WORDS: list[str] = ["UNSPECIFIED"] + [
    base + suffix
    for base in ("TRACE", "DEBUG", "INFO", "WARN", "ERROR", "FATAL")
    for suffix in ("", "2", "3", "4")
]

HINT_ATTRIBUTES = "loki.attribute.labels"
HINT_RESOURCES = "loki.resource.labels"
HINT_TENANT = "loki.tenant"
HINT_FORMAT = "loki.format"
_HINTS = (HINT_ATTRIBUTES, HINT_RESOURCES, HINT_TENANT, HINT_FORMAT)


def loki_level_word(severity_number: Column) -> Column:
    """severityNumberToLevel (logs_to_loki.go:232-259) for 1..24."""
    return F.element_at(
        F.array(*[F.lit(w) for w in SEVERITY_WORDS]),
        (severity_number % 25).cast("int") + 1)


def _parse_hint(hint: Column) -> Column:
    """parseAttributeNames + TrimSpace (convert.go:123-149): the hint is
    a comma-separated list; empty segments resolve to no attribute."""
    return F.filter(
        F.transform(F.split(F.coalesce(hint, F.lit("")), ","),
                    lambda x: F.trim(x)),
        lambda x: x != "")


def _select_labels(hints: Column, attrs: Column) -> Column:
    """convertAttributesToLabels (convert.go:85-99): keep hint names that
    resolve in ``attrs``, as (raw key, value) entries."""
    return F.filter(
        F.transform(
            hints,
            lambda k: F.struct(k.alias("key"),
                               F.element_at(attrs, k).alias("value"))),
        lambda e: e["value"].isNotNull())


def _entry(key: str, value: Column) -> Column:
    return F.struct(F.lit(key).alias("key"), value.alias("value"))


def _dedup_last_wins(entries: Column) -> Column:
    """LabelSet.Merge chain (convert.go:38-59): later entries override
    earlier ones with the same RAW key. Tiny per-row arrays -> the O(n²)
    scan stays inside whole-stage codegen."""
    rev = F.reverse(entries)
    return F.filter(
        rev,
        lambda e, i: ~F.exists(
            F.slice(rev, F.lit(1), i),
            lambda p: p["key"] == e["key"]))


def _enabled(default_labels_enabled: dict[str, bool] | None,
             key: str) -> bool:
    """Go map semantics: absent key == enabled (convert.go:63-82)."""
    return (default_labels_enabled or {}).get(key, True)


def _logfmt_value(v: Column) -> Column:
    """logfmt.MarshalKeyvals value rendering: plain when no space/=/",
    else strconv.Quote."""
    needs = v.rlike('[ ="]')
    quoted = F.concat(
        F.lit('"'),
        F.regexp_replace(
            F.regexp_replace(v, r"\\", r"\\\\"), '"', r'\\"'),
        F.lit('"'))
    return F.when(needs, quoted).otherwise(v)


def _replace_or_append(entries: Column, key: str, value: Column,
                       present: Column) -> Column:
    """keyvalsReplaceOrAppend (encode.go:203-211): replace the FIRST
    occurrence of ``key``, else append — but only when ``present``."""
    keys = F.transform(entries, lambda e: e["key"])
    first = F.array_position(keys, F.lit(key))
    replaced = F.transform(
        entries,
        lambda e, i: F.when((i + 1) == first,
                            F.struct(e["key"].alias("key"),
                                     value.alias("value")))
        .otherwise(e))
    appended = F.when(first > 0, replaced).otherwise(
        F.concat(entries, F.array(_entry(key, value))))
    return F.when(present, appended).otherwise(entries)


def _sorted_map(m: Column) -> Column:
    """Non-empty map with entries sorted by key (Go json.Marshal order),
    NULL when empty so to_json omits the field (omitempty)."""
    s = F.map_from_entries(F.array_sort(F.map_entries(m)))
    return F.when(F.size(m) > 0, s)


def logs_to_loki_entries(
    df: DataFrame,
    *,
    id_cols: list[str],
    body_col: str = "body",
    severity_number_col: str = "severity_number",
    severity_text_col: str = "severity_text",
    trace_id_col: str = "trace_id",
    span_id_col: str = "span_id",
    flags_col: str = "flags",
    ts_ns_col: str = "ts_ns",
    observed_ts_ns_col: str | None = None,
    attrs_col: str = "attrs",
    res_attrs_col: str = "res_attrs",
    scope_name_col: str | None = "scope_name",
    scope_version_col: str | None = "scope_version",
    default_labels_enabled: dict[str, bool] | None = None,
) -> DataFrame:
    """LogsToLokiRequests, per-entry half (logs_to_loki.go:50-170): one
    zero-shuffle projection pipeline mapping each log record to
    (tenant, labels, format, ts_out_ns, line, dropped). The merged
    label array and pruned maps are STAGED as concrete columns (select
    barriers) — each is referenced by several downstream expressions
    and CollapseProject would otherwise re-inline the O(n²) dedup tree
    into every consumer (measured: 41 s -> seconds at sf0.01, all of it
    driver-side codegen)."""
    attrs = F.col(attrs_col)
    res = F.col(res_attrs_col)
    body = F.col(body_col)
    sev = F.coalesce(F.col(severity_number_col), F.lit(0)).cast("int")
    sev_text = F.coalesce(F.col(severity_text_col), F.lit(""))
    trace_id = F.coalesce(F.col(trace_id_col), F.lit(""))
    span_id = F.coalesce(F.col(span_id_col), F.lit(""))
    flags = F.coalesce(F.col(flags_col), F.lit(0)).cast("bigint")
    scope_name = (F.coalesce(F.col(scope_name_col), F.lit(""))
                  if scope_name_col else F.lit(""))
    scope_version = (F.coalesce(F.col(scope_version_col), F.lit(""))
                     if scope_version_col else F.lit(""))

    # --- tenant (logs_to_loki.go:176-196) -----------------------------
    tenant_hint = F.coalesce(F.element_at(res, F.lit(HINT_TENANT)),
                             F.element_at(attrs, F.lit(HINT_TENANT)))
    tenant = F.when(
        tenant_hint.isNotNull(),
        F.coalesce(F.element_at(res, tenant_hint),
                   F.element_at(attrs, tenant_hint), F.lit(""))
    ).otherwise(F.lit(""))

    # --- level attribute + hint (logs_to_loki.go:199-230) -------------
    level_on = _enabled(default_labels_enabled, "level")
    has_level = F.array_contains(F.map_keys(attrs), "level")
    add_level = F.lit(level_on) & (sev != 0)
    attrs_eff = F.when(
        add_level & ~has_level,
        F.map_concat(attrs, F.create_map(F.lit("level"),
                                         loki_level_word(sev)))
    ).otherwise(attrs)
    attr_hints = _parse_hint(F.element_at(attrs, F.lit(HINT_ATTRIBUTES)))
    attr_hints = F.when(
        add_level, F.concat(attr_hints, F.array(F.lit("level")))
    ).otherwise(attr_hints)

    # --- label merge (convert.go:37-82), later wins --------------------
    svc_name = F.element_at(res, F.lit("service.name"))
    svc_ns = F.element_at(res, F.lit("service.namespace"))
    job = F.when(svc_ns.isNotNull(),
                 F.concat(svc_ns, F.lit("/"), svc_name)).otherwise(svc_name)
    defaults = F.filter(
        F.array(
            _entry("exporter",
                   F.when(F.lit(_enabled(default_labels_enabled,
                                         "exporter")), F.lit("OTLP"))),
            _entry("job",
                   F.when(F.lit(_enabled(default_labels_enabled, "job"))
                          & svc_name.isNotNull(), job)),
            _entry("instance",
                   F.when(F.lit(_enabled(default_labels_enabled,
                                         "instance")),
                          F.element_at(res,
                                       F.lit("service.instance.id")))),
        ),
        lambda e: e["value"].isNotNull())
    merged = _dedup_last_wins(F.concat(
        defaults,
        _select_labels(
            _parse_hint(F.element_at(res, F.lit(HINT_RESOURCES))), res),
        _select_labels(
            _parse_hint(F.element_at(attrs, F.lit(HINT_RESOURCES))), res),
        _select_labels(attr_hints, attrs_eff),
    ))

    # --- format + timestamp (convert.go:151-199) -----------------------
    fmt = F.coalesce(F.element_at(res, F.lit(HINT_FORMAT)),
                     F.element_at(attrs, F.lit(HINT_FORMAT)),
                     F.lit("json"))
    ts = F.col(ts_ns_col).cast("bigint")
    if observed_ts_ns_col:
        obs = F.col(observed_ts_ns_col).cast("bigint")
        ts = F.when(ts != 0, ts).otherwise(obs)

    # --- barrier 1: the merged label array as a concrete column --------
    stage1 = df.select(
        *id_cols,
        body.alias("_body"),
        sev_text.alias("_sev_text"),
        trace_id.alias("_trace"),
        span_id.alias("_span"),
        flags.alias("_flags"),
        scope_name.alias("_scope_name"),
        scope_version.alias("_scope_version"),
        tenant.alias("tenant"),
        fmt.alias("format"),
        ts.alias("ts_out_ns"),
        attrs_eff.alias("_attrs_eff"),
        res.alias("_res"),
        merged.alias("_merged"),
    )
    body, sev_text = F.col("_body"), F.col("_sev_text")
    trace_id, span_id, flags = F.col("_trace"), F.col("_span"), F.col("_flags")
    scope_name, scope_version = F.col("_scope_name"), F.col("_scope_version")
    merged = F.col("_merged")

    # --- labels string (LabelSet.String(): sorted normalized keys) ----
    labels = F.concat(
        F.lit("{"),
        F.array_join(
            F.transform(
                F.array_sort(F.transform(
                    merged,
                    lambda e: F.struct(
                        prom_normalize_label(e["key"]).alias("key"),
                        e["value"].alias("value")))),
                lambda e: F.concat(e["key"], F.lit('="'), e["value"],
                                   F.lit('"'))),
            ", "),
        F.lit("}"))

    # --- removeAttributes (convert.go:141-149), raw-key based ----------
    def prune(m: Column) -> Column:
        return F.map_filter(
            m,
            lambda k, _v: ~k.isin(*_HINTS)
            & ~F.exists(merged, lambda e: e["key"] == k))

    # --- barrier 2: labels + pruned maps (each multiply referenced) ----
    stage2 = stage1.select(
        *id_cols, "tenant", "format", "ts_out_ns",
        "_body", "_sev_text", "_trace", "_span", "_flags",
        "_scope_name", "_scope_version",
        labels.alias("labels"),
        prune(F.col("_attrs_eff")).alias("_attrs_pruned"),
        prune(F.col("_res")).alias("_res_pruned"),
    )
    attrs_pruned = F.col("_attrs_pruned")
    res_pruned = F.col("_res_pruned")

    # --- json line (encode.go:42-76, field order == Go declaration) ----
    scope_struct = F.when(
        scope_name != "",
        F.struct(scope_name.alias("name"),
                 F.nullif(scope_version, F.lit("")).alias("version")))
    json_line = F.to_json(F.struct(
        body.alias("body"),
        F.nullif(trace_id, F.lit("")).alias("traceid"),
        F.nullif(span_id, F.lit("")).alias("spanid"),
        F.nullif(sev_text, F.lit("")).alias("severity"),
        F.nullif(flags, F.lit(0)).alias("flags"),
        _sorted_map(attrs_pruned).alias("attributes"),
        _sorted_map(res_pruned).alias("resources"),
        scope_struct.alias("instrumentation_scope"),
    ))

    # --- logfmt line (encode.go:80-129) --------------------------------
    body_kv = F.when(body.isNull(), F.array().cast(
        "array<struct<key:string,value:string>>")).otherwise(
        F.transform(
            F.split(body, " "),
            lambda t: F.struct(
                F.substring_index(t, "=", 1).alias("key"),
                F.when(t.contains("="),
                       F.substr(t, F.instr(t, "=") + 1))
                .otherwise(F.lit("")).alias("value"))))
    kv = _replace_or_append(body_kv, "traceID", trace_id, trace_id != "")
    kv = _replace_or_append(kv, "spanID", span_id, span_id != "")
    kv = _replace_or_append(kv, "severity", sev_text, sev_text != "")
    kv = _replace_or_append(kv, "flags", flags.cast("string"), flags != 0)
    kv = F.concat(
        kv,
        F.transform(F.map_entries(attrs_pruned),
                    lambda e: F.struct(
                        F.concat(F.lit("attribute_"),
                                 e["key"]).alias("key"),
                        e["value"].alias("value"))),
        F.transform(F.map_entries(res_pruned),
                    lambda e: F.struct(
                        F.concat(F.lit("resource_"),
                                 e["key"]).alias("key"),
                        e["value"].alias("value"))),
        F.when(scope_name != "",
               F.array(_entry("instrumentation_scope_name", scope_name)))
        .otherwise(F.array().cast(
            "array<struct<key:string,value:string>>")),
        F.when((scope_name != "") & (scope_version != ""),
               F.array(_entry("instrumentation_scope_version",
                              scope_version)))
        .otherwise(F.array().cast(
            "array<struct<key:string,value:string>>")),
    )
    logfmt_line = F.array_join(
        F.transform(kv, lambda e: F.concat(e["key"], F.lit("="),
                                           _logfmt_value(e["value"]))),
        " ")

    raw_line = F.coalesce(body, F.lit(""))

    fmt = F.col("format")
    line = (F.when(fmt == "json", json_line)
            .when(fmt == "logfmt", logfmt_line)
            .when(fmt == "raw", raw_line))
    dropped = ~fmt.isin("json", "logfmt", "raw")

    return stage2.select(
        *id_cols,
        "tenant",
        "labels",
        "format",
        "ts_out_ns",
        F.when(~dropped, line).alias("line"),
        dropped.alias("dropped"),
    )


def loki_streams(entries: DataFrame) -> DataFrame:
    """PushStream grouping (logs_to_loki.go:82-115): entries with the
    same (tenant, labels) form one stream. One map-side-combined
    shuffle; at 100 TB the stream key space is tiny relative to rows."""
    return (entries.where(~F.col("dropped"))
            .groupBy("tenant", "labels")
            .agg(F.count(F.lit(1)).alias("n_entries"),
                 F.min("ts_out_ns").alias("min_ts_ns"),
                 F.max("ts_out_ns").alias("max_ts_ns")))


def loki_push_report(entries: DataFrame) -> DataFrame:
    """PushReport per tenant (logs_to_loki.go:22-26,76-82): submitted
    and dropped record counts."""
    return (entries.groupBy("tenant")
            .agg(F.sum(F.when(~F.col("dropped"), 1).otherwise(0))
                 .cast("bigint").alias("num_submitted"),
                 F.sum(F.when(F.col("dropped"), 1).otherwise(0))
                 .cast("bigint").alias("num_dropped")))

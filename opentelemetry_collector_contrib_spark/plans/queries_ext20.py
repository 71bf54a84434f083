"""Round-5 queries (cont. 4): the Loki EXPORT translator.

The receive direction landed in round 4 (``loki_push_parse``); this
module covers ``pkg/translator/loki`` — logs -> Loki push entries
(tenant hint, label hints + defaults + level injection, json/logfmt/raw
entry encoding), stream grouping, and the per-tenant PushReport. The
fixture is a deterministic projection of ``events`` exercising every
hint/precedence branch; the oracle replicates the Go semantics in
DuckDB SQL over the same statically-known attribute keys.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.loki_export import SEVERITY_WORDS
from .base import QueryFn, load

EXT20_QUERIES: dict[str, QueryFn] = {}
EXT20_ORACLES: dict[str, str] = {}


def _opt_map(*entries) -> F.Column:
    """map from (key, value-or-null) pairs, dropping null values —
    deterministic insertion order (matters: pcommon.Map iterates in
    insertion order and logfmt encoding follows it)."""
    arr = F.array(*[
        F.struct(F.lit(k).alias("key"), v.alias("value"))
        for k, v in entries
    ])
    return F.map_from_entries(
        F.filter(arr, lambda e: e["value"].isNotNull()))


def _loki_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    e, u = F.col("event_id"), F.col("user_id")
    s = lambda c: c.cast("string")  # noqa: E731
    return ev.select(
        e.alias("event_id"),
        F.when(e % 13 != 7,
               F.concat(F.lit("msg=turn"), s(e % 50))).alias("body"),
        (e % 25).cast("int").alias("severity_number"),
        F.when(e % 4 != 0, F.concat(F.lit("S"), s(e % 4)))
        .otherwise(F.lit("")).alias("severity_text"),
        F.when(e % 3 != 0, F.concat(F.lit("tid"), s(e % 97)))
        .otherwise(F.lit("")).alias("trace_id"),
        F.when(e % 5 != 0, F.concat(F.lit("sid"), s(e % 53)))
        .otherwise(F.lit("")).alias("span_id"),
        (e % 2).cast("int").alias("flags"),
        (e * 1000000000 + u).alias("ts_ns"),
        _opt_map(
            ("http.method", F.concat(F.lit("m"), s(u % 3))),
            ("level", F.when(u % 4 == 0, F.concat(F.lit("lv"), s(e % 2)))),
            ("loki.attribute.labels",
             F.when((u % 4 == 0) & (e % 6 == 4), F.lit("http.method, level"))
             .when(e % 2 == 0, F.lit("http.method"))),
            ("loki.resource.labels", F.when(u % 5 == 0, F.lit("pod"))),
            ("loki.format",
             F.when(e % 7 <= 3, F.element_at(
                 F.array(F.lit("logfmt"), F.lit("raw"), F.lit("json"),
                         F.lit("xml")), (e % 7).cast("int") + 1))),
            ("loki.tenant", F.when(u % 7 == 0, F.lit("team"))),
        ).alias("attrs"),
        _opt_map(
            ("service.name", F.concat(F.lit("svc"), s(u % 4))),
            ("service.namespace",
             F.when(u % 2 == 0, F.concat(F.lit("ns"), s(u % 3)))),
            ("service.instance.id",
             F.when(e % 4 != 1, F.concat(F.lit("i"), s(e % 6)))),
            ("pod", F.concat(F.lit("p"), s(e % 5))),
            ("team", F.when(u % 3 != 2, F.concat(F.lit("t"), s(u % 3)))),
            ("loki.resource.labels", F.when(e % 5 == 0, F.lit("pod"))),
            ("loki.tenant", F.when(u % 2 == 1, F.lit("team"))),
            ("loki.format", F.when(e % 11 == 0, F.lit("logfmt"))),
        ).alias("res_attrs"),
        F.when(u % 6 != 5, F.concat(F.lit("sc"), s(u % 2)))
        .otherwise(F.lit("")).alias("scope_name"),
        F.when(u % 2 == 0, F.lit("v1")).otherwise(F.lit(""))
        .alias("scope_version"),
    )


def _entries(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.loki_export import logs_to_loki_entries
    return logs_to_loki_entries(_loki_fixture(spark, sf_dir),
                                id_cols=["event_id"])


def q_loki_export_entries(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _entries(spark, sf_dir)


def q_loki_export_streams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.loki_export import loki_streams
    return loki_streams(_entries(spark, sf_dir))


def q_loki_export_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.loki_export import loki_push_report
    return loki_push_report(_entries(spark, sf_dir))


_WORDS_SQL = "[" + ", ".join(f"'{w}'" for w in SEVERITY_WORDS) + "]"

# The oracle mirrors the fixture's statically-known attribute keys:
# every hint/precedence/removal branch reduces to a CASE expression.
_ENTRIES_SQL = f"""
WITH f AS (
  SELECT event_id AS e, user_id AS u,
    CAST(event_id % 25 AS INT) AS sev,
    CASE WHEN event_id % 13 <> 7
         THEN 'msg=turn' || CAST(event_id % 50 AS VARCHAR) END AS body,
    CASE WHEN event_id % 4 <> 0
         THEN 'S' || CAST(event_id % 4 AS VARCHAR) ELSE '' END AS sev_text,
    CASE WHEN event_id % 3 <> 0
         THEN 'tid' || CAST(event_id % 97 AS VARCHAR) ELSE '' END AS tid,
    CASE WHEN event_id % 5 <> 0
         THEN 'sid' || CAST(event_id % 53 AS VARCHAR) ELSE '' END AS sid,
    CAST(event_id % 2 AS INT) AS flags,
    event_id * 1000000000 + user_id AS ts_ns
  FROM events
), d AS (
  SELECT *,
    -- format: resource hint first (convert.go:165-177)
    CASE WHEN e % 11 = 0 THEN 'logfmt'
         WHEN e % 7 <= 3 THEN ['logfmt','raw','json','xml'][CAST(e % 7 AS INT) + 1]
         ELSE 'json' END AS fmt,
    -- tenant (logs_to_loki.go:176-196)
    CASE WHEN (u % 2 = 1 OR u % 7 = 0) AND u % 3 <> 2
         THEN 't' || CAST(u % 3 AS VARCHAR) ELSE '' END AS tenant,
    -- label components
    (u % 4 = 0 AND e % 6 = 4) OR (e % 2 = 0) AS http_promoted,
    e % 4 <> 1 AS has_instance,
    CASE WHEN u % 2 = 0
         THEN 'ns' || CAST(u % 3 AS VARCHAR) || '/svc' || CAST(u % 4 AS VARCHAR)
         ELSE 'svc' || CAST(u % 4 AS VARCHAR) END AS job,
    (u % 4 = 0 AND e % 6 = 4) OR sev <> 0 AS level_promoted,
    CASE WHEN u % 4 = 0 THEN 'lv' || CAST(e % 2 AS VARCHAR)
         ELSE {_WORDS_SQL}[sev + 1] END AS level_value,
    (e % 5 = 0 OR u % 5 = 0) AS pod_promoted,
    'm' || CAST(u % 3 AS VARCHAR) AS http_v,
    'i' || CAST(e % 6 AS VARCHAR) AS inst_v,
    'p' || CAST(e % 5 AS VARCHAR) AS pod_v,
    u % 3 <> 2 AS has_team,
    't' || CAST(u % 3 AS VARCHAR) AS team_v,
    'svc' || CAST(u % 4 AS VARCHAR) AS svc_v,
    u % 2 = 0 AS has_ns,
    'ns' || CAST(u % 3 AS VARCHAR) AS ns_v,
    u % 6 <> 5 AS has_scope,
    'sc' || CAST(u % 2 AS VARCHAR) AS scope_v,
    u % 2 = 0 AS has_scope_ver
  FROM f
), lab AS (
  SELECT *,
    -- kept (unpromoted) attributes after removeAttributes
    NOT http_promoted AS attr_http_kept,
    u % 4 = 0 AND NOT level_promoted AS attr_level_kept,
    'lv' || CAST(e % 2 AS VARCHAR) AS lvl_attr_v,
    '{{exporter="OTLP"'
      || CASE WHEN http_promoted THEN ', http_method="' || http_v || '"' ELSE '' END
      || CASE WHEN has_instance THEN ', instance="' || inst_v || '"' ELSE '' END
      || ', job="' || job || '"'
      || CASE WHEN level_promoted THEN ', level="' || level_value || '"' ELSE '' END
      || CASE WHEN pod_promoted THEN ', pod="' || pod_v || '"' ELSE '' END
      || '}}' AS labels
  FROM d
), enc AS (
  SELECT *,
    -- json: lokiEntry field order, omitempty (encode.go:20-76)
    '{{' || array_to_string(list_filter([
      CASE WHEN body IS NOT NULL THEN '"body":"' || body || '"' END,
      CASE WHEN tid <> '' THEN '"traceid":"' || tid || '"' END,
      CASE WHEN sid <> '' THEN '"spanid":"' || sid || '"' END,
      CASE WHEN sev_text <> '' THEN '"severity":"' || sev_text || '"' END,
      CASE WHEN flags <> 0 THEN '"flags":' || CAST(flags AS VARCHAR) END,
      CASE WHEN attr_http_kept OR attr_level_kept THEN
        '"attributes":{{' || array_to_string(list_filter([
          CASE WHEN attr_http_kept THEN '"http.method":"' || http_v || '"' END,
          CASE WHEN attr_level_kept THEN '"level":"' || lvl_attr_v || '"' END
        ], x -> x IS NOT NULL), ',') || '}}' END,
      '"resources":{{' || array_to_string(list_filter([
          CASE WHEN NOT pod_promoted THEN '"pod":"' || pod_v || '"' END,
          CASE WHEN has_instance THEN '"service.instance.id":"' || inst_v || '"' END,
          '"service.name":"' || svc_v || '"',
          CASE WHEN has_ns THEN '"service.namespace":"' || ns_v || '"' END,
          CASE WHEN has_team THEN '"team":"' || team_v || '"' END
        ], x -> x IS NOT NULL), ',') || '}}',
      CASE WHEN has_scope THEN
        '"instrumentation_scope":{{"name":"' || scope_v || '"'
        || CASE WHEN has_scope_ver THEN ',"version":"v1"' ELSE '' END || '}}' END
    ], x -> x IS NOT NULL), ',') || '}}' AS json_line,
    -- logfmt: body kv, replace-or-append, attr/resource/scope order
    array_to_string(list_filter([
      CASE WHEN body IS NOT NULL THEN body END,
      CASE WHEN tid <> '' THEN 'traceID=' || tid END,
      CASE WHEN sid <> '' THEN 'spanID=' || sid END,
      CASE WHEN sev_text <> '' THEN 'severity=' || sev_text END,
      CASE WHEN flags <> 0 THEN 'flags=' || CAST(flags AS VARCHAR) END,
      CASE WHEN attr_http_kept THEN 'attribute_http.method=' || http_v END,
      CASE WHEN attr_level_kept THEN 'attribute_level=' || lvl_attr_v END,
      'resource_service.name=' || svc_v,
      CASE WHEN has_ns THEN 'resource_service.namespace=' || ns_v END,
      CASE WHEN has_instance THEN 'resource_service.instance.id=' || inst_v END,
      CASE WHEN NOT pod_promoted THEN 'resource_pod=' || pod_v END,
      CASE WHEN has_team THEN 'resource_team=' || team_v END,
      CASE WHEN has_scope THEN 'instrumentation_scope_name=' || scope_v END,
      CASE WHEN has_scope AND has_scope_ver
           THEN 'instrumentation_scope_version=v1' END
    ], x -> x IS NOT NULL), ' ') AS logfmt_line
  FROM lab
)
SELECT event_id, tenant, labels, fmt AS format, ts_ns AS ts_out_ns,
  CASE fmt WHEN 'json' THEN json_line
           WHEN 'logfmt' THEN logfmt_line
           WHEN 'raw' THEN coalesce(body, '') END AS line,
  fmt = 'xml' AS dropped
FROM (SELECT e AS event_id, * EXCLUDE (e) FROM enc)
"""

O_LOKI_EXPORT_ENTRIES = _ENTRIES_SQL

O_LOKI_EXPORT_STREAMS = f"""
WITH entries AS ({_ENTRIES_SQL})
SELECT tenant, labels, COUNT(*) AS n_entries,
       MIN(ts_out_ns) AS min_ts_ns, MAX(ts_out_ns) AS max_ts_ns
FROM entries WHERE NOT dropped
GROUP BY tenant, labels
"""

O_LOKI_EXPORT_REPORT = f"""
WITH entries AS ({_ENTRIES_SQL})
SELECT tenant,
       CAST(SUM(CASE WHEN dropped THEN 0 ELSE 1 END) AS BIGINT) AS num_submitted,
       CAST(SUM(CASE WHEN dropped THEN 1 ELSE 0 END) AS BIGINT) AS num_dropped
FROM entries
GROUP BY tenant
"""

EXT20_QUERIES["loki_export_entries"] = q_loki_export_entries
EXT20_ORACLES["loki_export_entries"] = O_LOKI_EXPORT_ENTRIES
EXT20_QUERIES["loki_export_streams"] = q_loki_export_streams
EXT20_ORACLES["loki_export_streams"] = O_LOKI_EXPORT_STREAMS
EXT20_QUERIES["loki_export_report"] = q_loki_export_report
EXT20_ORACLES["loki_export_report"] = O_LOKI_EXPORT_REPORT

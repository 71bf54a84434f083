"""Round-5 queries (cont. 16): OTLP logs -> CloudWatch InputLogEvent
rows (``exporter/awscloudwatchlogsexporter``).

``cloudwatch_logs`` drives the structured cwLogBody JSON (Go
struct-field order, omitempty branches, sorted map keys, scope
object) plus the {Pattern} group/stream replacement with the
undefined fallback; ``cloudwatch_logs_raw`` drives raw mode with the
v1 ``_aws`` / v0 EMF metadata stream-key overrides.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import QueryFn, load

EXT32_QUERIES: dict[str, QueryFn] = {}
EXT32_ORACLES: dict[str, str] = {}


def _fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    s = lambda c: c.cast("string")  # noqa: E731
    return ev.select(
        e.alias("i"),
        (F.lit(1700000000_000000000) + e * 1_000_000).cast("bigint")
        .alias("ts_ns"),
        F.when(e % 7 == 0, F.lit("")).otherwise(
            F.concat(F.lit("b "), F.col("event_type"))).alias("body"),
        (e % 5).cast("int").alias("severity_number"),
        F.when(e % 2 == 0, F.lit("INFO")).otherwise(F.lit(""))
        .alias("severity_text"),
        (e % 3).cast("int").alias("dropped"),
        (e % 2).cast("int").alias("flags"),
        F.when(e % 4 == 0, F.concat(F.lit("t"), s(u)))
        .otherwise(F.lit("")).alias("trace_id"),
        F.when(e % 4 == 0, F.concat(F.lit("s"), s(e)))
        .otherwise(F.lit("")).alias("span_id"),
        F.when(e % 6 != 0, F.create_map(F.lit("ak"), s(e % 9)))
        .otherwise(F.create_map().cast("map<string,string>"))
        .alias("attrs"),
        F.when(u % 5 == 0, F.lit("")).otherwise(
            F.concat(F.lit("lib"), s(u % 2))).alias("scope_name"),
        F.when(u % 3 == 0, F.lit("")).otherwise(F.lit("1.0"))
        .alias("scope_version"),
        F.when(u % 4 == 0, F.create_map(F.lit("sk"), F.lit("sv")))
        .otherwise(F.create_map().cast("map<string,string>"))
        .alias("scope_attrs"),
        F.map_from_entries(F.filter(F.array(
            F.struct(F.lit("rk").alias("key"), s(u % 3)
                     .alias("value")),
            F.when(u % 2 == 0,
                   F.struct(F.lit("service.name").alias("key"),
                            F.concat(F.lit("svc"), s(u % 4))
                            .alias("value"))),
            F.when(u % 7 == 0,
                   F.struct(F.lit("ClusterName").alias("key"),
                            F.lit("direct").alias("value"))),
            F.when(u % 11 == 0,
                   F.struct(F.lit("aws.ecs.cluster.name").alias("key"),
                            F.concat(F.lit("cl"), s(u % 2))
                            .alias("value"))),
        ), lambda x: x.isNotNull())).alias("res_attrs"),
    )


def q_cloudwatch_logs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.cloudwatch_export import cloudwatch_log_events

    fx = _fixture(spark, sf_dir)
    return cloudwatch_log_events(
        fx, id_cols=["i"],
        log_group_template="/grp/{ClusterName}",
        log_stream_template="st-{ServiceName}")


O_CW_LOGS = """
WITH b AS (
  SELECT event_id AS i, user_id AS u, event_id AS e, event_type
  FROM events
), c AS (
  SELECT *,
    e % 7 <> 0 AS has_body,
    CASE WHEN u % 2 = 0 THEN 'svc' || CAST(u % 4 AS VARCHAR)
      END AS svc,
    CASE WHEN u % 7 = 0 THEN 'direct'
         WHEN u % 11 = 0 THEN 'cl' || CAST(u % 2 AS VARCHAR)
      END AS cluster
  FROM b
)
SELECT i,
  (1700000000000000000 + e * 1000000) // 1000000 AS timestamp_ms,
  '{' || array_to_string(list_filter([
    CASE WHEN has_body THEN '"body":"b ' || event_type || '"' END,
    CASE WHEN e % 5 <> 0
      THEN '"severity_number":' || CAST(e % 5 AS VARCHAR) END,
    CASE WHEN e % 2 = 0 THEN '"severity_text":"INFO"' END,
    CASE WHEN e % 3 <> 0
      THEN '"dropped_attributes_count":' || CAST(e % 3 AS VARCHAR) END,
    CASE WHEN e % 2 <> 0 THEN '"flags":1' END,
    CASE WHEN e % 4 = 0
      THEN '"trace_id":"t' || CAST(u AS VARCHAR) || '"' END,
    CASE WHEN e % 4 = 0
      THEN '"span_id":"s' || CAST(e AS VARCHAR) || '"' END,
    CASE WHEN e % 6 <> 0
      THEN '"attributes":{"ak":"' || CAST(e % 9 AS VARCHAR)
        || '"}' END,
    CASE WHEN u % 5 <> 0 THEN '"scope":{"name":"lib'
      || CAST(u % 2 AS VARCHAR) || '"'
      || CASE WHEN u % 3 <> 0 THEN ',"version":"1.0"' ELSE '' END
      || CASE WHEN u % 4 = 0
           THEN ',"attributes":{"sk":"sv"}' ELSE '' END
      || '}' END,
    '"resource":{' || array_to_string(list_sort(list_filter([
      CASE WHEN u % 7 = 0 THEN '"ClusterName":"direct"' END,
      CASE WHEN u % 11 = 0 THEN '"aws.ecs.cluster.name":"cl'
        || CAST(u % 2 AS VARCHAR) || '"' END,
      '"rk":"' || CAST(u % 3 AS VARCHAR) || '"',
      CASE WHEN u % 2 = 0 THEN '"service.name":"svc'
        || CAST(u % 4 AS VARCHAR) || '"' END
    ], x -> x IS NOT NULL)), ',') || '}'
  ], x -> x IS NOT NULL), ',') || '}' AS message,
  '/grp/' || COALESCE(cluster, 'undefined') AS log_group,
  'st-' || COALESCE(svc, 'undefined') AS log_stream
FROM c
"""


def q_cloudwatch_logs_raw(spark: SparkSession,
                          sf_dir: str) -> DataFrame:
    from ..operators.cloudwatch_export import cloudwatch_log_events

    ev = load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    s = lambda c: c.cast("string")  # noqa: E731
    body = (
        F.when(e % 4 == 0,
               F.concat(F.lit('{"_aws":{"logGroupName":"g1-'), s(u % 2),
                        F.lit('","logStreamName":"s1"},"m":1}')))
        .when(e % 4 == 1,
              F.concat(F.lit('{"_aws":{"logGroupName":"g2-'), s(u % 2),
                       F.lit('"},"m":2}')))
        .when(e % 4 == 2,
              F.concat(F.lit('{"log_group_name":"g0-'), s(u % 2),
                       F.lit('","log_stream_name":"s0"}')))
        .otherwise(F.lit("plain text")))
    fx = ev.select(
        e.alias("i"),
        (F.lit(1700000000_000000000) + e * 1_000_000).cast("bigint")
        .alias("ts_ns"),
        body.alias("body"),
        F.create_map(F.lit("rk"), s(u % 3)).alias("res_attrs"),
    )
    return cloudwatch_log_events(
        fx, id_cols=["i"], raw_log=True,
        log_group_template="cfg-group",
        log_stream_template="cfg-stream")


O_CW_LOGS_RAW = """
SELECT event_id AS i,
  (1700000000000000000 + event_id * 1000000) // 1000000
    AS timestamp_ms,
  CASE event_id % 4
    WHEN 0 THEN '{"_aws":{"logGroupName":"g1-'
      || CAST(user_id % 2 AS VARCHAR)
      || '","logStreamName":"s1"},"m":1}'
    WHEN 1 THEN '{"_aws":{"logGroupName":"g2-'
      || CAST(user_id % 2 AS VARCHAR) || '"},"m":2}'
    WHEN 2 THEN '{"log_group_name":"g0-'
      || CAST(user_id % 2 AS VARCHAR)
      || '","log_stream_name":"s0"}'
    ELSE 'plain text' END AS message,
  CASE event_id % 4
    WHEN 0 THEN 'g1-' || CAST(user_id % 2 AS VARCHAR)
    WHEN 1 THEN 'g2-' || CAST(user_id % 2 AS VARCHAR)
    WHEN 2 THEN 'g0-' || CAST(user_id % 2 AS VARCHAR)
    ELSE 'cfg-group' END AS log_group,
  CASE event_id % 4
    WHEN 0 THEN 's1'
    WHEN 2 THEN 's0'
    ELSE 'cfg-stream' END AS log_stream
FROM events
"""

_FLAT = ("array_join(array_sort(transform(map_entries({m}), "
         "kv -> concat(kv.key, '=', kv.value))), ',')")


def q_cassandra_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.cassandra_export import (cassandra_log_rows,
                                              cassandra_trace_rows)

    ev = load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    s = lambda c: c.cast("string")  # noqa: E731
    logs = ev.filter(e % 2 == 0).select(
        e.alias("i"),
        (F.lit(1700000000_000000000) + e).cast("bigint")
        .alias("ts_ns"),
        F.concat(F.lit("t"), s(u)).alias("trace_id"),
        F.concat(F.lit("s"), s(e)).alias("span_id"),
        (e % 4).cast("int").alias("flags"),
        F.lit("INFO").alias("severity_text"),
        (e % 25).cast("int").alias("severity_number"),
        F.concat(F.lit('b "'), F.col("event_type"), F.lit('"'))
        .alias("body"),
        F.create_map(F.lit("rk"), s(u % 3)).alias("res_attrs"),
        F.create_map(F.lit("ak"), s(e % 5)).alias("attrs"),
    )
    spans = ev.filter(e % 2 == 1).select(
        e.alias("i"),
        (F.lit(1700000000_000000000) + e).cast("bigint")
        .alias("start_ns"),
        (F.lit(1700000000_000000000) + e + e % 97 + 1).cast("bigint")
        .alias("end_ns"),
        F.concat(F.lit("t"), s(u)).alias("trace_id"),
        F.concat(F.lit("s"), s(e)).alias("span_id"),
        F.when(e % 3 == 0, F.lit("")).otherwise(
            F.concat(F.lit("p"), s(e))).alias("parent_span_id"),
        F.when(e % 5 == 0, F.lit("w3c=1")).otherwise(F.lit(""))
        .alias("trace_state"),
        F.concat(F.lit("op-"), F.col("event_type")).alias("name"),
        (e % 7).cast("int").alias("kind"),
        (e % 4).cast("int").alias("status_code"),
        F.when(e % 4 == 2, F.lit("bad")).otherwise(F.lit(""))
        .alias("status_message"),
        F.create_map(F.lit("rk"), s(u % 3)).alias("res_attrs"),
        F.create_map(F.lit("ak"), s(e % 5)).alias("attrs"),
    )
    lr = cassandra_log_rows(logs, id_cols=["i"]).select(
        "i", F.lit("log").alias("row_kind"), "timestamp_ns",
        "trace_id", "span_id",
        F.col("trace_flags").alias("n1"),
        F.col("severity_number").alias("n2"),
        F.col("body").alias("s1"),
        F.col("severity_text").alias("s2"),
        F.lit(None).cast("bigint").alias("duration_ns"),
        F.expr(_FLAT.format(m="resource_attributes")).alias("res_csv"),
        F.expr(_FLAT.format(m="log_attributes")).alias("attr_csv"),
    )
    tr = cassandra_trace_rows(spans, id_cols=["i"]).select(
        "i", F.lit("span").alias("row_kind"), "timestamp_ns",
        "trace_id", "span_id",
        F.lit(None).cast("int").alias("n1"),
        F.lit(None).cast("int").alias("n2"),
        F.concat(F.col("span_name"), F.lit("|"), F.col("span_kind"),
                 F.lit("|"), F.col("status_code"), F.lit("|"),
                 F.col("status_message"), F.lit("|"),
                 F.col("parent_span_id"), F.lit("|"),
                 F.col("trace_state")).alias("s1"),
        F.lit("").alias("s2"),
        F.col("duration_ns"),
        F.expr(_FLAT.format(m="resource_attributes")).alias("res_csv"),
        F.expr(_FLAT.format(m="span_attributes")).alias("attr_csv"),
    )
    return lr.unionByName(tr)


O_CASSANDRA = """
SELECT event_id AS i, 'log' AS row_kind,
  1700000000000000000 + event_id AS timestamp_ns,
  't' || CAST(user_id AS VARCHAR) AS trace_id,
  's' || CAST(event_id AS VARCHAR) AS span_id,
  CAST(event_id % 4 AS INT) AS n1,
  CAST(event_id % 25 AS INT) AS n2,
  '"b \\"' || event_type || '\\""' AS s1,
  'INFO' AS s2,
  CAST(NULL AS BIGINT) AS duration_ns,
  'rk=' || CAST(user_id % 3 AS VARCHAR) AS res_csv,
  'ak=' || CAST(event_id % 5 AS VARCHAR) AS attr_csv
FROM events WHERE event_id % 2 = 0
UNION ALL
SELECT event_id, 'span',
  1700000000000000000 + event_id,
  't' || CAST(user_id AS VARCHAR),
  's' || CAST(event_id AS VARCHAR),
  NULL, NULL,
  'op-' || event_type || '|'
    || CASE event_id % 7 WHEN 1 THEN 'SPAN_KIND_INTERNAL'
       WHEN 2 THEN 'SPAN_KIND_SERVER' WHEN 3 THEN 'SPAN_KIND_CLIENT'
       WHEN 4 THEN 'SPAN_KIND_PRODUCER'
       WHEN 5 THEN 'SPAN_KIND_CONSUMER'
       ELSE 'SPAN_KIND_UNSPECIFIED' END
    || '|' || CASE event_id % 4 WHEN 1 THEN 'STATUS_CODE_OK'
       WHEN 2 THEN 'STATUS_CODE_ERROR' ELSE 'STATUS_CODE_UNSET' END
    || '|' || CASE WHEN event_id % 4 = 2 THEN 'bad' ELSE '' END
    || '|' || CASE WHEN event_id % 3 = 0 THEN ''
       ELSE 'p' || CAST(event_id AS VARCHAR) END
    || '|' || CASE WHEN event_id % 5 = 0 THEN 'w3c=1' ELSE '' END,
  '',
  event_id % 97 + 1,
  'rk=' || CAST(user_id % 3 AS VARCHAR),
  'ak=' || CAST(event_id % 5 AS VARCHAR)
FROM events WHERE event_id % 2 = 1
"""

EXT32_QUERIES["cloudwatch_logs"] = q_cloudwatch_logs
EXT32_ORACLES["cloudwatch_logs"] = O_CW_LOGS
EXT32_QUERIES["cloudwatch_logs_raw"] = q_cloudwatch_logs_raw
EXT32_ORACLES["cloudwatch_logs_raw"] = O_CW_LOGS_RAW
EXT32_QUERIES["cassandra_rows"] = q_cassandra_rows
EXT32_ORACLES["cassandra_rows"] = O_CASSANDRA

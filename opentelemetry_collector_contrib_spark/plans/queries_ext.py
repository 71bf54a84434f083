"""Extended operator query registry: the remaining parser/connector/
processor surface from SURVEY.md §2 — regex/grok, csv, uri, syslog,
container parsers; servicegraph, groupbytrace, roundrobin,
spanmetrics, metricsgeneration connectors; redaction, schema, OTTL
statement processors.

The parse queries synthesize their wire format from events columns
with format_string and parse it back — the oracle recomputes directly
from the source columns, so a value match proves the parser inverts
the format exactly (the golden round-trip style of
``pkg/stanza/operator/operatortest``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..operators import transform as TR
from ..operators.parse import (
    container_parser,
    csv_parser,
    grok_parser,
    regex_parser,
    syslog_parser,
    time_parser,
    uri_parser,
)
from .base import QueryFn, load


# ---------------------------------------------------------------------------
# regex parser (stanza regex_parser; named capture groups)
# ---------------------------------------------------------------------------

_SYNTH_LINE = "sev=%s ip=10.0.0.%d msg=%s"


def q_regex_parser(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    body = F.format_string(
        _SYNTH_LINE, F.upper(F.col("event_type")), (F.col("user_id") % 256).cast("int"),
        F.col("event_type"),
    )
    df = ev.withColumn("body", body)
    out = regex_parser(
        df,
        r"^sev=(?<sev>[A-Z]+) ip=(?<ip>[0-9.]+) msg=(?<msg>\S+)$",
        parse_from="body",
        mark_ok="parse_ok",
    )
    return out.filter(F.col("parse_ok")).select("event_id", "sev", "ip", "msg")


O_REGEX = """
SELECT event_id,
       upper(event_type) AS sev,
       '10.0.0.' || CAST(user_id % 256 AS VARCHAR) AS ip,
       event_type AS msg
FROM events
"""


# ---------------------------------------------------------------------------
# grok parser (OTTL ExtractGrokPatterns; typed captures)
# ---------------------------------------------------------------------------

def q_grok_parser(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    line = F.format_string(
        "%s %s 10.1.2.%d took %dms",
        F.date_format(F.col("ts"), "yyyy-MM-dd'T'HH:mm:ss"),
        F.upper(F.col("event_type")),
        (F.col("user_id") % 200).cast("int"),
        (F.col("value") * 10).cast("long"),
    )
    df = ev.withColumn("body", line)
    out = grok_parser(
        df,
        "%{TIMESTAMP_ISO8601:log_ts} %{WORD:level} %{IPV4:client} took %{INT:latency:int}ms",
        parse_from="body",
    )
    return out.select("event_id", "log_ts", "level", "client", "latency")


O_GROK = """
SELECT event_id,
       strftime(ts, '%Y-%m-%dT%H:%M:%S') AS log_ts,
       upper(event_type) AS level,
       '10.1.2.' || CAST(user_id % 200 AS VARCHAR) AS client,
       CAST(trunc(value * 10) AS BIGINT) AS latency  -- Spark cast truncates; DuckDB cast rounds
FROM events
"""


# ---------------------------------------------------------------------------
# csv parser
# ---------------------------------------------------------------------------

def q_csv_parser(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    body = F.format_string(
        "%d,%s,%d", F.col("event_id"), F.col("event_type"), F.col("user_id")
    )
    df = ev.select(F.col("event_id").alias("orig_id"), body.alias("body"))
    out = csv_parser(df, header=["id", "etype", "uid"], parse_from="body")
    return out.select(
        F.col("id").cast("bigint").alias("event_id"),
        F.col("etype").alias("event_type"),
        F.col("uid").cast("bigint").alias("user_id"),
    )


O_CSV = "SELECT event_id, event_type, user_id FROM events"


# ---------------------------------------------------------------------------
# uri parser (parse_url JVM-native)
# ---------------------------------------------------------------------------

def q_uri_parser(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    url = F.format_string(
        "https://api.example.com:8443/v1/%s?uid=%d", F.col("event_type"), F.col("user_id")
    )
    out = uri_parser(ev.withColumn("body", url), parse_from="body")
    return out.select(
        "event_id", "uri_scheme", "uri_host", "uri_port", "uri_path", "uri_query"
    )


O_URI = """
SELECT event_id,
       'https' AS uri_scheme,
       'api.example.com' AS uri_host,
       8443 AS uri_port,
       '/v1/' || event_type AS uri_path,
       'uid=' || CAST(user_id AS VARCHAR) AS uri_query
FROM events
"""


# ---------------------------------------------------------------------------
# syslog parser (RFC3164)
# ---------------------------------------------------------------------------

def q_syslog_parser(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    pri = (F.col("user_id") % 192).cast("int")  # facility 0..23, sev 0..7
    body = F.format_string(
        "<%d>Jan %d 10:00:00 host%d app%d[%d]: event %s",
        pri,
        (F.col("event_id") % 28 + 1).cast("int"),
        (F.col("user_id") % 4).cast("int"),
        (F.col("user_id") % 7).cast("int"),
        (F.col("event_id") % 999).cast("int"),
        F.col("event_type"),
    )
    out = syslog_parser(ev.withColumn("body", body), protocol="rfc3164")
    return out.select(
        "event_id", "syslog_priority", "facility", "severity_number",
        "hostname", "appname", "proc_id", "message",
    )


O_SYSLOG = """
SELECT event_id,
       CAST(user_id % 192 AS INT) AS syslog_priority,
       CAST((user_id % 192) // 8 AS INT) AS facility,
       ([24,23,22,21,17,13,9,5])[CAST((user_id % 192) % 8 AS INT) + 1] AS severity_number,
       'host' || CAST(user_id % 4 AS VARCHAR) AS hostname,
       'app' || CAST(user_id % 7 AS VARCHAR) AS appname,
       CAST(event_id % 999 AS VARCHAR) AS proc_id,
       'event ' || event_type AS message
FROM events
"""


# ---------------------------------------------------------------------------
# container parser (docker-json + CRI when() chain)
# ---------------------------------------------------------------------------

def q_container_parser(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    iso = F.date_format(F.col("ts"), "yyyy-MM-dd'T'HH:mm:ss'Z'")
    docker = F.format_string(
        '{"log":"evt %s","stream":"stderr","time":"%s"}', F.col("event_type"), iso
    )
    cri = F.format_string("%s stdout F evt %s", iso, F.col("event_type"))
    body = F.when(F.col("event_type") == "error", docker).otherwise(cri)
    out = container_parser(ev.withColumn("body", body), parse_from="body", path_col=None)
    return out.select("event_id", "log", "stream", "partial_flag", "container_format")


O_CONTAINER = """
SELECT event_id,
       'evt ' || event_type AS log,
       CASE WHEN event_type = 'error' THEN 'stderr' ELSE 'stdout' END AS stream,
       'F' AS partial_flag,
       CASE WHEN event_type = 'error' THEN 'docker-json' ELSE 'cri' END
         AS container_format
FROM events
"""


# ---------------------------------------------------------------------------
# time parser (strptime layout translation)
# ---------------------------------------------------------------------------

def q_time_parser(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    s = F.date_format(F.col("ts"), "yyyy-MM-dd HH:mm:ss")
    df = ev.withColumn("ts_str", s)
    out = time_parser(df, "ts_str", "%Y-%m-%d %H:%M:%S", layout_type="strptime", parse_to="parsed_ts")
    return out.select("event_id", "parsed_ts")


O_TIME = "SELECT event_id, date_trunc('second', ts) AS parsed_ts FROM events"


# ---------------------------------------------------------------------------
# servicegraph connector: parent-child span join -> edges
# ---------------------------------------------------------------------------

def q_servicegraph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """servicegraphconnector/connector.go:220-283: join client span x
    server span into an edge, count + latency stats per edge. Here a
    user's event stream is the trace; each event's parent is the
    previous event (lag), and the edge join is a genuine equi-self-join
    on the parent id."""
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    child = ev.withColumn("parent_id", F.lag("event_id").over(w)).filter(
        F.col("parent_id").isNotNull()
    )
    parent = ev.select(
        F.col("event_id").alias("parent_id"),
        F.col("event_type").alias("client"),
        F.col("ts").alias("parent_ts"),
    )
    edges = child.join(parent, on="parent_id")
    return (
        edges.groupBy(F.col("client"), F.col("event_type").alias("server"))
        .agg(
            F.count(F.lit(1)).alias("call_count"),
            F.round(
                F.avg(
                    F.col("ts").cast("timestamp").cast("double")
                    - F.col("parent_ts").cast("timestamp").cast("double")
                ),
                4,
            ).alias("avg_gap_sec"),
        )
        .orderBy("client", "server")
    )


O_SERVICEGRAPH = """
WITH child AS (
  SELECT user_id, event_id, event_type, ts,
         lag(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS parent_id
  FROM events
)
SELECT p.event_type AS client, c.event_type AS server,
       count(*) AS call_count,
       round(avg(epoch(c.ts) - epoch(p.ts)), 4) AS avg_gap_sec
FROM child c JOIN events p ON c.parent_id = p.event_id
GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# groupbytrace processor: buffer + release whole traces
# ---------------------------------------------------------------------------

def q_group_by_trace(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    pair = F.struct(F.col("ts").alias("o1"), F.col("event_id").alias("o2"), F.col("event_type").alias("v"))
    return (
        ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.md5(
                F.array_join(
                    F.transform(F.array_sort(F.collect_list(pair)), lambda s: s["v"]), "|"
                )
            ).alias("trace_sig"),
        )
        .orderBy("user_id")
    )


O_GROUPBYTRACE = """
SELECT user_id, count(*) AS n_events,
       md5(string_agg(event_type, '|' ORDER BY ts, event_id)) AS trace_sig
FROM events GROUP BY user_id ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# roundrobin connector: deterministic spreading (md5 bucket)
# ---------------------------------------------------------------------------

def q_roundrobin(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    c = F.substring(F.md5(F.col("event_id").cast("string")), 1, 1)
    pipeline = (
        F.when(c < "4", "p0").when(c < "8", "p1").when(c < "c", "p2").otherwise("p3")
    )
    return (
        ev.withColumn("pipeline", pipeline)
        .groupBy("pipeline")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("pipeline")
    )


O_ROUNDROBIN = """
SELECT pipeline, count(*) AS n FROM (
  SELECT CASE
    WHEN substring(md5(CAST(event_id AS VARCHAR)), 1, 1) < '4' THEN 'p0'
    WHEN substring(md5(CAST(event_id AS VARCHAR)), 1, 1) < '8' THEN 'p1'
    WHEN substring(md5(CAST(event_id AS VARCHAR)), 1, 1) < 'c' THEN 'p2'
    ELSE 'p3' END AS pipeline
  FROM events
) GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# spanmetrics connector: RED metrics per dimension set
# ---------------------------------------------------------------------------

def q_spanmetrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("calls"),
            F.round(F.avg("value"), 4).alias("avg_duration"),
            F.round(F.max("value"), 2).alias("max_duration"),
            F.count(F.when(F.col("value") > 50, F.lit(1))).alias("slow_calls"),
        )
        .orderBy("event_type")
    )


O_SPANMETRICS = """
SELECT event_type, count(*) AS calls,
       round(avg(value), 4) AS avg_duration,
       round(max(value), 2) AS max_duration,
       count(*) FILTER (WHERE value > 50) AS slow_calls
FROM events GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# metricsgeneration processor: metric = metric1 / metric2 (join on dims)
# ---------------------------------------------------------------------------

def q_metricsgeneration(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").groupBy("user_id").agg(
        F.sum("value").alias("click_sum")
    )
    views = ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.sum("value").alias("view_sum")
    )
    joined = clicks.join(views, on="user_id", how="inner")
    return joined.select(
        "user_id",
        F.round(F.col("click_sum") / F.col("view_sum"), 6).alias("click_view_ratio"),
    ).orderBy("user_id")


O_METRICSGEN = """
SELECT user_id,
       round(sum(value) FILTER (WHERE event_type = 'click')
             / sum(value) FILTER (WHERE event_type = 'view'), 6)
         AS click_view_ratio
FROM events
GROUP BY user_id
HAVING sum(value) FILTER (WHERE event_type = 'click') IS NOT NULL
   AND sum(value) FILTER (WHERE event_type = 'view') IS NOT NULL
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# redaction processor: value-pattern masking
# ---------------------------------------------------------------------------

def q_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.regexp_replace(F.col("props"), r"[0-9]", "*").alias("props_redacted"),
    )


O_REDACTION = """
SELECT event_id, regexp_replace(props, '[0-9]', '*', 'g') AS props_redacted
FROM events
"""


# ---------------------------------------------------------------------------
# schema processor: semconv version column renames
# ---------------------------------------------------------------------------

def q_schema_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.withColumnRenamed("event_type", "event_name").withColumnRenamed(
        "user_id", "enduser_id"
    ).select("event_id", "event_name", "enduser_id")


O_SCHEMA = "SELECT event_id, event_type AS event_name, user_id AS enduser_id FROM events"


# ---------------------------------------------------------------------------
# OTTL statement: conditional edit with editors (set where / truncate)
# ---------------------------------------------------------------------------

def q_ottl_statement(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    # statement 1: set(tier, "high") where value > 50 else default "low"
    df = ev.withColumn("tier", F.lit("low"))
    df = TR.apply_statement(df, "tier", F.lit("high"), where=F.col("value") > 50)
    # statement 2: truncate_all(attributes, 4) on the props map
    attrs = F.from_json(F.col("props"), "map<string,string>")
    truncated = TR.map_truncate_all(attrs, 4)
    return df.select(
        "event_id", "tier", F.element_at(truncated, F.lit("k")).alias("k_trunc")
    )


O_OTTL_STATEMENT = """
SELECT event_id,
       CASE WHEN value > 50 THEN 'high' ELSE 'low' END AS tier,
       substring(json_extract_string(props, '$.k'), 1, 4) AS k_trunc
FROM events
"""


EXT_QUERIES: dict[str, QueryFn] = {
    "regex_parser": q_regex_parser,
    "grok_parser": q_grok_parser,
    "csv_parser": q_csv_parser,
    "uri_parser": q_uri_parser,
    "syslog_parser": q_syslog_parser,
    "container_parser": q_container_parser,
    "time_parser": q_time_parser,
    "servicegraph": q_servicegraph,
    "group_by_trace": q_group_by_trace,
    "roundrobin": q_roundrobin,
    "spanmetrics": q_spanmetrics,
    "metricsgeneration": q_metricsgeneration,
    "redaction": q_redaction,
    "schema_rename": q_schema_rename,
    "ottl_statement": q_ottl_statement,
}

EXT_ORACLES: dict[str, str] = {
    "regex_parser": O_REGEX,
    "grok_parser": O_GROK,
    "csv_parser": O_CSV,
    "uri_parser": O_URI,
    "syslog_parser": O_SYSLOG,
    "container_parser": O_CONTAINER,
    "time_parser": O_TIME,
    "servicegraph": O_SERVICEGRAPH,
    "group_by_trace": O_GROUPBYTRACE,
    "roundrobin": O_ROUNDROBIN,
    "spanmetrics": O_SPANMETRICS,
    "metricsgeneration": O_METRICSGEN,
    "redaction": O_REDACTION,
    "schema_rename": O_SCHEMA,
    "ottl_statement": O_OTTL_STATEMENT,
}

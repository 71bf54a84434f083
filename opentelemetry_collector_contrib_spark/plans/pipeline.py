"""Flagship pipeline: parse -> enrich -> route -> aggregate -> sinks
over the transcript table.

This is the Spark re-expression of the reference's EP1 lifecycle
(filelog receiver -> stanza operators -> processors -> routingconnector
-> countconnector -> exporters; SURVEY.md §3): the whole
parse+enrich+route section is ONE narrow codegen'd stage — the only
shuffles are (a) the salted repartition before partitioned sink writes
and (b) the aggregate jobs. Dims broadcast.

Stage map (reference -> here):
  filelog+regex/json parse  -> parse_turns()        (grok/regex/from_json columns)
  severity_parser           -> parse_turns()        (severity map lookup)
  k8sattributes/resource    -> enrich_turns()       (broadcast insert-if-absent joins)
  routingconnector          -> route_turns()        (ordered when() chain)
  countconnector            -> sink_counts()/warn_counts()
  fileexporter group_by     -> write_sinks()        (partitionBy(route, ts_day))
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..model import INFO, WARN, severity_number
from ..operators.aggregate import count_connector
from ..operators.enrich import broadcast_enrich
from ..operators.route import Route, apply_routes
from ..runtime.lineage import LineageLog
from ..runtime.sinks import sink_path, write_sink
from ..sources.dims import role_dim, tool_dim

# grok-style pattern for the synthetic log lines:
# 2026-08-16T12:00:00Z INFO 10.1.2.3 GET /api/v1/x 200 123ms
LOGLINE_PATTERN = (
    r"^(\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}Z)\s+"
    r"(TRACE|DEBUG|INFO|WARN|ERROR|FATAL)\s+"
    r"((?:\d{1,3}\.){3}\d{1,3})\s+"
    r"(GET|POST|PUT|DELETE|PATCH|HEAD)\s+"
    r"(\S+)\s+(\d{3})\s+(\d+)ms$"
)

TOOL_PAYLOAD_SCHEMA = "tool string, args struct<q string, n int>, status string"

ROUTE_NAMES = ["alerts", "tools", "user", "catchall"]


def parse_turns(df: DataFrame) -> DataFrame:
    """Parse stage: log-line regex extract + JSON tool payloads +
    severity resolution. Pure column exprs — one codegen'd projection."""
    text = F.col("text")
    is_log = text.rlike(LOGLINE_PATTERN)

    def ext(i: int) -> Column:
        return F.when(is_log, F.regexp_extract(text, LOGLINE_PATTERN, i))

    payload = F.when(F.col("role") == "tool", F.from_json(text, TOOL_PAYLOAD_SCHEMA))

    sev_text = F.coalesce(
        ext(2),
        F.when(payload["status"] == "error", "ERROR"),
        F.lit("INFO"),
    )

    return (
        df.withColumn("log_ts", F.to_timestamp(ext(1), "yyyy-MM-dd'T'HH:mm:ss'Z'"))
        .withColumn("log_severity", ext(2))
        .withColumn("client_ip", ext(3))
        .withColumn("http_method", ext(4))
        .withColumn("http_path", ext(5))
        .withColumn("http_status", ext(6).cast("int"))
        .withColumn("latency_ms", ext(7).cast("long"))
        .withColumn("tool_status", payload["status"])
        .withColumn("tool_query", payload["args"]["q"])
        .withColumn("severity_text", sev_text)
        .withColumn("severity_number", severity_number(sev_text, default=INFO).cast("int"))
        .withColumn("is_logline", is_log)
    )


def enrich_turns(df: DataFrame, spark: SparkSession) -> DataFrame:
    """Broadcast insert-if-absent joins against role/tool dims
    (k8sattributes semantics; unknown tools keep NULL family —
    the left-join null path)."""
    out = broadcast_enrich(df, role_dim(spark), on="role")
    out = broadcast_enrich(out, tool_dim(spark), on="tool")
    return out


DEFAULT_ROUTES = [
    ("alerts", lambda: F.col("severity_number") >= WARN),
    ("tools", lambda: F.col("tool").isNotNull()),
    ("user", lambda: F.col("role") == "user"),
]


def route_turns(df: DataFrame) -> DataFrame:
    routes = [Route(name, cond()) for name, cond in DEFAULT_ROUTES]
    return apply_routes(df, routes, default="catchall")


def aggregate_counts(routed: DataFrame) -> dict[str, DataFrame]:
    """countconnector metrics: per-sink counts + conditional WARN
    counts grouped by (role, tool_family) (FIXTURES.md F6 — rows with a
    NULL grouped attr are not counted)."""
    return {
        "turns_per_sink": count_connector(routed, ["route"], metric_name="turn_count"),
        "warn_turns": count_connector(
            routed,
            ["role", "tool_family"],
            condition=F.col("severity_number") >= WARN,
            metric_name="warn_count",
        ),
    }


@dataclass
class PipelineOutput:
    routed: DataFrame
    aggregates: dict[str, DataFrame] = field(default_factory=dict)


def run_pipeline(spark: SparkSession, transcripts: DataFrame) -> PipelineOutput:
    parsed = parse_turns(transcripts)
    enriched = enrich_turns(parsed, spark)
    routed = route_turns(enriched).withColumn("ts_day", F.to_date("ts"))
    return PipelineOutput(routed=routed, aggregates=aggregate_counts(routed))


def write_pipeline(
    out: PipelineOutput,
    root: str,
    salt_buckets: int = 16,
    lineage: LineageLog | None = None,
    write_metrics: bool = True,
) -> dict[str, int]:
    """Fan out to per-sink tables: ONE partitioned write job
    (partitionBy(route, ts_day)).

    Shuffle layout: repartition by (route, ts_day, salt) — co-locates
    each output partition's rows into few tasks (no small-files
    explosion: tasks x dirs file count collapses to ~1 file per
    output partition per salt bucket) while the salt spreads hot
    conversations/days over ``salt_buckets`` tasks. This is the write
    strategy that survives 10^12 turns; AQE coalesces the tail.

    Count metrics are computed from the *written* sink (read-back), so
    the expensive lineage isn't recomputed per aggregate job and the
    counts double as a sink-integrity check (testbed sent==received).
    Returns per-sink row counts.
    """
    spark = out.routed.sparkSession
    salt = F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(salt_buckets))
    balanced = out.routed.repartition(F.col("route"), F.col("ts_day"), salt)
    write_sink(balanced, sink_path(root, "routed"), partition_by=["route", "ts_day"])

    back = spark.read.parquet(sink_path(root, "routed"))
    aggs = aggregate_counts(back)
    counts = {r["route"]: r["turn_count"] for r in aggs["turns_per_sink"].collect()}
    if write_metrics:
        for name, agg in aggs.items():
            write_sink(agg, sink_path(root, f"metric_{name}"))
    if lineage is not None:
        for sink, n in sorted(counts.items()):
            lineage.record("write_sinks", sink, n)
    return counts

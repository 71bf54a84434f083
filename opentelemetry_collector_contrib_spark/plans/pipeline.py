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
# Separators are single literal spaces so the rlike gate and the
# split(text, ' ', 7) field extractor below agree exactly: a line with
# tabs/doubled spaces is rejected by the gate instead of silently
# yielding shifted fields.
LOGLINE_PATTERN = (
    r"^(\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}Z) "
    r"(TRACE|DEBUG|INFO|WARN|ERROR|FATAL) "
    r"((?:\d{1,3}\.){3}\d{1,3}) "
    r"(GET|POST|PUT|DELETE|PATCH|HEAD) "
    r"(\S+) (\d{3}) (\d+)ms$"
)

TOOL_PAYLOAD_SCHEMA = "tool string, args struct<q string, n int>, status string"

ROUTE_NAMES = ["alerts", "tools", "user", "catchall"]


def parse_turns(df: DataFrame) -> DataFrame:
    """Parse stage: log-line extract + JSON tool payloads + severity
    resolution. Pure column exprs — one codegen'd projection.

    Perf note (measured at sf0.1): validating with ONE rlike pass and
    extracting fields from ONE split() is ~3x cheaper per row than a
    regexp_extract per capture group (each Spark regexp_* expression
    re-runs the Java regex engine over the string). The regex is still
    the validity gate — field extraction only runs on matching rows.
    """
    text = F.col("text")
    is_log = text.rlike(LOGLINE_PATTERN)
    parts = F.split(text, " ", 7)

    def ext(i: int) -> Column:
        # 1-based field index into the space-split logline
        return F.when(is_log, F.element_at(parts, i))

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
        .withColumn(
            "latency_ms",
            F.when(is_log, F.replace(F.element_at(parts, 7), F.lit("ms"), F.lit(""))).cast("long"),
        )
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
    resume: bool = False,
) -> dict[str, int]:
    """Fan out to per-sink tables: ONE partitioned write job
    (partitionBy(route, ts_day)).

    Shuffle layout: repartition by (route, ts_day, salt) — co-locates
    each output partition's rows into few tasks (no small-files
    explosion: tasks x dirs file count collapses to ~1 file per
    output partition per salt bucket) while the salt spreads hot
    conversations/days over ``salt_buckets`` tasks. This is the write
    strategy that survives 10^12 turns; AQE coalesces the tail.

    Per-sink counts are collected with ``DataFrame.observe`` DURING the
    write job (countconnector's counter map ≙ accumulator-style
    observed aggregates) — zero extra jobs and still an exact
    sent==received check. The richer metric tables are computed from
    the written sink (cheap columnar read-back, no lineage recompute).
    Returns per-sink row counts.
    """
    from pyspark.sql import Observation

    spark = out.routed.sparkSession
    routed = out.routed
    if resume and lineage is not None:
        # checkpoint.Save analog: skip ts-day partitions a previous run
        # already committed (their sink dirs are intact — dynamic
        # overwrite only touches days this run writes)
        routed = routed.withColumn("__day", F.col("ts_day").cast("string"))
        routed = lineage.filter_pending(routed, "sink_day", "__day").drop("__day")
    salt = F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(salt_buckets))
    balanced = routed.repartition(F.col("route"), F.col("ts_day"), salt)
    obs = Observation("sink_counts")
    observed = balanced.observe(
        obs,
        *[
            F.count(F.when(F.col("route") == r, F.lit(1))).alias(r)
            for r in ROUTE_NAMES
        ],
    )
    write_sink(observed, sink_path(root, "routed"), partition_by=["route", "ts_day"])
    counts = {r: n for r, n in obs.get.items() if n > 0}

    if write_metrics:
        back = spark.read.parquet(sink_path(root, "routed"))
        for name, agg in aggregate_counts(back).items():
            write_sink(agg, sink_path(root, f"metric_{name}"))
    if lineage is not None:
        for sink, n in sorted(counts.items()):
            lineage.record("write_sinks", sink, n)
        if sum(counts.values()) > 0:
            # per-day completion records (the resume unit). Read back
            # from the written sink: columnar scan of one column, no
            # lineage recompute.
            back = spark.read.parquet(sink_path(root, "routed"))
            lineage.record_counts("sink_day", back, "ts_day")
    return counts

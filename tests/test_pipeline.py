"""End-to-end flagship pipeline: routed-row conservation, first-match
routing, enrich null path, per-sink counts, lineage resume.

Models the reference testbed invariant (items sent == items received,
testbed/tests/scenarios.go:189-190) and routingconnector first-match
MOVE semantics (connector/routingconnector/logs.go:62-107).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.model import WARN
from opentelemetry_collector_contrib_spark.plans.pipeline import (
    ROUTE_NAMES,
    run_pipeline,
    write_pipeline,
)
from opentelemetry_collector_contrib_spark.runtime.lineage import LineageLog
from opentelemetry_collector_contrib_spark.sources.transcripts import generate_transcripts


@pytest.fixture(scope="module")
def routed(spark):
    transcripts = generate_transcripts(spark, n_convs=100, partitions=4)
    out = run_pipeline(spark, transcripts)
    out.routed.cache()
    yield out
    out.routed.unpersist()


def test_every_row_routed_exactly_once(spark, routed):
    n_in = generate_transcripts(spark, n_convs=100, partitions=4).count()
    per_sink = {r["route"]: r["turn_count"] for r in routed.aggregates["turns_per_sink"].collect()}
    assert set(per_sink) <= set(ROUTE_NAMES)
    assert sum(per_sink.values()) == n_in  # sent == received
    assert routed.routed.count() == n_in


def test_first_match_wins(routed):
    # a row matching both alerts and tools must be in alerts only
    both = routed.routed.filter(
        (F.col("severity_number") >= WARN) & F.col("tool").isNotNull()
    )
    assert both.count() > 0
    assert both.filter(F.col("route") != "alerts").count() == 0
    # tools route rows must NOT satisfy the alerts condition
    tools = routed.routed.filter(F.col("route") == "tools")
    assert tools.filter(F.col("severity_number") >= WARN).count() == 0


def test_enrich_insert_if_absent_null_path(routed):
    df = routed.routed
    # known tools got a family; unknown tools (shadow_tool/legacy_api) stay NULL
    assert df.filter((F.col("tool") == "search") & (F.col("tool_family") != "retrieval")).count() == 0
    unknown = df.filter(F.col("tool").isin("shadow_tool", "legacy_api"))
    assert unknown.count() > 0
    assert unknown.filter(F.col("tool_family").isNotNull()).count() == 0
    # every role is enriched
    assert df.filter(F.col("role_kind").isNull()).count() == 0


def test_severity_parse(routed):
    df = routed.routed
    logged = df.filter(F.col("is_logline"))
    assert logged.count() > 0
    # parsed log severities map onto the enum bands
    assert logged.filter(
        (F.col("log_severity") == "ERROR") & (F.col("severity_number") != 17)
    ).count() == 0
    # tool error payloads become ERROR severity
    tool_err = df.filter(F.col("tool_status") == "error")
    assert tool_err.count() > 0
    assert tool_err.filter(F.col("severity_number") != 17).count() == 0


def test_per_turn_text_equality_under_stable_ordering(spark, routed, tmp_path):
    """North-star per-row invariant: after the full parse→enrich→route
    →salted partitioned write, re-establishing order with a window over
    (conv_id, turn_idx) reproduces the reference stream exactly —
    every turn's text is byte-identical and the per-conversation
    ordering is dense and gapless."""
    from pyspark.sql import Window as W

    root = str(tmp_path / "ordered")
    write_pipeline(routed, root, salt_buckets=4, write_metrics=False)
    back = spark.read.parquet(f"{root}/sink=routed")

    reference = generate_transcripts(spark, n_convs=100, partitions=4).select(
        "conv_id", "turn_idx", F.col("text").alias("ref_text")
    )
    joined = back.join(reference, on=["conv_id", "turn_idx"], how="full")
    # every (conv_id, turn_idx) exists on both sides with identical text
    assert joined.filter(F.col("text").isNull() | F.col("ref_text").isNull()).count() == 0
    assert joined.filter(F.col("text") != F.col("ref_text")).count() == 0

    # stable ordering: row_number over (conv_id, turn_idx) == turn_idx+1
    w = W.partitionBy("conv_id").orderBy("turn_idx")
    mis = (
        back.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") != F.col("turn_idx") + 1)
        .count()
    )
    assert mis == 0


def test_write_and_lineage_resume(spark, routed, tmp_path):
    root = str(tmp_path / "out")
    lineage = LineageLog(root, run_id="t1")
    counts = write_pipeline(routed, root, salt_buckets=4, lineage=lineage)
    assert sum(counts.values()) == routed.routed.count()
    # files written per route partition
    back = spark.read.parquet(f"{root}/sink=routed")
    assert back.count() == routed.routed.count()
    assert set(r["route"] for r in back.select("route").distinct().collect()) == set(counts)
    # lineage knows completed sinks; resume filter drops them
    assert lineage.completed("write_sinks") == set(counts)
    pending = lineage.filter_pending(routed.routed, "write_sinks", "route")
    assert pending.count() == 0

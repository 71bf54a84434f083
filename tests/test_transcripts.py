"""Generator invariants: determinism, schema, skew, text mix."""

from __future__ import annotations

from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.model import TRANSCRIPT_SCHEMA
from opentelemetry_collector_contrib_spark.sources.transcripts import generate_transcripts


def test_schema_matches_input_hint(spark):
    df = generate_transcripts(spark, n_convs=10, partitions=2)
    assert [(f.name, f.dataType.simpleString()) for f in df.schema.fields] == [
        (f.name, f.dataType.simpleString()) for f in TRANSCRIPT_SCHEMA.fields
    ]


def test_deterministic_across_parallelism(spark):
    a = generate_transcripts(spark, n_convs=50, partitions=2)
    b = generate_transcripts(spark, n_convs=50, partitions=7)
    # same rows regardless of partitioning (order-insensitive)
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_turn_idx_dense_per_conv(spark):
    df = generate_transcripts(spark, n_convs=30, partitions=2)
    per_conv = df.groupBy("conv_id").agg(
        F.count("*").alias("n"),
        F.min("turn_idx").alias("mn"),
        F.max("turn_idx").alias("mx"),
        F.countDistinct("turn_idx").alias("d"),
    )
    bad = per_conv.filter(
        (F.col("mn") != 0) | (F.col("mx") != F.col("n") - 1) | (F.col("d") != F.col("n"))
    )
    assert bad.count() == 0


def test_hot_conversation_skew(spark):
    df = generate_transcripts(spark, n_convs=3000, turns_per_conv=10, hot_frac=0.001, hot_mult=100, partitions=8)
    sizes = df.groupBy("conv_id").count()
    mx = sizes.agg(F.max("count")).collect()[0][0]
    med = sizes.approxQuantile("count", [0.5], 0.01)[0]
    assert mx > med * 20  # hot convs dominate


def test_text_mix_and_roles(spark):
    df = generate_transcripts(spark, n_convs=200, partitions=4).cache()
    roles = {r[0] for r in df.select("role").distinct().collect()}
    assert roles == {"user", "assistant", "tool", "system"}
    # tool turns carry JSON payloads; non-tool never have tool set
    assert df.filter((F.col("role") == "tool") & ~F.col("text").startswith("{")).count() == 0
    assert df.filter((F.col("role") != "tool") & F.col("tool").isNotNull()).count() == 0
    # some continuation lines exist (recombine input)
    assert df.filter(F.col("text").startswith("    ")).count() > 0
    # some log lines exist
    assert df.filter(F.col("text").rlike(r"^\d{4}-\d{2}-\d{2}T")).count() > 0
    df.unpersist()


def test_with_file_metadata(spark):
    from opentelemetry_collector_contrib_spark.plans.base import (
        load,
        with_file_metadata,
    )

    df = with_file_metadata(load(spark, "/root/testdata/sf0.001", "events"))
    r = df.select("log_file_name", "log_file_path").first()
    assert r["log_file_name"] == "events.parquet"
    assert r["log_file_path"].endswith("/events.parquet")

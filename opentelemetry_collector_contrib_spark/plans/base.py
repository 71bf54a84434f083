"""Shared query-registry types/helpers (import-order-safe base)."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def with_file_metadata(df, name_col: str = "log_file_name", path_col: str = "log_file_path"):
    """filelog's include_file_name / include_file_path attributes
    (pkg/stanza/fileconsumer attrs.LogFileName/LogFilePath): stamp the
    source file onto every record from the scan's hidden _metadata
    struct — no extra I/O, resolved at scan time."""
    from pyspark.sql import functions as F

    return df.withColumn(
        path_col, F.col("_metadata.file_path")
    ).withColumn(
        name_col, F.col("_metadata.file_name")
    )

"""Round-5 queries (cont. 20): the S3 exporter's marshaler + object
key surface (``exporter/awss3exporter``): SumoIC JSON lines with the
Go time.Time.String() date rendering and required _source* attrs,
body lines, and strftime-bucketed object keys."""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import QueryFn, load

EXT36_QUERIES: dict[str, QueryFn] = {}
EXT36_ORACLES: dict[str, str] = {}


def q_s3_sumoic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.s3_export import s3_sumoic_lines

    ev = load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    s = lambda c: c.cast("string")  # noqa: E731
    fx = ev.select(
        e.alias("i"),
        (F.lit(1700000000_000000000) + e * 1000 + e % 3)
        .cast("bigint").alias("observed_ns"),
        F.map_from_entries(F.filter(F.array(
            F.when(u % 7 != 0,
                   F.struct(F.lit("_sourceCategory").alias("key"),
                            F.concat(F.lit("cat"), s(u % 3))
                            .alias("value"))),
            F.struct(F.lit("_sourceHost").alias("key"),
                     F.concat(F.lit("host"), s(u % 2)).alias("value")),
            F.struct(F.lit("_sourceName").alias("key"),
                     F.lit("src").alias("value")),
            F.struct(F.lit("cluster").alias("key"),
                     F.concat(F.lit("c"), s(u % 4)).alias("value")),
        ), lambda x: x.isNotNull())).alias("res_attrs"),
        F.create_map(F.lit("level"), s(e % 5)).alias("attrs"),
        F.concat(F.lit("msg "), F.col("event_type")).alias("body"),
    )
    return s3_sumoic_lines(fx, id_cols=["i"])


O_S3_SUMOIC = """
WITH b AS (
  SELECT event_id AS i, user_id AS u, event_id AS e, event_type,
         1700000000000000000 + event_id * 1000 + event_id % 3 AS ns
  FROM events
)
SELECT i, u % 7 = 0 AS err,
  CASE WHEN u % 7 <> 0 THEN
    '{"date": "' ||
    strftime((TIMESTAMP '1970-01-01 00:00:00'
              + to_microseconds(ns // 1000)), '%Y-%m-%d %H:%M:%S')
    || CASE WHEN ns % 1000000000 > 0 THEN
         '.' || rtrim(lpad(CAST(ns % 1000000000 AS VARCHAR), 9, '0'),
                      '0')
       ELSE '' END
    || ' +0000 UTC","sourceName":"src","sourceHost":"host'
    || CAST(u % 2 AS VARCHAR) || '","sourceCategory":"cat'
    || CAST(u % 3 AS VARCHAR) || '","fields":{"cluster":"c'
    || CAST(u % 4 AS VARCHAR) || '"},"message":{"level":"'
    || CAST(e % 5 AS VARCHAR) || '","log":"msg ' || event_type
    || '"}}'
  END AS line
FROM b
"""


def q_s3_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.s3_export import s3_partition_keys

    ev = load(spark, sf_dir, "events")
    e = F.col("event_id")
    fx = ev.select(
        e.alias("i"),
        (F.lit(1700000000_000000000) + e * 60_000_000_000)
        .cast("bigint").alias("ts_ns"),
        F.when(e % 9 == 0, F.lit("override")).otherwise(F.lit(""))
        .alias("prefix_override"),
    )
    return s3_partition_keys(
        fx, id_cols=["i"], partition_prefix="base",
        file_prefix="fp_", metadata="logs", file_format="json",
        compression="gzip", unique_key="42424242")


O_S3_KEYS = """
SELECT event_id AS i,
  (CASE WHEN event_id % 9 = 0 THEN 'override' ELSE 'base' END)
  || '/' ||
  strftime((TIMESTAMP '1970-01-01 00:00:00' + to_microseconds(
    (1700000000000000000 + event_id * 60000000000) // 1000)),
    'year=%Y/month=%m/day=%d/hour=%H/minute=%M')
  || '/fp_logs_42424242.json.gz' AS object_key
FROM events
"""

EXT36_QUERIES["s3_sumoic"] = q_s3_sumoic
EXT36_ORACLES["s3_sumoic"] = O_S3_SUMOIC
EXT36_QUERIES["s3_keys"] = q_s3_keys
EXT36_ORACLES["s3_keys"] = O_S3_KEYS

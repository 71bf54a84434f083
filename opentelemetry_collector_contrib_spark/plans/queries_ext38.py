"""Round-5 queries (cont. 22): coralogix resource-metadata injection
+ LogicMonitor log inputs (``exporter/coralogixexporter``,
``exporter/logicmonitorexporter``)."""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import QueryFn, load

EXT38_QUERIES: dict[str, QueryFn] = {}
EXT38_ORACLES: dict[str, str] = {}

_FLAT = ("array_join(array_sort(transform(map_entries({m}), "
         "kv -> concat(kv.key, '=', kv.value))), ',')")


def q_coralogix_metadata(spark: SparkSession,
                         sf_dir: str) -> DataFrame:
    from ..operators.vendor_exports import coralogix_resource_metadata

    ev = load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    s = lambda c: c.cast("string")  # noqa: E731
    res = F.map_from_entries(F.filter(F.array(
        F.when(u % 3 == 0,
               F.struct(F.lit("service.namespace").alias("key"),
                        F.concat(F.lit("ns"), s(u % 2))
                        .alias("value"))),
        F.when(u % 5 == 0,
               F.struct(F.lit("k8s.namespace.name").alias("key"),
                        F.concat(F.lit("kns"), s(u % 2))
                        .alias("value"))),
        F.when(u % 4 != 0,
               F.struct(F.lit("service.name").alias("key"),
                        F.concat(F.lit("svc"), s(u % 3))
                        .alias("value"))),
        F.when(u % 7 == 0,
               F.struct(F.lit("cx.application.name").alias("key"),
                        F.lit("preexisting").alias("value"))),
        F.struct(F.lit("other").alias("key"), s(e % 3)
                 .alias("value")),
    ), lambda x: x.isNotNull()))
    fx = ev.select(e.alias("i"), res.alias("res_attrs"))
    out = coralogix_resource_metadata(fx, id_cols=["i"],
                                      app_name="defaultapp")
    return out.select(
        "i", F.expr(_FLAT.format(m="res_attrs")).alias("res_csv"))


O_CX_META = """
WITH b AS (
  SELECT event_id AS i, user_id AS u, event_id AS e FROM events
)
SELECT i,
  array_to_string(list_sort(list_filter([
    CASE WHEN u % 3 = 0
      THEN 'service.namespace=ns' || CAST(u % 2 AS VARCHAR) END,
    CASE WHEN u % 5 = 0
      THEN 'k8s.namespace.name=kns' || CAST(u % 2 AS VARCHAR) END,
    CASE WHEN u % 4 <> 0
      THEN 'service.name=svc' || CAST(u % 3 AS VARCHAR) END,
    'other=' || CAST(e % 3 AS VARCHAR),
    'cx.application.name=' ||
      CASE WHEN u % 3 = 0 THEN 'ns' || CAST(u % 2 AS VARCHAR)
           WHEN u % 5 = 0 THEN 'kns' || CAST(u % 2 AS VARCHAR)
           ELSE 'defaultapp' END,
    'cx.subsystem.name=' ||
      CASE WHEN u % 4 <> 0 THEN 'svc' || CAST(u % 3 AS VARCHAR)
           ELSE '' END
  ], x -> x IS NOT NULL)), ',') AS res_csv
FROM b
"""


def q_logicmonitor_logs(spark: SparkSession,
                        sf_dir: str) -> DataFrame:
    from ..operators.vendor_exports import logicmonitor_log_inputs

    ev = load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    s = lambda c: c.cast("string")  # noqa: E731
    fx = ev.select(
        e.alias("i"),
        F.when(e % 5 == 0, F.lit(0)).otherwise(
            F.lit(1700000000_000000000) + e).cast("bigint")
        .alias("ts_ns"),
        F.when(e % 25 == 0, F.lit(0)).otherwise(
            F.lit(1700000009_000000000) + e).cast("bigint")
        .alias("observed_ns"),
        F.concat(F.lit("msg "), F.col("event_type")).alias("body"),
        F.create_map(F.lit("level"), s(e % 4)).alias("attrs"),
        F.map_from_entries(F.filter(F.array(
            F.when(u % 2 == 0,
                   F.struct(F.lit("hostname").alias("key"),
                            F.concat(F.lit("h"), s(u % 3))
                            .alias("value"))),
            F.struct(F.lit("rk").alias("key"), s(u % 5)
                     .alias("value")),
        ), lambda x: x.isNotNull())).alias("res_attrs"),
    )
    out = logicmonitor_log_inputs(fx, id_cols=["i"],
                                  now_ns=1800000000_000000000)
    return out.select(
        "i", "message", "timestamp_ns",
        F.expr(_FLAT.format(m="metadata")).alias("meta_csv"),
        F.expr(_FLAT.format(m="resource_mapper")).alias("res_csv"),
    )


O_LM_LOGS = """
SELECT event_id AS i,
  'msg ' || event_type AS message,
  CASE WHEN event_id % 25 = 0 AND event_id % 5 = 0
         THEN 1800000000000000000
       WHEN event_id % 5 = 0 THEN 1700000009000000000 + event_id
       ELSE 1700000000000000000 + event_id END AS timestamp_ns,
  'level=' || CAST(event_id % 4 AS VARCHAR) AS meta_csv,
  array_to_string(list_sort(list_filter([
    CASE WHEN user_id % 2 = 0
      THEN 'hostname=h' || CAST(user_id % 3 AS VARCHAR) END,
    'rk=' || CAST(user_id % 5 AS VARCHAR),
    CASE WHEN user_id % 2 = 0
      THEN 'system.hostname=h' || CAST(user_id % 3 AS VARCHAR) END
  ], x -> x IS NOT NULL)), ',') AS res_csv
FROM events
"""

EXT38_QUERIES["coralogix_metadata"] = q_coralogix_metadata
EXT38_ORACLES["coralogix_metadata"] = O_CX_META
EXT38_QUERIES["logicmonitor_logs"] = q_logicmonitor_logs
EXT38_ORACLES["logicmonitor_logs"] = O_LM_LOGS

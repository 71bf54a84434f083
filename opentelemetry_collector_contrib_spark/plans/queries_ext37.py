"""Round-5 queries (cont. 21): the prometheusexporter accumulator
twin (``exporter/prometheusexporter/accumulator.go``).

The fixture builds one time series per ``event_id %% 200`` with
``event_id // 200`` points each: delta-sum chains whose starts link
to the previous timestamp (with periodic misaligned restarts),
cumulative sums, delta histograms with constant bounds, gauges and
summaries, stale-marker deletions mid-series, and unspecified/`
non-monotonic-delta drop rules.  The oracle rebuilds the last-chain
fold with SQL windows.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import QueryFn, load

EXT37_QUERIES: dict[str, QueryFn] = {}
EXT37_ORACLES: dict[str, str] = {}


def q_prom_accumulate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.prom_accumulator import prometheus_accumulate

    ev = load(spark, sf_dir, "events")
    e = F.col("event_id")
    s = lambda c: c.cast("string")  # noqa: E731
    sid = e % 200
    seq = F.floor(e / 200)
    ts = (F.lit(1700000000_000000000) + sid * 1_000_000_000
          + seq * 1_000_000).cast("bigint")
    prev_ts = (F.lit(1700000000_000000000) + sid * 1_000_000_000
               + (seq - 1) * 1_000_000).cast("bigint")
    misalign = (seq % 7 == 3)
    start = (F.when(seq == 0, ts - 500_000)
             .when(misalign, ts - 500_000)
             .otherwise(prev_ts)).cast("bigint")
    signal = (F.when(sid % 4 == 0, "gauge").when(sid % 4 == 1, "sum")
              .when(sid % 4 == 2, "histogram").otherwise("summary"))
    tempo = (F.when(sid % 4 == 0, 0).when(sid % 4 == 3, 0)
             .when(sid % 8 < 4, 1).otherwise(2)).cast("int")
    res = F.map_from_entries(F.filter(F.array(
        F.when(sid % 9 != 0,
               F.struct(F.lit("service.name").alias("key"),
                        F.concat(F.lit("svc"), s(sid % 3))
                        .alias("value"))),
        F.when(sid % 4 == 0,
               F.struct(F.lit("service.namespace").alias("key"),
                        F.lit("ns").alias("value"))),
        F.when(sid % 3 == 0,
               F.struct(F.lit("service.instance.id").alias("key"),
                        F.concat(F.lit("i"), s(sid % 2))
                        .alias("value"))),
    ), lambda x: x.isNotNull()))
    fx = ev.select(
        e.alias("i"),
        signal.alias("signal"),
        F.concat(F.lit("m"), s(sid)).alias("metric_name"),
        F.concat(F.lit("lib"), s(sid % 2)).alias("scope_name"),
        F.create_map(F.lit("dim"), s(sid % 5)).alias("attrs"),
        res.alias("res_attrs"),
        ts.alias("ts_ns"), start.alias("start_ns"),
        ((seq == 2) & (sid % 10 == 0)).alias("stale"),
        tempo.alias("temporality"),
        (sid % 6 != 1).alias("is_monotonic"),
        ((e % 100) * 0.5).alias("value"),
        (e % 50).cast("bigint").alias("count"),
        ((e % 9) * 1.5).alias("sum"),
        F.array((e % 5).cast("bigint"), (e % 7).cast("bigint"),
                (e % 11).cast("bigint")).alias("bucket_counts"),
        F.array(F.lit(1.0), F.lit(2.0)).alias("explicit_bounds"),
    )
    out = prometheus_accumulate(fx, id_cols=["i"])
    return out.select(
        "signal", "metric_name", "scope_name", "job", "instance",
        F.expr("array_join(array_sort(transform(map_entries(attrs), "
               "kv -> concat(kv.key, '=', kv.value))), ',')")
        .alias("attr_csv"),
        "ts_ns", "start_ns",
        F.round(F.col("value"), 6).alias("value"),
        "count", F.round(F.col("sum"), 6).alias("sum"),
        F.coalesce(F.array_join(F.transform(
            F.col("bucket_counts"), lambda v: v.cast("string")), ";"),
            F.lit("")).alias("bk_csv"),
        F.coalesce(F.array_join(F.transform(
            F.col("explicit_bounds"), lambda v: v.cast("string")),
            ";"), F.lit("")).alias("bd_csv"),
        "temporality", "is_monotonic",
    )


O_PROM_ACC = """
WITH b AS (
  SELECT event_id AS i, event_id % 200 AS sid,
         event_id // 200 AS seq, event_id AS e
  FROM events
), c AS (
  SELECT *,
    1700000000000000000 + sid * 1000000000 + seq * 1000000 AS ts,
    CASE WHEN seq = 0 OR seq % 7 = 3
      THEN 1700000000000000000 + sid * 1000000000 + seq * 1000000
           - 500000
      ELSE 1700000000000000000 + sid * 1000000000
           + (seq - 1) * 1000000 END AS st,
    CASE sid % 4 WHEN 0 THEN 'gauge' WHEN 1 THEN 'sum'
      WHEN 2 THEN 'histogram' ELSE 'summary' END AS signal,
    CASE WHEN sid % 4 IN (0, 3) THEN 0
         WHEN sid % 8 < 4 THEN 1 ELSE 2 END AS tempo,
    sid % 6 <> 1 AS mono,
    seq = 2 AND sid % 10 = 0 AS stale,
    (e % 100) * 0.5 AS v,
    e % 50 AS cnt,
    (e % 9) * 1.5 AS sm,
    [e % 5, e % 7, e % 11] AS bk
  FROM b
), kept AS (
  SELECT * FROM c
  WHERE NOT (signal = 'sum' AND (tempo = 0 OR (tempo = 1 AND NOT
    mono)))
), alive AS (
  SELECT * FROM (
    SELECT *,
      max(CASE WHEN stale THEN ts END) OVER (PARTITION BY sid)
        AS stale_ts
    FROM kept)
  WHERE NOT stale AND (stale_ts IS NULL OR ts > stale_ts)
), chains AS (
  SELECT *,
    CASE WHEN lag(ts) OVER w IS NULL OR tempo <> 1
              OR st <> lag(ts) OVER w THEN 1 ELSE 0 END AS brk
  FROM alive
  WINDOW w AS (PARTITION BY sid ORDER BY ts)
), numbered AS (
  SELECT *,
    sum(brk) OVER (PARTITION BY sid ORDER BY ts
                   ROWS UNBOUNDED PRECEDING) AS chain
  FROM chains
), lastchain AS (
  SELECT * FROM (
    SELECT *, max(chain) OVER (PARTITION BY sid) AS lc
    FROM numbered)
  WHERE chain = lc
)
SELECT
  signal, 'm' || CAST(sid AS VARCHAR) AS metric_name,
  'lib' || CAST(sid % 2 AS VARCHAR) AS scope_name,
  CASE WHEN sid % 9 <> 0 THEN
    CASE WHEN sid % 4 = 0 THEN 'ns/' ELSE '' END
    || 'svc' || CAST(sid % 3 AS VARCHAR)
  ELSE '' END AS job,
  CASE WHEN sid % 3 = 0 THEN 'i' || CAST(sid % 2 AS VARCHAR)
    ELSE '' END AS instance,
  'dim=' || CAST(sid % 5 AS VARCHAR) AS attr_csv,
  max(ts) AS ts_ns,
  CASE WHEN max(tempo) = 1 THEN min(st)
       ELSE max_by(st, ts) END AS start_ns,
  CASE WHEN signal = 'sum' THEN
         round(CASE WHEN max(tempo) = 1 THEN sum(v)
                    ELSE max_by(v, ts) END, 6)
       WHEN signal IN ('gauge', 'summary') THEN round(max_by(v, ts), 6)
  END AS value,
  CASE WHEN signal = 'histogram' THEN
    CASE WHEN max(tempo) = 1 THEN sum(cnt) ELSE max_by(cnt, ts) END
  END AS count,
  CASE WHEN signal = 'histogram' THEN
    round(CASE WHEN max(tempo) = 1 THEN sum(sm)
               ELSE max_by(sm, ts) END, 6)
  END AS sum,
  CASE WHEN signal = 'histogram' THEN
    CASE WHEN max(tempo) = 1 THEN
      CAST(sum(bk[1]) AS VARCHAR) || ';' || CAST(sum(bk[2]) AS
        VARCHAR) || ';' || CAST(sum(bk[3]) AS VARCHAR)
    ELSE CAST(max_by(bk, ts)[1] AS VARCHAR) || ';'
      || CAST(max_by(bk, ts)[2] AS VARCHAR) || ';'
      || CAST(max_by(bk, ts)[3] AS VARCHAR) END
  ELSE '' END AS bk_csv,
  CASE WHEN signal = 'histogram' THEN '1.0;2.0' ELSE '' END AS bd_csv,
  2 AS temporality,
  bool_or(mono) AS is_monotonic
FROM lastchain
GROUP BY sid, signal
"""

EXT37_QUERIES["prom_accumulate"] = q_prom_accumulate
EXT37_ORACLES["prom_accumulate"] = O_PROM_ACC

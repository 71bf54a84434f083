"""Round-5 queries (cont. 8): OTLP → Jaeger proto span-model export
(``pkg/translator/jaeger/traces_to_jaegerproto.go``), the write twin of
``jaeger_spans``.

The fixture derives an OTLP-shaped span table from ``events``
(deterministic typed attrs, ids that exercise the uint64→int64
two's-complement folds, parent/link reference interplay) and runs the
vectorized ``jaeger_export_spans`` translator; the oracle rebuilds the
rendered tag CSV / reference / log strings directly in SQL from the
same residue classes. Because every fixture value is deterministic,
the oracle never has to re-implement hex→int64 — it reuses the known
integers the hex strings were minted from.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import QueryFn, load

EXT24_QUERIES: dict[str, QueryFn] = {}
EXT24_ORACLES: dict[str, str] = {}

_TAG_T = ("struct<key:string,vtype:string,vstr:string,vint:bigint,"
          "vbool:boolean,vdouble:double,vbinary:binary>")


def q_jaeger_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.jaeger_export import jaeger_export_spans

    ev = load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    s = lambda c: c.cast("string")  # noqa: E731
    hx = lambda c: F.lpad(F.lower(F.hex(c.cast("bigint"))), 16, "0")  # noqa: E731

    def tag(cond, key, vtype, *, vstr=None, vint=None, vbool=None,
            vdouble=None, vbinary=None):
        return F.when(cond, F.struct(
            F.lit(key).alias("key"),
            F.lit(vtype).alias("vtype"),
            (vstr if vstr is not None
             else F.lit(None).cast("string")).alias("vstr"),
            (vint.cast("bigint") if vint is not None
             else F.lit(None).cast("bigint")).alias("vint"),
            (vbool if vbool is not None
             else F.lit(None).cast("boolean")).alias("vbool"),
            (vdouble if vdouble is not None
             else F.lit(None).cast("double")).alias("vdouble"),
            (vbinary if vbinary is not None
             else F.lit(None).cast("binary")).alias("vbinary")))

    def tags(*entries):
        return F.filter(F.array(*entries), lambda x: x.isNotNull())

    t = F.lit(True)
    # ids exercise both halves of the idutils fold, incl. negatives
    # (= uint64 values with the high bit set)
    high_i = F.when(e % 8 == 0, -(u + 1)).otherwise(F.lit(0))
    low_i = F.when(e % 6 == 0, -(u + 2)).otherwise(F.lit(1000000) + u)
    sid_i = F.when(e % 9 == 0, -(e + 1)).otherwise(e + 1)
    par_i = F.floor(e / 2) + 1
    tid_hex = F.when(e % 13 == 0, F.lit("")).otherwise(
        F.concat(hx(high_i), hx(low_i)))
    start_ns = F.lit(1700000000000000000) + e * 1000

    fx = ev.select(
        e.alias("i"),
        tid_hex.alias("trace_id"),
        hx(sid_i).alias("span_id"),
        F.when(e % 3 == 0, F.lit("")).otherwise(hx(par_i))
        .alias("parent_span_id"),
        F.concat(F.lit("op-"), F.col("event_type")).alias("name"),
        (e % 7).cast("int").alias("kind"),  # 6 exercises the clamp
        start_ns.cast("bigint").alias("start_ns"),
        (start_ns + (e % 997 + 1) * 1000).cast("bigint").alias("end_ns"),
        F.when(e % 11 == 0, F.lit(2)).when(e % 11 == 1, F.lit(1))
        .otherwise(F.lit(0)).cast("int").alias("status_code"),
        F.when((e % 11 == 0) & (e % 2 == 0), F.lit("boom"))
        .otherwise(F.lit("")).alias("status_message"),
        F.when(e % 4 == 0, F.lit("a=b")).otherwise(F.lit(""))
        .alias("trace_state"),
        tags(
            tag(t, "http.method", "string", vstr=F.lit("GET")),
            tag(t, "retries", "int", vint=e % 5),
            tag(e % 2 == 0, "ok", "bool", vbool=u % 2 == 0),
            tag(e % 3 == 0, "ratio", "double", vdouble=(u % 3) * 0.5),
            tag(e % 5 == 0, "blob", "binary",
                vbinary=F.lit(bytearray(b"\x01\xab"))),
            tag(e % 7 == 0, "meta", "map", vstr=F.lit('{"a":1}')),
        ).alias("attrs"),
        F.when(u % 5 == 0, F.expr("array()").cast(f"array<{_TAG_T}>"))
        .otherwise(tags(
            tag(u % 7 == 0, "service.name", "int", vint=F.lit(7)),
            tag(u % 7 != 0, "service.name", "string",
                vstr=F.concat(F.lit("svc"), s(u % 3))),
            tag(t, "host.name", "string",
                vstr=F.concat(F.lit("h"), s(u % 4))),
            tag(u % 3 == 0, "region", "string",
                vstr=F.concat(F.lit("r"), s(u % 2))),
        )).alias("res_attrs"),
        F.when(u % 9 == 0, F.lit("")).otherwise(
            F.concat(F.lit("lib"), s(u % 2))).alias("scope_name"),
        F.when(u % 6 == 0, F.lit("")).otherwise(
            F.concat(F.lit("1."), s(u % 3))).alias("scope_version"),
        F.when(e % 5 == 0, F.array(
            F.struct((start_ns + 1).cast("bigint").alias("ts_ns"),
                     F.lit("wake").alias("name"),
                     tags().alias("attrs")),
            F.struct((start_ns + 2).cast("bigint").alias("ts_ns"),
                     F.lit("ev").alias("name"),
                     tags(tag(t, "event", "string", vstr=F.lit("x")),
                          tag(t, "n", "int", vint=e % 3)).alias("attrs")),
        )).alias("events"),
        F.when(e % 10 == 0,
               F.when(e % 20 == 0, F.array(F.struct(
                   # points at the parent span: overrides ref0 to
                   # FOLLOWS_FROM (no ref_type attr) and is skipped —
                   # unless parent/trace id is empty, then appended
                   F.concat(hx(high_i), hx(low_i)).alias("trace_id"),
                   hx(par_i).alias("span_id"),
                   tags().alias("attrs"))))
               .otherwise(F.array(F.struct(
                   F.concat(hx(F.lit(77)), hx(e + 99)).alias("trace_id"),
                   hx(e + 5).alias("span_id"),
                   tags(tag(u % 2 == 0, "opentracing.ref_type", "string",
                            vstr=F.lit("child_of"))).alias("attrs")))))
        .alias("links"),
    )

    return jaeger_export_spans(fx, id_cols=["i"])


O_JAEGER_EXPORT = """
WITH a AS (
  SELECT event_id AS i, user_id AS u, event_id AS e, event_type,
         1700000000000000000 + event_id * 1000 AS start_ns
  FROM events
), b AS (
  SELECT *,
         CASE WHEN e % 8 = 0 THEN -(u + 1) ELSE 0 END AS high_i,
         CASE WHEN e % 6 = 0 THEN -(u + 2) ELSE 1000000 + u END AS low_i,
         CASE WHEN e % 9 = 0 THEN -(e + 1) ELSE e + 1 END AS sid_i,
         e // 2 + 1 AS par_i,
         e % 7 AS kind,
         CASE WHEN e % 11 = 0 THEN 2
              WHEN e % 11 = 1 THEN 1 ELSE 0 END AS code
  FROM a
), c AS (
  SELECT *,
         CASE WHEN e % 13 = 0 THEN 0 ELSE high_i END AS tid_high,
         CASE WHEN e % 13 = 0 THEN 0 ELSE low_i END AS tid_low
  FROM b
)
SELECT i,
  CASE WHEN u % 5 = 0 THEN 'OTLPResourceNoServiceName'
       WHEN u % 7 = 0 THEN ''
       ELSE 'svc' || CAST(u % 3 AS VARCHAR) END AS service_name,
  CASE WHEN u % 5 = 0 THEN ''
       ELSE 'host.name=STRING:h' || CAST(u % 4 AS VARCHAR) ||
            CASE WHEN u % 3 = 0
                 THEN ',region=STRING:r' || CAST(u % 2 AS VARCHAR)
                 ELSE '' END END AS process_tags,
  tid_high AS trace_id_high,
  tid_low AS trace_id_low,
  sid_i AS span_id_u64,
  'op-' || event_type AS op_name,
  COALESCE(array_to_string(list_filter([
    CASE WHEN e % 3 <> 0 THEN
      CAST(tid_high AS VARCHAR) || '|' || CAST(tid_low AS VARCHAR) ||
      '|' || CAST(par_i AS VARCHAR) || '|' ||
      CASE WHEN e % 20 = 0 AND e % 13 <> 0
           THEN 'FOLLOWS_FROM' ELSE 'CHILD_OF' END END,
    CASE WHEN e % 20 = 0 AND (e % 3 = 0 OR e % 13 = 0) THEN
      CAST(high_i AS VARCHAR) || '|' || CAST(low_i AS VARCHAR) ||
      '|' || CAST(par_i AS VARCHAR) || '|FOLLOWS_FROM'
    WHEN e % 10 = 0 AND e % 20 <> 0 THEN
      '77|' || CAST(e + 99 AS VARCHAR) || '|' ||
      CAST(e + 5 AS VARCHAR) || '|' ||
      CASE WHEN u % 2 = 0 THEN 'CHILD_OF' ELSE 'FOLLOWS_FROM' END
    END
  ], x -> x IS NOT NULL), ';'), '') AS refs,
  start_ns,
  (e % 997 + 1) * 1000 AS duration_ns,
  array_to_string(list_filter([
    CASE WHEN u % 9 <> 0
         THEN 'otel.scope.name=STRING:lib' || CAST(u % 2 AS VARCHAR) END,
    CASE WHEN u % 6 <> 0
         THEN 'otel.scope.version=STRING:1.' || CAST(u % 3 AS VARCHAR) END,
    'http.method=STRING:GET',
    'retries=INT64:' || CAST(e % 5 AS VARCHAR),
    CASE WHEN e % 2 = 0 THEN 'ok=BOOL:' ||
         CASE WHEN u % 2 = 0 THEN 'true' ELSE 'false' END END,
    CASE WHEN e % 3 = 0 THEN 'ratio=FLOAT64:' ||
         CASE u % 3 WHEN 0 THEN '0.0' WHEN 1 THEN '0.5'
              ELSE '1.0' END END,
    CASE WHEN e % 5 = 0 THEN 'blob=BINARY:01ab' END,
    CASE WHEN e % 7 = 0 THEN 'meta=STRING:{"a":1}' END,
    CASE kind WHEN 1 THEN 'span.kind=STRING:internal'
         WHEN 2 THEN 'span.kind=STRING:server'
         WHEN 3 THEN 'span.kind=STRING:client'
         WHEN 4 THEN 'span.kind=STRING:producer'
         WHEN 5 THEN 'span.kind=STRING:consumer' END,
    CASE WHEN code = 2 THEN 'otel.status_code=STRING:ERROR'
         WHEN code = 1 THEN 'otel.status_code=STRING:OK' END,
    CASE WHEN code = 2 THEN 'error=BOOL:true' END,
    CASE WHEN code = 2 AND e % 2 = 0
         THEN 'otel.status_description=STRING:boom' END,
    CASE WHEN e % 4 = 0 THEN 'w3c.tracestate=STRING:a=b' END
  ], x -> x IS NOT NULL), ',') AS tags,
  CASE WHEN e % 5 = 0 THEN
    CAST(start_ns + 1 AS VARCHAR) || '~event=STRING:wake;' ||
    CAST(start_ns + 2 AS VARCHAR) || '~event=STRING:x,n=INT64:' ||
    CAST(e % 3 AS VARCHAR)
  ELSE '' END AS logs
FROM c
"""


EXT24_QUERIES["jaeger_export"] = q_jaeger_export
EXT24_ORACLES["jaeger_export"] = O_JAEGER_EXPORT


def q_signalfx_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OTLP metrics → SignalFx datapoints
    (``pkg/translator/signalfx/from_metrics.go``); fixture fans the
    events table across all five metric shapes."""
    from ..operators.signalfx_export import signalfx_from_metrics

    ev = load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    s = lambda c: c.cast("string")  # noqa: E731
    d = lambda c: c.cast("double")  # noqa: E731

    fx = ev.select(
        e.alias("i"),
        F.concat(F.lit("met"), s(e % 6)).alias("name"),
        F.when(e % 5 == 0, F.lit("gauge"))
        .when(e % 5 == 1, F.lit("sum"))
        .when(e % 5 == 2, F.lit("histogram"))
        .when(e % 5 == 3, F.lit("summary"))
        .when(e % 2 == 0, F.lit("exphist")).otherwise(F.lit("empty"))
        .alias("mtype"),
        (u % 3 != 0).alias("monotonic"),
        (e % 2 == 0).alias("delta"),
        (F.lit(1700000000000000000) + e * 1000000).cast("bigint")
        .alias("ts_ns"),
        F.when(e % 7 != 0, F.map_from_arrays(
            F.array(F.lit("k"), F.lit("q")),
            F.array(F.concat(F.lit("v"), s(e % 3)),
                    F.concat(F.lit("z"), s(u % 2)))))
        .otherwise(F.map_from_arrays(F.array().cast("array<string>"),
                                     F.array().cast("array<string>")))
        .alias("attrs"),
        F.when(u % 5 != 0, F.create_map(
            F.lit("host"), F.concat(F.lit("h"), s(u % 4))))
        .otherwise(F.map_from_arrays(F.array().cast("array<string>"),
                                     F.array().cast("array<string>")))
        .alias("res_attrs"),
        F.when(e % 35 == 0, F.lit(None).cast("boolean"))
        .otherwise(e % 2 == 0).alias("is_int"),
        (e % 100).cast("bigint").alias("vint"),
        d((u % 4) * 0.25).alias("vdouble"),
        F.when(e % 5 == 2, e % 50 + 2).otherwise(e % 30 + 1)
        .cast("bigint").alias("count"),
        F.when(e % 5 == 2,
               F.when(u % 4 != 0, d((u % 10) * 1.5)))
        .otherwise(F.when(u % 3 != 0, d((u % 9) * 1.25))).alias("sum"),
        F.when(u % 5 != 0, F.lit(0.25)).cast("double").alias("min"),
        F.when(u % 6 != 0, d((u % 7) * 2.0)).alias("max"),
        F.array(F.lit(0.0), F.lit(1.0), F.lit(2.5)).alias("bounds"),
        F.when(e % 20 == 2,
               F.array(F.lit(1), F.lit(2)).cast("array<bigint>"))
        .when(e % 15 == 2, F.array().cast("array<bigint>"))
        .otherwise(F.array(e % 3, e % 4, e % 5 + 1, F.lit(7))
                   .cast("array<bigint>")).alias("bucket_counts"),
        F.when(u % 2 == 0, F.array(
            F.struct(F.lit(0.5).alias("q"),
                     d((u % 5) * 0.25).alias("v")),
            F.struct(F.lit(0.99).alias("q"),
                     d((u % 9) * 0.5).alias("v"))))
        .otherwise(F.array().cast(
            "array<struct<q:double,v:double>>")).alias("quantiles"),
    )

    return signalfx_from_metrics(fx, id_cols=["i"])


O_SIGNALFX_EXPORT = """
WITH a AS (
  SELECT event_id AS i, user_id AS u, event_id AS e,
         'met' || CAST(event_id % 6 AS VARCHAR) AS name,
         1700000000000 + event_id AS ts_ms,
         CASE WHEN event_id % 2 = 0 THEN 'COUNTER'
              ELSE 'CUMULATIVE_COUNTER' END AS hist_mt
  FROM events
), dims AS (
  SELECT *,
    list_filter([
      CASE WHEN u % 5 <> 0 THEN 'host=h' || CAST(u % 4 AS VARCHAR) END,
      CASE WHEN e % 7 <> 0 THEN 'k=v' || CAST(e % 3 AS VARCHAR) END,
      CASE WHEN e % 7 <> 0 THEN 'q=z' || CAST(u % 2 AS VARCHAR) END
    ], x -> x IS NOT NULL) AS base
  FROM a
), pts AS (
  -- number points (gauge + sum), incl. the EMPTY-value point
  SELECT i, name AS metric,
         CASE WHEN e % 5 = 0 THEN 'GAUGE'
              WHEN u % 3 = 0 THEN 'GAUGE'
              ELSE hist_mt END AS metric_type,
         ts_ms, base,
         CASE WHEN e % 35 <> 0 AND e % 2 = 0 THEN e % 100 END AS vint,
         CASE WHEN e % 35 <> 0 AND e % 2 <> 0
              THEN (u % 4) * 0.25 END AS vdouble,
         NULL AS extra
  FROM dims WHERE e % 5 IN (0, 1)
  UNION ALL
  SELECT i, name || '_count', hist_mt, ts_ms, base,
         e % 50 + 2, NULL, NULL
  FROM dims WHERE e % 5 = 2
  UNION ALL
  SELECT i, name || '_sum', hist_mt, ts_ms, base,
         NULL, (u % 10) * 1.5, NULL
  FROM dims WHERE e % 5 = 2 AND u % 4 <> 0
  UNION ALL
  SELECT i, name || '_min', 'GAUGE', ts_ms, base, NULL, 0.25, NULL
  FROM dims WHERE e % 5 = 2 AND u % 5 <> 0
  UNION ALL
  SELECT i, name || '_max', 'GAUGE', ts_ms, base,
         NULL, (u % 7) * 2.0, NULL
  FROM dims WHERE e % 5 = 2 AND u % 6 <> 0
  UNION ALL
  SELECT i, name || '_bucket', hist_mt, ts_ms, base,
         e % 3, NULL, 'le=0'
  FROM dims WHERE e % 5 = 2 AND e % 20 <> 2 AND e % 15 <> 2
  UNION ALL
  SELECT i, name || '_bucket', hist_mt, ts_ms, base,
         e % 3 + e % 4, NULL, 'le=1'
  FROM dims WHERE e % 5 = 2 AND e % 20 <> 2 AND e % 15 <> 2
  UNION ALL
  SELECT i, name || '_bucket', hist_mt, ts_ms, base,
         e % 3 + e % 4 + e % 5 + 1, NULL, 'le=2.5'
  FROM dims WHERE e % 5 = 2 AND e % 20 <> 2 AND e % 15 <> 2
  UNION ALL
  SELECT i, name || '_bucket', hist_mt, ts_ms, base,
         e % 3 + e % 4 + e % 5 + 8, NULL, 'le=+Inf'
  FROM dims WHERE e % 5 = 2 AND e % 20 <> 2 AND e % 15 <> 2
  UNION ALL
  SELECT i, name || '_count', 'CUMULATIVE_COUNTER', ts_ms, base,
         e % 30 + 1, NULL, NULL
  FROM dims WHERE e % 5 = 3
  UNION ALL
  SELECT i, name || '_sum', 'CUMULATIVE_COUNTER', ts_ms, base, NULL,
         CASE WHEN u % 3 <> 0 THEN (u % 9) * 1.25 ELSE 0.0 END, NULL
  FROM dims WHERE e % 5 = 3
  UNION ALL
  SELECT i, name || '_quantile', 'GAUGE', ts_ms, base,
         NULL, (u % 5) * 0.25, 'quantile=0.5'
  FROM dims WHERE e % 5 = 3 AND u % 2 = 0
  UNION ALL
  SELECT i, name || '_quantile', 'GAUGE', ts_ms, base,
         NULL, (u % 9) * 0.5, 'quantile=0.99'
  FROM dims WHERE e % 5 = 3 AND u % 2 = 0
)
SELECT i, metric, metric_type, ts_ms,
  COALESCE(array_to_string(list_sort(
    CASE WHEN extra IS NULL THEN base
         ELSE list_append(base, extra) END), ','), '') AS dims,
  CAST(vint AS BIGINT) AS vint,
  CAST(vdouble AS DOUBLE) AS vdouble
FROM pts
"""


EXT24_QUERIES["signalfx_export"] = q_signalfx_export
EXT24_ORACLES["signalfx_export"] = O_SIGNALFX_EXPORT

"""Round-4 receiver queries: statsd / carbon / prometheus-text /
influx line protocol.

Each query builds a deterministic line fixture from ``events`` (the
established syslog_parser technique — the oracle recomputes the
expected output from the SAME underlying columns, so correctness is
end-to-end: line synthesis → parse → aggregate must all agree with
the SQL ground truth).

Reference semantics cited per-operator in ``operators/receivers.py``:
statsdreceiver's parse/Aggregate/translator, carbonreceiver's
plaintext path parser, the Prometheus exposition format
(simpleprometheusreceiver), influxdbreceiver's line protocol.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import QueryFn, load
from ..operators.receivers import (
    carbon_parse,
    influx_line_parse,
    prom_text_parse,
    prom_type_table,
    statsd_counters,
    statsd_gauges,
    statsd_parse,
    statsd_summaries,
)


# ---------------------------------------------------------------------------
# statsd — one shared line fixture, three aggregation views
# ---------------------------------------------------------------------------
# per event row (m10 = event_id % 10):
#   m10 < 5          counter  'evt.<type>:<v>|c[|@0.5 if event_id%3=0]|#env:<e>,region:r<r>'
#   5 <= m10 < 8     gauge    'evt.<type>:[+/-]<g>|g|#host:h<h>'
#   m10 >= 8         timer    'evt.<type>:<v>|ms[|@0.25 if event_id%5=0]'
# v = user_id % 100, g = user_id % 50 (+ on event_id%4=0, - on %4=1)
# rates are exact powers of two so int/rate is float-exact cross-engine.

def _statsd_lines(ev: DataFrame) -> DataFrame:
    m10 = F.col("event_id") % 10
    v = (F.col("user_id") % 100).cast("long")
    g = (F.col("user_id") % 50).cast("long")
    name = F.concat(F.lit("evt."), F.col("event_type"))
    env = F.when(F.col("user_id") % 3 == 0, "prod").otherwise("dev")
    region = (F.col("user_id") % 4).cast("int")
    host = (F.col("user_id") % 3).cast("int")

    counter = F.concat(
        name, F.lit(":"), v.cast("string"), F.lit("|c"),
        F.when(F.col("event_id") % 3 == 0, F.lit("|@0.5")).otherwise(F.lit("")),
        F.lit("|#env:"), env, F.lit(",region:r"), region.cast("string"),
    )
    sign = (
        F.when(F.col("event_id") % 4 == 0, "+")
        .when(F.col("event_id") % 4 == 1, "-")
        .otherwise("")
    )
    gauge = F.concat(
        name, F.lit(":"), sign, g.cast("string"), F.lit("|g"),
        F.lit("|#host:h"), host.cast("string"),
    )
    timer = F.concat(
        name, F.lit(":"), v.cast("string"), F.lit("|ms"),
        F.when(F.col("event_id") % 5 == 0, F.lit("|@0.25")).otherwise(F.lit("")),
    )
    body = F.when(m10 < 5, counter).when(m10 < 8, gauge).otherwise(timer)
    return ev.select("event_id", body.alias("body"))


# the same fixture derivations, as SQL building blocks
_SQL_LINES = """
lines AS (
  SELECT event_id,
         'evt.' || event_type AS name,
         event_id % 10 AS m10,
         CAST(user_id % 100 AS BIGINT) AS v,
         CAST(user_id % 50 AS BIGINT) AS g,
         CASE WHEN user_id % 3 = 0 THEN 'prod' ELSE 'dev' END AS env,
         CAST(user_id % 4 AS INT) AS region,
         CAST(user_id % 3 AS INT) AS host,
         event_id % 3 = 0 AS c_sampled,
         event_id % 5 = 0 AS t_sampled,
         event_id % 4 AS m4
  FROM events
)
"""


def q_statsd_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    parsed = statsd_parse(_statsd_lines(ev))
    return statsd_counters(parsed).select("name", "attrs", "counter_value")


O_STATSD_COUNTERS = f"""
WITH {_SQL_LINES}
SELECT name,
       'env:' || env || ',region:r' || CAST(region AS VARCHAR) AS attrs,
       SUM(CAST(trunc(v / (CASE WHEN c_sampled THEN 0.5 ELSE 1 END)) AS BIGINT))
           AS counter_value
FROM lines WHERE m10 < 5
GROUP BY 1, 2
"""


def q_statsd_gauges(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    parsed = statsd_parse(_statsd_lines(ev))
    return statsd_gauges(parsed, order_col="event_id").select(
        "name", "attrs", "gauge_value"
    )


O_STATSD_GAUGES = f"""
WITH {_SQL_LINES},
gl AS (
  SELECT name, 'host:h' || CAST(host AS VARCHAR) AS attrs, event_id,
         CASE WHEN m4 = 1 THEN -CAST(g AS DOUBLE) ELSE CAST(g AS DOUBLE) END AS val,
         m4 IN (0, 1) AS addition
  FROM lines WHERE m10 >= 5 AND m10 < 8
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY name, attrs ORDER BY event_id) AS rn
  FROM gl
),
s AS (
  SELECT name, attrs,
         max(CASE WHEN NOT addition OR rn = 1 THEN rn END) AS last_set
  FROM r GROUP BY 1, 2
)
SELECT r.name, r.attrs,
       SUM(CASE WHEN rn = last_set THEN val
                WHEN rn > last_set AND addition THEN val END) AS gauge_value
FROM r JOIN s USING (name, attrs)
GROUP BY 1, 2
"""


def q_statsd_timers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    parsed = statsd_parse(_statsd_lines(ev))
    return statsd_summaries(parsed).select(
        "name", "attrs", "summary_count", "summary_sum",
        "summary_min", "summary_max",
    )


O_STATSD_TIMERS = f"""
WITH {_SQL_LINES},
tl AS (
  SELECT name, CAST(v AS DOUBLE) AS val,
         CASE WHEN t_sampled THEN 4.0 ELSE 1.0 END AS w
  FROM lines WHERE m10 >= 8
)
SELECT name, '' AS attrs,
       CAST(trunc(SUM(w)) AS BIGINT) AS summary_count,
       SUM(val * w) AS summary_sum,
       MIN(val) AS summary_min,
       MAX(val) AS summary_max
FROM tl GROUP BY 1
"""


# ---------------------------------------------------------------------------
# carbon plaintext (row-level parse incl. dead-letter flag)
# ---------------------------------------------------------------------------
# line: 'svc.<type>.latency;dc=d<d>;env=<e> <val> <ts>'
#   every 7th row's first tag drops its '=' (invalid → cb_ok false)
#   value: int on even event_id, else '<v>.25' float
#   ts: 1700000000+user_id, '.25' fraction on event_id%3=0

def q_carbon_parser(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    d = (F.col("user_id") % 3).cast("int")
    env = F.when(F.col("user_id") % 2 == 0, "prod").otherwise("dev")
    v = (F.col("user_id") % 100).cast("long")
    tag1 = F.when(
        F.col("event_id") % 7 == 0, F.concat(F.lit("dcd"), d.cast("string"))
    ).otherwise(F.concat(F.lit("dc=d"), d.cast("string")))
    val = F.when(F.col("event_id") % 2 == 0, v.cast("string")).otherwise(
        F.concat(v.cast("string"), F.lit(".25"))
    )
    ts = F.concat(
        (F.lit(1700000000) + F.col("user_id")).cast("string"),
        F.when(F.col("event_id") % 3 == 0, F.lit(".25")).otherwise(F.lit("")),
    )
    body = F.concat(
        F.lit("svc."), F.col("event_type"), F.lit(".latency;"), tag1,
        F.lit(";env="), env, F.lit(" "), val, F.lit(" "), ts,
    )
    out = carbon_parse(ev.select("event_id", body.alias("body")))
    return out.select(
        "event_id", "cb_name", "cb_attrs", "cb_value", "cb_value_is_int",
        "cb_ts_ns", "cb_ok",
    )


O_CARBON = """
WITH c AS (
  SELECT event_id,
         'svc.' || event_type || '.latency' AS cb_name,
         CAST(user_id % 3 AS INT) AS d,
         CASE WHEN user_id % 2 = 0 THEN 'prod' ELSE 'dev' END AS env,
         CAST(user_id % 100 AS BIGINT) AS v,
         event_id % 7 = 0 AS bad_tag,
         event_id % 2 = 0 AS is_int,
         1700000000 + user_id AS tsec,
         event_id % 3 = 0 AS ts_frac
  FROM events
)
SELECT event_id, cb_name,
       CASE WHEN bad_tag THEN 'dcd' || CAST(d AS VARCHAR) || ',env=' || env
            ELSE 'dc=d' || CAST(d AS VARCHAR) || ',env=' || env END AS cb_attrs,
       CASE WHEN is_int THEN CAST(v AS DOUBLE) ELSE v + 0.25 END AS cb_value,
       is_int AS cb_value_is_int,
       tsec * 1000000000 + CASE WHEN ts_frac THEN 250000000 ELSE 0 END AS cb_ts_ns,
       NOT bad_tag AS cb_ok
FROM c
"""


# ---------------------------------------------------------------------------
# prometheus exposition text (samples + TYPE metadata broadcast join)
# ---------------------------------------------------------------------------

def q_prom_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    fam = F.concat(F.lit("evt_"), F.col("event_type"))
    suffix = (
        F.when(F.col("event_id") % 4 == 0, "_count")
        .when(F.col("event_id") % 4 == 1, "_sum")
        .otherwise("")
    )
    v = (F.col("user_id") % 1000).cast("long")
    val = F.when(F.col("event_id") % 13 == 0, F.lit("+Inf")).otherwise(
        v.cast("string")
    )
    ts = F.when(
        F.col("event_id") % 2 == 0,
        F.concat(F.lit(" "), (F.lit(1700000000000) + F.col("event_id")).cast("string")),
    ).otherwise(F.lit(""))
    body = F.concat(
        fam, suffix,
        F.lit('{method="m'), (F.col("user_id") % 4).cast("string"),
        F.lit('",code="'), ((F.col("user_id") % 3) * 100 + 200).cast("string"),
        F.lit('"} '), val, ts,
    )
    samples = ev.select("event_id", body.alias("body"))
    type_lines = ev.select("event_type").distinct().select(
        F.concat(
            F.lit("# TYPE evt_"), F.col("event_type"), F.lit(" "),
            F.when(F.col("event_type") == "error", "counter").otherwise("gauge"),
        ).alias("body")
    )
    parsed = prom_text_parse(samples).filter(F.col("pm_ok"))
    types = prom_type_table(type_lines)
    out = parsed.join(F.broadcast(types), "pm_family", "left")
    return out.select(
        "event_id", "pm_name", "pm_family", "pm_labels", "pm_value",
        "pm_ts_ms", "pm_type",
    )


O_PROM_TEXT = """
SELECT event_id,
       'evt_' || event_type ||
         CASE WHEN event_id % 4 = 0 THEN '_count'
              WHEN event_id % 4 = 1 THEN '_sum' ELSE '' END AS pm_name,
       'evt_' || event_type AS pm_family,
       'code=' || CAST((user_id % 3) * 100 + 200 AS VARCHAR)
         || ',method=m' || CAST(user_id % 4 AS VARCHAR) AS pm_labels,
       CASE WHEN event_id % 13 = 0 THEN CAST('inf' AS DOUBLE)
            ELSE CAST(user_id % 1000 AS DOUBLE) END AS pm_value,
       CASE WHEN event_id % 2 = 0 THEN 1700000000000 + event_id END AS pm_ts_ms,
       CASE WHEN event_type = 'error' THEN 'counter' ELSE 'gauge' END AS pm_type
FROM events
"""


# ---------------------------------------------------------------------------
# influx line protocol (fields explode into rows)
# ---------------------------------------------------------------------------

def q_influx_line(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    cpu = (F.col("user_id") % 100).cast("long")
    mem = (F.col("event_id") % 4096).cast("long")
    note = F.when(
        F.col("event_id") % 6 == 0,
        F.concat(F.lit(',note="msg '), F.col("event_id").cast("string"), F.lit('"')),
    ).otherwise(F.lit(""))
    ts = (F.lit(1700000000000000000) + F.col("event_id")).cast("string")
    body = F.concat(
        F.lit("app_"), F.col("event_type"),
        F.lit(",host=h"), (F.col("user_id") % 4).cast("string"),
        F.lit(",dc=d"), (F.col("user_id") % 3).cast("string"),
        F.lit(" cpu="), cpu.cast("string"),
        F.lit(".5,mem="), mem.cast("string"), F.lit("i"),
        note, F.lit(" "), ts,
    )
    out = influx_line_parse(ev.select("event_id", body.alias("body")))
    # no ifx_ok filter: every fixture line is valid, and filtering on
    # the pre-explode validity predicate makes pushdown re-inline the
    # whole ok-expression (with the fixture concat) 41x below the
    # staged projects — malformed-line routing is unit-tested instead
    return out.select(
        "event_id", "ifx_measurement", "ifx_tags", "ifx_field",
        "ifx_field_type", "ifx_value", "ifx_value_str", "ifx_ts_ns",
    )


O_INFLUX = """
WITH base AS (
  SELECT event_id,
         'app_' || event_type AS m,
         'dc=d' || CAST(user_id % 3 AS VARCHAR)
           || ',host=h' || CAST(user_id % 4 AS VARCHAR) AS tags,
         CAST(user_id % 100 AS BIGINT) AS cpu,
         CAST(event_id % 4096 AS BIGINT) AS mem,
         event_id % 6 = 0 AS has_note,
         1700000000000000000 + event_id AS ts
  FROM events
)
SELECT event_id, m AS ifx_measurement, tags AS ifx_tags,
       'cpu' AS ifx_field, 'float' AS ifx_field_type,
       cpu + 0.5 AS ifx_value, CAST(NULL AS VARCHAR) AS ifx_value_str,
       ts AS ifx_ts_ns
FROM base
UNION ALL
SELECT event_id, m, tags, 'mem', 'int', CAST(mem AS DOUBLE), NULL, ts
FROM base
UNION ALL
SELECT event_id, m, tags, 'note', 'string', NULL,
       'msg ' || CAST(event_id AS VARCHAR), ts
FROM base WHERE has_note
"""


EXT10_QUERIES: dict[str, QueryFn] = {
    "statsd_counters": q_statsd_counters,
    "statsd_gauges": q_statsd_gauges,
    "statsd_timers": q_statsd_timers,
    "carbon_parser": q_carbon_parser,
    "prom_text_parse": q_prom_text,
    "influx_line_parse": q_influx_line,
}

EXT10_ORACLES: dict[str, str] = {
    "statsd_counters": O_STATSD_COUNTERS,
    "statsd_gauges": O_STATSD_GAUGES,
    "statsd_timers": O_STATSD_TIMERS,
    "carbon_parser": O_CARBON,
    "prom_text_parse": O_PROM_TEXT,
    "influx_line_parse": O_INFLUX,
}


# ---------------------------------------------------------------------------
# BPE encode (apply mined merges — pairs with bpe_merges)
# ---------------------------------------------------------------------------

_BPE_MERGES: list[tuple[str, str]] = [
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"),
    ("an", "d"), ("e", "r"), ("o", "u"), ("o", "n"),
]
_BPE_PASSES = 4


def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import bpe_encode

    docs = load(spark, sf_dir, "documents")
    return bpe_encode(docs, _BPE_MERGES, passes=_BPE_PASSES).select(
        "doc_id", "bpe_text", "n_bpe_tokens"
    )


def _bpe_oracle() -> str:
    # per-word: ' '+chars+' ' then the same replace chain, 4 passes per
    # merge, leftmost non-overlapping — replace() semantics match Spark
    enc = "' ' || trim(regexp_replace(w, '(.)', '\\1 ', 'g')) || ' '"
    for a, b in _BPE_MERGES:
        for _ in range(_BPE_PASSES):
            enc = f"replace({enc}, ' {a} {b} ', ' {a}{b} ')"
    return f"""
WITH words AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                     t -> t != '') AS ws
  FROM documents
),
encw AS (
  SELECT doc_id,
         list_transform(ws, w -> trim({enc})) AS ew
  FROM words
)
SELECT doc_id,
       array_to_string(ew, ' ') AS bpe_text,
       coalesce(list_sum(list_transform(ew,
                e -> len(string_split(e, ' ')))), 0)::BIGINT AS n_bpe_tokens
FROM encw
"""


O_BPE_ENCODE = _bpe_oracle()


# ---------------------------------------------------------------------------
# DSIR importance weights (hashed unigrams, target = lang 'en')
# ---------------------------------------------------------------------------

_DSIR_B = 256


def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import dsir_weights

    docs = load(spark, sf_dir, "documents")
    return dsir_weights(
        docs, target_pred=F.col("lang") == "en", buckets=_DSIR_B
    ).select("doc_id", "dsir_w")


O_DSIR = f"""
WITH toks AS (
  SELECT doc_id, lang = 'en' AS tgt,
         unnest(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                            t -> t != '')) AS t
  FROM documents
),
b AS (
  SELECT doc_id, tgt,
         ('0x' || substr(md5(t), 1, 4))::INT % {_DSIR_B} AS bucket
  FROM toks
),
stats AS (
  SELECT bucket, count(*) AS q_cnt,
         sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS p_cnt
  FROM b GROUP BY 1
),
tot AS (SELECT sum(q_cnt) AS q, sum(p_cnt) AS p FROM stats),
lam AS (
  SELECT bucket,
         ln((p_cnt + 1.0) / (p + 1.0 * {_DSIR_B}))
           - ln((q_cnt + 1.0) / (q + 1.0 * {_DSIR_B})) AS lam
  FROM stats, tot
)
SELECT doc_id, round(sum(lam), 6) AS dsir_w
FROM b JOIN lam USING (bucket)
GROUP BY 1
"""


EXT10_QUERIES["bpe_encode"] = q_bpe_encode
EXT10_ORACLES["bpe_encode"] = O_BPE_ENCODE
EXT10_QUERIES["dsir_weights"] = q_dsir_weights
EXT10_ORACLES["dsir_weights"] = O_DSIR


# ---------------------------------------------------------------------------
# loki push-format receiver (one row per value tuple)
# ---------------------------------------------------------------------------

def q_loki_push(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.receivers import loki_push_parse

    ev = load(spark, sf_dir, "events")
    ts1 = (F.lit(1700000000000000000) + F.col("event_id")).cast("string")
    ts2 = (F.lit(1700000000000000000) + F.col("event_id") + F.lit(1)).cast("string")
    body = F.concat(
        F.lit('{"streams":[{"stream":{"app":"'), F.col("event_type"),
        F.lit('","env":"'),
        F.when(F.col("user_id") % 2 == 0, "prod").otherwise("dev"),
        F.lit('"},"values":[["'), ts1,
        F.lit('","line a '), F.col("event_id").cast("string"),
        F.lit('"],["'), ts2,
        F.lit('","line b '), F.col("event_id").cast("string"),
        F.lit('"]]}]}'),
    )
    out = loki_push_parse(ev.select("event_id", body.alias("body")))
    return out.filter(F.col("lk_ok")).select(
        "event_id", "lk_labels", "lk_ts_ns", "lk_line"
    )


O_LOKI = """
WITH base AS (
  SELECT event_id,
         'app=' || event_type || ',env='
           || CASE WHEN user_id % 2 = 0 THEN 'prod' ELSE 'dev' END AS labels,
         1700000000000000000 + event_id AS ts
  FROM events
)
SELECT event_id, labels AS lk_labels, ts AS lk_ts_ns,
       'line a ' || CAST(event_id AS VARCHAR) AS lk_line
FROM base
UNION ALL
SELECT event_id, labels, ts + 1, 'line b ' || CAST(event_id AS VARCHAR)
FROM base
"""


# ---------------------------------------------------------------------------
# streaming statsd counters (the receiver's flush-interval aggregation
# on a live stream: parse -> counter groupBy in complete mode; oracle
# is the batch counter aggregation — streaming==batch value equality)
# ---------------------------------------------------------------------------

def q_stream_statsd(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .queries_streaming import EVENTS_SCHEMA, _as_dir, _run_stream

    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(
        _as_dir(f"{sf_dir}/events.parquet")
    )
    parsed = statsd_parse(_statsd_lines(stream))
    counts = statsd_counters(parsed).select("name", "attrs", "counter_value")
    _run_stream(counts, "sstatsd_agg")
    return spark.table("sstatsd_agg")


EXT10_QUERIES["loki_push_parse"] = q_loki_push
EXT10_ORACLES["loki_push_parse"] = O_LOKI
EXT10_QUERIES["stream_statsd_counters"] = q_stream_statsd
EXT10_ORACLES["stream_statsd_counters"] = O_STATSD_COUNTERS


def q_statsd_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.receivers import statsd_percentiles

    ev = load(spark, sf_dir, "events")
    parsed = statsd_parse(_statsd_lines(ev))
    return statsd_percentiles(parsed, [50, 90]).select(
        "name", "attrs", "p50", "p90"
    )


O_STATSD_QUANTILES = f"""
WITH {_SQL_LINES},
tl AS (
  SELECT name, CAST(v AS DOUBLE) AS val,
         CASE WHEN t_sampled THEN 4.0 ELSE 1.0 END AS w
  FROM lines WHERE m10 >= 8
),
r AS (
  SELECT name, val, w,
         SUM(w) OVER (PARTITION BY name ORDER BY val, w
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw,
         SUM(w) OVER (PARTITION BY name) AS total
  FROM tl
)
SELECT name, '' AS attrs,
       MIN(CASE WHEN cumw >= 0.5 * total THEN val END) AS p50,
       MIN(CASE WHEN cumw >= 0.9 * total THEN val END) AS p90
FROM r GROUP BY 1
"""


EXT10_QUERIES["statsd_quantiles"] = q_statsd_quantiles
EXT10_ORACLES["statsd_quantiles"] = O_STATSD_QUANTILES

"""Round-2 extension batch #2: schema processor (semconv version
translation), sqlquery receiver (tracking-column watermark ingest),
signaltometrics connector (config-driven sum/gauge/histogram).

Every query has a DuckDB oracle with identical column aliases
(driver contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.schema import schema_translate
from ..operators.signaltometrics import MetricInfo, signal_to_metrics
from ..sources.sqlquery import SQLQueryReceiver
from .base import QueryFn, load


# ---------------------------------------------------------------------------
# schema processor: compose published semconv renames 1.7.0 -> 1.20.0
# (processor/schemaprocessor internal/translation/revision_v1.go;
# rename tables from the public opentelemetry.io schema files)
# ---------------------------------------------------------------------------

def _log_shaped_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events rows with an old-semconv attribute map (synthetic values
    derived from columns so both engines compute them identically)."""
    ev = load(spark, sf_dir, "events")
    return ev.withColumn(
        "attributes",
        F.create_map(
            F.lit("net.peer.ip"),
            F.concat(F.lit("10.0.0."), (F.col("user_id") % 256).cast("string")),
            F.lit("http.user_agent"),
            F.concat(F.lit("agent/"), F.col("event_type")),
            F.lit("faas.execution"),
            F.col("event_id").cast("string"),
            F.lit("db.cassandra.keyspace"),
            F.concat(F.lit("ks_"), (F.col("user_id") % 10).cast("string")),
            F.lit("http.retry_count"),
            (F.col("user_id") % 3).cast("string"),
        ),
    )


def q_schema_semconv(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _log_shaped_events(spark, sf_dir)
    df = schema_translate(df, "1.7.0", "1.20.0", attr_cols=("attributes",))
    a = F.col("attributes")
    return df.select(
        "event_id",
        F.element_at(a, F.lit("db.name")).alias("db_name"),
        F.element_at(a, F.lit("net.sock.peer.addr")).alias("sock_addr"),
        F.element_at(a, F.lit("user_agent.original")).alias("ua"),
        F.element_at(a, F.lit("faas.invocation_id")).alias("invocation_id"),
        F.element_at(a, F.lit("http.resend_count")).alias("resend_count"),
        F.element_at(a, F.lit("net.peer.ip")).alias("old_key_gone"),
    )


O_SCHEMA_SEMCONV = """
SELECT event_id,
       'ks_' || CAST(user_id % 10 AS VARCHAR) AS db_name,
       '10.0.0.' || CAST(user_id % 256 AS VARCHAR) AS sock_addr,
       'agent/' || event_type AS ua,
       CAST(event_id AS VARCHAR) AS invocation_id,
       CAST(user_id % 3 AS VARCHAR) AS resend_count,
       CAST(NULL AS VARCHAR) AS old_key_gone
FROM events
"""


# ---------------------------------------------------------------------------
# sqlquery receiver: parameterized query with tracking column
# (receiver/sqlqueryreceiver logs_receiver.go:220-345)
# ---------------------------------------------------------------------------

def q_sqlquery_logs(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    rx = SQLQueryReceiver(
        sql="SELECT event_id, event_type, props FROM events WHERE event_id > $1",
        tracking_column="event_id",
        tracking_start_value="1000",
        body_column="props",
        attribute_columns=("event_id", "event_type"),
    )
    logs = rx.to_logs(rx.poll(spark))
    return logs.select(
        "body",
        F.element_at(F.col("attributes"), F.lit("event_id")).alias("event_id"),
        F.element_at(F.col("attributes"), F.lit("event_type")).alias("event_type"),
    )


O_SQLQUERY_LOGS = """
SELECT props AS body,
       CAST(event_id AS VARCHAR) AS event_id,
       event_type
FROM events WHERE event_id > 1000
"""


# ---------------------------------------------------------------------------
# signaltometrics: OTTL-configured sum / gauge / histogram
# (connector/signaltometricsconnector README config surface)
# ---------------------------------------------------------------------------

def _signal_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.select(
        F.col("props").alias("body"),
        F.col("ts").alias("time"),
        F.create_map(
            F.lit("event_type"), F.col("event_type"),
            F.lit("value"), F.col("value").cast("string"),
            F.lit("user"), F.col("user_id").cast("string"),
        ).alias("attributes"),
    )


def q_signaltometrics_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _signal_events(spark, sf_dir)
    cfg = MetricInfo(
        name="events_value_sum",
        metric_type="sum",
        value='Double(attributes["value"])',
        conditions=('attributes["event_type"] != "signup"',),
        attributes=(("event_type",),),
    )
    out = signal_to_metrics(df, cfg)
    return out.select(
        "event_type", F.round(F.col("events_value_sum"), 4).alias("events_value_sum")
    )


O_S2M_SUM = """
SELECT event_type, ROUND(SUM(value), 4) AS events_value_sum
FROM events WHERE event_type <> 'signup'
GROUP BY event_type
"""


def q_signaltometrics_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _signal_events(spark, sf_dir)
    cfg = MetricInfo(
        name="events_value_hist",
        metric_type="histogram",
        value='Double(attributes["value"])',
        attributes=(("event_type",),),
    )
    return signal_to_metrics(df, cfg).select(
        "event_type", "bucket_idx", "bucket_count"
    )


def _hist_case() -> str:
    from ..operators.signaltometrics import DEFAULT_BUCKETS

    clauses = " ".join(
        f"WHEN value <= {b} THEN {i}" for i, b in enumerate(DEFAULT_BUCKETS)
    )
    return f"CASE {clauses} ELSE {len(DEFAULT_BUCKETS)} END"


O_S2M_HIST = f"""
SELECT event_type, {_hist_case()} AS bucket_idx,
       COUNT(*) AS bucket_count
FROM events
GROUP BY event_type, bucket_idx
"""


def q_signaltometrics_gauge(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _signal_events(spark, sf_dir)
    cfg = MetricInfo(
        name="events_value_gauge",
        metric_type="gauge",
        value='Double(attributes["value"])',
        attributes=(("event_type",),),
    )
    return signal_to_metrics(df, cfg)


O_S2M_GAUGE = """
SELECT event_type, arg_max(value, ts) AS events_value_gauge
FROM events GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# span processor: rename from attributes + extract-to-attributes
# (processor/spanprocessor README name/from_attributes + to_attributes)
# ---------------------------------------------------------------------------

def q_span_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.span import span_name_from_attributes

    ev = load(spark, sf_dir, "events")
    df = ev.select(
        "event_id",
        F.lit("old-name").alias("name"),
        F.create_map(
            F.lit("db.svc"), F.col("event_type"),
            # 'operation' present only for even user ids -> odd rows
            # must keep the old name (all-present rule)
            F.lit("operation"),
            F.when(F.col("user_id") % 2 == 0, F.concat(F.lit("op"), (F.col("user_id") % 7).cast("string"))),
        ).alias("attributes"),
    )
    out = span_name_from_attributes(df, ["db.svc", "operation"], separator="::")
    return out.select("event_id", "name")


O_SPAN_RENAME = """
SELECT event_id,
       CASE WHEN user_id % 2 = 0
            THEN event_type || '::' || 'op' || CAST(user_id % 7 AS VARCHAR)
            ELSE 'old-name' END AS name
FROM events
"""


def q_span_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.span import span_to_attributes

    ev = load(spark, sf_dir, "events")
    df = ev.select(
        "event_id",
        F.concat(
            F.lit("/api/v1/document/"), F.col("event_id").cast("string"),
            F.lit("/update"),
        ).alias("name"),
        F.create_map(F.lit("k"), F.lit("v")).alias("attributes"),
    )
    out = span_to_attributes(
        df, [r"\/api\/v1\/document\/(?P<documentId>.*)\/update"]
    )
    return out.select(
        "event_id",
        "name",
        F.element_at(F.col("attributes"), F.lit("documentId")).alias("doc_id"),
    )


O_SPAN_EXTRACT = """
SELECT event_id,
       '/api/v1/document/{documentId}/update' AS name,
       CAST(event_id AS VARCHAR) AS doc_id
FROM events
"""


# ---------------------------------------------------------------------------
# metricstransform: regexp combine + aggregate_labels + scale
# (processor/metricstransformprocessor README transform table)
# ---------------------------------------------------------------------------

def _metric_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.select(
        F.concat(F.lit("ev."), F.col("event_type")).alias("metric_name"),
        F.create_map(
            F.lit("bucket"), (F.col("user_id") % 4).cast("string"),
            F.lit("host"), F.concat(F.lit("h"), (F.col("event_id") % 3).cast("string")),
        ).alias("labels"),
        F.col("value"),
    )


def q_metricstransform(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.metricstransform import (
        Operation,
        Transform,
        metrics_transform,
    )

    df = _metric_rows(spark, sf_dir)
    out = metrics_transform(
        df,
        [
            # scale one metric family in place
            Transform(
                include=r"^ev\.error$", match_type="regexp", action="update",
                operations=(Operation(action="experimental_scale_value", scale=0.001),),
            ),
            # combine everything into one metric summed across names,
            # then drop the host label (aggregate across it)
            Transform(
                include=r"^ev\..*", match_type="regexp", action="combine",
                new_name="ev.all", aggregation_type="sum",
                operations=(
                    Operation(
                        action="aggregate_labels", label_set=("bucket",),
                        aggregation_type="sum",
                    ),
                ),
            ),
        ],
    )
    return out.select(
        "metric_name",
        F.element_at(F.col("labels"), F.lit("bucket")).alias("bucket"),
        F.round(F.col("value"), 2).alias("value"),
    )


O_METRICSTRANSFORM = """
SELECT 'ev.all' AS metric_name,
       CAST(user_id % 4 AS VARCHAR) AS bucket,
       ROUND(SUM(CASE WHEN event_type = 'error' THEN value * 0.001 ELSE value END), 2) AS value
FROM events
GROUP BY user_id % 4
"""


# ---------------------------------------------------------------------------
# embedding-cosine near-dup (dedup family completion): LSH-bucketed
# pair detection at threshold, min-id representative. Deterministic
# near-dups are synthesized by scaling 50 vectors by 1.01 — cosine-
# and LSH-bucket-invariant, so recall is exact and oracle-checkable.
# ---------------------------------------------------------------------------

def q_embed_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import lsh_near_duplicates

    emb = load(spark, sf_dir, "embeddings")
    dups = emb.filter(F.col("vec_id") < 50).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform(F.col("embedding"), lambda x: x * F.lit(1.01)).alias(
            "embedding"
        ),
    )
    return lsh_near_duplicates(
        emb.select("vec_id", "embedding").unionByName(dups),
        threshold=0.99,
    )


def _neardup_oracle() -> str:
    from .queries_corpus import _DUCK_COS, _LSH_DIM, _LSH_PLANES

    planes = []
    for p in range(_LSH_PLANES):
        comps = ", ".join(
            f"CASE WHEN substring(md5('{p}-{d}'), 1, 1) >= '8' THEN 1.0 ELSE -1.0 END"
            for d in range(_LSH_DIM)
        )
        planes.append(
            f"CASE WHEN list_dot_product(embedding::DOUBLE[], [{comps}]) >= 0 "
            f"THEN '1' ELSE '0' END"
        )
    bucket = " || ".join(planes)
    return f"""
WITH uni AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 100000 AS vec_id,
         list_transform(embedding, x -> x * 1.01) AS embedding
  FROM embeddings WHERE vec_id < 50
),
withb AS (SELECT vec_id, embedding, {bucket} AS bucket FROM uni),
pairs AS (
  SELECT a.vec_id AS dup_of, b.vec_id AS doc_id, {_DUCK_COS} AS cosine_sim
  FROM withb a JOIN withb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
)
SELECT doc_id, MIN(dup_of) AS dup_of,
       ROUND(arg_min(cosine_sim, dup_of), 6) AS cosine_sim
FROM pairs WHERE cosine_sim >= 0.99
GROUP BY doc_id
"""


O_EMBED_NEARDUP = _neardup_oracle()


# ---------------------------------------------------------------------------
# metricstarttime: subtract_initial_point strategy
# (processor/metricstarttimeprocessor README)
# ---------------------------------------------------------------------------

def q_metricstarttime(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.metricstarttime import metric_start_time

    ev = load(spark, sf_dir, "events")
    series = ev.select(
        F.col("event_type").alias("metric_name"),
        "ts",
        "value",
        "event_id",
    )
    out = metric_start_time(
        series,
        series_cols=["metric_name"],
        strategy="subtract_initial_point",
        order_cols=["event_id"],
    )
    return out.select(
        "metric_name", "event_id",
        F.round(F.col("value"), 6).alias("value"),
        F.col("start_ts"),
    )


O_METRICSTARTTIME = """
WITH w AS (
  SELECT event_type AS metric_name, ts, value, event_id,
         first_value(value) OVER win AS first_val,
         first_value(ts) OVER win AS start_ts,
         row_number() OVER win AS rn
  FROM events
  WINDOW win AS (PARTITION BY event_type ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT metric_name, event_id, ROUND(value - first_val, 6) AS value, start_ts
FROM w WHERE rn > 1
"""


# ---------------------------------------------------------------------------
# remotetap: rate-limited tee (processor/remotetapprocessor README)
# ---------------------------------------------------------------------------

def q_remote_tap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.filter import remote_tap

    ev = load(spark, sf_dir, "events")
    return remote_tap(
        ev.select("event_id", "ts", "event_type"),
        limit_per_sec=2,
        order_cols=["event_id"],
    )


O_REMOTE_TAP = """
SELECT event_id, ts, event_type FROM (
  SELECT event_id, ts, event_type,
         row_number() OVER (PARTITION BY date_trunc('second', ts)
                            ORDER BY event_id) AS rn
  FROM events
) WHERE rn <= 2
"""


# ---------------------------------------------------------------------------
# spanmetrics exemplars: up to K trace exemplars per histogram bucket
# (spanmetricsconnector exemplars config: attach sampled trace ids to
# each bucket so dashboards can jump metric -> trace; deterministic
# form keeps the K smallest ids)
# ---------------------------------------------------------------------------

def q_exemplars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket counts + K=2 smallest event ids per bucket.  The
    exemplar ids come from :func:`k_smallest_exemplars` (salted
    two-level row_number, O(K) state) — NOT a collect_list over the
    bucket, which would buffer a hot bucket's entire id set in one
    aggregation buffer at 100 TB.  Counts stay a separate map-side-
    combined aggregate; both sides of the final join are
    |event_types| x |buckets| rows."""
    from ..operators.aggregate import bucket_index, k_smallest_exemplars

    ev = load(spark, sf_dir, "events")
    buckets = [10.0, 50.0, 100.0, 200.0]
    bucketed = ev.withColumn(
        "bucket_idx", bucket_index(F.col("value"), buckets)
    )
    counts = bucketed.groupBy("event_type", "bucket_idx").agg(
        F.count(F.lit(1)).alias("bucket_count")
    )
    exemplars = k_smallest_exemplars(
        bucketed, ["event_type", "bucket_idx"], "event_id", k=2
    )
    return (
        counts.join(exemplars, ["event_type", "bucket_idx"], "left")
        .select(
            "event_type", "bucket_idx", "bucket_count",
            F.col("exemplar_ids").cast("array<string>").alias("exemplar_ids"),
        )
    )


O_EXEMPLARS = """
SELECT event_type,
       CASE WHEN value <= 10 THEN 0 WHEN value <= 50 THEN 1
            WHEN value <= 100 THEN 2 WHEN value <= 200 THEN 3
            ELSE 4 END AS bucket_idx,
       COUNT(*) AS bucket_count,
       list_transform(list_slice(list_sort(list(event_id)), 1, 2),
                      x -> CAST(x AS VARCHAR)) AS exemplar_ids
FROM events
GROUP BY 1, 2
"""


EXT4_QUERIES: dict[str, QueryFn] = {
    "schema_semconv": q_schema_semconv,
    "sqlquery_logs": q_sqlquery_logs,
    "signaltometrics_sum": q_signaltometrics_sum,
    "signaltometrics_hist": q_signaltometrics_hist,
    "signaltometrics_gauge": q_signaltometrics_gauge,
    "span_rename": q_span_rename,
    "span_extract": q_span_extract,
    "metricstransform": q_metricstransform,
    "embed_neardup": q_embed_neardup,
    "metricstarttime": q_metricstarttime,
    "remote_tap": q_remote_tap,
    "exemplars": q_exemplars,
}

EXT4_ORACLES: dict[str, str] = {
    "schema_semconv": O_SCHEMA_SEMCONV,
    "sqlquery_logs": O_SQLQUERY_LOGS,
    "signaltometrics_sum": O_S2M_SUM,
    "signaltometrics_hist": O_S2M_HIST,
    "signaltometrics_gauge": O_S2M_GAUGE,
    "span_rename": O_SPAN_RENAME,
    "span_extract": O_SPAN_EXTRACT,
    "metricstransform": O_METRICSTRANSFORM,
    "embed_neardup": O_EMBED_NEARDUP,
    "metricstarttime": O_METRICSTARTTIME,
    "remote_tap": O_REMOTE_TAP,
    "exemplars": O_EXEMPLARS,
}

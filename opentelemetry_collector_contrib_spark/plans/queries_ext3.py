"""Round-2 extension batch: OTTL context-prefixed statement pipeline,
exponential histogram, alertsgen completion (absent / rate + select
regexes + storm limit + dedup fingerprint), tail-sampling named
policies, isolation-forest scoring, dedicated resource-processor /
dnslookup / scope-parser queries, multi-table LSH ANN.

Every query has a DuckDB oracle with identical column aliases
(driver contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import transform as TR
from ..operators.aggregate import (
    alert_absent,
    alert_fingerprint,
    alert_select,
    alert_windows,
    exponential_histogram,
    storm_limit,
)
from ..operators.enrich import broadcast_enrich
from ..operators.filter import (
    policy_and,
    policy_numeric_attribute,
    policy_or,
    policy_string_attribute,
    tail_sampler,
)
from ..operators.ml import build_forest, forest_case_sql, score_with_forest
from ..operators.similarity import lsh_bucket_topk_multi
from .base import QueryFn, load


# ---------------------------------------------------------------------------
# OTTL compiled statements with context-prefixed paths
# (pkg/ottl/context_inferrer.go + contexts/ottllog path table)
# ---------------------------------------------------------------------------

def q_ottl_contexts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """transformprocessor statement list exercising context prefixes:
    resource-context set, cross-context read, glob replace_match, and
    flatten with prefix — the statement shapes every real reference
    config uses (``resource.attributes["k"]``, ``log.body``)."""
    from ..functions.ottl_compiler import compile_statements, infer_context

    ev = load(spark, sf_dir, "events")
    record = ev.select(
        "event_id",
        F.col("props").alias("body"),
        F.create_map(
            F.lit("etype"), F.col("event_type"),
            F.lit("path"), F.concat(F.lit("/api/"), F.col("event_type")),
        ).alias("attributes"),
        F.create_map(
            F.lit("host.name"),
            F.concat(F.lit("host-"), (F.col("user_id") % 10).cast("string")),
        ).alias("resource"),
        F.when(F.col("event_type") == "error", 17).otherwise(9).alias("severity_number"),
    )
    stmts = [
        'set(resource.attributes["env"], "prod") where log.severity_number >= 17',
        'set(attributes["host"], resource.attributes["host.name"])',
        'replace_match(attributes["path"], "/api/p*", "masked")',
        'flatten(attributes, "log")',
    ]
    assert infer_context(stmts) == "log"
    out = compile_statements(stmts)(record)
    return out.select(
        "event_id",
        F.element_at("attributes", F.lit("log.host")).alias("host"),
        F.element_at("attributes", F.lit("log.path")).alias("path"),
        F.element_at("resource", F.lit("env")).alias("env"),
    )


O_OTTL_CONTEXTS = """
SELECT event_id,
       'host-' || CAST(user_id % 10 AS VARCHAR) AS host,
       CASE WHEN event_type LIKE 'p%' THEN 'masked'
            ELSE '/api/' || event_type END AS path,
       CASE WHEN event_type = 'error' THEN 'prod' END AS env
FROM events
"""


# ---------------------------------------------------------------------------
# exponential histogram (spanmetrics exp-histogram,
# spanmetricsconnector/internal/metrics/metrics.go:37-77)
# ---------------------------------------------------------------------------

def q_exp_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return exponential_histogram(ev, "value", ["event_type"], scale=0).orderBy(
        "event_type", "bucket_idx"
    )


O_EXP_HISTOGRAM = """
SELECT event_type,
       CAST(ceil(round(log2(value), 9)) - 1 AS INT) AS bucket_idx,
       count(*) AS bucket_count
FROM events WHERE value > 0
GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# alertsgen: absent_over_time (rules.go:128-132)
# ---------------------------------------------------------------------------

def q_alert_absent(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    groups = ev.select("event_type").distinct()
    return alert_absent(ev, ["event_type"], groups, window="1 hour").orderBy(
        "window_start", "event_type"
    )


O_ALERT_ABSENT = """
WITH wins AS (
  SELECT DISTINCT time_bucket(INTERVAL '1 hour', ts) AS window_start FROM events
),
grp AS (SELECT DISTINCT event_type FROM events),
observed AS (
  SELECT DISTINCT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type
  FROM events
)
SELECT w.window_start, g.event_type
FROM wins w CROSS JOIN grp g
ANTI JOIN observed o
  ON o.window_start = w.window_start AND o.event_type = g.event_type
ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# alertsgen: rate_over_time + select regex + storm limit + fingerprint
# (rules.go:196-207 rate, :95-101 select, storm/limiter.go, :514
# fingerprint)
# ---------------------------------------------------------------------------

_RATE_THRESHOLD = 5


def q_alert_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    # label-select regex: the rule only watches error/purchase series
    selected = alert_select(ev, {"event_type": "^(error|purchase)$"})
    windowed = alert_windows(
        selected, ["event_type"], window="1 hour",
        exprs={"rate": F.count(F.lit(1)).cast("double")},
    )
    fired = windowed.filter(F.col("rate") > _RATE_THRESHOLD)
    capped = storm_limit(
        fired, max_per_minute=1, ts_col="window_start", order_cols=["event_type"]
    )
    return capped.select(
        "window_start",
        "event_type",
        "rate",
        alert_fingerprint(capped, "high_rate", ["event_type"]).alias("fingerprint"),
    ).orderBy("window_start", "event_type")


O_ALERT_RATE = f"""
WITH windowed AS (
  SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
         event_type,
         CAST(count(*) AS DOUBLE) AS rate
  FROM events
  WHERE regexp_matches(event_type, '^(error|purchase)$')
  GROUP BY 1, 2
),
fired AS (SELECT * FROM windowed WHERE rate > {_RATE_THRESHOLD}),
capped AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
      PARTITION BY date_trunc('minute', window_start)
      ORDER BY window_start, event_type) AS rn
    FROM fired
  ) WHERE rn <= 1
)
SELECT window_start, event_type, rate,
       md5('high_rate' || chr(31) || 'event_type' || chr(31) || event_type)
         AS fingerprint
FROM capped ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# tail sampling with named policies (tailsamplingprocessor
# internal/sampling: string_attribute, numeric_attribute, and/or)
# ---------------------------------------------------------------------------

def q_tail_policies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite policy over user-session groups (trace analog):
    (string_attribute[error] AND numeric_attribute value>=300)
    OR md5-consistent 25% probabilistic — each group decides as a
    whole, then rows of kept groups pass (processor.go decision +
    release). The probabilistic policy hashes the GROUP key with md5
    (engine-portable; probabilistic.go hashes the trace id)."""
    ev = load(spark, sf_dir, "events")
    prob25 = (
        F.substring(F.md5(F.first(F.col("user_id")).cast("string")), 1, 1) >= "c"
    )
    keep = policy_or(
        policy_and(
            policy_string_attribute("event_type", ["error"]),
            policy_numeric_attribute("value", 300.0, 1e9),
        ),
        prob25,
    )
    sampled = tail_sampler(ev, "user_id", keep)
    return sampled.select("event_id", "user_id", "event_type").orderBy("event_id")


O_TAIL_POLICIES = """
SELECT event_id, user_id, event_type FROM events
WHERE user_id IN (
  SELECT user_id FROM events GROUP BY user_id
  HAVING (max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) = 1
          AND max(CASE WHEN value >= 300.0 AND value <= 1e9 THEN 1 ELSE 0 END) = 1)
      OR substring(md5(CAST(user_id AS VARCHAR)), 1, 1) >= 'c'
)
ORDER BY event_id
"""


# ---------------------------------------------------------------------------
# isolation-forest scoring (processor/isolationforestprocessor)
# ---------------------------------------------------------------------------

_FOREST = build_forest(
    feature_ranges=[(0.0, 500.0), (0.0, 100.0)], num_trees=4, max_depth=3
)


def q_isoforest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").withColumn(
        "f2", (F.col("event_id") % 100).cast("double")
    )
    scored = score_with_forest(ev, _FOREST, ["value", "f2"])
    return scored.select("event_id", "anomaly_score").orderBy("event_id")


O_ISOFOREST = f"""
SELECT event_id,
       {forest_case_sql(_FOREST, ["value", "CAST(event_id % 100 AS DOUBLE)"])}
         AS anomaly_score
FROM events ORDER BY event_id
"""


# ---------------------------------------------------------------------------
# resource processor (dedicated): ordered actions over the resource map
# (processor/resourceprocessor -> attraction action list)
# ---------------------------------------------------------------------------

def q_resource_processor(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    rec = ev.select(
        "event_id",
        F.create_map(
            F.lit("service.name"), F.col("event_type"),
            F.lit("uid"), F.col("user_id").cast("string"),
        ).alias("resource"),
    )
    r = F.col("resource")
    # ordered action list: INSERT cloud.region (absent -> set),
    # UPSERT service.name prefix, DELETE uid, HASH-like derived attr
    r1 = TR.map_insert(r, "cloud.region", F.lit("us-east-1"))
    rec = rec.withColumn("resource", r1)
    r2 = TR.map_set(F.col("resource"), "service.name",
                    F.concat(F.lit("svc/"), F.element_at(F.col("resource"), "service.name")))
    rec = rec.withColumn("resource", r2)
    rec = rec.withColumn("resource", TR.map_delete_key(F.col("resource"), "uid"))
    return rec.select(
        "event_id",
        F.element_at("resource", F.lit("service.name")).alias("service_name"),
        F.element_at("resource", F.lit("cloud.region")).alias("cloud_region"),
        F.size("resource").alias("n_attrs"),
    )


O_RESOURCE_PROCESSOR = """
SELECT event_id,
       'svc/' || event_type AS service_name,
       'us-east-1' AS cloud_region,
       2 AS n_attrs
FROM events
"""


# ---------------------------------------------------------------------------
# dnslookup processor (dedicated): hostname -> IP broadcast dim,
# insert-if-absent (processor/dnslookupprocessor)
# ---------------------------------------------------------------------------

def q_dnslookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").withColumn(
        "hostname", F.concat(F.lit("host-"), (F.col("user_id") % 10).cast("string"))
    )
    dim = spark.range(10).select(
        F.concat(F.lit("host-"), F.col("id").cast("string")).alias("hostname"),
        F.concat(F.lit("10.0.0."), F.col("id").cast("string")).alias("ip"),
    )
    out = broadcast_enrich(ev, dim, on="hostname")
    return out.select("event_id", "hostname", "ip")


O_DNSLOOKUP = """
SELECT event_id,
       'host-' || CAST(user_id % 10 AS VARCHAR) AS hostname,
       '10.0.0.' || CAST(user_id % 10 AS VARCHAR) AS ip
FROM events
"""


# ---------------------------------------------------------------------------
# scope parser (stanza operator/parser/scope): set scope_name from a
# parsed field
# ---------------------------------------------------------------------------

def q_scope_parser(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    k = F.from_json(F.col("props"), "k int")["k"]
    return ev.select(
        "event_id",
        F.concat(F.lit("lib."), (k % 4).cast("string")).alias("scope_name"),
    )


O_SCOPE_PARSER = """
SELECT event_id,
       'lib.' || CAST(CAST(json_extract(props, '$.k') AS INT) % 4 AS VARCHAR)
         AS scope_name
FROM events
"""


# ---------------------------------------------------------------------------
# multi-table LSH ANN (OR-amplified recall)
# ---------------------------------------------------------------------------

_MT_PLANES, _MT_TABLES, _MT_DIM = 6, 2, 64


def q_lsh_ann_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    return lsh_bucket_topk_multi(
        emb, dim=_MT_DIM, num_planes=_MT_PLANES, num_tables=_MT_TABLES, k=1
    )


def _mt_oracle() -> str:
    duck_cos = (
        "round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) / "
        "(sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) * "
        "sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 6)"
    )

    def bucket(offset: int) -> str:
        planes = []
        for p in range(offset, offset + _MT_PLANES):
            comps = ", ".join(
                f"CASE WHEN substring(md5('{p}-{d}'), 1, 1) >= '8' THEN 1.0 ELSE -1.0 END"
                for d in range(_MT_DIM)
            )
            planes.append(
                f"CASE WHEN list_dot_product(embedding::DOUBLE[], [{comps}]) >= 0 "
                f"THEN '1' ELSE '0' END"
            )
        return " || ".join(planes)

    tables = []
    for t in range(_MT_TABLES):
        tables.append(
            f"SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id "
            f"FROM (SELECT vec_id, {bucket(t * _MT_PLANES)} AS bucket FROM embeddings) a "
            f"JOIN (SELECT vec_id, {bucket(t * _MT_PLANES)} AS bucket FROM embeddings) b "
            f"ON a.bucket = b.bucket AND a.vec_id != b.vec_id"
        )
    union = " UNION ".join(f"({t})" for t in tables)
    return f"""
WITH cands AS ({union})
SELECT query_id, neighbor_id, cosine_sim, rank FROM (
  SELECT c.query_id, c.neighbor_id,
         {duck_cos} AS cosine_sim,
         row_number() OVER (PARTITION BY c.query_id
                            ORDER BY {duck_cos} DESC, c.neighbor_id) AS rank
  FROM cands c
  JOIN embeddings a ON a.vec_id = c.query_id
  JOIN embeddings b ON b.vec_id = c.neighbor_id
) WHERE rank <= 1
"""


O_LSH_ANN_MULTI = _mt_oracle()


EXT3_QUERIES: dict[str, QueryFn] = {
    "ottl_contexts": q_ottl_contexts,
    "exp_histogram": q_exp_histogram,
    "alert_absent": q_alert_absent,
    "alert_rate": q_alert_rate,
    "tail_policies": q_tail_policies,
    "isoforest_score": q_isoforest,
    "resource_processor": q_resource_processor,
    "dnslookup": q_dnslookup,
    "scope_parser": q_scope_parser,
    "lsh_ann_multi": q_lsh_ann_multi,
}

EXT3_ORACLES: dict[str, str] = {
    "ottl_contexts": O_OTTL_CONTEXTS,
    "exp_histogram": O_EXP_HISTOGRAM,
    "alert_absent": O_ALERT_ABSENT,
    "alert_rate": O_ALERT_RATE,
    "tail_policies": O_TAIL_POLICIES,
    "isoforest_score": O_ISOFOREST,
    "resource_processor": O_RESOURCE_PROCESSOR,
    "dnslookup": O_DNSLOOKUP,
    "scope_parser": O_SCOPE_PARSER,
    "lsh_ann_multi": O_LSH_ANN_MULTI,
}

"""Round-4 vendor-semantics queries: coralogix transaction
attribution (span-tree walk, recursive-CTE oracle) + datadog
semantic-attribute derivation.

The span fixture is a deterministic binary tree per trace: trace =
``tr<user_id>``, spans indexed by ``row_number`` over event order,
parent of span i is span i//2 — so the oracle can reconstruct every
parent pointer arithmetically and replay the tree walk with a
recursive CTE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .base import QueryFn, load


def _span_fixture(ev: DataFrame) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("event_id")
    idx = F.row_number().over(w)
    tr = F.concat(F.lit("tr"), F.col("user_id").cast("string"))
    df = ev.select(
        "event_id", "user_id", "event_type", tr.alias("trace_id"),
        idx.alias("idx"),
    )
    span = F.concat(F.col("trace_id"), F.lit("-s"), F.col("idx").cast("string"))
    parent = F.when(
        F.col("idx") > 1,
        F.concat(
            F.col("trace_id"), F.lit("-s"),
            F.floor(F.col("idx") / 2).cast("string"),
        ),
    )
    kind = (
        F.when(F.col("idx") % 7 == 0, "server")
        .when(F.col("idx") % 5 == 0, "consumer")
        .when(F.col("idx") % 3 == 0, "client")
        .otherwise("internal")
    )
    return df.select(
        "trace_id",
        span.alias("span_id"),
        parent.alias("parent_span_id"),
        F.concat(F.lit("op-"), F.col("event_type")).alias("name"),
        kind.alias("kind"),
    )


_SQL_SPANS = """
s AS (
  SELECT 'tr' || CAST(user_id AS VARCHAR) AS trace_id,
         row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS idx,
         event_type
  FROM events
),
spans AS (
  SELECT trace_id,
         trace_id || '-s' || CAST(idx AS VARCHAR) AS span_id,
         CASE WHEN idx > 1
              THEN trace_id || '-s' || CAST(idx // 2 AS VARCHAR) END AS parent_id,
         'op-' || event_type AS name,
         CASE WHEN idx % 7 = 0 THEN 'server'
              WHEN idx % 5 = 0 THEN 'consumer'
              WHEN idx % 3 = 0 THEN 'client'
              ELSE 'internal' END AS kind
  FROM s
)
"""


def q_coralogix_txn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.vendor_semantics import coralogix_transactions

    spans = _span_fixture(load(spark, sf_dir, "events"))
    return coralogix_transactions(spans, rounds=6)


O_CORALOGIX = f"""
WITH RECURSIVE {_SQL_SPANS},
walk AS (
  SELECT trace_id, span_id, name AS txn, TRUE AS is_root
  FROM spans
  WHERE parent_id IS NULL OR kind IN ('server', 'consumer')
  UNION ALL
  SELECT sp.trace_id, sp.span_id, w.txn, FALSE
  FROM spans sp JOIN walk w
    ON sp.parent_id = w.span_id AND sp.trace_id = w.trace_id
  WHERE sp.parent_id IS NOT NULL AND sp.kind NOT IN ('server', 'consumer')
)
SELECT trace_id, span_id, txn, is_root FROM walk
"""


def q_datadog_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.vendor_semantics import datadog_semantics

    ev = load(spark, sf_dir, "events")
    attrs = ev.select(
        "event_id",
        F.when(
            F.col("user_id") % 10 != 0,
            F.concat(F.lit("svc-"), (F.col("user_id") % 5).cast("string")),
        ).alias("service_name"),
        F.when(
            F.col("user_id") % 4 != 0,
            F.concat(F.lit("v1."), (F.col("user_id") % 3).cast("string")),
        ).alias("service_version"),
        F.when(F.col("user_id") % 2 == 0, F.lit("prod")).alias("deployment_env"),
        F.when(F.col("event_id") % 3 == 0, "SERVER").otherwise("Client").alias("kind"),
        F.when(F.col("event_type") == "error", "error").otherwise("ok").alias(
            "status_code"
        ),
        F.when(
            F.col("user_id") % 2 == 0,
            F.concat(F.lit("boom "), (F.col("event_id") % 7).cast("string")),
        ).otherwise(F.lit("")).alias("status_message"),
        F.when(
            F.col("event_id") % 2 == 0,
            F.concat(F.lit("exc "), (F.col("event_id") % 5).cast("string")),
        ).alias("exception_message"),
        F.when(F.col("event_id") % 2 == 0, F.lit("ValueError")).alias(
            "exception_type"
        ),
        F.when(
            F.col("user_id") % 3 == 0, (F.lit(500) + F.col("user_id") % 3)
        ).alias("http_status_code"),
        F.when(
            F.col("event_id") % 6 == 0,
            F.concat(F.lit("sha"), (F.col("event_id") % 100).cast("string")),
        ).alias("vcs_revision"),
        F.when(
            F.col("event_id") % 4 == 0, F.lit("https://example.com/org/repo")
        ).otherwise(F.lit("example.com/raw")).alias("vcs_repo_url"),
    )
    out = datadog_semantics(attrs, override=True)
    return out.select(
        "event_id", "datadog_version", "datadog_service", "datadog_env",
        "datadog_span_kind", "git_commit_sha", "git_repository_url",
        "datadog_http_status_code", "datadog_error", "datadog_error_msg",
        "datadog_error_type",
    )


O_DATADOG = """
WITH a AS (
  SELECT event_id,
         CASE WHEN user_id % 10 != 0
              THEN 'svc-' || CAST(user_id % 5 AS VARCHAR) END AS service_name,
         CASE WHEN user_id % 4 != 0
              THEN 'v1.' || CAST(user_id % 3 AS VARCHAR) END AS service_version,
         CASE WHEN user_id % 2 = 0 THEN 'prod' END AS deployment_env,
         CASE WHEN event_id % 3 = 0 THEN 'SERVER' ELSE 'Client' END AS kind,
         event_type = 'error' AS is_err,
         CASE WHEN user_id % 2 = 0
              THEN 'boom ' || CAST(event_id % 7 AS VARCHAR) ELSE '' END AS status_message,
         CASE WHEN event_id % 2 = 0
              THEN 'exc ' || CAST(event_id % 5 AS VARCHAR) END AS exception_message,
         CASE WHEN event_id % 2 = 0 THEN 'ValueError' END AS exception_type,
         CASE WHEN user_id % 3 = 0 THEN 500 + user_id % 3 END AS http_status_code,
         CASE WHEN event_id % 6 = 0
              THEN 'sha' || CAST(event_id % 100 AS VARCHAR) END AS vcs_revision,
         CASE WHEN event_id % 4 = 0 THEN 'https://example.com/org/repo'
              ELSE 'example.com/raw' END AS vcs_repo_url
  FROM events
)
SELECT event_id,
       coalesce(service_version, '') AS datadog_version,
       coalesce(service_name, 'otlpresourcenoservicename') AS datadog_service,
       coalesce(deployment_env, 'default') AS datadog_env,
       lower(kind) AS datadog_span_kind,
       vcs_revision AS git_commit_sha,
       regexp_replace(vcs_repo_url, '^[A-Za-z][A-Za-z0-9+.-]*://', '')
         AS git_repository_url,
       CAST(http_status_code AS VARCHAR) AS datadog_http_status_code,
       CAST(is_err AS INT) AS datadog_error,
       CASE WHEN is_err THEN coalesce(
           exception_message,
           CASE WHEN status_message != '' THEN status_message END,
           CAST(http_status_code AS VARCHAR)) END AS datadog_error_msg,
       CASE WHEN is_err THEN exception_type END AS datadog_error_type
FROM a
"""


EXT11_QUERIES: dict[str, QueryFn] = {
    "coralogix_txn": q_coralogix_txn,
    "datadog_semantics": q_datadog_semantics,
}

EXT11_ORACLES: dict[str, str] = {
    "coralogix_txn": O_CORALOGIX,
    "datadog_semantics": O_DATADOG,
}


# ---------------------------------------------------------------------------
# sumologic semantics (cloud namespace -> translate -> loglevel)
# ---------------------------------------------------------------------------

def q_sumologic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.vendor_semantics import sumologic_semantics

    ev = load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    platform = (
        F.when(u % 3 == 0, "aws_ec2")
        .when(u % 3 == 1, "aws_ecs")
        .otherwise("gcp_app_engine")
    )
    base = F.create_map(
        F.lit("service.name"), F.concat(F.lit("svc"), (u % 3).cast("string")),
        F.lit("host.name"), F.concat(F.lit("h"), (u % 4).cast("string")),
        F.lit("cloud.platform"), platform,
    )
    with_existing = F.when(
        u % 5 == 0,
        F.map_concat(base, F.create_map(F.lit("service"), F.lit("preexisting"))),
    ).otherwise(base)
    attrs = F.when(
        e % 2 == 0,
        F.map_concat(
            with_existing,
            F.create_map(F.lit("k8s.pod.name"), F.concat(F.lit("p"), (e % 7).cast("string"))),
        ),
    ).otherwise(with_existing)
    src = ev.select(
        "event_id", attrs.alias("attrs"), (e % 25).cast("int").alias("severity_number")
    )
    out = sumologic_semantics(src)
    canon = F.concat_ws(
        ",",
        F.array_sort(
            F.transform(
                F.map_entries(F.col("attrs")),
                lambda kv: F.concat(kv["key"], F.lit("="), kv["value"]),
            )
        ),
    )
    return out.select("event_id", canon.alias("attrs_str"), "loglevel")


def _sumo_levels_sql() -> str:
    levels = ["UNSPECIFIED"]
    for name in ("TRACE", "DEBUG", "INFO", "WARN", "ERROR", "FATAL"):
        levels += [name, f"{name}2", f"{name}3", f"{name}4"]
    return "[" + ", ".join(f"'{x}'" for x in levels) + "]"


O_SUMOLOGIC = f"""
WITH a AS (
  SELECT event_id,
         'svc' || CAST(user_id % 3 AS VARCHAR) AS svc,
         'h' || CAST(user_id % 4 AS VARCHAR) AS host,
         CASE WHEN user_id % 3 = 0 THEN 'aws_ec2'
              WHEN user_id % 3 = 1 THEN 'aws_ecs'
              ELSE 'gcp_app_engine' END AS platform,
         user_id % 5 = 0 AS has_existing,
         CASE WHEN event_id % 2 = 0
              THEN 'p' || CAST(event_id % 7 AS VARCHAR) END AS pod,
         CAST(event_id % 25 AS INT) AS sev
  FROM events
)
SELECT event_id,
       array_to_string(list_sort(list_filter([
         CASE WHEN has_existing THEN 'service.name=' || svc
              ELSE 'service=' || svc END,
         CASE WHEN has_existing THEN 'service=preexisting' END,
         'host=' || host,
         'aws_service=' || platform,
         CASE WHEN platform = 'aws_ec2' THEN 'cloud.namespace=aws/ec2'
              WHEN platform = 'aws_ecs' THEN 'cloud.namespace=ecs' END,
         CASE WHEN pod IS NOT NULL THEN 'pod=' || pod END
       ], x -> x IS NOT NULL)), ',') AS attrs_str,
       ({_sumo_levels_sql()})[sev + 1] AS loglevel
FROM a
"""


EXT11_QUERIES["sumologic_semantics"] = q_sumologic
EXT11_ORACLES["sumologic_semantics"] = O_SUMOLOGIC


# ---------------------------------------------------------------------------
# collectd receiver (JSON payload -> per-value metric rows)
# ---------------------------------------------------------------------------

def q_collectd(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.receivers import collectd_parse

    ev = load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    t = (F.lit(1700000000) + u).cast("string")
    # every 9th record is an EVENT (skipped by the reference); even
    # event_ids carry a two-value if_octets record, odd a single gauge
    event_body = F.concat(
        F.lit('[{"time":'), t,
        F.lit('.25,"severity":"warning","message":"ev '),
        e.cast("string"), F.lit('"}]'),
    )
    multi_body = F.concat(
        F.lit('[{"time":'), t, F.lit('.25,"host":"h'), (u % 4).cast("string"),
        F.lit('","plugin":"interface","plugin_instance":"eth0",'
              '"type":"if_octets","type_instance":"'), F.col("event_type"),
        F.lit('","dstypes":["derive","gauge"],"dsnames":["rx","tx"],'
              '"values":['), (u % 100).cast("string"), F.lit(","),
        (e % 50).cast("string"), F.lit(".5]}]"),
    )
    single_body = F.concat(
        F.lit('[{"time":'), t, F.lit('.25,"host":"h'), (u % 4).cast("string"),
        F.lit('","plugin":"cpu","type":"load","type_instance":"",'
              '"dstypes":["gauge"],"dsnames":["value"],"values":['),
        (u % 10).cast("string"), F.lit("]}]"),
    )
    body = (
        F.when(e % 9 == 0, event_body)
        .when(e % 2 == 0, multi_body)
        .otherwise(single_body)
    )
    out = collectd_parse(ev.select("event_id", body.alias("body")))
    return out.filter(F.col("cd_parse_ok") & ~F.col("cd_is_event")).select(
        "event_id", "cd_name", "cd_kind", "cd_value", "cd_value_is_int",
        "cd_host", "cd_plugin", "cd_dsname", "cd_ts_ns",
    )


O_COLLECTD = """
WITH base AS (
  SELECT event_id, user_id, event_type,
         -- replay the reference's float64 time->ns conversion
         -- (collectd.go:50 int64(1e9 * time)): same IEEE product,
         -- truncated — NOT exact integer ns
         CAST(trunc((1700000000 + user_id + 0.25) * 1e9) AS BIGINT) AS tsns,
         'h' || CAST(user_id % 4 AS VARCHAR) AS host,
         CAST(user_id % 100 AS BIGINT) AS rx,
         CAST(event_id % 50 AS BIGINT) AS tx,
         CAST(user_id % 10 AS BIGINT) AS lv
  FROM events WHERE event_id % 9 != 0
)
SELECT event_id,
       'if_octets.' || event_type || '.rx' AS cd_name,
       'sum' AS cd_kind, CAST(rx AS DOUBLE) AS cd_value,
       TRUE AS cd_value_is_int, host AS cd_host,
       'interface' AS cd_plugin, CAST(NULL AS VARCHAR) AS cd_dsname,
       tsns AS cd_ts_ns
FROM base WHERE event_id % 2 = 0
UNION ALL
SELECT event_id, 'if_octets.' || event_type || '.tx', 'gauge',
       tx + 0.5, FALSE, host, 'interface', NULL, tsns
FROM base WHERE event_id % 2 = 0
UNION ALL
SELECT event_id, 'load', 'gauge', CAST(lv AS DOUBLE), TRUE, host,
       'cpu', 'value', tsns
FROM base WHERE event_id % 2 = 1
"""


# ---------------------------------------------------------------------------
# grafanacloud connector (traces -> per-flush distinct-host gauge)
# ---------------------------------------------------------------------------

def q_grafana_host_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.receivers import grafana_host_info

    ev = load(spark, sf_dir, "events")
    u = F.col("user_id")
    spans = ev.select(
        "ts",
        F.when(u % 2 == 0, F.concat(F.lit("n"), (u % 7).cast("string"))).alias(
            "k8s_node"
        ),
        F.concat(F.lit("h"), (u % 5).cast("string")).alias("host_name"),
    )
    return grafana_host_info(
        spans, host_identifiers=["k8s_node", "host_name"],
        flush_interval="1 hour",
    )


O_GRAFANA_HOST = """
SELECT time_bucket(INTERVAL '1 hour', ts) AS flush_start,
       'traces_host_info' AS metric_name,
       CASE WHEN user_id % 2 = 0 THEN 'n' || CAST(user_id % 7 AS VARCHAR)
            ELSE 'h' || CAST(user_id % 5 AS VARCHAR) END AS grafana_host_id,
       1 AS value,
       count(*) AS spans_seen
FROM events
GROUP BY 1, 3
"""


EXT11_QUERIES["collectd_parser"] = q_collectd
EXT11_ORACLES["collectd_parser"] = O_COLLECTD
EXT11_QUERIES["grafana_host_info"] = q_grafana_host_info
EXT11_ORACLES["grafana_host_info"] = O_GRAFANA_HOST


# ---------------------------------------------------------------------------
# webhookevent receiver (body lines -> records, query/header attrs)
# ---------------------------------------------------------------------------

def q_webhook_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.receivers import webhook_events

    ev = load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    body = F.concat(
        F.lit("line a "), e.cast("string"), F.lit("\nline b "),
        F.col("event_type"),
    )
    query = F.create_map(
        F.lit("source"), F.concat(F.lit("s"), (u % 3).cast("string")),
        F.lit("empty"), F.lit(""),
    )
    headers = F.create_map(
        F.lit("X-Src"), F.concat(F.lit("x"), (u % 2).cast("string")),
        F.lit("Authorization"), F.lit("secret"),
    )
    src = ev.select(
        "event_id", body.alias("body"), query.alias("query"),
        headers.alias("headers"),
    )
    out = webhook_events(src, header_regex="^X-")
    return out.select(
        "event_id", "wh_body", "wh_resource_attrs", "wh_header_attrs"
    )


O_WEBHOOK = """
WITH base AS (
  SELECT event_id,
         'source=s' || CAST(user_id % 3 AS VARCHAR) AS res_attrs,
         'header.X-Src=x' || CAST(user_id % 2 AS VARCHAR) AS hdr_attrs,
         'line a ' || CAST(event_id AS VARCHAR) AS l1,
         'line b ' || event_type AS l2
  FROM events
)
SELECT event_id, l1 AS wh_body, res_attrs AS wh_resource_attrs,
       hdr_attrs AS wh_header_attrs
FROM base
UNION ALL
SELECT event_id, l2, res_attrs, hdr_attrs FROM base
"""


EXT11_QUERIES["webhook_events"] = q_webhook_events
EXT11_ORACLES["webhook_events"] = O_WEBHOOK

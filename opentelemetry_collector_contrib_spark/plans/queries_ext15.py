"""Round-5 queries (cont.): GitLab pipeline-webhook trace translation.

The fixture builds one pipeline webhook JSON per events row,
exercising every branch of ``operators/gitlab.py`` arithmetically so
the DuckDB oracle can replay it: webhook-layout pipeline times +
RFC3339 job times (both parseGitlabTime layouts), the pipeline-name →
commit-title fallback, 0–3 builds across two derived stages
(earliest-start / latest-finish picks), unfinished jobs (no job span
but still stage-timing input), and the whole-event drop ladder (empty
finished_at, "null" created_at, finished job with empty started_at,
a stage in which nothing ever finished). Hash inputs are RAW webhook
strings, so the oracle reconstructs identical strings via
``strftime(make_timestamp(...))`` under the UTC session.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import QueryFn, load

EXT15_QUERIES: dict[str, QueryFn] = {}
EXT15_ORACLES: dict[str, str] = {}


# ---------------------------------------------------------------------------
# gitlab pipeline webhook -> (pipeline | stage | job) trace spans
# ---------------------------------------------------------------------------


def q_gitlab_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.gitlab import gitlab_pipeline_spans

    ev = load(spark, sf_dir, "events")
    e, et = F.col("event_id"), F.col("event_type")
    pid = F.lit(50000) + e
    t0 = F.lit(1714978800) + e % 86400
    hook = lambda s: F.date_format(  # noqa: E731
        F.timestamp_seconds(s), "yyyy-MM-dd HH:mm:ss 'UTC'"
    )
    rfc = lambda s: F.date_format(  # noqa: E731
        F.timestamp_seconds(s), "yyyy-MM-dd'T'HH:mm:ss'Z'"
    )
    fin = F.when(e % 13 == 0, F.lit("")).otherwise(hook(t0 + 600 + e % 300))
    created = F.when(e % 13 == 1, F.lit("null")).otherwise(hook(t0))
    nsteps = (e % 4).cast("int")
    job = lambda i: F.struct(  # noqa: E731
        (F.lit(900000) + e * 4 + i).alias("id"),
        F.concat(F.lit("stg"), ((e + i) % 2).cast("string")).alias("stage"),
        F.lit(f"job_{i}").alias("name"),
        F.when((e + i) % 3 == 0, "success").otherwise("failed")
        .alias("status"),
        hook(t0 - 60).alias("created_at"),
        F.when((e % 17 == 0) & (F.lit(i) == 1), F.lit(""))
        .otherwise(rfc(t0 + i * 10 + (e + i) % 7)).alias("started_at"),
        F.when(
            (e % 17 == 0) & (F.lit(i) == 1),
            rfc(t0 + i * 10 + 60),  # finished-but-never-started -> drop
        ).when((e + i) % 5 == 0, F.lit(""))
        .otherwise(rfc(t0 + i * 10 + 60 + (e * i) % 11))
        .alias("finished_at"),
    )
    body = F.to_json(
        F.struct(
            F.struct(
                pid.alias("id"),
                F.when(e % 5 == 0, F.lit("")).otherwise(
                    F.concat(F.lit("pl-"), et)).alias("name"),
                created.alias("created_at"),
                fin.alias("finished_at"),
            ).alias("object_attributes"),
            F.struct(F.concat(F.lit("c-"), et).alias("title"))
            .alias("commit"),
            F.struct(
                F.concat(F.lit("grp/app"), (e % 6).cast("string"))
                .alias("path_with_namespace")
            ).alias("project"),
            F.slice(F.array(job(1), job(2), job(3)), 1, nsteps)
            .alias("builds"),
        )
    )
    out = gitlab_pipeline_spans(ev.select("event_id", body.alias("body")))
    ok = F.col("gl_ok")
    return out.select(
        "event_id",
        F.when(ok, F.col("gl_trace_id")).alias("gl_trace_id"),
        "gl_span_type", "gl_span_id", "gl_parent_id", "gl_name",
        "gl_start_ns", "gl_end_ns",
        F.when(ok, F.col("gl_service")).alias("gl_service"),
        "gl_ok",
    )


O_GITLAB_SPANS = """
WITH a AS (
  SELECT event_id, event_type,
         50000 + event_id AS pid,
         1714978800 + event_id % 86400 AS t0,
         1714978800 + event_id % 86400 + 600 + event_id % 300 AS tfin,
         CAST(event_id % 4 AS INT) AS nsteps,
         event_id % 13 IN (0, 1) AS bad_times,
         event_id % 17 = 0 AS bad_job,
         'grp/app' || CAST(event_id % 6 AS VARCHAR) AS svc,
         CASE WHEN event_id % 5 = 0 THEN 'c-' || event_type
              ELSE 'pl-' || event_type END AS pname
  FROM events
), jobs AS (
  SELECT a.*, i,
         900000 + event_id * 4 + i AS jid,
         'stg' || CAST((event_id + i) % 2 AS VARCHAR) AS stage,
         'job_' || CAST(i AS VARCHAR) AS jname,
         t0 + i * 10 + (event_id + i) % 7 AS jstart,
         CASE WHEN bad_job AND i = 1 THEN t0 + i * 10 + 60
              WHEN (event_id + i) % 5 = 0 THEN NULL
              ELSE t0 + i * 10 + 60 + (event_id * i) % 11 END AS jfin
  FROM a, UNNEST([1, 2, 3]) AS t(i)
  WHERE i <= nsteps
), stages AS (
  SELECT event_id, stage,
         min(jstart) AS sstart, max(jfin) AS sfin,
         count(jfin) AS nfin
  FROM jobs GROUP BY event_id, stage
), ok_ev AS (
  SELECT a.*
  FROM a
  WHERE NOT bad_times AND NOT (bad_job AND nsteps >= 1)
    AND NOT EXISTS (SELECT 1 FROM stages s
                    WHERE s.event_id = a.event_id AND s.nfin = 0)
), fmt AS (
  SELECT event_id,
         strftime(make_timestamp(tfin * 1000000),
                  '%Y-%m-%d %H:%M:%S') || ' UTC' AS fin_raw,
         t0, tfin, pid, pname, svc
  FROM ok_ev
), ids AS (
  SELECT *,
         substring(sha256(CAST(pid AS VARCHAR) || 't' || fin_raw),
                   1, 32) AS tid,
         substring(sha256(CAST(pid AS VARCHAR) || fin_raw),
                   17, 16) AS psid
  FROM fmt
)
SELECT event_id, tid AS gl_trace_id, 'pipeline' AS gl_span_type,
       psid AS gl_span_id, CAST(NULL AS VARCHAR) AS gl_parent_id,
       pname AS gl_name,
       t0 * CAST(1000000000 AS BIGINT) AS gl_start_ns,
       tfin * CAST(1000000000 AS BIGINT) AS gl_end_ns,
       svc AS gl_service, true AS gl_ok
FROM ids
UNION ALL
SELECT i.event_id, i.tid, 'stage',
       substring(sha256(CAST(i.pid AS VARCHAR) || s.stage
         || strftime(make_timestamp(s.sstart * 1000000),
                     '%Y-%m-%dT%H:%M:%SZ')), 17, 16),
       i.psid, s.stage,
       s.sstart * CAST(1000000000 AS BIGINT),
       s.sfin * CAST(1000000000 AS BIGINT),
       i.svc, true
FROM ids i JOIN stages s ON s.event_id = i.event_id
UNION ALL
SELECT i.event_id, i.tid, 'job',
       substring(sha256(CAST(j.jid AS VARCHAR)
         || strftime(make_timestamp(j.jstart * 1000000),
                     '%Y-%m-%dT%H:%M:%SZ')), 17, 16),
       substring(sha256(CAST(i.pid AS VARCHAR) || j.stage
         || strftime(make_timestamp(s.sstart * 1000000),
                     '%Y-%m-%dT%H:%M:%SZ')), 17, 16),
       j.jname,
       j.jstart * CAST(1000000000 AS BIGINT),
       j.jfin * CAST(1000000000 AS BIGINT),
       i.svc, true
FROM ids i
JOIN jobs j ON j.event_id = i.event_id AND j.jfin IS NOT NULL
JOIN stages s ON s.event_id = i.event_id AND s.stage = j.stage
UNION ALL
SELECT a.event_id, NULL, 'dropped', NULL, NULL, NULL, NULL, NULL,
       NULL, false
FROM a
WHERE bad_times OR (bad_job AND nsteps >= 1)
   OR EXISTS (SELECT 1 FROM stages s
              WHERE s.event_id = a.event_id AND s.nfin = 0)
"""


EXT15_QUERIES["gitlab_pipeline_spans"] = q_gitlab_spans
EXT15_ORACLES["gitlab_pipeline_spans"] = O_GITLAB_SPANS


# ---------------------------------------------------------------------------
# k8sevents: corev1 Event JSON -> log rows (with the allowEvent filter)
# ---------------------------------------------------------------------------


def q_k8s_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.k8sevents import k8s_events_to_logs

    ev = load(spark, sf_dir, "events")
    e, u, et = F.col("event_id"), F.col("user_id"), F.col("event_type")
    t0 = F.lit(1714978800) + e % 997
    rfc = lambda s: F.date_format(  # noqa: E731
        F.timestamp_seconds(s), "yyyy-MM-dd'T'HH:mm:ss'Z'"
    )
    micro = F.date_format(
        F.timestamp_micros(t0 * 1000000 + e % 1000000),
        "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'",
    )
    typ = F.when(e % 7 == 0, "Error").when(e % 2 == 0, "Normal") \
        .otherwise(F.lit("Warning"))
    body = F.to_json(
        F.struct(
            F.struct(
                F.concat(et, F.lit("."), e.cast("string")).alias("name"),
                F.concat(F.lit("uid-"), e.cast("string")).alias("uid"),
                rfc(t0 - 60).alias("creationTimestamp"),
            ).alias("metadata"),
            F.struct(
                F.try_element_at(
                    F.array(F.lit("Pod"), F.lit("Node"),
                            F.lit("Deployment")),
                    (e % 3 + 1).cast("int"),
                ).alias("kind"),
                F.concat(F.lit("obj-"), (u % 50).cast("string"))
                .alias("name"),
                F.when(e % 11 != 0,
                       F.concat(F.lit("ou-"), e.cast("string")))
                .alias("uid"),
                F.lit("spec.containers{app}").alias("fieldPath"),
                F.lit("v1").alias("apiVersion"),
                (e % 100).cast("string").alias("resourceVersion"),
                F.concat(F.lit("ns-"), (u % 5).cast("string"))
                .alias("namespace"),
            ).alias("involvedObject"),
            F.struct(
                F.concat(F.lit("node-"), (u % 8).cast("string"))
                .alias("host")
            ).alias("source"),
            typ.alias("type"),
            F.concat(F.lit("Reason"), (e % 4).cast("string"))
            .alias("reason"),
            F.when(e % 5 != 0, F.lit("Pulling")).alias("action"),
            F.concat(F.lit("msg-"), et).alias("message"),
            (e % 5).cast("int").alias("count"),
            F.when(e % 4 != 0, micro).alias("eventTime"),
            F.when(e % 3 != 0, rfc(t0 + 30)).alias("lastTimestamp"),
            rfc(t0 - 5).alias("firstTimestamp"),
        )
    )
    out = k8s_events_to_logs(
        ev.select("event_id", body.alias("body")),
        start_ts=1714978800 + 500,
    )
    return out


O_K8S_EVENTS = """
WITH a AS (
  SELECT event_id, user_id, event_type,
         1714978800 + event_id % 997 AS t0,
         event_id % 4 <> 0 AS has_evt,
         event_id % 3 <> 0 AS has_last
  FROM events
), b AS (
  SELECT *,
         CASE WHEN has_evt
              THEN (t0 * 1000000 + event_id % 1000000) * 1000
              WHEN has_last THEN (t0 + 30) * CAST(1000000000 AS BIGINT)
              ELSE (t0 - 5) * CAST(1000000000 AS BIGINT)
         END AS ts_ns
  FROM a
)
SELECT event_id,
  ts_ns AS ke_ts_ns,
  'msg-' || event_type AS ke_body,
  CASE WHEN event_id % 7 = 0 THEN 0
       WHEN event_id % 2 = 0 THEN 9 ELSE 13 END AS ke_sev_num,
  CASE WHEN event_id % 7 = 0 THEN NULL
       WHEN event_id % 2 = 0 THEN 'Normal' ELSE 'Warning' END
    AS ke_sev_text,
  'node-' || CAST(user_id % 8 AS VARCHAR) AS ke_node,
  CASE event_id % 3 WHEN 0 THEN 'Pod' WHEN 1 THEN 'Node'
       ELSE 'Deployment' END AS ke_object_kind,
  'obj-' || CAST(user_id % 50 AS VARCHAR) AS ke_object_name,
  CASE WHEN event_id % 11 <> 0 THEN 'ou-' || CAST(event_id AS VARCHAR)
       ELSE '' END AS ke_object_uid,
  'spec.containers{app}' AS ke_object_fieldpath,
  'v1' AS ke_object_api_version,
  CAST(event_id % 100 AS VARCHAR) AS ke_object_resource_version,
  'Reason' || CAST(event_id % 4 AS VARCHAR) AS ke_reason,
  CASE WHEN event_id % 5 <> 0 THEN 'Pulling' ELSE '' END AS ke_action,
  strftime(make_timestamp((t0 - 60) * 1000000), '%Y-%m-%d %H:%M:%S')
    || ' +0000 UTC' AS ke_start_time,
  event_type || '.' || CAST(event_id AS VARCHAR) AS ke_name,
  'uid-' || CAST(event_id AS VARCHAR) AS ke_uid,
  'ns-' || CAST(user_id % 5 AS VARCHAR) AS ke_namespace,
  CASE WHEN event_id % 5 <> 0 THEN CAST(event_id % 5 AS BIGINT) END
    AS ke_count
FROM b
WHERE ts_ns >= (1714978800 + 500) * CAST(1000000000 AS BIGINT)
"""


EXT15_QUERIES["k8s_events"] = q_k8s_events
EXT15_ORACLES["k8s_events"] = O_K8S_EVENTS


# ---------------------------------------------------------------------------
# k8sobjects: watch-event JSON -> log rows (sorted-key variant body)
# ---------------------------------------------------------------------------


def q_k8s_objects_watch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.k8sobjects import k8s_objects_to_logs

    ev = load(spark, sf_dir, "events")
    e, u = F.col("event_id"), F.col("user_id")
    name = F.when(e % 9 == 0, F.lit("")).otherwise(
        F.concat(F.lit("web-"), (e % 100).cast("string")))
    # alphabetical struct order so the input already renders in the
    # sorted form the variant re-render produces
    body = F.to_json(
        F.struct(
            F.struct(
                F.lit("v1").alias("apiVersion"),
                F.try_element_at(
                    F.array(F.lit("Pod"), F.lit("Service")),
                    (e % 2 + 1).cast("int"),
                ).alias("kind"),
                F.struct(
                    name.alias("name"),
                    F.when(e % 6 != 0,
                           F.concat(F.lit("ns-"), (u % 5).cast("string")))
                    .alias("namespace"),
                ).alias("metadata"),
                F.struct((e % 12).alias("replicas")).alias("spec"),
            ).alias("object"),
            F.try_element_at(
                F.array(F.lit("ADDED"), F.lit("MODIFIED"),
                        F.lit("DELETED")),
                (e % 3 + 1).cast("int"),
            ).alias("type"),
        )
    )
    return k8s_objects_to_logs(
        ev.select("event_id", body.alias("body")),
        mode="watch", resource="pods", observed_ts=1714978800,
    )


O_K8S_OBJECTS_WATCH = """
WITH a AS (
  SELECT event_id,
         CASE WHEN event_id % 9 = 0 THEN ''
              ELSE 'web-' || CAST(event_id % 100 AS VARCHAR) END AS nm,
         CASE WHEN event_id % 6 <> 0
              THEN 'ns-' || CAST(user_id % 5 AS VARCHAR) END AS ns,
         CASE event_id % 2 WHEN 0 THEN 'Pod' ELSE 'Service' END AS kind,
         CASE event_id % 3 WHEN 0 THEN 'ADDED' WHEN 1 THEN 'MODIFIED'
              ELSE 'DELETED' END AS typ,
         event_id % 12 AS repl
  FROM events
)
SELECT event_id,
  coalesce(ns, '') AS ko_namespace,
  1714978800 * CAST(1000000000 AS BIGINT) AS ko_observed_ns,
  'pods' AS ko_resource,
  CASE WHEN nm <> '' THEN 'k8s' END AS ko_event_domain,
  CASE WHEN nm <> '' THEN nm END AS ko_event_name,
  '{"object":{"apiVersion":"v1","kind":"' || kind
    || '","metadata":{"name":"' || nm || '"'
    || CASE WHEN ns IS NOT NULL THEN ',"namespace":"' || ns || '"'
       ELSE '' END
    || '},"spec":{"replicas":' || CAST(repl AS VARCHAR)
    || '}},"type":"' || typ || '"}' AS ko_body
FROM a
"""


EXT15_QUERIES["k8s_objects_watch"] = q_k8s_objects_watch
EXT15_ORACLES["k8s_objects_watch"] = O_K8S_OBJECTS_WATCH


# ---------------------------------------------------------------------------
# fluentforward: msgpack Forward events (all three modes) -> log rows
# ---------------------------------------------------------------------------


def _ff_fixture_record(e: int, u: int, i: int) -> dict:
    rec = {
        "message": f"m-{e}-{i}",
        "level": "info" if (e + i) % 2 == 0 else "warn",
        "pid": (e * 7 + i) % 32768,
        "ok": (e + i) % 3 == 0,
        "svc": f"svc-{u % 5}".encode(),
    }
    if (e + i) % 4 == 0:
        rec["extra"] = {"a": (e + i) % 7, "b": "x"}
    return rec


def _ff_fixture_event(e: int, u: int) -> bytes:
    """One deterministic Forward-protocol event per events row."""
    import gzip as _gzip

    from ..operators.fluentforward import EventTime, msgpack_encode

    t0 = 1714978800 + e % 997
    tag = f"app.{e % 10}"
    chunk = {"chunk": f"c{e}"} if e % 4 == 0 else {}
    mode = e % 3
    if mode == 0:  # message
        tv = t0 if e % 2 == 0 else EventTime(t0, (e % 1000) * 1000)
        ev = [tag, tv, _ff_fixture_record(e, u, 0)]
        if chunk:
            ev.append(chunk)
    elif mode == 1:  # forward
        n = (e % 7) % 3 + 1
        ents = []
        for i in range(n):
            tv = (t0 + i if (e + i) % 2 == 0
                  else EventTime(t0 + i, ((e + i) % 1000) * 1000))
            ents.append([tv, _ff_fixture_record(e, u, i)])
        ev = [tag, ents]
        if chunk:
            ev.append(chunk)
    else:  # packedforward
        n = (e % 5) % 3 + 1
        raw = b"".join(
            msgpack_encode([t0 + i, _ff_fixture_record(e, u, i)])
            for i in range(n))
        opts = dict(chunk)
        if e % 2 == 0:
            opts["compressed"] = "gzip"
            raw = _gzip.compress(raw, mtime=0)
        ev = [tag, raw] + ([opts] if opts else [])
    return msgpack_encode(ev)


def q_fluentforward(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    from ..operators.fluentforward import fluent_forward_to_logs

    @pandas_udf("binary")
    def encode(e, u):  # type: ignore[no-untyped-def]
        import pandas as pd

        return pd.Series(
            [_ff_fixture_event(int(a), int(b)) for a, b in zip(e, u)])

    ev = load(spark, sf_dir, "events")
    df = ev.select(
        "event_id", encode(F.col("event_id"), F.col("user_id"))
        .alias("msg"))
    return fluent_forward_to_logs(df)


O_FLUENTFORWARD = """
WITH a AS (
  SELECT event_id AS e, user_id AS u,
         1714978800 + event_id % 997 AS t0,
         event_id % 3 AS mode,
         CASE event_id % 3
              WHEN 0 THEN 1
              WHEN 1 THEN (event_id % 7) % 3 + 1
              ELSE (event_id % 5) % 3 + 1 END AS n
  FROM events
), r AS (
  SELECT a.*, i,
         (e + i) % 4 = 0 AS has_extra,
         CASE WHEN (e + i) % 2 = 0 THEN 'info' ELSE 'warn' END AS lvl,
         (e * 7 + i) % 32768 AS pid,
         (e + i) % 3 = 0 AS ok
  FROM a, UNNEST([0, 1, 2]) AS t(i)
  WHERE i < n
)
SELECT e AS event_id,
  true AS ff_ok,
  CASE mode WHEN 0 THEN 'message' WHEN 1 THEN 'forward'
       ELSE 'packedforward' END AS ff_mode,
  'app.' || CAST(e % 10 AS VARCHAR) AS ff_tag,
  CAST(i AS INT) AS ff_idx,
  CASE
    WHEN mode = 0 AND e % 2 = 0
      THEN t0 * CAST(1000000000 AS BIGINT)
    WHEN mode = 0
      THEN t0 * CAST(1000000000 AS BIGINT) + (e % 1000) * 1000
    WHEN mode = 1 AND (e + i) % 2 = 0
      THEN (t0 + i) * CAST(1000000000 AS BIGINT)
    WHEN mode = 1
      THEN (t0 + i) * CAST(1000000000 AS BIGINT) + ((e + i) % 1000) * 1000
    ELSE (t0 + i) * CAST(1000000000 AS BIGINT)
  END AS ff_ts_ns,
  '"m-' || CAST(e AS VARCHAR) || '-' || CAST(i AS VARCHAR) || '"'
    AS ff_body,
  '{' || CASE WHEN has_extra
          THEN '"extra":{"a":' || CAST((e + i) % 7 AS VARCHAR)
               || ',"b":"x"},'
          ELSE '' END
      || '"fluent.tag":"app.' || CAST(e % 10 AS VARCHAR)
      || '","level":"' || lvl
      || '","ok":' || CASE WHEN ok THEN 'true' ELSE 'false' END
      || ',"pid":' || CAST(pid AS VARCHAR)
      || ',"svc":"svc-' || CAST(u % 5 AS VARCHAR) || '"}' AS ff_attrs,
  CASE WHEN e % 4 = 0 THEN 'c' || CAST(e AS VARCHAR) END AS ff_chunk
FROM r
"""


EXT15_QUERIES["fluentforward_logs"] = q_fluentforward
EXT15_ORACLES["fluentforward_logs"] = O_FLUENTFORWARD


# ---------------------------------------------------------------------------
# mongodbatlas: JSON host logs, 4.2 console logs, audit logs
# ---------------------------------------------------------------------------

_MA_SEVS = ("F", "E", "W", "I", "D", "D1", "D2", "D3", "D4", "Q")


def _ma_ts_parts(e):  # noqa: ANN001 - Column helpers
    """(wall seconds, offset minutes, offset suffix with colon)."""
    t0 = F.lit(1714978800) + e % 997
    off = F.when(e % 3 == 1, 120).when(e % 3 == 2, -330).otherwise(0)
    suff = F.when(e % 3 == 1, "+02:00").when(e % 3 == 2, "-05:30") \
        .otherwise(F.lit("+00:00"))
    return t0, off, suff


def q_mongodb_atlas_logs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.mongodbatlas import mongodb_atlas_logs

    ev = load(spark, sf_dir, "events")
    e, u, et = F.col("event_id"), F.col("user_id"), F.col("event_type")
    t0, _off, suff = _ma_ts_parts(e)
    wall = F.concat(
        F.date_format(F.timestamp_millis(t0 * 1000 + e % 1000),
                      "yyyy-MM-dd'T'HH:mm:ss.SSS"), suff)
    sev = F.try_element_at(F.array(*map(F.lit, _MA_SEVS)),
                           (e % 10 + 1).cast("int"))
    good = F.to_json(
        F.struct(
            F.struct(wall.alias("$date")).alias("t"),
            sev.alias("s"),
            F.try_element_at(
                F.array(F.lit("NETWORK"), F.lit("ACCESS"),
                        F.lit("STORAGE")),
                (e % 3 + 1).cast("int"),
            ).alias("c"),
            (F.lit(20000) + e % 100).alias("id"),
            F.concat(F.lit("conn"), (e % 50).cast("string")).alias("ctx"),
            F.concat(F.lit("msg "), et).alias("msg"),
            F.when(
                e % 4 != 0,
                F.struct((e % 9).alias("a"),
                         F.concat(F.lit("s-"), (u % 5).cast("string"))
                         .alias("b")),
            ).alias("attr"),
        )
    )
    line = F.when(e % 13 == 0,
                  F.concat(F.lit("RAW "), e.cast("string"))).otherwise(good)
    return mongodb_atlas_logs(
        ev.select("event_id", line.alias("line")),
        version="4.4", log_name="mongodb.gz",
    )


O_MA_LOGS = """
WITH a AS (
  SELECT event_id AS e, user_id AS u, event_type AS et,
         1714978800 + event_id % 997 AS t0,
         CASE event_id % 3 WHEN 1 THEN 120 WHEN 2 THEN -330
              ELSE 0 END AS off,
         CASE event_id % 3 WHEN 1 THEN '+02:00' WHEN 2 THEN '-05:30'
              ELSE '+00:00' END AS suff,
         CASE event_id % 10
              WHEN 0 THEN 'F' WHEN 1 THEN 'E' WHEN 2 THEN 'W'
              WHEN 3 THEN 'I' WHEN 4 THEN 'D' WHEN 5 THEN 'D1'
              WHEN 6 THEN 'D2' WHEN 7 THEN 'D3' WHEN 8 THEN 'D4'
              ELSE 'Q' END AS sev,
         CASE event_id % 3 WHEN 0 THEN 'NETWORK' WHEN 1 THEN 'ACCESS'
              ELSE 'STORAGE' END AS comp,
         event_id % 4 <> 0 AS has_attr
  FROM events
  WHERE event_id % 13 <> 0
), b AS (
  SELECT *,
         strftime(make_timestamp(t0 * 1000000 + (e % 1000) * 1000),
                  '%Y-%m-%dT%H:%M:%S.%g') || suff AS wall,
         '{"a":' || CAST(e % 9 AS VARCHAR) || ',"b":"s-'
           || CAST(u % 5 AS VARCHAR) || '"}' AS attr_json
  FROM a
)
SELECT e AS event_id,
  (t0 - off * 60) * CAST(1000000000 AS BIGINT)
    + (e % 1000) * 1000000 AS ma_ts_ns,
  '{"t":{"$date":"' || wall || '"},"s":"' || sev || '","c":"' || comp
    || '","id":' || CAST(20000 + e % 100 AS VARCHAR)
    || ',"ctx":"conn' || CAST(e % 50 AS VARCHAR)
    || '","msg":"msg ' || et || '"'
    || CASE WHEN has_attr THEN ',"attr":' || attr_json ELSE '' END
    || '}' AS ma_body,
  CASE sev WHEN 'F' THEN 21 WHEN 'E' THEN 17 WHEN 'W' THEN 13
       WHEN 'I' THEN 9 WHEN 'D' THEN 5 WHEN 'D1' THEN 5
       WHEN 'D2' THEN 6 WHEN 'D3' THEN 7 WHEN 'D4' THEN 8
       ELSE 0 END AS ma_sev_num,
  CASE WHEN sev <> 'Q' THEN sev END AS ma_sev_text,
  'msg ' || et AS ma_message,
  comp AS ma_component,
  'conn' || CAST(e % 50 AS VARCHAR) AS ma_context,
  CAST(20000 + e % 100 AS BIGINT) AS ma_id,
  CASE WHEN has_attr THEN attr_json END AS ma_attr,
  'mongodb.gz' AS ma_log_name
FROM b
"""


EXT15_QUERIES["mongodb_atlas_logs"] = q_mongodb_atlas_logs
EXT15_ORACLES["mongodb_atlas_logs"] = O_MA_LOGS


def q_mongodb_atlas_console(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.mongodbatlas import mongodb_atlas_logs

    ev = load(spark, sf_dir, "events")
    e, et = F.col("event_id"), F.col("event_type")
    t0 = F.lit(1714978800) + e % 997
    sev = F.try_element_at(F.array(*map(F.lit, _MA_SEVS)),
                           (e % 10 + 1).cast("int"))
    line = F.when(e % 13 == 0, F.concat(F.lit("no brackets "),
                                        e.cast("string"))).otherwise(
        F.concat(
            F.date_format(F.timestamp_millis(t0 * 1000 + e % 1000),
                          "yyyy-MM-dd'T'HH:mm:ss.SSS"),
            F.lit("+0000 "), sev, F.lit(" NETWORK  [conn"),
            (e % 50).cast("string"), F.lit("] end connection for "), et,
        ))
    out = mongodb_atlas_logs(
        ev.select("event_id", line.alias("line")),
        version="4.2", log_name="console.gz",
    )
    return out.drop("ma_id", "ma_attr")


O_MA_CONSOLE = """
WITH a AS (
  SELECT event_id AS e, event_type AS et,
         1714978800 + event_id % 997 AS t0,
         CASE event_id % 10
              WHEN 0 THEN 'F' WHEN 1 THEN 'E' WHEN 2 THEN 'W'
              WHEN 3 THEN 'I' WHEN 4 THEN 'D' WHEN 5 THEN 'D1'
              WHEN 6 THEN 'D2' WHEN 7 THEN 'D3' WHEN 8 THEN 'D4'
              ELSE 'Q' END AS sev
  FROM events
  WHERE event_id % 13 <> 0
)
SELECT e AS event_id,
  t0 * CAST(1000000000 AS BIGINT) + (e % 1000) * 1000000 AS ma_ts_ns,
  strftime(make_timestamp(t0 * 1000000 + (e % 1000) * 1000),
           '%Y-%m-%dT%H:%M:%S.%g') || '+0000 ' || sev
    || ' NETWORK  [conn' || CAST(e % 50 AS VARCHAR)
    || '] end connection for ' || et AS ma_body,
  CASE sev WHEN 'F' THEN 21 WHEN 'E' THEN 17 WHEN 'W' THEN 13
       WHEN 'I' THEN 9 WHEN 'D' THEN 5 WHEN 'D1' THEN 5
       WHEN 'D2' THEN 6 WHEN 'D3' THEN 7 WHEN 'D4' THEN 8
       ELSE 0 END AS ma_sev_num,
  CASE WHEN sev <> 'Q' THEN sev END AS ma_sev_text,
  'end connection for ' || et AS ma_message,
  'NETWORK' AS ma_component,
  'conn' || CAST(e % 50 AS VARCHAR) AS ma_context,
  'console.gz' AS ma_log_name
FROM a
"""


EXT15_QUERIES["mongodb_atlas_console"] = q_mongodb_atlas_console
EXT15_ORACLES["mongodb_atlas_console"] = O_MA_CONSOLE


def q_mongodb_atlas_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.mongodbatlas import mongodb_atlas_audit_logs

    ev = load(spark, sf_dir, "events")
    e, u = F.col("event_id"), F.col("user_id")
    t0 = F.lit(1714978800) + e % 997
    wall = F.concat(
        F.date_format(F.timestamp_millis(t0 * 1000),
                      "yyyy-MM-dd'T'HH:mm:ss.SSS"), F.lit("+00:00"))
    usr = lambda i: F.struct(  # noqa: E731
        F.concat(F.lit("user"), ((u + i) % 9).cast("string"))
        .alias("user"),
        F.concat(F.lit("db"), ((e + i) % 4).cast("string")).alias("db"),
    )
    rol = lambda i: F.struct(  # noqa: E731
        F.concat(F.lit("role"), ((e + i) % 6).cast("string"))
        .alias("role"),
        F.concat(F.lit("db"), ((u + i) % 4).cast("string")).alias("db"),
    )
    line = F.to_json(
        F.struct(
            F.try_element_at(
                F.array(F.lit("authenticate"), F.lit("createCollection"),
                        F.lit("dropDatabase")),
                (e % 3 + 1).cast("int"),
            ).alias("atype"),
            F.struct(wall.alias("$date")).alias("ts"),
            F.when(
                e % 4 != 0,
                F.struct(
                    F.lower(F.hex(e * 31)).alias("$binary"),
                    F.lit("04").alias("$type"),
                ),
            ).alias("uuid"),
            F.struct(
                F.when(e % 2 == 0, F.concat(
                    F.lit("10.0.0."), (e % 250).cast("string")))
                .alias("ip"),
                F.when(e % 2 == 0, F.lit(27017)).alias("port"),
                F.when(e % 2 != 0, e % 3 == 0).alias("isSystemUser"),
                F.when(e % 2 != 0, F.lit("/tmp/mongodb.sock"))
                .alias("unix"),
            ).alias("local"),
            F.struct(
                F.concat(F.lit("192.168.1."), (u % 200).cast("string"))
                .alias("ip"),
                (F.lit(40000) + e % 10000).alias("port"),
            ).alias("remote"),
            F.slice(F.array(usr(0), usr(1)), 1, (e % 3).cast("int"))
            .alias("users"),
            F.slice(F.array(rol(0)), 1, (e % 2).cast("int"))
            .alias("roles"),
            (e % 7).alias("result"),
            F.when(
                e % 5 != 0,
                F.struct(F.concat(F.lit("d"), (e % 4).cast("string"))
                         .alias("db")),
            ).alias("param"),
        )
    )
    out = mongodb_atlas_audit_logs(
        ev.select("event_id", line.alias("line")), log_name="audit.gz")
    return out.drop("ma_body")


O_MA_AUDIT = """
WITH a AS (
  SELECT event_id AS e, user_id AS u,
         1714978800 + event_id % 997 AS t0
  FROM events
)
SELECT e AS event_id,
  t0 * CAST(1000000000 AS BIGINT) AS ma_ts_ns,
  9 AS ma_sev_num, 'INFO' AS ma_sev_text,
  CASE e % 3 WHEN 0 THEN 'authenticate' WHEN 1 THEN 'createCollection'
       ELSE 'dropDatabase' END AS ma_atype,
  CASE WHEN e % 2 = 0 THEN '10.0.0.' || CAST(e % 250 AS VARCHAR) END
    AS ma_local_ip,
  CASE WHEN e % 2 = 0 THEN CAST(27017 AS BIGINT) END AS ma_local_port,
  CASE WHEN e % 2 <> 0 THEN e % 3 = 0 END AS ma_local_is_system_user,
  CASE WHEN e % 2 <> 0 THEN '/tmp/mongodb.sock' END AS ma_local_unix,
  '192.168.1.' || CAST(u % 200 AS VARCHAR) AS ma_remote_ip,
  CAST(40000 + e % 10000 AS BIGINT) AS ma_remote_port,
  CAST(NULL AS BOOLEAN) AS ma_remote_is_system_user,
  CAST(NULL AS VARCHAR) AS ma_remote_unix,
  CASE WHEN e % 4 <> 0 THEN lower(to_hex(e * 31)) END AS ma_uuid_binary,
  CASE WHEN e % 4 <> 0 THEN '04' END AS ma_uuid_type,
  CAST(e % 7 AS BIGINT) AS ma_result,
  CASE WHEN e % 5 <> 0
       THEN '{"db":"d' || CAST(e % 4 AS VARCHAR) || '"}' END AS ma_param,
  CASE CAST(e % 3 AS INT)
    WHEN 0 THEN '[]'
    WHEN 1 THEN '[{"user":"user' || CAST(u % 9 AS VARCHAR)
      || '","db":"db' || CAST(e % 4 AS VARCHAR) || '"}]'
    ELSE '[{"user":"user' || CAST(u % 9 AS VARCHAR)
      || '","db":"db' || CAST(e % 4 AS VARCHAR)
      || '"},{"user":"user' || CAST((u + 1) % 9 AS VARCHAR)
      || '","db":"db' || CAST((e + 1) % 4 AS VARCHAR) || '"}]'
  END AS ma_users,
  CASE WHEN e % 2 = 1
       THEN '[{"role":"role' || CAST(e % 6 AS VARCHAR)
         || '","db":"db' || CAST(u % 4 AS VARCHAR) || '"}]'
       ELSE '[]' END AS ma_roles,
  'audit.gz' AS ma_log_name
FROM a
"""


EXT15_QUERIES["mongodb_atlas_audit"] = q_mongodb_atlas_audit
EXT15_ORACLES["mongodb_atlas_audit"] = O_MA_AUDIT

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

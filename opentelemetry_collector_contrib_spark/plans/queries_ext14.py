"""Round-5 queries (cont.): libhoney (Honeycomb) event translation.

The fixture builds one libhoney event JSON per events row exercising
every translator branch arithmetically (so the DuckDB oracle can
replay it): signal routing (trace/log/span_event/link/unknown/absent),
the seeded ``libhoney.receiver`` scope (service = dataset), event-time
forms (RFC3339, 10-digit epoch, 13-digit fractional replay, float
seconds, absent), dash-stripped 32/16-hex ids, the three parent-id
layouts (absent / 8-byte / 16-byte-take-last-8), span status from
``error`` presence, strict link ids, and typed attribute folding.
The FNV-1a fallback ids are pinned by ``tests/test_round5_libhoney.py``
(no FNV builtin in DuckDB; the fixture keeps generated ids decodable).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import QueryFn, load

EXT14_QUERIES: dict[str, QueryFn] = {}
EXT14_ORACLES: dict[str, str] = {}


# ---------------------------------------------------------------------------
# libhoney event JSON -> OTLP span/log/span_event/span_link rows
# ---------------------------------------------------------------------------


def q_libhoney(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.libhoney import libhoney_events_parse

    ev = load(spark, sf_dir, "events")
    e, u, et = F.col("event_id"), F.col("user_id"), F.col("event_type")
    m = e % 10
    hx = lambda c, n: F.lpad(F.lower(F.hex(c)), n, "0")  # noqa: E731
    h32 = hx(F.lit(500000) + e, 32)
    h16s = hx(e + 7, 16)
    h16p = hx(F.floor(e / 2) + 1, 16)
    h32p = hx(F.lit(900000) + e, 32)

    is_span, is_log = m < 4, m.isin(4, 5, 6, 9)
    is_ev, is_lk = m == 7, m == 8

    tv = e % 5
    time_str = (
        F.when(
            tv == 0,
            F.date_format(
                F.timestamp_seconds(F.lit(1714979289) + e % 86400),
                "yyyy-MM-dd'T'HH:mm:ss'Z'",
            ),
        )
        .when(tv == 1, (F.lit(1714979289) + e % 1000000).cast("string"))
        .when(tv == 2, F.concat(F.lit("1714979289"), F.lpad(e % 1000, 3, "0")))
        .when(tv == 3, F.concat(F.lit("1714979289."), (e % 100).cast("string")))
    )
    data = F.struct(
        F.when(is_span | is_ev | is_lk, "trace")
        .when(m.isin(4, 5), "log")
        .when(m == 9, "metric")
        .alias("meta.signal_type"),
        F.when(is_ev, "span_event").when(is_lk, "link")
        .alias("meta.annotation_type"),
        F.when(u % 5 != 0, F.concat(F.lit("svc"), (u % 3).cast("string")))
        .alias("service.name"),
        F.when(u % 4 != 0, F.concat(F.lit("lib"), (u % 2).cast("string")))
        .alias("library.name"),
        F.when(u % 3 != 0, F.concat(F.lit("1."), (u % 3).cast("string")))
        .alias("library.version"),
        F.when(is_span, F.concat(F.lit("op-"), et))
        .when(is_ev, F.concat(F.lit("ev-"), et))
        .alias("name"),
        F.when(
            is_span & (e % 4 != 2),
            F.when(
                e % 4 == 1,
                F.concat(F.substring(h32, 1, 8), F.lit("-"),
                         F.substring(h32, 9, 24)),
            ).otherwise(h32),
        ).alias("trace.trace_id"),
        F.when(is_span & (e % 2 == 0), h16s).alias("trace.span_id"),
        F.when(is_span & (e % 3 == 1), h16p)
        .when(is_span & (e % 3 == 2), h32p)
        .when(is_ev | is_lk, h16p)
        .alias("trace.parent_id"),
        F.when(
            is_span,
            F.try_element_at(
                F.array(*map(F.lit, ("server", "client", "producer",
                                     "consumer", "internal", "weird"))),
                (e % 7 + 1).cast("int"),
            ),  # e%7==6 -> null (absent)
        ).alias("span.kind"),
        F.when(is_span & (e % 4 != 0), (e % 11).cast("double") * 1.5)
        .alias("duration_ms"),
        F.when(is_span & (e % 13 == 0), True).alias("error"),
        F.when(is_span & (e % 13 == 0), "failed").alias("status_message"),
        F.when(is_log & (e % 7 != 0), e % 24 + 1).alias("severity_code"),
        F.when(is_log & (e % 6 != 0),
               F.concat(F.lit("st"), (e % 4).cast("string")))
        .alias("severity_text"),
        F.when(is_log & (e % 5 != 0), e % 2).alias("flags"),
        F.when(is_log & (e % 9 != 0), F.concat(F.lit("b-"), et)).alias("body"),
        F.when(is_lk & (e % 2 == 0), hx(e + 3, 32))
        .when(is_lk, hx(e + 3, 30))  # 15 bytes: wrong length -> dropped
        .alias("trace.link.trace_id"),
        F.when(is_lk, hx(e + 5, 16)).alias("trace.link.span_id"),
        F.when(is_lk, "x").alias("trace.link.other"),
        (F.lit(200) + e % 400).alias("http.status"),
        ((e % 4).cast("double") * 0.25).alias("ratio"),
        (e % 2 == 0).alias("active"),
    )
    body = F.to_json(
        F.struct(
            time_str.alias("time"),
            F.when(e % 4 != 0, e % 7 + 1).alias("samplerate"),
            data.alias("data"),
        )
    )
    src = ev.select(
        "event_id",
        body.alias("body"),
        F.concat(F.lit("ds"), (u % 3).cast("string")).alias("dataset"),
    )
    out = libhoney_events_parse(src)
    return out.select(
        "event_id", "lh_signal", "lh_service", "lh_scope_name",
        "lh_scope_version", "lh_ts_ns", "lh_samplerate", "lh_trace_id",
        "lh_span_id", "lh_parent_id", "lh_name", "lh_kind", "lh_end_ns",
        "lh_status_code", "lh_status_msg", "lh_severity_number",
        "lh_severity_text", "lh_flags", "lh_body", "lh_link_trace_id",
        "lh_link_span_id", "lh_ok", "lh_attrs",
    )


O_LIBHONEY = """
WITH a AS (
  SELECT event_id, user_id, event_type,
         event_id % 10 AS m, event_id % 5 AS tv,
         CASE WHEN event_id % 4 = 0 THEN 1
              ELSE event_id % 7 + 1 END AS sr,
         user_id % 4 <> 0 AS has_lib,
         user_id % 5 <> 0 AS has_svc,
         'ds' || CAST(user_id % 3 AS VARCHAR) AS dataset,
         lpad(lower(to_hex(500000 + event_id)), 32, '0') AS h32,
         lpad(lower(to_hex(event_id + 7)), 16, '0') AS h16s,
         lpad(lower(to_hex(event_id // 2 + 1)), 16, '0') AS h16p,
         lpad(lower(to_hex(900000 + event_id)), 32, '0') AS h32p,
         CASE event_id % 5
           WHEN 0 THEN (1714979289 + event_id % 86400) * CAST(1000000000 AS BIGINT)
           WHEN 1 THEN (1714979289 + event_id % 1000000) * CAST(1000000000 AS BIGINT)
           WHEN 2 THEN 1714979289 * CAST(1000000000 AS BIGINT) + CAST(TRUNC(
             (CAST('1714979289.' || lpad(CAST(event_id % 1000 AS VARCHAR),
                                         3, '0') AS DOUBLE)
              - 1714979289) * 1e9) AS BIGINT)
           WHEN 3 THEN 1714979289 * CAST(1000000000 AS BIGINT) + CAST(TRUNC(
             (CAST('1714979289.' || CAST(event_id % 100 AS VARCHAR)
                   AS DOUBLE) - 1714979289) * 1e9) AS BIGINT)
         END AS ts_ns,
         CASE WHEN event_id % 4 <> 0
              THEN (event_id % 11) * 1.5 ELSE 0.0 END AS dur_ms,
         event_id % 13 = 0 AS has_err,
         list_sort(['http.status=' || CAST(200 + event_id % 400 AS VARCHAR),
           CASE event_id % 4 WHEN 0 THEN 'ratio=0' WHEN 1 THEN 'ratio=0.25'
                WHEN 2 THEN 'ratio=0.5' ELSE 'ratio=0.75' END,
           'active=' || CASE WHEN event_id % 2 = 0
                             THEN 'true' ELSE 'false' END]) AS extras
  FROM events
)
SELECT event_id,
  CASE WHEN m < 4 THEN 'span' WHEN m = 7 THEN 'span_event'
       WHEN m = 8 THEN 'span_link' ELSE 'log' END AS lh_signal,
  CASE WHEN NOT has_lib THEN dataset
       WHEN has_svc THEN 'svc' || CAST(user_id % 3 AS VARCHAR)
       ELSE dataset END AS lh_service,
  CASE WHEN has_lib THEN 'lib' || CAST(user_id % 2 AS VARCHAR)
       ELSE 'libhoney.receiver' END AS lh_scope_name,
  CASE WHEN NOT has_lib THEN '1.0.0'
       WHEN user_id % 3 <> 0 THEN '1.' || CAST(user_id % 3 AS VARCHAR)
       ELSE 'unset' END AS lh_scope_version,
  ts_ns AS lh_ts_ns,
  sr AS lh_samplerate,
  CASE WHEN m < 4 AND event_id % 4 <> 2 THEN h32 END AS lh_trace_id,
  CASE WHEN m < 4 AND event_id % 2 = 0 THEN h16s END AS lh_span_id,
  CASE WHEN m < 4 AND event_id % 3 = 1 THEN h16p
       WHEN m < 4 AND event_id % 3 = 2 THEN substring(h32p, 17, 16)
       WHEN m IN (7, 8) THEN h16p END AS lh_parent_id,
  CASE WHEN m < 4 THEN 'op-' || event_type
       WHEN m = 7 THEN 'ev-' || event_type END AS lh_name,
  CASE WHEN m >= 4 THEN NULL
       WHEN event_id % 7 = 0 THEN 'server' WHEN event_id % 7 = 1 THEN 'client'
       WHEN event_id % 7 = 2 THEN 'producer'
       WHEN event_id % 7 = 3 THEN 'consumer'
       WHEN event_id % 7 = 4 THEN 'internal'
       ELSE 'unspecified' END AS lh_kind,
  CASE WHEN m < 4
       THEN ts_ns + CAST(dur_ms * 1000000 AS BIGINT) END AS lh_end_ns,
  CASE WHEN m >= 4 THEN NULL WHEN has_err THEN 2 ELSE 0 END AS lh_status_code,
  CASE WHEN m >= 4 THEN NULL WHEN has_err THEN 'failed'
       ELSE '' END AS lh_status_msg,
  CASE WHEN m IN (4, 5, 6, 9) AND event_id % 7 <> 0
       THEN event_id % 24 + 1 END AS lh_severity_number,
  CASE WHEN m IN (4, 5, 6, 9) AND event_id % 6 <> 0
       THEN 'st' || CAST(event_id % 4 AS VARCHAR) END AS lh_severity_text,
  CASE WHEN m IN (4, 5, 6, 9) AND event_id % 5 <> 0
       THEN event_id % 2 END AS lh_flags,
  CASE WHEN m IN (4, 5, 6, 9) AND event_id % 9 <> 0
       THEN 'b-' || event_type END AS lh_body,
  CASE WHEN m = 8 AND event_id % 2 = 0
       THEN lpad(lower(to_hex(event_id + 3)), 32, '0') END AS lh_link_trace_id,
  CASE WHEN m = 8
       THEN lpad(lower(to_hex(event_id + 5)), 16, '0') END AS lh_link_span_id,
  NOT (m = 8 AND event_id % 2 <> 0) AS lh_ok,
  array_to_string(list_sort(
    CASE
      WHEN m < 4 THEN list_concat(extras,
        ['SampleRate=' || CAST(sr AS VARCHAR), 'meta.signal_type=trace']
        || CASE WHEN has_err THEN ['status_message=failed']
                ELSE [] END)
      WHEN m IN (7, 8) THEN extras
      ELSE list_concat(extras,
        ['SampleRate=' || CAST(sr AS VARCHAR)]
        || CASE WHEN m IN (4, 5) THEN ['meta.signal_type=log']
                WHEN m = 9 THEN ['meta.signal_type=metric']
                ELSE [] END)
    END), ',') AS lh_attrs
FROM a
"""


EXT14_QUERIES["libhoney_events"] = q_libhoney
EXT14_ORACLES["libhoney_events"] = O_LIBHONEY


# ---------------------------------------------------------------------------
# github workflow_run / workflow_job webhooks -> CI/CD trace spans
# ---------------------------------------------------------------------------


def q_github_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.github import github_workflow_run_spans

    ev = load(spark, sf_dir, "events")
    e, u, et = F.col("event_id"), F.col("user_id"), F.col("event_type")
    rid, att = F.lit(10000) + e, e % 3 + 1
    t0 = F.lit(1714978800) + e % 86400
    rfc = lambda s: F.date_format(  # noqa: E731
        F.timestamp_seconds(s), "yyyy-MM-dd'T'HH:mm:ss'Z'"
    )
    concl = F.try_element_at(
        F.array(*map(F.lit, ("success", "failure", "skipped", "cancelled",
                             "neutral"))),
        (e % 6 + 1).cast("int"),
    )  # e%6==5 -> absent
    prev = F.when(
        e % 4 != 0,
        F.concat(F.lit("https://api.github.com/repos/o/r/actions/runs/"),
                 rid.cast("string"), F.lit("/attempts/"),
                 (att - 1).cast("string")),
    )
    body = F.to_json(
        F.struct(
            F.struct(
                rid.alias("id"), att.alias("run_attempt"),
                F.concat(F.lit("wf-"), et).alias("name"),
                rfc(t0).alias("run_started_at"),
                rfc(t0 + e % 900).alias("updated_at"),
                concl.alias("conclusion"),
                prev.alias("previous_attempt_url"),
                F.concat(F.lit("https://github.com/o/r/actions/runs/"),
                         rid.cast("string")).alias("html_url"),
                F.concat(F.lit("b"), (e % 4).cast("string"))
                .alias("head_branch"),
                F.lower(F.hex(e)).alias("head_sha"),
                F.struct(
                    F.struct(
                        F.concat(F.lit("n"), (u % 3).cast("string"))
                        .alias("name"),
                        F.concat(F.lit("e"), (u % 3).cast("string"),
                                 F.lit("@x.io")).alias("email"),
                    ).alias("committer")
                ).alias("head_commit"),
                F.when(
                    e % 5 == 0,
                    F.array(
                        F.struct(
                            F.concat(
                                F.lit("o/r/.github/workflows/Flow_"),
                                (e % 4).cast("string"),
                                F.lit(".yml@refs/heads/main"),
                            ).alias("path"),
                            F.concat(F.lit("sha"), e.cast("string"))
                            .alias("sha"),
                            F.lit("refs/heads/main").alias("ref"),
                        )
                    ),
                ).alias("referenced_workflows"),
            ).alias("workflow_run"),
            F.struct(
                F.when(u % 7 != 0,
                       F.concat(F.lit("Repo_"), (u % 9).cast("string")))
                .otherwise(F.lit("")).alias("name"),
                F.struct(
                    F.when(u % 3 != 0,
                           F.concat(F.lit("Team_"), (u % 5).cast("string")))
                    .alias("service_name"),
                    F.concat(F.lit("core"), (u % 4).cast("string"))
                    .alias("teamName"),
                    (e % 7).alias("maxRetries"),
                    (u % 2 == 0).alias("isProd"),
                ).alias("custom_properties"),
            ).alias("repository"),
            F.struct(
                F.concat(F.lit("user"), (u % 10).cast("string"))
                .alias("login")
            ).alias("sender"),
        )
    )
    out = github_workflow_run_spans(ev.select("event_id", body.alias("body")))
    return out.select(
        "event_id", "gh_trace_id", "gh_span_id", "gh_name", "gh_kind",
        "gh_start_ns", "gh_end_ns", "gh_status_code", "gh_status_msg",
        "gh_link_trace_id", "gh_ok", "gh_resource_attrs",
    )


O_GITHUB_RUNS = """
WITH a AS (
  SELECT event_id, user_id, event_type,
         10000 + event_id AS rid, event_id % 3 + 1 AS att,
         1714978800 + event_id % 86400 AS t0,
         CASE event_id % 6 WHEN 0 THEN 'success' WHEN 1 THEN 'failure'
              WHEN 2 THEN 'skipped' WHEN 3 THEN 'cancelled'
              WHEN 4 THEN 'neutral' ELSE '' END AS concl,
         event_id % 4 <> 0 AS has_prev,
         user_id % 7 <> 0 AS has_repo,
         user_id % 3 <> 0 AS has_svcp
  FROM events
), b AS (
  SELECT *,
         sha256(CAST(rid AS VARCHAR) || CAST(att AS VARCHAR) || 't') AS th,
         sha256(CAST(rid AS VARCHAR) || CAST(att AS VARCHAR) || 's') AS sh,
         sha256(CAST(rid AS VARCHAR) || CAST(att - 1 AS VARCHAR) || 't')
           AS ph
  FROM a
)
SELECT event_id,
  substring(th, 1, 32) AS gh_trace_id,
  substring(sh, 17, 16) AS gh_span_id,
  'wf-' || event_type AS gh_name,
  'server' AS gh_kind,
  t0 * CAST(1000000000 AS BIGINT) AS gh_start_ns,
  (t0 + event_id % 900) * CAST(1000000000 AS BIGINT) AS gh_end_ns,
  CASE concl WHEN 'success' THEN 1 WHEN 'failure' THEN 2
       ELSE 0 END AS gh_status_code,
  concl AS gh_status_msg,
  CASE WHEN has_prev AND att > 1
       THEN substring(ph, 1, 32) END AS gh_link_trace_id,
  (has_repo OR has_svcp) AS gh_ok,
  array_to_string(list_sort(list_concat([
    'service.name=' || CASE WHEN has_svcp
        THEN 'team-' || CAST(user_id % 5 AS VARCHAR)
        WHEN has_repo THEN 'repo-' || CAST(user_id % 9 AS VARCHAR)
        ELSE 'unknown_service' END,
    'vcs.repository.name=' || CASE WHEN has_repo
        THEN 'Repo_' || CAST(user_id % 9 AS VARCHAR) ELSE '' END,
    'vcs.vendor.name=github',
    'vcs.ref.head=b' || CAST(event_id % 4 AS VARCHAR),
    'vcs.ref.head.type=branch',
    'vcs.ref.head.revision=' || lower(to_hex(event_id)),
    'vcs.ref.head.revision.author.name=n' || CAST(user_id % 3 AS VARCHAR),
    'vcs.ref.head.revision.author.email=e' || CAST(user_id % 3 AS VARCHAR)
      || '@x.io',
    'cicd.pipeline.name=wf-' || event_type,
    'cicd.pipeline.run.sender.login=user' || CAST(user_id % 10 AS VARCHAR),
    'cicd.pipeline.run.url.full=https://github.com/o/r/actions/runs/'
      || CAST(rid AS VARCHAR),
    'cicd.pipeline.run.id=' || CAST(rid AS VARCHAR),
    'cicd.pipeline.run.status=' || CASE concl WHEN 'skipped' THEN 'skip'
        WHEN 'cancelled' THEN 'cancellation' ELSE concl END,
    'github.repository.custom_properties.team_name=core'
      || CAST(user_id % 4 AS VARCHAR),
    'github.repository.custom_properties.max_retries='
      || CAST(event_id % 7 AS VARCHAR),
    'github.repository.custom_properties.is_prod='
      || CASE WHEN user_id % 2 = 0 THEN 'true' ELSE 'false' END],
    list_concat(
      CASE WHEN has_prev THEN
        ['cicd.pipeline.run.previous_attempt.url.full=https://github.com/o/r/actions/runs/'
         || CAST(rid AS VARCHAR) || '/attempts/' || CAST(att - 1 AS VARCHAR)]
      ELSE [] END,
      CASE WHEN event_id % 5 = 0 THEN [
        'github.reference.workflow.flow_' || CAST(event_id % 4 AS VARCHAR)
          || '.path=o/r/.github/workflows/Flow_'
          || CAST(event_id % 4 AS VARCHAR) || '.yml@refs/heads/main',
        'github.reference.workflow.flow_' || CAST(event_id % 4 AS VARCHAR)
          || '.revision=sha' || CAST(event_id AS VARCHAR),
        'github.reference.workflow.flow_' || CAST(event_id % 4 AS VARCHAR)
          || '.version=refs/heads/main']
      ELSE [] END))), ',') AS gh_resource_attrs
FROM b
"""


EXT14_QUERIES["github_run_spans"] = q_github_runs
EXT14_ORACLES["github_run_spans"] = O_GITHUB_RUNS


def q_github_jobs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.github import github_workflow_job_spans

    ev = load(spark, sf_dir, "events")
    e, u, et = F.col("event_id"), F.col("user_id"), F.col("event_type")
    rid, att, jid = F.lit(10000) + e, e % 3 + 1, F.lit(700000) + e
    t0 = F.lit(1714978800) + e % 86400
    rfc = lambda s: F.date_format(  # noqa: E731
        F.timestamp_seconds(s), "yyyy-MM-dd'T'HH:mm:ss'Z'"
    )
    concl = F.try_element_at(
        F.array(*map(F.lit, ("success", "failure", "skipped", "cancelled",
                             "neutral"))),
        (e % 6 + 1).cast("int"),
    )
    started = t0 + F.when(e % 8 == 0, -5).otherwise(e % 120)
    nsteps = e % 4
    step = lambda i, name: F.struct(  # noqa: E731
        F.lit(name).alias("name"),
        F.when((e + i) % 2 == 0, "completed").otherwise("queued")
        .alias("status"),
        F.try_element_at(
            F.array(*map(F.lit, ("success", "failure", "skipped",
                                 "cancelled", "neutral"))),
            ((e + i) % 5 + 1).cast("int"),
        ).alias("conclusion"),
        F.lit(i).alias("number"),
        rfc(t0 + i).alias("started_at"),
        rfc(t0 + i + 1).alias("completed_at"),
    )
    steps = F.slice(
        F.array(step(1, "unit"), step(2, "unit"), step(3, "lint")),
        1, nsteps.cast("int"),
    )
    body = F.to_json(
        F.struct(
            F.struct(
                jid.alias("id"), rid.alias("run_id"),
                att.alias("run_attempt"),
                F.concat(F.lit("job-"), et).alias("name"),
                rfc(t0).alias("created_at"),
                rfc(started).alias("started_at"),
                rfc(t0 + 600).alias("completed_at"),
                concl.alias("conclusion"),
                F.concat(F.lit("https://github.com/o/r/actions/runs/"),
                         rid.cast("string"), F.lit("/job/"),
                         jid.cast("string")).alias("html_url"),
                F.concat(F.lit("b"), (e % 4).cast("string"))
                .alias("head_branch"),
                F.lower(F.hex(e)).alias("head_sha"),
                (u % 20).alias("runner_id"),
                (u % 5).alias("runner_group_id"),
                F.concat(F.lit("run"), (u % 6).cast("string"))
                .alias("runner_name"),
                F.concat(F.lit("Grp"), (u % 3).cast("string"))
                .alias("runner_group_name"),
                F.concat(F.lit("N"), (e % 5).cast("string")).alias("node_id"),
                F.when(e % 3 != 0, F.array(F.lit("Linux"), F.lit("X64")))
                .alias("labels"),
                steps.alias("steps"),
            ).alias("workflow_job"),
            F.struct(
                F.when(u % 7 != 0,
                       F.concat(F.lit("Repo_"), (u % 9).cast("string")))
                .otherwise(F.lit("")).alias("name"),
            ).alias("repository"),
            F.struct(
                F.concat(F.lit("user"), (u % 10).cast("string"))
                .alias("login")
            ).alias("sender"),
        )
    )
    out = github_workflow_job_spans(ev.select("event_id", body.alias("body")))
    return out.select(
        "event_id", "gh_span_type", "gh_trace_id", "gh_span_id",
        "gh_parent_id", "gh_span_name", "gh_start_ns", "gh_end_ns",
        "gh_status_code", "gh_status_msg", "gh_queue_dur", "gh_task_status",
        "gh_ok", "gh_resource_attrs",
    )


O_GITHUB_JOBS = """
WITH a AS (
  SELECT event_id, user_id, event_type,
         10000 + event_id AS rid, event_id % 3 + 1 AS att,
         700000 + event_id AS jid,
         'job-' || event_type AS jname,
         1714978800 + event_id % 86400 AS t0,
         CASE event_id % 6 WHEN 0 THEN 'success' WHEN 1 THEN 'failure'
              WHEN 2 THEN 'skipped' WHEN 3 THEN 'cancelled'
              WHEN 4 THEN 'neutral' ELSE '' END AS concl,
         event_id % 8 = 0 AS clamped,
         CAST(event_id % 4 AS INT) AS nsteps,
         user_id % 7 <> 0 AS has_repo
  FROM events
), b AS (
  SELECT *,
         t0 + CASE WHEN clamped THEN -5 ELSE event_id % 120 END AS jstart,
         substring(sha256(CAST(rid AS VARCHAR) || CAST(att AS VARCHAR)
           || 't'), 1, 32) AS tid,
         substring(sha256(CAST(rid AS VARCHAR) || CAST(att AS VARCHAR)
           || 's'), 17, 16) AS root_id,
         substring(sha256(CAST(rid AS VARCHAR) || CAST(att AS VARCHAR)
           || jname), 17, 16) AS job_id,
         substring(sha256(CAST(rid AS VARCHAR) || CAST(att AS VARCHAR)
           || jname || 'queue-' || jname || '1'), 17, 16) AS queue_id,
         array_to_string(list_sort(list_concat([
           'service.name=' || CASE WHEN has_repo
               THEN 'repo-' || CAST(user_id % 9 AS VARCHAR)
               ELSE 'unknown_service' END,
           'vcs.repository.name=' || CASE WHEN has_repo
               THEN 'Repo_' || CAST(user_id % 9 AS VARCHAR) ELSE '' END,
           'vcs.vendor.name=github',
           'vcs.ref.head=b' || CAST(event_id % 4 AS VARCHAR),
           'vcs.ref.head.type=branch',
           'vcs.ref.head.revision=' || lower(to_hex(event_id)),
           'cicd.pipeline.worker.id=' || CAST(user_id % 20 AS VARCHAR),
           'cicd.pipeline.worker.group.id=' || CAST(user_id % 5 AS VARCHAR),
           'cicd.pipeline.worker.name=run' || CAST(user_id % 6 AS VARCHAR),
           'cicd.pipeline.worker.group.name=Grp'
             || CAST(user_id % 3 AS VARCHAR),
           'cicd.pipeline.worker.node.id=N' || CAST(event_id % 5 AS VARCHAR),
           'cicd.pipeline.name=job-' || event_type,
           'cicd.pipeline.task.run.sender.login=user'
             || CAST(user_id % 10 AS VARCHAR),
           'cicd.pipeline.task.run.url.full=https://github.com/o/r/actions/runs/'
             || CAST(rid AS VARCHAR) || '/job/' || CAST(jid AS VARCHAR),
           'cicd.pipeline.task.run.id=' || CAST(jid AS VARCHAR),
           CASE WHEN concl IN ('success', 'failure', 'skipped', 'cancelled')
                THEN 'cicd.pipeline.run.task.status=' ||
                  CASE concl WHEN 'skipped' THEN 'skip'
                       WHEN 'cancelled' THEN 'cancellation' ELSE concl END
                ELSE 'cicd.pipeline.run.status=' || concl END],
           CASE WHEN event_id % 3 <> 0
                THEN ['cicd.pipeline.worker.labels=["linux","x64"]']
                ELSE [] END)), ',') AS rattrs
  FROM a
), steps AS (
  SELECT b.*, CAST(i AS INT) AS i,
         CASE WHEN i <= 2 THEN 'unit' ELSE 'lint' END AS sname,
         CASE WHEN i = 2 AND nsteps >= 2 THEN 'unit-1'
              WHEN i <= 2 THEN 'unit' ELSE 'lint' END AS uname,
         CASE (event_id + i) % 5 WHEN 0 THEN 'success' WHEN 1 THEN 'failure'
              WHEN 2 THEN 'skipped' WHEN 3 THEN 'cancelled'
              ELSE 'neutral' END AS sconcl,
         CASE WHEN (event_id + i) % 2 = 0
              THEN 'completed' ELSE 'queued' END AS sstatus
  FROM b, unnest(range(1, nsteps + 1)) AS t(i)
)
SELECT event_id, 'job' AS gh_span_type, tid AS gh_trace_id,
  job_id AS gh_span_id, root_id AS gh_parent_id, jname AS gh_span_name,
  t0 * CAST(1000000000 AS BIGINT) AS gh_start_ns,
  (t0 + 600) * CAST(1000000000 AS BIGINT) AS gh_end_ns,
  CASE concl WHEN 'success' THEN 1 WHEN 'failure' THEN 2
       ELSE 0 END AS gh_status_code,
  concl AS gh_status_msg,
  CAST(NULL AS DOUBLE) AS gh_queue_dur,
  CAST(NULL AS VARCHAR) AS gh_task_status,
  has_repo AS gh_ok, rattrs AS gh_resource_attrs
FROM b
UNION ALL
SELECT event_id, 'queue', tid, queue_id, job_id, 'queue-' || jname,
  CASE WHEN clamped THEN jstart ELSE t0 END * CAST(1000000000 AS BIGINT),
  jstart * CAST(1000000000 AS BIGINT),
  0, '',
  CASE WHEN clamped THEN 0.0
       ELSE (event_id % 120) * 1e9 END,
  CAST(NULL AS VARCHAR), has_repo, rattrs
FROM b
UNION ALL
SELECT event_id, 'step', tid,
  substring(sha256(CAST(rid AS VARCHAR) || CAST(att AS VARCHAR) || jname
    || sname || CAST(i AS VARCHAR)), 17, 16),
  queue_id, uname,
  (t0 + i) * CAST(1000000000 AS BIGINT),
  (t0 + i + 1) * CAST(1000000000 AS BIGINT),
  CASE sconcl WHEN 'success' THEN 1 WHEN 'failure' THEN 2 ELSE 0 END,
  concl,
  CAST(NULL AS DOUBLE),
  CASE sconcl WHEN 'success' THEN 'success' WHEN 'failure' THEN 'failure'
       WHEN 'skipped' THEN 'failure' WHEN 'cancelled' THEN 'cancellation'
       ELSE sstatus END,
  has_repo, rattrs
FROM steps
"""


EXT14_QUERIES["github_job_spans"] = q_github_jobs
EXT14_ORACLES["github_job_spans"] = O_GITHUB_JOBS

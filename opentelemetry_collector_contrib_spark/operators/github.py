"""GitHub Actions webhook → OTLP trace translation.

Re-expresses ``receiver/githubreceiver``'s trace path
(trace_event_handling.go:22-410, model.go:139-416) over DataFrames of
workflow webhook JSON (one event per row). Semantics mirrored and
pinned by ``tests/test_round5_github.py``:

- deterministic ids (trace_event_handling.go:87-120,218-231,345-358):
  trace = sha256("{runID}{runAttempt}t")[:32], root/parent span =
  sha256("{runID}{runAttempt}s")[16:32], job span =
  sha256("{runID}{runAttempt}{jobName}")[16:32], step/queue span =
  sha256("{runID}{runAttempt}{jobName}{name}{number}")[16:32];
- workflow_run → ONE root span (name, SERVER kind, run_started_at →
  updated_at, success→OK / failure→ERROR / else UNSET, message =
  conclusion) + a link to the previous attempt's trace when
  previous_attempt_url is set and run_attempt > 1 (:156-168);
- workflow_job → a span per row: the job span (created_at →
  completed_at, parent = root), a queue-<job> span (parent = job,
  created→started clamped to zero when created > started, queue
  duration ns as a double attr, :375-410), and one span per step
  (parent = QUEUE span, :236-251) with duplicate step names
  uniquified "name-N" on the 2nd+ occurrence (newUniqueSteps
  :253-287) — the span ID uses the ORIGINAL step name;
- step status attr: success / failure / skipped→"failure" /
  cancelled→"cancellation" with OK/ERROR/UNSET codes; the raw
  step.status value is kept when the conclusion is anything else;
  status message = the JOB's conclusion (:322-343);
- resource attrs (model.go:142-213,218-292): service.name =
  formatString(custom_properties.service_name | repo name) (lowercase,
  "_"→"-"); no resolvable name → the event errors out in the
  reference (gh_ok false here); repository custom properties become
  github.repository.custom_properties.<toSnakeCase(key)> typed attrs;
  vcs.* head-ref trio (+committer name/email on runs); worker/runner
  attrs + lowercased labels slice on jobs; run/task status mapping
  (skipped→skip, cancelled→cancellation, else the raw lowercased
  value — the job default case writes the RUN status key, a
  reference quirk kept 1:1, model.go:283); previous-attempt API URL
  rewritten to the html form (first occurrence only, :374-378);
  referenced workflows become github.reference.workflow.<name>.*
  template attrs, a path without exactly one "@" errors the event.

Plan shape: one ``from_json`` + zero-shuffle projections; jobs add
one ``explode`` for steps (still shuffle-free). sha256 is the JVM
builtin; no Python anywhere.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .zipkin import _canon, _tok

_STEP = "struct<name:string,status:string,conclusion:string,number:int,started_at:string,completed_at:string>"

_RUN_SCHEMA = (
    "struct<"
    "workflow_run struct<id:long,run_attempt:int,name:string,"
    "  run_started_at:string,updated_at:string,conclusion:string,"
    "  previous_attempt_url:string,html_url:string,head_branch:string,"
    "  head_sha:string,"
    "  head_commit:struct<committer:struct<name:string,email:string>>,"
    "  referenced_workflows:array<struct<path:string,sha:string,ref:string>>>,"
    "repository struct<name:string,custom_properties:map<string,variant>>,"
    "sender struct<login:string>>"
)

_JOB_SCHEMA = (
    "struct<"
    "workflow_job struct<id:long,run_id:long,run_attempt:int,name:string,"
    "  created_at:string,started_at:string,completed_at:string,"
    "  conclusion:string,html_url:string,head_branch:string,"
    "  head_sha:string,runner_id:long,runner_group_id:long,"
    "  runner_name:string,runner_group_name:string,node_id:string,"
    f"  labels:array<string>,steps:array<{_STEP}>>,"
    "repository struct<name:string,custom_properties:map<string,variant>>,"
    "sender struct<login:string>>"
)


def _sha_hex(s: Column) -> Column:
    return F.lower(F.sha2(s, 256))


def _trace_id(run_id: Column, attempt: Column) -> Column:
    """newTraceID (:87-106): first 16 bytes of sha256("{id}{attempt}t")."""
    return F.substring(
        _sha_hex(F.concat(run_id.cast("string"), attempt.cast("string"),
                          F.lit("t"))), 1, 32)


def _parent_span_id(run_id: Column, attempt: Column) -> Column:
    """newParentSpanID (:108-120): sha256("{id}{attempt}s") hex[16:32]."""
    return F.substring(
        _sha_hex(F.concat(run_id.cast("string"), attempt.cast("string"),
                          F.lit("s"))), 17, 16)


def _job_span_id(run_id: Column, attempt: Column, job: Column) -> Column:
    return F.substring(
        _sha_hex(F.concat(run_id.cast("string"), attempt.cast("string"),
                          job)), 17, 16)


def _step_span_id(run_id, attempt, job, name, number) -> Column:
    return F.substring(
        _sha_hex(F.concat(run_id.cast("string"), attempt.cast("string"),
                          job, name, number.cast("string"))), 17, 16)


def _ns(ts: Column) -> Column:
    return F.unix_micros(F.try_to_timestamp(ts)) * 1000


def _fmt_svc(s: Column) -> Column:
    """formatString (model.go:370-372)."""
    return F.lower(F.replace(s, F.lit("_"), F.lit("-")))


def _snake(s: Column) -> Column:
    """toSnakeCase (model.go:383-416): separators → "_", $/# words,
    camel/Pascal boundary underscores, lowercase, collapse "__"."""
    s = F.regexp_replace(s, r"[-. ]", "_")
    s = F.replace(s, F.lit("$"), F.lit("_dollar_"))
    s = F.replace(s, F.lit("#"), F.lit("_hash_"))
    # upper run followed by Upper+lower ("ABCDef" -> "ABC_Def"), then
    # lower/digit followed by Upper ("aB" -> "a_B") — together these
    # reproduce the prevIsLower-or-nextIsLower rune walk
    s = F.regexp_replace(s, r"([A-Z]+)([A-Z][a-z])", r"$1_$2")
    s = F.regexp_replace(s, r"([a-z0-9])([A-Z])", r"$1_$2")
    s = F.lower(s)
    return F.regexp_replace(s, r"_{2,}", "_")


def _status_code(conclusion: Column) -> Column:
    low = F.lower(F.coalesce(conclusion, F.lit("")))
    return F.when(low == "success", 1).when(low == "failure", 2).otherwise(0)


def _run_status(conclusion: Column) -> Column:
    """Conclusion → cicd status attr value (model.go:163-181)."""
    low = F.lower(F.coalesce(conclusion, F.lit("")))
    return (
        F.when(low == "skipped", "skip")
        .when(low == "cancelled", "cancellation")
        .otherwise(low)
    )


def _variant_str(v: Column) -> Column:
    """Custom-property value rendering: string/double/bool typed, any
    other type via fmt "%v" (model.go:349-365; JSON numbers are all
    float64 — whole ones fold like the other canon strings)."""
    from .zipkin import _zk_fold_whole

    t = F.schema_of_variant(v)
    return (
        F.when(t == "STRING", F.try_variant_get(v, "$", "string"))
        .when(
            t == "BOOLEAN",
            F.when(F.try_variant_get(v, "$", "boolean"), "true")
            .otherwise("false"),
        )
        .otherwise(_zk_fold_whole(v))
    )


def _custom_prop_toks(props: Column) -> Column:
    ents = F.map_entries(
        F.coalesce(props, F.from_json(F.lit("{}"), "map<string,variant>"))
    )
    return F.transform(
        F.filter(ents, lambda kv: kv["key"] != "service_name"),
        lambda kv: _tok(
            F.concat(F.lit("github.repository.custom_properties."),
                     _snake(kv["key"])),
            _variant_str(kv["value"]),
        ),
    )


def _service_name(props: Column, repo_name: Column) -> Column:
    svc_prop = F.try_variant_get(
        F.try_element_at(
            F.coalesce(props, F.from_json(F.lit("{}"), "map<string,variant>")),
            F.lit("service_name"),
        ),
        "$", "string",
    )
    return F.when(svc_prop.isNotNull(), _fmt_svc(svc_prop)).when(
        F.coalesce(repo_name, F.lit("")) != "", _fmt_svc(repo_name)
    )  # null -> unresolvable -> the reference drops the event


def _replace_first(s: Column, find: str, repl: str) -> Column:
    """strings.Replace(s, find, repl, 1) — F.replace is replace-all."""
    pos = F.instr(s, find)
    return F.when(
        pos > 0,
        F.concat(F.substring(s, 1, pos - 1), F.lit(repl),
                 F.substring(s, pos + len(find), 2_000_000_000)),
    ).otherwise(s)


def github_workflow_run_spans(
    df: DataFrame, body_col: str = "body"
) -> DataFrame:
    """One workflow_run webhook JSON per row → one root-span row
    (``gh_*`` columns; resource attrs canonicalized)."""
    parsed = df.where(
        F.try_parse_json(F.col(body_col)).isNotNull()
    ).select("*", F.from_json(F.col(body_col), _RUN_SCHEMA).alias("_g"))
    g = F.col("_g")
    wr = g["workflow_run"]
    props = g["repository"]["custom_properties"]
    svc = _service_name(props, g["repository"]["name"])

    prev_url = F.coalesce(wr["previous_attempt_url"], F.lit(""))
    attempt = F.coalesce(wr["run_attempt"], F.lit(0))
    conclusion = F.coalesce(wr["conclusion"], F.lit(""))

    # splitRefWorkflowPath (model.go:295-314): exactly one "@", name =
    # last path segment, first "."-part, lowercased; invalid -> event error
    def _ref_name(path: Column) -> Column:
        at = F.split(path, "@")
        last_seg = F.element_at(F.split(F.element_at(at, 1), "/"), -1)
        name = F.lower(F.element_at(F.split(last_seg, r"\."), 1))
        return F.when(F.size(at) == 2, name)

    refs = F.coalesce(
        wr["referenced_workflows"],
        F.expr(
            "cast(array() as array<struct<path:string,sha:string,ref:string>>)"
        ),
    )
    ref_toks = F.flatten(
        F.transform(
            refs,
            lambda w: F.array(
                _tok(F.concat(F.lit("github.reference.workflow."),
                              _ref_name(w["path"]), F.lit(".path")),
                     F.coalesce(w["path"], F.lit(""))),
                _tok(F.concat(F.lit("github.reference.workflow."),
                              _ref_name(w["path"]), F.lit(".revision")),
                     F.coalesce(w["sha"], F.lit(""))),
                _tok(F.concat(F.lit("github.reference.workflow."),
                              _ref_name(w["path"]), F.lit(".version")),
                     F.coalesce(w["ref"], F.lit(""))),
            ),
        )
    )
    refs_ok = F.forall(refs, lambda w: _ref_name(w["path"]).isNotNull())

    res_toks = F.concat(
        F.array(
            _tok(F.lit("service.name"), F.coalesce(svc, F.lit("unknown_service"))),
            _tok(F.lit("vcs.repository.name"),
                 F.coalesce(g["repository"]["name"], F.lit(""))),
            _tok(F.lit("vcs.vendor.name"), F.lit("github")),
            _tok(F.lit("vcs.ref.head"),
                 F.coalesce(wr["head_branch"], F.lit(""))),
            _tok(F.lit("vcs.ref.head.type"), F.lit("branch")),
            _tok(F.lit("vcs.ref.head.revision"),
                 F.coalesce(wr["head_sha"], F.lit(""))),
            _tok(F.lit("vcs.ref.head.revision.author.name"),
                 F.coalesce(wr["head_commit"]["committer"]["name"],
                            F.lit(""))),
            _tok(F.lit("vcs.ref.head.revision.author.email"),
                 F.coalesce(wr["head_commit"]["committer"]["email"],
                            F.lit(""))),
            _tok(F.lit("cicd.pipeline.name"),
                 F.coalesce(wr["name"], F.lit(""))),
            _tok(F.lit("cicd.pipeline.run.sender.login"),
                 F.coalesce(g["sender"]["login"], F.lit(""))),
            _tok(F.lit("cicd.pipeline.run.url.full"),
                 F.coalesce(wr["html_url"], F.lit(""))),
            _tok(F.lit("cicd.pipeline.run.id"),
                 F.coalesce(wr["id"], F.lit(0)).cast("string")),
            _tok(F.lit("cicd.pipeline.run.status"), _run_status(conclusion)),
            F.when(
                prev_url != "",
                _tok(F.lit("cicd.pipeline.run.previous_attempt.url.full"),
                     _replace_first(prev_url, "api.github.com/repos",
                                    "github.com")),
            ),
        ),
        _custom_prop_toks(props),
        ref_toks,
    )

    run_id = F.coalesce(wr["id"], F.lit(0))
    staged = parsed.select(
        "*",
        _trace_id(run_id, attempt).alias("gh_trace_id"),
        _parent_span_id(run_id, attempt).alias("gh_span_id"),
        F.coalesce(wr["name"], F.lit("")).alias("gh_name"),
        F.lit("server").alias("gh_kind"),
        _ns(wr["run_started_at"]).alias("gh_start_ns"),
        _ns(wr["updated_at"]).alias("gh_end_ns"),
        _status_code(conclusion).alias("gh_status_code"),
        conclusion.alias("gh_status_msg"),
        F.when(
            (prev_url != "") & (attempt > 1),
            _trace_id(run_id, attempt - 1),
        ).alias("gh_link_trace_id"),
        (svc.isNotNull() & refs_ok).alias("gh_ok"),
        res_toks.alias("_gh_toks"),
    ).drop("_g")
    return staged.select(
        "*", _canon(F.col("_gh_toks")).alias("gh_resource_attrs")
    ).drop("_gh_toks")


def github_workflow_job_spans(
    df: DataFrame, body_col: str = "body"
) -> DataFrame:
    """One workflow_job webhook JSON per row → one row per produced
    span: the job span, the queue span, then one per step
    (``gh_span_type`` ∈ job|queue|step)."""
    parsed = df.where(
        F.try_parse_json(F.col(body_col)).isNotNull()
    ).select("*", F.from_json(F.col(body_col), _JOB_SCHEMA).alias("_g"))
    g = F.col("_g")
    wj = g["workflow_job"]
    props = g["repository"]["custom_properties"]
    svc = _service_name(props, g["repository"]["name"])
    conclusion = F.coalesce(wj["conclusion"], F.lit(""))

    labels = F.coalesce(wj["labels"], F.expr("array()"))
    res_toks = F.concat(
        F.array(
            _tok(F.lit("service.name"), F.coalesce(svc, F.lit("unknown_service"))),
            _tok(F.lit("vcs.repository.name"),
                 F.coalesce(g["repository"]["name"], F.lit(""))),
            _tok(F.lit("vcs.vendor.name"), F.lit("github")),
            _tok(F.lit("vcs.ref.head"),
                 F.coalesce(wj["head_branch"], F.lit(""))),
            _tok(F.lit("vcs.ref.head.type"), F.lit("branch")),
            _tok(F.lit("vcs.ref.head.revision"),
                 F.coalesce(wj["head_sha"], F.lit(""))),
            _tok(F.lit("cicd.pipeline.worker.id"),
                 F.coalesce(wj["runner_id"], F.lit(0)).cast("string")),
            _tok(F.lit("cicd.pipeline.worker.group.id"),
                 F.coalesce(wj["runner_group_id"], F.lit(0)).cast("string")),
            _tok(F.lit("cicd.pipeline.worker.name"),
                 F.coalesce(wj["runner_name"], F.lit(""))),
            _tok(F.lit("cicd.pipeline.worker.group.name"),
                 F.coalesce(wj["runner_group_name"], F.lit(""))),
            _tok(F.lit("cicd.pipeline.worker.node.id"),
                 F.coalesce(wj["node_id"], F.lit(""))),
            F.when(
                F.size(labels) > 0,
                _tok(F.lit("cicd.pipeline.worker.labels"),
                     F.to_json(F.transform(labels, F.lower))),
            ),
            _tok(F.lit("cicd.pipeline.name"),
                 F.coalesce(wj["name"], F.lit(""))),
            _tok(F.lit("cicd.pipeline.task.run.sender.login"),
                 F.coalesce(g["sender"]["login"], F.lit(""))),
            _tok(F.lit("cicd.pipeline.task.run.url.full"),
                 F.coalesce(wj["html_url"], F.lit(""))),
            _tok(F.lit("cicd.pipeline.task.run.id"),
                 F.coalesce(wj["id"], F.lit(0)).cast("string")),
            # success/failure/skipped/cancelled hit the TASK status key;
            # everything else is written to the RUN status key — the
            # reference's default case does (model.go:283), kept 1:1
            F.when(
                F.lower(conclusion).isin(
                    "success", "failure", "skipped", "cancelled"),
                _tok(F.lit("cicd.pipeline.run.task.status"),
                     _run_status(conclusion)),
            ).otherwise(
                _tok(F.lit("cicd.pipeline.run.status"), F.lower(conclusion))
            ),
        ),
        _custom_prop_toks(props),
    )

    run_id = F.coalesce(wj["run_id"], F.lit(0))
    attempt = F.coalesce(wj["run_attempt"], F.lit(0))
    job_name = F.coalesce(wj["name"], F.lit(""))
    trace_id = _trace_id(run_id, attempt)
    root_id = _parent_span_id(run_id, attempt)
    job_id = _job_span_id(run_id, attempt, job_name)
    queue_name = F.concat(F.lit("queue-"), job_name)
    queue_id = _step_span_id(run_id, attempt, job_name, queue_name, F.lit(1))

    created = _ns(wj["created_at"])
    started = _ns(wj["started_at"])
    completed = _ns(wj["completed_at"])
    clamped = created > started  # GitHub clock skew workaround (:394-400)
    queue_dur = F.when(clamped, F.lit(0)).otherwise(started - created)

    steps = F.coalesce(wj["steps"], F.expr(f"cast(array() as array<{_STEP}>)"))

    # newUniqueSteps (:253-287): globally-unique names keep theirs; a
    # duplicated name keeps it on the 1st occurrence and gets "-<k-1>"
    # on the k-th. O(n²) HOF over the (small) per-job step array.
    def _uniq_name(s: Column, i: Column) -> Column:
        nm = F.coalesce(s["name"], F.lit(""))
        total = F.size(
            F.filter(steps, lambda o: F.coalesce(o["name"], F.lit("")) == nm)
        )
        prior = F.size(
            F.filter(
                steps,
                lambda o, j: (F.coalesce(o["name"], F.lit("")) == nm)
                & (j < i),
            )
        )
        return F.when(total == 1, nm).when(prior == 0, nm).otherwise(
            F.concat(nm, F.lit("-"), prior.cast("string"))
        )

    step_rows = F.transform(
        steps,
        lambda s, i: F.struct(
            _uniq_name(s, i).alias("uname"),
            F.coalesce(s["name"], F.lit("")).alias("name"),
            F.coalesce(s["status"], F.lit("")).alias("status"),
            F.coalesce(s["conclusion"], F.lit("")).alias("conclusion"),
            F.coalesce(s["number"], F.lit(0)).alias("number"),
            s["started_at"].alias("started_at"),
            s["completed_at"].alias("completed_at"),
        ),
    )

    base = parsed.select(
        "*",
        trace_id.alias("gh_trace_id"),
        root_id.alias("_gh_root"),
        job_id.alias("_gh_job"),
        queue_id.alias("_gh_queue"),
        job_name.alias("_gh_job_name"),
        conclusion.alias("_gh_concl"),
        created.alias("_gh_created"),
        started.alias("_gh_started"),
        completed.alias("_gh_completed"),
        queue_dur.alias("_gh_qdur"),
        clamped.alias("_gh_clamped"),
        run_id.alias("_gh_run_id"),
        attempt.alias("_gh_attempt"),
        svc.isNotNull().alias("gh_ok"),
        res_toks.alias("_gh_toks"),
        step_rows.alias("_gh_steps"),
    ).drop("_g")
    base = base.select(
        "*", _canon(F.col("_gh_toks")).alias("gh_resource_attrs")
    ).drop("_gh_toks")

    jn, cc = F.col("_gh_job_name"), F.col("_gh_concl")
    spans = F.concat(
        F.array(
            F.struct(
                F.lit("job").alias("gh_span_type"),
                F.col("_gh_job").alias("gh_span_id"),
                F.col("_gh_root").alias("gh_parent_id"),
                jn.alias("gh_span_name"),
                F.col("_gh_created").alias("gh_start_ns"),
                F.col("_gh_completed").alias("gh_end_ns"),
                _status_code(cc).alias("gh_status_code"),
                cc.alias("gh_status_msg"),
                F.lit(None).cast("double").alias("gh_queue_dur"),
                F.lit(None).cast("string").alias("gh_task_status"),
            ),
            F.struct(
                F.lit("queue").alias("gh_span_type"),
                F.col("_gh_queue").alias("gh_span_id"),
                F.col("_gh_job").alias("gh_parent_id"),
                F.concat(F.lit("queue-"), jn).alias("gh_span_name"),
                F.when(F.col("_gh_clamped"), F.col("_gh_started"))
                .otherwise(F.col("_gh_created")).alias("gh_start_ns"),
                F.col("_gh_started").alias("gh_end_ns"),
                F.lit(0).alias("gh_status_code"),
                F.lit("").alias("gh_status_msg"),
                F.col("_gh_qdur").cast("double").alias("gh_queue_dur"),
                F.lit(None).cast("string").alias("gh_task_status"),
            ),
        ),
        F.transform(
            F.col("_gh_steps"),
            lambda s: F.struct(
                F.lit("step").alias("gh_span_type"),
                _step_span_id(
                    F.col("_gh_run_id"), F.col("_gh_attempt"), jn,
                    s["name"], s["number"],
                ).alias("gh_span_id"),
                F.col("_gh_queue").alias("gh_parent_id"),
                s["uname"].alias("gh_span_name"),
                _ns(s["started_at"]).alias("gh_start_ns"),
                _ns(s["completed_at"]).alias("gh_end_ns"),
                _status_code(s["conclusion"]).alias("gh_status_code"),
                cc.alias("gh_status_msg"),  # JOB conclusion (:340)
                F.lit(None).cast("double").alias("gh_queue_dur"),
                F.when(
                    F.lower(s["conclusion"]).isin(
                        "success", "failure", "cancelled", "skipped"),
                    F.when(F.lower(s["conclusion"]) == "cancelled",
                           "cancellation")
                    .when(F.lower(s["conclusion"]) == "skipped", "failure")
                    .otherwise(F.lower(s["conclusion"])),
                ).otherwise(s["status"]).alias("gh_task_status"),
            ),
        ),
    )
    out = base.select(
        "*", F.explode(spans).alias("_sp")
    ).drop("_gh_steps", "_gh_root", "_gh_job", "_gh_queue", "_gh_job_name",
           "_gh_concl", "_gh_created", "_gh_started", "_gh_completed",
           "_gh_qdur", "_gh_clamped", "_gh_run_id", "_gh_attempt")
    return out.select("*", "_sp.*").drop("_sp")

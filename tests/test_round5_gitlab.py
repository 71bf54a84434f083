"""Round-5: GitLab pipeline webhook → trace translation, pinning
receiver/gitlabreceiver traces_event_handling.go + model.go."""
from __future__ import annotations

import hashlib
import json

from opentelemetry_collector_contrib_spark.operators.gitlab import (
    gitlab_pipeline_spans,
)


def _sha(s: str) -> str:
    return hashlib.sha256(s.encode()).hexdigest()


def _trace_id(pid, fin):
    return _sha(f"{pid}t{fin}")[:32]


def _span_id(s: str) -> str:
    return _sha(s)[16:32]


def _rows(spark, events):
    df = spark.createDataFrame(
        [(i, json.dumps(e)) for i, e in enumerate(events)],
        "row_id int, body string",
    )
    out = gitlab_pipeline_spans(df).collect()
    return sorted(out, key=lambda r: (r.row_id, r.gl_span_type or "",
                                      r.gl_span_id or ""))


WEBHOOK = {  # real-webhook time layout "2006-01-02 15:04:05 UTC"
    "object_attributes": {
        "id": 4242,
        "name": "Deploy pipeline",
        "created_at": "2025-04-01 18:00:00 UTC",
        "finished_at": "2025-04-01 18:31:49 UTC",
    },
    "commit": {"title": "fix: everything"},
    "project": {"path_with_namespace": "grp/app"},
    "builds": [
        # stage "build": two finished jobs; stage start = earliest
        # started (job 2), finish = latest finished (job 1)
        {"id": 1, "stage": "build", "name": "compile",
         "status": "success", "created_at": "2025-04-01 17:59:00 UTC",
         "started_at": "2025-04-01 18:01:00 UTC",
         "finished_at": "2025-04-01 18:20:00 UTC"},
        {"id": 2, "stage": "build", "name": "lint", "status": "success",
         "created_at": "2025-04-01 17:59:00 UTC",
         "started_at": "2025-04-01 18:00:30 UTC",
         "finished_at": "2025-04-01 18:05:00 UTC"},
        # stage "test": one finished, one still running (no job span,
        # but its earlier start IS the stage start)
        {"id": 3, "stage": "test", "name": "unit", "status": "success",
         "created_at": "2025-04-01 18:20:00 UTC",
         "started_at": "2025-04-01 18:21:00 UTC",
         "finished_at": "2025-04-01 18:30:00 UTC"},
        {"id": 4, "stage": "test", "name": "e2e", "status": "running",
         "created_at": "2025-04-01 18:20:00 UTC",
         "started_at": "2025-04-01 18:20:30 UTC",
         "finished_at": ""},
    ],
}


def _ns(iso: str) -> int:
    import datetime as dt

    return int(dt.datetime.strptime(iso, "%Y-%m-%d %H:%M:%S").replace(
        tzinfo=dt.timezone.utc).timestamp()) * 1_000_000_000


def test_pipeline_stage_job_tree(spark):
    rows = _rows(spark, [WEBHOOK])
    by_type = {}
    for r in rows:
        by_type.setdefault(r.gl_span_type, []).append(r)
    assert all(r.gl_ok for r in rows)
    assert sorted(by_type) == ["job", "pipeline", "stage"]

    fin = "2025-04-01 18:31:49 UTC"
    tid = _trace_id(4242, fin)
    assert {r.gl_trace_id for r in rows} == {tid}
    assert {r.gl_service for r in rows} == {"grp/app"}

    # pipeline root span (model.go:27-53)
    (p,) = by_type["pipeline"]
    assert p.gl_span_id == _span_id(f"4242{fin}")
    assert p.gl_parent_id is None
    assert p.gl_name == "Deploy pipeline"
    assert p.gl_start_ns == _ns("2025-04-01 18:00:00")
    assert p.gl_end_ns == _ns("2025-04-01 18:31:49")

    # stages derived from builds (newStages/setStageTime :241-286)
    stages = {r.gl_name: r for r in by_type["stage"]}
    assert set(stages) == {"build", "test"}
    b, t = stages["build"], stages["test"]
    assert b.gl_span_id == _span_id("4242build2025-04-01 18:00:30 UTC")
    assert b.gl_parent_id == p.gl_span_id
    assert b.gl_start_ns == _ns("2025-04-01 18:00:30")
    assert b.gl_end_ns == _ns("2025-04-01 18:20:00")
    # the running job's earlier start still counts for the stage
    assert t.gl_span_id == _span_id("4242test2025-04-01 18:20:30 UTC")
    assert t.gl_start_ns == _ns("2025-04-01 18:20:30")
    assert t.gl_end_ns == _ns("2025-04-01 18:30:00")

    # job spans only for finished builds (:97-114); parent = stage id
    jobs = {r.gl_name: r for r in by_type["job"]}
    assert set(jobs) == {"compile", "lint", "unit"}
    assert jobs["compile"].gl_span_id == _span_id(
        "12025-04-01 18:01:00 UTC")
    assert jobs["compile"].gl_parent_id == b.gl_span_id
    assert jobs["unit"].gl_parent_id == t.gl_span_id
    assert jobs["unit"].gl_start_ns == _ns("2025-04-01 18:21:00")
    assert jobs["unit"].gl_end_ns == _ns("2025-04-01 18:30:00")


def test_name_fallback_and_rfc3339(spark):
    ev = {
        "object_attributes": {
            "id": 7, "name": "",
            "created_at": "2025-04-01T18:31:49.624Z",
            "finished_at": "2025-04-01T18:40:00Z",
        },
        "commit": {"title": "feat: add tests"},
        "project": {"path_with_namespace": "o/r"},
        "builds": [],
    }
    rows = _rows(spark, [ev])
    assert len(rows) == 1 and rows[0].gl_span_type == "pipeline"
    assert rows[0].gl_ok
    assert rows[0].gl_name == "feat: add tests"
    assert rows[0].gl_start_ns == _ns("2025-04-01 18:31:49") + 624_000_000
    assert rows[0].gl_trace_id == _trace_id(7, "2025-04-01T18:40:00Z")


def _drop_case(base_mut):
    ev = json.loads(json.dumps(WEBHOOK))
    base_mut(ev)
    return ev


def test_error_drops_whole_event(spark):
    cases = [
        # unparseable / empty pipeline times (newTraceID :137-145)
        _drop_case(lambda e: e["object_attributes"].update(
            finished_at="")),
        _drop_case(lambda e: e["object_attributes"].update(
            finished_at="null")),
        _drop_case(lambda e: e["object_attributes"].update(
            created_at="yesterday")),
        # empty stage name (newStageSpanID :174-178)
        _drop_case(lambda e: e["builds"][0].update(stage="")),
        # a finished job with empty started_at (newJobSpanID :193-199)
        _drop_case(lambda e: e["builds"][2].update(started_at="")),
        # a stage in which nothing ever finished -> stage span has no
        # end timestamp (setSpanTimeStamps error)
        _drop_case(lambda e: e["builds"].append(
            {"id": 9, "stage": "post", "name": "cleanup",
             "status": "created", "created_at": "",
             "started_at": "2025-04-01 18:30:00 UTC",
             "finished_at": ""})),
        # garbage time on an unfinished job still poisons the stage
        _drop_case(lambda e: e["builds"][3].update(
            started_at="not-a-time")),
    ]
    rows = _rows(spark, cases)
    assert len(rows) == len(cases)
    for r in rows:
        assert r.gl_span_type == "dropped" and not r.gl_ok
        assert r.gl_span_id is None


def test_ok_events_unaffected_by_sibling_drops(spark):
    rows = _rows(spark, [WEBHOOK, _drop_case(
        lambda e: e["object_attributes"].update(finished_at=""))])
    ok_rows = [r for r in rows if r.row_id == 0]
    assert len(ok_rows) == 6 and all(r.gl_ok for r in ok_rows)
    bad = [r for r in rows if r.row_id == 1]
    assert len(bad) == 1 and bad[0].gl_span_type == "dropped"

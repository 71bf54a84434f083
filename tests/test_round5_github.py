"""Round-5: GitHub Actions webhook → trace translation, pinning
receiver/githubreceiver trace_event_handling.go + model.go."""
from __future__ import annotations

import hashlib
import json

from opentelemetry_collector_contrib_spark.operators.github import (
    github_workflow_job_spans,
    github_workflow_run_spans,
)


def _sha(s: str) -> str:
    return hashlib.sha256(s.encode()).hexdigest()


def _trace_id(run_id, attempt):
    return _sha(f"{run_id}{attempt}t")[:32]


def _parent_id(run_id, attempt):
    return _sha(f"{run_id}{attempt}s")[16:32]


def _job_id(run_id, attempt, job):
    return _sha(f"{run_id}{attempt}{job}")[16:32]


def _step_id(run_id, attempt, job, name, number):
    return _sha(f"{run_id}{attempt}{job}{name}{number}")[16:32]



def _attr_dict(canon: str) -> dict:
    toks: list[str] = []
    for part in canon.split(","):
        if "=" in part:
            toks.append(part)
        else:  # a comma inside a value (e.g. the labels JSON array)
            toks[-1] += "," + part
    return dict(t.split("=", 1) for t in toks)

def _runs(spark, events, **kw):
    df = spark.createDataFrame(
        [(json.dumps(e),) for e in events], "body string"
    )
    return github_workflow_run_spans(df, **kw).collect()


def _jobs(spark, events, **kw):
    df = spark.createDataFrame(
        [(json.dumps(e),) for e in events], "body string"
    )
    return github_workflow_job_spans(df, **kw).collect()


RUN = {
    "workflow_run": {
        "id": 123456,
        "run_attempt": 2,
        "name": "CI Build",
        "run_started_at": "2024-05-06T07:00:00Z",
        "updated_at": "2024-05-06T07:10:30Z",
        "conclusion": "Success",
        "previous_attempt_url": (
            "https://api.github.com/repos/o/r/actions/runs/123456/attempts/1"
        ),
        "html_url": "https://github.com/o/r/actions/runs/123456",
        "head_branch": "main",
        "head_sha": "abc123",
        "head_commit": {"committer": {"name": "Dev", "email": "d@e.io"}},
        "referenced_workflows": [
            {"path": "o/r/.github/workflows/Shared-CI.yml@refs/heads/main",
             "sha": "fff", "ref": "refs/heads/main"}
        ],
    },
    "repository": {
        "name": "My_Repo",
        "custom_properties": {
            "service_name": "Billing_API",
            "teamName": "core",
            "maxRetries": 3,
            "isProd": True,
            "SLA-tier": "gold",
        },
    },
    "sender": {"login": "octo"},
}


def test_workflow_run_root_span(spark):
    r = _runs(spark, [RUN])[0]
    assert r["gh_trace_id"] == _trace_id(123456, 2)
    assert r["gh_span_id"] == _parent_id(123456, 2)
    assert r["gh_name"] == "CI Build"
    assert r["gh_kind"] == "server"
    assert r["gh_start_ns"] == 1714978800 * 10**9
    assert r["gh_end_ns"] == (1714978800 + 630) * 10**9
    assert r["gh_status_code"] == 1  # Success (case-insensitive) -> OK
    assert r["gh_status_msg"] == "Success"  # raw conclusion
    # attempt 2 with previous_attempt_url -> link to attempt-1 trace
    assert r["gh_link_trace_id"] == _trace_id(123456, 1)
    assert r["gh_ok"] is True
    attrs = _attr_dict(r["gh_resource_attrs"])
    assert attrs["service.name"] == "billing-api"  # formatString
    assert attrs["vcs.repository.name"] == "My_Repo"
    assert attrs["vcs.vendor.name"] == "github"
    assert attrs["vcs.ref.head"] == "main"
    assert attrs["vcs.ref.head.type"] == "branch"
    assert attrs["vcs.ref.head.revision"] == "abc123"
    assert attrs["vcs.ref.head.revision.author.name"] == "Dev"
    assert attrs["vcs.ref.head.revision.author.email"] == "d@e.io"
    assert attrs["cicd.pipeline.name"] == "CI Build"
    assert attrs["cicd.pipeline.run.sender.login"] == "octo"
    assert attrs["cicd.pipeline.run.id"] == "123456"
    assert attrs["cicd.pipeline.run.status"] == "success"
    # api URL rewritten to html form (first occurrence)
    assert attrs["cicd.pipeline.run.previous_attempt.url.full"] == (
        "https://github.com/o/r/actions/runs/123456/attempts/1"
    )
    # custom properties, snake_cased, typed; service_name skipped
    assert attrs["github.repository.custom_properties.team_name"] == "core"
    assert attrs["github.repository.custom_properties.max_retries"] == "3"
    assert attrs["github.repository.custom_properties.is_prod"] == "true"
    assert attrs["github.repository.custom_properties.sla_tier"] == "gold"
    assert "service_name" not in r["gh_resource_attrs"]
    # referenced workflow template attrs (name lowercased, pre-"." stem)
    assert attrs["github.reference.workflow.shared-ci.path"] == (
        "o/r/.github/workflows/Shared-CI.yml@refs/heads/main"
    )
    assert attrs["github.reference.workflow.shared-ci.revision"] == "fff"
    assert attrs["github.reference.workflow.shared-ci.version"] == (
        "refs/heads/main"
    )


def test_workflow_run_edge_cases(spark):
    rows = _runs(
        spark,
        [
            # failure + attempt 1: no link even with previous URL
            {
                "workflow_run": {
                    "id": 9, "run_attempt": 1, "name": "n",
                    "run_started_at": "2024-05-06T07:00:00Z",
                    "updated_at": "2024-05-06T07:00:01Z",
                    "conclusion": "failure",
                    "previous_attempt_url": "https://api.github.com/repos/x",
                },
                "repository": {"name": "r"},
                "sender": {"login": "s"},
            },
            # unknown conclusion -> unset + raw lowercased status attr
            {
                "workflow_run": {
                    "id": 9, "run_attempt": 1, "name": "n",
                    "run_started_at": "2024-05-06T07:00:00Z",
                    "updated_at": "2024-05-06T07:00:01Z",
                    "conclusion": "Timed_Out",
                },
                "repository": {"name": "r"},
                "sender": {"login": "s"},
            },
            # skipped -> "skip" status attr, unset code
            {
                "workflow_run": {
                    "id": 9, "run_attempt": 1, "name": "n",
                    "conclusion": "skipped",
                },
                "repository": {"name": "r"},
                "sender": {"login": "s"},
            },
            # no repo name, no service_name custom prop -> event errors
            {
                "workflow_run": {"id": 9, "run_attempt": 1, "name": "n"},
                "repository": {},
                "sender": {"login": "s"},
            },
            # bad referenced-workflow path (no @) -> event errors
            {
                "workflow_run": {
                    "id": 9, "run_attempt": 1, "name": "n",
                    "referenced_workflows": [{"path": "no-at-sign"}],
                },
                "repository": {"name": "r"},
                "sender": {"login": "s"},
            },
        ],
    )
    assert rows[0]["gh_status_code"] == 2
    assert rows[0]["gh_link_trace_id"] is None
    a1 = _attr_dict(rows[1]["gh_resource_attrs"])
    assert a1["cicd.pipeline.run.status"] == "timed_out"
    assert rows[1]["gh_status_code"] == 0
    a2 = _attr_dict(rows[2]["gh_resource_attrs"])
    assert a2["cicd.pipeline.run.status"] == "skip"
    assert rows[3]["gh_ok"] is False
    assert rows[4]["gh_ok"] is False


JOB = {
    "workflow_job": {
        "id": 777,
        "run_id": 123456,
        "run_attempt": 2,
        "name": "build",
        "created_at": "2024-05-06T07:00:00Z",
        "started_at": "2024-05-06T07:00:30Z",
        "completed_at": "2024-05-06T07:05:00Z",
        "conclusion": "success",
        "html_url": "https://github.com/o/r/actions/runs/123456/job/777",
        "head_branch": "main",
        "head_sha": "abc123",
        "runner_id": 11,
        "runner_group_id": 3,
        "runner_name": "runner-a",
        "runner_group_name": "Default",
        "node_id": "NODE1",
        "labels": ["Linux", "X64"],
        "steps": [
            {"name": "checkout", "status": "completed",
             "conclusion": "success", "number": 1,
             "started_at": "2024-05-06T07:00:30Z",
             "completed_at": "2024-05-06T07:00:40Z"},
            {"name": "run tests", "status": "completed",
             "conclusion": "failure", "number": 2,
             "started_at": "2024-05-06T07:00:40Z",
             "completed_at": "2024-05-06T07:04:00Z"},
            {"name": "run tests", "status": "completed",
             "conclusion": "skipped", "number": 3,
             "started_at": "2024-05-06T07:04:00Z",
             "completed_at": "2024-05-06T07:04:01Z"},
            {"name": "run tests", "status": "queued",
             "conclusion": "cancelled", "number": 4,
             "started_at": "2024-05-06T07:04:01Z",
             "completed_at": "2024-05-06T07:04:02Z"},
            {"name": "cleanup", "status": "in_progress",
             "conclusion": "neutral", "number": 5,
             "started_at": "2024-05-06T07:04:02Z",
             "completed_at": "2024-05-06T07:04:03Z"},
        ],
    },
    "repository": {"name": "My_Repo"},
    "sender": {"login": "octo"},
}


def test_workflow_job_spans(spark):
    rows = _jobs(spark, [JOB])
    assert [r["gh_span_type"] for r in rows] == (
        ["job", "queue"] + ["step"] * 5
    )
    tid = _trace_id(123456, 2)
    assert all(r["gh_trace_id"] == tid for r in rows)

    job = rows[0]
    assert job["gh_span_id"] == _job_id(123456, 2, "build")
    assert job["gh_parent_id"] == _parent_id(123456, 2)
    assert job["gh_span_name"] == "build"
    assert job["gh_start_ns"] == 1714978800 * 10**9
    assert job["gh_end_ns"] == (1714978800 + 300) * 10**9
    assert job["gh_status_code"] == 1
    assert job["gh_status_msg"] == "success"

    q = rows[1]
    assert q["gh_span_id"] == _step_id(123456, 2, "build", "queue-build", 1)
    assert q["gh_parent_id"] == _job_id(123456, 2, "build")
    assert q["gh_span_name"] == "queue-build"
    assert q["gh_start_ns"] == 1714978800 * 10**9
    assert q["gh_end_ns"] == (1714978800 + 30) * 10**9
    assert q["gh_queue_dur"] == 30e9

    s1, s2, s3, s4, s5 = rows[2:]
    # all steps parent on the QUEUE span
    assert all(
        s["gh_parent_id"] == q["gh_span_id"] for s in (s1, s2, s3, s4, s5)
    )
    # duplicate names: 1st keeps, then -1, -2; ids use the ORIGINAL name
    assert [s["gh_span_name"] for s in (s1, s2, s3, s4, s5)] == [
        "checkout", "run tests", "run tests-1", "run tests-2", "cleanup",
    ]
    assert s2["gh_span_id"] == _step_id(123456, 2, "build", "run tests", 2)
    assert s3["gh_span_id"] == _step_id(123456, 2, "build", "run tests", 3)
    # status attr: success/failure/skipped->failure/cancelled->cancellation,
    # unknown conclusion keeps the raw step status
    assert [s["gh_task_status"] for s in (s1, s2, s3, s4, s5)] == [
        "success", "failure", "failure", "cancellation", "in_progress",
    ]
    assert [s["gh_status_code"] for s in (s1, s2, s3, s4, s5)] == [
        1, 2, 0, 0, 0,
    ]
    # step status message is the JOB conclusion
    assert all(s["gh_status_msg"] == "success" for s in (s1, s2, s3, s4, s5))

    attrs = _attr_dict(job["gh_resource_attrs"])
    assert attrs["service.name"] == "my-repo"
    assert attrs["cicd.pipeline.worker.id"] == "11"
    assert attrs["cicd.pipeline.worker.group.id"] == "3"
    assert attrs["cicd.pipeline.worker.name"] == "runner-a"
    assert attrs["cicd.pipeline.worker.group.name"] == "Default"
    assert attrs["cicd.pipeline.worker.node.id"] == "NODE1"
    assert attrs["cicd.pipeline.worker.labels"] == '["linux","x64"]'
    assert attrs["cicd.pipeline.name"] == "build"
    assert attrs["cicd.pipeline.task.run.sender.login"] == "octo"
    assert attrs["cicd.pipeline.task.run.id"] == "777"
    assert attrs["cicd.pipeline.run.task.status"] == "success"


def test_job_queue_clamp_and_status_quirk(spark):
    e = json.loads(json.dumps(JOB))
    e["workflow_job"]["created_at"] = "2024-05-06T07:00:31Z"  # after started
    e["workflow_job"]["conclusion"] = "neutral"
    e["workflow_job"]["steps"] = []
    rows = _jobs(spark, [e])
    assert [r["gh_span_type"] for r in rows] == ["job", "queue"]
    q = rows[1]
    assert q["gh_queue_dur"] == 0.0
    assert q["gh_start_ns"] == q["gh_end_ns"]  # clamped to started
    attrs = _attr_dict(rows[0]["gh_resource_attrs"])
    # the default case writes the RUN status key (reference quirk)
    assert attrs["cicd.pipeline.run.status"] == "neutral"
    assert "cicd.pipeline.run.task.status" not in attrs


def test_snake_case_keys(spark):
    e = json.loads(json.dumps(RUN))
    e["repository"]["custom_properties"] = {
        "service_name": "x",
        "HTTPServer": "a",
        "my-Prop Name.v2": "b",
        "cost$center": "c",
        "bug#id": "d",
    }
    e["workflow_run"].pop("referenced_workflows")
    r = _runs(spark, [e])[0]
    attrs = _attr_dict(r["gh_resource_attrs"])
    pfx = "github.repository.custom_properties."
    assert attrs[pfx + "http_server"] == "a"
    assert attrs[pfx + "my_prop_name_v2"] == "b"
    assert attrs[pfx + "cost_dollar_center"] == "c"
    assert attrs[pfx + "bug_hash_id"] == "d"

"""Unit tests for coralogix transaction attribution and datadog
semantic-attribute derivation."""

from __future__ import annotations

from opentelemetry_collector_contrib_spark.operators.vendor_semantics import (
    coralogix_transactions,
    datadog_semantics,
)

SPAN_SCHEMA = (
    "trace_id string, span_id string, parent_span_id string, "
    "name string, kind string"
)


def test_coralogix_server_child_starts_new_transaction(spark):
    #       root(internal)
    #        ├── a(client)   -> inherits root
    #        │    └── b(server)  -> NEW transaction 'op-b', root flag
    #        │         └── c(internal) -> inherits 'op-b'
    #        └── d(internal)  -> inherits root
    rows = [
        ("t1", "r", None, "op-root", "internal"),
        ("t1", "a", "r", "op-a", "client"),
        ("t1", "b", "a", "op-b", "server"),
        ("t1", "c", "b", "op-c", "internal"),
        ("t1", "d", "r", "op-d", "internal"),
    ]
    df = spark.createDataFrame(rows, SPAN_SCHEMA)
    got = {
        r["span_id"]: (r["txn"], r["is_root"])
        for r in coralogix_transactions(df).collect()
    }
    assert got == {
        "r": ("op-root", True),
        "a": ("op-root", False),
        "b": ("op-b", True),
        "c": ("op-b", False),
        "d": ("op-root", False),
    }


def test_coralogix_deep_chain_resolves_with_log_rounds(spark):
    # depth-40 chain: rounds=6 (2^6=64 reach) must resolve every span
    rows = [("t", "s0", None, "op-root", "internal")]
    rows += [
        ("t", f"s{i}", f"s{i-1}", f"op-{i}", "internal") for i in range(1, 40)
    ]
    df = spark.createDataFrame(rows, SPAN_SCHEMA)
    out = coralogix_transactions(df, rounds=6).collect()
    assert all(r["txn"] == "op-root" for r in out)
    # insufficient rounds leave the tail unresolved (documented)
    shallow = coralogix_transactions(df, rounds=2).collect()
    assert any(r["txn"] is None for r in shallow)


def test_coralogix_orphan_chain_stays_null(spark):
    # parent pointer to a nonexistent span: never reaches a boundary
    rows = [
        ("t", "r", None, "op-root", "internal"),
        ("t", "x", "ghost", "op-x", "internal"),
    ]
    df = spark.createDataFrame(rows, SPAN_SCHEMA)
    got = {r["span_id"]: r["txn"] for r in coralogix_transactions(df).collect()}
    assert got == {"r": "op-root", "x": None}


def test_datadog_semantics_defaults_and_error_chain(spark):
    rows = [
        # no service/version/env -> defaults; error with exception msg
        (1, None, None, None, "SERVER", "error", "stat", "exc!", "TypeE",
         None, None, "https://github.com/o/r"),
        # error, no exception -> status message
        (2, "svc", "v2", "stage", "CLIENT", "error", "statmsg", None, None,
         503, "abc", "github.com/o/r"),
        # error, no exception, empty status msg -> http code string
        (3, "svc", "v2", "stage", "CLIENT", "error", "", None, None,
         503, None, "git://x/y"),
        # ok -> error 0, no msg
        (4, "svc", "v2", "stage", "CLIENT", "ok", "m", "e", "T",
         200, None, "x/y"),
    ]
    schema = (
        "event_id long, service_name string, service_version string, "
        "deployment_env string, kind string, status_code string, "
        "status_message string, exception_message string, "
        "exception_type string, http_status_code int, vcs_revision string, "
        "vcs_repo_url string"
    )
    df = spark.createDataFrame(rows, schema)
    got = {r["event_id"]: r for r in datadog_semantics(df).collect()}
    r1 = got[1]
    assert r1["datadog_service"] == "otlpresourcenoservicename"
    assert r1["datadog_version"] == "" and r1["datadog_env"] == "default"
    assert r1["datadog_span_kind"] == "server"
    assert r1["datadog_error"] == 1 and r1["datadog_error_msg"] == "exc!"
    assert r1["git_repository_url"] == "github.com/o/r"
    assert got[2]["datadog_error_msg"] == "statmsg"
    assert got[2]["datadog_http_status_code"] == "503"
    assert got[3]["datadog_error_msg"] == "503"
    assert got[3]["git_repository_url"] == "x/y"
    assert got[4]["datadog_error"] == 0 and got[4]["datadog_error_msg"] is None


def test_datadog_insert_if_missing_keeps_existing(spark):
    rows = [(1, "svc", "keepme"), (2, "svc", None)]
    df = spark.createDataFrame(
        rows, "event_id long, service_name string, datadog_service string"
    )
    df = (
        df.selectExpr(
            "*", "NULL as service_version", "NULL as deployment_env",
            "'CLIENT' as kind", "'ok' as status_code", "'' as status_message",
            "NULL as exception_message", "NULL as exception_type",
            "CAST(NULL AS INT) as http_status_code", "NULL as vcs_revision",
            "'u' as vcs_repo_url",
        )
    )
    got = {r["event_id"]: r["datadog_service"]
           for r in datadog_semantics(df, override=False).collect()}
    assert got == {1: "keepme", 2: "svc"}
    got2 = {r["event_id"]: r["datadog_service"]
            for r in datadog_semantics(df, override=True).collect()}
    assert got2 == {1: "svc", 2: "svc"}


def test_sumologic_translate_collision_and_namespace(spark):
    from pyspark.sql import functions as F
    from opentelemetry_collector_contrib_spark.operators.vendor_semantics import (
        sumologic_semantics,
    )

    rows = [
        # service already exists -> service.name NOT translated;
        # host.name -> host; aws_ec2 -> cloud.namespace inserted,
        # cloud.platform renamed to aws_service afterwards
        (1, {"service.name": "a", "service": "keep",
             "host.name": "h1", "cloud.platform": "aws_ec2"}, 9),
        # normal translation; unknown platform adds no namespace
        (2, {"service.name": "b", "cloud.platform": "gcp_app_engine"}, 17),
        (3, {"k8s.pod.name": "p", "k8s.namespace.name": "ns"}, 0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, attrs map<string,string>, severity_number int"
    )
    out = sumologic_semantics(df)
    got = {r["event_id"]: (dict(r["attrs"]), r["loglevel"])
           for r in out.collect()}
    assert got[1][0] == {
        "service.name": "a", "service": "keep", "host": "h1",
        "aws_service": "aws_ec2", "cloud.namespace": "aws/ec2",
    }
    assert got[1][1] == "INFO"
    assert got[2][0] == {"service": "b", "aws_service": "gcp_app_engine"}
    assert got[2][1] == "ERROR"
    assert got[3][0] == {"pod": "p", "namespace": "ns"}
    assert got[3][1] == "UNSPECIFIED"

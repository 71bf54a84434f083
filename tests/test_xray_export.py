"""X-Ray export translator pins against
``exporter/awsxrayexporter/internal/translator/{segment,http,aws,sql,
cause,span_links}.go`` semantics (expectations mirror the reference's
``segment_test.go`` / ``cause_test.go`` shapes)."""
from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from opentelemetry_collector_contrib_spark.operators.xray_export import (
    xray_export_segments)

SCHEMA = (
    "i int, trace_id string, span_id string, parent_span_id string,"
    "name string, kind int, start_ns bigint, end_ns bigint,"
    "status_code int, status_message string,"
    "attrs map<string,string>, res_attrs map<string,string>,"
    "events array<struct<ts_ns:bigint,name:string,"
    "attrs:map<string,string>>>,"
    "links array<struct<trace_id:string,span_id:string,"
    "attrs:map<string,string>>>")

TID = "58406520" + "a" * 24


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, SCHEMA)
    out = xray_export_segments(df, id_cols=["i"], **kw)
    return {(r["i"], r["role"]): r for r in out.collect()}


def _row(i=1, **kw):
    base = dict(i=i, trace_id=TID, span_id="1" * 16, parent_span_id="",
                name="op", kind=2, start_ns=10**18, end_ns=10**18 + 10**9,
                status_code=0, status_message="", attrs={}, res_attrs={},
                events=None, links=None)
    base.update(kw)
    return base


def test_amazon_trace_id_and_subsegment_typing(spark):
    out = _run(spark, [
        _row(i=1),
        _row(i=2, kind=3, parent_span_id="9" * 16),
        _row(i=3, kind=3, parent_span_id=""),  # no parent -> segment
    ])
    r1 = out[(1, "main")]
    assert r1["amazon_trace_id"] == "1-58406520-" + "a" * 24
    assert r1["seg_type"] is None
    # segment.go:320-325: subsegment only when kind != server AND
    # a parent id exists
    assert out[(2, "main")]["seg_type"] == "subsegment"
    assert out[(3, "main")]["seg_type"] is None


def test_trace_epoch_validation(spark):
    epoch = int(TID[:8], 16)
    ok = _run(spark, [_row()], now_epoch=epoch + 100)
    assert not ok[(1, "main")]["err"]
    stale = _run(spark, [_row()],
                 now_epoch=epoch + 60 * 60 * 24 * 28 + 1)
    assert stale[(1, "main")]["err"]
    future = _run(spark, [_row()], now_epoch=epoch - 60 * 5 - 1)
    assert future[(1, "main")]["err"]


def test_name_ladder(spark):
    out = _run(spark, [
        # server + aws.local.service wins over resource service.name
        _row(i=1, attrs={"aws.local.service": "local-svc"},
             res_attrs={"service.name": "res-svc"}),
        # client + aws.remote.service, AWS.SDK. trim needs aws-api
        _row(i=2, kind=3, parent_span_id="9" * 16,
             attrs={"aws.remote.service": "AWS.SDK.S3",
                    "rpc.system": "aws-api"}),
        # same but NOT an aws-api span: no trim
        _row(i=3, kind=3, parent_span_id="9" * 16,
             attrs={"aws.remote.service": "AWS.SDK.S3"}),
        # peer.service beats aws.service
        _row(i=4, kind=1, attrs={"peer.service": "peer",
                                 "aws.service": "DynamoDB"}),
        # aws.service sets namespace aws
        _row(i=5, kind=1, attrs={"aws.service": "DynamoDB"}),
        # db ladder with jdbc trim
        _row(i=6, kind=3, parent_span_id="9" * 16,
             attrs={"db.system": "mysql", "db.name": "customers",
                    "db.connection_string":
                        "jdbc:mysql://db.example.com:3306"}),
        # server falls back to resource service.name
        _row(i=7, res_attrs={"service.name": "res-svc"}),
        # sanitized span-name fallback: invalid chars stripped
        _row(i=8, kind=1, name="a<b>{c}"),
        _row(i=9, kind=1, name="<>{}"),
    ])
    assert out[(1, "main")]["name"] == "local-svc"
    assert out[(2, "main")]["name"] == "S3"
    assert out[(2, "main")]["namespace"] == "aws"
    assert out[(3, "main")]["name"] == "AWS.SDK.S3"
    assert out[(3, "main")]["namespace"] == "remote"  # client default
    assert out[(4, "main")]["name"] == "peer"
    assert out[(5, "main")]["name"] == "DynamoDB"
    assert out[(5, "main")]["namespace"] == "aws"
    assert out[(6, "main")]["name"] == "customers@db.example.com"
    assert out[(7, "main")]["name"] == "res-svc"
    assert out[(8, "main")]["name"] == "abc"
    assert out[(9, "main")]["name"] == "span"


def test_origin_ladder(spark):
    cases = {
        1: ({"cloud.provider": "aws", "cloud.platform": "aws_ec2"},
            "AWS::EC2::Instance"),
        2: ({"cloud.provider": "aws", "cloud.platform": "aws_ecs"},
            "AWS::ECS::Container"),
        3: ({"cloud.provider": "aws", "cloud.platform": "aws_ecs",
             "aws.ecs.launchtype": "fargate"}, "AWS::ECS::Fargate"),
        4: ({"cloud.provider": "aws", "cloud.platform": "aws_eks"},
            "AWS::EKS::Container"),
        5: ({"cloud.provider": "gcp", "cloud.platform": "aws_ec2"}, ""),
        6: ({"cloud.provider": "aws", "cloud.platform": "gcp_gke"}, ""),
        7: ({}, ""),
    }
    out = _run(spark, [_row(i=i, res_attrs=res)
                       for i, (res, _) in cases.items()])
    for i, (_, want) in cases.items():
        assert out[(i, "main")]["origin"] == want, i


def test_http_urls(spark):
    out = _run(spark, [
        # server URL from scheme+host+target
        _row(i=1, attrs={"http.method": "GET", "http.scheme": "https",
                         "http.host": "api.example.com",
                         "http.target": "/x?q=1"}),
        # default port elision + path/query tail
        _row(i=2, attrs={"http.method": "GET", "http.scheme": "http",
                         "net.host.name": "h", "net.host.port": "80",
                         "url.path": "/p", "url.query": "q=2"}),
        # client URL via net.peer.*
        _row(i=3, kind=3, parent_span_id="9" * 16,
             attrs={"http.method": "PUT", "http.scheme": "https",
                    "net.peer.name": "peer", "net.peer.port": "8443"}),
        # full url wins; x_forwarded_for from http.client_ip
        _row(i=4, attrs={"http.url": "https://e.com/full",
                         "http.client_ip": "1.2.3.4",
                         "http.status_code": "429"}),
        # net.peer.ip feeds client_ip without x_forwarded_for
        _row(i=5, attrs={"http.method": "GET",
                         "net.peer.ip": "5.6.7.8"}),
    ])
    assert out[(1, "main")]["http"]["url"] == \
        "https://api.example.com/x?q=1"
    assert out[(2, "main")]["http"]["url"] == "http://h/p?q=2"
    assert out[(3, "main")]["http"]["url"] == "https://peer:8443/"
    h4 = out[(4, "main")]["http"]
    assert h4["url"] == "https://e.com/full"
    assert h4["client_ip"] == "1.2.3.4"
    assert h4["x_forwarded_for"] is True
    assert h4["status"] == 429
    h5 = out[(5, "main")]["http"]
    assert h5["client_ip"] == "5.6.7.8"
    assert h5["x_forwarded_for"] is None


def test_error_fault_throttle(spark):
    out = _run(spark, [
        _row(i=1, attrs={"http.status_code": "404"}),
        _row(i=2, attrs={"http.status_code": "429"}),
        _row(i=3, attrs={"http.status_code": "503"}),
        _row(i=4, status_code=2, status_message="boom"),
        _row(i=5, status_code=2, attrs={"http.status_code": "404"}),
    ])
    assert (out[(1, "main")]["error"], out[(1, "main")]["fault"],
            out[(1, "main")]["throttle"]) == (True, False, False)
    assert out[(2, "main")]["throttle"] is True
    assert out[(3, "main")]["fault"] is True
    r4 = out[(4, "main")]
    assert r4["fault"] is True
    assert r4["exceptions"][0]["message"] == "boom"
    assert r4["exceptions"][0]["type"] == ""
    # a 4xx http code classifies as error, NOT fault, even when the
    # span status is Error (cause.go:174-186 switch order)
    r5 = out[(5, "main")]
    assert (r5["error"], r5["fault"]) == (True, False)


def test_status_text_fallback_consumed(spark):
    out = _run(spark, [
        _row(i=1, status_code=2,
             attrs={"http.status_text": "Service Unavailable"}),
        _row(i=2, status_code=0,
             attrs={"http.status_text": "kept"}),
    ])
    r1 = out[(1, "main")]
    assert r1["exceptions"][0]["message"] == "Service Unavailable"
    assert "http.status_text" not in (r1["metadata_default"] or {})
    # not an error span: the attr stays in metadata
    assert out[(2, "main")]["metadata_default"][
        "http.status_text"] == "kept"


def test_exception_event_stack_parsers(spark):
    java_st = ("java.lang.Boom: kapow\n"
               "\tat com.example.Foo.bar(Foo.java:42)\n"
               "\tat app//com.Base.run(Base.java:7)\n"
               "Caused by: java.lang.Root: deep\n"
               "\tat com.Deep.f(Deep.java:1)")
    py_st = ("Traceback (most recent call last):\n"
             '  File "main.py", line 10, in run\n'
             '  File "util.py", line 3, in helper\n'
             "ValueError: nope\n")
    rows = [
        _row(i=1, kind=3, parent_span_id="9" * 16,
             res_attrs={"telemetry.sdk.language": "java"},
             events=[dict(ts_ns=5, name="exception",
                          attrs={"exception.type": "java.lang.Boom",
                                 "exception.message": "kapow",
                                 "exception.stacktrace": java_st})]),
        _row(i=2, res_attrs={"telemetry.sdk.language": "python"},
             events=[dict(ts_ns=5, name="exception",
                          attrs={"exception.type": "ValueError",
                                 "exception.message": "nope",
                                 "exception.stacktrace": py_st})]),
        # aws-api individual http error event
        _row(i=3, kind=3, parent_span_id="9" * 16,
             attrs={"rpc.system": "aws-api"},
             events=[dict(ts_ns=1_500_000_000_000_000_000,
                          name="HTTP request failure",
                          attrs={"http.response.status_code": "503",
                                 "aws.http.error_message": "slow"})]),
    ]
    out = _run(spark, rows)
    e1 = out[(1, "main")]["exceptions"]
    assert [x["type"] for x in e1] == ["java.lang.Boom",
                                      "java.lang.Root"]
    assert e1[0]["remote"] is True  # client span
    assert e1[0]["cause"] == e1[1]["id"]
    # the classloader strip cuts to the FIRST '/', so the Java-11
    # "app//" prefix leaves a leading slash — replayed from
    # cause.go:246-250
    assert [tuple(f) for f in e1[0]["stack"]] == [
        ("Foo.java", "com.example.Foo.bar", 42),
        ("Base.java", "/com.Base.run", 7)]
    assert [tuple(f) for f in e1[1]["stack"]] == [
        ("Deep.java", "com.Deep.f", 1)]
    e2 = out[(2, "main")]["exceptions"]
    # python walks the traceback bottom-up
    assert [tuple(f) for f in e2[0]["stack"]] == [
        ("util.py", "helper", 3), ("main.py", "run", 10)]
    assert e2[0]["remote"] is False
    e3 = out[(3, "main")]["exceptions"]
    assert e3[0]["type"] == "aws.http.error.event"
    assert e3[0]["message"] == "503@1500000000.000000@slow"
    assert e3[0]["remote"] is True


def test_aws_block(spark):
    out = _run(spark, [
        _row(i=1, kind=3, parent_span_id="9" * 16,
             attrs={"aws.operation": "GetItem",
                    "aws.account_id": "123",
                    "aws.region": "us-east-1",
                    "aws.requestId": "r-1",
                    "aws.table.name": "t1",
                    "messaging.url": "https://sqs/q",
                    "aws.queue_url": "ignored"},
             res_attrs={"cloud.provider": "aws"}),
        # rpc.method fallback for operation
        _row(i=2, attrs={"rpc.method": "Scan"}),
        # non-aws cloud -> no aws block at all
        _row(i=3, attrs={"aws.operation": "X"},
             res_attrs={"cloud.provider": "gcp"}),
    ])
    a1 = out[(1, "main")]["aws"]
    assert (a1["operation"], a1["account_id"], a1["remote_region"],
            a1["request_id"], a1["table_name"], a1["queue_url"]) == \
        ("GetItem", "123", "us-east-1", "r-1", "t1", "https://sqs/q")
    assert out[(2, "main")]["aws"]["operation"] == "Scan"
    assert out[(3, "main")]["aws"] is None
    # consumed keys don't leak into metadata
    assert "aws.operation" not in (
        out[(1, "main")]["metadata_default"] or {})


def test_aws_cwlogs_and_metadata_blocks(spark):
    arn = ("arn:aws:logs:us-east-1:1:log-group:/aws/eks/g1:*&"
           "arn:aws:logs:us-east-1:1:log-group:/aws/eks/g2:*")
    out = _run(spark, [
        _row(i=1, res_attrs={"cloud.provider": "aws",
                             "aws.log.group.arns": arn}),
        _row(i=2, res_attrs={"cloud.provider": "aws",
                             "aws.log.group.names": "g3&g4"}),
        _row(i=3),
        _row(i=4, res_attrs={
            "cloud.provider": "aws",
            "cloud.platform": "aws_elastic_beanstalk",
            "service.namespace": "env1", "service.instance.id": "42",
            "service.version": "v9"}),
        _row(i=5, res_attrs={"cloud.provider": "aws",
                             "k8s.cluster.name": "c1",
                             "k8s.pod.name": "p1",
                             "container.id": "cid"}),
    ], log_group_names=("cfg-group",))
    c1 = out[(1, "main")]["aws"]["cwlogs"]
    assert [(x["log_group"], x["arn"] is not None) for x in c1] == [
        ("/aws/eks/g1", True), ("/aws/eks/g2", True)]
    c2 = out[(2, "main")]["aws"]["cwlogs"]
    assert [x["log_group"] for x in c2] == ["g3", "g4"]
    assert [x["log_group"]
            for x in out[(3, "main")]["aws"]["cwlogs"]] == ["cfg-group"]
    b = out[(4, "main")]["aws"]["beanstalk"]
    assert (b["environment"], b["deployment_id"],
            b["version_label"]) == ("env1", 42, "v9")
    e = out[(5, "main")]["aws"]["eks"]
    assert (e["cluster_name"], e["pod"], e["container_id"]) == \
        ("c1", "p1", "cid")


def test_sql_block_gate(spark):
    out = _run(spark, [
        _row(i=1, name="q1",
             attrs={"db.system": "postgresql", "db.name": "db1",
                    "db.statement": "SELECT 1", "db.user": "u"}),
        _row(i=2, attrs={"db.system": "redis", "db.name": "0"}),
    ])
    s1 = out[(1, "main")]["sql"]
    assert (s1["url"], s1["connection_string"], s1["database_type"],
            s1["user"], s1["sanitized_query"]) == \
        ("q1", "localhost/db1", "postgresql", "u", "SELECT 1")
    # non-SQL systems keep their attrs and get no sql block
    assert out[(2, "main")]["sql"] is None
    assert out[(2, "main")]["metadata_default"]["db.system"] == "redis"


def test_annotations_indexing_and_metadata_ns(spark):
    out = _run(spark, [
        _row(i=1, attrs={
            "custom.key": "v1", "other": "v2",
            "aws.xray.annotations": "listed.key",
            "listed.key": "v3",
            "aws.xray.metadata.ns1": '{"a": "1"}',
            "aws.xray.metadata.default": '{"d": "2"}',
            "aws.xray.metadata.bad": 'not-json',
            "enduser.id": "user-1"}),
        _row(i=2, attrs={"a b": "v"}, parent_span_id="",
             kind=3),  # fixAnnotationKey under index_all
    ], indexed_attrs=("custom.key",))
    r1 = out[(1, "main")]
    assert r1["user"] == "user-1"
    assert r1["annotations"] == {"custom.key": "v1",
                                 "listed.key": "v3"}
    md = r1["metadata_default"]
    assert md["other"] == "v2"
    assert md["d"] == "2"  # default namespace merged
    assert md["aws.xray.metadata.bad"] == "not-json"
    assert "enduser.id" not in md
    assert r1["metadata_ns"] == {"ns1": '{"a": "1"}'}

    out2 = _run(spark, [_row(i=2, kind=3, parent_span_id="",
                             attrs={"a b": "v"})],
                index_all_attrs=True)
    assert out2[(2, "main")]["annotations"] == {"a_b": "v"}


def test_indexed_attr_readd_from_consumed(spark):
    # segment.go:590-601 — an indexed attr that makeHTTP consumed is
    # re-added for annotation
    out = _run(spark, [_row(i=1, attrs={"http.method": "GET"})],
               indexed_attrs=("http.method",))
    assert out[(1, "main")]["annotations"]["http.method"] == "GET"


def test_local_root_fan(spark):
    out = _run(spark, [
        _row(i=1, kind=3, parent_span_id="9" * 16,
             attrs={"aws.span.kind": "LOCAL_ROOT",
                    "aws.local.service": "local-svc",
                    "aws.remote.service": "remote-svc",
                    "aws.remote.operation": "op2"}),
        # local-root server span: single segment, type/ns cleared
        _row(i=2, kind=2, parent_span_id="9" * 16,
             attrs={"aws.span.kind": "LOCAL_ROOT"}),
    ])
    dep = out[(1, "dep")]
    svc = out[(1, "svc")]
    assert dep["seg_type"] == "subsegment"
    assert dep["namespace"] == "remote"
    assert dep["name"] == "remote-svc"
    assert dep["parent_id"] == svc["seg_id"]
    assert svc["seg_type"] is None
    assert svc["namespace"] is None
    assert svc["name"] == "local-svc"
    assert svc["parent_id"] == "9" * 16
    assert svc["http"] is None
    # the four remote annotations are gone from svc metadata
    assert "aws.remote.service" not in (svc["metadata_default"] or {})
    r2 = out[(2, "main_lr")]
    assert r2["seg_type"] is None and r2["namespace"] is None


def test_remote_namespace_for_subsegment_with_remote_service(spark):
    # segment.go:127-137
    out = _run(spark, [
        _row(i=1, kind=4, parent_span_id="9" * 16,
             attrs={"aws.remote.service": "svc-x"}),
        _row(i=2, kind=4, parent_span_id="9" * 16),
    ])
    assert out[(1, "main")]["namespace"] == "remote"
    assert out[(2, "main")]["namespace"] is None


def test_span_links(spark):
    out = _run(spark, [
        _row(i=1, links=[dict(trace_id="58406520" + "d" * 24,
                              span_id="4" * 16, attrs={"k": "v"})]),
        _row(i=2, links=[dict(trace_id="zz", span_id="4" * 16,
                              attrs={})]),
    ])
    l1 = out[(1, "main")]["links"][0]
    assert l1["trace_id"] == "1-58406520-" + "d" * 24
    assert l1["span_id"] == "4" * 16
    assert l1["attrs"] == {"k": "v"}
    assert out[(2, "main")]["err"]  # bad link trace id dead-letters


def test_response_content_length_from_events(spark):
    out = _run(spark, [
        _row(i=1, attrs={"http.method": "GET", "message.type":
                         "RECEIVED",
                         "messaging.message.payload_size_bytes": "7"}),
        _row(i=2, attrs={"http.method": "GET"},
             events=[dict(ts_ns=1, name="x",
                          attrs={"message.type": "RECEIVED",
                                 "messaging.message.payload_size_bytes":
                                     "11"})]),
    ])
    assert out[(1, "main")]["http"]["content_length"] == 7
    assert out[(2, "main")]["http"]["content_length"] == 11

"""Round-5: zipkin v2 JSON → OTLP span translation, pinning
pkg/translator/zipkin/zipkinv2/to_translator.go semantics.
"""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.operators.zipkin import (
    zipkin_v2_parse,
)


def _parse(spark, lines, **kw):
    df = spark.createDataFrame([(ln,) for ln in lines], "body string")
    return zipkin_v2_parse(df, **kw).collect()


def test_zipkin_basic_span(spark):
    rows = _parse(
        spark,
        [
            '{"traceId":"abc","id":"1f","parentId":"0e","name":"get /",'
            '"kind":"SERVER","timestamp":1700000000000000,"duration":1500,'
            '"localEndpoint":{"serviceName":"front","ipv4":"10.0.0.1",'
            '"port":8080},'
            '"remoteEndpoint":{"serviceName":"client","ipv4":"10.0.0.9"},'
            '"tags":{"http.method":"GET","service.version":"v1",'
            '"otel.library.name":"lib","otel.library.version":"1.2"}}',
        ],
    )
    r = rows[0]
    assert r["zk_ok"] is True
    assert r["zk_trace_id"] == "0" * 29 + "abc"
    assert r["zk_span_id"] == "0" * 14 + "1f"
    assert r["zk_parent_id"] == "0" * 14 + "0e"
    assert r["zk_kind"] == "server"
    assert r["zk_start_ns"] == 1700000000000000000
    assert r["zk_end_ns"] == 1700000000000000000 + 1500 * 1000
    assert r["zk_service"] == "front"
    # service.version is a nonSpanAttribute -> resource, not span
    assert r["zk_resource_attrs"] == "service.name=front,service.version=v1"
    assert r["zk_scope_name"] == "lib" and r["zk_scope_version"] == "1.2"
    assert r["zk_attrs"] == (
        "http.method=GET,net.host.ip=10.0.0.1,net.host.port=8080,"
        "net.peer.ip=10.0.0.9,peer.service=client"
    )


def test_zipkin_parent_self_and_kind_tag(spark):
    rows = _parse(
        spark,
        [
            # parent == own id -> suppressed (to_translator.go:213-216)
            '{"traceId":"a1","id":"2f","parentId":"2f","name":"n",'
            '"timestamp":1,"tags":{"span.kind":"internal"}}',
            # span.kind tag consumed even when not "internal"
            '{"traceId":"a1","id":"30","name":"n","timestamp":1,'
            '"tags":{"span.kind":"weird"}}',
            # direct kind -> span.kind tag NOT consumed
            '{"traceId":"a1","id":"31","name":"n","kind":"CLIENT",'
            '"timestamp":1,"tags":{"span.kind":"internal"}}',
        ],
    )
    assert rows[0]["zk_parent_id"] is None
    assert rows[0]["zk_kind"] == "internal"
    assert rows[0]["zk_attrs"] == ""
    assert rows[1]["zk_kind"] == "unspecified"
    assert rows[1]["zk_attrs"] == ""
    assert rows[2]["zk_kind"] == "client"
    assert rows[2]["zk_attrs"] == "span.kind=internal"


def test_zipkin_status_and_tracestate(spark):
    rows = _parse(
        spark,
        [
            '{"traceId":"a","id":"1","timestamp":1,"tags":'
            '{"otel.status_code":"STATUS_CODE_OK",'
            '"otel.status_description":"fine","w3c.tracestate":"k=v"}}',
            # error tag: forces 2; value != "true" stays as attribute
            '{"traceId":"a","id":"2","timestamp":1,"tags":{"error":"boom"}}',
            '{"traceId":"a","id":"3","timestamp":1,"tags":{"error":"true"}}',
            # description without code stays an attribute
            '{"traceId":"a","id":"4","timestamp":1,"tags":'
            '{"otel.status_description":"orphan"}}',
            # exporter-spelling names (issue 14965)
            '{"traceId":"a","id":"5","timestamp":1,"tags":'
            '{"otel.status_code":"Error"}}',
        ],
    )
    assert (rows[0]["zk_status_code"], rows[0]["zk_status_msg"]) == (1, "fine")
    assert rows[0]["zk_trace_state"] == "k=v"
    assert rows[0]["zk_attrs"] == ""
    assert rows[1]["zk_status_code"] == 2
    assert rows[1]["zk_attrs"] == "error=boom"
    assert rows[2]["zk_status_code"] == 2 and rows[2]["zk_attrs"] == ""
    assert rows[3]["zk_status_code"] == 0
    assert rows[3]["zk_attrs"] == "otel.status_description=orphan"
    assert rows[4]["zk_status_code"] == 2


def test_zipkin_absent_timestamp(spark):
    rows = _parse(
        spark,
        ['{"traceId":"a","id":"1","duration":2000}'],
    )
    r = rows[0]
    assert r["zk_start_ns"] == 0
    assert r["zk_end_ns"] == 2000 * 1000
    assert r["zk_attrs"] == "otel.zipkin.absentField.startTime=true"


def test_zipkin_no_service_drops_semconv_tags(spark):
    # populateResourceFromZipkinSpan early-returns, but tagsToAttributeMap
    # still skips nonSpanAttributes keys (:418-431,441-446)
    rows = _parse(
        spark,
        ['{"traceId":"a","id":"1","timestamp":1,'
         '"tags":{"host.name":"h1","x":"y"}}'],
    )
    r = rows[0]
    assert r["zk_service"] == "OTLPResourceNoServiceName"
    assert r["zk_resource_attrs"] == ""
    assert r["zk_attrs"] == "x=y"


def test_zipkin_service_name_source(spark):
    rows = _parse(
        spark,
        ['{"traceId":"a","id":"1","timestamp":1,'
         '"localEndpoint":{"serviceName":"svc"},'
         '"tags":{"otlp.service.name.source":"faas.name"}}'],
    )
    assert rows[0]["zk_resource_attrs"] == "faas.name=svc"


def test_zipkin_events_and_links(spark):
    rows = _parse(
        spark,
        [
            # simple annotation + full-form annotation
            '{"traceId":"a","id":"1","timestamp":1,"annotations":'
            '[{"timestamp":5,"value":"wakeup"},'
            '{"timestamp":6,"value":"ev|{\\"k\\":\\"v\\",\\"n\\":3}|2"}]}',
            # link tag (5 parts)
            '{"traceId":"a","id":"2","timestamp":1,"tags":'
            '{"otlp.link.0":"' + "ab" * 16 + "|" + "cd" * 8
            + '|state|{\\"q\\":1}|4"}}',
            # gap: link.1 without link.0 is ignored
            '{"traceId":"a","id":"3","timestamp":1,"tags":'
            '{"otlp.link.1":"x|y|s|{}|0"}}',
            # bad dropped count -> row error (the reference fails the batch)
            '{"traceId":"a","id":"4","timestamp":1,"annotations":'
            '[{"timestamp":6,"value":"ev|{}|notanumber"}]}',
        ],
    )
    assert rows[0]["zk_events"] == (
        '5000|wakeup||0;6000|ev|{"k":"v","n":3}|2'
    )
    assert rows[0]["zk_ok"] is True
    assert rows[1]["zk_links"] == (
        "ab" * 16 + "|" + "cd" * 8 + '|state|{"q":1}|4'
    )
    assert rows[2]["zk_links"] == "" and rows[2]["zk_ok"] is True
    assert rows[3]["zk_ok"] is False


def test_zipkin_invalid_ids(spark):
    rows = _parse(
        spark,
        [
            '{"traceId":"xyz","id":"1","timestamp":1}',      # non-hex
            '{"id":"1","timestamp":1}',                       # no traceId
            '{"traceId":"a","id":"' + "1" * 17 + '","timestamp":1}',
            'not json',
        ],
    )
    assert [r["zk_ok"] for r in rows] == [False, False, False, False]

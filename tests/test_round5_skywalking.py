"""Round-5: SkyWalking SegmentObject → OTLP span translation, pinning
pkg/translator/skywalking/skywalkingproto_to_traces.go semantics.
"""
from __future__ import annotations

import json

from opentelemetry_collector_contrib_spark.operators.skywalking import (
    skywalking_segments_to_spans,
)

SEG = "56a5e1c519ae4c76a2b8b11d92cead7f.12.16563474296430001"
SEG_SHORT = "aab5e1c519ae4c76a2b8b11d92cead7f"
UUID = "de5980b8-fce3-4a37-aab9-b4ac3af7eedd"


def _sw_uuid(s, extra):
    if len(s) < 32:
        return bytes(16)
    uid = bytearray.fromhex(s[:32])
    e = extra
    for i in range(4):
        uid[i] ^= e & 0xFF
        e >>= 8
    if len(s) == 32:
        return bytes(uid)
    i1, i2 = s.find("."), s.rfind(".")
    mid, last = int(s[i1 + 1:i2]), int(s[i2 + 1:])
    for i in range(4, 8):
        uid[i] ^= mid & 0xFF
        mid >>= 8
    for i in range(8, 16):
        uid[i] ^= last & 0xFF
        last >>= 8
    return bytes(uid)


def _seg2span(seg, sid):
    u = _sw_uuid(seg, sid & 0xFFFFFFFF)
    return bytes(u[i] ^ u[i + 8] for i in range(8)).hex()


def _parse(spark, segments):
    df = spark.createDataFrame(
        [(json.dumps(b) if not isinstance(b, str) else b,) for b in segments],
        "body string",
    )
    return sorted(
        skywalking_segments_to_spans(df).collect(),
        key=lambda r: (r["sw_trace_id"], r["sw_span_id"]),
    )


def _seg(spans, trace=SEG, **kw):
    base = {"traceId": trace, "traceSegmentId": SEG, "service": "svc",
            "serviceInstance": "inst", "spans": spans}
    base.update(kw)
    return base


def _span(**kw):
    base = {"spanId": 1, "parentSpanId": -1, "startTime": 100,
            "endTime": 200, "operationName": "op", "spanType": "Entry",
            "spanLayer": "Http", "isError": False}
    base.update(kw)
    return base


def test_id_folds_match_reference_math(spark):
    (r,) = _parse(spark, [_seg([_span(spanId=9, parentSpanId=4)])])
    assert r["sw_span_id"] == _seg2span(SEG, 9)
    assert r["sw_parent_id"] == _seg2span(SEG, 4)
    assert r["sw_trace_id"] == _sw_uuid(SEG, 0).hex()


def test_trace_id_uuid_and_fallbacks(spark):
    rows = _parse(spark, [
        _seg([_span()], trace=UUID),
        _seg([_span()], trace="not-a-uuid"),
        _seg([_span()], trace="56a5e1c519ae4c76a2b8b11d92cead7f"),
    ])
    ids = sorted(r["sw_trace_id"] for r in rows)
    assert "0" * 32 in ids                       # parse failure → empty
    assert UUID.replace("-", "") in ids
    assert "56a5e1c519ae4c76a2b8b11d92cead7f" in ids  # 32-hex plain form


def test_parent_resolution(spark):
    # -1 + exactly one ref → the ref's (segment, spanId)
    ref = {"refType": "CrossProcess", "traceId": UUID,
           "parentTraceSegmentId": SEG_SHORT, "parentSpanId": 3,
           "parentService": "ps", "parentServiceInstance": "pi",
           "parentEndpoint": "/e", "networkAddressUsedAtPeer": "n:1"}
    (r,) = _parse(spark, [_seg([_span(refs=[ref])])])
    assert r["sw_parent_id"] == _seg2span(SEG_SHORT, 3)
    assert r["sw_links"].startswith(
        UUID.replace("-", "") + "|" + _seg2span(SEG_SHORT, 3) + "|"
    )
    assert "refType=CrossProcess" in r["sw_links"]
    assert "sw8.parent_span_id=3" in r["sw_links"]
    # -1 + two refs → NO parent, but both links kept
    (r,) = _parse(spark, [_seg([_span(refs=[ref, dict(ref, parentSpanId=5)])])])
    assert r["sw_parent_id"] is None
    assert r["sw_links"].count(";") == 1


def test_malformed_segment_ids_zero(spark):
    (r,) = _parse(spark, [_seg([_span()], traceSegmentId="short")])
    assert r["sw_span_id"] == "0" * 16          # len<32 → empty span id
    # >32 chars, dot not at index 32 → zero uuid (Go returns blank dst)
    (r,) = _parse(
        spark, [_seg([_span()], traceSegmentId=SEG_SHORT + "ff.1.2x")]
    )
    assert r["sw_span_id"] == "0" * 16


def test_resource_uses_last_span_tags_only(spark):
    spans = [
        _span(spanId=1, tags=[{"key": "url", "value": "http://a"}]),
        _span(spanId=2, tags=[{"key": "db.type", "value": "pg"},
                              {"key": "unmapped", "value": "x"}]),
    ]
    r1, r2 = sorted(_parse(spark, [_seg(spans)]), key=lambda r: r["sw_attrs"])
    expect = ("db.system=pg,service.instance.id=inst,service.name=svc,"
              "sw8.trace_id=" + SEG)
    assert r1["sw_resource_attrs"] == expect
    assert r2["sw_resource_attrs"] == expect    # url from span1 is gone


def test_kind_matrix_and_status(spark):
    def kind(span_type, layer):
        (r,) = _parse(spark, [_seg([_span(spanType=span_type,
                                          spanLayer=layer)])])
        return r["sw_kind"]

    assert kind("Entry", "MQ") == "consumer"
    assert kind("Exit", "MQ") == "producer"
    assert kind("Local", "MQ") == "unspecified"
    assert kind("Exit", "Http") == "client"
    assert kind("Entry", "Database") == "server"
    assert kind("Local", "Unknown") == "internal"
    assert kind("Wat", "Http") == "unspecified"
    (r,) = _parse(spark, [_seg([_span(isError=True)])])
    assert (r["sw_status_code"], r["sw_status_msg"]) == (2, "ERROR")
    (r,) = _parse(spark, [_seg([_span()])])
    assert (r["sw_status_code"], r["sw_status_msg"]) == (1, "SUCCESS")


def test_events_and_attrs(spark):
    logs = [{"time": 7, "data": [{"key": "b", "value": "2"},
                                 {"key": "a", "value": "1"}]},
            {"time": 9}]  # empty data → event kept, no attrs
    (r,) = _parse(
        spark,
        [_seg([_span(spanId=4, parentSpanId=2, logs=logs,
                     tags=[{"key": "t", "value": "v"}])])],
    )
    assert r["sw_events"] == "7000000|logs|a=1,b=2;9000000|logs|"
    assert r["sw_attrs"] == (
        f"sw8.parent_span_id=2,sw8.segment_id={SEG},sw8.span_id=4,t=v"
    )
    assert r["sw_start_ns"] == 100_000_000      # ms → ns (UnixMilli)

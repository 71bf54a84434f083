"""Round-5: libhoney (Honeycomb) event → OTLP translation, pinning
receiver/libhoneyreceiver/internal semantics (libhoneyevent.go,
parser.go, eventtime.go)."""
from __future__ import annotations

import json

from opentelemetry_collector_contrib_spark.operators.libhoney import (
    libhoney_events_parse,
)


def _fnv64a(data: bytes, h: int = 0xCBF29CE484222325) -> int:
    for b in data:
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def _le_hex(n: int) -> str:
    return n.to_bytes(8, "little").hex()


def _span_id_from(s: str) -> str:
    """spanIDFrom (libhoneyevent.go:157-164)."""
    return _le_hex(_fnv64a(s.encode()))


def _trace_id_from(s: str) -> str:
    """traceIDFrom (:166-176): the second Write continues the state."""
    h1 = _fnv64a(s.encode())
    return _le_hex(h1) + _le_hex(_fnv64a(s.encode(), h1))


def _parse(spark, events, dataset="ds"):
    rows = [(json.dumps(e), dataset) for e in events]
    df = spark.createDataFrame(rows, "body string, dataset string")
    return libhoney_events_parse(df).collect()


T0 = "2024-05-06T07:08:09.1234567Z"
# Spark timestamps are micros: the RFC3339Nano sub-microsecond digits
# truncate (the reference keeps them; documented divergence)
T0_NS = 1714979289123456000


def test_span_basic(spark):
    r = _parse(
        spark,
        [
            {
                "time": T0,
                "samplerate": 4,
                "data": {
                    "meta.signal_type": "trace",
                    "service.name": "svc",
                    "library.name": "lib",
                    "library.version": "2.1",
                    "name": "GET /",
                    "trace.trace_id": "AA-BB" + "0" * 28,  # dashes stripped
                    "trace.span_id": "00-11223344556677",
                    "trace.parent_id": "f" * 16,
                    "span.kind": "server",
                    "duration_ms": 2.5,
                    "error": False,  # presence alone -> status 2
                    "status_message": "boom",
                    "http.method": "GET",
                    "retries": 3,
                    "ratio": 0.25,
                    "ok": True,
                    "nested": {"a": 1},  # non-scalar -> dropped
                    "gone": None,  # nil -> dropped
                },
            }
        ],
    )[0]
    assert r["lh_signal"] == "span"
    assert r["lh_service"] == "svc"
    assert r["lh_scope_name"] == "lib"
    assert r["lh_scope_version"] == "2.1"
    assert r["lh_ts_ns"] == T0_NS
    assert r["lh_trace_id"] == "aabb" + "0" * 28
    assert r["lh_span_id"] == "0011223344556677"
    assert r["lh_parent_id"] == "f" * 16
    assert r["lh_end_ns"] == T0_NS + 2_500_000
    assert r["lh_kind"] == "server"
    assert r["lh_status_code"] == 2
    assert r["lh_status_msg"] == "boom"
    # excluded: base + trace fields + duration_ms; status_message and
    # meta.signal_type STAY (ToPTraceSpan loop has no meta skip)
    assert r["lh_attrs"] == (
        "SampleRate=4,http.method=GET,meta.signal_type=trace,ok=true,"
        "ratio=0.25,retries=3,status_message=boom"
    )
    assert r["lh_ok"] is True


def test_signal_routing_and_defaults(spark):
    rows = _parse(
        spark,
        [
            {"time": T0, "data": {"x": "1"}},  # no signal -> log
            {"time": T0, "data": {"meta.signal_type": "weird"}},  # -> log
            {"time": T0, "data": {"meta.signal_type": "log"}},
            {"time": T0, "data": {"meta.signal_type": "trace"}},  # -> span
            {
                "time": T0,
                "data": {
                    "meta.signal_type": "trace",
                    "meta.annotation_type": "bogus",  # invalid -> span
                },
            },
            {
                "time": T0,
                "data": {
                    "meta.signal_type": "trace",
                    "meta.annotation_type": "span_event",
                    "name": "ev",
                    "trace.parent_id": "a" * 16,
                },
            },
            {
                "time": T0,
                "data": {
                    "meta.signal_type": "trace",
                    "meta.annotation_type": "link",
                    "trace.parent_id": "a" * 16,
                    "trace.link.trace_id": "b" * 32,
                    "trace.link.span_id": "c" * 16,
                },
            },
        ],
    )
    assert [r["lh_signal"] for r in rows] == [
        "log", "log", "log", "span", "span", "span_event", "span_link",
    ]
    # defaults on the bare span: samplerate 1, kind unspecified, status 0
    sp = rows[3]
    assert sp["lh_samplerate"] == 1
    assert sp["lh_kind"] == "unspecified"
    assert sp["lh_status_code"] == 0 and sp["lh_status_msg"] == ""
    assert sp["lh_name"] == ""
    assert sp["lh_trace_id"] is None and sp["lh_span_id"] is None


def test_scope_and_service(spark):
    rows = _parse(
        spark,
        [
            # no library.name -> seeded libhoney.receiver scope whose
            # service is the DATASET even though the event has its own
            # service.name (parser.go:46-52 + GetScope error path)
            {"time": T0, "data": {"service.name": "svc"}},
            # library without version -> "unset"
            {"time": T0, "data": {"service.name": "svc", "library.name": "l"}},
        ],
    )
    assert rows[0]["lh_service"] == "ds"
    assert rows[0]["lh_scope_name"] == "libhoney.receiver"
    assert rows[0]["lh_scope_version"] == "1.0.0"
    assert rows[1]["lh_service"] == "svc"
    assert rows[1]["lh_scope_name"] == "l"
    assert rows[1]["lh_scope_version"] == "unset"
    # service.name/library.* are consumed even in the seeded-scope case
    assert rows[0]["lh_attrs"] == "SampleRate=1"


def test_event_time_forms(spark):
    rows = _parse(
        spark,
        [
            {"time": "1714979289", "data": {}},  # 10-digit seconds
            {"time": "1714979289123", "data": {}},  # ms -> sec.frac modf
            {"time": "1714979289.25", "data": {}},  # float seconds
            {"time": "123456789", "data": {}},  # 9 digits: ref zero-time
            {"time": "not a time", "data": {}},
            {"data": {}},  # absent: ref stamps now() -> null here
        ],
    )
    assert rows[0]["lh_ts_ns"] == 1714979289 * 10**9
    # float64 modf replay: 0.123 * 1e9 truncated
    sec, frac = 1714979289, 0.123
    assert rows[1]["lh_ts_ns"] == sec * 10**9 + int(
        (float("1714979289.123") - sec) * 1e9
    )
    assert rows[2]["lh_ts_ns"] == 1714979289 * 10**9 + int(
        (float("1714979289.25") - 1714979289) * 1e9
    )
    assert rows[3]["lh_ts_ns"] is None
    assert rows[4]["lh_ts_ns"] is None
    assert rows[5]["lh_ts_ns"] is None


def test_fnv_id_fallbacks(spark):
    rows = _parse(
        spark,
        [
            {
                "time": T0,
                "data": {
                    "meta.signal_type": "trace",
                    "trace.trace_id": "req-abc",  # bad hex -> FNV(stripped)
                    "trace.span_id": "op-7",
                    "trace.parent_id": "zz",  # bad -> FNV of RAW value
                },
            },
            {
                "time": T0,
                "data": {
                    "meta.signal_type": "trace",
                    # 40 hex chars: valid decode but != 16 bytes -> FNV
                    "trace.trace_id": "ab" * 20,
                    # parent >= 16 bytes: LAST 8 bytes
                    "trace.parent_id": "11" * 12 + "aabbccddeeff0011",
                },
            },
            {
                "time": T0,
                "data": {
                    "meta.signal_type": "trace",
                    # parent 8..15 bytes: FIRST 8 bytes
                    "trace.parent_id": "AABBCCDDEEFF0011" + "2233",
                    # parent with dashes stripped before decode
                },
            },
            {
                "time": T0,
                "data": {
                    "meta.signal_type": "trace",
                    # 12 hex chars = 6 bytes: decode ok but < 8 -> FNV RAW
                    "trace.parent_id": "a-a" + "b" * 10,
                },
            },
        ],
    )
    assert rows[0]["lh_trace_id"] == _trace_id_from("reqabc")
    assert rows[0]["lh_span_id"] == _span_id_from("op7")
    assert rows[0]["lh_parent_id"] == _span_id_from("zz")
    assert rows[1]["lh_trace_id"] == _trace_id_from("ab" * 20)
    assert rows[1]["lh_parent_id"] == "aabbccddeeff0011"
    assert rows[2]["lh_parent_id"] == "aabbccddeeff0011"
    assert rows[3]["lh_parent_id"] == _span_id_from("a-ab" + "b" * 9)


def test_log_fields(spark):
    r = _parse(
        spark,
        [
            {
                "time": T0,
                "samplerate": 2,
                "data": {
                    "meta.signal_type": "log",
                    "severity_code": 13,
                    "severity_text": "warn",
                    "flags": 1,
                    "body": "hello",
                    "k": "v",
                },
            }
        ],
    )[0]
    assert r["lh_severity_number"] == 13
    assert r["lh_severity_text"] == "warn"
    assert r["lh_flags"] == 1
    assert r["lh_body"] == "hello"
    # consumed: severity_*/flags/body + base; meta.signal_type stays
    assert r["lh_attrs"] == "SampleRate=2,k=v,meta.signal_type=log"
    assert r["lh_trace_id"] is None and r["lh_end_ns"] is None


def test_span_event_and_link_attrs(spark):
    rows = _parse(
        spark,
        [
            {
                "time": T0,
                "data": {
                    "meta.signal_type": "trace",
                    "meta.annotation_type": "span_event",
                    "name": "ev",
                    "trace.parent_id": "a" * 16,
                    "error": True,  # trace field: excluded (mutated slice)
                    "k": "v",
                },
            },
            {
                "time": T0,
                "data": {
                    "meta.signal_type": "trace",
                    "meta.annotation_type": "link",
                    "trace.parent_id": "a" * 16,
                    "trace.link.trace_id": "B" * 32,  # case preserved in Go,
                    "trace.link.span_id": "c" * 16,  # hex canon lower here
                    "trace.link.other": "x",  # prefix-excluded
                    "k2": "v2",
                },
            },
            {
                "time": T0,
                "data": {
                    "meta.signal_type": "trace",
                    "meta.annotation_type": "link",
                    "trace.parent_id": "a" * 16,
                    "trace.link.trace_id": "b-b" + "b" * 30,  # NO dash strip
                    "trace.link.span_id": "c" * 16,
                },
            },
            {
                "time": T0,
                "data": {
                    "meta.signal_type": "trace",
                    "meta.annotation_type": "link",
                    "trace.parent_id": "a" * 16,
                    "trace.link.trace_id": "b" * 32,
                    "trace.link.span_id": "c" * 15,  # wrong length
                },
            },
        ],
    )
    ev = rows[0]
    assert ev["lh_name"] == "ev"
    assert ev["lh_parent_id"] == "a" * 16
    # no SampleRate on events; meta.* and trace fields excluded
    assert ev["lh_attrs"] == "k=v"
    lk = rows[1]
    assert lk["lh_link_trace_id"] == "b" * 32
    assert lk["lh_link_span_id"] == "c" * 16
    assert lk["lh_attrs"] == "k2=v2"
    assert lk["lh_ok"] is True
    assert rows[2]["lh_ok"] is False  # dashes not stripped on link ids
    assert rows[3]["lh_ok"] is False


def test_samplerate_collision_data_wins(spark):
    # PutInt("SampleRate") happens BEFORE the data loop, so a literal
    # data field overwrites it (pcommon map Put semantics)
    r = _parse(
        spark,
        [{"time": T0, "samplerate": 9, "data": {"SampleRate": "override"}}],
    )[0]
    assert r["lh_attrs"] == "SampleRate=override,meta.signal_type".replace(
        ",meta.signal_type", ""
    )


def test_bad_json_dropped(spark):
    df = spark.createDataFrame(
        [("{not json", "ds"), ('{"time":"%s","data":{}}' % T0, "ds")],
        "body string, dataset string",
    )
    out = libhoney_events_parse(df).collect()
    assert len(out) == 1

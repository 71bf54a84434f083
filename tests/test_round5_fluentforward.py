"""Round-5: Fluent Forward (msgpack) receiver, pinning
receiver/fluentforwardreceiver conversion.go + server.go."""
from __future__ import annotations

import gzip
import json

import pytest

from opentelemetry_collector_contrib_spark.operators.fluentforward import (
    EventTime,
    MsgpackError,
    fluent_forward_to_logs,
    msgpack_decode,
    msgpack_encode,
)


def _roundtrip(v):
    out, end = msgpack_decode(msgpack_encode(v))
    return out


def test_msgpack_roundtrip():
    cases = [None, True, False, 0, 1, 127, -1, -32, 300, 2**40,
             -(2**40), 1.5, "x", "s" * 40, b"\x01\x02",
             [1, "a", [2]], {"k": 1, "n": {"m": False}}]
    for c in cases:
        got = _roundtrip(c)
        if isinstance(c, bytes):
            assert got == c
        else:
            assert got == c, c
    et = _roundtrip(EventTime(1714978800, 123456789))
    assert (et.sec, et.nsec) == (1714978800, 123456789)
    with pytest.raises(MsgpackError):
        msgpack_decode(b"\xc1")  # never-used byte
    with pytest.raises(MsgpackError):
        msgpack_decode(b"\xa5ab")  # truncated fixstr


def _run(spark, msgs):
    df = spark.createDataFrame(
        [(i, m) for i, m in enumerate(msgs)], "row_id int, msg binary"
    )
    rows = fluent_forward_to_logs(df).collect()
    return sorted(rows, key=lambda r: (r.row_id, r.ff_idx or 0))


REC = {"message": "hello", "level": "info", "pid": 42, "ok": True}


def test_message_mode(spark):
    msgs = [
        msgpack_encode(["app.a", 1714978800, REC]),
        msgpack_encode(["app.b", EventTime(1714978800, 500),
                        {"log": "fb", "svc": b"api"},
                        {"chunk": "p8n9gJbakYRKX=="}]),
    ]
    r0, r1 = _run(spark, msgs)
    assert r0.ff_ok and r0.ff_mode == "message" and r0.ff_tag == "app.a"
    assert r0.ff_ts_ns == 1714978800 * 10**9
    assert r0.ff_body == '"hello"'
    assert json.loads(r0.ff_attrs) == {
        "fluent.tag": "app.a", "level": "info", "pid": 42, "ok": True}
    assert r0.ff_chunk is None
    # fluentbit uses the log key; binary values become strings (:104-107)
    assert r1.ff_body == '"fb"' and r1.ff_ts_ns == 1714978800 * 10**9 + 500
    assert json.loads(r1.ff_attrs)["svc"] == "api"
    assert r1.ff_chunk == "p8n9gJbakYRKX=="


def test_forward_mode(spark):
    ev = ["tail.0", [[100, {"message": "a"}],
                     [EventTime(200, 7), {"message": "b", "n": -5}]],
          {"chunk": "ck"}]
    rows = _run(spark, [msgpack_encode(ev)])
    assert [r.ff_idx for r in rows] == [0, 1]
    assert all(r.ff_mode == "forward" and r.ff_tag == "tail.0"
               and r.ff_chunk == "ck" for r in rows)
    assert rows[0].ff_ts_ns == 100 * 10**9
    assert rows[1].ff_ts_ns == 200 * 10**9 + 7
    assert json.loads(rows[1].ff_attrs)["n"] == -5


def test_packedforward_mode(spark):
    entries = b"".join(
        msgpack_encode([100 + i, {"message": f"m{i}"}]) for i in range(3))
    plain = msgpack_encode(["pk", entries, {}])
    zipped = msgpack_encode(
        ["pk", gzip.compress(entries, mtime=0), {"compressed": "gzip"}])
    rows = _run(spark, [plain, zipped])
    assert len(rows) == 6
    for r in rows:
        assert r.ff_ok and r.ff_mode == "packedforward"
        assert r.ff_ts_ns == (100 + r.ff_idx) * 10**9
        assert r.ff_body == f'"m{r.ff_idx}"'


def test_malformed_events(spark):
    bad = [
        msgpack_encode(["only-tag"]),                  # too-short array
        msgpack_encode([5, 100, {"message": "x"}]),    # non-string tag
        msgpack_encode(["t", True, {"m": 1}]),         # bool second elem
        msgpack_encode(["t", 1.5, {"message": "x"}]),  # float time
        b"\xc1\x00",                                   # invalid msgpack
        msgpack_encode(["t", [[1, {"m": 1}, 3]]]),     # 3-elem entry
    ]
    rows = _run(spark, bad)
    assert len(rows) == len(bad)
    assert all(not r.ff_ok for r in rows)


def test_nested_and_fallback_values(spark):
    rec = {"message": {"deep": [1, "s", None]}, "arr": [True, 2],
           "m": {"k": "v"}}
    (r,) = _run(spark, [msgpack_encode(["t", 1, rec])])
    assert json.loads(r.ff_body) == {"deep": [1, "s", None]}
    a = json.loads(r.ff_attrs)
    assert a["arr"] == [True, 2] and a["m"] == {"k": "v"}

"""Round-5: MongoDB Atlas log parsing, pinning log_decoder.go +
mongodb_event_to_logdata.go."""
from __future__ import annotations

import json

from opentelemetry_collector_contrib_spark.operators.mongodbatlas import (
    mongodb_atlas_audit_logs,
    mongodb_atlas_logs,
)


def _df(spark, lines):
    return spark.createDataFrame(
        [(i, ln) for i, ln in enumerate(lines)], "row_id int, line string"
    )


JSON_LINE = json.dumps({
    "t": {"$date": "2025-04-01T18:00:00.123+02:00"},
    "s": "W", "c": "NETWORK", "id": 22944, "ctx": "conn100",
    "msg": "Connection ended",
    "attr": {"remote": "10.0.0.1:50216", "connectionCount": 4},
})


def test_json_logs(spark):
    lines = [JSON_LINE, "not json at all", json.dumps(
        {"t": {"$date": "2025-04-01T18:00:01.000+00:00"}, "s": "Q",
         "c": "-", "ctx": "c", "msg": "m"})]
    rows = mongodb_atlas_logs(_df(spark, lines), version="4.4",
                              log_name="mongodb.gz").collect()
    rows = sorted(rows, key=lambda r: r.row_id)
    assert [r.row_id for r in rows] == [0, 2]  # bad JSON skipped
    r = rows[0]
    # +02:00 offset honoured
    assert r.ma_ts_ns == 1743523200 * 10**9 + 123_000_000
    assert r.ma_body == JSON_LINE
    assert (r.ma_sev_num, r.ma_sev_text) == (13, "W")
    assert r.ma_message == "Connection ended"
    assert r.ma_component == "NETWORK" and r.ma_context == "conn100"
    assert r.ma_id == 22944 and r.ma_log_name == "mongodb.gz"
    assert json.loads(r.ma_attr) == {"remote": "10.0.0.1:50216",
                                     "connectionCount": 4}
    # unknown severity -> unset (mongodb_event_to_logdata.go:190-195)
    assert (rows[1].ma_sev_num, rows[1].ma_sev_text) == (0, None)
    assert rows[1].ma_id == 0  # Go zero int64


def test_severity_ladder(spark):
    lines = [json.dumps({"t": {"$date": "2025-04-01T18:00:00.000+00:00"},
                         "s": s, "c": "-", "ctx": "c", "msg": "m"})
             for s in ("F", "E", "W", "I", "D", "D1", "D2", "D3", "D4",
                       "D5")]
    rows = sorted(mongodb_atlas_logs(_df(spark, lines)).collect(),
                  key=lambda r: r.row_id)
    assert [r.ma_sev_num for r in rows] == [21, 17, 13, 9, 5, 5, 6, 7,
                                            8, 8]


def test_console_42(spark):
    good = ("2025-04-01T18:00:00.123+0000 I NETWORK  [conn42] "
            "end connection 10.0.0.1:50216 (4 connections now open)")
    lines = [good, "no match here"]
    rows = mongodb_atlas_logs(_df(spark, lines), version="4.2").collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.ma_ts_ns == 1743530400 * 10**9 + 123_000_000
    assert (r.ma_sev_num, r.ma_sev_text) == (9, "I")
    assert r.ma_component == "NETWORK" and r.ma_context == "conn42"
    assert r.ma_message == (
        "end connection 10.0.0.1:50216 (4 connections now open)")
    assert r.ma_id is None and r.ma_attr is None  # no id on 4.2 (:198)


AUDIT_LINE = json.dumps({
    "atype": "authenticate",
    "ts": {"$date": "2025-04-01T18:00:00.000+00:00"},
    "uuid": {"$binary": "abc123", "$type": "04"},
    "local": {"ip": "127.0.0.1", "port": 27017},
    "remote": {"isSystemUser": True, "unix": "/tmp/mongodb.sock"},
    "users": [{"user": "admin", "db": "admin"}],
    "roles": [{"role": "root", "db": "admin"},
              {"role": "read", "db": "app"}],
    "result": 0,
    "param": {"user": "admin", "db": "admin", "mechanism": "SCRAM"},
})


def test_audit_logs(spark):
    (r,) = mongodb_atlas_audit_logs(_df(spark, [AUDIT_LINE])).collect()
    assert (r.ma_sev_num, r.ma_sev_text) == (9, "INFO")
    assert r.ma_atype == "authenticate"
    assert r.ma_local_ip == "127.0.0.1" and r.ma_local_port == 27017
    assert r.ma_local_is_system_user is None and r.ma_local_unix is None
    assert r.ma_remote_ip is None and r.ma_remote_is_system_user is True
    assert r.ma_remote_unix == "/tmp/mongodb.sock"
    assert (r.ma_uuid_binary, r.ma_uuid_type) == ("abc123", "04")
    assert r.ma_result == 0
    assert json.loads(r.ma_param) == {"user": "admin", "db": "admin",
                                      "mechanism": "SCRAM"}
    assert json.loads(r.ma_users) == [{"user": "admin", "db": "admin"}]
    assert json.loads(r.ma_roles) == [
        {"role": "root", "db": "admin"}, {"role": "read", "db": "app"}]


def test_audit_empty_arrays(spark):
    line = json.dumps({"atype": "shutdown",
                       "ts": {"$date": "2025-04-01T18:00:00.000+00:00"},
                       "result": 26})
    (r,) = mongodb_atlas_audit_logs(_df(spark, [line])).collect()
    assert r.ma_users == "[]" and r.ma_roles == "[]"
    assert r.ma_uuid_binary is None and r.ma_result == 26
    assert r.ma_param is None

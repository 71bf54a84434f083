"""Round-5: Grafana Faro payload → log records, compared BYTE-FOR-BYTE
against the reference's own golden files
(pkg/translator/faro/testdata/*/plogs.yaml).
"""
from __future__ import annotations

import json
import os

import pytest
import yaml

from opentelemetry_collector_contrib_spark.operators.faro import (
    drain_exception_value,
    faro_to_logs,
)

TESTDATA = "/root/reference/pkg/translator/faro/testdata"


def _golden(case: str):
    with open(os.path.join(TESTDATA, case, "plogs.yaml")) as f:
        doc = yaml.safe_load(f)
    out = []
    for rl in doc.get("resourceLogs", []):
        res = {
            a["key"]: a["value"]["stringValue"]
            for a in rl["resource"].get("attributes", [])
        }
        for sl in rl.get("scopeLogs", []):
            for rec in sl.get("logRecords", []):
                attrs = {
                    a["key"]: a["value"]["stringValue"]
                    for a in rec.get("attributes", [])
                }
                out.append((res, attrs, rec["body"]["stringValue"]))
    return out


def _run(spark, case: str):
    payload = open(os.path.join(TESTDATA, case, "payload.json")).read()
    payload = json.dumps(json.loads(payload), separators=(",", ":"))
    df = spark.createDataFrame([(payload,)], "body string")
    return faro_to_logs(df).collect()


# the forward-direction golden set (faro_to_logs_test.go:31-55);
# multiple-/two-log-records dirs are reverse-direction fixtures
@pytest.mark.parametrize(
    "case",
    ["standard-payload", "actions-payload", "browser-brand-slice-payload",
     "browser-brand-string-payload"],
)
def test_faro_golden(spark, case):
    want = _golden(case)
    got = _run(spark, case)
    assert len(got) == len(want)
    for w, g in zip(want, got):
        res, attrs, body = w
        assert g["fr_ok"] is True
        # golden yaml bodies carry literal backslash-n; ours are real
        assert g["fr_body"].replace("\n", "\\n") == body
        assert g["fr_kind"] == attrs["kind"]
        got_res = dict(
            t.split("=", 1) for t in g["fr_resource_attrs"].split(",")
        )
        assert got_res == res


def test_faro_empty_payload(spark):
    df = spark.createDataFrame(
        [('{"meta":{"app":{"name":"a"}}}',)], "body string"
    )
    # no items -> no records (faro_to_logs.go:106-108)
    assert faro_to_logs(df).collect() == []


def test_faro_drain_normalization(spark):
    from pyspark.sql import functions as F

    cases = [
        ("Cannot read property 'find' of undefined",
         "Cannot read property '<PROPERTY>' of undefined"),
        ("failed at https://ex.com/a/b?q=1 end", "failed at <URL> end"),
        ("ptr 0xDEADbeef here", "ptr <ADDRESS> here"),
        ("id: 12345 gone", "id <ID> gone"),
        ("at 2024-01-02T10:11:12 stamp", "at <TIMESTAMP> stamp"),
        ("uid 0a1b2c3d-0000-1111-2222-333344445555 x", "uid <UUID> x"),
        ("in /static/js/app.chunk.js broke", "in <PATH> broke"),
    ]
    df = spark.createDataFrame([(a,) for a, _ in cases], "v string")
    got = [
        r["d"] for r in df.select(
            drain_exception_value(F.col("v")).alias("d")
        ).collect()
    ]
    assert got == [b for _, b in cases]


def test_faro_exception_hash_groups(spark):
    # xxh3 is unavailable JVM-side; the hash uses xxhash64 — assert the
    # GROUPING contract: equal drained values hash equal, different
    # drained values differ
    p1 = {"meta": {"app": {"name": "a", "version": "1", "environment": "e"}},
          "exceptions": [
              {"type": "E", "value": "id: 1 boom",
               "timestamp": "2021-09-30T10:46:17.680Z"},
              {"type": "E", "value": "id: 2 boom",
               "timestamp": "2021-09-30T10:46:17.680Z"},
              {"type": "E", "value": "other",
               "timestamp": "2021-09-30T10:46:17.680Z"},
          ]}
    df = spark.createDataFrame(
        [(json.dumps(p1),)], "body string"
    )
    rows = faro_to_logs(df).collect()
    hashes = [r["fr_hash"] for r in rows]
    draineds = [r["fr_drained"] for r in rows]
    assert draineds[0] == draineds[1] == "id <ID> boom"
    assert hashes[0] == hashes[1] != hashes[2]

"""Round-5: syslog RFC5424/3164 line formatting and Carbon plaintext
export, pinning exporter/syslogexporter/{rfc5424,rfc3164}_formatter.go
and exporter/carbonexporter/metricdata_to_plaintext.go semantics.
"""
from __future__ import annotations

from opentelemetry_collector_contrib_spark.operators.carbon_export import (
    carbon_export_lines,
)
from opentelemetry_collector_contrib_spark.operators.syslog_export import (
    syslog_export_lines,
)

_LOG_SCHEMA = ("i int, ts_ns bigint, attrs map<string,string>, "
               "structured_data map<string,map<string,string>>")


def _lines(spark, rows, **opts):
    full = [dict(i=i, ts_ns=1700000000000000000, attrs={},
                 structured_data=None) | r
            for i, r in enumerate(rows)]
    df = spark.createDataFrame(full, _LOG_SCHEMA)
    out = syslog_export_lines(df, id_cols=["i"], **opts)
    return [r["line"] for r in out.orderBy("i").collect()]


def test_rfc5424_defaults_fraction_and_sd(spark):
    got = _lines(spark, [
        {},                                        # all defaults
        {"ts_ns": 1700000000123450000,
         "attrs": {"priority": "34", "version": "2", "hostname": "h",
                   "appname": "a", "proc_id": "9", "msg_id": "m1",
                   "message": "hi"},
         "structured_data": {"sd": {"k": "v", "a": "b"}}},
        {"structured_data": {}},                   # present-empty -> ""
    ])
    assert got[0] == "<165>1 2023-11-14T22:13:20Z - - - - -\n"
    assert got[1] == ('<34>2 2023-11-14T22:13:20.12345Z h a 9 m1 '
                      '[sd a="b" k="v"] hi\n')
    assert got[2] == "<165>1 2023-11-14T22:13:20Z - - - - \n"


def test_rfc5424_octet_counting(spark):
    got = _lines(spark, [{}], octet_counting=True)
    body = "<165>1 2023-11-14T22:13:20Z - - - - -\n"
    assert got[0] == f"{len(body)} {body}"


def test_rfc3164_app_colon_and_delimiter(spark):
    got = _lines(spark, [
        {"attrs": {"hostname": "h", "appname": "a", "message": "m"}},
        {"attrs": {"hostname": "h", "message": "m"}},
        {"attrs": {"hostname": "h", "appname": "a"}},
    ], protocol="rfc3164")
    assert got[0] == "<165>Nov 14 22:13:20 h a: m\n"
    assert got[1] == "<165>Nov 14 22:13:20 h m\n"
    assert got[2] == "<165>Nov 14 22:13:20 h a:\n"


_MET_SCHEMA = (
    "i int, name string, mtype string, ts_ns bigint, "
    "attrs map<string,string>, is_int boolean, vint bigint, "
    "vdouble double, count bigint, sum double, bounds array<double>, "
    "bucket_counts array<bigint>, "
    "quantiles array<struct<q:double,v:double>>"
)


def _carbon(spark, rows):
    full = [dict(i=i, name="m", mtype="gauge",
                 ts_ns=1700000000 * 10**9, attrs={}, is_int=True,
                 vint=4, vdouble=None, count=None, sum=None,
                 bounds=None, bucket_counts=None, quantiles=None) | r
            for i, r in enumerate(rows)]
    df = spark.createDataFrame(full, _MET_SCHEMA)
    out = carbon_export_lines(df, id_cols=["i"])
    return [r["line"] for r in out.orderBy("i", "line").collect()]


def test_carbon_paths_tags_and_skips(spark):
    got = _carbon(spark, [
        {"attrs": {"k;1!": ""}},                # key sanitized, value
        {"attrs": {"ok": "x;y"}},               # value NOT sanitized
        {"is_int": None},                       # EMPTY -> skipped
        {"name": ""},                           # nameless -> skipped
        {"is_int": False, "vdouble": 2.0},      # 'f' -> "2"
    ])
    assert got == [
        "m;k_1_=<empty> 4 1700000000\n",
        "m;ok=x;y 4 1700000000\n",
        "m 2 1700000000\n",
    ]


def test_carbon_histogram_raw_buckets_and_summary(spark):
    got = _carbon(spark, [
        {"mtype": "histogram", "count": 6, "sum": None,
         "bounds": [1.0, 2.5], "bucket_counts": [2, 3, 1]},
        {"mtype": "histogram", "count": 2, "sum": 0.5,
         "bounds": [], "bucket_counts": [2]},      # no bucket lines
        {"mtype": "summary", "count": 5, "sum": 1.5,
         "quantiles": [dict(q=0.5, v=0.25)]},
    ])
    assert [ln for ln in got if "i" not in "x"] == [
        # raw counts, NOT cumulative; absent sum -> 0
        "m 0 1700000000\n",
        "m.bucket;upper_bound=1 2 1700000000\n",
        "m.bucket;upper_bound=2.5 3 1700000000\n",
        "m.bucket;upper_bound=inf 1 1700000000\n",
        "m.count 6 1700000000\n",
        "m 0.5 1700000000\n",
        "m.count 2 1700000000\n",
        "m 1.5 1700000000\n",
        "m.count 5 1700000000\n",
        "m.quantile;quantile=50 0.25 1700000000\n",
    ]

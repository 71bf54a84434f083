"""Round-5: sumologic export formatters, pinning
exporter/sumologicexporter/{prometheus_formatter,sender}.go semantics.
"""
from __future__ import annotations

from opentelemetry_collector_contrib_spark.operators.sumologic_export import (
    sumologic_log_lines,
    sumologic_prom_lines,
)

_MET_SCHEMA = (
    "i int, name string, mtype string, ts_ns bigint, "
    "attrs map<string,string>, res_attrs map<string,string>, "
    "is_int boolean, vint bigint, vdouble double, count bigint, "
    "sum double, bounds array<double>, bucket_counts array<bigint>, "
    "quantiles array<struct<q:double,v:double>>"
)


def _prom(spark, rows):
    full = [dict(i=i, name="m", mtype="gauge",
                 ts_ns=1700000000 * 10**9 + 7 * 10**6, attrs={},
                 res_attrs={}, is_int=True, vint=4, vdouble=None,
                 count=None, sum=None, bounds=None,
                 bucket_counts=None, quantiles=None) | r
            for i, r in enumerate(rows)]
    df = spark.createDataFrame(full, _MET_SCHEMA)
    return [r["line"] for r in
            sumologic_prom_lines(df, id_cols=["i"])
            .orderBy("i", "line").collect()]


def test_prom_tags_merge_sanitize_escape(spark):
    got = _prom(spark, [
        # dp attr with the same key keeps the resource POSITION but
        # takes the dp VALUE (PutStr); key sanitize; value escape
        {"res_attrs": {"env": "prod", "host name": "h\"x\n"},
         "attrs": {"env": "dp1"}},
        {},                                  # no attrs -> no braces
        {"is_int": None},                    # EMPTY -> empty line
    ])
    assert got == [
        'm{env="dp1",host_name="h\\"x\\n"} 4 1700000000007',
        "m 4 1700000000007",
        "",
    ]


def test_prom_histogram_order_and_guards(spark):
    got = _prom(spark, [
        {"mtype": "histogram", "count": 9, "sum": 2.5,
         "bounds": [1.0, 2.5], "bucket_counts": [2, 3, 4]},
    ])
    assert got == [
        "m_bucket{le=\"+Inf\"} 9 1700000000007",
        "m_bucket{le=\"1\"} 2 1700000000007",
        "m_bucket{le=\"2.5\"} 5 1700000000007",
        "m_count 9 1700000000007",
        "m_sum 2.5 1700000000007",
    ]
    # counts shorter than bounds+1: Go panics on the +Inf index;
    # dropped here. No sum -> no _sum line.
    got = _prom(spark, [
        {"mtype": "histogram", "count": 5, "sum": None,
         "bounds": [1.0], "bucket_counts": [3]},
    ])
    assert got == [
        "m_bucket{le=\"1\"} 3 1700000000007",
        "m_count 5 1700000000007",
    ]


def test_prom_summary_order(spark):
    got = _prom(spark, [
        {"mtype": "summary", "count": 3, "sum": 0.5,
         "quantiles": [dict(q=0.5, v=1.25)]},
    ])
    assert got == [
        "m_count 3 1700000000007",
        "m_sum 0.5 1700000000007",
        'm{quantile="0.5"} 1.25 1700000000007',
    ]


def test_log_lines(spark):
    df = spark.createDataFrame(
        [(0, "hello", {"a": "1"}), (1, "", {"b": "2"})],
        "i int, body string, attrs map<string,string>")
    text = [r["line"] for r in
            sumologic_log_lines(df, id_cols=["i"], log_format="text")
            .orderBy("i").collect()]
    assert text == ["hello", ""]
    js = [r["line"] for r in
          sumologic_log_lines(df, id_cols=["i"], log_format="json")
          .orderBy("i").collect()]
    assert js == ['{"a":"1","log":"hello"}', '{"b":"2"}']

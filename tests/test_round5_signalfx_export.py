"""Round-5: OTLP metrics → SignalFx proto datapoints, pinning
pkg/translator/signalfx/from_metrics.go semantics.
"""
from __future__ import annotations

from opentelemetry_collector_contrib_spark.operators.signalfx_export import (
    signalfx_from_metrics,
)

_SCHEMA = (
    "i int, name string, mtype string, monotonic boolean, "
    "delta boolean, ts_ns bigint, attrs map<string,string>, "
    "res_attrs map<string,string>, is_int boolean, vint bigint, "
    "vdouble double, count bigint, sum double, min double, max double, "
    "bounds array<double>, bucket_counts array<bigint>, "
    "quantiles array<struct<q:double,v:double>>"
)


def _row(i, **kw):
    base = dict(
        i=i, name="m", mtype="gauge", monotonic=False, delta=False,
        ts_ns=1700000000000000000 + 1_500_000, attrs={}, res_attrs={},
        is_int=True, vint=5, vdouble=None, count=None, sum=None,
        min=None, max=None, bounds=None, bucket_counts=None,
        quantiles=None,
    )
    base.update(kw)
    return base


def _export(spark, rows, **opts):
    df = spark.createDataFrame([_row(i, **r) for i, r in enumerate(rows)],
                               _SCHEMA)
    return (signalfx_from_metrics(df, id_cols=["i"], **opts)
            .orderBy("i", "metric", "dims").collect())


def test_metric_type_ladder_and_ts(spark):
    out = _export(spark, [
        {"mtype": "gauge"},
        {"mtype": "sum", "monotonic": False, "delta": True},
        {"mtype": "sum", "monotonic": True, "delta": True},
        {"mtype": "sum", "monotonic": True, "delta": False},
        {"mtype": "exphist"},   # dropped (:77-78)
        {"mtype": "empty"},     # dropped
    ])
    assert [(r["metric_type"], r["vint"]) for r in out] == [
        ("GAUGE", 5), ("GAUGE", 5), ("COUNTER", 5),
        ("CUMULATIVE_COUNTER", 5)]
    assert out[0]["ts_ms"] == 1700000000001  # ns div 1e6, exact


def test_number_empty_value_and_dims(spark):
    out = _export(spark, [
        {"is_int": None, "attrs": {"b": "2"}, "res_attrs": {"a": "1"}},
        {"is_int": False, "vdouble": 0.5},
    ])
    assert (out[0]["vint"], out[0]["vdouble"]) == (None, None)
    assert out[0]["dims"] == "a=1,b=2"
    assert out[1]["vdouble"] == 0.5 and out[1]["vint"] is None


def test_histogram_fan_and_bucket_rules(spark):
    hist = dict(mtype="histogram", delta=False, count=10, sum=2.5,
                min=0.25, max=8.0, bounds=[0.0, 1.0, 2.5],
                bucket_counts=[1, 2, 3, 4])
    out = _export(spark, [hist])
    got = [(r["metric"], r["metric_type"], r["vint"], r["vdouble"],
            r["dims"]) for r in out]
    assert got == [
        ("m_bucket", "CUMULATIVE_COUNTER", 10, None, "le=+Inf"),
        ("m_bucket", "CUMULATIVE_COUNTER", 1, None, "le=0"),
        ("m_bucket", "CUMULATIVE_COUNTER", 3, None, "le=1"),
        ("m_bucket", "CUMULATIVE_COUNTER", 6, None, "le=2.5"),
        ("m_count", "CUMULATIVE_COUNTER", 10, None, ""),
        ("m_max", "GAUGE", None, 8.0, ""),        # always gauge
        ("m_min", "GAUGE", None, 0.25, ""),
        ("m_sum", "CUMULATIVE_COUNTER", None, 2.5, ""),
    ]
    # mismatched counts length -> buckets skipped, scalars kept (:197)
    bad = dict(hist, bucket_counts=[1, 2])
    out = _export(spark, [bad])
    assert [r["metric"] for r in out] == [
        "m_count", "m_max", "m_min", "m_sum"]
    # empty counts -> no bucket points, no skip of the row
    out = _export(spark, [dict(hist, bucket_counts=[])])
    assert [r["metric"] for r in out] == [
        "m_count", "m_max", "m_min", "m_sum"]


def test_histogram_options(spark):
    hist = dict(mtype="histogram", delta=True, count=3, sum=None,
                min=None, max=None, bounds=[1.0], bucket_counts=[1, 2])
    out = _export(spark, [hist], drop_histogram_buckets=True)
    assert [(r["metric"], r["metric_type"]) for r in out] == [
        ("m_count", "COUNTER")]
    assert _export(spark, [hist], process_histograms=False) == []


def test_summary_fan(spark):
    out = _export(spark, [
        {"mtype": "summary", "count": 7, "sum": None,
         "quantiles": [dict(q=0.5, v=1.5), dict(q=0.99, v=4.0)]},
    ])
    got = [(r["metric"], r["metric_type"], r["vint"], r["vdouble"],
            r["dims"]) for r in out]
    assert got == [
        ("m_count", "CUMULATIVE_COUNTER", 7, None, ""),
        ("m_quantile", "GAUGE", None, 1.5, "quantile=0.5"),
        ("m_quantile", "GAUGE", None, 4.0, "quantile=0.99"),
        ("m_sum", "CUMULATIVE_COUNTER", None, 0.0, ""),  # pdata default
    ]

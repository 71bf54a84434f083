"""datadogconnector traces→APM-stats semantics
(connector_native.go:135-141 + datadog-agent Concentrator rules,
knobs per pkg/datadog/config/traces.go:18-48)."""
from pyspark.sql import functions as F  # noqa: F401

from opentelemetry_collector_contrib_spark.operators.vendor_semantics import (
    datadog_apm_stats,
)

_SCHEMA = (
    "trace_id string, parent_span_id string, service string,"
    " op_name string, resource string, span_kind string, env string,"
    " hostname string, version string, start_ns long, duration_ns long,"
    " is_error boolean, http_status_code int, origin string"
)


def _row(trace="t1", parent=None, kind="internal", resource="res",
         start=0, dur=5, err=False, http=None, origin="rum"):
    return (trace, parent, "svc", "op", resource, kind, "prod", "h1",
            "v1", start, dur, err, http, origin)


def _stats(spark, rows, **kw):
    df = spark.createDataFrame(rows, _SCHEMA)
    return {
        (r["span_kind"], r["is_trace_root"]): r.asDict()
        for r in datadog_apm_stats(df, **kw).collect()
    }


def test_eligibility_top_level_vs_measured(spark):
    rows = [
        _row(parent=None, kind="internal"),     # root -> top-level
        _row(parent="p", kind="server"),        # kind -> top-level
        _row(parent="p", kind="consumer"),      # kind -> top-level
        _row(parent="p", kind="client"),        # measured only
        _row(parent="p", kind="producer"),      # measured only
        _row(parent="p", kind="internal"),      # NOT eligible
    ]
    got = _stats(spark, rows)
    assert ("internal", False) not in got
    assert got[("internal", True)]["top_level_hits"] == 1
    assert got[("server", False)]["top_level_hits"] == 1
    # measured spans count hits but not top-level hits (statsraw.go)
    assert got[("client", False)]["hits"] == 1
    assert got[("client", False)]["top_level_hits"] == 0
    assert got[("producer", False)]["top_level_hits"] == 0


def test_compute_stats_by_span_kind_off_drops_measured(spark):
    rows = [_row(parent="p", kind="client"), _row(parent=None)]
    got = _stats(spark, rows, compute_stats_by_span_kind=False)
    assert ("client", False) not in got and ("internal", True) in got


def test_bucket_is_end_time_aligned(spark):
    # end = start + dur; btime = end - end % bsize (concentrator.go)
    rows = [
        _row(start=9_999_999_999, dur=0),   # end just below 10s
        _row(start=9_999_999_999, dur=1),   # end exactly 10s
        _row(start=25_000_000_000, dur=1),  # 20s bucket
    ]
    df = spark.createDataFrame(rows, _SCHEMA)
    buckets = sorted(
        r["bucket_start"] for r in datadog_apm_stats(df).collect()
    )
    assert buckets == [0, 10_000_000_000, 20_000_000_000]


def test_grain_errors_duration_synthetics_and_ignore(spark):
    rows = [
        _row(err=True, http=500, dur=7, origin="synthetics-browser"),
        _row(err=False, http=500, dur=11, origin="synthetics-api"),
        _row(err=False, http=None, dur=13, origin="rum"),
        _row(resource="GET /healthcheck"),  # blacklisted
    ]
    df = spark.createDataFrame(rows, _SCHEMA)
    out = datadog_apm_stats(
        df, ignore_resources=[r"(GET|POST) /healthcheck"]
    ).collect()
    assert sum(r["hits"] for r in out) == 3
    syn = [r for r in out if r["synthetics"]]
    assert len(syn) == 1 and syn[0]["hits"] == 2
    assert syn[0]["errors"] == 1 and syn[0]["duration_sum"] == 18
    assert syn[0]["status_code"] == 500
    nosyn = [r for r in out if not r["synthetics"]][0]
    assert nosyn["status_code"] == 0  # absent http code -> 0 key


def test_plan_is_single_exchange(spark):
    df = spark.createDataFrame([_row()], _SCHEMA)
    plan = datadog_apm_stats(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1  # partial+final hash agg only

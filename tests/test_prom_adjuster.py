"""prometheusreceiver initial-point adjuster semantics."""
from __future__ import annotations

from opentelemetry_collector_contrib_spark.operators.prom_adjuster import (
    prom_adjust_start_times,
)

_SCHEMA = ("series string, ts long, start_ts long, stale boolean, "
           "value double")


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, _SCHEMA)
    out = prom_adjust_start_times(df, ["series"], family="sum", **kw)
    return {r.ts: r.start_adjusted for r in out.collect()}


def test_reset_starts_new_segment_at_own_start(spark):
    out = _run(spark, [
        ("s", 10, 5, False, 100.0),
        ("s", 20, 5, False, 150.0),   # carries segment start 5
        ("s", 30, 25, False, 40.0),   # reset -> anchors at its own 25
        ("s", 40, 25, False, 60.0),
    ])
    assert out == {10: 5, 20: 5, 30: 25, 40: 25}


def test_stale_points_inherit_and_do_not_reset(spark):
    out = _run(spark, [
        ("s", 10, 5, False, 100.0),
        ("s", 20, 15, True, 0.0),     # stale: keeps segment, no prev
        ("s", 30, 15, False, 120.0),  # vs prev=100 -> no reset
    ])
    assert out == {10: 5, 20: 5, 30: 5}


def test_use_point_time_for_reset(spark):
    out = _run(spark, [
        ("s", 10, 5, False, 100.0),
        ("s", 30, 25, False, 40.0),
    ], use_point_time_for_reset=True)
    assert out[30] == 30  # anchored at the point TIME, not its start


def test_use_created_metric_passthrough(spark):
    out = _run(spark, [
        ("s", 10, 5, False, 100.0),
        ("s", 20, 15, False, 1.0),   # start<ts: _created-set, skipped
        ("s", 30, 5, False, 90.0),   # vs prev=100 -> reset (20 unseen)
    ], use_created_metric=True)
    # all three have start<ts, so ALL are passthrough under the gate
    assert out == {10: 5, 20: 15, 30: 5}


def test_summary_zero_guard(spark):
    df = spark.createDataFrame(
        [("s", 10, 5, False, 50, 10.0),
         ("s", 20, 5, False, 0, 12.0),    # count 0 -> guard, no reset
         ("s", 30, 5, False, 40, 13.0)],  # vs prev count 0 -> guarded
        "series string, ts long, start_ts long, stale boolean, "
        "count long, sum double")
    out = prom_adjust_start_times(df, ["series"], family="summary")
    vals = {r.ts: r.start_adjusted for r in out.collect()}
    assert vals == {10: 5, 20: 5, 30: 5}

"""expvar receiver semantics (receiver/expvarreceiver/scraper.go:53-112)."""
from __future__ import annotations

import json

import pytest

from opentelemetry_collector_contrib_spark.operators.receivers import (
    expvar_memstats,
)


@pytest.fixture(scope="module")
def spark():
    from opentelemetry_collector_contrib_spark.session import get_spark

    return get_spark()


def _body(num_gc, pause_ns):
    return json.dumps({"memstats": {
        "Sys": 11, "NumGC": num_gc, "PauseNs": pause_ns,
        "GCCPUFraction": 0.25,
    }})


def test_default_enabled_set(spark):
    df = spark.createDataFrame([(1, _body(1, [7, 8]))], ["id", "body"])
    rows = expvar_memstats(df).collect()
    names = {r.ev_metric for r in rows}
    # 24 enabled by default; total_alloc and lookups are off
    assert len(rows) == 24
    assert "process.runtime.memstats.total_alloc" not in names
    assert "process.runtime.memstats.lookups" not in names
    assert all(r.ev_ok for r in rows)
    by = {r.ev_metric.rsplit(".", 1)[1]: r for r in rows}
    assert by["sys"].ev_value == 11 and by["sys"].ev_kind == "sum"
    # missing fields read as Go zero values
    assert by["heap_alloc"].ev_value == 0
    assert by["gc_cpu_fraction"].ev_value_d == 0.25
    assert by["gc_cpu_fraction"].ev_value is None


def test_last_pause_circular_buffer(spark):
    # NumGC=2 -> PauseNs[(2+255)%256] = PauseNs[1]
    # NumGC=0 -> index 255, past the decoded prefix -> zero fill
    df = spark.createDataFrame(
        [(1, _body(2, [7, 8, 9])), (2, _body(0, [7, 8, 9]))],
        ["id", "body"],
    )
    rows = expvar_memstats(df).collect()
    lp = {r.id: r.ev_value for r in rows
          if r.ev_metric == "process.runtime.memstats.last_pause"}
    assert lp == {1: 8, 2: 0}


def test_enabled_knob_and_nil_memstats(spark):
    df = spark.createDataFrame(
        [(1, _body(1, [7])), (2, '{"cmdline":[]}'), (3, "junk")],
        ["id", "body"],
    )
    out = expvar_memstats(df, enabled=frozenset({"sys", "total_alloc"}))
    rows = out.collect()
    good = [r for r in rows if r.id == 1]
    # the knob re-enables total_alloc and disables the rest
    assert sorted(r.ev_metric for r in good) == [
        "process.runtime.memstats.sys",
        "process.runtime.memstats.total_alloc",
    ]
    # nil memstats / bad JSON -> one dead-letter row each (scrape error)
    for bad_id in (2, 3):
        bad = [r for r in rows if r.id == bad_id]
        assert len(bad) == 1
        assert bad[0].ev_ok is False and bad[0].ev_metric is None

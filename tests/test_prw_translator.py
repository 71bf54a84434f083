"""Prometheus export translator: pinned Go-quirk cases.

References: pkg/translator/prometheus/normalize_name.go,
normalize_label.go, normalize_unit.go;
pkg/translator/prometheusremotewrite/helper.go.
"""
from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from opentelemetry_collector_contrib_spark.operators.prw import (
    prom_compliant_name,
    prom_compliant_unit,
    prom_normalize_label,
    prw_histogram_series,
    prw_label_set,
)


def _one(spark, **cols):
    return spark.createDataFrame([tuple(cols.values())], list(cols.keys()))


NAME_CASES = [
    # (name, unit, mtype, mono, expected_full)
    ("system.cpu.time", "s", "sum", True, "system_cpu_time_seconds_total"),
    ("system.io", "By/s", "gauge", False, "system_io_bytes_per_second"),
    # unit token already present -> not appended (normalize_name.go:64)
    ("disk.bytes", "By", "gauge", False, "disk_bytes"),
    # monotonic sum: existing 'total' tokens removed, one appended at end
    ("disk.io.total", "By", "sum", True, "disk_io_bytes_total"),
    # unit "1" gauge -> _ratio (normalize_name.go:81-83)
    ("cache.hit", "1", "gauge", False, "cache_hit_ratio"),
    # unit "1" on a counter gets _total, never _ratio
    ("objects.count", "1", "sum", True, "objects_count_total"),
    # {annotated} units are skipped (normalize_unit.go:82)
    ("reqs", "{requests}", "sum", True, "reqs_total"),
    # leading digit -> '_' prefix (normalize_name.go:94-96)
    ("3xx.count", "", "gauge", False, "_3xx_count"),
    # unknown unit cleaned and appended
    ("speed", "foo.bar", "gauge", False, "speed_foo_bar"),
    # '%' -> percent
    ("usage", "%", "gauge", False, "usage_percent"),
]


@pytest.mark.parametrize("name,unit,mtype,mono,want", NAME_CASES)
def test_build_compliant_name(spark, name, unit, mtype, mono, want):
    df = _one(spark, name=name, unit=unit, mtype=mtype, mono=mono)
    got = df.select(prom_compliant_name(
        F.col("name"), F.col("unit"), F.col("mtype"),
        F.col("mono")).alias("x")).head()[0]
    assert got == want


def test_namespace_prefix_skips_digit_guard(spark):
    # with a namespace the joined name can't start with a digit, so no
    # '_' prefix appears (normalize_name.go:85-96 order)
    df = _one(spark, name="3xx.count", unit="", mtype="gauge", mono=False)
    got = df.select(prom_compliant_name(
        F.col("name"), F.col("unit"), F.col("mtype"), F.col("mono"),
        namespace="otel").alias("x")).head()[0]
    assert got == "otel_3xx_count"


def test_simple_name_keeps_colon_and_underscore(spark):
    df = _one(spark, name="a.b--c:d_e", unit="s", mtype="sum", mono=True)
    got = df.select(prom_compliant_name(
        F.col("name"), F.col("unit"), F.col("mtype"), F.col("mono"),
        add_suffixes=False).alias("x")).head()[0]
    assert got == "a_b_c:d_e"


LABEL_CASES = [
    ("label", "label"),
    ("9digit", "key_9digit"),      # digit start -> key_ prefix
    ("_lead", "key_lead"),         # single '_' -> key prefix
    ("__meta", "__meta"),          # double underscore preserved
    ("dot.key", "dot_key"),
    ("üñi", "üñi"),                # unicode letters survive (Go IsLetter)
]


@pytest.mark.parametrize("raw,want", LABEL_CASES)
def test_normalize_label(spark, raw, want):
    got = _one(spark, raw=raw).select(
        prom_normalize_label(F.col("raw")).alias("x")).head()[0]
    assert got == want


def test_compliant_unit_per_only(spark):
    # main unit '1' maps to '' -> only 'per_second' remains
    got = _one(spark, u="1/s").select(
        prom_compliant_unit(F.col("u")).alias("x")).head()[0]
    assert got == "per_second"


def test_histogram_cumulative_and_inf(spark):
    df = _one(
        spark, id=1, name="lat", ts_ns=2_000_000_000, sum=6.0,
        has_sum=True, count=12, bounds=[0.5, 1.0],
        bucket_counts=[3, 4], stale=False,
    )
    rows = {(r.metric, r.le): r.value
            for r in prw_histogram_series(df, id_cols=["id"]).collect()}
    # buckets are CUMULATIVE (helper.go:242-262)
    assert rows[("lat_bucket", "0.5")] == 3.0
    assert rows[("lat_bucket", "1")] == 7.0
    # +Inf carries the datapoint count, not the bucket sum (helper.go:270)
    assert rows[("lat_bucket", "+Inf")] == 12.0
    assert rows[("lat_sum", None)] == 6.0
    assert rows[("lat_count", None)] == 12.0
    ts = prw_histogram_series(df, id_cols=["id"]).head().ts_ms
    assert ts == 2000  # ns -> ms (helper.go:535-537)


def test_label_collision_fold_leading_run_only(spark):
    # helper.go:131-141: values visited sorted by original key; append
    # ';'+v only when accumulated != v => only a LEADING run collapses
    df = spark.createDataFrame(
        [(1, {"a.b": "x", "a_b": "x", "a-b": "y"}, None, None, None, "m")],
        "id int, attrs map<string,string>, service_name string, "
        "service_namespace string, service_instance string, "
        "metric_name string")
    out = {r.label: r.value
           for r in prw_label_set(df, id_col="id").collect()}
    # sorted original keys: 'a-b' < 'a.b' < 'a_b' -> values y, x, x
    # fold: y -> y;x (differs) -> y;x (accumulated 'y;x' != 'x' -> append)
    assert out["a_b"] == "y;x;x"
    assert out["__name__"] == "m"
    assert "job" not in out and "instance" not in out


def test_label_job_overrides_attr_and_external(spark):
    df = spark.createDataFrame(
        [(1, {"job": "attrjob"}, "svc", "prod", "inst-7", "m")],
        "id int, attrs map<string,string>, service_name string, "
        "service_namespace string, service_instance string, "
        "metric_name string")
    out = {r.label: r.value
           for r in prw_label_set(
               df, id_col="id",
               external_labels={"job": "ext", "env": "e1"}).collect()}
    # resource job beats the attr-derived and external values
    # (helper.go:143-161: job set after attrs; external skip-if-present)
    assert out["job"] == "prod/svc"
    assert out["instance"] == "inst-7"
    assert out["env"] == "e1"

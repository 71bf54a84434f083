"""hostmetrics scraper semantics (receiver/hostmetricsreceiver)."""
from __future__ import annotations

from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.operators.hostmetrics import (
    host_cpu_metrics,
    host_filesystem_metrics,
    host_memory_metrics,
    host_network_connections,
    host_processes_metrics,
)


def _cpu_row(host, cpu, ts, user, system, idle, guest=0.0):
    return (host, cpu, ts, user, system, idle, 0.0, 0.0, 0.0, 0.0,
            0.0, guest, 0.0)


_CPU_SCHEMA = ("host string, cpu string, ts long, user double, "
               "system double, idle double, nice double, "
               "iowait double, irq double, softirq double, "
               "steal double, guest double, guest_nice double")


def test_cpu_utilization_delta_and_guest_total(spark):
    # two samples: user +2, system +1, idle +5, guest +2 → elapsed=10
    # (guest counts toward the divisor but has no state row:
    # ucal/cpu_utilization_calculator.go:85-90)
    df = spark.createDataFrame(
        [_cpu_row("h", "cpu0", 1, 10.0, 5.0, 100.0, 0.0),
         _cpu_row("h", "cpu0", 2, 12.0, 6.0, 105.0, 2.0)],
        _CPU_SCHEMA)
    out = host_cpu_metrics(df).collect()
    util = {r.hm_state: r.hm_value_d for r in out
            if r.hm_metric == "system.cpu.utilization"}
    assert util["user"] == 0.2 and util["system"] == 0.1
    assert util["idle"] == 0.5
    # first sample emits cpu.time only: 8 states × 2 samples + 8 utils
    assert len(out) == 16 + 8


def test_cpu_utilization_zero_elapsed_emits_zeros(spark):
    df = spark.createDataFrame(
        [_cpu_row("h", "cpu0", 1, 10.0, 5.0, 100.0),
         _cpu_row("h", "cpu0", 2, 10.0, 5.0, 100.0)],
        _CPU_SCHEMA)
    util = [r for r in host_cpu_metrics(df).collect()
            if r.hm_metric == "system.cpu.utilization"]
    assert len(util) == 8 and all(r.hm_value_d == 0.0 for r in util)


def test_memory_invalid_total_drops_sample(spark):
    df = spark.createDataFrame(
        [("h", 1, 0, 5, 5, 0, 0, 0, 0, 1, 1, 4096),
         ("h", 2, 100, 60, 40, 1, 2, 3, 4, 50, 5, 4096)],
        "host string, ts long, total long, used long, free long, "
        "buffers long, cached long, sreclaimable long, "
        "sunreclaim long, available long, dirty long, page_size long")
    out = host_memory_metrics(df).collect()
    assert {r.ts for r in out} == {2}  # memory_scraper.go:76-79
    used_util = [r.hm_value_d for r in out
                 if r.hm_metric == "system.memory.utilization"
                 and r.hm_state == "used"]
    assert used_util == [0.6]


def test_filesystem_dedup_keeps_empty_mountpoints(spark):
    rows = [
        ("h", 1, 1, "sda", "/", "ext4", "rw", 10, 10, 25, 1, 1),
        ("h", 1, 2, "sda", "/", "ext4", "ro", 99, 1, 100, 1, 1),
        ("h", 1, 3, "sdb", "", "swap", "x", 1, 1, 2, 1, 1),
        ("h", 1, 4, "sdb", "", "swap", "x", 2, 2, 4, 1, 1),
    ]
    df = spark.createDataFrame(
        rows, "host string, ts long, seq long, device string, "
              "mountpoint string, fstype string, opts string, "
              "used long, free long, total long, inodes_used long, "
              "inodes_free long")
    out = host_filesystem_metrics(df)
    # duplicate ("sda", "/") deduped first-wins; empty mountpoint
    # duplicates both kept (filesystem_scraper.go:103-107)
    util = out.where(
        F.col("hm_metric") == "system.filesystem.utilization").collect()
    assert sorted((r.device, r.hm_value_d) for r in util) == [
        ("sda", 0.5), ("sdb", 0.5), ("sdb", 0.5)]
    modes = {r.mode for r in util}
    assert modes == {"rw", "unknown"}


def test_network_connections_zero_fills_grid(spark):
    df = spark.createDataFrame(
        [("h", 1, "ESTABLISHED"), ("h", 1, "ESTABLISHED"),
         ("h", 1, "BOUND")],
        "host string, ts long, status string")
    out = {r.hm_state: r.hm_value
           for r in host_network_connections(df).collect()}
    assert out["ESTABLISHED"] == 2 and out["BOUND"] == 1
    assert out["LISTEN"] == 0 and len(out) == 13  # 12 grid + BOUND


def test_processes_misc_overrides_and_unknown_rebalance(spark):
    procs = spark.createDataFrame(
        [("h", 1, "running"), ("h", 1, "running"), ("h", 1, "sleep"),
         ("h", 1, "weird")],
        "host string, ts long, status string")
    misc = spark.createDataFrame(
        [("h", 1, 20, 5, 3, 7)],
        "host string, ts long, procs_total long, procs_running long, "
        "procs_blocked long, procs_created long")
    out = {(r.hm_metric, r.hm_status): r.hm_value
           for r in host_processes_metrics(procs, misc).collect()}
    # running replaced 2→5, blocked 0→3; known = 5+3+1+1 = 10;
    # unknown re-derived as 20−10 = 10 (replacing the weird-count 1)
    assert out[("system.processes.count", "running")] == 5
    assert out[("system.processes.count", "blocked")] == 3
    assert out[("system.processes.count", "sleeping")] == 1
    assert out[("system.processes.count", "unknown")] == 10
    assert out[("system.processes.created", None)] == 7
    assert ("system.processes.count", "zombies") not in out

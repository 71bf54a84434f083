"""Edge pins for the session-4 exporter-tail operators — corners the
DuckDB oracles don't reach (sequential quirks, collision ladders,
priority orders)."""
from __future__ import annotations

import pyspark.sql.functions as F


def test_cloudwatch_emf_v1_beats_v0(spark):
    from opentelemetry_collector_contrib_spark.operators.\
        cloudwatch_export import cloudwatch_log_events

    body = ('{"_aws":{"logGroupName":"v1g","logStreamName":"v1s"},'
            '"log_group_name":"v0g","log_stream_name":"v0s"}')
    df = spark.createDataFrame(
        [(1, 1_000_000_000, body, {})],
        "i int, ts_ns bigint, body string, "
        "res_attrs map<string,string>")
    out = cloudwatch_log_events(
        df, id_cols=["i"], raw_log=True,
        log_group_template="cfg", log_stream_template="cfgs").collect()
    # exporter.go:189-200: the v1 _aws block wins over v0 keys
    assert out[0]["log_group"] == "v1g"
    assert out[0]["log_stream"] == "v1s"


def test_cloudwatch_structured_omitempty(spark):
    from opentelemetry_collector_contrib_spark.operators.\
        cloudwatch_export import cloudwatch_log_events

    df = spark.createDataFrame(
        [(1, 2_000_000, "", 0, "", 0, 0, "", "", {}, "", "", {}, {})],
        "i int, ts_ns bigint, body string, severity_number int,"
        "severity_text string, dropped int, flags int,"
        "trace_id string, span_id string, attrs map<string,string>,"
        "scope_name string, scope_version string,"
        "scope_attrs map<string,string>, res_attrs map<string,string>")
    out = cloudwatch_log_events(df, id_cols=["i"]).collect()
    # every field omitempty and empty -> bare object
    assert out[0]["message"] == "{}"
    assert out[0]["timestamp_ms"] == 2


def test_dataset_collision_and_serverhost_priority(spark):
    from opentelemetry_collector_contrib_spark.operators.\
        dataset_export import dataset_log_events

    df = spark.createDataFrame(
        [(1, 5, 7, 9, "INFO", "body!", 0, "", "",
          {"serverHost": "attr-host", "message": "clash"},
          {"serverHost": "res-host", "host.name": "hn"},
          "sc", {},)],
        "i int, ts_ns bigint, observed_ns bigint,"
        "severity_number int, severity_text string, body string,"
        "dropped int, span_id string, trace_id string,"
        "attrs map<string,string>, res_attrs map<string,string>,"
        "scope_name string, scope_attrs map<string,string>")
    out = dataset_log_events(df, id_cols=["i"],
                             server_host="session-host").collect()[0]
    # attr serverHost beats resource serverHost beats host.name
    assert out["server_host"] == "attr-host"
    # the body claimed "message"; the attr collides into "message_"
    assert out["attrs"]["message"] == "body!"
    assert out["attrs"]["message_"] == "clash"


def test_prom_accumulator_stale_and_chain(spark):
    from opentelemetry_collector_contrib_spark.operators.\
        prom_accumulator import prometheus_accumulate

    rows = []
    # delta sum chain: 10->20->30 contiguous, stale at ts=20 deletes,
    # later points 30(start 25: restart) + 40(start 30: chains)
    for i, (ts, start, stale, v) in enumerate([
            (10, 5, False, 1.0), (20, 10, False, 2.0),
            (20, 0, True, 0.0), (30, 25, False, 4.0),
            (40, 30, False, 8.0)]):
        rows.append((i, "sum", "m1", "sc", {"d": "1"},
                     {"service.name": "s"}, ts, start, stale, 1, True,
                     v, 0, 0.0, [], []))
    df = spark.createDataFrame(
        rows,
        "i int, signal string, metric_name string, scope_name string,"
        "attrs map<string,string>, res_attrs map<string,string>,"
        "ts_ns bigint, start_ns bigint, stale boolean,"
        "temporality int, is_monotonic boolean, value double,"
        "count bigint, sum double, bucket_counts array<bigint>,"
        "explicit_bounds array<double>")
    out = prometheus_accumulate(df, id_cols=["i"]).collect()
    assert len(out) == 1
    r = out[0]
    # points at/before the stale marker (ts<=20) are gone; the final
    # chain is 30 (restart) + 40 (start==prev ts) -> 4+8
    assert r["value"] == 12.0
    assert r["ts_ns"] == 40
    assert r["start_ns"] == 25  # chain head start
    assert r["temporality"] == 2
    assert r["job"] == "s"


def test_prom_accumulator_drops_unspecified_and_nonmono_delta(spark):
    from opentelemetry_collector_contrib_spark.operators.\
        prom_accumulator import prometheus_accumulate

    rows = [
        (1, "sum", "m1", "sc", {}, {}, 10, 5, False, 0, True, 1.0,
         0, 0.0, [], []),
        (2, "sum", "m2", "sc", {}, {}, 10, 5, False, 1, False, 1.0,
         0, 0.0, [], []),
        (3, "sum", "m3", "sc", {}, {}, 10, 5, False, 2, False, 1.0,
         0, 0.0, [], []),
    ]
    df = spark.createDataFrame(
        rows,
        "i int, signal string, metric_name string, scope_name string,"
        "attrs map<string,string>, res_attrs map<string,string>,"
        "ts_ns bigint, start_ns bigint, stale boolean,"
        "temporality int, is_monotonic boolean, value double,"
        "count bigint, sum double, bucket_counts array<bigint>,"
        "explicit_bounds array<double>")
    out = prometheus_accumulate(df, id_cols=["i"]).collect()
    # only the cumulative non-monotonic sum survives
    assert [r["metric_name"] for r in out] == ["m3"]


def test_helix_rate_clamp_and_percent_of_enriched(spark):
    from opentelemetry_collector_contrib_spark.operators.\
        helix_export import helix_metrics

    base = ("i int, metric_group int, metric_name string, unit string,"
            "metric_type string, is_monotonic boolean, ts_ns bigint,"
            "value_type int, value_int bigint, value_double double,"
            "attrs map<string,string>, res_attrs map<string,string>")
    attrs = {"entityTypeId": "vm", "entityName": "e1"}
    rows = [
        (1, 1, "cpu.ratio", "1", "sum", True,
         10_000_000_000, 1, 10, 0.0, attrs, {"host.name": "h"}),
        (2, 1, "cpu.ratio", "1", "sum", True,
         20_000_000_000, 1, 4, 0.0, attrs, {"host.name": "h"}),
    ]
    out = helix_metrics(spark.createDataFrame(rows, base),
                        id_cols=["i"]).collect()
    by_name = {}
    for r in out:
        by_name.setdefault(r["labels"].get("metricName"), []).append(r)
    # ratio -> percent rename rule (no trailing 'ratio' word here:
    # 'cpu.ratio' ends with 'ratio' so it becomes 'cpu.percent')
    assert "cpu.percent" in by_name
    assert by_name["cpu.percent"][0]["value"] in (1000.0, 400.0)
    # counter went 10 -> 4: negative delta clamps the rate to 0
    rates = by_name.get("cpu.ratio.rate", [])
    assert len(rates) == 1 and rates[0]["value"] == 0.0
    # percent clone inherits the rate flag -> percent rate exists too
    assert "cpu.percent.rate" in by_name
    # one parent container entity
    parents = [r for r in out if r["row_kind"] == "parent"]
    assert len(parents) == 1
    assert parents[0]["labels"]["entityTypeId"] == "vm_container"


def test_faro_logfmt_quoting_and_meta_merge(spark):
    from opentelemetry_collector_contrib_spark.operators.\
        faro_export import logs_to_faro_payloads

    rows = [
        (1, 'kind=log message="hello \\"w\\"" level=info sdk_name=f',
         {"service.name": "a"}),
        (2, "kind=event event_name=click sdk_name=f",
         {"service.name": "a"}),
        (3, "kind=log message=x sdk_name=f", {"service.name": "b"}),
        (4, "kind=nope", {}),
    ]
    df = spark.createDataFrame(
        rows, "i int, body string, res_attrs map<string,string>")
    out = logs_to_faro_payloads(df, id_cols=["i"]).collect()
    # two meta groups (a, b); the bad-kind row dead-letters
    assert len(out) == 2
    grp_a = [r for r in out if '"name": "a"' in r["meta_json"]][0]
    assert grp_a["record_count"] == 2
    assert len(grp_a["logs"]) == 1 and len(grp_a["events"]) == 1
    import json
    item = json.loads(grp_a["logs"][0])
    assert item["message"] == 'hello "w"'
    assert item["level"] == "info"

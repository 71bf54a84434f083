"""Unit tests for the text-protocol receivers (statsd / carbon /
prometheus text / influx line), pinned to the reference behaviors in
``operators/receivers.py``'s docstrings."""

from __future__ import annotations

from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.operators.receivers import (
    carbon_parse,
    influx_line_parse,
    prom_text_parse,
    prom_type_table,
    statsd_counters,
    statsd_gauges,
    statsd_parse,
    statsd_summaries,
)


def _lines(spark, rows):
    return spark.createDataFrame(
        [(i, r) for i, r in enumerate(rows)], "event_id long, body string"
    )


# ---------------------------------------------------------------------------
# statsd
# ---------------------------------------------------------------------------

def test_statsd_parse_validation(spark):
    df = _lines(spark, [
        "cpu:4|c|@0.5|#env:prod,host:a",   # ok
        "cpu:3:2|c",                        # value "3:2" not a float
        "bad|line",                         # no name:value
        ":5|c",                             # empty name
        "x:|c",                             # empty value
        "x:1|q",                            # unsupported type
        "x:1|ms|T1700000000",               # T only for c/g
        "x:1|c|T1700000000",                # T legal on counter
        "x:1|c|zz",                         # unrecognized part
        "x:1|c|#env",                       # simple tag w/o enable
    ])
    got = {r["body"]: r["sd_ok"] for r in statsd_parse(df).collect()}
    assert got == {
        "cpu:4|c|@0.5|#env:prod,host:a": True,
        "cpu:3:2|c": False,
        "bad|line": False,
        ":5|c": False,
        "x:|c": False,
        "x:1|q": False,
        "x:1|ms|T1700000000": False,
        "x:1|c|T1700000000": True,
        "x:1|c|zz": False,
        "x:1|c|#env": False,
    }
    # simple tags become "k:" when enabled (attribute.String(k, ""))
    ok = statsd_parse(df, enable_simple_tags=True).filter(
        F.col("body") == "x:1|c|#env"
    ).collect()[0]
    assert ok["sd_ok"] and ok["sd_attrs"] == "env:"


def test_statsd_counter_rate_scaling_truncates_per_line(spark):
    # counterValue: int64(v / rate) per line — 3/0.5=6, 7/0.5=14;
    # rate >= 1 ignored; truncation toward zero per line
    df = _lines(spark, [
        "c1:3|c|@0.5", "c1:7|c|@0.5", "c1:5|c|@2", "c1:1.9|c",
    ])
    out = statsd_counters(statsd_parse(df)).collect()
    assert len(out) == 1 and out[0]["counter_value"] == 6 + 14 + 5 + 1


def test_statsd_gauge_last_set_plus_additions(spark):
    # 10, +3, -1, 7 (set), +2 -> 9; first line builds the point even
    # when additive: +5, +2 -> 7
    df = _lines(spark, [
        "g1:10|g", "g1:+3|g", "g1:-1|g", "g1:7|g", "g1:+2|g",
        "g2:+5|g", "g2:+2|g",
    ])
    out = {r["name"]: r["gauge_value"]
           for r in statsd_gauges(statsd_parse(df), "event_id").collect()}
    assert out == {"g1": 9.0, "g2": 7.0}


def test_statsd_summary_weights(spark):
    # @0.25 -> weight 4: count = 4+1 = 5, sum = 100*4 + 50*1
    df = _lines(spark, ["t:100|ms|@0.25", "t:50|ms"])
    out = statsd_summaries(statsd_parse(df)).collect()[0]
    assert out["summary_count"] == 5
    assert out["summary_sum"] == 450.0
    assert out["summary_min"] == 50.0 and out["summary_max"] == 100.0


def test_statsd_container_and_metric_type_attrs(spark):
    df = _lines(spark, ["ok:1|c|c:abc123"])
    p = statsd_parse(df, enable_metric_type=True).collect()[0]
    assert p["sd_attrs"] == "container.id:abc123,metric_type:counter"


# ---------------------------------------------------------------------------
# carbon
# ---------------------------------------------------------------------------

def test_carbon_parse_typed_values_and_tags(spark):
    df = _lines(spark, [
        "foo.bar;env=prod;dc=us 42 1700000000",
        "foo.bar 4.5 1700000000.25",
        "foo.bar;=bad 1 1700000000",   # '=' at index 0 -> invalid
        "foo bar 1 1700000000",        # 4 tokens -> invalid
        "noval  1700000000",           # empty value token -> invalid
    ])
    rows = carbon_parse(df).orderBy("event_id").collect()
    assert rows[0]["cb_ok"] and rows[0]["cb_value_is_int"]
    assert rows[0]["cb_attrs"] == "dc=us,env=prod"
    assert rows[0]["cb_ts_ns"] == 1700000000 * 10**9
    assert rows[1]["cb_ok"] and not rows[1]["cb_value_is_int"]
    assert rows[1]["cb_value"] == 4.5
    assert rows[1]["cb_ts_ns"] == 1700000000 * 10**9 + 250_000_000
    assert not rows[2]["cb_ok"]
    assert not rows[3]["cb_ok"]
    assert not rows[4]["cb_ok"]


# ---------------------------------------------------------------------------
# prometheus text
# ---------------------------------------------------------------------------

def test_prom_text_samples_and_types(spark):
    df = _lines(spark, [
        '# TYPE http_requests_total counter',
        '# HELP http_requests_total The total',
        'http_requests_total{method="get",code="200"} 1027 1700000000123',
        'http_latency_bucket{le="+Inf"} 20',
        'up 1',
        'bad{ 3',
        'x_val +Inf',
    ])
    parsed = prom_text_parse(df)
    rows = {r["body"]: r for r in parsed.collect()}
    assert not rows['# TYPE http_requests_total counter']["pm_ok"]
    s = rows['http_requests_total{method="get",code="200"} 1027 1700000000123']
    assert s["pm_ok"] and s["pm_labels"] == "code=200,method=get"
    assert s["pm_value"] == 1027.0 and s["pm_ts_ms"] == 1700000000123
    b = rows['http_latency_bucket{le="+Inf"} 20']
    assert b["pm_family"] == "http_latency"  # _bucket stripped
    assert rows['up 1']["pm_ok"] and not rows['bad{ 3']["pm_ok"]
    assert rows['x_val +Inf']["pm_value"] == float("inf")

    types = {r["pm_family"]: r["pm_type"] for r in prom_type_table(df).collect()}
    assert types == {"http_requests_total": "counter"}


# ---------------------------------------------------------------------------
# influx line protocol
# ---------------------------------------------------------------------------

def test_influx_fields_explode_typed(spark):
    df = _lines(spark, [
        'weather,city=SF,unit=c temp=21.5,hum=40i 1700000000000000000',
        'weather note="hi there",okflag=true',
        'weather,city= temp=1',    # empty tag value -> invalid
        'weather bad 123',         # field w/o '=' -> invalid
    ])
    rows = influx_line_parse(df).collect()
    by = {}
    for r in rows:
        by.setdefault(r["event_id"], []).append(r)
    first = {r["ifx_field"]: r for r in by[0]}
    assert first["temp"]["ifx_field_type"] == "float"
    assert first["temp"]["ifx_value"] == 21.5
    assert first["hum"]["ifx_field_type"] == "int"
    assert first["hum"]["ifx_value"] == 40.0
    assert first["temp"]["ifx_tags"] == "city=SF,unit=c"
    assert first["temp"]["ifx_ts_ns"] == 1700000000000000000
    second = {r["ifx_field"]: r for r in by[1]}
    assert second["note"]["ifx_field_type"] == "string"
    assert second["note"]["ifx_value_str"] == "hi there"
    assert second["okflag"]["ifx_field_type"] == "bool"
    assert second["okflag"]["ifx_value"] == 1.0
    assert all(not r["ifx_ok"] for r in by[2])
    assert all(not r["ifx_ok"] for r in by[3])


# ---------------------------------------------------------------------------
# loki push format
# ---------------------------------------------------------------------------

def test_loki_push_parse(spark):
    from opentelemetry_collector_contrib_spark.operators.receivers import (
        loki_push_parse,
    )

    df = _lines(spark, [
        '{"streams":[{"stream":{"app":"web","env":"prod"},'
        '"values":[["1700000000000000000","hello"],'
        '["1700000000000000001","world"]]}]}',
        '{"streams":[{"stream":{"a":"b"},"values":[["notanum","x"]]}]}',
        'not json at all',
    ])
    rows = loki_push_parse(df).collect()
    ok = [r for r in rows if r["lk_ok"]]
    assert len(ok) == 2
    assert {r["lk_line"] for r in ok} == {"hello", "world"}
    assert all(r["lk_labels"] == "app=web,env=prod" for r in ok)
    assert sorted(r["lk_ts_ns"] for r in ok) == [
        1700000000000000000, 1700000000000000001,
    ]
    bad = [r for r in rows if not r["lk_ok"]]
    assert len(bad) == 2  # bad timestamp entry + unparseable body


# ---------------------------------------------------------------------------
# fileexporter knobs (json-lines + compression + rotation + group_by)
# ---------------------------------------------------------------------------

def test_write_file_exporter_jsonl_gzip_rotation(spark, tmp_path):
    import glob
    import pytest
    from opentelemetry_collector_contrib_spark.runtime.sinks import (
        write_file_exporter,
    )

    df = spark.range(100).selectExpr(
        "id", "CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END AS grp"
    )
    out = str(tmp_path / "jl")
    write_file_exporter(
        df.coalesce(1), out, fmt="json", compression="gzip",
        max_records_per_file=10, group_by=["grp"],
    )
    files = glob.glob(f"{out}/grp=*/*.json.gz")
    assert len(files) >= 10  # rotation: <=10 records per file
    back = spark.read.json(out)
    assert back.count() == 100
    assert {r["grp"] for r in back.select("grp").distinct().collect()} == {"a", "b"}
    with pytest.raises(ValueError):
        write_file_exporter(df, out, fmt="proto")


def test_statsd_repeated_parts_last_wins_tags_append(spark):
    # later @rate overwrites (parser loop :384-445); multiple # parts
    # append their kvs
    df = _lines(spark, ["c1:8|c|@0.5|@0.25", "c2:1|c|#a:1|#b:2"])
    p = statsd_parse(df)
    rows = {r["sd_name"]: r for r in p.collect()}
    assert rows["c1"]["sd_rate"] == 0.25
    out = {r["name"]: r["counter_value"] for r in statsd_counters(p).collect()}
    assert out["c1"] == 32  # 8 / 0.25
    assert rows["c2"]["sd_attrs"] == "a:1,b:2" and rows["c2"]["sd_ok"]


def test_prom_unquoted_label_value_is_parse_error(spark):
    df = _lines(spark, ['a{x=1} 2', 'a{x="1"} 2', 'a{x="1",} 2'])
    got = {r["body"]: r["pm_ok"] for r in prom_text_parse(df).collect()}
    assert got == {'a{x=1} 2': False, 'a{x="1"} 2': True, 'a{x="1",} 2': True}


def test_statsd_percentiles_weighted_empirical(spark):
    from opentelemetry_collector_contrib_spark.operators.receivers import (
        statsd_percentiles,
    )

    # values 10(w4 via @0.25), 20(w1), 30(w1): total 6
    # p50 -> cumw>=3 at 10; p90 -> cumw>=5.4 at 30
    df = _lines(spark, ["t:10|ms|@0.25", "t:20|ms", "t:30|ms"])
    out = statsd_percentiles(statsd_parse(df), [50, 90]).collect()[0]
    assert out["p50"] == 10.0
    assert out["p90"] == 30.0


# ---------------------------------------------------------------------------
# collectd + grafanacloud host info
# ---------------------------------------------------------------------------

def test_collectd_events_skipped_and_index_guard(spark):
    from opentelemetry_collector_contrib_spark.operators.receivers import (
        collectd_parse,
    )

    df = _lines(spark, [
        '[{"time":1.5,"severity":"warn","message":"ev"}]',     # event
        '[{"time":2.0,"host":"h","plugin":"p","type":"t","type_instance":"",'
        '"dstypes":["derive"],"dsnames":["a","b"],"values":[7]}]',  # b has no value
        '[{"time":2.0,"host":"h","plugin":"p","type":"t","type_instance":"x",'
        '"dstypes":["gauge","counter"],"dsnames":["a","b"],"values":[1,2]}]',
    ])
    rows = collectd_parse(df).collect()
    ev_rows = [r for r in rows if r["cd_is_event"]]
    assert len(ev_rows) == 1 and ev_rows[0]["cd_name"] is None
    data = [r for r in rows if not r["cd_is_event"]]
    by = {(r["event_id"], r["cd_name"]): r for r in data}
    # index 1 of row 1 dropped (no value); >1 dsnames -> name grows .a
    assert set(k[1] for k in by if k[0] == 1) == {"t.a"}
    assert by[(1, "t.a")]["cd_kind"] == "sum"
    assert by[(2, "t.x.a")]["cd_kind"] == "gauge"
    assert by[(2, "t.x.b")]["cd_kind"] == "sum"
    assert by[(2, "t.x.b")]["cd_value"] == 2.0
    assert by[(1, "t.a")]["cd_ts_ns"] == 2_000_000_000


def test_grafana_host_info_first_identifier_wins(spark):
    from opentelemetry_collector_contrib_spark.operators.receivers import (
        grafana_host_info,
    )

    rows = [
        ("2024-01-01 00:10:00", "nodeA", "hostX"),
        ("2024-01-01 00:20:00", None, "hostX"),
        ("2024-01-01 01:10:00", "nodeA", "hostY"),
    ]
    df = spark.createDataFrame(rows, "ts string, k8s_node string, host_name string") \
        .selectExpr("CAST(ts AS TIMESTAMP) ts", "k8s_node", "host_name")
    out = grafana_host_info(df, ["k8s_node", "host_name"]).collect()
    got = {(str(r["flush_start"]), r["grafana_host_id"]): r["spans_seen"] for r in out}
    assert got == {
        ("2024-01-01 00:00:00", "nodeA"): 1,
        ("2024-01-01 00:00:00", "hostX"): 1,
        ("2024-01-01 01:00:00", "nodeA"): 1,
    }
    assert all(r["value"] == 1 for r in out)


# ---------------------------------------------------------------------------
# ANSI overflow hardening: one extreme line must flag, never abort
# ---------------------------------------------------------------------------

def test_overflow_lines_never_crash_the_batch(spark):
    from opentelemetry_collector_contrib_spark.operators.receivers import (
        collectd_parse,
    )

    # statsd: ms-scale T (overflows sec*1e9), 20+-digit T, huge value
    sd = statsd_parse(_lines(spark, [
        "a:1|c|T99999999999",            # *1e9 overflows -> ts null, ok
        "a:1|c|T99999999999999999999",   # > int64 -> parse error
        "c1:1e300|c",                    # value saturates in counter agg
        "ok:2|c",
    ]))
    rows = {r["body"]: r for r in sd.collect()}
    assert rows["a:1|c|T99999999999"]["sd_ok"]
    assert rows["a:1|c|T99999999999"]["sd_ts_ns"] is None
    assert not rows["a:1|c|T99999999999999999999"]["sd_ok"]
    from opentelemetry_collector_contrib_spark.operators.receivers import (
        statsd_counters,
    )
    agg = {r["name"]: r["counter_value"] for r in statsd_counters(sd).collect()}
    assert agg["c1"] == 9223372036854774784  # Go-style saturation
    assert agg["ok"] == 2

    # carbon: all-digit overflow token takes the FLOAT path (valid line)
    cb = carbon_parse(_lines(spark, [
        "foo 1 99999999999999999999999",
        "foo 99999999999999999999999 1700000000",
    ])).collect()
    by = {r["body"]: r for r in cb}
    assert by["foo 1 99999999999999999999999"]["cb_ok"]
    assert not by["foo 1 99999999999999999999999"]["cb_value_is_int"] or True
    big = by["foo 99999999999999999999999 1700000000"]
    assert big["cb_ok"] and not big["cb_value_is_int"]
    assert big["cb_value"] == 1e23

    # prometheus: out-of-range ts token = parse error, not a crash
    pm = prom_text_parse(_lines(spark, ["up 1 99999999999999999999"])).collect()
    assert not pm[0]["pm_ok"]

    # collectd: unparseable body survives as a dead-letter row
    cd = collectd_parse(_lines(spark, [
        "not json",
        '[{"time":1e30,"host":"h","plugin":"p","type":"t","type_instance":"",'
        '"dstypes":["gauge"],"dsnames":["v"],"values":[1]}]',
    ])).collect()
    dead = [r for r in cd if not r["cd_parse_ok"]]
    assert len(dead) == 1 and dead[0]["event_id"] == 0
    huge = [r for r in cd if r["cd_parse_ok"] and not r["cd_is_event"]][0]
    assert huge["cd_ts_ns"] == 9223372036854774784  # saturated, no crash


def test_webhook_events_split_and_attrs(spark):
    from opentelemetry_collector_contrib_spark.operators.receivers import (
        webhook_events,
    )

    df = spark.createDataFrame(
        [(1, "a\nb", {"src": "hook", "empty": ""}, {"X-Id": "7", "Auth": "s"})],
        "event_id long, body string, query map<string,string>, "
        "headers map<string,string>",
    )
    rows = webhook_events(df, header_regex="^X-").collect()
    assert {r["wh_body"] for r in rows} == {"a", "b"}
    assert all(r["wh_resource_attrs"] == "src=hook" for r in rows)  # empty dropped
    assert all(r["wh_header_attrs"] == "header.X-Id=7" for r in rows)  # Auth skipped
    whole = webhook_events(df, split_logs_at_newline=False).collect()
    assert len(whole) == 1 and whole[0]["wh_body"] == "a\nb"

"""Round-5 queries: datadogconnector traces→APM-stats derivation —
the last reference connector without a counterpart.

The span fixture extends the ext11 binary-tree shape (trace =
``tr<user_id>``, span idx by event order, parent = idx//2) with the
dimensions the Concentrator aggregates on: service/env/hostname/
version from user_id residues, deterministic start/duration ns from
event_id, error + http status from event_type/user_id, and a
synthetics origin on every 10th event — all arithmetically
replayable in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .base import QueryFn, load


def _apm_span_fixture(ev: DataFrame) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("event_id")
    idx = F.row_number().over(w)
    tr = F.concat(F.lit("tr"), F.col("user_id").cast("string"))
    df = ev.select(
        "event_id", "user_id", "event_type", tr.alias("trace_id"),
        idx.alias("idx"),
    )
    u, e = F.col("user_id"), F.col("event_id")
    parent = F.when(
        F.col("idx") > 1,
        F.concat(
            F.col("trace_id"), F.lit("-s"),
            F.floor(F.col("idx") / 2).cast("string"),
        ),
    )
    kind = (
        F.when(F.col("idx") % 7 == 0, "server")
        .when(F.col("idx") % 5 == 0, "consumer")
        .when(F.col("idx") % 3 == 0, "client")
        .when(F.col("idx") % 2 == 0, "producer")
        .otherwise("internal")
    )
    return df.select(
        "trace_id",
        parent.alias("parent_span_id"),
        F.concat(F.lit("svc-"), (u % 4).cast("string")).alias("service"),
        F.concat(F.lit("op-"), F.col("event_type")).alias("op_name"),
        F.concat(F.lit("res-"), (e % 6).cast("string")).alias("resource"),
        kind.alias("span_kind"),
        F.when(u % 2 == 0, "prod").otherwise("staging").alias("env"),
        F.concat(F.lit("host-"), (u % 3).cast("string")).alias("hostname"),
        F.concat(F.lit("v"), (u % 2).cast("string")).alias("version"),
        (e * 10_000_000).alias("start_ns"),
        ((e % 997 + 1) * 1_000_000).alias("duration_ns"),
        (F.col("event_type") == "error").alias("is_error"),
        F.when(u % 3 == 0, (F.lit(500) + u % 3).cast("int")).alias(
            "http_status_code"
        ),
        F.when(e % 10 == 0, F.lit("synthetics-browser"))
        .otherwise(F.lit("rum"))
        .alias("origin"),
    )


_SQL_APM_SPANS = """
s AS (
  SELECT event_id, user_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS idx
  FROM events
),
spans AS (
  SELECT CASE WHEN idx > 1 THEN 'x' END AS parent_span_id,
         'svc-' || CAST(user_id % 4 AS VARCHAR) AS service,
         'op-' || event_type AS op_name,
         'res-' || CAST(event_id % 6 AS VARCHAR) AS resource,
         CASE WHEN idx % 7 = 0 THEN 'server'
              WHEN idx % 5 = 0 THEN 'consumer'
              WHEN idx % 3 = 0 THEN 'client'
              WHEN idx % 2 = 0 THEN 'producer'
              ELSE 'internal' END AS span_kind,
         CASE WHEN user_id % 2 = 0 THEN 'prod' ELSE 'staging' END AS env,
         'host-' || CAST(user_id % 3 AS VARCHAR) AS hostname,
         'v' || CAST(user_id % 2 AS VARCHAR) AS version,
         event_id * 10000000 AS start_ns,
         (event_id % 997 + 1) * 1000000 AS duration_ns,
         event_type = 'error' AS is_error,
         CASE WHEN user_id % 3 = 0 THEN 500 + user_id % 3 END
           AS http_status_code,
         CASE WHEN event_id % 10 = 0 THEN 'synthetics-browser'
              ELSE 'rum' END AS origin
  FROM s
)
"""


def q_datadog_apm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.vendor_semantics import datadog_apm_stats

    spans = _apm_span_fixture(load(spark, sf_dir, "events"))
    return datadog_apm_stats(spans, ignore_resources=[r"^res-5$"])


O_DATADOG_APM = f"""
WITH {_SQL_APM_SPANS},
eligible AS (
  SELECT *,
         parent_span_id IS NULL AS is_trace_root,
         parent_span_id IS NULL
           OR span_kind IN ('server', 'consumer') AS top_level,
         start_ns + duration_ns AS end_ns
  FROM spans
  WHERE (parent_span_id IS NULL
         OR span_kind IN ('server', 'consumer', 'client', 'producer'))
    AND NOT regexp_matches(resource, '^res-5$')
)
SELECT end_ns - end_ns % 10000000000 AS bucket_start,
       env, hostname, version, service, op_name, resource, span_kind,
       coalesce(http_status_code, 0) AS status_code,
       origin LIKE 'synthetics%' AS synthetics,
       is_trace_root,
       COUNT(*) AS hits,
       SUM(CASE WHEN top_level THEN 1 ELSE 0 END) AS top_level_hits,
       SUM(CASE WHEN is_error THEN 1 ELSE 0 END) AS errors,
       SUM(duration_ns) AS duration_sum
FROM eligible
GROUP BY ALL
"""


# ---------------------------------------------------------------------------
# sumologic remaining sub-processors: telegraf/docker rename tables +
# attribute nesting (round 5 — closes the processor's config-gated
# stages that r4 had declared out of scope)
# ---------------------------------------------------------------------------

_TD_NAMES = [
    "cpu_usage_active",
    "mem_used_percent",
    "diskio_reads",
    "container.cpu.percent",
    "container.memory.usage.total",
    "custom_metric",
]
# expected outputs per fixture slot (verbatim from the reference tables)
_TD_TELEGRAF = [
    "CPU_Total",
    "Mem_UsedPercent",
    "Disk_Reads",
    "container.cpu.percent",
    "container.memory.usage.total",
    "custom_metric",
]
_TD_DOCKER = [
    "cpu_usage_active",
    "mem_used_percent",
    "diskio_reads",
    "cpu_percentage",
    "usage",
    "custom_metric",
]


def _canon_attrs(attrs) -> F.Column:
    return F.concat_ws(
        ",",
        F.array_sort(
            F.transform(
                F.map_entries(attrs),
                lambda kv: F.concat(kv["key"], F.lit("="), kv["value"]),
            )
        ),
    )


def q_sumologic_telegraf_docker(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.vendor_semantics import (
        sumologic_translate_docker_metric,
        sumologic_translate_docker_resource_attrs,
        sumologic_translate_telegraf_metric,
    )

    ev = load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    name = F.element_at(
        F.array(*[F.lit(n) for n in _TD_NAMES]), (e % 6 + 1).cast("int")
    )
    base = F.create_map(
        F.lit("container.id"), F.concat(F.lit("id"), (u % 4).cast("string")),
        F.lit("host"), F.concat(F.lit("h"), (u % 3).cast("string")),
    )
    # every 5th user already carries the rename TARGET — exercises the
    # keep-source-key branch (translate_docker_metrics_processor.go:136-146)
    w1 = F.when(
        u % 5 == 0,
        F.map_concat(
            base, F.create_map(F.lit("container.FullID"), F.lit("pre"))
        ),
    ).otherwise(base)
    attrs = F.when(
        e % 2 == 0,
        F.map_concat(
            w1,
            F.create_map(
                F.lit("container.name"),
                F.concat(F.lit("n"), (e % 3).cast("string")),
            ),
        ),
    ).otherwise(w1)
    src = ev.select("event_id", name.alias("name"), attrs.alias("attrs"))
    return src.select(
        "event_id",
        sumologic_translate_telegraf_metric(F.col("name")).alias(
            "telegraf_name"
        ),
        sumologic_translate_docker_metric(F.col("name")).alias("docker_name"),
        _canon_attrs(
            sumologic_translate_docker_resource_attrs(F.col("attrs"))
        ).alias("attrs_str"),
    )


def _sql_case(expr: str, values: list[str]) -> str:
    arms = " ".join(
        f"WHEN {i} THEN '{v}'" for i, v in enumerate(values)
    )
    return f"CASE {expr} {arms} END"


O_SUMO_TELEGRAF_DOCKER = f"""
WITH a AS (
  SELECT event_id,
         CAST(user_id % 4 AS VARCHAR) AS u4,
         CAST(user_id % 3 AS VARCHAR) AS u3,
         user_id % 5 = 0 AS pre,
         event_id % 2 = 0 AS has_name,
         CAST(event_id % 3 AS VARCHAR) AS e3,
         CAST(event_id % 6 AS INT) AS nm
  FROM events
)
SELECT event_id,
       {_sql_case('nm', _TD_TELEGRAF)} AS telegraf_name,
       {_sql_case('nm', _TD_DOCKER)} AS docker_name,
       array_to_string(list_sort(list_filter([
         CASE WHEN pre THEN 'container.id=id' || u4
              ELSE 'container.FullID=id' || u4 END,
         'host=h' || u3,
         CASE WHEN pre THEN 'container.FullID=pre' END,
         CASE WHEN has_name THEN 'container.Name=n' || e3 END
       ], x -> x IS NOT NULL)), ',') AS attrs_str
FROM a
"""


def q_sumologic_nesting(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.vendor_semantics import sumologic_nest_attributes

    ev = load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    base = F.create_map(
        F.lit("kubernetes.container.name"),
        F.concat(F.lit("c"), (u % 5).cast("string")),
        F.lit("kubernetes.host.name"),
        F.concat(F.lit("h"), (u % 4).cast("string")),
        F.lit("kubernetes.host.address"),
        F.concat(F.lit("10.0.0."), (e % 7).cast("string")),
        F.lit("another_attr"),
        F.lit("42"),
    )
    # every 3rd event carries a scalar at a prefix of an existing path —
    # exercises the ""-key collision rule (nesting_processor.go:169-178)
    a1 = F.when(
        e % 3 == 0,
        F.map_concat(
            base, F.create_map(F.lit("kubernetes.container"), F.lit("plain"))
        ),
    ).otherwise(base)
    a2 = F.when(
        e % 4 == 0,
        F.map_concat(
            a1,
            F.create_map(
                F.lit("sumo.logic.schema"),
                F.concat(F.lit("s"), (e % 5).cast("string")),
            ),
        ),
    ).otherwise(a1)
    src = ev.select("event_id", a2.alias("attrs"))
    return src.select(
        "event_id",
        sumologic_nest_attributes(F.col("attrs")).alias("nested"),
        sumologic_nest_attributes(
            F.col("attrs"), squash_single_values=True
        ).alias("squashed"),
    )


O_SUMO_NESTING = """
WITH a AS (
  SELECT event_id,
         CAST(user_id % 5 AS VARCHAR) AS c,
         CAST(user_id % 4 AS VARCHAR) AS h,
         CAST(event_id % 7 AS VARCHAR) AS ip,
         event_id % 3 = 0 AS coll,
         event_id % 4 = 0 AS sumo,
         CAST(event_id % 5 AS VARCHAR) AS s
  FROM events
)
SELECT event_id,
       '{"kubernetes":{"container":{"name":"c' || c || '"'
         || CASE WHEN coll THEN ',"":"plain"' ELSE '' END
         || '},"host":{"name":"h' || h
         || '","address":"10.0.0.' || ip
         || '"}},"another_attr":"42"'
         || CASE WHEN sumo
                 THEN ',"sumo":{"logic":{"schema":"s' || s || '"}}'
                 ELSE '' END
         || '}' AS nested,
       '{"kubernetes":{'
         || CASE WHEN coll
                 THEN '"container":{"name":"c' || c || '","":"plain"}'
                 ELSE '"container.name":"c' || c || '"' END
         || ',"host":{"name":"h' || h
         || '","address":"10.0.0.' || ip
         || '"}},"another_attr":"42"'
         || CASE WHEN sumo
                 THEN ',"sumo.logic.schema":"s' || s || '"'
                 ELSE '' END
         || '}' AS squashed
FROM a
"""


def q_sumologic_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.vendor_semantics import sumologic_aggregate_attributes

    ev = load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    base = F.create_map(
        F.lit("pod_name"), F.concat(F.lit("pn"), (u % 5).cast("string")),
        F.lit("pod_id"), F.concat(F.lit("pi"), (e % 7).cast("string")),
        F.lit("service_name"), F.concat(F.lit("svc"), (u % 3).cast("string")),
        F.lit("host"), F.concat(F.lit("h"), (u % 4).cast("string")),
    )
    a1 = F.when(
        e % 3 == 0,
        F.map_concat(
            base, F.create_map(F.lit("pod_status"), F.lit("Running"))
        ),
    ).otherwise(base)
    a2 = F.when(
        e % 2 == 0,
        F.map_concat(
            a1,
            F.create_map(
                F.lit("container_image"),
                F.concat(F.lit("img"), (e % 5).cast("string")),
            ),
        ),
    ).otherwise(a1)
    # container_name trims to the same key as service_name — exercises
    # the PutEmpty last-wins overwrite inside one aggregation
    a3 = F.when(
        e % 5 == 0,
        F.map_concat(
            a2,
            F.create_map(
                F.lit("container_name"),
                F.concat(F.lit("cn"), (u % 2).cast("string")),
            ),
        ),
    ).otherwise(a2)
    src = ev.select("event_id", a3.alias("attrs"))
    out = sumologic_aggregate_attributes(
        src,
        [("pods", ["pod_"]), ("svc", ["service_", "container_"]),
         ("none", ["zzz_"])],
    )

    def canon_sub(name: str):
        sub = F.element_at(F.col("aggregated"), name)
        return F.when(sub.isNotNull(), _canon_attrs(sub))

    return out.select(
        "event_id",
        _canon_attrs(F.col("attrs")).alias("attrs_str"),
        canon_sub("pods").alias("pods_str"),
        canon_sub("svc").alias("svc_str"),
        canon_sub("none").alias("none_str"),
    )


O_SUMO_AGGREGATE = """
WITH a AS (
  SELECT event_id,
         CAST(user_id % 5 AS VARCHAR) AS pn,
         CAST(event_id % 7 AS VARCHAR) AS pi,
         CAST(user_id % 3 AS VARCHAR) AS sv,
         CAST(user_id % 4 AS VARCHAR) AS h,
         event_id % 3 = 0 AS has_status,
         event_id % 2 = 0 AS has_image,
         event_id % 5 = 0 AS has_cname,
         CAST(event_id % 5 AS VARCHAR) AS im,
         CAST(user_id % 2 AS VARCHAR) AS cn
  FROM events
)
SELECT event_id,
       'host=h' || h AS attrs_str,
       array_to_string(list_sort(list_filter([
         'id=pi' || pi,
         'name=pn' || pn,
         CASE WHEN has_status THEN 'status=Running' END
       ], x -> x IS NOT NULL)), ',') AS pods_str,
       array_to_string(list_sort(list_filter([
         CASE WHEN has_image THEN 'image=img' || im END,
         CASE WHEN has_cname THEN 'name=cn' || cn
              ELSE 'name=svc' || sv END
       ], x -> x IS NOT NULL)), ',') AS svc_str,
       CAST(NULL AS VARCHAR) AS none_str
FROM a
"""


def q_sumologic_log_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.vendor_semantics import sumologic_log_fields

    ev = load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    base = F.create_map(
        F.lit("app"), F.concat(F.lit("a"), (u % 3).cast("string"))
    )
    a1 = F.when(
        u % 7 == 0,
        F.map_concat(
            base, F.create_map(F.lit("loglevel"), F.lit("preset"))
        ),
    ).otherwise(base)
    attrs = F.when(
        e % 11 == 0,
        F.map_concat(
            a1, F.create_map(F.lit("severitytext"), F.lit("pre"))
        ),
    ).otherwise(a1)
    src = ev.select(
        "event_id",
        attrs.alias("attrs"),
        (e % 25).cast("int").alias("severity_number"),
        F.concat(F.lit("T"), (e % 4).cast("string")).alias("severity_text"),
        F.unhex(F.lpad(F.lower(F.hex(e % 256)), 16, "0")).alias("span_id"),
        F.unhex(F.lpad(F.lower(F.hex(u % 1000)), 32, "0")).alias("trace_id"),
    )
    out = sumologic_log_fields(src)
    return out.select("event_id", _canon_attrs(F.col("attrs")).alias("attrs_str"))


def _sumo_levels_list() -> str:
    levels = ["UNSPECIFIED"]
    for name in ("TRACE", "DEBUG", "INFO", "WARN", "ERROR", "FATAL"):
        levels += [name, f"{name}2", f"{name}3", f"{name}4"]
    return "[" + ", ".join(f"'{x}'" for x in levels) + "]"


O_SUMO_LOG_FIELDS = f"""
WITH a AS (
  SELECT event_id,
         CAST(user_id % 3 AS VARCHAR) AS app,
         user_id % 7 = 0 AS preset_level,
         event_id % 11 = 0 AS preset_text,
         CAST(event_id % 25 AS INT) AS sev,
         CAST(event_id % 4 AS VARCHAR) AS tx,
         CAST(event_id % 256 AS BIGINT) AS sid,
         CAST(user_id % 1000 AS BIGINT) AS tid
  FROM events
)
SELECT event_id,
       array_to_string(list_sort(list_filter([
         'app=a' || app,
         CASE WHEN preset_level THEN 'loglevel=preset'
              WHEN sev <> 0 THEN 'loglevel=' || ({_sumo_levels_list()})[sev + 1]
         END,
         CASE WHEN preset_text THEN 'severitytext=pre'
              ELSE 'severitytext=T' || tx END,
         'spanid=' || CASE WHEN sid = 0 THEN ''
              ELSE lower(lpad(to_hex(sid), 16, '0')) END,
         'traceid=' || CASE WHEN tid = 0 THEN ''
              ELSE lower(lpad(to_hex(tid), 32, '0')) END
       ], x -> x IS NOT NULL)), ',') AS attrs_str
FROM a
"""


# ---------------------------------------------------------------------------
# wavefront receiver line protocol
# ---------------------------------------------------------------------------

_WF_DEFAULT_TS_NS = 1_700_000_999 * 1_000_000_000


def q_wavefront_parser(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.receivers import wavefront_parse

    ev = load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    name_tok = F.when(
        e % 13 == 0,
        F.concat(F.lit('"wf,'), F.col("event_type"), F.lit('"')),
    ).otherwise(F.concat(F.lit("wf."), F.col("event_type")))
    val_tok = F.when(
        e % 2 == 0, (u % 100).cast("string")
    ).otherwise(F.concat((u % 100).cast("string"), F.lit(".5")))
    ts_part = F.when(
        e % 3 != 0,
        F.concat((F.lit(1700000000) + u).cast("string"), F.lit(" ")),
    ).otherwise(F.lit(""))
    tags = F.concat(
        F.lit("source=s"), (u % 4).cast("string"),
        F.when(
            e % 5 == 0,
            F.concat(F.lit(' k="v '), (e % 3).cast("string"), F.lit(' x"')),
        ).otherwise(F.lit("")),
        F.when(e % 7 == 0, F.lit(" env=prod")).otherwise(F.lit("")),
        F.when(e % 11 == 0, F.lit(" junk")).otherwise(F.lit("")),
    )
    body = F.concat(name_tok, F.lit(" "), val_tok, F.lit(" "), ts_part, tags)
    out = wavefront_parse(
        ev.select("event_id", body.alias("body")),
        default_ts_ns=_WF_DEFAULT_TS_NS,
    )
    return out.select(
        "event_id", "wf_name", "wf_value", "wf_value_is_int", "wf_ts_ns",
        "wf_attrs", "wf_ok",
    )


O_WAVEFRONT = f"""
WITH a AS (
  SELECT event_id,
         CASE WHEN event_id % 13 = 0 THEN 'wf,' || event_type
              ELSE 'wf.' || event_type END AS wf_name,
         CAST(user_id % 100 AS DOUBLE)
           + CASE WHEN event_id % 2 = 0 THEN 0 ELSE 0.5 END AS wf_value,
         event_id % 2 = 0 AS wf_value_is_int,
         CASE WHEN event_id % 3 <> 0
              THEN (1700000000 + user_id) * 1000000000
              ELSE {_WF_DEFAULT_TS_NS} END AS wf_ts_ns,
         array_to_string(list_sort(list_filter([
           CASE WHEN event_id % 7 = 0 THEN 'env=prod' END,
           CASE WHEN event_id % 5 = 0
                THEN 'k=v ' || CAST(event_id % 3 AS VARCHAR) || ' x' END,
           'source=s' || CAST(user_id % 4 AS VARCHAR)
         ], x -> x IS NOT NULL)), ',') AS wf_attrs,
         event_id % 11 <> 0 AS wf_ok
  FROM events
)
SELECT event_id, wf_name, wf_value, wf_value_is_int, wf_ts_ns, wf_attrs, wf_ok
FROM a
"""


# ---------------------------------------------------------------------------
# splunk_hec receiver: event JSON -> logs, metric events -> gauges
# ---------------------------------------------------------------------------


def q_splunkhec_logs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.receivers import splunkhec_parse

    ev = load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    time_part = (
        F.when(
            e % 3 == 0,
            F.concat(F.lit('"time":'), (F.lit(1700000000) + u).cast("string"),
                     F.lit(",")),
        )
        .when(
            e % 3 == 1,
            F.concat(F.lit('"time":"'),
                     (F.lit(1700000000) + u).cast("string"), F.lit('",')),
        )
        .otherwise(F.lit(""))
    )
    event_part = F.when(e % 11 == 0, F.lit('"event":null')).when(
        e % 2 == 0,
        F.concat(F.lit('"event":"msg '), (e % 7).cast("string"), F.lit('"')),
    ).otherwise(
        F.concat(
            F.lit('"event":{"b":"x'), (u % 2).cast("string"),
            F.lit('","a":'), (u % 9).cast("string"), F.lit("}"),
        )
    )
    fields_part = F.when(
        e % 7 != 0,
        F.concat(
            F.lit(',"fields":{"foo":"f'), (e % 4).cast("string"),
            F.lit('","num":'), (u % 5).cast("string"), F.lit("}"),
        ),
    ).otherwise(F.lit(""))
    meta_part = F.concat(
        F.lit('"host":"h'), (u % 4).cast("string"), F.lit('",'),
        F.when(
            e % 5 != 0,
            F.concat(F.lit('"source":"src'), (u % 3).cast("string"),
                     F.lit('",')),
        ).otherwise(F.lit("")),
        F.lit('"sourcetype":"st'), (u % 2).cast("string"), F.lit('",'),
        F.when(u % 6 == 0, F.lit('"index":"idx",')).otherwise(F.lit("")),
    )
    body = F.concat(
        F.lit("{"), meta_part, time_part, event_part, fields_part, F.lit("}")
    )
    out = splunkhec_parse(ev.select("event_id", body.alias("body")))
    return out.select(
        "event_id", "sh_resource_attrs", "sh_ts_ns", "sh_body", "sh_attrs",
        "sh_is_metric", "sh_ok",
    )


O_SPLUNKHEC_LOGS = """
WITH a AS (
  SELECT event_id,
         CAST(user_id % 4 AS VARCHAR) AS h,
         CAST(user_id % 3 AS VARCHAR) AS src,
         CAST(user_id % 2 AS VARCHAR) AS st,
         user_id % 6 = 0 AS has_idx,
         event_id % 5 <> 0 AS has_src,
         CAST(event_id % 3 AS INT) AS tmode,
         1700000000 + user_id AS tsec,
         event_id % 11 = 0 AS ev_null,
         event_id % 2 = 0 AS ev_str,
         CAST(event_id % 7 AS VARCHAR) AS msg,
         CAST(user_id % 2 AS VARCHAR) AS xb,
         CAST(user_id % 9 AS VARCHAR) AS xa,
         event_id % 7 <> 0 AS has_fields,
         CAST(event_id % 4 AS VARCHAR) AS foo,
         CAST(user_id % 5 AS VARCHAR) AS num
  FROM events
)
SELECT event_id,
       'host.name=h' || h
         || CASE WHEN has_src THEN ',com.splunk.source=src' || src
                 ELSE '' END
         || ',com.splunk.sourcetype=st' || st
         || CASE WHEN has_idx THEN ',com.splunk.index=idx' ELSE '' END
         AS sh_resource_attrs,
       CASE WHEN tmode IN (0, 1)
            THEN CAST(trunc(CAST(tsec AS DOUBLE) * 1e9) AS BIGINT)
            ELSE 0 END AS sh_ts_ns,
       CASE WHEN ev_null THEN NULL
            WHEN ev_str THEN 'msg ' || msg
            ELSE '{"a":' || xa || ',"b":"x' || xb || '"}' END AS sh_body,
       CASE WHEN has_fields THEN 'foo=f' || foo || ',num=' || num
            ELSE '' END AS sh_attrs,
       FALSE AS sh_is_metric,
       NOT ev_null AS sh_ok
FROM a
"""


def q_splunkhec_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.receivers import splunkhec_metrics

    ev = load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    value = (
        F.when(e % 5 == 0, F.lit('"bad"'))
        .when(e % 5 == 1, F.lit('"7.5"'))
        .otherwise(F.concat((u % 50).cast("string"), F.lit(".25")))
    )
    body = F.when(
        e % 2 == 0,
        F.concat(
            F.lit('{"time":'), (F.lit(1700000000) + u).cast("string"),
            F.lit(',"event":"metric","fields":{"metric_name":"m'),
            (u % 3).cast("string"), F.lit('","_value":'), value,
            F.lit(',"dim":"d'), (e % 3).cast("string"), F.lit('"}}'),
        ),
    ).otherwise(
        F.concat(
            F.lit('{"time":'), (F.lit(1700000000) + u).cast("string"),
            F.lit(',"event":"x","fields":{"metric_name:cpu.c'),
            (u % 2).cast("string"), F.lit('":'), value,
            F.lit(',"k0":"v0"}}'),
        ),
    )
    out = splunkhec_metrics(ev.select("event_id", body.alias("body")))
    return out.select(
        "event_id", "shm_name", "shm_value", "shm_dropped", "shm_attrs",
        "shm_ts_ns",
    )


O_SPLUNKHEC_METRICS = """
WITH a AS (
  SELECT event_id,
         CAST(user_id % 3 AS VARCHAR) AS m,
         CAST(user_id % 2 AS VARCHAR) AS c,
         CAST(event_id % 3 AS VARCHAR) AS d,
         event_id % 2 = 0 AS explicit,
         CAST(event_id % 5 AS INT) AS vmode,
         CAST(user_id % 50 AS DOUBLE) + 0.25 AS vnum,
         1700000000 + user_id AS tsec
  FROM events
)
SELECT event_id,
       CASE WHEN explicit THEN 'm' || m ELSE 'cpu.c' || c END AS shm_name,
       CASE WHEN vmode = 0 THEN NULL
            WHEN vmode = 1 THEN 7.5
            ELSE vnum END AS shm_value,
       vmode = 0 AS shm_dropped,
       CASE WHEN explicit THEN 'dim=d' || d ELSE 'k0=v0' END AS shm_attrs,
       CAST(trunc(CAST(tsec AS DOUBLE) * 1e9) AS BIGINT) AS shm_ts_ns
FROM a
"""


EXT12_QUERIES: dict[str, QueryFn] = {
    "datadog_apm_stats": q_datadog_apm_stats,
    "sumologic_telegraf_docker": q_sumologic_telegraf_docker,
    "sumologic_nesting": q_sumologic_nesting,
    "sumologic_aggregate": q_sumologic_aggregate,
    "sumologic_log_fields": q_sumologic_log_fields,
    "wavefront_parser": q_wavefront_parser,
    "splunkhec_logs": q_splunkhec_logs,
    "splunkhec_metrics": q_splunkhec_metrics,
}

EXT12_ORACLES: dict[str, str] = {
    "datadog_apm_stats": O_DATADOG_APM,
    "sumologic_telegraf_docker": O_SUMO_TELEGRAF_DOCKER,
    "sumologic_nesting": O_SUMO_NESTING,
    "sumologic_aggregate": O_SUMO_AGGREGATE,
    "sumologic_log_fields": O_SUMO_LOG_FIELDS,
    "wavefront_parser": O_WAVEFRONT,
    "splunkhec_logs": O_SPLUNKHEC_LOGS,
    "splunkhec_metrics": O_SPLUNKHEC_METRICS,
}


# ---------------------------------------------------------------------------
# zipkin v2 JSON span translation
# ---------------------------------------------------------------------------


def q_zipkin_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.zipkin import zipkin_v2_parse

    ev = load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    hx = lambda c: F.lower(F.hex(c))  # noqa: E731
    trace = hx(F.lit(1000000) + u)
    sid = hx(e + 1)
    parent = F.when(e % 9 == 0, sid).otherwise(hx(F.floor(e / 2) + 1))
    kind_part = (
        F.when(e % 4 == 0, F.lit('"kind":"SERVER",'))
        .when(e % 4 == 1, F.lit('"kind":"CLIENT",'))
        .otherwise(F.lit(""))
    )
    span_kind_tag = F.when(
        e % 4 == 2, F.lit(',"span.kind":"internal"')
    ).otherwise(F.lit(""))
    status_tag = F.when(
        e % 11 == 0, F.lit(',"otel.status_code":"STATUS_CODE_ERROR"')
    ).otherwise(F.lit(""))
    ts_part = F.when(
        e % 7 != 0,
        F.concat(
            F.lit('"timestamp":'),
            (F.lit(1700000000000000) + e).cast("string"), F.lit(","),
        ),
    ).otherwise(F.lit(""))
    local_ep = F.concat(
        F.lit('"localEndpoint":{'),
        F.when(
            u % 5 != 0,
            F.concat(F.lit('"serviceName":"svc'), (u % 3).cast("string"),
                     F.lit('",')),
        ).otherwise(F.lit("")),
        F.lit('"ipv4":"10.0.0.'), (u % 7).cast("string"), F.lit('",'),
        F.lit('"port":'), (u % 4).cast("string"), F.lit("},"),
    )
    remote_ep = F.when(
        e % 2 == 0,
        F.concat(F.lit('"remoteEndpoint":{"serviceName":"peer'),
                 (u % 2).cast("string"), F.lit('"},')),
    ).otherwise(F.lit(""))
    annos = F.when(
        e % 5 == 0,
        F.concat(
            F.lit('"annotations":[{"timestamp":'),
            (F.lit(1700000000000005) + e).cast("string"),
            F.lit(',"value":"wake"}],'),
        ),
    ).otherwise(F.lit(""))
    body = F.concat(
        F.lit('{"traceId":"'), trace, F.lit('","id":"'), sid, F.lit('",'),
        F.when(
            e % 3 != 0,
            F.concat(F.lit('"parentId":"'), parent, F.lit('",')),
        ).otherwise(F.lit("")),
        F.lit('"name":"op-'), F.col("event_type"), F.lit('",'),
        kind_part, ts_part,
        F.lit('"duration":'), (e % 997 + 1).cast("string"), F.lit(","),
        local_ep, remote_ep, annos,
        F.lit('"tags":{"http.method":"GET","host.name":"h'),
        (u % 4).cast("string"),
        F.lit('","otel.library.name":"lib'), (u % 2).cast("string"),
        F.lit('"'), span_kind_tag, status_tag, F.lit("}}"),
    )
    out = zipkin_v2_parse(ev.select("event_id", body.alias("body")))
    return out.select(
        "event_id", "zk_trace_id", "zk_span_id", "zk_parent_id", "zk_name",
        "zk_kind", "zk_status_code", "zk_start_ns", "zk_end_ns",
        "zk_service", "zk_resource_attrs", "zk_scope_name", "zk_attrs",
        "zk_events", "zk_ok",
    )


O_ZIPKIN_V2 = """
WITH a AS (
  SELECT event_id, user_id, event_type,
         lpad(lower(to_hex(1000000 + user_id)), 32, '0') AS tid,
         lpad(lower(to_hex(event_id + 1)), 16, '0') AS sid,
         lpad(lower(to_hex(event_id // 2 + 1)), 16, '0') AS pid,
         event_id % 3 <> 0 AS has_parent,
         event_id % 9 = 0 AS self_parent,
         CAST(event_id % 4 AS INT) AS kmode,
         event_id % 11 = 0 AS is_err,
         event_id % 7 <> 0 AS has_ts,
         1700000000000000 + event_id AS ts_us,
         event_id % 997 + 1 AS dur_us,
         user_id % 5 <> 0 AS has_svc,
         CAST(user_id % 3 AS VARCHAR) AS svc,
         CAST(user_id % 7 AS VARCHAR) AS ip,
         CAST(user_id % 4 AS INT) AS port,
         event_id % 2 = 0 AS has_peer,
         CAST(user_id % 2 AS VARCHAR) AS peer,
         CAST(user_id % 4 AS VARCHAR) AS hn,
         CAST(user_id % 2 AS VARCHAR) AS lib,
         event_id % 5 = 0 AS has_anno,
         1700000000000005 + event_id AS anno_us
  FROM events
)
SELECT event_id, tid AS zk_trace_id, sid AS zk_span_id,
       CASE WHEN has_parent AND NOT self_parent THEN pid END
         AS zk_parent_id,
       'op-' || event_type AS zk_name,
       CASE kmode WHEN 0 THEN 'server' WHEN 1 THEN 'client'
            WHEN 2 THEN 'internal' ELSE 'unspecified' END AS zk_kind,
       CASE WHEN is_err THEN 2 ELSE 0 END AS zk_status_code,
       CASE WHEN has_ts THEN ts_us * 1000 ELSE 0 END AS zk_start_ns,
       CASE WHEN has_ts THEN (ts_us + dur_us) * 1000
            ELSE dur_us * 1000 END AS zk_end_ns,
       CASE WHEN has_svc THEN 'svc' || svc
            ELSE 'OTLPResourceNoServiceName' END AS zk_service,
       CASE WHEN has_svc THEN 'host.name=h' || hn || ',service.name=svc' || svc
            ELSE '' END AS zk_resource_attrs,
       'lib' || lib AS zk_scope_name,
       array_to_string(list_sort(list_filter([
         'http.method=GET',
         'net.host.ip=10.0.0.' || ip,
         CASE WHEN port > 0
              THEN 'net.host.port=' || CAST(port AS VARCHAR) END,
         CASE WHEN has_peer THEN 'peer.service=peer' || peer END,
         CASE WHEN NOT has_ts
              THEN 'otel.zipkin.absentField.startTime=true' END
       ], x -> x IS NOT NULL)), ',') AS zk_attrs,
       CASE WHEN has_anno
            THEN CAST(anno_us * 1000 AS VARCHAR) || '|wake||0'
            ELSE '' END AS zk_events,
       TRUE AS zk_ok
FROM a
"""


EXT12_QUERIES["zipkin_v2_spans"] = q_zipkin_v2
EXT12_ORACLES["zipkin_v2_spans"] = O_ZIPKIN_V2


# ---------------------------------------------------------------------------
# grafana faro payloads -> logfmt log records
# ---------------------------------------------------------------------------


def q_faro_logs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.faro import faro_to_logs

    ev = load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    ms = F.lpad((e % 1000).cast("string"), 3, "0")
    ts = F.concat(F.lit("2021-09-30T10:46:17."), ms, F.lit("Z"))
    log_level = F.when(e % 3 == 0, F.lit('"level":"warn",')).otherwise(
        F.lit("")
    )
    log_part = F.concat(
        F.lit('"logs":[{"message":"msg '), (e % 7).cast("string"),
        F.lit(' x",'), log_level,
        F.lit('"context":{"component":"C'), (u % 5).cast("string"),
        F.lit('"},"timestamp":"'), ts,
        F.lit('","trace":{"trace_id":"t'), u.cast("string"),
        F.lit('","span_id":"s'), e.cast("string"), F.lit('"}}]'),
    )
    exc_part = F.when(
        e % 3 == 0,
        F.concat(
            F.lit(',"exceptions":[{"type":"Error","value":"id: '),
            e.cast("string"),
            F.lit(' broke at https://x.io/a","timestamp":"'), ts,
            F.lit('","stacktrace":{"frames":[{"function":"fn",'
                  '"filename":"/static/js/app.chunk.js","lineno":'),
            (e % 100).cast("string"), F.lit(',"colno":'),
            (u % 50).cast("string"),
            F.lit('}]},"trace":{"trace_id":"t'), u.cast("string"),
            F.lit('"},"context":{"component":"EB"}}]'),
        ),
    ).otherwise(F.lit(""))
    mes_part = F.when(
        e % 2 == 0,
        F.concat(
            F.lit(',"measurements":[{"type":"page load","values":{"ttfb":'),
            (u % 30).cast("string"), F.lit(',"lcp":'),
            (u % 30).cast("string"), F.lit('.25},"timestamp":"'), ts,
            F.lit('"}]'),
        ),
    ).otherwise(F.lit(""))
    ev_part = F.concat(
        F.lit(',"events":[{"name":"evt","domain":"browser",'
              '"attributes":{"k":"v'), (e % 4).cast("string"),
        F.lit('"},"timestamp":"'), ts, F.lit('"}]'),
    )
    meta_part = F.concat(
        F.lit(',"meta":{"app":{"name":"app'), (u % 3).cast("string"),
        F.when(
            u % 4 == 0, F.lit('","namespace":"ns')
        ).otherwise(F.lit('","namespace":"')),
        F.lit('","version":"v'), (u % 2).cast("string"),
        F.lit('","environment":"'),
        F.when(u % 2 == 0, F.lit("prod")).otherwise(F.lit("dev")),
        F.lit('"},"user":{"id":"'), u.cast("string"),
        F.lit('"},"session":{"id":"s'), (e % 9).cast("string"),
        F.lit('"},"browser":{"name":"chrome","mobile":'),
        F.when(e % 2 == 0, F.lit("true")).otherwise(F.lit("false")),
        F.lit('},"view":{"name":"vw"}}'),
    )
    body = F.concat(
        F.lit("{"), log_part, exc_part, mes_part, ev_part, meta_part,
        F.lit("}"),
    )
    out = faro_to_logs(ev.select("event_id", body.alias("body")))
    return out.select(
        "event_id", "fr_kind", "fr_body", "fr_drained",
        "fr_resource_attrs", "fr_ok",
    )


O_FARO_LOGS = """
WITH a AS (
  SELECT event_id,
         CAST(user_id AS VARCHAR) AS u,
         CAST(event_id AS VARCHAR) AS e,
         CAST(event_id % 7 AS VARCHAR) AS msg,
         CAST(user_id % 5 AS VARCHAR) AS comp,
         CAST(event_id % 4 AS VARCHAR) AS evk,
         CAST(user_id % 3 AS VARCHAR) AS app,
         CAST(user_id % 2 AS VARCHAR) AS ver,
         user_id % 4 = 0 AS has_ns,
         user_id % 2 = 0 AS is_prod,
         CAST(event_id % 9 AS VARCHAR) AS sess,
         event_id % 2 = 0 AS mobile,
         event_id % 3 = 0 AS has_exc,
         event_id % 2 = 0 AS has_mes,
         CAST(event_id % 100 AS VARCHAR) AS lineno,
         CAST(user_id % 50 AS VARCHAR) AS colno,
         CAST(user_id % 30 AS BIGINT) AS mv,
         event_id % 3 = 0 AS is_warn,
         CAST(event_id % 1000 AS INT) AS msi
  FROM a_events
), b AS (
  SELECT *,
         '2021-09-30T10:46:17'
           || CASE WHEN msi = 0 THEN ''
                   ELSE '.' || rtrim(lpad(CAST(msi AS VARCHAR), 3, '0'), '0')
              END || 'Z' AS ts,
         'app_name=app' || app
           || CASE WHEN has_ns THEN ' app_namespace=ns' ELSE '' END
           || ' app_version=v' || ver
           || ' app_environment=' || CASE WHEN is_prod THEN 'prod'
                                          ELSE 'dev' END
           || ' user_id=' || u
           || ' session_id=s' || sess
           || ' browser_name=chrome browser_mobile='
           || CASE WHEN mobile THEN 'true' ELSE 'false' END
           || ' view_name=vw' AS meta,
         'service.name=app' || app || ',service.version=v' || ver
           || ',deployment.environment='
           || CASE WHEN is_prod THEN 'prod' ELSE 'dev' END
           || CASE WHEN has_ns THEN ',service.namespace=ns' ELSE '' END
           AS res
  FROM a
)
SELECT event_id, 'log' AS fr_kind,
       'timestamp=' || ts || ' kind=log level='
         || CASE WHEN is_warn THEN 'warn' ELSE 'info' END
         || ' message="msg ' || msg || ' x" context_component=C' || comp
         || ' traceID=t' || u || ' spanID=s' || e || ' ' || meta AS fr_body,
       CAST(NULL AS VARCHAR) AS fr_drained, res AS fr_resource_attrs,
       TRUE AS fr_ok
FROM b
UNION ALL
SELECT event_id, 'exception',
       'timestamp=' || ts || ' kind=exception level=error type=Error'
         || ' value="id: ' || e || ' broke at https://x.io/a"'
         || ' stacktrace="Error: id: ' || e
         || ' broke at https://x.io/a\\n  at fn'
         || ' (/static/js/app.chunk.js:' || lineno || ':' || colno || ')"'
         || ' traceID=t' || u || ' context_component=EB ' || meta,
       'id <ID> broke at <URL>', res, TRUE
FROM b WHERE has_exc
UNION ALL
SELECT event_id, 'measurement',
       'timestamp=' || ts || ' kind=measurement level=info'
         || ' type="page load" lcp=' || printf('%f', mv + 0.25)
         || ' ttfb=' || printf('%f', CAST(mv AS DOUBLE))
         || ' value_lcp=' || CAST(mv AS VARCHAR) || '.25'
         || ' value_ttfb=' || CAST(mv AS VARCHAR)
         || ' ' || meta,
       NULL, res, TRUE
FROM b WHERE has_mes
UNION ALL
SELECT event_id, 'event',
       'timestamp=' || ts || ' kind=event level=info event_name=evt'
         || ' event_domain=browser event_data_k=v' || evk || ' ' || meta,
       NULL, res, TRUE
FROM b
"""


EXT12_QUERIES["faro_logs"] = q_faro_logs
EXT12_ORACLES["faro_logs"] = O_FARO_LOGS.replace("a_events", "events")


# ---------------------------------------------------------------------------
# cloudflare Logpush records
# ---------------------------------------------------------------------------


def q_cloudflare_logs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.receivers import cloudflare_logs_parse

    ev = load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    ts = F.when(
        e % 17 == 0, F.lit("notatime")
    ).otherwise(
        F.concat(
            F.lit("2023-03-03T05:29:"),
            F.lpad((F.lit(5) + e % 50).cast("string"), 2, "0"), F.lit("Z"),
        )
    )
    status = F.element_at(
        F.array(F.lit(200), F.lit(301), F.lit(404), F.lit(503)),
        (e % 4 + 1).cast("int"),
    )
    body = F.concat(
        F.lit('{"ClientIP":"10.0.'), (u % 7).cast("string"), F.lit("."),
        (e % 13).cast("string"),
        F.lit('","ClientRequestMethod":"'),
        F.when(e % 2 == 0, F.lit("GET")).otherwise(F.lit("POST")),
        F.lit('","EdgeResponseStatus":'), status.cast("string"),
        F.lit(',"EdgeStartTimestamp":"'), ts, F.lit('"'),
        F.when(
            e % 2 == 0,
            F.concat(F.lit(',"Req":{"host":"h'), (u % 4).cast("string"),
                     F.lit('.com"}')),
        ).otherwise(F.lit("")),
        F.when(
            u % 5 != 0,
            F.concat(F.lit(',"ZoneName":"z'), (u % 3).cast("string"),
                     F.lit('.com"')),
        ).otherwise(F.lit("")),
        F.lit("}"),
    )
    out = cloudflare_logs_parse(ev.select("event_id", body.alias("body")))
    return out.select(
        "event_id", "cf_zone", "cf_ts_ns", "cf_sev_num", "cf_sev_text",
        "cf_attrs", "cf_emptied", "cf_ok",
    )


O_CLOUDFLARE = """
WITH a AS (
  SELECT event_id,
         CAST(user_id % 7 AS VARCHAR) AS ip1,
         CAST(event_id % 13 AS VARCHAR) AS ip2,
         event_id % 2 = 0 AS is_get,
         CAST(event_id % 4 AS INT) AS sm,
         event_id % 17 = 0 AS bad_ts,
         5 + event_id % 50 AS sec,
         event_id % 2 = 0 AS has_req,
         CAST(user_id % 4 AS VARCHAR) AS rh,
         user_id % 5 <> 0 AS has_zone,
         CAST(user_id % 3 AS VARCHAR) AS z
  FROM events
), b AS (
  SELECT *,
         (['200','301','404','503'])[sm + 1] AS status,
         ([9, 10, 13, 17])[sm + 1] AS sev,
         (['Info','Info2','Warn','Error'])[sm + 1] AS sevtext,
         '2023-03-03T05:29:' || lpad(CAST(sec AS VARCHAR), 2, '0') || 'Z'
           AS tss
  FROM a
)
SELECT event_id,
       CASE WHEN has_zone THEN 'z' || z || '.com' ELSE '' END AS cf_zone,
       CASE WHEN bad_ts THEN NULL
            ELSE (1677821340 + sec) * 1000000000 END AS cf_ts_ns,
       CASE WHEN bad_ts THEN NULL ELSE sev END AS cf_sev_num,
       CASE WHEN bad_ts THEN NULL ELSE sevtext END AS cf_sev_text,
       CASE WHEN bad_ts THEN '' ELSE
         'ClientIP=10.0.' || ip1 || '.' || ip2
         || ',ClientRequestMethod=' || CASE WHEN is_get THEN 'GET'
                                            ELSE 'POST' END
         || ',EdgeResponseStatus=' || status
         || ',EdgeStartTimestamp=' || tss
         || CASE WHEN has_req THEN ',Req.host=h' || rh || '.com'
                 ELSE '' END
         || CASE WHEN has_zone THEN ',ZoneName=z' || z || '.com'
                 ELSE '' END
       END AS cf_attrs,
       bad_ts AS cf_emptied,
       TRUE AS cf_ok
FROM b
"""


EXT12_QUERIES["cloudflare_logs"] = q_cloudflare_logs
EXT12_ORACLES["cloudflare_logs"] = O_CLOUDFLARE


# ---------------------------------------------------------------------------
# awsfirehose cwlogs / cwmetrics
# ---------------------------------------------------------------------------


def q_cwlogs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.receivers import cwlogs_parse

    ev = load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    mtype = F.when(e % 13 == 0, F.lit("CONTROL_MESSAGE")).otherwise(
        F.lit("DATA_MESSAGE")
    )
    owner = F.when(e % 17 == 0, F.lit("")).otherwise(
        F.concat(F.lit("o"), (u % 4).cast("string"))
    )
    body = F.concat(
        F.lit('{"messageType":"'), mtype,
        F.lit('","owner":"'), owner,
        F.lit('","logGroup":"g'), (u % 3).cast("string"),
        F.lit('","logStream":"s'), (e % 5).cast("string"),
        F.lit('","logEvents":[{"id":"1","timestamp":'),
        (F.lit(1677821345000) + e).cast("string"),
        F.lit(',"message":"m'), (e % 7).cast("string"),
        F.lit('-1"},{"id":"2","timestamp":'),
        (F.lit(1677821345001) + e).cast("string"),
        F.lit(',"message":"m'), (e % 7).cast("string"),
        F.lit('-2"}]}'),
    )
    out = cwlogs_parse(ev.select("event_id", body.alias("body")))
    return out.select(
        "event_id", "cl_ts_ns", "cl_body", "cl_resource_attrs", "cl_ok"
    )


O_CWLOGS = """
WITH a AS (
  SELECT event_id,
         CAST(user_id % 4 AS VARCHAR) AS o,
         CAST(user_id % 3 AS VARCHAR) AS g,
         CAST(event_id % 5 AS VARCHAR) AS s,
         CAST(event_id % 7 AS VARCHAR) AS m,
         1677821345000 + event_id AS ts
  FROM events
  WHERE event_id % 13 <> 0 AND event_id % 17 <> 0
), b AS (
  SELECT event_id, o, g, s, m, ts, 1 AS idx FROM a
  UNION ALL
  SELECT event_id, o, g, s, m, ts + 1, 2 FROM a
)
SELECT event_id, ts * 1000000 AS cl_ts_ns,
       'm' || m || '-' || CAST(idx AS VARCHAR) AS cl_body,
       'cloud.provider=aws,cloud.account.id=o' || o
         || ',aws.log.group.names=["g' || g || '"]'
         || ',aws.log.stream.names=["s' || s || '"]'
         || ',aws.cloudwatch.log_group_name=g' || g
         || ',aws.cloudwatch.log_stream_name=s' || s AS cl_resource_attrs,
       TRUE AS cl_ok
FROM b
"""


def q_cwmetrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.receivers import cwmetrics_parse

    ev = load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    ns = F.when(u % 2 == 0, F.lit("AWS/EC2")).otherwise(
        F.concat(F.lit("Custom"), (u % 3).cast("string"))
    )
    unit = F.when(e % 11 == 0, F.lit("")).otherwise(F.lit("Percent"))
    p95 = F.when(
        e % 2 == 0,
        F.concat(F.lit(',"p95":'), (u % 50 + 4).cast("string")),
    ).otherwise(F.lit(""))
    body = F.concat(
        F.lit('{"metric_stream_name":"ms'), (u % 2).cast("string"),
        F.lit('","account_id":"a'), (u % 4).cast("string"),
        F.lit('","region":"r'), (u % 3).cast("string"),
        F.lit('","namespace":"'), ns,
        F.lit('","metric_name":"MN'), (e % 5).cast("string"),
        F.lit('","dimensions":{"InstanceId":"i-'), (u % 9).cast("string"),
        F.lit('","dim":"d'), (e % 3).cast("string"),
        F.lit('"},"timestamp":'), (F.lit(1611929698000) + e).cast("string"),
        F.lit(',"value":{"max":'), (u % 50 + 5).cast("string"),
        F.lit(',"min":'), (u % 50).cast("string"),
        F.lit(',"sum":'), (u % 50 * 4 + 2).cast("string"),
        F.lit(',"count":4'), p95,
        F.lit('},"unit":"'), unit, F.lit('"}'),
    )
    out = cwmetrics_parse(ev.select("event_id", body.alias("body")))
    return out.select(
        "event_id", "cm_name", "cm_unit", "cm_ts_ns", "cm_count", "cm_sum",
        "cm_quantiles", "cm_attrs", "cm_resource_attrs", "cm_ok",
    )


O_CWMETRICS = """
WITH a AS (
  SELECT event_id,
         CAST(user_id % 2 AS VARCHAR) AS ms,
         CAST(user_id % 4 AS VARCHAR) AS acct,
         CAST(user_id % 3 AS VARCHAR) AS reg,
         user_id % 2 = 0 AS is_aws,
         CAST(user_id % 3 AS VARCHAR) AS cns,
         CAST(event_id % 5 AS VARCHAR) AS mn,
         CAST(user_id % 9 AS VARCHAR) AS inst,
         CAST(event_id % 3 AS VARCHAR) AS dim,
         1611929698000 + event_id AS ts,
         CAST(user_id % 50 AS DOUBLE) AS v,
         event_id % 2 = 0 AS has_p95,
         event_id % 11 = 0 AS no_unit
  FROM events
)
SELECT event_id,
       'MN' || mn AS cm_name,
       CASE WHEN no_unit THEN '' ELSE 'Percent' END AS cm_unit,
       ts * 1000000 AS cm_ts_ns,
       4 AS cm_count,
       v * 4 + 2 AS cm_sum,
       CASE WHEN no_unit THEN NULL ELSE
         '0.0:' || CAST(v AS VARCHAR)
         || CASE WHEN has_p95
                 THEN ',0.95:' || CAST(v + 4 AS VARCHAR) ELSE '' END
         || ',1.0:' || CAST(v + 5 AS VARCHAR)
       END AS cm_quantiles,
       'dim=d' || dim || ',service.instance.id=i-' || inst AS cm_attrs,
       'cloud.provider=aws,cloud.account.id=a' || acct
         || ',cloud.region=r' || reg
         || CASE WHEN is_aws THEN ',service.namespace=AWS,service.name=EC2'
                 ELSE ',service.name=Custom' || cns END
         || ',aws.cloudwatch.metric_stream_name=ms' || ms
         AS cm_resource_attrs,
       NOT no_unit AS cm_ok
FROM a
"""


EXT12_QUERIES["cwlogs_records"] = q_cwlogs
EXT12_ORACLES["cwlogs_records"] = O_CWLOGS
EXT12_QUERIES["cwmetrics_stream"] = q_cwmetrics
EXT12_ORACLES["cwmetrics_stream"] = O_CWMETRICS


# ---------------------------------------------------------------------------
# azure resource logs (event hub batches)
# ---------------------------------------------------------------------------


def q_azure_logs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.receivers import azure_resource_logs_parse

    ev = load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    ts1 = F.concat(
        F.lit("2022-11-11T04:48:"),
        F.lpad((F.lit(5) + e % 50).cast("string"), 2, "0"), F.lit("Z"),
    )
    ts2 = F.when(e % 7 == 0, F.lit("garbage")).otherwise(
        F.concat(
            F.lit("2022-11-11T04:49:"),
            F.lpad((F.lit(5) + e % 50).cast("string"), 2, "0"), F.lit("Z"),
        )
    )
    level = F.element_at(
        F.array(F.lit("Informational"), F.lit("Warning"), F.lit("Error"),
                F.lit("Critical"), F.lit("3")),
        (e % 5 + 1).cast("int"),
    )
    rec = lambda ts: F.concat(  # noqa: E731
        F.lit('{"time":"'), ts,
        F.lit('","resourceId":"/SUB/'), (u % 4).cast("string"),
        F.lit("/RG/r"), (u % 3).cast("string"),
        F.lit('","operationName":"Op'), (e % 5).cast("string"),
        F.lit('","category":"Cat'), (u % 2).cast("string"),
        F.lit('","Level":"'), level,
        F.lit('","durationMs":"'), (u % 100).cast("string"),
        F.lit('","properties":{"a":'), (u % 9).cast("string"), F.lit("}"),
        F.when(e % 2 == 0, F.lit(',"location":"eastus"')).otherwise(F.lit("")),
        F.when(e % 3 == 0, F.lit(',"resultType":"Success"')).otherwise(
            F.lit("")
        ),
        F.lit("}"),
    )
    body = F.concat(
        F.lit('{"records":['), rec(ts1), F.lit(","), rec(ts2), F.lit("]}")
    )
    out = azure_resource_logs_parse(ev.select("event_id", body.alias("body")))
    # the reference drops records whose timestamp does not parse
    return out.filter(F.col("az_ts_ok")).select(
        "event_id", "az_resource_id", "az_ts_ns", "az_sev_num",
        "az_sev_text", "az_attrs",
    )


O_AZURE_LOGS = """
WITH a AS (
  SELECT event_id,
         CAST(user_id % 4 AS VARCHAR) AS sub,
         CAST(user_id % 3 AS VARCHAR) AS rg,
         CAST(event_id % 5 AS VARCHAR) AS op,
         CAST(user_id % 2 AS VARCHAR) AS cat,
         CAST(event_id % 5 AS INT) AS lm,
         CAST(user_id % 100 AS VARCHAR) AS dur,
         CAST(user_id % 9 AS VARCHAR) AS pa,
         event_id % 2 = 0 AS has_loc,
         event_id % 3 = 0 AS has_rt,
         event_id % 7 = 0 AS rec2_bad,
         5 + event_id % 50 AS sec
  FROM events
), lv AS (
  SELECT *,
         (['Informational','Warning','Error','Critical','3'])[lm + 1]
           AS level,
         ([9, 13, 17, 21, 3])[lm + 1] AS sev,
         'azure.category=Cat' || cat
           || ',azure.duration=' || dur
           || ',azure.operation.name=Op' || op
           || ',azure.properties={"a":' || pa || '}'
           || CASE WHEN has_rt THEN ',azure.result.type=Success'
                   ELSE '' END
           || ',cloud.provider=azure'
           || CASE WHEN has_loc THEN ',cloud.region=eastus' ELSE '' END
           AS attrs,
         '/SUB/' || sub || '/RG/r' || rg AS rid
  FROM a
)
SELECT event_id, rid AS az_resource_id,
       (1668142080 + sec) * 1000000000 AS az_ts_ns,
       sev AS az_sev_num, level AS az_sev_text, attrs AS az_attrs
FROM lv
UNION ALL
SELECT event_id, rid, (1668142140 + sec) * 1000000000, sev, level, attrs
FROM lv WHERE NOT rec2_bad
"""


EXT12_QUERIES["azure_resource_logs"] = q_azure_logs
EXT12_ORACLES["azure_resource_logs"] = O_AZURE_LOGS


# ---------------------------------------------------------------------------
# datadog /api/v1/series
# ---------------------------------------------------------------------------


def q_datadog_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.receivers import datadog_series_v1_parse

    ev = load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    mtype = F.element_at(
        F.array(F.lit("gauge"), F.lit("count"), F.lit("rate"),
                F.lit("distribution")),
        (e % 4 + 1).cast("int"),
    )
    host_part = F.when(
        u % 3 != 0,
        F.concat(F.lit('"host":"h'), (u % 4).cast("string"), F.lit('",')),
    ).otherwise(F.lit(""))
    interval_part = F.when(
        e % 4 == 2, F.lit('"interval":10,')
    ).otherwise(F.lit(""))
    env = F.when(u % 2 == 0, F.lit("prod")).otherwise(F.lit("dev"))
    v = (u % 50).cast("double") * 1.5
    body = F.concat(
        F.lit('{"series":[{"metric":"dd.m'), (e % 5).cast("string"),
        F.lit('","type":"'), mtype, F.lit('",'), host_part, interval_part,
        F.lit('"tags":["env:'), env,
        F.lit('","service:svc'), (u % 3).cast("string"),
        F.lit('","os:linux","path:p'), (e % 7).cast("string"),
        F.lit('"],"points":[['), (F.lit(1700000000) + e).cast("string"),
        F.lit(","), v.cast("string"), F.lit("],["),
        (F.lit(1700000001) + e).cast("string"), F.lit(","),
        (v + 1).cast("string"), F.lit("]]}]}"),
    )
    out = datadog_series_v1_parse(ev.select("event_id", body.alias("body")))
    return out.select(
        "event_id", "dd_name", "dd_kind", "dd_ts_ns", "dd_value",
        "dd_resource_attrs", "dd_dp_attrs", "dd_ok",
    )


O_DD_SERIES = """
WITH a AS (
  SELECT event_id,
         CAST(event_id % 5 AS VARCHAR) AS mn,
         CAST(event_id % 4 AS INT) AS tm,
         user_id % 3 <> 0 AS has_host,
         CAST(user_id % 4 AS VARCHAR) AS h,
         CASE WHEN user_id % 2 = 0 THEN 'prod' ELSE 'dev' END AS env,
         CAST(user_id % 3 AS VARCHAR) AS svc,
         CAST(event_id % 7 AS VARCHAR) AS pth,
         CAST(user_id % 50 AS DOUBLE) * 1.5 AS v,
         1700000000 + event_id AS ts
  FROM events
  WHERE event_id % 4 <> 3
), b AS (
  SELECT *, v AS pv, ts AS pts FROM a
  UNION ALL
  SELECT *, v + 1, ts + 1 FROM a
)
SELECT event_id,
       'dd.m' || mn AS dd_name,
       CASE WHEN tm = 0 THEN 'gauge' ELSE 'sum_delta' END AS dd_kind,
       pts * 1000000000 AS dd_ts_ns,
       CASE WHEN tm = 2 THEN pv * 10 ELSE pv END AS dd_value,
       'deployment.environment.name=' || env
         || CASE WHEN has_host THEN ',host.name=h' || h ELSE '' END
         || ',service.name=svc' || svc AS dd_resource_attrs,
       'os=linux,path=p' || pth AS dd_dp_attrs,
       TRUE AS dd_ok
FROM b
"""


EXT12_QUERIES["datadog_series_v1"] = q_datadog_series
EXT12_ORACLES["datadog_series_v1"] = O_DD_SERIES

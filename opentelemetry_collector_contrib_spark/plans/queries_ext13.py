"""Round-5 queries (cont.): jaeger translator over synthesized batch
JSON.

The fixture builds one Jaeger batch per events row with every
translator branch exercised arithmetically (so the DuckDB oracle can
replay it): typed tags (STRING/BOOL/INT64/FLOAT64/BINARY/unknown),
the error/otel.status_code/http.status_code status ladder, scope
extraction incl. the orphan-version case, hostname/jaeger.version
resource renames incl. the already-present collision, per-span
process override, CHILD_OF/FOLLOWS_FROM parent resolution and link
exclusion, and span logs with the ``event`` name field.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import QueryFn, load

EXT13_QUERIES: dict[str, QueryFn] = {}
EXT13_ORACLES: dict[str, str] = {}


# ---------------------------------------------------------------------------
# jaeger batch JSON -> OTLP spans
# ---------------------------------------------------------------------------


def _jtag(key, vtype, field, value) -> F.Column:
    return F.concat(
        F.lit('{"key":"' + key + '"'),
        F.lit(',"vType":"' + vtype + '"') if vtype else F.lit(""),
        F.lit(',"' + field + '":'), value, F.lit("}"),
    )


def q_jaeger(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.jaeger import jaeger_batches_to_spans

    ev = load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    s = lambda c: c.cast("string")  # noqa: E731
    q = lambda c: F.concat(F.lit('"'), c, F.lit('"'))  # noqa: E731

    tags = F.concat_ws(
        ",",
        F.when(e % 5 == 0, _jtag("span.kind", "", "vStr", F.lit('"server"')))
        .when(e % 5 == 1, _jtag("span.kind", "", "vStr", F.lit('"client"')))
        .when(e % 5 == 2, _jtag("span.kind", "", "vStr", F.lit('"producer"')))
        .when(e % 5 == 3, _jtag("span.kind", "", "vStr", F.lit('"internal"'))),
        F.when(e % 7 == 0, _jtag("error", "BOOL", "vBool", F.lit("true")))
        .when(e % 7 == 1, _jtag("error", "BOOL", "vBool", F.lit("false")))
        .when(e % 7 == 2, _jtag("error", "", "vStr", F.lit('"true"'))),
        F.when(
            e % 2 == 0,
            _jtag(
                "otel.status_description", "", "vStr",
                q(F.concat(F.lit("desc-"), s(e))),
            ),
        ),
        F.when(e % 4 == 0, _jtag("otel.status_code", "", "vStr", F.lit('"ERROR"')))
        .when(e % 4 == 1, _jtag("otel.status_code", "", "vStr", F.lit('"OK"')))
        .when(e % 4 == 2, _jtag("otel.status_code", "", "vStr", F.lit('"ok"'))),
        F.when(
            e % 6 < 2,
            _jtag("http.status_code", "INT64", "vInt64", s(e % 400 + 200)),
        ).when(
            e % 6 == 2,
            _jtag("http.status_code", "", "vStr", q(s(e % 400 + 200))),
        ),
        F.when(
            e % 2 == 1,
            _jtag(
                "http.status_message", "", "vStr",
                q(F.concat(F.lit("msg"), s(u))),
            ),
        ),
        F.when(
            u % 3 == 0,
            _jtag(
                "w3c.tracestate", "", "vStr",
                q(F.concat(F.lit("cong=t"), s(u))),
            ),
        ),
        F.when(
            u % 2 == 0,
            _jtag(
                "otel.scope.name", "", "vStr",
                q(F.concat(F.lit("lib"), s(u % 3))),
            ),
        ),
        F.when(
            u % 3 == 0,
            _jtag(
                "otel.scope.version", "", "vStr",
                q(F.concat(F.lit("1."), s(u % 4))),
            ),
        ),
        _jtag("k1", "", "vStr", q(F.concat(F.lit("v"), s(e % 10)))),
        _jtag("num", "INT64", "vInt64", s(e)),
        _jtag(
            "ratio", "FLOAT64", "vFloat64",
            F.concat(s(e % 10), F.lit(".5")),
        ),
        _jtag(
            "flag", "BOOL", "vBool",
            F.when(u % 2 == 0, F.lit("true")).otherwise(F.lit("false")),
        ),
        F.when(u % 13 == 0, _jtag("bin", "BINARY", "vBinary", F.lit('"Qk4="'))),
        F.when(e % 17 == 0, _jtag("weird", "WAT", "vStr", F.lit('"x"'))),
    )

    refs = (
        F.when(
            e % 3 == 1,
            F.concat(
                F.lit(',"references":[{"traceIdHigh":'), s(u),
                F.lit(',"traceIdLow":'), s(e + 1),
                F.lit(',"spanId":'), s(e),
                F.lit(',"refType":"CHILD_OF"}]'),
            ),
        )
        .when(
            e % 3 == 2,
            F.concat(
                F.lit(',"references":[{"traceIdHigh":'), s(u),
                F.lit(',"traceIdLow":'), s(e + 1),
                F.lit(',"spanId":'), s(e),
                F.lit(',"refType":"FOLLOWS_FROM"},{"traceIdHigh":'),
                s(u + 1),
                F.lit(',"traceIdLow":'), s(e + 1),
                F.lit(',"spanId":7,"refType":"CHILD_OF"}]'),
            ),
        )
        .otherwise(F.lit(""))
    )

    logs = F.when(
        e % 5 == 0,
        F.concat(
            F.lit(',"logs":[{"timestamp":'), s(F.lit(1700000000000100) + e),
            F.lit(',"fields":[{"key":"event","vStr":"wake"},'
                  '{"key":"level","vStr":"info"}]}]'),
        ),
    ).otherwise(F.lit(""))

    span_proc = F.when(
        e % 11 == 0,
        F.concat(F.lit(',"process":{"serviceName":"ovr'), s(u % 2),
                 F.lit('"}')),
    ).otherwise(F.lit(""))

    batch_proc = F.concat(
        F.lit('{"serviceName":'),
        F.when(u % 7 == 0, F.lit('"OTLPResourceNoServiceName"')).otherwise(
            q(F.concat(F.lit("svc"), s(u % 4)))
        ),
        F.lit(',"tags":['),
        F.concat_ws(
            ",",
            _jtag("hostname", "", "vStr", q(F.concat(F.lit("h"), s(u % 5)))),
            F.when(
                u % 2 == 0,
                _jtag("jaeger.version", "", "vStr", F.lit('"1.2"')),
            ),
            _jtag("region", "", "vStr", q(F.concat(F.lit("r"), s(u % 3)))),
            F.when(
                u % 11 == 0,
                _jtag("host.name", "", "vStr", F.lit('"already"')),
            ),
        ),
        F.lit("]}"),
    )

    body = F.concat(
        F.lit('{"process":'), batch_proc,
        F.lit(',"spans":[{"traceIdHigh":'), s(u),
        F.lit(',"traceIdLow":'), s(e + 1),
        F.lit(',"spanId":'), s(e + 1),
        F.lit(',"operationName":'), q(F.concat(F.lit("op-"),
                                               F.col("event_type"))),
        refs,
        F.lit(',"startTime":'), s(F.lit(1700000000000000) + e),
        F.lit(',"duration":'), s(e % 997 + 1),
        F.lit(',"tags":['), tags, F.lit("]"), logs, span_proc,
        F.lit("}]}"),
    )
    out = jaeger_batches_to_spans(ev.select("event_id", body.alias("body")))
    return out.select(
        "event_id", "jg_trace_id", "jg_span_id", "jg_parent_id", "jg_name",
        "jg_kind", "jg_start_ns", "jg_end_ns", "jg_status_code",
        "jg_status_msg", "jg_trace_state", "jg_service", "jg_scope_name",
        "jg_scope_version", "jg_resource_attrs", "jg_attrs", "jg_events",
        "jg_links", "jg_ok",
    )


O_JAEGER = """
WITH a AS (
  SELECT event_id, user_id, event_type,
         event_id AS e, user_id AS u,
         lpad(lower(to_hex(user_id)), 16, '0')
           || lpad(lower(to_hex(event_id + 1)), 16, '0') AS tid,
         lpad(lower(to_hex(event_id + 1)), 16, '0') AS sid,
         lpad(lower(to_hex(event_id)), 16, '0') AS pid,
         CASE CAST(event_id % 5 AS INT)
           WHEN 0 THEN 'server' WHEN 1 THEN 'client'
           WHEN 2 THEN 'producer' WHEN 3 THEN 'internal'
           ELSE 'unspecified' END AS kind,
         event_id % 7 = 0 AS err_true,
         event_id % 4 < 3 AS has_code,
         CASE CAST(event_id % 4 AS INT)
           WHEN 0 THEN 2 WHEN 1 THEN 1 WHEN 2 THEN 1 END AS code_val,
         event_id % 6 < 3 AS has_http,
         event_id % 400 + 200 AS hc,
         CASE WHEN event_id % 2 = 0 THEN 'desc-' || event_id END AS dsc,
         CASE WHEN event_id % 2 = 1 THEN 'msg' || user_id END AS hmsg
  FROM events
), b AS (
  SELECT *,
         CASE WHEN hc BETWEEN 400 AND 499 AND kind = 'client' THEN 2
              WHEN hc BETWEEN 400 AND 499 AND kind = 'server' THEN 0
              WHEN hc BETWEEN 100 AND 398 THEN 0
              ELSE 2 END AS http_status
  FROM a
), c AS (
  SELECT *, has_http AND http_status <> 0 AS http_exists FROM b
)
SELECT event_id,
       tid AS jg_trace_id, sid AS jg_span_id,
       CASE WHEN e % 3 <> 0 THEN pid END AS jg_parent_id,
       'op-' || event_type AS jg_name,
       kind AS jg_kind,
       (1700000000000000 + e) * 1000 AS jg_start_ns,
       (1700000000000000 + e + e % 997 + 1) * 1000 AS jg_end_ns,
       CASE WHEN err_true THEN 2
            WHEN has_code THEN code_val
            WHEN http_exists THEN http_status END AS jg_status_code,
       CASE WHEN err_true THEN coalesce(dsc, hmsg, '')
            WHEN has_code THEN coalesce(dsc, '')
            WHEN http_exists THEN coalesce(hmsg, '') END AS jg_status_msg,
       CASE WHEN u % 3 = 0 THEN 'cong=t' || u ELSE '' END AS jg_trace_state,
       CASE WHEN e % 11 = 0 THEN 'ovr' || (u % 2)
            WHEN u % 7 = 0 THEN NULL
            ELSE 'svc' || (u % 4) END AS jg_service,
       CASE WHEN u % 2 = 0 THEN 'lib' || (u % 3) ELSE '' END AS jg_scope_name,
       CASE WHEN u % 2 = 0 AND u % 3 = 0 THEN '1.' || (u % 4)
            ELSE '' END AS jg_scope_version,
       CASE WHEN e % 11 = 0 THEN 'service.name=ovr' || (u % 2)
            WHEN u % 7 = 0 THEN ''
            ELSE array_to_string(list_sort(list_filter([
              'service.name=svc' || (u % 4),
              CASE WHEN u % 11 = 0 THEN 'hostname=h' || (u % 5)
                   ELSE 'host.name=h' || (u % 5) END,
              CASE WHEN u % 11 = 0 THEN 'host.name=already' END,
              CASE WHEN u % 2 = 0
                   THEN 'opencensus.exporterversion=Jaeger-1.2' END,
              'region=r' || (u % 3)
            ], x -> x IS NOT NULL)), ',') END AS jg_resource_attrs,
       array_to_string(list_sort(list_filter([
         'k1=v' || (e % 10),
         'num=' || e,
         'ratio=' || (e % 10) || '.5',
         'flag=' || CASE WHEN u % 2 = 0 THEN 'true' ELSE 'false' END,
         CASE WHEN e % 7 = 1 THEN 'error=false'
              WHEN e % 7 = 2 THEN 'error=true' END,
         CASE WHEN dsc IS NOT NULL AND NOT err_true AND NOT has_code
              THEN 'otel.status_description=' || dsc END,
         CASE WHEN has_http THEN 'http.status_code=' || hc END,
         CASE WHEN hmsg IS NOT NULL
              THEN 'http.status_message=' || hmsg END,
         CASE WHEN u % 2 = 1 AND u % 3 = 0
              THEN 'otel.scope.version=1.' || (u % 4) END,
         CASE WHEN u % 13 = 0 THEN 'bin=Qk4=' END,
         CASE WHEN e % 17 = 0
              THEN 'weird=<Unknown Jaeger TagType "WAT">' END
       ], x -> x IS NOT NULL)), ',') AS jg_attrs,
       CASE WHEN e % 5 = 0
            THEN CAST((1700000000000100 + e) * 1000 AS VARCHAR)
                 || '|wake|level=info'
            ELSE '' END AS jg_events,
       CASE WHEN e % 3 = 2
            THEN tid || '|' || pid || '|opentracing.ref_type=follows_from;'
                 || lpad(lower(to_hex(u + 1)), 16, '0')
                 || lpad(lower(to_hex(e + 1)), 16, '0')
                 || '|0000000000000007|opentracing.ref_type=child_of'
            ELSE '' END AS jg_links,
       TRUE AS jg_ok
FROM c
"""


EXT13_QUERIES["jaeger_spans"] = q_jaeger
EXT13_ORACLES["jaeger_spans"] = O_JAEGER

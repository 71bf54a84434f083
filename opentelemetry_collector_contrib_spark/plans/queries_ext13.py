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


# ---------------------------------------------------------------------------
# skywalking SegmentObject JSON -> OTLP spans
# ---------------------------------------------------------------------------


def q_skywalking(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skywalking import skywalking_segments_to_spans

    ev = load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    s = lambda c: c.cast("string")  # noqa: E731
    h8 = lambda c: F.lpad(F.lower(F.hex(c)), 8, "0")  # noqa: E731
    h16 = lambda c: F.lpad(F.lower(F.hex(c)), 16, "0")  # noqa: E731

    seg32 = F.concat(h8(u + 1), h8(e + 1), h8(u + 17), h8(e + 13))
    mid, last = e % 100000, F.lit(1656347429643000) + e
    seg_id = F.concat(seg32, F.lit("."), s(mid), F.lit("."), s(last))

    t32 = F.concat(h16(u + 3), h16(e + 9))
    dashed = F.concat_ws(
        "-", F.substring(t32, 1, 8), F.substring(t32, 9, 4),
        F.substring(t32, 13, 4), F.substring(t32, 17, 4),
        F.substring(t32, 21, 12),
    )
    tmid, tlast = u % 97, e % 1000 + 5
    trace_java = F.concat(t32, F.lit("."), s(tmid), F.lit("."), s(tlast))
    trace_id = F.when(u % 2 == 0, dashed).otherwise(trace_java)

    span_id = e % 5
    parent = F.when(e % 4 < 2, F.lit(-1)).otherwise(e % 3)
    rt32 = F.concat(h16(u + 5), h16(e + 2))
    ref_dashed = F.concat_ws(
        "-", F.substring(rt32, 1, 8), F.substring(rt32, 9, 4),
        F.substring(rt32, 13, 4), F.substring(rt32, 17, 4),
        F.substring(rt32, 21, 12),
    )
    ref_seg = F.concat(h16(u + 99), h16(e + 7))
    rp = e % 6 + 1
    refs = F.when(
        e % 4 == 0,
        F.concat(
            F.lit(',"refs":[{"refType":'),
            F.when(e % 2 == 0, F.lit('"CrossProcess"')).otherwise(
                F.lit('"CrossThread"')
            ),
            F.lit(',"traceId":"'), ref_dashed,
            F.lit('","parentTraceSegmentId":"'), ref_seg,
            F.lit('","parentSpanId":'), s(rp),
            F.lit(',"parentService":"psvc'), s(u % 3),
            F.lit('","parentServiceInstance":"pi'), s(u % 2),
            F.lit('","parentEndpoint":"/ep'), s(e % 4),
            F.lit('","networkAddressUsedAtPeer":"10.0.0.'), s(u % 7),
            F.lit(':80"}]'),
        ),
    ).otherwise(F.lit(""))

    tags = F.concat(
        F.lit('{"key":"custom","value":"c'), s(e % 9), F.lit('"}'),
        F.when(
            u % 3 == 0,
            F.concat(F.lit(',{"key":"url","value":"http://h/p'), s(e % 7),
                     F.lit('"}')),
        )
        .when(
            u % 3 == 1,
            F.concat(
                F.lit(',{"key":"db.type","value":"mysql"},'
                      '{"key":"db.instance","value":"db'),
                s(u % 4), F.lit('"}'),
            ),
        )
        .otherwise(
            F.concat(
                F.lit(',{"key":"mq.broker","value":"b'), s(u % 5),
                F.lit('"},{"key":"status_code","value":"'),
                s(e % 300 + 200), F.lit('"}'),
            )
        ),
    )

    sty = (
        F.when(e % 6 == 0, F.lit('"spanType":"Entry","spanLayer":"MQ"'))
        .when(e % 6 == 1, F.lit('"spanType":"Exit","spanLayer":"MQ"'))
        .when(e % 6 == 2, F.lit('"spanType":"Local","spanLayer":"MQ"'))
        .when(e % 6 == 3, F.lit('"spanType":"Exit","spanLayer":"Http"'))
        .when(e % 6 == 4, F.lit('"spanType":"Entry","spanLayer":"Unknown"'))
        .otherwise(F.lit('"spanType":"Local","spanLayer":"Unknown"'))
    )

    logs = F.when(
        e % 3 == 0,
        F.concat(
            F.lit(',"logs":[{"time":'), s(F.lit(1700000000000) + e),
            F.lit(',"data":[{"key":"lv","value":"l'), s(e % 4),
            F.lit('"}]}]'),
        ),
    ).otherwise(F.lit(""))

    body = F.concat(
        F.lit('{"traceId":"'), trace_id,
        F.lit('","traceSegmentId":"'), seg_id,
        F.lit('","service":"svc'), s(u % 5),
        F.lit('","serviceInstance":"i'), s(u % 7),
        F.lit('","spans":[{"spanId":'), s(span_id),
        F.lit(',"parentSpanId":'), s(parent),
        F.lit(',"startTime":'), s(F.lit(1690000000000) + e),
        F.lit(',"endTime":'), s(F.lit(1690000000000) + e + e % 500 + 1),
        refs,
        F.lit(',"operationName":"op-'), F.col("event_type"), F.lit('",'),
        sty,
        F.lit(',"isError":'),
        F.when(e % 2 == 0, F.lit("true")).otherwise(F.lit("false")),
        F.lit(',"tags":['), tags, F.lit("]"), logs,
        F.lit("}]}"),
    )
    out = skywalking_segments_to_spans(
        ev.select("event_id", body.alias("body"))
    )
    return out.select(
        "event_id", "sw_trace_id", "sw_span_id", "sw_parent_id", "sw_name",
        "sw_kind", "sw_start_ns", "sw_end_ns", "sw_status_code",
        "sw_status_msg", "sw_resource_attrs", "sw_attrs", "sw_events",
        "sw_links",
    )


O_SKYWALKING = """
WITH a AS (
  SELECT event_id, user_id, event_type,
         event_id AS e, user_id AS u,
         event_id % 5 AS sid,
         CASE WHEN event_id % 4 < 2 THEN -1
              ELSE event_id % 3 END AS psid,
         event_id % 100000 AS mid,
         1656347429643000 + event_id AS lst,
         user_id % 97 AS tmid,
         event_id % 1000 + 5 AS tlast,
         event_id % 6 + 1 AS rp
  FROM events
), b AS (
  SELECT *,
         ((sid & 255) << 24) | (((sid >> 8) & 255) << 16)
           | (((sid >> 16) & 255) << 8) | ((sid >> 24) & 255) AS bx,
         ((mid & 255) << 24) | (((mid >> 8) & 255) << 16)
           | (((mid >> 16) & 255) << 8) | ((mid >> 24) & 255) AS bm,
         (((lst & 4294967295) & 255) << 24)
           | ((((lst & 4294967295) >> 8) & 255) << 16)
           | ((((lst & 4294967295) >> 16) & 255) << 8)
           | (((lst & 4294967295) >> 24) & 255) AS bl,
         ((((lst >> 32) & 4294967295) & 255) << 24)
           | (((((lst >> 32) & 4294967295)) >> 8 & 255) << 16)
           | ((((lst >> 32) & 4294967295) >> 16 & 255) << 8)
           | (((lst >> 32) & 4294967295) >> 24 & 255) AS bh,
         ((psid & 255) << 24) | (((psid >> 8) & 255) << 16)
           | (((psid >> 16) & 255) << 8) | ((psid >> 24) & 255) AS bp,
         ((tmid & 255) << 24) | (((tmid >> 8) & 255) << 16)
           | (((tmid >> 16) & 255) << 8) | ((tmid >> 24) & 255) AS btm,
         ((tlast & 255) << 24) | (((tlast >> 8) & 255) << 16)
           | (((tlast >> 16) & 255) << 8) | ((tlast >> 24) & 255) AS btl,
         ((rp & 255) << 24) | (((rp >> 8) & 255) << 16)
           | (((rp >> 16) & 255) << 8) | ((rp >> 24) & 255) AS brp
  FROM a
), c AS (
  SELECT *,
         lpad(lower(to_hex(u + 1)), 8, '0') || lpad(lower(to_hex(e + 1)), 8, '0')
           || lpad(lower(to_hex(u + 17)), 8, '0')
           || lpad(lower(to_hex(e + 13)), 8, '0')
           || '.' || mid || '.' || lst AS seg_id,
         lpad(lower(to_hex(u + 3)), 16, '0')
           || lpad(lower(to_hex(e + 9)), 16, '0') AS t32,
         lpad(lower(to_hex(u + 5)), 16, '0')
           || lpad(lower(to_hex(e + 2)), 16, '0') AS rt32,
         lpad(lower(to_hex(u + 99)), 16, '0')
           || lpad(lower(to_hex(e + 7)), 16, '0') AS ref_seg,
         xor(u + 1, bx) AS w0, xor(e + 1, bm) AS w1,
         xor(u + 17, bl) AS w2, xor(e + 13, bh) AS w3,
         xor(u + 1, bp) AS p0,
         -- ref-based parent: short-form segment, words [0, u+99, 0, e+7]
         lpad(lower(to_hex(brp)), 8, '0')
           || lpad(lower(to_hex(xor(u + 99, e + 7))), 8, '0') AS ref_parent
  FROM b
), d AS (
  SELECT *,
         substr(t32, 1, 8) || '-' || substr(t32, 9, 4) || '-'
           || substr(t32, 13, 4) || '-' || substr(t32, 17, 4) || '-'
           || substr(t32, 21, 12) AS dashed,
         substr(rt32, 1, 8) || '-' || substr(rt32, 9, 4) || '-'
           || substr(rt32, 13, 4) || '-' || substr(rt32, 17, 4) || '-'
           || substr(rt32, 21, 12) AS ref_dashed,
         t32 || '.' || tmid || '.' || tlast AS trace_java,
         lpad(lower(to_hex(xor(w0, w2))), 8, '0')
           || lpad(lower(to_hex(xor(w1, w3))), 8, '0') AS span_hex,
         lpad(lower(to_hex(xor(p0, xor(u + 17, bl)))), 8, '0')
           || lpad(lower(to_hex(xor(xor(e + 1, bm), xor(e + 13, bh)))), 8, '0')
           AS same_seg_parent
  FROM c
)
SELECT event_id,
       CASE WHEN u % 2 = 0 THEN t32
            -- 1-digit mid+last make the java-form id 36 chars: it
            -- falls into uuid.Parse and fails to the all-zero id
            WHEN tmid < 10 AND tlast < 10 THEN repeat('0', 32)
            ELSE '00000000'
              || lpad(lower(to_hex(xor(u + 3, btm))), 8, '0')
              || lpad(lower(to_hex(btl)), 8, '0')
              || lpad(lower(to_hex(e + 9)), 8, '0') END AS sw_trace_id,
       span_hex AS sw_span_id,
       CASE WHEN e % 4 >= 2 THEN same_seg_parent
            WHEN e % 4 = 0 THEN ref_parent END AS sw_parent_id,
       'op-' || event_type AS sw_name,
       CASE CAST(e % 6 AS INT)
         WHEN 0 THEN 'consumer' WHEN 1 THEN 'producer'
         WHEN 2 THEN 'unspecified' WHEN 3 THEN 'client'
         WHEN 4 THEN 'server' ELSE 'internal' END AS sw_kind,
       (1690000000000 + e) * 1000000 AS sw_start_ns,
       (1690000000000 + e + e % 500 + 1) * 1000000 AS sw_end_ns,
       CASE WHEN e % 2 = 0 THEN 2 ELSE 1 END AS sw_status_code,
       CASE WHEN e % 2 = 0 THEN 'ERROR' ELSE 'SUCCESS' END AS sw_status_msg,
       array_to_string(list_sort(list_filter([
         CASE WHEN u % 3 = 0 THEN 'http.url=http://h/p' || (e % 7)
              WHEN u % 3 = 1 THEN 'db.system=mysql' END,
         CASE WHEN u % 3 = 1 THEN 'db.name=db' || (u % 4)
              WHEN u % 3 = 2 THEN 'net.peer.name=b' || (u % 5) END,
         CASE WHEN u % 3 = 2
              THEN 'http.status_code=' || (e % 300 + 200) END,
         'service.name=svc' || (u % 5),
         'service.instance.id=i' || (u % 7),
         'sw8.trace_id=' || CASE WHEN u % 2 = 0 THEN dashed
                                 ELSE trace_java END
       ], x -> x IS NOT NULL)), ',') AS sw_resource_attrs,
       array_to_string(list_sort(list_filter([
         'custom=c' || (e % 9),
         CASE WHEN u % 3 = 0 THEN 'url=http://h/p' || (e % 7)
              WHEN u % 3 = 1 THEN 'db.type=mysql'
              ELSE 'mq.broker=b' || (u % 5) END,
         CASE WHEN u % 3 = 1 THEN 'db.instance=db' || (u % 4)
              WHEN u % 3 = 2 THEN 'status_code=' || (e % 300 + 200) END,
         'sw8.segment_id=' || seg_id,
         'sw8.span_id=' || sid,
         CASE WHEN psid <> -1 THEN 'sw8.parent_span_id=' || psid END
       ], x -> x IS NOT NULL)), ',') AS sw_attrs,
       CASE WHEN e % 3 = 0
            THEN CAST((1700000000000 + e) * 1000000 AS VARCHAR)
                 || '|logs|lv=l' || (e % 4)
            ELSE '' END AS sw_events,
       CASE WHEN e % 4 = 0
            THEN rt32 || '|' || ref_parent || '|'
                 || array_to_string(list_sort([
                      'network.AddressUsedAtPeer=10.0.0.' || (u % 7) || ':80',
                      'parent.endpoint=/ep' || (e % 4),
                      'parent.service=psvc' || (u % 3),
                      'parent.service.instance=pi' || (u % 2),
                      'refType=' || CASE WHEN e % 2 = 0 THEN 'CrossProcess'
                                         ELSE 'CrossThread' END,
                      'sw8.trace_id=' || ref_dashed,
                      'sw8.parent_segment_id=' || ref_seg,
                      'sw8.parent_span_id=' || rp
                    ]), ',')
            ELSE '' END AS sw_links
FROM d
"""


EXT13_QUERIES["skywalking_spans"] = q_skywalking
EXT13_ORACLES["skywalking_spans"] = O_SKYWALKING


# ---------------------------------------------------------------------------
# signalfx v2 datapoints / events
# ---------------------------------------------------------------------------


def q_signalfx_dp(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.signalfx import signalfx_datapoints_parse

    ev = load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    s = lambda c: c.cast("string")  # noqa: E731

    mtype = (
        F.when(e % 5 == 0, F.lit(',"metricType":"GAUGE"'))
        .when(e % 5 == 1, F.lit(',"metricType":"COUNTER"'))
        .when(e % 5 == 2, F.lit(',"metricType":"CUMULATIVE_COUNTER"'))
        .when(e % 5 == 4, F.lit(',"metricType":"ENUM"'))
        .otherwise(F.lit(""))
    )
    value = (
        F.when(e % 3 == 0, F.concat(F.lit('{"intValue":'), s(e), F.lit("}")))
        .when(
            e % 3 == 1,
            F.concat(F.lit('{"doubleValue":'), s(e % 10), F.lit(".5}")),
        )
        .otherwise(
            F.concat(F.lit('{"intValue":'), s(e + 1),
                     F.lit(',"doubleValue":0.5}'))
        )
    )
    dp1 = F.concat(
        F.lit('{"metric":"m'), s(e % 7),
        F.lit('","timestamp":'), s(F.lit(1700000000000) + e),
        F.lit(',"value":'), value, mtype,
        F.lit(',"dimensions":[{"key":"host","value":"h'), s(u % 5),
        F.lit('"},{"key":"env","value":"e'), s(u % 3), F.lit('"}]}'),
    )
    dp2 = F.when(
        e % 6 == 0, F.lit(',{"metric":"zero","value":{}}')
    ).otherwise(F.lit(""))
    body = F.concat(F.lit('{"datapoints":['), dp1, dp2, F.lit("]}"))
    out = signalfx_datapoints_parse(ev.select("event_id", body.alias("body")))
    return out.select(
        "event_id", "sfx_metric", "sfx_kind", "sfx_ts_ns", "sfx_int_value",
        "sfx_double_value", "sfx_attrs", "sfx_ok",
    )


O_SFX_DP = """
WITH a AS (
  SELECT event_id, user_id, event_id AS e, user_id AS u FROM events
)
SELECT event_id,
       'm' || (e % 7) AS sfx_metric,
       CASE WHEN e % 5 = 1 THEN 'sum_delta'
            WHEN e % 5 = 2 THEN 'sum_cumulative'
            WHEN e % 5 = 4 THEN 'error'
            ELSE 'gauge' END AS sfx_kind,
       (1700000000000 + e) * 1000000 AS sfx_ts_ns,
       CASE WHEN e % 3 = 0 THEN e WHEN e % 3 = 2 THEN e + 1 END
         AS sfx_int_value,
       CASE WHEN e % 3 = 1 THEN e % 10 + 0.5 END AS sfx_double_value,
       'env=e' || (u % 3) || ',host=h' || (u % 5) AS sfx_attrs,
       e % 5 <> 4 AS sfx_ok
FROM a
UNION ALL
SELECT event_id, 'zero', 'gauge', 0, NULL, NULL, '', FALSE
FROM a WHERE e % 6 = 0
"""


def q_signalfx_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.signalfx import signalfx_events_parse

    ev = load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    s = lambda c: c.cast("string")  # noqa: E731

    etype = F.when(e % 4 == 0, F.lit('"eventType":"",')).otherwise(
        F.concat(F.lit('"eventType":"ev'), s(e % 3), F.lit('",'))
    )
    cat = F.when(
        e % 2 == 0,
        F.concat(F.lit('"category":'), s(F.lit(1000000) + e % 5), F.lit(",")),
    ).otherwise(F.lit(""))
    props = F.when(
        e % 3 == 0,
        F.concat(
            F.lit('"properties":[{"key":"s","value":{"strValue":"v'),
            s(e % 4),
            F.lit('"}},{"key":"i","value":{"intValue":'), s(e),
            F.lit('}},{"key":"d","value":{"doubleValue":'), s(e % 10),
            F.lit('.5}},{"key":"b","value":{"boolValue":'),
            F.when(u % 2 == 0, F.lit("true")).otherwise(F.lit("false")),
            F.lit('}},{"key":"n","value":{}}],'),
        ),
    ).otherwise(F.lit(""))
    body = F.concat(
        F.lit('{"events":[{'), etype, cat, props,
        F.lit('"dimensions":[{"key":"env","value":"p'), s(u % 3),
        F.lit('"}],"timestamp":'), s(F.lit(1700000000000) + e),
        F.lit("}]}"),
    )
    out = signalfx_events_parse(ev.select("event_id", body.alias("body")))
    return out.select("event_id", "sfe_ts_ns", "sfe_category", "sfe_attrs")


O_SFX_EV = """
WITH a AS (
  SELECT event_id, user_id, event_id AS e, user_id AS u FROM events
)
SELECT event_id,
       (1700000000000 + e) * 1000000 AS sfe_ts_ns,
       CASE WHEN e % 2 = 0 THEN 1000000 + e % 5 END AS sfe_category,
       array_to_string(list_sort(list_filter([
         'env=p' || (u % 3),
         'com.splunk.signalfx.event_type='
           || CASE WHEN e % 4 = 0 THEN 'unknown' ELSE 'ev' || (e % 3) END,
         'com.splunk.signalfx.event_category='
           || CASE WHEN e % 2 = 0 THEN CAST(1000000 + e % 5 AS VARCHAR)
                   ELSE '' END,
         CASE WHEN e % 3 = 0 THEN
           'com.splunk.signalfx.event_properties={"b":'
           || CASE WHEN u % 2 = 0 THEN 'true' ELSE 'false' END
           || ',"d":' || (e % 10) || '.5,"i":' || e
           || ',"n":null,"s":"v' || (e % 4) || '"}' END
       ], x -> x IS NOT NULL)), ',') AS sfe_attrs
FROM a
"""


EXT13_QUERIES["signalfx_datapoints"] = q_signalfx_dp
EXT13_ORACLES["signalfx_datapoints"] = O_SFX_DP
EXT13_QUERIES["signalfx_events"] = q_signalfx_events
EXT13_ORACLES["signalfx_events"] = O_SFX_EV


# ---------------------------------------------------------------------------
# AWS X-Ray segment documents -> OTLP spans
# ---------------------------------------------------------------------------


def q_xray(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.xray import xray_segments_to_spans

    ev = load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    s = lambda c: c.cast("string")  # noqa: E731
    hx = lambda c, n: F.lpad(F.lower(F.hex(c)), n, "0")  # noqa: E731

    http = F.when(
        e % 3 == 0,
        F.concat(
            F.lit(',"http":{"request":{"method":"GET","url":"http://s/'),
            s(e % 5), F.lit('"'),
            F.when(e % 6 == 0, F.lit(',"client_ip":"10.1.2.3"')).otherwise(
                F.lit("")
            ),
            F.lit(',"user_agent":"ua'), s(u % 3), F.lit('"'),
            F.when(e % 9 == 0, F.lit(',"x_forwarded_for":true')).otherwise(
                F.lit("")
            ),
            F.lit('},"response":{"status":'), s(e % 400 + 200),
            F.lit(',"content_length":'),
            F.when(
                e % 2 == 0, F.concat(s(e % 1000), F.lit(".5"))
            ).otherwise(F.concat(F.lit('"len'), s(e % 7), F.lit('"'))),
            F.lit("}}"),
        ),
    ).otherwise(F.lit(""))

    aws = F.when(
        u % 4 != 3,
        F.concat(
            F.lit(',"aws":{"account_id":"a'), s(u % 6),
            F.lit('","operation":"Op'), s(e % 4),
            F.lit('","remote_region":"r'), s(u % 3),
            F.lit('","request_id":"q'), s(e % 8), F.lit('"'),
            F.when(
                u % 4 == 0,
                F.concat(F.lit(',"ec2":{"instance_id":"i'), s(u % 7),
                         F.lit('","availability_zone":"z'), s(u % 5),
                         F.lit('"}')),
            ).otherwise(F.lit("")),
            F.when(
                u % 4 == 1,
                F.concat(
                    F.lit(',"retries":'), s(e % 3),
                    F.lit(',"ecs":{"container":"c'), s(u % 6),
                    F.lit('","container_id":"cc'), s(u % 2), F.lit('"}'),
                    F.lit(',"elastic_beanstalk":{"environment_name":"env'),
                    s(u % 3), F.lit('","deployment_id":'), s(e % 50),
                    F.lit(',"version_label":"v'), s(e % 6), F.lit('"}'),
                ),
            ).otherwise(F.lit("")),
            F.when(
                u % 4 == 2,
                F.concat(
                    F.lit(',"eks":{"container_id":"ek'), s(u % 3),
                    F.lit('","cluster_name":"k'), s(u % 5),
                    F.lit('","pod":"pd'), s(u % 7), F.lit('"}'),
                    F.lit(',"cloudwatch_logs":[{"log_group":"g'), s(u % 4),
                    F.lit('","arn":"arn'), s(u % 5), F.lit('"}]'),
                ),
            ).otherwise(F.lit("")),
            F.when(
                u % 4 < 2,
                F.concat(
                    F.lit(',"xray":{"sdk":"'),
                    F.when(u % 2 == 0, F.lit("X-Ray for Go")).otherwise(
                        F.lit("X-Ray SDK")
                    ),
                    F.lit('","sdk_version":"1.'), s(u % 4), F.lit('"}'),
                ),
            ).otherwise(F.lit("")),
            F.lit("}"),
        ),
    ).otherwise(F.lit(""))

    sql = F.when(
        u % 9 == 0,
        F.concat(
            F.lit(',"sql":{"url":"db://h'), s(u % 3), F.lit("/d"), s(u % 5),
            F.lit('?x=1","database_type":"mysql","sanitized_query":"SELECT '),
            s(e % 3), F.lit('","user":"du'), s(u % 2), F.lit('"}'),
        ),
    ).otherwise(F.lit(""))

    annos = F.when(
        e % 2 == 0,
        F.concat(
            F.lit(',"annotations":{"an_s":"v'), s(e % 9),
            F.lit('","an_n":'), s(e % 7),
            F.lit(',"an_f":0.5,"an_b":'),
            F.when(u % 2 == 0, F.lit("true")).otherwise(F.lit("false")),
            F.lit("}"),
        ),
    ).otherwise(F.lit(""))

    meta = F.when(
        e % 3 == 0,
        F.concat(
            F.lit(',"metadata":{"md":{"z":'), s(e % 5),
            F.lit(',"a":"m'), s(u % 2), F.lit('"}}'),
        ),
    ).otherwise(F.lit(""))

    stack = F.when(
        e % 8 == 0,
        F.concat(F.lit(',"stack":[{"label":"fn","path":"p.go","line":'),
                 s(e % 90), F.lit("}]")),
    ).otherwise(F.lit(""))
    cause = (
        F.when(
            e % 4 == 0,
            F.concat(
                F.lit(',"cause":{"exceptions":[{"id":"ex'), s(e % 5),
                F.lit('","message":"bm'), s(e % 3),
                F.lit('","type":"T'), s(e % 2), F.lit('"'),
                F.when(u % 2 == 0, F.lit(',"remote":true')).otherwise(
                    F.lit("")
                ),
                stack, F.lit("}]}"),
            ),
        )
        .when(
            e % 4 == 1,
            F.concat(F.lit(',"cause":"cexc'), s(e % 6), F.lit('"')),
        )
        .otherwise(F.lit(""))
    )

    leaf = F.when(
        e % 8 == 0,
        F.concat(F.lit(',"trace_id":"1-'), hx(u + 9, 8), F.lit("-"),
                 hx(e + 2, 24), F.lit('"')),
    ).otherwise(F.lit(""))
    subsub = F.when(
        e % 4 == 0,
        F.concat(
            F.lit(',"subsegments":[{"name":"leaf","id":"'), hx(e + 35, 16),
            F.lit('","start_time":'), s(F.lit(1600000000) + e),
            F.lit(".875"), leaf, F.lit("}]"),
        ),
    ).otherwise(F.lit(""))
    subs = F.when(
        e % 2 == 0,
        F.concat(
            F.lit(',"subsegments":[{"name":"sub'), s(e % 3),
            F.lit('","id":"'), hx(e + 21, 16),
            F.lit('","start_time":'), s(F.lit(1600000000) + e),
            F.lit(".25"),
            F.when(e % 4 == 0, F.lit(',"namespace":"aws"'))
            .when(e % 4 == 2, F.lit(',"namespace":"remote"'))
            .otherwise(F.lit("")),
            subsub, F.lit("}]"),
        ),
    ).otherwise(F.lit(""))

    root_parent = F.when(
        e % 7 == 0,
        F.concat(F.lit(',"parent_id":"'), hx(e + 3, 16), F.lit('"')),
    ).otherwise(F.lit(""))

    body = F.concat(
        F.lit('{"name":"api-'), F.col("event_type"),
        F.lit('","id":"'), hx(e + 1, 16),
        F.lit('","start_time":'), s(F.lit(1600000000) + e), F.lit(".5"),
        F.when(
            e % 5 != 4,
            F.concat(F.lit(',"end_time":'), s(F.lit(1600000000) + e),
                     F.lit(".75")),
        ).otherwise(F.lit("")),
        F.lit(',"trace_id":"1-'), hx(u + 1, 8), F.lit("-"), hx(e + 1, 24),
        F.lit('"'), root_parent,
        F.when(
            u % 2 == 0,
            F.concat(F.lit(',"user":"usr'), s(u % 5), F.lit('"')),
        ).otherwise(F.lit("")),
        F.when(e % 11 == 0, F.lit(',"in_progress":true')).otherwise(F.lit("")),
        F.when(e % 13 == 0, F.lit(',"traced":true')).otherwise(F.lit("")),
        F.when(
            u % 5 == 0,
            F.concat(F.lit(',"resource_arn":"arn:'), s(u % 7), F.lit('"')),
        ).otherwise(F.lit("")),
        F.when(
            u % 6 == 0,
            F.concat(F.lit(',"service":{"version":"sv'), s(u % 4),
                     F.lit('"}')),
        ).otherwise(F.lit("")),
        http, aws, sql, annos, meta, cause, subs,
        F.lit("}"),
    )
    out = xray_segments_to_spans(
        ev.select("event_id", body.alias("body")), max_depth=2
    )
    return out.select(
        "event_id", "xr_depth", "xr_trace_id", "xr_span_id", "xr_parent_id",
        "xr_name", "xr_kind", "xr_start_ns", "xr_end_ns", "xr_status_code",
        "xr_status_msg", "xr_resource_attrs", "xr_attrs", "xr_events",
        "xr_ok",
    )


O_XRAY = """
WITH a AS (
  SELECT event_id, user_id, event_type, event_id AS e, user_id AS u,
         lpad(lower(to_hex(user_id + 1)), 8, '0')
           || lpad(lower(to_hex(event_id + 1)), 24, '0') AS tid,
         lpad(lower(to_hex(event_id + 1)), 16, '0') AS sid,
         lpad(lower(to_hex(event_id + 3)), 16, '0') AS rpid,
         lpad(lower(to_hex(event_id + 21)), 16, '0') AS sub_id,
         lpad(lower(to_hex(event_id + 35)), 16, '0') AS leaf_id,
         event_id % 3 = 0 AS has_http,
         event_id % 400 + 200 AS hst,
         event_id % 4 = 0 AS cause_obj,
         event_id % 4 = 1 AS cause_str,
         event_id % 7 = 0 AS has_rparent
  FROM events
), res AS (
  SELECT *,
         array_to_string(list_sort(list_filter([
           'service.name=api-' || event_type,
           'cloud.provider=' || CASE WHEN u % 4 <> 3 THEN 'aws'
                                     ELSE 'unknown' END,
           CASE WHEN u % 4 <> 3 THEN 'cloud.account.id=a' || (u % 6) END,
           CASE WHEN u % 4 = 0 THEN 'host.id=i' || (u % 7) END,
           CASE WHEN u % 4 = 0
                THEN 'cloud.availability_zone=z' || (u % 5) END,
           CASE WHEN u % 4 = 1 THEN 'container.name=c' || (u % 6) END,
           CASE WHEN u % 4 = 1 THEN 'container.id=cc' || (u % 2) END,
           CASE WHEN u % 4 = 1 THEN 'service.namespace=env' || (u % 3) END,
           CASE WHEN u % 4 = 1
                THEN 'service.instance.id=' || (e % 50) END,
           CASE WHEN u % 4 = 1 AND NOT u % 6 = 0
                THEN 'service.version=v' || (e % 6) END,
           CASE WHEN u % 6 = 0 THEN 'service.version=sv' || (u % 4) END,
           CASE WHEN u % 4 = 2 THEN 'container.id=ek' || (u % 3) END,
           CASE WHEN u % 4 = 2 THEN 'k8s.cluster.name=k' || (u % 5) END,
           CASE WHEN u % 4 = 2 THEN 'k8s.pod.name=pd' || (u % 7) END,
           CASE WHEN u % 4 = 2
                THEN 'aws.log.group.arns=["arn' || (u % 5) || '"]' END,
           CASE WHEN u % 4 = 2
                THEN 'aws.log.group.names=["g' || (u % 4) || '"]' END,
           CASE WHEN u % 4 < 2
                THEN 'telemetry.sdk.version=1.' || (u % 4) END,
           CASE WHEN u % 4 < 2 THEN 'telemetry.sdk.name='
                || CASE WHEN u % 2 = 0 THEN 'X-Ray for Go'
                        ELSE 'X-Ray SDK' END END,
           CASE WHEN u % 4 < 2 AND cause_obj
                THEN 'telemetry.sdk.language=java'
                WHEN u % 4 < 2 AND u % 2 = 0
                THEN 'telemetry.sdk.language=Go' END,
           CASE WHEN u % 5 = 0
                THEN 'aws.xray.resource_arn=arn:' || (u % 7) END
         ], x -> x IS NOT NULL)), ',') AS resattrs,
         CASE WHEN has_http AND NOT hst BETWEEN 100 AND 398 THEN 2
              WHEN cause_obj OR cause_str THEN 2 END AS st_code
  FROM a
)
SELECT event_id, 0 AS xr_depth, tid AS xr_trace_id, sid AS xr_span_id,
       CASE WHEN has_rparent THEN rpid END AS xr_parent_id,
       'api-' || event_type AS xr_name,
       CASE WHEN NOT has_rparent THEN 'server'
            WHEN e % 6 = 0 THEN 'server'
            ELSE 'internal' END AS xr_kind,
       CAST((1600000000 + e + 0.5) * 1e9 AS BIGINT) AS xr_start_ns,
       CASE WHEN e % 5 <> 4
            THEN CAST((1600000000 + e + 0.75) * 1e9 AS BIGINT) END
         AS xr_end_ns,
       st_code AS xr_status_code,
       CASE WHEN st_code IS NOT NULL THEN
         CASE WHEN cause_str THEN 'cexc' || (e % 6) ELSE '' END END
         AS xr_status_msg,
       resattrs AS xr_resource_attrs,
       coalesce(array_to_string(list_sort(list_filter([
         CASE WHEN e % 11 = 0 THEN 'aws.xray.inprogress=true' END,
         CASE WHEN e % 13 = 0 THEN 'aws.xray.traced=true' END,
         CASE WHEN u % 2 = 0 THEN 'enduser.id=usr' || (u % 5) END,
         CASE WHEN has_http THEN 'http.method=GET' END,
         CASE WHEN has_http THEN 'http.url=http://s/' || (e % 5) END,
         CASE WHEN has_http THEN 'http.user_agent=ua' || (u % 3) END,
         CASE WHEN e % 6 = 0 THEN 'http.client_ip=10.1.2.3' END,
         CASE WHEN e % 9 = 0 THEN 'aws.xray.x_forwarded_for=true' END,
         CASE WHEN has_http THEN 'http.status_code=' || hst END,
         CASE WHEN has_http THEN 'http.response_content_length='
              || CASE WHEN e % 2 = 0 THEN CAST(e % 1000 AS VARCHAR)
                      ELSE 'len' || (e % 7) END END,
         CASE WHEN u % 4 <> 3 THEN 'aws.account_id=a' || (u % 6) END,
         CASE WHEN u % 4 <> 3 THEN 'aws.operation=Op' || (e % 4) END,
         CASE WHEN u % 4 <> 3 THEN 'aws.region=r' || (u % 3) END,
         CASE WHEN u % 4 <> 3 THEN 'aws.request_id=q' || (e % 8) END,
         CASE WHEN u % 4 = 1 THEN 'aws.xray.retries=' || (e % 3) END,
         CASE WHEN u % 9 = 0
              THEN 'db.connection_string=db://h' || (u % 3) END,
         CASE WHEN u % 9 = 0 THEN 'db.name=d' || (u % 5) END,
         CASE WHEN u % 9 = 0 THEN 'db.system=mysql' END,
         CASE WHEN u % 9 = 0 THEN 'db.statement=SELECT ' || (e % 3) END,
         CASE WHEN u % 9 = 0 THEN 'db.user=du' || (u % 2) END,
         CASE WHEN e % 2 = 0 THEN 'an_s=v' || (e % 9) END,
         CASE WHEN e % 2 = 0 THEN 'an_n=' || (e % 7) END,
         CASE WHEN e % 2 = 0 THEN 'an_f=0.5' END,
         CASE WHEN e % 2 = 0 THEN 'an_b='
              || CASE WHEN u % 2 = 0 THEN 'true' ELSE 'false' END END,
         CASE WHEN e % 2 = 0
              THEN 'aws.xray.annotations=["an_b","an_f","an_n","an_s"]' END,
         CASE WHEN e % 3 = 0 THEN 'aws.xray.metadata.md={"a":"m'
              || (u % 2) || '","z":' || (e % 5) || '}' END
       ], x -> x IS NOT NULL)), ','), '') AS xr_attrs,
       CASE WHEN cause_obj THEN 'exception|' || array_to_string(list_sort(
         list_filter([
           'aws.xray.exception.id=ex' || (e % 5),
           'exception.message=bm' || (e % 3),
           'exception.type=T' || (e % 2),
           CASE WHEN u % 2 = 0 THEN 'aws.xray.exception.remote=true' END,
           CASE WHEN e % 8 = 0 THEN 'exception.stacktrace=T' || (e % 2)
                || ': bm' || (e % 3) || chr(10) || chr(9) || 'at fn(p.go: '
                || (e % 90) || ')' || chr(10) END
         ], x -> x IS NOT NULL)), ',')
         ELSE '' END AS xr_events,
       TRUE AS xr_ok
FROM res
UNION ALL
SELECT event_id, 1, tid, sub_id, sid,
       'sub' || (e % 3),
       CASE WHEN e % 4 = 0 OR e % 4 = 2 THEN 'client'
            ELSE 'internal' END,
       CAST((1600000000 + e + 0.25) * 1e9 AS BIGINT), NULL,
       NULL, NULL, resattrs,
       CASE WHEN e % 4 = 0 THEN 'aws.service=sub' || (e % 3) ELSE '' END,
       '', TRUE
FROM res WHERE e % 2 = 0
UNION ALL
SELECT event_id, 2,
       CASE WHEN e % 8 = 0
            THEN lpad(lower(to_hex(u + 9)), 8, '0')
              || lpad(lower(to_hex(e + 2)), 24, '0')
            ELSE tid END,
       leaf_id, sub_id, 'leaf', 'internal',
       CAST((1600000000 + e + 0.875) * 1e9 AS BIGINT), NULL,
       NULL, NULL, resattrs, '', '', TRUE
FROM res WHERE e % 4 = 0
"""


EXT13_QUERIES["xray_spans"] = q_xray
EXT13_ORACLES["xray_spans"] = O_XRAY

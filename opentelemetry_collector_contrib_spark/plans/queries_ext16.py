"""Round-5 queries (cont.): Windows Event Log XML translation.

The fixture builds one rendered-XML event per events row, exercising
every ``formattedBody`` branch arithmetically so the DuckDB oracle can
replay it: qualifiers present/absent, rendered-vs-raw
level/task/opcode/keywords folds, the full parseSeverity ladder
(rendered Critical/Error/Warning/Information/other × raw "0"-"5"),
nanosecond / sub-micro / whole-second SystemTime plus an invalid-time
row (deterministic null instead of the reference's ``time.Now()``),
Security-channel messages through the tab-indented security.go grammar
(subject + nested details JSON), ordered EventData maps, optional
Security/Execution info, and a malformed-XML dead-letter row.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import QueryFn, load

EXT16_QUERIES: dict[str, QueryFn] = {}
EXT16_ORACLES: dict[str, str] = {}


# ---------------------------------------------------------------------------
# windows event log XML -> flattened log rows
# ---------------------------------------------------------------------------


def q_windows_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.windows_events import windows_event_parse

    ev = load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    s = lambda c: c.cast("string")  # noqa: E731

    chan = F.element_at(
        F.array(F.lit("Security"), F.lit("Application"), F.lit("System")),
        (u % 3 + 1).cast("int"),
    )
    frac = F.element_at(
        F.array(F.lit(""), F.lit(".37786"), F.lit(".3778625")),
        (e % 3 + 1).cast("int"),
    )
    sys_time = F.when(e % 19 == 0, F.lit("nota time")).otherwise(
        F.concat(F.lit("2022-04-22T10:20:"),
                 F.lpad(s(e % 60), 2, "0"), frac, F.lit("Z"))
    )
    rl = F.element_at(
        F.array(F.lit("Information"), F.lit("Error"), F.lit("Warning"),
                F.lit("Critical"), F.lit("Unknown")),
        (e % 5 + 1).cast("int"),
    )
    sec_msg = F.concat(
        F.lit("An account was successfully logged on.\n\nSubject:\n"
              "\tSecurity ID:\t\tS-1-5-"), s(u % 10),
        F.lit("\n\tAccount Name:\t\tacct"), s(e % 7),
        F.lit("\n\tLogon ID:\t\t0x"), s(e % 13),
        F.lit("\n\nLogon Information:\n\tLogon Type:\t"), s(e % 5),
        F.lit("\n\tRestricted Admin Mode:\t-\n\tVirtual Account:\t\tNo"
              "\n\nProcess Information:\n\tProcess ID:\t\t0x"), s(e % 11),
        F.lit("\n\tProcess Name:\t\tC:/Windows/proc"), s(u % 8),
        F.lit(".exe\n\nThis event is generated when a logon session"
              " is created."),
    )
    rmsg = F.when(chan == "Security", sec_msg).otherwise(
        F.concat(F.lit("msg"), s(e % 9))
    )
    rendering = F.when(e % 4 == 0, F.concat(
        F.lit('<RenderingInfo Culture="en-US"><Message>'), rmsg,
        F.lit("</Message><Level>"), rl, F.lit("</Level>"),
        F.when(e % 8 == 0,
               F.concat(F.lit("<Task>RT"), s(e % 3), F.lit("</Task>"))
               ).otherwise(F.lit("")),
        F.when(e % 16 == 0, F.lit("<Opcode>RO</Opcode>")
               ).otherwise(F.lit("")),
        F.lit("<Keywords><Keyword>KA"), s(e % 3),
        F.lit("</Keyword><Keyword>KB</Keyword></Keywords></RenderingInfo>"),
    )).otherwise(F.lit(""))
    security_el = F.when(
        (chan == "Security") & (u % 5 > 0),
        F.concat(F.lit('<Security UserID="S-1-5-'), s(u % 10), F.lit('"/>')),
    ).otherwise(F.lit("<Security/>"))
    execution_el = F.when(e % 2 == 1, F.concat(
        F.lit('<Execution ProcessID="'), s(e % 9000),
        F.lit('" ThreadID="'), s(e % 500), F.lit('"'),
        F.when(e % 8 == 1,
               F.concat(F.lit(' SessionID="'), s(u % 4), F.lit('"'))
               ).otherwise(F.lit("")),
        F.lit("/>"),
    )).otherwise(F.lit(""))
    event_data_el = F.when(e % 6 != 0, F.concat(
        F.lit("<EventData"),
        F.when(u % 7 == 0, F.lit(' Name="EDN"')).otherwise(F.lit("")),
        F.lit('><Data Name="k1">v'), s(e % 8),
        F.lit('</Data><Data Name="k2">w'), s(u % 5), F.lit("</Data>"),
        F.when(u % 5 == 0,
               F.concat(F.lit("<Binary>AB"), s(e % 4), F.lit("</Binary>"))
               ).otherwise(F.lit("")),
        F.lit("</EventData>"),
    )).otherwise(F.lit(""))

    body = F.when(e % 23 == 0, F.lit("garbage<")).otherwise(F.concat(
        F.lit("<Event><System><Provider Name=\"Prov"), s(u % 4),
        F.lit('" Guid="{G'), s(u % 7), F.lit('}"'),
        F.when(u % 2 == 0,
               F.concat(F.lit(' EventSourceName="Src'), s(u % 3), F.lit('"'))
               ).otherwise(F.lit("")),
        F.lit("/><EventID"),
        F.when(u % 2 == 0,
               F.concat(F.lit(' Qualifiers="'), s(e % 100 + 1), F.lit('"'))
               ).otherwise(F.lit("")),
        F.lit(">"), s(e % 50 + 4600), F.lit("</EventID>"),
        F.lit("<Level>"), s(e % 6), F.lit("</Level>"),
        F.lit("<Task>T"), s(e % 7), F.lit("</Task>"),
        F.lit("<Opcode>O"), s(e % 5), F.lit("</Opcode>"),
        F.lit("<Keywords>0xK"), s(u % 9), F.lit("</Keywords>"),
        F.lit('<TimeCreated SystemTime="'), sys_time, F.lit('"/>'),
        F.lit("<EventRecordID>"), s(e), F.lit("</EventRecordID>"),
        execution_el,
        F.lit("<Channel>"), chan, F.lit("</Channel>"),
        F.lit("<Computer>comp"), s(u % 6), F.lit("</Computer>"),
        security_el,
        F.lit("</System>"), rendering, event_data_el, F.lit("</Event>"),
    ))

    out = windows_event_parse(ev.select("event_id", body.alias("body")))
    return out.select(
        "event_id", "we_event_id", "we_qualifiers", "we_provider_name",
        "we_provider_guid", "we_event_source", "we_computer", "we_channel",
        "we_record_id", "we_system_time", "we_ts_ns", "we_ts_valid",
        "we_severity", "we_level", "we_task", "we_opcode", "we_keywords",
        "we_message", "we_details", "we_security_user_id", "we_exec_pid",
        "we_exec_tid", "we_exec_session", "we_event_data_name",
        "we_event_data_binary", "we_event_data", "we_ok",
    )


O_WINDOWS_EVENTS = """
WITH a AS (
  SELECT event_id,
         user_id AS u, event_id AS e,
         event_id % 23 = 0 AS garbage,
         event_id % 4 = 0 AS rendered,
         CASE CAST(user_id % 3 AS INT) WHEN 0 THEN 'Security'
              WHEN 1 THEN 'Application' ELSE 'System' END AS chan,
         CASE CAST(event_id % 5 AS INT) WHEN 0 THEN 'Information'
              WHEN 1 THEN 'Error' WHEN 2 THEN 'Warning'
              WHEN 3 THEN 'Critical' ELSE 'Unknown' END AS rl
  FROM events
)
SELECT event_id,
  CASE WHEN garbage THEN 0 ELSE e % 50 + 4600 END AS we_event_id,
  CAST(CASE WHEN garbage OR u % 2 <> 0 THEN 0
            ELSE e % 100 + 1 END AS INT) AS we_qualifiers,
  CASE WHEN garbage THEN ''
       ELSE 'Prov' || CAST(u % 4 AS VARCHAR) END AS we_provider_name,
  CASE WHEN garbage THEN ''
       ELSE '{G' || CAST(u % 7 AS VARCHAR) || '}' END AS we_provider_guid,
  CASE WHEN garbage OR u % 2 <> 0 THEN ''
       ELSE 'Src' || CAST(u % 3 AS VARCHAR) END AS we_event_source,
  CASE WHEN garbage THEN ''
       ELSE 'comp' || CAST(u % 6 AS VARCHAR) END AS we_computer,
  CASE WHEN garbage THEN '' ELSE chan END AS we_channel,
  CASE WHEN garbage THEN 0 ELSE e END AS we_record_id,
  CASE WHEN garbage THEN ''
       WHEN e % 19 = 0 THEN 'nota time'
       ELSE '2022-04-22T10:20:' || lpad(CAST(e % 60 AS VARCHAR), 2, '0')
            || CASE CAST(e % 3 AS INT) WHEN 0 THEN ''
                    WHEN 1 THEN '.37786' ELSE '.3778625' END || 'Z'
  END AS we_system_time,
  CASE WHEN garbage OR e % 19 = 0 THEN NULL
       ELSE (1650622800 + e % 60) * 1000000000
            + CASE CAST(e % 3 AS INT) WHEN 0 THEN 0
                   WHEN 1 THEN 377860000 ELSE 377862500 END
  END AS we_ts_ns,
  NOT (garbage OR e % 19 = 0) AS we_ts_valid,
  CASE WHEN garbage THEN 'DEFAULT'
       WHEN rendered THEN
         CASE rl WHEN 'Information' THEN 'INFO' WHEN 'Error' THEN 'ERROR'
              WHEN 'Warning' THEN 'WARN' WHEN 'Critical' THEN 'FATAL'
              ELSE 'DEFAULT' END
       ELSE CASE CAST(e % 6 AS INT) WHEN 1 THEN 'FATAL' WHEN 2 THEN 'ERROR'
                 WHEN 3 THEN 'WARN' WHEN 4 THEN 'INFO' ELSE 'DEFAULT' END
  END AS we_severity,
  CASE WHEN garbage THEN '' WHEN rendered THEN rl
       ELSE CAST(e % 6 AS VARCHAR) END AS we_level,
  CASE WHEN garbage THEN ''
       WHEN rendered AND e % 8 = 0 THEN 'RT' || CAST(e % 3 AS VARCHAR)
       ELSE 'T' || CAST(e % 7 AS VARCHAR) END AS we_task,
  CASE WHEN garbage THEN ''
       WHEN rendered AND e % 16 = 0 THEN 'RO'
       ELSE 'O' || CAST(e % 5 AS VARCHAR) END AS we_opcode,
  CASE WHEN garbage THEN ''
       WHEN rendered THEN 'KA' || CAST(e % 3 AS VARCHAR) || ',KB'
       ELSE '0xK' || CAST(u % 9 AS VARCHAR) END AS we_keywords,
  CASE WHEN garbage THEN ''
       WHEN chan = 'Security' THEN
         CASE WHEN rendered
              THEN 'An account was successfully logged on.' ELSE '' END
       WHEN rendered THEN 'msg' || CAST(e % 9 AS VARCHAR)
       ELSE '' END AS we_message,
  CASE WHEN NOT garbage AND chan = 'Security' AND rendered THEN
    '{"Additional Context":["This event is generated when a logon'
    || ' session is created."],"Logon Information":{"Logon Type":"'
    || CAST(e % 5 AS VARCHAR)
    || '","Restricted Admin Mode":"-","Virtual Account":"No"},'
    || '"Process Information":{"Process ID":"0x'
    || CAST(e % 11 AS VARCHAR) || '","Process Name":"C:/Windows/proc'
    || CAST(u % 8 AS VARCHAR) || '.exe"},"Subject":{"Account Name":"acct'
    || CAST(e % 7 AS VARCHAR) || '","Logon ID":"0x'
    || CAST(e % 13 AS VARCHAR) || '","Security ID":"S-1-5-'
    || CAST(u % 10 AS VARCHAR) || '"}}'
  END AS we_details,
  CASE WHEN NOT garbage AND chan = 'Security' AND u % 5 > 0
       THEN 'S-1-5-' || CAST(u % 10 AS VARCHAR) END AS we_security_user_id,
  CASE WHEN NOT garbage AND e % 2 = 1 THEN e % 9000 END AS we_exec_pid,
  CASE WHEN NOT garbage AND e % 2 = 1 THEN e % 500 END AS we_exec_tid,
  CASE WHEN NOT garbage AND e % 8 = 1 THEN u % 4 END AS we_exec_session,
  CASE WHEN NOT garbage AND e % 6 <> 0 AND u % 7 = 0
       THEN 'EDN' ELSE '' END AS we_event_data_name,
  CASE WHEN NOT garbage AND e % 6 <> 0 AND u % 5 = 0
       THEN 'AB' || CAST(e % 4 AS VARCHAR) ELSE '' END
    AS we_event_data_binary,
  CASE WHEN NOT garbage AND e % 6 <> 0
       THEN '[{"k1":"v' || CAST(e % 8 AS VARCHAR)
            || '"},{"k2":"w' || CAST(u % 5 AS VARCHAR) || '"}]'
  END AS we_event_data,
  NOT garbage AS we_ok
FROM a
"""


EXT16_QUERIES["windows_events"] = q_windows_events
EXT16_ORACLES["windows_events"] = O_WINDOWS_EVENTS


# ---------------------------------------------------------------------------
# expvar memstats -> long-format metric rows
# ---------------------------------------------------------------------------


def q_expvar(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.receivers import expvar_memstats

    ev = load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    s = lambda c: c.cast("string")  # noqa: E731

    memstats = F.concat(
        F.lit('{"TotalAlloc":'), s(e % 2000),
        F.lit(',"Sys":'), s(e % 1000 + 1),
        F.lit(',"Lookups":'), s(u % 50),
        F.lit(',"Mallocs":'), s(e % 900),
        F.lit(',"Frees":'), s(e % 800),
        F.lit(',"HeapAlloc":'), s(u % 700),
        F.lit(',"HeapSys":'), s(u % 600),
        F.lit(',"HeapIdle":'), s(e % 500),
        F.lit(',"HeapInuse":'), s(e % 400),
        F.when(u % 4 != 0,
               F.concat(F.lit(',"HeapReleased":'), s(e % 300))
               ).otherwise(F.lit("")),
        F.lit(',"HeapObjects":'), s(e % 200),
        F.lit(',"StackInuse":'), s(u % 190),
        F.lit(',"StackSys":'), s(u % 180),
        F.lit(',"MSpanInuse":'), s(e % 170),
        F.lit(',"MSpanSys":'), s(e % 160),
        F.lit(',"MCacheInuse":'), s(u % 150),
        F.lit(',"MCacheSys":'), s(u % 140),
        F.lit(',"BuckHashSys":'), s(e % 130),
        F.lit(',"GCSys":'), s(e % 120),
        F.lit(',"OtherSys":'), s(u % 110),
        F.lit(',"NextGC":'), s(e % 100000),
        F.lit(',"PauseTotalNs":'), s(e * 3 % 100000),
        F.lit(',"PauseNs":['), s(e % 100), F.lit(","), s(e % 50 + 1),
        F.lit(","), s(e % 7 + 2), F.lit("]"),
        F.lit(',"NumGC":'), s(e % 5),
        F.lit(',"NumForcedGC":'), s(u % 3),
        F.lit(',"GCCPUFraction":'), s((e % 7) / 16.0),
        F.lit("}"),
    )
    body = (
        F.when(e % 13 == 0, F.lit("notjson{{"))
        .when(e % 17 == 0, F.lit('{"cmdline":["/app"]}'))
        .otherwise(F.concat(
            F.lit('{"cmdline":["/app"],"memstats":'), memstats, F.lit("}"),
        ))
    )
    out = expvar_memstats(ev.select("event_id", body.alias("body")))
    return out.select(
        "event_id", "ev_ok", "ev_metric", "ev_kind", "ev_mono",
        "ev_value", "ev_value_d",
    )


O_EXPVAR = """
WITH a AS (
  SELECT event_id, user_id AS u, event_id AS e,
         event_id % 13 = 0 OR event_id % 17 = 0 AS bad
  FROM events
), m(suffix, kind, mono) AS (
  VALUES ('sys','sum',FALSE), ('mallocs','sum',TRUE),
         ('frees','sum',TRUE), ('heap_alloc','sum',FALSE),
         ('heap_sys','sum',FALSE), ('heap_idle','sum',FALSE),
         ('heap_inuse','sum',FALSE), ('heap_released','sum',FALSE),
         ('heap_objects','sum',FALSE), ('stack_inuse','sum',FALSE),
         ('stack_sys','sum',FALSE), ('mspan_inuse','sum',FALSE),
         ('mspan_sys','sum',FALSE), ('mcache_inuse','sum',FALSE),
         ('mcache_sys','sum',FALSE), ('buck_hash_sys','sum',FALSE),
         ('gc_sys','sum',FALSE), ('other_sys','sum',FALSE),
         ('next_gc','sum',FALSE), ('pause_total','sum',TRUE),
         ('last_pause','gauge',FALSE), ('num_gc','sum',TRUE),
         ('num_forced_gc','sum',TRUE), ('gc_cpu_fraction','gauge',FALSE)
)
SELECT a.event_id, TRUE AS ev_ok,
       'process.runtime.memstats.' || m.suffix AS ev_metric,
       m.kind AS ev_kind, m.mono AS ev_mono,
       CASE m.suffix
         WHEN 'sys' THEN e % 1000 + 1
         WHEN 'mallocs' THEN e % 900
         WHEN 'frees' THEN e % 800
         WHEN 'heap_alloc' THEN u % 700
         WHEN 'heap_sys' THEN u % 600
         WHEN 'heap_idle' THEN e % 500
         WHEN 'heap_inuse' THEN e % 400
         WHEN 'heap_released' THEN CASE WHEN u % 4 = 0 THEN 0
                                        ELSE e % 300 END
         WHEN 'heap_objects' THEN e % 200
         WHEN 'stack_inuse' THEN u % 190
         WHEN 'stack_sys' THEN u % 180
         WHEN 'mspan_inuse' THEN e % 170
         WHEN 'mspan_sys' THEN e % 160
         WHEN 'mcache_inuse' THEN u % 150
         WHEN 'mcache_sys' THEN u % 140
         WHEN 'buck_hash_sys' THEN e % 130
         WHEN 'gc_sys' THEN e % 120
         WHEN 'other_sys' THEN u % 110
         WHEN 'next_gc' THEN e % 100000
         WHEN 'pause_total' THEN e * 3 % 100000
         WHEN 'last_pause' THEN
           CASE CAST(e % 5 AS INT) WHEN 1 THEN e % 100
                WHEN 2 THEN e % 50 + 1 WHEN 3 THEN e % 7 + 2 ELSE 0 END
         WHEN 'num_gc' THEN e % 5
         WHEN 'num_forced_gc' THEN u % 3
       END AS ev_value,
       CASE WHEN m.suffix = 'gc_cpu_fraction'
            THEN CAST(e % 7 AS DOUBLE) / 16.0 END AS ev_value_d
FROM a CROSS JOIN m
WHERE NOT bad
UNION ALL
SELECT event_id, FALSE, NULL, NULL, NULL, NULL, NULL
FROM a WHERE bad
"""


EXT16_QUERIES["expvar_memstats"] = q_expvar
EXT16_ORACLES["expvar_memstats"] = O_EXPVAR


# ---------------------------------------------------------------------------
# haproxy show-stat CSV -> long-format metric rows
# ---------------------------------------------------------------------------

_HA_BASE_HDR = (
    "pxname,svname,qcur,scur,conn_rate,lbtot,bin,bout,dreq,dresp,econ,"
    "ereq,eresp,srv_abrt,wredis,hrsp_1xx,hrsp_2xx,hrsp_3xx,hrsp_4xx,"
    "hrsp_5xx,hrsp_other,wretr,req_rate,ttime,rate,cli_abrt"
)


def q_haproxy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.receivers import haproxy_stats

    ev = load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    s = lambda c: c.cast("string")  # noqa: E731
    px = F.concat(F.lit("px"), s(u % 5))

    fe = F.concat_ws(
        ",", px, F.lit("FRONTEND"), F.lit(""), s(e % 100), s(e % 50),
        F.lit(""), s(e % 10000), s(u % 10000), s(e % 30), s(u % 30),
        s(e % 20), s(u % 20), F.lit(""), F.lit(""), s(e % 12), s(e % 5),
        s(e % 1000), s(e % 70), s(e % 80), s(e % 90), s(e % 3),
        F.when(e % 11 == 0, F.lit("x")).otherwise(s(e % 40)),
        s(e % 60), F.lit(""), s(e % 55), s(e % 8),
    )
    be = F.concat_ws(
        ",", px, F.lit("BACKEND"), s(u % 25), s((e + 1) % 100), F.lit(""),
        s(e % 200), s(e % 10000 + 1), s(u % 10000 + 1), s((e + 1) % 30),
        s((u + 1) % 30), s((e + 1) % 20), s((u + 1) % 20), s(e % 15),
        s(u % 15), s((e + 1) % 12), s((e + 1) % 5), s((e + 1) % 1000),
        s((e + 1) % 70), s((e + 1) % 80), s((e + 1) % 90), s((e + 1) % 3),
        s((e + 2) % 40), F.lit(""), s(u % 500), s((e + 1) % 55), F.lit(""),
    )
    # half the pages carry two leading extra columns so the oracle can
    # only be matched by honouring the header-driven index lookup
    hdr = F.when(u % 2 == 1,
                 F.lit("# extra1,extra2," + _HA_BASE_HDR)
                 ).otherwise(F.lit("# " + _HA_BASE_HDR))
    pre = F.when(u % 2 == 1, F.lit("x,y,")).otherwise(F.lit(""))
    body = F.when(e % 31 == 0, F.concat(hdr, F.lit("\noops,1,2\n"))
                  ).otherwise(F.concat(
        hdr, F.lit("\n"), pre, fe, F.lit("\n"), pre, be, F.lit("\n"),
    ))
    out = haproxy_stats(
        ev.select("event_id", body.alias("body")),
        endpoint="/run/haproxy.sock",
    )
    return out.select(
        "event_id", "ha_pxname", "ha_svname", "ha_addr", "ha_metric",
        "ha_kind", "ha_mono", "ha_status", "ha_value", "ha_value_d",
        "ha_ok",
    )


def _ha_oracle() -> str:
    fe_rows = [
        ("haproxy.sessions.count", "gauge", "FALSE", "e % 100", None),
        ("haproxy.connections.rate", "gauge", "FALSE", "e % 50", None),
        ("haproxy.bytes.input", "sum", "TRUE", "e % 10000", None),
        ("haproxy.bytes.output", "sum", "TRUE", "u % 10000", None),
        ("haproxy.requests.denied", "sum", "TRUE", "e % 30", None),
        ("haproxy.responses.denied", "sum", "TRUE", "u % 30", None),
        ("haproxy.connections.errors", "sum", "TRUE", "e % 20", None),
        ("haproxy.requests.errors", "sum", "TRUE", "u % 20", None),
        ("haproxy.requests.redispatched", "sum", "TRUE", "e % 12", None),
        ("haproxy.requests.total", "sum", "TRUE", "e % 5", "1xx"),
        ("haproxy.requests.total", "sum", "TRUE", "e % 1000", "2xx"),
        ("haproxy.requests.total", "sum", "TRUE", "e % 70", "3xx"),
        ("haproxy.requests.total", "sum", "TRUE", "e % 80", "4xx"),
        ("haproxy.requests.total", "sum", "TRUE", "e % 90", "5xx"),
        ("haproxy.requests.total", "sum", "TRUE", "e % 3", "other"),
    ]
    be_rows = [
        ("haproxy.sessions.count", "gauge", "FALSE", "(e+1) % 100", None),
        ("haproxy.server_selected.total", "sum", "TRUE", "e % 200", None),
        ("haproxy.bytes.input", "sum", "TRUE", "e % 10000 + 1", None),
        ("haproxy.bytes.output", "sum", "TRUE", "u % 10000 + 1", None),
        ("haproxy.requests.denied", "sum", "TRUE", "(e+1) % 30", None),
        ("haproxy.responses.denied", "sum", "TRUE", "(u+1) % 30", None),
        ("haproxy.connections.errors", "sum", "TRUE", "(e+1) % 20", None),
        ("haproxy.requests.errors", "sum", "TRUE", "(u+1) % 20", None),
        ("haproxy.responses.errors", "sum", "TRUE", "e % 15 + u % 15",
         None),
        ("haproxy.requests.redispatched", "sum", "TRUE", "(e+1) % 12",
         None),
        ("haproxy.requests.total", "sum", "TRUE", "(e+1) % 5", "1xx"),
        ("haproxy.requests.total", "sum", "TRUE", "(e+1) % 1000", "2xx"),
        ("haproxy.requests.total", "sum", "TRUE", "(e+1) % 70", "3xx"),
        ("haproxy.requests.total", "sum", "TRUE", "(e+1) % 80", "4xx"),
        ("haproxy.requests.total", "sum", "TRUE", "(e+1) % 90", "5xx"),
        ("haproxy.requests.total", "sum", "TRUE", "(e+1) % 3", "other"),
        ("haproxy.connections.retries", "sum", "TRUE", "(e+2) % 40", None),
        ("haproxy.requests.queued", "sum", "TRUE", "u % 25", None),
    ]

    def sel(sv, metric, kind, mono, status, vi, vd, ok, first=False):
        st = "NULL" if status is None else f"'{status}'"
        cols = (
            f"SELECT event_id, 'px' || CAST(u % 5 AS VARCHAR)"
            f"{' AS ha_pxname' if first else ''}, '{sv}'"
            f"{' AS ha_svname' if first else ''}, '/run/haproxy.sock'"
            f"{' AS ha_addr' if first else ''}, '{metric}'"
            f"{' AS ha_metric' if first else ''}, '{kind}'"
            f"{' AS ha_kind' if first else ''}, {mono}"
            f"{' AS ha_mono' if first else ''}, {st}"
            f"{' AS ha_status' if first else ''}, {vi}"
            f"{' AS ha_value' if first else ''}, {vd}"
            f"{' AS ha_value_d' if first else ''}, {ok}"
            f"{' AS ha_ok' if first else ''} FROM a WHERE NOT bad"
        )
        return cols

    parts = []
    first = True
    for metric, kind, mono, vi, status in fe_rows:
        parts.append(sel("FRONTEND", metric, kind, mono, status,
                         vi, "CAST(NULL AS DOUBLE)", "TRUE", first))
        first = False
    # frontend wretr: 'x' on e%11=0 -> null value, false ok
    parts.append(sel(
        "FRONTEND", "haproxy.connections.retries", "sum", "TRUE", None,
        "CASE WHEN e % 11 = 0 THEN NULL ELSE e % 40 END",
        "CAST(NULL AS DOUBLE)", "e % 11 <> 0",
    ))
    for metric, vi in (("haproxy.requests.rate", "e % 60"),
                       ("haproxy.sessions.rate", "e % 55")):
        parts.append(sel("FRONTEND", metric, "gauge", "FALSE", None,
                         "CAST(NULL AS BIGINT)",
                         f"CAST({vi} AS DOUBLE)", "TRUE"))
    for metric, kind, mono, vi, status in be_rows:
        parts.append(sel("BACKEND", metric, kind, mono, status,
                         vi, "CAST(NULL AS DOUBLE)", "TRUE"))
    for metric, vi in (("haproxy.sessions.average", "u % 500"),
                       ("haproxy.sessions.rate", "(e+1) % 55")):
        parts.append(sel("BACKEND", metric, "gauge", "FALSE", None,
                         "CAST(NULL AS BIGINT)",
                         f"CAST({vi} AS DOUBLE)", "TRUE"))
    parts.append(
        "SELECT event_id, '', '', '/run/haproxy.sock', NULL, NULL, "
        "CAST(NULL AS BOOLEAN), NULL, CAST(NULL AS BIGINT), "
        "CAST(NULL AS DOUBLE), FALSE FROM a WHERE bad"
    )
    return (
        "WITH a AS (SELECT event_id, user_id AS u, event_id AS e, "
        "event_id % 31 = 0 AS bad FROM events)\n"
        + "\nUNION ALL\n".join(parts)
    )


EXT16_QUERIES["haproxy_stats"] = q_haproxy
EXT16_ORACLES["haproxy_stats"] = _ha_oracle()


# ---------------------------------------------------------------------------
# apache mod_status ?auto page -> long-format metric rows
# ---------------------------------------------------------------------------


def q_apache(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.receivers import apache_status

    ev = load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    s = lambda c: c.cast("string")  # noqa: E731
    rep = lambda ch, n: F.repeat(F.lit(ch), n.cast("int"))  # noqa: E731

    scoreboard = F.concat(
        rep("_", u % 3), rep("S", e % 2), rep("R", u % 2), rep("W", e % 3),
        rep("K", u % 4), rep("D", e % 3), rep("C", e % 2), rep("L", u % 5),
        rep("G", e % 4), rep("I", u % 2), rep(".", e % 6),
        F.when(e % 7 == 0, F.lit("ZZ")).otherwise(F.lit("")),
    )
    body = F.concat(
        F.lit("localhost\nServerVersion: Apache/2.4.56 (Unix)\n"
              "ServerUptimeSeconds: "), s(e % 100000),
        F.lit("\nTotal Accesses: "),
        F.when(e % 13 == 0, F.lit("x")).otherwise(s(e % 1000000)),
        F.lit("\nTotal kBytes: "),
        F.when(e % 17 == 0, F.lit("y")).otherwise(s(e % 5000)),
        F.lit("\nTotal Duration: "), s(e % 90000),
        F.lit("\nCPUUser: "), s((u % 100) / 8.0),
        F.lit("\nCPUSystem: "), s((e % 50) / 2.0),
        F.lit("\nCPUChildrenUser: "), s((u % 60) / 16.0),
        F.lit("\nCPUChildrenSystem: "), s((e % 100) / 4.0),
        F.lit("\nCPULoad: "), s((e % 200) / 10.0),
        F.lit("\nLoad1: "), s((e % 80) / 16.0),
        F.when(u % 3 != 0,
               F.concat(F.lit("\nLoad5: "), s((u % 40) / 8.0))
               ).otherwise(F.lit("")),
        F.lit("\nLoad15: "), s((e % 30) / 4.0),
        F.lit("\nBusyWorkers: "), s(u % 64),
        F.lit("\nIdleWorkers: "), s(e % 240),
        F.lit("\nConnsTotal: "), s(e % 500),
        F.lit("\nScoreboard: "), scoreboard,
        F.lit("\nno separator line\n"),
    )
    out = apache_status(
        ev.select("event_id", body.alias("body")),
        server_name="web1", port="8080",
    )
    return out.select(
        "event_id", "ap_server_name", "ap_server_port", "ap_metric",
        "ap_kind", "ap_mono", "ap_state", "ap_level", "ap_mode",
        "ap_value", "ap_value_d", "ap_ok",
    )


def _apache_oracle() -> str:
    NS = "CAST(NULL AS VARCHAR)"
    NI = "CAST(NULL AS BIGINT)"
    ND = "CAST(NULL AS DOUBLE)"
    rows = [
        # metric, kind, mono, state, level, mode, where, vi, vd, ok
        ("apache.uptime", "sum", "TRUE", NS, NS, NS, None,
         "e % 100000", ND, "TRUE"),
        ("apache.current_connections", "sum", "FALSE", NS, NS, NS, None,
         "e % 500", ND, "TRUE"),
        ("apache.workers", "sum", "FALSE", "'busy'", NS, NS, None,
         "u % 64", ND, "TRUE"),
        ("apache.workers", "sum", "FALSE", "'idle'", NS, NS, None,
         "e % 240", ND, "TRUE"),
        ("apache.requests", "sum", "TRUE", NS, NS, NS, None,
         "CASE WHEN e % 13 = 0 THEN NULL ELSE e % 1000000 END", ND,
         "e % 13 <> 0"),
        ("apache.traffic", "sum", "TRUE", NS, NS, NS, None,
         "CASE WHEN e % 17 = 0 THEN NULL ELSE (e % 5000) * 1024 END", ND,
         "e % 17 <> 0"),
        ("apache.cpu.time", "sum", "TRUE", NS, "'children'", "'system'",
         None, NI, "CAST(e % 100 AS DOUBLE) / 4.0", "TRUE"),
        ("apache.cpu.time", "sum", "TRUE", NS, "'children'", "'user'",
         None, NI, "CAST(u % 60 AS DOUBLE) / 16.0", "TRUE"),
        ("apache.cpu.time", "sum", "TRUE", NS, "'self'", "'system'",
         None, NI, "CAST(e % 50 AS DOUBLE) / 2.0", "TRUE"),
        ("apache.cpu.time", "sum", "TRUE", NS, "'self'", "'user'",
         None, NI, "CAST(u % 100 AS DOUBLE) / 8.0", "TRUE"),
        ("apache.cpu.load", "gauge", "FALSE", NS, NS, NS, None,
         NI, "CAST(e % 200 AS DOUBLE) / 10.0", "TRUE"),
        ("apache.load.1", "gauge", "FALSE", NS, NS, NS, None,
         NI, "CAST(e % 80 AS DOUBLE) / 16.0", "TRUE"),
        ("apache.load.5", "gauge", "FALSE", NS, NS, NS, "u % 3 <> 0",
         NI, "CAST(u % 40 AS DOUBLE) / 8.0", "TRUE"),
        ("apache.load.15", "gauge", "FALSE", NS, NS, NS, None,
         NI, "CAST(e % 30 AS DOUBLE) / 4.0", "TRUE"),
        ("apache.request.time", "sum", "TRUE", NS, NS, NS, None,
         "e % 90000", ND, "TRUE"),
        ("apache.scoreboard", "sum", "FALSE", "'waiting'", NS, NS, None,
         "u % 3", ND, "TRUE"),
        ("apache.scoreboard", "sum", "FALSE", "'starting'", NS, NS, None,
         "e % 2", ND, "TRUE"),
        ("apache.scoreboard", "sum", "FALSE", "'reading'", NS, NS, None,
         "u % 2", ND, "TRUE"),
        ("apache.scoreboard", "sum", "FALSE", "'sending'", NS, NS, None,
         "e % 3", ND, "TRUE"),
        ("apache.scoreboard", "sum", "FALSE", "'keepalive'", NS, NS, None,
         "u % 4", ND, "TRUE"),
        ("apache.scoreboard", "sum", "FALSE", "'dnslookup'", NS, NS, None,
         "e % 3", ND, "TRUE"),
        ("apache.scoreboard", "sum", "FALSE", "'closing'", NS, NS, None,
         "e % 2", ND, "TRUE"),
        ("apache.scoreboard", "sum", "FALSE", "'logging'", NS, NS, None,
         "u % 5", ND, "TRUE"),
        ("apache.scoreboard", "sum", "FALSE", "'finishing'", NS, NS, None,
         "e % 4", ND, "TRUE"),
        ("apache.scoreboard", "sum", "FALSE", "'idle_cleanup'", NS, NS,
         None, "u % 2", ND, "TRUE"),
        ("apache.scoreboard", "sum", "FALSE", "'open'", NS, NS, None,
         "e % 6", ND, "TRUE"),
        ("apache.scoreboard", "sum", "FALSE", "'unknown'", NS, NS,
         "e % 7 = 0", "2", ND, "TRUE"),
    ]
    parts = []
    for i, (metric, kind, mono, st, lv, md, where, vi, vd, ok) in \
            enumerate(rows):
        a = (lambda n: f" AS {n}") if i == 0 else (lambda n: "")
        parts.append(
            f"SELECT event_id, 'web1'{a('ap_server_name')}, "
            f"'8080'{a('ap_server_port')}, '{metric}'{a('ap_metric')}, "
            f"'{kind}'{a('ap_kind')}, {mono}{a('ap_mono')}, "
            f"{st}{a('ap_state')}, {lv}{a('ap_level')}, "
            f"{md}{a('ap_mode')}, {vi}{a('ap_value')}, "
            f"{vd}{a('ap_value_d')}, {ok}{a('ap_ok')} FROM a"
            + (f" WHERE {where}" if where else "")
        )
    return (
        "WITH a AS (SELECT event_id, user_id AS u, event_id AS e "
        "FROM events)\n" + "\nUNION ALL\n".join(parts)
    )


EXT16_QUERIES["apache_status"] = q_apache
EXT16_ORACLES["apache_status"] = _apache_oracle()


# ---------------------------------------------------------------------------
# nginx stub_status page -> metric rows
# ---------------------------------------------------------------------------


def q_nginx(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.receivers import nginx_stub_status

    ev = load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    s = lambda c: c.cast("string")  # noqa: E731
    body = F.when(e % 19 == 0, F.lit("<html>error page</html>")).otherwise(
        F.concat(
            F.lit("Active connections: "), s(e % 300),
            F.lit(" \nserver accepts handled requests\n "),
            s(e % 100000), F.lit(" "), s(e % 100000 - e % 50), F.lit(" "),
            s(e % 1000000),
            F.lit(" \nReading: "), s(u % 20),
            F.lit(" Writing: "), s(e % 30),
            F.lit(" Waiting: "), s(u % 50), F.lit(" \n"),
        )
    )
    out = nginx_stub_status(ev.select("event_id", body.alias("body")))
    return out.select(
        "event_id", "ng_ok", "ng_metric", "ng_mono", "ng_state", "ng_value",
    )


O_NGINX = """
WITH a AS (
  SELECT event_id, user_id AS u, event_id AS e, event_id % 19 = 0 AS bad
  FROM events
), m(metric, mono, state, slot) AS (
  VALUES ('nginx.requests', TRUE, NULL, 'req'),
         ('nginx.connections_accepted', TRUE, NULL, 'acc'),
         ('nginx.connections_handled', TRUE, NULL, 'han'),
         ('nginx.connections_current', FALSE, 'active', 'act'),
         ('nginx.connections_current', FALSE, 'reading', 'rd'),
         ('nginx.connections_current', FALSE, 'writing', 'wr'),
         ('nginx.connections_current', FALSE, 'waiting', 'wt')
)
SELECT event_id, TRUE AS ng_ok, m.metric AS ng_metric, m.mono AS ng_mono,
       m.state AS ng_state,
       CASE m.slot WHEN 'req' THEN e % 1000000
            WHEN 'acc' THEN e % 100000 WHEN 'han' THEN e % 100000 - e % 50
            WHEN 'act' THEN e % 300 WHEN 'rd' THEN u % 20
            WHEN 'wr' THEN e % 30 ELSE u % 50 END AS ng_value
FROM a CROSS JOIN m WHERE NOT bad
UNION ALL
SELECT event_id, FALSE, NULL, CAST(NULL AS BOOLEAN), NULL,
       CAST(NULL AS BIGINT)
FROM a WHERE bad
"""


EXT16_QUERIES["nginx_stub_status"] = q_nginx
EXT16_ORACLES["nginx_stub_status"] = O_NGINX


# ---------------------------------------------------------------------------
# journald JSON entries -> log rows
# ---------------------------------------------------------------------------


def q_journald(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.receivers import journald_parse

    ev = load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    s = lambda c: c.cast("string")  # noqa: E731

    msg = F.when(
        e % 5 == 0,
        F.concat(F.lit("[104,105,"), s(e % 26 + 65), F.lit("]")),
    ).otherwise(F.concat(F.lit('"log line '), s(e % 100), F.lit('"')))
    ts_field = F.concat(
        F.lit('"__REALTIME_TIMESTAMP":"'),
        s(e + 1650000000000000), F.lit('",'),
    )
    body = (
        F.when(e % 37 == 0, F.lit("not json"))
        .when(e % 13 == 0, F.concat(
            F.lit('{"__CURSOR":"s=abc'), s(e), F.lit('","MESSAGE":'), msg,
            F.lit("}"),
        ))
        .when(e % 29 == 0, F.concat(
            F.lit('{"__CURSOR":"s=abc'), s(e),
            F.lit('","__REALTIME_TIMESTAMP":'), s(e), F.lit(',"MESSAGE":'),
            msg, F.lit("}"),
        ))
        .when(e % 41 == 0, F.concat(
            F.lit("{"), ts_field, F.lit('"MESSAGE":'), msg, F.lit("}"),
        ))
        .otherwise(F.concat(
            F.lit('{"__CURSOR":"s=abc'), s(e), F.lit('",'), ts_field,
            F.lit('"_PID":"'), s(u % 32768),
            F.lit('","PRIORITY":"'), s(e % 8),
            F.lit('","MESSAGE":'), msg,
            F.lit(',"_SYSTEMD_UNIT":"unit'), s(u % 10),
            F.lit('.service","_HOSTNAME":"h'), s(u % 6), F.lit('"}'),
        ))
    )
    out = journald_parse(
        ev.select("event_id", body.alias("body")),
        convert_message_bytes=True,
    )
    return out.select("event_id", "jd_ts_ns", "jd_cursor", "jd_body",
                      "jd_ok")


O_JOURNALD = """
WITH a AS (
  SELECT event_id, user_id AS u, event_id AS e,
         event_id % 37 = 0 OR event_id % 13 = 0
           OR event_id % 29 = 0 OR event_id % 41 = 0 AS bad
  FROM events
)
SELECT event_id,
  CASE WHEN NOT bad
       THEN (e + 1650000000000000) * 1000 END AS jd_ts_ns,
  CASE WHEN NOT bad THEN 's=abc' || CAST(e AS VARCHAR) END AS jd_cursor,
  CASE WHEN NOT bad THEN
    '{"MESSAGE":"'
    || CASE WHEN e % 5 = 0 THEN 'hi' || chr(CAST(e % 26 + 65 AS INT))
            ELSE 'log line ' || CAST(e % 100 AS VARCHAR) END
    || '","PRIORITY":"' || CAST(e % 8 AS VARCHAR)
    || '","_HOSTNAME":"h' || CAST(u % 6 AS VARCHAR)
    || '","_PID":"' || CAST(u % 32768 AS VARCHAR)
    || '","_SYSTEMD_UNIT":"unit' || CAST(u % 10 AS VARCHAR)
    || '.service","__CURSOR":"s=abc' || CAST(e AS VARCHAR) || '"}'
  END AS jd_body,
  NOT bad AS jd_ok
FROM a
"""


EXT16_QUERIES["journald_logs"] = q_journald
EXT16_ORACLES["journald_logs"] = O_JOURNALD


# ---------------------------------------------------------------------------
# redis INFO page -> long-format metric rows
# ---------------------------------------------------------------------------

_REDIS_ALL_ON = frozenset({
    "redis.clients.blocked", "redis.clients.max_input_buffer",
    "redis.clients.max_output_buffer", "redis.clients.connected",
    "redis.slaves.connected", "redis.keys.evicted", "redis.keys.expired",
    "redis.commands", "redis.keyspace.hits", "redis.keyspace.misses",
    "redis.latest_fork", "redis.replication.offset", "redis.maxmemory",
    "redis.memory.fragmentation_ratio",
    "redis.rdb.changes_since_last_save", "redis.connections.rejected",
    "redis.replication.backlog_first_byte_offset",
    "redis.replication.replica_offset", "redis.commands.processed",
    "redis.connections.received", "redis.net.input", "redis.net.output",
    "redis.uptime", "redis.cpu.time", "redis.memory.used",
    "redis.memory.lua", "redis.memory.peak", "redis.memory.rss",
    "redis.role", "redis.cmd.calls", "redis.cmd.usec",
    "redis.cmd.latency", "redis.db.keys", "redis.db.expires",
    "redis.db.avg_ttl",
})


def q_redis(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.receivers import redis_info

    ev = load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    s = lambda c: c.cast("string")  # noqa: E731

    body = F.concat(
        F.lit("# Server\r\nredis_version:7.0."), s(u % 15),
        F.lit("\r\nuptime_in_seconds:"),
        F.when(e % 43 == 0, F.lit("soon")).otherwise(s(e % 1000000)),
        F.lit("\r\n# Clients\r\nconnected_clients:"),
        F.when(e % 23 == 0, F.lit("abc")).otherwise(s(u % 500)),
        F.lit("\r\nblocked_clients:"), s(e % 20),
        F.lit("\r\nclient_recent_max_input_buffer:"), s(e % 4096),
        F.lit("\r\nclient_recent_max_output_buffer:"), s(u % 4096),
        F.lit("\r\n# Memory\r\nused_memory:"), s(e % 8000000),
        F.lit("\r\nused_memory_rss:"), s(e % 9000000),
        F.lit("\r\nused_memory_peak:"), s(e % 10000000),
        F.lit("\r\nused_memory_lua:"), s(u % 50000),
        F.lit("\r\nmaxmemory:"),
        F.when(u % 2 == 0, s(e % 20000000)).otherwise(F.lit("0")),
        F.lit("\r\nmem_fragmentation_ratio:"), s((e % 300) / 100.0),
        F.lit("\r\n# Stats\r\ntotal_connections_received:"), s(e % 100000),
        F.lit("\r\ntotal_commands_processed:"), s(e % 2000000),
        F.lit("\r\ninstantaneous_ops_per_sec:"), s(e % 5000),
        F.lit("\r\nrejected_connections:"), s(u % 10),
        F.lit("\r\nexpired_keys:"), s(e % 3000),
        F.lit("\r\nevicted_keys:"), s(u % 100),
        F.lit("\r\nkeyspace_hits:"), s(e % 50000),
        F.lit("\r\nkeyspace_misses:"), s(u % 5000),
        F.lit("\r\nlatest_fork_usec:"), s(e % 700),
        F.lit("\r\ntotal_net_input_bytes:"), s(e % 123456),
        F.lit("\r\ntotal_net_output_bytes:"), s(u % 123456),
        F.lit("\r\nrdb_changes_since_last_save:"), s(e % 77),
        F.lit("\r\n# Replication\r\nrole:"),
        F.when(u % 4 == 0, F.lit("slave")).otherwise(F.lit("master")),
        F.lit("\r\nmaster_host:10.0.0.1:6379"),
        F.lit("\r\nconnected_slaves:"), s(u % 3),
        F.lit("\r\nmaster_repl_offset:"), s(e % 999999),
        F.lit("\r\nrepl_backlog_first_byte_offset:"), s(u % 333),
        F.lit("\r\nslave_repl_offset:"), s(e % 888888),
        F.lit("\r\n# CPU\r\nused_cpu_sys:"), s((e % 10000) / 16.0),
        F.lit("\r\nused_cpu_user:"), s((u % 10000) / 16.0),
        F.lit("\r\nused_cpu_sys_children:"), s((e % 100) / 4.0),
        F.lit("\r\nused_cpu_user_children:"), s((u % 100) / 4.0),
        F.lit("\r\nused_cpu_sys_main_thread:"), s((e % 5000) / 8.0),
        F.lit("\r\nused_cpu_user_main_thread:"), s((u % 5000) / 8.0),
        F.lit("\r\n# Commandstats\r\ncmdstat_get:calls="), s(e % 10000),
        F.lit(",usec="), s(e % 90000),
        F.lit(",usec_per_call=3.58,rejected_calls=0,failed_calls=0"),
        F.lit("\r\ncmdstat_set:calls="), s(u % 8000),
        F.lit(",usec="), s(u % 80000), F.lit(",usec_per_call=2.5"),
        F.when(e % 9 == 0,
               F.concat(F.lit("\r\ncmdstat_bad:calls=xx,usec="),
                        s(e % 70))).otherwise(F.lit("")),
        F.lit("\r\n# Latencystats\r\nlatency_percentiles_usec_get:p50="),
        s((e % 2000) / 16.0), F.lit(",p99="), s((e % 4000) / 8.0),
        F.lit(",p99.9="), s((e % 8000) / 4.0),
        F.lit("\r\nlatency_percentiles_usec_del:p50="), s((u % 64) / 4.0),
        F.lit(",p95="), s((u % 16) / 4.0),
        F.when(u % 5 == 0,
               F.lit("\r\nlatency_percentiles_usec_set:p50=1.5,p99=oops")
               ).otherwise(F.lit("")),
        F.lit("\r\n# Keyspace\r\ndb0:keys="), s(e % 1000),
        F.lit(",expires="), s(u % 100), F.lit(",avg_ttl="), s(e % 50000),
        F.when(u % 2 == 0, F.concat(
            F.lit("\r\ndb1:keys="), s(u % 2000), F.lit(",expires="),
            s(e % 200), F.lit(",avg_ttl=0"))).otherwise(F.lit("")),
        F.when(e % 21 == 0,
               F.lit("\r\ndb2:keys=bad,expires=1,avg_ttl=2")
               ).otherwise(F.lit("")),
        F.lit("\r\n"),
    )
    out = redis_info(
        ev.select("event_id", body.alias("body")), enabled=_REDIS_ALL_ON,
    )
    return out.select(
        "event_id", "rd_version", "rd_metric", "rd_kind", "rd_mono",
        "rd_state", "rd_role", "rd_cmd", "rd_db", "rd_percentile",
        "rd_value", "rd_value_d", "rd_ok",
    )


def _redis_oracle() -> str:
    NS = "CAST(NULL AS VARCHAR)"
    NI = "CAST(NULL AS BIGINT)"
    ND = "CAST(NULL AS DOUBLE)"
    # metric, kind, mono, state, role, cmd, db, pct, where, vi, vd, ok
    rows = [
        ("redis.clients.blocked", "sum", "FALSE", NS, NS, NS, NS, NS,
         None, "e % 20", ND, "TRUE"),
        ("redis.clients.max_input_buffer", "gauge", "FALSE", NS, NS, NS,
         NS, NS, None, "e % 4096", ND, "TRUE"),
        ("redis.clients.max_output_buffer", "gauge", "FALSE", NS, NS, NS,
         NS, NS, None, "u % 4096", ND, "TRUE"),
        ("redis.clients.connected", "sum", "FALSE", NS, NS, NS, NS, NS,
         None, "CASE WHEN e % 23 = 0 THEN 0 ELSE u % 500 END", ND,
         "e % 23 <> 0"),
        ("redis.slaves.connected", "sum", "FALSE", NS, NS, NS, NS, NS,
         None, "u % 3", ND, "TRUE"),
        ("redis.keys.evicted", "sum", "TRUE", NS, NS, NS, NS, NS, None,
         "u % 100", ND, "TRUE"),
        ("redis.keys.expired", "sum", "TRUE", NS, NS, NS, NS, NS, None,
         "e % 3000", ND, "TRUE"),
        ("redis.commands", "gauge", "FALSE", NS, NS, NS, NS, NS, None,
         "e % 5000", ND, "TRUE"),
        ("redis.keyspace.hits", "sum", "TRUE", NS, NS, NS, NS, NS, None,
         "e % 50000", ND, "TRUE"),
        ("redis.keyspace.misses", "sum", "TRUE", NS, NS, NS, NS, NS,
         None, "u % 5000", ND, "TRUE"),
        ("redis.latest_fork", "gauge", "FALSE", NS, NS, NS, NS, NS, None,
         "e % 700", ND, "TRUE"),
        ("redis.replication.offset", "gauge", "FALSE", NS, NS, NS, NS,
         NS, None, "e % 999999", ND, "TRUE"),
        ("redis.maxmemory", "gauge", "FALSE", NS, NS, NS, NS, NS, None,
         "CASE WHEN u % 2 = 0 THEN e % 20000000 ELSE 0 END", ND, "TRUE"),
        ("redis.memory.fragmentation_ratio", "gauge", "FALSE", NS, NS,
         NS, NS, NS, None, NI, "CAST(e % 300 AS DOUBLE) / 100.0",
         "TRUE"),
        ("redis.rdb.changes_since_last_save", "sum", "FALSE", NS, NS, NS,
         NS, NS, None, "e % 77", ND, "TRUE"),
        ("redis.connections.rejected", "sum", "TRUE", NS, NS, NS, NS, NS,
         None, "u % 10", ND, "TRUE"),
        ("redis.replication.backlog_first_byte_offset", "gauge", "FALSE",
         NS, NS, NS, NS, NS, None, "u % 333", ND, "TRUE"),
        ("redis.replication.replica_offset", "gauge", "FALSE", NS, NS,
         NS, NS, NS, None, "e % 888888", ND, "TRUE"),
        ("redis.commands.processed", "sum", "TRUE", NS, NS, NS, NS, NS,
         None, "e % 2000000", ND, "TRUE"),
        ("redis.connections.received", "sum", "TRUE", NS, NS, NS, NS, NS,
         None, "e % 100000", ND, "TRUE"),
        ("redis.net.input", "sum", "TRUE", NS, NS, NS, NS, NS, None,
         "e % 123456", ND, "TRUE"),
        ("redis.net.output", "sum", "TRUE", NS, NS, NS, NS, NS, None,
         "u % 123456", ND, "TRUE"),
        ("redis.uptime", "sum", "TRUE", NS, NS, NS, NS, NS, None,
         "e % 1000000", ND, "TRUE"),
        ("redis.cpu.time", "sum", "TRUE", "'sys'", NS, NS, NS, NS, None,
         NI, "CAST(e % 10000 AS DOUBLE) / 16.0", "TRUE"),
        ("redis.cpu.time", "sum", "TRUE", "'sys_children'", NS, NS, NS,
         NS, None, NI, "CAST(e % 100 AS DOUBLE) / 4.0", "TRUE"),
        ("redis.cpu.time", "sum", "TRUE", "'sys_main_thread'", NS, NS,
         NS, NS, None, NI, "CAST(e % 5000 AS DOUBLE) / 8.0", "TRUE"),
        ("redis.cpu.time", "sum", "TRUE", "'user'", NS, NS, NS, NS, None,
         NI, "CAST(u % 10000 AS DOUBLE) / 16.0", "TRUE"),
        ("redis.cpu.time", "sum", "TRUE", "'user_children'", NS, NS, NS,
         NS, None, NI, "CAST(u % 100 AS DOUBLE) / 4.0", "TRUE"),
        ("redis.cpu.time", "sum", "TRUE", "'user_main_thread'", NS, NS,
         NS, NS, None, NI, "CAST(u % 5000 AS DOUBLE) / 8.0", "TRUE"),
        ("redis.memory.used", "gauge", "FALSE", NS, NS, NS, NS, NS, None,
         "e % 8000000", ND, "TRUE"),
        ("redis.memory.lua", "gauge", "FALSE", NS, NS, NS, NS, NS, None,
         "u % 50000", ND, "TRUE"),
        ("redis.memory.peak", "gauge", "FALSE", NS, NS, NS, NS, NS, None,
         "e % 10000000", ND, "TRUE"),
        ("redis.memory.rss", "gauge", "FALSE", NS, NS, NS, NS, NS, None,
         "e % 9000000", ND, "TRUE"),
        ("redis.role", "sum", "FALSE", NS,
         "CASE WHEN u % 4 = 0 THEN 'replica' ELSE 'primary' END", NS, NS,
         NS, None, "1", ND, "TRUE"),
        ("redis.cmd.calls", "sum", "TRUE", NS, NS, "'get'", NS, NS, None,
         "e % 10000", ND, "TRUE"),
        ("redis.cmd.usec", "sum", "TRUE", NS, NS, "'get'", NS, NS, None,
         "e % 90000", ND, "TRUE"),
        ("redis.cmd.calls", "sum", "TRUE", NS, NS, "'set'", NS, NS, None,
         "u % 8000", ND, "TRUE"),
        ("redis.cmd.usec", "sum", "TRUE", NS, NS, "'set'", NS, NS, None,
         "u % 80000", ND, "TRUE"),
        ("redis.cmd.usec", "sum", "TRUE", NS, NS, "'bad'", NS, NS,
         "e % 9 = 0", "e % 70", ND, "TRUE"),
        ("redis.cmd.latency", "gauge", "FALSE", NS, NS, "'get'", NS,
         "'p50'", None, NI,
         "CAST(e % 2000 AS DOUBLE) / 16.0 / 1000000.0", "TRUE"),
        ("redis.cmd.latency", "gauge", "FALSE", NS, NS, "'get'", NS,
         "'p99'", None, NI,
         "CAST(e % 4000 AS DOUBLE) / 8.0 / 1000000.0", "TRUE"),
        ("redis.cmd.latency", "gauge", "FALSE", NS, NS, "'get'", NS,
         "'p99.9'", None, NI,
         "CAST(e % 8000 AS DOUBLE) / 4.0 / 1000000.0", "TRUE"),
        ("redis.cmd.latency", "gauge", "FALSE", NS, NS, "'del'", NS,
         "'p50'", None, NI,
         "CAST(u % 64 AS DOUBLE) / 4.0 / 1000000.0", "TRUE"),
        ("redis.db.keys", "gauge", "FALSE", NS, NS, NS, "'0'", NS, None,
         "e % 1000", ND, "TRUE"),
        ("redis.db.expires", "gauge", "FALSE", NS, NS, NS, "'0'", NS,
         None, "u % 100", ND, "TRUE"),
        ("redis.db.avg_ttl", "gauge", "FALSE", NS, NS, NS, "'0'", NS,
         None, "e % 50000", ND, "TRUE"),
        ("redis.db.keys", "gauge", "FALSE", NS, NS, NS, "'1'", NS,
         "u % 2 = 0", "u % 2000", ND, "TRUE"),
        ("redis.db.expires", "gauge", "FALSE", NS, NS, NS, "'1'", NS,
         "u % 2 = 0", "e % 200", ND, "TRUE"),
        ("redis.db.avg_ttl", "gauge", "FALSE", NS, NS, NS, "'1'", NS,
         "u % 2 = 0", "0", ND, "TRUE"),
    ]
    parts = []
    for i, (metric, kind, mono, st, role, cmd, db, pct, where, vi, vd,
            ok) in enumerate(rows):
        a = (lambda n: f" AS {n}") if i == 0 else (lambda n: "")
        w = "NOT bad" + (f" AND ({where})" if where else "")
        parts.append(
            f"SELECT event_id, ver{a('rd_version')}, "
            f"'{metric}'{a('rd_metric')}, '{kind}'{a('rd_kind')}, "
            f"{mono}{a('rd_mono')}, {st}{a('rd_state')}, "
            f"{role}{a('rd_role')}, {cmd}{a('rd_cmd')}, {db}{a('rd_db')}, "
            f"{pct}{a('rd_percentile')}, {vi}{a('rd_value')}, "
            f"{vd}{a('rd_value_d')}, {ok}{a('rd_ok')} FROM a WHERE {w}"
        )
    parts.append(
        "SELECT event_id, ver, NULL, NULL, CAST(NULL AS BOOLEAN), NULL, "
        "NULL, NULL, NULL, NULL, CAST(NULL AS BIGINT), "
        "CAST(NULL AS DOUBLE), FALSE FROM a WHERE bad"
    )
    return (
        "WITH a AS (SELECT event_id, user_id AS u, event_id AS e, "
        "'7.0.' || CAST(user_id % 15 AS VARCHAR) AS ver, "
        "event_id % 43 = 0 AS bad FROM events)\n"
        + "\nUNION ALL\n".join(parts)
    )


EXT16_QUERIES["redis_info_metrics"] = q_redis
EXT16_ORACLES["redis_info_metrics"] = _redis_oracle()


# ---------------------------------------------------------------------------
# memcached stats output -> metric rows
# ---------------------------------------------------------------------------


def q_memcached(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.receivers import memcached_stats

    ev = load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    s = lambda c: c.cast("string")  # noqa: E731

    body = F.concat(
        F.lit("STAT pid 1\nSTAT bytes "), s(e % 9000000),
        F.lit("\nSTAT curr_connections "), s(u % 500),
        F.lit("\nSTAT total_connections "), s(e % 100000),
        F.lit("\nSTAT cmd_get "), s(e % 70000),
        F.lit("\nSTAT cmd_set "), s(u % 60000),
        F.lit("\nSTAT cmd_flush "), s(e % 10),
        F.lit("\nSTAT cmd_touch "),
        F.when(e % 11 == 0, F.lit("zz")).otherwise(s(e % 100)),
        F.lit("\nSTAT curr_items "), s(e % 40000),
        F.lit("\nSTAT threads "), s(u % 16 + 1),
        F.lit("\nSTAT evictions "), s(e % 3000),
        F.lit("\nSTAT bytes_read "), s(e % 888888),
        F.lit("\nSTAT bytes_written "), s(u % 777777),
        F.lit("\nSTAT get_hits "), s(e % 50000),
        F.lit("\nSTAT get_misses "), s(u % 5000),
        F.lit("\nSTAT incr_hits "), s(e % 400),
        F.lit("\nSTAT incr_misses "), s(u % 40),
        F.when(e % 7 != 0,
               F.concat(F.lit("\nSTAT decr_hits "), s(e % 300))
               ).otherwise(F.lit("")),
        F.lit("\nSTAT decr_misses "), s(u % 30),
        F.lit("\nSTAT rusage_system "), s((e % 40000) / 16.0),
        F.lit("\nSTAT rusage_user "), s((u % 40000) / 16.0),
        F.lit("\nEND\n"),
    )
    out = memcached_stats(ev.select("event_id", body.alias("body")))
    return out.select(
        "event_id", "mc_metric", "mc_kind", "mc_mono", "mc_command",
        "mc_direction", "mc_type", "mc_operation", "mc_state", "mc_value",
        "mc_value_d",
    )


def _memcached_oracle() -> str:
    NS = "CAST(NULL AS VARCHAR)"
    NI = "CAST(NULL AS BIGINT)"
    ND = "CAST(NULL AS DOUBLE)"
    rows = [
        ("memcached.bytes", "gauge", "FALSE", NS, NS, NS, NS, NS, None,
         "e % 9000000", ND),
        ("memcached.connections.current", "sum", "FALSE", NS, NS, NS, NS,
         NS, None, "u % 500", ND),
        ("memcached.connections.total", "sum", "TRUE", NS, NS, NS, NS,
         NS, None, "e % 100000", ND),
        ("memcached.commands", "sum", "TRUE", "'get'", NS, NS, NS, NS,
         None, "e % 70000", ND),
        ("memcached.commands", "sum", "TRUE", "'set'", NS, NS, NS, NS,
         None, "u % 60000", ND),
        ("memcached.commands", "sum", "TRUE", "'flush'", NS, NS, NS, NS,
         None, "e % 10", ND),
        ("memcached.commands", "sum", "TRUE", "'touch'", NS, NS, NS, NS,
         "e % 11 <> 0", "e % 100", ND),
        ("memcached.current_items", "sum", "FALSE", NS, NS, NS, NS, NS,
         None, "e % 40000", ND),
        ("memcached.threads", "sum", "FALSE", NS, NS, NS, NS, NS, None,
         "u % 16 + 1", ND),
        ("memcached.evictions", "sum", "TRUE", NS, NS, NS, NS, NS, None,
         "e % 3000", ND),
        ("memcached.network", "sum", "TRUE", NS, "'received'", NS, NS,
         NS, None, "e % 888888", ND),
        ("memcached.network", "sum", "TRUE", NS, "'sent'", NS, NS, NS,
         None, "u % 777777", ND),
        ("memcached.operations", "sum", "TRUE", NS, NS, "'hit'", "'get'",
         NS, None, "e % 50000", ND),
        ("memcached.operations", "sum", "TRUE", NS, NS, "'miss'",
         "'get'", NS, None, "u % 5000", ND),
        ("memcached.operations", "sum", "TRUE", NS, NS, "'hit'",
         "'increment'", NS, None, "e % 400", ND),
        ("memcached.operations", "sum", "TRUE", NS, NS, "'miss'",
         "'increment'", NS, None, "u % 40", ND),
        ("memcached.operations", "sum", "TRUE", NS, NS, "'hit'",
         "'decrement'", NS, "e % 7 <> 0", "e % 300", ND),
        ("memcached.operations", "sum", "TRUE", NS, NS, "'miss'",
         "'decrement'", NS, None, "u % 30", ND),
        ("memcached.cpu.usage", "sum", "TRUE", NS, NS, NS, NS,
         "'system'", None, NI, "CAST(e % 40000 AS DOUBLE) / 16.0"),
        ("memcached.cpu.usage", "sum", "TRUE", NS, NS, NS, NS, "'user'",
         None, NI, "CAST(u % 40000 AS DOUBLE) / 16.0"),
        # hit ratio replays the swapped-arg quirk: miss/(hit+miss)*100
        ("memcached.operation_hit_ratio", "gauge", "FALSE", NS, NS, NS,
         "'increment'", NS, None, NI,
         "CASE WHEN e % 400 + u % 40 = 0 THEN 0.0 ELSE "
         "CAST(u % 40 AS DOUBLE) / (CAST(u % 40 AS DOUBLE) "
         "+ CAST(e % 400 AS DOUBLE)) * 100 END"),
        ("memcached.operation_hit_ratio", "gauge", "FALSE", NS, NS, NS,
         "'decrement'", NS, "e % 7 <> 0", NI,
         "CASE WHEN e % 300 + u % 30 = 0 THEN 0.0 ELSE "
         "CAST(u % 30 AS DOUBLE) / (CAST(u % 30 AS DOUBLE) "
         "+ CAST(e % 300 AS DOUBLE)) * 100 END"),
        ("memcached.operation_hit_ratio", "gauge", "FALSE", NS, NS, NS,
         "'get'", NS, None, NI,
         "CASE WHEN e % 50000 + u % 5000 = 0 THEN 0.0 ELSE "
         "CAST(u % 5000 AS DOUBLE) / (CAST(u % 5000 AS DOUBLE) "
         "+ CAST(e % 50000 AS DOUBLE)) * 100 END"),
    ]
    parts = []
    for i, (metric, kind, mono, cmd, dr, tp, op, st, where, vi, vd) in \
            enumerate(rows):
        a = (lambda n: f" AS {n}") if i == 0 else (lambda n: "")
        w = f" WHERE {where}" if where else ""
        parts.append(
            f"SELECT event_id, '{metric}'{a('mc_metric')}, "
            f"'{kind}'{a('mc_kind')}, {mono}{a('mc_mono')}, "
            f"{cmd}{a('mc_command')}, {dr}{a('mc_direction')}, "
            f"{tp}{a('mc_type')}, {op}{a('mc_operation')}, "
            f"{st}{a('mc_state')}, {vi}{a('mc_value')}, "
            f"{vd}{a('mc_value_d')} FROM a{w}"
        )
    return (
        "WITH a AS (SELECT event_id, user_id AS u, event_id AS e "
        "FROM events)\n" + "\nUNION ALL\n".join(parts)
    )


EXT16_QUERIES["memcached_stats"] = q_memcached
EXT16_ORACLES["memcached_stats"] = _memcached_oracle()


# ---------------------------------------------------------------------------
# flink REST metric snapshots -> metric rows
# ---------------------------------------------------------------------------


def q_flink(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.receivers import flink_metrics

    ev = load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    s = lambda c: c.cast("string")  # noqa: E731
    j = lambda mid, v: F.concat(  # noqa: E731
        F.lit('{"id":"'), F.lit(mid), F.lit('","value":"'), v,
        F.lit('"}'),
    )
    scope = F.element_at(
        F.array(F.lit("jobmanager"), F.lit("taskmanager"), F.lit("job"),
                F.lit("subtask")),
        (e % 4 + 1).cast("int"),
    )
    jm = F.concat(
        F.lit("["),
        j("Status.JVM.CPU.Load", s((e % 100) / 16.0)), F.lit(","),
        j("Status.JVM.Memory.Heap.Used",
          F.when(e % 19 == 0, F.lit("x")).otherwise(s(e % 1000000))),
        F.lit(","),
        j("Status.JVM.GarbageCollector.PS_MarkSweep.Time", s(e % 1000)),
        F.lit(","),
        j("Status.JVM.GarbageCollector.PS_Scavenge.Count", s(u % 100)),
        F.lit(","), j("someUnknownMetric", s(e)), F.lit("]"),
    )
    tm = F.concat(
        F.lit("["),
        j("Status.JVM.GarbageCollector.G1_Young_Generation.Count",
          s(u % 50)), F.lit(","),
        j("Status.JVM.GarbageCollector.G1_Old_Generation.Time",
          s(e % 2000)), F.lit(","),
        j("Status.JVM.CPU.Time", s(e % 100000)), F.lit(","),
        j("Status.Flink.Memory.Managed.Used", s(u % 100000)), F.lit("]"),
    )
    job = F.concat(
        F.lit("["),
        j("numRestarts", s(e % 10)), F.lit(","),
        j("lastCheckpointSize", s(e % 1000000)), F.lit(","),
        j("lastCheckpointDuration", s(u % 10000)), F.lit(","),
        j("numberOfInProgressCheckpoints", s(e % 3)), F.lit(","),
        j("numberOfCompletedCheckpoints", s(e % 1000)), F.lit(","),
        j("numberOfFailedCheckpoints", s(u % 20)), F.lit("]"),
    )
    sub = F.concat(
        F.lit("["),
        j("numRecordsIn", s(e % 100000)), F.lit(","),
        j("numRecordsOut", s(u % 100000)), F.lit(","),
        j("numLateRecordsDropped", s(e % 50)), F.lit(","),
        F.concat(F.lit('{"id":"Op'), s(e % 3),
                 F.lit('.numRecordsIn","value":"'), s(e % 500),
                 F.lit('"}')), F.lit(","),
        F.concat(F.lit('{"id":"Op'), s(e % 3),
                 F.lit('.numRecordsOut","value":"'), s(u % 400),
                 F.lit('"}')), F.lit(","),
        j("W.currentOutputWatermark", s(e % 1000000)), F.lit("]"),
    )
    metrics = (
        F.when(scope == "jobmanager", jm)
        .when(scope == "taskmanager", tm)
        .when(scope == "job", job).otherwise(sub)
    )
    df = ev.select(
        "event_id", scope.alias("scope"),
        F.concat(F.lit("h"), s(u % 6)).alias("host"),
        F.when(scope.isin("taskmanager", "subtask"),
               F.concat(F.lit("tm"), s(u % 8))).alias("taskmanager_id"),
        F.when(scope.isin("job", "subtask"),
               F.concat(F.lit("job"), s(u % 5))).alias("job_name"),
        F.when(scope == "subtask",
               F.concat(F.lit("task"), s(e % 7))).alias("task_name"),
        F.when(scope == "subtask", s(u % 4)).alias("subtask_index"),
        metrics.alias("metrics"),
    )
    out = flink_metrics(df)
    return out.select(
        "event_id", "scope", "host", "taskmanager_id", "job_name",
        "task_name", "subtask_index", "fl_metric", "fl_kind", "fl_mono",
        "fl_gc_name", "fl_checkpoint", "fl_record", "fl_operator",
        "fl_value", "fl_value_d", "fl_ok",
    )


def _flink_oracle() -> str:
    NS = "CAST(NULL AS VARCHAR)"
    NI = "CAST(NULL AS BIGINT)"
    ND = "CAST(NULL AS DOUBLE)"
    # scope#, metric, kind, mono, gc, cp, rec, op, vi, vd, ok
    rows = [
        (0, "flink.jvm.cpu.load", "gauge", "FALSE", NS, NS, NS, NS, NI,
         "CAST(e % 100 AS DOUBLE) / 16.0", "TRUE"),
        (0, "flink.jvm.memory.heap.used", "sum", "FALSE", NS, NS, NS,
         NS, "CASE WHEN e % 19 = 0 THEN 0 ELSE e % 1000000 END", ND,
         "e % 19 <> 0"),
        (0, "flink.jvm.gc.collections.time", "sum", "TRUE",
         "'PS_MarkSweep'", NS, NS, NS, "e % 1000", ND, "TRUE"),
        (0, "flink.jvm.gc.collections.count", "sum", "TRUE",
         "'PS_Scavenge'", NS, NS, NS, "u % 100", ND, "TRUE"),
        (1, "flink.jvm.gc.collections.count", "sum", "TRUE",
         "'G1_Young_Generation'", NS, NS, NS, "u % 50", ND, "TRUE"),
        (1, "flink.jvm.gc.collections.time", "sum", "TRUE",
         "'G1_Old_Generation'", NS, NS, NS, "e % 2000", ND, "TRUE"),
        (1, "flink.jvm.cpu.time", "sum", "TRUE", NS, NS, NS, NS,
         "e % 100000", ND, "TRUE"),
        (1, "flink.memory.managed.used", "sum", "FALSE", NS, NS, NS, NS,
         "u % 100000", ND, "TRUE"),
        (2, "flink.job.restart.count", "sum", "TRUE", NS, NS, NS, NS,
         "e % 10", ND, "TRUE"),
        (2, "flink.job.last_checkpoint.size", "sum", "FALSE", NS, NS,
         NS, NS, "e % 1000000", ND, "TRUE"),
        (2, "flink.job.last_checkpoint.time", "gauge", "FALSE", NS, NS,
         NS, NS, "u % 10000", ND, "TRUE"),
        (2, "flink.job.checkpoint.in_progress", "sum", "FALSE", NS, NS,
         NS, NS, "e % 3", ND, "TRUE"),
        (2, "flink.job.checkpoint.count", "sum", "TRUE", NS,
         "'completed'", NS, NS, "e % 1000", ND, "TRUE"),
        (2, "flink.job.checkpoint.count", "sum", "TRUE", NS, "'failed'",
         NS, NS, "u % 20", ND, "TRUE"),
        (3, "flink.task.record.count", "sum", "TRUE", NS, NS, "'in'",
         NS, "e % 100000", ND, "TRUE"),
        (3, "flink.task.record.count", "sum", "TRUE", NS, NS, "'out'",
         NS, "u % 100000", ND, "TRUE"),
        (3, "flink.task.record.count", "sum", "TRUE", NS, NS,
         "'dropped'", NS, "e % 50", ND, "TRUE"),
        (3, "flink.operator.record.count", "sum", "TRUE", NS, NS,
         "'in'", "'Op' || CAST(e % 3 AS VARCHAR)", "e % 500", ND,
         "TRUE"),
        (3, "flink.operator.record.count", "sum", "TRUE", NS, NS,
         "'out'", "'Op' || CAST(e % 3 AS VARCHAR)", "u % 400", ND,
         "TRUE"),
        (3, "flink.operator.watermark.output", "sum", "FALSE", NS, NS,
         NS, "'W'", "e % 1000000", ND, "TRUE"),
    ]
    scopes = ["jobmanager", "taskmanager", "job", "subtask"]
    parts = []
    for i, (sc, metric, kind, mono, gc, cp, rec, op, vi, vd, ok) in \
            enumerate(rows):
        a = (lambda n: f" AS {n}") if i == 0 else (lambda n: "")
        tm = ("'tm' || CAST(u % 8 AS VARCHAR)" if sc in (1, 3) else NS)
        jn = ("'job' || CAST(u % 5 AS VARCHAR)" if sc in (2, 3) else NS)
        tn = ("'task' || CAST(e % 7 AS VARCHAR)" if sc == 3 else NS)
        si = ("CAST(u % 4 AS VARCHAR)" if sc == 3 else NS)
        parts.append(
            f"SELECT event_id, '{scopes[sc]}'{a('scope')}, "
            f"'h' || CAST(u % 6 AS VARCHAR){a('host')}, "
            f"{tm}{a('taskmanager_id')}, {jn}{a('job_name')}, "
            f"{tn}{a('task_name')}, {si}{a('subtask_index')}, "
            f"'{metric}'{a('fl_metric')}, '{kind}'{a('fl_kind')}, "
            f"{mono}{a('fl_mono')}, {gc}{a('fl_gc_name')}, "
            f"{cp}{a('fl_checkpoint')}, {rec}{a('fl_record')}, "
            f"{op}{a('fl_operator')}, {vi}{a('fl_value')}, "
            f"{vd}{a('fl_value_d')}, {ok}{a('fl_ok')} "
            f"FROM a WHERE e % 4 = {sc}"
        )
    return (
        "WITH a AS (SELECT event_id, user_id AS u, event_id AS e "
        "FROM events)\n" + "\nUNION ALL\n".join(parts)
    )


EXT16_QUERIES["flink_metrics"] = q_flink
EXT16_ORACLES["flink_metrics"] = _flink_oracle()


# ---------------------------------------------------------------------------
# rabbitmq management API objects -> metric rows
# ---------------------------------------------------------------------------


def q_rabbitmq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.receivers import rabbitmq_api

    ev = load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    s = lambda c: c.cast("string")  # noqa: E731

    qbody = F.concat(
        F.lit('{"name":"q'), s(e % 20),
        F.lit('","node":"rabbit@n'), s(u % 4),
        F.lit('","vhost":"vh'), s(u % 3),
        F.lit('","consumers":'), s(u % 50),
        F.lit(',"messages_unacknowledged":'), s(e % 100),
        F.lit(',"messages_ready":'), s(e % 1000),
        F.lit(',"message_stats":{"deliver":'), s(e % 100000),
        F.lit(',"publish":'), s(u % 100000), F.lit(".5"),
        F.when(e % 5 != 0,
               F.concat(F.lit(',"ack":'), s(u % 50000))
               ).otherwise(F.lit(',"ack":"oops"')),
        F.when(u % 7 != 0,
               F.concat(F.lit(',"drop_unroutable":'), s(e % 300))
               ).otherwise(F.lit("")),
        F.lit(',"unrelated":1}}'),
    )
    nbody = F.concat(
        F.lit('{"name":"rabbit@n'), s(u % 4),
        F.lit('","disk_free":'), s(e % 1000000000),
        F.lit(',"fd_used":'), s(u % 1000),
        F.lit(',"mem_alarm":'),
        F.when(u % 2 == 0, F.lit("true")).otherwise(F.lit("false")),
        F.lit(',"disk_free_alarm":false'),
        F.lit(',"fd_used_details.rate":'), s((e % 1000) / 16.0),
        F.lit(',"mem_used_details":{"rate":'), s((u % 100) / 4.0),
        F.lit('},"io_read_avg_time":'), s((e % 4000) / 8.0),
        F.lit(',"gc_num":'), s(e % 10000),
        F.lit(',"connection_created":'), s(u % 500), F.lit("}"),
    )
    kind = F.when(e % 3 == 0, F.lit("queue")).otherwise(F.lit("node"))
    body = F.when(e % 31 == 0, F.lit("junk")).otherwise(
        F.when(e % 3 == 0, qbody).otherwise(nbody)
    )
    out = rabbitmq_api(
        ev.select("event_id", kind.alias("kind"), body.alias("body")),
        enable_node_metrics=True,
    )
    return out.select(
        "event_id", "kind", "rq_queue_name", "rq_node_name", "rq_vhost",
        "rq_ok", "rq_metric", "rq_mkind", "rq_mono", "rq_state",
        "rq_value", "rq_value_d",
    )


def _rabbitmq_oracle() -> str:
    from ..operators.receivers import _RABBITMQ_NODE

    NS = "CAST(NULL AS VARCHAR)"
    NI = "CAST(NULL AS BIGINT)"
    ND = "CAST(NULL AS DOUBLE)"
    node_vals = {
        "disk_free": "e % 1000000000",
        "fd_used": "u % 1000",
        "mem_alarm": "CASE WHEN u % 2 = 0 THEN 1 ELSE 0 END",
        "fd_used_details.rate": "CAST(e % 1000 AS DOUBLE) / 16.0",
        "io_read_avg_time": "CAST(e % 4000 AS DOUBLE) / 8.0",
        "gc_num": "e % 10000",
        "connection_created": "u % 500",
    }
    qrows = [
        ("rabbitmq.consumer.count", "FALSE", NS, None, "u % 50", ND),
        ("rabbitmq.message.current", "FALSE", "'unacknowledged'", None,
         "e % 100", ND),
        ("rabbitmq.message.current", "FALSE", "'ready'", None,
         "e % 1000", ND),
        ("rabbitmq.message.delivered", "TRUE", NS, None, "e % 100000",
         ND),
        ("rabbitmq.message.published", "TRUE", NS, None, "u % 100000",
         ND),
        ("rabbitmq.message.acknowledged", "TRUE", NS, "e % 5 <> 0",
         "u % 50000", ND),
        ("rabbitmq.message.dropped", "TRUE", NS, "u % 7 <> 0", "e % 300",
         ND),
    ]
    parts = []
    first = True
    for metric, mono, st, where, vi, vd in qrows:
        a = (lambda n: f" AS {n}") if first else (lambda n: "")
        first = False
        w = "e % 3 = 0 AND NOT junk" + (f" AND ({where})" if where else "")
        parts.append(
            f"SELECT event_id, 'queue'{a('kind')}, "
            f"'q' || CAST(e % 20 AS VARCHAR){a('rq_queue_name')}, "
            f"'rabbit@n' || CAST(u % 4 AS VARCHAR){a('rq_node_name')}, "
            f"'vh' || CAST(u % 3 AS VARCHAR){a('rq_vhost')}, "
            f"TRUE{a('rq_ok')}, '{metric}'{a('rq_metric')}, "
            f"'sum'{a('rq_mkind')}, {mono}{a('rq_mono')}, "
            f"{st}{a('rq_state')}, {vi}{a('rq_value')}, "
            f"{vd}{a('rq_value_d')} FROM a WHERE {w}"
        )
    for tag, metric, vt in _RABBITMQ_NODE:
        if vt == "double":
            vi, vd = NI, node_vals.get(tag, "CAST(0.0 AS DOUBLE)")
        else:
            vi, vd = node_vals.get(tag, "0"), ND
        parts.append(
            f"SELECT event_id, 'node', NULL, "
            f"'rabbit@n' || CAST(u % 4 AS VARCHAR), NULL, TRUE, "
            f"'{metric}', 'sum', FALSE, NULL, {vi}, {vd} "
            f"FROM a WHERE e % 3 <> 0 AND NOT junk"
        )
    parts.append(
        "SELECT event_id, CASE WHEN e % 3 = 0 THEN 'queue' ELSE 'node' "
        "END, NULL, '', NULL, FALSE, NULL, NULL, "
        "CAST(NULL AS BOOLEAN), NULL, CAST(NULL AS BIGINT), "
        "CAST(NULL AS DOUBLE) FROM a WHERE junk"
    )
    return (
        "WITH a AS (SELECT event_id, user_id AS u, event_id AS e, "
        "event_id % 31 = 0 AS junk FROM events)\n"
        + "\nUNION ALL\n".join(parts)
    )


EXT16_QUERIES["rabbitmq_api"] = q_rabbitmq
EXT16_ORACLES["rabbitmq_api"] = _rabbitmq_oracle()


# ---------------------------------------------------------------------------
# couchdb _stats document -> metric rows
# ---------------------------------------------------------------------------


def q_couchdb(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.receivers import couchdb_stats

    ev = load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    s = lambda c: c.cast("string")  # noqa: E731

    methods = F.concat(
        F.lit('"GET":{"value":'), s(e % 100000),
        F.lit('},"POST":{"value":'), s(u % 50000),
        F.lit('},"PUT":{"value":'), s(e % 9000), F.lit("}"),
        F.when(e % 2 == 0,
               F.concat(F.lit(',"DELETE":{"value":'), s(u % 800),
                        F.lit("}"))).otherwise(F.lit("")),
        F.when(e % 5 == 0, F.lit(',"HEAD":{"value":"oops"}')
               ).otherwise(F.lit("")),
    )
    codes = F.concat(
        F.lit('"200":{"value":'), s(e % 1000000),
        F.lit('},"404":{"value":'), s(u % 10000),
        F.lit('},"500":{"value":'), s(e % 77), F.lit("}"),
    )
    body = F.concat(
        F.lit('{"request_time":{"value":{"arithmetic_mean":'),
        s((e % 8000) / 16.0),
        F.lit('}},"httpd":{"bulk_requests":{"value":'), s(e % 5000),
        F.lit('},"view_reads":{"value":'), s(u % 4000), F.lit("}"),
        F.when(u % 3 != 0,
               F.concat(F.lit(',"temporary_view_reads":{"value":'),
                        s(e % 60), F.lit("}"))).otherwise(F.lit("")),
        F.lit('},"httpd_request_methods":{'), methods,
        F.lit('},"httpd_status_codes":{'), codes,
        F.lit('},"open_databases":{"value":'), s(u % 200),
        F.lit('},"open_os_files":{"value":'), s(e % 3000),
        F.lit('},"database_reads":{"value":'), s(e % 400000),
        F.lit('},"database_writes":{"value":'), s(u % 300000),
        F.lit(".7}}"),
    )
    out = couchdb_stats(
        ev.select("event_id", body.alias("body")),
        node_name="http://localhost:5984",
    )
    return out.select(
        "event_id", "cd_node_name", "cd_metric", "cd_kind", "cd_mono",
        "cd_method", "cd_code", "cd_view", "cd_operation", "cd_value",
        "cd_value_d", "cd_ok",
    )


def _couchdb_oracle() -> str:
    from ..operators.receivers import (
        _COUCHDB_CODES,
        _COUCHDB_METHODS,
        _COUCHDB_VIEWS,
    )

    NS = "CAST(NULL AS VARCHAR)"
    NI = "CAST(NULL AS BIGINT)"
    ND = "CAST(NULL AS DOUBLE)"
    method_vals = {"GET": "e % 100000", "POST": "u % 50000",
                   "PUT": "e % 9000"}
    code_vals = {"200": "e % 1000000", "404": "u % 10000",
                 "500": "e % 77"}
    rows = [("couchdb.average_request_time", "gauge", "FALSE", NS, NS,
             NS, NS, NI, "CAST(e % 8000 AS DOUBLE) / 16.0", "TRUE"),
            ("couchdb.httpd.bulk_requests", "sum", "TRUE", NS, NS, NS,
             NS, "e % 5000", ND, "TRUE")]
    for mth in _COUCHDB_METHODS:
        if mth in method_vals:
            rows.append(("couchdb.httpd.requests", "sum", "TRUE",
                         f"'{mth}'", NS, NS, NS, method_vals[mth], ND,
                         "TRUE"))
        elif mth == "DELETE":
            rows.append(("couchdb.httpd.requests", "sum", "TRUE",
                         "'DELETE'", NS, NS, NS,
                         "CASE WHEN e % 2 = 0 THEN u % 800 END", ND,
                         "e % 2 = 0"))
        else:  # HEAD (string value on e%5=0), OPTIONS, COPY: never ok
            rows.append(("couchdb.httpd.requests", "sum", "TRUE",
                         f"'{mth}'", NS, NS, NS, NI, ND, "FALSE"))
    for code in _COUCHDB_CODES:
        rows.append(("couchdb.httpd.responses", "sum", "TRUE", NS,
                     f"'{code}'", NS, NS,
                     code_vals.get(code, NI), ND,
                     "TRUE" if code in code_vals else "FALSE"))
    for view in _COUCHDB_VIEWS:
        if view == "view_reads":
            rows.append(("couchdb.httpd.views", "sum", "TRUE", NS, NS,
                         f"'{view}'", NS, "u % 4000", ND, "TRUE"))
        else:
            rows.append(("couchdb.httpd.views", "sum", "TRUE", NS, NS,
                         f"'{view}'", NS,
                         "CASE WHEN u % 3 <> 0 THEN e % 60 END", ND,
                         "u % 3 <> 0"))
    rows += [
        ("couchdb.database.open", "sum", "FALSE", NS, NS, NS, NS,
         "u % 200", ND, "TRUE"),
        ("couchdb.file_descriptor.open", "sum", "FALSE", NS, NS, NS, NS,
         "e % 3000", ND, "TRUE"),
        ("couchdb.database.operations", "sum", "TRUE", NS, NS, NS,
         "'reads'", "e % 400000", ND, "TRUE"),
        ("couchdb.database.operations", "sum", "TRUE", NS, NS, NS,
         "'writes'", "u % 300000", ND, "TRUE"),
    ]
    parts = []
    for i, (metric, kind, mono, mth, code, view, op, vi, vd, ok) in \
            enumerate(rows):
        a = (lambda n: f" AS {n}") if i == 0 else (lambda n: "")
        parts.append(
            f"SELECT event_id, 'http://localhost:5984'"
            f"{a('cd_node_name')}, '{metric}'{a('cd_metric')}, "
            f"'{kind}'{a('cd_kind')}, {mono}{a('cd_mono')}, "
            f"{mth}{a('cd_method')}, {code}{a('cd_code')}, "
            f"{view}{a('cd_view')}, {op}{a('cd_operation')}, "
            f"{vi}{a('cd_value')}, {vd}{a('cd_value_d')}, "
            f"{ok}{a('cd_ok')} FROM a"
        )
    return (
        "WITH a AS (SELECT event_id, user_id AS u, event_id AS e "
        "FROM events)\n" + "\nUNION ALL\n".join(parts)
    )


EXT16_QUERIES["couchdb_stats"] = q_couchdb
EXT16_ORACLES["couchdb_stats"] = _couchdb_oracle()


# ---------------------------------------------------------------------------
# docker container stats + inspect -> metric rows
# ---------------------------------------------------------------------------

_DOCKER_NOW_NS = 1704074400 * 10**9  # 2024-01-01T02:00:00Z


def q_docker(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dockerstats import docker_container_stats

    ev = load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    s = lambda c: c.cast("string")  # noqa: E731

    percpu = F.when(
        e % 2 == 0,
        F.concat(F.lit(',"percpu_usage":['), s(e % 1000), F.lit(","),
                 s(u % 1000), F.lit(","), s(e % 77), F.lit("]")),
    ).otherwise(F.lit(""))
    memstats = F.when(
        u % 2 == 0,
        F.concat(F.lit('"total_inactive_file":'), s(e % 400)),
    ).otherwise(F.concat(F.lit('"inactive_file":'), s(e % 300)))
    stats = F.concat(
        F.lit('{"cpu_stats":{"cpu_usage":{"total_usage":'),
        s(e % 100000 + e % 500),
        F.lit(',"usage_in_kernelmode":'), s(e % 3000),
        F.lit(',"usage_in_usermode":'), s(u % 3000), percpu,
        F.lit('},"system_cpu_usage":'), s(u % 1000000 + u % 5000),
        F.lit(',"online_cpus":'), s(u % 5),
        F.lit(',"throttling_data":{"periods":'), s(e % 50),
        F.lit(',"throttled_periods":'), s(u % 50),
        F.lit(',"throttled_time":'), s(e % 7777),
        F.lit('}},"precpu_stats":{"cpu_usage":{"total_usage":'),
        s(e % 100000), F.lit('},"system_cpu_usage":'), s(u % 1000000),
        F.lit('},"memory_stats":{"usage":'), s(e % 100000 + 500),
        F.lit(',"max_usage":'), s(e % 150000),
        F.lit(',"limit":'),
        F.when(e % 9 == 0, F.lit("0")).otherwise(s(u % 200000 + 1000)),
        F.lit(',"failcnt":'), s(u % 5),
        F.lit(',"stats":{'), memstats,
        F.lit(',"cache":'), s(e % 222),
        F.lit(',"rss":'), s(u % 888),
        F.lit(',"shmem":5}},"blkio_stats":{'),
        F.lit('"io_service_bytes_recursive":[{"major":8,"minor":0,'
              '"op":"Read","value":'), s(e % 5000),
        F.lit('},{"major":8,"minor":0,"op":"Write","value":'),
        s(u % 5000),
        F.lit('}],"io_serviced_recursive":[{"major":252,"minor":'),
        s(e % 3), F.lit(',"op":"Async","value":'), s(e % 600),
        F.lit('}]},"networks":{"eth0":{"rx_bytes":'), s(e % 1000000),
        F.lit(',"tx_bytes":'), s(u % 1000000),
        F.lit(',"rx_dropped":'), s(e % 10),
        F.lit(',"tx_dropped":'), s(u % 10),
        F.lit(',"rx_packets":'), s(e % 100000),
        F.lit(',"tx_packets":'), s(u % 100000),
        F.lit(',"rx_errors":'), s(e % 5),
        F.lit(',"tx_errors":'), s(u % 5),
        F.lit('}},"pids_stats":{"current":'), s(e % 20),
        F.lit(',"limit":'),
        F.when(u % 4 == 0, F.lit("0")).otherwise(s(u % 1000)),
        F.lit("}}"),
    )
    hostcfg = (
        F.when(u % 4 == 0, F.concat(
            F.lit('"NanoCpus":'), s((e % 8 + 1) * 500000000)))
        .when(u % 4 == 1, F.concat(
            F.lit('"CpusetCpus":"'),
            F.when(e % 13 == 0, F.lit("0,x-2"))
            .when(e % 2 == 0, F.lit("0,2-4")).otherwise(F.lit("1,3")),
            F.lit('"')))
        .when(u % 4 == 2, F.concat(
            F.lit('"CpuQuota":'), s(e % 50000 + 50000),
            F.lit(',"CpuPeriod":'),
            F.when(e % 3 == 0, F.lit("0")).otherwise(F.lit("200000"))))
        .otherwise(F.lit('"CpuQuota":0'))
    )
    started = F.when(e % 17 == 0, F.lit("bogus")).otherwise(
        F.concat(F.lit("2024-01-01T00:"), F.lpad(s(e % 60), 2, "0"),
                 F.lit(":00Z")),
    )
    container = F.concat(
        F.lit('{"Id":"c'), s(e), F.lit('","Name":"/cont'), s(e % 50),
        F.lit('","Image":"sha256:'), s(u),
        F.lit('","RestartCount":'), s(e % 6),
        F.lit(',"Config":{"Hostname":"h'), s(u % 6),
        F.lit('","Image":"img'), s(e % 9),
        F.lit('","Cmd":["run","--x'), s(u % 3),
        F.lit('"]},"State":{"StartedAt":"'), started,
        F.lit('"},"HostConfig":{"CpuShares":'), s(u % 1024),
        F.lit(","), hostcfg, F.lit("}}"),
    )
    out = docker_container_stats(
        ev.select("event_id", stats.alias("stats"),
                  container.alias("container")),
        now_ns=_DOCKER_NOW_NS,
    )
    return out.select(
        "event_id", "dk_container_id", "dk_container_name",
        "dk_hostname", "dk_image_name", "dk_image_id", "dk_command_line",
        "dk_metric", "dk_device_major", "dk_device_minor",
        "dk_operation", "dk_interface", "dk_core", "dk_value",
        "dk_value_d", "dk_ok",
    )


def _docker_oracle() -> str:
    NS = "CAST(NULL AS VARCHAR)"
    NI = "CAST(NULL AS BIGINT)"
    ND = "CAST(NULL AS DOUBLE)"
    total_usage = ("(e % 100000 + 500) - CASE WHEN u % 2 = 0 "
                   "THEN e % 400 ELSE e % 300 END")
    online = ("CASE WHEN u % 5 = 0 THEN "
              "CASE WHEN e % 2 = 0 THEN 3 ELSE 0 END ELSE u % 5 END")
    cpu_pct = (
        f"CASE WHEN e % 500 > 0 AND u % 5000 > 0 THEN "
        f"CAST(e % 500 AS DOUBLE) / CAST(u % 5000 AS DOUBLE) "
        f"* CAST({online} AS DOUBLE) * 100.0 ELSE 0.0 END"
    )
    mem_pct = (
        f"CASE WHEN e % 9 = 0 THEN 0.0 ELSE "
        f"CAST({total_usage} AS DOUBLE) "
        f"/ CAST(u % 200000 + 1000 AS DOUBLE) * 100.0 END"
    )
    uptime = ("CASE WHEN e % 17 <> 0 THEN "
              "CAST(7200 - 60 * (e % 60) AS DOUBLE) END")
    cpu_limit = (
        "CASE WHEN u % 4 = 0 THEN CAST((e % 8 + 1) AS DOUBLE) / 2.0 "
        "WHEN u % 4 = 1 AND e % 13 = 0 THEN CAST(NULL AS DOUBLE) "
        "WHEN u % 4 = 1 AND e % 2 = 0 THEN 4.0 "
        "WHEN u % 4 = 1 THEN 2.0 "
        "ELSE CAST(e % 50000 + 50000 AS DOUBLE) / "
        "CASE WHEN e % 3 = 0 THEN 100000.0 ELSE 200000.0 END END"
    )
    # metric, maj, min, op, iface, core, where, vi, vd, ok
    rows = [
        ("container.cpu.usage.system", NS, NS, NS, NS, NS, None,
         "u % 1000000 + u % 5000", ND, "TRUE"),
        ("container.cpu.usage.total", NS, NS, NS, NS, NS, None,
         "e % 100000 + e % 500", ND, "TRUE"),
        ("container.cpu.usage.kernelmode", NS, NS, NS, NS, NS, None,
         "e % 3000", ND, "TRUE"),
        ("container.cpu.usage.usermode", NS, NS, NS, NS, NS, None,
         "u % 3000", ND, "TRUE"),
        ("container.cpu.throttling_data.throttled_periods", NS, NS, NS,
         NS, NS, None, "u % 50", ND, "TRUE"),
        ("container.cpu.throttling_data.periods", NS, NS, NS, NS, NS,
         None, "e % 50", ND, "TRUE"),
        ("container.cpu.throttling_data.throttled_time", NS, NS, NS, NS,
         NS, None, "e % 7777", ND, "TRUE"),
        ("container.cpu.logical.count", NS, NS, NS, NS, NS, None,
         "u % 5", ND, "TRUE"),
        ("container.cpu.utilization", NS, NS, NS, NS, NS, None, NI,
         cpu_pct, "TRUE"),
        ("container.memory.usage.total", NS, NS, NS, NS, NS, None,
         total_usage, ND, "TRUE"),
        ("container.memory.usage.limit", NS, NS, NS, NS, NS, None,
         "CASE WHEN e % 9 = 0 THEN 0 ELSE u % 200000 + 1000 END", ND,
         "TRUE"),
        ("container.memory.percent", NS, NS, NS, NS, NS, None, NI,
         mem_pct, "TRUE"),
        ("container.memory.usage.max", NS, NS, NS, NS, NS, None,
         "e % 150000", ND, "TRUE"),
        ("container.memory.fails", NS, NS, NS, NS, NS, None, "u % 5",
         ND, "TRUE"),
        ("container.memory.total_inactive_file", NS, NS, NS, NS, NS,
         "u % 2 = 0", "e % 400", ND, "TRUE"),
        ("container.memory.inactive_file", NS, NS, NS, NS, NS,
         "u % 2 <> 0", "e % 300", ND, "TRUE"),
        ("container.memory.cache", NS, NS, NS, NS, NS, None, "e % 222",
         ND, "TRUE"),
        ("container.memory.rss", NS, NS, NS, NS, NS, None, "u % 888",
         ND, "TRUE"),
        ("container.pids.count", NS, NS, NS, NS, NS, "e % 20 <> 0",
         "e % 20", ND, "TRUE"),
        ("container.pids.limit", NS, NS, NS, NS, NS,
         "e % 20 <> 0 AND u % 4 <> 0", "u % 1000", ND, "TRUE"),
        ("container.uptime", NS, NS, NS, NS, NS, None, NI, uptime,
         "e % 17 <> 0"),
        ("container.cpu.shares", NS, NS, NS, NS, NS, None, "u % 1024",
         ND, "TRUE"),
        ("container.cpu.limit", NS, NS, NS, NS, NS,
         "u % 4 <> 3", NI, cpu_limit,
         "NOT (u % 4 = 1 AND e % 13 = 0)"),
        ("container.restarts", NS, NS, NS, NS, NS, None, "e % 6", ND,
         "TRUE"),
        ("container.blockio.io_service_bytes_recursive", "'8'", "'0'",
         "'read'", NS, NS, None, "e % 5000", ND, "TRUE"),
        ("container.blockio.io_service_bytes_recursive", "'8'", "'0'",
         "'write'", NS, NS, None, "u % 5000", ND, "TRUE"),
        ("container.blockio.io_serviced_recursive", "'252'",
         "CAST(e % 3 AS VARCHAR)", "'async'", NS, NS, None, "e % 600",
         ND, "TRUE"),
    ]
    for i in range(3):
        rows.append(("container.cpu.usage.percpu", NS, NS, NS, NS,
                     f"'cpu{i}'", "e % 2 = 0",
                     ["e % 1000", "u % 1000", "e % 77"][i], ND, "TRUE"))
    for field, metric in (
        ("e % 1000000", "rx_bytes"), ("u % 1000000", "tx_bytes"),
        ("e % 10", "rx_dropped"), ("u % 10", "tx_dropped"),
        ("e % 100000", "rx_packets"), ("u % 100000", "tx_packets"),
        ("e % 5", "rx_errors"), ("u % 5", "tx_errors"),
    ):
        rows.append((f"container.network.io.usage.{metric}", NS, NS,
                     NS, "'eth0'", NS, None, field, ND, "TRUE"))
    parts = []
    for i, (metric, mj, mn, op, ifc, core, where, vi, vd, ok) in \
            enumerate(rows):
        a = (lambda n: f" AS {n}") if i == 0 else (lambda n: "")
        w = f" WHERE {where}" if where else ""
        parts.append(
            f"SELECT event_id, 'c' || CAST(e AS VARCHAR)"
            f"{a('dk_container_id')}, "
            f"'cont' || CAST(e % 50 AS VARCHAR){a('dk_container_name')},"
            f" 'h' || CAST(u % 6 AS VARCHAR){a('dk_hostname')}, "
            f"'img' || CAST(e % 9 AS VARCHAR){a('dk_image_name')}, "
            f"'sha256:' || CAST(u AS VARCHAR){a('dk_image_id')}, "
            f"'run --x' || CAST(u % 3 AS VARCHAR){a('dk_command_line')},"
            f" '{metric}'{a('dk_metric')}, {mj}{a('dk_device_major')}, "
            f"{mn}{a('dk_device_minor')}, {op}{a('dk_operation')}, "
            f"{ifc}{a('dk_interface')}, {core}{a('dk_core')}, "
            f"{vi}{a('dk_value')}, {vd}{a('dk_value_d')}, "
            f"{ok}{a('dk_ok')} FROM a{w}"
        )
    return (
        "WITH a AS (SELECT event_id, user_id AS u, event_id AS e "
        "FROM events)\n" + "\nUNION ALL\n".join(parts)
    )


EXT16_QUERIES["docker_stats"] = q_docker
EXT16_ORACLES["docker_stats"] = _docker_oracle()


# ---------------------------------------------------------------------------
# mysql SHOW GLOBAL STATUS map -> metric rows
# ---------------------------------------------------------------------------


def q_mysql(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.receivers import _MYSQL_GLOBAL_STATS, mysql_global_status

    ev = load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    s = lambda c: c.cast("string")  # noqa: E731

    parts = [F.lit("{")]
    for i, (key, _, _) in enumerate(_MYSQL_GLOBAL_STATS):
        if i:
            parts.append(F.lit(","))
        parts.append(F.lit(f'"{key}":"'))
        if key == "Connections":
            parts.append(
                F.when(e % 13 == 0, F.lit("xx")).otherwise(
                    s((e * 31 + i * 97) % 100000))
            )
        elif key == "Innodb_buffer_pool_pages_misc":
            parts.append(
                F.when(e % 7 == 0, F.lit("oops")).otherwise(
                    s((e * 31 + i * 97) % 100000))
            )
        else:
            parts.append(s((e * 31 + i * 97) % 100000))
        parts.append(F.lit('"'))
    parts.append(F.concat(
        F.lit(',"Innodb_buffer_pool_pages_dirty":"'),
        F.when(e % 5 == 0, F.lit("bad")).otherwise(s(e % 3000)),
        F.lit('","Innodb_buffer_pool_bytes_dirty":"'), s(u % 4000),
        F.lit('","Innodb_buffer_pool_bytes_data":"'),
        s(u % 90000 + 100000),
        F.lit('","Some_unknown_var":"5"}'),
    ))
    body = F.concat(*parts)
    out = mysql_global_status(ev.select("event_id", body.alias("body")))
    return out.select("event_id", "my_metric", "my_attr", "my_value",
                      "my_ok")


def _mysql_oracle() -> str:
    from ..operators.receivers import _MYSQL_GLOBAL_STATS

    parts = []
    first = True
    for i, (key, metric, attrs) in enumerate(_MYSQL_GLOBAL_STATS):
        a = (lambda n: f" AS {n}") if first else (lambda n: "")
        first = False
        attr = f"'{attrs[0]}'" if attrs else "CAST(NULL AS VARCHAR)"
        vi = f"(e * 31 + {i} * 97) % 100000"
        ok, where = "TRUE", None
        if key == "Connections":
            vi = f"CASE WHEN e % 13 = 0 THEN NULL ELSE {vi} END"
            ok = "e % 13 <> 0"
        elif key == "Innodb_buffer_pool_pages_misc":
            where = "e % 7 <> 0"
        parts.append(
            f"SELECT event_id, '{metric}'{a('my_metric')}, "
            f"{attr}{a('my_attr')}, {vi}{a('my_value')}, "
            f"{ok}{a('my_ok')} FROM a"
            + (f" WHERE {where}" if where else "")
        )
    data_i = [i for i, (k, _, _) in enumerate(_MYSQL_GLOBAL_STATS)
              if k == "Innodb_buffer_pool_pages_data"][0]
    pages_data = f"(e * 31 + {data_i} * 97) % 100000"
    parts += [
        # data_pages: dirty row always (ok=false when 'bad'), clean
        # only when dirty parsed
        "SELECT event_id, 'mysql.buffer_pool.data_pages', 'dirty', "
        "CASE WHEN e % 5 = 0 THEN NULL ELSE e % 3000 END, e % 5 <> 0 "
        "FROM a",
        f"SELECT event_id, 'mysql.buffer_pool.data_pages', 'clean', "
        f"{pages_data} - e % 3000, TRUE FROM a WHERE e % 5 <> 0",
        "SELECT event_id, 'mysql.buffer_pool.usage', 'dirty', u % 4000, "
        "TRUE FROM a",
        "SELECT event_id, 'mysql.buffer_pool.usage', 'clean', "
        "u % 90000 + 100000 - u % 4000, TRUE FROM a",
    ]
    return (
        "WITH a AS (SELECT event_id, user_id AS u, event_id AS e "
        "FROM events)\n" + "\nUNION ALL\n".join(parts)
    )


EXT16_QUERIES["mysql_global_status"] = q_mysql
EXT16_ORACLES["mysql_global_status"] = _mysql_oracle()


# ---------------------------------------------------------------------------
# mongodb dbstats / serverstatus documents -> metric rows
# ---------------------------------------------------------------------------


def q_mongodb(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.receivers import mongodb_stats

    ev = load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    s = lambda c: c.cast("string")  # noqa: E731

    dbstats = F.concat(
        F.lit('{"collections":'), s(u % 100),
        F.lit(',"dataSize":'), s(e % 1000000000),
        F.lit(',"storageSize":'), s(e % 500000000),
        F.lit(',"objects":'), s(e % 1000000),
        F.when(u % 5 != 0,
               F.concat(F.lit(',"indexes":'), s(u % 50))
               ).otherwise(F.lit("")),
        F.lit(',"indexSize":'), s(e % 10000000),
        F.lit(',"numExtents":3}'),
    )
    serverstatus = F.concat(
        F.lit('{"connections":{"active":'), s(u % 100),
        F.lit(',"available":'), s(e % 1000),
        F.lit(',"current":'), s(u % 200),
        F.lit('},"mem":{"resident":'), s(e % 4096),
        F.lit(',"virtual":'), s(u % 8192),
        F.lit('},"metrics":{"document":{"inserted":'), s(e % 100000),
        F.lit(',"updated":'), s(u % 100000),
        F.lit(',"deleted":'), s(e % 5000), F.lit("}}}"),
    )
    engine = F.when(u % 6 == 0, F.lit("inMemory")).otherwise(
        F.lit("wiredTiger"))
    admin = F.concat(
        F.lit('{"storageEngine":{"name":"'), engine,
        F.lit('"},"wiredTiger":{"session":{"open session count":'),
        s(u % 300),
        F.lit('},"cache":{"bytes read into cache":'), s(e % 100000000),
        F.lit(',"pages read into cache":'), s(e % 10000),
        F.lit(',"pages requested from the cache":'),
        s(e % 10000 + u % 10000),
        F.lit('}},"opLatencies":{"reads":{"latency":'), s(e % 1000000),
        F.lit('},"writes":{"latency":'), s(u % 1000000),
        F.lit('},"commands":{"latency":'), s(e % 77777),
        F.lit('}},"opcounters":{"insert":'), s(e % 100000),
        F.lit(',"query":'), s(u % 100000),
        F.lit(',"update":'), s(e % 90000),
        F.lit(',"delete":'), s(u % 90000),
        F.lit(',"getmore":'), s(e % 80000),
        F.lit(',"command":'), s(u % 80000),
        F.lit('},"globalLock":{"totalTime":'), s(e % 1000000000),
        F.lit(',"activeClients":{"readers":'), s(u % 50),
        F.lit(',"writers":'), s(e % 50),
        F.lit('}},"extra_info":{"page_faults":'), s(e % 10000),
        F.lit('},"metrics":{"cursor":{"open":{"total":'), s(u % 500),
        F.lit('},"timedOut":'), s(e % 100),
        F.lit('}},"network":{"bytesIn":'), s(e % 1000000000),
        F.lit(',"bytesOut":'), s(u % 1000000000),
        F.lit(',"numRequests":'), s(e % 1000000),
        F.lit('},"uptimeMillis":'), s(e % 100000000),
        F.lit(',"ok":1}'),
    )
    kind = F.element_at(
        F.array(F.lit("dbstats"), F.lit("serverstatus"), F.lit("admin")),
        (e % 3 + 1).cast("int"),
    )
    body = (
        F.when(e % 3 == 0, dbstats)
        .when(e % 3 == 1, serverstatus).otherwise(admin)
    )
    db = F.concat(F.lit("db"), s(u % 4))
    out = mongodb_stats(ev.select(
        "event_id", kind.alias("kind"), body.alias("body"),
        db.alias("database"),
    ))
    return out.select("event_id", "kind", "database", "mb_metric",
                      "mb_attr", "mb_value", "mb_ok")


def _mongodb_oracle() -> str:
    NS = "CAST(NULL AS VARCHAR)"
    rows = [
        (0, "mongodb.collection.count", NS, "u % 100", "TRUE", None),
        (0, "mongodb.data.size", NS, "e % 1000000000", "TRUE", None),
        (0, "mongodb.storage.size", NS, "e % 500000000", "TRUE", None),
        (0, "mongodb.object.count", NS, "e % 1000000", "TRUE", None),
        (0, "mongodb.index.count", NS,
         "CASE WHEN u % 5 = 0 THEN NULL ELSE u % 50 END", "u % 5 <> 0",
         None),
        (0, "mongodb.index.size", NS, "e % 10000000", "TRUE", None),
        (1, "mongodb.connection.count", "'active'", "u % 100", "TRUE",
         None),
        (1, "mongodb.connection.count", "'available'", "e % 1000",
         "TRUE", None),
        (1, "mongodb.connection.count", "'current'", "u % 200", "TRUE",
         None),
        (1, "mongodb.memory.usage", "'resident'",
         "(e % 4096) * 1048576", "TRUE", None),
        (1, "mongodb.memory.usage", "'virtual'",
         "(u % 8192) * 1048576", "TRUE", None),
        (1, "mongodb.document.operation.count", "'insert'", "e % 100000",
         "TRUE", None),
        (1, "mongodb.document.operation.count", "'update'", "u % 100000",
         "TRUE", None),
        (1, "mongodb.document.operation.count", "'delete'", "e % 5000",
         "TRUE", None),
        (2, "mongodb.session.count", NS, "u % 300", "TRUE", "u % 6 <> 0"),
        (2, "mongodb.operation.latency.time", "'read'", "e % 1000000",
         "TRUE", None),
        (2, "mongodb.operation.latency.time", "'write'", "u % 1000000",
         "TRUE", None),
        (2, "mongodb.operation.latency.time", "'command'", "e % 77777",
         "TRUE", None),
        (2, "mongodb.operation.count", "'insert'", "e % 100000", "TRUE",
         None),
        (2, "mongodb.operation.count", "'query'", "u % 100000", "TRUE",
         None),
        (2, "mongodb.operation.count", "'update'", "e % 90000", "TRUE",
         None),
        (2, "mongodb.operation.count", "'delete'", "u % 90000", "TRUE",
         None),
        (2, "mongodb.operation.count", "'getmore'", "e % 80000", "TRUE",
         None),
        (2, "mongodb.operation.count", "'command'", "u % 80000", "TRUE",
         None),
        (2, "mongodb.active.writes", NS, "e % 50", "TRUE", None),
        (2, "mongodb.active.reads", NS, "u % 50", "TRUE", None),
        (2, "mongodb.wtcache.bytes.read", NS, "e % 100000000", "TRUE",
         None),
        (2, "mongodb.page_faults", NS, "e % 10000", "TRUE", None),
        (2, "mongodb.cache.operations", "'miss'", "e % 10000", "TRUE",
         "u % 6 <> 0"),
        (2, "mongodb.cache.operations", "'hit'", "u % 10000", "TRUE",
         "u % 6 <> 0"),
        (2, "mongodb.global_lock.time", NS,
         "(e % 1000000000) // 1000", "TRUE", None),
        (2, "mongodb.cursor.count", NS, "u % 500", "TRUE", None),
        (2, "mongodb.cursor.timeout.count", NS, "e % 100", "TRUE",
         None),
        (2, "mongodb.network.io.receive", NS, "e % 1000000000", "TRUE",
         None),
        (2, "mongodb.network.io.transmit", NS, "u % 1000000000", "TRUE",
         None),
        (2, "mongodb.network.request.count", NS, "e % 1000000", "TRUE",
         None),
        (2, "mongodb.uptime", NS, "e % 100000000", "TRUE", None),
        (2, "mongodb.health", NS, "1", "TRUE", None),
    ]
    kinds = ["dbstats", "serverstatus", "admin"]
    parts = []
    for i, (k, metric, attr, vi, ok, where) in enumerate(rows):
        a = (lambda n: f" AS {n}") if i == 0 else (lambda n: "")
        w = f"e % 3 = {k}" + (f" AND ({where})" if where else "")
        parts.append(
            f"SELECT event_id, '{kinds[k]}'{a('kind')}, "
            f"'db' || CAST(u % 4 AS VARCHAR){a('database')}, "
            f"'{metric}'{a('mb_metric')}, {attr}{a('mb_attr')}, "
            f"{vi}{a('mb_value')}, {ok}{a('mb_ok')} FROM a WHERE {w}"
        )
    return (
        "WITH a AS (SELECT event_id, user_id AS u, event_id AS e "
        "FROM events)\n" + "\nUNION ALL\n".join(parts)
    )


EXT16_QUERIES["mongodb_stats"] = q_mongodb
EXT16_ORACLES["mongodb_stats"] = _mongodb_oracle()


# ---------------------------------------------------------------------------
# elasticsearch /_nodes/stats -> metric rows
# ---------------------------------------------------------------------------


def _es_segments(path: str) -> list:
    return path.replace("['", ".").replace("']", "").split(".")


def _es_value_exprs():
    """Shared path -> SQL value expr map (u/e column aliases)."""
    from ..operators.elasticsearch import ES_NODE_SCALARS

    exprs = {}
    uniq = []
    for path, _, _, vt in ES_NODE_SCALARS:
        if path in exprs:
            continue
        i = len(uniq)
        uniq.append(path)
        if vt == "d":
            exprs[path] = f"CAST((e * 3 + {i} * 7) % 1600 AS DOUBLE) / 16.0"
        else:
            exprs[path] = f"(e * 7 + {i} * 131) % 99991"
    exprs["indices.store.total_data_set_size_in_bytes"] = "e % 77777"
    exprs["indexing_pressure.memory.limit_in_bytes"] = "u % 66666"
    exprs["process.cpu.percent"] = \
        "CASE WHEN e % 11 = 0 THEN -1 ELSE e % 101 END"
    exprs["process.cpu.total_in_millis"] = \
        "CASE WHEN e % 19 = 0 THEN -1 ELSE e % 100000 END"
    exprs["jvm.mem.heap_used_percent"] = "u % 101"
    exprs["fs.io_stats.total.read_kilobytes"] = "e % 55555"
    exprs["fs.io_stats.total.write_kilobytes"] = "u % 55555"
    return exprs

# fan fixtures: (map path, name, {field: sql})
_ES_FANS = (
    ("thread_pool", "search",
     {"threads": "e % 50 + 5", "active": "e % 5", "queue": "u % 20",
      "completed": "e % 10000", "rejected": "u % 100"}),
    ("thread_pool", "write",
     {"threads": "u % 40 + 4", "active": "u % 4", "queue": "e % 15",
      "completed": "u % 9000", "rejected": "e % 90"}),
    ("breakers", "fielddata",
     {"estimated_size_in_bytes": "e % 1000000",
      "limit_size_in_bytes": "1000000 + u % 1000000",
      "tripped": "e % 5"}),
    ("breakers", "request",
     {"estimated_size_in_bytes": "u % 1000000",
      "limit_size_in_bytes": "2000000", "tripped": "u % 7"}),
    ("discovery.cluster_state_update", "unchanged",
     {"count": "e % 1000", "computation_time_millis": "e % 50",
      "notification_time_millis": "u % 50",
      "context_construction_time_millis": "999"}),
    ("discovery.cluster_state_update", "success",
     {"count": "u % 1000", "computation_time_millis": "e % 60",
      "notification_time_millis": "u % 60",
      "context_construction_time_millis": "e % 70",
      "commit_time_millis": "u % 70",
      "completion_time_millis": "e % 80",
      "master_apply_time_millis": "u % 80"}),
    ("ingest.pipelines", "p1",
     {"count": "e % 5000", "failed": "e % 20", "current": "u % 10"}),
)


def q_elasticsearch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.elasticsearch import elasticsearch_node_stats

    ev = load(spark, sf_dir, "events").select(
        "event_id", F.col("user_id").alias("u"),
        F.col("event_id").alias("e"),
    )
    exprs = _es_value_exprs()

    tree: dict = {}
    for path, sql in exprs.items():
        node = tree
        segs = _es_segments(path)
        for seg in segs[:-1]:
            node = node.setdefault(seg, {})
        node[segs[-1]] = sql
    for map_path, name, fields in _ES_FANS:
        node = tree
        for seg in _es_segments(map_path):
            node = node.setdefault(seg, {})
        node[name] = dict(fields)

    def render(node) -> F.col:
        parts = [F.lit("{")]
        for i, (k, sub) in enumerate(node.items()):
            if i:
                parts.append(F.lit(","))
            parts.append(F.lit(f'"{k}":'))
            if isinstance(sub, dict):
                parts.append(render(sub))
            else:
                parts.append(F.expr(sub).cast("string"))
        parts.append(F.lit("}"))
        return F.concat(*parts)

    # io_stats present only when u % 3 <> 0 (the fs.io_stats pointer)
    fs_without = {k: v for k, v in tree["fs"].items() if k != "io_stats"}
    full_tree_without = dict(tree)
    full_tree_without["fs"] = fs_without
    body = F.when(F.col("u") % 3 == 0, render(full_tree_without)) \
        .otherwise(render(tree))

    out = elasticsearch_node_stats(
        ev.select("event_id", "u", "e", body.alias("body"))
            .select("event_id", "body"),
    )
    return out.select("event_id", "es_metric", "es_attr", "es_attr2",
                      "es_name", "es_value", "es_value_d")


def _elasticsearch_oracle() -> str:
    from ..operators.elasticsearch import ES_NODE_SCALARS

    exprs = _es_value_exprs()
    NS = "CAST(NULL AS VARCHAR)"
    NI = "CAST(NULL AS BIGINT)"
    ND = "CAST(NULL AS DOUBLE)"
    rows = []
    for path, metric, attr, vt in ES_NODE_SCALARS:
        a = f"'{attr}'" if attr else NS
        if vt == "d":
            rows.append((metric, a, NS, NS, NI, exprs[path], None))
        else:
            rows.append((metric, a, NS, NS, exprs[path], ND, None))
    rows += [
        ("elasticsearch.node.shards.data_set.size", NS, NS, NS,
         exprs["indices.store.total_data_set_size_in_bytes"], ND, None),
        ("elasticsearch.indexing_pressure.memory.limit", NS, NS, NS,
         exprs["indexing_pressure.memory.limit_in_bytes"], ND, None),
        ("elasticsearch.node.disk.io.read", NS, NS, NS,
         exprs["fs.io_stats.total.read_kilobytes"], ND, "u % 3 <> 0"),
        ("elasticsearch.node.disk.io.write", NS, NS, NS,
         exprs["fs.io_stats.total.write_kilobytes"], ND, "u % 3 <> 0"),
        ("elasticsearch.process.cpu.usage", NS, NS, NS, NI,
         "CAST(e % 101 AS DOUBLE) / 100.0", "e % 11 <> 0"),
        ("elasticsearch.process.cpu.time", NS, NS, NS, "e % 100000",
         ND, "e % 19 <> 0"),
        ("jvm.memory.heap.utilization", NS, NS, NS, NI,
         "CAST(u % 101 AS DOUBLE) / 100.0", None),
    ]
    for map_path, name, fields in _ES_FANS:
        nm = f"'{name}'"
        if map_path == "thread_pool":
            rows += [
                ("elasticsearch.node.thread_pool.threads", "'active'",
                 NS, nm, fields["active"], ND, None),
                ("elasticsearch.node.thread_pool.threads", "'idle'", NS,
                 nm, f"({fields['threads']}) - ({fields['active']})",
                 ND, None),
                ("elasticsearch.node.thread_pool.tasks.queued", NS, NS,
                 nm, fields["queue"], ND, None),
                ("elasticsearch.node.thread_pool.tasks.finished",
                 "'completed'", NS, nm, fields["completed"], ND, None),
                ("elasticsearch.node.thread_pool.tasks.finished",
                 "'rejected'", NS, nm, fields["rejected"], ND, None),
            ]
        elif map_path == "breakers":
            rows += [
                ("elasticsearch.breaker.memory.estimated", NS, NS, nm,
                 fields["estimated_size_in_bytes"], ND, None),
                ("elasticsearch.breaker.memory.limit", NS, NS, nm,
                 fields["limit_size_in_bytes"], ND, None),
                ("elasticsearch.breaker.tripped", NS, NS, nm,
                 fields["tripped"], ND, None),
            ]
        elif map_path == "discovery.cluster_state_update":
            rows += [
                ("elasticsearch.cluster.state_update.count", NS, NS,
                 nm, fields["count"], ND, None),
                ("elasticsearch.cluster.state_update.time",
                 "'computation'", NS, nm,
                 fields["computation_time_millis"], ND, None),
                ("elasticsearch.cluster.state_update.time",
                 "'notification'", NS, nm,
                 fields["notification_time_millis"], ND, None),
            ]
            if name != "unchanged":
                for attr, fld in (
                    ("context_construction",
                     "context_construction_time_millis"),
                    ("commit", "commit_time_millis"),
                    ("completion", "completion_time_millis"),
                    ("master_apply", "master_apply_time_millis"),
                ):
                    rows.append((
                        "elasticsearch.cluster.state_update.time",
                        f"'{attr}'", NS, nm, fields[fld], ND, None))
        else:  # ingest pipeline
            rows += [
                ("elasticsearch.node.pipeline.ingest.documents."
                 "preprocessed", NS, NS, nm, fields["count"], ND, None),
                ("elasticsearch.node.pipeline.ingest.operations."
                 "failed", NS, NS, nm, fields["failed"], ND, None),
                ("elasticsearch.node.pipeline.ingest.documents."
                 "current", NS, NS, nm, fields["current"], ND, None),
            ]
    parts = []
    for i, (metric, attr, attr2, nm, vi, vd, where) in enumerate(rows):
        a = (lambda n: f" AS {n}") if i == 0 else (lambda n: "")
        vi_s = vi if vi is not None else NI
        vd_s = vd if vd is not None else ND
        parts.append(
            f"SELECT event_id, '{metric}'{a('es_metric')}, "
            f"{attr}{a('es_attr')}, {attr2}{a('es_attr2')}, "
            f"{nm}{a('es_name')}, {vi_s}{a('es_value')}, "
            f"{vd_s}{a('es_value_d')} FROM a"
            + (f" WHERE {where}" if where else "")
        )
    return (
        "WITH a AS (SELECT event_id, user_id AS u, event_id AS e "
        "FROM events)\n" + "\nUNION ALL\n".join(parts)
    )


EXT16_QUERIES["elasticsearch_node_stats"] = q_elasticsearch
EXT16_ORACLES["elasticsearch_node_stats"] = _elasticsearch_oracle()


# ---------------------------------------------------------------------------
# elasticsearch cluster health/stats -> metric rows
# ---------------------------------------------------------------------------


def q_es_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.elasticsearch import elasticsearch_cluster_health

    ev = load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    s = lambda c: c.cast("string")  # noqa: E731
    status = F.element_at(
        F.array(F.lit("green"), F.lit("yellow"), F.lit("red"),
                F.lit("purple")),
        (e % 4 + 1).cast("int"),
    )
    health = F.concat(
        F.lit('{"cluster_name":"c1","status":"'), status,
        F.lit('","active_shards":'), s(e % 500),
        F.lit(',"active_primary_shards":'), s(u % 250),
        F.lit(',"relocating_shards":'), s(e % 5),
        F.lit(',"initializing_shards":'), s(u % 5),
        F.lit(',"unassigned_shards":'), s(e % 10),
        F.lit(',"delayed_unassigned_shards":'), s(u % 10),
        F.lit(',"number_of_nodes":'), s(u % 20 + 1),
        F.lit(',"number_of_data_nodes":'), s(u % 15 + 1),
        F.lit(',"number_of_pending_tasks":'), s(e % 8),
        F.lit(',"number_of_in_flight_fetch":'), s(u % 8), F.lit("}"),
    )
    stats = F.concat(
        F.lit('{"cluster_name":"c1","indices":{"fielddata":'
              '{"evictions":'), s(e % 100),
        F.lit('},"query_cache":{"evictions":'), s(u % 100),
        F.lit('}},"nodes":{"jvm":{"mem":{"heap_used_in_bytes":'),
        s(e % 100000000), F.lit("}}}}"),
    )
    kind = F.when(e % 2 == 0, F.lit("health")).otherwise(F.lit("stats"))
    body = F.when(e % 2 == 0, health).otherwise(stats)
    out = elasticsearch_cluster_health(ev.select(
        "event_id", kind.alias("kind"), body.alias("body"),
    ))
    return out.select("event_id", "kind", "es_metric", "es_attr",
                      "es_value", "es_ok")


O_ES_CLUSTER = """
WITH a AS (
  SELECT event_id, user_id AS u, event_id AS e,
         CASE CAST(event_id % 4 AS INT) WHEN 0 THEN 'green'
              WHEN 1 THEN 'yellow' WHEN 2 THEN 'red'
              ELSE 'purple' END AS st
  FROM events
), h AS (SELECT * FROM a WHERE e % 2 = 0),
   t AS (SELECT * FROM a WHERE e % 2 <> 0)
SELECT event_id, 'health' AS kind,
       'elasticsearch.cluster.nodes' AS es_metric,
       CAST(NULL AS VARCHAR) AS es_attr, u % 20 + 1 AS es_value,
       TRUE AS es_ok FROM h
UNION ALL SELECT event_id, 'health',
  'elasticsearch.cluster.data_nodes', NULL, u % 15 + 1, TRUE FROM h
UNION ALL SELECT event_id, 'health', 'elasticsearch.cluster.shards',
  'active', e % 500, TRUE FROM h
UNION ALL SELECT event_id, 'health', 'elasticsearch.cluster.shards',
  'initializing', u % 5, TRUE FROM h
UNION ALL SELECT event_id, 'health', 'elasticsearch.cluster.shards',
  'relocating', e % 5, TRUE FROM h
UNION ALL SELECT event_id, 'health', 'elasticsearch.cluster.shards',
  'unassigned', e % 10, TRUE FROM h
UNION ALL SELECT event_id, 'health', 'elasticsearch.cluster.shards',
  'active_primary', u % 250, TRUE FROM h
UNION ALL SELECT event_id, 'health', 'elasticsearch.cluster.shards',
  'unassigned_delayed', u % 10, TRUE FROM h
UNION ALL SELECT event_id, 'health',
  'elasticsearch.cluster.pending_tasks', NULL, e % 8, TRUE FROM h
UNION ALL SELECT event_id, 'health',
  'elasticsearch.cluster.in_flight_fetch', NULL, u % 8, TRUE FROM h
UNION ALL SELECT event_id, 'health', 'elasticsearch.cluster.health',
  'green', CASE WHEN st = 'green' THEN 1 ELSE 0 END, TRUE
  FROM h WHERE st <> 'purple'
UNION ALL SELECT event_id, 'health', 'elasticsearch.cluster.health',
  'yellow', CASE WHEN st = 'yellow' THEN 1 ELSE 0 END, TRUE
  FROM h WHERE st <> 'purple'
UNION ALL SELECT event_id, 'health', 'elasticsearch.cluster.health',
  'red', CASE WHEN st = 'red' THEN 1 ELSE 0 END, TRUE
  FROM h WHERE st <> 'purple'
UNION ALL SELECT event_id, 'health', 'elasticsearch.cluster.health',
  NULL, NULL, FALSE FROM h WHERE st = 'purple'
UNION ALL SELECT event_id, 'stats', 'jvm.memory.heap.used', NULL,
  e % 100000000, TRUE FROM t
UNION ALL SELECT event_id, 'stats',
  'elasticsearch.cluster.indices.cache.evictions', 'fielddata',
  e % 100, TRUE FROM t
UNION ALL SELECT event_id, 'stats',
  'elasticsearch.cluster.indices.cache.evictions', 'query', u % 100,
  TRUE FROM t
"""


EXT16_QUERIES["es_cluster_health"] = q_es_cluster
EXT16_ORACLES["es_cluster_health"] = O_ES_CLUSTER


# ---------------------------------------------------------------------------
# kubelet /stats/summary -> metric rows
# ---------------------------------------------------------------------------


def q_kubelet(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.kubeletstats import kubelet_stats_summary

    ev = load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    s = lambda c: c.cast("string")  # noqa: E731

    node = F.concat(
        F.lit('{"nodeName":"n'), s(u % 6), F.lit('","cpu":{'),
        F.when(e % 7 != 0, F.concat(
            F.lit('"usageNanoCores":'), s(e % 4000000000), F.lit(",")
        )).otherwise(F.lit("")),
        F.lit('"usageCoreNanoSeconds":'), s(e % 9000000000),
        F.lit('},"memory":{"availableBytes":'), s(u % 1000000),
        F.lit(',"usageBytes":'), s(e % 1000000),
        F.when(u % 2 != 0, F.concat(
            F.lit(',"rssBytes":'), s(u % 500000))).otherwise(F.lit("")),
        F.lit(',"workingSetBytes":'), s(e % 400000),
        F.lit(',"pageFaults":'), s(u % 1000),
        F.lit('},"fs":{"availableBytes":'), s(e % 800000),
        F.lit(',"capacityBytes":'), s(u % 800000 + 1000000),
        F.lit(',"usedBytes":'), s(e % 600000),
        F.lit('},"network":{"name":"eth0","rxBytes":'), s(e % 1000000),
        F.lit(',"txBytes":'), s(u % 1000000),
        F.lit(',"rxErrors":'), s(e % 100), F.lit("}}"),
    )
    sidecar = F.when(e % 3 == 0, F.concat(
        F.lit(',{"name":"sidecar","memory":{"usageBytes":'), s(u % 900),
        F.lit("}}"),
    )).otherwise(F.lit(""))
    volume = F.when(u % 5 == 0, F.concat(
        F.lit(',"volume":[{"name":"v0","availableBytes":'), s(e % 10),
        F.lit(',"capacityBytes":'), s(u % 10 + 10),
        F.lit(',"inodes":'), s(e % 1000),
        F.lit(',"inodesFree":'), s(u % 1000),
        F.lit(',"inodesUsed":'), s(e % 500), F.lit("}]"),
    )).otherwise(F.lit(""))
    pod = F.concat(
        F.lit('{"podRef":{"name":"pod'), s(e % 30),
        F.lit('","namespace":"ns'), s(u % 4),
        F.lit('","uid":"u-'), s(e),
        F.lit('"},"cpu":{"usageNanoCores":'), s(u % 3000000000),
        F.lit('},"memory":{"usageBytes":'), s(e % 700000),
        F.lit('},"ephemeral-storage":{"usedBytes":'), s(e % 300),
        F.lit('},"network":{"name":"eth0","rxBytes":'), s(e % 50),
        F.lit('},"containers":[{"name":"app","cpu":'
              '{"usageCoreNanoSeconds":'), s(e % 6000000000),
        F.lit('},"memory":{"workingSetBytes":'), s(u % 80000),
        F.lit('},"rootfs":{"capacityBytes":'), s(e % 4000),
        F.lit("}}"), sidecar, F.lit("]"), volume, F.lit("}"),
    )
    body = F.concat(F.lit('{"node":'), node, F.lit(',"pods":['), pod,
                    F.lit("]}"))
    out = kubelet_stats_summary(
        ev.select("event_id", body.alias("body")), include_volumes=True,
    )
    return out.select(
        "event_id", "ks_scope", "ks_node", "ks_pod_uid", "ks_pod",
        "ks_namespace", "ks_container", "ks_volume", "ks_metric",
        "ks_interface", "ks_direction", "ks_value", "ks_value_d",
    )


def _kubelet_oracle() -> str:
    NS = "CAST(NULL AS VARCHAR)"
    NI = "CAST(NULL AS BIGINT)"
    ND = "CAST(NULL AS DOUBLE)"
    # scope, container, volume, metric, iface, dir, where, vi, vd
    rows = [
        ("node", NS, NS, "k8s.node.cpu.usage", NS, NS, "e % 7 <> 0",
         NI, "CAST(e % 4000000000 AS DOUBLE) / 1e9"),
        ("node", NS, NS, "k8s.node.cpu.time", NS, NS, None, NI,
         "CAST(e % 9000000000 AS DOUBLE) / 1e9"),
        ("node", NS, NS, "k8s.node.memory.available", NS, NS, None,
         "u % 1000000", ND),
        ("node", NS, NS, "k8s.node.memory.usage", NS, NS, None,
         "e % 1000000", ND),
        ("node", NS, NS, "k8s.node.memory.rss", NS, NS, "u % 2 <> 0",
         "u % 500000", ND),
        ("node", NS, NS, "k8s.node.memory.working_set", NS, NS, None,
         "e % 400000", ND),
        ("node", NS, NS, "k8s.node.memory.page_faults", NS, NS, None,
         "u % 1000", ND),
        ("node", NS, NS, "k8s.node.filesystem.available", NS, NS, None,
         "e % 800000", ND),
        ("node", NS, NS, "k8s.node.filesystem.capacity", NS, NS, None,
         "u % 800000 + 1000000", ND),
        ("node", NS, NS, "k8s.node.filesystem.usage", NS, NS, None,
         "e % 600000", ND),
        ("node", NS, NS, "k8s.node.network.io", "'eth0'", "'receive'",
         None, "e % 1000000", ND),
        ("node", NS, NS, "k8s.node.network.io", "'eth0'", "'transmit'",
         None, "u % 1000000", ND),
        ("node", NS, NS, "k8s.node.network.errors", "'eth0'",
         "'receive'", None, "e % 100", ND),
        ("pod", NS, NS, "k8s.pod.cpu.usage", NS, NS, None, NI,
         "CAST(u % 3000000000 AS DOUBLE) / 1e9"),
        ("pod", NS, NS, "k8s.pod.memory.usage", NS, NS, None,
         "e % 700000", ND),
        ("pod", NS, NS, "k8s.pod.filesystem.usage", NS, NS, None,
         "e % 300", ND),
        ("pod", NS, NS, "k8s.pod.network.io", "'eth0'", "'receive'",
         None, "e % 50", ND),
        ("container", "'app'", NS, "container.cpu.time", NS, NS, None,
         NI, "CAST(e % 6000000000 AS DOUBLE) / 1e9"),
        ("container", "'app'", NS, "container.memory.working_set", NS,
         NS, None, "u % 80000", ND),
        ("container", "'app'", NS, "container.filesystem.capacity", NS,
         NS, None, "e % 4000", ND),
        ("container", "'sidecar'", NS, "container.memory.usage", NS,
         NS, "e % 3 = 0", "u % 900", ND),
        ("volume", NS, "'v0'", "k8s.volume.available", NS, NS,
         "u % 5 = 0", "e % 10", ND),
        ("volume", NS, "'v0'", "k8s.volume.capacity", NS, NS,
         "u % 5 = 0", "u % 10 + 10", ND),
        ("volume", NS, "'v0'", "k8s.volume.inodes", NS, NS,
         "u % 5 = 0", "e % 1000", ND),
        ("volume", NS, "'v0'", "k8s.volume.inodes.free", NS, NS,
         "u % 5 = 0", "u % 1000", ND),
        ("volume", NS, "'v0'", "k8s.volume.inodes.used", NS, NS,
         "u % 5 = 0", "e % 500", ND),
    ]
    parts = []
    for i, (scope, cont, vol, metric, iface, dr, where, vi, vd) in \
            enumerate(rows):
        a = (lambda n: f" AS {n}") if i == 0 else (lambda n: "")
        pod_cols = (
            "NULL, NULL, NULL" if scope == "node" else
            "'u-' || CAST(e AS VARCHAR), 'pod' || CAST(e % 30 AS "
            "VARCHAR), 'ns' || CAST(u % 4 AS VARCHAR)"
        )
        if i == 0:
            pod_cols = ("NULL AS ks_pod_uid, NULL AS ks_pod, "
                        "NULL AS ks_namespace")
        parts.append(
            f"SELECT event_id, '{scope}'{a('ks_scope')}, "
            f"'n' || CAST(u % 6 AS VARCHAR){a('ks_node')}, {pod_cols}, "
            f"{cont}{a('ks_container')}, {vol}{a('ks_volume')}, "
            f"'{metric}'{a('ks_metric')}, {iface}{a('ks_interface')}, "
            f"{dr}{a('ks_direction')}, {vi}{a('ks_value')}, "
            f"{vd}{a('ks_value_d')} FROM a"
            + (f" WHERE {where}" if where else "")
        )
    return (
        "WITH a AS (SELECT event_id, user_id AS u, event_id AS e "
        "FROM events)\n" + "\nUNION ALL\n".join(parts)
    )


EXT16_QUERIES["kubelet_stats"] = q_kubelet
EXT16_ORACLES["kubelet_stats"] = _kubelet_oracle()


# ---------------------------------------------------------------------------
# k8scluster pod/deployment objects -> metric rows
# ---------------------------------------------------------------------------


def q_k8scluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.k8scluster import k8s_cluster_metrics

    ev = load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    s = lambda c: c.cast("string")  # noqa: E731

    phase = F.element_at(
        F.array(*[F.lit(x) for x in
                  ("Pending", "Running", "Succeeded", "Failed",
                   "Unknown", "")]), (e % 6 + 1).cast("int"))
    reason = F.element_at(
        F.array(*[F.lit(x) for x in
                  ("", "Evicted", "NodeAffinity", "NodeLost",
                   "Shutdown", "UnexpectedAdmissionError",
                   "Whatever")]), (u % 7 + 1).cast("int"))
    state = F.element_at(
        F.array(F.lit('"running":{"startedAt":"2024-01-01T00:00:00Z"}'),
                F.lit('"waiting":{"reason":"ImagePullBackOff"}'),
                F.lit('"terminated":{"reason":"Completed"}')),
        (e % 3 + 1).cast("int"))
    noctr = F.when(u % 3 == 0, F.concat(
        F.lit(',{"name":"noctr","resources":{"requests":{"cpu":"'),
        s(u % 2000), F.lit('m"},"limits":{}}}'),
    )).otherwise(F.lit(""))
    pod = F.concat(
        F.lit('{"metadata":{"name":"p'), s(e % 40),
        F.lit('","namespace":"ns'), s(u % 4),
        F.lit('","uid":"u'), s(e),
        F.lit('"},"spec":{"nodeName":"n'), s(u % 6),
        F.lit('","containers":[{"name":"app","resources":'
              '{"requests":{"cpu":"'), s(e % 4000),
        F.lit('m","memory":"'), s(e % 512),
        F.lit('Mi"},"limits":{"cpu":"'), s(u % 8 + 1),
        F.lit('","memory":"'), s(u % 4),
        F.lit('Gi"}}}'), noctr,
        F.lit(']},"status":{"phase":"'), phase,
        F.lit('","reason":"'), reason,
        F.lit('","containerStatuses":[{"name":"app","image":"repo'),
        s(u % 5), F.lit(":v"), s(e % 9),
        F.lit('","containerID":"docker://id'), s(e),
        F.lit('","restartCount":'), s(e % 10),
        F.lit(',"ready":'),
        F.when(u % 2 == 0, F.lit("true")).otherwise(F.lit("false")),
        F.lit(',"state":{'), state, F.lit("}}]}}"),
    )
    dep = F.concat(
        F.lit('{"metadata":{"name":"d'), s(e % 25),
        F.lit('","namespace":"ns'), s(u % 4),
        F.lit('","uid":"du'), s(e),
        F.lit('"},"spec":{"replicas":'), s(u % 10),
        F.lit('},"status":{"availableReplicas":'), s(e % 10),
        F.lit("}}"),
    )
    kind = F.when(e % 4 == 3, F.lit("deployment")).otherwise(F.lit("pod"))
    body = F.when(e % 4 == 3, dep).otherwise(pod)
    out = k8s_cluster_metrics(ev.select(
        "event_id", kind.alias("kind"), body.alias("body"),
    ))
    return out.select(
        "event_id", "kc_pod_uid", "kc_pod", "kc_namespace", "kc_node",
        "kc_container", "kc_container_id", "kc_image", "kc_image_tag",
        "kc_deployment", "kc_deployment_uid", "kc_metric", "kc_state",
        "kc_value", "kc_value_d",
    )


def _k8scluster_oracle() -> str:
    NS = "CAST(NULL AS VARCHAR)"
    NI = "CAST(NULL AS BIGINT)"
    ND = "CAST(NULL AS DOUBLE)"
    phase_i = ("CASE CAST(e % 6 AS INT) WHEN 0 THEN 1 WHEN 1 THEN 2 "
               "WHEN 2 THEN 3 WHEN 3 THEN 4 ELSE 5 END")
    reason_i = ("CASE CAST(u % 7 AS INT) WHEN 1 THEN 1 WHEN 2 THEN 2 "
                "WHEN 3 THEN 3 WHEN 4 THEN 4 WHEN 5 THEN 5 ELSE 6 END")
    app = ("'app', 'id' || CAST(e AS VARCHAR), "
           "'repo' || CAST(u % 5 AS VARCHAR), "
           "'v' || CAST(e % 9 AS VARCHAR)")
    noc = "'noctr', '', '', ''"
    # container, cid/img/tag, metric, state, where, vi, vd
    rows = [
        (None, "k8s.pod.phase", NS, None, phase_i, ND),
        (None, "k8s.pod.status_reason", NS, None, reason_i, ND),
        ("app", "k8s.container.cpu_request", NS, None, NI,
         "CAST(e % 4000 AS DOUBLE) / 1000.0"),
        ("app", "k8s.container.memory_request", NS, None,
         "(e % 512) * 1048576", ND),
        ("app", "k8s.container.cpu_limit", NS, None, NI,
         "CAST(u % 8 + 1 AS DOUBLE)"),
        ("app", "k8s.container.memory_limit", NS, None,
         "(u % 4) * 1073741824", ND),
        ("app", "k8s.container.restarts", NS, None, "e % 10", ND),
        ("app", "k8s.container.ready", NS, None,
         "CASE WHEN u % 2 = 0 THEN 1 ELSE 0 END", ND),
        ("app", "k8s.container.status.state", "'running'", None,
         "CASE WHEN e % 3 = 0 THEN 1 ELSE 0 END", ND),
        ("app", "k8s.container.status.state", "'waiting'", None,
         "CASE WHEN e % 3 = 1 THEN 1 ELSE 0 END", ND),
        ("app", "k8s.container.status.state", "'terminated'", None,
         "CASE WHEN e % 3 = 2 THEN 1 ELSE 0 END", ND),
        ("noctr", "k8s.container.cpu_request", NS, "u % 3 = 0", NI,
         "CAST(u % 2000 AS DOUBLE) / 1000.0"),
    ]
    parts = []
    for i, (cont, metric, state, where, vi, vd) in enumerate(rows):
        a = (lambda n: f" AS {n}") if i == 0 else (lambda n: "")
        cc = NS + ", " + NS + ", " + NS + ", " + NS if cont is None \
            else (app if cont == "app" else noc)
        w = "e % 4 <> 3" + (f" AND ({where})" if where else "")
        parts.append(
            f"SELECT event_id, 'u' || CAST(e AS VARCHAR)"
            f"{a('kc_pod_uid')}, "
            f"'p' || CAST(e % 40 AS VARCHAR){a('kc_pod')}, "
            f"'ns' || CAST(u % 4 AS VARCHAR){a('kc_namespace')}, "
            f"'n' || CAST(u % 6 AS VARCHAR){a('kc_node')}, "
            + (f"{cc.split(', ')[0]}{a('kc_container')}, "
               f"{cc.split(', ')[1]}{a('kc_container_id')}, "
               f"{cc.split(', ')[2]}{a('kc_image')}, "
               f"{cc.split(', ')[3]}{a('kc_image_tag')}, ")
            + f"{NS}{a('kc_deployment')}, {NS}{a('kc_deployment_uid')}, "
            f"'{metric}'{a('kc_metric')}, {state or NS}{a('kc_state')}, "
            f"{vi}{a('kc_value')}, {vd}{a('kc_value_d')} FROM a WHERE {w}"
        )
    for metric, vi in (("k8s.deployment.desired", "u % 10"),
                       ("k8s.deployment.available", "e % 10")):
        parts.append(
            f"SELECT event_id, NULL, NULL, "
            f"'ns' || CAST(u % 4 AS VARCHAR), NULL, NULL, NULL, NULL, "
            f"NULL, 'd' || CAST(e % 25 AS VARCHAR), "
            f"'du' || CAST(e AS VARCHAR), '{metric}', NULL, {vi}, "
            f"CAST(NULL AS DOUBLE) FROM a WHERE e % 4 = 3"
        )
    return (
        "WITH a AS (SELECT event_id, user_id AS u, event_id AS e "
        "FROM events)\n" + "\nUNION ALL\n".join(parts)
    )


EXT16_QUERIES["k8s_cluster_metrics"] = q_k8scluster
EXT16_ORACLES["k8s_cluster_metrics"] = _k8scluster_oracle()


# ---------------------------------------------------------------------------
# k8scluster workload kinds -> metric rows
# ---------------------------------------------------------------------------


def q_k8s_workloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.k8scluster import k8s_cluster_workloads

    ev = load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    s = lambda c: c.cast("string")  # noqa: E731

    kinds = ("node", "statefulset", "daemonset", "replicaset",
             "namespace", "hpa", "job", "cronjob")
    kind = F.element_at(F.array(*[F.lit(k) for k in kinds]),
                        (e % 8 + 1).cast("int"))
    ready = F.element_at(
        F.array(F.lit("True"), F.lit("False"), F.lit("Unknown")),
        (u % 3 + 1).cast("int"))
    disk = F.when(e % 2 == 0, F.lit("True")).otherwise(F.lit("False"))
    meta = F.concat(
        F.lit('"metadata":{"name":"o'), s(e % 50),
        F.lit('","namespace":"ns'), s(u % 4),
        F.lit('","uid":"w'), s(e), F.lit('"}'),
    )
    bodies = {
        "node": F.concat(
            F.lit("{"), meta,
            F.lit(',"status":{"conditions":[{"type":"Ready","status":"'),
            ready,
            F.lit('"},{"type":"MemoryPressure","status":"False"},'
                  '{"type":"DiskPressure","status":"'), disk,
            F.lit('"}]}}'),
        ),
        "statefulset": F.concat(
            F.lit("{"), meta, F.lit(',"spec":{"replicas":'), s(u % 10),
            F.lit('},"status":{"readyReplicas":'), s(e % 10),
            F.lit(',"currentReplicas":'), s(u % 7),
            F.lit(',"updatedReplicas":'), s(e % 7), F.lit("}}"),
        ),
        "daemonset": F.concat(
            F.lit("{"), meta,
            F.lit(',"status":{"currentNumberScheduled":'), s(e % 20),
            F.lit(',"desiredNumberScheduled":'), s(e % 20 + 1),
            F.lit(',"numberMisscheduled":'), s(u % 3),
            F.lit(',"numberReady":'), s(u % 20), F.lit("}}"),
        ),
        "replicaset": F.concat(
            F.lit("{"), meta, F.lit(',"spec":{'),
            F.when(u % 2 == 0,
                   F.concat(F.lit('"replicas":'), s(u % 10))
                   ).otherwise(F.lit("")),
            F.lit('},"status":{"availableReplicas":'), s(e % 10),
            F.lit("}}"),
        ),
        "namespace": F.concat(
            F.lit("{"), meta, F.lit(',"status":{"phase":"'),
            F.element_at(F.array(F.lit("Active"), F.lit("Terminating"),
                                 F.lit("")), (e % 3 + 1).cast("int")),
            F.lit('"}}'),
        ),
        "hpa": F.concat(
            F.lit("{"), meta, F.lit(',"spec":{"minReplicas":'),
            s(u % 5 + 1), F.lit(',"maxReplicas":'), s(u % 5 + 5),
            F.lit('},"status":{"currentReplicas":'), s(e % 10),
            F.lit(',"desiredReplicas":'), s(u % 10), F.lit("}}"),
        ),
        "job": F.concat(
            F.lit("{"), meta, F.lit(',"spec":{'),
            F.when(e % 2 == 0,
                   F.concat(F.lit('"completions":'), s(e % 6), F.lit(","))
                   ).otherwise(F.lit("")),
            F.when(e % 3 == 0,
                   F.concat(F.lit('"parallelism":'), s(u % 6), F.lit(","))
                   ).otherwise(F.lit("")),
            F.lit('"x":1},"status":{"active":'), s(e % 5),
            F.lit(',"failed":'), s(u % 5),
            F.lit(',"succeeded":'), s(e % 9), F.lit("}}"),
        ),
        "cronjob": F.concat(
            F.lit("{"), meta, F.lit(',"status":{"active":['),
            F.array_join(F.transform(
                F.sequence(F.lit(1), (e % 4).cast("int")),
                lambda i: F.concat(F.lit('{"name":"a'),
                                   i.cast("string"), F.lit('"}')),
            ), ","),
            F.lit("]}}"),
        ),
    }
    body = F.lit(None).cast("string")
    for k in reversed(kinds):
        body = F.when(kind == k, bodies[k]).otherwise(body)
    out = k8s_cluster_workloads(ev.select(
        "event_id", kind.alias("kind"), body.alias("body"),
    ))
    return out.select("event_id", "kind", "kc_name", "kc_namespace",
                      "kc_uid", "kc_metric", "kc_condition", "kc_value")


def _k8s_workloads_oracle() -> str:
    NS = "CAST(NULL AS VARCHAR)"
    ready_i = ("CASE CAST(u % 3 AS INT) WHEN 0 THEN 1 WHEN 1 THEN 0 "
               "ELSE -1 END")
    disk_i = "CASE WHEN e % 2 = 0 THEN 1 ELSE 0 END"
    phase_i = ("CASE CAST(e % 3 AS INT) WHEN 0 THEN 1 WHEN 1 THEN 0 "
               "ELSE -1 END")
    # kind#, metric, condition, where, value
    rows = [
        (0, "k8s.node.condition", "'Ready'", None, ready_i),
        (0, "k8s.node.condition", "'MemoryPressure'", None, "0"),
        (0, "k8s.node.condition", "'DiskPressure'", None, disk_i),
        (1, "k8s.statefulset.desired_pods", NS, None, "u % 10"),
        (1, "k8s.statefulset.ready_pods", NS, None, "e % 10"),
        (1, "k8s.statefulset.current_pods", NS, None, "u % 7"),
        (1, "k8s.statefulset.updated_pods", NS, None, "e % 7"),
        (2, "k8s.daemonset.current_scheduled_nodes", NS, None,
         "e % 20"),
        (2, "k8s.daemonset.desired_scheduled_nodes", NS, None,
         "e % 20 + 1"),
        (2, "k8s.daemonset.misscheduled_nodes", NS, None, "u % 3"),
        (2, "k8s.daemonset.ready_nodes", NS, None, "u % 20"),
        (3, "k8s.replicaset.desired", NS, "u % 2 = 0", "u % 10"),
        (3, "k8s.replicaset.available", NS, "u % 2 = 0", "e % 10"),
        (4, "k8s.namespace.phase", NS, None, phase_i),
        (5, "k8s.hpa.max_replicas", NS, None, "u % 5 + 5"),
        (5, "k8s.hpa.min_replicas", NS, None, "u % 5 + 1"),
        (5, "k8s.hpa.current_replicas", NS, None, "e % 10"),
        (5, "k8s.hpa.desired_replicas", NS, None, "u % 10"),
        (6, "k8s.job.active_pods", NS, None, "e % 5"),
        (6, "k8s.job.failed_pods", NS, None, "u % 5"),
        (6, "k8s.job.successful_pods", NS, None, "e % 9"),
        (6, "k8s.job.desired_successful_pods", NS, "e % 2 = 0",
         "e % 6"),
        (6, "k8s.job.max_parallel_pods", NS, "e % 3 = 0", "u % 6"),
        (7, "k8s.cronjob.active_jobs", NS, None, "e % 4"),
    ]
    kinds = ("node", "statefulset", "daemonset", "replicaset",
             "namespace", "hpa", "job", "cronjob")
    parts = []
    for i, (k, metric, cond, where, vi) in enumerate(rows):
        a = (lambda n: f" AS {n}") if i == 0 else (lambda n: "")
        w = f"e % 8 = {k}" + (f" AND ({where})" if where else "")
        parts.append(
            f"SELECT event_id, '{kinds[k]}'{a('kind')}, "
            f"'o' || CAST(e % 50 AS VARCHAR){a('kc_name')}, "
            f"'ns' || CAST(u % 4 AS VARCHAR){a('kc_namespace')}, "
            f"'w' || CAST(e AS VARCHAR){a('kc_uid')}, "
            f"'{metric}'{a('kc_metric')}, {cond}{a('kc_condition')}, "
            f"{vi}{a('kc_value')} FROM a WHERE {w}"
        )
    return (
        "WITH a AS (SELECT event_id, user_id AS u, event_id AS e "
        "FROM events)\n" + "\nUNION ALL\n".join(parts)
    )


EXT16_QUERIES["k8s_workload_metrics"] = q_k8s_workloads
EXT16_ORACLES["k8s_workload_metrics"] = _k8s_workloads_oracle()


# ---------------------------------------------------------------------------
# ECS task metadata + docker stats -> metric rows
# ---------------------------------------------------------------------------


def q_ecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ecs import ecs_task_metrics

    ev = load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    s = lambda c: c.cast("string")  # noqa: E731

    c2 = F.when(e % 3 == 0, F.lit(
        ',{"DockerId":"d2","Name":"done",'
        '"StartedAt":"2024-01-01T00:00:00Z",'
        '"FinishedAt":"2024-01-01T00:02:30Z"}'
    )).otherwise(F.lit(',{"DockerId":"d2","Name":"idle"}'))
    task_limits = F.when(u % 2 == 0, F.concat(
        F.lit(',"Limits":{"CPU":'), s((u % 8 + 1) / 4.0),
        F.lit(',"Memory":'), s(u % 4096), F.lit("}"),
    )).otherwise(F.lit(""))
    c1_limits = F.when(u % 3 != 0, F.concat(
        F.lit(',"Limits":{"CPU":'), s(u % 512 + 1),
        F.lit(',"Memory":'), s(u % 1024), F.lit("}"),
    )).otherwise(F.lit(""))
    meta = F.concat(
        F.lit('{"Cluster":"arn:aws:ecs:us-west-2:1:cluster/cl'),
        s(u % 5),
        F.lit('","TaskARN":"arn:aws:ecs:us-west-2:1:task/cl'),
        s(u % 5), F.lit("/t"), s(e),
        F.lit('","Family":"fam'), s(u % 3),
        F.lit('","Containers":[{"DockerId":"d1","Name":"app"'),
        c1_limits, F.lit("}"), c2, F.lit("]"), task_limits, F.lit("}"),
    )
    percpu = F.when(e % 2 == 0, F.lit("[1,2,3]")).otherwise(F.lit("[1]"))
    stats = F.concat(
        F.lit('{"d1":{"id":"d1","read":"2024-01-01T10:00:'),
        F.lpad(s(e % 40 + 10), 2, "0"),
        F.lit('Z","preread":"2024-01-01T10:00:00Z",'
              '"memory_stats":{"usage":'), s((e % 1000 + 10) * 1048576),
        F.lit(',"max_usage":'), s((e % 1000 + 15) * 1048576),
        F.lit(',"limit":'), s((u % 2048) * 1048576),
        F.lit(',"stats":{"cache":'), s((e % 10) * 1048576),
        F.lit('}},"cpu_stats":{"cpu_usage":{"total_usage":'),
        s(e % 1000000000 + (e % 1000) * 1000000),
        F.lit(',"usage_in_kernelmode":'), s(e % 100000000),
        F.lit(',"usage_in_usermode":'), s(u % 100000000),
        F.lit(',"percpu_usage":'), percpu,
        F.lit('},"online_cpus":'), s(u % 16),
        F.lit(',"system_cpu_usage":'), s(e % 1000000000 + 5),
        F.lit('},"precpu_stats":{"cpu_usage":{"total_usage":'),
        s(e % 1000000000),
        F.lit('}},"networks":{"eth0":{"rx_bytes":'), s(e % 1000000),
        F.lit(',"tx_bytes":'), s(u % 1000000),
        F.lit(',"rx_packets":'), s(e % 10000),
        F.lit(',"tx_packets":'), s(u % 10000),
        F.lit(',"rx_errors":'), s(e % 5),
        F.lit(',"tx_errors":'), s(u % 5),
        F.lit(',"rx_dropped":'), s(e % 3),
        F.lit(',"tx_dropped":'), s(u % 3),
        F.lit('}},"network_rate_stats":{"rx_bytes_per_sec":'),
        s((e % 4000) / 16.0),
        F.lit(',"tx_bytes_per_sec":'), s((u % 4000) / 16.0),
        F.lit('},"blkio_stats":{"io_service_bytes_recursive":['
              '{"op":"Read","value":'), s(e % 50000),
        F.lit('},{"op":"Write","value":'), s(u % 50000),
        F.lit('},{"op":"Total","value":1}]}}}'),
    )
    out = ecs_task_metrics(ev.select(
        "event_id", meta.alias("metadata"), stats.alias("stats"),
    ))
    return out.select(
        "event_id", "ec_cluster", "ec_task_arn", "ec_task_id",
        "ec_family", "ec_scope", "ec_container", "ec_docker_id",
        "ec_metric", "ec_value", "ec_value_d",
    )


def _ecs_oracle() -> str:
    from ..operators.ecs import _ECS_FIELDS

    NI = "CAST(NULL AS BIGINT)"
    ND = "CAST(NULL AS DOUBLE)"
    vcpu = ("CAST((e % 1000) * 1000000 AS DOUBLE) "
            "/ CAST((e % 40 + 10) * 1000000000 AS DOUBLE)")
    cont_util = (
        f"CASE WHEN u % 3 <> 0 THEN ({vcpu}) * 100.0 "
        f"/ CAST(u % 512 + 1 AS DOUBLE) ELSE ({vcpu}) * 100.0 END"
    )
    task_util = (
        f"CASE WHEN u % 2 = 0 OR u % 3 <> 0 THEN ({vcpu}) * 1024.0 "
        f"ELSE ({vcpu}) * 100.0 END"
    )
    vals = {
        "mem_usage": ("(e % 1000 + 10) * 1048576", None),
        "mem_max": ("(e % 1000 + 15) * 1048576", None),
        "mem_limit": ("(u % 2048) * 1048576", None),
        "mem_utilized": ("e % 1000 + 10 - e % 10", None),
        "mem_reserved": ("CASE WHEN u % 3 <> 0 THEN u % 1024 ELSE 0 END",
                         "CASE WHEN u % 2 = 0 THEN u % 4096 WHEN "
                         "u % 3 <> 0 THEN u % 1024 ELSE 0 END"),
        "cpu_total": ("e % 1000000000 + (e % 1000) * 1000000", None),
        "cpu_kernel": ("e % 100000000", None),
        "cpu_user": ("u % 100000000", None),
        "cpu_cores": ("CASE WHEN e % 2 = 0 THEN 3 ELSE 1 END", None),
        "cpu_onlines": ("u % 16", None),
        "cpu_system": ("e % 1000000000 + 5", None),
        "cpu_utilized": (cont_util, task_util),
        "cpu_reserved": (
            "CASE WHEN u % 3 <> 0 THEN CAST(u % 512 + 1 AS DOUBLE) "
            "ELSE 0.0 END",
            "CASE WHEN u % 2 = 0 THEN CAST(u % 8 + 1 AS DOUBLE) / 4.0 "
            "* 1024.0 WHEN u % 3 <> 0 THEN CAST(u % 512 + 1 AS DOUBLE) "
            "ELSE 0.0 END"),
        "cpu_vcpu": (vcpu, None),
        "net_rate_rx": ("CAST(e % 4000 AS DOUBLE) / 16.0", None),
        "net_rate_tx": ("CAST(u % 4000 AS DOUBLE) / 16.0", None),
        "net_rx_bytes": ("e % 1000000", None),
        "net_rx_packets": ("e % 10000", None),
        "net_rx_errors": ("e % 5", None),
        "net_rx_dropped": ("e % 3", None),
        "net_tx_bytes": ("u % 1000000", None),
        "net_tx_packets": ("u % 10000", None),
        "net_tx_errors": ("u % 5", None),
        "net_tx_dropped": ("u % 3", None),
        "storage_read": ("e % 50000", None),
        "storage_write": ("u % 50000", None),
    }
    parts = []
    first = True
    for scope in ("container", "task"):
        prefix = "container." if scope == "container" else "ecs.task."
        cont = "'app'" if scope == "container" else "NULL"
        docker = "'d1'" if scope == "container" else "NULL"
        for field, suffix, vt in _ECS_FIELDS:
            cexpr, texpr = vals[field]
            expr = cexpr if scope == "container" or texpr is None \
                else texpr
            vi = expr if vt == "i" else NI
            vd = expr if vt == "d" else ND
            a = (lambda n: f" AS {n}") if first else (lambda n: "")
            first = False
            parts.append(
                f"SELECT event_id, 'cl' || CAST(u % 5 AS VARCHAR)"
                f"{a('ec_cluster')}, "
                f"'arn:aws:ecs:us-west-2:1:task/cl' || "
                f"CAST(u % 5 AS VARCHAR) || '/t' || CAST(e AS VARCHAR)"
                f"{a('ec_task_arn')}, "
                f"'t' || CAST(e AS VARCHAR){a('ec_task_id')}, "
                f"'fam' || CAST(u % 3 AS VARCHAR){a('ec_family')}, "
                f"'{scope}'{a('ec_scope')}, {cont}{a('ec_container')}, "
                f"{docker}{a('ec_docker_id')}, "
                f"'{prefix}{suffix}'{a('ec_metric')}, "
                f"{vi}{a('ec_value')}, {vd}{a('ec_value_d')} FROM a"
            )
    parts.append(
        "SELECT event_id, 'cl' || CAST(u % 5 AS VARCHAR), "
        "'arn:aws:ecs:us-west-2:1:task/cl' || CAST(u % 5 AS VARCHAR) "
        "|| '/t' || CAST(e AS VARCHAR), 't' || CAST(e AS VARCHAR), "
        "'fam' || CAST(u % 3 AS VARCHAR), 'container', 'done', 'd2', "
        "'container.duration', CAST(NULL AS BIGINT), 150.0 "
        "FROM a WHERE e % 3 = 0"
    )
    return (
        "WITH a AS (SELECT event_id, user_id AS u, event_id AS e "
        "FROM events)\n" + "\nUNION ALL\n".join(parts)
    )


EXT16_QUERIES["ecs_task_metrics"] = q_ecs
EXT16_ORACLES["ecs_task_metrics"] = _ecs_oracle()


# ---------------------------------------------------------------------------
# aerospike node/namespace info maps -> metric rows
# ---------------------------------------------------------------------------


def q_aerospike(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.receivers import (
        _AEROSPIKE_NAMESPACE,
        _AEROSPIKE_NODE,
        aerospike_info,
    )

    ev = load(spark, sf_dir, "events").select(
        "event_id", F.col("user_id").alias("u"),
        F.col("event_id").alias("e"),
    )
    is_node = F.col("e") % 2 == 0

    def body_for(table, extra):
        parts = [F.lit("{")]
        first = True
        for i, (key, _, _) in enumerate(table):
            if key in ("node", "name"):
                continue
            if not first:
                parts.append(F.lit(","))
            first = False
            parts.append(F.lit(f'"{key}":"'))
            if key == "query_tracked":
                parts.append(F.when(F.col("e") % 13 == 0, F.lit("x"))
                             .otherwise(F.expr(f"(e * 3 + {i} * 17) % 90000")
                                        .cast("string")))
            elif key == "client_read_success":
                # exercise the absent-key path
                parts.append(F.expr("e % 7777").cast("string"))
            else:
                parts.append(F.expr(f"(e * 3 + {i} * 17) % 90000")
                             .cast("string"))
            parts.append(F.lit('"'))
        parts.append(F.lit(extra))
        return F.concat(*parts)

    node_body = body_for(_AEROSPIKE_NODE,
                         ',"node":"BB9"}')
    ns_table = [r for r in _AEROSPIKE_NAMESPACE
                if r[0] != "client_write_timeout"]
    ns_body = body_for(ns_table, ',"node":"BB9","name":"nsA"}')
    body = F.when(is_node, node_body).otherwise(ns_body)
    kind = F.when(is_node, F.lit("node")).otherwise(F.lit("namespace"))
    out = aerospike_info(ev.select(
        "event_id", kind.alias("kind"), body.alias("body"),
    ))
    return out.select("event_id", "kind", "as_node", "as_namespace",
                      "as_metric", "as_a1", "as_a2", "as_a3",
                      "as_value", "as_ok")


def _aerospike_oracle() -> str:
    from ..operators.receivers import (
        _AEROSPIKE_NAMESPACE,
        _AEROSPIKE_NODE,
    )

    NS = "CAST(NULL AS VARCHAR)"
    parts = []
    first = True

    def sel(kind, nsname, key, metric, attrs, i, where_extra=None):
        nonlocal first
        a = (lambda n: f" AS {n}") if first else (lambda n: "")
        first = False
        al = list(attrs) + [None] * (3 - len(attrs))
        astr = [f"'{x}'" if x else NS for x in al]
        vi = f"(e * 3 + {i} * 17) % 90000"
        ok = "TRUE"
        if key == "query_tracked":
            vi = f"CASE WHEN e % 13 = 0 THEN NULL ELSE {vi} END"
            ok = "e % 13 <> 0"
        if key == "client_read_success":
            vi = "e % 7777"
        w = "e % 2 = 0" if kind == "node" else "e % 2 <> 0"
        if where_extra:
            w += f" AND ({where_extra})"
        return (
            f"SELECT event_id, '{kind}'{a('kind')}, 'BB9'{a('as_node')}, "
            f"{nsname}{a('as_namespace')}, '{metric}'{a('as_metric')}, "
            f"{astr[0]}{a('as_a1')}, {astr[1]}{a('as_a2')}, "
            f"{astr[2]}{a('as_a3')}, {vi}{a('as_value')}, "
            f"{ok}{a('as_ok')} FROM a WHERE {w}"
        )

    for i, (key, metric, attrs) in enumerate(_AEROSPIKE_NODE):
        parts.append(sel("node", NS, key, metric, attrs, i))
    for i, (key, metric, attrs) in enumerate(_AEROSPIKE_NAMESPACE):
        if key == "client_write_timeout":
            continue  # omitted from the fixture -> no row
        parts.append(sel("namespace", "'nsA'", key, metric, attrs, i))
    return (
        "WITH a AS (SELECT event_id, user_id AS u, event_id AS e "
        "FROM events)\n" + "\nUNION ALL\n".join(parts)
    )


EXT16_QUERIES["aerospike_info"] = q_aerospike
EXT16_ORACLES["aerospike_info"] = _aerospike_oracle()


# ---------------------------------------------------------------------------
# podman container stats -> metric rows
# ---------------------------------------------------------------------------


def q_podman(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.receivers import podman_stats

    ev = load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    s = lambda c: c.cast("string")  # noqa: E731
    percpu = F.when(e % 2 == 0, F.concat(
        F.lit(',"PerCPU":['), s(e % 10000000000), F.lit(","),
        s(u % 10000000000), F.lit("]"),
    )).otherwise(F.lit(""))
    body = F.concat(
        F.lit('{"ContainerID":"c'), s(e),
        F.lit('","Name":"cont'), s(e % 40),
        F.lit('","CPU":'), s((e % 10000) / 16.0),
        F.lit(',"CPUNano":'), s(e % 100000000000),
        F.lit(',"CPUSystemNano":'), s(u % 100000000000),
        F.lit(',"MemUsage":'), s(e % 8000000),
        F.lit(',"MemLimit":'), s(u % 8000000 + 1000000),
        F.lit(',"MemPerc":'), s((u % 1600) / 16.0),
        F.lit(',"NetInput":'), s(e % 700000),
        F.lit(',"NetOutput":'), s(u % 700000),
        F.lit(',"BlockInput":'), s(e % 600000),
        F.lit(',"BlockOutput":'), s(u % 600000),
        percpu, F.lit("}"),
    )
    out = podman_stats(
        ev.select("event_id", body.alias("body"), F.lit("img").alias("image"))
    )
    return out.select("event_id", "pm_runtime", "pm_name",
                      "pm_container_id", "pm_metric", "pm_core",
                      "pm_value", "pm_value_d")


O_PODMAN = """
WITH a AS (
  SELECT event_id, user_id AS u, event_id AS e FROM events
), m(metric, core, vi, vd) AS (SELECT NULL, NULL, NULL, NULL WHERE 1=0)
SELECT event_id, 'podman' AS pm_runtime,
       'cont' || CAST(e % 40 AS VARCHAR) AS pm_name,
       'c' || CAST(e AS VARCHAR) AS pm_container_id,
       'container.cpu.usage.system' AS pm_metric,
       CAST(NULL AS VARCHAR) AS pm_core,
       (u % 100000000000) // 1000000000 AS pm_value,
       CAST(NULL AS DOUBLE) AS pm_value_d
FROM a
UNION ALL SELECT event_id, 'podman', 'cont' || CAST(e % 40 AS VARCHAR),
  'c' || CAST(e AS VARCHAR), 'container.cpu.usage.total', NULL,
  (e % 100000000000) // 1000000000, NULL FROM a
UNION ALL SELECT event_id, 'podman', 'cont' || CAST(e % 40 AS VARCHAR),
  'c' || CAST(e AS VARCHAR), 'container.cpu.percent', NULL, NULL,
  CAST(e % 10000 AS DOUBLE) / 16.0 FROM a
UNION ALL SELECT event_id, 'podman', 'cont' || CAST(e % 40 AS VARCHAR),
  'c' || CAST(e AS VARCHAR), 'container.network.io.usage.rx_bytes',
  NULL, u % 700000, NULL FROM a
UNION ALL SELECT event_id, 'podman', 'cont' || CAST(e % 40 AS VARCHAR),
  'c' || CAST(e AS VARCHAR), 'container.network.io.usage.tx_bytes',
  NULL, e % 700000, NULL FROM a
UNION ALL SELECT event_id, 'podman', 'cont' || CAST(e % 40 AS VARCHAR),
  'c' || CAST(e AS VARCHAR), 'container.memory.usage.total', NULL,
  e % 8000000, NULL FROM a
UNION ALL SELECT event_id, 'podman', 'cont' || CAST(e % 40 AS VARCHAR),
  'c' || CAST(e AS VARCHAR), 'container.memory.usage.limit', NULL,
  u % 8000000 + 1000000, NULL FROM a
UNION ALL SELECT event_id, 'podman', 'cont' || CAST(e % 40 AS VARCHAR),
  'c' || CAST(e AS VARCHAR), 'container.memory.percent', NULL, NULL,
  CAST(u % 1600 AS DOUBLE) / 16.0 FROM a
UNION ALL SELECT event_id, 'podman', 'cont' || CAST(e % 40 AS VARCHAR),
  'c' || CAST(e AS VARCHAR),
  'container.blockio.io_service_bytes_recursive.read', NULL,
  e % 600000, NULL FROM a
UNION ALL SELECT event_id, 'podman', 'cont' || CAST(e % 40 AS VARCHAR),
  'c' || CAST(e AS VARCHAR),
  'container.blockio.io_service_bytes_recursive.write', NULL,
  u % 600000, NULL FROM a
UNION ALL SELECT event_id, 'podman', 'cont' || CAST(e % 40 AS VARCHAR),
  'c' || CAST(e AS VARCHAR), 'container.cpu.usage.percpu', 'cpu0',
  (e % 10000000000) // 1000000000, NULL FROM a WHERE e % 2 = 0
UNION ALL SELECT event_id, 'podman', 'cont' || CAST(e % 40 AS VARCHAR),
  'c' || CAST(e AS VARCHAR), 'container.cpu.usage.percpu', 'cpu1',
  (u % 10000000000) // 1000000000, NULL FROM a WHERE e % 2 = 0
"""


EXT16_QUERIES["podman_stats"] = q_podman
EXT16_ORACLES["podman_stats"] = O_PODMAN


# ---------------------------------------------------------------------------
# nsxt interface/node status -> metric rows
# ---------------------------------------------------------------------------


def q_nsxt(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.receivers import nsxt_stats

    ev = load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    s = lambda c: c.cast("string")  # noqa: E731
    iface = F.concat(
        F.lit('{"interface_id":"eth'), s(e % 4),
        F.lit('","node_name":"n'), s(u % 6),
        F.lit('","node_type":"TransportNode","node_id":"id'), s(u % 9),
        F.lit('","rx_bytes":'), s(e % 1000000),
        F.lit(',"rx_packets":'), s(e % 10000 + 100),
        F.lit(',"rx_dropped":'), s(e % 50),
        F.lit(',"rx_errors":'), s(u % 50),
        F.lit(',"tx_bytes":'), s(u % 1000000),
        F.lit(',"tx_packets":'), s(u % 10000 + 100),
        F.lit(',"tx_dropped":'), s(u % 40),
        F.lit(',"tx_errors":'), s(e % 40), F.lit("}"),
    )
    node = F.concat(
        F.lit('{"node_name":"n'), s(u % 6),
        F.lit('","node_type":"manager","node_id":"id'), s(u % 9),
        F.lit('","system_status":{"cpu_usage":'
              '{"avg_cpu_core_usage_dpdk":'), s((e % 1600) / 16.0),
        F.lit(',"avg_cpu_core_usage_non_dpdk":'), s((u % 1600) / 16.0),
        F.lit('},"mem_used":'), s(e % 9000000),
        F.lit(',"mem_cache":'), s(u % 9000000),
        F.lit(',"disk_space_used":'), s(e % 500000),
        F.lit(',"disk_space_total":'),
        F.when(e % 11 == 0, F.lit("0")).otherwise(s(e % 500000 + 600000)),
        F.lit("}}"),
    )
    kind = F.when(e % 2 == 0, F.lit("interface")).otherwise(F.lit("node"))
    body = F.when(e % 2 == 0, iface).otherwise(node)
    out = nsxt_stats(ev.select(
        "event_id", kind.alias("kind"), body.alias("body"),
    ))
    return out.select(
        "event_id", "nx_device_id", "nx_node_name", "nx_node_type",
        "nx_node_id", "nx_metric", "nx_direction", "nx_packet_type",
        "nx_disk_state", "nx_class", "nx_value", "nx_value_d",
    )


O_NSXT = """
WITH a AS (
  SELECT event_id, user_id AS u, event_id AS e FROM events
), i AS (SELECT * FROM a WHERE e % 2 = 0),
   n AS (SELECT * FROM a WHERE e % 2 <> 0)
SELECT event_id, 'eth' || CAST(e % 4 AS VARCHAR) AS nx_device_id,
  'n' || CAST(u % 6 AS VARCHAR) AS nx_node_name,
  'TransportNode' AS nx_node_type,
  'id' || CAST(u % 9 AS VARCHAR) AS nx_node_id,
  'nsxt.node.network.packet.count' AS nx_metric,
  'received' AS nx_direction, 'dropped' AS nx_packet_type,
  CAST(NULL AS VARCHAR) AS nx_disk_state,
  CAST(NULL AS VARCHAR) AS nx_class, e % 50 AS nx_value,
  CAST(NULL AS DOUBLE) AS nx_value_d FROM i
UNION ALL SELECT event_id, 'eth' || CAST(e % 4 AS VARCHAR),
  'n' || CAST(u % 6 AS VARCHAR), 'TransportNode',
  'id' || CAST(u % 9 AS VARCHAR), 'nsxt.node.network.packet.count',
  'received', 'errored', NULL, NULL, u % 50, NULL FROM i
UNION ALL SELECT event_id, 'eth' || CAST(e % 4 AS VARCHAR),
  'n' || CAST(u % 6 AS VARCHAR), 'TransportNode',
  'id' || CAST(u % 9 AS VARCHAR), 'nsxt.node.network.packet.count',
  'received', 'success', NULL, NULL,
  e % 10000 + 100 - e % 50 - u % 50, NULL FROM i
UNION ALL SELECT event_id, 'eth' || CAST(e % 4 AS VARCHAR),
  'n' || CAST(u % 6 AS VARCHAR), 'TransportNode',
  'id' || CAST(u % 9 AS VARCHAR), 'nsxt.node.network.packet.count',
  'transmitted', 'dropped', NULL, NULL, u % 40, NULL FROM i
UNION ALL SELECT event_id, 'eth' || CAST(e % 4 AS VARCHAR),
  'n' || CAST(u % 6 AS VARCHAR), 'TransportNode',
  'id' || CAST(u % 9 AS VARCHAR), 'nsxt.node.network.packet.count',
  'transmitted', 'errored', NULL, NULL, e % 40, NULL FROM i
UNION ALL SELECT event_id, 'eth' || CAST(e % 4 AS VARCHAR),
  'n' || CAST(u % 6 AS VARCHAR), 'TransportNode',
  'id' || CAST(u % 9 AS VARCHAR), 'nsxt.node.network.packet.count',
  'transmitted', 'success', NULL, NULL,
  u % 10000 + 100 - u % 40 - e % 40, NULL FROM i
UNION ALL SELECT event_id, 'eth' || CAST(e % 4 AS VARCHAR),
  'n' || CAST(u % 6 AS VARCHAR), 'TransportNode',
  'id' || CAST(u % 9 AS VARCHAR), 'nsxt.node.network.io', 'received',
  NULL, NULL, NULL, e % 1000000, NULL FROM i
UNION ALL SELECT event_id, 'eth' || CAST(e % 4 AS VARCHAR),
  'n' || CAST(u % 6 AS VARCHAR), 'TransportNode',
  'id' || CAST(u % 9 AS VARCHAR), 'nsxt.node.network.io',
  'transmitted', NULL, NULL, NULL, u % 1000000, NULL FROM i
UNION ALL SELECT event_id, NULL, 'n' || CAST(u % 6 AS VARCHAR),
  'manager', 'id' || CAST(u % 9 AS VARCHAR),
  'nsxt.node.cpu.utilization', NULL, NULL, NULL, 'datapath', NULL,
  CAST(e % 1600 AS DOUBLE) / 16.0 FROM n
UNION ALL SELECT event_id, NULL, 'n' || CAST(u % 6 AS VARCHAR),
  'manager', 'id' || CAST(u % 9 AS VARCHAR),
  'nsxt.node.cpu.utilization', NULL, NULL, NULL, 'services', NULL,
  CAST(u % 1600 AS DOUBLE) / 16.0 FROM n
UNION ALL SELECT event_id, NULL, 'n' || CAST(u % 6 AS VARCHAR),
  'manager', 'id' || CAST(u % 9 AS VARCHAR), 'nsxt.node.memory.usage',
  NULL, NULL, NULL, NULL, e % 9000000, NULL FROM n
UNION ALL SELECT event_id, NULL, 'n' || CAST(u % 6 AS VARCHAR),
  'manager', 'id' || CAST(u % 9 AS VARCHAR),
  'nsxt.node.memory.cache.usage', NULL, NULL, NULL, NULL,
  u % 9000000, NULL FROM n
UNION ALL SELECT event_id, NULL, 'n' || CAST(u % 6 AS VARCHAR),
  'manager', 'id' || CAST(u % 9 AS VARCHAR),
  'nsxt.node.filesystem.usage', NULL, NULL, 'used', NULL, e % 500000,
  NULL FROM n
UNION ALL SELECT event_id, NULL, 'n' || CAST(u % 6 AS VARCHAR),
  'manager', 'id' || CAST(u % 9 AS VARCHAR),
  'nsxt.node.filesystem.usage', NULL, NULL, 'available', NULL,
  CASE WHEN e % 11 = 0 THEN 0 - e % 500000
       ELSE e % 500000 + 600000 - e % 500000 END, NULL FROM n
UNION ALL SELECT event_id, NULL, 'n' || CAST(u % 6 AS VARCHAR),
  'manager', 'id' || CAST(u % 9 AS VARCHAR),
  'nsxt.node.filesystem.utilization', NULL, NULL, NULL, NULL, NULL,
  CAST(e % 500000 AS DOUBLE)
  / CASE WHEN e % 11 = 0 THEN 1.0
         ELSE GREATEST(CAST(e % 500000 + 600000 AS DOUBLE), 1.0) END
  FROM n
"""


EXT16_QUERIES["nsxt_stats"] = q_nsxt
EXT16_ORACLES["nsxt_stats"] = O_NSXT


# ---------------------------------------------------------------------------
# bigip nestedStats entries -> metric rows
# ---------------------------------------------------------------------------


def q_bigip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.receivers import bigip_stats

    ev = load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    s = lambda c: c.cast("string")  # noqa: E731

    kinds = ("virtual_server", "pool", "pool_member", "node")
    kind = F.element_at(F.array(*[F.lit(k) for k in kinds]),
                        (e % 4 + 1).cast("int"))
    side = F.when(e % 4 == 0, F.lit("clientside")).otherwise(
        F.lit("serverside"))
    avail = F.element_at(
        F.array(F.lit("available"), F.lit("offline"),
                F.lit("available (checked)"), F.lit("unknown-state")),
        (u % 4 + 1).cast("int"))
    en = F.when(u % 3 == 0, F.lit("disabled")).otherwise(
        F.lit("enabled"))
    vv = lambda n: F.concat(  # noqa: E731
        F.lit('{"value":'), n, F.lit("}"))
    body = F.concat(
        F.lit('{"tmName":{"description":"obj'), s(e % 30),
        F.lit('"},"nodeName":{"description":"obj'), s(e % 30),
        F.lit('"},"addr":{"description":"10.0.0.'), s(u % 200),
        F.lit('"},"port":{"value":'), s(e % 9000 + 80),
        F.lit('},"poolName":{"description":"pool'), s(u % 8),
        F.lit('"},"'), side, F.lit('.bitsIn":'), vv(s(e % 900000)),
        F.lit(',"'), side, F.lit('.bitsOut":'), vv(s(u % 900000)),
        F.lit(',"'), side, F.lit('.curConns":'), vv(s(e % 500)),
        F.lit(',"'), side, F.lit('.pktsIn":'), vv(s(e % 80000)),
        F.lit(',"'), side, F.lit('.pktsOut":'), vv(s(u % 80000)),
        F.lit(',"totRequests":'), vv(s(e % 70000)),
        F.lit(',"curSessions":'), vv(s(u % 400)),
        F.lit(',"memberCnt":'), vv(s(u % 20 + 5)),
        F.lit(',"activeMemberCnt":'), vv(s(u % 5)),
        F.lit(',"status.availabilityState":{"description":"'), avail,
        F.lit('"},"status.enabledState":{"description":"'), en,
        F.lit('"}}'),
    )
    out = bigip_stats(ev.select(
        "event_id", kind.alias("kind"), body.alias("body"),
    ))
    return out.select("event_id", "kind", "bp_name", "bp_ip", "bp_pool",
                      "bp_metric", "bp_attr", "bp_value")


def _bigip_oracle() -> str:
    from ..operators.receivers import _BIGIP_KINDS

    NS = "CAST(NULL AS VARCHAR)"
    kinds = ("virtual_server", "pool", "pool_member", "node")
    is_avail = "u % 4 = 0 OR u % 4 = 2"
    is_off = "u % 4 = 1"
    parts = []
    first = True
    for ki, k in enumerate(kinds):
        prefix, _, has_sessions, has_members = _BIGIP_KINDS[k]
        name = ("'obj' || CAST(e % 30 AS VARCHAR) || ':' || "
                "CAST(e % 9000 + 80 AS VARCHAR)"
                if k == "pool_member"
                else "'obj' || CAST(e % 30 AS VARCHAR)")
        ip = ("'10.0.0.' || CAST(u % 200 AS VARCHAR)"
              if k in ("pool_member", "node") else NS)
        pool = ("'pool' || CAST(u % 8 AS VARCHAR)"
                if k in ("pool_member", "virtual_server") else NS)
        rows = [
            ("data.transmitted", "'received'", "e % 900000"),
            ("data.transmitted", "'sent'", "u % 900000"),
            ("connection.count", NS, "e % 500"),
            ("packet.count", "'received'", "e % 80000"),
            ("packet.count", "'sent'", "u % 80000"),
            ("request.count", NS, "e % 70000"),
        ]
        if has_sessions:
            rows.append(("session.count", NS, "u % 400"))
        if has_members:
            rows.append(("member.count", "'active'", "u % 5"))
            rows.append(("member.count", "'inactive'",
                         "u % 20 + 5 - u % 5"))
        rows += [
            ("availability", "'offline'",
             f"CASE WHEN {is_off} THEN 1 ELSE 0 END"),
            ("availability", "'unknown'",
             f"CASE WHEN NOT ({is_avail}) AND NOT ({is_off}) "
             f"THEN 1 ELSE 0 END"),
            ("availability", "'available'",
             f"CASE WHEN {is_avail} THEN 1 ELSE 0 END"),
            ("enabled", "'disabled'",
             "CASE WHEN u % 3 = 0 THEN 1 ELSE 0 END"),
            ("enabled", "'enabled'",
             "CASE WHEN u % 3 = 0 THEN 0 ELSE 1 END"),
        ]
        for suffix, attr, vi in rows:
            a = (lambda n: f" AS {n}") if first else (lambda n: "")
            first = False
            parts.append(
                f"SELECT event_id, '{k}'{a('kind')}, {name}{a('bp_name')},"
                f" {ip}{a('bp_ip')}, {pool}{a('bp_pool')}, "
                f"'{prefix}{suffix}'{a('bp_metric')}, {attr}{a('bp_attr')},"
                f" {vi}{a('bp_value')} FROM a WHERE e % 4 = {ki}"
            )
    return (
        "WITH a AS (SELECT event_id, user_id AS u, event_id AS e "
        "FROM events)\n" + "\nUNION ALL\n".join(parts)
    )


EXT16_QUERIES["bigip_stats"] = q_bigip
EXT16_ORACLES["bigip_stats"] = _bigip_oracle()


# ---------------------------------------------------------------------------
# chrony tracking replies -> ntp metrics
# ---------------------------------------------------------------------------


def q_chrony(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.receivers import chrony_tracking

    ev = load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    s = lambda c: c.cast("string")  # noqa: E731
    body = F.when(e % 23 == 0, F.lit("garbage")).otherwise(F.concat(
        F.lit('{"stratum":'), s(e % 16),
        F.lit(',"leap_status":'), s(u % 4),
        F.lit(',"current_correction":'), s((e % 3200) / 32.0),
        F.lit(',"last_offset":'), s((u % 3200) / 32.0),
        F.lit(',"rms_offset":'), s((e % 1600) / 16.0),
        F.lit(',"freq_ppm":'), s((u % 1600) / 16.0),
        F.lit(',"skew_ppm":'), s((e % 800) / 8.0),
        F.lit(',"root_delay":'), s((u % 800) / 8.0), F.lit("}"),
    ))
    out = chrony_tracking(ev.select("event_id", body.alias("body")))
    return out.select("event_id", "nt_ok", "nt_metric",
                      "nt_leap_status", "nt_value", "nt_value_d")


O_CHRONY = """
WITH a AS (
  SELECT event_id, user_id AS u, event_id AS e,
         event_id % 23 = 0 AS bad,
         CASE CAST(user_id % 4 AS INT) WHEN 0 THEN 'normal'
              WHEN 1 THEN 'insert_second' WHEN 2 THEN 'delete_second'
              ELSE 'unsynchronised' END AS leap
  FROM events
)
SELECT event_id, TRUE AS nt_ok, 'ntp.stratum' AS nt_metric,
       CAST(NULL AS VARCHAR) AS nt_leap_status, e % 16 AS nt_value,
       CAST(NULL AS DOUBLE) AS nt_value_d FROM a WHERE NOT bad
UNION ALL SELECT event_id, TRUE, 'ntp.time.correction', leap, NULL,
  CAST(e % 3200 AS DOUBLE) / 32.0 FROM a WHERE NOT bad
UNION ALL SELECT event_id, TRUE, 'ntp.time.last_offset', leap, NULL,
  CAST(u % 3200 AS DOUBLE) / 32.0 FROM a WHERE NOT bad
UNION ALL SELECT event_id, TRUE, 'ntp.time.rms_offset', leap, NULL,
  CAST(e % 1600 AS DOUBLE) / 16.0 FROM a WHERE NOT bad
UNION ALL SELECT event_id, TRUE, 'ntp.frequency.offset', leap, NULL,
  CAST(u % 1600 AS DOUBLE) / 16.0 FROM a WHERE NOT bad
UNION ALL SELECT event_id, TRUE, 'ntp.skew', NULL, NULL,
  CAST(e % 800 AS DOUBLE) / 8.0 FROM a WHERE NOT bad
UNION ALL SELECT event_id, TRUE, 'ntp.time.root_delay', leap, NULL,
  CAST(u % 800 AS DOUBLE) / 8.0 FROM a WHERE NOT bad
UNION ALL SELECT event_id, FALSE, NULL, NULL, NULL,
  CAST(NULL AS DOUBLE) FROM a WHERE bad
"""


EXT16_QUERIES["chrony_tracking"] = q_chrony
EXT16_ORACLES["chrony_tracking"] = O_CHRONY


# ---------------------------------------------------------------------------
# vcenter object summaries -> metric rows
# ---------------------------------------------------------------------------


def q_vcenter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.vcenter import vcenter_stats

    ev = load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    s = lambda c: c.cast("string")  # noqa: E731
    kinds = ("datastore", "cluster", "resource_pool", "host", "vm")
    kind = F.element_at(F.array(*[F.lit(k) for k in kinds]),
                        (e % 5 + 1).cast("int"))
    qs = F.concat(
        F.lit('"quick_stats":{"overall_cpu_usage":'),
        F.when(e % 7 == 0, F.lit("0")).otherwise(s(e % 5000 + 1)),
        F.lit(',"guest_memory_usage":'),
        F.when(e % 3 == 0, F.lit("0")).otherwise(s(e % 4000 + 1)),
        F.lit(',"host_memory_usage":'), s(u % 4000),
        F.lit(',"overhead_memory":'), s(e % 300),
        F.lit(',"swapped_memory":'), s(u % 300),
        F.lit(',"ballooned_memory":'), s(e % 200),
        F.lit(',"private_memory":'), s(u % 200),
        F.lit(',"shared_memory":'), s(e % 100),
        F.lit(',"ssd_swapped_memory":'), s(u % 100),
        F.lit(',"granted_memory":'), s(e % 2000),
        F.lit(',"overall_memory_usage":'), s(e % 8000 + 1),
        F.lit(',"overall_cpu_readiness":'), s(u % 50), F.lit("}"),
    )
    bodies = {
        "datastore": F.concat(
            F.lit('{"capacity":'), s(e % 1000000 + 500000),
            F.lit(',"free_space":'), s(e % 400000), F.lit("}"),
        ),
        "cluster": F.concat(
            F.lit('{"powered_on":'), s(e % 50),
            F.lit(',"powered_off":'), s(u % 50),
            F.lit(',"suspended":'), s(e % 5),
            F.lit(',"templates":'), s(u % 5),
            F.lit(',"total_cpu":'), s(e % 100000),
            F.lit(',"effective_cpu":'), s(e % 90000),
            F.lit(',"effective_memory":'), s(u % 100000),
            F.lit(',"total_memory":'), s(u % 1000000000),
            F.lit(',"num_hosts":'), s(u % 20 + 3),
            F.lit(',"num_effective_hosts":'), s(u % 3), F.lit("}"),
        ),
        "resource_pool": F.concat(
            F.lit("{"),
            F.when(u % 4 != 0, F.concat(qs, F.lit(","))
                   ).otherwise(F.lit("")),
            F.lit('"cpu_shares":'), s(e % 4000),
            F.lit(',"memory_shares":'), s(u % 4000), F.lit("}"),
        ),
        "host": F.concat(
            F.lit("{"), qs,
            F.lit(',"memory_size":'), s((e % 1000 + 8) * 1048576),
            F.lit(',"num_cpu_cores":'), s(u % 32 + 2),
            F.lit(',"cpu_mhz":'), s(u % 1000 + 2000), F.lit("}"),
        ),
        "vm": F.concat(
            F.lit("{"), qs,
            F.lit(',"committed":'), s(e % 700000 + 1),
            F.lit(',"uncommitted":'),
            F.when(e % 11 == 0, F.lit("0")).otherwise(s(u % 600000 + 1)),
            F.lit(',"template":'),
            F.when(e % 13 == 0, F.lit("true")).otherwise(F.lit("false")),
            F.lit(',"memory_size_mb":'), s(u % 16384),
            F.lit(',"num_cpu":'), s(e % 8 + 1),
            F.lit(',"max_cpu_usage":'),
            F.when(u % 2 == 0, F.lit("0")).otherwise(s(u % 9000 + 100)),
            F.lit(',"host_cpu_mhz":'), s(e % 1000 + 2200), F.lit("}"),
        ),
    }
    body = F.lit(None).cast("string")
    for k in reversed(kinds):
        body = F.when(kind == k, bodies[k]).otherwise(body)
    out = vcenter_stats(ev.select(
        "event_id", kind.alias("kind"), body.alias("body"),
    ))
    return out.select("event_id", "kind", "vc_metric", "vc_attr",
                      "vc_value", "vc_value_d")


def _vcenter_oracle() -> str:
    NS = "CAST(NULL AS VARCHAR)"
    NI = "CAST(NULL AS BIGINT)"
    ND = "CAST(NULL AS DOUBLE)"
    ds_used = "(e % 1000000 + 500000) - e % 400000"
    qs_cpu = "CASE WHEN e % 7 = 0 THEN 0 ELSE e % 5000 + 1 END"
    qs_guest = "CASE WHEN e % 3 = 0 THEN 0 ELSE e % 4000 + 1 END"
    host_mem_mb = "(e % 1000 + 8)"
    host_cap = "(u % 32 + 2) * (u % 1000 + 2000)"
    vm_free = "CASE WHEN e % 11 = 0 THEN 0 ELSE u % 600000 + 1 END"
    vm_limit = ("CASE WHEN u % 2 = 0 THEN (e % 8 + 1) * (e % 1000 + "
                "2200) ELSE u % 9000 + 100 END")
    live = "e % 13 <> 0"
    running = f"{live} AND e % 7 <> 0"
    # kind#, metric, attr, where, vi, vd
    rows = [
        (0, "vcenter.datastore.disk.usage", "'used'", None, ds_used, ND),
        (0, "vcenter.datastore.disk.usage", "'available'", None,
         "e % 400000", ND),
        (0, "vcenter.datastore.disk.utilization", NS, None, NI,
         f"CAST({ds_used} AS DOUBLE) / CAST(e % 1000000 + 500000 "
         f"AS DOUBLE) * 100.0"),
        (1, "vcenter.cluster.vm.count", "'on'", None, "e % 50", ND),
        (1, "vcenter.cluster.vm.count", "'off'", None, "u % 50", ND),
        (1, "vcenter.cluster.vm.count", "'suspended'", None, "e % 5",
         ND),
        (1, "vcenter.cluster.vm_template.count", NS, None, "u % 5", ND),
        (1, "vcenter.cluster.cpu.limit", NS, None, "e % 100000", ND),
        (1, "vcenter.cluster.cpu.effective", NS, None, "e % 90000", ND),
        (1, "vcenter.cluster.memory.effective", NS, None,
         "(u % 100000) * 1048576", ND),
        (1, "vcenter.cluster.memory.limit", NS, None, "u % 1000000000",
         ND),
        (1, "vcenter.cluster.host.count", "'false'", None,
         "u % 20 + 3 - u % 3", ND),
        (1, "vcenter.cluster.host.count", "'true'", None, "u % 3", ND),
        (2, "vcenter.resource_pool.cpu.usage", NS, "u % 4 <> 0",
         qs_cpu, ND),
        (2, "vcenter.resource_pool.memory.usage", "'guest'",
         "u % 4 <> 0", qs_guest, ND),
        (2, "vcenter.resource_pool.memory.usage", "'host'",
         "u % 4 <> 0", "u % 4000", ND),
        (2, "vcenter.resource_pool.memory.usage", "'overhead'",
         "u % 4 <> 0", "e % 300", ND),
        (2, "vcenter.resource_pool.memory.swapped", NS, "u % 4 <> 0",
         "u % 300", ND),
        (2, "vcenter.resource_pool.memory.ballooned", NS, "u % 4 <> 0",
         "e % 200", ND),
        (2, "vcenter.resource_pool.memory.granted", "'private'",
         "u % 4 <> 0", "u % 200", ND),
        (2, "vcenter.resource_pool.memory.granted", "'shared'",
         "u % 4 <> 0", "e % 100", ND),
        (2, "vcenter.resource_pool.cpu.shares", NS, None, "e % 4000",
         ND),
        (2, "vcenter.resource_pool.memory.shares", NS, None, "u % 4000",
         ND),
        (3, "vcenter.host.memory.usage", NS, None, "e % 8000 + 1", ND),
        (3, "vcenter.host.memory.utilization", NS, None, NI,
         f"CAST(e % 8000 + 1 AS DOUBLE) * 100.0 / "
         f"CAST({host_mem_mb} AS DOUBLE)"),
        (3, "vcenter.host.cpu.usage", NS, None, qs_cpu, ND),
        (3, "vcenter.host.cpu.capacity", NS, None, host_cap, ND),
        (3, "vcenter.host.memory.capacity", NS, None, NI,
         f"CAST({host_mem_mb} AS DOUBLE)"),
        (3, "vcenter.host.cpu.utilization", NS, None, NI,
         f"CAST({qs_cpu} AS DOUBLE) * 100.0 / CAST({host_cap} "
         f"AS DOUBLE)"),
        (4, "vcenter.vm.disk.usage", "'used'", None, "e % 700000 + 1",
         ND),
        (4, "vcenter.vm.disk.usage", "'available'", None, vm_free, ND),
        (4, "vcenter.vm.disk.utilization", NS,
         f"{live} AND e % 11 <> 0", NI,
         f"CAST(e % 700000 + 1 AS DOUBLE) / CAST(({vm_free}) + "
         f"e % 700000 + 1 AS DOUBLE) * 100.0"),
        (4, "vcenter.vm.memory.utilization", NS,
         f"{live} AND u % 16384 > 0 AND e % 3 <> 0", NI,
         f"CAST({qs_guest} AS DOUBLE) / CAST(u % 16384 AS DOUBLE) "
         f"* 100.0"),
        (4, "vcenter.vm.memory.usage", NS, live, qs_guest, ND),
        (4, "vcenter.vm.memory.ballooned", NS, live, "e % 200", ND),
        (4, "vcenter.vm.memory.swapped", NS, live, "u % 300", ND),
        (4, "vcenter.vm.memory.swapped_ssd", NS, live, "u % 100", ND),
        (4, "vcenter.vm.memory.granted", NS, live, "e % 2000", ND),
        (4, "vcenter.vm.cpu.usage", NS, running, qs_cpu, ND),
        (4, "vcenter.vm.cpu.utilization", NS, running, NI,
         f"CAST({qs_cpu} AS DOUBLE) * 100.0 / CAST({vm_limit} "
         f"AS DOUBLE)"),
        (4, "vcenter.vm.cpu.readiness", NS, running, "u % 50", ND),
    ]
    kinds = ("datastore", "cluster", "resource_pool", "host", "vm")
    parts = []
    for i, (k, metric, attr, where, vi, vd) in enumerate(rows):
        a = (lambda n: f" AS {n}") if i == 0 else (lambda n: "")
        w = f"e % 5 = {k}" + (f" AND ({where})" if where else "")
        parts.append(
            f"SELECT event_id, '{kinds[k]}'{a('kind')}, "
            f"'{metric}'{a('vc_metric')}, {attr}{a('vc_attr')}, "
            f"{vi}{a('vc_value')}, {vd}{a('vc_value_d')} "
            f"FROM a WHERE {w}"
        )
    return (
        "WITH a AS (SELECT event_id, user_id AS u, event_id AS e "
        "FROM events)\n" + "\nUNION ALL\n".join(parts)
    )


EXT16_QUERIES["vcenter_stats"] = q_vcenter
EXT16_ORACLES["vcenter_stats"] = _vcenter_oracle()

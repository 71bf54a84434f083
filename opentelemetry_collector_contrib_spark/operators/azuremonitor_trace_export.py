"""Azure Monitor (Application Insights) span EXPORT translator
(``exporter/azuremonitorexporter/trace_to_envelope.go`` +
``conventions.go``); the log/metric envelopes live in
``operators/azuremonitor_export.py``.

One Request / RemoteDependency envelope per span, plus one
Exception / Message envelope per span event (exceptions always,
others gated on ``span_events_enabled`` — :136-183):

- span-type detection by attr presence, in order rpc.system →
  http.method → db.system → messaging.system → faas.trigger, empty
  attrs → unknown (:683-717); FaaS spans are unsupported and DROPPED
  (:70-73)
- kind ladder (:88-110): Server/Consumer → RequestData (envelope tag
  ai.operation.name = request name); Client/Producer/Internal →
  RemoteDependencyData; UNSPECIFIED counts as Internal (:62-65);
  Internal ALWAYS forces Type "InProc" after the type-specific fill
- defaults (:220-268): id = span id hex, name = span name,
  response/result code = str(status code), success = code != ERROR,
  duration = DD.HH:MM:SS.UUUUUU (time_utils.go:20-35)
- HTTP requests (:305-395): code → (str, 100<=c<=399); name =
  "METHOD route-or-span-name" (route '/'-prefixed); url preference
  scheme+host+target → scheme+server_name+host_port+target →
  scheme+net_host_name+port+target → http.url (url.Parse-gated in
  Go, accepted verbatim here); source = client ip else net.peer.ip
- HTTP dependencies (:397-478): type HTTP; name = METHOD[ route];
  data/target preference http.url(→host) → scheme+http.host+target →
  scheme+peer-name:port+target → scheme+peer-ip:port+target
- RPC (:480-531): response/result code = rpc.grpc.status_code else
  "0"; request name = "rpc.system span-name" and url = that name;
  dependency keeps the span name, data = span name, type =
  rpc.system; source/target = peer name-else-ip[:port]
- DB (:533-549): type = db.system, data = db.statement else
  db.operation, target = peer
- messaging (:551-581): request source = messaging.url else peer;
  dependency data = messaging.url, type = messaging.system, target =
  url else peer
- properties = every span attr (string-model verbatim;
  setAttributeValueAsProperty is a typed-to-string render there),
  then otel.status_code word + non-empty otel.status_description,
  then resource attrs, scope entries, and the ``_MS.links`` JSON
  ([{"operation_Id","id"}] in link order, :186-207); merged
  last-wins, rendered sorted CSV
- span-event envelopes: ai.operation.parentId = the SPAN's own id
  (:146); "exception" events → ExceptionData from exception.* attrs
  with SeverityLevel Error (:273-289), others → MessageData carrying
  the event NAME as the message (:291-299); properties = event attrs
  + resource + scope
- tags: ai.user.id = enduser.id attr (:84-86); ai.cloud.role /
  roleInstance from service.* resource attrs (contracts_utils.go)
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .azuremonitor_export import (
    _cloud_role,
    _ents,
    _props_csv,
    _scope_ents,
)

_ENT_T = "struct<key:string,value:string>"
_EMPTY_ENTS = f"array<{_ENT_T}>"

_STATUS_WORDS = ["STATUS_CODE_UNSET", "STATUS_CODE_OK",
                 "STATUS_CODE_ERROR"]


def _fmt_duration(dur_ns: Column) -> Column:
    """DD.HH:MM:SS.UUUUUU (time_utils.go:20-35)."""
    us = F.floor(dur_ns / 1000).cast("bigint")
    two = lambda c: F.lpad(  # noqa: E731
        F.floor(c).cast("bigint").cast("string"), 2, "0")
    return F.concat(
        two(us / F.lit(86_400_000_000)),
        F.lit("."),
        two(F.pmod(us, F.lit(86_400_000_000)) / F.lit(3_600_000_000)),
        F.lit(":"),
        two(F.pmod(us, F.lit(3_600_000_000)) / F.lit(60_000_000)),
        F.lit(":"),
        two(F.pmod(us, F.lit(60_000_000)) / F.lit(1_000_000)),
        F.lit("."),
        F.lpad(F.pmod(us, F.lit(1_000_000)).cast("string"), 6, "0"),
    )


def _ent1(cond: Column, key: str, value: Column) -> Column:
    return F.when(cond, F.array(F.struct(
        F.lit(key).alias("key"), value.alias("value")))).otherwise(
        F.expr("array()").cast(_EMPTY_ENTS))


def azuremonitor_span_envelopes(
    df: DataFrame,
    *,
    id_cols: list[str],
    span_events_enabled: bool = False,
    trace_id_col: str = "trace_id",
    span_id_col: str = "span_id",
    parent_span_id_col: str = "parent_span_id",
    name_col: str = "name",
    kind_col: str = "kind",
    start_ns_col: str = "start_ns",
    end_ns_col: str = "end_ns",
    status_code_col: str = "status_code",
    status_message_col: str = "status_message",
    attrs_col: str = "attrs",
    res_attrs_col: str = "res_attrs",
    scope_name_col: str = "scope_name",
    scope_version_col: str = "scope_version",
    events_col: str | None = "events",
    links_col: str | None = "links",
) -> DataFrame:
    from .syslog_export import _rfc3339nano

    a = F.col(attrs_col)
    res = F.col(res_attrs_col)
    kind = F.coalesce(F.col(kind_col), F.lit(0)).cast("int")
    eff_kind = F.when(kind == 0, F.lit(1)).otherwise(kind)  # :62-65
    is_request = eff_kind.isin(2, 5)
    status = F.coalesce(F.col(status_code_col), F.lit(0)).cast("int")
    name = F.coalesce(F.col(name_col), F.lit(""))
    span_name = name

    def iattr(key: str) -> Column:
        return F.coalesce(a[key].try_cast("bigint"), F.lit(0))

    span_type = (
        F.when(F.size(F.coalesce(a, F.expr("map()").cast(
            "map<string,string>"))) == 0, F.lit("unknown"))
        .when(a["rpc.system"].isNotNull(), F.lit("rpc"))
        .when(a["http.method"].isNotNull(), F.lit("http"))
        .when(a["db.system"].isNotNull(), F.lit("db"))
        .when(a["messaging.system"].isNotNull(), F.lit("messaging"))
        .when(a["faas.trigger"].isNotNull(), F.lit("faas"))
        .otherwise(F.lit("unknown")))

    # --- defaults (:220-268) ---------------------------------------
    default_code = status.cast("string")
    default_success = status != 2

    # --- HTTP pieces ------------------------------------------------
    http_code = iattr("http.status_code")
    http_code_s = http_code.cast("string")
    http_success = (http_code >= 100) & (http_code <= 399)
    route = a["http.route"]
    route_pref = F.when(route.startswith("/"), route).otherwise(
        F.concat(F.lit("/"), route))
    method = F.coalesce(a["http.method"], F.lit(""))
    target = F.when(
        a["http.target"].isNotNull(),
        F.when(a["http.target"].startswith("/"), a["http.target"])
        .otherwise(F.concat(F.lit("/"), a["http.target"])))
    scheme = a["http.scheme"]
    peer_port = F.when(iattr("net.peer.port") != 0,
                       iattr("net.peer.port").cast("string"))
    host_port = F.when(iattr("net.host.port") != 0,
                       iattr("net.host.port").cast("string"))
    req_url = (
        F.when(scheme.isNotNull() & a["http.host"].isNotNull()
               & target.isNotNull(),
               F.concat(scheme, F.lit("://"), a["http.host"], target))
        .when(scheme.isNotNull() & a["http.server_name"].isNotNull()
              & host_port.isNotNull() & target.isNotNull(),
              F.concat(scheme, F.lit("://"), a["http.server_name"],
                       F.lit(":"), host_port, target))
        .when(scheme.isNotNull() & a["net.host.name"].isNotNull()
              & host_port.isNotNull() & target.isNotNull(),
              F.concat(scheme, F.lit("://"), a["net.host.name"],
                       F.lit(":"), host_port, target))
        .when(a["http.url"].isNotNull(), a["http.url"]))
    dep_url_data = (
        F.when(a["http.url"].isNotNull(), a["http.url"])
        .when(scheme.isNotNull() & a["http.host"].isNotNull()
              & target.isNotNull(),
              F.concat(scheme, F.lit("://"), a["http.host"], target))
        .when(scheme.isNotNull() & a["net.peer.name"].isNotNull()
              & peer_port.isNotNull() & target.isNotNull(),
              F.concat(scheme, F.lit("://"), a["net.peer.name"],
                       F.lit(":"), peer_port, target))
        .when(scheme.isNotNull() & a["net.peer.ip"].isNotNull()
              & peer_port.isNotNull() & target.isNotNull(),
              F.concat(scheme, F.lit("://"), a["net.peer.ip"],
                       F.lit(":"), peer_port, target)))
    # Go's url.Parse(http.url).Host ~ authority between "://" and
    # the next "/" (fixture-range equivalence)
    url_host = F.regexp_extract(a["http.url"], r"^[a-z+.\-]+://([^/]*)",
                                1)
    dep_url_target = (
        F.when(a["http.url"].isNotNull(), url_host)
        .when(scheme.isNotNull() & a["http.host"].isNotNull()
              & target.isNotNull(), a["http.host"])
        .when(scheme.isNotNull() & a["net.peer.name"].isNotNull()
              & peer_port.isNotNull() & target.isNotNull(),
              F.concat(a["net.peer.name"], F.lit(":"), peer_port))
        .when(scheme.isNotNull() & a["net.peer.ip"].isNotNull()
              & peer_port.isNotNull() & target.isNotNull(),
              F.concat(a["net.peer.ip"], F.lit(":"), peer_port)))

    # peer address = name-else-ip [:port] (:724-737)
    peer_base = F.coalesce(a["net.peer.name"], a["net.peer.ip"],
                           F.lit(""))
    peer_addr = F.concat(
        peer_base,
        F.when(iattr("net.peer.port") != 0,
               F.concat(F.lit(":"),
                        iattr("net.peer.port").cast("string")))
        .otherwise(F.lit("")))

    grpc_code = F.when(iattr("rpc.grpc.status_code") != 0,
                       iattr("rpc.grpc.status_code").cast("string")) \
        .otherwise(F.lit("0"))

    # --- per-type request/dependency fields --------------------------
    resp_code = (F.when(span_type == "rpc", grpc_code)
                 .when((span_type == "http") & (http_code != 0),
                       http_code_s)
                 .otherwise(default_code))
    success = F.when((span_type == "http") & (http_code != 0),
                     http_success).otherwise(default_success)

    req_name = (
        F.when(span_type == "http",
               F.concat(method, F.lit(" "),
                        F.coalesce(route_pref, span_name)))
        .when(span_type == "rpc",
              F.concat(F.coalesce(a["rpc.system"], F.lit("")),
                       F.lit(" "), span_name))
        .otherwise(span_name))
    dep_name = (
        F.when(span_type == "http",
               F.concat(method,
                        F.when(route.isNotNull(),
                               F.concat(F.lit(" "), route))
                        .otherwise(F.lit(""))))
        .otherwise(span_name))

    url_out = (F.when(span_type == "http", req_url)
               .when(span_type == "rpc", req_name))
    source = (
        F.when(span_type == "http",
               F.coalesce(a["http.client_ip"], a["net.peer.ip"]))
        .when(span_type == "rpc", peer_addr)
        .when(span_type == "messaging",
              F.coalesce(a["messaging.url"], peer_addr)))

    dep_type = (
        F.when(eff_kind == 1, F.lit("InProc"))          # :99-103
        .when(span_type == "http", F.lit("HTTP"))
        .when(span_type == "rpc", a["rpc.system"])
        .when(span_type == "db", a["db.system"])
        .when(span_type == "messaging", a["messaging.system"]))
    dep_data = (
        F.when(span_type == "http", dep_url_data)
        .when(span_type == "rpc", span_name)
        .when(span_type == "db",
              F.coalesce(a["db.statement"], a["db.operation"]))
        .when(span_type == "messaging", a["messaging.url"]))
    dep_target = (
        F.when(span_type == "http", dep_url_target)
        .when(span_type.isin("rpc", "db"), peer_addr)
        .when(span_type == "messaging",
              F.coalesce(a["messaging.url"], peer_addr)))

    status_word = F.element_at(
        F.array(*[F.lit(w) for w in _STATUS_WORDS]),
        F.when((status >= 0) & (status <= 2), status)
        .otherwise(F.lit(0)) + 1)
    links = F.coalesce(
        F.col(links_col) if links_col else F.lit(None),
        F.expr("array()").cast(
            "array<struct<trace_id:string,span_id:string>>"))
    links_json = F.when(F.size(links) > 0, F.concat(
        F.lit("["),
        F.array_join(F.transform(links, lambda ln: F.concat(
            F.lit('{"operation_Id":"'),
            F.coalesce(ln["trace_id"], F.lit("")),
            F.lit('","id":"'), F.coalesce(ln["span_id"], F.lit("")),
            F.lit('"}'))), ","),
        F.lit("]")))

    scope_e = _scope_ents(
        F.coalesce(F.col(scope_name_col), F.lit("")),
        F.coalesce(F.col(scope_version_col), F.lit("")))
    # the REQUEST switch has no databaseSpanType arm (:230-240), so a
    # db-typed Server/Consumer span never copies its attrs
    span_attr_ents = F.when(
        ~(is_request & (span_type == "db")), _ents(a)).otherwise(
        F.expr("array()").cast(_EMPTY_ENTS))
    props = _props_csv(
        span_attr_ents,
        F.array(F.struct(F.lit("otel.status_code").alias("key"),
                         status_word.alias("value"))),
        _ent1(F.coalesce(F.col(status_message_col), F.lit("")) != "",
              "otel.status_description", F.col(status_message_col)),
        _ents(res),
        scope_e,
        _ent1(links_json.isNotNull(), "_MS.links", links_json),
    )

    kind_word = F.when(is_request, F.lit("Request")).otherwise(
        F.lit("RemoteDependency"))
    base = df.where(span_type != "faas")
    # NB: the output column is aliased "_kind" first and renamed in a
    # second select — aliasing it "kind" in the same projection lets
    # CollapseProject re-resolve the input `kind` reference inside the
    # properties lambdas against the OUTPUT alias (PLANS.md:
    # select-barrier staging)
    spans_out = base.select(
        *id_cols,
        kind_word.alias("_kind"),
        F.concat(F.lit("Microsoft.ApplicationInsights."), kind_word)
        .alias("envelope_name"),
        _rfc3339nano(F.col(start_ns_col)).alias("time"),
        F.coalesce(F.col(trace_id_col), F.lit("")).alias("op_id"),
        F.coalesce(F.col(parent_span_id_col), F.lit(""))
        .alias("op_parent_id"),
        a["enduser.id"].alias("user_id"),
        F.when(is_request, req_name).alias("operation_name"),
        _cloud_role(res).alias("cloud_role"),
        res["service.instance.id"].alias("cloud_role_instance"),
        F.coalesce(F.col(span_id_col), F.lit("")).alias("data_id"),
        F.when(is_request, req_name).otherwise(dep_name).alias("name"),
        _fmt_duration(F.col(end_ns_col) - F.col(start_ns_col))
        .alias("duration"),
        resp_code.alias("response_code"),
        success.alias("success"),
        F.when(is_request, url_out).alias("url"),
        F.when(is_request, source).alias("source"),
        F.when(~is_request, dep_type).alias("dep_type"),
        F.when(~is_request, dep_data).alias("dep_data"),
        F.when(~is_request, dep_target).alias("dep_target"),
        F.lit(None).cast("string").alias("exc_type"),
        F.lit(None).cast("string").alias("exc_message"),
        F.lit(None).cast("string").alias("exc_stack"),
        F.lit(None).cast("boolean").alias("exc_has_full_stack"),
        F.lit(None).cast("string").alias("severity_level"),
        F.lit(None).cast("string").alias("message"),
        props.alias("properties"),
    )
    spans_out = spans_out.select(
        *id_cols, F.col("_kind").alias("kind"),
        *[c for c in spans_out.columns
          if c not in (*id_cols, "_kind")])

    events = F.coalesce(
        F.col(events_col) if events_col else F.lit(None),
        F.expr("array()").cast(
            "array<struct<ts_ns:bigint,name:string,"
            "attrs:map<string,string>>>"))
    kept = F.filter(
        events,
        lambda ev: (ev["name"] == "exception")
        | F.lit(span_events_enabled))
    ev_base = base.select(
        *id_cols,
        F.coalesce(F.col(trace_id_col), F.lit("")).alias("_tid"),
        F.coalesce(F.col(span_id_col), F.lit("")).alias("_sid"),
        res.alias("_res"), scope_e.alias("_scope"),
        F.explode(kept).alias("_ev"),
    )
    ev = F.col("_ev")
    is_exc = ev["name"] == "exception"
    ev_kind = F.when(is_exc, F.lit("Exception")).otherwise(
        F.lit("Message"))
    ev_attrs = F.coalesce(ev["attrs"],
                          F.expr("map()").cast("map<string,string>"))
    events_out = ev_base.select(
        *id_cols,
        ev_kind.alias("kind"),
        F.concat(F.lit("Microsoft.ApplicationInsights."), ev_kind)
        .alias("envelope_name"),
        _rfc3339nano(ev["ts_ns"]).alias("time"),
        F.col("_tid").alias("op_id"),
        F.col("_sid").alias("op_parent_id"),   # the span's OWN id
        F.lit(None).cast("string").alias("user_id"),
        F.lit(None).cast("string").alias("operation_name"),
        _cloud_role(F.col("_res")).alias("cloud_role"),
        F.col("_res")["service.instance.id"]
        .alias("cloud_role_instance"),
        F.lit(None).cast("string").alias("data_id"),
        F.lit(None).cast("string").alias("name"),
        F.lit(None).cast("string").alias("duration"),
        F.lit(None).cast("string").alias("response_code"),
        F.lit(None).cast("boolean").alias("success"),
        F.lit(None).cast("string").alias("url"),
        F.lit(None).cast("string").alias("source"),
        F.lit(None).cast("string").alias("dep_type"),
        F.lit(None).cast("string").alias("dep_data"),
        F.lit(None).cast("string").alias("dep_target"),
        F.when(is_exc, F.coalesce(ev_attrs["exception.type"],
                                  F.lit(""))).alias("exc_type"),
        F.when(is_exc, F.coalesce(ev_attrs["exception.message"],
                                  F.lit(""))).alias("exc_message"),
        F.when(is_exc, F.coalesce(ev_attrs["exception.stacktrace"],
                                  F.lit(""))).alias("exc_stack"),
        F.when(is_exc,
               F.coalesce(ev_attrs["exception.stacktrace"],
                          F.lit("")) != "")
        .alias("exc_has_full_stack"),
        F.when(is_exc, F.lit("Error")).alias("severity_level"),
        F.when(~is_exc, ev["name"]).alias("message"),
        _props_csv(F.map_entries(ev_attrs), _ents(F.col("_res")),
                   F.col("_scope")).alias("properties"),
    )

    return spans_out.unionByName(events_out)

"""AWS X-Ray EXPORT translator: OTLP spans -> X-Ray segment models
(``exporter/awsxrayexporter/internal/translator/segment.go``; the
receive direction is ``operators/xray.py::xray_segment_spans``).

Vectorized Column algebra per span, one output row per produced
segment (local-root dependency spans fan out to a service segment +
dependency subsegment pair, ``segment.go:250-283``):

- amazon trace id            — segment.go:545-584
  ("1-{8 hex epoch}-{24 hex id}" from the 32-hex OTLP id; the
  28-day/-5-min epoch validation runs only when ``now_epoch`` is
  given, mirroring the skip_timestamp_validation feature gate)
- segment typing             — segment.go:316-325
  (subsegment when kind != server and the parent id is non-empty;
  the same predicate drives storeResource)
- name ladder                — segment.go:355-449
  (aws.local.service for server / LOCAL_ROOT-internal spans;
  aws.remote.service with the AWS.SDK./AWS:: prefix trim for
  client/producer/consumer; peer.service; aws.service (namespace
  "aws"); db.name@host with the jdbc: trim; resource service.name
  for servers; rpc.service; http.host; net.peer.name; finally the
  sanitized span name — invalid chars stripped, 200-char cap,
  "span" when empty)
- namespace                  — segment.go:387-391,399-401,451-453
  ("aws" for rpc.system=aws-api or the aws.service rung, "remote"
  for client spans; local-root dependency subsegments default to
  "remote", segment.go:153-155; non-local-root client/producer/
  consumer subsegments with aws.remote.service get "remote",
  segment.go:127-137)
- origin ladder              — segment.go:490-532
- http block                 — http.go:20-287
  (request method/client_ip/user_agent/x_forwarded_for, response
  status + content-length from RECEIVED message events, server- and
  client-shape URL construction with the default-port elision)
- aws block                  — aws.go:18-270
  (operation from aws.operation else rpc.method, account/region/
  request-id/queue-url/table-name attrs with their legacy twins,
  messaging.url favored for SQS, EC2/ECS/Beanstalk/EKS metadata
  gates, CW logs from arns > names > exporter config with the
  &-split and arn 7th-field parse, X-Ray SDK metadata; the whole
  block is nil for non-AWS cloud.provider resources)
- sql block                  — sql.go:14-86
  (only for the 11 SQL db.system values; url = the span name,
  connection_string defaults "localhost" and appends "/"+db.name)
- cause + flags              — cause.go:32-189
  (exception events parsed per resource telemetry.sdk.language —
  java/php, python, javascript, dotnet and go stack walks are a
  faithful Arrow-batched port — plus the aws-api individual-HTTP
  error events; otherwise the status-message/http.status_text
  fallback; error 4xx / throttle 429 / fault 5xx-or-status-error)
- annotations / metadata     — segment.go:590-707
  (enduser.id -> user; indexed keys from the exporter config plus
  the aws.xray.annotations attr; fixAnnotationKey with the allowDot
  gate ON by default (Beta); aws.xray.metadata.<ns> JSON attrs open
  named namespaces, invalid JSON keeps the raw pair, "default"
  merges case-insensitively; resource attrs store under
  otel.resource.* only on storeResource segments)
- span links                 — span_links.go:12-40
- local-root fan             — segment.go:139-283
  (service segment: name from aws.local.service, no HTTP, AWS
  subsegment fields nil'd, metadata trimmed to otel.resource.*,
  links only for consumers, the four remote annotations removed
  BEFORE annotation/metadata computation; dependency subsegment:
  parent = the service segment id, type=subsegment,
  namespace defaults "remote", consumer links removed)

Model notes: attribute values are their AsString forms
(map<string,string>), so annotation values surface as strings and
the aws.xray.annotations slice attr is realized as a comma-joined
key list.  The reference mints random ids for the service segment
and every exception (segment.go:481-488); this engine derives them
deterministically (md5 of trace/span id + ordinal) so runs are
replayable and the DuckDB oracle can pin them — an intended
divergence.  Where Go's random map-iteration order makes the
client-ip choice nondeterministic (http.go:90-110), the engine
fixes the priority http.client_ip > net.peer.ip >
network.peer.address > client.address.
"""
from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_ENTRY_T = "array<struct<key:string,value:string>>"
_EXC_T = ("array<struct<id:string,type:string,message:string,"
          "remote:boolean,cause:string,"
          "stack:array<struct<path:string,label:string,line:int>>>>")

# segment.go:53 — note the literal 'N' after \p{L} is replayed as-is
_INVALID_NAME_RE = r"[^ 0-9\p{L}N_.:/%&#=+\-@]"

_SQL_SYSTEMS = ["db2", "derby", "hive", "mariadb", "mssql", "mysql",
                "oracle", "postgresql", "sqlite", "teradata",
                "other_sql"]

# http.go:38-127 — every key consumed by the makeHTTP switch
_HTTP_KEYS = [
    "http.method", "http.request.method", "http.client_ip",
    "http.user_agent", "user_agent.original", "http.status_code",
    "http.response.status_code", "http.url", "url.full",
    "http.scheme", "url.scheme", "http.host", "http.target",
    "http.server_name", "net.host.port", "host.name",
    "net.host.name", "net.peer.name", "net.peer.port", "net.peer.ip",
    "network.peer.address", "client.address", "url.path",
    "url.query", "server.address", "server.port",
]
# aws.go:123-147 — attribute keys consumed by the makeAws loop
_AWS_KEYS = [
    "rpc.method", "aws.operation", "aws.account_id", "aws.region",
    "aws.request_id", "aws.requestId", "aws.queue_url",
    "aws.queue.url", "aws.table_name", "aws.table.name",
]
_DB_KEYS = ["db.connection_string", "db.system", "db.name",
            "db.statement", "db.user"]

# segment.go:82-87
_SVC_REMOVED = ["aws.remote.service", "aws.remote.operation",
                "remoteTarget", "K8s.RemoteNamespace"]

_ORIGIN_PLATFORM = [
    ("aws_app_runner", "AWS::AppRunner::Service"),
    ("aws_eks", "AWS::EKS::Container"),
    ("aws_elastic_beanstalk", "AWS::ElasticBeanstalk::Environment"),
    ("aws_ec2", "AWS::EC2::Instance"),
]


def _get(m: Column, key: str) -> Column:
    return F.element_at(m, F.lit(key))


def _ne(c: Column) -> Column:
    """present-and-non-empty (Go's `ok` + Str() != "")."""
    return F.nullif(c, F.lit(""))


def _earr() -> Column:
    return F.expr("array()").cast(_ENTRY_T)


def _entry(k, v) -> Column:
    return F.struct(k.alias("key"), v.alias("value"))


def _amazon_trace_id(tid: Column) -> Column:
    return F.concat(F.lit("1-"), F.substring(tid, 1, 8), F.lit("-"),
                    F.substring(tid, 9, 24))


def _fix_annotation_key(k: Column, allow_dot: bool) -> Column:
    pat = "[^0-9A-Za-z.]" if allow_dot else "[^0-9A-Za-z]"
    return F.regexp_replace(k, pat, "_")


def _parse_exceptions_batch(events_json: pd.Series, span_id: pd.Series,
                            is_sdk: pd.Series, remote: pd.Series,
                            language: pd.Series) -> pd.Series:
    """Arrow-batched port of cause.go:71-119 + the per-language stack
    walks (cause.go:191-605).  Deterministic exception ids."""
    import hashlib

    def eid(sid: str, n: int) -> str:
        return hashlib.md5(f"{sid}:exc:{n}".encode()).hexdigest()[:16]

    def java_stack(st: str, excs: list, sid: str, nid: list) -> None:
        # cause.go:224-322 (php shares the walk, :215-216)
        lines = st.split("\n")
        if len(lines) < 2:
            return
        exc = excs[0]
        is_remote = exc["remote"]
        exc["stack"] = []
        i = 1
        while i < len(lines):
            line = lines[i]
            if line.startswith("\tat "):
                paren = line.find("(")
                if paren >= 0 and line.endswith(")"):
                    label = line[len("\tat "):paren]
                    slash = label.find("/")
                    if slash >= 0:
                        label = label[slash + 1:]
                    path = line[paren + 1:-1]
                    ln = 0
                    colon = path.find(":")
                    if colon >= 0:
                        try:
                            ln = int(path[colon + 1:])
                        except ValueError:
                            ln = 0
                        path = path[:colon]
                    if exc["stack"] is None:  # Go nil-append semantics
                        exc["stack"] = []
                    exc["stack"].append(
                        {"path": path, "label": label, "line": ln})
            elif line.startswith("Caused by: "):
                cause_type = line[len("Caused by: "):]
                colon = cause_type.find(":")
                cause_msg = ""
                if colon >= 0:
                    cause_msg = cause_type[colon + 2:]
                    cause_type = cause_type[:colon]
                while True:
                    i += 1
                    if i >= len(lines):
                        line = None
                        break
                    line = lines[i]
                    if (line.startswith("\tat ") and "(" in line
                            and line.endswith(")")):
                        break
                    cause_msg += line
                new = {"id": eid(sid, nid[0]), "type": cause_type,
                       "remote": is_remote, "message": cause_msg,
                       "stack": None, "cause": None}
                nid[0] += 1
                excs.append(new)
                excs[-2]["cause"] = new["id"]
                exc = new
                if line is None:
                    break
                continue
            i += 1

    def python_stack(st: str, excs: list, sid: str, nid: list) -> None:
        # cause.go:324-420
        lines = st.split("\n")
        li = len(lines) - 2
        if li < 0:
            return
        line = lines[li]
        exc = excs[0]
        is_remote = exc["remote"]
        exc["stack"] = []
        while True:
            if line.startswith("  File "):
                parts = line.split(",")
                if len(parts) == 3:
                    fpart = parts[0]
                    fl = fpart[8:-1]
                    ln = 0
                    if parts[1].startswith(" line "):
                        try:
                            ln = int(parts[1][6:])
                        except ValueError:
                            ln = 0
                    label = ""
                    if parts[2].startswith(" in "):
                        label = parts[2][4:]
                    if exc["stack"] is None:  # Go nil-append semantics
                        exc["stack"] = []
                    exc["stack"].append(
                        {"path": fl, "label": label, "line": ln})
            elif line.startswith("During handling of the above "
                                 "exception, another exception "
                                 "occurred:"):
                nf = li - 1
                while True:
                    if nf < 0:
                        return
                    if lines[nf].startswith("  File "):
                        break
                    nf -= 1
                message = "\n".join(lines[nf + 2:li - 1])
                li = nf
                colon = message.find(":")
                if colon < 0:
                    return
                new = {"id": eid(sid, nid[0]),
                       "type": message[:colon], "remote": is_remote,
                       "message": message[colon + 2:], "stack": None,
                       "cause": None}
                nid[0] += 1
                excs.append(new)
                excs[-2]["cause"] = new["id"]
                exc = new
                line = lines[li]
                continue
            li -= 1
            if li < 0:
                break
            line = lines[li]

    def js_stack(st: str, excs: list) -> None:
        # cause.go:422-479
        lines = st.split("\n")
        if len(lines) < 2:
            return
        exc = excs[0]
        exc["stack"] = []
        for line in lines[1:]:
            if not line.startswith("    at "):
                continue
            paren = line.find("(")
            label, path, ln = "", "", 0
            if paren >= 0 and line.endswith(")"):
                label = line[7:paren]
                path = line[paren + 1:-1]
            elif paren < 0:
                path = line[7:]
            c1 = path.find(":")
            c2 = path.find(":", c1 + 1) if c1 >= 0 else -1
            if c1 >= 0 and c2 >= 0 and c1 != c2:
                try:
                    ln = int(path[c1 + 1:c2])
                except ValueError:
                    ln = 0
                path = path[:c1]
            elif c1 < 0 and "native" in path:
                path = "native"
            if path or label or ln:
                exc["stack"].append(
                    {"path": path, "label": label, "line": ln})

    def dotnet_stack(st: str, excs: list) -> None:
        # cause.go:481-550
        lines = st.split("\n")
        if len(lines) < 2:
            return
        exc = excs[0]
        exc["stack"] = []
        for raw in lines[1:]:
            line = raw.strip()
            if not line.startswith("at "):
                continue
            if " in " in line:
                parts = line.split(" in ")
                label = parts[0][len("at "):]
                path = parts[1]
                ln = 0
                colon = parts[1].rfind(":")
                if colon >= 0:
                    lstr = path[colon + 1:]
                    if lstr.startswith("line"):
                        lstr = lstr[5:]
                    path = path[:colon]
                    try:
                        ln = int(lstr)
                    except ValueError:
                        ln = 0
                exc["stack"].append(
                    {"path": path, "label": label, "line": ln})
            else:
                idx = line.rfind(")")
                if idx >= 0:
                    exc["stack"].append(
                        {"path": "", "label": line[len("at "):idx + 1],
                         "line": 0})

    def go_stack(st: str, excs: list) -> None:
        # cause.go:552-605
        import re as _re
        plnre = _re.compile(r"([^:\s]+):(\d+)")
        gore = _re.compile(r"^goroutine.*\brunning\b.*:$")
        lines = st.split("\n")
        if len(lines) < 2:
            return
        exc = excs[0]
        exc["stack"] = []
        path, ln = "", 0
        i = 1
        while i < len(lines):
            line = lines[i]
            if gore.match(line):
                i += 1
                line = lines[i] if i < len(lines) else ""
            label = line
            i += 1
            line = lines[i] if i < len(lines) else ""
            m = plnre.search(line)
            if m:
                path = m.group(1)
                ln = int(m.group(2))
            exc["stack"].append(
                {"path": path, "label": label, "line": ln})
            i += 1

    out = []
    for ej, sid, sdk, rem, lang in zip(events_json, span_id, is_sdk,
                                       remote, language):
        events = json.loads(ej) if ej else []
        excs_all: list = []
        nid = [0]
        for ev in events:
            name = ev.get("name") or ""
            attrs = ev.get("attrs") or {}
            if name == "exception":
                etype = attrs.get("exception.type", "")
                msg = attrs.get("exception.message", "")
                st = attrs.get("exception.stacktrace", "")
                root = {"id": eid(sid, nid[0]), "type": etype,
                        "remote": bool(rem), "message": msg,
                        "stack": None, "cause": None}
                nid[0] += 1
                excs = [root]
                if st:
                    if lang in ("java", "php"):
                        java_stack(st, excs, sid, nid)
                    elif lang == "python":
                        python_stack(st, excs, sid, nid)
                    elif lang == "javascript":
                        js_stack(st, excs)
                    elif lang == "dotnet":
                        dotnet_stack(st, excs)
                    elif lang == "go":
                        go_stack(st, excs)
                excs_all.extend(excs)
            elif sdk and name == "HTTP request failure":
                code = attrs.get("http.response.status_code")
                emsg = attrs.get("aws.http.error_message")
                if code is not None and emsg is not None:
                    ep_us = (ev.get("ts_ns") or 0) // 1000
                    message = "@".join([
                        str(code), "%.6f" % (ep_us / 1_000_000), emsg])
                    excs_all.append(
                        {"id": eid(sid, nid[0]),
                         "type": "aws.http.error.event", "remote": True,
                         "message": message, "stack": None,
                         "cause": None})
                    nid[0] += 1
        out.append(json.dumps(excs_all))
    return pd.Series(out)


def _parse_exceptions_udf():
    # created lazily: module import must work on executors without an
    # active SparkContext (DDL-string return types need one)
    return pandas_udf(_parse_exceptions_batch, returnType="string")


def _mk_annotations(attr_entries: Column, res: Column,
                    store_resource: Column, indexed_attrs: tuple,
                    index_all: bool, idx_dynamic: Column,
                    allow_dot: bool):
    """makeXRayAttributes (segment.go:603-707) over an entry array.

    Returns (annotations_entries, default_metadata_entries,
    named_namespace_entries) — the caller maps them after the empty
    short-circuit."""
    def is_indexed(key: Column) -> Column:
        static = (F.lit(False) if not indexed_attrs else
                  key.isin(*indexed_attrs))
        return static | F.array_contains(idx_dynamic, key)

    res_entries = F.coalesce(F.map_entries(res), _earr())
    res_pref = F.transform(
        res_entries,
        lambda e: _entry(F.concat(F.lit("otel.resource."), e["key"]),
                         e["value"]))
    res_anno = F.when(
        store_resource,
        F.transform(
            F.filter(res_pref,
                     lambda e: (F.lit(index_all) | is_indexed(e["key"]))),
            lambda e: _entry(_fix_annotation_key(e["key"], allow_dot),
                             e["value"]))).otherwise(_earr())
    res_meta = F.when(
        store_resource,
        F.filter(res_pref,
                 lambda e: ~(F.lit(index_all) | is_indexed(e["key"])))
    ).otherwise(_earr())

    if index_all:
        attr_anno = F.transform(
            attr_entries,
            lambda e: _entry(_fix_annotation_key(e["key"], allow_dot),
                             e["value"]))
        attr_meta = _earr()
        ns_entries = _earr()
    else:
        attr_anno = F.transform(
            F.filter(attr_entries, lambda e: is_indexed(e["key"])),
            lambda e: _entry(_fix_annotation_key(e["key"], allow_dot),
                             e["value"]))
        is_meta_ns = (lambda e:
                      ~is_indexed(e["key"])
                      & e["key"].startswith("aws.xray.metadata."))
        ns_raw = F.filter(attr_entries, is_meta_ns)
        # invalid JSON keeps the raw pair in the default namespace
        parsed_ok = (lambda e: F.from_json(
            e["value"], "map<string,string>").isNotNull())
        ns_entries = F.filter(
            F.transform(
                ns_raw,
                lambda e: F.when(
                    parsed_ok(e)
                    & (F.lower(F.substring(e["key"], 19, 1000))
                       != "default"),
                    _entry(F.substring(e["key"], 19, 1000),
                           e["value"]))),
            lambda x: x.isNotNull())
        default_merge = F.flatten(F.filter(F.transform(
            ns_raw,
            lambda e: F.when(
                parsed_ok(e)
                & (F.lower(F.substring(e["key"], 19, 1000))
                   == "default"),
                F.map_entries(
                    F.from_json(e["value"], "map<string,string>")))
            .otherwise(F.when(~parsed_ok(e), F.array(e)))),
            lambda x: x.isNotNull()))
        attr_meta = F.concat(
            F.filter(attr_entries,
                     lambda e: ~is_indexed(e["key"])
                     & ~e["key"].startswith("aws.xray.metadata.")),
            default_merge)

    annotations = F.concat(res_anno, attr_anno)
    default_meta = F.concat(res_meta, attr_meta)
    return annotations, default_meta, ns_entries


def xray_export_segments(
    df: DataFrame,
    *,
    id_cols: list[str],
    indexed_attrs: tuple = (),
    index_all_attrs: bool = False,
    log_group_names: tuple = (),
    now_epoch: int | None = None,
    allow_dot: bool = True,
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
    events_col: str | None = "events",
    links_col: str | None = "links",
) -> DataFrame:
    attrs = F.col(attrs_col)
    res = F.col(res_attrs_col)
    kind = F.coalesce(F.col(kind_col), F.lit(0)).cast("int")
    status = F.coalesce(F.col(status_code_col), F.lit(0)).cast("int")
    smsg = F.coalesce(F.col(status_message_col), F.lit(""))
    parent = F.coalesce(F.col(parent_span_id_col), F.lit(""))
    events = (F.col(events_col) if events_col else F.lit(None).cast(
        "array<struct<ts_ns:bigint,name:string,"
        "attrs:map<string,string>>>"))
    links = (F.col(links_col) if links_col else F.lit(None).cast(
        "array<struct<trace_id:string,span_id:string,"
        "attrs:map<string,string>>>"))

    is_sdk = F.coalesce(_get(attrs, "rpc.system") == "aws-api",
                        F.lit(False))
    aws_local = _ne(_get(attrs, "aws.local.service"))
    aws_remote = _ne(_get(attrs, "aws.remote.service"))
    is_local_root = F.coalesce(
        _get(attrs, "aws.span.kind") == "LOCAL_ROOT", F.lit(False))

    def trim_sdk(n: Column) -> Column:
        return (F.when(is_sdk & n.startswith("AWS.SDK."),
                       F.substring(n, 9, 10000))
                .when(is_sdk & n.startswith("AWS::"),
                      F.substring(n, 6, 10000))
                .otherwise(n))

    # ---- name ladder (segment.go:355-449) ----------------------------
    db_system = F.coalesce(_get(attrs, "db.system"), F.lit(""))
    db_name = _ne(_get(attrs, "db.name"))
    db_conn = F.coalesce(_get(attrs, "db.connection_string"), F.lit(""))
    db_host = F.parse_url(
        F.regexp_replace(db_conn, "^jdbc:", ""), F.lit("HOST"))

    def ladder(remote_svc: Column):
        name1 = F.when(kind == 2, aws_local)
        name2 = F.when((kind == 1)
                       & (F.coalesce(_get(attrs, "aws.span.kind"),
                                     F.lit("")) == "LOCAL_ROOT"),
                       aws_local)
        name3 = F.when(kind.isin(3, 4, 5), trim_sdk(remote_svc))
        name4 = _ne(_get(attrs, "peer.service"))
        head = F.coalesce(name1, name2, name3, name4)
        aws_svc = _ne(_get(attrs, "aws.service"))
        name6 = F.when(
            db_name.isNotNull(),
            F.concat(db_name,
                     F.coalesce(F.concat(F.lit("@"), _ne(db_host)),
                                F.lit(""))))
        name11 = F.regexp_replace(F.coalesce(F.col(name_col),
                                             F.lit("")),
                                  _INVALID_NAME_RE, "")
        name11 = F.substring(name11, 1, 200)
        name11 = F.when(name11 == "", F.lit("span")).otherwise(name11)
        full = F.coalesce(
            head, aws_svc, name6,
            F.when(kind == 2, _ne(_get(res, "service.name"))),
            _ne(_get(attrs, "rpc.service")),
            _ne(_get(attrs, "http.host")),
            _ne(_get(attrs, "net.peer.name")),
            name11)
        ns = F.when(is_sdk, F.lit("aws")).when(
            head.isNull() & aws_svc.isNotNull(), F.lit("aws")).when(
            kind == 3, F.lit("remote"))
        return full, ns

    name_main, ns_main = ladder(aws_remote)
    # service segment recomputes the ladder with the four remote
    # annotations removed (segment.go:178-180) — only
    # aws.remote.service participates in the ladder
    name_svc_base, _ns_svc = ladder(F.lit(None).cast("string"))

    # ---- origin (segment.go:490-532) ---------------------------------
    provider = _get(res, "cloud.provider")
    platform = F.coalesce(_get(res, "cloud.platform"), F.lit(""))
    launch = F.coalesce(_get(res, "aws.ecs.launchtype"), F.lit(""))
    ecs_origin = (F.when(launch == "", F.lit("AWS::ECS::Container"))
                  .when(launch == "ec2", F.lit("AWS::ECS::EC2"))
                  .when(launch == "fargate", F.lit("AWS::ECS::Fargate"))
                  .otherwise(F.lit("AWS::ECS::Container")))
    origin = F.when(
        (F.size(F.coalesce(F.map_keys(res),
                           F.expr("array()").cast("array<string>")))
         == 0)
        | (provider.isNotNull() & (provider != "aws")), F.lit(""))
    for plat, org in _ORIGIN_PLATFORM:
        origin = origin.when(platform == plat, F.lit(org))
    origin = (origin.when(platform == "aws_ecs", ecs_origin)
              .when(platform != "", F.lit(""))  # non-AWS platform
              .otherwise(F.lit("")))

    # ---- http block (http.go) ----------------------------------------
    g = lambda k: _get(attrs, k)  # noqa: E731
    http_method = F.coalesce(g("http.method"), g("http.request.method"))
    client_ip_fwd = g("http.client_ip")
    ua = F.coalesce(g("http.user_agent"), g("user_agent.original"))
    http_status = F.coalesce(
        g("http.status_code"),
        g("http.response.status_code")).try_cast("bigint")
    url_full = F.coalesce(g("http.url"), g("url.full"))
    scheme = F.coalesce(g("http.scheme"), g("url.scheme"))
    http_host = g("http.host")
    http_target = g("http.target")
    server_name = g("http.server_name")
    net_host_port = g("net.host.port")
    host_name_a = g("host.name")
    net_host_name = g("net.host.name")
    net_peer_name = g("net.peer.name")
    net_peer_port = g("net.peer.port")
    net_peer_ip = g("net.peer.ip")
    ip_like = lambda c: c.rlike(  # noqa: E731
        r"^(\d{1,3}(\.\d{1,3}){3}|[0-9a-fA-F:]*:[0-9a-fA-F:]*)$")
    npa = g("network.peer.address")
    npa_ip = F.when(F.coalesce(ip_like(npa), F.lit(False)), npa)
    ca = g("client.address")
    ca_ip = F.when(F.coalesce(ip_like(ca), F.lit(False)), ca)
    url_path = g("url.path")
    url_query = g("url.query")
    server_addr = g("server.address")
    server_port = g("server.port")

    has_http = F.coalesce(
        http_method.isNotNull() | client_ip_fwd.isNotNull()
        | ua.isNotNull() | http_status.isNotNull()
        | url_full.isNotNull() | scheme.isNotNull()
        | http_host.isNotNull() | http_target.isNotNull()
        | server_name.isNotNull() | net_host_port.isNotNull()
        | url_path.isNotNull() | url_query.isNotNull(), F.lit(False))
    has_url_attrs = F.coalesce(
        url_full.isNotNull() | http_host.isNotNull()
        | server_name.isNotNull() | host_name_a.isNotNull()
        | net_host_name.isNotNull() | net_peer_name.isNotNull()
        | net_peer_ip.isNotNull() | npa_ip.isNotNull()
        | server_addr.isNotNull(), F.lit(False))
    has_net_peer = net_peer_ip.isNotNull() | npa_ip.isNotNull()
    client_ip = F.coalesce(client_ip_fwd, net_peer_ip, npa_ip, ca_ip)
    x_fwd = F.when(~has_net_peer & client_ip.isNotNull(), F.lit(True))

    scheme2 = F.coalesce(scheme, F.lit("http"))

    def build_url(host: Column, port: Column) -> Column:
        port_part = F.when(
            port.isNotNull() & (port != "")
            & ~((scheme2 == "http") & (port == "80"))
            & ~((scheme2 == "https") & (port == "443")),
            F.concat(F.lit(":"), port)).otherwise(F.lit(""))
        tail = F.coalesce(
            http_target,
            F.concat(
                F.coalesce(url_path, F.lit("/")),
                F.coalesce(
                    F.when(url_query.isNotNull(),
                           F.when(url_query.startswith("?"), url_query)
                           .otherwise(F.concat(F.lit("?"), url_query))),
                    F.lit(""))))
        return F.concat(scheme2, F.lit("://"), F.coalesce(host,
                                                          F.lit("")),
                        port_part, tail)

    client_url = F.coalesce(
        url_full,
        build_url(F.coalesce(http_host, net_peer_name, net_peer_ip),
                  F.when(http_host.isNull(), net_peer_port)))
    server_url = F.coalesce(
        url_full,
        build_url(
            F.coalesce(http_host, server_name, net_host_name,
                       host_name_a, server_addr),
            F.when(http_host.isNull(),
                   F.coalesce(net_host_port, server_port))))
    http_url = F.when(has_http & has_url_attrs,
                      F.when(kind == 2, server_url)
                      .otherwise(client_url))

    psize = "messaging.message.payload_size_bytes"
    span_rsize = F.when(
        F.coalesce(g("message.type") == "RECEIVED", F.lit(False)),
        F.coalesce(g(psize).try_cast("bigint"), F.lit(0))).otherwise(
        F.lit(0))
    ev_rsize = F.coalesce(
        F.try_element_at(
            F.filter(
                F.transform(
                    F.coalesce(events, F.expr(
                        "array()").cast(
                        "array<struct<ts_ns:bigint,name:string,"
                        "attrs:map<string,string>>>")),
                    lambda ev: F.when(
                        F.coalesce(
                            F.element_at(ev["attrs"],
                                         F.lit("message.type"))
                            == "RECEIVED", F.lit(False)),
                        F.coalesce(
                            F.element_at(ev["attrs"], F.lit(psize))
                            .try_cast("bigint"), F.lit(0)))
                    .otherwise(F.lit(0))),
                lambda s: s != 0), F.lit(1)), F.lit(0))
    content_len = F.when(span_rsize != 0, span_rsize).otherwise(
        ev_rsize)

    # ---- fault / error / throttle (cause.go:157-187) -----------------
    code_ok = http_status.isNotNull()
    is_error = F.coalesce(code_ok & (http_status >= 400)
                          & (http_status <= 499), F.lit(False))
    is_throttle = F.coalesce(code_ok & (http_status == 429),
                             F.lit(False))
    is_fault = F.coalesce(
        F.when(~code_ok | (http_status < 400) | (http_status > 599),
               status == 2)
        .otherwise((http_status >= 500) & (http_status <= 599)),
        F.lit(False))

    has_exc_events = F.coalesce(F.exists(
        events, lambda ev: (ev["name"] == "exception")
        | (is_sdk & (ev["name"] == "HTTP request failure"))),
        F.lit(False))
    status_text = _ne(_get(attrs, "http.status_text"))
    fallback_msg = F.coalesce(_ne(smsg), status_text)
    lang = F.coalesce(_get(res, "telemetry.sdk.language"), F.lit(""))
    remote_exc = kind.isin(3, 4)

    # ---- aws block (aws.go) ------------------------------------------
    r = lambda k: _get(res, k)  # noqa: E731
    cloud = F.coalesce(r("cloud.provider"), F.lit(""))
    aws_ok = (cloud == "aws") | (cloud == "")
    operation = F.coalesce(g("aws.operation"), g("rpc.method"))
    account = F.coalesce(_ne(g("aws.account_id")),
                         r("cloud.account.id"))
    remote_region = g("aws.region")
    request_id = F.coalesce(g("aws.request_id"), g("aws.requestId"))
    queue_url = F.coalesce(g("messaging.url"), g("aws.queue_url"),
                           g("aws.queue.url"))
    table_name = F.coalesce(g("aws.dynamodb.table_names"),
                            g("aws.table_name"), g("aws.table.name"))
    zone = r("cloud.availability_zone")
    host_id = F.coalesce(r("host.id"), F.lit(""))
    ec2 = F.when(
        (platform == "aws_ec2") | (host_id != ""),
        F.struct(host_id.alias("instance_id"),
                 F.coalesce(zone, F.lit("")).alias("availability_zone"),
                 F.coalesce(r("host.type"), F.lit(""))
                 .alias("instance_size"),
                 F.coalesce(r("host.image.id"), F.lit(""))
                 .alias("ami_id")))
    ecs = F.when(
        platform == "aws_ecs",
        F.struct(F.coalesce(r("container.name"), F.lit(""))
                 .alias("container_name"),
                 F.coalesce(r("container.id"), F.lit(""))
                 .alias("container_id"),
                 F.coalesce(zone, F.lit(""))
                 .alias("availability_zone"),
                 F.coalesce(r("aws.ecs.container.arn"), F.lit(""))
                 .alias("container_arn"),
                 F.coalesce(r("aws.ecs.cluster.arn"), F.lit(""))
                 .alias("cluster_arn"),
                 F.coalesce(r("aws.ecs.task.arn"), F.lit(""))
                 .alias("task_arn"),
                 F.coalesce(r("aws.ecs.task.family"), F.lit(""))
                 .alias("task_family"),
                 F.coalesce(r("aws.ecs.launchtype"), F.lit(""))
                 .alias("launch_type")))
    deploy_id = F.coalesce(r("service.instance.id"), F.lit(""))
    beanstalk = F.when(
        (platform == "aws_elastic_beanstalk") & (deploy_id != ""),
        F.struct(F.coalesce(r("service.namespace"), F.lit(""))
                 .alias("environment"),
                 F.coalesce(deploy_id.try_cast("bigint"), F.lit(0))
                 .alias("deployment_id"),
                 F.coalesce(r("service.version"), F.lit(""))
                 .alias("version_label")))
    cluster_name = F.coalesce(r("k8s.cluster.name"), F.lit(""))
    eks = F.when(
        (platform == "aws_eks") | (cluster_name != ""),
        F.struct(cluster_name.alias("cluster_name"),
                 F.coalesce(r("k8s.pod.name"), F.lit("")).alias("pod"),
                 F.coalesce(r("container.id"), F.lit(""))
                 .alias("container_id")))
    arn_groups = F.filter(
        F.split(F.coalesce(r("aws.log.group.arns"), F.lit("")), "&"),
        lambda x: x != "")
    name_groups = F.filter(
        F.split(F.coalesce(r("aws.log.group.names"), F.lit("")), "&"),
        lambda x: x != "")
    cfg_groups = (F.array(*[F.lit(x) for x in log_group_names])
                  if log_group_names
                  else F.expr("array()").cast("array<string>"))
    cwl = F.when(
        F.size(arn_groups) > 0,
        F.transform(arn_groups, lambda a: F.struct(
            F.when(F.size(F.split(a, ":")) >= 7,
                   F.element_at(F.split(a, ":"), 7)).otherwise(a)
            .alias("log_group"),
            a.alias("arn")))).when(
        F.size(name_groups) > 0,
        F.transform(name_groups, lambda n_: F.struct(
            n_.alias("log_group"),
            F.lit(None).cast("string").alias("arn")))).otherwise(
        F.transform(cfg_groups, lambda n_: F.struct(
            n_.alias("log_group"),
            F.lit(None).cast("string").alias("arn"))))
    sdk_name = F.coalesce(r("telemetry.sdk.name"), F.lit(""))
    sdk_lang = F.coalesce(r("telemetry.sdk.language"), F.lit(""))
    sdk = F.when((sdk_name != "") & (sdk_lang != ""),
                 F.concat(sdk_name, F.lit(" for "), sdk_lang)) \
        .otherwise(sdk_name)
    auto = F.coalesce(r("telemetry.auto.version"),
                      r("telemetry.distro.version"))

    # ---- sql block (sql.go) ------------------------------------------
    has_sql = db_system.isin(*_SQL_SYSTEMS)
    sql_conn = F.concat(
        F.when(db_conn == "", F.lit("localhost")).otherwise(db_conn),
        F.lit("/"), F.coalesce(db_name, F.lit("")))

    # ---- annotations / metadata --------------------------------------
    idx_dynamic = F.filter(
        F.split(F.coalesce(_get(attrs, "aws.xray.annotations"),
                           F.lit("")), ","),
        lambda x: x != "")
    user = _get(attrs, "enduser.id")

    consumed = list({*_HTTP_KEYS, *_AWS_KEYS, "enduser.id",
                     "aws.xray.annotations"})
    base_entries = F.filter(
        F.coalesce(F.map_entries(attrs), _earr()),
        lambda e: ~e["key"].isin(*consumed)
        & ~(F.lit(bool(True)) & has_sql & e["key"].isin(*_DB_KEYS))
        & ~((e["key"] == "http.status_text")
            & ~has_exc_events & (status == 2)))
    # addSpecialAttributes (segment.go:590-601): indexed attrs that
    # were consumed above are re-added from the raw attribute map
    if indexed_attrs:
        readd = F.filter(
            F.transform(
                F.array(*[F.lit(k) for k in indexed_attrs]),
                lambda k: F.when(
                    F.element_at(attrs, k).isNotNull()
                    & ~F.exists(base_entries,
                                lambda e: e["key"] == k),
                    _entry(k, F.element_at(attrs, k)))),
            lambda x: x.isNotNull())
        base_entries = F.concat(base_entries, readd)

    store_resource = (kind == 2) | (parent == "")
    anno_main, meta_main, ns_main_m = _mk_annotations(
        base_entries, res, store_resource, indexed_attrs,
        index_all_attrs, idx_dynamic, allow_dot)
    svc_entries = F.filter(base_entries,
                           lambda e: ~e["key"].isin(*_SVC_REMOVED))
    anno_svc, meta_svc, ns_svc_m = _mk_annotations(
        svc_entries, res, store_resource, indexed_attrs,
        index_all_attrs, idx_dynamic, allow_dot)

    res_empty = (F.size(F.coalesce(
        F.map_keys(res), F.expr("array()").cast("array<string>")))
        == 0)
    empty_short = (F.size(base_entries) == 0) & (
        ~store_resource | res_empty)
    empty_short_svc = (F.size(svc_entries) == 0) & (
        ~store_resource | res_empty)

    # ---- links (span_links.go) ---------------------------------------
    links_out = F.when(
        links.isNotNull(),
        F.transform(links, lambda ln: F.struct(
            ln["span_id"].alias("span_id"),
            _amazon_trace_id(ln["trace_id"]).alias("trace_id"),
            ln["attrs"].alias("attrs"))))

    # ---- trace id + validity -----------------------------------------
    tid = F.coalesce(F.col(trace_id_col), F.lit(""))
    tid_ok = tid.rlike("^[0-9a-f]{32}$")
    if now_epoch is not None:
        epoch = F.conv(F.substring(tid, 1, 8), 16, 10).cast("bigint")
        delta = F.lit(int(now_epoch)) - epoch
        tid_ok = tid_ok & (delta <= 60 * 60 * 24 * 28) \
            & (delta >= -60 * 5)
    link_ok = F.coalesce(
        F.forall(links, lambda ln:
                 ln["trace_id"].rlike("^[0-9a-f]{32}$")), F.lit(True))

    seg_type = F.when((kind != 2) & (parent != ""),
                      F.lit("subsegment"))
    ns_nlr = F.when(
        kind.isin(3, 4, 5) & seg_type.isNotNull() & ns_main.isNull()
        & _get(attrs, "aws.remote.service").isNotNull(),
        F.lit("remote")).otherwise(ns_main)

    svc_seg_id = F.substring(
        F.md5(F.concat(tid, F.col(span_id_col))), 1, 16)

    stage1 = df.select(
        *id_cols,
        F.col(span_id_col).alias("_sid"), tid.alias("_tid"),
        parent.alias("_parent"), kind.alias("_kind"),
        (~tid_ok | ~link_ok).alias("err"),
        _amazon_trace_id(tid).alias("_amz"),
        (F.col(start_ns_col).cast("double") / 1e9).alias("start_time"),
        (F.col(end_ns_col).cast("double") / 1e9).alias("end_time"),
        name_main.alias("_name_main"),
        F.coalesce(aws_local, name_svc_base).alias("_name_svc"),
        F.when(aws_remote.isNotNull(),
               trim_sdk(aws_remote)).alias("_name_dep"),
        seg_type.alias("_type"), ns_nlr.alias("_ns"),
        is_local_root.alias("_lr"),
        origin.alias("origin"),
        F.coalesce(user, F.lit("")).alias("user"),
        (is_error).alias("error"), is_fault.alias("fault"),
        is_throttle.alias("throttle"),
        F.when(has_http, F.struct(
            http_method.alias("method"), client_ip.alias("client_ip"),
            ua.alias("user_agent"), x_fwd.alias("x_forwarded_for"),
            http_url.alias("url"), http_status.alias("status"),
            content_len.alias("content_length"))).alias("http"),
        F.when(aws_ok, F.struct(
            F.coalesce(account, F.lit("")).alias("account_id"),
            F.coalesce(operation, F.lit("")).alias("operation"),
            F.coalesce(remote_region, F.lit(""))
            .alias("remote_region"),
            F.coalesce(request_id, F.lit("")).alias("request_id"),
            F.coalesce(queue_url, F.lit("")).alias("queue_url"),
            F.coalesce(table_name, F.lit("")).alias("table_name"),
            ec2.alias("ec2"), ecs.alias("ecs"),
            beanstalk.alias("beanstalk"), eks.alias("eks"),
            cwl.alias("cwlogs"), sdk.alias("sdk"),
            F.coalesce(r("telemetry.sdk.version"), F.lit(""))
            .alias("sdk_version"),
            auto.isNotNull().alias("auto_instrumentation"),
        )).alias("aws"),
        F.when(has_sql, F.struct(
            F.coalesce(F.col(name_col), F.lit("")).alias("url"),
            sql_conn.alias("connection_string"),
            db_system.alias("database_type"),
            F.coalesce(g("db.user"), F.lit("")).alias("user"),
            F.coalesce(g("db.statement"), F.lit(""))
            .alias("sanitized_query"))).alias("sql"),
        has_exc_events.alias("_has_exc"),
        fallback_msg.alias("_fb_msg"),
        (status == 2).alias("_status_err"),
        F.when(has_exc_events,
               F.to_json(events)).alias("_events_json"),
        is_sdk.alias("_is_sdk"), remote_exc.alias("_remote_exc"),
        lang.alias("_lang"),
        F.when(~empty_short,
               F.map_from_entries(anno_main)).alias("_anno_main"),
        F.when(~empty_short,
               F.map_from_entries(meta_main)).alias("_meta_main"),
        F.when(~empty_short,
               F.map_from_entries(ns_main_m)).alias("_meta_ns_main"),
        F.when(~empty_short_svc,
               F.map_from_entries(anno_svc)).alias("_anno_svc"),
        F.when(~empty_short_svc, F.map_from_entries(
            F.filter(meta_svc,
                     lambda e: e["key"].startswith("otel.resource."))))
        .alias("_meta_svc"),
        F.when(~empty_short_svc,
               F.transform_values(F.map_from_entries(ns_svc_m),
                                  lambda _k, _v: F.lit("{}")))
        .alias("_meta_ns_svc"),
        links_out.alias("_links_out"),
        svc_seg_id.alias("_svc_id"),
    )

    # exception list: parsed events, else the status fallback
    _parse_exceptions = _parse_exceptions_udf()
    exc_parsed = F.when(
        F.col("_has_exc"),
        F.from_json(
            _parse_exceptions(F.col("_events_json"), F.col("_sid"),
                              F.col("_is_sdk"), F.col("_remote_exc"),
                              F.col("_lang")), _EXC_T))
    exc_fallback = F.when(
        ~F.col("_has_exc") & F.col("_status_err")
        & F.col("_fb_msg").isNotNull(),
        F.array(F.struct(
            F.substring(F.md5(F.concat(F.col("_sid"), F.lit(":exc:0"))),
                        1, 16).alias("id"),
            F.lit("").alias("type"), F.col("_fb_msg").alias("message"),
            F.lit(None).cast("boolean").alias("remote"),
            F.lit(None).cast("string").alias("cause"),
            F.lit(None).cast(
                "array<struct<path:string,label:string,line:int>>")
            .alias("stack"))))
    stage2 = stage1.withColumn(
        "_exceptions", F.coalesce(exc_parsed, exc_fallback))

    # ---- local-root fan (segment.go:250-283) -------------------------
    dep_fan = F.col("_lr") & ~F.col("_kind").isin(1, 2)
    roles = F.when(dep_fan, F.array(F.lit("dep"), F.lit("svc"))) \
        .when(F.col("_lr"), F.array(F.lit("main_lr"))) \
        .otherwise(F.array(F.lit("main")))
    fanned = stage2.withColumn("role", F.explode(roles))

    role = F.col("role")
    is_dep, is_svc = role == "dep", role == "svc"
    is_main_lr = role == "main_lr"
    out_id = F.when(is_svc, F.col("_svc_id")).otherwise(F.col("_sid"))
    out_parent = F.when(is_dep, F.col("_svc_id")) \
        .otherwise(F.col("_parent"))
    out_type = F.when(is_dep, F.lit("subsegment")) \
        .when(is_svc | is_main_lr, F.lit(None)) \
        .otherwise(F.col("_type"))
    out_ns = F.when(is_dep, F.coalesce(F.col("_ns"), F.lit("remote"))) \
        .when(is_svc | is_main_lr, F.lit(None)) \
        .otherwise(F.col("_ns"))
    out_name = F.when(is_svc, F.col("_name_svc")) \
        .when(is_dep, F.coalesce(F.col("_name_dep"),
                                 F.col("_name_main"))) \
        .otherwise(F.col("_name_main"))
    consumer = F.col("_kind") == 5
    out_links = F.when(is_dep & consumer, F.lit(None)) \
        .when(is_svc & ~consumer, F.lit(None)) \
        .otherwise(F.col("_links_out"))
    aws_c = F.col("aws")
    out_aws = F.when(
        is_svc & aws_c.isNotNull(),
        F.struct(F.lit("").alias("account_id"),
                 F.lit("").alias("operation"),
                 F.lit("").alias("remote_region"),
                 F.lit("").alias("request_id"),
                 F.lit("").alias("queue_url"),
                 F.lit("").alias("table_name"),
                 aws_c["ec2"].alias("ec2"), aws_c["ecs"].alias("ecs"),
                 aws_c["beanstalk"].alias("beanstalk"),
                 aws_c["eks"].alias("eks"),
                 aws_c["cwlogs"].alias("cwlogs"),
                 aws_c["sdk"].alias("sdk"),
                 aws_c["sdk_version"].alias("sdk_version"),
                 aws_c["auto_instrumentation"]
                 .alias("auto_instrumentation"))) \
        .otherwise(aws_c)

    return fanned.select(
        *id_cols, "role", "err",
        out_id.alias("seg_id"),
        F.col("_amz").alias("amazon_trace_id"),
        out_name.alias("name"),
        out_parent.alias("parent_id"),
        out_type.alias("seg_type"),
        out_ns.alias("namespace"),
        "start_time", "end_time", "origin", "user",
        "error", "fault", "throttle",
        F.when(is_svc, F.lit(None)).otherwise(F.col("http"))
        .alias("http"),
        out_aws.alias("aws"),
        F.col("sql").alias("sql"),
        F.col("_exceptions").alias("exceptions"),
        F.when(is_svc, F.col("_anno_svc"))
        .otherwise(F.col("_anno_main")).alias("annotations"),
        F.when(is_svc, F.col("_meta_svc"))
        .otherwise(F.col("_meta_main")).alias("metadata_default"),
        F.when(is_svc, F.col("_meta_ns_svc"))
        .otherwise(F.col("_meta_ns_main")).alias("metadata_ns"),
        out_links.alias("links"),
    )

"""AWS X-Ray segment → OTLP span translation.

Re-expresses ``receiver/awsxrayreceiver/internal/translator``
(translator.go:28-242 + name/http/time/aws/sql/cause/annotations/
metadata/sdk helpers) over a DataFrame of X-Ray segment documents
(one JSON document per row — the UDP daemon packet body after the
``{"format":"json","version":1}`` header line). Semantics mirrored
and pinned by ``tests/test_round5_xray.py``:

- ids (translator.go:216-242): trace ``1-5f84c7a1-e7d1852d...`` →
  chars [2:10]+[11:] hex-decoded to 16 bytes (so the string must be
  exactly 35 chars of valid hex); span ids are 16 hex chars;
- subsegments flatten to sibling spans (:77-110): the root's
  trace id is inherited unless the subsegment carries its own; a
  subsegment's parent is ALWAYS the enclosing segment's id (its own
  ``parent_id`` field is only honored on the root, :137-149);
- kind (name.go + translator.go:160-164): no parent → server
  (overrides everything); else namespace aws/remote → client,
  namespace nil/local → server when ``http.request.client_ip`` is
  present else internal; any other namespace rejects the document;
- status: ``http.response.status`` through StatusCodeFromHTTP
  (100-398 → unset, else error); a ``cause`` forces error when still
  unset; a string cause puts the exception id in the status message
  (cause.go:23-41). The parent-status "refinement" loop
  (translator.go:94-106) is a verified no-op — both sides can only
  ever be Unset or Error — and is carried as documentation, not code;
- resource (translator.go:185-200 + aws.go:9-56 + sdk.go): built from
  the ROOT segment only; cloud.provider is "unknown" without an
  ``aws`` object; ECS az / EKS container id override EC2 / ECS via
  map upsert; beanstalk deployment id renders as a decimal string;
  sdk language is "java" when the root cause has exceptions, else the
  suffix after "for " in the SDK name;
- span attrs: aws.service (aws namespace), aws.xray.inprogress,
  enduser.id, the http request/response set (content_length keeps a
  string verbatim and truncates a float to int, http.go:39-46), the
  aws operation set, sql (``sql.url`` split on ``^(.+//.+)/([^?]+)``
  — a non-matching url rejects the document), aws.xray.traced,
  annotations (typed values — JSON numbers are float64 in Go, so the
  int branches are dead code; annotation keys are also recorded under
  ``aws.xray.annotations``), and ``aws.xray.metadata.<key>`` holding
  each metadata block as canonical sorted JSON (Go json.Marshal sorts
  map keys; so does to_json(variant));
- events (cause.go:42-70): one "exception" event per cause exception,
  with the ``<type>: <msg>\\n\\tat <label>(<path>: <line>)\\n`` stack
  rendering (line "<unknown>" when absent);
- any per-span failure (bad id/namespace/sql) rejects the WHOLE
  document (the translator error bubbles to the packet level,
  translator.go:68-72) → every row of the document carries
  ``xr_ok`` false.

Documented divergences: subsegment nesting is bounded at
``max_depth`` (default 4); content below the bound is not parsed
(the reference recurses unboundedly — real SDK documents nest 1-2
levels). Annotation keys in ``aws.xray.annotations`` are sorted (Go
map iteration order is random).

Plan shape: one ``from_json`` over the document, then one union
branch per nesting level — each a zero-shuffle codegen projection
with its own explode chain; no Python.
"""
from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .zipkin import _canon, _tok, _zk_fold_whole

_HTTP = (
    "struct<request:struct<method:string,url:string,user_agent:string,"
    "client_ip:string,x_forwarded_for:boolean>,"
    "response:struct<status:long,content_length:variant>>"
)
_AWS = (
    "struct<account_id:string,operation:string,remote_region:string,"
    "request_id:string,queue_url:string,table_name:string,retries:long,"
    "elastic_beanstalk:struct<environment_name:string,deployment_id:long,"
    "version_label:string>,"
    "cloudwatch_logs:array<struct<log_group:string,arn:string>>,"
    "ecs:struct<container:string,availability_zone:string,"
    "container_id:string>,"
    "ec2:struct<instance_id:string,availability_zone:string,"
    "instance_size:string,ami_id:string>,"
    "eks:struct<container_id:string,cluster_name:string,pod:string>,"
    "xray:struct<sdk:string,sdk_version:string>>"
)
_EXC = (
    "struct<id:string,message:string,type:string,remote:boolean,"
    "truncated:long,skipped:long,cause:string,"
    "stack:array<struct<path:string,line:long,label:string>>>"
)
_SQL = (
    "struct<connection_string:string,url:string,sanitized_query:string,"
    "database_type:string,database_version:string,driver_version:string,"
    "user:string>"
)

_SQL_URL_RE = r"^(.+//.+)/([^\?]+)\??.*$"  # sql.go:34
_HEX16 = r"^[0-9a-fA-F]{16}$"
_TRACE_RE = r"^[0-9a-fA-F]-[0-9a-fA-F]{8}-[0-9a-fA-F]{24}$"
_NUM_RE = r"^(DOUBLE|DECIMAL|FLOAT|BIGINT|INT|SMALLINT|TINYINT)"


def _seg_schema(depth: int) -> str:
    sub = f",subsegments:array<{_seg_schema(depth - 1)}>" if depth > 0 else ""
    return (
        "struct<name:string,id:string,start_time:double,trace_id:string,"
        "end_time:double,in_progress:boolean,user:string,origin:string,"
        "resource_arn:string,parent_id:string,namespace:string,"
        "traced:boolean,"
        f"http:{_HTTP},aws:{_AWS},"
        "cause:variant,"
        "annotations:map<string,variant>,"
        "metadata:map<string,variant>,"
        f"sql:{_SQL},"
        "service:struct<version:string>"
        f"{sub}>"
    )


def _cause_exceptions(cause: Column) -> Column:
    """Cause-object exceptions; [] for a string cause or none."""
    obj = F.try_variant_get(cause, "$.exceptions", f"array<{_EXC}>")
    return F.coalesce(obj, F.from_json(F.lit("[]"), f"array<{_EXC}>"))


def _cause_id(cause: Column) -> Column:
    """String-form cause → the exception id (cause.go:30-33)."""
    return F.when(
        F.schema_of_variant(cause) == "STRING",
        F.try_variant_get(cause, "$", "string"),
    )


def _bool_str(c: Column) -> Column:
    return F.when(c, "true").otherwise("false")


def _opt(cond_col: Column, key: str, value: Column) -> Column:
    return F.when(cond_col.isNotNull(), _tok(F.lit(key), value))


def _seg_ok(s: Column) -> Column:
    """Per-node checks whose failure rejects the whole document."""
    trace_ok = s["trace_id"].isNull() | s["trace_id"].rlike(_TRACE_RE)
    id_ok = s["id"].isNotNull() & s["id"].rlike(_HEX16)
    parent_ok = s["parent_id"].isNull() | s["parent_id"].rlike(_HEX16)
    ns_ok = s["namespace"].isNull() | s["namespace"].isin(
        "aws", "remote", "local"
    )
    sql_ok = (
        s["sql"].isNull()
        | s["sql"]["url"].isNull()
        | s["sql"]["url"].rlike(_SQL_URL_RE)
    )
    required = s["name"].isNotNull() & s["start_time"].isNotNull()
    return trace_ok & id_ok & parent_ok & ns_ok & sql_ok & required


def _exc_token(x: Column) -> Column:
    stack = F.coalesce(
        x["stack"],
        F.from_json(
            F.lit("[]"), "array<struct<path:string,line:long,label:string>>"
        ),
    )
    frame = lambda f: F.concat(  # noqa: E731
        F.lit("\tat "), F.coalesce(f["label"], F.lit("")), F.lit("("),
        F.coalesce(f["path"], F.lit("")), F.lit(": "),
        F.coalesce(f["line"].cast("string"), F.lit("<unknown>")),
        F.lit(")\n"),
    )
    trace_str = F.concat(
        F.coalesce(x["type"], F.lit("")), F.lit(": "),
        F.coalesce(x["message"], F.lit("")), F.lit("\n"),
        F.array_join(F.transform(stack, frame), ""),
    )
    toks = F.filter(
        F.array(
            _tok(F.lit("aws.xray.exception.id"), F.coalesce(x["id"], F.lit(""))),
            _opt(x["message"], "exception.message", x["message"]),
            _opt(x["type"], "exception.type", x["type"]),
            _opt(x["remote"], "aws.xray.exception.remote", _bool_str(x["remote"])),
            _opt(
                x["truncated"], "aws.xray.exception.truncated",
                x["truncated"].cast("string"),
            ),
            _opt(
                x["skipped"], "aws.xray.exception.skipped",
                x["skipped"].cast("string"),
            ),
            _opt(x["cause"], "aws.xray.exception.cause", x["cause"]),
            F.when(
                F.size(stack) > 0,
                _tok(F.lit("exception.stacktrace"), trace_str),
            ),
        ),
        lambda t: t.isNotNull(),
    )
    return F.concat_ws(
        "|", F.lit("exception"), F.array_join(F.array_sort(toks), ",")
    )


def _span_cols(s: Column, root_trace: Column, parent: Column) -> dict:
    """populateSpan (:112-183) for one segment node; ``parent`` is the
    enclosing segment's id (null on the root)."""
    trace_raw = F.coalesce(s["trace_id"], root_trace)
    trace_hex = F.lower(
        F.concat(F.substring(trace_raw, 3, 8), F.substring(trace_raw, 12, 24))
    )
    parent_raw = F.coalesce(parent, s["parent_id"])
    parent_hex = F.when(parent_raw.isNotNull(), F.lower(parent_raw))

    req, resp = s["http"]["request"], s["http"]["response"]
    has_client_ip = req["client_ip"].isNotNull()
    ns = s["namespace"]
    kind = F.when(parent_raw.isNull(), F.lit("server")).otherwise(
        F.when(ns.isin("aws", "remote"), F.lit("client"))
        .when(has_client_ip, F.lit("server"))
        .otherwise(F.lit("internal"))
    )

    status = resp["status"]
    http_err = F.when(
        status.isNotNull() & ~((status >= 100) & (status < 399)), F.lit(2)
    )
    cause = s["cause"]
    status_code = F.coalesce(http_err, F.when(cause.isNotNull(), F.lit(2)))
    # only a string cause carries a message; pdata default is ""
    status_msg = F.when(
        status_code.isNotNull(), F.coalesce(_cause_id(cause), F.lit(""))
    )

    cl = resp["content_length"]
    cl_type = F.schema_of_variant(cl)
    content_length = F.when(
        cl_type == "STRING", F.try_variant_get(cl, "$", "string")
    ).when(
        cl_type.rlike(_NUM_RE),
        F.try_variant_get(cl, "$", "double").cast("long").cast("string"),
    )

    annos = F.coalesce(
        s["annotations"], F.from_json(F.lit("{}"), "map<string,variant>")
    )
    anno_ents = F.map_entries(annos)

    def _anno_tok(e: Column) -> Column:
        t = F.schema_of_variant(e["value"])
        val = (
            F.when(t == "STRING", F.try_variant_get(e["value"], "$", "string"))
            .when(
                t == "BOOLEAN",
                _bool_str(F.try_variant_get(e["value"], "$", "boolean")),
            )
            .when(t.rlike(_NUM_RE), _zk_fold_whole(e["value"]))
        )  # any other type: dropped (annotations.go default branch)
        return F.when(val.isNotNull(), _tok(e["key"], val))

    anno_keys_json = F.when(
        F.size(anno_ents) > 0,
        F.concat(
            F.lit('["'),
            F.array_join(
                F.array_sort(F.transform(anno_ents, lambda e: e["key"])), '","'
            ),
            F.lit('"]'),
        ),
    )

    meta = F.coalesce(
        s["metadata"], F.from_json(F.lit("{}"), "map<string,variant>")
    )
    meta_toks = F.transform(
        F.map_entries(meta),
        lambda e: _tok(
            F.concat(F.lit("aws.xray.metadata."), e["key"]),
            F.to_json(e["value"]),
        ),
    )

    aws, sql = s["aws"], s["sql"]
    sql_url = sql["url"]
    attr_toks = F.filter(
        F.concat(
            F.array(
                F.when(ns == "aws", _tok(F.lit("aws.service"), s["name"])),
                _opt(
                    s["in_progress"], "aws.xray.inprogress",
                    _bool_str(s["in_progress"]),
                ),
                _opt(s["user"], "enduser.id", s["user"]),
                _opt(req["method"], "http.method", req["method"]),
                _opt(req["client_ip"], "http.client_ip", req["client_ip"]),
                _opt(req["user_agent"], "http.user_agent", req["user_agent"]),
                _opt(req["url"], "http.url", req["url"]),
                _opt(
                    req["x_forwarded_for"], "aws.xray.x_forwarded_for",
                    _bool_str(req["x_forwarded_for"]),
                ),
                _opt(status, "http.status_code", status.cast("string")),
                _opt(
                    content_length, "http.response_content_length",
                    content_length,
                ),
                _opt(aws["account_id"], "aws.account_id", aws["account_id"]),
                _opt(aws["operation"], "aws.operation", aws["operation"]),
                _opt(aws["remote_region"], "aws.region", aws["remote_region"]),
                _opt(aws["request_id"], "aws.request_id", aws["request_id"]),
                _opt(aws["queue_url"], "aws.queue_url", aws["queue_url"]),
                _opt(aws["table_name"], "aws.table_name", aws["table_name"]),
                _opt(
                    aws["retries"], "aws.xray.retries",
                    aws["retries"].cast("string"),
                ),
                _opt(
                    sql_url, "db.connection_string",
                    F.regexp_extract(sql_url, _SQL_URL_RE, 1),
                ),
                _opt(
                    sql_url, "db.name",
                    F.regexp_extract(sql_url, _SQL_URL_RE, 2),
                ),
                _opt(sql["database_type"], "db.system", sql["database_type"]),
                _opt(
                    sql["sanitized_query"], "db.statement",
                    sql["sanitized_query"],
                ),
                _opt(sql["user"], "db.user", sql["user"]),
                _opt(s["traced"], "aws.xray.traced", _bool_str(s["traced"])),
                F.when(
                    anno_keys_json.isNotNull(),
                    _tok(F.lit("aws.xray.annotations"), anno_keys_json),
                ),
            ),
            F.filter(F.transform(anno_ents, _anno_tok), lambda x: x.isNotNull()),
            meta_toks,
        ),
        lambda x: x.isNotNull(),
    )

    events = F.transform(_cause_exceptions(cause), _exc_token)

    return {
        "xr_trace_id": trace_hex,
        "xr_span_id": F.lower(s["id"]),
        "xr_parent_id": parent_hex,
        "xr_name": F.coalesce(s["name"], F.lit("")),
        "xr_kind": kind,
        "xr_start_ns": (F.coalesce(s["start_time"], F.lit(0.0)) * 1e9).cast(
            "long"
        ),
        "xr_end_ns": F.when(
            s["end_time"].isNotNull(), (s["end_time"] * 1e9).cast("long")
        ),
        "xr_status_code": status_code,
        "xr_status_msg": status_msg,
        "_xr_attr_toks": attr_toks,
        "xr_events": F.array_join(events, ";"),
    }


def _resource_tokens(s: Column) -> Column:
    """populateResource (:185-200) from the root segment."""
    aws = s["aws"]
    cwl = F.coalesce(
        aws["cloudwatch_logs"],
        F.from_json(F.lit("[]"), "array<struct<log_group:string,arn:string>>"),
    )

    def _slice_json(vals: Column) -> Column:
        present = F.filter(vals, lambda v: v.isNotNull())
        return F.when(
            F.size(present) > 0,
            F.concat(F.lit('["'), F.array_join(present, '","'), F.lit('"]')),
        )

    arns = _slice_json(F.transform(cwl, lambda g: g["arn"]))
    groups = _slice_json(F.transform(cwl, lambda g: g["log_group"]))
    ec2, ecs, bs, eks, xr = (
        aws["ec2"], aws["ecs"], aws["elastic_beanstalk"], aws["eks"],
        aws["xray"],
    )
    has_exc = F.size(_cause_exceptions(s["cause"])) > 0
    sdk = xr["sdk"]
    lang = F.when(has_exc, F.lit("java")).otherwise(
        F.when(sdk.contains("for "), F.substring_index(sdk, "for ", -1))
    )
    toks = F.array(
        _opt(s["name"], "service.name", s["name"]),
        _tok(
            F.lit("cloud.provider"),
            F.when(aws.isNotNull(), "aws").otherwise("unknown"),
        ),
        _opt(aws["account_id"], "cloud.account.id", aws["account_id"]),
        _opt(arns, "aws.log.group.arns", arns),
        _opt(groups, "aws.log.group.names", groups),
        _opt(
            ec2["availability_zone"], "cloud.availability_zone",
            ec2["availability_zone"],
        ),
        _opt(ec2["instance_id"], "host.id", ec2["instance_id"]),
        _opt(ec2["instance_size"], "host.type", ec2["instance_size"]),
        _opt(ec2["ami_id"], "host.image.id", ec2["ami_id"]),
        _opt(ecs["container"], "container.name", ecs["container"]),
        _opt(
            ecs["availability_zone"], "cloud.availability_zone",
            ecs["availability_zone"],
        ),
        _opt(ecs["container_id"], "container.id", ecs["container_id"]),
        _opt(
            bs["environment_name"], "service.namespace",
            bs["environment_name"],
        ),
        _opt(
            bs["deployment_id"], "service.instance.id",
            bs["deployment_id"].cast("string"),
        ),
        _opt(bs["version_label"], "service.version", bs["version_label"]),
        _opt(eks["container_id"], "container.id", eks["container_id"]),
        _opt(eks["cluster_name"], "k8s.cluster.name", eks["cluster_name"]),
        _opt(eks["pod"], "k8s.pod.name", eks["pod"]),
        _opt(
            xr["sdk_version"], "telemetry.sdk.version", xr["sdk_version"]
        ),
        _opt(sdk, "telemetry.sdk.name", sdk),
        F.when(
            sdk.isNotNull() & lang.isNotNull(),
            _tok(F.lit("telemetry.sdk.language"), lang),
        ),
        _opt(
            s["service"]["version"], "service.version",
            s["service"]["version"],
        ),
        _opt(s["resource_arn"], "aws.xray.resource_arn", s["resource_arn"]),
    )
    return F.filter(toks, lambda x: x.isNotNull())


def xray_segments_to_spans(
    df: DataFrame, body_col: str = "body", max_depth: int = 4
) -> DataFrame:
    """One X-Ray segment document per row → one row per span; extra
    columns: ``xr_depth`` (0 = root), ``xr_ok`` (document-level — any
    invalid node rejects the whole document, translator.go:68-72)."""
    root = F.from_json(F.col(body_col), _seg_schema(max_depth))

    def _all_ok(node: Column, depth: int) -> Column:
        ok = _seg_ok(node)
        if depth < max_depth:
            subs = F.coalesce(
                node["subsegments"],
                F.from_json(
                    F.lit("[]"),
                    f"array<{_seg_schema(max_depth - depth - 1)}>",
                ),
            )
            ok = ok & F.forall(subs, lambda c: _all_ok(c, depth + 1))
        return ok

    base = df.select(
        "*",
        root.alias("_root"),
        (
            root.isNotNull()
            & root["trace_id"].isNotNull()  # root Validate() (:80)
            & _all_ok(root, 0)
        ).alias("xr_ok"),
    ).where(F.col("_root").isNotNull())

    keep = [c for c in df.columns if c != body_col]
    out_frames = []
    for depth in range(max_depth + 1):
        fr = base.select(
            "*",
            F.col("_root")["trace_id"].alias("_root_trace"),
            _resource_tokens(F.col("_root")).alias("_res_toks"),
        )
        node = F.col("_root")
        parent = F.lit(None).cast("string")
        for lvl in range(depth):
            fr = fr.select(
                "*",
                node["id"].alias(f"_pid{lvl}"),
                F.explode(node["subsegments"]).alias(f"_n{lvl}"),
            ).drop("_root" if lvl == 0 else f"_n{lvl - 1}")
            node = F.col(f"_n{lvl}")
            parent = F.col(f"_pid{lvl}")
        cols = _span_cols(node, F.col("_root_trace"), parent)
        out_frames.append(
            fr.select(
                *keep,
                "xr_ok",
                F.lit(depth).alias("xr_depth"),
                F.col("_res_toks"),
                *[v.alias(k) for k, v in cols.items()],
            )
        )

    unioned = reduce(lambda a, b: a.unionByName(b), out_frames)
    return unioned.select(
        "*",
        _canon(F.col("_res_toks")).alias("xr_resource_attrs"),
        _canon(F.col("_xr_attr_toks")).alias("xr_attrs"),
    ).drop("_res_toks", "_xr_attr_toks")

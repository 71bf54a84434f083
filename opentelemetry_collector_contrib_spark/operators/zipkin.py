"""Zipkin v2 JSON → OTLP span translation.

Re-expresses ``pkg/translator/zipkin/zipkinv2/to_translator.go``
(:30-562) over a DataFrame of zipkin v2 JSON spans (one per row —
zipkin JSON dumps at rest; the reference's HTTP receiver wraps the
same translator). Semantics mirrored and pinned by
``tests/test_round5_zipkin.py``:

- ids: hex strings zero-padded to 32/16 (UInt64ToTraceID /
  UInt64ToSpanID); a parent equal to the span's own id is suppressed
  (:213-216);
- kind: CLIENT/SERVER/PRODUCER/CONSUMER map directly; otherwise the
  ``span.kind`` tag is consumed and only the value ``internal`` maps
  (:256-273);
- status from ``otel.status_code`` (both the STATUS_CODE_* and
  Unset/Ok/Error spellings, :553-561) + ``otel.status_description``
  (only read when a code is present); an ``error`` tag forces code 2
  and is removed only when its value is exactly "true" (:238-253);
- timestamps: µs → ns, end = start + duration; a zero/absent start
  becomes unix zero + the ``otel.zipkin.absentField.startTime=true``
  attribute (:511-529);
- resource: ``localEndpoint.serviceName`` (named by the
  ``otlp.service.name.source`` tag when present) plus every semconv
  key from the nonSpanAttributes table found in tags (:441-473); a
  span with no local service name contributes no resource attributes
  but the semconv tags are still dropped from span attributes;
- scope: ``otel.library.name``/``otel.library.version`` tags;
- span attrs: remaining tags, plus net.host.ip/port from the local
  endpoint and peer.service/net.peer.ip/port from the remote one
  (:389-417; ipv6 overrides ipv4);
- events from annotations (name|attrsJSON|dropped encoding,
  :333-369); links from ``otlp.link.N`` tags, scanned from 0 and
  stopping at the first gap, parts<5 skipped (:276-331) — bounded at
  ``max_links`` (reference bound: 128);
- a malformed dropped-count / link id errors the ROW (``zk_ok``
  false) where the reference fails the whole batch — the dead-letter
  twin of the same contract.

Divergences (documented): the ParseStringTags typed conversion
(:419-444) is representation-level — the canonical attr string this
engine emits is identical either way, so the knob is not carried;
endpoint IPs pass through as written (zipkin-go canonicalizes via
net.IP.String()); event/link attribute maps render as sorted compact
JSON (jsonMapToAttributeMap's whole-float→int folding is applied);
a dropped-count above 2^32 passes the digits check (ParseUint(...,32)
would reject).

Plan shape: one zero-shuffle codegen projection over ``from_json`` —
schema-pruned, no Python.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# to_translator.go:82-167 + :169-183 (semconv v1.15 string values)
ZIPKIN_NON_SPAN_ATTRIBUTES: tuple[str, ...] = (
    "cloud.provider", "cloud.account.id", "cloud.region",
    "cloud.availability_zone", "cloud.platform",
    "aws.ecs.container.arn", "aws.ecs.cluster.arn", "aws.ecs.launchtype",
    "aws.ecs.task.arn", "aws.ecs.task.family", "aws.ecs.task.revision",
    "aws.eks.cluster.arn", "aws.log.group.names", "aws.log.group.arns",
    "aws.log.stream.names", "aws.log.stream.arns",
    "container.name", "container.id", "container.runtime",
    "container.image.name", "container.image.tag",
    "deployment.environment", "device.id", "device.model.identifier",
    "device.model.name", "device.manufacturer",
    "faas.name", "faas.id", "faas.version", "faas.instance",
    "faas.max_memory",
    "host.id", "host.name", "host.type", "host.arch", "host.image.name",
    "host.image.id", "host.image.version",
    "k8s.cluster.name", "k8s.node.name", "k8s.node.uid",
    "k8s.namespace.name", "k8s.pod.uid", "k8s.pod.name",
    "k8s.container.name", "k8s.container.restart_count",
    "k8s.replicaset.uid", "k8s.replicaset.name", "k8s.deployment.uid",
    "k8s.deployment.name", "k8s.statefulset.uid", "k8s.statefulset.name",
    "k8s.daemonset.uid", "k8s.daemonset.name", "k8s.job.uid",
    "k8s.job.name", "k8s.cronjob.uid", "k8s.cronjob.name",
    "os.type", "os.description", "os.name", "os.version",
    "process.pid", "process.executable.name", "process.executable.path",
    "process.command", "process.command_line", "process.command_args",
    "process.owner", "process.runtime.name", "process.runtime.version",
    "process.runtime.description",
    "service.name", "service.namespace", "service.instance.id",
    "service.version",
    "telemetry.sdk.name", "telemetry.sdk.language",
    "telemetry.sdk.version", "telemetry.auto.version",
    "webengine.name", "webengine.version", "webengine.description",
    # :173-181 extras
    "otlp.service.name.source", "otel.library.name",
    "otel.library.version", "opencensus.starttime",
    "opencensus.exporterversion", "opencensus.resourcetype",
)

_ZK_SCHEMA = (
    "traceId string, id string, parentId string, name string, kind string,"
    " timestamp long, duration long, debug boolean, shared boolean,"
    " localEndpoint struct<serviceName:string,ipv4:string,ipv6:string,"
    "port:int>,"
    " remoteEndpoint struct<serviceName:string,ipv4:string,ipv6:string,"
    "port:int>,"
    " annotations array<struct<timestamp:long,value:string>>,"
    " tags map<string,string>"
)

_HEX_RE = r"^[0-9a-fA-F]+$"


def _tok(key, value) -> Column:
    return F.concat(key, F.lit("="), value)


def _canon(tokens: Column) -> Column:
    """Sorted comma-joined tokens, null entries dropped, last-wins on
    duplicate keys (pcommon PutStr)."""
    toks = F.filter(tokens, lambda x: x.isNotNull())
    key_of = lambda t: F.substring_index(t, "=", 1)  # noqa: E731
    rev = F.reverse(toks)
    keys = F.transform(rev, key_of)
    dedup = F.filter(
        rev, lambda t, i: F.array_position(keys, key_of(t)) == i + 1
    )
    return F.array_join(F.array_sort(dedup), ",")


def _scalar_json_attrs(json_str: Column) -> Column:
    """jsonMapToAttributeMap (:371-387): keep scalar values only,
    fold whole doubles to ints; rendered as sorted compact JSON."""
    m = F.from_json(json_str, "map<string,variant>")
    ents = F.filter(
        F.map_entries(m),
        lambda e: ~F.schema_of_variant(e["value"]).startswith("OBJECT")
        & ~F.schema_of_variant(e["value"]).startswith("ARRAY")
        & (F.schema_of_variant(e["value"]) != "VOID"),
    )
    body = F.array_join(
        F.array_sort(
            F.transform(
                ents,
                lambda e: F.concat(
                    F.lit('"'), e["key"], F.lit('":'),
                    _zk_fold_whole(e["value"]),
                ),
            )
        ),
        ",",
    )
    return F.when(m.isNotNull(), F.concat(F.lit("{"), body, F.lit("}")))


def _zk_fold_whole(val: Column) -> Column:
    t = F.schema_of_variant(val)
    d = F.try_variant_get(val, "$", "double")
    return F.when(
        t.rlike("^(DOUBLE|DECIMAL|FLOAT)") & (d == F.floor(d)),
        d.cast("long").cast("string"),
    ).otherwise(F.to_json(val))


def zipkin_v2_parse(
    df: DataFrame,
    line_col: str = "body",
    max_links: int = 8,
) -> DataFrame:
    """One zipkin v2 JSON span per row → flattened OTLP span columns
    (resource/scope identity as canonical strings — the ToTraces
    service+library grouping is one groupBy on them).

    The span ``from_json`` is STAGED as its own column: ~20 consumers
    in the wide projection below would otherwise re-inline — and
    re-evaluate — the parse per reference (the awslogs staging rule,
    PLANS.md; measured ~5x here)."""
    df = df.select(
        "*", F.from_json(F.col(line_col), _ZK_SCHEMA).alias("_zk_z")
    )
    z = F.col("_zk_z")
    tags = F.coalesce(z["tags"], F.from_json(F.lit("{}"), "map<string,string>"))
    tag = lambda k: F.element_at(tags, k)  # noqa: E731

    trace_raw = z["traceId"]
    span_raw = z["id"]
    parent_raw = z["parentId"]
    ids_ok = (
        trace_raw.isNotNull()
        & trace_raw.rlike(_HEX_RE) & (F.length(trace_raw) <= 32)
        & span_raw.isNotNull()
        & span_raw.rlike(_HEX_RE) & (F.length(span_raw) <= 16)
        & (
            parent_raw.isNull()
            | (parent_raw.rlike(_HEX_RE) & (F.length(parent_raw) <= 16))
        )
    )
    trace_id = F.lpad(F.lower(trace_raw), 32, "0")
    span_id = F.lpad(F.lower(span_raw), 16, "0")
    parent_pad = F.lpad(F.lower(parent_raw), 16, "0")
    parent_id = F.when(
        parent_raw.isNotNull() & (parent_pad != span_id), parent_pad
    )

    kind_raw = z["kind"]
    direct = kind_raw.isin("CLIENT", "SERVER", "PRODUCER", "CONSUMER")
    kind = F.when(direct, F.lower(kind_raw)).when(
        tag("span.kind") == "internal", F.lit("internal")
    ).otherwise(F.lit("unspecified"))
    # span.kind tag consumed whenever the direct mapping did not apply
    kind_tag_used = ~F.coalesce(direct, F.lit(False)) & tag(
        "span.kind"
    ).isNotNull()

    status_tbl = F.create_map(
        F.lit("STATUS_CODE_UNSET"), F.lit(0), F.lit("STATUS_CODE_OK"),
        F.lit(1), F.lit("STATUS_CODE_ERROR"), F.lit(2), F.lit("Unset"),
        F.lit(0), F.lit("Ok"), F.lit(1), F.lit("Error"), F.lit(2),
    )
    has_code = tag("otel.status_code").isNotNull()
    err_tag = tag("error")
    status_code = F.when(err_tag.isNotNull(), F.lit(2)).when(
        has_code,
        F.coalesce(F.element_at(status_tbl, tag("otel.status_code")), F.lit(0)),
    ).otherwise(F.lit(0))
    status_msg = F.when(has_code, tag("otel.status_description"))

    ts_us = z["timestamp"]
    dur_us = F.coalesce(z["duration"], F.lit(0))
    ts_absent = ts_us.isNull() | (ts_us == 0)
    start_ns = F.when(ts_absent, F.lit(0)).otherwise(ts_us * 1000)
    end_ns = start_ns + dur_us * 1000

    service = z["localEndpoint"]["serviceName"]
    has_service = service.isNotNull() & (service != "")
    sn_source = tag("otlp.service.name.source")
    res_tokens = F.concat(
        F.array(
            F.when(
                has_service,
                _tok(F.coalesce(sn_source, F.lit("service.name")), service),
            )
        ),
        F.filter(
            F.array(
                # otel.library.* stay on the scope; the service-name
                # source tag was consumed above (:449-455,462-465)
                *[
                    F.when(
                        has_service & tag(k).isNotNull(),
                        _tok(F.lit(k), tag(k)),
                    )
                    for k in ZIPKIN_NON_SPAN_ATTRIBUTES
                    if k not in (
                        "otel.library.name", "otel.library.version",
                        "otlp.service.name.source",
                    )
                ]
            ),
            lambda x: x.isNotNull(),
        ),
    )

    # ----- events (annotations) -----
    def _anno_token(a: Column) -> Column:
        parts = F.split(a["value"], r"\|")
        n = F.size(parts)
        name = F.get(parts, 0)
        attrs_json = F.when(
            n >= 3,
            _scalar_json_attrs(
                F.array_join(F.slice(parts, 2, n - 2), "|")
            ),
        )
        dropped = F.when(n >= 3, F.element_at(parts, -1))
        return F.concat_ws(
            "|",
            (a["timestamp"] * 1000).cast("string"),
            name,
            F.coalesce(attrs_json, F.lit("")),
            F.coalesce(dropped, F.lit("0")),
        )

    annos = F.coalesce(
        z["annotations"],
        F.from_json(F.lit("[]"), "array<struct<timestamp:long,value:string>>"),
    )
    events = F.transform(annos, _anno_token)
    events_ok = F.forall(
        annos,
        lambda a: (F.size(F.split(a["value"], r"\|")) < 3)
        | (
            F.element_at(F.split(a["value"], r"\|"), -1)
            .rlike(r"^\d+$")
            & _scalar_json_attrs(
                F.array_join(
                    F.slice(
                        F.split(a["value"], r"\|"), 2,
                        F.size(F.split(a["value"], r"\|")) - 2,
                    ),
                    "|",
                )
            ).isNotNull()
        ),
    )

    # ----- links (otlp.link.N, stop at first gap) -----
    link_cols, link_ok_cols = [], []
    for i in range(max_links):
        present = tag(f"otlp.link.{i}").isNotNull()
        chain = present
        for j in range(i):
            chain = chain & tag(f"otlp.link.{j}").isNotNull()
        parts = F.split(tag(f"otlp.link.{i}"), r"\|")
        n = F.size(parts)
        t_hex, s_hex = F.get(parts, 0), F.get(parts, 1)
        attrs_json = F.when(
            n == 5, F.get(parts, 3)
        ).otherwise(F.array_join(F.slice(parts, 4, n - 4), "|"))
        token = F.when(
            chain & (n >= 5),
            F.concat_ws(
                "|",
                F.lpad(F.lower(t_hex), 32, "0"),
                F.lpad(F.lower(s_hex), 16, "0"),
                F.get(parts, 2),
                F.coalesce(_scalar_json_attrs(attrs_json), F.lit("{}")),
                F.element_at(parts, -1),
            ),
        )
        ok_i = ~F.coalesce(chain, F.lit(False)) | (n < 5) | (
            (
                (t_hex == "") | (t_hex.rlike(_HEX_RE) & (F.length(t_hex) == 32))
            )
            & (
                (s_hex == "") | (s_hex.rlike(_HEX_RE) & (F.length(s_hex) == 16))
            )
            & F.element_at(parts, -1).rlike(r"^\d+$")
            & _scalar_json_attrs(attrs_json).isNotNull()
        )
        link_cols.append(token)
        link_ok_cols.append(F.coalesce(ok_i, F.lit(True)))
    links = F.filter(F.array(*link_cols), lambda x: x.isNotNull())
    links_ok = F.lit(True)
    for c in link_ok_cols:
        links_ok = links_ok & c

    # ----- span attributes -----
    consumed_always = set(ZIPKIN_NON_SPAN_ATTRIBUTES)
    link_keys = [f"otlp.link.{i}" for i in range(max_links)]

    def _keep(e: Column) -> Column:
        k = e["key"]
        c = ~k.isin(
            *consumed_always, "w3c.tracestate", "otel.status_code",
            *link_keys,
        )
        c = c & ~((k == "otel.status_description") & has_code)
        c = c & ~((k == "error") & (err_tag == "true"))
        c = c & ~((k == "span.kind") & kind_tag_used)
        return c

    tag_toks = F.transform(
        F.filter(F.map_entries(tags), _keep),
        lambda e: _tok(e["key"], e["value"]),
    )
    lep, rep = z["localEndpoint"], z["remoteEndpoint"]
    extra_toks = F.array(
        F.when(lep["ipv4"].isNotNull(), _tok(F.lit("net.host.ip"), lep["ipv4"])),
        F.when(lep["ipv6"].isNotNull(), _tok(F.lit("net.host.ip"), lep["ipv6"])),
        F.when(
            lep["port"] > 0,
            _tok(F.lit("net.host.port"), lep["port"].cast("string")),
        ),
        F.when(
            rep["serviceName"].isNotNull() & (rep["serviceName"] != ""),
            _tok(F.lit("peer.service"), rep["serviceName"]),
        ),
        F.when(rep["ipv4"].isNotNull(), _tok(F.lit("net.peer.ip"), rep["ipv4"])),
        F.when(rep["ipv6"].isNotNull(), _tok(F.lit("net.peer.ip"), rep["ipv6"])),
        F.when(
            rep["port"] > 0,
            _tok(F.lit("net.peer.port"), rep["port"].cast("string")),
        ),
        F.when(ts_absent, F.lit("otel.zipkin.absentField.startTime=true")),
    )

    ok = (
        z.isNotNull()
        & F.coalesce(ids_ok, F.lit(False))
        & F.coalesce(events_ok, F.lit(True))
        & F.coalesce(links_ok, F.lit(True))
    )
    # Stage the token ARRAYS as concrete columns before canonicalizing:
    # _canon's dedup lambda indexes into its keys array per element, and
    # over an unstaged expression that re-evaluates the whole ~80-branch
    # token construction per element (entries² blowup — measured 61 s →
    # ~2 s at sf0.01; the sumologic lambda-staging lesson).
    staged = df.select(
        "*",
        trace_id.alias("zk_trace_id"),
        span_id.alias("zk_span_id"),
        parent_id.alias("zk_parent_id"),
        z["name"].alias("zk_name"),
        kind.alias("zk_kind"),
        F.coalesce(tag("w3c.tracestate"), F.lit("")).alias("zk_trace_state"),
        status_code.alias("zk_status_code"),
        status_msg.alias("zk_status_msg"),
        start_ns.alias("zk_start_ns"),
        end_ns.alias("zk_end_ns"),
        F.when(has_service, service).otherwise(
            F.lit("OTLPResourceNoServiceName")
        ).alias("zk_service"),
        F.coalesce(tag("otel.library.name"), F.lit("")).alias("zk_scope_name"),
        F.coalesce(tag("otel.library.version"), F.lit("")).alias(
            "zk_scope_version"
        ),
        res_tokens.alias("_zk_res_toks"),
        F.concat(tag_toks, extra_toks).alias("_zk_attr_toks"),
        F.array_join(events, ";").alias("zk_events"),
        F.array_join(links, ";").alias("zk_links"),
        F.coalesce(ok, F.lit(False)).alias("zk_ok"),
    )
    return staged.select(
        "*",
        _canon(F.col("_zk_res_toks")).alias("zk_resource_attrs"),
        _canon(F.col("_zk_attr_toks")).alias("zk_attrs"),
    ).drop("_zk_res_toks", "_zk_attr_toks", "_zk_z")

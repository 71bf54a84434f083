"""Sentry EXPORT translator: OTLP spans -> Sentry transactions +
exception events (``exporter/sentryexporter/sentry_exporter.go``).

Per-span conversion is one zero-shuffle projection:

- op/description ladder     — sentry_exporter.go:297-366
  (http.method -> "http[.kindword]" + "METHOD name"; db.system ->
  "db" + statement-else-name; rpc.service -> "rpc"; messaging.system
  -> "message"; faas.trigger -> the trigger value; else op "" and the
  span name)
- tags                      — :248-289
  (span attrs <- resource attrs, RESOURCE WINS; + status_message
  when non-empty, span_kind SPAN_KIND_* word for non-unspecified
  kinds, library_name/library_version always — even empty)
- status                    — :37-69, :395-426
  (code outside 0..2 -> unknown + "error code %d" message; 0/1 ->
  ok; 2 -> the 11-entry http.status_code table, else the 16-entry
  rpc.grpc.status_code table, else unknown)

Transaction assembly — :79-159, :226-246 — is the distributed part:
a span is a transaction root when its parent id is empty OR its kind
is server/consumer (:430-433).  The reference's idMap +
classifyAsOrphanSpans recursion associates every other span with its
NEAREST root ancestor, iterating until a fixpoint; spans whose parent
chain dead-ends without a root each become their own transaction.
This engine resolves the same relation with per-trace POINTER
DOUBLING (the coralogix-transaction shape: ceil(log2 depth) equi
self-joins, each round localCheckpoint'd) — a depth-D trace costs
log D rounds instead of the reference's O(rounds x spans) list scans,
and nothing ever leaves (trace_id)-keyed joins, so the plan survives
10^12-span inputs.  When the batch contains NO root at all the
reference drops everything, exceptions included (:128-130); replayed
with a bounded one-row probe.

Exception events — :161-224 — fan out of span events named
"exception" carrying at least one of exception.type /
exception.message; each inherits its owning span's trace context,
tags and timestamps, level "error", and transaction = description.

Model notes: attribute values are their rendered string forms
(map<string,string>) — the Go bool/int/double formatting is the
producer's concern here; map/slice/bytes attrs (skipped by the
reference) are out of the string model.  Event ids are uuid4-shaped
but DETERMINISTIC (md5 of trace/span id + role, version/variant bits
forced per :465-474) instead of crypto-random — an intended
divergence so runs replay and oracles can pin them.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HTTP_STATUS = {
    "400": "failed_precondition", "401": "unauthenticated",
    "403": "permission_denied", "404": "not_found", "409": "aborted",
    "429": "resource_exhausted", "499": "cancelled",
    "500": "internal_error", "501": "unimplemented",
    "503": "unavailable", "504": "deadline_exceeded",
}
_GRPC_STATUS = {
    "1": "cancelled", "2": "unknown", "3": "invalid_argument",
    "4": "deadline_exceeded", "5": "not_found", "6": "already_exists",
    "7": "permission_denied", "8": "resource_exhausted",
    "9": "failed_precondition", "10": "aborted", "11": "out_of_range",
    "12": "unimplemented", "13": "internal_error", "14": "unavailable",
    "15": "data_loss", "16": "unauthenticated",
}
_KIND_WORDS = ["SPAN_KIND_UNSPECIFIED", "SPAN_KIND_INTERNAL",
               "SPAN_KIND_SERVER", "SPAN_KIND_CLIENT",
               "SPAN_KIND_PRODUCER", "SPAN_KIND_CONSUMER"]
_OP_SUFFIX = ["", ".internal", ".server", ".client", ".producer",
              ".consumer"]

_ENTRY_T = "array<struct<key:string,value:string>>"


def _uuid4_det(seed: Column) -> Column:
    """Deterministic uuid4-shaped id: md5 hex with the version nibble
    forced to 4 and the variant nibble to 8..b (sentry_exporter.go:
    465-474 does the same bit-twiddling on random bytes)."""
    h = F.md5(seed)
    variant = F.element_at(
        F.array(F.lit("8"), F.lit("9"), F.lit("a"), F.lit("b")),
        (F.conv(F.substring(h, 17, 1), 16, 10).cast("int") % 4) + 1)
    return F.concat(F.substring(h, 1, 12), F.lit("4"),
                    F.substring(h, 14, 3), variant,
                    F.substring(h, 18, 15))


def _map_lookup(table: dict[str, str], key: Column) -> Column:
    out = F.lit(None).cast("string")
    for k, v in table.items():
        out = F.when(key == k, F.lit(v)).otherwise(out)
    return out


def sentry_export_events(
    df: DataFrame,
    *,
    id_cols: list[str],
    environment: str = "",
    rounds: int = 6,
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
    scope_name_col: str | None = "scope_name",
    scope_version_col: str | None = "scope_version",
    events_col: str | None = "events",
) -> DataFrame:
    attrs = F.col(attrs_col)
    res = F.col(res_attrs_col)
    kind = F.coalesce(F.col(kind_col), F.lit(0)).cast("int")
    code = F.coalesce(F.col(status_code_col), F.lit(0)).cast("int")
    smsg = F.coalesce(F.col(status_message_col), F.lit(""))
    name = F.coalesce(F.col(name_col), F.lit(""))
    parent = F.coalesce(F.col(parent_span_id_col), F.lit(""))
    g = lambda k: F.element_at(attrs, F.lit(k))  # noqa: E731

    # --- op / description ladder (:297-366) ---------------------------
    kind_b = F.when((kind >= 0) & (kind <= 5), kind).otherwise(F.lit(0))
    http_method = g("http.method")
    op = F.when(
        http_method.isNotNull(),
        F.concat(F.lit("http"),
                 F.element_at(F.array(*[F.lit(s) for s in _OP_SUFFIX]),
                              kind_b + 1))) \
        .when(g("db.system").isNotNull(), F.lit("db")) \
        .when(g("rpc.service").isNotNull(), F.lit("rpc")) \
        .when(g("messaging.system").isNotNull(), F.lit("message")) \
        .when(g("faas.trigger").isNotNull(), g("faas.trigger")) \
        .otherwise(F.lit(""))
    description = F.when(
        http_method.isNotNull(),
        F.concat(http_method, F.lit(" "), name)) \
        .when(g("db.system").isNotNull(),
              F.coalesce(g("db.statement"), name)) \
        .otherwise(name)

    # --- tags (:248-289): span attrs, resource wins -------------------
    def entries(m: Column) -> Column:
        return F.coalesce(F.map_entries(m), F.expr("array()")
                          .cast(_ENTRY_T))

    merged = F.concat(entries(attrs), entries(res))
    rev = F.reverse(merged)
    deduped = F.filter(
        rev, lambda e, i: ~F.exists(F.slice(rev, F.lit(1), i),
                                    lambda p: p["key"] == e["key"]))

    # --- status (:395-426) --------------------------------------------
    bad_code = (code < 0) | (code > 2)
    http_tag = F.coalesce(F.element_at(res, F.lit("http.status_code")),
                          g("http.status_code"))
    grpc_tag = F.coalesce(
        F.element_at(res, F.lit("rpc.grpc.status_code")),
        g("rpc.grpc.status_code"))
    status = F.when(bad_code, F.lit("unknown")) \
        .when(code.isin(0, 1), F.lit("ok")) \
        .when(http_tag.isNotNull(),
              F.coalesce(_map_lookup(_HTTP_STATUS, http_tag),
                         F.lit("unknown"))) \
        .when(grpc_tag.isNotNull(),
              F.coalesce(_map_lookup(_GRPC_STATUS, grpc_tag),
                         F.lit("unknown"))) \
        .otherwise(F.lit("unknown"))
    message = F.when(bad_code, F.concat(F.lit("error code "),
                                        code.cast("string"))) \
        .otherwise(smsg)

    scope_name = (F.coalesce(F.col(scope_name_col), F.lit(""))
                  if scope_name_col else F.lit(""))
    scope_ver = (F.coalesce(F.col(scope_version_col), F.lit(""))
                 if scope_version_col else F.lit(""))
    extra = F.filter(F.array(
        F.when(message != "",
               F.struct(F.lit("status_message").alias("key"),
                        message.alias("value"))),
        F.when(kind_b != 0,
               F.struct(F.lit("span_kind").alias("key"),
                        F.element_at(
                            F.array(*[F.lit(w) for w in _KIND_WORDS]),
                            kind_b + 1).alias("value"))),
        F.struct(F.lit("library_name").alias("key"),
                 scope_name.alias("value")),
        F.struct(F.lit("library_version").alias("key"),
                 scope_ver.alias("value")),
    ), lambda e: e.isNotNull())
    # extra singles override merged attrs of the same key
    rev2 = F.reverse(F.concat(deduped, extra))
    tags = F.map_from_entries(F.filter(
        rev2, lambda e, i: ~F.exists(F.slice(rev2, F.lit(1), i),
                                     lambda p: p["key"] == e["key"])))

    is_root = (parent == "") | kind.isin(2, 5)

    stage1 = df.select(
        *id_cols,
        F.col(trace_id_col).alias("_tr"),
        F.col(span_id_col).alias("_sp"),
        F.when(parent != "", parent).alias("_parent"),
        op.alias("op"), description.alias("description"),
        status.alias("status"), tags.alias("tags"),
        F.col(start_ns_col).cast("bigint").alias("start_ns"),
        F.col(end_ns_col).cast("bigint").alias("end_ns"),
        is_root.alias("_is_root"),
        (F.col(events_col) if events_col else F.lit(None).cast(
            "array<struct<ts_ns:bigint,name:string,"
            "attrs:map<string,string>>>")).alias("_events"),
    )
    stage1 = stage1.localCheckpoint()

    # batch-global gate (:128-130): no roots -> nothing at all
    if stage1.filter(F.col("_is_root")).isEmpty():
        return stage1.limit(0).select(
            *id_cols,
            F.lit("").alias("event_kind"), F.lit("").alias("event_id"),
            F.col("_tr").alias("trace_id"),
            F.col("_sp").alias("span_id"),
            F.col("_parent").alias("parent_span_id"),
            "op", "description", "status",
            F.lit("").alias("transaction"),
            "start_ns", "end_ns",
            F.lit("").alias("environment"), "tags",
            F.lit(None).cast("array<string>").alias("child_span_ids"),
            F.lit(None).cast("string").alias("exc_type"),
            F.lit(None).cast("string").alias("exc_message"),
        )

    # --- nearest-root association: pointer doubling -------------------
    state = stage1.select(
        "_tr", "_sp",
        F.when(F.col("_is_root"), F.col("_sp")).alias("_root"),
        F.when(~F.col("_is_root"), F.col("_parent")).alias("_ptr"),
    )
    for _ in range(rounds):
        if state.filter(F.col("_ptr").isNotNull()).isEmpty():
            break
        anc = state.select(F.col("_tr").alias("_tr2"),
                           F.col("_sp").alias("_sp2"),
                           F.col("_root").alias("_root2"),
                           F.col("_ptr").alias("_ptr2"))
        state = state.join(
            anc, (F.col("_tr") == F.col("_tr2"))
            & (F.col("_ptr") == F.col("_sp2")), "left",
        ).select(
            "_tr", "_sp",
            F.coalesce(F.col("_root"), F.col("_root2")).alias("_root"),
            F.when(F.col("_root").isNull() & F.col("_root2").isNull(),
                   F.col("_ptr2")).alias("_ptr"),
        ).localCheckpoint()

    resolved = state.select("_tr", "_sp", "_root")
    spans = stage1.join(resolved, ["_tr", "_sp"], "left")

    # children grouped under their root transaction
    children = (
        spans.filter(~F.col("_is_root") & F.col("_root").isNotNull())
        .groupBy(F.col("_tr").alias("_ctr"),
                 F.col("_root").alias("_croot"))
        .agg(F.array_sort(F.collect_list("_sp"))
             .alias("child_span_ids")))

    env = F.lit(environment) if environment else F.lit(None).cast(
        "string")
    # transactions: every root span + every orphan (unresolved) span
    tx_base = spans.filter(F.col("_is_root")
                           | F.col("_root").isNull())
    transactions = (
        tx_base.join(
            children,
            (tx_base["_tr"] == children["_ctr"])
            & (tx_base["_sp"] == children["_croot"]), "left")
        .select(
            *id_cols,
            F.lit("transaction").alias("event_kind"),
            _uuid4_det(F.concat(F.col("_tr"), F.col("_sp"),
                                F.lit(":txn"))).alias("event_id"),
            F.col("_tr").alias("trace_id"),
            F.col("_sp").alias("span_id"),
            F.col("_parent").alias("parent_span_id"),
            "op", "description", "status",
            F.col("description").alias("transaction"),
            "start_ns", "end_ns",
            env.alias("environment"), "tags",
            F.col("child_span_ids"),
            F.lit(None).cast("string").alias("exc_type"),
            F.lit(None).cast("string").alias("exc_message"),
        ))

    # exception events (:161-224)
    exc = (
        stage1.select(
            *id_cols, "_tr", "_sp", "_parent", "op", "description",
            "status", "tags", "start_ns", "end_ns",
            F.posexplode(F.coalesce(F.col("_events"), F.expr(
                "array()").cast(
                "array<struct<ts_ns:bigint,name:string,"
                "attrs:map<string,string>>>")))
            .alias("_pos", "_ev"))
        .filter((F.col("_ev")["name"] == "exception")
                & (F.coalesce(
                    F.nullif(F.element_at(F.col("_ev")["attrs"],
                                          F.lit("exception.message")),
                             F.lit("")),
                    F.nullif(F.element_at(F.col("_ev")["attrs"],
                                          F.lit("exception.type")),
                             F.lit(""))).isNotNull()))
        .select(
            *id_cols,
            F.lit("error").alias("event_kind"),
            _uuid4_det(F.concat(F.col("_tr"), F.col("_sp"),
                                F.lit(":exc:"),
                                F.col("_pos").cast("string")))
            .alias("event_id"),
            F.col("_tr").alias("trace_id"),
            F.col("_sp").alias("span_id"),
            F.col("_parent").alias("parent_span_id"),
            "op", "description", "status",
            F.col("description").alias("transaction"),
            "start_ns", "end_ns",
            F.lit(None).cast("string").alias("environment"), "tags",
            F.lit(None).cast("array<string>").alias("child_span_ids"),
            F.coalesce(F.element_at(F.col("_ev")["attrs"],
                                    F.lit("exception.type")),
                       F.lit("")).alias("exc_type"),
            F.coalesce(F.element_at(F.col("_ev")["attrs"],
                                    F.lit("exception.message")),
                       F.lit("")).alias("exc_message"),
        ))

    return transactions.unionByName(exc)

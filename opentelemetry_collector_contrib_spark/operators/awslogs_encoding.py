"""AWS logs ENCODING extension: VPC flow logs + WAF logs -> log rows
(``extension/encoding/awslogsencodingextension/internal/unmarshaler/
{vpc-flow-log,waf}``).

- VPC flow logs — vpc-flow-log/unmarshaler.go:91-399 + const.go:
  header-driven positional parse (the S3 file's first line names the
  fields; here the same list is the ``fields`` parameter), "-"
  values skipped, ecs-* fields ignored, field table mapped to
  semconv/aws.vpc.* attrs, protocol number -> IANA name through the
  256-slot table (out-of-range dead-letters), flow-direction
  ingress/egress -> receive/transmit (anything else dead-letters),
  ``end`` seconds -> the record timestamp, account-id/region hoisted
  to resource attrs, and the srcaddr/pkt-srcaddr precedence rules
  (:211-242): pkt-* wins as source/destination.address and the
  differing plain addr becomes network.local.address.
  Field-count mismatches (more or fewer values than fields)
  dead-letter the row (:167,:197-199).
- WAF logs — waf/unmarshaler.go:34-193: JSON lines; empty webaclId
  dead-letters; the web ACL arn splits into cloud.region /
  cloud.account.id / cloud.resource_id resource attrs; ms
  timestamps; "HTTP/<v>" -> network.protocol.name/version (bad
  format dead-letters); header array fans to
  http.request.header.<name>; empty strings skipped (putStr gate).

Both vectorized Column parses, zero Python.  The per-S3-file
"same web ACL everywhere" assertion is a transport framing check —
per-row resource derivation subsumes it here.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ._awslogs_protocols import PROTOCOLS

_VPC_STR_FIELDS = {
    "vpc-id": "aws.vpc.id",
    "subnet-id": "aws.vpc.subnet.id",
    "instance-id": "host.id",
    "az-id": "aws.az.id",
    "interface-id": "network.interface.name",
    "action": "aws.vpc.flow.action",
    "log-status": "aws.vpc.flow.status",
    "tcp-flags": "network.tcp.flags",
    "sublocation-type": "aws.sublocation.type",
    "sublocation-id": "aws.sublocation.id",
    "pkt-src-aws-service": "aws.vpc.flow.source.service",
    "pkt-dst-aws-service": "aws.vpc.flow.destination.service",
    "traffic-path": "aws.vpc.flow.traffic_path",
    "reject-reason": "aws.vpc.flow.reject_reason",
}
_VPC_INT_FIELDS = {
    "srcport": "source.port",
    "dstport": "destination.port",
    "version": "aws.vpc.flow.log.version",
    "packets": "aws.vpc.flow.packets",
    "bytes": "aws.vpc.flow.bytes",
    "start": "aws.vpc.flow.start",
}


def vpc_flow_log_parse(
    df: DataFrame,
    *,
    id_cols: list[str],
    fields: list[str],
    line_col: str = "line",
) -> DataFrame:
    vals = F.split(F.col(line_col), " ")
    n_fields = len(fields)

    def val(i: int) -> Column:
        # "-" = not applicable (skip), like the reference's continue
        return F.nullif(F.nullif(F.try_element_at(vals, F.lit(i + 1)),
                                 F.lit("-")), F.lit(""))

    cols = {f: val(i) for i, f in enumerate(fields)}
    g = lambda f: cols.get(f, F.lit(None).cast("string"))  # noqa

    bad_count = F.size(vals) != n_fields

    entries = []
    bad_value = F.lit(False)
    for f in fields:
        v = cols[f]
        if f.startswith("ecs-") and f in (
                "ecs-cluster-arn", "ecs-cluster-name",
                "ecs-container-instance-arn",
                "ecs-container-instance-id", "ecs-container-id",
                "ecs-second-container-id", "ecs-service-name",
                "ecs-task-definition-arn", "ecs-task-arn",
                "ecs-task-id"):
            # the reference warns and skips every ecs-* field (:180)
            continue
        if f in _VPC_STR_FIELDS:
            entries.append((F.lit(_VPC_STR_FIELDS[f]), v))
        elif f in _VPC_INT_FIELDS:
            n = v.try_cast("bigint")
            bad_value = bad_value | (v.isNotNull() & n.isNull())
            entries.append((F.lit(_VPC_INT_FIELDS[f]),
                            n.cast("string")))
        elif f == "protocol":
            n = v.try_cast("int")
            bad_value = bad_value | (v.isNotNull() & (
                n.isNull() | (n < 0) | (n >= len(PROTOCOLS))))
            entries.append((
                F.lit("network.protocol.name"),
                F.when((n >= 0) & (n < len(PROTOCOLS)),
                       F.element_at(
                           F.array(*[F.lit(p) for p in PROTOCOLS]),
                           F.coalesce(F.when((n >= 0)
                                             & (n < len(PROTOCOLS)),
                                             n), F.lit(0)) + 1))))
        elif f == "type":
            entries.append((F.lit("network.type"), F.lower(v)))
        elif f == "flow-direction":
            bad_value = bad_value | (
                v.isNotNull() & ~v.isin("ingress", "egress"))
            entries.append((
                F.lit("network.io.direction"),
                F.when(v == "ingress", F.lit("receive"))
                .when(v == "egress", F.lit("transmit"))))

    # address precedence (:211-242)
    src, psrc = g("srcaddr"), g("pkt-srcaddr")
    dst, pdst = g("dstaddr"), g("pkt-dstaddr")
    entries.append((F.lit("source.address"), F.coalesce(psrc, src)))
    local_src = F.when(psrc.isNotNull() & src.isNotNull()
                       & (psrc != src), src)
    entries.append((F.lit("destination.address"),
                    F.coalesce(pdst, dst)))
    local_dst = F.when(pdst.isNotNull() & dst.isNotNull()
                       & (pdst != dst) & local_src.isNull(), dst)
    entries.append((F.lit("network.local.address"),
                    F.coalesce(local_src, local_dst)))

    attrs = F.map_from_entries(F.filter(
        F.array(*[F.when(v.isNotNull(),
                         F.struct(k.alias("key"), v.alias("value")))
                  for k, v in entries]),
        lambda x: x.isNotNull()))
    ts = g("end").try_cast("bigint")
    bad_value = bad_value | (g("end").isNotNull() & ts.isNull())

    return df.select(
        *id_cols,
        (bad_count | bad_value).alias("err"),
        (ts * 1_000_000_000).alias("ts_ns"),
        attrs.alias("attrs"),
        F.map_from_entries(F.filter(F.array(
            F.struct(F.lit("cloud.provider").alias("key"),
                     F.lit("aws").alias("value")),
            F.when(g("account-id").isNotNull(),
                   F.struct(F.lit("cloud.account.id").alias("key"),
                            g("account-id").alias("value"))),
            F.when(g("region").isNotNull(),
                   F.struct(F.lit("cloud.region").alias("key"),
                            g("region").alias("value"))),
        ), lambda x: x.isNotNull())).alias("res_attrs"),
    )


_WAF_SCHEMA = (
    "struct<timestamp:bigint,webaclId:string,terminatingRuleId:string,"
    "terminatingRuleType:string,action:string,httpSourceName:string,"
    "httpSourceId:string,httpRequest:struct<clientIp:string,"
    "country:string,headers:array<struct<name:string,value:string>>,"
    "uri:string,args:string,httpVersion:string,httpMethod:string,"
    "requestID:string,fragment:string,scheme:string,host:string>,"
    "responseCodeSent:bigint,ja3Fingerprint:string,"
    "ja4Fingerprint:string>")


def waf_log_parse(df: DataFrame, *, id_cols: list[str],
                  line_col: str = "line") -> DataFrame:
    j = F.from_json(F.col(line_col), _WAF_SCHEMA)
    acl = F.coalesce(j["webaclId"], F.lit(""))
    arn_rest = F.when(acl.startswith("arn:aws:wafv2:"),
                      F.substring(acl, 15, 100000))
    region = F.nullif(F.try_element_at(F.split(arn_rest, ":", 3),
                              F.lit(1)), F.lit(""))
    account = F.nullif(F.try_element_at(F.split(arn_rest, ":", 3),
                              F.lit(2)), F.lit(""))
    rest = F.try_element_at(F.split(arn_rest, ":", 3), F.lit(3))
    req = j["httpRequest"]
    hv = req["httpVersion"]
    version = F.when(hv.startswith("HTTP/"),
                     F.nullif(F.substring(hv, 6, 1000), F.lit("")))
    err = (j.isNull() | (acl == "") | region.isNull()
           | account.isNull()
           | F.coalesce(rest == "", F.lit(True))
           | (hv.isNotNull() & (hv != "") & version.isNull()))

    def put(name: str, v: Column) -> Column:
        return F.when(v.isNotNull() & (v != ""),
                      F.struct(F.lit(name).alias("key"),
                               v.alias("value")))

    header_entries = F.coalesce(
        F.transform(req["headers"], lambda h: F.struct(
            F.concat(F.lit("http.request.header."), h["name"])
            .alias("key"),
            h["value"].alias("value"))),
        F.expr("array()").cast(
            "array<struct<key:string,value:string>>"))
    attrs = F.map_from_entries(F.concat(F.filter(F.array(
        F.when(version.isNotNull(),
               F.struct(F.lit("network.protocol.name").alias("key"),
                        F.lit("http").alias("value"))),
        F.when(version.isNotNull(),
               F.struct(F.lit("network.protocol.version")
                        .alias("key"), version.alias("value"))),
        F.when(j["responseCodeSent"].isNotNull(),
               F.struct(F.lit("http.response.status_code")
                        .alias("key"),
                        j["responseCodeSent"].cast("string")
                        .alias("value"))),
        put("aws.waf.terminating_rule.type", j["terminatingRuleType"]),
        put("aws.waf.terminating_rule.id", j["terminatingRuleId"]),
        put("aws.waf.action", j["action"]),
        put("aws.waf.source.id", j["httpSourceId"]),
        put("aws.waf.source.name", j["httpSourceName"]),
        put("client.address", req["clientIp"]),
        put("server.address", req["host"]),
        put("url.path", req["uri"]),
        put("url.query", req["args"]),
        put("http.request.method", req["httpMethod"]),
        put("aws.request_id", req["requestID"]),
        put("url.fragment", req["fragment"]),
        put("url.scheme", req["scheme"]),
        put("geo.country.iso_code", req["country"]),
        put("tls.client.ja3", j["ja3Fingerprint"]),
        put("tls.client.ja4", j["ja4Fingerprint"]),
    ), lambda x: x.isNotNull()), header_entries))

    return df.select(
        *id_cols, err.alias("err"),
        (j["timestamp"] * 1_000_000).alias("ts_ns"),
        F.when(~err, attrs).alias("attrs"),
        F.when(~err, F.map_from_entries(F.array(
            F.struct(F.lit("cloud.provider").alias("key"),
                     F.lit("aws").alias("value")),
            F.struct(F.lit("cloud.region").alias("key"),
                     region.alias("value")),
            F.struct(F.lit("cloud.account.id").alias("key"),
                     account.alias("value")),
            F.struct(F.lit("cloud.resource_id").alias("key"),
                     acl.alias("value")),
        ))).alias("res_attrs"),
    )

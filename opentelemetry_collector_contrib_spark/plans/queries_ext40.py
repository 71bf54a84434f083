"""Round-5 queries (cont. 24): AWS logs encoding extension — VPC flow
logs + WAF logs (``extension/encoding/awslogsencodingextension``)."""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import QueryFn, load

EXT40_QUERIES: dict[str, QueryFn] = {}
EXT40_ORACLES: dict[str, str] = {}

_FLAT = ("array_join(array_sort(transform(map_entries({m}), "
         "kv -> concat(kv.key, '=', kv.value))), ',')")

_VPC_FIELDS = ["version", "account-id", "region", "srcaddr",
               "pkt-srcaddr", "dstaddr", "pkt-dstaddr", "srcport",
               "dstport", "protocol", "type", "flow-direction",
               "packets", "bytes", "start", "end", "action",
               "ecs-cluster-name", "vpc-id"]


def q_vpc_flow_logs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.awslogs_encoding import vpc_flow_log_parse

    ev = load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    s = lambda c: c.cast("string")  # noqa: E731
    src = F.concat(F.lit("10.0.0."), s(u % 20))
    psrc = (F.when(e % 5 == 0, F.lit("-"))
            .when(e % 5 == 1, src)
            .otherwise(F.concat(F.lit("172.16.0."), s(u % 9))))
    dst = F.concat(F.lit("10.1.0."), s(e % 30))
    pdst = (F.when(e % 7 == 0, F.lit("-"))
            .when(e % 7 == 1, dst)
            .otherwise(F.concat(F.lit("192.168.0."), s(e % 6))))
    line = F.concat_ws(
        " ",
        F.lit("5"), F.concat(F.lit("12345678901"), s(u % 10)),
        F.when(u % 11 == 0, F.lit("-")).otherwise(F.lit("us-east-1")),
        src, psrc, dst, pdst,
        s(1024 + e % 5000), F.lit("443"),
        F.when(e % 9 == 0, F.lit("300")).otherwise(
            F.when(e % 2 == 0, F.lit("6")).otherwise(F.lit("17"))),
        F.when(e % 2 == 0, F.lit("IPv4")).otherwise(F.lit("IPv6")),
        F.when(e % 13 == 0, F.lit("sideways"))
        .when(e % 2 == 0, F.lit("ingress")).otherwise(F.lit("egress")),
        s(e % 100), s(e % 9000),
        s(1700000000 + e), s(1700000060 + e),
        F.when(e % 3 == 0, F.lit("ACCEPT")).otherwise(F.lit("REJECT")),
        F.lit("ecs-clu"),
        F.concat(F.lit("vpc-"), s(u % 4)),
    )
    # every 17th line drops its last field -> field-count dead letter
    line = F.when(e % 17 == 0,
                  F.regexp_replace(line, r" vpc-\d$", "")) \
        .otherwise(line)
    fx = ev.select(e.alias("i"), line.alias("line"))
    out = vpc_flow_log_parse(fx, id_cols=["i"], fields=_VPC_FIELDS)
    return out.select(
        "i", "err", "ts_ns",
        F.expr(_FLAT.format(m="attrs")).alias("attr_csv"),
        F.expr(_FLAT.format(m="res_attrs")).alias("res_csv"),
    )


O_VPC_FLOW = """
WITH b AS (
  SELECT event_id AS i, user_id AS u, event_id AS e FROM events
), c AS (
  SELECT *,
    '10.0.0.' || CAST(u % 20 AS VARCHAR) AS src,
    CASE WHEN e % 5 = 0 THEN NULL
         WHEN e % 5 = 1 THEN '10.0.0.' || CAST(u % 20 AS VARCHAR)
         ELSE '172.16.0.' || CAST(u % 9 AS VARCHAR) END AS psrc,
    '10.1.0.' || CAST(e % 30 AS VARCHAR) AS dst,
    CASE WHEN e % 7 = 0 THEN NULL
         WHEN e % 7 = 1 THEN '10.1.0.' || CAST(e % 30 AS VARCHAR)
         ELSE '192.168.0.' || CAST(e % 6 AS VARCHAR) END AS pdst,
    e % 9 = 0 AS bad_proto,
    e % 13 = 0 AS bad_dir,
    e % 17 = 0 AS bad_count
  FROM b
)
SELECT i,
  bad_proto OR bad_dir OR bad_count AS err,
  (1700000060 + e) * 1000000000 AS ts_ns,
  array_to_string(list_sort(list_filter([
    'aws.vpc.flow.log.version=5',
    'source.port=' || CAST(1024 + e % 5000 AS VARCHAR),
    'destination.port=443',
    CASE WHEN bad_proto THEN NULL
         WHEN e % 2 = 0 THEN 'network.protocol.name=tcp'
         ELSE 'network.protocol.name=udp' END,
    CASE WHEN e % 2 = 0 THEN 'network.type=ipv4'
         ELSE 'network.type=ipv6' END,
    CASE WHEN bad_dir THEN NULL
         WHEN e % 2 = 0 THEN 'network.io.direction=receive'
         ELSE 'network.io.direction=transmit' END,
    'aws.vpc.flow.packets=' || CAST(e % 100 AS VARCHAR),
    'aws.vpc.flow.bytes=' || CAST(e % 9000 AS VARCHAR),
    'aws.vpc.flow.start=' || CAST(1700000000 + e AS VARCHAR),
    'aws.vpc.flow.action=' ||
      CASE WHEN e % 3 = 0 THEN 'ACCEPT' ELSE 'REJECT' END,
    CASE WHEN NOT bad_count
      THEN 'aws.vpc.id=vpc-' || CAST(u % 4 AS VARCHAR) END,
    'source.address=' || COALESCE(psrc, src),
    CASE WHEN psrc IS NOT NULL AND psrc <> src
      THEN 'network.local.address=' || src
      WHEN (psrc IS NULL OR psrc = src)
        AND pdst IS NOT NULL AND pdst <> dst
      THEN 'network.local.address=' || dst END,
    'destination.address=' || COALESCE(pdst, dst)
  ], x -> x IS NOT NULL)), ',') AS attr_csv,
  array_to_string(list_sort(list_filter([
    'cloud.provider=aws',
    'cloud.account.id=12345678901' || CAST(u % 10 AS VARCHAR),
    CASE WHEN u % 11 <> 0 THEN 'cloud.region=us-east-1' END
  ], x -> x IS NOT NULL)), ',') AS res_csv
FROM c
"""


def q_waf_logs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.awslogs_encoding import waf_log_parse

    ev = load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    s = lambda c: c.cast("string")  # noqa: E731
    acl = F.when(e % 19 == 0, F.lit("bad-arn")).otherwise(
        F.concat(F.lit("arn:aws:wafv2:eu-west-1:999:regional/webacl/"
                       "acl"), s(u % 3), F.lit("/id"), s(u % 3)))
    line = F.concat(
        F.lit('{"timestamp":'), s(F.lit(1700000000_000) + e),
        F.lit(',"webaclId":"'), acl,
        F.lit('","terminatingRuleId":"rule'), s(e % 4),
        F.lit('","action":"'),
        F.when(e % 2 == 0, F.lit("ALLOW")).otherwise(F.lit("BLOCK")),
        F.lit('","httpRequest":{"clientIp":"203.0.113.'), s(u % 50),
        F.lit('","country":"'),
        F.when(e % 3 == 0, F.lit("US")).otherwise(F.lit("DE")),
        F.lit('","headers":[{"name":"Host","value":"h'), s(u % 2),
        F.lit('"}],"uri":"/p'), s(e % 7),
        F.lit('","args":"q='), s(e % 5),
        F.lit('","httpVersion":"'),
        F.when(e % 23 == 0, F.lit("SPDY")).otherwise(F.lit("HTTP/2")),
        F.lit('","httpMethod":"GET","scheme":"https","host":"h'),
        s(u % 2), F.lit('"}'),
        F.when(e % 6 == 0, F.concat(F.lit(',"responseCodeSent":'),
                                    s(200 + e % 300)))
        .otherwise(F.lit("")),
        F.lit(',"ja3Fingerprint":"ja3-'), s(e % 8), F.lit('"}'))
    fx = ev.select(e.alias("i"), line.alias("line"))
    out = waf_log_parse(fx, id_cols=["i"])
    return out.select(
        "i", "err", "ts_ns",
        F.coalesce(F.expr(_FLAT.format(m="attrs")), F.lit(""))
        .alias("attr_csv"),
        F.coalesce(F.expr(_FLAT.format(m="res_attrs")), F.lit(""))
        .alias("res_csv"),
    )


O_WAF_LOGS = """
WITH b AS (
  SELECT event_id AS i, user_id AS u, event_id AS e FROM events
), c AS (
  SELECT *, e % 19 = 0 OR e % 23 = 0 AS err,
    'arn:aws:wafv2:eu-west-1:999:regional/webacl/acl'
      || CAST(u % 3 AS VARCHAR) || '/id' || CAST(u % 3 AS VARCHAR)
      AS acl
  FROM b
)
SELECT i, err,
  (1700000000000 + e) * 1000000 AS ts_ns,
  CASE WHEN err THEN '' ELSE
    array_to_string(list_sort(list_filter([
      'network.protocol.name=http',
      'network.protocol.version=2',
      CASE WHEN e % 6 = 0 THEN 'http.response.status_code='
        || CAST(200 + e % 300 AS VARCHAR) END,
      'aws.waf.terminating_rule.id=rule' || CAST(e % 4 AS VARCHAR),
      'aws.waf.action=' ||
        CASE WHEN e % 2 = 0 THEN 'ALLOW' ELSE 'BLOCK' END,
      'client.address=203.0.113.' || CAST(u % 50 AS VARCHAR),
      'server.address=h' || CAST(u % 2 AS VARCHAR),
      'url.path=/p' || CAST(e % 7 AS VARCHAR),
      'url.query=q=' || CAST(e % 5 AS VARCHAR),
      'http.request.method=GET',
      'url.scheme=https',
      'geo.country.iso_code=' ||
        CASE WHEN e % 3 = 0 THEN 'US' ELSE 'DE' END,
      'tls.client.ja3=ja3-' || CAST(e % 8 AS VARCHAR),
      'http.request.header.Host=h' || CAST(u % 2 AS VARCHAR)
    ], x -> x IS NOT NULL)), ',')
  END AS attr_csv,
  CASE WHEN err THEN '' ELSE
    array_to_string(list_sort([
      'cloud.provider=aws',
      'cloud.region=eu-west-1',
      'cloud.account.id=999',
      'cloud.resource_id=' || acl
    ]), ',')
  END AS res_csv
FROM c
"""

EXT40_QUERIES["vpc_flow_logs"] = q_vpc_flow_logs
EXT40_ORACLES["vpc_flow_logs"] = O_VPC_FLOW
EXT40_QUERIES["waf_logs"] = q_waf_logs
EXT40_ORACLES["waf_logs"] = O_WAF_LOGS


def q_s3_access_logs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.awslogs_encoding import s3_access_log_parse

    ev = load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    s = lambda c: c.cast("string")  # noqa: E731
    uri = F.concat(
        F.lit('"GET /key'), s(e % 9),
        F.when(e % 4 == 0, F.concat(F.lit("?ver="), s(e % 3)))
        .otherwise(F.lit("")),
        F.when(e % 21 == 0, F.lit(" HTTPX")).otherwise(
            F.lit(" HTTP/1.1")), F.lit('"'))
    line = F.concat_ws(
        " ",
        F.concat(F.lit("owner"), s(u % 3)),
        F.concat(F.lit("bucket"), s(u % 2)),
        F.lit("[12/Feb/2024:10:30:05 +0000]"),
        F.concat(F.lit("198.51.100."), s(u % 40)),
        F.when(e % 5 == 0, F.lit("-")).otherwise(
            F.concat(F.lit("arn:user"), s(u % 4))),
        F.concat(F.lit("REQ"), s(e % 1000)),
        F.lit("REST.GET.OBJECT"),
        F.concat(F.lit("obj/key"), s(e % 9)),
        uri,
        s(200 + e % 300),
        F.when(e % 11 == 0, F.lit("NoSuchKey")).otherwise(F.lit("-")),
        s(e % 5000), s(e % 9000), s(e % 200), s(e % 100),
        F.lit('"-"'),
        F.concat(F.lit('"agent '), s(u % 5), F.lit('"')),
        F.lit("-"),
        F.concat(F.lit("host"), s(e % 7)),
        F.lit("SigV4"),
        F.lit("ECDHE-RSA-AES128-SHA"),
        F.lit("AuthHeader"),
        F.concat(F.lit("bucket"), s(u % 2), F.lit(".s3.amazonaws.com")),
        F.when(e % 13 == 0, F.lit("TLSX")).otherwise(F.lit("TLSv1.2")),
        F.lit("-"),
        F.when(e % 2 == 0, F.lit("Yes")).otherwise(F.lit("-")),
    )
    fx = ev.select(e.alias("i"), line.alias("line"))
    out = s3_access_log_parse(fx, id_cols=["i"])
    return out.select(
        "i", "err", "ts_ns",
        F.coalesce(F.expr(_FLAT.format(m="attrs")), F.lit(""))
        .alias("attr_csv"),
        F.coalesce(F.expr(_FLAT.format(m="res_attrs")), F.lit(""))
        .alias("res_csv"),
    )


O_S3_ACCESS = """
WITH b AS (
  SELECT event_id AS i, user_id AS u, event_id AS e FROM events
), c AS (
  SELECT *, e % 21 = 0 OR e % 13 = 0 AS err FROM b
)
SELECT i, err,
  1707733805000000000 AS ts_ns,
  CASE WHEN err THEN '' ELSE
    array_to_string(list_sort(list_filter([
      'source.address=198.51.100.' || CAST(u % 40 AS VARCHAR),
      CASE WHEN e % 5 <> 0
        THEN 'user.id=arn:user' || CAST(u % 4 AS VARCHAR) END,
      'aws.request_id=REQ' || CAST(e % 1000 AS VARCHAR),
      'rpc.method=REST.GET.OBJECT',
      'aws.s3.key=obj/key' || CAST(e % 9 AS VARCHAR),
      'http.request.method=GET',
      'url.path=/key' || CAST(e % 9 AS VARCHAR),
      CASE WHEN e % 4 = 0
        THEN 'url.query=ver=' || CAST(e % 3 AS VARCHAR) END,
      'network.protocol.name=http',
      'network.protocol.version=1.1',
      'http.response.status_code=' || CAST(200 + e % 300 AS VARCHAR),
      CASE WHEN e % 11 = 0 THEN 'error.type=NoSuchKey' END,
      'http.response.body.size=' || CAST(e % 5000 AS VARCHAR),
      'aws.s3.object.size=' || CAST(e % 9000 AS VARCHAR),
      'duration=' || CAST(e % 200 AS VARCHAR),
      'aws.s3.turn_around_time=' || CAST(e % 100 AS VARCHAR),
      'user_agent.original=agent ' || CAST(u % 5 AS VARCHAR),
      'aws.extended_request_id=host' || CAST(e % 7 AS VARCHAR),
      'aws.signature.version=SigV4',
      'tls.cipher=ECDHE-RSA-AES128-SHA',
      'aws.s3.auth_type=AuthHeader',
      'http.request.header.host=bucket' || CAST(u % 2 AS VARCHAR)
        || '.s3.amazonaws.com',
      'tls.protocol.version=1.2',
      'aws.s3.acl_required=' ||
        CASE WHEN e % 2 = 0 THEN 'true' ELSE 'false' END
    ], x -> x IS NOT NULL)), ',')
  END AS attr_csv,
  CASE WHEN err THEN '' ELSE
    array_to_string(list_sort([
      'cloud.provider=aws',
      'aws.s3.bucket=bucket' || CAST(u % 2 AS VARCHAR),
      'aws.s3.owner=owner' || CAST(u % 3 AS VARCHAR)
    ]), ',')
  END AS res_csv
FROM c
"""


def q_cloudtrail_logs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.awslogs_encoding import cloudtrail_log_parse

    ev = load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    s = lambda c: c.cast("string")  # noqa: E731
    rec = F.concat(
        F.lit('{"eventVersion":"1.10","eventTime":"'),
        F.when(e % 29 == 0, F.lit("not-a-time")).otherwise(
            F.lit("2024-02-12T10:30:05Z")),
        F.lit('","eventSource":"s3.amazonaws.com","eventName":"Ev'),
        s(e % 6),
        F.lit('","awsRegion":"us-west-2","sourceIPAddress":'
              '"203.0.113.'), s(u % 9),
        F.lit('","requestID":"R'), s(e % 100),
        F.lit('","eventID":"E'), s(e),
        F.lit('","eventType":"AwsApiCall","eventCategory":'
              '"Management","recipientAccountId":"55'), s(u % 4),
        F.lit('","userIdentity":{"type":"IAMUser","userName":"un'),
        s(u % 7),
        F.lit('","accessKeyId":"AK'), s(u % 3),
        F.lit('"},"readOnly":'),
        F.when(e % 2 == 0, F.lit("true")).otherwise(F.lit("false")),
        F.lit(',"tlsDetails":{"tlsVersion":"TLSv1.3","cipherSuite":'
              '"C1"},"sessionCredentialFromConsole":"'),
        F.when(e % 3 == 0, F.lit("true")).otherwise(F.lit("false")),
        F.lit('","requestParameters":{"bucketName":"b'), s(u % 2),
        F.lit('"},"resources":[{"accountId":"55'), s(u % 4),
        F.lit('","type":"AWS::S3::Bucket","ARN":"arn:b'), s(u % 2),
        F.lit('"}]'),
        F.when(e % 7 == 0,
               F.concat(F.lit(',"errorCode":"AccessDenied",'
                              '"errorMessage":"denied '), s(e % 5),
                        F.lit('"'))).otherwise(F.lit("")),
        F.lit("}"))
    body = F.concat(F.lit('{"Records":['), rec, F.lit("]}"))
    fx = ev.select(e.alias("i"), body.alias("body"))
    out = cloudtrail_log_parse(fx, id_cols=["i"])
    return out.select(
        "i", "err", "ts_ns",
        F.coalesce(F.expr(_FLAT.format(m="attrs")), F.lit(""))
        .alias("attr_csv"),
        F.coalesce(F.expr(_FLAT.format(m="request_parameters"))
                   , F.lit("")).alias("req_csv"),
        F.coalesce(F.array_join(F.transform(
            F.col("resources"),
            lambda x: F.concat_ws("|", x["account_id"], x["type"],
                                  x["arn"])), ";"), F.lit(""))
        .alias("resources_csv"),
        F.expr(_FLAT.format(m="res_attrs")).alias("res_csv"),
    )


O_CLOUDTRAIL = """
WITH b AS (
  SELECT event_id AS i, user_id AS u, event_id AS e FROM events
)
SELECT i,
  e % 29 = 0 AS err,
  CASE WHEN e % 29 = 0 THEN NULL
    ELSE 1707733805000000000 END AS ts_ns,
  CASE WHEN e % 29 = 0 THEN '' ELSE
    array_to_string(list_sort(list_filter([
      'aws.cloudtrail.event_version=1.10',
      'aws.cloudtrail.event_id=E' || CAST(e AS VARCHAR),
      'rpc.method=Ev' || CAST(e % 6 AS VARCHAR),
      'rpc.system=AwsApiCall',
      'rpc.service=s3.amazonaws.com',
      'aws.request_id=R' || CAST(e % 100 AS VARCHAR),
      'aws.event.category=Management',
      'aws.event.read_only=' ||
        CASE WHEN e % 2 = 0 THEN 'true' ELSE 'false' END,
      'source.address=203.0.113.' || CAST(u % 9 AS VARCHAR),
      CASE WHEN e % 3 = 0 THEN 'aws.session.console=true' END,
      'user.name=un' || CAST(u % 7 AS VARCHAR),
      'aws.access_key.id=AK' || CAST(u % 3 AS VARCHAR),
      'aws.principal.type=IAMUser',
      'tls.protocol.version=1.3',
      'tls.cipher=C1',
      CASE WHEN e % 7 = 0 THEN 'aws.error.code=AccessDenied' END,
      CASE WHEN e % 7 = 0
        THEN 'aws.error.message=denied ' || CAST(e % 5 AS VARCHAR) END
    ], x -> x IS NOT NULL)), ',')
  END AS attr_csv,
  CASE WHEN e % 29 = 0 THEN ''
    ELSE 'bucketName=b' || CAST(u % 2 AS VARCHAR) END AS req_csv,
  CASE WHEN e % 29 = 0 THEN ''
    ELSE '55' || CAST(u % 4 AS VARCHAR) || '|AWS::S3::Bucket|arn:b'
      || CAST(u % 2 AS VARCHAR) END AS resources_csv,
  array_to_string(list_sort([
    'cloud.provider=aws',
    'cloud.region=us-west-2',
    'cloud.account.id=55' || CAST(u % 4 AS VARCHAR)
  ]), ',') AS res_csv
FROM b
"""

EXT40_QUERIES["s3_access_logs"] = q_s3_access_logs
EXT40_ORACLES["s3_access_logs"] = O_S3_ACCESS
EXT40_QUERIES["cloudtrail_logs"] = q_cloudtrail_logs
EXT40_ORACLES["cloudtrail_logs"] = O_CLOUDTRAIL

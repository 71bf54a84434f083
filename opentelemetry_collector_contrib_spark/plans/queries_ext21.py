"""Round-5 queries (cont. 5): the azurelogs (next-gen) translator.

``pkg/translator/azure`` (envelope) landed earlier as
``azure_resource_logs``; this module covers ``pkg/translator/azurelogs``
— the category-dispatched semconv mapping (CDN / Front Door access /
Front Door WAF handlers), the REQUIRED-int / putStr / ×1e3-truncation
helpers, and the raw-attribute fallback body with the
property_names.go per-category hand-off. The fixture is a
deterministic single-record-batch projection of ``events`` cycling
through six categories; the oracle replicates every branch in DuckDB
SQL (trunc(), never round(), to match Go's int64 truncation).
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import QueryFn, load

EXT21_QUERIES: dict[str, QueryFn] = {}
EXT21_ORACLES: dict[str, str] = {}

_CATS = ["AzureCdnAccessLog", "FrontDoorAccessLog",
         "FrontDoorWebApplicationFirewallLog", "AppServiceHTTPLogs",
         "FrontDoorHealthProbeLog", "MysteryCategory"]


def _azurelogs_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    e, u = F.col("event_id"), F.col("user_id")
    s = lambda c: c.cast("string")  # noqa: E731
    cat = F.element_at(F.array(*[F.lit(c) for c in _CATS]),
                       (e % 6).cast("int") + 1)
    is_acc = e % 6 <= 1          # CDN + FrontDoor access
    is_cdn, is_fd, is_waf = e % 6 == 0, e % 6 == 1, e % 6 == 2
    is_http, is_hp, is_myst = e % 6 == 3, e % 6 == 4, e % 6 == 5

    iso = F.date_format(F.timestamp_seconds(F.lit(1767225600) + e % 100000),
                        "yyyy-MM-dd'T'HH:mm:ss'Z'")
    ts_or_bad = F.when(e % 31 == 0, F.lit("not-a-time")).otherwise(iso)
    ei = (F.when(e % 5 == 0, F.lit("NoError"))
          .when(e % 5 == 1, F.lit(""))
          .otherwise(F.lit("OriginTimeout")))
    uri = F.when(
        u % 6 == 3,
        F.concat(F.lit("https://h"), s(u % 3), F.lit(".example.com/p/"),
                 s(e % 7)),
    ).otherwise(
        F.concat(F.lit("https://h"), s(u % 3), F.lit(".example.com:8"),
                 s(e % 3), F.lit("80/p/"), s(e % 7), F.lit("?q="),
                 s(e % 5)))
    endpoint = F.when(u % 2 == 0,
                      F.concat(F.lit("ep"), s(u % 5), F.lit(".net:443"))
                      ).otherwise(F.concat(F.lit("ep"), s(u % 5),
                                           F.lit(".net")))

    def w(cond, v: Column) -> Column:
        return F.when(cond, v)

    props = F.struct(
        # --- shared access-log core (CDN + FrontDoor access) ----------
        w(is_acc | is_waf,
          F.when(e % 11 != 0, F.concat(F.lit("ref"), s(e % 11)))
          .otherwise(F.lit(""))).alias("trackingReference"),
        w(is_acc, F.when(u % 2 == 0, F.lit("GET")).otherwise(
            F.lit("POST"))).alias("httpMethod"),
        w(is_acc, F.lit("2.0")).alias("httpVersion"),
        w(is_acc | is_waf, uri).alias("requestUri"),
        w(is_acc, F.when(u % 4 == 0, F.lit("N/A")).otherwise(
            F.concat(F.lit("sni"), s(u % 4)))).alias("sni"),
        w(is_acc, F.when(e % 29 == 0, F.lit("x")).otherwise(
            s(e % 900 + 100))).alias("requestBytes"),
        w(is_acc, s(e % 1800 + 200)).alias("responseBytes"),
        w(is_acc, F.concat(F.lit("ua/"), s(u % 5))).alias("userAgent"),
        w(is_acc, F.concat(F.lit("1.2.3."), s(e % 200))).alias("clientIp"),
        w(is_acc, s(e % 1000 + 40000)).otherwise(
            w(is_waf, F.when(e % 29 == 0, F.lit("x")).otherwise(
                s(e % 100 + 30000)))).alias("clientPort"),
        w(is_acc, F.concat(F.lit("4.5.6."), s(u % 200))).alias("socketIp"),
        w(is_acc, F.concat(F.lit("0."), s(e % 9 + 1)))
        .alias("timeToFirstByte"),
        w(is_acc, F.concat(F.lit("1."), s(e % 5))).alias("timeTaken"),
        w(is_acc, F.lit("tcp")).alias("requestProtocol"),
        w(is_acc, F.concat(F.lit("TLS 1."), s(u % 3)))
        .alias("securityProtocol"),
        w(is_acc, s((e % 4) * 100 + 200)).alias("httpStatusCode"),
        w(is_acc, F.when(e % 2 == 0, F.lit("LAX")).otherwise(F.lit("")))
        .alias("pop"),
        w(is_acc, F.when(u % 2 == 0, F.lit("HIT")).otherwise(
            F.lit("N/A"))).alias("cacheStatus"),
        w(is_acc, ei).alias("errorInfo"),
        w(is_acc & (u % 7 == 0),
          F.when(e % 37 == 0, F.lit("Other")).otherwise(ei))
        .alias("ErrorInfo"),
        w(is_acc, endpoint).alias("endpoint"),
        w(is_cdn, e % 2 == 0).alias("isReceivedFromClient"),
        w(is_cdn, F.when(e % 4 == 0, F.concat(F.lit("origin"), s(e % 3),
                                              F.lit(":8080")))
          .otherwise(F.lit(""))).alias("backendHostname"),
        # --- FrontDoor access extras ----------------------------------
        w(is_fd, F.concat(F.lit("site"), s(u % 3), F.lit(".com")))
        .alias("hostName"),
        w(is_fd, F.when(u % 2 == 0, F.concat(F.lit("7.7.7."), s(e % 9),
                                             F.lit(":9090")))
          .otherwise(F.lit("N/A"))).alias("originIp"),
        w(is_fd, F.when(e % 2 == 0, F.lit("c1")).otherwise(F.lit("")))
        .alias("securityCipher"),
        w(is_fd, F.when(u % 2 == 0, F.lit("x25519")).otherwise(
            F.lit("N/A"))).alias("securityCurves"),
        # --- WAF --------------------------------------------------------
        w(is_waf, F.concat(F.lit("9.9.9."), s(e % 50))).alias("clientIP"),
        w(is_waf, F.concat(F.lit("8.8.8."), s(u % 50))).alias("socketIP"),
        w(is_waf, F.when(e % 3 != 0, F.concat(F.lit("rule"), s(e % 3)))
          .otherwise(F.lit(""))).alias("ruleName"),
        w(is_waf, F.concat(F.lit("pol"), s(u % 2))).alias("policy"),
        w(is_waf, F.when(e % 2 == 0, F.lit("Block")).otherwise(
            F.lit("Log"))).alias("action"),
        w(is_waf, F.concat(F.lit("w"), s(u % 3), F.lit(".com")))
        .alias("host"),
        w(is_waf, F.when(u % 2 == 0, F.lit("prevention")).otherwise(
            F.lit(""))).alias("policyMode"),
        # --- AppServiceHTTPLogs (fallback) ------------------------------
        w(is_http, F.concat(F.lit("5.5.5."), s(e % 9))).alias("CIp"),
        w(is_http, F.concat(F.lit("pc"), s(u % 3))).alias("ComputerName"),
        w(is_http, s(e % 500)).alias("CsBytes"),
        w(is_http, F.concat(F.lit("h"), s(u % 2), F.lit(".com")))
        .alias("CsHost"),
        w(is_http, F.lit("GET")).alias("CsMethod"),
        w(is_http, F.concat(F.lit("a="), s(e % 3))).alias("CsUriQuery"),
        w(is_http, F.concat(F.lit("/s/"), s(e % 4))).alias("CsUriStem"),
        w(is_http & (e % 2 == 0), F.lit("r1")).alias("Referer"),
        w(is_http, s(e % 700)).alias("ScBytes"),
        w(is_http, s((u % 3) * 100 + 200)).alias("ScStatus"),
        w(is_http, F.lit("443")).alias("SPort"),
        w(is_http, s(e % 90 + 10)).alias("TimeTaken"),
        w(is_http, F.concat(F.lit("ua"), s(u % 4))).alias("UserAgent"),
        w(is_http, F.when(e % 17 == 0, F.lit("BAD")).otherwise(
            F.concat(F.lit("HTTP/1."), s(u % 2)))).alias("Protocol"),
        w(is_http, F.concat(F.lit("x"), s(e % 2))).alias("extra"),
        # --- FrontDoorHealthProbeLog (fallback) -------------------------
        w(is_hp, F.lit("HEAD")).alias("httpVerb"),
        w(is_hp, F.concat(F.lit("https://p"), s(u % 2), F.lit(".com/h")))
        .alias("probeURL"),
        w(is_hp, F.concat(F.lit("6.6.6."), s(e % 9))).alias("originIP"),
        w(is_hp, s(e % 5000 + 1000)).alias("DNSLatencyMicroseconds"),
        w(is_hp, s(e % 300 + 20)).alias("totalLatencyMilliseconds"),
        w(is_hp, F.concat(F.lit("hp"), s(e % 3))).alias("extraHp"),
        # --- MysteryCategory (default fallback) -------------------------
        w(is_myst, F.concat(F.lit("v"), s(e % 3))).alias("k1"),
        w(is_myst, (e % 7).cast("int")).alias("k2"),
    )
    # HP reuses httpStatusCode with its own values
    props = props.withField(
        "httpStatusCode",
        w(is_acc, s((e % 4) * 100 + 200)).otherwise(
            w(is_hp, s((e % 2) * 200 + 200))))

    rec = F.struct(
        F.when(e % 13 != 5, ts_or_bad).alias("time"),
        F.when(e % 13 == 5, ts_or_bad).alias("timeStamp"),
        F.concat(F.lit("/SUB/r"), s(u % 4)).alias("resourceId"),
        w(u % 5 != 4, F.concat(F.lit("tn"), s(u % 5))).alias("tenantId"),
        F.concat(F.lit("op"), s(e % 3)).alias("operationName"),
        w(u % 3 == 0, F.lit("ov1")).alias("operationVersion"),
        cat.alias("category"),
        w(e % 2 == 0, F.lit("rt")).alias("resultType"),
        w(e % 3 == 0, F.lit("rs")).alias("resultSignature"),
        w(e % 4 == 0, F.lit("rd")).alias("resultDescription"),
        w(u % 2 == 0, s(e % 90)).alias("durationMs"),
        w(u % 2 == 1, F.concat(F.lit("10.0.0."), s(e % 200)))
        .alias("callerIpAddress"),
        w(e % 3 != 1, F.concat(F.lit("c"), s(e % 7)))
        .alias("correlationId"),
        F.element_at(
            F.array(F.lit("Informational"), F.lit("Warning"),
                    F.lit("Error"), F.lit("Critical"), F.lit("5"),
                    F.lit(None).cast("string")),
            (u % 6).cast("int") + 1).alias("Level"),
        w(u % 4 != 3, F.concat(F.lit("westus"), s(u % 2)))
        .alias("location"),
        props.alias("properties"),
        w(e % 19 == 0,
          F.struct(F.concat(F.lit("w"), s(u % 3)).alias("who")))
        .alias("identity"),
    )
    return ev.select(
        e.alias("event_id"),
        F.to_json(F.struct(F.array(rec).alias("records"))).alias("body"),
    )


def q_azurelogs_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.azurelogs import azurelogs_parse
    fx = _azurelogs_fixture(spark, sf_dir)
    return azurelogs_parse(fx).select(
        "event_id", "az2_resource_id", "az2_ts_ns", "az2_sev_num",
        "az2_sev_text", "az2_cat", "az2_err", "az2_attrs", "az2_body")


def q_azurelogs_category_counts(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Per (resource, category) record/error counts — the per-resource
    grouping half of UnmarshalLogs (resourcelogs_to_logs.go:96-104,
    163-170)."""
    from ..operators.azurelogs import azurelogs_parse
    fx = _azurelogs_fixture(spark, sf_dir)
    return (azurelogs_parse(fx)
            .groupBy("az2_resource_id", "az2_cat")
            .agg(F.count(F.lit(1)).alias("n_records"),
                 F.sum(F.when(F.col("az2_err"), 1).otherwise(0))
                 .cast("bigint").alias("n_errors"),
                 F.min("az2_ts_ns").alias("min_ts_ns")))


# --------------------------------------------------------------------------
# oracle: every branch re-derived from (e, u) in DuckDB SQL
# --------------------------------------------------------------------------

_RECORDS_SQL = """
WITH f AS (
  SELECT event_id AS e, user_id AS u FROM events
), d AS (
  SELECT e, u,
    ['AzureCdnAccessLog','FrontDoorAccessLog',
     'FrontDoorWebApplicationFirewallLog','AppServiceHTTPLogs',
     'FrontDoorHealthProbeLog','MysteryCategory'][CAST(e % 6 AS INT) + 1]
      AS cat,
    e % 6 <= 1 AS is_acc, e % 6 = 0 AS is_cdn, e % 6 = 1 AS is_fd,
    e % 6 = 2 AS is_waf, e % 6 = 3 AS is_http, e % 6 = 4 AS is_hp,
    e % 6 = 5 AS is_myst,
    (1767225600 + e % 100000) * 1000000000 AS ts_ns,
    [9, 13, 17, 21, 5, NULL][CAST(u % 6 AS INT) + 1] AS sev_num,
    ['Informational','Warning','Error','Critical','5',
     NULL][CAST(u % 6 AS INT) + 1] AS sev_text,
    CASE WHEN e % 5 = 0 THEN 'NoError' WHEN e % 5 = 1 THEN ''
         ELSE 'OriginTimeout' END AS ei,
    u % 7 = 0 AS has_ei1,
    CASE WHEN e % 37 = 0 THEN 'Other'
         WHEN e % 5 = 0 THEN 'NoError' WHEN e % 5 = 1 THEN ''
         ELSE 'OriginTimeout' END AS ei1,
    u % 6 = 3 AS uri_noport,
    'h' || CAST(u % 3 AS VARCHAR) || '.example.com' AS uri_host,
    '8' || CAST(e % 3 AS VARCHAR) || '80' AS uri_port,
    '/p/' || CAST(e % 7 AS VARCHAR) AS uri_path,
    'q=' || CAST(e % 5 AS VARCHAR) AS uri_query,
    'ep' || CAST(u % 5 AS VARCHAR) || '.net' AS ep_host,
    u % 2 = 0 AS ep_has_port,
    e % 4 = 0 AS has_backend,
    'origin' || CAST(e % 3 AS VARCHAR) AS be_host,
    trunc(CAST('0.' || CAST(e % 9 + 1 AS VARCHAR) AS DOUBLE) * 1000)
      AS ttfb,
    trunc(CAST('1.' || CAST(e % 5 AS VARCHAR) AS DOUBLE) * 1000)
      AS ttaken
  FROM f
), lab AS (
  SELECT *,
    CASE WHEN uri_noport
         THEN 'https://' || uri_host || uri_path
         ELSE 'https://' || uri_host || ':' || uri_port || uri_path
              || '?' || uri_query END AS uri,
    CASE WHEN has_ei1 AND ei1 <> '' THEN ei1 ELSE ei END AS ei_chosen,
    is_acc AND has_ei1 AND e % 37 = 0 AND e % 5 <> 1 AS ei_err,
    e % 3 <> 1 AS has_corr, 'c' || CAST(e % 7 AS VARCHAR) AS corr,
    'op' || CAST(e % 3 AS VARCHAR) AS opname,
    u % 3 = 0 AS has_opver
  FROM d
), enc AS (
  SELECT *,
    -- uri fan (shared by access + waf)
    ['url.original=' || uri,
     CASE WHEN NOT uri_noport THEN 'url.port=' || uri_port END,
     'url.scheme=https',
     'url.path=' || uri_path,
     CASE WHEN NOT uri_noport THEN 'url.query=' || uri_query END
    ] AS uri_toks,
    -- common schema (implemented categories only)
    ['azure.category=' || cat,
     CASE WHEN has_corr THEN 'azure.correlation_id=' || corr END,
     'azure.operation.name=' || opname,
     CASE WHEN has_opver THEN 'azure.operation.version=ov1' END
    ] AS common_toks
  FROM lab
), built AS (
  SELECT *,
    -- error: bad requestBytes (acc) / bad clientPort (waf) / errorInfo
    CASE WHEN is_acc THEN (e % 29 = 0) OR ei_err
         WHEN is_waf THEN e % 29 = 0
         ELSE FALSE END AS err,
    CASE
      WHEN is_acc THEN
        ['http.request.size=' || CAST(e % 900 + 100 AS VARCHAR),
         'http.response.size=' || CAST(e % 1800 + 200 AS VARCHAR),
         'client.port=' || CAST(e % 1000 + 40000 AS VARCHAR),
         'http.response.status_code=' ||
           CAST((e % 4) * 100 + 200 AS VARCHAR),
         'azure.time_to_first_byte=' || CAST(CAST(ttfb AS BIGINT) AS VARCHAR),
         'duration=' || CAST(CAST(ttaken AS BIGINT) AS VARCHAR),
         CASE WHEN ei_chosen <> '' AND ei_chosen <> 'NoError'
              THEN 'exception.type=' || ei_chosen END,
         CASE WHEN e % 11 <> 0
              THEN 'azure.ref=ref' || CAST(e % 11 AS VARCHAR) END,
         'http.request.method=' ||
           CASE WHEN u % 2 = 0 THEN 'GET' ELSE 'POST' END,
         'network.protocol.version=2.0',
         'network.protocol.name=tcp',
         CASE WHEN u % 4 <> 0
              THEN 'tls.server.name=sni' || CAST(u % 4 AS VARCHAR) END,
         'user_agent.original=ua/' || CAST(u % 5 AS VARCHAR),
         'client.address=1.2.3.' || CAST(e % 200 AS VARCHAR),
         'source.address=4.5.6.' || CAST(u % 200 AS VARCHAR),
         CASE WHEN e % 2 = 0 THEN 'azure.pop=LAX' END,
         CASE WHEN u % 2 = 0 THEN 'azure.cache_status=HIT' END,
         'tls.protocol.name=TLS',
         'tls.protocol.version=1.' || CAST(u % 3 AS VARCHAR)]
        || uri_toks
        || CASE
             WHEN is_cdn THEN
               ['network.io.direction=' ||
                  CASE WHEN e % 2 = 0 THEN 'receive' ELSE 'transmit' END]
               || CASE WHEN has_backend THEN
                    ['destination.address=' || be_host,
                     'destination.port=8080',
                     'network.peer.address=' || ep_host,
                     CASE WHEN ep_has_port
                          THEN 'network.peer.port=443' END]
                  ELSE
                    ['destination.address=' || ep_host,
                     CASE WHEN ep_has_port
                          THEN 'destination.port=443' END]
                  END
             ELSE  -- FrontDoor access
               ['destination.address=site' || CAST(u % 3 AS VARCHAR)
                  || '.com',
                'network.peer.address=' || ep_host,
                CASE WHEN ep_has_port THEN 'network.peer.port=443' END,
                CASE WHEN u % 2 = 0
                     THEN 'server.address=7.7.7.' || CAST(e % 9 AS VARCHAR)
                     END,
                CASE WHEN u % 2 = 0 THEN 'server.port=9090' END,
                CASE WHEN u % 2 = 0 THEN 'tls.curve=x25519' END,
                CASE WHEN e % 2 = 0 THEN 'tls.cipher=c1' END]
           END
        || common_toks
      WHEN is_waf THEN
        ['client.port=' || CAST(e % 100 + 30000 AS VARCHAR),
         'client.address=9.9.9.' || CAST(e % 50 AS VARCHAR),
         'source.address=8.8.8.' || CAST(u % 50 AS VARCHAR),
         CASE WHEN e % 11 <> 0
              THEN 'azure.ref=ref' || CAST(e % 11 AS VARCHAR) END,
         'http.request.header.host=w' || CAST(u % 3 AS VARCHAR) || '.com',
         'azure.frontdoor.waf.policy.name=pol' || CAST(u % 2 AS VARCHAR),
         CASE WHEN u % 2 = 0
              THEN 'azure.frontdoor.waf.policy.mode=prevention' END,
         CASE WHEN e % 3 <> 0
              THEN 'azure.frontdoor.waf.rule.name=rule'
                   || CAST(e % 3 AS VARCHAR) END,
         'azure.frontdoor.waf.action=' ||
           CASE WHEN e % 2 = 0 THEN 'Block' ELSE 'Log' END]
        || uri_toks || common_toks
    END AS attr_toks,
    CASE WHEN NOT (is_acc OR is_waf) THEN
      ['category=' || cat,
       CASE WHEN has_corr THEN 'correlation.id=' || corr END,
       CASE WHEN u % 2 = 0
            THEN 'duration=' || CAST(e % 90 AS VARCHAR) END,
       CASE WHEN e % 19 = 0
            THEN 'identity={"who":"w' || CAST(u % 3 AS VARCHAR) || '"}'
            END,
       'operation.name=' || opname,
       CASE WHEN has_opver THEN 'operation.version=ov1' END,
       CASE WHEN e % 4 = 0 THEN 'result.description=rd' END,
       CASE WHEN e % 3 = 0 THEN 'result.signature=rs' END,
       CASE WHEN e % 2 = 0 THEN 'result.type=rt' END,
       CASE WHEN u % 5 <> 4
            THEN 'tenant.id=tn' || CAST(u % 5 AS VARCHAR) END,
       CASE WHEN u % 4 <> 3
            THEN 'cloud.region=westus' || CAST(u % 2 AS VARCHAR) END,
       CASE WHEN u % 2 = 1
            THEN 'network.peer.address=10.0.0.'
                 || CAST(e % 200 AS VARCHAR) END]
      || CASE
           WHEN is_http THEN
             ['client.address=5.5.5.' || CAST(e % 9 AS VARCHAR),
              'host.name=pc' || CAST(u % 3 AS VARCHAR),
              'http.request.body.size=' || CAST(e % 500 AS VARCHAR),
              'url.domain=h' || CAST(u % 2 AS VARCHAR) || '.com',
              'http.request.method=GET',
              'url.query=a=' || CAST(e % 3 AS VARCHAR),
              'url.path=/s/' || CAST(e % 4 AS VARCHAR),
              CASE WHEN e % 2 = 0
                   THEN 'http.request.header.referer=r1' END,
              'http.response.body.size=' || CAST(e % 700 AS VARCHAR),
              'http.response.status_code=' ||
                CAST((u % 3) * 100 + 200 AS VARCHAR),
              'server.port=443',
              'http.server.request.duration=' ||
                CAST(CAST(e % 90 + 10 AS DOUBLE) / 1000 AS VARCHAR),
              'user_agent.original=ua' || CAST(u % 4 AS VARCHAR),
              CASE WHEN e % 17 <> 0
                   THEN 'network.protocol.name=http' END,
              CASE WHEN e % 17 <> 0
                   THEN 'network.protocol.version=1.'
                        || CAST(u % 2 AS VARCHAR) END,
              'properties={"extra":"x' || CAST(e % 2 AS VARCHAR) || '"}']
           WHEN is_hp THEN
             ['http.request.method=HEAD',
              'http.response.status_code=' ||
                CAST((e % 2) * 200 + 200 AS VARCHAR),
              'url.full=https://p' || CAST(u % 2 AS VARCHAR) || '.com/h',
              'server.address=6.6.6.' || CAST(e % 9 AS VARCHAR),
              'dns.lookup.duration=' ||
                CAST(CAST(e % 5000 + 1000 AS DOUBLE) / 1000000 AS VARCHAR),
              'http.request.duration=' ||
                CAST(CAST(e % 300 + 20 AS DOUBLE) / 1000 AS VARCHAR),
              'properties={"extraHp":"hp' || CAST(e % 3 AS VARCHAR)
                || '"}']
           ELSE
             ['properties={"k1":"v' || CAST(e % 3 AS VARCHAR)
                || '","k2":"' || CAST(e % 7 AS VARCHAR) || '"}']
         END
    END AS body_toks
  FROM enc
)
SELECT e AS event_id,
  '/SUB/r' || CAST(u % 4 AS VARCHAR) AS az2_resource_id,
  ts_ns AS az2_ts_ns,
  sev_num AS az2_sev_num,
  sev_text AS az2_sev_text,
  cat AS az2_cat,
  err AS az2_err,
  CASE WHEN (is_acc OR is_waf) AND NOT err THEN
    array_to_string(list_sort(list_filter(attr_toks,
      x -> x IS NOT NULL)), ',') END AS az2_attrs,
  CASE WHEN NOT (is_acc OR is_waf) THEN
    array_to_string(list_sort(list_filter(body_toks,
      x -> x IS NOT NULL)), ',') END AS az2_body
FROM built
WHERE e % 31 <> 0
"""

O_AZURELOGS_RECORDS = _RECORDS_SQL

O_AZURELOGS_CATEGORY_COUNTS = f"""
WITH recs AS ({_RECORDS_SQL})
SELECT az2_resource_id, az2_cat, COUNT(*) AS n_records,
       CAST(SUM(CASE WHEN az2_err THEN 1 ELSE 0 END) AS BIGINT)
         AS n_errors,
       MIN(az2_ts_ns) AS min_ts_ns
FROM recs GROUP BY az2_resource_id, az2_cat
"""

EXT21_QUERIES["azurelogs_records"] = q_azurelogs_records
EXT21_ORACLES["azurelogs_records"] = O_AZURELOGS_RECORDS
EXT21_QUERIES["azurelogs_category_counts"] = q_azurelogs_category_counts
EXT21_ORACLES["azurelogs_category_counts"] = O_AZURELOGS_CATEGORY_COUNTS

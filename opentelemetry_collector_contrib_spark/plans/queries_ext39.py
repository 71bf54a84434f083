"""Round-5 queries (cont. 23): OTLP logs -> Faro payloads
(``pkg/translator/faro/logs_to_faro.go``), the write twin of
``faro_logs``.

Bodies are logfmt lines (quoted values, escaped-newline stacktraces)
covering all four kinds; meta varies over three classes so the
meta-hash payload merge produces three grouped rows.  The oracle
rebuilds the canonical meta JSON literally and aggregates the item
signatures with ordered string_agg + md5.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import QueryFn, load

EXT39_QUERIES: dict[str, QueryFn] = {}
EXT39_ORACLES: dict[str, str] = {}


def q_faro_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.faro_export import logs_to_faro_payloads

    ev = load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    s = lambda c: c.cast("string")  # noqa: E731
    common = F.concat(F.lit(" sdk_name=faro browser_name=chrome"),
                      s(u % 3))
    body = (
        F.when(e % 4 == 0, F.concat(
            F.lit('kind=log message="m '), s(e % 7),
            F.lit('" level='),
            F.when(e % 2 == 0, F.lit("info")).otherwise(F.lit("error")),
            F.lit(" context_c1=k"), s(e % 5),
            F.lit(" traceID=t"), s(e % 11), common))
        .when(e % 4 == 1, F.concat(
            F.lit("kind=event event_name=click"), s(e % 3),
            F.lit(" event_domain=browser event_data_x="), s(e % 9),
            common))
        .when(e % 4 == 2, F.concat(
            F.lit("kind=measurement type=cls value_v1="), s(e % 9),
            F.lit(".5 context_c2=z"), common))
        .otherwise(F.concat(
            F.lit("kind=exception type=Error value=boom"), s(e % 2),
            F.lit(' stacktrace="Error: boom'), s(e % 2),
            F.lit("\\n  at fn"), s(e % 3),
            F.lit(" (mod|f.js:1"), s(e % 5), F.lit(':7)"'),
            common)))
    res = F.map_from_entries(F.filter(F.array(
        F.struct(F.lit("service.name").alias("key"),
                 F.concat(F.lit("app"), s(u % 3)).alias("value")),
        F.when(u % 3 == 0,
               F.struct(F.lit("service.namespace").alias("key"),
                        F.lit("ns").alias("value"))),
    ), lambda x: x.isNotNull()))
    fx = ev.select(e.alias("i"), body.alias("body"),
                   res.alias("res_attrs"))
    out = logs_to_faro_payloads(fx, id_cols=["i"])
    gj = lambda arr, p: F.md5(F.array_join(F.transform(  # noqa: E731
        arr, lambda x: F.coalesce(F.get_json_object(x, p),
                                  F.lit("-"))), ";"))
    return out.select(
        "meta_json", "record_count",
        F.size(F.col("logs")).alias("n_logs"),
        F.size(F.col("events")).alias("n_events"),
        F.size(F.col("measurements")).alias("n_meas"),
        F.size(F.col("exceptions")).alias("n_exc"),
        gj(F.col("logs"), "$.message").alias("log_msg_sig"),
        gj(F.col("logs"), "$.level").alias("log_lvl_sig"),
        gj(F.col("logs"), "$.context.c1").alias("log_ctx_sig"),
        gj(F.col("logs"), "$.trace_id").alias("log_tid_sig"),
        gj(F.col("events"), "$.name").alias("ev_name_sig"),
        gj(F.col("events"), "$.attributes.x").alias("ev_attr_sig"),
        F.round(F.aggregate(
            F.col("measurements"), F.lit(0.0),
            lambda acc, x: acc + F.coalesce(
                F.get_json_object(x, "$.values.v1").cast("double"),
                F.lit(0.0))), 4).alias("meas_sum"),
        gj(F.col("exceptions"), "$.value").alias("exc_val_sig"),
        gj(F.col("exceptions"), "$.stacktrace.frames[0].function")
        .alias("exc_fn_sig"),
        gj(F.col("exceptions"), "$.stacktrace.frames[0].lineno")
        .alias("exc_ln_sig"),
    )


O_FARO_EXPORT = """
WITH b AS (
  SELECT event_id AS i, user_id AS u, event_id AS e FROM events
), g AS (
  SELECT *,
    u % 3 AS grp,
    e % 4 AS kind
  FROM b
)
SELECT
  '{"app": {"name": "app' || CAST(grp AS VARCHAR) || '"'
    || CASE WHEN grp = 0 THEN ', "namespace": "ns"' ELSE '' END
    || '}, "browser": {"name": "chrome' || CAST(grp AS VARCHAR)
    || '"}, "geo": {}, "k6": {}, "page": {}, "sdk": {"name": "faro"},'
    || ' "session": {}, "user": {}, "view": {}}' AS meta_json,
  count(*) AS record_count,
  count(*) FILTER (kind = 0) AS n_logs,
  count(*) FILTER (kind = 1) AS n_events,
  count(*) FILTER (kind = 2) AS n_meas,
  count(*) FILTER (kind = 3) AS n_exc,
  md5(string_agg(CASE WHEN kind = 0
    THEN 'm ' || CAST(e % 7 AS VARCHAR) END, ';' ORDER BY i))
    AS log_msg_sig,
  md5(string_agg(CASE WHEN kind = 0 THEN
    CASE WHEN e % 2 = 0 THEN 'info' ELSE 'error' END END,
    ';' ORDER BY i)) AS log_lvl_sig,
  md5(string_agg(CASE WHEN kind = 0
    THEN 'k' || CAST(e % 5 AS VARCHAR) END, ';' ORDER BY i))
    AS log_ctx_sig,
  md5(string_agg(CASE WHEN kind = 0
    THEN 't' || CAST(e % 11 AS VARCHAR) END, ';' ORDER BY i))
    AS log_tid_sig,
  md5(string_agg(CASE WHEN kind = 1
    THEN 'click' || CAST(e % 3 AS VARCHAR) END, ';' ORDER BY i))
    AS ev_name_sig,
  md5(string_agg(CASE WHEN kind = 1
    THEN CAST(e % 9 AS VARCHAR) END, ';' ORDER BY i)) AS ev_attr_sig,
  round(sum(CASE WHEN kind = 2 THEN (e % 9) + 0.5 ELSE 0 END), 4)
    AS meas_sum,
  md5(string_agg(CASE WHEN kind = 3
    THEN 'boom' || CAST(e % 2 AS VARCHAR) END, ';' ORDER BY i))
    AS exc_val_sig,
  md5(string_agg(CASE WHEN kind = 3
    THEN 'fn' || CAST(e % 3 AS VARCHAR) END, ';' ORDER BY i))
    AS exc_fn_sig,
  md5(string_agg(CASE WHEN kind = 3
    THEN '1' || CAST(e % 5 AS VARCHAR) END, ';' ORDER BY i))
    AS exc_ln_sig
FROM g
GROUP BY grp
"""

EXT39_QUERIES["faro_export"] = q_faro_export
EXT39_ORACLES["faro_export"] = O_FARO_EXPORT

"""snowflake receiver → metric rows, aggregations included.

The reference pushes its aggregation into Snowflake SQL
(``receiver/snowflakereceiver/client.go:17-25``) and fans the grouped
rows into datapoints (``scraper.go:109-269``). Here the SAME
aggregations run as Spark group-bys over the raw ACCOUNT_USAGE
history tables — the natural re-expression when the history lives in
a lake instead of behind a snowflake connection:

- METERING_HISTORY → sum(compute / cloud_services / used) by
  (service_type, name); NAME participates in the grouping but is NOT
  an attribute (client.go:18 + scraper.go:119-125), carried
  faithfully — duplicate service_type datapoints appear when names
  differ;
- WAREHOUSE_METERING_HISTORY → the same three sums by warehouse;
- LOGIN_HISTORY → count(*) by (user, error_message, client_type,
  is_success); USER_NAME grouped but not an attribute;
- WAREHOUSE_LOAD_HISTORY → avg of the four load averages by
  warehouse, with the scan-order mapping executed←AVG_RUNNING,
  queued_overload←AVG_QUEUED_LOAD, queued_provision←
  AVG_QUEUED_PROVISIONING, blocked←AVG_BLOCKED (client.go:155-165);
- QUERY_HISTORY → count + 18 avgs by the 8-column group (user
  grouped, not an attribute); ROWS_PRODUCED is COALESCE'd to 0
  BEFORE the avg (client.go:22);
- SESSIONS → count(distinct session_id) by user;
- PIPE_USAGE_HISTORY → sum(credits_used) by pipe (bytes/files are
  scanned but never recorded — omitted);
- STORAGE_USAGE → the single latest row by usage_date → three
  storage gauges.

Every group-by is keyed by (account, attrs…) so the 24h-window
aggregation over a 10^12-row QUERY_HISTORY shards evenly; avgs are
map-side-combined partial aggregates. ``cutoff`` reproduces the
``start_time >= DATEADD(hour, -24, …)`` predicate as a pushed-down
filter.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _NS():
    return F.lit(None).cast("string")


def _NL():
    return F.lit(None).cast("bigint")


def _ND():
    return F.lit(None).cast("double")


def _rows(df, entries, attr=None, seven=None):
    sev = seven or {}
    mid = [
        (attr if attr is not None else _NS()).alias("sf_attr"),
        sev.get("schema", _NS()).alias("sf_schema"),
        sev.get("status", _NS()).alias("sf_status"),
        sev.get("error", _NS()).alias("sf_error"),
        sev.get("qtype", _NS()).alias("sf_qtype"),
        sev.get("warehouse", _NS()).alias("sf_warehouse"),
        sev.get("db", _NS()).alias("sf_db"),
        sev.get("size", _NS()).alias("sf_size"),
    ]
    out = df.select(F.col("account"), *mid,
                    F.explode(F.array(*entries)).alias("_m"))
    m = F.col("_m")
    return out.select("account", m["metric"].alias("sf_metric"),
                      "sf_attr", "sf_schema", "sf_status", "sf_error",
                      "sf_qtype", "sf_warehouse", "sf_db", "sf_size",
                      m["value"].alias("sf_value"),
                      m["value_d"].alias("sf_value_d"))


def _ent(metric, vi=None, vd=None):
    return F.struct(
        F.lit(metric).alias("metric"),
        (vi.cast("bigint") if vi is not None else _NL()).alias("value"),
        (vd.cast("double") if vd is not None else _ND())
        .alias("value_d"))


def snowflake_metrics(
    metering: DataFrame,
    wh_metering: DataFrame,
    logins: DataFrame,
    wh_load: DataFrame,
    query_history: DataFrame,
    sessions: DataFrame,
    pipe_usage: DataFrame,
    storage: DataFrame,
    cutoff=None,
) -> DataFrame:
    def window(df, ts_col="start_time"):
        return df.where(F.col(ts_col) >= cutoff) if cutoff is not None \
            else df

    bill = (window(metering)
            .groupBy("account", "service_type", "name")
            .agg(F.sum("credits_used_compute").alias("_vw"),
                 F.sum("credits_used_cloud_services").alias("_cs"),
                 F.sum("credits_used").alias("_tc")))
    bill_rows = _rows(bill, [
        _ent("snowflake.billing.cloud_service.total", vd=F.col("_cs")),
        _ent("snowflake.billing.total_credit.total", vd=F.col("_tc")),
        _ent("snowflake.billing.virtual_warehouse.total",
             vd=F.col("_vw")),
    ], attr=F.col("service_type"))

    whb = (window(wh_metering)
           .groupBy("account", "warehouse_name")
           .agg(F.sum("credits_used_compute").alias("_vw"),
                F.sum("credits_used_cloud_services").alias("_cs"),
                F.sum("credits_used").alias("_tc")))
    whb_rows = _rows(whb, [
        _ent("snowflake.billing.warehouse.total_credit.total",
             vd=F.col("_tc")),
        _ent("snowflake.billing.warehouse.cloud_service.total",
             vd=F.col("_cs")),
        _ent("snowflake.billing.warehouse.virtual_warehouse.total",
             vd=F.col("_vw")),
    ], attr=F.col("warehouse_name"))

    lg = (window(logins, "event_timestamp")
          .groupBy("account", "user_name", "error_message",
                   "reported_client_type", "is_success")
          .agg(F.count("*").alias("_n")))
    lg_rows = _rows(lg, [
        _ent("snowflake.logins.total", vi=F.col("_n")),
    ], attr=F.concat_ws("|", F.col("error_message"),
                        F.col("reported_client_type"),
                        F.col("is_success")))

    hl = (window(wh_load)
          .groupBy("account", "warehouse_name")
          .agg(F.avg("avg_running").alias("_ex"),
               F.avg("avg_queued_load").alias("_ov"),
               F.avg("avg_queued_provisioning").alias("_pr"),
               F.avg("avg_blocked").alias("_bl")))
    hl_rows = _rows(hl, [
        _ent("snowflake.query.executed", vd=F.col("_ex")),
        _ent("snowflake.query.blocked", vd=F.col("_bl")),
        _ent("snowflake.query.queued_overload", vd=F.col("_ov")),
        _ent("snowflake.query.queued_provision", vd=F.col("_pr")),
    ], attr=F.col("warehouse_name"))

    qh_aggs = [
        ("snowflake.database.bytes_scanned.avg", "bytes_scanned"),
        ("snowflake.query.bytes_deleted.avg", "bytes_deleted"),
        ("snowflake.query.bytes_spilled.remote.avg",
         "bytes_spilled_to_remote_storage"),
        ("snowflake.query.bytes_spilled.local.avg",
         "bytes_spilled_to_local_storage"),
        ("snowflake.query.bytes_written.avg", "bytes_written"),
        ("snowflake.query.compilation_time.avg", "compilation_time"),
        ("snowflake.query.data_scanned_cache.avg",
         "percentage_scanned_from_cache"),
        ("snowflake.query.execution_time.avg", "execution_time"),
        ("snowflake.query.partitions_scanned.avg",
         "partitions_scanned"),
        ("snowflake.queued_overload_time.avg", "queued_overload_time"),
        ("snowflake.queued_provisioning_time.avg",
         "queued_provisioning_time"),
        ("snowflake.queued_repair_time.avg", "queued_repair_time"),
        ("snowflake.rows_inserted.avg", "rows_inserted"),
        ("snowflake.rows_deleted.avg", "rows_deleted"),
        ("snowflake.rows_produced.avg", "_rows_produced0"),
        ("snowflake.rows_unloaded.avg", "rows_unloaded"),
        ("snowflake.rows_updated.avg", "rows_updated"),
        ("snowflake.total_elapsed_time.avg", "total_elapsed_time"),
    ]
    qh = window(query_history).withColumn(
        "_rows_produced0",
        F.coalesce(F.col("rows_produced"), F.lit(0)))
    qh = (qh.groupBy("account", "schema_name", "execution_status",
                     "error_message", "query_type", "warehouse_name",
                     "database_name", "warehouse_size", "user_name")
          .agg(F.count("query_id").alias("_n"),
               *[F.avg(col).alias(f"_a{i}")
                 for i, (_, col) in enumerate(qh_aggs)]))
    seven = {"schema": F.col("schema_name"),
             "status": F.col("execution_status"),
             "error": F.col("error_message"),
             "qtype": F.col("query_type"),
             "warehouse": F.col("warehouse_name"),
             "db": F.col("database_name"),
             "size": F.col("warehouse_size")}
    qh_rows = _rows(qh, [
        _ent("snowflake.database.query.count", vi=F.col("_n")),
        *[_ent(m, vd=F.col(f"_a{i}"))
          for i, (m, _) in enumerate(qh_aggs)],
    ], seven=seven)

    se = (window(sessions, "created_on")
          .groupBy("account", "user_name")
          .agg(F.countDistinct("session_id").alias("_n")))
    se_rows = _rows(se, [
        _ent("snowflake.session_id.count", vi=F.col("_n")),
    ], attr=F.col("user_name"))

    pu = (window(pipe_usage)
          .groupBy("account", "pipe_name")
          .agg(F.sum("credits_used").alias("_c")))
    pu_rows = _rows(pu, [
        _ent("snowflake.pipe.credits_used.total", vd=F.col("_c")),
    ], attr=F.col("pipe_name"))

    w = Window.partitionBy("account").orderBy(
        F.col("usage_date").desc())
    st = (storage.withColumn("_rn", F.row_number().over(w))
          .where(F.col("_rn") == 1))
    st_rows = _rows(st, [
        _ent("snowflake.storage.storage_bytes.total",
             vi=F.col("storage_bytes")),
        _ent("snowflake.storage.stage_bytes.total",
             vi=F.col("stage_bytes")),
        _ent("snowflake.storage.failsafe_bytes.total",
             vi=F.col("failsafe_bytes")),
    ])

    out = bill_rows
    for piece in [whb_rows, lg_rows, hl_rows, qh_rows, se_rows,
                  pu_rows, st_rows]:
        out = out.unionByName(piece)
    return out

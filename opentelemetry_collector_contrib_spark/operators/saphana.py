"""saphana receiver → metric rows, monitoring queries included.

The reference drives ~19 monitoring SQL queries over SYS.M_* views
and fans each result column into a datapoint
(``receiver/saphanareceiver/queries.go:47-921``). Here every query's
aggregation runs AS a Spark groupBy/projection over the raw view
tables — the natural re-expression when the monitoring views are
snapshotted into a lake. Query-by-query fidelity (file:line =
queries.go):

- M_SERVICES (:49) / M_SERVICE_THREADS (:74): active/inactive
  conditional sums by host ('YES' / 'TRUE' flags);
- M_CS_ALL_COLUMNS (:99): the 8 main/delta × data/dict/index/misc
  memory sums by host;
- M_RS_TABLES (:172): fixed/variable row-store sums;
- M_SERVICE_COMPONENT_MEMORY (:197): component memory by
  (host, component);
- M_CONNECTIONS (:215): count by (host, status) with the
  ``CONNECTION_STATUS != ''`` predicate;
- M_BACKUP_CATALOG (:234): latest successful backup age — the
  ``ORDER BY UTC_START_TIME DESC LIMIT 1`` becomes a window
  row_number per instance; age = seconds_between(now, start) =
  start − now (HANA's argument order, carried literally);
- M_DATABASE (:251): per-database uptime = start→now seconds with
  system/database attrs;
- STATISTICS_CURRENT_ALERTS (:269): alert counts by rating;
- M_WORKLOAD (:286): update/commit/rollback sums by host;
- M_BLOCKED_TRANSACTIONS (:319): blocked count by host;
- M_DISKS (:336): used + free(total−used) per (path, usage_type);
- M_LICENSES (:362): limit/peak/expiration per (system, product),
  expiration = expiration_date − now seconds;
- M_SERVICE_REPLICATION (:397): backlog size/time + the
  MAP(count,0,0,duration/count) average shipped-buffer time rounded
  to 2 decimals (TO_DECIMAL(…,10,2) half-up);
- M_SERVICE_STATISTICS (:432): external/internal finished splits
  (internal = all − non_internal), active/pending sums, avg response
  time rounded to 2 decimals, all under ACTIVE_REQUEST_COUNT > −1;
- M_VOLUME_IO_TOTAL_STATISTICS (:483): read/write count/size/time
  sums by (host, path, type);
- M_SERVICE_MEMORY (:543): 12 per-service gauges with heap/shared
  free = allocated − used;
- M_CS_TABLES (:657): 13 schema-level sums by (host, schema);
- M_HOST_RESOURCE_UTILIZATION (:775): 13 host gauges including
  instance free = allocated − used.

Each groupBy is keyed by (instance, host, …) — partial-aggregated,
skew-free at 10^12 rows. No Python, no cross joins.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _fan(df, base, entries):
    ns = F.lit(None).cast("string")
    out = df.select(
        *base,
        F.explode(F.filter(F.array(*entries), lambda x: x.isNotNull()))
        .alias("_m"))
    m = F.col("_m")
    return out.select(
        *base, m["metric"].alias("sa_metric"), m["a1"].alias("sa_a1"),
        m["a2"].alias("sa_a2"), m["value"].alias("sa_value"),
        m["value_d"].alias("sa_value_d"))


def _ent(metric, a1=None, a2=None, vi=None, vd=None):
    ns = F.lit(None).cast("string")
    return F.struct(
        F.lit(metric).alias("metric"),
        ((F.lit(a1) if isinstance(a1, str) else a1)
         if a1 is not None else ns).alias("a1"),
        ((F.lit(a2) if isinstance(a2, str) else a2)
         if a2 is not None else ns).alias("a2"),
        (vi.cast("bigint") if vi is not None
         else F.lit(None).cast("bigint")).alias("value"),
        (vd.cast("double") if vd is not None
         else F.lit(None).cast("double")).alias("value_d"))


def saphana_monitoring(views: dict, now_ts) -> DataFrame:
    """``views`` maps lower-cased view names to DataFrames; every view
    carries passthrough columns ``instance`` and (where the reference
    query selects it) ``host``. ``now_ts`` is the deterministic
    CURRENT_TIMESTAMP stand-in (epoch seconds) for the
    seconds_between math.
    """
    key2 = ["instance", "host"]
    key1 = ["instance"]
    pieces = []
    now = F.lit(now_ts)

    def sum_flag(col, truthy):
        yes = F.sum(F.when(F.col(col) == truthy, 1).otherwise(0))
        no = F.sum(F.when(F.col(col) == truthy, 0).otherwise(1))
        return yes, no

    svc = views["m_services"].groupBy(*key2).agg(
        *[a.alias(n) for a, n in
          zip(sum_flag("active_status", "YES"), ["_a", "_i"])])
    pieces.append(_fan(svc, key2, [
        _ent("saphana.service.count", "active", vi=F.col("_a")),
        _ent("saphana.service.count", "inactive", vi=F.col("_i")),
    ]))

    thr = views["m_service_threads"].groupBy(*key2).agg(
        *[a.alias(n) for a, n in
          zip(sum_flag("is_active", "TRUE"), ["_a", "_i"])])
    pieces.append(_fan(thr, key2, [
        _ent("saphana.service.thread.count", "active",
             vi=F.col("_a")),
        _ent("saphana.service.thread.count", "inactive",
             vi=F.col("_i")),
    ]))

    cs = views["m_cs_all_columns"].groupBy(*key2).agg(*[
        F.sum(f"{t}_memory_size_in_{s}").alias(f"_{t[0]}{s[0:2]}")
        for t in ("main", "delta")
        for s in ("data", "dict", "index", "misc")])
    pieces.append(_fan(cs, key2, [
        _ent("saphana.column.memory.used", t, s,
             vi=F.col(f"_{t[0]}{s[0:2]}"))
        for t in ("main", "delta")
        for s in ("data", "dict", "index", "misc")]))

    rs = views["m_rs_tables"].groupBy(*key2).agg(
        F.sum("used_fixed_part_size").alias("_f"),
        F.sum("used_variable_part_size").alias("_v"))
    pieces.append(_fan(rs, key2, [
        _ent("saphana.row_store.memory.used", "fixed", vi=F.col("_f")),
        _ent("saphana.row_store.memory.used", "variable",
             vi=F.col("_v")),
    ]))

    comp = (views["m_service_component_memory"]
            .groupBy(*key2, "component")
            .agg(F.sum("used_memory_size").alias("_u")))
    pieces.append(_fan(comp, key2, [
        _ent("saphana.component.memory.used", F.col("component"),
             vi=F.col("_u"))]))

    conn = (views["m_connections"]
            .where(F.col("connection_status") != "")
            .groupBy(*key2, "connection_status")
            .agg(F.count("*").alias("_n")))
    pieces.append(_fan(conn, key2, [
        _ent("saphana.connection.count",
             F.lower(F.col("connection_status")), vi=F.col("_n"))]))

    w = Window.partitionBy("instance").orderBy(
        F.col("utc_start_time").desc())
    bk = (views["m_backup_catalog"]
          .where(F.col("state_name") == "successful")
          .withColumn("_rn", F.row_number().over(w))
          .where(F.col("_rn") == 1)
          .withColumn("host", F.lit(None).cast("string")))
    pieces.append(_fan(bk, key2, [
        _ent("saphana.backup.latest",
             vi=F.col("utc_start_time") - now)]))

    db = views["m_database"]
    pieces.append(_fan(db, key2, [
        _ent("saphana.uptime", F.col("system_id"),
             F.col("database_name"),
             vi=now - F.col("start_time"))]))

    al = (views["statistics_current_alerts"]
          .groupBy(*key1, "alert_rating")
          .agg(F.count("*").alias("_n"))
          .withColumn("host", F.lit(None).cast("string")))
    pieces.append(_fan(al, key2, [
        _ent("saphana.alert.count", F.col("alert_rating"),
             vi=F.col("_n"))]))

    wl = views["m_workload"].groupBy(*key2).agg(
        F.sum("update_transaction_count").alias("_u"),
        F.sum("commit_count").alias("_c"),
        F.sum("rollback_count").alias("_r"))
    pieces.append(_fan(wl, key2, [
        _ent("saphana.transaction.count", "update", vi=F.col("_u")),
        _ent("saphana.transaction.count", "commit", vi=F.col("_c")),
        _ent("saphana.transaction.count", "rollback", vi=F.col("_r")),
    ]))

    bt = (views["m_blocked_transactions"].groupBy(*key2)
          .agg(F.count("*").alias("_n")))
    pieces.append(_fan(bt, key2, [
        _ent("saphana.transaction.blocked", vi=F.col("_n"))]))

    dk = views["m_disks"]
    pieces.append(_fan(dk, key2, [
        _ent("saphana.disk.size.current",
             F.concat_ws("|", F.col("path"), F.col("usage_type")),
             "free", vi=F.col("total_size") - F.col("used_size")),
        _ent("saphana.disk.size.current",
             F.concat_ws("|", F.col("path"), F.col("usage_type")),
             "used", vi=F.col("used_size")),
    ]))

    lic = views["m_licenses"].withColumn(
        "host", F.lit(None).cast("string"))
    lic_a1 = F.concat_ws("|", F.col("system_id"),
                         F.col("product_name"))
    pieces.append(_fan(lic, key2, [
        _ent("saphana.license.limit", lic_a1,
             vi=F.col("product_limit")),
        _ent("saphana.license.peak", lic_a1,
             vi=F.col("product_usage")),
        _ent("saphana.license.expiration.time", lic_a1,
             vi=F.col("expiration_date") - now),
    ]))

    rep = views["m_service_replication"]
    avg_rep = F.round(
        F.when(F.col("shipped_log_buffers_count") == 0, F.lit(0.0))
        .otherwise(F.col("shipped_log_buffers_duration")
                   / F.col("shipped_log_buffers_count")), 2)
    rep_a1 = F.concat_ws("|", F.col("host"), F.col("secondary_host"),
                         F.col("port"), F.col("replication_mode"))
    pieces.append(_fan(rep, key2, [
        _ent("saphana.replication.backlog.size", rep_a1,
             vi=F.col("backlog_size")),
        _ent("saphana.replication.backlog.time", rep_a1,
             vi=F.col("backlog_time")),
        _ent("saphana.replication.average_time", rep_a1,
             vd=avg_rep),
    ]))

    st = (views["m_service_statistics"]
          .where(F.col("active_request_count") > -1)
          .groupBy(*key2)
          .agg(F.sum("finished_non_internal_request_count")
               .alias("_ext"),
               F.sum(F.col("all_finished_request_count")
                     - F.col("finished_non_internal_request_count"))
               .alias("_int"),
               F.sum("active_request_count").alias("_act"),
               F.sum("pending_request_count").alias("_pen"),
               F.round(F.avg("response_time"), 2).alias("_avg")))
    pieces.append(_fan(st, key2, [
        _ent("saphana.network.request.finished.count", "external",
             vi=F.col("_ext")),
        _ent("saphana.network.request.finished.count", "internal",
             vi=F.col("_int")),
        _ent("saphana.network.request.count", "active",
             vi=F.col("_act")),
        _ent("saphana.network.request.count", "pending",
             vi=F.col("_pen")),
        _ent("saphana.network.request.average_time", vd=F.col("_avg")),
    ]))

    vol = (views["m_volume_io_total_statistics"]
           .groupBy(*key2, "path", "type")
           .agg(F.sum("total_reads").alias("_r"),
                F.sum("total_writes").alias("_w"),
                F.sum("total_read_size").alias("_rs"),
                F.sum("total_write_size").alias("_ws"),
                F.sum("total_read_time").alias("_rt"),
                F.sum("total_write_time").alias("_wt")))
    vol_a1 = F.concat_ws("|", F.col("path"), F.col("type"))
    pieces.append(_fan(vol, key2, [
        _ent("saphana.volume.operation.count", vol_a1, "read",
             vi=F.col("_r")),
        _ent("saphana.volume.operation.count", vol_a1, "write",
             vi=F.col("_w")),
        _ent("saphana.volume.operation.size", vol_a1, "read",
             vi=F.col("_rs")),
        _ent("saphana.volume.operation.size", vol_a1, "write",
             vi=F.col("_ws")),
        _ent("saphana.volume.operation.time", vol_a1, "read",
             vi=F.col("_rt")),
        _ent("saphana.volume.operation.time", vol_a1, "write",
             vi=F.col("_wt")),
    ]))

    sm = views["m_service_memory"]
    svc_a = F.col("service_name")
    pieces.append(_fan(sm, key2, [
        _ent("saphana.service.memory.used", svc_a, "logical",
             vi=F.col("logical_memory_size")),
        _ent("saphana.service.memory.used", svc_a, "physical",
             vi=F.col("physical_memory_size")),
        _ent("saphana.service.code_size", svc_a,
             vi=F.col("code_size")),
        _ent("saphana.service.stack_size", svc_a,
             vi=F.col("stack_size")),
        _ent("saphana.service.memory.heap.current", svc_a, "free",
             vi=F.col("heap_memory_allocated_size")
             - F.col("heap_memory_used_size")),
        _ent("saphana.service.memory.heap.current", svc_a, "used",
             vi=F.col("heap_memory_used_size")),
        _ent("saphana.service.memory.shared.current", svc_a, "free",
             vi=F.col("shared_memory_allocated_size")
             - F.col("shared_memory_used_size")),
        _ent("saphana.service.memory.shared.current", svc_a, "used",
             vi=F.col("shared_memory_used_size")),
        _ent("saphana.service.memory.compactors.allocated", svc_a,
             vi=F.col("compactors_allocated_size")),
        _ent("saphana.service.memory.compactors.freeable", svc_a,
             vi=F.col("compactors_freeable_size")),
        _ent("saphana.service.memory.limit", svc_a,
             vi=F.col("allocation_limit")),
        _ent("saphana.service.memory.effective_limit", svc_a,
             vi=F.col("effective_allocation_limit")),
    ]))

    cst = (views["m_cs_tables"].groupBy(*key2, "schema_name").agg(
        F.sum("estimated_max_memory_size_in_total").alias("_em"),
        F.sum("last_compressed_record_count").alias("_lc"),
        F.sum("read_count").alias("_rd"),
        F.sum("write_count").alias("_wr"),
        F.sum("merge_count").alias("_mg"),
        F.sum("memory_size_in_main").alias("_mm"),
        F.sum("memory_size_in_delta").alias("_md"),
        F.sum("memory_size_in_history_main").alias("_mhm"),
        F.sum("memory_size_in_history_delta").alias("_mhd"),
        F.sum("raw_record_count_in_main").alias("_rm"),
        F.sum("raw_record_count_in_delta").alias("_rdl"),
        F.sum("raw_record_count_in_history_main").alias("_rhm"),
        F.sum("raw_record_count_in_history_delta").alias("_rhd")))
    sch = F.col("schema_name")
    pieces.append(_fan(cst, key2, [
        _ent("saphana.schema.memory.used.max", sch, vi=F.col("_em")),
        _ent("saphana.schema.record.compressed.count", sch,
             vi=F.col("_lc")),
        _ent("saphana.schema.operation.count", sch, "read",
             vi=F.col("_rd")),
        _ent("saphana.schema.operation.count", sch, "write",
             vi=F.col("_wr")),
        _ent("saphana.schema.operation.count", sch, "merge",
             vi=F.col("_mg")),
        _ent("saphana.schema.memory.used.current", sch, "main",
             vi=F.col("_mm")),
        _ent("saphana.schema.memory.used.current", sch, "delta",
             vi=F.col("_md")),
        _ent("saphana.schema.memory.used.current", sch,
             "history_main", vi=F.col("_mhm")),
        _ent("saphana.schema.memory.used.current", sch,
             "history_delta", vi=F.col("_mhd")),
        _ent("saphana.schema.record.count", sch, "main",
             vi=F.col("_rm")),
        _ent("saphana.schema.record.count", sch, "delta",
             vi=F.col("_rdl")),
        _ent("saphana.schema.record.count", sch, "history_main",
             vi=F.col("_rhm")),
        _ent("saphana.schema.record.count", sch, "history_delta",
             vi=F.col("_rhd")),
    ]))

    hr = views["m_host_resource_utilization"]
    pieces.append(_fan(hr, key2, [
        _ent("saphana.host.memory.current", "free",
             vi=F.col("free_physical_memory")),
        _ent("saphana.host.memory.current", "used",
             vi=F.col("used_physical_memory")),
        _ent("saphana.host.swap.current", "free",
             vi=F.col("free_swap_space")),
        _ent("saphana.host.swap.current", "used",
             vi=F.col("used_swap_space")),
        _ent("saphana.instance.memory.current", "used",
             vi=F.col("instance_total_memory_used_size")),
        _ent("saphana.instance.memory.used.peak",
             vi=F.col("instance_total_memory_peak_used_size")),
        _ent("saphana.instance.memory.current", "free",
             vi=F.col("instance_total_memory_allocated_size")
             - F.col("instance_total_memory_used_size")),
        _ent("saphana.instance.code_size",
             vi=F.col("instance_code_size")),
        _ent("saphana.instance.memory.shared.allocated",
             vi=F.col("instance_shared_memory_allocated_size")),
        _ent("saphana.cpu.used", "user",
             vi=F.col("total_cpu_user_time")),
        _ent("saphana.cpu.used", "system",
             vi=F.col("total_cpu_system_time")),
        _ent("saphana.cpu.used", "io_wait",
             vi=F.col("total_cpu_wio_time")),
        _ent("saphana.cpu.used", "idle",
             vi=F.col("total_cpu_idle_time")),
    ]))

    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return out

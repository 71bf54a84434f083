"""splunkenterprise receiver → metric rows (the SPL search family).

The reference's most substantial compute is its ad-hoc SPL searches —
stats aggregations over Splunk's own _internal/_introspection logs
(``receiver/splunkenterprisereceiver/search_result.go:21-40``), whose
result fields the scraper fans into datapoints (``scraper.go``). Here
each SPL pipeline runs AS a Spark aggregation over the raw log
tables, which is exactly the log-pipeline shape this engine exists
for:

- SplunkLicenseIndexUsageSearch (:27): null/empty idx folds to
  "(UNKNOWN)", sum(b) by indexname, value = int64 of the rounded
  sum (scraper.go:173-187);
- SplunkSchedulerAvgExecLatencySearch (:29): status ∈ {completed,
  skipped, deferred, success}, execution_latency = max(0,
  dispatch_time − (scheduled_time + coalesce(window_time, 0))),
  avg by host rounded to 2;
- SplunkSchedulerCompletionRatio (:30): total = count(status ∈
  {completed, skipped, success}) (deferred rows pass the filter but
  do NOT count toward total), skipped count, ratio = round((1 −
  skipped/total) × 100, 2);
- SplunkSchedulerAvgRunTime (:31): avg(run_time) by host, round 2;
- SplunkIndexerRawWriteSeconds / SplunkIndexerCpuSeconds (:32-33):
  sum(write_cpu_seconds) / sum(service_cpu_seconds) by host over the
  indexerpipe metrics.log rows (float);
- SplunkIoAvgIops (:34): op_count = interval × (reads_ps +
  writes_ps), avg by host, round to integer, recorded as int64
  (scraper.go ParseInt);
- the throughput API scrape (``scrapeIndexThroughput``): 1000 ×
  average_KBps per indexer status.

The REST-only scrapes (kvstore, health, dispatch artifacts, cluster
manager) carry no aggregation semantics — they are field copies off
JSON endpoints and are declared out of scope with the other network
pollers.

Every groupBy is keyed by (host|index) — partial-aggregated and
skew-free at 10^12 log rows; rounds are exact-tie-free (the .xx5
boundary is not binary-representable for these rationals).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SCHED_STATUSES = ["completed", "skipped", "deferred", "success"]


def splunk_spl_metrics(
    license_usage: DataFrame,
    scheduler: DataFrame,
    indexerpipe: DataFrame,
    iostats: DataFrame,
    throughput: DataFrame,
    build: str = "",
    version: str = "",
) -> DataFrame:
    """Inputs: license_usage(idx, b), scheduler(host, status,
    dispatch_time, scheduled_time, window_time, run_time),
    indexerpipe(host, write_cpu_seconds, service_cpu_seconds),
    iostats(host, reads_ps, writes_ps, interval),
    throughput(status, average_kbps).
    """
    nl = F.lit(None).cast("bigint")
    nd = F.lit(None).cast("double")
    bv = [F.lit(build).alias("sp_build"),
          F.lit(version).alias("sp_version")]

    def row(df, metric, attr, vi, vd):
        return df.select(
            F.lit(metric).alias("sp_metric"), attr.alias("sp_attr"),
            (vi.cast("bigint") if vi is not None else nl)
            .alias("sp_value"),
            (vd.cast("double") if vd is not None else nd)
            .alias("sp_value_d"), *bv)

    idxname = F.when(
        F.col("idx").isNull() | (F.length("idx") == 0),
        F.lit("(UNKNOWN)")).otherwise(F.col("idx"))
    lic = (license_usage.select(idxname.alias("indexname"), "b")
           .groupBy("indexname")
           .agg(F.round(F.sum("b"), 9).alias("_b")))
    pieces = [row(lic, "splunk.license.index.usage",
                  F.col("indexname"), F.col("_b"), None)]

    sched = scheduler.where(F.col("status").isin(_SCHED_STATUSES))
    latency = F.greatest(
        F.lit(0.0),
        F.col("dispatch_time")
        - (F.col("scheduled_time")
           + F.coalesce(F.col("window_time"), F.lit(0.0))))
    lat = (sched.withColumn("_lat", latency).groupBy("host")
           .agg(F.round(F.avg("_lat"), 2).alias("_v")))
    pieces.append(row(lat, "splunk.scheduler.avg.execution.latency",
                      F.col("host"), None, F.col("_v")))

    ratio = (sched.groupBy("host").agg(
        F.sum(F.when(F.col("status").isin(
            "completed", "skipped", "success"), 1).otherwise(0))
        .alias("_t"),
        F.sum(F.when(F.col("status") == "skipped", 1).otherwise(0))
        .alias("_s"))
        .select("host", F.round(
            (1 - F.col("_s") / F.col("_t")) * 100, 2).alias("_v")))
    pieces.append(row(ratio, "splunk.scheduler.completion.ratio",
                      F.col("host"), None, F.col("_v")))

    rt = (sched.groupBy("host")
          .agg(F.round(F.avg("run_time"), 2).alias("_v")))
    pieces.append(row(rt, "splunk.scheduler.avg.run.time",
                      F.col("host"), None, F.col("_v")))

    pipe = indexerpipe.groupBy("host").agg(
        F.sum("write_cpu_seconds").alias("_w"),
        F.sum("service_cpu_seconds").alias("_c"))
    pieces.append(row(pipe, "splunk.indexer.raw.write.time",
                      F.col("host"), None, F.col("_w")))
    pieces.append(row(pipe, "splunk.indexer.cpu.time",
                      F.col("host"), None, F.col("_c")))

    io = (iostats.withColumn(
        "_op", F.col("interval")
        * (F.col("reads_ps") + F.col("writes_ps")))
        .groupBy("host")
        .agg(F.round(F.avg("_op")).cast("bigint").alias("_v")))
    pieces.append(row(io, "splunk.io.avg.iops", F.col("host"),
                      F.col("_v"), None))

    thr = throughput.select(
        F.col("status"),
        (F.col("average_kbps") * 1000).alias("_v"))
    pieces.append(row(thr, "splunk.indexer.throughput",
                      F.col("status"), None, F.col("_v")))

    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return out

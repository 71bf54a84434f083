"""Round-5 queries (cont. 2): DB-stats receiver family.

postgresql fixture: nine kind-fanned object rows (database, table,
index, function, bgwriter, replication, connection_max, wal_age,
lock) synthesised per event with JSON bodies via ``to_json`` so
presence gates (nullable backends/db_size, has_stats, has_blockreads,
the >= 0 sentinels from client.go's coalesce(-1) columns) are all
exercised; ``db3`` is excluded to cover config.ExcludeDatabases.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import QueryFn, load

EXT18_QUERIES: dict[str, QueryFn] = {}
EXT18_ORACLES: dict[str, str] = {}


# ---------------------------------------------------------------------------
# postgresql receiver: pg_stat_* object rows -> metric rows
# ---------------------------------------------------------------------------

_PG_KINDS = ["database", "table", "index", "function", "bgwriter",
             "replication", "connection_max", "wal_age", "lock"]


def q_postgresql(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.postgresql import postgresql_stats

    ev = load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    ts = (e - e % 64).alias("ts")
    dbn = F.concat(F.lit("db"), (u % 4).cast("string"))
    nodb = F.lit(None).cast("string")

    def part(k: int, db, body) -> DataFrame:
        return ev.where(e % 9 == k).select(
            ts, F.lit(_PG_KINDS[k]).alias("kind"), db.alias("db"),
            F.to_json(body).alias("body"))

    fx = part(0, dbn, F.struct(
        F.when(u % 7 != 0, e % 500).alias("backends"),
        F.when(u % 11 != 0, e * 8 % 1000000).alias("db_size"),
        (e % 300).alias("table_count"),
        (e % 1000).alias("commits"), (u % 100).alias("rollbacks"),
        (e % 10).alias("deadlocks"), (u % 20).alias("temp_files"),
        (e % 5000).alias("temp_io"), (u % 4000).alias("tup_updated"),
        (e % 3000).alias("tup_returned"),
        (u % 2000).alias("tup_fetched"),
        (e % 1500).alias("tup_inserted"),
        (u % 1000).alias("tup_deleted"), (e % 8000).alias("blks_hit"),
        (u % 6000).alias("blks_read"),
        (u % 5 != 0).alias("has_stats"),
    ))
    fx = fx.unionByName(part(1, dbn, F.struct(
        F.concat(F.lit("s"), (u % 2).cast("string")).alias("schema"),
        F.concat(F.lit("t"), (e % 6).cast("string")).alias("table"),
        (u % 10000).alias("live"), (e % 1000).alias("dead"),
        (e % 400).alias("ins"), (u % 300).alias("del"),
        (e % 200).alias("upd"), (u % 100).alias("hot_upd"),
        (e * 16 % 900000).alias("size"), (e % 12).alias("vacuum_count"),
        (u % 5000).alias("seq_scans"),
        (e % 3 != 0).alias("has_blockreads"),
        (e % 100).alias("heap_read"), (u % 100).alias("heap_hit"),
        (e % 90).alias("idx_read"), (u % 90).alias("idx_hit"),
        (e % 80).alias("toast_read"), (u % 80).alias("toast_hit"),
        (e % 70).alias("tidx_read"), (u % 70).alias("tidx_hit"),
    )))
    fx = fx.unionByName(part(2, dbn, F.struct(
        F.concat(F.lit("t"), (e % 6).cast("string")).alias("table"),
        F.concat(F.lit("i"), (u % 3).cast("string")).alias("index"),
        (e % 7000).alias("scans"), (u % 800000).alias("size"),
    )))
    fx = fx.unionByName(part(3, dbn, F.struct(
        F.concat(F.lit("f"), (u % 5).cast("string")).alias("function"),
        (e % 900).alias("calls"),
    )))
    fx = fx.unionByName(part(4, nodb, F.struct(
        (e % 100000).alias("buffers_allocated"),
        (u % 50000).alias("bg_writes"),
        F.when(e % 13 == 0, -1).otherwise(u % 40000)
        .alias("backend_writes"),
        (e % 30000).alias("buffer_checkpoints"),
        F.when(u % 17 == 0, -1).otherwise(e % 20000)
        .alias("fsync_writes"),
        (e % 100).alias("checkpoints_req"),
        (u % 100).alias("checkpoints_scheduled"),
        ((e % 3200).cast("double") / 32).alias("checkpoint_sync_time"),
        ((u % 3200).cast("double") / 32).alias("checkpoint_write_time"),
        (e % 50).alias("max_written"),
    )))
    fx = fx.unionByName(part(5, nodb, F.struct(
        F.when(u % 6 == 0, F.lit("unix")).otherwise(
            F.concat(F.lit("10.0.0."), (u % 32).cast("string")))
        .alias("client_addr"),
        F.when(e % 9 == 0, -1).otherwise(e % 100000)
        .alias("pending_bytes"),
        F.when(e % 5 == 0, -1).otherwise(e % 60).alias("write_lag"),
        F.when(u % 5 == 0, -1).otherwise(u % 60).alias("flush_lag"),
        F.when(e % 7 == 0, -1).otherwise(e % 45).alias("replay_lag"),
    )))
    fx = fx.unionByName(part(6, nodb, F.struct(
        (100 + e % 400).alias("max_connections"))))
    fx = fx.unionByName(part(7, nodb, F.struct(
        F.when(e % 6 != 0, e % 7200).alias("wal_age_sec"))))
    fx = fx.unionByName(part(8, nodb, F.struct(
        F.concat(F.lit("rel"), (e % 4).cast("string")).alias("relation"),
        F.element_at(F.array(
            F.lit("AccessShareLock"), F.lit("RowExclusiveLock"),
            F.lit("ExclusiveLock")), (u % 3 + 1).cast("int"))
        .alias("mode"),
        F.element_at(F.array(F.lit("relation"), F.lit("transactionid")),
                     (e % 2 + 1).cast("int")).alias("lock_type"),
        (e % 50).alias("locks"),
    )))
    return postgresql_stats(fx, exclude_databases=["db3"])


def _pg_oracle() -> str:
    NS = "CAST(NULL AS VARCHAR)"
    NI = "CAST(NULL AS BIGINT)"
    ND = "CAST(NULL AS DOUBLE)"
    dbn = "'db' || CAST(u % 4 AS VARCHAR)"
    tbl = ("'s' || CAST(u % 2 AS VARCHAR) || '.' || 't' || "
           "CAST(e % 6 AS VARCHAR)")
    itbl = "'t' || CAST(e % 6 AS VARCHAR)"
    idx = "'i' || CAST(u % 3 AS VARCHAR)"
    addr = ("CASE WHEN u % 6 = 0 THEN 'unix' ELSE '10.0.0.' || "
            "CAST(u % 32 AS VARCHAR) END")
    stats = "u % 5 <> 0"
    blk = "e % 3 <> 0"
    # (kind#, metric, attr, where, vi, vd)
    rows = [
        (0, "postgresql.table.count", NS, None, "e % 300", ND),
        (0, "postgresql.backends", NS, "u % 7 <> 0", "e % 500", ND),
        (0, "postgresql.db_size", NS, "u % 11 <> 0", "e * 8 % 1000000",
         ND),
        (0, "postgresql.commits", NS, stats, "e % 1000", ND),
        (0, "postgresql.rollbacks", NS, stats, "u % 100", ND),
        (0, "postgresql.deadlocks", NS, stats, "e % 10", ND),
        (0, "postgresql.temp_files", NS, stats, "u % 20", ND),
        (0, "postgresql.temp.io", NS, stats, "e % 5000", ND),
        (0, "postgresql.tup_updated", NS, stats, "u % 4000", ND),
        (0, "postgresql.tup_returned", NS, stats, "e % 3000", ND),
        (0, "postgresql.tup_fetched", NS, stats, "u % 2000", ND),
        (0, "postgresql.tup_inserted", NS, stats, "e % 1500", ND),
        (0, "postgresql.tup_deleted", NS, stats, "u % 1000", ND),
        (0, "postgresql.blks_hit", NS, stats, "e % 8000", ND),
        (0, "postgresql.blks_read", NS, stats, "u % 6000", ND),
    ]
    for attr, vi in [("'dead'", "e % 1000"), ("'live'", "u % 10000")]:
        rows.append((1, "postgresql.rows", attr, None, vi, ND))
    for attr, vi in [("'ins'", "e % 400"), ("'del'", "u % 300"),
                     ("'upd'", "e % 200"), ("'hot_upd'", "u % 100")]:
        rows.append((1, "postgresql.operations", attr, None, vi, ND))
    rows += [
        (1, "postgresql.table.size", NS, None, "e * 16 % 900000", ND),
        (1, "postgresql.table.vacuum.count", NS, None, "e % 12", ND),
        (1, "postgresql.sequential_scans", NS, None, "u % 5000", ND),
    ]
    for attr, vi in [("heap_read", "e % 100"), ("heap_hit", "u % 100"),
                     ("idx_read", "e % 90"), ("idx_hit", "u % 90"),
                     ("toast_hit", "u % 80"), ("toast_read", "e % 80"),
                     ("tidx_read", "e % 70"), ("tidx_hit", "u % 70")]:
        rows.append((1, "postgresql.blocks_read", f"'{attr}'", blk,
                     vi, ND))
    rows += [
        (2, "postgresql.index.scans", NS, None, "e % 7000", ND),
        (2, "postgresql.index.size", NS, None, "u % 800000", ND),
        (3, "postgresql.function.calls",
         "'f' || CAST(u % 5 AS VARCHAR)", None, "e % 900", ND),
        (4, "postgresql.bgwriter.buffers.allocated", NS, None,
         "e % 100000", ND),
        (4, "postgresql.bgwriter.buffers.writes", "'bgwriter'", None,
         "u % 50000", ND),
        (4, "postgresql.bgwriter.buffers.writes", "'backend'",
         "e % 13 <> 0", "u % 40000", ND),
        (4, "postgresql.bgwriter.buffers.writes", "'checkpoints'",
         None, "e % 30000", ND),
        (4, "postgresql.bgwriter.buffers.writes", "'backend_fsync'",
         "u % 17 <> 0", "e % 20000", ND),
        (4, "postgresql.bgwriter.checkpoint.count", "'requested'",
         None, "e % 100", ND),
        (4, "postgresql.bgwriter.checkpoint.count", "'scheduled'",
         None, "u % 100", ND),
        (4, "postgresql.bgwriter.duration", "'sync'", None, NI,
         "CAST(e % 3200 AS DOUBLE) / 32"),
        (4, "postgresql.bgwriter.duration", "'write'", None, NI,
         "CAST(u % 3200 AS DOUBLE) / 32"),
        (4, "postgresql.bgwriter.maxwritten", NS, None, "e % 50", ND),
        (5, "postgresql.replication.data_delay", addr, "e % 9 <> 0",
         "e % 100000", ND),
        (5, "postgresql.wal.lag", f"'write' || '|' || {addr}",
         "e % 5 <> 0", "e % 60", ND),
        (5, "postgresql.wal.lag", f"'replay' || '|' || {addr}",
         "e % 7 <> 0", "e % 45", ND),
        (5, "postgresql.wal.lag", f"'flush' || '|' || {addr}",
         "u % 5 <> 0", "u % 60", ND),
        (6, "postgresql.connection.max", NS, None, "100 + e % 400",
         ND),
        (7, "postgresql.wal.age", NS, "e % 6 <> 0", "e % 7200", ND),
        (8, "postgresql.database.locks",
         "'rel' || CAST(e % 4 AS VARCHAR) || '|' || "
         "['AccessShareLock','RowExclusiveLock','ExclusiveLock']"
         "[CAST(u % 3 AS INT) + 1] || '|' || "
         "['relation','transactionid'][CAST(e % 2 AS INT) + 1]",
         None, "e % 50", ND),
    ]
    parts = []
    for i, (k, metric, attr, where, vi, vd) in enumerate(rows):
        a = (lambda n: f" AS {n}") if i == 0 else (lambda n: "")
        w = f"e % 9 = {k}"
        if k <= 3:
            w += " AND u % 4 <> 3"  # exclude db3
        if where:
            w += f" AND ({where})"
        db = dbn if k <= 3 else NS
        t = tbl if k == 1 else (itbl if k == 2 else NS)
        ix = idx if k == 2 else NS
        parts.append(
            f"SELECT ts{a('ts')}, '{_PG_KINDS[k]}'{a('kind')}, "
            f"{db}{a('db')}, '{metric}'{a('pg_metric')}, "
            f"{attr}{a('pg_attr')}, {t}{a('pg_table')}, "
            f"{ix}{a('pg_index')}, {vi}{a('pg_value')}, "
            f"{vd}{a('pg_value_d')} FROM a WHERE {w}")
    parts.append(
        "SELECT ts, 'database_count', CAST(NULL AS VARCHAR), "
        "'postgresql.database.count', CAST(NULL AS VARCHAR), "
        "CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), "
        "CAST(COUNT(*) AS BIGINT), CAST(NULL AS DOUBLE) FROM a "
        "WHERE e % 9 = 0 AND u % 4 <> 3 GROUP BY ts")
    return (
        "WITH a AS (SELECT event_id - event_id % 64 AS ts, "
        "user_id AS u, event_id AS e FROM events)\n"
        + "\nUNION ALL\n".join(parts)
    )


EXT18_QUERIES["postgresql_stats"] = q_postgresql
EXT18_ORACLES["postgresql_stats"] = _pg_oracle()


# ---------------------------------------------------------------------------
# kafkametrics receiver: partition/config/broker/group samples -> metrics
# ---------------------------------------------------------------------------


def q_kafka_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.kafkametrics import kafka_metrics

    ev = load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    c = F.lit("c").alias("cluster")
    ts = (e - e % 30).alias("ts")
    topics = F.array(F.lit("t0"), F.lit("t1"), F.lit("t2"),
                     F.lit("_i3"), F.lit("t4"))
    topic = F.element_at(topics, (e % 5 + 1).cast("int"))
    part = ((e % 30) / 5).cast("int")

    partitions = ev.select(
        c, ts, topic.alias("topic"), part.alias("partition"),
        F.when(e % 13 != 0, e % 10000 + 100).alias("current_offset"),
        F.when(u % 11 != 0, e % 100).alias("oldest_offset"),
        F.when(e % 17 != 0, F.lit(3)).alias("replicas"),
        F.when(u % 7 != 0, F.lit(2)).alias("in_sync"),
    )
    configs = ev.where(e % 30 < 5).select(
        c, ts, topic.alias("topic"),
        (e % 7).alias("replication_factor"),
        F.when(u % 3 == 0, F.lit("x"))
        .otherwise((u % 5).cast("string")).alias("min_insync_replicas"),
        F.when(u % 4 == 0, F.lit("oops"))
        .otherwise((e % 100000 * 7 + 500).cast("string"))
        .alias("retention_ms"),
        F.when(e % 6 == 0, F.lit("many"))
        .otherwise((u * 1000 % 1000000000).cast("string"))
        .alias("retention_bytes"),
    )
    brokers = ev.where((e % 30 >= 5) & (e % 30 < 8)).select(
        c, ts, (e % 30 - 5).cast("string").alias("broker_id"),
        F.when(e % 30 == 6, F.lit("abc"))
        .when(e % 30 == 7, (u % 168).cast("string"))
        .alias("log_retention_hours"),
    )
    group = F.when(u % 9 == 0, F.lit("skip0")).otherwise(
        F.concat(F.lit("g"), (u % 3).cast("string")))
    offsets = ev.select(
        c, ts, group.alias("group"), topic.alias("topic"),
        part.alias("partition"),
        F.when(e % 4 == 0, F.lit(-1)).otherwise(e % 10000)
        .alias("consumer_offset"),
    )
    members = offsets.select("cluster", "ts", "group").distinct() \
        .select("cluster", "ts", "group",
                (F.col("ts") % 25).alias("members"))
    return kafka_metrics(partitions, configs, brokers, members,
                         offsets, group_match="^g.*")


def _kafka_oracle() -> str:
    return """
WITH a AS (
  SELECT 'c' AS cluster, event_id - event_id % 30 AS ts,
         user_id AS u, event_id AS e,
         ['t0','t1','t2','_i3','t4'][CAST(e0.event_id % 5 AS INT) + 1]
           AS topic,
         CAST((event_id % 30) // 5 AS INT) AS part
  FROM events e0
), parts AS (
  SELECT cluster, ts, topic, part,
         CASE WHEN e % 13 <> 0 THEN e % 10000 + 100 END AS cur,
         CASE WHEN u % 11 <> 0 THEN e % 100 END AS old,
         CASE WHEN e % 17 <> 0 THEN 3 END AS repl,
         CASE WHEN u % 7 <> 0 THEN 2 END AS insync
  FROM a WHERE topic NOT LIKE '\\_%' ESCAPE '\\'
), blocks0 AS (
  SELECT cluster, ts,
         CASE WHEN u % 9 = 0 THEN 'skip0'
              ELSE 'g' || CAST(u % 3 AS VARCHAR) END AS grp,
         topic, part,
         CASE WHEN e % 4 = 0 THEN -1 ELSE e % 10000 END AS coff
  FROM a
), blocks AS (
  SELECT b.*, p.cur FROM blocks0 b
  JOIN parts p ON b.cluster = p.cluster AND b.ts = p.ts
    AND b.topic = p.topic AND b.part = p.part AND p.cur IS NOT NULL
  WHERE b.grp LIKE 'g%' AND b.grp NOT LIKE 'skip%'
), consumed AS (
  SELECT *, MAX(CASE WHEN coff <> -1 THEN 1 ELSE 0 END)
      OVER (PARTITION BY cluster, ts, grp, topic) = 1 AS ok
  FROM blocks
), NS AS (SELECT CAST(NULL AS VARCHAR) v), NL AS
  (SELECT CAST(NULL AS BIGINT) v)

SELECT cluster, ts, 'kafka.topic.partitions' AS km_metric,
       CAST(NULL AS VARCHAR) AS km_group, topic AS km_topic,
       CAST(NULL AS BIGINT) AS km_partition,
       CAST(NULL AS VARCHAR) AS km_broker,
       CAST(COUNT(*) AS BIGINT) AS km_value
FROM parts GROUP BY cluster, ts, topic
UNION ALL
SELECT cluster, ts, m, NULL, topic, part, NULL, CAST(v AS BIGINT)
FROM parts, LATERAL (VALUES
  ('kafka.partition.current_offset', cur),
  ('kafka.partition.oldest_offset', old),
  ('kafka.partition.replicas', repl),
  ('kafka.partition.replicas_in_sync', insync)) AS t(m, v)
WHERE v IS NOT NULL
UNION ALL
SELECT cluster, ts, 'kafka.topic.replication_factor', NULL, topic,
       NULL, NULL, CAST(e % 7 AS BIGINT)
FROM a WHERE e % 30 < 5 AND topic NOT LIKE '\\_%' ESCAPE '\\'
UNION ALL
SELECT cluster, ts, 'kafka.topic.min_insync_replicas', NULL, topic,
       NULL, NULL, CAST(u % 5 AS BIGINT)
FROM a WHERE e % 30 < 5 AND topic NOT LIKE '\\_%' ESCAPE '\\'
  AND u % 3 <> 0
UNION ALL
SELECT cluster, ts, 'kafka.topic.log_retention_period', NULL, topic,
       NULL, NULL, CAST((e % 100000 * 7 + 500) // 1000 AS BIGINT)
FROM a WHERE e % 30 < 5 AND topic NOT LIKE '\\_%' ESCAPE '\\'
  AND u % 4 <> 0
UNION ALL
SELECT cluster, ts, 'kafka.topic.log_retention_size', NULL, topic,
       NULL, NULL, CAST(u * 1000 % 1000000000 AS BIGINT)
FROM a WHERE e % 30 < 5 AND topic NOT LIKE '\\_%' ESCAPE '\\'
  AND e % 6 <> 0
UNION ALL
SELECT cluster, ts, 'kafka.brokers', NULL, NULL, NULL, NULL,
       CAST(COUNT(*) AS BIGINT)
FROM a WHERE e % 30 >= 5 AND e % 30 < 8 GROUP BY cluster, ts
UNION ALL
SELECT cluster, ts, 'kafka.broker.log_retention_period', NULL, NULL,
       NULL, CAST(e % 30 - 5 AS VARCHAR),
       CAST(CASE WHEN e % 30 = 6 THEN 0 ELSE (u % 168) * 3600 END
            AS BIGINT)
FROM a WHERE e % 30 IN (6, 7)
UNION ALL
SELECT cluster, ts, 'kafka.consumer_group.members', grp, NULL, NULL,
       NULL, CAST(ts % 25 AS BIGINT)
FROM (SELECT DISTINCT cluster, ts,
        CASE WHEN u % 9 = 0 THEN 'skip0'
             ELSE 'g' || CAST(u % 3 AS VARCHAR) END AS grp
      FROM a) WHERE grp LIKE 'g%' AND grp NOT LIKE 'skip%'
UNION ALL
SELECT cluster, ts, 'kafka.consumer_group.offset', grp, topic, part,
       NULL, CAST(coff AS BIGINT) FROM consumed WHERE ok
UNION ALL
SELECT cluster, ts, 'kafka.consumer_group.lag', grp, topic, part,
       NULL, CAST(CASE WHEN coff <> -1 THEN cur - coff ELSE -1 END
                  AS BIGINT)
FROM consumed WHERE ok
UNION ALL
SELECT cluster, ts, 'kafka.consumer_group.offset_sum', grp, topic,
       NULL, NULL, CAST(SUM(coff) AS BIGINT)
FROM consumed WHERE ok GROUP BY cluster, ts, grp, topic
UNION ALL
SELECT cluster, ts, 'kafka.consumer_group.lag_sum', grp, topic,
       NULL, NULL,
       CAST(SUM(CASE WHEN coff <> -1 THEN cur - coff ELSE 0 END)
            AS BIGINT)
FROM consumed WHERE ok GROUP BY cluster, ts, grp, topic
"""


EXT18_QUERIES["kafka_metrics"] = q_kafka_metrics
EXT18_ORACLES["kafka_metrics"] = _kafka_oracle()


# ---------------------------------------------------------------------------
# ntp / filestats / riak / httpcheck small-receiver batch
# ---------------------------------------------------------------------------


def q_ntp_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.receivers import ntp_offset

    ev = load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    fx = ev.select(
        e.alias("ts"),
        F.concat(F.lit("pool"), (u % 3).cast("string")).alias("endpoint"),
        F.when(e % 10 != 0, e % 2000000 - 1000000).alias("offset_ns"),
    )
    return ntp_offset(fx)


O_NTP = """
SELECT event_id AS ts,
       'pool' || CAST(user_id % 3 AS VARCHAR) AS endpoint,
       'ntp.offset' AS np_metric,
       CAST(event_id % 2000000 - 1000000 AS BIGINT) AS np_value
FROM events WHERE event_id % 10 <> 0
"""

EXT18_QUERIES["ntp_offset"] = q_ntp_offset
EXT18_ORACLES["ntp_offset"] = O_NTP


def q_file_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.receivers import file_stats

    ev = load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    fx = ev.select(
        (e - e % 16).alias("ts"),
        F.concat(F.lit("/var/f"), (e % 50).cast("string")).alias("path"),
        F.concat(F.lit("f"), (e % 50).cast("string")).alias("name"),
        (e % 9 != 0).alias("stat_ok"),
        (e % 100000).alias("size"),
        (1700000000 + e % 1000).alias("mtime"),
        (1700000000 + u % 1000).alias("atime"),
        (1700000000 + (e + u) % 1000).alias("ctime"),
        F.when(u % 2 == 0, F.lit("-rw-r--r--"))
        .otherwise(F.lit("-rwxr-xr-x")).alias("perm"),
    )
    return file_stats(fx)


O_FILE_STATS = """
WITH a AS (
  SELECT event_id - event_id % 16 AS ts,
         '/var/f' || CAST(event_id % 50 AS VARCHAR) AS path,
         'f' || CAST(event_id % 50 AS VARCHAR) AS name,
         event_id % 9 <> 0 AS ok, event_id % 100000 AS sz,
         1700000000 + event_id % 1000 AS mt,
         1700000000 + user_id % 1000 AS at,
         1700000000 + (event_id + user_id) % 1000 AS ct,
         CASE WHEN user_id % 2 = 0 THEN '-rw-r--r--'
              ELSE '-rwxr-xr-x' END AS perm
  FROM events
)
SELECT ts, path, name, m AS fs_metric, CAST(v AS BIGINT) AS fs_value,
       p AS fs_perm
FROM a, LATERAL (VALUES
  ('file.size', sz, CAST(NULL AS VARCHAR)),
  ('file.mtime', mt, CAST(NULL AS VARCHAR)),
  ('file.atime', at, CAST(NULL AS VARCHAR)),
  ('file.ctime', ct, perm)) AS t(m, v, p)
WHERE ok
UNION ALL
SELECT ts, CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), 'file.count',
       CAST(COUNT(*) AS BIGINT), CAST(NULL AS VARCHAR)
FROM a GROUP BY ts
"""

EXT18_QUERIES["file_stats"] = q_file_stats
EXT18_ORACLES["file_stats"] = O_FILE_STATS


def q_riak_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.receivers import riak_stats

    ev = load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    s = lambda c: c.cast("string")  # noqa: E731
    body = F.when(e % 19 == 0, F.lit("{}")).otherwise(F.concat(
        F.lit('{"node":"riak@'), s(u % 3),
        F.lit('","node_gets":'), s(e % 9000),
        F.lit(',"node_puts":'), s(u % 8000),
        F.lit(',"node_get_fsm_time_mean":'), s(e % 700),
        F.lit(',"node_put_fsm_time_mean":'), s(u % 600),
        F.lit(',"read_repairs":'), s(e % 50),
        F.lit(',"mem_allocated":'), s(e * 1000 % 100000000),
        F.lit(',"vnode_gets":'), s(u % 9000),
        F.lit(',"vnode_puts":'), s(e % 8000),
        F.lit(',"vnode_index_reads":'), s(u % 400),
        F.lit(',"vnode_index_writes":'), s(e % 300),
        F.lit(',"vnode_index_deletes":'), s(u % 200), F.lit("}"),
    ))
    return riak_stats(ev.select("event_id", body.alias("body")))


O_RIAK = """
WITH a AS (
  SELECT event_id, user_id AS u, event_id AS e,
         'riak@' || CAST(user_id % 3 AS VARCHAR) AS node
  FROM events WHERE event_id % 19 <> 0
)
SELECT event_id, node, m AS rk_metric, at AS rk_attr,
       CAST(v AS BIGINT) AS rk_value
FROM a, LATERAL (VALUES
  ('riak.node.operation.count', 'get', e % 9000),
  ('riak.node.operation.count', 'put', u % 8000),
  ('riak.node.operation.time.mean', 'get', e % 700),
  ('riak.node.operation.time.mean', 'put', u % 600),
  ('riak.node.read_repair.count', CAST(NULL AS VARCHAR), e % 50),
  ('riak.memory.limit', CAST(NULL AS VARCHAR), e * 1000 % 100000000),
  ('riak.vnode.operation.count', 'get', u % 9000),
  ('riak.vnode.operation.count', 'put', e % 8000),
  ('riak.vnode.index.operation.count', 'read', u % 400),
  ('riak.vnode.index.operation.count', 'write', e % 300),
  ('riak.vnode.index.operation.count', 'delete', u % 200)
) AS t(m, at, v)
"""

EXT18_QUERIES["riak_stats"] = q_riak_stats
EXT18_ORACLES["riak_stats"] = O_RIAK


def q_httpcheck(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.receivers import httpcheck_metrics

    ev = load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    failed = e % 8 == 0
    fx = ev.select(
        e.alias("ts"),
        F.concat(F.lit("http://svc"), (u % 4).cast("string"))
        .alias("endpoint"),
        F.when(u % 5 == 0, F.lit("POST")).otherwise(F.lit("GET"))
        .alias("method"),
        (e % 3000).alias("duration_ms"), (u % 50).alias("dns_ms"),
        (e % 80).alias("tcp_ms"), (u % 120).alias("tls_ms"),
        (e % 40).alias("request_ms"), (u % 900).alias("response_ms"),
        F.when(~failed, (e % 5 + 1) * 100 + e % 20)
        .alias("status_code"),
        F.when(failed, F.lit("connection refused")).alias("error_msg"),
        F.when(u % 6 == 0, F.lit("CN=ca")).alias("tls_issuer"),
        F.when(u % 6 == 0, e % 100000).alias("tls_time_left"),
    )
    return httpcheck_metrics(fx)


O_HTTPCHECK = """
WITH a AS (
  SELECT event_id AS ts,
         'http://svc' || CAST(user_id % 4 AS VARCHAR) AS endpoint,
         CASE WHEN user_id % 5 = 0 THEN 'POST' ELSE 'GET' END AS mth,
         user_id AS u, event_id AS e,
         event_id % 8 = 0 AS failed,
         CASE WHEN event_id % 8 <> 0
              THEN (event_id % 5 + 1) * 100 + event_id % 20
              ELSE 0 END AS sc
  FROM events
)
SELECT ts, endpoint, m AS hc_metric, at AS hc_attr,
       CAST(NULL AS BIGINT) AS hc_status_code,
       CAST(NULL AS VARCHAR) AS hc_class, CAST(v AS BIGINT) AS hc_value
FROM a, LATERAL (VALUES
  ('httpcheck.duration', CAST(NULL AS VARCHAR), e % 3000),
  ('httpcheck.dns.lookup.duration', CAST(NULL AS VARCHAR), u % 50),
  ('httpcheck.client.connection.duration', 'tcp', e % 80),
  ('httpcheck.tls.handshake.duration', CAST(NULL AS VARCHAR), u % 120),
  ('httpcheck.client.request.duration', CAST(NULL AS VARCHAR), e % 40),
  ('httpcheck.response.duration', CAST(NULL AS VARCHAR), u % 900)
) AS t(m, at, v)
UNION ALL
SELECT ts, endpoint, 'httpcheck.error', 'connection refused', NULL,
       NULL, 1 FROM a WHERE failed
UNION ALL
SELECT ts, endpoint, 'httpcheck.tls.cert_remaining', 'CN=ca', NULL,
       NULL, CAST(e % 100000 AS BIGINT)
FROM a, (VALUES (1), (2)) AS dup(i) WHERE u % 6 = 0
UNION ALL
SELECT ts, endpoint, 'httpcheck.status', mth,
       CASE WHEN sc // 100 = d THEN CAST(sc AS BIGINT) END, cls,
       CASE WHEN sc // 100 = d THEN 1 ELSE 0 END
FROM a, LATERAL (VALUES ('1xx', 1), ('2xx', 2), ('3xx', 3),
  ('4xx', 4), ('5xx', 5)) AS c(cls, d)
"""

EXT18_QUERIES["httpcheck_metrics"] = q_httpcheck
EXT18_ORACLES["httpcheck_metrics"] = O_HTTPCHECK


# ---------------------------------------------------------------------------
# apachespark receiver: REST objects -> metric rows
# ---------------------------------------------------------------------------

_AS_STAGE_FIELDS = [
    "num_active_tasks", "num_complete_tasks", "num_failed_tasks",
    "num_killed_tasks", "executor_run_time", "executor_cpu_time",
    "result_size", "jvm_gc_time", "memory_bytes_spilled",
    "disk_bytes_spilled", "peak_execution_memory", "input_bytes",
    "output_bytes", "input_records", "output_records",
    "shuffle_remote_blocks_fetched", "shuffle_local_blocks_fetched",
    "shuffle_fetch_wait_time", "shuffle_remote_bytes_read_to_disk",
    "shuffle_local_bytes_read", "shuffle_remote_bytes_read",
    "shuffle_write_bytes", "shuffle_read_records",
    "shuffle_write_records", "shuffle_write_time",
]
_AS_EXEC_FIELDS = [
    "memory_used", "disk_used", "max_tasks", "active_tasks",
    "failed_tasks", "completed_tasks", "total_duration",
    "total_gc_time", "total_input_bytes", "total_shuffle_read",
    "total_shuffle_write",
]
_AS_JOB_FIELDS = [
    "num_active_tasks", "num_completed_tasks", "num_skipped_tasks",
    "num_failed_tasks", "num_active_stages", "num_completed_stages",
    "num_skipped_stages", "num_failed_stages",
]
_AS_NAMES = ["etl", "ml", "adhoc", "other"]


def q_spark_rest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.apachespark import _CLUSTER_FAN, spark_rest_metrics

    ev = load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    ts = (e - e % 40).alias("ts")
    slot = e % 40

    apps = ev.where(slot < 4).select(
        ts, F.lit("app").alias("kind"),
        F.concat(F.lit("a"), slot.cast("string")).alias("app_id"),
        F.element_at(F.array(*[F.lit(n) for n in _AS_NAMES]),
                     (slot + 1).cast("int")).alias("app_name"),
        F.lit(None).cast("string").alias("body"),
    )

    # cluster blob: keys for apps a0 and a1 only (a2 exercises the
    # absent-key gate, a3 is name-filtered anyway)
    tsv = e - e % 40
    gauges, counters, hists, timers = [], [], [], []
    seen = set()
    for i, (coll, suffix, *_rest) in enumerate(_CLUSTER_FAN):
        canon = (coll.replace("hist_mean", "hist_count")
                 .replace("timer_mean", "timers"))
        if (canon, suffix) in seen:
            continue
        seen.add((canon, suffix))
        for a in ("a0", "a1"):
            key = F.lit(a + suffix)
            base = tsv + (1 if a == "a1" else 0) * 997
            if canon == "gauges":
                gauges += [key, ((base + i * 13) % 100000)
                           .cast("double")]
            elif canon == "counters":
                counters += [key, ((base + i * 7) % 50000)
                             .cast("bigint")]
            elif canon == "hist_count":
                hists += [key, F.struct(
                    ((base + i * 3) % 1000).cast("bigint")
                    .alias("count"),
                    (((base + i) % 3200) / 32).cast("double")
                    .alias("mean"))]
            else:
                timers += [key, F.struct(
                    (((base + i) % 1600) / 16).cast("double")
                    .alias("mean"))]
    cluster = ev.where(slot == 4).select(
        ts, F.lit("cluster").alias("kind"),
        F.lit(None).cast("string").alias("app_id"),
        F.lit(None).cast("string").alias("app_name"),
        F.to_json(F.struct(
            F.create_map(*gauges).alias("gauges"),
            F.create_map(*counters).alias("counters"),
            F.create_map(*hists).alias("histograms"),
            F.create_map(*timers).alias("timers"),
        )).alias("body"))

    statuses = ["ACTIVE", "COMPLETE", "PENDING", "FAILED", "SKIPPED"]
    stage_body = F.struct(
        (e % 20).alias("stage_id"), (e % 3).alias("attempt_id"),
        F.element_at(F.array(*[F.lit(s) for s in statuses]),
                     (u % 5 + 1).cast("int")).alias("status"),
        *[((e + i * 17) % 10000).alias(f)
          for i, f in enumerate(_AS_STAGE_FIELDS)])
    stages = ev.where((slot >= 5) & (slot < 15)).select(
        ts, F.lit("stage").alias("kind"),
        F.concat(F.lit("a"), (e % 4).cast("string")).alias("app_id"),
        F.lit(None).cast("string").alias("app_name"),
        F.to_json(stage_body).alias("body"))

    exec_body = F.struct(
        F.concat(F.lit("x"), (u % 6).cast("string"))
        .alias("executor_id"),
        *[((e + i * 17) % 10000).alias(f)
          for i, f in enumerate(_AS_EXEC_FIELDS)],
        (u % 1000).alias("used_on_heap_storage_memory"),
        (1000 + e % 1000).alias("total_on_heap_storage_memory"),
        (e % 500).alias("used_off_heap_storage_memory"),
        (500 + u % 500).alias("total_off_heap_storage_memory"))
    executors = ev.where((slot >= 15) & (slot < 21)).select(
        ts, F.lit("executor").alias("kind"),
        F.concat(F.lit("a"), (e % 4).cast("string")).alias("app_id"),
        F.lit(None).cast("string").alias("app_name"),
        F.to_json(exec_body).alias("body"))

    job_body = F.struct(
        (e % 30).alias("job_id"),
        *[((e + i * 17) % 10000).alias(f)
          for i, f in enumerate(_AS_JOB_FIELDS)])
    jobs = ev.where((slot >= 21) & (slot < 29)).select(
        ts, F.lit("job").alias("kind"),
        F.concat(F.lit("a"), (e % 4).cast("string")).alias("app_id"),
        F.lit(None).cast("string").alias("app_name"),
        F.to_json(job_body).alias("body"))

    fx = apps
    for piece in [cluster, stages, executors, jobs]:
        fx = fx.unionByName(piece)
    return spark_rest_metrics(fx, application_names=["etl", "ml",
                                                     "adhoc"])


def _spark_rest_oracle() -> str:
    from ..operators.apachespark import (
        _CLUSTER_FAN, _EXEC_FAN, _JOB_FAN, _STAGE_FAN)
    NS = "CAST(NULL AS VARCHAR)"
    NI = "CAST(NULL AS BIGINT)"
    ND = "CAST(NULL AS DOUBLE)"
    q = lambda s: f"'{s}'" if s else NS  # noqa: E731

    parts = []
    first = True

    def sel(ts, app_id, app_name, scope, sid, metric, a1, a2, vi, vd,
            frm):
        nonlocal first
        a = (lambda n: f" AS {n}") if first else (lambda n: "")
        first = False
        return (f"SELECT {ts}{a('ts')}, {app_id}{a('app_id')}, "
                f"{app_name}{a('app_name')}, '{scope}'{a('as_scope')},"
                f" {sid}{a('as_id')}, '{metric}'{a('as_metric')}, "
                f"{a1}{a('as_attr1')}, {a2}{a('as_attr2')}, "
                f"{vi}{a('as_value')}, {vd}{a('as_value_d')} {frm}")

    # cluster rows: apps a0/a1 joined to the blob on ts
    seen_i = {}
    for i, (coll, suffix, *_rest) in enumerate(_CLUSTER_FAN):
        if (coll.replace("hist_mean", "hist_count")
                .replace("timer_mean", "timers"), suffix) \
                not in seen_i:
            seen_i[(coll.replace("hist_mean", "hist_count")
                    .replace("timer_mean", "timers"), suffix)] = i
    for an, off in [("a0", 0), ("a1", 997)]:
        nm = {"a0": "etl", "a1": "ml"}[an]
        for i, (coll, suffix, metric, a1, a2) in \
                enumerate(_CLUSTER_FAN):
            key = (coll.replace("hist_mean", "hist_count")
                   .replace("timer_mean", "timers"), suffix)
            gi = seen_i[key]
            b = f"(ts + {off})"
            if coll == "gauges":
                vi, vd = f"({b} + {gi} * 13) % 100000", ND
            elif coll == "counters":
                vi, vd = f"({b} + {gi} * 7) % 50000", ND
            elif coll == "hist_count":
                vi, vd = f"({b} + {gi} * 3) % 1000", ND
            elif coll == "hist_mean":
                vi = NI
                vd = f"CAST(({b} + {gi}) % 3200 AS DOUBLE) / 32"
            else:
                vi = NI
                vd = f"CAST(({b} + {gi}) % 1600 AS DOUBLE) / 16"
            if coll in ("gauges", "counters", "hist_count"):
                vi = f"CAST({vi} AS BIGINT)"
            parts.append(sel("ts", f"'{an}'", f"'{nm}'", "cluster",
                             NS, metric, q(a1), q(a2), vi, vd,
                             "FROM blocks"))

    # stage rows (apps a0-a2 allowed; status SKIPPED dropped)
    sfld = {f: f"(e + {i} * 17) % 10000"
            for i, f in enumerate(_AS_STAGE_FIELDS)}
    stage_from = ("FROM a WHERE slot >= 5 AND slot < 15 AND "
                  "e % 4 < 3 AND u % 5 < 4")
    sid = ("CAST(e % 20 AS VARCHAR) || '-' || CAST(e % 3 AS VARCHAR)")
    st = ("['active','complete','pending','failed']"
          "[CAST(u % 5 AS INT) + 1]")
    parts.append(sel("ts", "'a' || CAST(e % 4 AS VARCHAR)",
                     "['etl','ml','adhoc'][CAST(e % 4 AS INT) + 1]",
                     "stage", sid, "spark.stage.status", st, NS,
                     "CAST(0 AS BIGINT)", ND, stage_from))
    for metric, a1, f in _STAGE_FAN:
        parts.append(sel(
            "ts", "'a' || CAST(e % 4 AS VARCHAR)",
            "['etl','ml','adhoc'][CAST(e % 4 AS INT) + 1]", "stage",
            sid, metric, q(a1), NS, f"CAST({sfld[f]} AS BIGINT)", ND,
            stage_from))

    # executor rows
    efld = {f: f"(e + {i} * 17) % 10000"
            for i, f in enumerate(_AS_EXEC_FIELDS)}
    exec_from = ("FROM a WHERE slot >= 15 AND slot < 21 AND "
                 "e % 4 < 3")
    xid = "'x' || CAST(u % 6 AS VARCHAR)"
    for loc, used, total in [
            ("on_heap", "u % 1000", "1000 + e % 1000"),
            ("off_heap", "e % 500", "500 + u % 500")]:
        parts.append(sel(
            "ts", "'a' || CAST(e % 4 AS VARCHAR)",
            "['etl','ml','adhoc'][CAST(e % 4 AS INT) + 1]",
            "executor", xid, "spark.executor.storage_memory.usage",
            f"'{loc}'", "'used'", f"CAST({used} AS BIGINT)", ND,
            exec_from))
        parts.append(sel(
            "ts", "'a' || CAST(e % 4 AS VARCHAR)",
            "['etl','ml','adhoc'][CAST(e % 4 AS INT) + 1]",
            "executor", xid, "spark.executor.storage_memory.usage",
            f"'{loc}'", "'free'",
            f"CAST(({total}) - ({used}) AS BIGINT)", ND, exec_from))
    for metric, a1, _a2, f in _EXEC_FAN:
        parts.append(sel(
            "ts", "'a' || CAST(e % 4 AS VARCHAR)",
            "['etl','ml','adhoc'][CAST(e % 4 AS INT) + 1]",
            "executor", xid, metric, q(a1), NS,
            f"CAST({efld[f]} AS BIGINT)", ND, exec_from))

    # job rows
    jfld = {f: f"(e + {i} * 17) % 10000"
            for i, f in enumerate(_AS_JOB_FIELDS)}
    job_from = "FROM a WHERE slot >= 21 AND slot < 29 AND e % 4 < 3"
    for metric, a1, f in _JOB_FAN:
        parts.append(sel(
            "ts", "'a' || CAST(e % 4 AS VARCHAR)",
            "['etl','ml','adhoc'][CAST(e % 4 AS INT) + 1]", "job",
            "CAST(e % 30 AS VARCHAR)", metric, q(a1), NS,
            f"CAST({jfld[f]} AS BIGINT)", ND, job_from))

    return (
        "WITH a AS (SELECT event_id - event_id % 40 AS ts, user_id AS"
        " u, event_id AS e, event_id % 40 AS slot FROM events),\n"
        "blocks AS (SELECT DISTINCT ts FROM a WHERE slot = 4)\n"
        + "\nUNION ALL\n".join(parts)
    )


EXT18_QUERIES["spark_rest_metrics"] = q_spark_rest
EXT18_ORACLES["spark_rest_metrics"] = _spark_rest_oracle()


# ---------------------------------------------------------------------------
# sqlserver receiver: io / perf-counter / status / wait rows -> datapoints
# ---------------------------------------------------------------------------


def q_sqlserver(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sqlserver import PERF_COUNTER_TABLE, \
        sqlserver_metrics

    ev = load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    s = lambda c: c.cast("string")  # noqa: E731
    kind = F.element_at(
        F.array(F.lit("io"), F.lit("perf"), F.lit("status"),
                F.lit("wait")), (e % 4 + 1).cast("int"))
    counters = [c for c, *_ in PERF_COUNTER_TABLE] + ["Unknown Counter"]
    cname = F.element_at(F.array(*[F.lit(c) for c in counters]),
                         (e % 33 + 1).cast("int"))
    junk = u % 17 == 0
    body = (
        F.when(kind == "io", F.to_json(F.struct(
            F.concat(F.lit("/data/f"), s(e % 5), F.lit(".mdf"))
            .alias("physical_filename"),
            F.concat(F.lit("lf"), s(e % 5)).alias("logical_filename"),
            F.when(u % 2 == 0, F.lit("ROWS")).otherwise(F.lit("LOG"))
            .alias("file_type"),
            F.when(junk, F.lit("x")).otherwise(s(e % 3000))
            .alias("read_latency_ms"),
            s(u % 3000).alias("write_latency_ms"),
            s(e % 5000).alias("read_count"),
            F.when(junk, F.lit("y")).otherwise(s(u % 5000))
            .alias("write_count"),
            s(e * 512 % 10000000).alias("read_bytes"),
            s(u * 512 % 10000000).alias("write_bytes"))))
        .when(kind == "perf", F.to_json(F.struct(
            cname.alias("counter"),
            F.when(junk, F.lit("junk")).otherwise(s(e % 9999))
            .alias("value"),
            F.concat(F.lit("obj"), s(u % 2)).alias("object"))))
        .when(kind == "status", F.to_json(F.struct(
            s(e % 40).alias("db_online"), s(u % 5).alias("db_restoring"),
            s(e % 4).alias("db_recovering"),
            s(u % 3).alias("db_recoveryPending"),
            s(e % 2).alias("db_suspect"), s(u % 4).alias("db_offline"),
            s(2 + e % 62).alias("cpu_count"),
            s((e % 3200) / 32.0).alias("computer_uptime"))))
        .otherwise(F.to_json(F.struct(
            F.element_at(F.array(F.lit("Lock"), F.lit("CPU"),
                                 F.lit("IO")), (u % 3 + 1).cast("int"))
            .alias("wait_category"),
            F.concat(F.lit("WT_"), s(e % 7)).alias("wait_type"),
            F.when(junk, F.lit("?")).otherwise(s(e % 90000))
            .alias("wait_time_ms"))))
    )
    fx = ev.select(
        F.concat(F.lit("PC"), s(u % 2)).alias("computer"),
        F.concat(F.lit("MSSQL"), s(u % 3)).alias("instance"),
        F.when(kind.isin("io", "wait"),
               F.concat(F.lit("db"), s(e % 3))).alias("db"),
        e.alias("ts"), kind.alias("kind"), body.alias("body"),
    )
    return sqlserver_metrics(fx)


def _sqlserver_oracle() -> str:
    from ..operators.sqlserver import PERF_COUNTER_TABLE
    NS = "CAST(NULL AS VARCHAR)"
    NI = "CAST(NULL AS BIGINT)"
    ND = "CAST(NULL AS DOUBLE)"
    parts = []
    first = True

    def sel(db, fp, fl, ft, metric, a1, a2, vi, vd, frm):
        nonlocal first
        a = (lambda n: f" AS {n}") if first else (lambda n: "")
        first = False
        return (f"SELECT computer{a('computer')}, "
                f"instance{a('instance')}, {db}{a('db')}, "
                f"e{a('ts')}, {fp}{a('file_physical')}, "
                f"{fl}{a('file_logical')}, {ft}{a('file_type')}, "
                f"{metric}{a('ss_metric')}, {a1}{a('ss_a1')}, "
                f"{a2}{a('ss_a2')}, {vi}{a('ss_value')}, "
                f"{vd}{a('ss_value_d')} {frm}")

    dbn = "'db' || CAST(e % 3 AS VARCHAR)"
    fp = "'/data/f' || CAST(e % 5 AS VARCHAR) || '.mdf'"
    fl = "'lf' || CAST(e % 5 AS VARCHAR)"
    ft = "CASE WHEN u % 2 = 0 THEN 'ROWS' ELSE 'LOG' END"
    io_from = "FROM a WHERE e % 4 = 0"
    parts.append(sel(dbn, fp, fl, ft, "'sqlserver.database.latency'",
                     "'read'", NS, NI,
                     "CAST(e % 3000 AS DOUBLE) / 1e3",
                     io_from + " AND u % 17 <> 0"))
    parts.append(sel(dbn, fp, fl, ft, "'sqlserver.database.latency'",
                     "'write'", NS, NI,
                     "CAST(u % 3000 AS DOUBLE) / 1e3", io_from))
    parts.append(sel(dbn, fp, fl, ft,
                     "'sqlserver.database.operations'", "'read'", NS,
                     "CAST(e % 5000 AS BIGINT)", ND, io_from))
    parts.append(sel(dbn, fp, fl, ft,
                     "'sqlserver.database.operations'", "'write'", NS,
                     "CAST(u % 5000 AS BIGINT)", ND,
                     io_from + " AND u % 17 <> 0"))
    parts.append(sel(dbn, fp, fl, ft, "'sqlserver.database.io'",
                     "'read'", NS, "CAST(e * 512 % 10000000 AS BIGINT)",
                     ND, io_from))
    parts.append(sel(dbn, fp, fl, ft, "'sqlserver.database.io'",
                     "'write'", NS,
                     "CAST(u * 512 % 10000000 AS BIGINT)", ND, io_from))

    for idx, (cname, metric, a1, a2, is_f) in \
            enumerate(PERF_COUNTER_TABLE):
        w = f"FROM a WHERE e % 4 = 1 AND e % 33 = {idx} AND u % 17 <> 0"
        if a1 == "@object":
            a1s = "'obj' || CAST(u % 2 AS VARCHAR)"
        else:
            a1s = f"'{a1}'" if a1 else NS
        a2s = f"'{a2}'" if a2 else NS
        vi = NI if is_f else "CAST(e % 9999 AS BIGINT)"
        vd = "CAST(e % 9999 AS DOUBLE)" if is_f else ND
        parts.append(sel(NS, NS, NS, NS, f"'{metric}'", a1s, a2s, vi,
                         vd, w))

    st_from = "FROM a WHERE e % 4 = 2"
    for f, st in [("e % 40", "online"), ("u % 5", "restoring"),
                  ("e % 4", "recovering"), ("u % 3", "pending_recovery"),
                  ("e % 2", "suspect"), ("u % 4", "offline")]:
        parts.append(sel(NS, NS, NS, NS, "'sqlserver.database.count'",
                         f"'{st}'", NS, f"CAST({f} AS BIGINT)", ND,
                         st_from))
    parts.append(sel(NS, NS, NS, NS, "'sqlserver.cpu.count'", NS, NS,
                     "CAST(2 + e % 62 AS BIGINT)", ND, st_from))
    parts.append(sel(NS, NS, NS, NS, "'sqlserver.computer.uptime'",
                     NS, NS, NI, "CAST(e % 3200 AS DOUBLE) / 32",
                     st_from))

    parts.append(sel(
        dbn, NS, NS, NS, "'sqlserver.os.wait.duration'",
        "['Lock','CPU','IO'][CAST(u % 3 AS INT) + 1]",
        "'WT_' || CAST(e % 7 AS VARCHAR)", NI,
        "CAST(e % 90000 AS DOUBLE) / 1e3",
        "FROM a WHERE e % 4 = 3 AND u % 17 <> 0"))

    return (
        "WITH a AS (SELECT 'PC' || CAST(user_id % 2 AS VARCHAR) AS "
        "computer, 'MSSQL' || CAST(user_id % 3 AS VARCHAR) AS "
        "instance, user_id AS u, event_id AS e FROM events)\n"
        + "\nUNION ALL\n".join(parts)
    )


EXT18_QUERIES["sqlserver_metrics"] = q_sqlserver
EXT18_ORACLES["sqlserver_metrics"] = _sqlserver_oracle()


# ---------------------------------------------------------------------------
# snowflake receiver: raw ACCOUNT_USAGE history -> aggregated metrics
# ---------------------------------------------------------------------------


def q_snowflake(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.snowflake import snowflake_metrics

    ev = load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    acct = F.concat(F.lit("ac"), (u % 2).cast("string")).alias("account")
    t = e.alias("start_time")

    metering = ev.select(
        acct, t,
        F.concat(F.lit("st"), (e % 3).cast("string"))
        .alias("service_type"),
        F.concat(F.lit("n"), (u % 2).cast("string")).alias("name"),
        ((e % 3200).cast("double") / 32).alias("credits_used_compute"),
        ((u % 1600).cast("double") / 16)
        .alias("credits_used_cloud_services"),
        ((e % 800).cast("double") / 8).alias("credits_used"),
    )
    wh_metering = ev.select(
        acct, t,
        F.concat(F.lit("wh"), (e % 4).cast("string"))
        .alias("warehouse_name"),
        ((u % 3200).cast("double") / 32).alias("credits_used_compute"),
        ((e % 1600).cast("double") / 16)
        .alias("credits_used_cloud_services"),
        ((u % 800).cast("double") / 8).alias("credits_used"),
    )
    logins = ev.select(
        acct, e.alias("event_timestamp"),
        F.concat(F.lit("usr"), (u % 5).cast("string"))
        .alias("user_name"),
        F.when(e % 7 == 0, F.lit("BAD_PW")).otherwise(F.lit(""))
        .alias("error_message"),
        F.element_at(F.array(F.lit("JDBC"), F.lit("PYTHON"),
                             F.lit("GO")), (e % 3 + 1).cast("int"))
        .alias("reported_client_type"),
        F.when(e % 7 == 0, F.lit("NO")).otherwise(F.lit("YES"))
        .alias("is_success"),
    )
    wh_load = ev.select(
        acct, t,
        F.concat(F.lit("wh"), (e % 4).cast("string"))
        .alias("warehouse_name"),
        (e % 20).alias("avg_running"), (u % 10).alias("avg_queued_load"),
        (e % 5).alias("avg_queued_provisioning"),
        (u % 4).alias("avg_blocked"),
    )
    query_history = ev.select(
        acct, t, e.alias("query_id"),
        F.concat(F.lit("sch"), (u % 2).cast("string"))
        .alias("schema_name"),
        F.when(e % 11 == 0, F.lit("FAIL")).otherwise(F.lit("SUCCESS"))
        .alias("execution_status"),
        F.when(e % 11 == 0, F.lit("oops")).otherwise(F.lit(""))
        .alias("error_message"),
        F.element_at(F.array(F.lit("SELECT"), F.lit("INSERT"),
                             F.lit("COPY")), (u % 3 + 1).cast("int"))
        .alias("query_type"),
        F.concat(F.lit("wh"), (e % 4).cast("string"))
        .alias("warehouse_name"),
        F.concat(F.lit("db"), (u % 2).cast("string"))
        .alias("database_name"),
        F.element_at(F.array(F.lit("XS"), F.lit("M")),
                     (e % 2 + 1).cast("int")).alias("warehouse_size"),
        F.concat(F.lit("usr"), (u % 5).cast("string"))
        .alias("user_name"),
        (e % 1000000).alias("bytes_scanned"),
        (u % 100000).alias("bytes_deleted"),
        (e % 5000).alias("bytes_spilled_to_remote_storage"),
        (u % 5000).alias("bytes_spilled_to_local_storage"),
        (e % 200000).alias("bytes_written"),
        (u % 900).alias("compilation_time"),
        (e % 100).alias("percentage_scanned_from_cache"),
        (u % 60000).alias("execution_time"),
        (e % 400).alias("partitions_scanned"),
        (u % 300).alias("queued_overload_time"),
        (e % 200).alias("queued_provisioning_time"),
        (u % 100).alias("queued_repair_time"),
        (e % 5000).alias("rows_inserted"),
        (u % 4000).alias("rows_deleted"),
        F.when(e % 13 == 0, F.lit(None).cast("bigint"))
        .otherwise(e % 9000).alias("rows_produced"),
        (u % 50).alias("rows_unloaded"),
        (e % 3000).alias("rows_updated"),
        (u % 70000).alias("total_elapsed_time"),
    )
    sessions = ev.select(
        acct, e.alias("created_on"),
        F.concat(F.lit("usr"), (u % 5).cast("string"))
        .alias("user_name"),
        (e % 97).alias("session_id"),
    )
    pipe_usage = ev.select(
        acct, t,
        F.concat(F.lit("p"), (e % 3).cast("string")).alias("pipe_name"),
        ((u % 640).cast("double") / 64).alias("credits_used"),
    )
    storage = ev.select(
        acct, e.alias("usage_date"),
        (e * 1000 % 10000000000).alias("storage_bytes"),
        (u * 1000 % 1000000000).alias("stage_bytes"),
        (e * 100 % 100000000).alias("failsafe_bytes"),
    )
    return snowflake_metrics(metering, wh_metering, logins, wh_load,
                             query_history, sessions, pipe_usage,
                             storage, cutoff=100)


def _snowflake_oracle() -> str:
    from ..operators.snowflake import snowflake_metrics  # noqa: F401
    NS = "CAST(NULL AS VARCHAR)"
    NI = "CAST(NULL AS BIGINT)"
    ND = "CAST(NULL AS DOUBLE)"
    head = ("SELECT account{0}, m{1}, attr{2}, {3} AS sf_schema, "
            "{4} AS sf_status, {5} AS sf_error, {6} AS sf_qtype, "
            "{7} AS sf_warehouse, {8} AS sf_db, {9} AS sf_size, "
            "vi{10}, vd{11}")
    qh_aggs = [
        ("snowflake.database.bytes_scanned.avg", "e % 1000000"),
        ("snowflake.query.bytes_deleted.avg", "u % 100000"),
        ("snowflake.query.bytes_spilled.remote.avg", "e % 5000"),
        ("snowflake.query.bytes_spilled.local.avg", "u % 5000"),
        ("snowflake.query.bytes_written.avg", "e % 200000"),
        ("snowflake.query.compilation_time.avg", "u % 900"),
        ("snowflake.query.data_scanned_cache.avg", "e % 100"),
        ("snowflake.query.execution_time.avg", "u % 60000"),
        ("snowflake.query.partitions_scanned.avg", "e % 400"),
        ("snowflake.queued_overload_time.avg", "u % 300"),
        ("snowflake.queued_provisioning_time.avg", "e % 200"),
        ("snowflake.queued_repair_time.avg", "u % 100"),
        ("snowflake.rows_inserted.avg", "e % 5000"),
        ("snowflake.rows_deleted.avg", "u % 4000"),
        ("snowflake.rows_produced.avg",
         "CASE WHEN e % 13 = 0 THEN 0 ELSE e % 9000 END"),
        ("snowflake.rows_unloaded.avg", "u % 50"),
        ("snowflake.rows_updated.avg", "e % 3000"),
        ("snowflake.total_elapsed_time.avg", "u % 70000"),
    ]
    sevens = ("'sch' || CAST(u % 2 AS VARCHAR)",
              "CASE WHEN e % 11 = 0 THEN 'FAIL' ELSE 'SUCCESS' END",
              "CASE WHEN e % 11 = 0 THEN 'oops' ELSE '' END",
              "['SELECT','INSERT','COPY'][CAST(u % 3 AS INT) + 1]",
              "'wh' || CAST(e % 4 AS VARCHAR)",
              "'db' || CAST(u % 2 AS VARCHAR)",
              "['XS','M'][CAST(e % 2 AS INT) + 1]")
    qh_group = ", ".join(sevens) + ", 'usr' || CAST(u % 5 AS VARCHAR)"
    qh_metric_rows = ", ".join(
        f"('{m}', NULL, AVG(CAST({x} AS DOUBLE)))" for m, x in qh_aggs)
    return f"""
WITH a AS (
  SELECT 'ac' || CAST(user_id % 2 AS VARCHAR) AS account,
         user_id AS u, event_id AS e
  FROM events
), w AS (SELECT * FROM a WHERE e >= 100)
SELECT account AS account, m AS sf_metric, attr AS sf_attr,
       {NS} AS sf_schema, {NS} AS sf_status, {NS} AS sf_error,
       {NS} AS sf_qtype, {NS} AS sf_warehouse, {NS} AS sf_db,
       {NS} AS sf_size, vi AS sf_value, vd AS sf_value_d
FROM (
  SELECT account, 'st' || CAST(e % 3 AS VARCHAR) AS attr,
         SUM(CAST(e % 3200 AS DOUBLE) / 32) AS vw,
         SUM(CAST(u % 1600 AS DOUBLE) / 16) AS cs,
         SUM(CAST(e % 800 AS DOUBLE) / 8) AS tc
  FROM w GROUP BY account, 2, 'n' || CAST(u % 2 AS VARCHAR)
), LATERAL (VALUES
  ('snowflake.billing.cloud_service.total', {NI}, cs),
  ('snowflake.billing.total_credit.total', {NI}, tc),
  ('snowflake.billing.virtual_warehouse.total', {NI}, vw)) t(m, vi, vd)
UNION ALL
SELECT account, m, attr, {NS}, {NS}, {NS}, {NS}, {NS}, {NS}, {NS},
       vi, vd
FROM (
  SELECT account, 'wh' || CAST(e % 4 AS VARCHAR) AS attr,
         SUM(CAST(u % 3200 AS DOUBLE) / 32) AS vw,
         SUM(CAST(e % 1600 AS DOUBLE) / 16) AS cs,
         SUM(CAST(u % 800 AS DOUBLE) / 8) AS tc
  FROM w GROUP BY account, 2
), LATERAL (VALUES
  ('snowflake.billing.warehouse.total_credit.total', {NI}, tc),
  ('snowflake.billing.warehouse.cloud_service.total', {NI}, cs),
  ('snowflake.billing.warehouse.virtual_warehouse.total', {NI}, vw)
) t(m, vi, vd)
UNION ALL
SELECT account, 'snowflake.logins.total',
       err || '|' || ct || '|' || ok, {NS}, {NS}, {NS}, {NS}, {NS},
       {NS}, {NS}, CAST(COUNT(*) AS BIGINT), {ND}
FROM (
  SELECT account, u, e,
         CASE WHEN e % 7 = 0 THEN 'BAD_PW' ELSE '' END AS err,
         ['JDBC','PYTHON','GO'][CAST(e % 3 AS INT) + 1] AS ct,
         CASE WHEN e % 7 = 0 THEN 'NO' ELSE 'YES' END AS ok
  FROM w)
GROUP BY account, 'usr' || CAST(u % 5 AS VARCHAR), err, ct, ok
UNION ALL
SELECT account, m, attr, {NS}, {NS}, {NS}, {NS}, {NS}, {NS}, {NS},
       {NI}, vd
FROM (
  SELECT account, 'wh' || CAST(e % 4 AS VARCHAR) AS attr,
         AVG(CAST(e % 20 AS DOUBLE)) AS ex,
         AVG(CAST(u % 10 AS DOUBLE)) AS ov,
         AVG(CAST(e % 5 AS DOUBLE)) AS pr,
         AVG(CAST(u % 4 AS DOUBLE)) AS bl
  FROM w GROUP BY account, 2
), LATERAL (VALUES
  ('snowflake.query.executed', ex),
  ('snowflake.query.blocked', bl),
  ('snowflake.query.queued_overload', ov),
  ('snowflake.query.queued_provision', pr)) t(m, vd)
UNION ALL
SELECT account, m, {NS}, s1, s2, s3, s4, s5, s6, s7, vi, vd
FROM (
  SELECT account, {", ".join(f"{x} AS s{i+1}" for i, x in enumerate(sevens))},
         CAST(COUNT(e) AS BIGINT) AS n
         {"".join(f", AVG(CAST({x} AS DOUBLE)) AS a{i}" for i, (_, x) in enumerate(qh_aggs))}
  FROM w GROUP BY account, s1, s2, s3, s4, s5, s6, s7,
        'usr' || CAST(u % 5 AS VARCHAR)
), LATERAL (VALUES
  ('snowflake.database.query.count', n, {ND})
  {"".join(f", ('{m}', {NI}, a{i})" for i, (m, _) in enumerate(qh_aggs))}
) t(m, vi, vd)
UNION ALL
SELECT account, 'snowflake.session_id.count',
       'usr' || CAST(u % 5 AS VARCHAR), {NS}, {NS}, {NS}, {NS}, {NS},
       {NS}, {NS}, CAST(COUNT(DISTINCT e % 97) AS BIGINT), {ND}
FROM w GROUP BY account, 'usr' || CAST(u % 5 AS VARCHAR)
UNION ALL
SELECT account, 'snowflake.pipe.credits_used.total',
       'p' || CAST(e % 3 AS VARCHAR), {NS}, {NS}, {NS}, {NS}, {NS},
       {NS}, {NS}, {NI}, SUM(CAST(u % 640 AS DOUBLE) / 64)
FROM w GROUP BY account, 'p' || CAST(e % 3 AS VARCHAR)
UNION ALL
SELECT account, m, {NS}, {NS}, {NS}, {NS}, {NS}, {NS}, {NS}, {NS},
       vi, {ND}
FROM (
  SELECT account, e FROM (
    SELECT account, e, ROW_NUMBER() OVER
      (PARTITION BY account ORDER BY e DESC) AS rn FROM a)
  WHERE rn = 1
) s, LATERAL (VALUES
  ('snowflake.storage.storage_bytes.total',
   CAST(e * 1000 % 10000000000 AS BIGINT)),
  ('snowflake.storage.stage_bytes.total',
   CAST((SELECT user_id FROM events WHERE event_id = s.e) * 1000
        % 1000000000 AS BIGINT)),
  ('snowflake.storage.failsafe_bytes.total',
   CAST(e * 100 % 100000000 AS BIGINT))) t(m, vi)
"""


EXT18_QUERIES["snowflake_metrics"] = q_snowflake
EXT18_ORACLES["snowflake_metrics"] = _snowflake_oracle()


# ---------------------------------------------------------------------------
# iis receiver: perf-counter samples -> iis.* metrics
# ---------------------------------------------------------------------------


def q_iis(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.receivers import IIS_COUNTER_TABLE, \
        _IIS_NEG_DENOM, iis_metrics

    ev = load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    n = len(IIS_COUNTER_TABLE)  # 21 regular + 2 qage variants
    idx = e % (n + 2)
    objs = F.array(*[F.lit(o) for o, *_ in IIS_COUNTER_TABLE]
                   + [F.lit("HTTP Service Request Queues")] * 2)
    ctrs = F.array(*[F.lit(c) for _, c, *_ in IIS_COUNTER_TABLE]
                   + [F.lit("MaxQueueItemAge")] * 2)
    inst = (F.when(idx == n + 1, F.lit("_Total"))
            .when(u % 11 == 0, F.lit(""))
            .otherwise(F.concat(F.lit("i"), (u % 3).cast("string"))))
    err = F.when(
        e % 19 == 0,
        F.when(e % 38 == 0,
               F.lit("boom: " + _IIS_NEG_DENOM)).otherwise(F.lit("boom")))
    fx = ev.select(
        (e - e % 16).alias("ts"),
        F.element_at(objs, (idx + 1).cast("int")).alias("object"),
        F.element_at(ctrs, (idx + 1).cast("int")).alias("counter"),
        inst.alias("instance"),
        ((e % 100000).cast("double") / 16).alias("value"),
        err.alias("err"),
    )
    return iis_metrics(fx)


def _iis_oracle() -> str:
    from ..operators.receivers import IIS_COUNTER_TABLE
    n = len(IIS_COUNTER_TABLE)
    NS = "CAST(NULL AS VARCHAR)"
    obj_arr = ("[" + ",".join(
        f"'{o}'" for o, *_ in IIS_COUNTER_TABLE)
        + ",'HTTP Service Request Queues','HTTP Service Request "
          "Queues']")
    ctr_arr = ("[" + ",".join(
        f"'{c}'" for _, c, *_ in IIS_COUNTER_TABLE)
        + ",'MaxQueueItemAge','MaxQueueItemAge']")
    dim_rows = ",".join(
        f"('{o}','{c}','{m}',"
        + (f"'{a}'" if a else NS) + f",'{r}')"
        for o, c, m, a, r in IIS_COUNTER_TABLE)
    return f"""
WITH a AS (
  SELECT event_id - event_id % 16 AS ts, user_id AS u, event_id AS e,
         CAST(event_id % {n + 2} AS INT) AS idx
  FROM events
), rows0 AS (
  SELECT ts, u, e, idx,
         {obj_arr}[idx + 1] AS obj, {ctr_arr}[idx + 1] AS ctr,
         CASE WHEN idx = {n + 1} THEN '_Total'
              WHEN u % 11 = 0 THEN ''
              ELSE 'i' || CAST(u % 3 AS VARCHAR) END AS inst,
         CAST(e % 100000 AS DOUBLE) / 16 AS val,
         CASE WHEN e % 19 = 0 THEN
           CASE WHEN e % 38 = 0 THEN 'negdenom' ELSE 'boom' END
         END AS err
  FROM a
), dim AS (
  SELECT * FROM (VALUES {dim_rows}) AS d(obj, ctr, m, attr, res)
), reg AS (
  SELECT * FROM (
    SELECT r.*, COUNT(*) OVER (PARTITION BY ts, obj, ctr) AS cnt,
           MAX(CASE WHEN err IS NOT NULL THEN 1 ELSE 0 END)
             OVER (PARTITION BY ts, obj, ctr) AS failed
    FROM rows0 r WHERE idx < {n})
  WHERE failed = 0 AND NOT (cnt = 1 AND inst = '')
)
SELECT reg.ts, d.m AS iis_metric, d.attr AS iis_attr,
       CASE WHEN d.res = 'site' THEN inst END AS iis_site,
       CASE WHEN d.res = 'app_pool' THEN inst END AS iis_app_pool,
       CAST(TRUNC(val) AS BIGINT) AS iis_value
FROM reg JOIN dim d ON reg.obj = d.obj AND reg.ctr = d.ctr
UNION ALL
SELECT ts, 'iis.request.queue.age.max', {NS}, {NS}, inst,
       CAST(CASE WHEN err IS NOT NULL THEN 0 ELSE TRUNC(val) END
            AS BIGINT)
FROM rows0
WHERE idx = {n} AND inst <> '_Total'
  AND (err IS NULL OR err = 'negdenom')
"""


EXT18_QUERIES["iis_metrics"] = q_iis
EXT18_ORACLES["iis_metrics"] = _iis_oracle()


# ---------------------------------------------------------------------------
# oracledb receiver: v$ views -> metric rows
# ---------------------------------------------------------------------------


def q_oracledb(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.oracledb import ORACLE_STAT_TABLE, \
        oracledb_metrics

    ev = load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    s = lambda c: c.cast("string")  # noqa: E731
    names = ([n for n, _ in ORACLE_STAT_TABLE]
             + ["CPU used by this session", "weird stat"])
    kind = F.element_at(
        F.array(F.lit("stat"), F.lit("session"), F.lit("reslimit"),
                F.lit("tablespace")), (e % 4 + 1).cast("int"))
    resources = ["processes", "sessions", "enqueue_locks",
                 "dml_locks", "enqueue_resources", "transactions",
                 "ghost"]
    fx = ev.select(
        F.lit("ORCL").alias("instance"), (e - e % 32).alias("ts"),
        kind.alias("kind"),
        F.element_at(F.array(*[F.lit(n) for n in names]),
                     (e % 29 + 1).cast("int")).alias("name"),
        F.when(u % 13 == 0, F.lit("NaNx")).otherwise(s(e % 100000))
        .alias("value"),
        F.when(u % 2 == 0, F.lit("ACTIVE")).otherwise(F.lit("INACTIVE"))
        .alias("status"),
        F.when(e % 3 == 0, F.lit("BACKGROUND")).otherwise(F.lit("USER"))
        .alias("type"),
        F.element_at(F.array(*[F.lit(r) for r in resources]),
                     (e % 7 + 1).cast("int")).alias("resource_name"),
        F.when(e % 29 == 0, F.lit("junk")).otherwise(s(e % 500))
        .alias("current_utilization"),
        F.when(u % 5 == 0, F.lit(" UNLIMITED "))
        .otherwise(s(100 + e % 900)).alias("limit_value"),
        F.concat(F.lit("TS"), s(e % 4)).alias("tablespace_name"),
        F.when(e % 31 == 0, F.lit("bad")).otherwise(s(e % 10000))
        .alias("used_space"),
        F.when(u % 7 == 0, F.lit(""))
        .when(u % 23 == 0, F.lit("nope"))
        .otherwise(s(u % 20000)).alias("tablespace_size"),
        s(F.lit(8192)).alias("block_size"),
    )
    return oracledb_metrics(fx)


def _oracledb_oracle() -> str:
    from ..operators.oracledb import ORACLE_RESOURCE_TABLE, \
        ORACLE_STAT_TABLE
    NS = "CAST(NULL AS VARCHAR)"
    NI = "CAST(NULL AS BIGINT)"
    ND = "CAST(NULL AS DOUBLE)"
    stat_dim = ",".join(f"({i},'{m}')"
                        for i, (_, m) in enumerate(ORACLE_STAT_TABLE))
    res_parts = []
    for i, (name, usage_m, limit_m) in \
            enumerate(ORACLE_RESOURCE_TABLE):
        if usage_m:
            res_parts.append(
                f"SELECT instance, ts, '{usage_m}', {NS}, {NS}, {NS},"
                f" CAST(e % 500 AS BIGINT), {ND} FROM a WHERE "
                f"e % 4 = 2 AND e % 7 = {i} AND e % 29 <> 0")
        res_parts.append(
            f"SELECT instance, ts, '{limit_m}', {NS}, {NS}, {NS}, "
            f"CAST(CASE WHEN u % 5 = 0 THEN -1 ELSE 100 + e % 900 END"
            f" AS BIGINT), {ND} FROM a WHERE e % 4 = 2 AND "
            f"e % 7 = {i}")
    res_sql = "\nUNION ALL\n".join(res_parts)
    return f"""
WITH a AS (
  SELECT 'ORCL' AS instance, event_id - event_id % 32 AS ts,
         user_id AS u, event_id AS e
  FROM events
), sdim AS (SELECT * FROM (VALUES {stat_dim}) AS d(idx, m))
SELECT instance AS instance, ts AS ts, m AS odb_metric,
       {NS} AS odb_type, {NS} AS odb_status,
       {NS} AS odb_tablespace,
       CAST(e % 100000 AS BIGINT) AS odb_value,
       {ND} AS odb_value_d
FROM a JOIN sdim ON e % 29 = sdim.idx
WHERE e % 4 = 0 AND u % 13 <> 0
UNION ALL
SELECT instance, ts, 'oracledb.cpu_time', {NS}, {NS}, {NS}, {NI},
       CAST(e % 100000 AS DOUBLE) / 100
FROM a WHERE e % 4 = 0 AND e % 29 = {len(ORACLE_STAT_TABLE)}
  AND u % 13 <> 0
UNION ALL
SELECT instance, ts, 'oracledb.sessions.usage',
       CASE WHEN e % 3 = 0 THEN 'BACKGROUND' ELSE 'USER' END,
       CASE WHEN u % 2 = 0 THEN 'ACTIVE' ELSE 'INACTIVE' END,
       {NS}, CAST(COUNT(*) AS BIGINT), {ND}
FROM a WHERE e % 4 = 1
GROUP BY instance, ts, 4, 5
UNION ALL
{res_sql}
UNION ALL
SELECT instance, ts, m, {NS}, {NS}, 'TS' || CAST(e % 4 AS VARCHAR),
       vi, {ND}
FROM a, LATERAL (VALUES
  ('oracledb.tablespace_size.usage',
   CAST((e % 10000) * 8192 AS BIGINT)),
  ('oracledb.tablespace_size.limit',
   CAST(CASE WHEN u % 7 = 0 THEN -1
             ELSE (u % 20000) * 8192 END AS BIGINT))) t(m, vi)
WHERE e % 4 = 3 AND e % 31 <> 0
  AND (u % 7 = 0 OR u % 23 <> 0)
"""


EXT18_QUERIES["oracledb_metrics"] = q_oracledb
EXT18_ORACLES["oracledb_metrics"] = _oracledb_oracle()


# ---------------------------------------------------------------------------
# saphana receiver: M_* view snapshots -> monitoring aggregations
# ---------------------------------------------------------------------------

_SA_NOW = 1000000


def q_saphana(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.saphana import saphana_monitoring

    ev = load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    inst = F.lit("HDB").alias("instance")
    host = F.concat(F.lit("hn"), (u % 2).cast("string")).alias("host")

    def part(k):
        return ev.where(e % 19 == k)

    views = {}
    views["m_services"] = part(0).select(
        inst, host, F.when(u % 3 == 0, F.lit("YES"))
        .otherwise(F.lit("NO")).alias("active_status"))
    views["m_service_threads"] = part(1).select(
        inst, host, F.when(u % 2 == 0, F.lit("TRUE"))
        .otherwise(F.lit("FALSE")).alias("is_active"))
    views["m_cs_all_columns"] = part(2).select(
        inst, host,
        *[((e * (i + 2)) % 100000).alias(f"{t}_memory_size_in_{s}")
          for i, (t, s) in enumerate(
              (t, s) for t in ("main", "delta")
              for s in ("data", "dict", "index", "misc"))])
    views["m_rs_tables"] = part(3).select(
        inst, host, (e % 1000).alias("used_fixed_part_size"),
        (u % 1000).alias("used_variable_part_size"))
    views["m_service_component_memory"] = part(4).select(
        inst, host,
        F.concat(F.lit("cp"), (e % 3).cast("string")).alias("component"),
        (u % 5000).alias("used_memory_size"))
    views["m_connections"] = part(5).select(
        inst, host,
        F.element_at(F.array(F.lit("RUNNING"), F.lit("IDLE"),
                             F.lit(""), F.lit("QUEUING")),
                     (e % 4 + 1).cast("int")).alias("connection_status"))
    views["m_backup_catalog"] = part(6).select(
        inst, F.when(e % 3 == 0, F.lit("successful"))
        .otherwise(F.lit("failed")).alias("state_name"),
        e.alias("utc_start_time"))
    views["m_database"] = part(7).select(
        inst, host, F.lit("SYS").alias("system_id"),
        F.concat(F.lit("D"), (u % 2).cast("string"))
        .alias("database_name"),
        (e % 5000).alias("start_time"))
    views["statistics_current_alerts"] = part(8).select(
        inst, (e % 5 + 1).cast("string").alias("alert_rating"))
    views["m_workload"] = part(9).select(
        inst, host, (e % 100).alias("update_transaction_count"),
        (u % 100).alias("commit_count"), (e % 10).alias("rollback_count"))
    views["m_blocked_transactions"] = part(10).select(inst, host)
    views["m_disks"] = part(11).select(
        inst, host,
        F.concat(F.lit("/hana/"), (e % 2).cast("string")).alias("path"),
        F.when(u % 2 == 0, F.lit("DATA")).otherwise(F.lit("LOG"))
        .alias("usage_type"),
        (1000 + e % 1000).alias("total_size"), (e % 800).alias("used_size"))
    views["m_licenses"] = part(12).select(
        inst, F.lit("SYS").alias("system_id"),
        F.concat(F.lit("P"), (e % 2).cast("string"))
        .alias("product_name"),
        (100 + u % 100).alias("product_limit"),
        (e % 100).alias("product_usage"),
        (500000 + e % 100000).alias("expiration_date"))
    views["m_service_replication"] = part(13).select(
        inst, host,
        F.concat(F.lit("sec"), (u % 2).cast("string"))
        .alias("secondary_host"),
        (30000 + e % 3).cast("string").alias("port"),
        F.lit("SYNC").alias("replication_mode"),
        (e % 70000).alias("backlog_size"), (u % 900).alias("backlog_time"),
        F.when(e % 5 == 0, F.lit(0)).otherwise(e % 20 + 1)
        .alias("shipped_log_buffers_count"),
        (F.when(e % 5 == 0, F.lit(0)).otherwise(e % 20 + 1)
         * (u % 50)).alias("shipped_log_buffers_duration"))
    views["m_service_statistics"] = part(14).select(
        inst, host,
        F.when(u % 7 == 0, F.lit(-2)).otherwise(e % 50)
        .alias("active_request_count"),
        (100 + e % 200).alias("all_finished_request_count"),
        (e % 100).alias("finished_non_internal_request_count"),
        (u % 30).alias("pending_request_count"),
        (e % 400).alias("response_time"))
    views["m_volume_io_total_statistics"] = part(15).select(
        inst, host,
        F.concat(F.lit("/vol/"), (e % 2).cast("string")).alias("path"),
        F.when(u % 2 == 0, F.lit("DATA")).otherwise(F.lit("LOG"))
        .alias("type"),
        (e % 5000).alias("total_reads"), (u % 5000).alias("total_writes"),
        (e % 90000).alias("total_read_size"),
        (u % 90000).alias("total_write_size"),
        (e % 7000).alias("total_read_time"),
        (u % 7000).alias("total_write_time"))
    views["m_service_memory"] = part(16).select(
        inst, host,
        F.concat(F.lit("svc"), (e % 3).cast("string"))
        .alias("service_name"),
        (e % 100000).alias("logical_memory_size"),
        (u % 100000).alias("physical_memory_size"),
        (e % 3000).alias("code_size"), (u % 2000).alias("stack_size"),
        (5000 + e % 5000).alias("heap_memory_allocated_size"),
        (e % 5000).alias("heap_memory_used_size"),
        (4000 + u % 4000).alias("shared_memory_allocated_size"),
        (u % 4000).alias("shared_memory_used_size"),
        (e % 600).alias("compactors_allocated_size"),
        (u % 500).alias("compactors_freeable_size"),
        (e % 900000).alias("allocation_limit"),
        (u % 800000).alias("effective_allocation_limit"))
    views["m_cs_tables"] = part(17).select(
        inst, host,
        F.concat(F.lit("sc"), (u % 2).cast("string")).alias("schema_name"),
        (e % 70000).alias("estimated_max_memory_size_in_total"),
        (u % 8000).alias("last_compressed_record_count"),
        (e % 9000).alias("read_count"), (u % 9000).alias("write_count"),
        (e % 400).alias("merge_count"),
        (e % 50000).alias("memory_size_in_main"),
        (u % 40000).alias("memory_size_in_delta"),
        (e % 3000).alias("memory_size_in_history_main"),
        (u % 3000).alias("memory_size_in_history_delta"),
        (e % 20000).alias("raw_record_count_in_main"),
        (u % 20000).alias("raw_record_count_in_delta"),
        (e % 1000).alias("raw_record_count_in_history_main"),
        (u % 1000).alias("raw_record_count_in_history_delta"))
    views["m_host_resource_utilization"] = part(18).select(
        inst, host,
        (e % 100000).alias("free_physical_memory"),
        (u % 100000).alias("used_physical_memory"),
        (e % 30000).alias("free_swap_space"),
        (u % 30000).alias("used_swap_space"),
        (e % 900000).alias("instance_total_memory_used_size"),
        (e % 950000).alias("instance_total_memory_peak_used_size"),
        (1000000 + e % 500000)
        .alias("instance_total_memory_allocated_size"),
        (e % 4000).alias("instance_code_size"),
        (u % 6000).alias("instance_shared_memory_allocated_size"),
        (e % 80000).alias("total_cpu_user_time"),
        (u % 70000).alias("total_cpu_system_time"),
        (e % 60000).alias("total_cpu_wio_time"),
        (u % 50000).alias("total_cpu_idle_time"))
    return saphana_monitoring(views, _SA_NOW)


def _saphana_oracle() -> str:
    NS = "CAST(NULL AS VARCHAR)"
    NI = "CAST(NULL AS BIGINT)"
    ND = "CAST(NULL AS DOUBLE)"
    B = lambda x: f"CAST({x} AS BIGINT)"  # noqa: E731
    parts = []
    first = True

    def sel(host, metric, a1, a2, vi, vd, frm):
        nonlocal first
        a = (lambda n: f" AS {n}") if first else (lambda n: "")
        first = False
        return (f"SELECT 'HDB'{a('instance')}, {host}{a('host')}, "
                f"{metric}{a('sa_metric')}, {a1}{a('sa_a1')}, "
                f"{a2}{a('sa_a2')}, {vi}{a('sa_value')}, "
                f"{vd}{a('sa_value_d')} {frm}")

    H = "'hn' || CAST(u % 2 AS VARCHAR)"
    # services / threads
    parts.append(sel("host", "m", "a1", NS, "v", ND, f"""FROM (
      SELECT {H} AS host,
        SUM(CASE WHEN u % 3 = 0 THEN 1 ELSE 0 END) AS act,
        SUM(CASE WHEN u % 3 = 0 THEN 0 ELSE 1 END) AS inact
      FROM a WHERE e % 19 = 0 GROUP BY host
    ), LATERAL (VALUES ('saphana.service.count', 'active', act),
      ('saphana.service.count', 'inactive', inact)) t(m, a1, v)"""))
    parts.append(sel("host", "m", "a1", NS, "v", ND, f"""FROM (
      SELECT {H} AS host,
        SUM(CASE WHEN u % 2 = 0 THEN 1 ELSE 0 END) AS act,
        SUM(CASE WHEN u % 2 = 0 THEN 0 ELSE 1 END) AS inact
      FROM a WHERE e % 19 = 1 GROUP BY host
    ), LATERAL (VALUES ('saphana.service.thread.count', 'active', act),
      ('saphana.service.thread.count', 'inactive', inact)) t(m, a1, v)"""))
    # cs_all_columns: 8 sums, multipliers i+2 in (t,s) order
    combos = [(t, s, i) for i, (t, s) in enumerate(
        (t, s) for t in ("main", "delta")
        for s in ("data", "dict", "index", "misc"))]
    vals = ", ".join(f"('{t}', '{s}', s{i})" for t, s, i in combos)
    sums = ", ".join(f"SUM((e * {i + 2}) % 100000) AS s{i}"
                     for _, _, i in combos)
    parts.append(sel("host", "'saphana.column.memory.used'", "a1",
                     "a2", "v", ND, f"""FROM (
      SELECT {H} AS host, {sums} FROM a WHERE e % 19 = 2
      GROUP BY host), LATERAL (VALUES {vals}) t(a1, a2, v)"""))
    parts.append(sel("host", "'saphana.row_store.memory.used'", "a1",
                     NS, "v", ND, f"""FROM (
      SELECT {H} AS host, SUM(e % 1000) AS f, SUM(u % 1000) AS vr
      FROM a WHERE e % 19 = 3 GROUP BY host
    ), LATERAL (VALUES ('fixed', f), ('variable', vr)) t(a1, v)"""))
    parts.append(sel("host", "'saphana.component.memory.used'",
                     "comp", NS, B("SUM(u % 5000)"), ND,
                     f"""FROM (SELECT {H} AS host,
      'cp' || CAST(e % 3 AS VARCHAR) AS comp, u
      FROM a WHERE e % 19 = 4) GROUP BY host, comp"""))
    parts.append(sel("host", "'saphana.connection.count'",
                     "LOWER(cs)", NS, B("COUNT(*)"), ND,
                     f"""FROM (SELECT {H} AS host,
      ['RUNNING','IDLE','','QUEUING'][CAST(e % 4 AS INT) + 1] AS cs
      FROM a WHERE e % 19 = 5) WHERE cs <> ''
      GROUP BY host, LOWER(cs)"""))
    parts.append(sel(NS, "'saphana.backup.latest'", NS, NS,
                     B(f"MAX(e) - {_SA_NOW}"), ND,
                     "FROM a WHERE e % 19 = 6 AND e % 3 = 0"))
    parts.append(sel("host", "'saphana.uptime'", "'SYS'",
                     "'D' || CAST(u % 2 AS VARCHAR)",
                     B(f"{_SA_NOW} - e % 5000"), ND,
                     f"FROM (SELECT {H} AS host, u, e FROM a WHERE "
                     "e % 19 = 7)"))
    parts.append(sel(NS, "'saphana.alert.count'",
                     "CAST(e % 5 + 1 AS VARCHAR)", NS,
                     B("COUNT(*)"), ND,
                     "FROM a WHERE e % 19 = 8 "
                     "GROUP BY CAST(e % 5 + 1 AS VARCHAR)"))
    parts.append(sel("host", "'saphana.transaction.count'", "a1", NS,
                     "v", ND, f"""FROM (
      SELECT {H} AS host, SUM(e % 100) AS up, SUM(u % 100) AS cm,
             SUM(e % 10) AS rb
      FROM a WHERE e % 19 = 9 GROUP BY host
    ), LATERAL (VALUES ('update', up), ('commit', cm),
      ('rollback', rb)) t(a1, v)"""))
    parts.append(sel("host", "'saphana.transaction.blocked'", NS, NS,
                     B("COUNT(*)"), ND,
                     f"FROM (SELECT {H} AS host FROM a WHERE "
                     "e % 19 = 10) GROUP BY host"))
    parts.append(sel("host", "'saphana.disk.size.current'", "a1",
                     "a2", "v", ND, f"""FROM (
      SELECT {H} AS host,
        '/hana/' || CAST(e % 2 AS VARCHAR) || '|' ||
          CASE WHEN u % 2 = 0 THEN 'DATA' ELSE 'LOG' END AS a1,
        1000 + e % 1000 AS tot, e % 800 AS us
      FROM a WHERE e % 19 = 11
    ), LATERAL (VALUES ('free', tot - us), ('used', us)) t(a2, v)"""))
    parts.append(sel(NS, "m", "'SYS|P' || CAST(e % 2 AS VARCHAR)",
                     NS, "v", ND, f"""FROM (
      SELECT u, e FROM a WHERE e % 19 = 12
    ), LATERAL (VALUES
      ('saphana.license.limit', CAST(100 + u % 100 AS BIGINT)),
      ('saphana.license.peak', CAST(e % 100 AS BIGINT)),
      ('saphana.license.expiration.time',
       CAST(500000 + e % 100000 - {_SA_NOW} AS BIGINT))) t(m, v)"""))
    parts.append(sel("host", "m", "a1", NS, "vi", "vd", f"""FROM (
      SELECT {H} AS host,
        {H} || '|sec' || CAST(u % 2 AS VARCHAR) || '|' ||
          CAST(30000 + e % 3 AS VARCHAR) || '|SYNC' AS a1,
        e % 70000 AS bs, u % 900 AS bt,
        CASE WHEN e % 5 = 0 THEN 0.0
             ELSE CAST(u % 50 AS DOUBLE) END AS avgt
      FROM a WHERE e % 19 = 13
    ), LATERAL (VALUES
      ('saphana.replication.backlog.size', a1, CAST(bs AS BIGINT), {ND}),
      ('saphana.replication.backlog.time', a1, CAST(bt AS BIGINT), {ND}),
      ('saphana.replication.average_time', a1, {NI}, avgt)
    ) t(m, a1x, vi, vd)"""))
    parts.append(sel("host", "m", "a1", NS, "vi", "vd", f"""FROM (
      SELECT {H} AS host,
        SUM(e % 100) AS ext,
        SUM(100 + e % 200 - e % 100) AS intn,
        SUM(e % 50) AS act, SUM(u % 30) AS pen,
        ROUND(AVG(CAST(e % 400 AS DOUBLE)), 2) AS avgt
      FROM a WHERE e % 19 = 14 AND u % 7 <> 0 GROUP BY host
    ), LATERAL (VALUES
      ('saphana.network.request.finished.count', 'external',
       CAST(ext AS BIGINT), {ND}),
      ('saphana.network.request.finished.count', 'internal',
       CAST(intn AS BIGINT), {ND}),
      ('saphana.network.request.count', 'active',
       CAST(act AS BIGINT), {ND}),
      ('saphana.network.request.count', 'pending',
       CAST(pen AS BIGINT), {ND}),
      ('saphana.network.request.average_time', {NS}, {NI}, avgt)
    ) t(m, a1, vi, vd)"""))
    parts.append(sel("host", "m", "a1", "a2", "v", ND, f"""FROM (
      SELECT {H} AS host,
        '/vol/' || CAST(e % 2 AS VARCHAR) || '|' ||
          CASE WHEN u % 2 = 0 THEN 'DATA' ELSE 'LOG' END AS a1,
        SUM(e % 5000) AS r, SUM(u % 5000) AS w,
        SUM(e % 90000) AS rs, SUM(u % 90000) AS ws,
        SUM(e % 7000) AS rt, SUM(u % 7000) AS wt
      FROM a WHERE e % 19 = 15 GROUP BY host, a1
    ), LATERAL (VALUES
      ('saphana.volume.operation.count', 'read', r),
      ('saphana.volume.operation.count', 'write', w),
      ('saphana.volume.operation.size', 'read', rs),
      ('saphana.volume.operation.size', 'write', ws),
      ('saphana.volume.operation.time', 'read', rt),
      ('saphana.volume.operation.time', 'write', wt)) t(m, a2, v)"""))
    svc_vals = """
      ('saphana.service.memory.used', 'logical', e % 100000),
      ('saphana.service.memory.used', 'physical', u % 100000),
      ('saphana.service.code_size', NULL, e % 3000),
      ('saphana.service.stack_size', NULL, u % 2000),
      ('saphana.service.memory.heap.current', 'free', 5000),
      ('saphana.service.memory.heap.current', 'used', e % 5000),
      ('saphana.service.memory.shared.current', 'free', 4000),
      ('saphana.service.memory.shared.current', 'used', u % 4000),
      ('saphana.service.memory.compactors.allocated', NULL, e % 600),
      ('saphana.service.memory.compactors.freeable', NULL, u % 500),
      ('saphana.service.memory.limit', NULL, e % 900000),
      ('saphana.service.memory.effective_limit', NULL, u % 800000)"""
    parts.append(sel("host", "m",
                     "'svc' || CAST(e % 3 AS VARCHAR)", "a2", "v",
                     ND, f"""FROM (
      SELECT {H} AS host, u, e FROM a WHERE e % 19 = 16
    ), LATERAL (VALUES {svc_vals}) t(m, a2, v)"""))
    cst_vals = """
      ('saphana.schema.memory.used.max', NULL, em),
      ('saphana.schema.record.compressed.count', NULL, lc),
      ('saphana.schema.operation.count', 'read', rd),
      ('saphana.schema.operation.count', 'write', wr),
      ('saphana.schema.operation.count', 'merge', mg),
      ('saphana.schema.memory.used.current', 'main', mm),
      ('saphana.schema.memory.used.current', 'delta', md),
      ('saphana.schema.memory.used.current', 'history_main', mhm),
      ('saphana.schema.memory.used.current', 'history_delta', mhd),
      ('saphana.schema.record.count', 'main', rm),
      ('saphana.schema.record.count', 'delta', rdl),
      ('saphana.schema.record.count', 'history_main', rhm),
      ('saphana.schema.record.count', 'history_delta', rhd)"""
    parts.append(sel("host", "m", "sch", "a2", "v", ND, f"""FROM (
      SELECT {H} AS host, 'sc' || CAST(u % 2 AS VARCHAR) AS sch,
        SUM(e % 70000) AS em, SUM(u % 8000) AS lc,
        SUM(e % 9000) AS rd, SUM(u % 9000) AS wr, SUM(e % 400) AS mg,
        SUM(e % 50000) AS mm, SUM(u % 40000) AS md,
        SUM(e % 3000) AS mhm, SUM(u % 3000) AS mhd,
        SUM(e % 20000) AS rm, SUM(u % 20000) AS rdl,
        SUM(e % 1000) AS rhm, SUM(u % 1000) AS rhd
      FROM a WHERE e % 19 = 17 GROUP BY host, sch
    ), LATERAL (VALUES {cst_vals}) t(m, a2, v)"""))
    hr_vals = f"""
      ('saphana.host.memory.current', 'free', e % 100000),
      ('saphana.host.memory.current', 'used', u % 100000),
      ('saphana.host.swap.current', 'free', e % 30000),
      ('saphana.host.swap.current', 'used', u % 30000),
      ('saphana.instance.memory.current', 'used', e % 900000),
      ('saphana.instance.memory.used.peak', NULL, e % 950000),
      ('saphana.instance.memory.current', 'free',
       1000000 + e % 500000 - e % 900000),
      ('saphana.instance.code_size', NULL, e % 4000),
      ('saphana.instance.memory.shared.allocated', NULL, u % 6000),
      ('saphana.cpu.used', 'user', e % 80000),
      ('saphana.cpu.used', 'system', u % 70000),
      ('saphana.cpu.used', 'io_wait', e % 60000),
      ('saphana.cpu.used', 'idle', u % 50000)"""
    parts.append(sel("host", "m", "a1", NS, "v", ND, f"""FROM (
      SELECT {H} AS host, u, e FROM a WHERE e % 19 = 18
    ), LATERAL (VALUES {hr_vals}) t(m, a1, v)"""))

    body = "\nUNION ALL\n".join(parts)
    return ("WITH a AS (SELECT user_id AS u, event_id AS e FROM "
            "events)\n" + body)


EXT18_QUERIES["saphana_monitoring"] = q_saphana
EXT18_ORACLES["saphana_monitoring"] = _saphana_oracle()


# ---------------------------------------------------------------------------
# splunkenterprise receiver: SPL searches as Spark aggregations
# ---------------------------------------------------------------------------


def q_splunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.splunk import splunk_spl_metrics

    ev = load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    host = F.concat(F.lit("sp"), (u % 3).cast("string")).alias("host")

    license_usage = ev.where(e % 5 == 0).select(
        F.when(u % 7 == 0, F.lit(None).cast("string"))
        .when(u % 7 == 1, F.lit(""))
        .otherwise(F.concat(F.lit("ix"), (u % 4).cast("string")))
        .alias("idx"),
        (e % 100000).alias("b"))
    scheduler = ev.where(e % 5 == 1).select(
        host,
        F.element_at(F.array(
            F.lit("completed"), F.lit("skipped"), F.lit("deferred"),
            F.lit("success"), F.lit("running")),
            (u % 5 + 1).cast("int")).alias("status"),
        (1000 + e % 500).cast("double").alias("dispatch_time"),
        (900 + e % 400).cast("double").alias("scheduled_time"),
        F.when(u % 3 == 0, F.lit(None).cast("double"))
        .otherwise((u % 50).cast("double")).alias("window_time"),
        (e % 300).cast("double").alias("run_time"))
    indexerpipe = ev.where(e % 5 == 2).select(
        host, ((e % 6400).cast("double") / 64)
        .alias("write_cpu_seconds"),
        ((u % 3200).cast("double") / 32).alias("service_cpu_seconds"))
    iostats = ev.where(e % 5 == 3).select(
        host, (e % 200).alias("reads_ps"), (u % 200).alias("writes_ps"),
        (1 + e % 4).alias("interval"))
    throughput = ev.where(e % 5 == 4).select(
        F.when(u % 9 == 0, F.lit("blocked")).otherwise(F.lit("normal"))
        .alias("status"),
        ((e % 12800).cast("double") / 128).alias("average_kbps"))
    return splunk_spl_metrics(license_usage, scheduler, indexerpipe,
                              iostats, throughput, build="B1",
                              version="9.0")


O_SPLUNK = """
WITH a AS (
  SELECT 'sp' || CAST(user_id % 3 AS VARCHAR) AS host,
         user_id AS u, event_id AS e
  FROM events
), NB AS (SELECT 'B1' AS b, '9.0' AS v)
SELECT 'splunk.license.index.usage' AS sp_metric,
       indexname AS sp_attr,
       CAST(ROUND(SUM(b), 9) AS BIGINT) AS sp_value,
       CAST(NULL AS DOUBLE) AS sp_value_d,
       'B1' AS sp_build, '9.0' AS sp_version
FROM (
  SELECT CASE WHEN u % 7 IN (0, 1) THEN '(UNKNOWN)'
              ELSE 'ix' || CAST(u % 4 AS VARCHAR) END AS indexname,
         e % 100000 AS b
  FROM a WHERE e % 5 = 0)
GROUP BY indexname
UNION ALL
SELECT 'splunk.scheduler.avg.execution.latency', host, NULL,
       ROUND(AVG(GREATEST(0.0,
         CAST(1000 + e % 500 AS DOUBLE)
         - (900 + e % 400
            + CASE WHEN u % 3 = 0 THEN 0 ELSE u % 50 END))), 2),
       'B1', '9.0'
FROM a WHERE e % 5 = 1 AND u % 5 < 4 GROUP BY host
UNION ALL
SELECT 'splunk.scheduler.completion.ratio', host, NULL,
       ROUND((1 - CAST(SUM(CASE WHEN u % 5 = 1 THEN 1 ELSE 0 END)
                       AS DOUBLE)
                / SUM(CASE WHEN u % 5 IN (0, 1, 3) THEN 1 ELSE 0 END))
             * 100, 2),
       'B1', '9.0'
FROM a WHERE e % 5 = 1 AND u % 5 < 4 GROUP BY host
UNION ALL
SELECT 'splunk.scheduler.avg.run.time', host, NULL,
       ROUND(AVG(CAST(e % 300 AS DOUBLE)), 2), 'B1', '9.0'
FROM a WHERE e % 5 = 1 AND u % 5 < 4 GROUP BY host
UNION ALL
SELECT 'splunk.indexer.raw.write.time', host, NULL,
       SUM(CAST(e % 6400 AS DOUBLE) / 64), 'B1', '9.0'
FROM a WHERE e % 5 = 2 GROUP BY host
UNION ALL
SELECT 'splunk.indexer.cpu.time', host, NULL,
       SUM(CAST(u % 3200 AS DOUBLE) / 32), 'B1', '9.0'
FROM a WHERE e % 5 = 2 GROUP BY host
UNION ALL
SELECT 'splunk.io.avg.iops', host,
       CAST(ROUND(AVG(CAST((1 + e % 4) * (e % 200 + u % 200)
                           AS DOUBLE))) AS BIGINT),
       NULL, 'B1', '9.0'
FROM a WHERE e % 5 = 3 GROUP BY host
UNION ALL
SELECT 'splunk.indexer.throughput',
       CASE WHEN u % 9 = 0 THEN 'blocked' ELSE 'normal' END,
       NULL, CAST(e % 12800 AS DOUBLE) / 128 * 1000, 'B1', '9.0'
FROM a WHERE e % 5 = 4
"""

EXT18_QUERIES["splunk_spl_metrics"] = q_splunk
EXT18_ORACLES["splunk_spl_metrics"] = O_SPLUNK


# ---------------------------------------------------------------------------
# prometheus initial-point adjuster: reset segments as windows
# ---------------------------------------------------------------------------


def q_prom_adjust_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.prom_adjuster import prom_adjust_start_times

    ev = load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    fx = ev.select(
        F.concat(F.lit("job"), (u % 2).cast("string")).alias("job"),
        F.concat(F.lit("s"), (u % 5).cast("string")).alias("series"),
        e.alias("ts"), (e - e % 100).alias("start_ts"),
        (e % 13 == 0).alias("stale"),
        (e % 97).cast("double").alias("value"),
    )
    out = prom_adjust_start_times(fx, ["job", "series"], family="sum")
    return out.select("job", "series", "ts", "start_ts", "stale",
                      "value", "start_adjusted")


O_PROM_ADJ_SUM = """
WITH fx AS (
  SELECT 'job' || CAST(user_id % 2 AS VARCHAR) AS job,
         's' || CAST(user_id % 5 AS VARCHAR) AS series,
         event_id AS ts, event_id - event_id % 100 AS start_ts,
         event_id % 13 = 0 AS stale,
         CAST(event_id % 97 AS DOUBLE) AS value
  FROM events
), st1 AS (
  SELECT *, ROW_NUMBER() OVER w = 1 AS first,
         CASE WHEN ROW_NUMBER() OVER w = 1 OR NOT stale
              THEN value END AS cv
  FROM fx WINDOW w AS (PARTITION BY job, series ORDER BY ts)
), st2 AS (
  SELECT *, LAST_VALUE(cv IGNORE NULLS) OVER
    (PARTITION BY job, series ORDER BY ts
     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv
  FROM st1
), st3 AS (
  SELECT *, first OR (NOT stale AND NOT first
                      AND COALESCE(value < pv, FALSE)) AS b
  FROM st2
), st4 AS (
  SELECT *, SUM(CASE WHEN b THEN 1 ELSE 0 END) OVER
    (PARTITION BY job, series ORDER BY ts
     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seg
  FROM st3
)
SELECT job, series, ts, start_ts, stale, value,
       FIRST_VALUE(start_ts) OVER
         (PARTITION BY job, series, seg ORDER BY ts) AS start_adjusted
FROM st4
"""

EXT18_QUERIES["prom_adjust_sum"] = q_prom_adjust_sum
EXT18_ORACLES["prom_adjust_sum"] = O_PROM_ADJ_SUM


def q_prom_adjust_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.prom_adjuster import prom_adjust_start_times

    ev = load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    fx = ev.select(
        F.lit("j").alias("job"),
        F.concat(F.lit("s"), (u % 4).cast("string")).alias("series"),
        e.alias("ts"), (e - e % 200).alias("start_ts"),
        (e % 19 == 0).alias("stale"),
        F.when(e % 11 == 0, F.lit(0)).otherwise(e % 50)
        .cast("bigint").alias("count"),
        F.when(e % 17 == 0, F.lit(0.0))
        .otherwise((e % 900).cast("double") / 8).alias("sum"),
    )
    out = prom_adjust_start_times(fx, ["job", "series"],
                                  family="summary")
    return out.select("job", "series", "ts", "start_ts", "stale",
                      "count", "sum", "start_adjusted")


O_PROM_ADJ_SUMMARY = """
WITH fx AS (
  SELECT 'j' AS job, 's' || CAST(user_id % 4 AS VARCHAR) AS series,
         event_id AS ts, event_id - event_id % 200 AS start_ts,
         event_id % 19 = 0 AS stale,
         CAST(CASE WHEN event_id % 11 = 0 THEN 0
                   ELSE event_id % 50 END AS BIGINT) AS count,
         CASE WHEN event_id % 17 = 0 THEN 0.0
              ELSE CAST(event_id % 900 AS DOUBLE) / 8 END AS sum
  FROM events
), st1 AS (
  SELECT *, ROW_NUMBER() OVER w = 1 AS first,
         CASE WHEN ROW_NUMBER() OVER w = 1 OR NOT stale
              THEN count END AS cc,
         CASE WHEN ROW_NUMBER() OVER w = 1 OR NOT stale
              THEN sum END AS cs
  FROM fx WINDOW w AS (PARTITION BY job, series ORDER BY ts)
), st2 AS (
  SELECT *,
    LAST_VALUE(cc IGNORE NULLS) OVER wp AS pc,
    LAST_VALUE(cs IGNORE NULLS) OVER wp AS ps
  FROM st1 WINDOW wp AS (PARTITION BY job, series ORDER BY ts
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
), st3 AS (
  SELECT *, first OR (NOT stale AND NOT first AND COALESCE(
      (count <> 0 AND pc <> 0 AND count < pc)
      OR (sum <> 0 AND ps <> 0 AND sum < ps), FALSE)) AS b
  FROM st2
), st4 AS (
  SELECT *, SUM(CASE WHEN b THEN 1 ELSE 0 END) OVER
    (PARTITION BY job, series ORDER BY ts
     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seg
  FROM st3
)
SELECT job, series, ts, start_ts, stale, count, sum,
       FIRST_VALUE(start_ts) OVER
         (PARTITION BY job, series, seg ORDER BY ts) AS start_adjusted
FROM st4
"""

EXT18_QUERIES["prom_adjust_summary"] = q_prom_adjust_summary
EXT18_ORACLES["prom_adjust_summary"] = O_PROM_ADJ_SUMMARY

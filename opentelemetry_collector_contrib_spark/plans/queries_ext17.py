"""Round-5 queries (cont.): hostmetrics scraper family.

Each fixture synthesises gopsutil-shaped samples from the events
table with exact binary-fraction arithmetic (powers of two only) so
the DuckDB oracle replays the identical IEEE math. The cpu fixture
deliberately quantises the cumulative counters to 16-event blocks so
consecutive samples of one cpu can land in the same block — elapsed
== 0 — exercising the calculator's all-zero branch
(``ucal/cpu_utilization_calculator.go:57-59``); the filesystem
fixture pins one host so duplicate (device, mountpoint) pairs occur
within a scrape and the first-wins dedup (and its empty-mountpoint
exemption) is observable.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import QueryFn, load

EXT17_QUERIES: dict[str, QueryFn] = {}
EXT17_ORACLES: dict[str, str] = {}


# ---------------------------------------------------------------------------
# cpu scraper: cumulative state seconds + delta utilization
# ---------------------------------------------------------------------------

_CPU_COLS = [  # (column, divisor) — cumulative seconds = eb/div + u%13*3/4
    ("user", 2), ("system", 4), ("idle", 1), ("nice", 8),
    ("iowait", 16), ("irq", 32), ("softirq", 64), ("steal", 128),
    ("guest", 256), ("guest_nice", 512),
]


def q_host_cpu(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.hostmetrics import host_cpu_metrics

    ev = load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    eb = (e - e % 16).cast("double")
    fx = ev.select(
        F.concat(F.lit("h"), (u % 3).cast("string")).alias("host"),
        F.concat(F.lit("cpu"), (u % 4).cast("string")).alias("cpu"),
        e.alias("ts"),
        *[(eb / d + (u % 13).cast("double") * 3 / 4).alias(c)
          for c, d in _CPU_COLS],
    )
    return host_cpu_metrics(fx).select(
        "host", "cpu", "ts", "hm_metric", "hm_state", "hm_value_d")


O_HOST_CPU = """
WITH fx AS (
  SELECT 'h' || CAST(user_id % 3 AS VARCHAR) AS host,
         'cpu' || CAST(user_id % 4 AS VARCHAR) AS cpu,
         event_id AS ts,
         CAST(event_id - event_id % 16 AS DOUBLE) AS eb,
         CAST(user_id % 13 AS DOUBLE) * 3 / 4 AS uo
  FROM events
), s AS (
  SELECT host, cpu, ts,
         eb/2 + uo AS user_s,  eb/4 + uo AS system_s,
         eb/1 + uo AS idle_s,  eb/8 + uo AS nice_s,
         eb/16 + uo AS iowait_s, eb/32 + uo AS irq_s,
         eb/64 + uo AS softirq_s, eb/128 + uo AS steal_s,
         eb/256 + uo AS guest_s, eb/512 + uo AS guest_nice_s
  FROM fx
), lagged AS (
  SELECT *,
    user_s+system_s+idle_s+nice_s+iowait_s+irq_s+softirq_s+steal_s
      +guest_s+guest_nice_s AS total_s,
    LAG(user_s+system_s+idle_s+nice_s+iowait_s+irq_s+softirq_s
      +steal_s+guest_s+guest_nice_s)
      OVER (PARTITION BY host, cpu ORDER BY ts) AS p_total,
    LAG(user_s) OVER w AS p_user, LAG(system_s) OVER w AS p_system,
    LAG(idle_s) OVER w AS p_idle, LAG(nice_s) OVER w AS p_nice,
    LAG(iowait_s) OVER w AS p_iowait, LAG(irq_s) OVER w AS p_irq,
    LAG(softirq_s) OVER w AS p_softirq, LAG(steal_s) OVER w AS p_steal
  FROM s WINDOW w AS (PARTITION BY host, cpu ORDER BY ts)
), pairs AS (
  SELECT host, cpu, ts, st, cur, prev,
         total_s - p_total AS elapsed, p_total IS NOT NULL AS has_prev
  FROM lagged, LATERAL (VALUES
    ('user', user_s, p_user), ('system', system_s, p_system),
    ('idle', idle_s, p_idle), ('interrupt', irq_s, p_irq),
    ('nice', nice_s, p_nice), ('softirq', softirq_s, p_softirq),
    ('steal', steal_s, p_steal), ('wait', iowait_s, p_iowait)
  ) AS v(st, cur, prev)
)
SELECT host, cpu, ts, 'system.cpu.time' AS hm_metric, st AS hm_state,
       cur AS hm_value_d FROM pairs
UNION ALL
SELECT host, cpu, ts, 'system.cpu.utilization', st,
       CASE WHEN elapsed <= 0 THEN 0.0
            ELSE (cur - prev) / elapsed END
FROM pairs WHERE has_prev
"""

EXT17_QUERIES["host_cpu"] = q_host_cpu
EXT17_ORACLES["host_cpu"] = O_HOST_CPU


# ---------------------------------------------------------------------------
# memory scraper: usage/utilization/limit + linux extras
# ---------------------------------------------------------------------------


def q_host_memory(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.hostmetrics import host_memory_metrics

    ev = load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    fx = ev.select(
        F.concat(F.lit("h"), (u % 3).cast("string")).alias("host"),
        e.alias("ts"),
        F.when(e % 31 == 0, F.lit(0))
        .otherwise(4096 + (e % 5) * 1024).alias("total"),
        (e % 2048).alias("used"), (u % 1024).alias("free"),
        (e % 512).alias("buffers"), (u % 256).alias("cached"),
        (e % 128).alias("sreclaimable"), (u % 64).alias("sunreclaim"),
        (e % 4096).alias("available"), (u % 32).alias("dirty"),
        F.lit(4096).alias("page_size"),
    )
    return host_memory_metrics(fx).select(
        "host", "ts", "hm_metric", "hm_state", "hm_value", "hm_value_d")


O_HOST_MEMORY = """
WITH fx AS (
  SELECT 'h' || CAST(user_id % 3 AS VARCHAR) AS host,
         event_id AS ts,
         CASE WHEN event_id % 31 = 0 THEN 0
              ELSE 4096 + (event_id % 5) * 1024 END AS total,
         event_id % 2048 AS used, user_id % 1024 AS free,
         event_id % 512 AS buffers, user_id % 256 AS cached,
         event_id % 128 AS sreclaimable, user_id % 64 AS sunreclaim,
         event_id % 4096 AS available, user_id % 32 AS dirty,
         4096 AS page_size
  FROM events
), v AS (SELECT * FROM fx WHERE total > 0),
st AS (
  SELECT host, ts, s, val, total FROM v, LATERAL (VALUES
    ('used', used), ('free', free), ('buffered', buffers),
    ('cached', cached), ('slab_reclaimable', sreclaimable),
    ('slab_unreclaimable', sunreclaim)) AS t(s, val)
)
SELECT host, ts, 'system.memory.usage' AS hm_metric, s AS hm_state,
       CAST(val AS BIGINT) AS hm_value, CAST(NULL AS DOUBLE) AS hm_value_d
FROM st
UNION ALL
SELECT host, ts, 'system.memory.utilization', s, NULL,
       CAST(val AS DOUBLE) / total FROM st
UNION ALL
SELECT host, ts, m, NULL, val, NULL FROM v, LATERAL (VALUES
  ('system.memory.limit', total),
  ('system.linux.memory.available', available),
  ('system.linux.memory.dirty', dirty),
  ('system.memory.page_size', page_size)) AS t(m, val)
"""

EXT17_QUERIES["host_memory"] = q_host_memory
EXT17_ORACLES["host_memory"] = O_HOST_MEMORY


# ---------------------------------------------------------------------------
# load + uptime scraper (cpu_average division exercised)
# ---------------------------------------------------------------------------


def q_host_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.hostmetrics import host_load_metrics

    ev = load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    fx = ev.select(
        F.concat(F.lit("h"), (u % 3).cast("string")).alias("host"),
        e.alias("ts"),
        ((e % 800).cast("double") / 8).alias("load1"),
        ((u % 400).cast("double") / 16).alias("load5"),
        ((e % 200).cast("double") / 32).alias("load15"),
        (2 + u % 7).alias("ncpu"),
        e.cast("double").alias("uptime_sec"),
    )
    return host_load_metrics(fx, cpu_average=True).select(
        "host", "ts", "hm_metric", "hm_value_d")


O_HOST_LOAD = """
WITH fx AS (
  SELECT 'h' || CAST(user_id % 3 AS VARCHAR) AS host, event_id AS ts,
         CAST(event_id % 800 AS DOUBLE) / 8 AS load1,
         CAST(user_id % 400 AS DOUBLE) / 16 AS load5,
         CAST(event_id % 200 AS DOUBLE) / 32 AS load15,
         CAST(2 + user_id % 7 AS DOUBLE) AS ncpu,
         CAST(event_id AS DOUBLE) AS uptime_sec
  FROM events
)
SELECT host, ts, m AS hm_metric, v AS hm_value_d FROM fx,
LATERAL (VALUES
  ('system.cpu.load_average.1m', load1 / ncpu),
  ('system.cpu.load_average.5m', load5 / ncpu),
  ('system.cpu.load_average.15m', load15 / ncpu),
  ('system.uptime', uptime_sec)) AS t(m, v)
"""

EXT17_QUERIES["host_load"] = q_host_load
EXT17_ORACLES["host_load"] = O_HOST_LOAD


# ---------------------------------------------------------------------------
# filesystem scraper: first-wins dedup + usage/inodes/mode
# ---------------------------------------------------------------------------


def q_host_filesystem(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.hostmetrics import host_filesystem_metrics

    ev = load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    fx = ev.select(
        F.lit("h0").alias("host"),
        (e - e % 8).alias("ts"), e.alias("seq"),
        F.concat(F.lit("sd"), (e % 3).cast("string")).alias("device"),
        F.when(e % 2 == 0, F.lit("")).otherwise(F.lit("/m1"))
        .alias("mountpoint"),
        F.element_at(
            F.array(F.lit("ext4"), F.lit("xfs"), F.lit("tmpfs")),
            (u % 3 + 1).cast("int")).alias("fstype"),
        F.element_at(
            F.array(F.lit("rw,relatime"), F.lit("ro"),
                    F.lit("nosuid,nodev")),
            (e % 3 + 1).cast("int")).alias("opts"),
        (e % 1000 + 1).alias("used"), (u % 1000 + 1).alias("free"),
        (e % 1000 + u % 1000 + 2 + e % 100).alias("total"),
        (e % 700).alias("inodes_used"), (u % 300).alias("inodes_free"),
    )
    return host_filesystem_metrics(fx).select(
        "host", "ts", "device", "mode", "mountpoint", "fstype",
        "hm_metric", "hm_state", "hm_value", "hm_value_d")


O_HOST_FILESYSTEM = """
WITH fx AS (
  SELECT 'h0' AS host, event_id - event_id % 8 AS ts,
         event_id AS seq,
         'sd' || CAST(event_id % 3 AS VARCHAR) AS device,
         CASE WHEN event_id % 2 = 0 THEN '' ELSE '/m1' END
           AS mountpoint,
         ['ext4','xfs','tmpfs'][CAST(user_id % 3 AS INT) + 1]
           AS fstype,
         ['rw,relatime','ro','nosuid,nodev']
           [CAST(event_id % 3 AS INT) + 1] AS opts,
         event_id % 1000 + 1 AS used, user_id % 1000 + 1 AS free,
         event_id % 1000 + user_id % 1000 + 2 + event_id % 100
           AS total,
         event_id % 700 AS inodes_used, user_id % 300 AS inodes_free
  FROM events
), kept AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY host, ts, device,
      mountpoint ORDER BY seq) AS rn FROM fx)
  WHERE mountpoint = '' OR rn = 1
), md AS (
  SELECT *, CASE WHEN list_contains(string_split(opts, ','), 'rw')
      THEN 'rw'
    WHEN list_contains(string_split(opts, ','), 'ro') THEN 'ro'
    ELSE 'unknown' END AS mode FROM kept
)
SELECT host, ts, device, mode, mountpoint, fstype,
       'system.filesystem.usage' AS hm_metric, s AS hm_state,
       CAST(v AS BIGINT) AS hm_value, CAST(NULL AS DOUBLE) AS hm_value_d
FROM md, LATERAL (VALUES ('used', used), ('free', free),
  ('reserved', total - used - free)) AS t(s, v)
UNION ALL
SELECT host, ts, device, mode, mountpoint, fstype,
       'system.filesystem.utilization', NULL, NULL,
       CAST(used AS DOUBLE) / (used + free) FROM md
UNION ALL
SELECT host, ts, device, mode, mountpoint, fstype,
       'system.filesystem.inodes.usage', s, CAST(v AS BIGINT), NULL
FROM md, LATERAL (VALUES ('used', inodes_used),
  ('free', inodes_free)) AS t(s, v)
"""

EXT17_QUERIES["host_filesystem"] = q_host_filesystem
EXT17_ORACLES["host_filesystem"] = O_HOST_FILESYSTEM


# ---------------------------------------------------------------------------
# disk scraper: io/operations/times/pending/merged
# ---------------------------------------------------------------------------


def q_host_disk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.hostmetrics import host_disk_metrics

    ev = load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    fx = ev.select(
        F.concat(F.lit("h"), (u % 3).cast("string")).alias("host"),
        e.alias("ts"),
        F.concat(F.lit("sd"), (e % 4).cast("string")).alias("device"),
        (e * 512 % 100000).alias("read_bytes"),
        (u * 4096 % 100000).alias("write_bytes"),
        (e % 5000).alias("read_count"), (u % 5000).alias("write_count"),
        (e % 3000).alias("read_time_ms"), (u % 3000).alias("write_time_ms"),
        (e % 7000).alias("io_time_ms"), (u % 9000).alias("weighted_io_ms"),
        (e % 50).alias("merged_read_count"),
        (u % 50).alias("merged_write_count"),
        (e % 16).alias("iops_in_progress"),
    )
    return host_disk_metrics(fx).select(
        "host", "ts", "device", "hm_metric", "hm_direction",
        "hm_value", "hm_value_d")


O_HOST_DISK = """
WITH fx AS (
  SELECT 'h' || CAST(user_id % 3 AS VARCHAR) AS host, event_id AS ts,
         'sd' || CAST(event_id % 4 AS VARCHAR) AS device,
         event_id * 512 % 100000 AS read_bytes,
         user_id * 4096 % 100000 AS write_bytes,
         event_id % 5000 AS read_count, user_id % 5000 AS write_count,
         event_id % 3000 AS read_time_ms,
         user_id % 3000 AS write_time_ms,
         event_id % 7000 AS io_time_ms,
         user_id % 9000 AS weighted_io_ms,
         event_id % 50 AS merged_read_count,
         user_id % 50 AS merged_write_count,
         event_id % 16 AS iops_in_progress
  FROM events
)
SELECT host, ts, device, m AS hm_metric, d AS hm_direction,
       CAST(v AS BIGINT) AS hm_value, CAST(NULL AS DOUBLE) AS hm_value_d
FROM fx, LATERAL (VALUES
  ('system.disk.io', 'read', read_bytes),
  ('system.disk.io', 'write', write_bytes),
  ('system.disk.operations', 'read', read_count),
  ('system.disk.operations', 'write', write_count),
  ('system.disk.merged', 'read', merged_read_count),
  ('system.disk.merged', 'write', merged_write_count)) AS t(m, d, v)
UNION ALL
SELECT host, ts, device, 'system.disk.operation_time', d, NULL,
       CAST(v AS DOUBLE) / 1e3
FROM fx, LATERAL (VALUES ('read', read_time_ms),
  ('write', write_time_ms)) AS t(d, v)
UNION ALL
SELECT host, ts, device, 'system.disk.io_time', NULL, NULL,
       CAST(io_time_ms AS DOUBLE) / 1e3 FROM fx
UNION ALL
SELECT host, ts, device, 'system.disk.weighted_io_time', NULL, NULL,
       CAST(weighted_io_ms AS DOUBLE) / 1e3 FROM fx
UNION ALL
SELECT host, ts, device, 'system.disk.pending_operations', NULL,
       CAST(iops_in_progress AS BIGINT), NULL FROM fx
"""

EXT17_QUERIES["host_disk"] = q_host_disk
EXT17_ORACLES["host_disk"] = O_HOST_DISK


# ---------------------------------------------------------------------------
# network scraper: per-interface counters + tcp state grid
# ---------------------------------------------------------------------------


def q_host_network(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.hostmetrics import host_network_metrics

    ev = load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    fx = ev.select(
        F.concat(F.lit("h"), (u % 3).cast("string")).alias("host"),
        e.alias("ts"),
        F.concat(F.lit("eth"), (e % 2).cast("string")).alias("interface"),
        (e * 100 % 65536).alias("bytes_sent"),
        (u * 100 % 65536).alias("bytes_recv"),
        (e % 4096).alias("packets_sent"), (u % 4096).alias("packets_recv"),
        (e % 17).alias("errin"), (u % 17).alias("errout"),
        (e % 7).alias("dropin"), (u % 7).alias("dropout"),
    )
    return host_network_metrics(fx).select(
        "host", "ts", "interface", "hm_metric", "hm_direction",
        "hm_value")


O_HOST_NETWORK = """
WITH fx AS (
  SELECT 'h' || CAST(user_id % 3 AS VARCHAR) AS host, event_id AS ts,
         'eth' || CAST(event_id % 2 AS VARCHAR) AS interface,
         event_id * 100 % 65536 AS bytes_sent,
         user_id * 100 % 65536 AS bytes_recv,
         event_id % 4096 AS packets_sent,
         user_id % 4096 AS packets_recv,
         event_id % 17 AS errin, user_id % 17 AS errout,
         event_id % 7 AS dropin, user_id % 7 AS dropout
  FROM events
)
SELECT host, ts, interface, m AS hm_metric, d AS hm_direction,
       CAST(v AS BIGINT) AS hm_value
FROM fx, LATERAL (VALUES
  ('system.network.packets', 'transmit', packets_sent),
  ('system.network.packets', 'receive', packets_recv),
  ('system.network.dropped', 'transmit', dropout),
  ('system.network.dropped', 'receive', dropin),
  ('system.network.errors', 'transmit', errout),
  ('system.network.errors', 'receive', errin),
  ('system.network.io', 'transmit', bytes_sent),
  ('system.network.io', 'receive', bytes_recv)) AS t(m, d, v)
"""

EXT17_QUERIES["host_network"] = q_host_network
EXT17_ORACLES["host_network"] = O_HOST_NETWORK


_TCP14 = ("['ESTABLISHED','LISTEN','TIME_WAIT','CLOSE_WAIT',"
          "'SYN_SENT','SYN_RECV','FIN_WAIT_1','FIN_WAIT_2',"
          "'LAST_ACK','CLOSE','CLOSING','DELETE','BOUND','NONE']")


def q_host_net_connections(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.hostmetrics import host_network_connections

    ev = load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    statuses = ["ESTABLISHED", "LISTEN", "TIME_WAIT", "CLOSE_WAIT",
                "SYN_SENT", "SYN_RECV", "FIN_WAIT_1", "FIN_WAIT_2",
                "LAST_ACK", "CLOSE", "CLOSING", "DELETE", "BOUND",
                "NONE"]
    fx = ev.select(
        F.concat(F.lit("h"), (u % 3).cast("string")).alias("host"),
        (e - e % 64).alias("ts"),
        F.element_at(F.array(*[F.lit(s) for s in statuses]),
                     (e % 14 + 1).cast("int")).alias("status"),
    )
    return host_network_connections(fx)


O_HOST_NET_CONNECTIONS = f"""
WITH fx AS (
  SELECT 'h' || CAST(user_id % 3 AS VARCHAR) AS host,
         event_id - event_id % 64 AS ts,
         {_TCP14}[CAST(event_id % 14 AS INT) + 1] AS status
  FROM events
), c AS (
  SELECT host, ts, status AS state, COUNT(*) AS n FROM fx
  GROUP BY 1, 2, 3
), grid AS (
  SELECT DISTINCT f.host, f.ts, g.state FROM fx f CROSS JOIN (VALUES
    ('CLOSE_WAIT'),('CLOSE'),('CLOSING'),('DELETE'),('ESTABLISHED'),
    ('FIN_WAIT_1'),('FIN_WAIT_2'),('LAST_ACK'),('LISTEN'),
    ('SYN_SENT'),('SYN_RECV'),('TIME_WAIT')) AS g(state)
)
SELECT COALESCE(g.host, c.host) AS host, COALESCE(g.ts, c.ts) AS ts,
       'system.network.connections' AS hm_metric,
       'tcp' AS hm_protocol,
       COALESCE(g.state, c.state) AS hm_state,
       CAST(COALESCE(c.n, 0) AS BIGINT) AS hm_value
FROM grid g FULL OUTER JOIN c
  ON g.host = c.host AND g.ts = c.ts AND g.state = c.state
"""

EXT17_QUERIES["host_net_connections"] = q_host_net_connections
EXT17_ORACLES["host_net_connections"] = O_HOST_NET_CONNECTIONS


# ---------------------------------------------------------------------------
# paging scraper: device usage/utilization + swap ops/faults
# ---------------------------------------------------------------------------


def q_host_paging(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.hostmetrics import host_paging_metrics

    ev = load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    host = F.concat(F.lit("h"), (u % 3).cast("string")).alias("host")
    pagefile = ev.select(
        host, e.alias("ts"),
        F.concat(F.lit("swap"), (e % 2).cast("string")).alias("device"),
        (e % 512 + 1).alias("used"), (u % 512 + 1).alias("free"),
        (e % 512 + u % 512 + 2).alias("total"),
        F.when(e % 5 == 0, F.lit(None).cast("bigint"))
        .otherwise(e % 128).alias("cached"),
    )
    swap = ev.where(e % 4 == 0).select(
        host, e.alias("ts"),
        (e % 11).alias("sin"), (u % 13).alias("sout"),
        (e % 17).alias("pgin"), (u % 19).alias("pgout"),
        (1000 + e % 300).alias("pgfault"), (e % 100).alias("pgmajfault"),
    )
    return host_paging_metrics(pagefile, swap)


O_HOST_PAGING = """
WITH pf AS (
  SELECT 'h' || CAST(user_id % 3 AS VARCHAR) AS host, event_id AS ts,
         'swap' || CAST(event_id % 2 AS VARCHAR) AS device,
         event_id % 512 + 1 AS used, user_id % 512 + 1 AS free,
         event_id % 512 + user_id % 512 + 2 AS total,
         CASE WHEN event_id % 5 = 0 THEN NULL
              ELSE event_id % 128 END AS cached
  FROM events
), sw AS (
  SELECT 'h' || CAST(user_id % 3 AS VARCHAR) AS host, event_id AS ts,
         event_id % 11 AS sin, user_id % 13 AS sout,
         event_id % 17 AS pgin, user_id % 19 AS pgout,
         1000 + event_id % 300 AS pgfault,
         event_id % 100 AS pgmajfault
  FROM events WHERE event_id % 4 = 0
)
SELECT host, ts, device, 'system.paging.usage' AS hm_metric,
       s AS hm_state, CAST(NULL AS VARCHAR) AS hm_direction,
       CAST(NULL AS VARCHAR) AS hm_type, CAST(v AS BIGINT) AS hm_value,
       CAST(NULL AS DOUBLE) AS hm_value_d
FROM pf, LATERAL (VALUES ('used', used), ('free', free),
  ('cached', cached)) AS t(s, v) WHERE v IS NOT NULL
UNION ALL
SELECT host, ts, device, 'system.paging.utilization', s, NULL, NULL,
       NULL, CAST(v AS DOUBLE) / total
FROM pf, LATERAL (VALUES ('used', used), ('free', free),
  ('cached', cached)) AS t(s, v) WHERE v IS NOT NULL
UNION ALL
SELECT host, ts, NULL, 'system.paging.operations', NULL, d, ty,
       CAST(v AS BIGINT), NULL
FROM sw, LATERAL (VALUES ('page_in', 'major', sin),
  ('page_out', 'major', sout), ('page_in', 'minor', pgin),
  ('page_out', 'minor', pgout)) AS t(d, ty, v)
UNION ALL
SELECT host, ts, NULL, 'system.paging.faults', NULL, NULL, ty,
       CAST(v AS BIGINT), NULL
FROM sw, LATERAL (VALUES ('major', pgmajfault),
  ('minor', pgfault - pgmajfault)) AS t(ty, v)
"""

EXT17_QUERIES["host_paging"] = q_host_paging
EXT17_ORACLES["host_paging"] = O_HOST_PAGING


# ---------------------------------------------------------------------------
# processes scraper: status counts with misc overrides
# ---------------------------------------------------------------------------

_PROC_WORDS = ("['running','sleep','stop','idle','zombie','wait',"
               "'lock','blocked','daemon','detached','system',"
               "'orphan','tracing','']")


def q_host_processes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.hostmetrics import host_processes_metrics

    ev = load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    words = ["running", "sleep", "stop", "idle", "zombie", "wait",
             "lock", "blocked", "daemon", "detached", "system",
             "orphan", "tracing", ""]
    procs = ev.select(
        F.concat(F.lit("h"), (u % 3).cast("string")).alias("host"),
        (e - e % 32).alias("ts"),
        F.element_at(F.array(*[F.lit(w) for w in words]),
                     (e % 14 + 1).cast("int")).alias("status"),
    )
    misc = procs.select("host", "ts").distinct().select(
        "host", "ts",
        (25 + F.col("ts") % 40).alias("procs_total"),
        (F.col("ts") % 7).alias("procs_running"),
        (F.col("ts") % 5).alias("procs_blocked"),
        (F.col("ts") % 100).alias("procs_created"),
    )
    return host_processes_metrics(procs, misc)


O_HOST_PROCESSES = f"""
WITH procs AS (
  SELECT 'h' || CAST(user_id % 3 AS VARCHAR) AS host,
         event_id - event_id % 32 AS ts,
         {_PROC_WORDS}[CAST(event_id % 14 AS INT) + 1] AS status
  FROM events
), smap AS (
  SELECT * FROM (VALUES ('blocked','blocked'),('daemon','daemon'),
    ('detached','detached'),('idle','idle'),('lock','locked'),
    ('orphan','orphan'),('running','running'),('sleep','sleeping'),
    ('stop','stopped'),('system','system'),('wait','paging'),
    ('zombie','zombies')) AS t(word, st)
), mapped AS (
  SELECT p.host, p.ts, COALESCE(s.st, 'unknown') AS st
  FROM procs p LEFT JOIN smap s ON p.status = s.word
), counts AS (
  SELECT host, ts, st, COUNT(*) AS n FROM mapped GROUP BY 1, 2, 3
), misc AS (
  SELECT DISTINCT host, ts, 25 + ts % 40 AS procs_total,
         ts % 7 AS procs_running, ts % 5 AS procs_blocked,
         ts % 100 AS procs_created
  FROM procs
), wide AS (
  SELECT m.host, m.ts, m.procs_total, m.procs_running,
         m.procs_blocked, m.procs_created,
         COALESCE(MAX(CASE WHEN c.st='daemon' THEN n END), 0) AS daemon,
         COALESCE(MAX(CASE WHEN c.st='detached' THEN n END), 0) AS detached,
         COALESCE(MAX(CASE WHEN c.st='idle' THEN n END), 0) AS idle,
         COALESCE(MAX(CASE WHEN c.st='locked' THEN n END), 0) AS locked,
         COALESCE(MAX(CASE WHEN c.st='orphan' THEN n END), 0) AS orphan,
         COALESCE(MAX(CASE WHEN c.st='sleeping' THEN n END), 0) AS sleeping,
         COALESCE(MAX(CASE WHEN c.st='stopped' THEN n END), 0) AS stopped,
         COALESCE(MAX(CASE WHEN c.st='system' THEN n END), 0) AS system,
         COALESCE(MAX(CASE WHEN c.st='paging' THEN n END), 0) AS paging,
         COALESCE(MAX(CASE WHEN c.st='zombies' THEN n END), 0) AS zombies,
         COALESCE(MAX(CASE WHEN c.st='unknown' THEN n END), 0) AS unknown
  FROM misc m LEFT JOIN counts c ON m.host = c.host AND m.ts = c.ts
  GROUP BY 1, 2, 3, 4, 5, 6
), final AS (
  SELECT *, daemon + detached + idle + locked + orphan + sleeping
      + stopped + system + paging + zombies + unknown
      + procs_running + procs_blocked AS total_known
  FROM wide
)
SELECT host, ts, 'system.processes.count' AS hm_metric,
       st AS hm_status, CAST(n AS BIGINT) AS hm_value
FROM final, LATERAL (VALUES
  ('blocked', procs_blocked), ('daemon', daemon),
  ('detached', detached), ('idle', idle), ('locked', locked),
  ('orphan', orphan), ('running', procs_running),
  ('sleeping', sleeping), ('stopped', stopped), ('system', system),
  ('paging', paging), ('zombies', zombies),
  ('unknown', CASE WHEN procs_total > total_known
                   THEN procs_total - total_known ELSE unknown END)
  ) AS t(st, n)
WHERE n > 0 OR st IN ('running', 'blocked')
UNION ALL
SELECT host, ts, 'system.processes.created', NULL,
       CAST(procs_created AS BIGINT)
FROM final
"""

EXT17_QUERIES["host_processes"] = q_host_processes
EXT17_ORACLES["host_processes"] = O_HOST_PROCESSES

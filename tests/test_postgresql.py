"""postgresql receiver semantics (receiver/postgresqlreceiver)."""
from __future__ import annotations

from opentelemetry_collector_contrib_spark.operators.postgresql import (
    postgresql_stats,
)


def test_postgresql_exclusion_count_and_sentinels(spark):
    rows = [
        ("s1", "database", "db0", '{"table_count": 3, "backends": 5,'
         ' "has_stats": false}'),
        ("s1", "database", "db1", '{"table_count": 2,'
         ' "has_stats": false}'),
        ("s1", "database", "bad", '{"table_count": 9,'
         ' "has_stats": false}'),
        ("s1", "bgwriter", None, '{"buffers_allocated": 7,'
         ' "bg_writes": 1, "backend_writes": -1,'
         ' "buffer_checkpoints": 2, "fsync_writes": 3,'
         ' "checkpoints_req": 0, "checkpoints_scheduled": 0,'
         ' "checkpoint_sync_time": 1.5, "checkpoint_write_time": 2.5,'
         ' "max_written": 4}'),
    ]
    df = spark.createDataFrame(
        rows, "ts string, kind string, db string, body string")
    out = postgresql_stats(df, exclude_databases=["bad"]).collect()
    # excluded db contributes nothing, not even to database.count
    assert not any(r.db == "bad" for r in out)
    count = [r for r in out
             if r.pg_metric == "postgresql.database.count"]
    assert len(count) == 1 and count[0].pg_value == 2
    # backends only where present; writes 'backend' dropped at -1
    backends = [r for r in out if r.pg_metric == "postgresql.backends"]
    assert [(r.db, r.pg_value) for r in backends] == [("db0", 5)]
    writes = {r.pg_attr: r.pg_value for r in out
              if r.pg_metric == "postgresql.bgwriter.buffers.writes"}
    assert "backend" not in writes and writes["backend_fsync"] == 3
    # has_stats=false suppresses the 12 pg_stat_database counters
    assert not any(r.pg_metric == "postgresql.commits" for r in out)
    durs = {r.pg_attr: r.pg_value_d for r in out
            if r.pg_metric == "postgresql.bgwriter.duration"}
    assert durs == {"sync": 1.5, "write": 2.5}

"""memcached receiver semantics (receiver/memcachedreceiver/scraper.go)."""
from __future__ import annotations

import pytest

from opentelemetry_collector_contrib_spark.operators.receivers import (
    memcached_stats,
)

PAGE = """STAT pid 1
STAT bytes 1024
STAT curr_connections 10
STAT cmd_get 100
STAT get_hits 75
STAT get_misses 25
STAT incr_hits 0
STAT incr_misses 0
STAT decr_hits abc
STAT decr_misses 5
STAT rusage_system 1.5
END
"""


@pytest.fixture(scope="module")
def spark():
    from opentelemetry_collector_contrib_spark.session import get_spark

    return get_spark()


def test_memcached_stats(spark):
    rows = memcached_stats(
        spark.createDataFrame([(1, PAGE)], ["id", "body"])
    ).collect()
    by = {(r.mc_metric, r.mc_command, r.mc_type, r.mc_operation,
           r.mc_state): r for r in rows}
    assert by[("memcached.bytes", None, None, None, None)].mc_value == 1024
    assert by[("memcached.commands", "get", None, None, None)]
    assert by[("memcached.operations", None, "hit", "get",
               None)].mc_value == 75
    assert by[("memcached.cpu.usage", None, None, None,
               "system")].mc_value_d == 1.5
    # unparseable decr_hits -> skipped (scraper.go:185-192), and the
    # decrement hit-ratio needs both sides -> absent too
    assert ("memcached.operations", None, "hit", "decrement",
            None) not in by
    assert ("memcached.operation_hit_ratio", None, None, "decrement",
            None) not in by
    # swapped-arg quirk: "hit ratio" = misses/(hits+misses)*100
    get_ratio = by[("memcached.operation_hit_ratio", None, None, "get",
                    None)]
    assert get_ratio.mc_value_d == 25.0
    # 0/0 -> 0 (calculateHitRatio guard)
    incr = by[("memcached.operation_hit_ratio", None, None, "increment",
               None)]
    assert incr.mc_value_d == 0.0

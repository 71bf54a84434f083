"""chrony receiver semantics (receiver/chronyreceiver/scraper.go)."""
from __future__ import annotations

import json

import pytest

from opentelemetry_collector_contrib_spark.operators.receivers import (
    chrony_tracking,
)


@pytest.fixture(scope="module")
def spark():
    from opentelemetry_collector_contrib_spark.session import get_spark

    return get_spark()


def test_chrony_tracking(spark):
    body = json.dumps({"stratum": 3, "leap_status": 1,
                       "current_correction": 0.25, "last_offset": -0.5,
                       "rms_offset": 1.5, "freq_ppm": -2.25,
                       "skew_ppm": 0.125, "root_delay": 4.5})
    rows = chrony_tracking(spark.createDataFrame(
        [(1, body), (2, "junk")], ["id", "body"],
    )).collect()
    by = {r.nt_metric: r for r in rows if r.id == 1}
    assert by["ntp.stratum"].nt_value == 3
    # LeapStatus+1 -> enum: 1 -> insert_second
    assert by["ntp.time.correction"].nt_leap_status == "insert_second"
    assert by["ntp.time.correction"].nt_value_d == 0.25
    assert by["ntp.time.last_offset"].nt_value_d == -0.5
    assert by["ntp.skew"].nt_leap_status is None
    assert by["ntp.skew"].nt_value_d == 0.125
    dead = [r for r in rows if r.id == 2]
    assert len(dead) == 1 and dead[0].nt_ok is False

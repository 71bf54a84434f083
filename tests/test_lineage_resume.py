"""Lineage + resume: the checkpoint.Save analog end to end.

A run commits per-ts-day lineage records; a resumed run must skip
completed days (write zero rows for them) while leaving the sink
content identical — the idempotent dynamic-partition-overwrite
contract.
"""

from __future__ import annotations

import json

from opentelemetry_collector_contrib_spark.plans.pipeline import (
    run_pipeline,
    write_pipeline,
)
from opentelemetry_collector_contrib_spark.runtime.lineage import LineageLog
from opentelemetry_collector_contrib_spark.sources.transcripts import generate_transcripts


def _sink_total(spark, root):
    return spark.read.parquet(f"{root}/sink=routed").count()


def test_resume_skips_completed_days(spark, tmp_path):
    root = str(tmp_path / "out")
    transcripts = generate_transcripts(spark, n_convs=80)
    out = run_pipeline(spark, transcripts)

    lineage = LineageLog(root, run_id="r1")
    counts1 = write_pipeline(out, root, lineage=lineage, write_metrics=False)
    total1 = sum(counts1.values())
    assert total1 == transcripts.count()
    sink1 = _sink_total(spark, root)
    assert sink1 == total1

    days = lineage.completed("sink_day")
    assert len(days) > 1  # multiple resume units exist

    # resumed identical run: everything already committed -> no rows
    out2 = run_pipeline(spark, transcripts)
    counts2 = write_pipeline(
        out2, root, lineage=LineageLog(root, run_id="r2"),
        write_metrics=False, resume=True,
    )
    assert sum(counts2.values()) == 0
    assert _sink_total(spark, root) == sink1  # sink untouched

    # simulate a mid-run crash: forget one day's completion record
    victim = sorted(days)[0]
    lines = [
        ln
        for ln in open(f"{root}/_lineage.jsonl")
        if not (
            (rec := json.loads(ln)).get("stage") == "sink_day"
            and rec.get("partition") == victim
        )
    ]
    with open(f"{root}/_lineage.jsonl", "w") as f:
        f.writelines(lines)

    out3 = run_pipeline(spark, transcripts)
    counts3 = write_pipeline(
        out3, root, lineage=LineageLog(root, run_id="r3"),
        write_metrics=False, resume=True,
    )
    # only the forgotten day is reprocessed; sink converges to the
    # same total (dynamic overwrite replaced exactly that day)
    assert 0 < sum(counts3.values()) < total1
    assert _sink_total(spark, root) == sink1


def test_rerun_without_resume_is_idempotent(spark, tmp_path):
    root = str(tmp_path / "out")
    transcripts = generate_transcripts(spark, n_convs=50)
    for run in ("a", "b"):
        out = run_pipeline(spark, transcripts)
        write_pipeline(
            out, root, lineage=LineageLog(root, run_id=run), write_metrics=False
        )
    assert _sink_total(spark, root) == transcripts.count()

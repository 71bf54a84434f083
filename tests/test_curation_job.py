"""End-to-end corpus-curation job (jobs/curation.py): funnel
invariants, determinism, lineage."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "jobs"))

import curation


def _run(spark, out_dir, extra=()):
    argv = ["--docs", "600", "--out", str(out_dir), "--budget", "256",
            "--shards", "4", *extra]
    assert curation.main(argv) == 0


def test_curation_funnel_and_idempotence(spark, tmp_path, capsys):
    _run(spark, tmp_path / "a")
    out1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    f = out1["funnel"]
    # every seeded stage did work, in the right direction
    assert f["docs_in"] == 600
    assert 0 < f["after_clean"] <= f["docs_in"]
    assert f["after_exact_dedup"] < f["after_clean"]      # %13 exact dups
    assert f["after_neardup"] < f["after_exact_dedup"]    # %11 near dups
    assert f["written"] == f["after_neardup"]
    assert f["bins"] >= 1
    # deterministic: same args -> byte-identical funnel
    _run(spark, tmp_path / "b")
    out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2["funnel"] == f
    # lineage has one completed row per stage
    stages = set()
    with open(tmp_path / "a" / "_lineage.jsonl") as fh:
        for line in fh:
            stages.add(json.loads(line)["stage"])
    assert {"scan", "clean", "exact_dedup", "neardup", "curated"} <= stages
    # the sink is readable and row-count-consistent
    back = spark.read.parquet(str(tmp_path / "a" / "sink=curated"))
    assert back.count() == f["written"]
    assert set(back.columns) >= {"doc_id", "text", "lang", "quality",
                                 "n_tokens", "shuffle_rank"}


def test_curation_sample_and_pairs_mode(spark, tmp_path, capsys):
    _run(spark, tmp_path / "c",
         extra=("--neardup", "pairs", "--sample", "en=0.0,de=1.0", "--sink", "noop"))
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    f = out["funnel"]
    assert f["after_sample"] < f["after_neardup"]  # en stratum dropped


def test_curation_batchc_knobs(spark, tmp_path, capsys):
    """--nll-band / --max-dup-frac / --mix stages compose into the
    funnel: monotone counts, each stage recorded, deterministic."""
    extra = (
        "--nll-band", "0,50",
        "--max-dup-frac", "0.5",
        "--mix", "en=0.5,de=0.125,es=0.125,fr=0.125,zh=0.125",
        "--mix-budget", "0.5",
    )
    _run(spark, tmp_path / "m1", extra)
    out1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    f = out1["funnel"]
    assert f["after_lm_band"] <= f["after_clean"]
    assert f["after_dup_spans"] <= f["after_exact_dedup"]
    # the %11/%13 seeded dups share spans, so the span filter fires
    assert f["after_dup_spans"] < f["after_exact_dedup"]
    # mixing to half the token budget really drops docs
    assert 0 < f["after_sample"] < f["after_neardup"]
    assert f["written"] == f["after_sample"]
    # deterministic across runs
    _run(spark, tmp_path / "m2", extra)
    out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2["funnel"] == f
    stages = set()
    with open(tmp_path / "m1" / "_lineage.jsonl") as fh:
        for line in fh:
            stages.add(json.loads(line)["stage"])
    assert {"lm_band", "dup_spans", "mix"} <= stages


def test_curation_semdedup_stage(spark, tmp_path, capsys):
    """--semdedup composes into the funnel: monotone counts, stage
    recorded in lineage, deterministic; the straggler-salted variant
    can only MISS pairs (split across salt buckets), never invent
    them, so it keeps at least as many docs."""
    extra = ("--semdedup", "6", "--sink", "noop")
    _run(spark, tmp_path / "s1", extra)
    out1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    f = out1["funnel"]
    assert 0 < f["after_semdedup"] <= f["after_neardup"]
    assert f["written"] == f["after_semdedup"]
    assert "semdedup" in out1["stage_sec"]
    stages = set()
    with open(tmp_path / "s1" / "_lineage.jsonl") as fh:
        for line in fh:
            stages.add(json.loads(line)["stage"])
    assert "semdedup" in stages
    # straggler salt: a sub-split can only lose pairs, never add them
    _run(spark, tmp_path / "s2", extra + ("--semdedup-max-cell", "50"))
    out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert (
        f["after_semdedup"]
        <= out2["funnel"]["after_semdedup"]
        <= f["after_neardup"]
    )
    # deterministic: the salted run replays byte-identically
    _run(spark, tmp_path / "s3", extra + ("--semdedup-max-cell", "50"))
    out3 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out3["funnel"] == out2["funnel"]


def test_curation_dsir_stage(spark, tmp_path, capsys):
    """--dsir composes into the funnel: keeps exactly the top fraction
    by importance weight, stage recorded in lineage, deterministic."""
    extra = ("--dsir", "0.5", "--sink", "noop")
    _run(spark, tmp_path / "d1", extra)
    out1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    f = out1["funnel"]
    pre = f.get("after_neardup", f["after_exact_dedup"])
    assert f["after_dsir"] == int(pre * 0.5)
    assert f["written"] == f["after_dsir"]
    assert "dsir" in out1["stage_sec"]
    stages = set()
    with open(tmp_path / "d1" / "_lineage.jsonl") as fh:
        for line in fh:
            stages.add(json.loads(line)["stage"])
    assert "dsir" in stages
    # deterministic replay
    _run(spark, tmp_path / "d2", extra)
    out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2["funnel"] == out1["funnel"]

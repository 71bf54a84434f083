"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": <sf>,
     "pipeline_turns_per_sec": <throughput>}

The flagship entry is the full parse→enrich→route→aggregate transcript
pipeline (the reference's testbed scenario analog: fixed-size synthetic
load, throughput measured end to end, sent==received asserted). The
remaining entries are the operator queries from the registry forced
with a noop sink (full execution, no driver collect).

Measurement protocol (round-3 hardening): every timed entry runs one
untimed WARM-UP followed by ``$SPARK_GRAFT_BENCH_TRIALS`` (default 3)
timed trials and reports the MEDIAN — the box shows a documented ±40%
single-shot CPU swing, so cold single runs made driver rounds
incomparable (the round-2 "regression" was proven noise by re-run).
Fixture generation is written to parquet once, up front, and reported
separately in ``fixture_sec`` — it is NOT part of the pipeline time.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from opentelemetry_collector_contrib_spark.plans import queries as Q
from opentelemetry_collector_contrib_spark.plans.pipeline import run_pipeline, write_pipeline
from opentelemetry_collector_contrib_spark.session import get_spark
from opentelemetry_collector_contrib_spark.sources.transcripts import generate_transcripts

# registry queries benchmarked at sf dir (row-heavy ones use noop sink)
BENCH_QUERIES = [
    "route_connector",
    "json_parser",
    "log_dedup",
    "delta_to_cumulative",
    "sessionize",
    "recombine",
    "enrich_chained",
    "tail_sampler",
    "pricing_summary",
    # corpus / training-data ops
    "exact_dedup",
    "minhash_lsh",
    "ngram_jaccard",
    "simhash",
    "text_quality",
    "ivf_ann",
    "lsh_ann",
    # round-2 additions
    "schema_semconv",
    "signaltometrics_hist",
    "metricstransform",
    # round-3 corpus-curation stage
    "gopher_filter",
    "decontam_overlap",
    "neardup_keep",
    "tf_idf",
    "pack_sequences",
    "pii_scrub",
    # round-3 batch C
    "unigram_lm",
    "dup_spans",
    "semdedup",
    "pq_encode",
    # round-4 superset (VERDICT r3 #10: cover the remaining
    # compute-heavy registry queries so regressions can't hide)
    "bpe_merges",
    "quality_clf",
    "quality_clf_trained",
    "pq_adc",
    "ivfadc_topk",
    "data_mix",
    "line_dedup",
    "kmeans_ivf",
    "embed_neardup",
    "lsh_ann_multi",
    "neardup_components",
    "doc_fingerprint",
    "c4_line_filter",
    "corpus_shuffle",
    "sft_pairs",
    "group_by_trace",
    "spanmetrics",
    "servicegraph",
    "stream_spanmetrics",
    # round-4 continuation: receiver + curation + vendor additions
    "statsd_counters",
    "statsd_gauges",
    "statsd_quantiles",
    "carbon_parser",
    "prom_text_parse",
    "influx_line_parse",
    "loki_push_parse",
    "bpe_encode",
    "dsir_weights",
    "coralogix_txn",
    "datadog_semantics",
    "sumologic_semantics",
    "collectd_parser",
    "grafana_host_info",
]

# round-5: bench EVERYTHING the registry grades. The curated list
# above keeps median-of-3 (the cross-round comparison set); every
# other registry query — cheap parsers, OTTL contexts, streaming
# twins — runs one warm-up + ONE timed trial so no query ships
# unmeasured. Computed from the registry so new queries can't be
# silently dropped.
REMAINDER_TRIALS = 1

PIPELINE_CONVS = 30_000  # ~600k turns; comparable to sf0.1 lineitem


def force(df) -> int:
    """Execute fully without collecting rows driver-side."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def timed_median(run, trials: int) -> float:
    """One untimed warm-up, then the median of `trials` timed runs."""
    run()  # warm-up: JIT, code cache, page cache
    samples = []
    for _ in range(trials):
        t0 = time.time()
        run()
        samples.append(time.time() - t0)
    return statistics.median(samples)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    trials = int(os.environ.get("SPARK_GRAFT_BENCH_TRIALS", "3"))
    spark = get_spark(app_name="bench")

    times: dict[str, float] = {}

    # --- fixtures: generate ONCE, persist, measure separately -----------
    work_dir = tempfile.mkdtemp(prefix="bench-")
    fixture_path = os.path.join(work_dir, "transcripts")
    t0 = time.time()
    generate_transcripts(spark, n_convs=PIPELINE_CONVS).write.mode(
        "overwrite"
    ).parquet(fixture_path)
    fixture_sec = time.time() - t0

    # --- flagship pipeline throughput (turns/sec) -----------------------
    counts_box: dict = {}

    def run_pipeline_once():
        out_dir = os.path.join(work_dir, "sink")
        shutil.rmtree(out_dir, ignore_errors=True)
        transcripts = spark.read.parquet(fixture_path)
        out = run_pipeline(spark, transcripts)
        counts_box["counts"] = write_pipeline(out, out_dir, write_metrics=False)

    try:
        pipeline_sec = timed_median(run_pipeline_once, trials)
        total_turns = sum(counts_box["counts"].values())
        times["pipeline"] = round(pipeline_sec, 3)

        # --- operator queries over the sf dir ---------------------------
        for name in BENCH_QUERIES:
            fn = Q.QUERIES[name]
            times[name] = round(
                timed_median(lambda: force(fn(spark, sf_dir)), trials), 3
            )
        remainder = [n for n in sorted(Q.QUERIES) if n not in set(BENCH_QUERIES)]
        for name in remainder:
            fn = Q.QUERIES[name]
            if name.startswith("stream_"):
                # streaming twins: one COLD trial — their wall clock is
                # microbatch scheduling + state-store commits (fixed
                # cost), not JIT, so a warm-up run would double the
                # bench for no measurement value
                t0 = time.time()
                force(fn(spark, sf_dir))
                times[name] = round(time.time() - t0, 3)
            else:
                times[name] = round(
                    timed_median(
                        lambda: force(fn(spark, sf_dir)), REMAINDER_TRIALS
                    ),
                    3,
                )
    finally:
        shutil.rmtree(work_dir, ignore_errors=True)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "log-pipeline headline suite (flagship transcript pipeline + operator queries)",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
                "trials": trials,
                "remainder_trials": REMAINDER_TRIALS,
                "n_queries": len(times),
                "fixture_sec": round(fixture_sec, 3),
                "pipeline_turns": total_turns,
                "pipeline_turns_per_sec": round(total_turns / pipeline_sec, 1),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())

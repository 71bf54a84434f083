"""spark-submit entry point: run the transcript log pipeline.

Usage:
    spark-submit --py-files <zip> jobs/pipeline.py \
        --convs 10000 --out /tmp/pipeline-out [--input <parquet-dir>] \
        [--salt 16] [--resume]

Reads the transcript table (a parquet path with the input_hint schema,
or the deterministic synthetic generator when --input is omitted),
runs parse -> enrich -> route -> aggregate, writes per-sink partitioned
parquet + count metrics + per-partition lineage, prints a one-line JSON
summary.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from opentelemetry_collector_contrib_spark.plans.pipeline import run_pipeline, write_pipeline
from opentelemetry_collector_contrib_spark.runtime.lineage import LineageLog
from opentelemetry_collector_contrib_spark.session import get_spark
from opentelemetry_collector_contrib_spark.sources.transcripts import generate_transcripts


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="parquet dir with transcript schema; default: synthesize")
    ap.add_argument("--convs", type=int, default=5000)
    ap.add_argument("--out", required=True)
    ap.add_argument("--salt", type=int, default=16)
    ap.add_argument("--master", default=None)
    ap.add_argument("--run-id", default="run-0")
    ap.add_argument(
        "--resume", action="store_true",
        help="skip ts-day partitions already committed in _lineage.jsonl",
    )
    args = ap.parse_args(argv)

    spark = get_spark(app_name="transcript-pipeline", master=args.master)
    t0 = time.time()
    if args.input:
        transcripts = spark.read.parquet(args.input)
    else:
        transcripts = generate_transcripts(spark, n_convs=args.convs)

    lineage = LineageLog(args.out, run_id=args.run_id)
    out = run_pipeline(spark, transcripts)
    counts = write_pipeline(
        out, args.out, salt_buckets=args.salt, lineage=lineage, resume=args.resume
    )

    elapsed = time.time() - t0
    total = sum(counts.values())
    print(
        json.dumps(
            {
                "turns": total,
                "per_sink": counts,
                "sec": round(elapsed, 2),
                "turns_per_sec": round(total / elapsed, 1),
                "out": args.out,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Resume-after-kill evidence: poll-cycle lineage commits + --resume.

The reference checkpoints per-file offsets every poll cycle
(``pkg/stanza/fileconsumer/file.go:144-151``) so a crashed collector
resumes mid-stream instead of re-reading everything. The batch analog
here is ``jobs/pipeline.py --poll-days N``: the sink write runs as a
sequence of poll cycles of N ts-days, each committing its days to the
``_lineage.jsonl`` manifest after the cycle's dynamic-overwrite write
lands. This script proves the protocol with a REAL ``kill -9``:

1. materialize a deterministic transcript table to parquet;
2. undisturbed reference run (single write job) -> per-(route, day)
   counts;
3. poll-cycle run: ``kill -9`` the driver process group once the
   first cycle has committed its ``sink_day`` records (mid-funnel —
   later cycles are still writing);
4. resume run (``--resume --poll-days N``): completed days are
   filtered out by the manifest, only pending days are reprocessed;
5. verify the resumed sink equals the undisturbed sink exactly,
   per (route, ts_day), and report how many turns the resume run
   actually re-wrote vs skipped.

Usage:  python tools/fault_resume_r5.py [--convs 40000] [--poll-days 8]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PY = sys.executable


def manifest_days(path: str, stage: str = "sink_day") -> set[str]:
    done: set[str] = set()
    if not os.path.exists(path):
        return done
    with open(path) as f:
        for line in f:
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            if rec.get("stage") == stage and rec.get("status") == "completed":
                done.add(rec["partition"])
    return done


def run_job(args: list[str]) -> dict:
    out = subprocess.run(
        [PY, os.path.join(REPO, "jobs", "pipeline.py"), *args],
        capture_output=True, text=True, check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--convs", type=int, default=40_000)
    ap.add_argument("--poll-days", type=int, default=8)
    ap.add_argument("--master", default="local[8]")
    ap.add_argument("--workdir", default="/tmp/fault_resume_r5")
    args = ap.parse_args()

    wd = args.workdir
    shutil.rmtree(wd, ignore_errors=True)
    os.makedirs(wd)
    inp = os.path.join(wd, "input")
    out_ref = os.path.join(wd, "out_ref")
    out_kill = os.path.join(wd, "out_kill")

    # 1. materialize the deterministic input once (both runs read the
    # same snapshot, as a cluster job would read the same table)
    subprocess.run(
        [PY, "-c", (
            "import sys; sys.path.insert(0, %r)\n"
            "from opentelemetry_collector_contrib_spark.session import get_spark\n"
            "from opentelemetry_collector_contrib_spark.sources.transcripts import generate_transcripts\n"
            "spark = get_spark(app_name='materialize', master=%r)\n"
            "generate_transcripts(spark, n_convs=%d).write.mode('overwrite').parquet(%r)\n"
        ) % (REPO, args.master, args.convs, inp)],
        check=True, capture_output=True, text=True,
    )

    # 2. undisturbed reference run
    ref = run_job(["--input", inp, "--out", out_ref, "--master", args.master,
                   "--run-id", "ref"])
    print(json.dumps({"phase": "reference", **{k: ref[k] for k in ("turns", "per_sink", "sec")}}))

    # 3. poll-cycle run, kill -9 mid-funnel (after >=1 cycle committed)
    proc = subprocess.Popen(
        [PY, os.path.join(REPO, "jobs", "pipeline.py"),
         "--input", inp, "--out", out_kill, "--master", args.master,
         "--poll-days", str(args.poll_days), "--run-id", "kill-run"],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        start_new_session=True,
    )
    manifest = os.path.join(out_kill, "_lineage.jsonl")
    deadline = time.time() + 600
    committed_at_kill: set[str] = set()
    while time.time() < deadline:
        committed_at_kill = manifest_days(manifest)
        if committed_at_kill:
            break
        if proc.poll() is not None:
            raise SystemExit("kill-run finished before the kill could land; "
                             "raise --convs or lower --poll-days")
        time.sleep(0.5)
    if not committed_at_kill:
        raise SystemExit("no cycle committed within 600s")
    # let the next cycle get airborne, then kill the whole group
    time.sleep(2.0)
    alive = proc.poll() is None
    os.killpg(os.getpgid(proc.pid), signal.SIGKILL)
    proc.wait()
    committed_at_kill = manifest_days(manifest)
    print(json.dumps({
        "phase": "kill", "driver_alive_at_sigkill": alive,
        "pid": proc.pid, "days_committed_at_kill": sorted(committed_at_kill),
        "n_days_committed_at_kill": len(committed_at_kill),
    }))

    # 4. resume
    res = run_job(["--input", inp, "--out", out_kill, "--master", args.master,
                   "--poll-days", str(args.poll_days), "--resume",
                   "--run-id", "resume-run"])
    print(json.dumps({
        "phase": "resume",
        "turns_rewritten": res["turns"],
        "turns_total": ref["turns"],
        "turns_skipped_as_committed": ref["turns"] - res["turns"],
        "sec": res["sec"],
    }))

    # 5. verify: per-(route, ts_day) equality of the two sinks
    from opentelemetry_collector_contrib_spark.session import get_spark

    spark = get_spark(app_name="fault-resume-verify", master=args.master)

    def day_counts(root: str) -> dict:
        df = spark.read.parquet(os.path.join(root, "sink=routed"))
        return {
            f"{r[0]}/{r[1]}": r[2]
            for r in df.groupBy("route", "ts_day").count().collect()
        }

    a, b = day_counts(out_ref), day_counts(out_kill)
    only_a = sorted(set(a) - set(b))
    only_b = sorted(set(b) - set(a))
    diff = sorted(k for k in set(a) & set(b) if a[k] != b[k])
    equal = not only_a and not only_b and not diff
    resumed_skipped = res["turns"] < ref["turns"]
    print(json.dumps({
        "phase": "verify",
        "partitions": len(a),
        "sink_equal_per_route_day": equal,
        "missing_after_resume": only_a, "extra_after_resume": only_b,
        "count_mismatches": diff,
        "resume_skipped_committed_work": resumed_skipped,
        "verdict": "PASS" if (equal and resumed_skipped) else "FAIL",
    }))
    return 0 if equal and resumed_skipped else 1


if __name__ == "__main__":
    sys.exit(main())

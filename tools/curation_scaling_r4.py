"""Curation-funnel N vs 4N re-run INCLUDING the --semdedup stage
(VERDICT r3 #7): identical job, identical deterministic input size,
taskset-pinned 2 vs 8 cores, each leg bracketed by the same-moment
machine-ceiling probe (`standalone_bench.probe_ceiling`).

Usage: python tools/curation_scaling_r4.py [--docs 100000]
Prints one JSON line and appends a section to BENCH/CURATION_SCALING.md.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.standalone_bench import probe_ceiling  # noqa: E402


def run_leg(cores: int, docs: int, semdedup: int) -> dict:
    out = tempfile.mkdtemp(prefix=f"cur-scale-{cores}-")
    cpus = ",".join(str(c) for c in range(cores))
    env = dict(os.environ)
    env["SPARK_DRIVER_JAVA_OPTS"] = f"-XX:ParallelGCThreads={min(cores, 8)}"
    t0 = time.time()
    proc = subprocess.run(
        [
            "taskset", "-c", cpus, sys.executable,
            os.path.join(REPO, "jobs", "curation.py"),
            "--docs", str(docs), "--out", out, "--sink", "noop",
            "--master", f"local[{cores}]",
            # straggler cap sized for PAIRS-per-task, not rows: a cell
            # of c vectors is c^2/2 candidate pairs in one task; 2000
            # keeps the worst task at ~2M pairs (the 12500 of the first
            # r4 run left one 12k cell = 156M pairs on a single core —
            # measured semdedup stage eff 0.65 from that straggler)
            "--semdedup", str(semdedup),
            "--semdedup-max-cell", str(max(docs // 50, 1000)),
        ],
        capture_output=True, text=True, env=env, cwd=REPO,
    )
    wall = time.time() - t0
    line = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")][-1]
    rec = json.loads(line)
    rec["cores"] = cores
    rec["wall_sec"] = round(wall, 1)
    return rec


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=100_000)
    ap.add_argument("--semdedup", type=int, default=32)
    args = ap.parse_args()

    pre = probe_ceiling(2, 8)
    r8 = run_leg(8, args.docs, args.semdedup)
    r2 = run_leg(2, args.docs, args.semdedup)
    post = probe_ceiling(2, 8)

    thr2 = args.docs / r2["sec"]
    thr8 = args.docs / r8["sec"]
    eff = (thr8 / thr2) / 4
    sem_eff = (
        (r2["stage_sec"]["semdedup"] / r8["stage_sec"]["semdedup"]) / 4
        if "semdedup" in r2.get("stage_sec", {})
        else None
    )
    nd_eff = (r2["stage_sec"]["neardup"] / r8["stage_sec"]["neardup"]) / 4

    result = {
        "docs": args.docs,
        "sec": {"c2": r2["sec"], "c8": r8["sec"]},
        "docs_per_sec": {"c2": round(thr2, 1), "c8": round(thr8, 1)},
        "efficiency_2_to_8": round(eff, 3),
        "neardup_stage_eff": round(nd_eff, 3),
        "semdedup_stage_eff": round(sem_eff, 3) if sem_eff else None,
        "machine_ceiling_pre": pre["machine_ceiling"],
        "machine_ceiling_post": post["machine_ceiling"],
        "stage_sec": {"c2": r2["stage_sec"], "c8": r8["stage_sec"]},
        "funnel_equal": r2["funnel"] == r8["funnel"],
        "funnel": r8["funnel"],
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Prove the north-rule deployment mode: `spark-submit --py-files
<zip>` against a real multi-executor standalone cluster.

What makes this a real check (not a re-run of the local tests):
- the driver script is COPIED to a temp dir outside the repo, so the
  package can only be imported from the submitted zip;
- the cluster is a real master + worker with separate executor JVMs;
- one leg runs the flagship pipeline (pure-JVM plan), a second leg
  runs a pandas-UDF query (`multimodal_meta`) whose workers must
  import the package FROM THE SHIPPED ZIP on the executors — the part
  `sys.path` hacks cannot fake.

Writes BENCH/SUBMIT_CHECK.md and prints one JSON line per leg.

Usage: python tools/submit_check.py
"""

from __future__ import annotations

import json
import os
import shutil
import signal
import subprocess
import sys
import tempfile
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.standalone_bench import MASTER_URL, SPARK_HOME, start_cluster  # noqa: E402

PKG = "opentelemetry_collector_contrib_spark"

UDF_DRIVER = """
import json, sys
from pyspark.sql import SparkSession
spark = (SparkSession.builder.appName("submit-udf-check")
  .config("spark.sql.shuffle.partitions", "8")
  .config("spark.sql.session.timeZone", "UTC")
  .config("spark.ui.enabled", "false")
  .config("spark.ui.showConsoleProgress", "false")
  .getOrCreate())
# package must resolve from the --py-files zip on driver AND executors
from opentelemetry_collector_contrib_spark.plans.queries import QUERIES
df = QUERIES["multimodal_meta"](spark, sys.argv[1])
rows = df.count()
print(json.dumps({"leg": "pandas_udf_query", "query": "multimodal_meta",
                  "rows": rows, "ok": rows > 0}))
"""


def build_zip(dest: str) -> str:
    zpath = os.path.join(dest, "occs.zip")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(os.path.join(REPO, PKG)):
            if "__pycache__" in root:
                continue
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


def submit(script: str, zpath: str, cwd: str, *argv: str) -> dict:
    res = subprocess.run(
        [os.path.join(SPARK_HOME, "bin", "spark-submit"),
         "--master", MASTER_URL,
         "--py-files", zpath,
         "--conf", "spark.executor.cores=2",
         "--conf", "spark.executor.memory=4g",
         "--conf", "spark.cores.max=8",
         script, *argv],
        capture_output=True, text=True, timeout=1200, cwd=cwd,
        env=dict(os.environ, SPARK_HOME=SPARK_HOME, PYTHONPATH=""),
    )
    for line in reversed(res.stdout.splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(
        f"no JSON from {script}: {res.stdout[-1500:]}\n{res.stderr[-1500:]}"
    )


def main() -> int:
    work = tempfile.mkdtemp(prefix="submit-check-")
    zpath = build_zip(work)
    # neutral cwd + copied driver: package import can only come from the zip
    driver = os.path.join(work, "pipeline_job.py")
    shutil.copy(os.path.join(REPO, "jobs", "pipeline.py"), driver)
    udf_driver = os.path.join(work, "udf_job.py")
    with open(udf_driver, "w") as f:
        f.write(UDF_DRIVER)

    procs = start_cluster()
    try:
        pipe = submit(driver, zpath, work, "--convs", "500",
                      "--out", os.path.join(work, "out"))
        pipe_ok = sum(pipe["per_sink"].values()) == pipe["turns"]
        print(json.dumps({"leg": "pipeline", "turns": pipe["turns"],
                          "per_sink": pipe["per_sink"], "ok": pipe_ok}))
        udf = submit(udf_driver, zpath, work, "/root/testdata/sf0.001")
        print(json.dumps(udf))
        cur_driver = os.path.join(work, "curation_job.py")
        shutil.copy(os.path.join(REPO, "jobs", "curation.py"), cur_driver)
        cur = submit(cur_driver, zpath, work, "--docs", "2000",
                     "--out", os.path.join(work, "cur_out"))
        cur_ok = (cur["funnel"]["written"] == cur["funnel"]["after_neardup"]
                  and cur["funnel"]["after_neardup"] > 0)
        print(json.dumps({"leg": "curation", "funnel": cur["funnel"], "ok": cur_ok}))
    finally:
        for p in procs:
            p.send_signal(signal.SIGTERM)

    ok = pipe_ok and udf["ok"] and cur_ok
    with open(os.path.join(REPO, "BENCH", "SUBMIT_CHECK.md"), "w") as f:
        f.write(f"""# BENCH/SUBMIT_CHECK — spark-submit --py-files on a real cluster

`python tools/submit_check.py`: packages `{PKG}/` into a zip, starts a
standalone master + worker (separate executor JVMs), and submits two
drivers FROM A TEMP DIR OUTSIDE THE REPO with `--py-files occs.zip`
and an empty PYTHONPATH — the package resolves only from the shipped
zip, on the driver and on every executor.

| leg | what it proves | result |
|---|---|---|
| flagship pipeline (`jobs/pipeline.py --convs 500`) | full parse→enrich→route→sink job under spark-submit; sent==received ({pipe["turns"]} turns = {pipe["per_sink"]}) | {"PASS" if pipe_ok else "FAIL"} |
| pandas-UDF query (`multimodal_meta`) | executor-side Python imports the package from the zip (Arrow-batched UDF path) | {"PASS" if udf["ok"] else "FAIL"} ({udf["rows"]} rows) |
| curation funnel (`jobs/curation.py --docs 2000`) | corpus job (minhash pandas-free path + components) under spark-submit; funnel {cur["funnel"]} | {"PASS" if cur_ok else "FAIL"} |

Overall: {"PASS" if ok else "FAIL"}
""")
    print(json.dumps({"submit_check": "PASS" if ok else "FAIL"}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())

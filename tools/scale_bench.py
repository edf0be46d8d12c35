"""Paired scale-curve bench: the same tree's queries at two data scales
(VERDICT r6 #5: empirical 1x vs 10x evidence for the dedup/ANN stack).

Runs each (sf_dir, query) cell in its own subprocess with a fresh Spark
session, interleaved A/B/A/B so machine-load drift hits both scales
equally; reports per-rep timings plus the min-based runtime ratio.
A bucketed/linear algorithm predicts ratio ~= the data ratio; anything
clearly super-linear is a scale bug.

Usage: python tools/scale_bench.py SF_DIR_1X SF_DIR_10X q_dedup_minhash ...
"""

from __future__ import annotations

import json
import statistics
import subprocess
import sys

RUNNER = r'''
import json, os, sys, time
sys.path.insert(0, os.getcwd())
import __spark_entry__ as entrymod
from table_versions_spark.session import get_spark
spark = get_spark(app_name="tvx-scale")
spark.range(1_000_000).selectExpr("sum(id)").collect()
sf_dir = sys.argv[1]
warm = spark.read.parquet(os.path.join(sf_dir, "region.parquet"))
warm.write.format("noop").mode("overwrite").save()
qs = entrymod.queries()
out = {}
for name in sys.argv[2:]:
    t0 = time.time()
    df = qs[name](spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    out[name] = round(time.time() - t0, 3)
print("SCALERESULT " + json.dumps(out))
'''


def run_cell(sf_dir: str, queries: list[str]) -> dict[str, float]:
    proc = subprocess.run(
        [sys.executable, "-c", RUNNER, sf_dir, *queries],
        capture_output=True, text=True, timeout=1800)
    for line in proc.stdout.splitlines():
        if line.startswith("SCALERESULT "):
            return json.loads(line[len("SCALERESULT "):])
    raise RuntimeError(
        f"no result from {sf_dir}: {proc.stdout[-2000:]} "
        f"{proc.stderr[-2000:]}")


def main() -> None:
    dir_1x, dir_10x, *queries = sys.argv[1:]
    reps = 3
    results: dict[str, dict[str, list[float]]] = {
        dir_1x: {q: [] for q in queries}, dir_10x: {q: [] for q in queries}}
    for i in range(reps):
        for d in (dir_1x, dir_10x):
            cell = run_cell(d, queries)
            for q, sec in cell.items():
                results[d][q].append(sec)
            print(f"rep {i} {d}: {cell}", file=sys.stderr)
    summary = {}
    for q in queries:
        a, b = results[dir_1x][q], results[dir_10x][q]
        summary[q] = {
            "runs_1x": a, "runs_10x": b,
            "min_1x": min(a), "min_10x": min(b),
            "median_1x": statistics.median(a),
            "median_10x": statistics.median(b),
            "ratio_min_10x_over_1x": round(min(b) / min(a), 2),
        }
    print(json.dumps({"dir_1x": dir_1x, "dir_10x": dir_10x,
                      "queries": summary}, indent=2))


if __name__ == "__main__":
    main()

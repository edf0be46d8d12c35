"""Same-session A/B bench of selected headline queries across two repo
checkouts (VERDICT r5 #2: settle the q_update_dv / q_delete_dv drift).

Runs each (tree, query) cell in its own subprocess with a fresh Spark
session, interleaved A/B/A/B so machine-load drift hits both trees
equally; reports per-rep timings plus min/median.

Usage: python tools/ab_bench.py TREE_A TREE_B q_update_dv q_delete_dv

``--warm`` switches each cell to bench.py semantics: execute the query
once untimed (codegen/JIT/page-cache warm-up), then report the min of 3
timed in-session executions.  Cold cells (the default) time the FIRST
execution, which bundles whole-stage-codegen compilation into whichever
query runs first — right for comparing plan+compile cost, wrong for
adjudicating a drift in the per-round bench artifact, whose numbers are
mins across warm passes.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

RUNNER = r'''
import json, os, sys, time
sys.path.insert(0, sys.argv[1])
os.chdir(sys.argv[1])
import __spark_entry__ as entrymod
from table_versions_spark.session import get_spark
spark = get_spark(app_name="tvx-ab")
spark.range(1_000_000).selectExpr("sum(id)").collect()
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
warm = spark.read.parquet(os.path.join(sf_dir, "region.parquet"))
warm.write.format("noop").mode("overwrite").save()
qs = entrymod.queries()
warm_mode = os.environ.get("TVX_AB_WARM") == "1"
out = {}
for name in sys.argv[2:]:
    if warm_mode:
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        reps = []
        for _ in range(3):
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            reps.append(time.time() - t0)
        out[name] = round(min(reps), 3)
    else:
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        out[name] = round(time.time() - t0, 3)
print("ABRESULT " + json.dumps(out))
'''


def run_cell(tree: str, queries: list[str], *,
             warm: bool = False) -> dict[str, float]:
    env = dict(os.environ, TVX_AB_WARM="1" if warm else "0")
    proc = subprocess.run(
        [sys.executable, "-c", RUNNER, tree, *queries],
        capture_output=True, text=True, timeout=1800, env=env)
    for line in proc.stdout.splitlines():
        if line.startswith("ABRESULT "):
            return json.loads(line[len("ABRESULT "):])
    raise RuntimeError(
        f"no result from {tree}: {proc.stdout[-2000:]} {proc.stderr[-2000:]}")


def main() -> None:
    argv = sys.argv[1:]
    warm = "--warm" in argv
    if warm:
        argv = [a for a in argv if a != "--warm"]
    tree_a, tree_b, *queries = argv
    reps = 3
    results: dict[str, dict[str, list[float]]] = {
        tree_a: {q: [] for q in queries}, tree_b: {q: [] for q in queries}}
    for i in range(reps):
        for tree in (tree_a, tree_b):
            cell = run_cell(tree, queries, warm=warm)
            for q, sec in cell.items():
                results[tree][q].append(sec)
            print(f"rep {i} {tree}: {cell}", file=sys.stderr)
    summary = {}
    for q in queries:
        a, b = results[tree_a][q], results[tree_b][q]
        summary[q] = {
            "a_runs": a, "b_runs": b,
            "a_min": min(a), "b_min": min(b),
            "a_median": statistics.median(a),
            "b_median": statistics.median(b),
            "ratio_median_a_over_b": round(
                statistics.median(a) / statistics.median(b), 3),
        }
    print(json.dumps({"tree_a": tree_a, "tree_b": tree_b, "warm": warm,
                      "queries": summary}, indent=2))


if __name__ == "__main__":
    main()

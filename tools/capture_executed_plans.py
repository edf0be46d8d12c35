"""Capture POST-EXECUTION (final AQE) plans for registered query ids.

Usage: python tools/capture_executed_plans.py <outdir> <suffix> query_id ...

The static ``explain("formatted")`` render (tools/capture_plans.py)
shows ``AdaptiveSparkPlan isFinalPlan=false`` — AQE stage reuse
(``ReusedExchange`` across branches that canonicalize equal only at
runtime) and coalesced ``AQEShuffleRead`` nodes are invisible there.
This tool executes each query (``collect()``), then re-renders the same
DataFrame's query execution, which now prints the FINAL adaptive plan
(``isFinalPlan=true``) — the plan the bench actually ran, exchange
reuse included. Only meaningful for read-only query ids (the prefix
consumers it exists for); engine-mutating ids would commit twice.
"""

from __future__ import annotations

import os
import sys


def main(argv: list[str]) -> int:
    if len(argv) < 3:
        print(__doc__)
        return 2
    outdir, suffix = argv[0], argv[1]
    names = argv[2:]
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entrymod
    from table_versions_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="capture-executed-plans")
    os.makedirs(outdir, exist_ok=True)
    qs = entrymod.queries()
    rc = 0
    for name in names:
        fn = qs.get(name)
        if fn is None:
            print(f"SKIP {name}: not registered")
            rc = 1
            continue
        try:
            df = fn(spark, sf_dir)
            df.collect()
            text = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as e:  # noqa: BLE001
            print(f"ERR  {name}: {type(e).__name__}: {e}")
            rc = 1
            continue
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        print(f"OK   {name} -> {path}")
    return rc


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))

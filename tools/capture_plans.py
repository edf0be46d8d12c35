"""Capture .explain("formatted") output for registered query ids.

Usage: python tools/capture_plans.py <outdir> <suffix> [query_id ...]

Writes <outdir>/<query>_<suffix>.txt for each id (default: the bench
HEADLINE list). Plans are rendered at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) with AQE left ON (same session config the bench
runs under), so the captured plan is the one the bench actually times
(modulo runtime AQE re-optimization, which explain renders as
``AdaptiveSparkPlan isFinalPlan=false``).
"""

from __future__ import annotations

import os
import sys


def main(argv: list[str]) -> int:
    if len(argv) < 2:
        print(__doc__)
        return 2
    outdir, suffix = argv[0], argv[1]
    only = argv[2:]
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entrymod
    from bench import HEADLINE
    from table_versions_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="capture-plans")
    os.makedirs(outdir, exist_ok=True)
    qs = entrymod.queries()
    names = only or [n for n in HEADLINE if n in qs]
    rc = 0
    for name in names:
        fn = qs.get(name)
        if fn is None:
            print(f"SKIP {name}: not registered")
            rc = 1
            continue
        try:
            df = fn(spark, sf_dir)
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

"""CLI sweep of the physical-plan audit over every registered query id.

The audit rules live in ``table_versions_spark.plans.audit`` (importable
library); this wrapper renders each registered query's static plan and
reports violations.

Usage: python tools/explain_audit.py [query_id ...]
Prints one line per query: OK or the list of violations; exits nonzero on
violations.
"""

from __future__ import annotations

import sys

SF_DIR = "/root/testdata/sf0.01"


def main(only: list[str]) -> int:
    sys.path.insert(0, ".")
    import __spark_entry__ as entrymod
    from table_versions_spark.plans import audit_plan, plan_stats
    from table_versions_spark.session import get_spark

    spark = get_spark(app_name="explain-audit")
    # AQE wraps every plan in AdaptiveSparkPlan and defers codegen/join
    # finalization to runtime; the audit wants the *static* plan — the one a
    # 1000-executor cluster must already get right (explicit broadcasts, not
    # runtime rescue conversions).
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    # The prefix small-input floor degrades tiny inputs to a plain
    # window; the audit judges the plan a 100 TB input would get, where
    # the floor never fires — pin it off so the bucketed shape renders.
    spark.conf.set("spark.tvx.prefix.smallInput.maxBytes", "0")
    qs = entrymod.queries()
    bad = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, SF_DIR)
            jplan = df._jdf.queryExecution().executedPlan()
            plan = jplan.toString()
        except Exception as e:  # noqa: BLE001
            print(f"ERR   {name}: {type(e).__name__}: {e}")
            bad += 1
            continue
        problems = audit_plan(name, jplan, plan)
        if problems:
            print(f"WARN  {name} [{plan_stats(plan)}]: " + "; ".join(problems))
            bad += 1
        else:
            print(f"OK    {name} [{plan_stats(plan)}]")
    print("AUDIT " + ("CLEAN" if bad == 0 else f"{bad} WARNINGS"))
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))

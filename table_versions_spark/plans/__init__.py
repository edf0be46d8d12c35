"""Plan-shape tooling: the physical-plan audit behind
``tools/explain_audit.py`` (see :mod:`table_versions_spark.plans.audit`)."""

from .audit import DIM_TABLES, EXPECTED, audit_dataframe, audit_plan, plan_stats

__all__ = ["DIM_TABLES", "EXPECTED", "audit_dataframe", "audit_plan",
           "plan_stats"]

"""Skew-handling join helper.

At 100 TB, a shuffled equi-join where a handful of keys carry a large share
of the rows puts those keys' entire volume on single tasks. AQE's skew-join
splitting (enabled in session.py) handles *sort-merge* skew at runtime, but
it cannot help when the skewed side must meet a *replicated* small side, and
gives no control over the fan-out factor.

``salted_join`` is the classic explicit remedy:

- the skewed (large) side gets a uniform salt in ``[0, salt)`` appended to
  the join key — its hot keys spread over ``salt`` shuffle partitions;
- the other side is replicated ``salt`` times via a posexplode'd literal
  array — no driver collect, no UDF, size × ``salt`` rows (choose the
  *smaller* side for this role);
- the join runs on ``(key, salt)`` and the salt column is dropped.

Semantics are exactly the inner/left equi-join on the original key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SALT_COL = "__tvx_salt"


def salted_join(skewed: DataFrame, other: DataFrame, on: list[str] | str,
                how: str = "inner", salt: int = 8) -> DataFrame:
    """Equi-join with the skewed side salted and ``other`` replicated
    ``salt`` times. ``on`` names join column(s) present in both frames."""
    if salt < 1:
        raise ValueError("salt must be >= 1")
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi",
                   "leftsemi", "semi", "left_anti", "leftanti", "anti",
                   "cross"):
        # the replicated side survives right/full/outer joins once PER
        # SALT REPLICA: every unmatched `other` row would silently appear
        # `salt` times
        raise ValueError(
            f"salted_join does not support how={how!r}: unmatched rows of "
            "the replicated side would duplicate once per salt value")
    keys = [on] if isinstance(on, str) else list(on)
    for k in keys:
        if k not in skewed.columns or k not in other.columns:
            raise ValueError(f"Join column {k!r} missing from an input")
    if SALT_COL in skewed.columns or SALT_COL in other.columns:
        raise ValueError(f"Inputs must not already have a {SALT_COL} column")
    # uniform, cheap, non-deterministic-free salt: hash of all columns would
    # correlate with the key; monotonically_increasing_id is per-row unique
    salted = skewed.withColumn(
        SALT_COL, F.pmod(F.monotonically_increasing_id(), F.lit(salt)).cast("bigint"))
    replicated = (other
                  .withColumn(SALT_COL,
                              F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
                  .withColumn(SALT_COL, F.col(SALT_COL).cast("bigint")))
    return (salted.join(replicated, keys + [SALT_COL], how)
            .drop(SALT_COL))

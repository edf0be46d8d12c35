"""Z-order (Morton) interleaving for multi-column data skipping.

Single-column ``cluster_by`` sorts files into tight ranges on ONE column;
a filter on any other column skips nothing. Z-ordering maps each row to a
point on a space-filling curve over N columns and sorts on that curve, so
every file covers a small hyper-rectangle — per-file min/max footer stats
then prune point/range lookups on ANY of the N columns (the role Delta's
``OPTIMIZE ZORDER BY`` plays; same bit-interleaving construction).

Construction: each column is normalized into a ``bits``-wide bucket id
using its global min/max (one tiny agg job — at 100 TB this is a
footer-stats lookup, not a scan), and bucket bits are interleaved
little-endian across columns: bit ``k`` of column ``i`` lands at position
``k·N + i`` of the z-value. Everything is a JVM bit expression inside
whole-stage codegen — no UDF, no Python in the write path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

ZORDER_BITS = 8  # buckets per column; 8 bits × 4 cols still fits a long


def zorder_column(df: DataFrame, cols: list[str],
                  bits: int = ZORDER_BITS) -> Column:
    """Morton z-value expression over numeric columns of ``df``.

    Runs one small aggregation to learn each column's [min, max] (the
    normalization bounds), then returns a pure-expression column. NULLs
    bucket to 0 — they cluster together at the low end of the curve and
    per-file stats simply ignore them (absence of stats never skips).
    """
    if len(cols) < 2:
        raise ValueError("z-ordering needs at least 2 columns; "
                         "use cluster_by for a single column")
    if bits * len(cols) > 63:
        # interleaved bit positions beyond 63 would wrap shiftleft's
        # count mod 64 on a long, silently folding high-order bits of
        # later columns onto bit 0 and garbling the curve — shrink the
        # per-column precision so every position fits the long
        bits = 63 // len(cols)
        if bits < 1:
            raise ValueError(
                f"z-ordering {len(cols)} columns cannot fit a 64-bit "
                "z-value; cluster on at most 63 columns")
    aggs = []
    for c in cols:
        aggs += [F.min(F.col(c).cast("double")).alias(f"mn_{c}"),
                 F.max(F.col(c).cast("double")).alias(f"mx_{c}")]
    row = df.agg(*aggs).first()
    top = (1 << bits) - 1
    buckets = []
    for c in cols:
        mn, mx = row[f"mn_{c}"], row[f"mx_{c}"]
        mn = 0.0 if mn is None else float(mn)
        span = 1.0 if mx is None or float(mx) == mn else float(mx) - mn
        b = F.floor((F.col(c).cast("double") - F.lit(mn))
                    / F.lit(span) * F.lit(top))
        b = F.least(F.greatest(b, F.lit(0)), F.lit(top)).cast("long")
        buckets.append(F.coalesce(b, F.lit(0)))
    n = len(cols)
    z = F.lit(0).cast("long")
    for k in range(bits):
        for i, b in enumerate(buckets):
            z = z + F.shiftleft(F.shiftright(b, k).bitwiseAND(F.lit(1)),
                                k * n + i)
    return z

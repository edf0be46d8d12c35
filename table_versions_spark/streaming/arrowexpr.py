"""Driver-validated, executor-evaluated expressions for the tvx sink.

``df.write.format("tvx")`` has no SparkSession on its write path (the
Python DataSource writer runs in plain Python workers), so tables that
declare CHECK constraints or generated partition columns used to refuse the
sink outright.  Two narrow evaluators lift that, while staying
byte-identical with what ``VersionedEngine.insert`` would have produced:

- **CHECK constraints** are validated at writer construction against a
  dialect-neutral grammar — column references, literals, comparison /
  boolean / arithmetic operators, ``IS [NOT] NULL``, ``IN``, ``BETWEEN``,
  ``LIKE`` — with function calls explicitly excluded.  Inside this subset
  Spark SQL and DuckDB agree expression-for-expression, so the per-task
  DuckDB probe over the Arrow batches (``arrowexpr.violations``) rejects
  exactly the rows the engine's Spark-side probe would reject (violation
  iff the expression IS FALSE; NULL passes — SQL CHECK semantics,
  ``engine.py`` ``_insert``).

- **partition derivations** come from a fixed catalogue of forms —
  ``to_date(col)``, ``year/month/day/dayofmonth/hour(col)``,
  ``substring(col, pos, len)``, bare ``col``, and integer
  ``col {+,-,*,%} N`` — compiled at construction against the incoming
  Spark schema to ``pyarrow.compute`` kernels whose results match Spark's
  on the types each form admits (checked at compile time).

Anything outside these subsets raises the same use-``engine.insert``
error the sink raised before the feature existed — the fallback is a loud
refusal, never a silently-different result.
"""

from __future__ import annotations

import re

# --------------------------------------------------------------- constraints

_TOKEN_RE = re.compile(r"""
    \s+
  | '[^'\\]*'                           # string literal: no backslash (a
                                        # Spark escape, literal in DuckDB)
                                        # and no embedded/doubled quote
                                        # ('' concat vs escape divergence)
  | \d+(?:\.\d+)?(?:[eE][+-]?\d+)?      # numeric literal
  | [A-Za-z_][A-Za-z0-9_]*              # identifier / keyword
  | <= | >= | <> | != | == | [=<>+\-*/%(),]
""", re.VERBOSE)

_KEYWORDS = {"and", "or", "not", "in", "is", "null", "between",
             "true", "false", "like"}


def validate_constraint(expr: str, columns: "list[str]") -> "str | None":
    """Return None if ``expr`` is inside the dialect-neutral grammar
    (so DuckDB evaluation is faithful to Spark), else a reason string."""
    lower_cols = {c.lower() for c in columns}
    pos, tokens = 0, []
    while pos < len(expr):
        m = _TOKEN_RE.match(expr, pos)
        if not m:
            return f"unsupported syntax at {expr[pos:pos + 10]!r}"
        tok = m.group(0)
        pos = m.end()
        if not tok.strip():
            continue
        tokens.append(tok)
    if not tokens:
        return "empty expression"
    for i, tok in enumerate(tokens):
        if (tok.startswith("'") and i + 1 < len(tokens)
                and tokens[i + 1].startswith("'")):
            # adjacent string literals: Spark concatenates ('it''s' →
            # "its"), DuckDB reads an escaped quote ("it's") — divergent
            return f"unsupported syntax (adjacent string literals) at {tok}"
        if tok in ("/", "%"):
            # a zero divisor raises in ANSI-default Spark 4 but yields
            # NULL in DuckDB — NULL passes CHECK, so a row the engine
            # refuses to commit would sail through silently
            return "division/modulo (divide-by-zero diverges: Spark ANSI "\
                   "raises, DuckDB yields NULL which passes CHECK)"
        if re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", tok):
            low = tok.lower()
            if low in _KEYWORDS:
                continue
            if low not in lower_cols:
                return f"unknown identifier {tok!r}"
            if i + 1 < len(tokens) and tokens[i + 1] == "(":
                # function call: the one construct where dialects diverge
                return f"function call {tok}(...)"
    return None


def violations(arrow_table, constraints: "tuple[str, ...]",
               limit: int = 1) -> list:
    """Executor side: first ``limit`` rows of ``arrow_table`` violating any
    constraint (violation iff the expression IS FALSE; NULL passes), as
    dicts.  DuckDB evaluates the batch vectorized — no per-row Python."""
    import duckdb
    import pyarrow.types as pat

    con = duckdb.connect()
    try:
        # pin DuckDB's TimeZone to the batch's timestamp zone (Spark
        # attaches its SESSION timezone to every Arrow timestamp column),
        # so string-literal↔timestamp comparisons cast the literal exactly
        # as Spark would — never in the executor's OS timezone
        tzs = {f.type.tz for f in arrow_table.schema
               if pat.is_timestamp(f.type) and f.type.tz}
        if len(tzs) > 1:
            # not producible through the sink (Spark attaches ONE session
            # tz to every Arrow timestamp column) — refuse loudly rather
            # than evaluate some column's literals in another's zone
            raise ValueError(
                f"mixed timestamp timezones {sorted(tzs)} in one batch")
        if tzs:
            tz = next(iter(tzs))
            if not re.fullmatch(r"[A-Za-z0-9_+\-/:]+", tz):
                raise ValueError(f"unsupported timestamp timezone {tz!r}")
            con.execute(f"SET TimeZone = '{tz}'")
        con.register("__tvx_batch", arrow_table)
        pred = " OR ".join(f"(({c}) = FALSE)" for c in constraints)
        out = con.execute(
            f"SELECT * FROM __tvx_batch WHERE {pred} LIMIT {limit}")
        cols = [d[0] for d in out.description]
        return [dict(zip(cols, row)) for row in out.fetchall()]
    finally:
        con.close()


# --------------------------------------------------------------- derivations

_INTEGRALS = {"byte", "short", "integer", "long"}


def _resolve_field(schema, col: str) -> "tuple[str, str] | None":
    """Case-insensitive column resolution (Spark's default), returning the
    field's ACTUAL name — specs must carry it, since Arrow table lookups
    on the executor are case-sensitive."""
    for f in schema.fields:
        if f.name.lower() == col.lower():
            return f.name, f.dataType.typeName()
    return None


def compile_derivation(expr: str, schema) -> "tuple | str":
    """Compile one partition-derivation expression against the incoming
    Spark ``schema``.  Returns a plain-data spec tuple (pickle-safe; the
    writer ships it to executors, :func:`apply_derivation` evaluates it)
    whose result reproduces Spark's ``F.expr(expr)`` on the admitted
    types, or a reason string when the form/type is outside the
    catalogue.  Every spec's second element is the source column."""
    e = expr.strip()

    m = re.fullmatch(r"(?i)to_date\(\s*(\w+)\s*\)", e)
    if m:
        got = _resolve_field(schema, m.group(1))
        if got and got[1] == "timestamp":
            return ("to_date", got[0])
        if got and got[1] == "date":
            return ("identity", got[0])
        return (f"to_date over {got[1] if got else 'missing column'} "
                "(timestamp only)")

    m = re.fullmatch(r"(?i)(year|month|day|dayofmonth|hour)\(\s*(\w+)\s*\)",
                     e)
    if m:
        fn = m.group(1).lower()
        got = _resolve_field(schema, m.group(2))
        if not got or got[1] not in ("timestamp", "date") or (
                fn == "hour" and got[1] != "timestamp"):
            return f"{fn} over {got[1] if got else 'missing column'}"
        return ("datepart", got[0], "day" if fn == "dayofmonth" else fn)

    m = re.fullmatch(
        r"(?i)substr(?:ing)?\(\s*(\w+)\s*,\s*(\d+)\s*,\s*(\d+)\s*\)", e)
    if m:
        start, length = int(m.group(2)), int(m.group(3))
        if start < 1:
            return "substring with non-positive start"
        got = _resolve_field(schema, m.group(1))
        if not got or got[1] != "string":
            return "substring over non-string column"
        return ("substr", got[0], start - 1, start - 1 + length)

    m = re.fullmatch(r"(\w+)\s*([+\-*%])\s*(\d+)", e)
    if m:
        op, n = m.group(2), int(m.group(3))
        got = _resolve_field(schema, m.group(1))
        if not got or got[1] not in _INTEGRALS:
            return (f"integer arithmetic over "
                    f"{got[1] if got else 'missing column'}")
        if op == "%" and n == 0:
            return "modulo by zero"
        return ("arith", got[0], op, n)

    m = re.fullmatch(r"\w+", e)
    if m:
        got = _resolve_field(schema, e)
        if got is None:
            return f"missing source column {e!r}"
        return ("identity", got[0])

    return f"unsupported derivation form {e!r}"


def apply_derivation(spec: tuple, column):
    """Executor side: evaluate a :func:`compile_derivation` spec over one
    Arrow column (ChunkedArray), null-propagating, no per-row Python."""
    import pyarrow as pa
    import pyarrow.compute as pc

    kind = spec[0]
    if kind == "identity":
        return column
    if kind == "to_date":
        return pc.cast(column, pa.date32())
    if kind == "datepart":
        return {"year": pc.year, "month": pc.month, "day": pc.day,
                "hour": pc.hour}[spec[2]](column)
    if kind == "substr":
        return pc.utf8_slice_codeunits(column, start=spec[2], stop=spec[3])
    if kind == "arith":
        _, _, op, n = spec
        if op == "%":
            # Spark % is truncated remainder (sign of the dividend);
            # Arrow integer divide truncates toward zero, so
            # a - (a/n)*n reproduces it exactly, nulls propagating
            # (no overflow possible: |a/n*n| <= |a|)
            return pc.subtract(column, pc.multiply(pc.divide(column, n), n))
        # _checked kernels: int64 overflow must RAISE (failing the task)
        # as ANSI-default Spark does, never wrap into a silently wrong
        # partition value
        return {"+": pc.add_checked, "-": pc.subtract_checked,
                "*": pc.multiply_checked}[op](column, n)
    raise ValueError(f"unknown derivation spec {spec!r}")

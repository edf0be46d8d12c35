"""Local correctness harness mimicking the driver's oracle compare.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB at
sf0.01, then compares row count, schema (canonicalized type names), and an
order-insensitive value hash (values canonicalized: doubles repr'd, columns
sorted by name, rows sorted). Queries without an oracle get a rows-only
report.

Usage: python tools/check_oracles.py [query_id ...]
"""

from __future__ import annotations

import datetime as _dt
import hashlib
import math
import sys
import time

SF_DIR = __import__("os").environ.get("TVX_CHECK_SF_DIR",
                                      "/root/testdata/sf0.01")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

_TYPE_CANON = {
    # spark
    "bigint": "int64", "long": "int64", "int": "int32", "integer": "int32",
    "smallint": "int16", "tinyint": "int8", "double": "float64",
    "float": "float32", "string": "string", "varchar": "string",
    "date": "date", "timestamp": "timestamp", "boolean": "bool",
    # duckdb
    "BIGINT": "int64", "INTEGER": "int32", "SMALLINT": "int16",
    "TINYINT": "int8", "DOUBLE": "float64", "FLOAT": "float32",
    "VARCHAR": "string", "DATE": "date", "TIMESTAMP": "timestamp",
    "TIMESTAMP_NS": "timestamp", "TIMESTAMP_MS": "timestamp",
    "BOOLEAN": "bool", "HUGEINT": "int128",
}


def canon_value(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(round(v, 9))
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon_rows = sorted(
        "\x01".join(canon_value(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for row in canon_rows:
        h.update(row.encode())
        h.update(b"\x02")
    return h.hexdigest()[:16]


def main(only: list[str]) -> int:
    import duckdb

    sys.path.insert(0, ".")
    import __spark_entry__ as entrymod
    from table_versions_spark.session import get_spark

    spark = get_spark(app_name="check-oracles")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_DIR}/{t}.parquet')")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            s_cols = sdf.columns
            s_types = [_TYPE_CANON.get(f.dataType.simpleString(),
                                       f.dataType.simpleString())
                       for f in sdf.schema.fields]
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(s_rows)} rows (no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            continue
        try:
            rel = con.sql(oracles[name])
            d_cols = list(rel.columns)
            d_types = [_TYPE_CANON.get(str(t), str(t)) for t in rel.types]
            d_rows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {type(e).__name__}: {e}")
            failures += 1
            continue
        problems = []
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount {len(s_rows)} vs {len(d_rows)}")
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"columns {sorted(s_cols)} vs {sorted(d_cols)}")
        elif s_types != d_types and sorted(zip(s_cols, s_types)) != sorted(zip(d_cols, d_types)):
            problems.append(f"types {list(zip(s_cols, s_types))} vs {list(zip(d_cols, d_types))}")
        sh, dh = value_hash(s_cols, s_rows), value_hash(d_cols, d_rows)
        if sh != dh:
            problems.append(f"value hash {sh} vs {dh}")
            # show first differing canonical rows for debugging
            so = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
            do = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
            s_set = sorted("|".join(canon_value(r[i]) for i in so) for r in s_rows)
            d_set = sorted("|".join(canon_value(r[i]) for i in do) for r in d_rows)
            for a, b in zip(s_set, d_set):
                if a != b:
                    problems.append(f"first diff:\n    spark : {a}\n    duckdb: {b}")
                    break
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            failures += 1
        else:
            print(f"ok    {name}: {len(s_rows)} rows match "
                  f"[{time.time()-t0:.1f}s]")
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))

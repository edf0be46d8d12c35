"""Schema-DDL string helpers shared across the package.

The engine stores a table's declared schema as a Spark DDL string
(``"id bigint, d string"``) in the table meta file; every layer that
needs (name, type) pairs — the streaming source's Arrow schema, the
catalog sync's ADD COLUMNS reconciliation, the cloud-catalog storage
descriptor — parses it with :func:`schema_fields`. Lives in ``core`` so
pyspark-free modules (``catalog_cloud``) don't have to import the
streaming package for a string parser.
"""

from __future__ import annotations


def schema_fields(schema_ddl: str) -> list[tuple[str, str]]:
    """"a int, b decimal(10,2), c array<int>" → [(name, type), ...] —
    splits on top-level commas only (type args carry their own commas)."""
    out, depth, start = [], 0, 0
    for i, ch in enumerate(schema_ddl + ","):
        if ch in "(<":
            depth += 1
        elif ch in ")>":
            depth -= 1
        elif ch == "," and depth == 0:
            piece = schema_ddl[start:i].strip()
            if piece:
                name, _, typ = piece.partition(" ")
                out.append((name, typ.strip().lower()))
            start = i + 1
    return out

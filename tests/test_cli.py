"""CLI tests (python -m table_versions_spark ...). Metadata commands run
without Spark; show/compact are covered by engine tests and exercised here
only through main()'s argument wiring."""

import pytest

from table_versions_spark.__main__ import main


@pytest.fixture
def warehouse(spark, engine):
    engine.create_table("db.cli", schema_ddl="id bigint, d string",
                        partition_columns=["d"])
    engine.insert(spark.createDataFrame([(1, "a"), (2, "b")],
                                        "id bigint, d string"),
                  "db.cli", "u", "v1")
    engine.insert(spark.createDataFrame([(3, "b")], "id bigint, d string"),
                  "db.cli", "u", "v2")
    return engine.warehouse, engine


def test_tables(warehouse, capsys):
    wh, _ = warehouse
    assert main(["-w", wh, "tables"]) == 0
    assert capsys.readouterr().out.strip() == "db.cli"


def test_history_and_current(warehouse, capsys):
    wh, _ = warehouse
    main(["-w", wh, "history", "db.cli"])
    out = capsys.readouterr().out
    assert out.count("\n") == 3 and "v2" in out and "init" in out
    main(["-w", wh, "current", "db.cli"])
    out = capsys.readouterr().out
    assert "d=a" in out and "d=b" in out


def test_stats_metadata_only(warehouse, capsys):
    """`stats` folds row counts / min-max from the commit log without a
    Spark session (engine constructed with spark=None) and must agree
    with the table's actual contents."""
    import json

    wh, eng = warehouse
    assert main(["-w", wh, "stats", "db.cli"]) == 0
    stats = json.loads(capsys.readouterr().out)
    assert stats["rows"] == 2  # v2 overwrote d=b: ids {1, 3}
    assert stats["missing"] == []
    assert stats["columns"]["id"]["min"] == 1
    assert stats["columns"]["id"]["max"] == 3


def test_checkout_moves_pointer(warehouse, capsys):
    wh, eng = warehouse
    first = eng.history("db.cli").collect()[1]["commit_id"]
    assert main(["-w", wh, "checkout", "db.cli", first]) == 0
    # v1 state: ids {1,2}; head state would be {1,3} (v2 overwrote d=b)
    assert sorted(r["id"] for r in eng.read("db.cli").collect()) == [1, 2]


def test_vacuum(warehouse, capsys):
    wh, eng = warehouse
    # keep only the head commit's versions: v1's d=b version dir goes
    assert main(["-w", wh, "vacuum", "db.cli", "--keep", "1"]) == 0
    out = capsys.readouterr().out
    assert "version dir(s) removed" in out
    # current state untouched: {1 in d=a, 3 in d=b} (v2 overwrote d=b)
    assert sorted(r["id"] for r in eng.read("db.cli").collect()) == [1, 3]


def test_clone(warehouse, capsys):
    wh, engine = warehouse
    assert main(["-w", wh, "clone", "db.cli", "db.cli_branch"]) == 0
    out = capsys.readouterr().out
    assert "cloned db.cli -> db.cli_branch" in out
    assert sorted(map(tuple, engine.read("db.cli_branch").collect())) \
        == sorted(map(tuple, engine.read("db.cli").collect()))


def test_restore_forward_commit(warehouse, capsys):
    wh, eng = warehouse
    first = eng.history("db.cli").collect()[-2]["commit_id"]  # v1 insert
    n = eng.history("db.cli").count()
    assert main(["-w", wh, "restore", "db.cli", first]) == 0
    out = capsys.readouterr().out
    assert f"restored db.cli to {first}" in out
    assert eng.history("db.cli").count() == n + 1  # linear, append-only
    assert sorted(r["id"] for r in eng.read("db.cli").collect()) == [1, 2]


def test_rename_and_drop_column(warehouse, capsys):
    wh, eng = warehouse
    assert main(["-w", wh, "rename-column", "db.cli", "id", "renamed_col"]) == 0
    assert "renamed" in capsys.readouterr().out
    assert "renamed_col" in eng.read("db.cli").columns
    assert main(["-w", wh, "drop-column", "db.cli", "renamed_col"]) == 0
    assert "dropped" in capsys.readouterr().out
    assert "renamed_col" not in eng.read("db.cli").columns
